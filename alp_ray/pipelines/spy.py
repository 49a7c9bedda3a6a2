"""Matrix-structure downsampling ("spy plot") — ≙ algorithms/spy.hpp:198.

The reference computes out = Qᵀ·A·Q where Q maps row i to coarse bucket
⌊i / (n/small_n)⌋ (spy.hpp:48-90), i.e. a bucketed nonzero count, with
optional normalization by bucket area. Ray Data: one map_batches bucket
projection + a combiner-first groupby count — no matrix products needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def spy(
    edges: "ray.data.Dataset",
    n_rows: int,
    n_cols: int,
    small_m: int = 64,
    small_n: int = 64,
    normalize: bool = False,
) -> "ray.data.Dataset":
    """(src, dst) edge table → (bucket_i, bucket_j, count[, density])."""
    row_f = n_rows / small_m
    col_f = n_cols / small_n

    def bucketize(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        dst = np.asarray(batch.column("dst"), np.int64)
        bi = (src / row_f).astype(np.int64)
        bj = (dst / col_f).astype(np.int64)
        t = pa.table({"bucket_i": bi, "bucket_j": bj})
        # Combiner: per-block partial counts before the shuffle.
        g = t.group_by(["bucket_i", "bucket_j"]).aggregate(
            [("bucket_i", "count")]
        )
        return g.rename_columns(["bucket_i", "bucket_j", "c"])

    out = (
        edges.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["bucket_i", "bucket_j"])
        .aggregate(Sum("c", alias_name="count"))
    )
    if normalize:
        def norm(batch: pa.Table) -> pa.Table:
            bi = np.asarray(batch.column("bucket_i"), np.int64)
            bj = np.asarray(batch.column("bucket_j"), np.int64)
            cnt = np.asarray(batch.column("count"), np.float64)
            rows = np.minimum((bi + 1) * row_f, n_rows) - bi * row_f
            cols = np.minimum((bj + 1) * col_f, n_cols) - bj * col_f
            return batch.append_column(
                "density", pa.array(cnt / (rows * cols))
            )

        out = out.map_batches(norm, batch_format="pyarrow")
    return out
