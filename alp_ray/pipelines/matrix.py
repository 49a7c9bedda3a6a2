"""BLAS3 — matrix-matrix operators over edge-table Datasets.

≙ include/graphblas/base/blas3.hpp:
- ``spgemm`` ≙ grb::mxm (:94; reference impl mxm_generic,
  reference/blas3.hpp:75 — Gustavson row-by-row with SPA). Here: C =
  A·B as the relational composition A ⋈ B on (A.dst = B.src) with the
  semiring's mul on joined weights, then groupby(src,dst) under the add
  monoid — the SPA replaced by the shuffle combine, with an in-batch
  combiner ahead of it. The RESIZE/EXECUTE two-phase of the reference
  (symbolic count then numeric) is unnecessary: blocks stream and spill.
- ``matrix_ewise`` ≙ grb::eWiseApply on matrices (:1206/:1259 —
  op = INTERSECTION of structures, monoid = UNION).
- ``outer`` ≙ grb::outer (reference/blas3.hpp:805) — u·vᵀ from two
  sparse vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.util import join_partitions
from ray.data.aggregate import Max, Min, Sum

from alp_ray.functions.semiring import Semiring

_AGG = {"sum": Sum, "min": Min, "max": Max}


def _with_weight(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    def ensure(batch: pa.Table) -> pa.Table:
        if "weight" in batch.column_names:
            return batch.select(["src", "dst", "weight"])
        return batch.select(["src", "dst"]).append_column(
            "weight", pa.array(np.ones(len(batch)))
        )

    return ds.map_batches(ensure, batch_format="pyarrow")


def spgemm(
    A: "ray.data.Dataset",
    B: "ray.data.Dataset",
    semiring: Semiring,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """C = A·B under the semiring; edge tables (src, dst[, weight]).
    Returns (src, dst, weight). Pattern matrices default weight 1."""
    a = _with_weight(A).rename_columns(["src", "k", "wa"])
    b = _with_weight(B).rename_columns(["k", "dst", "wb"])
    a = a.materialize()
    b = b.materialize()
    if num_partitions is None:
        # Ray 2.49 hash join breaks on empty partitions: size to data.
        rows = max(a.count(), b.count())
        num_partitions = int(np.clip(rows // 100_000, 2, 64))
    joined = a.join(
        b, join_type="inner", num_partitions=num_partitions, on=("k",)
    )

    def emit(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        dst = np.asarray(batch.column("dst"), np.int64)
        w = semiring.mul(
            np.asarray(batch.column("wa"), np.float64),
            np.asarray(batch.column("wb"), np.float64),
        )
        # In-batch combiner per (src, dst) before the shuffle.
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        if src.size:
            starts = np.flatnonzero(
                np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            )
            return pa.table(
                {
                    "src": src[starts],
                    "dst": dst[starts],
                    "weight": semiring.add.segment_reduce(w, starts),
                }
            )
        return pa.table({"src": src, "dst": dst, "weight": w})

    agg = _AGG[semiring.add.arrow_agg]
    return (
        joined.map_batches(emit, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(agg("weight", alias_name="weight"))
    )


def matrix_ewise(
    A: "ray.data.Dataset",
    B: "ray.data.Dataset",
    monoid_agg: str = "sum",
    intersect: bool = False,
) -> "ray.data.Dataset":
    """Hadamard-style element-wise combine of two edge tables.

    ``intersect=False`` → monoid/UNION semantics (missing side acts as
    the identity); ``intersect=True`` → op/INTERSECTION semantics (only
    coordinates present in BOTH) — grb::eWiseApply's monoid vs op
    variants (reference/blas3.hpp:1259/:1206).

    Inputs must be duplicate-free per the ``buildMatrixUnique`` /
    ``descriptors::no_duplicates`` ingestion contract (base/io.hpp:1336)
    — same assumption the reference makes. Side presence is tracked with
    distinct bit tags (Max-combined), so even a contract-violating
    duplicated coordinate within ONE input cannot masquerade as an
    intersection; its weights still fold under the monoid, mirroring the
    reference's undefined-behavior-on-duplicates.
    """
    a = _with_weight(A).map_batches(
        lambda t: t.append_column(
            "ta", pa.array(np.ones(len(t), np.int64))
        ).append_column("tb", pa.array(np.zeros(len(t), np.int64))),
        batch_format="pyarrow",
    )
    b = _with_weight(B).map_batches(
        lambda t: t.append_column(
            "ta", pa.array(np.zeros(len(t), np.int64))
        ).append_column("tb", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow",
    )
    agg = _AGG[monoid_agg]
    u = (
        a.union(b)
        .groupby(["src", "dst"])
        .aggregate(
            agg("weight", alias_name="weight"),
            Max("ta", alias_name="ta"),
            Max("tb", alias_name="tb"),
        )
    )
    if intersect:
        u = u.filter(expr="ta == 1 and tb == 1")
    return u.drop_columns(["ta", "tb"])


def matrix_zip(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    z: "ray.data.Dataset | None" = None,
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Build a matrix from index/value vectors — ≙ grb::zip(A, x, y[, z])
    (base/blas3.hpp:181-223; matrix_zip_generic reference/blas3.hpp:464):
    for every shared index i, emit entry ``A[x[i], y[i]] = z[i]`` (or a
    pattern entry when z is omitted). Inputs must produce no duplicate
    coordinates (the no_duplicates ingestion contract) — like the
    reference, duplicates are the caller's error.

    Implemented as inner joins on the index (``vertex``) column +
    projection; the Ray join IS the zip."""
    a = x.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "__row"]
    )
    b = y.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "__col"]
    )
    a = a.materialize()
    parts = join_partitions(a.count())
    joined = a.join(
        b, join_type="inner", num_partitions=parts, on=("vertex",)
    ).materialize()
    if z is not None:
        c = z.select_columns(["vertex", value_col]).rename_columns(
            ["vertex", "__val"]
        )
        joined = joined.join(
            c,
            join_type="inner",
            num_partitions=join_partitions(joined.count()),
            on=("vertex",),
        )

    def emit(batch: pa.Table) -> pa.Table:
        cols = {
            "src": pa.array(
                np.asarray(batch.column("__row"), np.float64).astype(
                    np.int64
                )
            ),
            "dst": pa.array(
                np.asarray(batch.column("__col"), np.float64).astype(
                    np.int64
                )
            ),
        }
        if "__val" in batch.column_names:
            cols["weight"] = pa.array(
                np.asarray(batch.column("__val"), np.float64)
            )
        return pa.table(cols)

    return joined.map_batches(emit, batch_format="pyarrow")


def outer(
    u: tuple[np.ndarray, np.ndarray],
    v: tuple[np.ndarray, np.ndarray],
    mul=np.multiply,
) -> "ray.data.Dataset":
    """Outer product u·vᵀ → edge table (sparse × sparse). u/v are
    (values, ids) pairs; one block per u-chunk (nnz(u)×nnz(v) rows
    total — caller is responsible for it being representable)."""
    uv, ui = u
    vv, vi = v
    vref = ray.put((vv, vi))
    chunks = np.array_split(np.arange(ui.size), max(1, ui.size // 1024))
    tables = []

    @ray.remote
    def make(uvals, uids):
        vv2, vi2 = ray.get(vref)
        src = np.repeat(uids, vi2.size)
        dst = np.tile(vi2, uids.size)
        w = mul(np.repeat(uvals, vi2.size), np.tile(vv2, uids.size))
        return pa.table({"src": src, "dst": dst, "weight": w})

    refs = [make.remote(uv[c], ui[c]) for c in chunks if c.size]
    return ray.data.from_arrow_refs(refs)
