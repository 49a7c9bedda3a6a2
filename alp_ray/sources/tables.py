"""Edge tables derived from the driver's TPC-H-ish parquet tables.

The correctness harness (``__ray_entry__.queries`` vs ``oracle_sql``)
needs a graph whose construction is expressible identically in Ray Data
and in DuckDB SQL. This module is the single source of truth for that
derivation (the SQL twin strings live in ``__ray_entry__.py``):

  edges(src, dst[, weight]) =
    SELECT DISTINCT l_orderkey % M AS src,
                    (l_partkey * 7 + l_suppkey) % M AS dst
    FROM lineitem [WHERE l_linenumber = 1]  -- sparse variant
    WHERE src != dst
  weight(src, dst) = (src + dst) % 10 + 1   -- deterministic in the key

Reads prune to exactly the needed columns (``columns=[...]`` on
read_parquet — never load 11 columns for a 3-column derivation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.stages.graph import dedup_edges


def derived_edges(
    sf_dir: str,
    mod: int = 601,
    sparse: bool = False,
    weighted: bool = False,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """``dedup=False`` skips the DISTINCT shuffle — for consumers that
    dedup at engine ingestion (from_dataset(dedupe=True)); the weight
    column is a pure function of (src, dst) so duplicates carry
    identical weights either way."""
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    if sparse:
        cols.append("l_linenumber")
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def project(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch.column("l_orderkey"), np.int64)
        pk = np.asarray(batch.column("l_partkey"), np.int64)
        sk = np.asarray(batch.column("l_suppkey"), np.int64)
        if sparse:
            ln = np.asarray(batch.column("l_linenumber"), np.int64)
            keep = ln == 1
            ok, pk, sk = ok[keep], pk[keep], sk[keep]
        src = ok % mod
        dst = (pk * 7 + sk) % mod
        keep = src != dst
        return pa.table({"src": src[keep], "dst": dst[keep]})

    projected = li.map_batches(project, batch_format="pyarrow")
    edges = dedup_edges(projected) if dedup else projected
    if weighted:

        def add_w(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column("src"), np.int64)
            d = np.asarray(batch.column("dst"), np.int64)
            return batch.append_column(
                "weight", pa.array(((s + d) % 10 + 1).astype(np.float64))
            )

        edges = edges.map_batches(add_w, batch_format="pyarrow")
    return edges


def edges_to_arrays(
    edges: "ray.data.Dataset", weighted: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Collect an edge Dataset to driver arrays (small graphs / tests)."""
    df = edges.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    w = df["weight"].to_numpy(np.float64) if weighted else None
    return src, dst, w
