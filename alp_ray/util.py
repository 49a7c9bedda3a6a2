"""Shared sizing helpers.

Ray 2.49's hash join breaks on EMPTY partitions ("no match or multiple
matches for key field"), so a fixed ``num_partitions`` is a footgun in
both directions: too many partitions crash tiny inputs, too few
serialize the join at scale. ``join_partitions`` sizes the width from
whatever row counts the call site can get cheaply (materialized counts,
engine.n, a collected table's num_rows) — the ``remap_edges_dense``
clip formula promoted to a single shared helper (VERDICT r2 §wrong 5).
"""

from __future__ import annotations

import numpy as np


def join_partitions(
    *counts: "int | None",
    per_part: int = 10_000,
    lo: int = 2,
    hi: int = 64,
) -> int:
    """Hash-join width from known row counts (the smallest KNOWN side
    bounds the width so no partition is empty; unknown sides pass
    None). ≥ ``lo`` so the join still parallelizes a little, ≤ ``hi``
    so tiny-per-partition overheads don't dominate."""
    known = [c for c in counts if c is not None]
    n = min(known) if known else 0
    return int(np.clip(n // per_part, lo, hi))


def coarse_parts(lo: int = 8, hi: int = 512) -> int:
    """Partition count for coarse key-hash map_groups stages (dedup
    buckets, per-user sessionize/asof): ≈ cluster cores, so every core
    gets a group without per-key dispatch overhead."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        cpus = 32
    return int(np.clip(cpus, lo, hi))


def concat_blocks(ds_or_tables, columns=None):
    """``pa.concat_tables`` over a Dataset's arrow refs (or a table
    list) that TOLERATES the column-less empty blocks Ray emits for
    empty shuffle/groupby partitions (they bypass UDFs, so they never
    get the output schema). ``columns`` gives the typed empty result
    when every block is empty: a dict name→pa.DataType."""
    import pyarrow as pa

    import ray

    if isinstance(ds_or_tables, (list, tuple)):
        tables = list(ds_or_tables)
    else:
        tables = ray.get(ds_or_tables.to_arrow_refs())
    good = [t for t in tables if t.num_columns > 0]
    if good:
        return pa.concat_tables(good).combine_chunks()
    if columns:
        return pa.table(
            {n: pa.array([], t) for n, t in columns.items()}
        )
    return pa.table({})
