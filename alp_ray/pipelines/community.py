"""Partition-quality metrics over a labelled graph: Newman modularity.

Q = Σ_c [ m_c/m − (d_c/2m)² ] for an undirected graph (m undirected
edges, m_c within-community edges, d_c degree sum of community c).
Over the SYMMETRIZED directed edge set (m2 = 2m directed rows) every
directed edge contributes 1 to d_{label(src)} and, iff both endpoints
share a label, 1 to mw2_{label}; then m_c/m = mw2_c/m2 and
d_c/2m = d_c/m2 — all-integer aggregation, two exact double divides at
the end (FP contract mirrored by the DuckDB twin expression for
expression: a − b·b with b computed as one divide).

Physical plan: labels broadcast once via ray.put (the small-side
lookup pattern; at 10^12 vertices swap the lookup for the two-hash-join
route orient_by_degree_rank demonstrates at stages/graph.py:112), ONE
vectorized map_batches partial-combine over the edges, ONE tiny
label-keyed groupby — no other shuffle. Companion to labelprop /
connected_components (reference graph-analytics family,
include/graphblas/algorithms/label_propagation.hpp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class _LabelPartials:
    """Per-batch (label, dc, mw2) partial sums; labels loaded once per
    actor from the object store."""

    def __init__(self, lab_ref) -> None:
        self.lab = ray.get(lab_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "src" not in batch.column_names or batch.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "dc": pa.array([], pa.int64()),
                "mw2": pa.array([], pa.int64()),
            })
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        ls, ld = self.lab[s], self.lab[d]
        ulab, inv = np.unique(ls, return_inverse=True)
        dc = np.bincount(inv, minlength=ulab.size)
        mw2 = np.bincount(
            inv, weights=(ls == ld).astype(np.float64),
            minlength=ulab.size,
        ).astype(np.int64)
        return pa.table({
            "label": pa.array(ulab),
            "dc": pa.array(dc.astype(np.int64)),
            "mw2": pa.array(mw2),
        })


def modularity_contributions(
    edges: "ray.data.Dataset",
    labels: np.ndarray,
    present_ids: np.ndarray,
) -> pa.Table:
    """Per-community modularity contributions.

    ``edges``: symmetrized DISTINCT (src, dst) Dataset.
    ``labels``: dense per-vertex label array (engine CC/labelprop
    state); ``present_ids``: vertices that exist in the graph.
    Returns (community, n_vertices, m2_within, deg_sum, q_contrib)
    sorted by community, plus total Q = sum(q_contrib).
    """
    from ray.data.aggregate import Sum

    lab_ref = ray.put(np.ascontiguousarray(labels, dtype=np.int64))
    parts = edges.map_batches(
        _LabelPartials,
        fn_constructor_args=(lab_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    agg = parts.groupby("label").aggregate(Sum("dc"), Sum("mw2"))
    df = agg.to_pandas()  # ≤ #communities rows
    lab = df["label"].to_numpy(np.int64)
    dc = df["sum(dc)"].to_numpy(np.int64)
    mw2 = df["sum(mw2)"].to_numpy(np.int64)
    order = np.argsort(lab)
    lab, dc, mw2 = lab[order], dc[order], mw2[order]

    m2 = float(dc.sum())  # directed edge count = 2m, exact in float64
    a = mw2 / m2
    b = dc / m2
    q = a - b * b

    # Community sizes from the label state (exact, driver-side — the
    # labels are already resident; at scale this is a labels-Dataset
    # groupby count instead).
    pl = labels[present_ids].astype(np.int64)
    sizes = {int(k): int(v) for k, v in
             zip(*np.unique(pl, return_counts=True))}
    nv = np.array([sizes[int(x)] for x in lab], np.int64)

    return pa.table({
        "community": pa.array(lab),
        "n_vertices": pa.array(nv),
        "m2_within": pa.array(mw2),
        "deg_sum": pa.array(dc),
        "q_contrib": pa.array(q),
    })
