"""Triangle count — semantically ``tr(A·A ∘ A)/6`` via masked SpGEMM.

The reference ships no triangle algorithm (verified — SURVEY §2.5); in ALP
terms it is ``mxm`` (plus-times, reference/blas3.hpp:75 Gustavson+SPA) +
``eWiseApply(mul)`` Hadamard mask (:1206) + ``foldl`` trace. We implement
the scalable composition directly:

1. canonicalize to an undirected simple edge set;
2. orient every edge from lower to higher (degree, id) rank — bounding
   out-adjacency by O(√m), the standard wedge-explosion guard (this is the
   "degree-ordered orientation" promised in SURVEY §7.7);
3. wedges: per-source pairs of out-neighbors (``groupby(src).map_groups``
   ≙ SpGEMM row-by-row expansion);
4. mask ∘A: semi-join wedges against the oriented edge set via a
   union + groupby(a,b) aggregate — count only wedge pairs that are
   themselves edges;
5. global sum (the trace fold).

Each triangle {x,y,z} with rank(x)<rank(y)<rank(z) is counted exactly once
(apex x, closing edge y→z).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Max, Sum

from alp_ray.stages.graph import canonicalize, symmetrize


def triangle_count(
    edges: "ray.data.Dataset",
    method: str = "auto",
    broadcast_threshold: int = 2_000_000,
    degree_broadcast_limit: int | None = None,
) -> int:
    """edges: directed or undirected (src, dst) Dataset; returns #triangles.

    Two physical forms (≙ the reference's gather-vs-scatter kernel choice,
    reference/blas2.hpp:1132):
    - ``broadcast``: oriented adjacency CSR broadcast once via ray.put;
      per-edge neighbour-set intersection in map_batches (edge-iterator
      algorithm). Wins while the oriented edge set fits comfortably in
      one object (< ``broadcast_threshold`` edges).
    - ``shuffle``: per-source wedge generation + semi-join against the
      edge set via groupby — the all-Dataset scale path. Its degree
      table broadcasts below ``degree_broadcast_limit`` vertices and
      attaches by hash join above it (stages/graph.py
      orient_by_degree_rank — the 10^12-vertex route).
    """
    canon = canonicalize(edges).materialize()
    m = canon.count()
    if m == 0:
        return 0
    if method == "auto":
        method = "broadcast" if m <= broadcast_threshold else "shuffle"
    if method == "broadcast":
        return _triangle_count_broadcast(canon)
    return _triangle_count_shuffle(canon, m, degree_broadcast_limit)


@ray.remote(num_returns=2)
def _build_oriented(*tables: pa.Table) -> tuple:
    """Rank-relabeled oriented CSR + sorted edge-key array, built on a
    WORKER from the canonical edge blocks (the driver only passes refs).
    Vertices are relabeled to their (degree, id)-lex rank so orientation
    and neighbour ordering are plain integer comparisons."""
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        list(tables), columns={"src": pa.int64(), "dst": pa.int64()}
    )
    a = np.asarray(t.column("src"), np.int64)
    b = np.asarray(t.column("dst"), np.int64)
    both = np.concatenate([a, b])
    verts, inv = np.unique(both, return_inverse=True)
    deg = np.bincount(inv, minlength=verts.size)
    n = verts.size
    order = np.lexsort((verts, deg))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = np.arange(n)
    ra = rank_of[inv[: a.size]]
    rb = rank_of[inv[a.size :]]
    lo = np.minimum(ra, rb)
    hi = np.maximum(ra, rb)
    keys_sorted = np.sort(lo * n + hi)
    o2 = np.lexsort((hi, lo))
    lo_s, hi_s = lo[o2], hi[o2]
    indptr = np.searchsorted(lo_s, np.arange(n + 1))
    # Two returns: the big bundle stays in the object store; the driver
    # fetches only the scalar n.
    return (indptr, hi_s, keys_sorted, n), n


class _TriCountStage:
    """Per-batch wedge counting over a broadcast oriented CSR. Grouping
    sources by out-degree makes the wedge generation + sorted-key
    membership test pure numpy (no per-edge Python; ≙ a vectorized
    Gustavson row intersection, reference/blas3.hpp:180-198)."""

    def __init__(self, bundle_ref) -> None:
        self.indptr, self.nbrs, self.keys, self.n = ray.get(bundle_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), np.int64)
        total = 0
        deg = self.indptr[ids + 1] - self.indptr[ids]
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = ids[deg == d]
            idx = self.indptr[sel][:, None] + np.arange(d)[None, :]
            nb = self.nbrs[idx]  # (n_sel, d), rank-sorted rows
            iu, ju = np.triu_indices(int(d), 1)
            wk = nb[:, iu].ravel() * self.n + nb[:, ju].ravel()
            pos = np.clip(
                np.searchsorted(self.keys, wk), 0, self.keys.size - 1
            )
            total += int((self.keys[pos] == wk).sum())
        return pa.table({"t": pa.array([total], pa.int64())})


def _triangle_count_broadcast(canon: "ray.data.Dataset") -> int:
    refs = canon.to_arrow_refs()
    bundle_ref, n_ref = _build_oriented.remote(*refs)
    n = int(ray.get(n_ref))
    if n == 0:
        return 0
    total = (
        ray.data.range(n)
        .map_batches(
            _TriCountStage,
            fn_constructor_args=(bundle_ref,),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, 8),
        )
        .sum("t")
    )
    return int(total or 0)


def _triangle_count_shuffle(
    canon: "ray.data.Dataset",
    m: int | None = None,
    degree_broadcast_limit: int | None = None,
) -> int:
    from alp_ray.stages.graph import orient_by_degree_rank

    # Degrees in the undirected simple graph (for the rank orientation).
    sym = symmetrize(canon)

    def block_counts(batch: pa.Table) -> pa.Table:
        t = batch.group_by("src").aggregate([("src", "count")])
        return t.rename_columns(["v", "c"])

    deg_ds = (
        sym.map_batches(block_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="deg"))
    )
    # Orientation: broadcast degree table below the limit, hash JOIN
    # above it (the 10^12-vertex route) — oriented rows carry bd =
    # deg(b) so wedge generation needs no degree lookup at all.
    kw = {}
    if degree_broadcast_limit is not None:
        kw["broadcast_limit"] = degree_broadcast_limit
    oriented = orient_by_degree_rank(canon, deg_ds, m=m, **kw)

    def wedges(group: pa.Table) -> pa.Table:
        # Out-neighbors of one source, sorted by (deg, id) rank so emitted
        # pairs are themselves rank-oriented (bd carried by orientation).
        nbr = np.asarray(group.column("b"), dtype=np.int64)
        nd = np.asarray(group.column("bd"), dtype=np.int64)
        nbr = nbr[np.lexsort((nbr, nd))]
        k = nbr.size
        if k < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        iu, ju = np.triu_indices(k, 1)
        return pa.table(
            {"a": nbr[iu], "b": nbr[ju], "w": np.ones(iu.size, np.int64)}
        )

    wedge_ds = oriented.groupby("a").map_groups(
        wedges, batch_format="pyarrow"
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "w": pa.array(np.zeros(len(batch), np.int64)),
                "is_edge": pa.array(np.ones(len(batch), np.int64)),
            }
        )

    def tag_wedges(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_edge", pa.array(np.zeros(len(batch), np.int64))
        )

    unioned = wedge_ds.map_batches(
        tag_wedges, batch_format="pyarrow"
    ).union(oriented.map_batches(tag_edges, batch_format="pyarrow"))

    closed = (
        unioned.groupby(["a", "b"])
        .aggregate(
            Sum("w", alias_name="wedges"), Max("is_edge", alias_name="is_edge")
        )
        .filter(expr="is_edge == 1")
    )
    total = closed.sum("wedges")
    return int(total or 0)
