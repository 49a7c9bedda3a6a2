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
) -> int:
    """edges: directed or undirected (src, dst) Dataset; returns #triangles.

    Two physical forms (≙ the reference's gather-vs-scatter kernel choice,
    reference/blas2.hpp:1132):
    - ``broadcast``: oriented adjacency CSR broadcast once via ray.put;
      per-edge neighbour-set intersection in map_batches (edge-iterator
      algorithm). Wins while the oriented edge set fits comfortably in
      one object (< ``broadcast_threshold`` edges).
    - ``shuffle``: per-source wedge generation + semi-join against the
      edge set via groupby — the all-Dataset scale path.
    """
    canon = canonicalize(edges).materialize()
    m = canon.count()
    if m == 0:
        return 0
    if method == "auto":
        method = "broadcast" if m <= broadcast_threshold else "shuffle"
    if method == "broadcast":
        return _triangle_count_broadcast(canon)
    return _triangle_count_shuffle(canon)


def _triangle_count_broadcast(canon: "ray.data.Dataset") -> int:
    sym = symmetrize(canon)
    deg_tbl = (
        sym.groupby("src").count().rename_columns(["v", "deg"]).to_pandas()
    )
    n_map = dict(zip(deg_tbl["v"], deg_tbl["deg"]))

    df = canon.to_pandas()
    a = df["src"].to_numpy(np.int64)
    b = df["dst"].to_numpy(np.int64)
    deg_a = np.fromiter((n_map[v] for v in a), np.int64, a.size)
    deg_b = np.fromiter((n_map[v] for v in b), np.int64, b.size)
    a_first = (deg_a < deg_b) | ((deg_a == deg_b) & (a < b))
    lo = np.where(a_first, a, b)
    hi = np.where(a_first, b, a)
    # Oriented CSR (low-rank → high-rank): out-neighbour lists sorted.
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    uniq, starts = np.unique(lo, return_index=True)
    bounds = np.append(starts, lo.size)
    index = {int(v): (int(bounds[i]), int(bounds[i + 1]))
             for i, v in enumerate(uniq)}
    adj_ref = ray.put((hi, index))

    def count_batch(batch: pa.Table) -> pa.Table:
        nbrs, idx = ray.get(adj_ref)
        u = np.asarray(batch.column("a"), np.int64)
        v = np.asarray(batch.column("b"), np.int64)
        total = 0
        for x, y in zip(u, v):
            sx = idx.get(int(x))
            sy = idx.get(int(y))
            if sx is None or sy is None:
                continue
            total += np.intersect1d(
                nbrs[sx[0] : sx[1]], nbrs[sy[0] : sy[1]],
                assume_unique=True,
            ).size
        return pa.table({"t": pa.array([total], pa.int64())})

    oriented = ray.data.from_arrow(
        pa.table({"a": lo, "b": hi})
    )
    total = oriented.map_batches(
        count_batch, batch_format="pyarrow", batch_size=8192
    ).sum("t")
    return int(total or 0)


def _triangle_count_shuffle(canon: "ray.data.Dataset") -> int:

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
    # Broadcast the degree table once (O(n) ints). At 10^12-vertex scale
    # this becomes a join on src/dst instead; the orientation logic is
    # unchanged.
    deg_tbl = pa.concat_tables(ray.get(deg_ds.to_arrow_refs()))
    dv = np.asarray(deg_tbl.column("v"), dtype=np.int64)
    dc = np.asarray(deg_tbl.column("deg"), dtype=np.int64)
    order = np.argsort(dv)
    dv, dc = dv[order], dc[order]
    deg_ref = ray.put((dv, dc))

    class Orient:
        """Orient each canonical edge low-rank → high-rank."""

        def __init__(self, deg_ref) -> None:
            self.dv, self.dc = ray.get(deg_ref)

        def _deg(self, v: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(self.dv, v)
            return self.dc[pos]

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = np.asarray(batch.column("src"))
            b = np.asarray(batch.column("dst"))
            da, db = self._deg(a), self._deg(b)
            # rank(u) < rank(v) iff (deg,id) lexicographic order.
            a_first = (da < db) | ((da == db) & (a < b))
            lo = np.where(a_first, a, b)
            hi = np.where(a_first, b, a)
            return pa.table({"a": lo, "b": hi})

    oriented = canon.map_batches(
        Orient, fn_constructor_args=(deg_ref,), batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def wedges(group: pa.Table) -> pa.Table:
        # Out-neighbors of one source, sorted by (deg, id) rank so emitted
        # pairs are themselves rank-oriented.
        dv, dc = ray.get(deg_ref)
        nbr = np.asarray(group.column("b"), dtype=np.int64)
        nd = dc[np.searchsorted(dv, nbr)]
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
