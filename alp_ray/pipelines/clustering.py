"""Local clustering coefficient — per-vertex triangle counts over the
same degree-ordered oriented CSR the global triangle count uses
(pipelines/triangles.py; semantically the per-row trace of A·A ∘ A,
≙ mxm + eWiseApply(mul), reference/blas3.hpp:75/:1206, without the
final full fold).

cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, else 0 (Watts &
Strogatz, Nature 393, 1998). Each triangle {x,y,z} is discovered once
(apex = lowest rank, closing edge between the other two) and credited
to all three endpoints.

Scale shape: the oriented CSR is built on a worker and broadcast via
ray.put (valid while oriented adjacency fits one object — the same
contract as triangle_count's broadcast form; above it, the wedge
shuffle form applies unchanged). Per-batch partials are sparse
(vertex, t) pairs pre-combined by bincount; ONE groupby sums them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from alp_ray.stages.graph import canonicalize


@ray.remote(num_returns=2)
def _build_oriented_cc(*tables: pa.Table) -> tuple:
    """Like triangles._build_oriented but also returns rank→vertex ids
    and full (undirected simple) degrees for the cc denominator."""
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
    vert_of_rank = verts[order]
    deg_of_rank = deg[order]
    return (indptr, hi_s, keys_sorted, n, vert_of_rank, deg_of_rank), n


class _TriPerVertexStage:
    """Per-batch wedge closure over the broadcast CSR, crediting every
    closed wedge to apex AND both endpoints (rank space), emitted as a
    sparse pre-combined (vertex, t) partial."""

    def __init__(self, bundle_ref) -> None:
        (self.indptr, self.nbrs, self.keys, self.n,
         self.vert_of_rank, self.deg_of_rank) = ray.get(bundle_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), np.int64)
        counts = np.zeros(self.n, np.int64)
        deg = self.indptr[ids + 1] - self.indptr[ids]
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = ids[deg == d]
            idx = self.indptr[sel][:, None] + np.arange(d)[None, :]
            nb = self.nbrs[idx]
            iu, ju = np.triu_indices(int(d), 1)
            u = nb[:, iu].ravel()
            w = nb[:, ju].ravel()
            wk = u * self.n + w
            pos = np.clip(
                np.searchsorted(self.keys, wk), 0, self.keys.size - 1
            )
            hit = self.keys[pos] == wk
            apex = np.repeat(sel, iu.size)[hit]
            touched = np.concatenate([apex, u[hit], w[hit]])
            counts += np.bincount(touched, minlength=self.n)
        nz = np.flatnonzero(counts)
        return pa.table({
            "vertex": self.vert_of_rank[nz],
            "t": counts[nz],
        })


def clustering_coefficient(
    edges: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """(vertex, cc) for every vertex present in the simple undirected
    view of ``edges`` (deg < 2 → cc = 0.0)."""
    canon = canonicalize(edges).materialize()
    refs = canon.to_arrow_refs()
    bundle_ref, n_ref = _build_oriented_cc.remote(*refs)
    n = int(ray.get(n_ref))
    partials = ray.data.range(n).map_batches(
        _TriPerVertexStage,
        fn_constructor_args=(bundle_ref,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    class ZeroRows:
        """One (vertex, 0) row per rank slice so triangle-less vertices
        survive the groupby with t = 0 (no driver-side set, no join)."""

        def __init__(self, bundle_ref) -> None:
            self.vert_of_rank = ray.get(bundle_ref)[4]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("id"), np.int64)
            return pa.table({
                "vertex": self.vert_of_rank[ids],
                "t": np.zeros(ids.size, np.int64),
            })

    zeros = ray.data.range(n).map_batches(
        ZeroRows, fn_constructor_args=(bundle_ref,),
        batch_format="pyarrow", batch_size=65536, concurrency=(1, 4),
    )
    tri = (
        partials.union(zeros)
        .groupby("vertex")
        .aggregate(Sum("t", alias_name="t"))
        .materialize()
    )

    class Finish:
        def __init__(self, bundle_ref) -> None:
            b = ray.get(bundle_ref)
            order = np.argsort(b[4])
            self.verts = b[4][order]
            self.deg = b[5][order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("vertex"), np.int64)
            t = np.asarray(batch.column("t"), np.float64)
            d = self.deg[np.searchsorted(self.verts, v)].astype(
                np.float64
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                cc = np.where(
                    d >= 2.0, 2.0 * t / (d * (d - 1.0)), 0.0
                )
            return pa.table({"vertex": v, "cc": cc})

    return tri.map_batches(
        Finish, fn_constructor_args=(bundle_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    )


def clustering_numpy(
    src: np.ndarray, dst: np.ndarray, n: int
) -> dict[int, float]:
    """Dense oracle (tests): undirected simple view."""
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0.0)
    deg = A.sum(1)
    T = np.diag(A @ A @ A) / 2.0
    out = {}
    for v in range(n):
        if deg[v] > 0:
            out[v] = (
                2.0 * T[v] / (deg[v] * (deg[v] - 1.0))
                if deg[v] >= 2 else 0.0
            )
    return out
