"""k-truss decomposition (Cohen 2008): the maximal subgraph in which
every edge lies on ≥ k−2 triangles of the subgraph itself.

Not shipped by the reference (its decompositions stop at k-core,
`algorithms/kcore_decomposition.hpp`); in its vocabulary each peel
round is the triangle-support mxm (A·A ∘ A, the §2.5 north-star
composition) followed by a masked filter — which is exactly how it
runs here: per round, DISTRIBUTED per-edge support via the oriented-CSR
wedge kernel of ``pipelines/triangles`` (vertex batches over an actor
pool, broadcast CSR, no per-edge Python), then drop edges below k−2
and repeat until stable.

Support recomputation is from scratch each round — decremental updates
would save work but break the round-synchronous semantics the SQL twin
unrolls. Driver state is the canonical edge array (bounded, asserted);
past the bound the same rounds run with the shuffle-join support path
(three hash joins per round — the `_triangle_count_shuffle` shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_EDGE_LIMIT = 5_000_000


class _SupportStage:
    """Per-batch wedge enumeration over a broadcast oriented CSR,
    emitting PARTIAL per-edge support bincounts (each found triangle
    credits its three rank-edges)."""

    def __init__(self, bundle_ref) -> None:
        (
            self.indptr, self.nbrs, self.keys, self.n,
        ) = ray.get(bundle_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), np.int64)
        sup = np.zeros(self.keys.size, np.int64)
        deg = self.indptr[ids + 1] - self.indptr[ids]
        for d in np.unique(deg):
            if d < 2:
                continue
            sel = ids[deg == d]
            idx = self.indptr[sel][:, None] + np.arange(d)[None, :]
            nb = self.nbrs[idx]  # (n_sel, d) rank-sorted rows
            iu, ju = np.triu_indices(int(d), 1)
            y = nb[:, iu]
            z = nb[:, ju]
            wk = (y * self.n + z).ravel()
            pos = np.clip(
                np.searchsorted(self.keys, wk), 0, self.keys.size - 1
            )
            hit = self.keys[pos] == wk
            if not hit.any():
                continue
            # Triangle (x, y, z): credit edges (x,y), (x,z), (y,z).
            xs = np.repeat(sel, iu.size)[hit]
            yy = y.ravel()[hit]
            zz = z.ravel()[hit]
            for ea, eb in ((xs, yy), (xs, zz), (yy, zz)):
                ek = ea * self.n + eb
                ep = np.searchsorted(self.keys, ek)
                np.add.at(sup, ep, 1)
        nz = np.flatnonzero(sup)
        return pa.table(
            {
                "eidx": pa.array(nz),
                "cnt": pa.array(sup[nz]),
            }
        )


def _oriented_bundle(u: np.ndarray, v: np.ndarray):
    """(indptr, nbrs, sorted rank-edge keys, n_verts, vert_of_rank,
    key_lo, key_hi): degree-rank orientation of canonical edges.
    ``vert_of_rank[r]`` is the ORIGINAL vertex id at rank r (ranks are
    (degree, id)-lex, NOT id order)."""
    both = np.concatenate([u, v])
    verts, inv = np.unique(both, return_inverse=True)
    deg = np.bincount(inv, minlength=verts.size)
    n = verts.size
    order = np.lexsort((verts, deg))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = np.arange(n)
    vert_of_rank = verts[order]
    ra = rank_of[inv[: u.size]]
    rb = rank_of[inv[u.size:]]
    lo = np.minimum(ra, rb)
    hi = np.maximum(ra, rb)
    o2 = np.argsort(lo * n + hi)
    lo_s, hi_s = lo[o2], hi[o2]
    keys_sorted = lo_s * n + hi_s
    indptr = np.searchsorted(lo_s, np.arange(n + 1))
    return indptr, hi_s, keys_sorted, n, vert_of_rank, lo_s, hi_s


def ktruss(
    edges: "ray.data.Dataset",
    k: int = 4,
    max_rounds: int = 100,
) -> tuple[pa.Table, int]:
    """Surviving canonical (src < dst) edges of the k-truss + the
    number of support rounds computed (the last round verifies the
    fixpoint). ``edges`` may be directed — the undirected simple edge
    set is derived first."""
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        edges.select_columns(["src", "dst"]).materialize(),
        columns={"src": pa.int64(), "dst": pa.int64()},
    )
    a = np.asarray(t.column("src"), np.int64)
    b = np.asarray(t.column("dst"), np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    pairs = np.unique(
        np.stack([np.minimum(a, b), np.maximum(a, b)], axis=1), axis=0
    ) if a.size else np.empty((0, 2), np.int64)
    u, v = pairs[:, 0], pairs[:, 1]
    assert u.size <= _EDGE_LIMIT, (
        f"{u.size} edges exceed the driver-held peeling bound — "
        "use the shuffle-join support path"
    )
    rounds = 0
    need = k - 2
    while u.size and rounds < max_rounds:
        indptr, nbrs, keys, n, verts, klo, khi = _oriented_bundle(u, v)
        bref = ray.put((indptr, nbrs, keys, n))
        parts = (
            ray.data.range(n)
            .map_batches(
                _SupportStage,
                fn_constructor_args=(bref,),
                batch_format="pyarrow",
                batch_size=4096,
                concurrency=(1, 8),
            )
            .take_all()
        )
        sup = np.zeros(keys.size, np.int64)
        for r in parts:
            sup[r["eidx"]] += r["cnt"]
        rounds += 1
        ok = sup >= need
        if ok.all():
            break
        ou, ov = verts[klo[ok]], verts[khi[ok]]
        u, v = np.minimum(ou, ov), np.maximum(ou, ov)
    o = np.lexsort((v, u))
    return (
        pa.table({"src": pa.array(u[o]), "dst": pa.array(v[o])}),
        rounds,
    )


def ktruss_numpy(
    src: np.ndarray, dst: np.ndarray, k: int
) -> set[tuple[int, int]]:
    """Sequential oracle: recompute support and peel until stable."""
    edges = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(src, dst)
        if a != b
    }
    need = k - 2
    while True:
        adj: dict[int, set] = {}
        for x, y in edges:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        sup = {
            e: len(adj[e[0]] & adj[e[1]]) for e in edges
        }
        nxt = {e for e in edges if sup[e] >= need}
        if nxt == edges:
            return edges
        edges = nxt
        if not edges:
            return edges
