"""k-truss decomposition (Cohen 2008): the maximal subgraph in which
every edge lies on ≥ k−2 triangles of the subgraph itself.

Not shipped by the reference (its decompositions stop at k-core,
`algorithms/kcore_decomposition.hpp`); in its vocabulary each peel
round is the triangle-support mxm (A·A ∘ A, the §2.5 north-star
composition) followed by a masked filter.

Two physical forms per round, mirroring ``pipelines/triangles``' dual
kernel (≙ the reference's gather-vs-scatter choice, blas2.hpp:1132),
auto-selected by the CURRENT surviving edge count:

- ``broadcast`` (< threshold): the oriented CSR bundle is built ON A
  WORKER from the edge Dataset's block refs and peeled ON A WORKER —
  the driver never holds an edge array, only (all_kept, m) scalars
  and the next round's block ref. Zero shuffles per round.
- ``shuffle`` (≥ threshold): the all-Dataset scale path — degree
  orientation, per-source wedge emission, closing-edge match and
  per-edge credit aggregation are groupby/map_groups stages; edge
  state stays a Dataset end-to-end. O(#edges) never touches one
  machine.

Support recomputation is from scratch each round — decremental
updates would save work but break the round-synchronous semantics the
SQL twin unrolls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class _SupportStage:
    """Per-batch wedge enumeration over a broadcast oriented CSR,
    emitting PARTIAL per-edge support bincounts (each found triangle
    credits its three rank-edges)."""

    def __init__(self, bundle_ref) -> None:
        (
            self.indptr, self.nbrs, self.keys, self.n,
        ) = ray.get(bundle_ref)[:4]

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


@ray.remote(num_returns=2)
def _build_oriented_kt(*tables: pa.Table):
    """Degree-rank-oriented CSR bundle built on a WORKER from the
    canonical edge blocks (the driver passes refs only). Returns
    (indptr, nbrs rank-sorted, sorted rank-edge keys, n, vert_of_rank,
    key_lo_ranks, key_hi_ranks) plus the scalar n."""
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        list(tables), columns={"src": pa.int64(), "dst": pa.int64()}
    )
    u = np.asarray(t.column("src"), np.int64)
    v = np.asarray(t.column("dst"), np.int64)
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
    return (indptr, hi_s, keys_sorted, n, vert_of_rank, lo_s, hi_s), n


@ray.remote(num_returns=2)
def _peel(bundle, need: int, *sup_tables: pa.Table):
    """Worker-side peel: fold the support partials, drop edges below
    ``need``, emit the surviving canonical edge block (stays in the
    object store) + (all_kept, m_next) scalars for the driver."""
    indptr, nbrs, keys, n, vert_of_rank, klo, khi = bundle
    sup = np.zeros(keys.size, np.int64)
    for t in sup_tables:
        if t.num_columns and t.num_rows:
            sup[np.asarray(t.column("eidx"), np.int64)] += np.asarray(
                t.column("cnt"), np.int64
            )
    ok = sup >= need
    ou, ov = vert_of_rank[klo[ok]], vert_of_rank[khi[ok]]
    u = np.minimum(ou, ov)
    v = np.maximum(ou, ov)
    o = np.lexsort((v, u))
    t = pa.table({"src": pa.array(u[o]), "dst": pa.array(v[o])})
    return t, (bool(ok.all()), int(u.size))


def _round_broadcast(canon: "ray.data.Dataset", need: int):
    """One support+peel round with worker-resident state (the driver
    touches block refs and two scalars only)."""
    refs = canon.to_arrow_refs()
    bundle_ref, n_ref = _build_oriented_kt.remote(*refs)
    n = int(ray.get(n_ref))
    if n == 0:
        return canon, True, 0
    sup_refs = (
        ray.data.range(n)
        .map_batches(
            _SupportStage,
            fn_constructor_args=(bundle_ref,),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, 8),
        )
        .to_arrow_refs()
    )
    t_ref, meta_ref = _peel.remote(bundle_ref, need, *sup_refs)
    all_kept, m_next = ray.get(meta_ref)
    return ray.data.from_arrow_refs([t_ref]), all_kept, m_next


def _support_round_shuffle(
    canon: "ray.data.Dataset",
    degree_broadcast_limit: int | None = None,
    weight_col: str | None = None,
) -> "ray.data.Dataset":
    """Per-edge triangle support as a Dataset of oriented
    (a, b, sup) rows — the all-Dataset scale path. Degree-rank
    orientation bounds wedge emission by out-degree O(√m); the
    closing-edge match and the 3-way credit both run as
    groupby/map_groups stages (no driver state). Degrees broadcast
    below the vertex limit and attach by hash JOIN above it
    (stages/graph.py orient_by_degree_rank — the 10^12-vertex
    route); either way oriented rows carry bd = deg(b) so wedge
    emission needs no degree lookup.

    ``weight_col``: WEIGHTED support — the edge weight rides the
    orientation (carry column), wedges emit their two apex-edge
    weights, the close exchange takes min(w1, w2, w_closing) per
    triangle and credits all three edges with that minimum, and the
    support fold sums float credits (exact for integer-valued
    weights). sup is then float64."""
    from alp_ray.stages.graph import orient_by_degree_rank
    from alp_ray.util import coarse_parts

    weighted = weight_col is not None
    n_deg_parts = coarse_parts()

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            np.asarray(batch.column("src"), np.int64),
            np.asarray(batch.column("dst"), np.int64),
        ])
        vv, cc = np.unique(both, return_counts=True)
        return pa.table(
            {
                "v": pa.array(vv),
                "c": pa.array(cc),
                "__part": pa.array(vv % n_deg_parts),
            }
        )

    def deg_fold(group: pa.Table) -> pa.Table:
        # Coarse-partition fold (cheaper than an exact groupby-sum at
        # 10M+ vertices — Ray's sort shuffle orders only the part key).
        if "v" not in group.column_names or group.num_rows == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "deg": pa.array([], pa.int64())}
            )
        v = np.asarray(group.column("v"), np.int64)
        c = np.asarray(group.column("c"), np.int64)
        uniq, inv = np.unique(v, return_inverse=True)
        deg = np.bincount(inv, weights=c, minlength=uniq.size)
        return pa.table(
            {"v": pa.array(uniq), "deg": pa.array(deg.astype(np.int64))}
        )

    deg_ds = (
        canon.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(deg_fold, batch_format="pyarrow")
    )
    kw = {}
    if degree_broadcast_limit is not None:
        kw["broadcast_limit"] = degree_broadcast_limit
    if weighted:
        kw["carry"] = (weight_col,)
    oriented = orient_by_degree_rank(canon, deg_ds, **kw).materialize()

    n_parts = n_deg_parts

    def tag_src(batch: pa.Table) -> pa.Table:
        part = np.asarray(batch.column("a"), np.int64) % n_parts
        return batch.append_column("__part", pa.array(part))

    def _wedge_empty() -> pa.Table:
        cols = {
            "e1": pa.array([], pa.int64()),
            "e2": pa.array([], pa.int64()),
            "apex": pa.array([], pa.int64()),
        }
        if weighted:
            cols["w1"] = pa.array([], pa.float64())
            cols["w2"] = pa.array([], pa.float64())
        return pa.table(cols)

    def wedges_multi(group: pa.Table) -> pa.Table:
        """All sources of one coarse partition, vectorized per
        out-degree class (no per-source Python dispatch). Weighted
        mode additionally emits the two apex-edge weights, gathered
        with the same fancy indices as the neighbour ids."""
        if "b" not in group.column_names or group.num_rows < 2:
            return _wedge_empty()
        a = np.asarray(group.column("a"), np.int64)
        b = np.asarray(group.column("b"), np.int64)
        nd = np.asarray(group.column("bd"), np.int64)
        w = (
            np.asarray(group.column(weight_col), np.float64)
            if weighted else None
        )
        order = np.lexsort((b, nd, a))  # by src, then nbr rank
        a, b = a[order], b[order]
        if weighted:
            w = w[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, a.size])
        e1s, e2s, apexes, w1s, w2s = [], [], [], [], []
        for d in np.unique(lens):
            if d < 2:
                continue
            seg = starts[lens == d]
            idx = seg[:, None] + np.arange(d)[None, :]
            nb = b[idx]  # (n_seg, d) rank-sorted out-neighbours
            iu, ju = np.triu_indices(int(d), 1)
            e1s.append(nb[:, iu].ravel())
            e2s.append(nb[:, ju].ravel())
            apexes.append(np.repeat(a[seg], iu.size))
            if weighted:
                wb = w[idx]
                w1s.append(wb[:, iu].ravel())
                w2s.append(wb[:, ju].ravel())
        if not e1s:
            return _wedge_empty()
        cols = {
            "e1": pa.array(np.concatenate(e1s)),
            "e2": pa.array(np.concatenate(e2s)),
            "apex": pa.array(np.concatenate(apexes)),
        }
        if weighted:
            cols["w1"] = pa.array(np.concatenate(w1s))
            cols["w2"] = pa.array(np.concatenate(w2s))
        return pa.table(cols)

    # Materialize between the chained coarse exchanges: one fused lazy
    # plan runs the three all-to-all ops inside a single streaming
    # topology and measures ~25% slower than pinned intermediates at
    # 3M+ edges (object-store pressure); the wedge set is also consumed
    # by the close exchange only, so pinning it is free.
    wedge_ds = (
        oriented.map_batches(tag_src, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(wedges_multi, batch_format="pyarrow")
        .materialize()
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        cols = {
            "e1": batch.column("a"),
            "e2": batch.column("b"),
            "apex": pa.array(np.full(len(batch), -1, np.int64)),
        }
        if weighted:
            # The marker carries the CLOSING edge's weight as w1.
            cols["w1"] = batch.column(weight_col)
            cols["w2"] = pa.array(np.zeros(len(batch)))
        return pa.table(cols)

    def tag_pair(batch: pa.Table) -> pa.Table:
        if "e1" not in batch.column_names:
            t = _wedge_empty()
            return t.append_column("__part", pa.array([], pa.int64()))
        e1 = np.asarray(batch.column("e1"), np.int64)
        e2 = np.asarray(batch.column("e2"), np.int64)
        part = (e1 * 2654435761 + e2) % n_parts
        return batch.append_column("__part", pa.array(part))

    unioned = (
        wedge_ds.map_batches(tag_pair, batch_format="pyarrow")
        .union(
            oriented.map_batches(tag_edges, batch_format="pyarrow")
            .map_batches(tag_pair, batch_format="pyarrow")
        )
    )

    credit_dtype = pa.float64() if weighted else pa.int64()

    def close_multi(group: pa.Table) -> pa.Table:
        """One coarse partition of wedge + edge-marker rows, keyed by
        the closing pair (e1, e2): pairs that carry a marker
        (apex == −1) close every wedge row in their segment — credit
        (apex,e1), (apex,e2) and (e1,e2). Unweighted credit: 1 per
        triangle (pair credit = wedge count). Weighted credit: the
        triangle's min(w1, w2, w_closing), pair credit = Σ of mins.
        Fully vectorized over segments."""
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "credit": pa.array([], credit_dtype),
            }
        )
        if "e1" not in group.column_names or group.num_rows == 0:
            return empty
        e1 = np.asarray(group.column("e1"), np.int64)
        e2 = np.asarray(group.column("e2"), np.int64)
        apex = np.asarray(group.column("apex"), np.int64)
        order = np.lexsort((apex, e2, e1))  # markers first per pair
        e1, e2, apex = e1[order], e2[order], apex[order]
        if weighted:
            w1 = np.asarray(group.column("w1"), np.float64)[order]
            w2 = np.asarray(group.column("w2"), np.float64)[order]
        new_seg = np.r_[True, (e1[1:] != e1[:-1]) | (e2[1:] != e2[:-1])]
        seg_id = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        has_marker = apex[starts] == -1  # ≤1 marker (edges unique)
        wr = (apex >= 0) & has_marker[seg_id]
        if not wr.any():
            return empty
        xs, yy, zz = apex[wr], e1[wr], e2[wr]
        if weighted:
            # closing-edge weight per segment = the marker row's w1
            # (markers sort first within their segment).
            wm_seg = np.zeros(starts.size)
            wm_seg[has_marker] = w1[starts[has_marker]]
            tri = np.minimum(
                np.minimum(w1[wr], w2[wr]), wm_seg[seg_id[wr]]
            )
            w_seg = np.bincount(
                seg_id[wr], weights=tri, minlength=starts.size
            )
            apex_credit = np.concatenate([tri, tri])
        else:
            w_seg = np.bincount(seg_id[wr], minlength=starts.size)
            apex_credit = np.ones(2 * xs.size, np.int64)
        closed = np.flatnonzero(has_marker & (w_seg > 0))
        a = np.concatenate([xs, xs, e1[starts[closed]]])
        b = np.concatenate([yy, zz, e2[starts[closed]]])
        c = np.concatenate([apex_credit, w_seg[closed]])
        if not weighted:
            c = c.astype(np.int64)
        cols = {"a": pa.array(a), "b": pa.array(b), "credit": pa.array(c)}
        if weighted:
            # Each credit row targets one specific edge whose weight is
            # known locally — carry it so survivors keep their weights
            # without a join back: (x,e1)→w1, (x,e2)→w2, (e1,e2)→wm.
            cols["w_edge"] = pa.array(
                np.concatenate([w1[wr], w2[wr], wm_seg[closed]])
            )
        return pa.table(cols)

    credits = unioned.groupby("__part").map_groups(
        close_multi, batch_format="pyarrow"
    ).materialize()

    def tag_credit(batch: pa.Table) -> pa.Table:
        if "a" not in batch.column_names:
            cols = {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "credit": pa.array([], credit_dtype),
            }
            if weighted:
                cols["w_edge"] = pa.array([], pa.float64())
            cols["__part"] = pa.array([], pa.int64())
            return pa.table(cols)
        a = np.asarray(batch.column("a"), np.int64)
        b = np.asarray(batch.column("b"), np.int64)
        return batch.append_column(
            "__part", pa.array((a * 2654435761 + b) % n_parts)
        )

    def support_fold(group: pa.Table) -> pa.Table:
        """Coarse-partition fold of credit rows: exact per-(a,b)
        support via one lexsort + segment bincount. Every credit row
        is an edge by construction (apex credits are oriented edges of
        their own wedge; pair credits matched a marker in the close
        exchange), so the round-4 edge-marker union — which re-shipped
        all m edge rows through this exchange just to carry is_edge —
        is gone; zero-support edges simply don't appear, which is the
        same peel outcome for every k ≥ 3 (need ≥ 1)."""
        cols0 = {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "sup": pa.array([], credit_dtype),
        }
        if weighted:
            cols0["weight"] = pa.array([], pa.float64())
        empty = pa.table(cols0)
        if "a" not in group.column_names or group.num_rows == 0:
            return empty
        a = np.asarray(group.column("a"), np.int64)
        b = np.asarray(group.column("b"), np.int64)
        cr = np.asarray(
            group.column("credit"),
            np.float64 if weighted else np.int64,
        )
        order = np.lexsort((b, a))
        a, b, cr = a[order], b[order], cr[order]
        new_seg = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        seg_id = np.cumsum(new_seg) - 1
        n_seg = int(seg_id[-1]) + 1
        # bincount accumulates in element order (lexsorted) — exact
        # anyway for integer-valued weights.
        sup = np.bincount(seg_id, weights=cr, minlength=n_seg)
        starts = np.flatnonzero(new_seg)
        cols = {
            "a": pa.array(a[starts]),
            "b": pa.array(b[starts]),
            "sup": pa.array(sup if weighted else sup.astype(np.int64)),
        }
        if weighted:
            we = np.asarray(group.column("w_edge"), np.float64)[order]
            cols["weight"] = pa.array(we[starts])
        return pa.table(cols)

    return (
        credits.map_batches(tag_credit, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(support_fold, batch_format="pyarrow")
    )


def _round_shuffle(
    canon: "ray.data.Dataset",
    need: int,
    m: int,
    degree_broadcast_limit: int | None = None,
):
    # The shuffle support omits zero-support edges entirely (they only
    # existed as marker rows through the final exchange) — identical
    # peel outcome iff they would be dropped anyway, i.e. need >= 1.
    assert need >= 1, "shuffle path requires k >= 3"
    sup = _support_round_shuffle(canon, degree_broadcast_limit)

    def keep(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64())}
        )
        if "sup" not in batch.column_names or len(batch) == 0:
            return empty
        s = np.asarray(batch.column("sup"), np.int64)
        a = np.asarray(batch.column("a"), np.int64)[s >= need]
        b = np.asarray(batch.column("b"), np.int64)[s >= need]
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b)),
                "dst": pa.array(np.maximum(a, b)),
            }
        )

    nxt = sup.map_batches(keep, batch_format="pyarrow").materialize()
    m_next = nxt.count()
    return nxt, m_next == m, m_next


def _round_shuffle_weighted(
    canon: "ray.data.Dataset",
    thr: float,
    m: int,
    degree_broadcast_limit: int | None = None,
):
    """One weighted support-and-peel round on the all-Dataset scale
    path: (src, dst, weight) in, survivors with Σ(min triangle
    weight) ≥ thr out. Zero-support edges never earn a credit row in
    the shuffle support, so they're omitted — identical peel outcome
    for any thr > 0."""
    assert thr > 0, "weighted shuffle path requires threshold > 0"
    sup = _support_round_shuffle(
        canon, degree_broadcast_limit, weight_col="weight"
    )

    def keep(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src": pa.array([], pa.int64()),
             "dst": pa.array([], pa.int64()),
             "weight": pa.array([], pa.float64())}
        )
        if "sup" not in batch.column_names or len(batch) == 0:
            return empty
        # Integer-valued weights ⇒ the float support sum and the >=
        # compare are exact in any accumulation order.
        s = np.asarray(batch.column("sup"), np.float64)
        ok = s >= thr
        a = np.asarray(batch.column("a"), np.int64)[ok]
        b = np.asarray(batch.column("b"), np.int64)[ok]
        w = np.asarray(batch.column("weight"), np.float64)[ok]
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b)),
                "dst": pa.array(np.maximum(a, b)),
                "weight": pa.array(w),
            }
        )

    nxt = sup.map_batches(keep, batch_format="pyarrow").materialize()
    m_next = nxt.count()
    return nxt, m_next == m, m_next


def ktruss(
    edges: "ray.data.Dataset",
    k: int = 4,
    max_rounds: int = 100,
    method: str = "auto",
    broadcast_threshold: int = 2_000_000,
    as_dataset: bool = False,
    degree_broadcast_limit: int | None = None,
    assume_canonical: bool = False,
) -> tuple:
    """Surviving canonical (src < dst) edges of the k-truss + the
    number of support rounds computed (the last round verifies the
    fixpoint). ``edges`` may be directed — the undirected simple edge
    set is derived first (``assume_canonical=True`` skips that dedup
    exchange for callers whose input is already distinct (src < dst),
    e.g. truss_decomposition's per-level survivor sets). Edge state
    lives in the object store (or as a Dataset) between rounds; the
    driver holds only scalars."""
    from alp_ray.stages.graph import canonicalize
    from alp_ray.util import concat_blocks

    canon = (
        edges.materialize() if assume_canonical
        else canonicalize(edges).materialize()
    )
    m = canon.count()
    need = k - 2
    rounds = 0
    while m and rounds < max_rounds:
        mode = method
        if mode == "auto":
            mode = (
                "broadcast" if m <= broadcast_threshold else "shuffle"
            )
        if mode == "broadcast":
            canon, all_kept, m = _round_broadcast(canon, need)
        else:
            canon, all_kept, m = _round_shuffle(
                canon, need, m, degree_broadcast_limit
            )
        rounds += 1
        if all_kept:
            break
    if as_dataset:
        return canon, rounds
    t = concat_blocks(
        canon, columns={"src": pa.int64(), "dst": pa.int64()}
    )
    u = np.asarray(t.column("src"), np.int64)
    v = np.asarray(t.column("dst"), np.int64)
    o = np.lexsort((v, u))
    return (
        pa.table({"src": pa.array(u[o]), "dst": pa.array(v[o])}),
        rounds,
    )


@ray.remote(num_returns=2)
def _peel_weighted(thr: float, max_rounds: int, *tables: pa.Table):
    """Worker-resident WEIGHTED peel: per round, every edge's weighted
    support = Σ over incident triangles of the triangle's MIN edge
    weight; edges below ``thr`` drop; repeat to fixpoint. Triangle
    enumeration is the same vectorized oriented-CSR wedge kernel as
    the unweighted broadcast form; the wedge gather indices double as
    edge indices, so the three weight lookups are pure fancy-indexing
    (no key probes beyond the closing edge's)."""
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        list(tables),
        columns={"src": pa.int64(), "dst": pa.int64(),
                 "weight": pa.float64()},
    )
    u = np.asarray(t.column("src"), np.int64)
    v = np.asarray(t.column("dst"), np.int64)
    w = np.asarray(t.column("weight"), np.float64)
    rounds = 0
    while u.size and rounds < max_rounds:
        rounds += 1
        both = np.concatenate([u, v])
        verts, inv = np.unique(both, return_inverse=True)
        deg = np.bincount(inv, minlength=verts.size)
        n = verts.size
        order = np.lexsort((verts, deg))
        rank_of = np.empty(n, np.int64)
        rank_of[order] = np.arange(n)
        vert_of_rank = verts[order]
        ra, rb = rank_of[inv[: u.size]], rank_of[inv[u.size:]]
        lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
        o2 = np.argsort(lo * n + hi)
        lo_s, hi_s, w_s = lo[o2], hi[o2], w[o2]
        keys = lo_s * n + hi_s
        indptr = np.searchsorted(lo_s, np.arange(n + 1))
        sup = np.zeros(keys.size, np.float64)
        outdeg = np.diff(indptr)
        for d in np.unique(outdeg):
            if d < 2:
                continue
            sel = np.flatnonzero(outdeg == d)
            idx = indptr[sel][:, None] + np.arange(d)[None, :]
            nb = hi_s[idx]  # (n_sel, d) rank-sorted out-neighbours
            iu, ju = np.triu_indices(int(d), 1)
            wk = (nb[:, iu] * n + nb[:, ju]).ravel()
            pos = np.clip(np.searchsorted(keys, wk), 0, keys.size - 1)
            hit = keys[pos] == wk
            if not hit.any():
                continue
            e_xy = idx[:, iu].ravel()[hit]
            e_xz = idx[:, ju].ravel()[hit]
            e_yz = pos[hit]
            tri_w = np.minimum(
                np.minimum(w_s[e_xy], w_s[e_xz]), w_s[e_yz]
            )
            for ep in (e_xy, e_xz, e_yz):
                np.add.at(sup, ep, tri_w)
        # Weights are integer-valued by the fixture contract, so the
        # float sums and the >= compare are exact in any order.
        ok = sup >= thr
        ou, ov = vert_of_rank[lo_s[ok]], vert_of_rank[hi_s[ok]]
        nu, nv = np.minimum(ou, ov), np.maximum(ou, ov)
        if ok.all():
            u, v, w = nu, nv, w_s[ok]
            break
        u, v, w = nu, nv, w_s[ok]
    o = np.lexsort((v, u))
    out = pa.table(
        {"src": pa.array(u[o]), "dst": pa.array(v[o]),
         "weight": pa.array(w[o])}
    )
    return out, rounds


def ktruss_weighted(
    edges: "ray.data.Dataset",
    threshold: float,
    weight_col: str = "weight",
    max_rounds: int = 100,
    method: str = "auto",
    broadcast_threshold: int = 2_000_000,
    degree_broadcast_limit: int | None = None,
) -> tuple[pa.Table, int]:
    """WEIGHTED k-truss (min-weight triangle support): the maximal
    subgraph where every edge's Σ(min triangle weight) ≥ ``threshold``
    — the weighted generalization of the support-and-peel loop. Input:
    (src, dst, weight) edges, any orientation; canonicalized to
    (lo, hi) with MIN weight per undirected pair.

    Two physical forms, like unweighted `ktruss`: ``broadcast``
    (worker-resident vectorized peel — the whole graph on ONE worker
    from block refs) under ``broadcast_threshold`` edges, and
    ``shuffle`` — the all-Dataset scale path: the unweighted
    `_support_round_shuffle` with the edge weight carried through
    orientation and wedge emission, min-folded per triangle at the
    closing-pair match (`close_multi`) and summed per edge in
    `support_fold`. ``degree_broadcast_limit`` forwards to the
    degree-attachment route choice (broadcast vs hash join).

    Returns (surviving canonical (src, dst, weight) table, rounds)."""
    from ray.data.aggregate import Min

    from alp_ray.util import concat_blocks

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        ww = np.asarray(batch.column(weight_col), np.float64)
        keep = s != d
        s, d, ww = s[keep], d[keep], ww[keep]
        return pa.table(
            {
                "src": np.minimum(s, d),
                "dst": np.maximum(s, d),
                "weight": ww,
            }
        )

    canonical = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min("weight", alias_name="weight"))
        .materialize()
    )
    m = canonical.count()
    if m == 0:
        return (
            pa.table(
                {"src": pa.array([], pa.int64()),
                 "dst": pa.array([], pa.int64()),
                 "weight": pa.array([], pa.float64())}
            ),
            0,
        )
    mode = method
    if mode == "auto":
        mode = "broadcast" if m <= broadcast_threshold else "shuffle"
    if mode == "broadcast":
        if m > broadcast_threshold:
            raise ValueError(
                f"ktruss_weighted broadcast peel holds the full graph "
                f"on one worker; {m} edges exceeds the "
                f"{broadcast_threshold} bound — use method='shuffle'"
            )
        t_ref, rounds_ref = _peel_weighted.remote(
            float(threshold), max_rounds, *canonical.to_arrow_refs()
        )
        return ray.get(t_ref), int(ray.get(rounds_ref))
    canon_ds = canonical
    rounds = 0
    while m and rounds < max_rounds:
        canon_ds, all_kept, m = _round_shuffle_weighted(
            canon_ds, float(threshold), m, degree_broadcast_limit
        )
        rounds += 1
        if all_kept:
            break
    t = concat_blocks(
        canon_ds,
        columns={"src": pa.int64(), "dst": pa.int64(),
                 "weight": pa.float64()},
    )
    u = np.asarray(t.column("src"), np.int64)
    v = np.asarray(t.column("dst"), np.int64)
    w = np.asarray(t.column("weight"), np.float64)
    o = np.lexsort((v, u))
    return (
        pa.table(
            {"src": pa.array(u[o]), "dst": pa.array(v[o]),
             "weight": pa.array(w[o])}
        ),
        rounds,
    )


def _support_counts(u: np.ndarray, v: np.ndarray):
    """Unweighted triangle support of a canonical edge set via the
    oriented-CSR wedge kernel (worker-side numpy). Returns
    (sup, lo_verts, hi_verts) aligned to the rank-key edge order."""
    both = np.concatenate([u, v])
    verts, inv = np.unique(both, return_inverse=True)
    deg = np.bincount(inv, minlength=verts.size)
    n = verts.size
    order = np.lexsort((verts, deg))
    rank_of = np.empty(n, np.int64)
    rank_of[order] = np.arange(n)
    vert_of_rank = verts[order]
    ra, rb = rank_of[inv[: u.size]], rank_of[inv[u.size:]]
    lo, hi = np.minimum(ra, rb), np.maximum(ra, rb)
    o2 = np.argsort(lo * n + hi)
    lo_s, hi_s = lo[o2], hi[o2]
    keys = lo_s * n + hi_s
    indptr = np.searchsorted(lo_s, np.arange(n + 1))
    sup = np.zeros(keys.size, np.int64)
    outdeg = np.diff(indptr)
    for d in np.unique(outdeg):
        if d < 2:
            continue
        sel = np.flatnonzero(outdeg == d)
        idx = indptr[sel][:, None] + np.arange(d)[None, :]
        nb = hi_s[idx]
        iu, ju = np.triu_indices(int(d), 1)
        wk = (nb[:, iu] * n + nb[:, ju]).ravel()
        pos = np.clip(np.searchsorted(keys, wk), 0, keys.size - 1)
        hit = keys[pos] == wk
        if not hit.any():
            continue
        for ep in (idx[:, iu].ravel()[hit], idx[:, ju].ravel()[hit],
                   pos[hit]):
            np.add.at(sup, ep, 1)
    return sup, vert_of_rank[lo_s], vert_of_rank[hi_s]


@ray.remote(num_returns=2)
def _truss_decompose_worker(max_k: int, *tables: pa.Table):
    """Worker-resident full truss decomposition: all levels' peels run
    in ONE task over numpy arrays (zero per-level Ray round trips —
    the Dataset level loop costs ~6 levels × ~3 rounds × ~2 s of fixed
    exchange overhead at fixture scale). Same successive-fixpoint
    algorithm as the Dataset path."""
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        list(tables), columns={"src": pa.int64(), "dst": pa.int64()}
    )
    u0 = np.asarray(t.column("src"), np.int64)
    v0 = np.asarray(t.column("dst"), np.int64)
    span = int(max(u0.max(initial=0), v0.max(initial=0))) + 1
    key0 = np.sort(u0 * span + v0)
    tr = np.full(key0.size, 2, np.int64)
    u, v = u0, v0
    k = 3
    rounds: dict[int, int] = {}
    while u.size and k <= max_k:
        r = 0
        while True:
            r += 1
            sup, ou, ov = _support_counts(u, v)
            ok = sup >= (k - 2)
            nu = np.minimum(ou[ok], ov[ok])
            nv = np.maximum(ou[ok], ov[ok])
            done = bool(ok.all())
            u, v = nu, nv
            if done or not u.size:
                break
        rounds[k] = r
        if u.size:
            tr[np.searchsorted(key0, u * span + v)] = k
        k += 1
    lo0 = key0 // span
    hi0 = key0 % span
    out = pa.table(
        {"src": pa.array(lo0), "dst": pa.array(hi0),
         "trussness": pa.array(tr)}
    )
    return out, rounds


def truss_decomposition(
    edges: "ray.data.Dataset",
    method: str = "auto",
    max_k: int = 64,
    broadcast_threshold: int = 2_000_000,
    degree_broadcast_limit: int | None = None,
) -> tuple["ray.data.Dataset", dict[int, int]]:
    """Per-edge trussness t(e) = max k such that e survives the
    k-truss (t = 2 for triangle-free edges) — the full decomposition
    the reference's smoke k-truss only samples at one k. Successive
    levels reuse the previous level's fixpoint as the next start
    (k-truss ⊆ (k−1)-truss), so level k peels only the incremental
    drop; the per-edge max-level tag is one final groupby.

    Physical forms: below ``broadcast_threshold`` edges the WHOLE
    decomposition runs worker-resident in one task (zero per-level
    exchanges); above it (or with method="shuffle") each level is a
    Dataset ktruss peel. Returns ((src, dst, trussness) Dataset over
    the canonical edge set, {k: peel_rounds}) — the rounds dict lets
    hash-gated callers assert their unrolled-twin bounds."""
    from ray.data.aggregate import Max

    from alp_ray.stages.graph import canonicalize

    canon = canonicalize(edges).materialize()
    m = canon.count()
    if method == "auto" and 0 < m <= broadcast_threshold:
        t_ref, rounds_ref = _truss_decompose_worker.remote(
            max_k, *canon.to_arrow_refs()
        )
        return ray.data.from_arrow_refs([t_ref]), ray.get(rounds_ref)

    def tag(k: int):
        def fn(batch: pa.Table) -> pa.Table:
            if "src" not in batch.column_names or len(batch) == 0:
                return pa.table(
                    {"src": pa.array([], pa.int64()),
                     "dst": pa.array([], pa.int64()),
                     "k": pa.array([], pa.int64())}
                )
            return pa.table(
                {
                    "src": batch.column("src").cast(pa.int64()),
                    "dst": batch.column("dst").cast(pa.int64()),
                    "k": pa.array(np.full(len(batch), k, np.int64)),
                }
            )

        return fn

    tagged = canon.map_batches(tag(2), batch_format="pyarrow")
    cur = canon
    k = 3
    rounds_per_level: dict[int, int] = {}
    while m and k <= max_k:
        cur, rounds = ktruss(
            cur, k=k, method=method, as_dataset=True,
            broadcast_threshold=broadcast_threshold,
            degree_broadcast_limit=degree_broadcast_limit,
            assume_canonical=True,  # canon / previous survivors
        )
        cur = cur.materialize()
        m = cur.count()
        rounds_per_level[k] = rounds
        if m:
            tagged = tagged.union(
                cur.map_batches(tag(k), batch_format="pyarrow")
            )
        k += 1
    out = (
        tagged.groupby(["src", "dst"])
        .aggregate(Max("k", alias_name="trussness"))
    )
    return out, rounds_per_level


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
