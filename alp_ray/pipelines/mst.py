"""Boruvka minimum spanning forest over a weighted edge Dataset.

Classic Boruvka with a TOTAL deterministic edge order — the packed
integer key ``(w, a, b)`` over the canonical (a = min endpoint,
b = max endpoint) undirected edge — so the forest is UNIQUE even under
weight ties and the whole computation is integer-exact (SQL-twin
reproducible). In the reference's vocabulary each round is an
argmin-monoid mxv (the pair-valued argmin monoid of
``include/graphblas/algorithms/kmeans.hpp:224``) followed by the
hook/compress label contraction that ``pregel_connected_components.hpp``
performs with max-label adoption.

Physical plan (per round, C_r live components):

- labels broadcast once via ``ray.put`` (bounded by
  ``_BROADCAST_VERTEX_LIMIT`` with a loud fail; above the bound the
  documented alternative is the two hash-join route of
  ``orient_by_degree_rank`` plus a distributed pointer-jump on the
  GraphShard engine's CC machinery);
- ONE map_batches pass over the (materialized once) canonical edge
  table emitting per-block per-component argmin partials — duplicate
  edges need NO dedup shuffle because MIN over the packed key is
  duplicate-insensitive, and cross-component filtering drops finished
  regions for free;
- an O(#blocks · C_r)-row driver fold (numpy run-min) + O(C_r)
  pointer-doubling contraction. No groupby, no sort, zero all-to-all
  exchanges in the whole algorithm.

Hook cycles are provably 2-cycles under a strict total edge order
(a length-≥3 cycle would contain a component whose chosen edge is not
its incident minimum), so breaking mutual pairs toward the smaller
label turns the hook graph into a forest and ``ceil(log2 n)`` pointer
doublings reach the roots.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["boruvka_mst"]


def _canonical_weighted(edges, weight_col: str):
    """Canonical (a<b, w) int64 view with block-local min-w dedup —
    global dedup is unnecessary (argmin is duplicate-insensitive), the
    block pass just shrinks what the rounds re-scan."""

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        w = np.asarray(batch.column(weight_col)).astype(np.int64)
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        if s.size == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        order = np.lexsort((w, hi, lo))
        lo, hi, w = lo[order], hi[order], w[order]
        first = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        return pa.table(
            {"a": pa.array(lo[first]), "b": pa.array(hi[first]),
             "w": pa.array(w[first])}
        )

    return edges.map_batches(canon, batch_format="pyarrow")


def boruvka_mst(
    edges,
    n: int,
    rounds: int | None = None,
    weight_col: str = "weight",
):
    """Minimum spanning forest of the undirected weighted graph.

    Returns ``(forest, rounds_used)``: a pyarrow Table with columns
    (src, dst, weight) — the canonical MST edge set, sorted — and the
    number of rounds that actually selected edges. Runs exactly
    ``rounds`` rounds (default ceil(log2 n) + 1; extra rounds past the
    fixpoint are no-ops) so an unrolled SQL twin with the same constant
    matches bitwise; raises if the fixpoint was NOT reached within
    ``rounds`` (the twin would be short).
    """
    import ray

    from alp_ray.stages.graph import _BROADCAST_VERTEX_LIMIT

    if n > _BROADCAST_VERTEX_LIMIT:
        raise ValueError(
            f"boruvka_mst broadcasts an O(n) label array; n={n} exceeds "
            f"{_BROADCAST_VERTEX_LIMIT}. Wire the hash-join + "
            "distributed pointer-jump route for larger graphs."
        )
    if rounds is None:
        rounds = int(np.ceil(np.log2(max(n, 2)))) + 1
    doublings = int(np.ceil(np.log2(max(n, 2)))) + 1
    # Packed key (w·n + a)·n + b must fit int64.
    canon = _canonical_weighted(edges, weight_col).materialize()
    w_max = 0
    for ref in canon.to_arrow_refs():
        tbl = ray.get(ref)
        if "w" in tbl.column_names and tbl.num_rows:
            w_max = max(
                w_max, int(np.asarray(tbl.column("w"), np.int64).max())
            )
    if (w_max + 1) * n * n >= 2**62:
        raise ValueError("packed (w, a, b) key overflows int64")

    labels = np.arange(n, dtype=np.int64)
    chosen: list[np.ndarray] = []
    rounds_used = 0
    nn = np.int64(n)

    for _ in range(rounds):
        lab_ref = ray.put(labels)

        def partials(batch: pa.Table, _ref=lab_ref) -> pa.Table:
            empty = pa.table(
                {"comp": pa.array([], pa.int64()),
                 "key": pa.array([], pa.int64())}
            )
            if "a" not in batch.column_names or batch.num_rows == 0:
                return empty
            import ray as _ray

            lab = _ray.get(_ref)
            a = np.asarray(batch.column("a"), np.int64)
            b = np.asarray(batch.column("b"), np.int64)
            w = np.asarray(batch.column("w"), np.int64)
            la, lb = lab[a], lab[b]
            m = la != lb
            if not m.any():
                return empty
            a, b, w, la, lb = a[m], b[m], w[m], la[m], lb[m]
            key = (w * nn + a) * nn + b
            comp = np.concatenate([la, lb])
            k2 = np.concatenate([key, key])
            order = np.lexsort((k2, comp))
            comp, k2 = comp[order], k2[order]
            first = np.r_[True, comp[1:] != comp[:-1]]
            return pa.table(
                {"comp": pa.array(comp[first]),
                 "key": pa.array(k2[first])}
            )

        blocks = [
            t
            for t in ray.get(
                canon.map_batches(partials, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if "comp" in t.column_names
        ]
        part = (
            pa.concat_tables(blocks)
            if blocks
            else pa.table(
                {"comp": pa.array([], pa.int64()),
                 "key": pa.array([], pa.int64())}
            )
        )
        if part.num_rows == 0:
            break  # fixpoint; remaining rounds are no-ops on both sides
        comp = np.asarray(part.column("comp"), np.int64)
        key = np.asarray(part.column("key"), np.int64)
        order = np.lexsort((key, comp))
        comp, key = comp[order], key[order]
        first = np.r_[True, comp[1:] != comp[:-1]]
        best_comp, best_key = comp[first], key[first]
        rounds_used += 1

        b_ = best_key % nn
        a_ = (best_key // nn) % nn
        chosen.append(best_key)
        # Hook: every component points at the other side of its edge.
        p = np.arange(n, dtype=np.int64)
        la, lb = labels[a_], labels[b_]
        p[best_comp] = np.where(la == best_comp, lb, la)
        # Break mutual (2-cycle) hooks toward the smaller label.
        idx = np.arange(n, dtype=np.int64)
        mutual = (p[p] == idx) & (idx < p)
        p[mutual] = idx[mutual]
        # Compress: pointer doubling to the roots.
        for _d in range(doublings):
            p2 = p[p]
            if np.array_equal(p2, p):
                break
            p = p2
        else:
            raise RuntimeError(
                "pointer doubling did not converge within "
                f"{doublings} steps"
            )
        labels = p[labels]

    else:
        # Ran all rounds — verify the fixpoint actually arrived.
        lab_ref = ray.put(labels)

        def any_cross(tbl: pa.Table, _ref=lab_ref) -> bool:
            if "a" not in tbl.column_names or tbl.num_rows == 0:
                return False
            lab = ray.get(_ref)
            a = np.asarray(tbl.column("a"), np.int64)
            b = np.asarray(tbl.column("b"), np.int64)
            return bool((lab[a] != lab[b]).any())

        for ref in canon.to_arrow_refs():
            if any_cross(ray.get(ref)):
                raise RuntimeError(
                    f"boruvka_mst did not converge in {rounds} rounds"
                )

    if chosen:
        keys = np.unique(np.concatenate(chosen))
    else:
        keys = np.array([], np.int64)
    b_ = keys % nn
    a_ = (keys // nn) % nn
    w_ = keys // (nn * nn)
    return (
        pa.table(
            {"src": pa.array(a_), "dst": pa.array(b_),
             "weight": pa.array(w_)}
        ),
        rounds_used,
    )
