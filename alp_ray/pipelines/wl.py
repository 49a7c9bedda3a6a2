"""1-dimensional Weisfeiler-Leman color refinement (graph fingerprints).

The classic graph-invariant iteration behind WL graph kernels and
GNN expressiveness analyses: every vertex's color is refined each round
to ``hash(own color, sorted multiset of neighbor colors)``. Colors here
are raw polynomial-fold hashes mod 2³¹−1 —

    h(v) ← fold over nc in sorted(neighbor colors):
        h = (h · 1000003 + nc) % (2³¹−1),    h₀ = c(v)

— so both sides compute the identical integers (hash collisions, were
they ever to occur, are the SAME collision on both sides). Initial
colors are degrees. After k rounds equal colors ⇔ indistinguishable by
k rounds of 1-WL; the color-class histogram is the standard graph
fingerprint.

Physical plan per round: colors broadcast via ``ray.put`` (bounded,
loud fail — the distributed alternative is a colors-Dataset hash join),
ONE map_batches pass emitting per-block (dst, neighbor-color) partials,
coarse dst-hash partitions fold each vertex's sorted color run with a
power-table segment sum (Σ c_i·P^(L−i) mod M ≡ the sequential fold,
since mod distributes) — no per-vertex Python, no groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

M31 = (1 << 31) - 1
P_MULT = 1_000_003

__all__ = ["wl_refinement"]


def wl_refinement(
    edges,
    n: int,
    rounds: int = 4,
):
    """Run ``rounds`` of 1-WL over the SYMMETRIC edge Dataset; returns
    the final per-vertex color array (int64, < 2³¹−1)."""
    import ray

    from alp_ray.stages.graph import _BROADCAST_VERTEX_LIMIT
    from alp_ray.util import coarse_parts

    if n > _BROADCAST_VERTEX_LIMIT:
        raise ValueError(
            f"wl_refinement broadcasts an O(n) color array; n={n} "
            f"exceeds {_BROADCAST_VERTEX_LIMIT}. Use a colors-Dataset "
            "hash join for larger graphs."
        )
    n_parts = coarse_parts()

    es = edges.select_columns(["src", "dst"]).materialize()

    # Initial colors: degrees (computed from the edge refs directly).
    deg = np.zeros(n, np.int64)
    for t in ray.get(es.to_arrow_refs()):
        if "src" in t.column_names and t.num_rows:
            deg += np.bincount(
                np.asarray(t.column("src"), np.int64), minlength=n
            )
    colors = deg % M31

    for _r in range(rounds):
        col_ref = ray.put(colors)

        def partial(batch: pa.Table, _ref=col_ref) -> pa.Table:
            empty = pa.table(
                {"v": pa.array([], pa.int64()),
                 "nc": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int64())}
            )
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            import ray as _ray

            c = _ray.get(_ref)
            s = np.asarray(batch.column("src"), np.int64)
            d = np.asarray(batch.column("dst"), np.int64)
            return pa.table({
                "v": pa.array(d),
                "nc": pa.array(c[s]),
                "__part": pa.array((d * 2654435761) % n_parts),
            })

        def fold(group: pa.Table, _ref=col_ref) -> pa.Table:
            empty = pa.table(
                {"v": pa.array([], pa.int64()),
                 "h": pa.array([], pa.int64())}
            )
            if "v" not in group.column_names or group.num_rows == 0:
                return empty
            import ray as _ray

            c = _ray.get(_ref)
            v = np.asarray(group.column("v"), np.int64)
            nc = np.asarray(group.column("nc"), np.int64)
            order = np.lexsort((nc, v))
            v, nc = v[order], nc[order]
            starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            L = np.diff(np.r_[starts, v.size])
            lmax = int(L.max())
            # pow table P^j mod M31, j = 0..lmax
            pows = np.ones(lmax + 1, np.int64)
            for j in range(1, lmax + 1):
                pows[j] = (pows[j - 1] * P_MULT) % M31
            pos = np.arange(v.size, dtype=np.int64) - np.repeat(starts, L)
            expo = np.repeat(L, L) - 1 - pos
            # h = c0·P^L + Σ nc_i·P^(L-1-pos) (mod M31) — equals the
            # sequential (h·P + nc) fold since mod distributes.
            terms = (nc % M31) * pows[expo] % M31
            # segment sums mod M31: partial sums < 2^53-safe via
            # float? NO — do int64 reduceat then mod (sums < L·M31 ≤
            # 2^31·2^31 overflow risk for L > 2^32 — impossible here,
            # L ≤ n; L·M31 < 2^62 for L < 2^31). reduceat is exact.
            seg = np.add.reduceat(terms, starts) % M31
            vv = v[starts]
            own = c[vv] * pows[L] % M31
            h = (own + seg) % M31
            return pa.table({"v": pa.array(vv), "h": pa.array(h)})

        parts = [
            t
            for t in ray.get(
                es.map_batches(partial, batch_format="pyarrow")
                .groupby("__part")
                .map_groups(fold, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if "v" in t.column_names and t.num_rows
        ]
        new_colors = colors.copy()  # isolated vertices keep c(v)
        for t in parts:
            new_colors[np.asarray(t.column("v"), np.int64)] = (
                np.asarray(t.column("h"), np.int64)
            )
        colors = new_colors
    return colors
