"""Sampled harmonic closeness centrality on the GraphShard engine.

H(v) = Σ_{s ∈ S, 0 < d(s,v) ≤ L} 1/d(s,v) over a fixed source sample S
(Boldi & Vigna, "Axioms for centrality", Internet Math. 10, 2014 —
harmonic handles disconnected graphs where classic closeness degrades).
Expressible in the reference's vocabulary as BFS matrix powers over the
boolean semiring (≙ knn/mpv, graphblas/algorithms/knn.hpp) accumulated
through a 1/level fold.

Source batches ride the engine's multi-column supersteps (the
betweenness machinery): state is an (n_local, S) level matrix, one BFS
sweep serves S sources. Per-vertex accumulation runs column-by-column
in source order, so results are bitwise independent of batch size.
"""

from __future__ import annotations

import numpy as np

from alp_ray.state.engine import GraphEngine


def _bfs_chunk_levels(
    engine: GraphEngine, chunk: list[int], max_levels: int
) -> None:
    """Multi-source BFS for one source chunk; leaves the (n_local, S)
    level matrix in state ``"_hc_level"`` (-1 = unreached, 0 = self)."""
    S = len(chunk)
    ncols = {"_ncols": S}

    def init(state, ctx, chunk=chunk, S=S):
        ids = np.arange(ctx["part"], ctx["n"], ctx["P"])
        own = ids[:, None] == np.asarray(chunk)[None, :]
        state["_hc_level"] = np.where(own, 0.0, -1.0)
        state["_hc_front"] = own
        return {}

    engine.map_local(init)

    def pre(state, ctx):
        f = state["_hc_front"]
        return f.astype(np.float64), f.any(axis=1)

    for l in range(1, max_levels + 1):

        def post(state, y, ctx, l=l):
            new = (state["_hc_level"] < -0.5) & (y > 0)
            state["_hc_level"] = np.where(
                new, float(l), state["_hc_level"]
            )
            state["_hc_front"] = new
            return {"fsize": float(new.sum())}

        r = engine.superstep(pre, "plus_first", post, scalars=ncols)
        if r.get("fsize", 0) == 0:
            break


def harmonic_closeness(
    engine: GraphEngine,
    sources: list[int],
    max_levels: int = 12,
    batch: int = 16,
    state_name: str = "hc",
) -> np.ndarray:
    """Accumulated harmonic contributions from ``sources`` (the source
    vertex itself contributes 0 to its own row). Directed semantics:
    distances follow edge direction of the ACTIVE edge set."""
    engine.set_state(state_name, 0.0)
    for lo in range(0, len(sources), batch):
        chunk = [int(s) for s in sources[lo:lo + batch]]
        S = len(chunk)
        _bfs_chunk_levels(engine, chunk, max_levels)

        def acc(state, ctx, S=S):
            lv = state["_hc_level"]
            hc = state[state_name]
            # Column order = source order (bitwise chunk-size invariant).
            for c in range(S):
                col = lv[:, c]
                hc = hc + np.where(col > 0, 1.0 / np.where(
                    col > 0, col, 1.0), 0.0)
            state[state_name] = hc
            return {}

        engine.map_local(acc)
    return engine.get_state_by_vertex(state_name)


def eccentricity(
    engine: GraphEngine,
    sources: list[int],
    max_levels: int = 12,
    batch: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-source (ecc, n_reached) from the same multi-source BFS sweep:
    ecc = max BFS level reached within ``max_levels`` (the exact
    eccentricity when the frontier empties before the cap; a lower
    bound — identical to the capped SQL twin — otherwise), n_reached
    counts the source itself. Driver state is O(#sources) scalars from
    per-shard column maxima/counts."""
    eccs = np.zeros(len(sources), np.int64)
    reach = np.zeros(len(sources), np.int64)
    for lo in range(0, len(sources), batch):
        chunk = [int(s) for s in sources[lo:lo + batch]]
        _bfs_chunk_levels(engine, chunk, max_levels)

        def stats(state, ctx):
            lv = state["_hc_level"]
            mx = lv.max(axis=0) if lv.size else np.full(
                lv.shape[1], -1.0
            )
            return {
                "max": [float(x) for x in mx],
                "cnt": [int(x) for x in (lv >= 0).sum(axis=0)],
            }

        partials = engine.map_local(stats)
        for c in range(len(chunk)):
            eccs[lo + c] = int(
                max(p["max"][c] for p in partials)
            )
            reach[lo + c] = sum(p["cnt"][c] for p in partials)
    return eccs, reach


def harmonic_oracle(
    src: np.ndarray, dst: np.ndarray, n: int,
    sources: list[int], max_levels: int = 12,
) -> np.ndarray:
    """Sequential BFS reference (tests) — same cap, same conventions."""
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    hc = np.zeros(n)
    for s in sources:
        level = np.full(n, -1)
        level[s] = 0
        frontier = [s]
        for l in range(1, max_levels + 1):
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if level[w] == -1:
                        level[w] = l
                        nxt.append(w)
            frontier = nxt
            if not frontier:
                break
        reach = level > 0
        hc[reach] += 1.0 / level[reach]
    return hc
