"""Strongly connected components — distributed FW-BW coloring
(Orzan's coloring algorithm; the standard Pregel SCC, e.g. Yan et al.,
"Pregel Algorithms for Graph Connectivity Problems", VLDB'14). Not in
the reference repo (its Pregel layer ships only the undirected
connected-components program, pregel_connected_components.hpp) — this
is the directed-graph completion of that family, built from the same
engine primitives.

Outer rounds over the still-unassigned subgraph:

1. **Color** (forward phase): every alive vertex starts with its own
   id; MIN-labels propagate along FORWARD edges to fixpoint
   (``min_first`` supersteps with a sparse changed-frontier, exactly
   the components pattern). Fixpoint: ``color(v)`` = min alive vertex
   that can reach v.
2. **Reach** (backward phase): roots (``color(v) == v``) mark
   themselves and propagate "reached" along TRANSPOSE edges (the
   engine's stashed ``rev`` edge set — build_reversed), restricted to
   the sender's color class. Every sender's color ≤ the receiver's
   color (a sender's ancestors include the receiver), so a MAX combine
   (``max_first``) equals the receiver's color iff SOME same-color
   successor is reached — no per-color bookkeeping needed.
3. **Assign**: reached vertices join SCC ``color(v)`` (provably the
   minimum member id of their SCC) and leave the alive set.

Every phase is supersteps + map_local on the shards — the driver sees
only scalar counters. Labels are integers end-to-end, so the result is
bitwise deterministic regardless of block arrival order (the FP-order
gotchas of the float pipelines don't apply).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class SccResult:
    rounds: int
    supersteps: int
    n: int
    m: int


def _color_pre(state, ctx):
    return state["color"], (state["front"] > 0.5) & (state["alive"] > 0.5)


def _color_post(state, y, ctx):
    alive = state["alive"] > 0.5
    better = alive & (y < state["color"])
    state["color"] = np.where(better, y, state["color"])
    state["front"] = better.astype(np.float64)
    return {"changed": float(better.sum())}


def _reach_pre(state, ctx):
    return state["color"], state["front"] > 0.5


def _reach_post(state, y, ctx):
    hit = (
        (state["alive"] > 0.5)
        & (state["reached"] < 0.5)
        & (y == state["color"])
    )
    state["reached"] = np.where(hit, 1.0, state["reached"])
    state["front"] = hit.astype(np.float64)
    return {"changed": float(hit.sum())}


def _fixpoint(engine, pre, sr, post, scalars, sync_every, max_iters):
    """Chunked pipelined supersteps until a no-change iteration (the
    idempotent-overshoot pattern of connected_components)."""
    steps = 0
    while steps < max_iters:
        chunk = min(sync_every, max_iters - steps)
        results = engine.run_supersteps(
            pre, sr, post, iters=chunk, scalars=scalars
        )
        for r in results:
            steps += 1
            if r["changed"] == 0:
                return steps
    return steps


def strongly_connected_components(
    engine: GraphEngine,
    max_rounds: int = 10_000,
    sync_every: int = 8,
    max_iters: int = 10_000,
) -> SccResult:
    """Leaves per-vertex SCC labels (min member id) in state ``"scc"``.

    The engine must hold DIRECTED edges; the transpose is built once as
    a second resident edge set (shard-to-shard bundle exchange, no
    driver traffic) and each phase selects its orientation via the
    ``_edges_key`` scalar — zero rebuilds inside the loop.
    """
    engine.build_reversed("fwd", "rev")
    engine.set_state_use_index("vid")
    engine.set_state("scc", -1.0)
    engine.set_state("alive", 1.0)
    fwd = {"_edges_key": "fwd"}
    rev = {"_edges_key": "rev"}
    rounds = 0
    supersteps = 0
    while rounds < max_rounds:
        rounds += 1

        def init_color(state, ctx):
            alive = state["alive"] > 0.5
            state["color"] = np.where(alive, state["vid"], np.inf)
            state["front"] = alive.astype(np.float64)
            return float(alive.sum())

        remaining = sum(engine.map_local(init_color))
        if remaining == 0:
            rounds -= 1
            break
        supersteps += _fixpoint(
            engine, _color_pre, "min_first", _color_post,
            fwd, sync_every, max_iters,
        )

        def init_reach(state, ctx):
            alive = state["alive"] > 0.5
            root = alive & (state["color"] == state["vid"])
            state["reached"] = root.astype(np.float64)
            state["front"] = root.astype(np.float64)
            return 0.0

        engine.map_local(init_reach)
        supersteps += _fixpoint(
            engine, _reach_pre, "max_first", _reach_post,
            rev, sync_every, max_iters,
        )

        def assign(state, ctx):
            done = (state["alive"] > 0.5) & (state["reached"] > 0.5)
            state["scc"] = np.where(done, state["color"], state["scc"])
            state["alive"] = np.where(done, 0.0, state["alive"])
            return float(done.sum())

        engine.map_local(assign)
    engine.use_edges("fwd")
    return SccResult(
        rounds=rounds, supersteps=supersteps, n=engine.n, m=engine.m
    )
