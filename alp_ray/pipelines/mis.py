"""Deterministic maximal independent set (Luby 1986, derandomized with
the fixed priority keys of ``pipelines/coloring``).

Not shipped by the reference (SURVEY §2.7 stops at kcore/labels) but a
one-liner in its vocabulary: per round a masked min-semiring vxm (the
local-min test over UNDECIDED neighbours) plus a second masked vxm
broadcasting the winners — exactly two GraphShard supersteps per round.

With a FIXED total priority order (the packed (hash26, id26) key — ties
impossible) the round-parallel rule "join the MIS iff your key is the
strict minimum among undecided neighbours" converges to the SAME set as
the sequential greedy scan in key order, so the result is deterministic,
oracle-able, and independent of round/block scheduling.

Requires a SYMMETRIC edge set (independence constrains both directions).
"""

from __future__ import annotations

import numpy as np

from alp_ray.pipelines.coloring import _priority_key
from alp_ray.state.engine import GraphEngine


def maximal_independent_set(
    engine: GraphEngine, max_rounds: int = 10_000
) -> tuple[np.ndarray, int]:
    """Returns (boolean in-MIS array indexed by vertex, rounds)."""
    assert engine.n < (1 << 26), "priority packing limit"

    def init(state, ctx):
        ids = np.arange(ctx["part"], ctx["n"], ctx["P"], dtype=np.int64)
        state["key"] = _priority_key(ids).astype(np.float64)
        state["undecided"] = np.ones(ctx["n_local"])
        state["in_mis"] = np.zeros(ctx["n_local"])
        state["won"] = np.zeros(ctx["n_local"])
        return {}

    engine.map_local(init)

    def pre_select(state, ctx):
        return state["key"], state["undecided"] > 0.5

    def post_select(state, y, ctx):
        # y = min key among undecided in-neighbours (+inf if none).
        unc = state["undecided"] > 0.5
        win = unc & (state["key"] < y)
        state["won"] = win.astype(np.float64)
        state["in_mis"] = np.maximum(state["in_mis"], state["won"])
        return {}

    def pre_notify(state, ctx):
        return np.ones_like(state["key"]), state["won"] > 0.5

    def post_notify(state, y, ctx):
        # y < +inf ⇔ some neighbour just joined the MIS.
        unc = state["undecided"] > 0.5
        removed = unc & np.isfinite(y)
        state["undecided"] = (
            unc & ~removed & ~(state["won"] > 0.5)
        ).astype(np.float64)
        return {"remaining": float(state["undecided"].sum())}

    rounds = 0
    remaining = np.inf
    while remaining > 0 and rounds < max_rounds:
        engine.superstep(pre_select, "min_first", post_select)
        scalars = engine.superstep(pre_notify, "min_first", post_notify)
        remaining = scalars.get("remaining", 0.0)
        rounds += 1
    return engine.get_state_by_vertex("in_mis") > 0.5, rounds


def mis_numpy(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Sequential greedy oracle in priority-key order (the set the
    parallel rounds must reproduce). Symmetric edges assumed."""
    key = _priority_key(np.arange(n, dtype=np.int64))
    order = np.argsort(key)
    adj: dict[int, set] = {i: set() for i in range(n)}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].add(d)
        adj[d].add(s)
    in_mis = np.zeros(n, bool)
    blocked = np.zeros(n, bool)
    for v in order:
        if not blocked[v]:
            in_mis[v] = True
            for u in adj[int(v)]:
                blocked[u] = True
    return in_mis
