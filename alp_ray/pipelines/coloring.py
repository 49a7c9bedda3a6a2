"""Deterministic distributed graph coloring (Jones & Plassmann 1993).

Not shipped by the reference (its algorithm set stops at kcore/labels —
SURVEY §2.7); expressible in its vocabulary as masked max-semiring mxv
(the local-max test) + a keyed exchange (forbidden colors), which is
exactly how it runs on the GraphShard engine:

per round, over the UNCOLORED set:
  1. ``max_first`` superstep with the uncolored ACTIVE mask → each
     vertex learns the max priority key among uncolored in-neighbours;
  2. vertices whose own key beats it are SELECTED (an independent set);
  3. keyed exchange (``scatter_label_counts`` masked to COLORED
     sources) ships neighbours' colors; ``gather_color_mex`` assigns
     each selected vertex the smallest absent color.

Priorities are a deterministic mixed hash of the vertex id packed with
the id itself ((prio << 26) | id, exact in float64 for id < 2²⁶), so
runs are reproducible and ties impossible. Expected O(log n) rounds on
bounded-degree graphs.

Requires a SYMMETRIC edge set (colors constrain both directions).
"""

from __future__ import annotations

import numpy as np

import ray

from alp_ray.state.engine import GraphEngine

_ID_BITS = 26  # priority key packs (prio26, id26) into float64-exact ints


def _priority_key(v: np.ndarray) -> np.ndarray:
    """Deterministic 26-bit mixed hash of the id, packed above the id."""
    x = v.astype(np.uint64)
    x = (x * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 63) - 1)
    x ^= x >> np.uint64(29)
    prio = (x & np.uint64((1 << _ID_BITS) - 1)).astype(np.int64)
    return (prio << _ID_BITS) | v.astype(np.int64)


def coloring(
    engine: GraphEngine, max_rounds: int = 10_000
) -> np.ndarray:
    """Greedy JP coloring; returns the dense color array (state
    ``"color"``). Proper by construction: a vertex is colored only when
    it is the priority max among uncolored neighbours, with the mex of
    already-colored neighbours' colors."""
    assert engine.n < (1 << _ID_BITS), "priority packing limit"

    def init(state, ctx):
        ids = np.arange(ctx["part"], ctx["n"], ctx["P"], dtype=np.int64)
        state["key"] = _priority_key(ids).astype(np.float64)
        state["uncolored"] = np.ones(ctx["n_local"])
        state["colored"] = np.zeros(ctx["n_local"])
        state["selected"] = np.zeros(ctx["n_local"])
        state["color"] = np.full(ctx["n_local"], -1.0)
        return {}

    engine.map_local(init)

    def pre(state, ctx):
        return state["key"], state["uncolored"] > 0.5

    def post(state, y, ctx):
        # y = max key among uncolored in-neighbours (-inf if none).
        unc = state["uncolored"] > 0.5
        win = unc & (state["key"] > y)
        state["selected"] = win.astype(np.float64)
        state["uncolored"] = (unc & ~win).astype(np.float64)
        return {"remaining": float((unc & ~win).sum())}

    remaining = np.inf
    rounds = 0
    while remaining > 0 and rounds < max_rounds:
        scalars = engine.superstep(pre, "max_first", post)
        remaining = scalars.get("remaining", 0.0)
        # Forbidden-color exchange: colors of ALREADY-colored sources.
        bundle_refs = [
            s.scatter_label_counts.remote("color", mask_state="colored")
            for s in engine.shards
        ]
        ray.get(
            [
                s.gather_color_mex.remote(
                    q, *bundle_refs,
                    select_state="selected", color_state="color",
                )
                for q, s in enumerate(engine.shards)
            ]
        )

        def mark_colored(state, ctx):
            state["colored"] = (state["color"] >= 0).astype(np.float64)
            return {}

        engine.map_local(mark_colored)
        rounds += 1
    return engine.get_state_by_vertex("color").astype(np.int64)
