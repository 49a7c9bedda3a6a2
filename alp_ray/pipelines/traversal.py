"""Traversal algorithms: k-hop reachability (knn/mpv), min-plus SSSP,
k-core decomposition — the rest of the reference's shipped graph set.

- k-hop ≙ algorithms/knn.hpp:82-140 + mpv.hpp:95-166: boolean (or, and)
  semiring matrix powers with ``add_identity|transpose_matrix`` — the
  source's k-hop neighbourhood INCLUDING the source (add_identity adds I).
- SSSP ≙ examples/sp.cpp:60-118 (min-plus semiring relaxation to
  fixpoint, i.e. distributed Bellman-Ford with sparse frontier).
- k-core ≙ algorithms/kcore_decomposition.hpp:141-296 (Li et al. HPEC'21
  peeling: repeatedly remove vertices of degree < k, propagate degree
  decrements along edges; core(v) = k at peel level).
"""

from __future__ import annotations

import numpy as np

from alp_ray.state.engine import GraphEngine


def khop(
    engine: GraphEngine, source: int, k: int
) -> tuple[np.ndarray, int]:
    """Vertices reachable from ``source`` in ≤ k hops (incl. source).
    Returns (indicator array over vertices, neighbourhood size)."""
    x0 = np.zeros(engine.n)
    x0[source] = 1.0
    engine.set_state_by_vertex("reach", x0)
    engine.set_state_by_vertex("frontier", x0)

    def pre(state, ctx):
        return state["frontier"], state["frontier"] > 0.5

    def post(state, y, ctx):
        arrived = y > 0.5
        new = arrived & (state["reach"] < 0.5)
        state["reach"] = np.maximum(state["reach"], arrived.astype(float))
        state["frontier"] = new.astype(np.float64)
        return {"new": float(new.sum())}

    # All k hops submitted as one pipelined task graph; extra hops after
    # the frontier empties are no-ops.
    for r in engine.run_supersteps(pre, "max_first", post, iters=k):
        if r["new"] == 0:
            break
    reach = engine.get_state_by_vertex("reach")
    return reach > 0.5, int((reach > 0.5).sum())


def sssp(
    engine: GraphEngine,
    source: int,
    max_iters: int = 10_000,
    return_iters: bool = False,
) -> np.ndarray:
    """Single-source shortest paths under min-plus (weights required).
    Returns dense distance array (inf = unreachable); with
    ``return_iters`` also the applied relaxation count (the last one
    being the no-change fixpoint check — relaxation past the fixpoint
    is idempotent, which is what lets a SQL twin unroll an UPPER BOUND
    of steps instead of the exact count)."""
    dist = np.full(engine.n, np.inf)
    dist[source] = 0.0
    engine.set_state_by_vertex("dist", dist)
    active = np.zeros(engine.n)
    active[source] = 1.0
    engine.set_state_by_vertex("changed", active)

    def pre(state, ctx):
        return state["dist"], state["changed"] > 0.5

    def post(state, y, ctx):
        new = np.minimum(state["dist"], y)
        changed = new < state["dist"]
        state["dist"] = new
        state["changed"] = changed.astype(np.float64)
        return {"changed": float(changed.sum())}

    it = 0
    while it < max_iters:
        # Pipelined chunks: Bellman-Ford relaxation past the fixpoint is
        # a no-op on an empty frontier.
        chunk = min(4, max_iters - it)
        results = engine.run_supersteps(pre, "min_plus", post, chunk)
        done = False
        for r in results:
            it += 1
            if r["changed"] == 0:
                done = True
                break
        if done:
            break
    dist = engine.get_state_by_vertex("dist")
    return (dist, it) if return_iters else dist


def kcore_decomposition(
    engine: GraphEngine, max_k: int = 10_000
) -> np.ndarray:
    """Coreness per vertex over a SYMMETRIZED simple graph.

    Peeling: for k = 1, 2, …: while any alive vertex has degree < k,
    peel it (coreness ← k−1) and send degree decrements to neighbours.
    """
    engine.compute_out_degrees("deg")  # symmetric graph: outdeg == degree
    engine.set_state("alive", 1.0)
    engine.set_state("core", 0.0)

    def make_pre(k):
        def pre(state, ctx):
            peel = (state["alive"] > 0.5) & (state["deg"] < k)
            state["alive"] = np.where(peel, 0.0, state["alive"])
            state["core"] = np.where(peel, k - 1.0, state["core"])
            ones = np.ones(state["deg"].shape)
            return ones, peel, {"peeled": float(peel.sum()),
                                "alive": float(state["alive"].sum())}
        return pre

    def post(state, y, ctx):
        # y = number of peeled neighbours (plus_first counts).
        keep = state["alive"] > 0.5
        dec = np.where(np.isfinite(y), y, 0.0)
        state["deg"] = np.where(keep, state["deg"] - dec, state["deg"])
        return {}

    k = 1
    while k <= max_k:
        # Inner loop: peel cascades at this k until stable.
        while True:
            scalars = engine.superstep(make_pre(k), "plus_first", post)
            if scalars.get("peeled", 0) == 0:
                break
        if scalars.get("alive", 0) == 0:
            break
        k += 1
    core = engine.get_state_by_vertex("core")
    return core.astype(np.int64)


def _onion_stats(state, ctx):
    alive = state["alive"] > 0.5
    deg = state["deg"][alive]
    return {
        "na": float(alive.sum()),
        "md": float(deg.min()) if deg.size else float("inf"),
    }


def onion_layers(
    engine: GraphEngine, max_layers: int = 200
) -> tuple[np.ndarray, np.ndarray, int]:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016) of
    a SYMMETRIZED simple graph: the k-core refinement that records the
    peel WAVE each vertex leaves in. Per wave: k ← max(k, min alive
    degree); every alive vertex with degree ≤ k leaves simultaneously
    with the current layer index (and coreness k — the ≤-rule peel
    threshold IS the standard coreness, cross-checked against
    kcore_decomposition in tests); survivors decrement.

    One superstep per wave plus one map_local scalar reduction (the
    min-alive-degree allreduce); all-integer state, so an unrolled SQL
    twin with a fixed wave count reproduces it exactly. Returns
    (layer, core, waves_used) over all n vertices; vertices absent from
    the graph (degree 0) keep layer 0 and must be filtered by the
    caller like kcore does.
    """
    engine.compute_out_degrees("deg")
    engine.map_local(_onion_init)
    engine.set_state("layer", 0.0)
    engine.set_state("core", 0.0)

    def make_pre(k, layer):
        def pre(state, ctx):
            peel = (state["alive"] > 0.5) & (state["deg"] <= k)
            state["alive"] = np.where(peel, 0.0, state["alive"])
            state["layer"] = np.where(peel, float(layer), state["layer"])
            state["core"] = np.where(peel, float(k), state["core"])
            ones = np.ones(state["deg"].shape)
            return ones, peel, {}
        return pre

    def post(state, y, ctx):
        keep = state["alive"] > 0.5
        dec = np.where(np.isfinite(y), y, 0.0)
        state["deg"] = np.where(keep, state["deg"] - dec, state["deg"])
        return {}

    k = 0
    layer = 0
    while layer < max_layers:
        parts = engine.map_local(_onion_stats)
        if sum(p["na"] for p in parts) == 0:
            break
        k = max(k, int(min(p["md"] for p in parts)))
        layer += 1
        engine.superstep(make_pre(k, layer), "plus_first", post)
    else:
        raise RuntimeError(
            f"onion_layers did not finish in {max_layers} waves"
        )
    return (
        engine.get_state_by_vertex("layer").astype(np.int64),
        engine.get_state_by_vertex("core").astype(np.int64),
        layer,
    )


def _onion_init(state, ctx):
    state["alive"] = (state["deg"] > 0).astype(np.float64)
    return None
