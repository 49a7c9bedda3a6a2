"""Connected components — max-label propagation over a symmetric graph.

≙ include/graphblas/algorithms/pregel_connected_components.hpp:47-169:
vertex state initialized to its own ID (``set<use_index>``, :136); each
round broadcasts the current ID and adopts the incoming MAX (program
:81-103) under the (max, −inf) combiner monoid (:149-152); a vertex stays
active only while it improves (voteToHalt). Result: every vertex labeled
with the LARGEST vertex id in its component. Requires a symmetrized edge
table (undirected semantics).

The sparse frontier (only changed vertices message) is the reference's
active-set sparsification (pregel.hpp:826-837) — it is what makes late
iterations cheap.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class ComponentsResult:
    iterations: int
    n: int
    m: int


def _pre(state, ctx):
    return state["label"], state["active"] > 0.5


def _post(state, y, ctx):
    new = np.maximum(state["label"], y)
    changed = new > state["label"]
    state["label"] = new
    state["active"] = changed.astype(np.float64)
    return {"changed": float(changed.sum())}


def connected_components(
    engine: GraphEngine,
    max_iters: int = 10_000,
    checkpointer=None,
    sync_every: int = 4,
) -> ComponentsResult:
    """Leaves per-vertex component labels in engine state ``"label"``.

    Without a checkpointer, iterations run pipelined in chunks of
    ``sync_every`` (≙ nonblocking backend); overshooting convergence is
    free — once no vertex improves, further supersteps are no-ops on an
    empty frontier.
    """
    engine.set_state_use_index("label")
    engine.set_state("active", 1.0)
    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.try_resume(engine, ["label", "active"])
        if resumed is not None:
            start_iter = resumed
    it = start_iter
    if checkpointer is None and sync_every > 1:
        while it < max_iters:
            chunk = min(sync_every, max_iters - it)
            results = engine.run_supersteps(
                _pre, "max_first", _post, iters=chunk
            )
            done = False
            for r in results:
                it += 1
                if r["changed"] == 0:
                    done = True
                    break
            if done:
                break
        return ComponentsResult(
            iterations=it - start_iter, n=engine.n, m=engine.m
        )
    while it < max_iters:
        scalars = engine.superstep(_pre, "max_first", _post)
        it += 1
        if checkpointer is not None:
            checkpointer.maybe_checkpoint(
                engine,
                ["label", "active"],
                iteration=it,
                metrics={
                    # frontier size = changed vertices (they message next
                    # round); edge traffic next round is bounded by the
                    # frontier's out-degree sum.
                    "changed": scalars["changed"],
                    "frontier": scalars["changed"],
                },
            )
        if scalars["changed"] == 0:
            break
    return ComponentsResult(iterations=it - start_iter, n=engine.n, m=engine.m)
