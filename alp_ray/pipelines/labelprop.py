"""Semi-supervised binary label propagation (Kamvar et al. 2003).

≙ include/graphblas/algorithms/label.hpp:122-290:
- D = row-sum diagonal of symmetric weight matrix W via dense mxv on ones
  (:163-169), inverted per entry (:184-187);
- loop: ``fNext = W·f`` (:217-218); threshold
  ``fNext[i] = (fNext[i]·Dinv[i] < 0.5 ? 0 : 1)`` (:228-231); clamp the
  first ``l`` seed labels via masked foldl with right_assign (:238-242);
- converged when no entry changed — dot with (or, not_equal) (:253);
  max 1000 iterations.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class LabelPropResult:
    converged: bool
    iterations: int


def _rowsum_pre(state, ctx):
    return np.ones(ctx["n_local"])


def _rowsum_post(state, y, ctx):
    dinv = np.zeros_like(y)
    nz = y != 0
    dinv[nz] = 1.0 / y[nz]
    state["dinv"] = dinv
    return {}


def _pre(state, ctx):
    return state["f"]


def _post(state, y, ctx):
    f_new = (y * state["dinv"] >= 0.5).astype(np.float64)
    # Clamp seeds (masked fold with right_assign — :238-242).
    seed = state["seed_mask"] > 0.5
    f_new[seed] = state["seed_labels"][seed]
    changed = float(np.sum(f_new != state["f"]))
    state["f"] = f_new
    return {"changed": changed}


def community_lpa(
    edges: "ray.data.Dataset",
    n: int,
    max_iters: int = 20,
    P: int = 4,
) -> np.ndarray:
    """Synchronous community label propagation (Raghavan et al. 2007) —
    the generic LPA promised by SURVEY §7.6, with the NON-monoid
    per-(vertex, label) frequency + argmax combine running ON the
    GraphShard engine: each superstep scatters pre-reduced
    (dst, label, count) triples shard→shard and the owning shard picks
    the most frequent label (ties → smallest; no-in-neighbour keeps its
    label). No per-iteration driver label broadcast — the only
    per-iteration driver traffic is the P changed-count scalars.

    ``edges``: SYMMETRIC (src, dst) Dataset with dense vertex ids < n.
    Returns the final label array.
    """
    import ray

    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(edges, n=n, P=P, dedupe=True)
    labels = community_lpa_engine(engine, max_iters=max_iters)
    engine.shutdown()
    return labels


def community_lpa_engine(
    engine: GraphEngine, max_iters: int = 20,
    label_state: str = "lab",
) -> np.ndarray:
    """Engine-resident LPA loop (graph + labels live on shards)."""
    import ray

    engine.set_state_use_index(label_state)

    def to_int(state, ctx, name=label_state):
        state[name] = state[name].astype(np.int64)
        return {}

    engine.map_local(to_int)
    for _ in range(max_iters):
        bundle_refs = [
            s.scatter_label_counts.remote(label_state)
            for s in engine.shards
        ]
        changed = sum(
            ray.get(
                [
                    s.gather_label_argmax.remote(
                        q, *bundle_refs, label_state=label_state
                    )
                    for q, s in enumerate(engine.shards)
                ]
            )
        )
        if changed == 0:
            break
    return engine.get_state_by_vertex(label_state).astype(np.int64)


def label_propagation(
    engine: GraphEngine,
    seed_labels: np.ndarray,
    seed_mask: np.ndarray,
    max_iters: int = 1000,
) -> LabelPropResult:
    """``seed_labels``/``seed_mask``: dense length-n arrays (mask: which
    vertices are clamped). Edge table must be symmetric and weighted
    (weight column used by plus_times). Result in state ``"f"``."""
    engine.set_state_by_vertex("seed_labels", seed_labels.astype(np.float64))
    engine.set_state_by_vertex("seed_mask", seed_mask.astype(np.float64))
    f0 = np.where(seed_mask, seed_labels, 0.0)
    engine.set_state_by_vertex("f", f0.astype(np.float64))
    # D row sums (W symmetric → in-sum == row sum).
    engine.superstep(_rowsum_pre, "plus_second", _rowsum_post)

    it = 0
    changed = np.inf
    # Pipelined chunks (≙ nonblocking backend): the thresholded update is
    # idempotent at its fixpoint, so overshooting convergence is a no-op.
    while it < max_iters:
        chunk = min(4, max_iters - it)
        results = engine.run_supersteps(_pre, "plus_times", _post, chunk)
        for r in results:
            changed = r["changed"]
            it += 1
            if changed == 0:
                break
        if changed == 0:
            break
    return LabelPropResult(converged=changed == 0, iterations=it)
