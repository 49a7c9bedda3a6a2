"""Vertex-centric programs shipped as Pregel algorithms in the reference.

- ``pregel_pagerank`` ≙ algorithms/pregel_pagerank.hpp:53-215: score init 1
  (round 0), update ``score = α + (1−α)·incoming`` with jump probability
  α=0.15, per-vertex tolerance 1e-5, combiner (plus, 0), broadcast
  ``score/outdegree``; EXPLICITLY not Brin-Page-canonical (no dangling
  correction, no norm-based convergence — the header says so itself).
  ``local_converge`` ≙ the template flag: converged vertices go inactive
  (True) vs merely vote to halt but keep messaging (False).
- ``pregel_connected_components`` parity lives in tests (test_traversal).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.pipelines.pregel import PregelResult, pregel
from alp_ray.state.engine import GraphEngine


@dataclass
class PregelPageRankData:
    alpha: float = 0.15
    tolerance: float = 1e-5


def pregel_pagerank(
    engine: GraphEngine,
    data: PregelPageRankData | None = None,
    local_converge: bool = True,
    max_rounds: int = 1000,
    out_sparsify: str = "always",
) -> PregelResult:
    """Leaves scores in engine state ``"score"``."""
    d = data or PregelPageRankData()
    alpha, tol = d.alpha, d.tolerance
    engine.compute_out_degrees("outdeg_pp")

    def program(state, msgs, ctx):
        outdeg = state["outdeg_pp"]
        votes = None
        if ctx["round"] == 0:
            state["score"] = np.ones(outdeg.shape)
            active = np.ones(outdeg.shape, bool)
        else:
            # The reference runs the program only over the (monotonically
            # shrinking) active set — inactive vertices never update or
            # broadcast again (pregel.hpp:765-804, :826-837).
            prev_active = state["__active"] > 0.5
            old = state["score"]
            # (plus, 0) combiner: identity 0 where no message arrived.
            incoming = np.where(np.isfinite(msgs), msgs, 0.0)
            new = np.where(
                prev_active, alpha + (1.0 - alpha) * incoming, old
            )
            state["score"] = new
            converged_mask = prev_active & (np.abs(new - old) < tol)
            if local_converge:
                # localConverge: converged vertices go inactive.
                active = prev_active & ~converged_mask
            else:
                # voteToHalt: stay active/messaging; terminate only when
                # every active vertex is below tolerance in one round.
                active = prev_active
                votes = ~prev_active | converged_mask
        out = np.zeros(outdeg.shape)
        nz = (outdeg > 0) & active
        out[nz] = state["score"][nz] / outdeg[nz]
        return out, active, votes

    return pregel(
        engine,
        program,
        combiner="plus",
        max_rounds=max_rounds,
        out_sparsify=out_sparsify,
    )
