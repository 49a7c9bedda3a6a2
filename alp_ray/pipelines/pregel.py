"""ALP/Pregel vertex-centric layer over the GraphShard engine.

≙ include/graphblas/interfaces/pregel.hpp (960 LoC): user supplies a
vertex ``program`` plus a combiner monoid; the runtime loop (:650,
execute :761-907) per round (a) runs the program over active vertices via
eWiseLambda, (b) terminates when all active vertices voted halt (masked
and-monoid foldl :812-814), (c) sparsifies the active set (:826-837),
(d) exchanges messages with ``vxm<structural>`` under the ring
(combiner-op, left_assign_if) (:714-721, :882-884).

Here: ``program`` is a vectorized NumPy callable over the local state
batch; the message exchange is the engine superstep under the
(combiner, *_first) pattern semiring — exactly how the reference lowers
it. Vertex degrees are precomputed at construction (pregel.hpp:380-416).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from alp_ray.state.engine import GraphEngine

# Combiner monoid name → pattern semiring used for the exchange.
_RING = {"max": "max_first", "min": "min_first", "plus": "plus_first"}
_IDENTITY = {"max": -np.inf, "min": np.inf, "plus": 0.0}


@dataclass
class PregelResult:
    rounds: int
    converged: bool  # all vertices halted


def pregel(
    engine: GraphEngine,
    program: Callable,
    combiner: str = "plus",
    init: dict[str, float | np.ndarray] | None = None,
    init_use_index: tuple[str, ...] = (),
    max_rounds: int = 1000,
    out_message_state: str = "__out_msg",
    out_sparsify: str = "always",
) -> PregelResult:
    """Run ``program(state, msgs, ctx) -> (out_msgs, active, halted)``.

    - ``state``: dict of local per-vertex arrays (mutate in place);
    - ``msgs``: combined incoming messages (dense local array, combiner
      identity where no message arrived — test with np.isfinite etc.);
    - ``ctx``: part/P/n/n_local/round;
    - return ``out_msgs`` (array — messages broadcast along out-edges, ≙
      Pregel send-to-all-neighbours), ``active`` (bool mask of vertices
      that message this round), ``halted`` count is derived from active.

    Round 0 delivers the combiner identity as incoming message to every
    vertex (matches reference: first superstep sees no messages).

    ``out_sparsify`` ≙ grb::interfaces::config::SparsificationStrategy
    (pregel.hpp:167-242) — a PHYSICAL knob; results are identical up to
    ~1 ulp: the dense exchange interleaves combiner-identity terms,
    which reshapes numpy's pairwise summation tree. Hash-gated queries
    must therefore stay on a FIXED strategy (the ``"always"`` default);
    ``when_reduced``/``when_halved`` switch physical forms on a
    data-dependent condition and are for throughput experiments only
    (CLAUDE.md: dense vs masked scatter are not bitwise
    interchangeable).
    - ``"always"``: the exchange masks+re-segments edges by the active
      set every round (ALP's ALWAYS; the masked vxm form).
    - ``"none"``: the exchange runs the dense precomputed-segment path;
      inactive vertices send the combiner identity, which combines as a
      no-op (ALP's NONE — its measured-fastest default when frontiers
      stay dense, pregel.hpp:235-241).
    - ``"when_reduced"`` / ``"when_halved"``: mask only when the
      shard-local active count is < n_local (resp. ≤ n_local/2) —
      ALP's amortization heuristics, decided per shard per round.
    """
    if out_sparsify not in ("always", "none", "when_reduced",
                            "when_halved"):
        raise ValueError(out_sparsify)
    ring = _RING[combiner]
    ident = _IDENTITY[combiner]

    for name, value in (init or {}).items():
        if isinstance(value, np.ndarray):
            engine.set_state_by_vertex(name, value)
        else:
            engine.set_state(name, value)
    for name in init_use_index:
        engine.set_state_use_index(name)
    engine.compute_out_degrees("__outdeg")
    engine.set_state("__active", 1.0)
    engine.set_state(out_message_state, 0.0)
    engine.set_state("__first", 1.0)

    def pre(state, ctx, program=program, ident=ident):
        rnd = int(ctx["scalars"]["round"])
        if rnd == 0:
            msgs = np.full(state["__active"].shape, ident)
        else:
            msgs = state["__in_msg"]
        pctx = dict(ctx)
        pctx["round"] = rnd
        out_msgs, active, votes = _run_program(program, state, msgs, pctx)
        state[out_message_state] = out_msgs
        state["__active"] = active.astype(np.float64)
        n_not_halted = (
            float((~votes).sum()) if votes is not None
            else float(active.sum())
        )
        scal = {
            "n_active": float(active.sum()),
            "n_not_halted": n_not_halted,
        }
        strategy = ctx["scalars"]["_out_sparsify"]
        na = int(active.sum())
        sparsify = (
            strategy == "always"
            or (strategy == "when_reduced" and na < active.size)
            or (strategy == "when_halved" and 2 * na <= active.size)
        )
        if sparsify:
            return out_msgs, active, scal
        # Dense exchange: inactive vertices emit the combiner identity,
        # a combine no-op — same y, precomputed-segment scatter path.
        am = active if out_msgs.ndim == 1 else active[:, None]
        return np.where(am, out_msgs, ident), None, scal

    def post(state, y, ctx):
        state["__in_msg"] = y
        return {}

    rounds = 0
    converged = False
    for rnd in range(max_rounds):
        scalars = engine.superstep(
            pre, ring, post,
            scalars={"round": rnd, "_out_sparsify": out_sparsify},
        )
        rounds = rnd + 1
        # Terminate when no vertex is active OR all active vertices voted
        # to halt (≙ masked and-monoid foldl, pregel.hpp:812-814).
        if scalars["n_active"] == 0 or scalars["n_not_halted"] == 0:
            converged = True
            break
    return PregelResult(rounds=rounds, converged=converged)


def _run_program(program, state, msgs, pctx):
    """program returns (out_msgs, active[, halt_votes]) — halt_votes is a
    bool mask (voteToHalt semantics); None means active IS the vote."""
    out = program(state, msgs, pctx)
    out_msgs, active = out[0], np.asarray(out[1], dtype=bool)
    votes = (
        np.asarray(out[2], dtype=bool)
        if len(out) > 2 and out[2] is not None
        else None
    )
    return out_msgs, active, votes
