"""PageRank with the reference's exact ``simple_pagerank`` semantics.

≙ include/graphblas/algorithms/simple_pagerank.hpp:134-494:
- defaults α=0.85, conv=1e-7 (we expose conv; BASELINE target uses 1e-6),
  max 1000 iterations (:140-142);
- initial guess 1/n (:200-203);
- row sums via pattern-semiring vxm (:210-222), inverted in place to
  α/rowsum with 0 kept for dangling rows (:241-249);
- per iteration: dangling mass = Σ pr over dangling rows (masked foldl,
  :312-314); pre-scale pr·(α/outdeg) (:318-322); offset
  (α·dangling + 1−α)/n (:351); vxm (:361); broadcast-add offset (:428);
- convergence on the ONE-norm of the successive difference via
  dot(add, abs_diff) (:433-437); FAILED if not converged by max (:492).

Runs on the GraphShard engine: the graph is resident, per-iteration traffic
is the sparse partial exchange + two scalars (dangling, residual).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class PageRankResult:
    converged: bool
    iterations: int
    residual: float
    n: int
    m: int
    iter_seconds: float = 0.0
    residual_history: list[float] = field(default_factory=list)
    # The pipelined (sync_every>1) path pre-submits whole chunks, so when
    # convergence lands mid-chunk the engine state "pr" reflects
    # ``applied_iterations`` supersteps (chunk end) while ``iterations``/
    # ``residual`` describe the first iteration that met the tolerance.
    # The update is contractive, so the extra steps only tighten the
    # result — but the metadata records the overshoot honestly.
    applied_iterations: int = 0

    @property
    def traversed_edges(self) -> int:
        return self.m * self.iterations

    @property
    def edges_per_sec(self) -> float:
        return self.traversed_edges / self.iter_seconds if self.iter_seconds else 0.0


def _pre(state, ctx):
    pr = state["pr"]
    x = pr * state["scale"]
    dangling = float(pr[state["dangling"] > 0.5].sum())
    return x, None, {"pr_dangling": dangling}


def _post(state, y, ctx):
    # Uniform teleport: scalar offset. Personalized: offset scaled by the
    # local teleport-distribution slice (Σt = 1, so the uniform case is
    # t ≡ 1/n folded into the scalar).
    coef = ctx["scalars"]["offset"]
    if "tvec" in state:
        pr_new = y + coef * state["tvec"]
    else:
        pr_new = y + coef
    residual = float(np.abs(pr_new - state["pr"]).sum())
    state["pr"] = pr_new
    return {"residual": residual}


def pagerank(
    engine: GraphEngine,
    alpha: float = 0.85,
    conv: float = 1e-7,
    max_iters: int = 1000,
    checkpointer=None,
    sync_every: int = 8,
    personalize: "np.ndarray | None" = None,
) -> PageRankResult:
    """Run to convergence; leaves the result in engine state ``"pr"``.

    ``personalize``: optional teleport distribution t (length n, sums to
    1) — personalized PageRank: random jumps (and dangling mass) land on
    t instead of the uniform 1/n. None = the reference's simple_pagerank
    semantics exactly.
    """
    import time

    n = engine.n
    if personalize is not None:
        t = np.asarray(personalize, dtype=np.float64)
        assert t.shape == (n,) and abs(t.sum() - 1.0) < 1e-9
        engine.set_state_by_vertex("tvec", t)

    # Setup (≙ :200-249): out-degrees are shard-local because edges are
    # partitioned by src.
    def setup(state, ctx):
        outdeg = state["outdeg"]
        dangling = (outdeg == 0).astype(np.float64)
        scale = np.zeros_like(outdeg)
        nz = outdeg > 0
        scale[nz] = alpha / outdeg[nz]
        state["scale"] = scale
        state["dangling"] = dangling
        state["pr"] = np.full(ctx["n_local"], 1.0 / ctx["n"])
        return None

    engine.compute_out_degrees("outdeg")
    engine.map_local(setup)

    personalized = personalize is not None

    def offset_fn(scalars, personalized=personalized, n=n, alpha=alpha):
        coef = alpha * scalars["pr_dangling"] + (1.0 - alpha)
        # Uniform case folds the 1/n of t≡1/n into the scalar.
        return {"offset": coef if personalized else coef / n}

    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.try_resume(engine, ["pr"])
        if resumed is not None:
            start_iter = resumed

    residual = np.inf
    history: list[float] = []
    t0 = time.perf_counter()
    it = start_iter
    applied = start_iter
    if checkpointer is None and sync_every > 1:
        # Nonblocking path: submit sync_every iterations as one task
        # graph (≙ ALP nonblocking backend); driver syncs once per chunk.
        # Checkpointed runs use the per-iteration loop below instead: a
        # checkpoint is inherently a sync point, and exact per-iteration
        # semantics make resume bit-deterministic (tested).
        while it < max_iters:
            chunk = min(sync_every, max_iters - it)
            results = engine.run_supersteps(
                _pre,
                "plus_first",
                _post,
                iters=chunk,
                post_scalars_fn=offset_fn,
            )
            applied += chunk
            for r in results:
                residual = r["residual"]
                history.append(residual)
                it += 1
                if residual <= conv:
                    break
            if residual <= conv:
                break
    else:
        while it < max_iters:
            scalars = engine.superstep(
                _pre,
                "plus_first",
                _post,
                post_scalars_fn=offset_fn,
            )
            residual = scalars["residual"]
            history.append(residual)
            it += 1
            applied = it
            if checkpointer is not None:
                checkpointer.maybe_checkpoint(
                    engine,
                    ["pr"],
                    iteration=it,
                    metrics={
                        "residual": residual,
                        # flop/traffic accounting per superstep (north
                        # rule: frontier-size/flop metrics in manifest).
                        "traversed_edges_per_iter": engine.m,
                        "frontier": engine.n,  # dense iteration
                    },
                )
            if residual <= conv:
                break
    iter_seconds = time.perf_counter() - t0
    return PageRankResult(
        converged=residual <= conv,
        iterations=it - start_iter,
        residual=residual,
        n=n,
        m=engine.m,
        iter_seconds=iter_seconds,
        residual_history=history,
        applied_iterations=applied - start_iter,
    )




def weighted_pagerank(
    engine: GraphEngine,
    alpha: float = 0.85,
    max_iters: int = 20,
    sync_every: int = 8,
) -> int:
    """PageRank with transition mass PROPORTIONAL TO EDGE WEIGHT:
    y(v) = Σ_src pr(src)·(α/wsum(src))·w(src,v) + teleport/dangling —
    the weighted generalization of simple_pagerank (the reference's
    pattern semiring row-sum becomes a plus_times row-sum; semantics ≙
    simple_pagerank.hpp:200-249 with outdeg → Σw). Weighted out-sums
    are shard-local (free under src-partitioning); the gather runs the
    plus_times semiring so each edge contributes (pr·scale)·w in that
    multiply order — mirrored verbatim by the unrolled SQL twin. Runs a
    FIXED max_iters steps; returns the applied iteration count."""

    def setup(state, ctx):
        ws = state["wsum"]
        dangling = (ws == 0).astype(np.float64)
        scale = np.zeros_like(ws)
        nz = ws > 0
        scale[nz] = alpha / ws[nz]
        state["scale"] = scale
        state["dangling"] = dangling
        state["pr"] = np.full(ctx["n_local"], 1.0 / ctx["n"])
        return None

    engine.compute_out_weight_sums("wsum")
    engine.map_local(setup)
    n = engine.n

    def offset_fn(scalars):
        return {
            "offset": (alpha * scalars["pr_dangling"] + (1.0 - alpha)) / n
        }

    it = 0
    while it < max_iters:
        chunk = min(sync_every, max_iters - it)
        engine.run_supersteps(
            _pre, "plus_times", _post, iters=chunk,
            post_scalars_fn=offset_fn,
        )
        it += chunk
    return it
