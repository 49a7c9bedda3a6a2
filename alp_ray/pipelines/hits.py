"""HITS hubs-and-authorities on the GraphShard engine.

Kleinberg's algorithm (Authoritative sources in a hyperlinked
environment, JACM 1999): alternate a ← Aᵀh, h ← A·a with L2
normalization each half-step. Not shipped by the reference, but the
natural next link-graph algorithm over the same semiring machinery ALP
tests (mxv/vxm over plus-times, simple_pagerank.hpp's normalize-by-
scalar idiom at :318-322 reused here as the per-half-step 1/‖·‖₂).

Engine mapping — this is the showcase for two engine features:
- ``GraphEngine.build_reversed`` stashes Aᵀ as a second resident edge
  set via a shard-to-shard exchange (no driver traffic, no Dataset
  shuffle), so each half-step is ONE superstep on the right orientation:
  forward edges compute y[dst] += x[src] (= Aᵀx → authorities from
  hubs), reversed edges compute y[src] += x[dst] (= A·x → hubs from
  authorities).
- the 2K half-steps run as ONE pipelined task graph
  (``run_supersteps`` with a per-iteration scalars list alternating
  ``_edges_key`` fwd/rev); the L2 normalization rides the superstep's
  scalar flow (pre-scalar Σx² partials reduced in-gather, the
  1/sqrt hook applied without a driver barrier).

FP contract (for the DuckDB unrolled twin): the half-step stores
(Σ partials) · inv — scale AFTER the edge sum, one multiply — and the
norm is 1.0/sqrt(Σx²); the SQL twin mirrors both choices verbatim.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class HitsResult:
    iterations: int
    n: int
    m: int


def _pre(state, ctx):
    phase = int(ctx["scalars"]["phase"])
    x = state["h"] if phase == 0 else state["a"]
    return x, None, {"ss": float(np.dot(x, x))}


def _inv_hook(scalars):
    ss = scalars["ss"]
    return {"inv": 1.0 / math.sqrt(ss) if ss > 0.0 else 0.0}


def _post(state, y, ctx):
    sc = ctx["scalars"]
    name = "a" if int(sc["phase"]) == 0 else "h"
    state[name] = y * sc["inv"]
    return {}


def hits(
    engine: GraphEngine,
    iters: int = 12,
    fwd_key: str = "fwd",
    rev_key: str = "rev",
) -> HitsResult:
    """Run ``iters`` full HITS iterations (2·iters half-steps, one
    pipelined task graph); leaves L2-normalized scores in engine state
    ``"a"`` (authorities) and ``"h"`` (hubs).

    Builds the transpose edge set if not already resident.
    """
    engine.build_reversed(fwd_key, rev_key)
    engine.map_local(_init_state)

    # Half-step k: even = authority update on forward edges, odd = hub
    # update on the reversed set. The _edges_key swap costs zero extra
    # round-trips (scatter_k+1 applies it inside the fused actor task).
    per_iter = []
    for k in range(2 * iters):
        phase = k % 2
        per_iter.append({
            "_edges_key": fwd_key if phase == 0 else rev_key,
            "phase": float(phase),
        })
    engine.run_supersteps(
        _pre, "plus_first", _post, iters=2 * iters,
        scalars=per_iter, post_scalars_fn=_inv_hook,
    )
    engine.use_edges(fwd_key)

    # Final L2 normalization of both vectors (the stored vectors are
    # post-edge-sum scaled by the INPUT's norm, not their own): shard
    # partials reduced driver-side in shard order — the same summation
    # order _reduce_scalars uses, so the oracle drift stays last-ulp.
    parts = engine.map_local(_norm_partials)
    inv_a = 1.0 / math.sqrt(float(np.sum([p["ssa"] for p in parts])))
    inv_h = 1.0 / math.sqrt(float(np.sum([p["ssh"] for p in parts])))
    engine.map_local(_make_scaler(inv_a, inv_h))
    return HitsResult(iterations=iters, n=engine.n, m=engine.m)


def _init_state(state, ctx):
    state["h"] = np.ones(ctx["n_local"])
    state["a"] = np.zeros(ctx["n_local"])
    return None


def _norm_partials(state, ctx):
    return {
        "ssa": float(np.dot(state["a"], state["a"])),
        "ssh": float(np.dot(state["h"], state["h"])),
    }


def _make_scaler(inv_a: float, inv_h: float):
    def scale(state, ctx):
        state["a"] = state["a"] * inv_a
        state["h"] = state["h"] * inv_h
        return None

    return scale


def hits_numpy(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """Dense oracle mirroring the engine's exact FP shape (scale after
    the edge sum; 1.0/sqrt norms; final self-normalization)."""
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        inv = 1.0 / math.sqrt(float(np.dot(h, h)))
        y = np.zeros(n)
        np.add.at(y, dst, h[src])
        a = y * inv
        inv = 1.0 / math.sqrt(float(np.dot(a, a)))
        y = np.zeros(n)
        np.add.at(y, src, a[dst])
        h = y * inv
    a = a * (1.0 / math.sqrt(float(np.dot(a, a))))
    h = h * (1.0 / math.sqrt(float(np.dot(h, h))))
    return a, h
