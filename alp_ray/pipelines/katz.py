"""Katz and eigenvector centrality on the GraphShard engine.

Two more members of the centrality family the repo already ships
(PageRank, HITS, betweenness, closeness/harmonic). Neither ships in the
reference, but both are single-semiring power loops over exactly the
mxv machinery ALP's simple_pagerank.hpp:210-437 exercises — Katz is the
resolvent series x = Σ αᵏ(Aᵀ)ᵏ·1, eigenvector centrality is the plain
power method with per-step L2 normalization (the same normalize-by-
scalar idiom as simple_pagerank.hpp:318-322 / our HITS half-step).

Engine mapping: each step is ONE superstep on the forward edge set
(y[dst] += x[src] ≡ Aᵀx, in-edge centrality like PageRank authority
flow); all K steps run as one pipelined task graph (run_supersteps, no
per-iteration driver barrier).

FP contract (for the DuckDB unrolled twins — mirrored expression for
expression):
- Katz step stores ``alpha * (Σ partials) + 1.0`` — scale AFTER the
  edge sum, one multiply, one add.
- Eigenvector step stores ``(Σ partials) * inv`` with
  ``inv = 1.0/sqrt(Σx²)`` computed on the step's INPUT vector (the
  HITS half-step contract), plus one final self-normalization.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class CentralityResult:
    iterations: int
    n: int
    m: int


# ------------------------------------------------------------- Katz --

def _katz_pre(state, ctx):
    return state["x"], None, {}


def _katz_post(state, y, ctx):
    state["x"] = state["alpha_scalar"] * y + 1.0
    return {}


def katz(
    engine: GraphEngine,
    alpha: float = 0.05,
    iters: int = 15,
) -> CentralityResult:
    """Katz centrality, ``iters`` fixed steps of x ← α·Aᵀx + 1 from
    x₀ = 0 (so x₁ = 1, x₂ = α·Aᵀ1 + 1, …). β = 1. Fixed K rather than
    a convergence exit so the unrolled SQL twin applies the identical
    number of updates."""

    def _init(state, ctx):
        state["x"] = np.zeros(ctx["n_local"])
        state["alpha_scalar"] = alpha
        return None

    engine.map_local(_init)
    engine.run_supersteps(_katz_pre, "plus_first", _katz_post,
                          iters=iters)
    return CentralityResult(iterations=iters, n=engine.n, m=engine.m)


# ------------------------------------------- eigenvector centrality --

def _eig_pre(state, ctx):
    x = state["x"]
    return x, None, {"ss": float(np.dot(x, x))}


def _eig_inv_hook(scalars):
    ss = scalars["ss"]
    return {"inv": 1.0 / math.sqrt(ss) if ss > 0.0 else 0.0}


def _eig_post(state, y, ctx):
    state["x"] = y * ctx["scalars"]["inv"]
    return {}


def eigencentrality(
    engine: GraphEngine,
    iters: int = 15,
) -> CentralityResult:
    """In-edge eigenvector centrality: ``iters`` power steps
    x ← (Aᵀx)·(1/‖x‖₂) from x₀ = 1, then one final self-normalization
    (the stored vector is scaled by the INPUT's norm each step — the
    HITS half-step FP contract, engine and twin alike)."""

    def _init(state, ctx):
        state["x"] = np.ones(ctx["n_local"])
        return None

    engine.map_local(_init)
    engine.run_supersteps(
        _eig_pre, "plus_first", _eig_post, iters=iters,
        scalars=[{} for _ in range(iters)],
        post_scalars_fn=_eig_inv_hook,
    )
    # Final self-normalization: shard Σx² partials reduced driver-side
    # in shard order (the _reduce_scalars summation order, last-ulp
    # stable vs the twin).
    parts = engine.map_local(
        lambda state, ctx: {"ss": float(np.dot(state["x"], state["x"]))}
    )
    ss = float(np.sum([p["ss"] for p in parts]))
    inv = 1.0 / math.sqrt(ss) if ss > 0.0 else 0.0

    def _scale(state, ctx):
        state["x"] = state["x"] * inv
        return None

    engine.map_local(_scale)
    return CentralityResult(iterations=iters, n=engine.n, m=engine.m)
