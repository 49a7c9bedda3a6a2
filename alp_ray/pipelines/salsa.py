"""SALSA — Stochastic Approach for Link-Structure Analysis.

Lempel & Moran (WWW 2000): HITS with DEGREE-NORMALIZED propagation —
the authority/hub chains are random walks on the bipartite hub/authority
view, so each half-step divides by the sending side's degree instead of
re-normalizing by an L2 norm:

    a(j) ← Σ_{i→j} h(i) / dout(i)        (forward edges)
    h(i) ← Σ_{i→j} a(j) / din(j)         (reversed edges)

Mass is conserved up to dangling loss, so no per-step normalization is
needed; one final L1 normalization of each vector makes the scores a
distribution. Not shipped by the reference, but expressed over the same
resident-transpose machinery as :mod:`alp_ray.pipelines.hits`
(``build_reversed`` ≙ descriptors::transpose_matrix, descriptors.hpp:106;
the degree divide ≙ simple_pagerank.hpp:241-249's in-place
``row_sum[i] ← α/row_sum[i]`` normalizer idiom).

FP contract for the DuckDB unrolled twin: the per-vertex divide
``v/deg`` happens BEFORE the edge sum (one IEEE divide per vertex,
mirrored as ``p.val / d.c`` per joined row — the divide produces the
same double either way since deg is exact), each half-step stores the
raw edge sum, and the final scale is one multiply by ``1.0/Σval``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class SalsaResult:
    iterations: int
    n: int
    m: int


def _pre(state, ctx):
    phase = int(ctx["scalars"]["phase"])
    if phase == 0:
        deg, v = state["dout"], state["h"]
    else:
        deg, v = state["din"], state["a"]
    x = np.where(deg > 0, v / np.maximum(deg, 1.0), 0.0)
    return x, None, {}


def _post(state, y, ctx):
    name = "a" if int(ctx["scalars"]["phase"]) == 0 else "h"
    state[name] = y
    return {}


def _make_init(inv0: float):
    def init(state, ctx):
        state["h"] = np.full(ctx["n_local"], inv0)
        state["a"] = np.zeros(ctx["n_local"])
        return None

    return init


def _sum_partials(state, ctx):
    return {
        "sa": float(np.sum(state["a"])),
        "sh": float(np.sum(state["h"])),
    }


def _make_scaler(inv_a: float, inv_h: float):
    def scale(state, ctx):
        state["a"] = state["a"] * inv_a
        state["h"] = state["h"] * inv_h
        return None

    return scale


def salsa(
    engine: GraphEngine,
    iters: int = 12,
    fwd_key: str = "fwd",
    rev_key: str = "rev",
) -> SalsaResult:
    """Run ``iters`` full SALSA iterations (2·iters half-steps, one
    pipelined task graph); leaves L1-normalized scores in engine state
    ``"a"`` (authorities) and ``"h"`` (hubs)."""
    engine.build_reversed(fwd_key, rev_key)
    engine.compute_out_degrees("dout")
    engine.use_edges(rev_key)
    engine.compute_out_degrees("din")
    engine.use_edges(fwd_key)
    engine.map_local(_make_init(1.0 / engine.n))

    per_iter = []
    for k in range(2 * iters):
        phase = k % 2
        per_iter.append({
            "_edges_key": fwd_key if phase == 0 else rev_key,
            "phase": float(phase),
        })
    engine.run_supersteps(
        _pre, "plus_first", _post, iters=2 * iters, scalars=per_iter
    )
    engine.use_edges(fwd_key)

    # Final L1 normalization (shard partials summed in shard order —
    # the _reduce_scalars order, keeping engine-vs-twin drift last-ulp).
    parts = engine.map_local(_sum_partials)
    sa = float(np.sum([p["sa"] for p in parts]))
    sh = float(np.sum([p["sh"] for p in parts]))
    inv_a = 1.0 / sa if sa > 0.0 else 0.0
    inv_h = 1.0 / sh if sh > 0.0 else 0.0
    engine.map_local(_make_scaler(inv_a, inv_h))
    return SalsaResult(iterations=iters, n=engine.n, m=engine.m)


def salsa_numpy(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """Dense oracle mirroring the engine's exact FP shape (per-vertex
    divide before the edge sum; final 1.0/Σ L1 normalization)."""
    dout = np.bincount(src, minlength=n).astype(np.float64)
    din = np.bincount(dst, minlength=n).astype(np.float64)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        x = np.where(dout > 0, h / np.maximum(dout, 1.0), 0.0)
        a = np.zeros(n)
        np.add.at(a, dst, x[src])
        x = np.where(din > 0, a / np.maximum(din, 1.0), 0.0)
        h = np.zeros(n)
        np.add.at(h, src, x[dst])
    sa, sh = float(a.sum()), float(h.sum())
    a = a * (1.0 / sa if sa > 0 else 0.0)
    h = h * (1.0 / sh if sh > 0 else 0.0)
    return a, h
