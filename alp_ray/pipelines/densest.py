"""Densest-subgraph peeling (Charikar greedy, parallel variant).

Bahmani-Kumar-Vassilvitskii (VLDB 2012): on an undirected graph,
repeatedly delete EVERY vertex whose in-subgraph degree is at most
2(1+eps) times the current average density m/n, tracking the round
whose starting subgraph had the highest density — a 2(1+eps)
approximation of the densest subgraph in O(log n) rounds. With
eps = 1/2 the deletion test is ``deg <= 3m/n``, i.e. the all-integer
``2*deg*n <= 3*m2`` where m2 = 2m is the directed count over the
symmetrized edge set — ZERO floating-point in the peel itself, so the
unrolled DuckDB twin matches bit for bit by construction.

Not shipped by the reference, but the same masked-degree peeling family
as its k-core (and our kcore/ktruss): one plus_first superstep per
round to count alive neighbours (≙ ALP mxv over the pattern semiring),
driver-reduced (n, m2) scalars, then a shard-local removal fold.

Best-round selection: density m2/(2.0*n) compared as the IDENTICAL
double expression on both sides (exact integers, one divide), earliest
round wins ties (np.argmax / ORDER BY density DESC, r ASC LIMIT 1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class DensestResult:
    rounds: int          # rounds applied before the graph emptied
    best_round: int      # 1-based round with the densest starting set
    best_n: int
    best_m2: int         # directed edge count (= 2m undirected)

    @property
    def best_density(self) -> float:
        return self.best_m2 / (2.0 * self.best_n)


def _pre(state, ctx):
    return state["alive"], None, {}


def _post(state, y, ctx):
    alive = state["alive"] > 0.5
    deg = np.where(alive, y, 0.0)
    state["degsub"] = deg
    return {
        "m2": float(deg.sum()),
        "n_alive": float(alive.sum()),
    }


def densest_subgraph(
    engine: GraphEngine, max_rounds: int = 64
) -> DensestResult:
    """Run the peel on a SYMMETRIZED simple graph resident in
    ``engine``; leaves per-vertex state ``"removal_round"`` (1-based
    round the vertex was deleted in). Every vertex is deleted by
    termination (each round deletes at least the below-average-degree
    vertices), after at most ~log_{1.5} n rounds."""
    engine.set_state("alive", 1.0)
    engine.set_state("removal_round", 0.0)

    densities: list[tuple[int, int]] = []   # (m2, n) per round
    applied = 0
    for r in range(1, max_rounds + 1):
        scalars = engine.superstep(_pre, "plus_first", _post)
        m2 = int(scalars["m2"])
        n = int(scalars["n_alive"])
        if n == 0:
            break
        applied = r
        densities.append((m2, n))

        def remove(state, ctx, r=r, m2=m2, n=n):
            alive = state["alive"] > 0.5
            deg = state["degsub"].astype(np.int64)
            peel = alive & (2 * deg * n <= 3 * m2)
            state["alive"] = np.where(peel, 0.0, state["alive"])
            state["removal_round"] = np.where(
                peel, float(r), state["removal_round"]
            )
            return None

        engine.map_local(remove)

    dens = np.array(
        [m2 / (2.0 * n) for m2, n in densities], dtype=np.float64
    )
    best = int(np.argmax(dens))  # earliest max, like ORDER BY ... , r
    return DensestResult(
        rounds=applied,
        best_round=best + 1,
        best_n=densities[best][1],
        best_m2=densities[best][0],
    )
