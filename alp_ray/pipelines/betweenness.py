"""Sampled betweenness centrality (Brandes 2001) on the GraphShard
engine — beyond the reference's shipped set (SURVEY §2.7), expressible
in its vocabulary as BFS matrix-powers (σ path counts, plus_first over
the frontier) plus a reverse dependency sweep (again plus_first, the
transpose product — free on SYMMETRIC graphs, which is the classic
betweenness setting).

Per sampled source s:
  forward  level l: σ[w] += Σ_{v∈frontier, v→w, w unvisited} σ[v]
  backward level l: δ[v] += σ[v] · Σ_{w: v→w, level[w]=l} (1+δ[w])/σ[w]
                    applied to v at level l−1
  bc[v] += δ[v]  (v ≠ s; directed-pair counting — halve for the
                  undirected convention)

Determinism: BFS levels/σ are integers; δ is the same IEEE expression
on both the engine and the unrolled SQL twin, so a fixed ``max_levels``
cap (applied identically on both sides) makes the driver oracle exact
to 6 decimals.
"""

from __future__ import annotations

import numpy as np

from alp_ray.state.engine import GraphEngine


def betweenness(
    engine: GraphEngine,
    sources: list[int],
    max_levels: int = 12,
    batch: int = 16,
) -> np.ndarray:
    """``engine`` must hold a SYMMETRIC edge set. Returns the bc array
    accumulated over ``sources`` (unreached vertices contribute 0).

    Sources run in BATCHES of ``batch`` as multi-column supersteps:
    state is a (n_local, S) matrix, the scatter payload a thin dense
    matrix (the engine's ``_ncols`` mode), so one BFS sweep serves S
    sources — S× fewer supersteps than the per-source loop. Bitwise
    identical to the per-source form: the union-frontier only adds
    0.0-valued contributions to other columns (x+0.0 is an IEEE
    identity for the nonnegative values here), edge order inside each
    segment is unchanged, and bc accumulates column-by-column in
    source order."""
    engine.set_state("bc", 0.0)
    for lo in range(0, len(sources), batch):
        chunk = [int(s) for s in sources[lo:lo + batch]]
        S = len(chunk)
        ncols = {"_ncols": S}

        def init(state, ctx, chunk=chunk, S=S):
            nl = ctx["n_local"]
            ids = np.arange(ctx["part"], ctx["n"], ctx["P"])
            own = ids[:, None] == np.asarray(chunk)[None, :]
            state["sigma"] = own.astype(np.float64)
            state["level"] = np.where(own, 0.0, -1.0)
            state["delta"] = np.zeros((nl, S))
            state["front"] = own
            return {}

        engine.map_local(init)

        def fwd_pre(state, ctx):
            f = state["front"]
            return np.where(f, state["sigma"], 0.0), f.any(axis=1)

        levels_used = 0
        for l in range(1, max_levels + 1):

            def fwd_post(state, y, ctx, l=l):
                new = (state["level"] < -0.5) & (y > 0)
                state["sigma"] = np.where(new, y, state["sigma"])
                state["level"] = np.where(new, float(l), state["level"])
                state["front"] = new
                return {"fsize": float(new.sum())}

            r = engine.superstep(
                fwd_pre, "plus_first", fwd_post, scalars=ncols
            )
            levels_used = l
            if r.get("fsize", 0) == 0:
                break

        for l in range(levels_used, 0, -1):

            def bwd_pre(state, ctx, l=l):
                at = state["level"] == l
                x = np.where(
                    at,
                    (1.0 + state["delta"])
                    / np.where(at, state["sigma"], 1.0),
                    0.0,
                )
                return x, at.any(axis=1)

            def bwd_post(state, y, ctx, l=l):
                rec = state["level"] == (l - 1)
                state["delta"] = np.where(
                    rec, state["delta"] + state["sigma"] * y,
                    state["delta"],
                )
                return {}

            engine.superstep(
                bwd_pre, "plus_first", bwd_post, scalars=ncols
            )

        def acc(state, ctx, chunk=chunk):
            ids = np.arange(ctx["part"], ctx["n"], ctx["P"])
            bc = state["bc"]
            # Column-by-column in source order — the same accumulation
            # order (and hence bitwise result) as the per-source loop.
            for c, s in enumerate(chunk):
                bc = bc + np.where(ids == s, 0.0, state["delta"][:, c])
            state["bc"] = bc
            return {}

        engine.map_local(acc)
    return engine.get_state_by_vertex("bc")


def brandes_oracle(
    src: np.ndarray, dst: np.ndarray, n: int,
    sources: list[int], max_levels: int = 12,
) -> np.ndarray:
    """Sequential reference (tests): same level cap, same conventions."""
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    bc = np.zeros(n)
    for s in sources:
        sigma = np.zeros(n)
        level = np.full(n, -1)
        sigma[s] = 1.0
        level[s] = 0
        frontier = [s]
        levels = []
        for l in range(1, max_levels + 1):
            nxt = {}
            for v in frontier:
                for w in adj[v]:
                    if level[w] == -1 or level[w] == l:
                        nxt[w] = nxt.get(w, 0.0) + sigma[v]
            frontier = []
            for w, sg in nxt.items():
                if level[w] == -1:
                    level[w] = l
                    sigma[w] = sg
                    frontier.append(w)
            levels.append(list(frontier))
            if not frontier:
                break
        delta = np.zeros(n)
        for l in range(len(levels), 0, -1):
            for w in np.flatnonzero(level == l):
                contrib = (1.0 + delta[w]) / sigma[w]
                for v in adj[w]:
                    if level[v] == l - 1:
                        delta[v] += sigma[v] * contrib
        delta[s] = 0.0
        bc += delta
    return bc
