"""Densest-subgraph peel vs a NumPy oracle (exact integer semantics)."""

import numpy as np

from alp_ray.pipelines.densest import densest_subgraph
from alp_ray.state.engine import GraphEngine


def _sym_graph(n=120, m=600, seed=5, clique=12):
    """Random sparse digraph + a planted clique, symmetrized."""
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    cs, cd = np.meshgrid(np.arange(clique), np.arange(clique))
    src = np.concatenate([src, cs.ravel().astype(np.int64)])
    dst = np.concatenate([dst, cd.ravel().astype(np.int64)])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    key = s * n + d
    _, idx = np.unique(key, return_index=True)
    return s[idx], d[idx]


def _oracle(src, dst, n):
    alive = np.ones(n, bool)
    rounds = np.zeros(n, np.int64)
    dens = []
    r = 0
    while alive.any():
        r += 1
        live_e = alive[src] & alive[dst]
        deg = np.bincount(dst[live_e], minlength=n)
        m2 = int(deg[alive].sum())
        nn = int(alive.sum())
        dens.append((m2, nn))
        peel = alive & (2 * deg * nn <= 3 * m2)
        rounds[peel] = r
        alive &= ~peel
    d = np.array([m2 / (2.0 * nn) for m2, nn in dens])
    best = int(np.argmax(d))
    return rounds, best + 1, dens[best]


def test_densest_subgraph_matches_oracle():
    n = 120
    src, dst = _sym_graph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    res = densest_subgraph(engine)
    got = engine.get_state_by_vertex("removal_round").astype(np.int64)
    engine.shutdown()

    want, best_round, (m2, nn) = _oracle(src, dst, n)
    np.testing.assert_array_equal(got, want)
    assert res.best_round == best_round
    assert (res.best_m2, res.best_n) == (m2, nn)
    # Every vertex is eventually removed; the planted clique outlives
    # the sparse background (its members peel in the final rounds).
    assert (got >= 1).all()
    clique_round = got[:12].min()
    assert (got[12:] <= clique_round).mean() > 0.9
    # The best subgraph is at least half as dense as the clique bound.
    assert res.best_density >= 11 / 4  # clique density 5.5, 2x approx
