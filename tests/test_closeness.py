"""Harmonic closeness vs a sequential BFS oracle."""

import numpy as np

from alp_ray.pipelines.closeness import harmonic_closeness, harmonic_oracle
from alp_ray.state.engine import GraphEngine


def _digraph(n=70, m=300, seed=17):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_harmonic_closeness_matches_oracle():
    n = 70
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    sources = [0, 7, 13, 21, 40]
    got = harmonic_closeness(engine, sources, max_levels=6)
    engine.shutdown()
    want = harmonic_oracle(src, dst, n, sources, max_levels=6)
    np.testing.assert_array_equal(got, want)


def test_harmonic_closeness_batch_invariant():
    n = 70
    src, dst = _digraph(n=n)
    sources = list(range(0, 20))
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    full = harmonic_closeness(engine, sources, max_levels=6, batch=32)
    small = harmonic_closeness(
        engine, sources, max_levels=6, batch=3, state_name="hc2"
    )
    engine.shutdown()
    np.testing.assert_array_equal(full, small)


def test_eccentricity_matches_bfs_oracle():
    from alp_ray.pipelines.closeness import eccentricity

    n = 70
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    ecc, reach = eccentricity(engine, sources=[0, 1, 2], max_levels=10)
    engine.shutdown()
    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    for i, s in enumerate([0, 1, 2]):
        level = {s: 0}
        frontier = [s]
        l = 0
        while frontier and l < 10:
            l += 1
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in level:
                        level[w] = l
                        nxt.append(w)
            frontier = nxt
        assert ecc[i] == max(level.values())
        assert reach[i] == len(level)
