"""Brandes betweenness on the engine vs the sequential oracle."""

import numpy as np

from alp_ray.pipelines.betweenness import betweenness, brandes_oracle
from alp_ray.state.engine import GraphEngine


def test_betweenness_matches_brandes():
    rng = np.random.RandomState(4)
    n, m = 90, 360
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s2 = np.concatenate([src, dst]).astype(np.int64)
    d2 = np.concatenate([dst, src]).astype(np.int64)
    key = s2 * n + d2
    _, idx = np.unique(key, return_index=True)
    s2, d2 = s2[idx], d2[idx]
    sources = [0, 1, 2, 7]
    engine = GraphEngine.from_arrays(s2, d2, n=n, P=4)
    bc = betweenness(engine, sources)
    engine.shutdown()
    want = brandes_oracle(s2, d2, n, sources)
    np.testing.assert_allclose(bc, want, rtol=1e-9, atol=1e-12)
    assert bc.max() > 0  # paths actually flowed


def test_betweenness_batch_size_bitwise_invariant():
    # Multi-column batching must be an FP no-op: batch=1 (the per-source
    # loop) and batch=len(sources) give BITWISE-equal bc.
    rng = np.random.RandomState(11)
    n, m = 70, 260
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    s2 = np.concatenate([src[keep], dst[keep]]).astype(np.int64)
    d2 = np.concatenate([dst[keep], src[keep]]).astype(np.int64)
    key = s2 * n + d2
    _, idx = np.unique(key, return_index=True)
    s2, d2 = s2[idx], d2[idx]
    sources = [0, 3, 5, 9, 12, 20]
    engine = GraphEngine.from_arrays(s2, d2, n=n, P=3)
    bc1 = betweenness(engine, sources, batch=1)
    bcN = betweenness(engine, sources, batch=len(sources))
    bc4 = betweenness(engine, sources, batch=4)
    engine.shutdown()
    assert (bc1 == bcN).all()
    assert (bc1 == bc4).all()


def test_betweenness_path_graph_exact():
    # 0-1-2-3 path, undirected: bc (directed-pair convention) from all
    # sources = known closed form.
    s = np.array([0, 1, 1, 2, 2, 3], np.int64)
    d = np.array([1, 0, 2, 1, 3, 2], np.int64)
    engine = GraphEngine.from_arrays(s, d, n=4, P=2)
    bc = betweenness(engine, sources=[0, 1, 2, 3])
    engine.shutdown()
    want = brandes_oracle(s, d, 4, [0, 1, 2, 3])
    np.testing.assert_allclose(bc, want)
    # Middle vertices lie on 0-2, 0-3, 1-3 (and reverses): bc = 4 each.
    np.testing.assert_allclose(bc, [0.0, 4.0, 4.0, 0.0])
