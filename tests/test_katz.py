"""Katz + eigenvector centrality vs NumPy oracles (exact FP mirror)."""

import numpy as np

from alp_ray.pipelines.katz import eigencentrality, katz
from alp_ray.state.engine import GraphEngine


def _digraph(n=80, m=400, seed=7):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_katz_matches_numpy():
    n = 80
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    katz(engine, alpha=0.05, iters=15)
    got = engine.get_state_by_vertex("x")
    engine.shutdown()

    A = np.zeros((n, n))
    A[src, dst] = 1.0
    x = np.zeros(n)
    for _ in range(15):
        x = 0.05 * (A.T @ x) + 1.0
    np.testing.assert_allclose(got, x, rtol=1e-12)
    assert (got >= 1.0).all()  # beta=1 floor


def test_eigencentrality_matches_numpy():
    n = 80
    src, dst = _digraph(n=n, seed=13)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    eigencentrality(engine, iters=15)
    got = engine.get_state_by_vertex("x")
    engine.shutdown()

    A = np.zeros((n, n))
    A[src, dst] = 1.0
    x = np.ones(n)
    for _ in range(15):
        inv = 1.0 / np.sqrt(float(np.dot(x, x)))
        x = (A.T @ x) * inv
    x = x * (1.0 / np.sqrt(float(np.dot(x, x))))
    np.testing.assert_allclose(got, x, rtol=1e-10)
    # Unit 2-norm after the final self-normalization.
    assert abs(np.dot(got, got) - 1.0) < 1e-9
    # Power iteration from a positive start converges toward the
    # Perron vector: all entries non-negative.
    assert (got >= -1e-12).all()
