"""SALSA (degree-normalized HITS walk) vs its NumPy oracle."""

import numpy as np

from alp_ray.pipelines.salsa import salsa, salsa_numpy
from alp_ray.state.engine import GraphEngine


def _digraph(n=80, m=400, seed=17):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_salsa_matches_numpy_oracle():
    n = 80
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    res = salsa(engine, iters=12)
    a = engine.get_state_by_vertex("a")
    h = engine.get_state_by_vertex("h")
    engine.shutdown()
    a_ref, h_ref = salsa_numpy(src, dst, n, iters=12)
    np.testing.assert_allclose(a, a_ref, atol=1e-12)
    np.testing.assert_allclose(h, h_ref, atol=1e-12)
    # L1-normalized distributions, mass on linked vertices only.
    assert abs(a.sum() - 1.0) < 1e-12
    assert abs(h.sum() - 1.0) < 1e-12
    assert (a >= 0).all() and (h >= 0).all()
    assert res.iterations == 12


def test_salsa_star_graph_closed_form():
    """Star i→0 for i=1..4: every walk collapses in one step — a is
    the point mass at the hub, h is uniform over the leaves, for any
    iteration count."""
    src = np.array([1, 2, 3, 4], np.int64)
    dst = np.zeros(4, np.int64)
    engine = GraphEngine.from_arrays(src, dst, None, n=5, P=2)
    salsa(engine, iters=5)
    a = engine.get_state_by_vertex("a")
    h = engine.get_state_by_vertex("h")
    engine.shutdown()
    np.testing.assert_allclose(a, [1, 0, 0, 0, 0], atol=1e-15)
    np.testing.assert_allclose(h, [0, 0.25, 0.25, 0.25, 0.25],
                               atol=1e-15)
