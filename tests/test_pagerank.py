"""PageRank conformance: the reference's own 10-vertex golden + oracle."""

import numpy as np
import pytest

from alp_ray.pipelines.pagerank import pagerank
from alp_ray.state.engine import GraphEngine

from . import oracle

# FIXTURES.md F2 ≙ /root/reference/tests/smoke/hook/small_simple_pagerank.cpp
# :24-36 (ring i→(i+1)%10 plus chord 7→9); printed golden at
# tests/smoke/smoketests.sh:154.
RING_SRC = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 7], dtype=np.int64)
RING_DST = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 9], dtype=np.int64)
GOLDEN = np.array(
    [0.106896, 0.105862, 0.104983, 0.104235, 0.1036,
     0.10306, 0.102601, 0.102211, 0.0584396, 0.108113]
)


def test_ten_vertex_golden():
    engine = GraphEngine.from_arrays(RING_SRC, RING_DST, n=10, P=3)
    res = pagerank(engine, alpha=0.85, conv=1e-7, max_iters=1000)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    assert res.converged
    # Reference prints 6 significant digits.
    np.testing.assert_allclose(pr, GOLDEN, rtol=5e-6)


def test_random_graph_vs_oracle_with_dangling():
    rng = np.random.RandomState(42)
    n, m = 200, 900
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # Force dangling vertices: strip all out-edges of ids 190..199.
    keep = src < 190
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]

    engine = GraphEngine.from_arrays(src, dst, n=n, P=4)
    res = pagerank(engine, conv=1e-10)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    expect = oracle.pagerank(src, dst, n, conv=1e-10)
    assert res.converged
    np.testing.assert_allclose(pr, expect, atol=1e-6)
    # Reference verification tolerances (output_verification.hpp:93-99).
    assert np.linalg.norm(pr - expect) <= 1e-5 * np.linalg.norm(expect)
    assert np.abs(pr - expect).max() <= 1e-6 * np.abs(expect).max() + 1e-12
    np.testing.assert_allclose(pr.sum(), 1.0, atol=1e-9)


def test_pagerank_throughput_accounting():
    engine = GraphEngine.from_arrays(RING_SRC, RING_DST, n=10, P=2)
    res = pagerank(engine)
    engine.shutdown()
    assert res.traversed_edges == res.m * res.iterations
    assert res.edges_per_sec > 0


def test_personalized_pagerank_vs_oracle():
    rng = np.random.RandomState(55)
    n, m = 120, 500
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    # Teleport to a 5-vertex seed set.
    t = np.zeros(n)
    t[[1, 7, 20, 33, 90]] = 0.2

    engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
    res = pagerank(engine, conv=1e-10, personalize=t)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()

    # Dense oracle with teleport vector t.
    A = np.zeros((n, n), bool)
    A[src, dst] = True
    outdeg = A.sum(1)
    dangling = outdeg == 0
    scale = np.where(dangling, 0.0, 0.85 / np.maximum(outdeg, 1))
    p = np.full(n, 1.0 / n)
    for _ in range(1000):
        d_mass = p[dangling].sum()
        x = p * scale
        coef = 0.85 * d_mass + 0.15
        p_new = A.T @ x + coef * t
        if np.abs(p_new - p).sum() <= 1e-10:
            p = p_new
            break
        p = p_new
    assert res.converged
    np.testing.assert_allclose(pr, p, atol=1e-8)
    # Seeds and their neighbourhoods dominate.
    assert pr[[1, 7, 20, 33, 90]].sum() > 5.0 / n


def test_weighted_pagerank_vs_numpy():
    from alp_ray.pipelines.pagerank import weighted_pagerank
    from alp_ray.state.engine import GraphEngine

    rng = np.random.RandomState(4)
    n, m = 30, 90
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    w = ((src + dst) % 10 + 1).astype(np.float64)
    eng = GraphEngine.from_arrays(src, dst, n=n, P=3, w=w)
    try:
        weighted_pagerank(eng, max_iters=15, sync_every=15)
        got = eng.get_state_by_vertex("pr")
    finally:
        eng.shutdown()

    alpha = 0.85
    wsum = np.zeros(n)
    np.add.at(wsum, src, w)
    pr = np.full(n, 1.0 / n)
    for _ in range(15):
        x = np.where(wsum > 0, pr * (alpha / np.maximum(wsum, 1)), 0.0)
        y = np.zeros(n)
        np.add.at(y, dst, x[src] * w)
        dang = pr[wsum == 0].sum()
        pr = y + (alpha * dang + (1 - alpha)) / n
    np.testing.assert_allclose(got, pr, atol=1e-12)
