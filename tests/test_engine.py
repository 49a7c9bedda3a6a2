"""GraphShard engine: spmv supersteps vs dense NumPy, all semirings."""

import numpy as np
import pytest

import ray

from alp_ray.state.engine import GraphEngine, write_partitioned_edges


def _random_graph(n=60, m=300, seed=7, weighted=True):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    w = rng.rand(m) + 0.1 if weighted else None
    return src, dst, w


def _dense(src, dst, w, n):
    A = np.zeros((n, n))
    np.add.at(A, (src, dst), np.ones(len(src)) if w is None else w)
    return A


def _run_spmv(engine, x, semiring):
    engine.set_state_by_vertex("x", x)

    def pre(state, ctx):
        return state["x"]

    def post(state, y, ctx):
        state["y"] = y
        return {}

    engine.superstep(pre, semiring, post)
    return engine.get_state_by_vertex("y")


@pytest.fixture(scope="module")
def graph():
    n = 60
    src, dst, w = _random_graph(n=n)
    # Dedup (src,dst) pairs — engine contract mirrors buildMatrixUnique.
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst, w = src[idx], dst[idx], w[idx]
    engine = GraphEngine.from_arrays(src, dst, w, n=n, P=4)
    yield engine, src, dst, w, n
    engine.shutdown()


def test_spmv_plus_times(graph):
    engine, src, dst, w, n = graph
    rng = np.random.RandomState(1)
    x = rng.rand(n)
    y = _run_spmv(engine, x, "plus_times")
    np.testing.assert_allclose(y, _dense(src, dst, w, n).T @ x, rtol=1e-12)


def test_spmv_plus_first_pattern(graph):
    engine, src, dst, w, n = graph
    x = np.arange(n, dtype=float)
    y = _run_spmv(engine, x, "plus_first")
    A = (_dense(src, dst, w, n) > 0).astype(float)
    np.testing.assert_allclose(y, A.T @ x, rtol=1e-12)


def test_spmv_min_plus(graph):
    engine, src, dst, w, n = graph
    rng = np.random.RandomState(2)
    x = rng.rand(n) * 10
    y = _run_spmv(engine, x, "min_plus")
    A = _dense(src, dst, w, n)
    expect = np.full(n, np.inf)
    for s, d, wt in zip(src, dst, w):
        expect[d] = min(expect[d], x[s] + wt)
    np.testing.assert_allclose(y, expect)


def test_spmv_max_first(graph):
    engine, src, dst, w, n = graph
    rng = np.random.RandomState(3)
    x = rng.rand(n)
    y = _run_spmv(engine, x, "max_first")
    expect = np.full(n, -np.inf)
    for s, d in zip(src, dst):
        expect[d] = max(expect[d], x[s])
    np.testing.assert_allclose(y, expect)


def test_sparse_frontier_matches_dense(graph):
    engine, src, dst, w, n = graph
    rng = np.random.RandomState(4)
    x = rng.rand(n)
    active = rng.rand(n) < 0.3
    engine.set_state_by_vertex("x", x)
    engine.set_state_by_vertex("act", active.astype(float))

    def pre(state, ctx):
        return state["x"], state["act"] > 0.5

    def post(state, y, ctx):
        state["y"] = y
        return {}

    engine.superstep(pre, "plus_times", post)
    y = engine.get_state_by_vertex("y")
    expect = np.zeros(n)
    for s, d, wt in zip(src, dst, w):
        if active[s]:
            expect[d] += x[s] * wt
    np.testing.assert_allclose(y, expect, rtol=1e-12)


def test_out_degrees_and_use_index(graph):
    engine, src, dst, w, n = graph
    engine.compute_out_degrees("outdeg")
    outdeg = engine.get_state_by_vertex("outdeg")
    expect = np.bincount(src, minlength=n).astype(float)
    np.testing.assert_array_equal(outdeg, expect)
    engine.set_state_use_index("vid")
    np.testing.assert_array_equal(
        engine.get_state_by_vertex("vid"), np.arange(n, dtype=float)
    )


def test_partitioned_parquet_build(tmp_path):
    import ray.data

    n = 40
    src, dst, w = _random_graph(n=n, m=150, seed=11)
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst, w = src[idx], dst[idx], w[idx]
    ds = ray.data.from_arrow(
        __import__("pyarrow").table(
            {"src": src, "dst": dst, "weight": w}
        )
    )
    P = 4
    path = str(tmp_path / "edges")
    write_partitioned_edges(ds, P, path)
    engine = GraphEngine.from_partitioned_parquet(path, n=n, m=len(src), P=P)
    rng = np.random.RandomState(5)
    x = rng.rand(n)
    y = _run_spmv(engine, x, "plus_times")
    np.testing.assert_allclose(y, _dense(src, dst, w, n).T @ x, rtol=1e-12)
    engine.shutdown()


@pytest.mark.parametrize("exchange", ["fused", "split"])
def test_exchange_modes_agree(exchange):
    """The 'split' exchange (per-destination objects — the multi-node
    shape where column q ships only to shard q) must produce the same
    spmv as the fused single-bundle path."""
    n = 40
    src, dst, w = _random_graph(n=n, m=200, seed=11)
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst, w = src[idx], dst[idx], w[idx]
    engine = GraphEngine.from_arrays(src, dst, w, n=n, P=3)
    engine.exchange = exchange
    rng = np.random.RandomState(3)
    x = rng.rand(n)
    y = _run_spmv(engine, x, "plus_times")
    engine.shutdown()
    np.testing.assert_allclose(y, _dense(src, dst, w, n).T @ x, rtol=1e-12)


def test_hot_source_split_spmv_and_pagerank():
    """Re-homing hot sources' edges to destination shards must preserve
    spmv and PageRank results exactly (up to FP reduction order)."""
    from alp_ray.pipelines.pagerank import pagerank

    rng = np.random.RandomState(21)
    n = 80
    # One mega-hub source (vertex 2 points at almost everyone) + noise.
    hub_dst = np.setdiff1d(np.arange(n), [2])
    src = np.concatenate(
        [np.full(hub_dst.size, 2), rng.randint(0, n, 300)]
    ).astype(np.int64)
    dst = np.concatenate([hub_dst, rng.randint(0, n, 300)]).astype(
        np.int64
    )
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    w = rng.rand(src.size) + 0.5

    # Same x for both runs.
    xs = np.random.RandomState(5).rand(n)

    def spmv_of(eng):
        eng.set_state_by_vertex("x", xs)

        def pre(state, ctx):
            return state["x"]

        def post(state, y, ctx):
            state["y"] = y
            return {}

        eng.superstep(pre, "plus_times", post)
        return eng.get_state_by_vertex("y")

    e1 = GraphEngine.from_arrays(src, dst, w, n=n, P=4)
    y1 = spmv_of(e1)
    r1 = pagerank(e1, conv=1e-10, max_iters=60)
    pr1 = e1.get_state_by_vertex("pr")
    e1.shutdown()

    e2 = GraphEngine.from_arrays(src, dst, w, n=n, P=4)
    moved = e2.enable_hot_source_split(threshold=20)
    assert moved >= hub_dst.size - 1
    y2 = spmv_of(e2)
    # Pipelined loop must carry the hot bundles too.
    r2 = pagerank(e2, conv=1e-10, max_iters=60, sync_every=8)
    pr2 = e2.get_state_by_vertex("pr")
    # Sparse-frontier path (khop) over the split engine.
    from alp_ray.pipelines.traversal import khop

    mask2, size2 = khop(e2, source=2, k=2)
    e2.shutdown()

    np.testing.assert_allclose(y2, y1, rtol=1e-12)
    np.testing.assert_allclose(pr2, pr1, rtol=1e-9)
    assert r2.iterations == r1.iterations

    e3 = GraphEngine.from_arrays(src, dst, w, n=n, P=4)
    mask3, size3 = khop(e3, source=2, k=2)
    e3.shutdown()
    assert size2 == size3 and (mask2 == mask3).all()


def test_build_order_determinism_bitwise():
    """Iterative solvers amplify last-ulp differences, so the engine's
    per-segment FP accumulation order must not depend on edge INGEST
    order (streaming from_dataset blocks arrive in nondeterministic
    order). _build's (dst_part, dst, src) lexsort guarantees it: the
    same edge set fed in two different permutations must produce
    bitwise-identical spmv and CG results."""
    from alp_ray.pipelines.linalg import conjugate_gradient

    n = 60
    src, dst, w = _random_graph(n=n, m=400, seed=11)
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst, w = src[idx], dst[idx], w[idx]
    # SPD system: A = sym(W) + diag(1 + weighted degree).
    s2 = np.r_[src, dst]
    d2 = np.r_[dst, src]
    w2 = np.r_[w, w]
    key2 = s2 * n + d2
    _, idx2 = np.unique(key2, return_index=True)
    s2, d2, w2 = s2[idx2], d2[idx2], w2[idx2]
    deg = np.zeros(n)
    np.add.at(deg, s2, w2)
    rows = np.r_[s2, np.arange(n)]
    cols = np.r_[d2, np.arange(n)]
    vals = np.r_[w2, 1.0 + deg]
    # Combine duplicate coordinates (self-loop edge + diagonal): the
    # engine's buildMatrixUnique contract takes distinct (src, dst) —
    # the real CG query pre-sums via groupby before ingest.
    ck = rows * n + cols
    uk, inv = np.unique(ck, return_inverse=True)
    vsum = np.zeros(uk.size)
    np.add.at(vsum, inv, vals)
    rows, cols, vals = uk // n, uk % n, vsum
    b = ((np.arange(n) % 7) + 1) / 10.0

    results = []
    for seed in (0, 1):
        perm = np.random.RandomState(seed).permutation(rows.size)
        eng = GraphEngine.from_arrays(
            rows[perm], cols[perm], vals[perm], n=n, P=4
        )
        x, _, _ = conjugate_gradient(eng, b, tol=0.0, max_iters=12)
        eng.shutdown()
        results.append(x)
    # Bitwise, not allclose: the driver gate hashes exact rounded values.
    assert (results[0] == results[1]).all()
