"""HITS + the transpose exchange (build_reversed) vs NumPy oracles."""

import numpy as np

from alp_ray.pipelines.hits import hits, hits_numpy
from alp_ray.state.engine import GraphEngine


def _digraph(n=80, m=400, seed=11):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_build_reversed_transpose_exchange():
    n = 80
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    engine.build_reversed("fwd", "rev")

    # Reversed set must be exactly the transposed edge list.
    engine.use_edges("rev")
    dumped = [d for d in engine_dump(engine)]
    rs = np.concatenate([d[0] for d in dumped])
    rd = np.concatenate([d[1] for d in dumped])
    got = set(zip(rs.tolist(), rd.tolist()))
    assert got == set(zip(dst.tolist(), src.tolist()))

    # Forward set restored as active and intact.
    engine.use_edges("fwd")
    dumped = [d for d in engine_dump(engine)]
    fs = np.concatenate([d[0] for d in dumped])
    fd = np.concatenate([d[1] for d in dumped])
    assert set(zip(fs.tolist(), fd.tolist())) == \
        set(zip(src.tolist(), dst.tolist()))

    # Superstep on the reversed set computes A·x (y[src] += x[dst]).
    rng = np.random.RandomState(3)
    x = rng.rand(n)
    engine.set_state_by_vertex("x", x)

    def pre(state, ctx):
        return state["x"]

    def post(state, y, ctx):
        state["y"] = y
        return {}

    engine.superstep(pre, "plus_first", post, scalars={"_edges_key": "rev"})
    y = engine.get_state_by_vertex("y")
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)
    engine.shutdown()


def engine_dump(engine):
    import ray

    return ray.get([s.dump_edges.remote() for s in engine.shards])


def test_hits_matches_numpy_oracle():
    n = 80
    src, dst = _digraph(n=n)
    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    res = hits(engine, iters=12)
    a = engine.get_state_by_vertex("a")
    h = engine.get_state_by_vertex("h")
    engine.shutdown()
    a_ref, h_ref = hits_numpy(src, dst, n, iters=12)
    np.testing.assert_allclose(a, a_ref, atol=1e-12)
    np.testing.assert_allclose(h, h_ref, atol=1e-12)
    assert abs(np.dot(a, a) - 1.0) < 1e-12
    assert abs(np.dot(h, h) - 1.0) < 1e-12
    assert res.iterations == 12
