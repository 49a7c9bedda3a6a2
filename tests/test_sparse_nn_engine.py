"""Engine-resident multi-layer sparse NN (stashed per-layer edge sets,
one superstep per layer — ref sparse_nn_single_inference.hpp:52+)."""

import numpy as np

from alp_ray.pipelines.linalg import sparse_nn_engine
from alp_ray.state.engine import GraphEngine


def _dense_oracle(mats, biases, x0, thr):
    h = x0.astype(np.float64)
    for W, b in zip(mats, biases):
        h = np.maximum(W.T @ h + b, 0.0)
        if thr is not None:
            h = np.minimum(h, thr)
    return h


def test_sparse_nn_engine_vs_numpy_exact():
    # Integer weights/inputs/biases: every sum is exact in float64, so
    # engine output equals the dense oracle BITWISE regardless of
    # shard-partial summation order.
    rng = np.random.RandomState(41)
    n, L = 40, 3
    engine = GraphEngine.from_arrays(
        np.array([0], np.int64), np.array([1], np.int64), None, n=n, P=3
    )
    mats, keys, biases = [], [], []
    for li in range(L):
        W = np.zeros((n, n))
        mask = rng.rand(n, n) < 0.25
        W[mask] = rng.randint(-2, 3, mask.sum())
        mats.append(W)
        s, d = np.nonzero(W)
        key = f"l{li}"
        engine.add_edge_layer(key, s, d, W[s, d])
        keys.append(key)
        biases.append(float(-li - 1))
    x0 = rng.randint(0, 5, n).astype(np.float64)
    ids0 = np.flatnonzero(x0 > 0)
    xv, xi = sparse_nn_engine(
        engine, keys, biases, (x0[ids0], ids0), threshold=64.0
    )
    engine.shutdown()
    want = _dense_oracle(mats, biases, x0, 64.0)
    got = np.zeros(n)
    got[xi] = xv
    assert (got == np.where(want > 0, want, 0.0)).all()


def test_sparse_nn_engine_synth_stack_matches_dumped_oracle():
    n, L, fan = 120, 4, 6
    keys = [f"w{li}" for li in range(L)]
    engine = GraphEngine.synth_layer_stack(
        n, P=4, keys=keys, fan=fan, seed=7
    )
    # Rebuild each layer densely from the engine's own dump.
    mats = []
    for k in keys:
        engine.use_edges(k)
        s, d, w = engine.dump_edges()
        W = np.zeros((n, n))
        W[s, d] = w
        mats.append(W)
    biases = [-1.0] * L
    x0 = (np.arange(n) % 4).astype(np.float64)
    ids0 = np.flatnonzero(x0 > 0)
    xv, xi = sparse_nn_engine(
        engine, keys, biases, (x0[ids0], ids0), threshold=32.0
    )
    engine.shutdown()
    h = x0
    for W, b in zip(mats, biases):
        h = np.minimum(np.maximum(W.T @ h + b, 0.0), 32.0)
    got = np.zeros(n)
    got[xi] = xv
    assert (got == h).all()
    assert (xv > 0).all()


def test_edge_stash_swap_restores_exact_sets():
    # stash/use round-trips preserve the built arrays (pointer swap).
    n = 30
    e1 = (np.array([0, 3, 6], np.int64), np.array([1, 4, 7], np.int64))
    e2 = (np.array([2, 5], np.int64), np.array([9, 9], np.int64))
    engine = GraphEngine.from_arrays(e1[0], e1[1], None, n=n, P=3)
    engine.stash_edges("a")
    engine.add_edge_layer("b", e2[0], e2[1], None)
    engine.use_edges("a")
    s, d, _ = engine.dump_edges()
    assert sorted(zip(s, d)) == sorted(zip(e1[0], e1[1]))
    engine.use_edges("b")
    s, d, _ = engine.dump_edges()
    assert sorted(zip(s, d)) == sorted(zip(e2[0], e2[1]))
    engine.shutdown()
