"""Maximal independent set vs the sequential greedy-priority oracle."""

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.pipelines.mis import maximal_independent_set, mis_numpy
from alp_ray.state.engine import GraphEngine


def _sym_graph(n=80, m=300, seed=13):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    e = np.unique(
        np.stack([src[keep], dst[keep]], axis=1), axis=0
    )
    s = np.concatenate([e[:, 0], e[:, 1]])
    d = np.concatenate([e[:, 1], e[:, 0]])
    sym = np.unique(np.stack([s, d], axis=1), axis=0)
    return sym[:, 0], sym[:, 1]


def test_mis_matches_sequential_greedy():
    n = 80
    src, dst = _sym_graph(n=n)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    engine = GraphEngine.from_dataset(ds, n=n, P=3, dedupe=True)
    got, rounds = maximal_independent_set(engine)
    engine.shutdown()
    want = mis_numpy(src, dst, n)
    assert (got == want).all()
    assert rounds >= 1
    # Independence + maximality directly.
    for s, d in zip(src, dst):
        assert not (got[s] and got[d])
    blocked = np.zeros(n, bool)
    for s, d in zip(src, dst):
        if got[s]:
            blocked[d] = True
        if got[d]:
            blocked[s] = True
    assert (got | blocked).all()
