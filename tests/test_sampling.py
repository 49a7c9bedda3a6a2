"""neighbor_sample vs the sequential oracle on a random sparse graph."""

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.pipelines.sampling import (
    neighbor_sample,
    neighbor_sample_numpy,
)


def _graph(n=60, m=400, seed=7):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    e = np.unique(
        np.stack([src[keep], dst[keep]], axis=1), axis=0
    )
    return e[:, 0], e[:, 1]


def test_neighbor_sample_matches_oracle():
    src, dst = _graph()
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = neighbor_sample(ds, seeds=[0, 1, 2], fanouts=(4, 2))
    rows = {
        (r["src"], r["dst"], r["hop"]) for r in got.take_all()
    }
    exp = set(neighbor_sample_numpy(src, dst, [0, 1, 2], (4, 2)))
    assert rows == exp and len(exp) > 0


def test_neighbor_sample_respects_fanout_and_determinism():
    src, dst = _graph(seed=11)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out1 = neighbor_sample(ds, seeds=[5], fanouts=(3,)).take_all()
    out2 = neighbor_sample(ds, seeds=[5], fanouts=(3,)).take_all()
    assert sorted(map(tuple, (r.values() for r in out1))) == sorted(
        map(tuple, (r.values() for r in out2))
    )
    assert len(out1) <= 3
    # Seeds with no out-edges: empty result, stable schema.
    empty = neighbor_sample(ds, seeds=[10_000], fanouts=(3, 2))
    assert empty.count() == 0
