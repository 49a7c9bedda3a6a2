"""Adamic-Adar vs a dense NumPy oracle."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.pipelines.linkpred import adamic_adar, adamic_adar_numpy


def _sym_edges(n=40, m=150, seed=3):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, n, m).astype(np.int64)
    d = rng.randint(0, n, m).astype(np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    src = np.r_[s, d]
    dst = np.r_[d, s]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def _check(exclude):
    n = 40
    src, dst = _sym_edges(n=n)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = adamic_adar(ds, exclude_edges=exclude).to_pandas()
    want = adamic_adar_numpy(src, dst, n, exclude_edges=exclude)
    got_map = {
        (int(r.u), int(r.v)): float(r.aa) for r in got.itertuples()
    }
    assert set(got_map) == set(want)
    for k in want:
        assert abs(got_map[k] - want[k]) < 1e-9, (k, got_map[k], want[k])


def test_adamic_adar_excluding_edges():
    _check(exclude=True)


def test_adamic_adar_all_pairs():
    _check(exclude=False)
