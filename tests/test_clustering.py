"""Local clustering coefficient vs a dense NumPy oracle."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.pipelines.clustering import (
    clustering_coefficient,
    clustering_numpy,
)


def test_clustering_coefficient_matches_dense():
    n = 60
    rng = np.random.RandomState(23)
    src = rng.randint(0, n, 300).astype(np.int64)
    dst = rng.randint(0, n, 300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = clustering_coefficient(ds).to_pandas()
    want = clustering_numpy(src, dst, n)
    got_map = {int(r.vertex): float(r.cc) for r in got.itertuples()}
    assert set(got_map) == set(want)
    for v in want:
        assert abs(got_map[v] - want[v]) < 1e-12, (v, got_map[v], want[v])


def test_clustering_triangle_and_leaf():
    # Triangle 0-1-2 plus a pendant 3 attached to 0.
    src = np.array([0, 1, 2, 0], np.int64)
    dst = np.array([1, 2, 0, 3], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = {
        int(r.vertex): float(r.cc)
        for r in clustering_coefficient(ds).to_pandas().itertuples()
    }
    assert got[1] == 1.0 and got[2] == 1.0
    assert got[0] == 2.0 * 1 / (3 * 2)  # deg 3, one triangle
    assert got[3] == 0.0  # leaf
