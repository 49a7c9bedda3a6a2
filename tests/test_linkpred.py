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


def test_jaccard_similarity_vs_dense_oracle():
    from alp_ray.pipelines.linkpred import jaccard_similarity

    rng = np.random.RandomState(2)
    n, m = 25, 60
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    key = s * n + d
    _, idx = np.unique(key, return_index=True)
    s, d = s[idx], d[idx]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64()),
    }))
    got = {
        (r.u, r.v): r.jaccard
        for r in jaccard_similarity(edges).to_pandas().itertuples()
    }
    A = np.zeros((n, n))
    A[s, d] = 1.0
    deg = A.sum(1)
    want = {}
    for u in range(n):
        for v in range(u + 1, n):
            if A[u, v]:
                continue
            c = float(A[u] @ A[v])
            if c:
                want[(u, v)] = round(c / (deg[u] + deg[v] - c), 6)
    assert got == want


def test_average_neighbor_degree_vs_dense():
    from alp_ray.pipelines.linkpred import average_neighbor_degree

    # Star 0-(1,2,3) plus edge 1-2 (symmetric).
    s = np.array([0, 1, 0, 2, 0, 3, 1, 2], np.int64)
    d = np.array([1, 0, 2, 0, 3, 0, 2, 1], np.int64)
    edges = ray.data.from_arrow(pa.table({"src": s, "dst": d}))
    got = (
        average_neighbor_degree(edges)
        .to_pandas()
        .set_index("vertex")["avg_nbr_deg"]
        .sort_index()
    )
    # deg: 0->3, 1->2, 2->2, 3->1
    assert got.loc[0] == round((2 + 2 + 1) / 3, 6)
    assert got.loc[1] == round((3 + 2) / 2, 6)
    assert got.loc[2] == round((3 + 2) / 2, 6)
    assert got.loc[3] == 3.0
