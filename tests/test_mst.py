"""Boruvka MSF vs an independent Kruskal union-find oracle.

Under the strict total edge order (w, a, b) the minimum spanning
forest is UNIQUE, so Boruvka and Kruskal must return the identical
edge SET — a much stronger check than total-weight equality.
"""

import numpy as np
import pyarrow as pa
import pytest


def _kruskal(a, b, w, n):
    order = np.lexsort((b, a, w))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[ra] = rb
            out.append((int(a[i]), int(b[i]), int(w[i])))
    return sorted(out)


def _random_graph(rng, n, m, wmax):
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    w = rng.integers(1, wmax + 1, m)
    return s.astype(np.int64), d.astype(np.int64), w.astype(np.int64)


@pytest.mark.parametrize("seed,n,m,wmax", [
    (0, 40, 120, 5),      # heavy weight ties
    (1, 60, 80, 1000),    # sparse, likely a forest (disconnected)
    (2, 25, 600, 3),      # dense multigraph with duplicate edges
])
def test_boruvka_matches_kruskal(ray_session, seed, n, m, wmax):
    import ray.data

    from alp_ray.pipelines.mst import boruvka_mst

    rng = np.random.default_rng(seed)
    s, d, w = _random_graph(rng, n, m, wmax)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d),
        "weight": pa.array(w),
    }))
    forest, used = boruvka_mst(edges, n=n)
    got = sorted(zip(
        np.asarray(forest.column("src")).tolist(),
        np.asarray(forest.column("dst")).tolist(),
        np.asarray(forest.column("weight")).tolist(),
    ))

    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    want = _kruskal(lo, hi, w[keep], n)
    assert got == want
    assert used <= int(np.ceil(np.log2(n))) + 1


def test_boruvka_empty_and_selfloops(ray_session):
    import ray.data

    from alp_ray.pipelines.mst import boruvka_mst

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([3, 4], pa.int64()),
        "dst": pa.array([3, 4], pa.int64()),
        "weight": pa.array([1, 2], pa.int64()),
    }))
    forest, used = boruvka_mst(edges, n=8)
    assert forest.num_rows == 0 and used == 0
