"""k-truss vs the sequential peeling oracle."""

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.pipelines.ktruss import ktruss, ktruss_numpy


def _graph(n=50, m=260, seed=23):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def test_ktruss_matches_oracle():
    src, dst = _graph()
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    for k in (3, 4, 5):
        got, rounds = ktruss(ds, k=k)
        have = set(
            zip(
                got.column("src").to_pylist(),
                got.column("dst").to_pylist(),
            )
        )
        want = ktruss_numpy(src, dst, k)
        assert have == want, (k, len(have), len(want))
        assert rounds >= 1


def test_ktruss_shuffle_path_matches_oracle():
    """The all-Dataset scale path (no broadcast CSR, no driver edge
    arrays) must peel identically to the sequential oracle. k=3 keeps
    the fixpoint at 2 rounds (k=4 needs 7 — pure fixed shuffle
    overhead on this VM; round semantics are identical)."""
    src, dst = _graph()
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got, rounds = ktruss(ds, k=3, method="shuffle")
    have = set(
        zip(got.column("src").to_pylist(), got.column("dst").to_pylist())
    )
    assert have == ktruss_numpy(src, dst, 3)
    assert rounds == 2


def test_ktruss_clique_survives():
    # A 5-clique is a 5-truss; a pendant edge never survives k>=3.
    cl = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges = cl + [(4, 9)]
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got, _ = ktruss(ds, k=5)
    have = set(
        zip(got.column("src").to_pylist(), got.column("dst").to_pylist())
    )
    assert have == set(cl)


def test_ktruss_shuffle_degree_join_route():
    """Shuffle path with the degree broadcast disabled (hash-JOIN
    attachment, the 10^12-vertex route) must peel identically."""
    src, dst = _graph()
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got, rounds = ktruss(
        ds, k=3, method="shuffle", degree_broadcast_limit=0
    )
    have = set(
        zip(got.column("src").to_pylist(), got.column("dst").to_pylist())
    )
    assert have == ktruss_numpy(src, dst, 3)
    assert rounds == 2


def truss_numpy(src, dst):
    """Per-edge trussness oracle via iterated peeling."""
    cur = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(src, dst) if a != b
    }
    t = {e: 2 for e in cur}
    k = 3
    while cur:
        cur = ktruss_numpy(
            np.array([e[0] for e in cur]), np.array([e[1] for e in cur]), k
        )
        for e in cur:
            t[e] = k
        k += 1
    return t


import pytest


@pytest.mark.parametrize("method", ["auto", "broadcast"])
def test_truss_decomposition_matches_oracle(method):
    """'auto' exercises the worker-resident single-task decomposition;
    'broadcast' forces the per-level Dataset ktruss loop."""
    from alp_ray.pipelines.ktruss import truss_decomposition

    src, dst = _graph()
    # Plant a 6-clique so multiple truss levels exist.
    cl = [(60 + i, 60 + j) for i in range(6) for j in range(i + 1, 6)]
    src = np.concatenate([src, np.array([e[0] for e in cl], np.int64)])
    dst = np.concatenate([dst, np.array([e[1] for e in cl], np.int64)])
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out, rounds = truss_decomposition(ds, method=method)
    df = out.to_pandas()
    have = {
        (int(r.src), int(r.dst)): int(r.trussness)
        for r in df.itertuples()
    }
    want = truss_numpy(src, dst)
    assert have == want
    assert max(have.values()) >= 6  # the planted clique's level
    assert all(r >= 1 for r in rounds.values())


def wtruss_numpy(edges_w: dict, thr: float):
    """Weighted-truss oracle: peel edges whose sum of min-triangle
    weights is below thr, to fixpoint."""
    cur = dict(edges_w)
    rounds = 0
    while True:
        rounds += 1
        adj = {}
        for x, y in cur:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        sup = {e: 0.0 for e in cur}
        for (x, y) in cur:
            for z in adj[x] & adj[y]:
                e1 = (min(x, z), max(x, z))
                e2 = (min(y, z), max(y, z))
                sup[(x, y)] += min(cur[(x, y)], cur[e1], cur[e2])
        nxt = {e: w for e, w in cur.items() if sup[e] >= thr}
        if set(nxt) == set(cur) or not nxt:
            return nxt, rounds
        cur = nxt


def test_ktruss_weighted_matches_oracle():
    from alp_ray.pipelines.ktruss import ktruss_weighted

    src, dst = _graph()
    w = ((src + dst) % 10 + 1).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "weight": w})
    )
    ew = {}
    for a, b, x in zip(src, dst, w):
        e = (min(int(a), int(b)), max(int(a), int(b)))
        ew[e] = min(ew.get(e, float("inf")), float(x))
    for thr in (4.0, 9.0):
        got, rounds = ktruss_weighted(ds, threshold=thr)
        have = {
            (int(a), int(b)): float(x)
            for a, b, x in zip(
                got.column("src").to_pylist(),
                got.column("dst").to_pylist(),
                got.column("weight").to_pylist(),
            )
        }
        want, _ = wtruss_numpy(ew, thr)
        assert have == want, (thr, len(have), len(want))
        assert rounds >= 1


@pytest.mark.parametrize("deg_limit", [None, 0])
def test_ktruss_weighted_shuffle_matches_oracle(deg_limit):
    """The all-Dataset weighted scale path (weight carried through
    orientation/wedges, min-folded at the closing match, summed in the
    support fold) must peel identically to both the sequential oracle
    and the worker-resident broadcast form. deg_limit=0 forces the
    degree hash-JOIN attachment (the 10^12-vertex route)."""
    from alp_ray.pipelines.ktruss import ktruss_weighted

    src, dst = _graph()
    w = ((src + dst) % 10 + 1).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "weight": w})
    )
    ew = {}
    for a, b, x in zip(src, dst, w):
        e = (min(int(a), int(b)), max(int(a), int(b)))
        ew[e] = min(ew.get(e, float("inf")), float(x))
    kw = {} if deg_limit is None else {
        "degree_broadcast_limit": deg_limit
    }
    got, rounds = ktruss_weighted(
        ds, threshold=4.0, method="shuffle", **kw
    )
    have = {
        (int(a), int(b)): float(x)
        for a, b, x in zip(
            got.column("src").to_pylist(),
            got.column("dst").to_pylist(),
            got.column("weight").to_pylist(),
        )
    }
    want, _ = wtruss_numpy(ew, 4.0)
    assert have == want, (len(have), len(want))
    assert rounds >= 1
