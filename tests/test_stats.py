"""Distributed statistics operators vs NumPy oracles."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.stages.stats import (
    degree_histogram,
    exact_percentiles,
    weighted_sample,
)


def _edges_ds(n=50, m=400, seed=5):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    t = pa.table({"src": src, "dst": dst})
    return ray.data.from_arrow(t).repartition(4), src, dst


def test_degree_histogram():
    ds, src, _ = _edges_ds()
    got = degree_histogram(ds, key="src").to_pandas()
    deg = np.bincount(src)
    deg = deg[deg > 0]
    vals, cnts = np.unique(deg, return_counts=True)
    assert got["degree"].tolist() == vals.tolist()
    assert got["n_vertices"].tolist() == cnts.tolist()


def test_exact_percentiles_matches_order_statistic():
    rng = np.random.RandomState(9)
    v = rng.lognormal(3.0, 1.5, 20_000)
    ds = ray.data.from_arrow(pa.table({"x": v})).repartition(8)
    qs = (0.1, 0.5, 0.9, 0.999)
    got = exact_percentiles(ds, "x", qs, sample_per_block=256)
    s = np.sort(v)
    for q, val in zip(got.column("q").to_pylist(),
                      got.column("value").to_pylist()):
        k = max(1, int(np.ceil(q * v.size)))
        assert val == s[k - 1], (q, val, s[k - 1])


def test_exact_percentiles_skewed_duplicates():
    # Mass concentrated on one value — brackets must still resolve.
    v = np.r_[np.full(5000, 7.0), np.arange(100, dtype=np.float64)]
    ds = ray.data.from_arrow(pa.table({"x": v})).repartition(4)
    got = exact_percentiles(ds, "x", (0.5, 0.99), sample_per_block=64)
    s = np.sort(v)
    for q, val in zip(got.column("q").to_pylist(),
                      got.column("value").to_pylist()):
        k = max(1, int(np.ceil(q * v.size)))
        assert val == s[k - 1]


def test_weighted_sample_matches_ares_oracle():
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 17 + 1).astype(np.float64) * 10
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "w": w})
    ).repartition(6)
    got = weighted_sample(
        ds, "doc_id", lambda b: np.asarray(b.column("w"), np.float64),
        k=25,
    )
    mult, mod = 48271, 2147483647
    u = ((ids * mult + 13) % mod + 1).astype(np.float64) / (mod + 1)
    score = -np.log(u) / w
    order = np.lexsort((ids, score))[:25]
    assert got.column("doc_id").to_pylist() == ids[order].tolist()
    np.testing.assert_array_equal(
        np.asarray(got.column("score")), score[order]
    )


def test_degree_assortativity_matches_numpy():
    import ray.data

    from alp_ray.stages.stats import degree_assortativity

    rng = np.random.RandomState(3)
    src = rng.randint(0, 40, 300).astype(np.int64)
    dst = rng.randint(0, 40, 300).astype(np.int64)
    keep = src != dst
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    sym = np.unique(
        np.concatenate([e, e[:, ::-1]], axis=0), axis=0
    )
    s, d = sym[:, 0], sym[:, 1]
    deg = np.bincount(s, minlength=40)
    x, y = deg[s].astype(np.float64), deg[d].astype(np.float64)
    n = float(x.size)
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(n * (x * x).sum() - x.sum() ** 2) * np.sqrt(
        n * (y * y).sum() - y.sum() ** 2
    )
    expected = num / den
    ds = ray.data.from_arrow(pa.table({"src": s, "dst": d}))
    got = degree_assortativity(ds)
    assert abs(got - expected) < 1e-9


def test_reciprocity_counts():
    import ray.data

    from alp_ray.stages.stats import reciprocity

    src = np.array([0, 1, 2, 3, 4], np.int64)
    dst = np.array([1, 0, 3, 2, 0], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    matched, total = reciprocity(ds)
    assert (matched, total) == (4, 5)


def test_pearson_corr_matches_numpy():
    from alp_ray.stages.stats import pearson_corr

    rng = np.random.RandomState(6)
    n = 400
    x = np.round(rng.uniform(1, 50, n), 2)
    y = np.round(3.5 * x + rng.normal(0, 20, n), 2)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
    })).repartition(5)
    got = pearson_corr(ds, "x", "y")
    want = np.corrcoef(np.rint(x * 100), np.rint(y * 100))[0, 1]
    assert abs(got - want) < 1e-9
    assert got > 0.9  # the planted linear trend dominates
