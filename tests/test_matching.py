"""Greedy maximal matching: matching + maximality invariants, and
block-layout independence (the result is a pure function of the edge
SET, not of how blocks arrive)."""

import numpy as np
import pyarrow as pa
import pytest


def _graph(seed, n, m):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, m).astype(np.int64)
    d = rng.integers(0, n, m).astype(np.int64)
    return s, d


@pytest.mark.parametrize("seed,n,m", [(3, 50, 200), (4, 120, 150)])
def test_matching_and_maximality(ray_session, seed, n, m):
    import ray.data

    from alp_ray.pipelines.matching import maximal_matching

    s, d = _graph(seed, n, m)
    edges = ray.data.from_arrow(pa.table({"src": s, "dst": d}))
    got, used = maximal_matching(edges, n=n)
    a = np.asarray(got.column("src"), np.int64)
    b = np.asarray(got.column("dst"), np.int64)
    # A matching: every vertex at most once.
    touched = np.concatenate([a, b])
    assert np.unique(touched).size == touched.size
    assert (a < b).all()
    # Maximal: every edge has a matched endpoint.
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    t = np.zeros(n, bool)
    t[touched] = True
    assert (t[lo] | t[hi]).all()
    assert used >= 1


def test_vertex_cover_covers_every_edge(ray_session):
    """Gavril cover = matched endpoints: must touch every edge and be
    at most 2× a lower bound (the matching size is a lower bound on
    any vertex cover)."""
    import ray.data

    from alp_ray.pipelines.matching import maximal_matching

    s, d = _graph(12, 70, 300)
    edges = ray.data.from_arrow(pa.table({"src": s, "dst": d}))
    m, _ = maximal_matching(edges, n=70)
    a = np.asarray(m.column("src"), np.int64)
    b = np.asarray(m.column("dst"), np.int64)
    cover = np.zeros(70, bool)
    cover[a] = True
    cover[b] = True
    keep = s != d
    assert (cover[s[keep]] | cover[d[keep]]).all()
    assert cover.sum() == 2 * len(a)  # exactly the matched endpoints


def test_matching_layout_independent(ray_session):
    import ray.data

    from alp_ray.pipelines.matching import maximal_matching

    s, d = _graph(9, 80, 400)
    tbl = pa.table({"src": s, "dst": d})
    one = ray.data.from_arrow(tbl)
    many = ray.data.from_arrow(tbl).repartition(7)
    g1, _ = maximal_matching(one, n=80)
    g2, _ = maximal_matching(many, n=80)
    assert g1.to_pydict() == g2.to_pydict()
