"""1-WL refinement: structural semantics + layout independence."""

import numpy as np
import pyarrow as pa


def _sym(s, d):
    return (
        np.concatenate([s, d]).astype(np.int64),
        np.concatenate([d, s]).astype(np.int64),
    )


def _run(ray_session, s, d, n, rounds):
    import ray.data

    from alp_ray.pipelines.wl import wl_refinement

    ss, dd = _sym(s, d)
    edges = ray.data.from_arrow(pa.table({"src": ss, "dst": dd}))
    return wl_refinement(edges, n=n, rounds=rounds)


def test_wl_regular_graph_stays_monochrome(ray_session):
    # 6-cycle: 2-regular and vertex-transitive — one color forever.
    s = np.arange(6)
    d = (s + 1) % 6
    c = _run(ray_session, s, d, 6, rounds=4)
    assert np.unique(c).size == 1


def test_wl_path_refines_by_distance_to_end(ray_session):
    # Path 0-1-2-3-4: round k separates vertices at distance ≤ k from
    # an endpoint; the stable partition is {0,4},{1,3},{2}.
    s = np.array([0, 1, 2, 3])
    d = np.array([1, 2, 3, 4])
    c = _run(ray_session, s, d, 5, rounds=3)
    assert c[0] == c[4] and c[1] == c[3]
    assert len({int(c[0]), int(c[1]), int(c[2])}) == 3


def test_wl_refines_degree_partition_and_is_stable(ray_session):
    rng = np.random.RandomState(13)
    n = 60
    mask = np.triu(rng.rand(n, n) < 0.1, 1)
    s, d = np.nonzero(mask)
    c1 = _run(ray_session, s, d, n, rounds=1)
    c4 = _run(ray_session, s, d, n, rounds=4)
    # Same round-4 colors ⇒ same round-1 colors (refinement only).
    for col in np.unique(c4):
        assert np.unique(c1[c4 == col]).size == 1
    # Layout independence.
    import ray.data

    from alp_ray.pipelines.wl import wl_refinement

    ss, dd = _sym(s, d)
    tbl = pa.table({"src": ss, "dst": dd})
    a = wl_refinement(
        ray.data.from_arrow(tbl).repartition(9), n=n, rounds=4
    )
    assert (a == c4).all()
