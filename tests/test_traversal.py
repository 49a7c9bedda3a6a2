"""k-hop / SSSP / k-core / Pregel-layer tests vs pure-Python oracles."""

import numpy as np

from alp_ray.pipelines.pregel import pregel
from alp_ray.pipelines.traversal import khop, kcore_decomposition, sssp
from alp_ray.state.engine import GraphEngine

from . import oracle


def _rand_graph(seed, n, m, weighted=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    w = rng.rand(src.size) + 0.1 if weighted else None
    return src, dst, w


def test_khop_vs_bfs():
    n = 100
    src, dst, _ = _rand_graph(21, n, 300)
    engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
    for k in (1, 2, 4):
        got_mask, got_size = khop(engine, source=0, k=k)
        # BFS oracle.
        adj = {}
        for s, d in zip(src, dst):
            adj.setdefault(int(s), []).append(int(d))
        seen = {0}
        frontier = {0}
        for _ in range(k):
            nxt = set()
            for v in frontier:
                for u in adj.get(v, []):
                    if u not in seen:
                        seen.add(u)
                        nxt.add(u)
            frontier = nxt
        assert got_size == len(seen)
        np.testing.assert_array_equal(
            np.flatnonzero(got_mask), np.array(sorted(seen))
        )
    engine.shutdown()


def test_sssp_vs_bellman_ford():
    n = 80
    src, dst, w = _rand_graph(22, n, 400, weighted=True)
    engine = GraphEngine.from_arrays(src, dst, w, n=n, P=3)
    got = sssp(engine, source=3)
    engine.shutdown()
    dist = np.full(n, np.inf)
    dist[3] = 0.0
    for _ in range(n):
        for s, d, wt in zip(src, dst, w):
            if dist[s] + wt < dist[d]:
                dist[d] = dist[s] + wt
    np.testing.assert_allclose(got, dist)


def _kcore_oracle(src, dst, n):
    """Sequential peeling oracle (undirected simple graph given as
    symmetric edge list)."""
    deg = np.bincount(src, minlength=n)
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    alive = np.ones(n, bool)
    core = np.zeros(n, np.int64)
    k = 1
    while alive.any():
        while True:
            peel = np.flatnonzero(alive & (deg < k))
            if peel.size == 0:
                break
            for v in peel:
                alive[v] = False
                core[v] = k - 1
                for u in adj.get(int(v), []):
                    if alive[u]:
                        deg[u] -= 1
        k += 1
    return core


def test_kcore_vs_oracle():
    n = 60
    rng = np.random.RandomState(23)
    mask = np.triu(rng.rand(n, n) < 0.12, 1)
    a, b = np.nonzero(mask)
    s = np.concatenate([a, b]).astype(np.int64)
    d = np.concatenate([b, a]).astype(np.int64)
    engine = GraphEngine.from_arrays(s, d, n=n, P=3)
    got = kcore_decomposition(engine)
    engine.shutdown()
    np.testing.assert_array_equal(got, _kcore_oracle(s, d, n))


def test_onion_refines_kcore():
    """Onion peel-threshold coreness must equal the standard peel
    coreness, and layers must be monotone within cores (later layer ⇒
    core ≥)."""
    from alp_ray.pipelines.traversal import onion_layers

    n = 60
    rng = np.random.RandomState(31)
    mask = np.triu(rng.rand(n, n) < 0.15, 1)
    a, b = np.nonzero(mask)
    s = np.concatenate([a, b]).astype(np.int64)
    d = np.concatenate([b, a]).astype(np.int64)
    engine = GraphEngine.from_arrays(s, d, n=n, P=3)
    core_ref = kcore_decomposition(engine)
    engine.shutdown()
    engine = GraphEngine.from_arrays(s, d, n=n, P=3)
    layer, core, waves = onion_layers(engine)
    engine.shutdown()
    present = np.bincount(s, minlength=n) > 0
    np.testing.assert_array_equal(core[present], core_ref[present])
    assert (layer[present] >= 1).all() and (~present | (layer <= waves)).all()
    # Layers refine cores: a vertex's core never drops as layers grow.
    order = np.argsort(layer[present], kind="stable")
    cc = core[present][order]
    assert (np.diff(cc) >= 0).all()


def test_pregel_connected_components_parity():
    """CC written as a user Pregel program reproduces the dedicated
    pipeline's result (≙ pregel_connected_components.hpp:81-103)."""
    n = 120
    src, dst, _ = _rand_graph(24, n, 200)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    key = s * n + d
    _, idx = np.unique(key, return_index=True)
    s, d = s[idx], d[idx]

    def program(state, msgs, ctx):
        if ctx["round"] == 0:
            # Broadcast own id; everyone active.
            out = state["gid"]
            active = np.ones(out.shape, bool)
        else:
            better = msgs > state["gid"]
            state["gid"] = np.maximum(state["gid"], msgs)
            out = state["gid"]
            active = better
        return out, active, None

    engine = GraphEngine.from_arrays(s, d, n=n, P=4)
    res = pregel(
        engine, program, combiner="max", init_use_index=("gid",)
    )
    labels = engine.get_state_by_vertex("gid").astype(np.int64)
    engine.shutdown()
    assert res.converged
    np.testing.assert_array_equal(
        labels, oracle.connected_components_maxlabel(s, d, n)
    )
