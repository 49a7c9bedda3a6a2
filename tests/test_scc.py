"""SCC (FW-BW coloring on the shard engine) vs a sequential Tarjan
oracle, across shard counts and adversarial shapes (cycles, chains,
self-contained cliques, isolated vertices)."""

import numpy as np
import pytest

from alp_ray.pipelines.scc import strongly_connected_components
from alp_ray.state.engine import GraphEngine


def tarjan_scc_min_label(src, dst, n):
    """Iterative Tarjan; label = min member id per SCC."""
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[s].append(d)
    index = [-1] * n
    low = [0] * n
    on = [False] * n
    stack = []
    label = np.full(n, -1, np.int64)
    counter = [0]
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on[v] = True
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return label


def _run(src, dst, n, P):
    eng = GraphEngine.from_arrays(
        np.asarray(src, np.int64), np.asarray(dst, np.int64), n=n, P=P
    )
    try:
        res = strongly_connected_components(eng)
        got = eng.get_state_by_vertex("scc").astype(np.int64)
    finally:
        eng.shutdown()
    return got, res


@pytest.mark.parametrize("P", [1, 3])
def test_scc_two_cycles_and_bridge(P):
    # 0→1→2→0 (SCC {0,1,2}), 3→4→3 (SCC {3,4}), bridge 2→3, tail 4→5.
    src = [0, 1, 2, 3, 4, 2, 4]
    dst = [1, 2, 0, 4, 3, 3, 5]
    got, _ = _run(src, dst, 6, P)
    want = tarjan_scc_min_label(src, dst, 6)
    np.testing.assert_array_equal(got, want)


def test_scc_chain_is_all_singletons():
    src = list(range(9))
    dst = list(range(1, 10))
    got, res = _run(src, dst, 10, 2)
    np.testing.assert_array_equal(got, np.arange(10))
    # A chain peels exactly one root SCC per round — the FW-BW
    # coloring worst case (each round's single root is the chain head).
    assert res.rounds == 10


def test_scc_random_vs_tarjan():
    rng = np.random.RandomState(7)
    n, m = 60, 240
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # Dedup (no_duplicates ingestion contract).
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    src, dst = src[idx], dst[idx]
    got, res = _run(src, dst, n, 4)
    want = tarjan_scc_min_label(src, dst, n)
    np.testing.assert_array_equal(got, want)
    assert res.n == n


def test_scc_isolated_vertices():
    got, _ = _run([2], [3], 6, 2)
    np.testing.assert_array_equal(got, np.arange(6))
