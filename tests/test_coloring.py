"""Jones-Plassmann coloring: validity, determinism, numpy-oracle parity."""

import numpy as np

from alp_ray.pipelines.coloring import _priority_key, coloring
from alp_ray.state.engine import GraphEngine


def _sym_graph(n=120, m=500, seed=9):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    key = s2 * n + d2
    _, idx = np.unique(key, return_index=True)
    return s2[idx].astype(np.int64), d2[idx].astype(np.int64)


def _jp_oracle(src, dst, n):
    key = _priority_key(np.arange(n, dtype=np.int64))
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[int(d)].append(int(s))  # in-neighbours (== out, symmetric)
    color = np.full(n, -1, np.int64)
    uncolored = np.ones(n, bool)
    while uncolored.any():
        sel = []
        for v in np.flatnonzero(uncolored):
            mx = max(
                (key[u] for u in adj[v] if uncolored[u]), default=-1
            )
            if key[v] > mx:
                sel.append(v)
        for v in sel:
            used = {int(color[u]) for u in adj[v] if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        uncolored[sel] = False
    return color


def test_coloring_valid_deterministic_and_oracle():
    n = 120
    src, dst = _sym_graph(n=n)
    engine = GraphEngine.from_arrays(src, dst, n=n, P=4)
    colors = coloring(engine)
    engine.shutdown()
    assert (colors >= 0).all()
    # Proper coloring: no edge with equal endpoint colors.
    assert (colors[src] != colors[dst]).all()
    # Deterministic: second run identical.
    engine = GraphEngine.from_arrays(src, dst, n=n, P=3)
    colors2 = coloring(engine)
    engine.shutdown()
    np.testing.assert_array_equal(colors, colors2)
    # Exact parity with the sequential JP oracle (same priorities).
    np.testing.assert_array_equal(colors, _jp_oracle(src, dst, n))
    # Sane color count (≤ max degree + 1).
    deg = np.bincount(src, minlength=n)
    assert colors.max() <= deg.max()
