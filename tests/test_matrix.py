"""BLAS3 ops (spgemm / matrix_ewise / outer) vs dense NumPy."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.functions.semiring import MIN_PLUS, PLUS_TIMES
from alp_ray.pipelines.matrix import matrix_ewise, outer, spgemm


def _ds(A):
    src, dst = np.nonzero(A)
    return ray.data.from_arrow(
        pa.table(
            {"src": src.astype(np.int64), "dst": dst.astype(np.int64),
             "weight": A[src, dst]}
        )
    )


def _dense(ds, n):
    df = ds.to_pandas()
    M = np.zeros((n, n))
    M[df["src"], df["dst"]] = df["weight"]
    return M


def test_spgemm_plus_times_vs_matmul():
    rng = np.random.RandomState(50)
    n = 30
    A = rng.rand(n, n) * (rng.rand(n, n) < 0.2)
    B = rng.rand(n, n) * (rng.rand(n, n) < 0.2)
    C = spgemm(_ds(A), _ds(B), PLUS_TIMES)
    np.testing.assert_allclose(_dense(C, n), A @ B, atol=1e-12)


def test_spgemm_min_plus_shortest_two_hop():
    rng = np.random.RandomState(51)
    n = 20
    mask = rng.rand(n, n) < 0.3
    W = np.where(mask, rng.rand(n, n) + 0.1, np.inf)
    C = spgemm(_ds(np.where(mask, W, 0)), _ds(np.where(mask, W, 0)),
               MIN_PLUS)
    # dense min-plus product over existing edges only
    D = np.full((n, n), np.inf)
    for i in range(n):
        for k in range(n):
            if mask[i, k]:
                for j in range(n):
                    if mask[k, j]:
                        D[i, j] = min(D[i, j], W[i, k] + W[k, j])
    got = _dense(C, n)
    got[got == 0] = np.inf  # absent = no 2-path
    present = np.isfinite(D)
    np.testing.assert_allclose(got[present], D[present], atol=1e-12)


def test_matrix_ewise_union_and_intersection():
    A = np.array([[1.0, 2.0], [0.0, 3.0]])
    B = np.array([[5.0, 0.0], [0.0, 7.0]])
    n = 2
    u = _dense(matrix_ewise(_ds(A), _ds(B), "sum"), n)
    np.testing.assert_allclose(u, A + B)
    i = matrix_ewise(_ds(A), _ds(B), "sum", intersect=True).to_pandas()
    got = {(r["src"], r["dst"]): r["weight"] for _, r in i.iterrows()}
    assert got == {(0, 0): 6.0, (1, 1): 10.0}


def test_outer_product():
    u = (np.array([2.0, 3.0]), np.array([0, 2], np.int64))
    v = (np.array([5.0, 7.0]), np.array([1, 3], np.int64))
    M = _dense(outer(u, v), 4)
    want = np.zeros((4, 4))
    want[0, 1], want[0, 3] = 10.0, 14.0
    want[2, 1], want[2, 3] = 15.0, 21.0
    np.testing.assert_allclose(M, want)
