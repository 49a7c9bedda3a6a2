"""HPCG V-cycle + preconditioned CG vs a dense NumPy mirror of the
reference semantics (multigrid_v_cycle.hpp / red_black_gauss_seidel.hpp
/ hpcg.hpp)."""

import numpy as np
import pytest

from alp_ray.pipelines.hpcg import (
    DIAG,
    HpcgLevel,
    build_hpcg_levels,
    grid_matrix_3d,
    hpcg,
    inject_cols,
    run_smoother,
    shutdown,
    v_cycle,
)


def _dense(sizes):
    rows, cols, vals = grid_matrix_3d(sizes)
    n = int(np.prod(sizes))
    A = np.zeros((n, n))
    A[rows, cols] = vals
    return A


def _np_smoother(A, r, z, steps):
    n = A.shape[0]
    ids = np.arange(n)
    for _ in range(steps):
        for c in (0, 1, 1, 0):  # forward then backward
            y = A @ z
            m = (ids % 2) == c
            z[m] = (r[m] - y[m] + z[m] * DIAG) / DIAG
    return z


def _np_vcycle(As, injs, r, pre=1, post=1, li=0):
    A = As[li]
    z = np.zeros(A.shape[0])
    if li == len(As) - 1:
        return _np_smoother(A, r, z, 1)
    z = _np_smoother(A, r, z, pre)
    rc = (r - A @ z)[injs[li]]
    zc = _np_vcycle(As, injs, rc, pre, post, li + 1)
    z[injs[li]] += zc
    return _np_smoother(A, r, z, post)


def _np_hpcg(As, injs, b, max_iters, tol=0.0, precond=True):
    n = As[0].shape[0]
    x = np.zeros(n)
    r = b.copy()
    norm0 = np.sqrt(r @ r)
    norm = norm0
    r_dot_z = 0.0
    it = 0
    while it < max_iters and norm / norm0 > tol:
        z = _np_vcycle(As, injs, r) if precond else r.copy()
        rz = r @ z
        p = z.copy() if it == 0 else rz / r_dot_z * p + z
        r_dot_z = rz
        Ap = As[0] @ p
        alpha = r_dot_z / (p @ Ap)
        x = x + alpha * p
        r = r + (-alpha) * Ap
        norm = np.sqrt(r @ r)
        it += 1
    return x, it, norm / norm0


SIZES = (8, 8, 8)


@pytest.fixture(scope="module")
def dense_system():
    A0 = _dense(SIZES)
    A1 = _dense((4, 4, 4))
    inj = inject_cols((4, 4, 4), SIZES)
    return [A0, A1], [inj]


def test_grid_matrix_shape():
    rows, cols, vals = grid_matrix_3d((4, 4, 4))
    # interior points have 27 entries; total for 4^3 = (interior 2^3)*27
    # + boundary — just check symmetry + diagonal count.
    n = 64
    A = np.zeros((n, n))
    A[rows, cols] = vals
    assert (A == A.T).all()
    assert (np.diag(A) == DIAG).all()
    # row sums: interior rows 26 - 26 = 0, boundary rows positive (SPD-ish)
    assert A.shape == (n, n)


def test_vcycle_matches_dense_oracle(dense_system):
    As, injs = dense_system
    levels = build_hpcg_levels(SIZES, levels=2, P=4)
    n = levels[0].n
    r = ((np.arange(n) % 9) + 1) / 10.0
    levels[0].engine.set_state_by_vertex("r", r)
    v_cycle(levels, 0, 1, 1)
    z = levels[0].engine.get_state_by_vertex("z")
    want = _np_vcycle(As, injs, r)
    shutdown(levels)
    np.testing.assert_allclose(z, want, rtol=1e-12, atol=1e-14)


def test_smoother_reduces_residual(dense_system):
    As, _ = dense_system
    A = As[0]
    n = A.shape[0]
    r = ((np.arange(n) % 9) + 1) / 10.0
    z = np.zeros(n)
    before = np.linalg.norm(r - A @ z)
    z = _np_smoother(A, r, z.copy(), 2)
    after = np.linalg.norm(r - A @ z)
    assert after < 0.5 * before


def test_hpcg_pcg_matches_dense_and_converges(dense_system):
    As, injs = dense_system
    levels = build_hpcg_levels(SIZES, levels=2, P=4)
    n = levels[0].n
    b = ((np.arange(n) % 7) + 1) / 10.0
    x, iters, rel = hpcg(levels, b, max_iters=8, tol=0.0)
    shutdown(levels)
    want_x, want_iters, want_rel = _np_hpcg(As, injs, b, 8)
    assert iters == want_iters
    np.testing.assert_allclose(x, want_x, rtol=1e-10, atol=1e-12)
    # The V-cycle is a real preconditioner: 8 iterations crush the
    # relative residual on this well-conditioned system.
    assert rel < 1e-8
    # And solves the system: ||Ax - b|| small.
    assert np.linalg.norm(As[0] @ x - b) < 1e-6 * np.linalg.norm(b)


def test_hpcg_precond_beats_plain_cg(dense_system):
    As, injs = dense_system
    n = As[0].shape[0]
    b = ((np.arange(n) % 7) + 1) / 10.0
    _, _, rel_pc = _np_hpcg(As, injs, b, 5, precond=True)
    _, _, rel_nopc = _np_hpcg(As, injs, b, 5, precond=False)
    assert rel_pc < rel_nopc
