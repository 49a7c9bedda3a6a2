"""CG / kmeans / sparse-NN / cosine-similarity tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.pipelines.linalg import (
    conjugate_gradient,
    cosine_similarity_vectors,
    kmeans,
    sparse_nn_inference,
)
from alp_ray.state.engine import GraphEngine


def test_conjugate_gradient_solves_spd():
    # SPD matrix: A = L·Lᵀ + diag, represented as a dense edge list.
    rng = np.random.RandomState(31)
    n = 24
    M = rng.rand(n, n) * (rng.rand(n, n) < 0.3)
    A = M @ M.T + np.eye(n) * n
    src, dst = np.nonzero(A)
    w = A[src, dst]
    b = rng.rand(n)
    engine = GraphEngine.from_arrays(
        src.astype(np.int64), dst.astype(np.int64), w, n=n, P=3
    )
    x, iters, res = conjugate_gradient(engine, b, tol=1e-10, max_iters=200)
    engine.shutdown()
    np.testing.assert_allclose(A @ x, b, atol=1e-7)
    assert res <= 1e-10


def test_effective_resistance_vs_direct_solve():
    """CG on L + I reproduces the direct regularized-resistance solve,
    and the resistance is positive and symmetric in (s, t)."""
    rng = np.random.RandomState(7)
    n = 30
    mask = np.triu(rng.rand(n, n) < 0.25, 1)
    a, b_ = np.nonzero(mask)
    w = rng.randint(1, 10, a.size).astype(np.float64)
    s = np.concatenate([a, b_]).astype(np.int64)
    d = np.concatenate([b_, a]).astype(np.int64)
    ww = np.concatenate([w, w])
    L = np.eye(n)
    L[s, d] -= ww
    np.add.at(np.ravel(L), s * (n + 1), ww)
    rhs = np.zeros(n)
    rhs[0], rhs[5] = 1.0, -1.0
    # Engine holds the explicit matrix: off-diag −w plus diag 1 + Σw.
    ms = np.concatenate([s, np.arange(n)])
    md = np.concatenate([d, np.arange(n)])
    mw = np.concatenate([
        -ww, 1.0 + np.bincount(s, weights=ww, minlength=n)
    ])
    engine = GraphEngine.from_arrays(ms, md, mw, n=n, P=3)
    x, _, res = conjugate_gradient(engine, rhs, tol=1e-12, max_iters=200)
    engine.shutdown()
    x_ref = np.linalg.solve(L, rhs)
    np.testing.assert_allclose(x, x_ref, atol=1e-9)
    reff = x[0] - x[5]
    assert reff > 0
    # Symmetry: swapping s and t negates x, same resistance.
    engine = GraphEngine.from_arrays(ms, md, mw, n=n, P=3)
    x2, _, _ = conjugate_gradient(engine, -rhs, tol=1e-12, max_iters=200)
    engine.shutdown()
    np.testing.assert_allclose(x2[5] - x2[0], reff, atol=1e-9)


def test_kmeans_separable_clusters():
    rng = np.random.RandomState(32)
    c0 = rng.randn(40, 4) * 0.05 + np.array([0, 0, 0, 0])
    c1 = rng.randn(40, 4) * 0.05 + np.array([5, 5, 5, 5])
    X = np.vstack([c0, c1])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(80, dtype=np.int64),
                "embedding": pa.array(
                    X.tolist(), pa.list_(pa.float64(), 4)
                ),
            }
        )
    )
    C, assign = kmeans(ds, k=2, max_iters=20)
    df = assign.to_pandas().sort_values("vec_id")
    a = df["cluster"].to_numpy()
    # Perfect separation: first 40 share one cluster, last 40 the other.
    assert len(set(a[:40])) == 1 and len(set(a[40:])) == 1
    assert a[0] != a[79]


def test_sparse_nn_inference_vs_numpy():
    rng = np.random.RandomState(33)
    sizes = [10, 8, 6]
    layers, biases, mats = [], [], []
    for li in range(2):
        W = rng.randn(sizes[li], sizes[li + 1]) * (rng.rand(sizes[li], sizes[li + 1]) < 0.5)
        mats.append(W)
        s, d = np.nonzero(W)
        layers.append(
            ray.data.from_arrow(
                pa.table(
                    {
                        "src": s.astype(np.int64),
                        "dst": d.astype(np.int64),
                        "weight": W[s, d],
                    }
                )
            )
        )
        # Negative biases: dense-oracle zero and sparse-absent coincide
        # after ReLU (sparse vxm semantics apply bias only to present
        # entries — reference applies it via fold over the vxm output).
        biases.append(-0.05 - 0.02 * li)
    x0 = rng.rand(10)
    xv, xi = sparse_nn_inference(
        layers, biases, (x0, np.arange(10, dtype=np.int64)), threshold=2.0
    )
    # NumPy oracle.
    h = x0
    for W, b in zip(mats, biases):
        h = np.minimum(np.maximum(W.T @ h + b, 0.0), 2.0)
        # zero entries drop: emulate sparse (only nonzero propagate)
    want_ids = np.flatnonzero(h > 0)
    got = np.zeros(sizes[-1])
    got[xi] = xv
    np.testing.assert_allclose(got, np.where(h > 0, h, 0.0), atol=1e-9)


def test_cosine_similarity_vectors():
    x = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [1.0, 2.0, 3.0]})
    )
    y = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [3.0, 2.0, 1.0]})
    )
    got = cosine_similarity_vectors(x, y)
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([3.0, 2.0, 1.0])
    assert got == pytest.approx(a @ b / np.linalg.norm(a) / np.linalg.norm(b))


def test_bicgstab_nonsymmetric():
    from alp_ray.pipelines.linalg import bicgstab

    rng = np.random.RandomState(34)
    n = 24
    A = rng.rand(n, n) * (rng.rand(n, n) < 0.4)
    A = A + np.eye(n) * n  # diagonally dominant, NOT symmetric
    src, dst = np.nonzero(A)
    w = A[src, dst]
    b = rng.rand(n)
    engine = GraphEngine.for_linear_system(
        src.astype(np.int64), dst.astype(np.int64), w, n=n, P=3
    )
    x, iters, res = bicgstab(engine, b, tol=1e-10, max_iters=400)
    engine.shutdown()
    # for_linear_system orients entries col->row, so the superstep
    # applies A itself: bicgstab solves A x = b for nonsymmetric A.
    np.testing.assert_allclose(A @ x, b, atol=1e-7)
    np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-7)
    assert res <= 1e-10


def test_pca_matches_numpy_oracle():
    import ray.data

    from alp_ray.pipelines.linalg import pca

    rng = np.random.RandomState(0)
    n, d = 300, 8
    # Anisotropic cloud: a dominant direction + noise.
    base = rng.randn(n, 1) @ rng.randn(1, d) * 3 + rng.randn(n, d)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(base.astype(np.float64))),
    })
    out, ratio = pca(
        ray.data.from_arrow(tbl).repartition(5), k=2
    )
    got = out.to_pandas().sort_values("vec_id").reset_index(drop=True)

    X = base - base.mean(axis=0)
    cov = X.T @ X / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    W = evecs[:, order]
    for j in range(2):
        i = np.argmax(np.abs(W[:, j]))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    want = X @ W
    np.testing.assert_allclose(
        got[["pc1", "pc2"]].to_numpy(), np.round(want, 6), atol=2e-6
    )
    assert ratio[0] > 0.5  # the planted direction dominates
    assert abs(ratio.sum()) <= 1.0 + 1e-9


def test_conjugate_gradient_complex_embedding():
    """Complex HPD CG via the symmetric 2n real embedding must equal a
    genuine complex128 CG recurrence iterate-for-iterate (α/β are real
    for HPD systems, so the planes decouple exactly)."""
    rng = np.random.RandomState(7)
    n = 18
    re = rng.rand(n, n) * (rng.rand(n, n) < 0.4)
    im = rng.rand(n, n) * (rng.rand(n, n) < 0.4)
    H = (re + re.T) + 1j * (im - im.T)
    np.fill_diagonal(H, np.abs(H).sum(axis=1).real + 1.0)
    b = rng.rand(n) + 1j * rng.rand(n)
    K = 9

    # Oracle: textbook complex CG, fixed K steps (tol=0 semantics).
    x = np.zeros(n, complex)
    r = b.copy()
    p = r.copy()
    rr = float(np.vdot(r, r).real)
    for _ in range(K):
        Ap = H @ p
        alpha = rr / float(np.vdot(p, Ap).real)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = float(np.vdot(r, r).real)
        p = r + (rr_new / rr) * p
        rr = rr_new

    # Engine: real CG on M = [[Ar, -Ai], [Ai, Ar]], x2 = (Re; Im).
    M = np.block([[H.real, -H.imag], [H.imag, H.real]])
    src, dst = np.nonzero(M)
    engine = GraphEngine.from_arrays(
        src.astype(np.int64), dst.astype(np.int64), M[src, dst],
        n=2 * n, P=3,
    )
    b2 = np.concatenate([b.real, b.imag])
    x2, iters, _ = conjugate_gradient(engine, b2, tol=0.0, max_iters=K)
    engine.shutdown()
    assert iters == K
    np.testing.assert_allclose(x2[:n] + 1j * x2[n:], x, rtol=1e-10)


def test_bicgstab_complex_matches_complex128_oracle():
    """Engine bicgstab_complex (2n real embedding + complex scalar
    collectives) must track a genuine complex128 BiCGstab with the
    same conjugate-left dot convention, iterate for iterate."""
    from alp_ray.pipelines.linalg import bicgstab_complex

    rng = np.random.RandomState(11)
    n = 18  # P=3 divides n (plane co-sharding requirement)
    Cr = rng.rand(n, n) * (rng.rand(n, n) < 0.35)
    Ci = rng.rand(n, n) * (rng.rand(n, n) < 0.35)
    C = Cr + 1j * Ci
    np.fill_diagonal(
        C, (np.abs(C.real) + np.abs(C.imag)).sum(axis=1) + 1.0
    )
    b = rng.rand(n) + 1j * rng.rand(n)
    K = 7

    # Oracle: textbook complex BiCGstab, fixed K steps (tol=0).
    x = np.zeros(n, complex)
    r = b.copy()
    rhat = r.copy()
    p = np.zeros(n, complex)
    v = np.zeros(n, complex)
    rho = alpha = omega = 1.0 + 0.0j
    rho_next = np.vdot(rhat, r)
    for _ in range(K):
        rho_new = rho_next
        beta = (rho_new / rho) * (alpha / omega)
        rho = rho_new
        p = r + beta * (p - omega * v)
        v = C @ p
        alpha = rho / np.vdot(rhat, v)
        s = r - alpha * v
        t = C @ s
        omega = np.vdot(t, s) / np.vdot(t, t)
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho_next = np.vdot(rhat, r)

    M = np.block([[C.real, -C.imag], [C.imag, C.real]])
    rows, cols = np.nonzero(M)
    engine = GraphEngine.for_linear_system(
        rows.astype(np.int64), cols.astype(np.int64), M[rows, cols],
        n=2 * n, P=3,
    )
    xr, xi, iters, res = bicgstab_complex(
        engine, b.real, b.imag, tol=0.0, max_iters=K
    )
    engine.shutdown()
    assert iters == K
    np.testing.assert_allclose(xr + 1j * xi, x, rtol=1e-9)


def test_bicgstab_complex_requires_plane_cosharding():
    from alp_ray.pipelines.linalg import bicgstab_complex

    engine = GraphEngine.from_arrays(
        np.array([0, 1]), np.array([1, 0]), np.array([1.0, 1.0]),
        n=10, P=4,
    )
    with pytest.raises(AssertionError, match="plane co-sharding"):
        bicgstab_complex(
            engine, np.ones(5), np.zeros(5), max_iters=1
        )
    engine.shutdown()
