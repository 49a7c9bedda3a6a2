"""Numeric-algebra algorithms from the reference's shipped set.

- ``conjugate_gradient`` ≙ algorithms/conjugate_gradient.hpp:159 — CG on a
  symmetric positive-definite weighted graph/matrix held in the shard
  engine; per iteration one spmv superstep + local axpy/dot partials
  (the dots are shard-local folds reduced driver-side ≙ allreduce).
- ``kmeans`` ≙ algorithms/kmeans.hpp (k-means++ init :60, Lloyd :224 with
  argmin monoid) — over an embedding Dataset: assignment is a broadcast
  argmin map_batches; the update is a groupby-mean (pre-aggregated per
  block: sum+count combiner).
- ``sparse_nn_inference`` ≙ algorithms/sparse_nn_single_inference.hpp:52
  (GraphChallenge): per layer vxm + bias fold + ReLU ± threshold.
- ``cosine_similarity`` ≙ algorithms/cosine_similarity.hpp:116.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.functions.semiring import PLUS_TIMES
from alp_ray.util import join_partitions
from alp_ray.pipelines.ann import _as_matrix
from alp_ray.stages.graph import spmv
from alp_ray.state.engine import GraphEngine


# ------------------------------------------------------------------- CG --


def conjugate_gradient(
    engine: GraphEngine,
    b: np.ndarray,
    tol: float = 1e-8,
    max_iters: int = 200,
) -> tuple[np.ndarray, int, float]:
    """Solve A x = b (A = the engine's weighted adjacency, must be SPD).
    Returns (x, iterations, final_residual_norm)."""
    engine.set_state_by_vertex("b", b.astype(np.float64))
    engine.set_state("x", 0.0)

    # r = b - A·0 = b ; p materializes in the first superstep's pre as
    # r + 0·p (bitwise the classic p₀ = r₀ — ±0 sign aside, which no
    # later op can observe in magnitude).
    def init_fn(state, ctx):
        state["r"] = state["b"].copy()
        state["p"] = np.zeros_like(state["r"])
        return {"rr": float(state["r"] @ state["r"])}

    rr = sum(d["rr"] for d in engine.map_local(init_fn))

    # Collectives fused into the superstep (one spmv round-trip + one
    # axpy round-trip per iteration, was 2 + 2): the p-update rides the
    # scatter's pre hook, pAp rides the gather's scalar partials — the
    # engine reduces them in shard order exactly as the standalone
    # map_local rounds did, so every iterate is bitwise unchanged.
    def post(state, y, ctx):
        state["Ap"] = y
        return {"pAp": float(state["p"] @ y)}

    it = 0
    beta = 0.0
    while it < max_iters and np.sqrt(rr) > tol:

        def pre(state, ctx, beta=beta):
            state["p"] = state["r"] + beta * state["p"]
            return state["p"]

        pAp = engine.superstep(pre, "plus_times", post)["pAp"]
        alpha = rr / pAp

        def axpy(state, ctx, alpha=alpha):
            state["x"] = state["x"] + alpha * state["p"]
            state["r"] = state["r"] - alpha * state["Ap"]
            return {"rr_new": float(state["r"] @ state["r"])}

        rr_new = sum(d["rr_new"] for d in engine.map_local(axpy))
        beta = rr_new / rr
        rr = rr_new
        it += 1
    return engine.get_state_by_vertex("x"), it, float(np.sqrt(rr))


def bicgstab(
    engine: GraphEngine,
    b: np.ndarray,
    tol: float = 1e-8,
    max_iters: int = 200,
) -> tuple[np.ndarray, int, float]:
    """BiCGstab for general (nonsymmetric) A — ≙ algorithms/bicgstab.hpp
    (x, A, b, max_iterations, tol; workspace r, rhat, p, v, s, t; residual
    measured as the 2-norm of r = b − Ax). Same engine layout as CG: one
    spmv superstep per matrix product, shard-local axpy/dot partials
    reduced driver-side (the collectives).

    ``engine`` must apply A (not Aᵀ) in its superstep — build it with
    ``GraphEngine.for_linear_system(rows, cols, vals)``, which stores
    entries col→row so the native y[dst] = Σ x[src]·w product IS A·x.
    (An engine built from raw (src=row, dst=col) edges would silently
    solve Aᵀx = b for nonsymmetric A.)"""
    engine.set_state_by_vertex("b", b.astype(np.float64))
    engine.set_state("x", 0.0)

    # Collectives fused into the two spmv supersteps (2 supersteps + 1
    # axpy round per iteration, was 2 + 6): ρ rides the previous
    # iteration's x/r update (ρ_{k+1} = r̂·r_k over the same freshly
    # updated r), the p-update and rhat·v ride superstep 1's pre/post
    # hooks, the s-update (with its ‖s‖² pre-scalar) and the t·s / t·t
    # dots ride superstep 2. Every dot is the same shard-partial sum in
    # shard order as the standalone map_local rounds — iterates are
    # bitwise unchanged.
    def init_fn(state, ctx):
        state["r"] = state["b"].copy()
        state["rhat"] = state["r"].copy()
        state["p"] = np.zeros_like(state["r"])
        state["v"] = np.zeros_like(state["r"])
        return {
            "rr": float(state["r"] @ state["r"]),
            "rho": float(state["rhat"] @ state["r"]),
        }

    parts = engine.map_local(init_fn)
    rr = sum(d["rr"] for d in parts)
    rho_next = sum(d["rho"] for d in parts)
    rho = alpha = omega = 1.0

    def post1(state, y, ctx):
        state["v"] = y
        return {"rhat_v": float(state["rhat"] @ y)}

    def post2(state, y, ctx):
        state["t"] = y
        return {
            "ts": float(y @ state["s"]),
            "tt": float(y @ y),
        }

    it = 0
    while it < max_iters and np.sqrt(rr) > tol:
        rho_new = rho_next
        beta = (rho_new / rho) * (alpha / omega) if rho != 0 else 0.0
        rho = rho_new

        def pre1(state, ctx, beta=beta, omega=omega):
            state["p"] = state["r"] + beta * (
                state["p"] - omega * state["v"]
            )
            return state["p"]

        rhat_v = engine.superstep(pre1, "plus_times", post1)["rhat_v"]
        alpha = rho / rhat_v if rhat_v != 0 else 0.0

        def pre2(state, ctx, alpha=alpha):
            state["s"] = state["r"] - alpha * state["v"]
            return (
                state["s"],
                None,
                {"ss": float(state["s"] @ state["s"])},
            )

        sc = engine.superstep(pre2, "plus_times", post2)
        if np.sqrt(sc["ss"]) <= tol:
            # Early half-step exit (bicgstab.hpp's s-norm check); the
            # fused t spmv was speculative and is simply unused.
            engine.map_local(
                lambda st, c, alpha=alpha: (
                    st.__setitem__("x", st["x"] + alpha * st["p"])
                )
            )
            rr = sc["ss"]
            it += 1
            break
        omega = sc["ts"] / sc["tt"] if sc["tt"] != 0 else 0.0

        def upd_xr(state, ctx, alpha=alpha, omega=omega):
            state["x"] = (
                state["x"] + alpha * state["p"] + omega * state["s"]
            )
            state["r"] = state["s"] - omega * state["t"]
            return {
                "rr": float(state["r"] @ state["r"]),
                "rho": float(state["rhat"] @ state["r"]),
            }

        parts = engine.map_local(upd_xr)
        rr = sum(d["rr"] for d in parts)
        rho_next = sum(d["rho"] for d in parts)
        it += 1
    return engine.get_state_by_vertex("x"), it, float(np.sqrt(rr))


def _cmul(ar, ai, br, bi):
    """(ar+i·ai)(br+i·bi) with the naive textbook formula — mirrored
    term-for-term in the SQL twin (CLAUDE.md: mirror the EXPRESSION,
    never a simplification; Python's builtin complex uses Smith's
    scaled division, which differs at the ulp)."""
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    if d == 0.0:
        return 0.0, 0.0
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def bicgstab_complex(
    engine: GraphEngine,
    b_re: np.ndarray,
    b_im: np.ndarray,
    tol: float = 1e-8,
    max_iters: int = 200,
) -> tuple[np.ndarray, np.ndarray, int, float]:
    """BiCGstab over a general COMPLEX matrix C — ≙ algorithms/
    bicgstab.hpp templated over any field incl. ``std::complex``
    (smoke `bicgstab_complex`, tests/smoke/smoketests.sh). Unlike the
    HPD-CG case, the scalar collectives (ρ, β, α, ω) are genuinely
    COMPLEX ratios, so the real-embedding trick alone is not enough:
    the shard partials must compute complex conjugated dots.

    Physical form: the engine holds the 2n×2n real embedding
    M = [[Cr, −Ci], [Ci, Cr]] in ``for_linear_system`` orientation, so
    one real superstep IS one complex matrix apply on the stacked
    (Re; Im) state. Complex dots decompose into plane dots —
    ⟨u,v⟩ = (uᵣ·vᵣ + uᵢ·vᵢ) + i(uᵣ·vᵢ − uᵢ·vᵣ) — which are
    shard-local iff each shard holds ALIGNED plane halves: REQUIRES
    P | n (vertex j and j+n then share shard j%P at local offsets
    (j//P, j//P + n/P)). Asserted. Scalars ride the existing float
    collectives as (re, im) pairs; all complex scalar arithmetic uses
    the explicit naive formulas (`_cmul`/`_cdiv`) so an unrolled SQL
    twin can mirror every expression.

    Dot convention (matches grb::dot's conjugate-left for complex):
    ρ = r̂ᴴr, α = ρ / r̂ᴴv, ω = tᴴs / tᴴt.

    Returns (x_re, x_im, iterations, final_residual_norm)."""
    n2 = engine.n
    assert n2 % 2 == 0, "embedding engine must have 2n vertices"
    n = n2 // 2
    assert n % engine.P == 0, (
        f"bicgstab_complex needs P | n for plane co-sharding "
        f"(n={n}, P={engine.P}); pad the system to a multiple of P"
    )
    b2 = np.concatenate(
        [np.asarray(b_re, np.float64), np.asarray(b_im, np.float64)]
    )
    engine.set_state_by_vertex("b", b2)
    engine.set_state("x", 0.0)

    def _planes(a: np.ndarray):
        h = a.size // 2
        return a[:h], a[h:]

    def _cdot(u: np.ndarray, v: np.ndarray):
        """Shard-local partial of ⟨u, v⟩ = Σ conj(u)·v."""
        ur, ui = _planes(u)
        vr, vi = _planes(v)
        return (
            float(ur @ vr) + float(ui @ vi),
            float(ur @ vi) - float(ui @ vr),
        )

    def _caxpy(x: np.ndarray, ar: float, ai: float, y: np.ndarray):
        """x + (ar+i·ai)·y on stacked planes (new array)."""
        xr, xi = _planes(x)
        yr, yi = _planes(y)
        return np.concatenate(
            [xr + (ar * yr - ai * yi), xi + (ar * yi + ai * yr)]
        )

    def init_fn(state, ctx):
        state["r"] = state["b"].copy()
        state["rhat"] = state["r"].copy()
        state["p"] = np.zeros_like(state["r"])
        state["v"] = np.zeros_like(state["r"])
        rho_re, rho_im = _cdot(state["rhat"], state["r"])
        return {
            "rr": float(state["r"] @ state["r"]),
            "rho_re": rho_re,
            "rho_im": rho_im,
        }

    parts = engine.map_local(init_fn)
    rr = sum(d["rr"] for d in parts)
    rho_next = (
        sum(d["rho_re"] for d in parts),
        sum(d["rho_im"] for d in parts),
    )
    rho = (1.0, 0.0)
    alpha = (1.0, 0.0)
    omega = (1.0, 0.0)

    def post1(state, y, ctx):
        state["v"] = y
        re, im = _cdot(state["rhat"], y)
        return {"rhat_v_re": re, "rhat_v_im": im}

    def post2(state, y, ctx):
        state["t"] = y
        ts_re, ts_im = _cdot(y, state["s"])
        return {
            "ts_re": ts_re,
            "ts_im": ts_im,
            "tt": float(y @ y),  # tᴴt = Σ|tᵢ|² (real)
        }

    it = 0
    while it < max_iters and np.sqrt(rr) > tol:
        rho_new = rho_next
        if rho == (0.0, 0.0):
            beta = (0.0, 0.0)
        else:
            q = _cdiv(rho_new[0], rho_new[1], rho[0], rho[1])
            a_w = _cdiv(alpha[0], alpha[1], omega[0], omega[1])
            beta = _cmul(q[0], q[1], a_w[0], a_w[1])
        rho = rho_new

        def pre1(state, ctx, beta=beta, omega=omega):
            # p = r + beta·(p − omega·v)
            t = _caxpy(state["p"], -omega[0], -omega[1], state["v"])
            state["p"] = _caxpy(state["r"], beta[0], beta[1], t)
            return state["p"]

        sc1 = engine.superstep(pre1, "plus_times", post1)
        rhat_v = (sc1["rhat_v_re"], sc1["rhat_v_im"])
        alpha = _cdiv(rho[0], rho[1], rhat_v[0], rhat_v[1])

        def pre2(state, ctx, alpha=alpha):
            state["s"] = _caxpy(
                state["r"], -alpha[0], -alpha[1], state["v"]
            )
            return (
                state["s"],
                None,
                {"ss": float(state["s"] @ state["s"])},
            )

        sc = engine.superstep(pre2, "plus_times", post2)
        if np.sqrt(sc["ss"]) <= tol:
            engine.map_local(
                lambda st, c, alpha=alpha: st.__setitem__(
                    "x", _caxpy(st["x"], alpha[0], alpha[1], st["p"])
                )
            )
            rr = sc["ss"]
            it += 1
            break
        omega = _cdiv(sc["ts_re"], sc["ts_im"], sc["tt"], 0.0)

        def upd_xr(state, ctx, alpha=alpha, omega=omega):
            state["x"] = _caxpy(
                _caxpy(state["x"], alpha[0], alpha[1], state["p"]),
                omega[0], omega[1], state["s"],
            )
            state["r"] = _caxpy(
                state["s"], -omega[0], -omega[1], state["t"]
            )
            rho_re, rho_im = _cdot(state["rhat"], state["r"])
            return {
                "rr": float(state["r"] @ state["r"]),
                "rho_re": rho_re,
                "rho_im": rho_im,
            }

        parts = engine.map_local(upd_xr)
        rr = sum(d["rr"] for d in parts)
        rho_next = (
            sum(d["rho_re"] for d in parts),
            sum(d["rho_im"] for d in parts),
        )
        it += 1
    x = engine.get_state_by_vertex("x")
    return x[:n], x[n:], it, float(np.sqrt(rr))


# --------------------------------------------------------------- kmeans --


def greedy_init(
    X: np.ndarray, ids: np.ndarray, k: int, margin: float = 1e-9
) -> np.ndarray:
    """Deterministic farthest-point (Gonzalez k-center) seeding — the
    hash-gateable replacement for randomized k-means++ (kmeans.hpp:60
    kpp_initialisation picks by d² probability; greedy picks the d²
    ARGMAX, same spread intuition, zero randomness). First centroid =
    the point with the smallest id; each next = the point maximizing
    its min squared distance to the chosen set, ties to the smallest
    id. Asserts every pick's top-2 gap clears ``margin`` relatively so
    the ~1e-13 engine-vs-SQL-twin summation-order drift can never flip
    a selection (the CG gate-robustness pattern)."""
    order = np.argsort(ids, kind="stable")
    X, ids = X[order], ids[order]
    picks = [0]  # X sorted by id → row 0 = min id
    mind2 = ((X - X[0]) ** 2).sum(-1)
    for _ in range(1, min(k, X.shape[0])):
        best = int(np.argmax(mind2))  # first max = smallest id on ties
        top2 = np.partition(mind2, -2)[-2:]
        gap = float(top2[1] - top2[0])
        if gap > 0:
            assert gap > margin * max(float(top2[1]), 1e-300), (
                f"greedy init near-tie (gap={gap:.3e}): pick not robust "
                f"to cross-engine FP drift"
            )
        else:
            # An exact FP tie in THIS engine's pairwise-summed d² need
            # not be a tie in the twin's sequential list_sum — the twin
            # could pick a different farthest point and every downstream
            # assignment would diverge. Only provably identical vectors
            # (same d² under ANY summation order) may tie.
            tied = np.flatnonzero(mind2 == mind2[best])
            assert all(
                np.array_equal(X[best], X[int(t)]) for t in tied
            ), (
                "greedy init exact d² tie between non-identical "
                "vectors: twin pick is summation-order dependent"
            )
        picks.append(best)
        d2 = ((X - X[best]) ** 2).sum(-1)
        mind2 = np.minimum(mind2, d2)
        mind2[picks] = -1.0  # never re-pick a chosen point
    return X[picks].copy()


def kmeans(
    emb: "ray.data.Dataset",
    k: int = 8,
    max_iters: int = 20,
    seed: int = 42,
    sample_size: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "kpp",
    fixed_iters: bool = False,
    assign_margin: float | None = None,
):
    """Lloyd iterations over the Dataset; init on a sample — ``kpp``
    (seeded k-means++, kmeans.hpp:60) or ``greedy`` (deterministic
    farthest-point, SQL-twinnable; the sample is the ``sample_size``
    smallest ids so both sides see the identical set).
    ``fixed_iters`` disables the early break so an unrolled SQL twin
    runs the identical count. ``assign_margin`` asserts every point's
    (second-best − best) d² gap clears it relatively in every
    assignment pass — the gate-robustness invariant that makes the
    integer (id, cluster) output immune to summation-order drift.
    Returns (centroids, assignment Dataset (id, cluster, dist))."""
    # Pin once: a lazy source would re-read/execute every Lloyd round.
    emb = emb.materialize()
    if init == "greedy":
        n_total = emb.count()
        src = (
            emb if n_total <= sample_size
            else emb.sort(id_col).limit(sample_size)
        )
        sample = src.to_pandas()
        X = np.array(sample[vec_col].tolist(), dtype=np.float64)
        C = greedy_init(
            X, np.asarray(sample[id_col], np.int64), k
        )
    else:
        sample = emb.limit(sample_size).to_pandas()
        X = np.array(sample[vec_col].tolist(), dtype=np.float64)
        rng = np.random.RandomState(seed)
        # k-means++ (kmeans.hpp:60 kpp_initialisation).
        C = [X[rng.randint(X.shape[0])]]
        for _ in range(1, min(k, X.shape[0])):
            d2 = np.min(
                ((X[:, None, :] - np.array(C)[None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            probs = d2 / max(d2.sum(), 1e-300)
            C.append(X[rng.choice(X.shape[0], p=probs)])
        C = np.array(C)

    for _ in range(max_iters):
        cref = ray.put(C)

        def partial_means(batch: pa.Table) -> pa.Table:
            Cm = ray.get(cref)
            V = _as_matrix(batch.column(vec_col))
            d = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            if d.shape[1] > 1:
                two = np.partition(d, 1, axis=1)[:, :2]
                gaps = (two[:, 1] - two[:, 0]) / np.maximum(
                    two[:, 1], 1e-300
                )
                m = float(gaps.min()) if gaps.size else 1.0
            else:
                m = 1.0
            # Combiner: per-block sum+count per cluster (+ the block's
            # min relative argmin gap, for the drift-margin assert).
            ks, sums, counts = [], [], []
            for c in np.unique(a):
                ks.append(int(c))
                sums.append(V[a == c].sum(0).tolist())
                counts.append(int((a == c).sum()))
            return pa.table(
                {
                    "cluster": pa.array(ks, pa.int64()),
                    "vsum": pa.array(sums, pa.list_(pa.float64(), V.shape[1])),
                    "cnt": pa.array(counts, pa.int64()),
                    "margin": pa.array([m] * len(ks), pa.float64()),
                }
            )

        parts = emb.map_batches(
            partial_means, batch_format="pyarrow"
        ).to_pandas()
        if assign_margin is not None and len(parts):
            m = float(parts["margin"].min())
            assert m > assign_margin, (
                f"kmeans assignment near-tie (min relative d² gap "
                f"{m:.3e} ≤ {assign_margin}): integer output not "
                f"robust to FP summation-order drift"
            )
        newC = C.copy()
        for c in range(C.shape[0]):
            rows = parts[parts["cluster"] == c]
            if len(rows):
                s = np.sum(np.array(rows["vsum"].tolist()), axis=0)
                n = rows["cnt"].sum()
                newC[c] = s / n
        if not fixed_iters and np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC

    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        V = _as_matrix(batch.column(vec_col))
        d = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        if assign_margin is not None and d.shape[1] > 1 and len(batch):
            two = np.partition(d, 1, axis=1)[:, :2]
            gaps = (two[:, 1] - two[:, 0]) / np.maximum(
                two[:, 1], 1e-300
            )
            m = float(gaps.min())
            assert m > assign_margin, (
                f"kmeans final assignment near-tie (gap {m:.3e})"
            )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(np.sqrt(d[np.arange(a.size), a])),
            }
        )

    return C, emb.map_batches(assign, batch_format="pyarrow")


# ----------------------------------------------------------- sparse NN --


def sparse_nn_inference(
    layers: list["ray.data.Dataset"],
    biases: list[float],
    x0: tuple[np.ndarray, np.ndarray],
    threshold: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """GraphChallenge sparse-DNN forward pass: per layer
    y = relu(W_l^T x + bias_l), optionally clipped at ``threshold``
    (sparse_nn_single_inference.hpp:52+ — vxm, bias fold, ReLU monoid,
    min-threshold). Layers are edge Datasets (src=in, dst=out, weight).
    x0 = (values, ids) sparse input; returns sparse (values, ids).

    The activation vector never touches the driver between layers: each
    layer's spmv output blocks feed a worker task that applies
    bias/ReLU/threshold and re-sorts, returning an object-store ref the
    next spmv broadcasts directly (the ObjectRef form of ``spmv``'s x).
    The driver holds only the final result."""

    @ray.remote
    def _layer_post(bias_l: float, thr, *blocks: pa.Table):
        from alp_ray.util import concat_blocks

        t = concat_blocks(
            list(blocks),
            columns={"vertex": pa.int64(), "val": pa.float64()},
        )
        if t.num_rows:
            ids = np.asarray(t.column("vertex"), np.int64)
            vals = np.asarray(t.column("val"), np.float64) + bias_l
        else:
            ids = np.empty(0, np.int64)
            vals = np.empty(0)
        vals = np.maximum(vals, 0.0)  # ReLU (relu op, ops.hpp:514)
        if thr is not None:
            vals = np.minimum(vals, thr)
        keep = vals > 0
        order = np.argsort(ids[keep])
        return vals[keep][order], ids[keep][order]

    xv, xi = x0
    order0 = np.argsort(xi)
    xref = ray.put((np.asarray(xv, np.float64)[order0],
                    np.asarray(xi, np.int64)[order0]))
    for W, bias in zip(layers, biases):
        y = spmv(W, xref, PLUS_TIMES, weight_col="weight")
        refs = y.materialize().to_arrow_refs()
        xref = _layer_post.remote(bias, threshold, *refs)
    xv, xi = ray.get(xref)
    return xv, xi


def sparse_nn_engine(
    engine,
    layer_keys: list[str],
    biases: list[float],
    x0: tuple[np.ndarray, np.ndarray],
    threshold: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-layer GraphChallenge forward pass on a ``GraphEngine`` whose
    shards hold every layer as a STASHED edge set
    (``GraphEngine.synth_layer_stack`` / ``add_edge_layer``): per layer,
    ONE superstep whose ``_edges_key`` scalar swaps the active weight
    matrix in-actor — no rebuild, no driver materialization, no Dataset
    groupby overhead per layer (ref semantics:
    sparse_nn_single_inference.hpp:52+ — vxm, bias fold, ReLU, optional
    min-threshold clip).

    Biases must be ≤ 0 (the GraphChallenge convention): the superstep
    runs a SPARSE frontier (active = x > 0), so a vertex reached by no
    positive activation sees y = 0 and relu(0 + bias) must be 0 for
    exact equivalence with the sparse-vector reference semantics.
    Returns sparse (values, ids)."""
    assert all(b <= 0 for b in biases), (
        "sparse_nn_engine requires biases <= 0 (GraphChallenge "
        "convention); use sparse_nn_inference for general biases"
    )
    xv, xi = x0
    dense = np.zeros(engine.n)
    dense[np.asarray(xi, np.int64)] = np.asarray(xv, np.float64)
    engine.set_state_by_vertex("x", dense)

    def pre(state, ctx):
        x = state["x"]
        return x, x > 0

    def post(state, y, ctx):
        v = np.maximum(y + ctx["scalars"]["_bias"], 0.0)
        thr = ctx["scalars"].get("_thr")
        if thr is not None:
            v = np.minimum(v, thr)
        state["x"] = v
        return {"nnz": float(np.count_nonzero(v))}

    # All L layers as ONE pipelined task DAG: per-iteration scalars
    # carry the layer key + bias, so the whole forward pass costs a
    # single driver ray.get (≙ the reference's nonblocking pipeline).
    per_iter = [
        {"_edges_key": key, "_bias": float(b),
         **({"_thr": float(threshold)} if threshold is not None else {})}
        for key, b in zip(layer_keys, biases)
    ]
    engine.run_supersteps(
        pre, "plus_times", post, iters=len(per_iter), scalars=per_iter
    )
    x = engine.get_state_by_vertex("x")
    ids = np.flatnonzero(x > 0)
    return x[ids], ids


# ---------------------------------------------------- cosine similarity --


def cosine_similarity_vectors(
    x: "ray.data.Dataset", y: "ray.data.Dataset", value_col: str = "val"
) -> float:
    """cos(x,y) = ⟨x,y⟩ / (‖x‖‖y‖) over two vertex-state Datasets
    (inner-join on vertex; absent entries are 0)."""
    a = x.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "xv"]
    )
    bds = y.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "yv"]
    )
    a = a.materialize()
    joined = a.join(
        bds,
        join_type="inner",
        num_partitions=join_partitions(a.count()),
        on=("vertex",),
    )

    def parts(batch: pa.Table) -> pa.Table:
        xv = np.asarray(batch.column("xv"), np.float64)
        yv = np.asarray(batch.column("yv"), np.float64)
        return pa.table(
            {"dot": [float((xv * yv).sum())]}
        )

    dot = joined.map_batches(parts, batch_format="pyarrow").sum("dot") or 0.0

    def ss(ds, col):
        def f(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column(col), np.float64)
            return pa.table({"ss": [float((v * v).sum())]})

        return ds.map_batches(f, batch_format="pyarrow").sum("ss") or 0.0

    nx = np.sqrt(ss(x, value_col))
    ny = np.sqrt(ss(bds, "yv"))
    if nx == 0 or ny == 0:
        return 0.0
    return float(dot / (nx * ny))


def pca(
    emb: "ray.data.Dataset",
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed PCA over an embedding column — the two-pass
    covariance pattern: (1) every batch reduces to (count, Σx, ΣxxT)
    partials (O(d²) floats per BLOCK, independent of row count), the
    driver combines the tiny partial list and eigendecomposes the d×d
    covariance; (2) one projection pass maps each vector onto the top-k
    components (mean and basis broadcast once via ray.put). Component
    signs are fixed deterministically (largest-|loading| coordinate
    positive) so results don't depend on LAPACK's sign convention.
    Returns ((vec_id, pc1..pck) Dataset, explained_variance_ratio).

    No SQL twin (eigendecomposition); verified against a single-node
    NumPy PCA in tests."""
    d = None

    def partials(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch.column(vec_col))
        return pa.table({
            "n": pa.array([V.shape[0]], pa.int64()),
            "s": pa.array([V.sum(axis=0).tobytes()], pa.binary()),
            "g": pa.array([(V.T @ V).tobytes()], pa.binary()),
        })

    rows = emb.select_columns([vec_col]).map_batches(
        partials, batch_format="pyarrow"
    ).take_all()  # O(#blocks) rows of d+d² floats — the small-aggregate escape
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"], np.float64) for r in rows], axis=0)
    d = s.size
    g = np.sum(
        [np.frombuffer(r["g"], np.float64).reshape(d, d) for r in rows],
        axis=0,
    )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order]  # (d, k)
    # Deterministic sign: flip so each component's largest-|v| entry > 0.
    for j in range(comp.shape[1]):
        i = np.argmax(np.abs(comp[:, j]))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    ratio = evals[order] / max(evals.sum(), 1e-300)
    bref = ray.put((mean, comp))

    def project(batch: pa.Table) -> pa.Table:
        m, W = ray.get(bref)
        V = _as_matrix(batch.column(vec_col))
        P = (V - m) @ W
        cols = {id_col: batch.column(id_col).cast(pa.int64())}
        for j in range(W.shape[1]):
            cols[f"pc{j + 1}"] = pa.array(np.round(P[:, j], 6))
        return pa.table(cols)

    out = emb.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow"
    )
    return out, ratio
