"""HPCG: 27-point 3D system + red-black Gauss-Seidel smoother +
multigrid V-cycle + the preconditioned-CG driver — the last §2.7
algorithm (ref algorithms/hpcg/hpcg.hpp:97 preconditioned CG loop,
multigrid_v_cycle.hpp:180 multi_grid, red_black_gauss_seidel.hpp:54
__rbgs_single_step, matrix_building_utils.hpp builders) with the smoke
test's constants (tests/smoke/hpcg.cpp:79-82: diag 26.0, off-diag
-1.0, halo radius 1, 2 colors).

Semantics mirrored exactly:
- matrix: every (i, j) with Chebyshev distance ≤ 1 between grid
  coordinates (the 3D 27-point box halo), diag 26, off-diag -1;
- colors: static index-parity masks (matrix_building_utils.hpp:140 —
  mask c = {i : i % colors == c}), NOT geometric parity;
- one smoother run = forward pass over colors then backward pass over
  reversed colors; each color step computes the FULL y = A·z and
  updates only that color's rows: z[i] = (r[i] − y[i] + z[i]·d) / d;
- V-cycle: z=0 at entry; coarsest level runs ONE smoother run;
  otherwise pre-smooth → r_c = R·(r − A·z) → recurse → z += Rᵀ·z_c →
  post-smooth, with R the injection matrix (one entry per coarse row,
  value 1, at the even-coordinate fine point —
  ndim_matrix_builders.hpp:531 coords_to_finer_col with steps 2).

Engine layout: one GraphEngine per level (A applied natively via
for_linear_system), states z/r resident on shards; each color step is
one superstep. Level transfer ships only the O(n/8) coarse vector
through the driver (restriction harvest + prolongation scatter via
map_local); at cluster scale this rides ray.put / shard-to-shard
messages — the transfer is already per-shard-sliced on both ends.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine

DIAG = 26.0
OFFDIAG = -1.0
N_COLORS = 2


def grid_matrix_3d(
    sizes: tuple[int, int, int],
    diag: float = DIAG,
    offdiag: float = OFFDIAG,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """27-point box-halo matrix entries (rows, cols, vals) for an
    (nx, ny, nz) grid, index = x + nx·y + nx·ny·z (x fastest — the
    row_generator coordinate order)."""
    nx, ny, nz = sizes
    n = nx * ny * nz
    i = np.arange(n, dtype=np.int64)
    x, y, z = i % nx, (i // nx) % ny, i // (nx * ny)
    rows_l, cols_l, vals_l = [], [], []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xx, yy, zz = x + dx, y + dy, z + dz
                ok = (
                    (xx >= 0) & (xx < nx)
                    & (yy >= 0) & (yy < ny)
                    & (zz >= 0) & (zz < nz)
                )
                j = xx[ok] + nx * yy[ok] + nx * ny * zz[ok]
                rows_l.append(i[ok])
                cols_l.append(j)
                v = diag if (dx == 0 and dy == 0 and dz == 0) else offdiag
                vals_l.append(np.full(j.size, v))
    return (
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
    )


def inject_cols(
    coarse: tuple[int, int, int], fine: tuple[int, int, int]
) -> np.ndarray:
    """Coarse row i → fine column index (the single entry of the
    injection/coarsening matrix row, value 1)."""
    cx, cy, cz = coarse
    fx, fy, _ = fine
    ci = np.arange(cx * cy * cz, dtype=np.int64)
    x, y, z = ci % cx, (ci // cx) % cy, ci // (cx * cy)
    return 2 * x + fx * (2 * y) + fx * fy * (2 * z)


@dataclass
class HpcgLevel:
    engine: GraphEngine
    n: int
    sizes: tuple[int, int, int]
    inject: np.ndarray | None  # maps child-level rows → this level's cols


def build_hpcg_levels(
    sizes: tuple[int, int, int] = (8, 8, 8),
    levels: int = 2,
    P: int = 4,
) -> list[HpcgLevel]:
    out: list[HpcgLevel] = []
    cur = sizes
    for li in range(levels):
        rows, cols, vals = grid_matrix_3d(cur)
        eng = GraphEngine.for_linear_system(
            rows, cols, vals, n=int(np.prod(cur)), P=P
        )
        inj = None
        if li + 1 < levels:
            nxt = tuple(s // 2 for s in cur)
            assert all(s >= 2 for s in nxt), "grid too small to coarsen"
            inj = inject_cols(nxt, cur)
        out.append(HpcgLevel(eng, int(np.prod(cur)), cur, inj))
        cur = tuple(s // 2 for s in cur)
    return out


def _rbgs_color_step(lev: HpcgLevel, color: int) -> None:
    """One masked smoother step (__rbgs_single_step): full y = A·z
    superstep, then update only rows with index % 2 == color."""

    def pre(state, ctx):
        return state["z"]

    def post(state, y, ctx, color=color):
        ids = ctx["part"] + np.arange(ctx["n_local"]) * ctx["P"]
        m = (ids % N_COLORS) == color
        state["z"][m] = (
            state["r"][m] - y[m] + state["z"][m] * DIAG
        ) / DIAG
        return {}

    lev.engine.superstep(pre, "plus_times", post)


def run_smoother(lev: HpcgLevel, steps: int) -> None:
    """steps × (forward over colors + backward over reversed colors)."""
    for _ in range(steps):
        for c in range(N_COLORS):
            _rbgs_color_step(lev, c)
        for c in reversed(range(N_COLORS)):
            _rbgs_color_step(lev, c)


def v_cycle(
    levels: list[HpcgLevel],
    li: int = 0,
    pre_steps: int = 1,
    post_steps: int = 1,
) -> None:
    """multi_grid (multigrid_v_cycle.hpp:180): reads state "r", leaves
    the preconditioned result in state "z" of ``levels[li]``."""
    lev = levels[li]
    lev.engine.set_state("z", 0.0)
    if li == len(levels) - 1:
        run_smoother(lev, 1)
        return
    run_smoother(lev, pre_steps)

    # r_c = R · (r − A·z): one spmv superstep, then each shard emits
    # (coarse index, residual) for the injection points it owns.
    def pre(state, ctx):
        return state["z"]

    def post(state, y, ctx):
        state["Axz"] = y
        return {}

    lev.engine.superstep(pre, "plus_times", post)
    inj = lev.inject

    def harvest(state, ctx, inj=inj):
        m = (inj % ctx["P"]) == ctx["part"]
        loc = inj[m] // ctx["P"]
        return {
            "ci": np.flatnonzero(m),
            "cv": state["r"][loc] - state["Axz"][loc],
        }

    rc = np.empty(inj.size)
    for d in lev.engine.map_local(harvest):
        rc[d["ci"]] = d["cv"]
    coarse = levels[li + 1]
    coarse.engine.set_state_by_vertex("r", rc)
    v_cycle(levels, li + 1, pre_steps, post_steps)
    zc = coarse.engine.get_state_by_vertex("z")

    # Prolongation: z_fine += Rᵀ · z_coarse (injection columns are
    # distinct fine points, so the fold is a sliced add).
    def prolong(state, ctx, inj=inj, zc=zc):
        m = (inj % ctx["P"]) == ctx["part"]
        loc = inj[m] // ctx["P"]
        state["z"][loc] = state["z"][loc] + zc[m]
        return {}

    lev.engine.map_local(prolong)
    run_smoother(lev, post_steps)


def hpcg(
    levels: list[HpcgLevel],
    b: np.ndarray,
    max_iters: int = 10,
    tol: float = 0.0,
    with_preconditioning: bool = True,
    smoother_steps: int = 1,
) -> tuple[np.ndarray, int, float]:
    """Preconditioned CG (hpcg.hpp:97): per iteration one V-cycle
    (z = M⁻¹r), the r·z / pAp collectives as shard-partial sums, one
    A·p superstep. Relative-residual stop: ‖r‖/‖r₀‖ ≤ tol.
    Returns (x, iterations, final_relative_residual)."""
    fine = levels[0]
    eng = fine.engine
    eng.set_state_by_vertex("b", b.astype(np.float64))
    eng.set_state("x", 0.0)

    # x₀ = 0 → r = b (mirrors set(p,x); Ap=A·x; r = b − Ap with x=0).
    def init_fn(state, ctx):
        state["r"] = state["b"].copy()
        return {"rr": float(state["r"] @ state["r"])}

    rr = sum(d["rr"] for d in eng.map_local(init_fn))
    norm0 = np.sqrt(rr)
    if norm0 == 0:
        return eng.get_state_by_vertex("x"), 0, 0.0
    norm = norm0
    r_dot_z = 0.0
    it = 0
    while it < max_iters and norm / norm0 > tol:
        if with_preconditioning:
            v_cycle(levels, 0, smoother_steps, smoother_steps)
        else:
            eng.map_local(
                lambda st, c: st.__setitem__("z", st["r"].copy())
            )
        rz_parts = eng.map_local(
            lambda st, c: {"rz": float(st["r"] @ st["z"])}
        )
        rz = sum(d["rz"] for d in rz_parts)
        if it == 0:
            eng.map_local(
                lambda st, c: st.__setitem__("p", st["z"].copy())
            )
        else:
            beta = rz / r_dot_z

            def upd_p(state, ctx, beta=beta):
                # Ap = beta·p + z; swap → p (eWiseMulAdd + swap).
                state["p"] = beta * state["p"] + state["z"]
                return {}

            eng.map_local(upd_p)
        r_dot_z = rz

        def pre(state, ctx):
            return state["p"]

        def post(state, y, ctx):
            state["Ap"] = y
            return {"pAp": float(state["p"] @ y)}

        pAp = eng.superstep(pre, "plus_times", post)["pAp"]
        alpha = r_dot_z / pAp

        def upd_xr(state, ctx, alpha=alpha):
            state["x"] = state["x"] + alpha * state["p"]
            state["r"] = state["r"] + (-alpha) * state["Ap"]
            return {"rr": float(state["r"] @ state["r"])}

        rr = sum(d["rr"] for d in eng.map_local(upd_xr))
        norm = np.sqrt(rr)
        it += 1
    return eng.get_state_by_vertex("x"), it, float(norm / norm0)


def shutdown(levels: list[HpcgLevel]) -> None:
    for lev in levels:
        lev.engine.shutdown()
