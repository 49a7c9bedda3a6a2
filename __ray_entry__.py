"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship corpus→import-graph→PageRank pipeline;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data operators); ``oracle_sql()`` gives the
DuckDB twin for every SQL-expressible one. Ray is initialised by the
caller — nothing here calls ray.init/shutdown.

Column-name/type parity: every Ray result casts its columns to the exact
names/types the SQL twin produces; float aggregates are rounded to 6
decimals on BOTH sides so order-of-reduction ulps cannot break the
value-hash compare.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# Shared derivation constants (SQL twins below must match
# alp_ray/sources/tables.py::derived_edges).
MOD_DENSE = 601     # dense graph for spmv/triangles/khop
MOD_SPARSE = 1501   # sparse graph (l_linenumber = 1) for CC

_E_DENSE = (
    "SELECT DISTINCT l_orderkey % {m} AS src, "
    "(l_partkey * 7 + l_suppkey) % {m} AS dst "
    "FROM lineitem WHERE l_orderkey % {m} != (l_partkey * 7 + l_suppkey) % {m}"
).format(m=MOD_DENSE)

_E_SPARSE = (
    "SELECT DISTINCT l_orderkey % {m} AS src, "
    "(l_partkey * 7 + l_suppkey) % {m} AS dst "
    "FROM lineitem WHERE l_linenumber = 1 "
    "AND l_orderkey % {m} != (l_partkey * 7 + l_suppkey) % {m}"
).format(m=MOD_SPARSE)

_E_WEIGHTED = (
    "SELECT src, dst, CAST((src + dst) % 10 + 1 AS DOUBLE) AS weight "
    f"FROM ({_E_DENSE})"
)

# Fixed iteration counts shared by the Ray queries and their unrolled
# DuckDB CTE twins (same number of synchronous updates on both sides).
_PR_K = 20       # pagerank power steps
_LP_K = 12       # thresholded label-propagation steps (fixpoint-safe)
_LPA_K = 5       # community LPA steps (fixpoint-safe)
_PPR_ROUNDS = 26  # pregel pagerank rounds (round 0 = init → 25 updates)
_CG_K = 12       # conjugate-gradient steps (fixed; tol=0 on both sides)
_BI_K = 8        # bicgstab steps (fixed; tol=0 on both sides)
_BIC_K = 8       # complex bicgstab steps (fixed; tol=0 on both sides)
MOD_CPLX = 600   # complex-bicgstab system size (P=4 must divide it —
                 # plane co-sharding; 601 is prime so the dense mod is
                 # unusable here)

_E_CPLX = (
    "SELECT DISTINCT l_orderkey % {m} AS src, "
    "(l_partkey * 7 + l_suppkey) % {m} AS dst "
    "FROM lineitem WHERE l_orderkey % {m} != (l_partkey * 7 + l_suppkey) % {m}"
).format(m=MOD_CPLX)
_COLOR_K = 45    # Jones-Plassmann rounds (29 needed at sf0.01; both
                 # sides run exactly K rounds, unconverged stay -1)
_HITS_K = 12     # HITS full iterations (2K half-steps on both sides)
_KATZ_K = 15     # Katz fixed steps; alpha = 2^-9 (EXACT double scale —
                 # the multiply adds zero rounding — and keeps the
                 # series convergent at every gated sf: dense-graph
                 # spectral radius ~492 < 512 even at sf0.1)
_KATZ_ALPHA = 0.001953125
_EIGC_K = 15     # eigenvector-centrality power steps (HITS half-step
                 # FP contract: scale by the INPUT's 1/sqrt(sum x^2))
_KM_K = 8        # kmeans clusters
_KM_L = 5        # kmeans Lloyd iterations (fixed; no early break)
_KM_SAMPLE = 4096  # greedy-init sample: the SAMPLE smallest vec_ids


def _round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    """DuckDB-ROUND-exact rounding (half away from zero, std::round
    law) — delegates to the shared fuzz-verified helper. np.round is
    banker's and differs exactly on the dyadic rationals (k/2^m) that
    quality scores land on; floor(x·p + 0.5) mis-carries within half
    an ulp below .5."""
    from alp_ray.util import round_half_away

    return round_half_away(x, nd)


def _cast(ds, types: dict[str, pa.DataType], round6: tuple[str, ...] = ()):
    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in types:
            col = batch.column(name)
            if name in round6:
                col = pa.array(
                    _round_half_away(np.asarray(col, dtype=np.float64), 6)
                )
            cols[name] = col.cast(types[name]) if hasattr(col, "cast") else col
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _dense_edges(sf_dir: str, weighted: bool = False):
    from alp_ray.sources.tables import derived_edges

    return derived_edges(sf_dir, mod=MOD_DENSE, weighted=weighted)


def _x_of_src() -> str:
    return "(src % 7) + 1"


# --------------------------------------------------------------- queries --


def _q_edges(sf_dir: str):
    return _cast(
        _dense_edges(sf_dir), {"src": pa.int64(), "dst": pa.int64()}
    )


def _q_out_degrees(sf_dir: str):
    from alp_ray.stages.graph import degrees

    d = degrees(_dense_edges(sf_dir), key="src", name="degree")
    d = d.rename_columns(["vertex", "degree"])
    return _cast(d, {"vertex": pa.int64(), "degree": pa.int64()})


def _q_in_degrees(sf_dir: str):
    from alp_ray.stages.graph import degrees

    d = degrees(_dense_edges(sf_dir), key="dst", name="degree")
    d = d.rename_columns(["vertex", "degree"])
    return _cast(d, {"vertex": pa.int64(), "degree": pa.int64()})


def _x_tuple(edges) -> tuple[np.ndarray, np.ndarray]:
    # x over the full vertex universe 0..MOD-1: x[v] = v % 7 + 1.
    ids = np.arange(MOD_DENSE, dtype=np.int64)
    return ((ids % 7) + 1).astype(np.float64), ids


def _q_spmv_plus_times(sf_dir: str):
    from alp_ray.functions.semiring import PLUS_FIRST
    from alp_ray.stages.graph import spmv

    edges = _dense_edges(sf_dir)
    y = spmv(edges, _x_tuple(edges), PLUS_FIRST, weight_col=None)
    return _cast(y, {"vertex": pa.int64(), "val": pa.float64()})


def _q_spmv_transpose(sf_dir: str):
    from alp_ray.functions.semiring import PLUS_FIRST
    from alp_ray.stages.graph import spmv

    edges = _dense_edges(sf_dir)
    y = spmv(
        edges, _x_tuple(edges), PLUS_FIRST, transpose=True, weight_col=None
    )
    return _cast(y, {"vertex": pa.int64(), "val": pa.float64()})


def _q_spmv_min_plus(sf_dir: str):
    from alp_ray.functions.semiring import MIN_PLUS
    from alp_ray.stages.graph import spmv

    edges = _dense_edges(sf_dir, weighted=True)
    y = spmv(edges, _x_tuple(edges), MIN_PLUS, weight_col="weight")
    return _cast(y, {"vertex": pa.int64(), "val": pa.float64()})


def _q_spmv_masked(sf_dir: str):
    from alp_ray.functions.semiring import PLUS_FIRST
    from alp_ray.stages.graph import spmv

    edges = _dense_edges(sf_dir)
    mask = np.arange(0, MOD_DENSE, 3, dtype=np.int64)  # structural mask
    y = spmv(
        edges, _x_tuple(edges), PLUS_FIRST, weight_col=None, mask=mask
    )
    return _cast(y, {"vertex": pa.int64(), "val": pa.float64()})


def _q_ewise_add_degrees(sf_dir: str):
    from alp_ray.stages.graph import degrees, ewise_union

    e = _dense_edges(sf_dir)
    out_d = degrees(e, key="src", name="val").rename_columns(
        ["vertex", "val"]
    )
    in_d = degrees(e, key="dst", name="val").rename_columns(
        ["vertex", "val"]
    )
    z = ewise_union(out_d, in_d, monoid_agg="sum")
    return _cast(z, {"vertex": pa.int64(), "val": pa.int64()})


def _q_ewise_masked(sf_dir: str):
    """Masked eWiseApply (out·in degree product, output-masked to
    vertices with out-degree ≥ 5) — ≙ the masked eWiseApply overloads
    of base/blas1.hpp:208; mask applied as one union+groupby marker
    shuffle (stages/graph.py apply_mask)."""
    from alp_ray.stages.graph import degrees, ewise_inner_masked

    e = _dense_edges(sf_dir)
    out_d = degrees(e, key="src", name="val").rename_columns(
        ["vertex", "val"]
    )
    in_d = degrees(e, key="dst", name="val").rename_columns(
        ["vertex", "val"]
    )
    mask = out_d.filter(expr="val >= 5")
    z = ewise_inner_masked(out_d, in_d, mask, np.multiply)
    return _cast(z, {"vertex": pa.int64(), "val": pa.int64()})


def _q_fold_masked_complement(sf_dir: str):
    """Masked foldl under structural_complement (descriptors.hpp:117):
    total out-degree over the complement of the even-vertex in-degree
    mask (odd vertices + vertices with no in-edges — non-vacuous at
    every sf, unlike an absolute degree threshold)."""
    from alp_ray.stages.graph import degrees, fold_masked

    e = _dense_edges(sf_dir)
    out_d = degrees(e, key="src", name="val").rename_columns(
        ["vertex", "val"]
    )
    in_d = degrees(e, key="dst", name="val").rename_columns(
        ["vertex", "val"]
    )
    def even_only(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("vertex"), np.int64)
        return batch.filter(pa.array(v % 2 == 0))

    mask = in_d.map_batches(even_only, batch_format="pyarrow")
    total = fold_masked(out_d, mask, monoid_agg="sum", invert_mask=True)
    return pa.table({"val": pa.array([int(total or 0)], pa.int64())})


def _q_spgemm(sf_dir: str):
    from alp_ray.functions.semiring import PLUS_TIMES
    from alp_ray.pipelines.matrix import spgemm

    from alp_ray.sources.tables import derived_edges

    e1 = derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True)
    e2 = derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True)
    c = spgemm(e1, e2, PLUS_TIMES)
    return _cast(
        c,
        {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
    )


def _q_spy(sf_dir: str):
    from alp_ray.pipelines.spy import spy

    out = spy(
        _dense_edges(sf_dir), n_rows=MOD_DENSE, n_cols=MOD_DENSE,
        small_m=16, small_n=16,
    )
    return _cast(
        out,
        {"bucket_i": pa.int64(), "bucket_j": pa.int64(),
         "count": pa.int64()},
    )


def _q_triangles(sf_dir: str):
    from alp_ray.pipelines.triangles import triangle_count

    n = triangle_count(_dense_edges(sf_dir))
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def _q_components(sf_dir: str):
    from alp_ray.pipelines.components import connected_components
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    # Dataset-native build: blocks stream worker→shard, never the
    # driver; distinct enforced at ingestion (shard-local dedup).
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    connected_components(engine)
    engine.compute_out_degrees("outdeg")
    labels = engine.get_state_by_vertex("label").astype(np.int64)
    outdeg = engine.get_state_by_vertex("outdeg")
    engine.shutdown()
    # Graph is symmetric, so present vertices are exactly outdeg > 0.
    ids = np.flatnonzero(outdeg > 0)
    return pa.table(
        {
            "vertex": pa.array(ids.astype(np.int64)),
            "label": pa.array(labels[ids]),
        }
    )


def _q_scc(sf_dir: str):
    """Strongly connected components (directed sparse graph) via the
    engine's FW-BW coloring; labels = min member id, all vertices
    (isolated ones are their own singleton SCC)."""
    from alp_ray.pipelines.scc import strongly_connected_components
    from alp_ray.sources.tables import derived_edges
    from alp_ray.state.engine import GraphEngine

    edges = derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True)
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    strongly_connected_components(engine)
    labels = engine.get_state_by_vertex("scc").astype(np.int64)
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(
                np.arange(MOD_SPARSE, dtype=np.int64)
            ),
            "scc": pa.array(labels),
        }
    )


def _q_khop2(sf_dir: str):
    from alp_ray.pipelines.traversal import khop
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    mask, _ = khop(engine, source=0, k=2)
    engine.shutdown()
    return pa.table(
        {"vertex": pa.array(np.flatnonzero(mask).astype(np.int64))}
    )


def _q_sssp4(sf_dir: str):
    from alp_ray.pipelines.traversal import sssp
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir, weighted=True), n=MOD_DENSE, P=4,
        weighted=True,
    )
    dist = sssp(engine, source=0, max_iters=4)
    engine.shutdown()
    finite = np.isfinite(dist)
    ids = np.flatnonzero(finite)
    return pa.table(
        {
            "vertex": pa.array(ids.astype(np.int64)),
            "dist": pa.array(_round_half_away(dist[ids], 6)),
        }
    )


_SSSP_FULL_K = 12  # unrolled twin steps — an UPPER bound, not the exact
# count (min-plus relaxation past the fixpoint is idempotent); the query
# asserts convergence within it.


def _q_sssp_full(sf_dir: str):
    """SSSP to CONVERGENCE (Bellman-Ford fixpoint), not hop-limited:
    integer weights ⇒ bitwise-exact distances at any iteration order."""
    from alp_ray.pipelines.traversal import sssp
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir, weighted=True), n=MOD_DENSE, P=4,
        weighted=True,
    )
    dist, iters = sssp(engine, source=0, return_iters=True)
    engine.shutdown()
    assert iters <= _SSSP_FULL_K, (
        f"sssp did not converge within the twin's {_SSSP_FULL_K} "
        f"unrolled steps (took {iters})"
    )
    finite = np.isfinite(dist)
    ids = np.flatnonzero(finite)
    return pa.table(
        {
            "vertex": pa.array(ids.astype(np.int64)),
            "dist": pa.array(_round_half_away(dist[ids], 6)),
        }
    )


def _sssp_full_oracle() -> str:
    steps = ["b0 AS MATERIALIZED (SELECT 0 AS v, CAST(0 AS DOUBLE) AS d)"]
    for i in range(1, _SSSP_FULL_K + 1):
        p = f"b{i - 1}"
        steps.append(
            f"b{i} AS MATERIALIZED (SELECT v, MIN(d) AS d FROM ("
            f"  SELECT * FROM {p} UNION ALL "
            f"  SELECT e.dst, {p}.d + e.weight FROM {p} "
            f"  JOIN e ON e.src = {p}.v"
            f") GROUP BY v)"
        )
    return (
        f"WITH e AS MATERIALIZED ({_E_WEIGHTED}), "
        + ", ".join(steps)
        + f" SELECT v AS vertex, ROUND(d, 6) AS dist FROM b{_SSSP_FULL_K}"
    )


def _q_pagerank(sf_dir: str):
    """Fixed-iteration PageRank (20 power steps with dangling handling)
    so the DuckDB twin — the same 20 steps unrolled as CTEs — matches
    value-for-value. Semantics per simple_pagerank.hpp (α=0.85, dangling
    mass, uniform teleport); fixed K instead of the residual exit so
    both sides apply the identical number of updates."""
    from alp_ray.pipelines.pagerank import pagerank
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    pagerank(engine, conv=0.0, max_iters=_PR_K, sync_every=_PR_K)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "pr": pa.array(_round_half_away(pr, 7)),
        }
    )


def _q_hits(sf_dir: str):
    """HITS hubs/authorities, fixed K full iterations so the DuckDB twin
    (the same 2K half-steps unrolled as CTEs) matches value-for-value.
    The engine runs both orientations as resident edge sets
    (build_reversed transpose exchange) in ONE pipelined task graph."""
    from alp_ray.pipelines.hits import hits
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    hits(engine, iters=_HITS_K)
    a = engine.get_state_by_vertex("a")
    h = engine.get_state_by_vertex("h")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "auth": pa.array(_round_half_away(a, 6)),
            "hub": pa.array(_round_half_away(h, 6)),
        }
    )


_MATCH_ROUNDS = 20  # maximal-matching proposal rounds (11 needed at
                    # sf0.1; extra rounds are fixpoint no-ops, the
                    # pipeline raises if the graph outruns the unroll)


def _q_matching(sf_dir: str):
    """Greedy maximal matching (local-min mutual proposals under a
    multiplicative-mix edge priority), fixed-round unrolled twin."""
    from alp_ray.pipelines.matching import maximal_matching

    m, used = maximal_matching(
        _dense_edges(sf_dir), n=MOD_DENSE, rounds=_MATCH_ROUNDS
    )
    assert used <= _MATCH_ROUNDS
    return m


def _matching_sql(n: int, rounds: int) -> str:
    """Unrolled mutual-proposal twin: per round a per-vertex MIN over
    alive-alive edges and the both-endpoints-agree join."""
    parts = [
        "WITH ec AS MATERIALIZED (SELECT a, b, "
        f"((((a * {n} + b) * 2654435761) % 1000000007) * {n} + a) "
        f"* {n} + b AS k "
        "FROM (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b "
        f"FROM ({_E_DENSE}) WHERE src != dst)), "
        f"alive0 AS MATERIALIZED (SELECT range AS v FROM range({n}))"
    ]
    sels = []
    for r in range(1, rounds + 1):
        pr = f"alive{r - 1}"
        parts.append(
            f", cand{r} AS MATERIALIZED (SELECT e.a, e.b, e.k "
            f"FROM ec e JOIN {pr} x ON x.v = e.a "
            f"JOIN {pr} y ON y.v = e.b)"
        )
        parts.append(
            f", prop{r} AS MATERIALIZED (SELECT v, MIN(k) AS k FROM ("
            f"SELECT a AS v, k FROM cand{r} UNION ALL "
            f"SELECT b AS v, k FROM cand{r}) GROUP BY v)"
        )
        parts.append(
            f", mm{r} AS MATERIALIZED (SELECT DISTINCT c.k "
            f"FROM cand{r} c JOIN prop{r} p1 ON p1.v = c.a "
            f"AND p1.k = c.k JOIN prop{r} p2 ON p2.v = c.b "
            "AND p2.k = c.k)"
        )
        parts.append(
            f", alive{r} AS MATERIALIZED (SELECT v FROM {pr} "
            f"WHERE v NOT IN (SELECT (k // {n}) % {n} FROM mm{r}) "
            f"AND v NOT IN (SELECT k % {n} FROM mm{r}))"
        )
        sels.append(
            f"SELECT (k // {n}) % {n} AS src, k % {n} AS dst FROM mm{r}"
        )
    union = " UNION ALL ".join(sels)
    parts.append(f" SELECT DISTINCT src, dst FROM ({union})")
    return "".join(parts)


def _q_vertex_cover(sf_dir: str):
    """Gavril's 2-approximate vertex cover: the endpoint set of the
    greedy maximal matching (every edge touches a matched endpoint by
    maximality; at most 2·OPT since OPT covers each matched edge)."""
    from alp_ray.pipelines.matching import maximal_matching

    m, _ = maximal_matching(
        _dense_edges(sf_dir), n=MOD_DENSE, rounds=_MATCH_ROUNDS
    )
    v = np.unique(
        np.concatenate([
            np.asarray(m.column("src"), np.int64),
            np.asarray(m.column("dst"), np.int64),
        ])
    )
    return pa.table({"vertex": pa.array(v)})


def _vertex_cover_sql(n: int, rounds: int) -> str:
    inner = _matching_sql(n, rounds)
    return (
        "SELECT DISTINCT vertex FROM ("
        f"SELECT src AS vertex FROM ({inner}) "
        f"UNION ALL SELECT dst AS vertex FROM ({inner}))"
    )


_SALSA_K = 12    # SALSA full iterations (2K half-steps on both sides)


def _q_salsa(sf_dir: str):
    """SALSA authorities/hubs (degree-normalized HITS random walk),
    fixed K full iterations; the twin unrolls the identical 2K
    half-steps with the per-vertex divide mirrored per joined row."""
    from alp_ray.pipelines.salsa import salsa
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    salsa(engine, iters=_SALSA_K)
    a = engine.get_state_by_vertex("a")
    h = engine.get_state_by_vertex("h")
    engine.shutdown()
    _margin_assert(a, 6, "salsa auth")
    _margin_assert(h, 6, "salsa hub")
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "auth": pa.array(_round_half_away(a, 6)),
            "hub": pa.array(_round_half_away(h, 6)),
        }
    )


def _salsa_sql(K: int) -> str:
    """SALSA twin: 2K degree-normalized half-steps unrolled; the
    divide happens on the joined row (identical doubles to the
    engine's pre-divide), the final scale is 1.0/Σval per vector."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM e "
        "GROUP BY src), ",
        "indeg AS MATERIALIZED (SELECT dst, COUNT(*) AS c FROM e "
        "GROUP BY dst), ",
        f"h0 AS MATERIALIZED (SELECT v, CAST(1.0/{MOD_DENSE} AS DOUBLE) "
        "AS val FROM verts)",
    ]
    for k in range(1, K + 1):
        parts.append(
            f", a{k} AS MATERIALIZED (SELECT v.v AS v, "
            "COALESCE(y.s, 0.0) AS val FROM verts v LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.val / d.c) AS s FROM h{k - 1} p "
            "JOIN e ON e.src = p.v JOIN outdeg d ON d.src = p.v "
            "GROUP BY e.dst) y ON y.v = v.v)"
        )
        parts.append(
            f", h{k} AS MATERIALIZED (SELECT v.v AS v, "
            "COALESCE(y.s, 0.0) AS val FROM verts v LEFT JOIN ("
            f"SELECT e.src AS v, SUM(p.val / d.c) AS s FROM a{k} p "
            "JOIN e ON e.dst = p.v JOIN indeg d ON d.dst = p.v "
            "GROUP BY e.src) y ON y.v = v.v)"
        )
    parts.append(
        " SELECT v.v AS vertex, "
        f"ROUND(a.val * (SELECT 1.0/SUM(val) FROM a{K}), 6) AS auth, "
        f"ROUND(h.val * (SELECT 1.0/SUM(val) FROM h{K}), 6) AS hub "
        f"FROM verts v JOIN a{K} a ON a.v = v.v JOIN h{K} h ON h.v = v.v"
    )
    return "".join(parts)


def _margin_assert(x: np.ndarray, nd: int, what: str) -> None:
    """Gate-robustness invariant (the CG fix generalized): no rounded
    digit may sit near a .5 half-boundary, so last-ulp engine-vs-twin
    summation-order drift can NEVER flip a ROUND(x, nd) value. Fails
    loudly instead of flaking the driver's value hash."""
    frac = np.abs(x) * (10.0 ** nd) % 1.0
    margin = float(np.min(np.abs(frac - 0.5)))
    assert margin > 1e-4, (
        f"{what}: value within {margin:.2e} of a rounding "
        f"half-boundary; adjust the fixture"
    )


def _q_katz(sf_dir: str):
    """Katz centrality (x ← α·Aᵀx + 1, fixed K steps, α = 2⁻⁹ so the
    scale multiply is EXACT in binary64) on the dense graph; the DuckDB
    twin unrolls the identical K steps. α·spectral-radius < 1 at every
    gated sf, keeping values O(1) and round-safe."""
    from alp_ray.pipelines.katz import katz
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    katz(engine, alpha=_KATZ_ALPHA, iters=_KATZ_K)
    x = engine.get_state_by_vertex("x")
    engine.shutdown()
    _margin_assert(x, 6, "katz")
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "katz": pa.array(_round_half_away(x, 6)),
        }
    )


def _q_eigencentrality(sf_dir: str):
    """In-edge eigenvector centrality (power iteration, per-step scale
    by the INPUT's 1/‖x‖₂ — the HITS half-step FP contract — plus one
    final self-normalization), K fixed steps mirrored by the twin."""
    from alp_ray.pipelines.katz import eigencentrality
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    eigencentrality(engine, iters=_EIGC_K)
    x = engine.get_state_by_vertex("x")
    engine.shutdown()
    _margin_assert(x, 6, "eigencentrality")
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "eigc": pa.array(_round_half_away(x, 6)),
        }
    )


def _q_repetition(sf_dir: str):
    """Gopher-style within-document repetition filters — one
    map_batches pass, zero shuffle; every fraction a single IEEE
    divide of exact integers, so the twin matches with NO rounding."""
    import ray.data

    from alp_ray.stages.text import repetition_scores_batch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        repetition_scores_batch, batch_format="pyarrow"
    )


_REPETITION_SQL = (
    "WITH lines AS MATERIALIZED (SELECT doc_id, "
    "unnest(string_split(text, chr(10))) AS line FROM documents), "
    "ls AS (SELECT doc_id, COUNT(*) AS n_lines, SUM(length(line)) "
    "AS tc FROM lines GROUP BY doc_id), "
    "ld AS (SELECT doc_id, COUNT(*) AS nd, SUM(length(line)) AS dc "
    "FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY doc_id), "
    "toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') "
    "AS arr FROM documents), "
    "tok AS MATERIALIZED (SELECT doc_id, unnest(arr) AS tok, "
    "generate_subscripts(arr, 1) AS i FROM toks), "
    "bgc AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram, "
    "COUNT(*) AS cnt FROM tok a JOIN tok b ON b.doc_id = a.doc_id "
    "AND b.i = a.i + 1 GROUP BY a.doc_id, bigram), "
    "bgm AS (SELECT doc_id, MAX(cnt) AS topc, SUM(cnt) AS nb "
    "FROM bgc GROUP BY doc_id) "
    "SELECT ls.doc_id, ls.n_lines, "
    "CAST(ls.n_lines - ld.nd AS DOUBLE) / CAST(ls.n_lines AS DOUBLE) "
    "AS dup_line_frac, "
    "CASE WHEN ls.tc = 0 THEN CAST(0.0 AS DOUBLE) ELSE "
    "CAST(ls.tc - ld.dc AS DOUBLE) / CAST(ls.tc AS DOUBLE) END "
    "AS dup_line_char_frac, "
    "CASE WHEN bgm.doc_id IS NULL THEN CAST(0.0 AS DOUBLE) ELSE "
    "CAST(bgm.topc AS DOUBLE) / CAST(bgm.nb AS DOUBLE) END "
    "AS top_bigram_frac "
    "FROM ls JOIN ld ON ld.doc_id = ls.doc_id "
    "LEFT JOIN bgm ON bgm.doc_id = ls.doc_id"
)


def _q_gopher_quality(sf_dir: str):
    """Gopher-style quality rules (word count / type-token ratio / mean
    word length / stopword presence) — one map_batches pass, zero
    shuffle; every output an integer (floor-division ratios), so the
    twin matches with NO rounding."""
    import ray.data

    from alp_ray.stages.text import gopher_quality_batch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        gopher_quality_batch, batch_format="pyarrow"
    )


def _gopher_quality_sql() -> str:
    from alp_ray.stages.text import (
        _STOPWORDS,
        GOPHER_MAX_MWL_X100,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL_X100,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_TTR_PCT,
        GOPHER_MIN_WORDS,
    )

    stops = ", ".join(f"'{w}'" for w in _STOPWORDS[:8])
    return (
        "WITH toks AS MATERIALIZED (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "agg AS (SELECT doc_id, COUNT(*) AS nw, "
        "COUNT(DISTINCT tok) AS nd, "
        "CAST(SUM(length(tok)) AS BIGINT) AS ch, "
        f"CAST(SUM(CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS sh FROM toks GROUP BY doc_id) "
        "SELECT doc_id, nw AS n_words, nd AS n_distinct_words, "
        "ch AS n_word_chars, sh AS stop_hits, "
        "(100 * nd) // nw AS ttr_pct, "
        "(100 * ch) // nw AS mean_wlen_x100, "
        "CAST(CASE WHEN "
        f"nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} "
        f"AND (100 * nd) // nw >= {GOPHER_MIN_TTR_PCT} "
        f"AND (100 * ch) // nw BETWEEN {GOPHER_MIN_MWL_X100} "
        f"AND {GOPHER_MAX_MWL_X100} "
        f"AND sh >= {GOPHER_MIN_STOP_HITS} THEN 1 ELSE 0 END "
        "AS BIGINT) AS keep FROM agg"
    )


# Boruvka MST: fixed round/doubling counts shared by the Ray query and
# the unrolled twin (extra rounds past the fixpoint are no-ops on both
# sides; boruvka_mst raises if the fixpoint is NOT reached in time).
_MST_ROUNDS = 11   # ceil(log2(601)) + 1
_MST_D = 11        # pointer doublings per round


def _q_mst(sf_dir: str):
    """Boruvka minimum spanning forest of the weighted dense graph —
    packed (w, a, b) argmin keys make the forest unique under weight
    ties and every step integer-exact; zero shuffles (per-block argmin
    partials + broadcast labels + driver pointer doubling)."""
    from alp_ray.pipelines.mst import boruvka_mst

    forest, used = boruvka_mst(
        _dense_edges(sf_dir, weighted=True),
        n=MOD_DENSE,
        rounds=_MST_ROUNDS,
    )
    assert used <= _MST_ROUNDS
    return forest


def _mst_sql(n: int, rounds: int, doublings: int) -> str:
    """Unrolled Boruvka twin: per round an argmin-by-packed-key GROUP
    BY, hook parents, the mutual-pair break, and exactly ``doublings``
    pointer-doubling self-joins — the same integer ops the Ray side
    runs in numpy."""
    parts = [
        "WITH ew AS MATERIALIZED (SELECT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b, CAST(weight AS BIGINT) AS w "
        f"FROM ({_E_WEIGHTED}) WHERE src != dst), "
        f"lab0 AS MATERIALIZED (SELECT range AS v, range AS lab "
        f"FROM range({n}))"
    ]
    sels = []
    for r in range(1, rounds + 1):
        pr = f"lab{r - 1}"
        cand_half = (
            "SELECT {side}.lab AS comp, "
            f"(e.w * {n} + e.a) * {n} + e.b AS key "
            f"FROM ew e JOIN {pr} la ON la.v = e.a "
            f"JOIN {pr} lb ON lb.v = e.b WHERE la.lab != lb.lab"
        )
        parts.append(
            f", cand{r} AS MATERIALIZED ("
            + cand_half.format(side="la")
            + " UNION ALL "
            + cand_half.format(side="lb")
            + ")"
        )
        parts.append(
            f", m{r} AS MATERIALIZED (SELECT comp, MIN(key) AS k "
            f"FROM cand{r} GROUP BY comp)"
        )
        parts.append(
            f", par{r} AS MATERIALIZED (SELECT m.comp AS c, "
            "CASE WHEN la.lab = m.comp THEN lb.lab ELSE la.lab END AS p "
            f"FROM m{r} m JOIN {pr} la ON la.v = (m.k // {n}) % {n} "
            f"JOIN {pr} lb ON lb.v = m.k % {n})"
        )
        parts.append(
            f", p{r}_0 AS MATERIALIZED (SELECT l.lab AS c, "
            "COALESCE(pr2.p, l.lab) AS p "
            f"FROM (SELECT DISTINCT lab FROM {pr}) l "
            f"LEFT JOIN par{r} pr2 ON pr2.c = l.lab)"
        )
        parts.append(
            f", p{r}_1 AS MATERIALIZED (SELECT x.c, "
            "CASE WHEN y.p = x.c AND x.c < x.p THEN x.c ELSE x.p END "
            f"AS p FROM p{r}_0 x JOIN p{r}_0 y ON y.c = x.p)"
        )
        for i in range(1, doublings + 1):
            parts.append(
                f", p{r}_{i + 1} AS MATERIALIZED (SELECT x.c, y.p "
                f"FROM p{r}_{i} x JOIN p{r}_{i} y ON y.c = x.p)"
            )
        parts.append(
            f", lab{r} AS MATERIALIZED (SELECT l.v, pp.p AS lab "
            f"FROM {pr} l JOIN p{r}_{doublings + 1} pp ON pp.c = l.lab)"
        )
        sels.append(
            f"SELECT (k // {n}) % {n} AS src, k % {n} AS dst, "
            f"k // {n * n} AS weight FROM m{r}"
        )
    union = " UNION ALL ".join(sels)
    parts.append(
        f" SELECT DISTINCT src, dst, weight FROM ({union})"
    )
    return "".join(parts)


_RICH_CLUB_K = 64  # degree thresholds k = 0..63


def _q_rich_club(sf_dir: str):
    """Rich-club coefficient φ(k) = 2·E_k / (n_k·(n_k−1)) over the
    symmetrized sparse graph (Zhou & Mondragón 2004), k = 0..63,
    rows where n_k ≥ 2. One degree table + ONE map_batches histogram
    pass (e_k is the suffix-cumsum of the per-edge min-degree
    histogram) — no iteration, no second shuffle; φ as an integer
    ×10⁴ floor division so the twin is rounding-free."""
    import ray
    import ray.data

    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import canonicalize, symmetrize

    es = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    ).materialize()

    # Degrees of the symmetric simple graph.
    deg = np.zeros(MOD_SPARSE, np.int64)
    for t in ray.get(
        es.map_batches(
            lambda b: pa.table(
                {"v": b.column("src")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
        .to_arrow_refs()
    ):
        if "v" in t.column_names and t.num_rows:
            deg += np.bincount(
                np.asarray(t.column("v"), np.int64), minlength=MOD_SPARSE
            )
    deg_ref = ray.put(deg)

    def hist(batch: pa.Table, _ref=deg_ref) -> pa.Table:
        if "src" not in batch.column_names or batch.num_rows == 0:
            return pa.table(
                {"mind": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        import ray as _ray

        d = _ray.get(_ref)
        s = np.asarray(batch.column("src"), np.int64)
        t = np.asarray(batch.column("dst"), np.int64)
        keep = s < t  # canonical orientation of the symmetric set
        mind = np.minimum(d[s[keep]], d[t[keep]])
        u, c = np.unique(mind, return_counts=True)
        return pa.table(
            {"mind": pa.array(u), "c": pa.array(c.astype(np.int64))}
        )

    mind_hist = np.zeros(int(deg.max()) + 2, np.int64)
    for t in ray.get(
        es.map_batches(hist, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if "mind" in t.column_names and t.num_rows:
            np.add.at(
                mind_hist,
                np.asarray(t.column("mind"), np.int64),
                np.asarray(t.column("c"), np.int64),
            )
    ks = np.arange(_RICH_CLUB_K, dtype=np.int64)
    # e_k = #edges with min(deg) > k; n_k = #vertices with deg > k.
    suffix = np.cumsum(mind_hist[::-1])[::-1]
    e_k = np.array(
        [suffix[k + 1] if k + 1 < suffix.size else 0 for k in ks],
        np.int64,
    )
    n_k = np.array([(deg > k).sum() for k in ks], np.int64)
    keep = n_k >= 2
    ks, e_k, n_k = ks[keep], e_k[keep], n_k[keep]
    phi = (2 * e_k * 10_000) // (n_k * (n_k - 1))
    return pa.table(
        {
            "k": pa.array(ks),
            "n_k": pa.array(n_k),
            "e_k": pa.array(e_k),
            "phi_x10000": pa.array(phi),
        }
    )


def _rich_club_sql(kmax: int) -> str:
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    return (
        f"WITH es AS MATERIALIZED ({es}), "
        "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c FROM es "
        "GROUP BY src), "
        f"ks AS (SELECT range AS k FROM range({kmax})), "
        "nk AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n FROM ks "
        "JOIN deg ON deg.c > ks.k GROUP BY ks.k), "
        "ek AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e FROM ks "
        "JOIN es ON es.src < es.dst "
        "JOIN deg da ON da.v = es.src JOIN deg db ON db.v = es.dst "
        "WHERE da.c > ks.k AND db.c > ks.k GROUP BY ks.k) "
        "SELECT nk.k, nk.n AS n_k, COALESCE(ek.e, 0) AS e_k, "
        "(2 * COALESCE(ek.e, 0) * 10000) // (nk.n * (nk.n - 1)) "
        "AS phi_x10000 FROM nk LEFT JOIN ek ON ek.k = nk.k "
        "WHERE nk.n >= 2"
    )


_Z_BITS = 21


def _q_zorder_events(sf_dir: str):
    """Z-order (Morton) clustering keys over (user_id, value-cents):
    the lakehouse data-layout primitive — sorting by the interleaved
    key co-locates rows close in BOTH dimensions, so min/max column
    stats prune 2-D range scans. Emits (event_id, zkey); integer bit
    interleave, exact twin. The layout use is ds.sort('zkey') →
    partitioned sink (the sort itself needs no oracle — the KEY does)."""
    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "value"],
    )

    def zkey(batch: pa.Table) -> pa.Table:
        from alp_ray.util import round_half_away

        u = np.asarray(batch.column("user_id"), np.int64) % (
            1 << _Z_BITS
        )
        v = round_half_away(
            np.asarray(batch.column("value"), np.float64) * 100.0, 0
        ).astype(np.int64) % (1 << _Z_BITS)
        z = np.zeros(u.size, np.int64)
        for i in range(_Z_BITS):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((v >> i) & 1) << (2 * i + 1)
        return pa.table({
            "event_id": batch.column("event_id").cast(pa.int64()),
            "zkey": pa.array(z),
        })

    return li.map_batches(zkey, batch_format="pyarrow")


def _zorder_sql(bits: int) -> str:
    u_terms = " + ".join(
        f"(((user_id % {1 << bits}) >> {i}) & 1) * {1 << (2 * i)}"
        for i in range(bits)
    )
    v_terms = " + ".join(
        f"(((vc >> {i}) & 1) * {1 << (2 * i + 1)})" for i in range(bits)
    )
    return (
        "WITH e AS (SELECT event_id, user_id, "
        f"CAST(ROUND(value * 100) AS BIGINT) % {1 << bits} AS vc "
        "FROM events) "
        f"SELECT event_id, CAST({u_terms} + {v_terms} AS BIGINT) "
        "AS zkey FROM e"
    )


def _q_canonical_docs(sf_dir: str):
    """Best-of-cluster canonical selection: per exact-text cluster keep
    the highest-word-count doc (ties → min id) — packed-key argmax
    through the one hash-keyed groupby."""
    import ray.data

    from alp_ray.pipelines.dedup import canonical_docs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _cast(
        canonical_docs(docs),
        {"h": pa.string(), "canonical_id": pa.int64(),
         "n_words": pa.int64()},
    )


_CANONICAL_DOCS_SQL = (
    "WITH h AS (SELECT doc_id, md5(text) AS h, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS nw "
    "FROM documents), "
    "r AS (SELECT doc_id, h, nw, ROW_NUMBER() OVER ("
    "PARTITION BY h ORDER BY nw DESC, doc_id) AS rk FROM h) "
    "SELECT h, doc_id AS canonical_id, nw AS n_words FROM r "
    "WHERE rk = 1"
)


def _q_pareto_frontier(sf_dir: str):
    """Skyline query: the Pareto frontier of (minimize price-cents,
    maximize quantity) over lineitem — distinct non-dominated pairs.
    Frontiers MERGE (frontier of a union = frontier of the union of
    frontiers), so each block reduces to ≤ |distinct qty| rows and the
    driver folds an antichain-sized set; no shuffle at all. Exact
    integers (price in cents)."""
    import ray
    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity"],
    )

    def frontier(p: np.ndarray, q: np.ndarray):
        # distinct pairs → per price keep max qty → strict scan.
        key = p * 1_000 + q  # qty < 1000
        u = np.unique(key)
        p, q = u // 1_000, u % 1_000
        # ascending p; per p the max q is the last? sort by (p, q):
        # keep the LAST q of each p run, then strictly-decreasing q
        # scan keeps only rows beating every cheaper row.
        last = np.r_[p[1:] != p[:-1], True]
        p, q = p[last], q[last]
        run = np.maximum.accumulate(q)
        keep = np.r_[True, q[1:] > run[:-1]]
        return p[keep], q[keep]

    def block_frontier(batch: pa.Table) -> pa.Table:
        if (
            "l_extendedprice" not in batch.column_names
            or batch.num_rows == 0
        ):
            return pa.table({
                "price_cents": pa.array([], pa.int64()),
                "quantity": pa.array([], pa.int64()),
            })
        from alp_ray.util import round_half_away

        p = round_half_away(
            np.asarray(batch.column("l_extendedprice"), np.float64)
            * 100.0,
            0,
        ).astype(np.int64)
        q = np.asarray(
            batch.column("l_quantity"), np.float64
        ).astype(np.int64)
        fp, fq = frontier(p, q)
        return pa.table({
            "price_cents": pa.array(fp),
            "quantity": pa.array(fq),
        })

    parts = [
        t
        for t in ray.get(
            li.map_batches(block_frontier, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if "price_cents" in t.column_names and t.num_rows
    ]
    allp = pa.concat_tables(parts)
    fp, fq = frontier(
        np.asarray(allp.column("price_cents"), np.int64),
        np.asarray(allp.column("quantity"), np.int64),
    )
    return pa.table(
        {"price_cents": pa.array(fp), "quantity": pa.array(fq)}
    )


_PARETO_SQL = (
    "WITH pts AS MATERIALIZED (SELECT DISTINCT "
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents, "
    "CAST(l_quantity AS BIGINT) AS quantity FROM lineitem), "
    "pm AS (SELECT price_cents, MAX(quantity) AS quantity FROM pts "
    "GROUP BY price_cents), "
    "sc AS (SELECT price_cents, quantity, MAX(quantity) OVER ("
    "ORDER BY price_cents ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "1 PRECEDING) AS prev FROM pm) "
    "SELECT price_cents, quantity FROM sc "
    "WHERE prev IS NULL OR quantity > prev"
)


def _q_snapshot_diff(sf_dir: str):
    """Data-versioning diff: documents v1 vs a deterministic v2
    (doc_id % 97 == 0 dropped, doc_id % 101 == 0 edited, doc_id % 103
    == 0 duplicated as doc_id + 10^6 additions) → per-key
    added/removed/changed rows via the side-tagged coarse-partition
    compare (no hash join)."""
    import ray.data

    from alp_ray.stages.relational import dataset_diff

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def v2(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        text = np.asarray(batch.column("text"), dtype=object)
        keep = ids % 97 != 0
        ids_k, text_k = ids[keep], text[keep]
        edited = ids_k % 101 == 0
        text_k = np.where(
            edited, np.char.add(text_k.astype(str), " v2"), text_k
        ).astype(object)
        dup = ids[ids % 103 == 0] + 1_000_000
        dup_text = text[ids % 103 == 0]
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([ids_k, dup]).astype(np.int64)
            ),
            "text": pa.array(
                list(np.concatenate([text_k, dup_text])),
                pa.string(),
            ),
        })

    ds_b = docs.map_batches(v2, batch_format="pyarrow")
    return dataset_diff(docs, ds_b, key_col="doc_id", value_col="text")


_SNAPSHOT_DIFF_SQL = (
    "WITH v2 AS MATERIALIZED ("
    "SELECT doc_id, CASE WHEN doc_id % 101 = 0 THEN text || ' v2' "
    "ELSE text END AS text FROM documents WHERE doc_id % 97 != 0 "
    "UNION ALL SELECT doc_id + 1000000 AS doc_id, text "
    "FROM documents WHERE doc_id % 103 = 0) "
    "SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, "
    "CASE WHEN b.doc_id IS NULL THEN 'removed' "
    "WHEN a.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status "
    "FROM documents a FULL OUTER JOIN v2 b ON b.doc_id = a.doc_id "
    "WHERE b.doc_id IS NULL OR a.doc_id IS NULL OR a.text != b.text"
)


def _q_square_count(sf_dir: str):
    """4-cycle (square) count of the symmetric sparse graph: each
    square has two opposite-corner pairs, so
    n_C4 = Σ_{u<v} C(codegree(u,v), 2) / 2 — codegrees come from
    co_occurrence over (middle → neighbor) wedges (the bipartite
    projection machinery reused verbatim; max_group = n so no
    heavy-basket drop can bias the exact count; wedge cost Σdeg² is
    the same class as the triangle shuffle path)."""
    import ray

    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.stages.relational import co_occurrence

    es = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    )
    cn = co_occurrence(
        es, group_col="src", item_col="dst",
        min_count=2, max_group=MOD_SPARSE,
    )
    total = 0
    for t in ray.get(cn.materialize().to_arrow_refs()):
        if "n_groups" in t.column_names and t.num_rows:
            c = np.asarray(t.column("n_groups"), np.int64)
            total += int((c * (c - 1) // 2).sum())
    return pa.table({"n_squares": pa.array([total // 2], pa.int64())})


_SQUARE_COUNT_SQL = (
    "WITH es AS MATERIALIZED ("
    f"SELECT src, dst FROM ({_E_SPARSE}) "
    f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})), "
    "cn AS (SELECT a.dst AS u, b.dst AS v, "
    "CAST(COUNT(*) AS BIGINT) AS c FROM es a "
    "JOIN es b ON b.src = a.src AND a.dst < b.dst GROUP BY u, v) "
    "SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) // 2 "
    "AS n_squares FROM cn WHERE c >= 2"
)


_WL_K = 4  # Weisfeiler-Leman refinement rounds


def _q_wl_colors(sf_dir: str):
    """1-WL color refinement (graph-kernel / GNN-expressiveness
    fingerprints) on the symmetric sparse graph: colors are polynomial
    fold hashes of (own color, sorted neighbor colors) mod 2³¹−1,
    K fixed rounds — all-integer, exact twin."""
    from alp_ray.pipelines.wl import wl_refinement
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    es = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    )
    colors = wl_refinement(es, n=MOD_SPARSE, rounds=_WL_K)
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_SPARSE, dtype=np.int64)),
            "color": pa.array(colors),
        }
    )


def _wl_sql(K: int) -> str:
    n = MOD_SPARSE
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({n})), ",
        "c0 AS MATERIALIZED (SELECT v.v, "
        "CAST(COALESCE(d.c, 0) AS BIGINT) AS color FROM verts v "
        "LEFT JOIN (SELECT src, COUNT(*) AS c FROM es GROUP BY src) d "
        "ON d.src = v.v)",
    ]
    for r in range(1, K + 1):
        pr = f"c{r - 1}"
        parts.append(
            f", c{r} AS MATERIALIZED (SELECT c.v, "
            "COALESCE(agg.h, c.color) AS color "
            f"FROM {pr} c LEFT JOIN ("
            "SELECT e.dst AS v, list_reduce(list_prepend(cd.color, "
            "list(c2.color ORDER BY c2.color)), "
            "(h, x) -> (h * 1000003 + x) % 2147483647) AS h "
            f"FROM es e JOIN {pr} c2 ON c2.v = e.src "
            f"JOIN {pr} cd ON cd.v = e.dst "
            "GROUP BY e.dst, cd.color) agg ON agg.v = c.v)"
        )
    parts.append(f" SELECT v AS vertex, color FROM c{K}")
    return "".join(parts)


_HB_P = 3       # HyperBall register bits (m = 8 registers/vertex)
_HB_ROUNDS = 5  # ball-merge rounds (balls at t = 1..5)


def _q_hyperball(sf_dir: str):
    """HyperBall / approximate neighborhood function (Boldi & Vigna):
    per-vertex HLL balls merged register-max per round on the engine's
    (max, first) semiring — the web-scale effective-diameter
    algorithm. Emits the INTEGER register summaries (sum_reg,
    zero_reg) per vertex per round; the cardinality estimate is a pure
    function of them (approx_distinct_poly's state contract)."""
    from alp_ray.pipelines.anf import hyperball
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    stats = hyperball(engine, p=_HB_P, rounds=_HB_ROUNDS)
    engine.shutdown()
    vs, ts, sums, zeros = [], [], [], []
    ar = np.arange(MOD_SPARSE, dtype=np.int64)
    for t, (s, z) in enumerate(stats, start=1):
        vs.append(ar)
        ts.append(np.full(MOD_SPARSE, t, np.int64))
        sums.append(s)
        zeros.append(z)
    return pa.table(
        {
            "vertex": pa.array(np.concatenate(vs)),
            "t": pa.array(np.concatenate(ts)),
            "sum_reg": pa.array(np.concatenate(sums)),
            "zero_reg": pa.array(np.concatenate(zeros)),
        }
    )


def _hyperball_sql(p: int, rounds: int) -> str:
    """Unrolled HyperBall twin: init registers from the multiplicative
    vertex fingerprint (rank = w+1 − bit_length ladder), then per
    round ONE register-max CTE over (self ∪ in-neighbors)."""
    m = 1 << p
    w = 31 - p
    n = MOD_SPARSE
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    ladder = "CASE " + " ".join(
        f"WHEN hv >= {1 << (w - 1 - k)} THEN {w - k}"
        for k in range(w)
    ) + " ELSE 0 END"
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({n})), ",
        "h0 AS MATERIALIZED (SELECT v, (h1 * h1 + h1) % 2147483647 "
        "AS h FROM (SELECT v, (v * 2654435761) % 2147483647 AS h1 "
        "FROM verts)), ",
        f"r0 AS MATERIALIZED (SELECT h0.v, t.range AS idx, "
        f"CASE WHEN (h0.h & {m - 1}) = t.range THEN "
        f"{w + 1} - (SELECT {ladder} FROM (SELECT h0.h >> {p} AS hv)) "
        "ELSE CAST(0 AS BIGINT) END AS val "
        f"FROM h0 CROSS JOIN range({m}) t)",
    ]
    sels = []
    for t in range(1, rounds + 1):
        pr = f"r{t - 1}"
        parts.append(
            f", r{t} AS MATERIALIZED (SELECT r.v, r.idx, "
            "GREATEST(r.val, COALESCE(mx.mval, 0)) AS val "
            f"FROM {pr} r LEFT JOIN ("
            "SELECT e.dst AS v, r2.idx, MAX(r2.val) AS mval "
            f"FROM es e JOIN {pr} r2 ON r2.v = e.src "
            "GROUP BY e.dst, r2.idx) mx "
            "ON mx.v = r.v AND mx.idx = r.idx)"
        )
        sels.append(
            f"SELECT v, CAST({t} AS BIGINT) AS t, "
            "CAST(SUM(val) AS BIGINT) AS sum_reg, "
            "CAST(SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS zero_reg FROM r{t} GROUP BY v"
        )
    union = " UNION ALL ".join(sels)
    parts.append(
        f" SELECT v AS vertex, t, sum_reg, zero_reg FROM ({union})"
    )
    return "".join(parts)


_RDV_SHARDS = 8  # rendezvous-hash shard count


def _q_rendezvous(sf_dir: str):
    """Rendezvous (highest-random-weight) hashing of documents to
    shards — the consistent data-placement primitive (Thaler & Ravishankar
    1998): doc → argmax over shards of the mixed (doc, shard) hash, so
    removing a shard only remaps its own keys. Emits per-shard member
    counts; one map_batches histogram pass, no shuffle. The mixer is
    quadratic (the hyperball lesson — linear maps bias small-id
    argmaxes toward one shard)."""
    import ray
    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    S = _RDV_SHARDS
    M31 = (1 << 31) - 1

    def assign(batch: pa.Table) -> pa.Table:
        if "doc_id" not in batch.column_names or batch.num_rows == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            })
        d = np.asarray(batch.column("doc_id"), np.int64)
        best = np.full(d.size, -1, np.int64)
        bestw = np.full(d.size, -1, np.int64)
        for s in range(S):
            h = ((d * S + s) * 2_654_435_761) % M31
            h = (h * h + h) % M31
            take = h > bestw
            bestw = np.where(take, h, bestw)
            best = np.where(take, s, best)
        sh, cnt = np.unique(best, return_counts=True)
        return pa.table({
            "shard": pa.array(sh),
            "n_docs": pa.array(cnt.astype(np.int64)),
        })

    agg = np.zeros(S, np.int64)
    for t in ray.get(
        docs.map_batches(assign, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if "shard" in t.column_names and t.num_rows:
            np.add.at(
                agg,
                np.asarray(t.column("shard"), np.int64),
                np.asarray(t.column("n_docs"), np.int64),
            )
    return pa.table({
        "shard": pa.array(np.arange(S, dtype=np.int64)),
        "n_docs": pa.array(agg),
    })


def _rendezvous_sql(S: int) -> str:
    return (
        "WITH w AS (SELECT doc_id, shard, "
        "(h1 * h1 + h1) % 2147483647 AS h FROM ("
        "SELECT d.doc_id, s.range AS shard, "
        f"((d.doc_id * {S} + s.range) * 2654435761) % 2147483647 "
        f"AS h1 FROM documents d CROSS JOIN range({S}) s)), "
        "pick AS (SELECT doc_id, shard, ROW_NUMBER() OVER ("
        "PARTITION BY doc_id ORDER BY h DESC, shard) AS rk FROM w) "
        f"SELECT s.range AS shard, CAST(COUNT(p.doc_id) AS BIGINT) "
        f"AS n_docs FROM range({S}) s "
        "LEFT JOIN pick p ON p.shard = s.range AND p.rk = 1 "
        "GROUP BY s.range"
    )


_AR_MIN_SUP = 3  # association rules: minimum pair support (orders)


def _q_assoc_rules(sf_dir: str):
    """Association rules A→B over market baskets (the Apriori
    confidence step): for every ordered pair with pair-support ≥ 3,
    confidence_pct = (100 · n_AB) // n_A — pair supports from the
    co_occurrence bipartite projection, antecedent supports from one
    distinct-count aggregate, both integer."""
    import ray
    import ray.data

    from alp_ray.stages.relational import co_occurrence

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    )
    pairs = co_occurrence(li, min_count=_AR_MIN_SUP).materialize()
    # Antecedent support = #distinct orders containing the item:
    # global (order, part) dedup via the coarse-fold, then one degree
    # aggregate — a block-local dedup would double-count pairs that
    # straddle blocks.
    from alp_ray.stages.graph import dedup_edges, degrees

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column("l_orderkey").cast(pa.int64()),
            "dst": b.column("l_partkey").cast(pa.int64()),
        })

    dd = dedup_edges(li.map_batches(as_edges, batch_format="pyarrow"))
    item_sup: dict[int, int] = {}
    for t in ray.get(
        degrees(dd, key="dst", name="s").materialize().to_arrow_refs()
    ):
        if "dst" in t.column_names and t.num_rows:
            for i, c in zip(
                t.column("dst").to_pylist(), t.column("s").to_pylist()
            ):
                item_sup[int(i)] = int(c)
    assert len(item_sup) < 5_000_000, "item table exceeds driver bound"

    def rules(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "antecedent": pa.array([], pa.int64()),
            "consequent": pa.array([], pa.int64()),
            "pair_support": pa.array([], pa.int64()),
            "confidence_pct": pa.array([], pa.int64()),
        })
        if "item_a" not in batch.column_names or batch.num_rows == 0:
            return empty
        a = np.asarray(batch.column("item_a"), np.int64)
        b = np.asarray(batch.column("item_b"), np.int64)
        n = np.asarray(batch.column("n_groups"), np.int64)
        ante = np.concatenate([a, b])
        cons = np.concatenate([b, a])
        ns = np.concatenate([n, n])
        sup_a = np.array(
            [item_sup[int(x)] for x in ante], np.int64
        )
        return pa.table({
            "antecedent": pa.array(ante),
            "consequent": pa.array(cons),
            "pair_support": pa.array(ns),
            "confidence_pct": pa.array((100 * ns) // sup_a),
        })

    return pairs.map_batches(rules, batch_format="pyarrow")


_ASSOC_RULES_SQL = (
    "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
    "l_partkey AS p FROM lineitem), "
    "sup AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS s "
    "FROM op GROUP BY p), "
    "pc2 AS (SELECT a.p AS pa, b.p AS pb, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM op a "
    "JOIN op b ON b.o = a.o AND a.p < b.p GROUP BY pa, pb), "
    f"f AS (SELECT * FROM pc2 WHERE n >= {_AR_MIN_SUP}), "
    "r AS (SELECT pa AS antecedent, pb AS consequent, n FROM f "
    "UNION ALL SELECT pb, pa, n FROM f) "
    "SELECT r.antecedent, r.consequent, r.n AS pair_support, "
    "(100 * r.n) // s.s AS confidence_pct "
    "FROM r JOIN sup s ON s.p = r.antecedent"
)


def _q_interarrival(sf_dir: str):
    """Per-user inter-arrival gap stats (count, min, LOWER-median, max
    in µs) — exact integer order statistics, LEAD + ROW_NUMBER twin."""
    import ray.data

    from alp_ray.stages.window import interarrival_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
    )
    return interarrival_stats(ev)


_INTERARRIVAL_SQL = (
    "WITH o AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus, "
    "LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events), "
    "g AS (SELECT user_id, nxt - tus AS gap FROM o "
    "WHERE nxt IS NOT NULL), "
    "r AS (SELECT user_id, gap, ROW_NUMBER() OVER ("
    "PARTITION BY user_id ORDER BY gap) AS rk, "
    "COUNT(*) OVER (PARTITION BY user_id) AS n FROM g) "
    "SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_gaps, "
    "MIN(gap) AS min_gap_us, "
    "CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN gap END) AS BIGINT) "
    "AS median_gap_us, MAX(gap) AS max_gap_us "
    "FROM r GROUP BY user_id"
)


def _q_hourly_active(sf_dir: str):
    """Hourly active users (the DAU/HAU family): distinct users per
    tumbling hour — block-distinct (hour, user) partials, whole hours
    co-located by the coarse hash partition, one distinct-count kernel
    per partition. All-integer."""
    import ray.data

    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").cast(pa.int64()), np.int64)
        hour = (ts // 3_600_000_000) * 3_600_000_000
        u = np.asarray(batch.column("user_id"), np.int64)
        key = hour // 3_600_000_000 * np.int64(1 << 21) + u
        uniq = np.unique(key)
        return pa.table({
            "window_start_us": pa.array(
                (uniq >> 21) * 3_600_000_000
            ),
            "user_id": pa.array(uniq & ((1 << 21) - 1)),
        })

    tagged = _part_tag(
        ev.map_batches(prep, batch_format="pyarrow"),
        "window_start_us",
        n_parts,
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "window_start_us": pa.array([], pa.int64()),
            "active_users": pa.array([], pa.int64()),
        })
        if (
            "window_start_us" not in group.column_names
            or group.num_rows == 0
        ):
            return empty
        w = np.asarray(group.column("window_start_us"), np.int64)
        u = np.asarray(group.column("user_id"), np.int64)
        key = w // 3_600_000_000 * np.int64(1 << 21) + u
        uniq = np.unique(key)
        hw = uniq >> 21
        starts = np.flatnonzero(np.r_[True, hw[1:] != hw[:-1]])
        cnt = np.diff(np.r_[starts, hw.size]).astype(np.int64)
        return pa.table({
            "window_start_us": pa.array(hw[starts] * 3_600_000_000),
            "active_users": pa.array(cnt),
        })

    return tagged.groupby("__part").map_groups(
        fold, batch_format="pyarrow"
    )


_HOURLY_ACTIVE_SQL = (
    "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) "
    "AS window_start_us, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users "
    "FROM events GROUP BY 1"
)


def _q_decayed_activity(sf_dir: str):
    """Exponentially time-decayed engagement per user with an EXACT
    integer accumulator: score = Σ cents · 2^(30 − age_days) relative
    to the corpus max timestamp — powers of two keep the decay
    rounding-free (a float 2^-age sum would be summation-order
    sensitive at the ulp). Loud overflow guard at 2^62."""
    import ray
    import ray.data

    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts, round_half_away

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"],
    ).materialize()
    tmax = 0
    for t in ray.get(ev.to_arrow_refs()):
        if "ts" in t.column_names and t.num_rows:
            tmax = max(
                tmax,
                int(np.asarray(
                    t.column("ts").cast(pa.int64()), np.int64
                ).max()),
            )

    def prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").cast(pa.int64()), np.int64)
        v = np.asarray(batch.column("value"), np.float64)
        cents = round_half_away(v * 100.0, 0).astype(np.int64)
        age = (tmax - ts) // 86_400_000_000
        assert int(age.max(initial=0)) <= 30, "decay window exceeded"
        term = cents << (30 - age)
        return pa.table({
            "user_id": batch.column("user_id").cast(pa.int64()),
            "term": pa.array(term),
        })

    tagged = _part_tag(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        coarse_parts(),
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "decayed_score": pa.array([], pa.int64()),
        })
        if "user_id" not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column("user_id"), np.int64)
        t = np.asarray(group.column("term"), np.int64)
        order = np.argsort(u, kind="stable")
        u, t = u[order], t[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        s = np.add.reduceat(t, starts)
        assert (s < (1 << 62)).all(), "decayed score overflow"
        return pa.table({
            "user_id": pa.array(u[starts]),
            "decayed_score": pa.array(s),
        })

    return tagged.groupby("__part").map_groups(
        fold, batch_format="pyarrow"
    )


_DECAYED_SQL = (
    "WITH mx AS (SELECT MAX(CAST(epoch_us(ts) AS BIGINT)) AS t FROM "
    "events), "
    "e AS (SELECT user_id, "
    "CAST(ROUND(value * 100) AS BIGINT) AS cents, "
    "((SELECT t FROM mx) - CAST(epoch_us(ts) AS BIGINT)) "
    "// 86400000000 AS age FROM events) "
    "SELECT user_id, CAST(SUM(cents * (1::BIGINT << (30 - age))) "
    "AS BIGINT) AS decayed_score FROM e GROUP BY user_id"
)


_JC_P = 6  # join-cardinality HLL register bits (m = 64)


def _q_join_cardinality(sf_dir: str):
    """Join-cardinality estimation sketch (the query-planner
    primitive): HLL register states over orders.o_custkey (a) and
    customer.c_custkey (b) plus their max-merge union — |A∩B| follows
    by inclusion-exclusion on the three estimates, each a pure
    function of the emitted INTEGER state. One sketch-sized driver
    fold per side; never a key-sized exchange."""
    import ray.data

    from alp_ray.stages.sketch import hll_int_registers, hll_state_row

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    ra = hll_int_registers(orders, "o_custkey", p=_JC_P)
    rb = hll_int_registers(cust, "c_custkey", p=_JC_P)
    ru = np.maximum(ra, rb)
    rows = [
        ("a",) + hll_state_row(ra),
        ("b",) + hll_state_row(rb),
        ("union",) + hll_state_row(ru),
    ]
    return pa.table({
        "side": pa.array([r[0] for r in rows], pa.string()),
        "sum_reg": pa.array([r[1] for r in rows], pa.int64()),
        "zero_reg": pa.array([r[2] for r in rows], pa.int64()),
        "checksum": pa.array([r[3] for r in rows], pa.int64()),
    })


def _join_cardinality_sql(p: int) -> str:
    m = 1 << p
    w = 31 - p
    ladder = "CASE " + " ".join(
        f"WHEN hv >= {1 << (w - 1 - j)} THEN {w - j}"
        for j in range(w)
    ) + " ELSE 0 END"

    def regs(name: str, col: str, table: str) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT t.range AS idx, "
            "COALESCE(MAX(rk.rank), 0) AS reg "
            f"FROM range({m}) t LEFT JOIN ("
            f"SELECT h & {m - 1} AS idx, "
            f"{w + 1} - (SELECT {ladder} FROM "
            f"(SELECT h >> {p} AS hv)) AS rank FROM ("
            "SELECT (h1 * h1 + h1) % 2147483647 AS h FROM ("
            f"SELECT (k * 2654435761) % 2147483647 AS h1 FROM ("
            f"SELECT DISTINCT {col} AS k FROM {table})))"
            ") rk ON rk.idx = t.range GROUP BY t.range)"
        )

    def state(label: str, src: str) -> str:
        return (
            f"SELECT '{label}' AS side, "
            f"CAST(SUM(reg) AS BIGINT) AS sum_reg, "
            "CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS zero_reg, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list(reg ORDER BY idx)), "
            "(h, c) -> (h * 1000003 + c) % 2147483647) AS checksum "
            f"FROM {src}"
        )

    return (
        "WITH "
        + regs("ra", "o_custkey", "orders")
        + ", "
        + regs("rb", "c_custkey", "customer")
        + ", ru AS MATERIALIZED (SELECT a.idx, "
        "GREATEST(a.reg, b.reg) AS reg FROM ra a "
        "JOIN rb b ON b.idx = a.idx) "
        + state("a", "ra")
        + " UNION ALL "
        + state("b", "rb")
        + " UNION ALL "
        + state("union", "ru")
    )


def _q_user_trend(sf_dir: str):
    """Per-user value-over-time trend as exact integer regression
    moments (slope = sxy_num/sxx_num; x in hours, y in cents)."""
    import ray.data

    from alp_ray.stages.window import user_trend

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"],
    )
    return user_trend(ev)


_USER_TREND_SQL = (
    "WITH e AS MATERIALIZED (SELECT user_id, "
    "CAST(epoch_us(ts) AS BIGINT) AS tus, "
    "CAST(ROUND(value * 100) AS BIGINT) AS y FROM events), "
    "m AS (SELECT user_id, MIN(tus) AS t0 FROM e GROUP BY user_id), "
    "x AS (SELECT e.user_id, (e.tus - m.t0) // 3600000000 AS x, e.y "
    "FROM e JOIN m ON m.user_id = e.user_id) "
    "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) "
    "AS sxx_num, "
    "CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) "
    "AS sxy_num FROM x GROUP BY user_id"
)


def _q_feature_hashing(sf_dir: str):
    """Hashing-trick featurizer: sparse (doc, bucket, count) rows,
    bucket = polyhash(token) % 64 — zero shuffle, exact twin via the
    nested list_reduce character fold."""
    import ray.data

    from alp_ray.stages.text import feature_hashing_batch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        feature_hashing_batch, batch_format="pyarrow"
    )


def _feature_hashing_sql() -> str:
    from alp_ray.stages.text import FEATURE_HASH_DIM

    return (
        "WITH tok AS MATERIALIZED (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS t FROM documents), "
        "h AS (SELECT doc_id, list_reduce(list_prepend("
        "CAST(0 AS BIGINT), list_transform(regexp_extract_all(t, '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(h, c) -> (h * 1000003 + c) % 2147483647) "
        f"% {FEATURE_HASH_DIM} AS bucket FROM tok) "
        "SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS value "
        "FROM h GROUP BY doc_id, bucket"
    )


def _q_kn_continuation(sf_dir: str):
    """Kneser-Ney continuation counts N1+(·w) + per-word bigram totals
    — the n-gram LM smoothing statistic; block-preaggregated pair
    counts, blake2b word-partitioned fold, all-integer twin."""
    import ray.data

    from alp_ray.stages.text import kn_continuation

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _cast(
        kn_continuation(docs),
        {"w": pa.string(), "continuation": pa.int64(),
         "bigram_total": pa.int64()},
    )


_KN_SQL = (
    "WITH toks AS MATERIALIZED (SELECT doc_id, "
    "string_split(text, ' ') AS t FROM documents), "
    "tok AS MATERIALIZED (SELECT doc_id, unnest(t) AS tok, "
    "generate_subscripts(t, 1) AS i FROM toks), "
    "bg AS (SELECT a.tok AS l, b.tok AS w FROM tok a "
    "JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1) "
    "SELECT w, CAST(COUNT(DISTINCT l) AS BIGINT) AS continuation, "
    "CAST(COUNT(*) AS BIGINT) AS bigram_total FROM bg GROUP BY w"
)


def _q_butterfly_count(sf_dir: str):
    """Butterfly count (bipartite 4-cycles, Sanei-Mehri et al. 2018)
    of the order×part graph: butterflies = Σ over part pairs
    C(#common orders, 2) — co-occurrence codegrees reused verbatim
    (max_group = ∞ is unnecessary here: TPC-H orders hold ≤ 7 parts,
    far under the heavy-basket guard, asserted by the twin match)."""
    import ray

    import ray.data

    from alp_ray.stages.relational import co_occurrence

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    )
    cn = co_occurrence(
        li, group_col="l_orderkey", item_col="l_partkey",
        min_count=2, max_group=100_000,
    )
    total = 0
    for t in ray.get(cn.materialize().to_arrow_refs()):
        if "n_groups" in t.column_names and t.num_rows:
            c = np.asarray(t.column("n_groups"), np.int64)
            total += int((c * (c - 1) // 2).sum())
    return pa.table(
        {"n_butterflies": pa.array([total], pa.int64())}
    )


_BUTTERFLY_SQL = (
    "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
    "l_partkey AS p FROM lineitem), "
    "cn AS (SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM op a JOIN op b ON b.o = a.o AND a.p < b.p GROUP BY u, v) "
    "SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) "
    "AS n_butterflies FROM cn WHERE c >= 2"
)


_ONION_WAVES = 48  # onion peel waves (35 needed at sf0.1; extra waves
                   # are no-ops, onion_layers raises past the unroll)


def _q_onion(sf_dir: str):
    """Onion decomposition (layer = peel wave, core = peel threshold —
    the k-core refinement of Hébert-Dufresne et al. 2016) on the
    symmetrized sparse graph; all-integer state, exact unrolled twin."""
    from alp_ray.pipelines.traversal import onion_layers
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    layer, core, used = onion_layers(engine, max_layers=_ONION_WAVES)
    engine.shutdown()
    assert used <= _ONION_WAVES
    ids = np.flatnonzero(layer > 0)  # every present vertex peels
    return pa.table(
        {
            "vertex": pa.array(ids.astype(np.int64)),
            "layer": pa.array(layer[ids]),
            "core": pa.array(core[ids]),
        }
    )


def _onion_sql(waves: int) -> str:
    """Unrolled onion twin: per wave the alive-alive degree table, the
    k = max(k, min degree) scalar, the ≤-k peel set with its layer
    index, and the survivor set."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        "alive0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM es), ",
        "k0 AS (SELECT CAST(0 AS BIGINT) AS k)",
    ]
    sels = []
    for r in range(1, waves + 1):
        pr = f"alive{r - 1}"
        parts.append(
            f", deg{r} AS MATERIALIZED (SELECT al.v, "
            "COALESCE(d.c, 0) AS c "
            f"FROM {pr} al LEFT JOIN ("
            "SELECT e.src AS v, COUNT(*) AS c FROM es e "
            f"JOIN {pr} x ON x.v = e.src "
            f"JOIN {pr} y ON y.v = e.dst GROUP BY e.src) d "
            "ON d.v = al.v)"
        )
        parts.append(
            f", k{r} AS MATERIALIZED (SELECT GREATEST("
            f"(SELECT k FROM k{r - 1}), "
            f"COALESCE((SELECT MIN(c) FROM deg{r}), "
            f"(SELECT k FROM k{r - 1}))) AS k)"
        )
        parts.append(
            f", lay{r} AS MATERIALIZED (SELECT v, "
            f"CAST({r} AS BIGINT) AS layer, "
            f"(SELECT k FROM k{r}) AS core FROM deg{r} "
            f"WHERE c <= (SELECT k FROM k{r}))"
        )
        parts.append(
            f", alive{r} AS MATERIALIZED (SELECT v FROM {pr} "
            f"WHERE v NOT IN (SELECT v FROM lay{r}))"
        )
        sels.append(f"SELECT v, layer, core FROM lay{r}")
    union = " UNION ALL ".join(sels)
    parts.append(
        f" SELECT v AS vertex, layer, core FROM ({union})"
    )
    return "".join(parts)


def _q_rarity(sf_dir: str):
    """Unigram-rarity (CCNet perplexity-filter analogue, integer
    floor-division proxy): corpus term counts via the partial-combine +
    vocabulary-sized groupby, broadcast once, then one scoring pass."""
    import ray
    import ray.data

    from alp_ray.stages.text import RarityScoreStage, tfidf_terms

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    stats = tfidf_terms(docs).to_pandas()
    assert len(stats) < 5_000_000, "vocabulary exceeds broadcast bound"
    vocab = stats["term"].to_numpy(dtype=object)
    order = np.argsort(vocab)  # python-str order = _ranked_codes order
    ref = ray.put((
        vocab[order],
        stats["tf"].to_numpy()[order].astype(np.int64),
        int(stats["tf"].sum()),
    ))
    return docs.map_batches(
        RarityScoreStage,
        fn_constructor_kwargs={"stats_ref": ref},
        batch_format="pyarrow",
        concurrency=(2, 8),
    )


def _rarity_sql() -> str:
    from alp_ray.stages.text import RARITY_KEEP_MAX

    return (
        "WITH tok AS MATERIALIZED (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "c AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM tok GROUP BY tok), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM tok), "
        "agg AS (SELECT t.doc_id, "
        "CAST(SUM((SELECT N FROM tot) // c.cnt) AS BIGINT) AS rarity, "
        "COUNT(*) AS n_tokens FROM tok t JOIN c ON c.tok = t.tok "
        "GROUP BY t.doc_id) "
        "SELECT doc_id, rarity, n_tokens, "
        "rarity // n_tokens AS mean_rarity, "
        "CAST(CASE WHEN rarity // n_tokens <= "
        f"{RARITY_KEEP_MAX} THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM agg"
    )


def _q_kcore(sf_dir: str):
    from alp_ray.pipelines.traversal import kcore_decomposition
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    engine.compute_out_degrees("outdeg")
    core = kcore_decomposition(engine)
    outdeg = engine.get_state_by_vertex("outdeg")
    engine.shutdown()
    ids = np.flatnonzero(outdeg > 0)  # symmetric graph: present ⇔ deg>0
    return pa.table(
        {"vertex": pa.array(ids.astype(np.int64)),
         "core": pa.array(core[ids])}
    )


def _q_modularity(sf_dir: str):
    """Newman modularity of the CC partition: labels from the engine's
    max-label CC broadcast once, ONE partial-combine map_batches over
    the distinct symmetric edges + one tiny label groupby; m_c/m and
    (d_c/2m)² as the twin-mirrored double expressions."""
    from alp_ray.pipelines.community import modularity_contributions
    from alp_ray.pipelines.components import connected_components
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    ).materialize()
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    connected_components(engine)
    engine.compute_out_degrees("outdeg")
    labels = engine.get_state_by_vertex("label").astype(np.int64)
    outdeg = engine.get_state_by_vertex("outdeg")
    engine.shutdown()
    present = np.flatnonzero(outdeg > 0)
    return modularity_contributions(edges, labels, present)


_MODULARITY_SQL = (
    "WITH es AS MATERIALIZED ("
    f"SELECT src, dst FROM ({_E_SPARSE}) "
    f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    "), verts AS (SELECT DISTINCT src AS v FROM es), "
    "reach AS (WITH RECURSIVE r(v, u) AS ("
    "SELECT v, v FROM verts UNION "
    "SELECT r.v, es.dst FROM r JOIN es ON es.src = r.u) "
    "SELECT * FROM r), "
    "lab AS MATERIALIZED (SELECT v, CAST(MAX(u) AS BIGINT) AS label "
    "FROM reach GROUP BY v), "
    "dsum AS (SELECT la.label, COUNT(*) AS dc FROM es e "
    "JOIN lab la ON la.v = e.src GROUP BY la.label), "
    "within AS (SELECT la.label, COUNT(*) AS mw2 FROM es e "
    "JOIN lab la ON la.v = e.src "
    "JOIN lab lb ON lb.v = e.dst AND lb.label = la.label "
    "GROUP BY la.label), "
    "sizes AS (SELECT label, COUNT(*) AS nv FROM lab GROUP BY label), "
    "m2t AS (SELECT COUNT(*) AS c FROM es) "
    "SELECT s.label AS community, s.nv AS n_vertices, "
    "COALESCE(w.mw2, 0) AS m2_within, d.dc AS deg_sum, "
    "CAST(COALESCE(w.mw2, 0) AS DOUBLE)/CAST(m2t.c AS DOUBLE) - "
    "(CAST(d.dc AS DOUBLE)/CAST(m2t.c AS DOUBLE)) * "
    "(CAST(d.dc AS DOUBLE)/CAST(m2t.c AS DOUBLE)) AS q_contrib "
    "FROM sizes s JOIN dsum d ON d.label = s.label "
    "LEFT JOIN within w ON w.label = s.label CROSS JOIN m2t"
)


_DENSEST_ROUNDS = 10  # BKV peel: ≤5 rounds observed at every sf;
                      # over-unrolled twin rounds are fixpoint no-ops


def _q_densest(sf_dir: str):
    """Densest subgraph (Bahmani-Kumar-Vassilvitskii parallel peel,
    eps=1/2): all-integer deletion test 2·deg·n ≤ 3·m2, best round by
    the identical double density expression on both sides."""
    from alp_ray.pipelines.densest import densest_subgraph
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    engine.compute_out_degrees("outdeg")
    res = densest_subgraph(engine, max_rounds=_DENSEST_ROUNDS)
    rr = engine.get_state_by_vertex("removal_round").astype(np.int64)
    outdeg = engine.get_state_by_vertex("outdeg")
    engine.shutdown()
    assert res.rounds <= _DENSEST_ROUNDS, res.rounds
    ids = np.flatnonzero(outdeg > 0)
    in_densest = (rr[ids] >= res.best_round).astype(np.int64)
    return pa.table(
        {
            "vertex": pa.array(ids.astype(np.int64)),
            "removal_round": pa.array(rr[ids]),
            "in_densest": pa.array(in_densest),
        }
    )


def _densest_sql(K: int) -> str:
    """Twin of _q_densest: K unrolled peel rounds; n counts ALL
    range(MOD_SPARSE) vertices round 1 (the engine's state width),
    output restricted to present (deg>0) vertices like kcore."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"a0 AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_SPARSE}))",
    ]
    for r in range(1, K + 1):
        p = f"a{r - 1}"
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT a.v, "
            "COALESCE(y.c, 0) AS deg, "
            f"(SELECT COUNT(*) FROM es e JOIN {p} s ON s.v = e.src "
            f"JOIN {p} t ON t.v = e.dst) AS m2, "
            f"(SELECT COUNT(*) FROM {p}) AS n "
            f"FROM {p} a LEFT JOIN ("
            "SELECT e.dst AS v, COUNT(*) AS c FROM es e "
            f"JOIN {p} s ON s.v = e.src JOIN {p} t ON t.v = e.dst "
            "GROUP BY e.dst) y ON y.v = a.v)"
            f", a{r} AS MATERIALIZED (SELECT v FROM d{r} "
            "WHERE NOT (2*deg*n <= 3*m2))"
            f", rm{r} AS (SELECT v, CAST({r} AS BIGINT) AS rr "
            f"FROM d{r} WHERE 2*deg*n <= 3*m2)"
        )
    rounds = " UNION ALL ".join(
        f"(SELECT {r} AS r, m2, n FROM d{r} LIMIT 1)"
        for r in range(1, K + 1)
    )
    removal = " UNION ALL ".join(
        f"SELECT * FROM rm{r}" for r in range(1, K + 1)
    )
    parts.append(
        f", rounds AS MATERIALIZED ({rounds})"
        ", best AS MATERIALIZED (SELECT r FROM rounds WHERE n > 0 "
        "ORDER BY CAST(m2 AS DOUBLE)/CAST(2*n AS DOUBLE) DESC, r ASC "
        "LIMIT 1)"
        f", removal AS MATERIALIZED ({removal}) "
        "SELECT pv.v AS vertex, rm.rr AS removal_round, "
        "CAST(CASE WHEN rm.rr >= (SELECT r FROM best) THEN 1 ELSE 0 "
        "END AS BIGINT) AS in_densest "
        "FROM (SELECT DISTINCT dst AS v FROM es) pv "
        "JOIN removal rm ON rm.v = pv.v"
    )
    return "".join(parts)


def _sym_weighted_sparse(sf_dir: str):
    """Symmetrized sparse edge set with the deterministic pair weight
    (src+dst)%10+1 — weight is a function of the unordered pair, so it
    is re-derived after the swap (identical on both directions)."""
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    sym = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )

    def add_w(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        return batch.append_column(
            "weight", pa.array(((s + d) % 10 + 1).astype(np.float64))
        )

    return sym.map_batches(add_w, batch_format="pyarrow")


def _q_labelprop(sf_dir: str):
    """Fixed-K thresholded propagation (the Kamvar update reaches a
    fixpoint, so K ≥ convergence makes extra steps no-ops — the SQL twin
    unrolls the same K steps)."""
    from alp_ray.pipelines.labelprop import label_propagation
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _sym_weighted_sparse(sf_dir), n=MOD_SPARSE, P=4, weighted=True,
        dedupe=True,
    )
    seed_mask = np.zeros(MOD_SPARSE, bool)
    seed_mask[:20] = True
    seed_labels = (np.arange(MOD_SPARSE) % 2).astype(np.float64)
    label_propagation(engine, seed_labels, seed_mask, max_iters=_LP_K)
    f = engine.get_state_by_vertex("f")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_SPARSE, dtype=np.int64)),
            "label": pa.array(f.astype(np.int64)),
        }
    )


def _q_pregel_pagerank(sf_dir: str):
    """Fixed-rounds voteToHalt variant (tolerance=0 disables per-vertex
    halting, so exactly ``_PPR_ROUNDS − 1`` synchronous updates run) —
    matching the unrolled DuckDB twin step for step. Semantics per
    pregel_pagerank.hpp (α=0.15 jump, (plus, 0) combiner, score/outdeg
    broadcast, NO dangling correction — explicitly not Brin-Page)."""
    from alp_ray.pipelines.pregel_algorithms import (
        PregelPageRankData,
        pregel_pagerank,
    )
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    pregel_pagerank(
        engine,
        data=PregelPageRankData(alpha=0.15, tolerance=0.0),
        local_converge=False,
        max_rounds=_PPR_ROUNDS,
    )
    score = engine.get_state_by_vertex("score")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "score": pa.array(_round_half_away(score, 6)),
        }
    )


def _q_conjugate_gradient(sf_dir: str):
    """SPD system A = W_sym + diag(1 + weighted degree), built as a pure
    Dataset pipeline (symmetrize → pair weight → degree aggregate →
    union → one groupby; no driver edge arrays)."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.pipelines.linalg import conjugate_gradient
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    sym = symmetrize(_dense_edges(sf_dir))

    def add_w(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        return batch.append_column(
            "weight", pa.array(((s + d) % 10 + 1).astype(np.float64))
        )

    wsym = sym.map_batches(add_w, batch_format="pyarrow").materialize()
    # Diagonal = 1 (base, every vertex) + weighted degree (from edges);
    # merged with the off-diagonal entries by ONE groupby-sum — no join.
    ar = np.arange(MOD_DENSE, dtype=np.int64)
    base_diag = ray.data.from_arrow(
        pa.table(
            {"src": ar, "dst": ar, "weight": np.ones(MOD_DENSE)}
        )
    )

    def deg_diag(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        return pa.table(
            {
                "src": s,
                "dst": s,
                "weight": batch.column("weight"),
            }
        )

    diag_contrib = wsym.map_batches(deg_diag, batch_format="pyarrow")
    A = (
        wsym.union(base_diag)
        .union(diag_contrib)
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )
    engine = GraphEngine.from_dataset(
        A, n=MOD_DENSE, P=4, weighted=True
    )
    # Deterministic b + FIXED iteration count (tol=0) so the unrolled
    # DuckDB CG twin runs the identical 12 steps.
    b = ((np.arange(MOD_DENSE) % 7) + 1) / 10.0
    x, iters, res = conjugate_gradient(
        engine, b, tol=0.0, max_iters=_CG_K
    )
    engine.shutdown()
    # Gate-robustness invariant: no rounded digit may sit near a .5
    # half-boundary, so the ~1e-10 engine-vs-twin dot-order drift can
    # NEVER flip a ROUND(x, 6) value. Fails loudly (not a silent hash
    # flake) if a new sf ever violates it — rescale b then.
    frac = np.abs(x) * 1e6 % 1.0
    margin = float(np.min(np.abs(frac - 0.5)))
    assert margin > 1e-4, (
        f"CG fixture too close to a rounding half-boundary "
        f"(margin={margin:.2e}); rescale b in _q_conjugate_gradient"
    )
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "x": pa.array(_round_half_away(x, 6)),
        }
    )


_EFFRES_K = 30   # CG steps (residual ≤1e-9 at both gated sfs; the
                 # margin assert fails loudly if a new sf drifts)
_EFFRES_S, _EFFRES_T = 0, 300


def _q_effective_resistance(sf_dir: str):
    """Tikhonov-regularized effective resistance: solve
    (L + I) x = e_s − e_t on the weighted symmetric dense graph with
    K fixed CG steps (spectral sparsification / commute-distance
    primitive; Spielman & Srivastava 2008). Emits the full solution
    vector — r_eff(s,t) = x[s] − x[t]. Every matrix entry is
    integer-valued (off-diag −w, diag 1 + Σw), so the system matches
    the twin exactly; the CG recurrence reuses the gated
    conjugate_gradient engine path unchanged."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.pipelines.linalg import conjugate_gradient
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    sym = symmetrize(_dense_edges(sf_dir))

    def add_neg_w(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        return batch.append_column(
            "weight",
            pa.array((-((s + d) % 10 + 1)).astype(np.float64)),
        )

    wneg = sym.map_batches(add_neg_w, batch_format="pyarrow").materialize()
    ar = np.arange(MOD_DENSE, dtype=np.int64)
    base_diag = ray.data.from_arrow(
        pa.table({"src": ar, "dst": ar, "weight": np.ones(MOD_DENSE)})
    )

    def deg_diag(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        w = np.asarray(batch.column("weight"), np.float64)
        return pa.table(
            {"src": s, "dst": s, "weight": pa.array(-w)}
        )

    diag_contrib = wneg.map_batches(deg_diag, batch_format="pyarrow")
    A = (
        wneg.union(base_diag)
        .union(diag_contrib)
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )
    engine = GraphEngine.from_dataset(A, n=MOD_DENSE, P=4, weighted=True)
    b = np.zeros(MOD_DENSE)
    b[_EFFRES_S], b[_EFFRES_T] = 1.0, -1.0
    x, _iters, _res = conjugate_gradient(
        engine, b, tol=0.0, max_iters=_EFFRES_K
    )
    engine.shutdown()
    _margin_assert(x, 6, "effective_resistance")
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "x": pa.array(_round_half_away(x, 6)),
        }
    )


def _effres_sql(K: int) -> str:
    """Twin: the shared K unrolled CG steps over A = L + I (off-diag
    −w, diag 1 + Σw via the ord-ed list_sum assembly — all entries
    integer-valued so assembly order is exact) with b = e_s − e_t."""
    sym = (
        "SELECT src, dst, "
        "CAST(-((src + dst) % 10 + 1) AS DOUBLE) AS weight "
        f"FROM (SELECT src, dst FROM ({_E_DENSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_DENSE}))"
    )
    parts = [
        f"WITH verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        f"sym AS MATERIALIZED ({sym}), ",
        "A AS MATERIALIZED (SELECT src, dst, "
        "CAST(list_sum(list(weight ORDER BY ord)) AS DOUBLE) AS weight "
        "FROM ("
        "SELECT src, dst, weight, CAST(0 AS BIGINT) AS ord FROM sym "
        "UNION ALL SELECT v AS src, v AS dst, 1.0 AS weight, "
        "CAST(-1 AS BIGINT) AS ord FROM verts "
        "UNION ALL SELECT src, src AS dst, -weight AS weight, "
        "dst AS ord FROM sym"
        ") GROUP BY 1, 2), ",
        "s0 AS MATERIALIZED (SELECT v, 0.0 AS x, "
        f"CASE WHEN v = {_EFFRES_S} THEN 1.0 "
        f"WHEN v = {_EFFRES_T} THEN -1.0 ELSE 0.0 END AS r, "
        f"CASE WHEN v = {_EFFRES_S} THEN 1.0 "
        f"WHEN v = {_EFFRES_T} THEN -1.0 ELSE 0.0 END AS p "
        "FROM verts), ",
        "rr0 AS MATERIALIZED (SELECT list_sum(list(r * r ORDER BY v)) "
        "AS val FROM s0)",
    ]
    parts.extend(_cg_unrolled_steps(K))
    parts.append(f" SELECT v AS vertex, ROUND(x, 6) AS x FROM s{K}")
    return "".join(parts)


def _q_conjugate_gradient_complex(sf_dir: str):
    """CG over a COMPLEX Hermitian-positive-definite system — ≙ the
    reference's complex-domain CG (smoke `conjugate_gradient_complex`,
    tests/smoke/smoketests.sh:224; golden rndHermit256; templates are
    domain-generic per algorithms/conjugate_gradient.hpp:159).

    Physical form: for HPD systems complex CG's α and β are REAL
    scalars, so the complex recurrence decomposes exactly — iterate for
    iterate, bitwise — into real CG on the symmetric 2n×2n embedding
    M = [[Ar, −Ai], [Ai, Ar]], x = (Re; Im). The engine therefore runs
    UNCHANGED on a 2n-vertex graph: vertices [0, n) carry the real
    plane, [n, 2n) the imaginary plane.

    Fixture: H = W + diag(1 + Σ(|Re w| + |Im w|)) with Re w = (u+v)%10+1
    (symmetric) and Im w = ±((u·v)%5+1) (antisymmetric, + for u<v) —
    Hermitian strictly diagonally dominant ⇒ HPD."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.pipelines.linalg import conjugate_gradient
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    n = MOD_DENSE
    sym = symmetrize(_dense_edges(sf_dir))

    def embed(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("src"), np.int64)
        v = np.asarray(batch.column("dst"), np.int64)
        wr = ((u + v) % 10 + 1).astype(np.float64)
        m = ((u * v) % 5 + 1).astype(np.float64)
        wi = np.where(u < v, m, -m)
        src = np.concatenate([u, u + n, u, u + n])
        dst = np.concatenate([v, v + n, v + n, v])
        w = np.concatenate([wr, wr, -wi, wi])
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "weight": pa.array(w),
            }
        )

    def diag_contrib(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("src"), np.int64)
        v = np.asarray(batch.column("dst"), np.int64)
        d = ((u + v) % 10 + 1 + (u * v) % 5 + 1).astype(np.float64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([u, u + n])),
                "dst": pa.array(np.concatenate([u, u + n])),
                "weight": pa.array(np.concatenate([d, d])),
            }
        )

    symm = sym.materialize()
    ar2 = np.arange(2 * n, dtype=np.int64)
    base_diag = ray.data.from_arrow(
        pa.table({"src": ar2, "dst": ar2, "weight": np.ones(2 * n)})
    )
    # Integer-valued weights sum exactly in float64 — the diag groupby
    # order is immaterial (same contract as the real-CG fixture).
    A = (
        symm.map_batches(embed, batch_format="pyarrow")
        .union(base_diag)
        .union(symm.map_batches(diag_contrib, batch_format="pyarrow"))
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )
    engine = GraphEngine.from_dataset(A, n=2 * n, P=4, weighted=True)
    b2 = ((np.arange(2 * n) % 7) + 1) / 10.0
    x, iters, res = conjugate_gradient(
        engine, b2, tol=0.0, max_iters=_CG_K
    )
    engine.shutdown()
    frac = np.abs(x) * 1e6 % 1.0
    margin = float(np.min(np.abs(frac - 0.5)))
    assert margin > 1e-4, (
        f"complex-CG fixture too close to a rounding half-boundary "
        f"(margin={margin:.2e}); rescale b in "
        f"_q_conjugate_gradient_complex"
    )
    return pa.table(
        {
            "vertex": pa.array(np.arange(n, dtype=np.int64)),
            "xr": pa.array(_round_half_away(x[:n], 6)),
            "xi": pa.array(_round_half_away(x[n:], 6)),
        }
    )


def _q_ewise_lambda_matrix(sf_dir: str):
    """Named eWiseLambda over matrix nonzeroes (base/blas2.hpp:440):
    rescale every stored weight by 1/(1 + src % 5)."""
    from alp_ray.stages.graph import ewise_lambda_matrix

    edges = _dense_edges(sf_dir, weighted=True)
    out = ewise_lambda_matrix(
        edges, lambda s, d, w: w / (1 + s % 5)
    )

    def rounded(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "weight": pa.array(
                    _round_half_away(
                        np.asarray(batch.column("weight"), np.float64), 6
                    )
                ),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def _q_hpcg_vcycle(sf_dir: str):
    """One 2-level multigrid V-cycle (8³ → 4³, pre=post=1 smoother
    steps) applied to a deterministic residual — ≙ multi_grid
    (multigrid_v_cycle.hpp:180). sf-independent like the corpus
    queries (the grid is a fixed constant)."""
    from alp_ray.pipelines.hpcg import build_hpcg_levels, shutdown, v_cycle

    s = _HPCG_FINE
    levels = build_hpcg_levels((s, s, s), levels=2, P=4)
    n = levels[0].n
    r = ((np.arange(n) % 9) + 1) / 10.0
    levels[0].engine.set_state_by_vertex("r", r)
    v_cycle(levels, 0, 1, 1)
    z = levels[0].engine.get_state_by_vertex("z")
    shutdown(levels)
    return pa.table(
        {
            "vertex": pa.array(np.arange(n, dtype=np.int64)),
            "z": pa.array(_round_half_away(z, 6)),
        }
    )


def _q_hpcg_pcg(sf_dir: str):
    """Preconditioned CG with one V-cycle per iteration, fixed
    _HPCG_PCG_K iterations (tol=0) — ≙ hpcg (hpcg.hpp:97)."""
    from alp_ray.pipelines.hpcg import build_hpcg_levels, hpcg, shutdown

    s = _HPCG_FINE
    levels = build_hpcg_levels((s, s, s), levels=2, P=4)
    n = levels[0].n
    b = ((np.arange(n) % 7) + 1) / 10.0
    x, iters, rel = hpcg(levels, b, max_iters=_HPCG_PCG_K, tol=0.0)
    shutdown(levels)
    assert iters == _HPCG_PCG_K
    return pa.table(
        {
            "vertex": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(_round_half_away(x, 6)),
        }
    )


# Corpus twin inputs: the driver's DuckDB connection only has the ten
# standard views, so the corpus oracles read the SAME synthetic corpus
# from a parquet file written here (driver-side, pure function — row-
# identical to synth_corpus; see corpus_table). 64 PageRank supersteps
# = the applied count at conv=1e-6 with sync_every=8 (57 to converge,
# chunked to the next multiple of 8) — a constant: the 6×40/seed-42
# corpus is sf-independent and the engine is bitwise build-order
# deterministic.
_CORPUS_SHAPE = (6, 40, 42)  # (n_repos, files_per_repo, seed)
_CORPUS_PR_K = 64
_CORPUS_CC_K = 16  # min-label fixpoint (4 rounds needed; idempotent)


def _corpus_oracle_parquet() -> str:
    import os
    import tempfile

    import pyarrow.parquet as pq

    from alp_ray.sources.corpus import corpus_table

    nr, fpr, seed = _CORPUS_SHAPE
    path = f"/tmp/alp_ray_oracle_corpus_{nr}x{fpr}_s{seed}.parquet"
    if not os.path.exists(path):
        fd, tmp = tempfile.mkstemp(dir="/tmp", suffix=".parquet")
        os.close(fd)
        pq.write_table(corpus_table(nr, fpr, seed), tmp)
        os.replace(tmp, path)  # atomic: oracle/query may race
    return path


def _corpus_names() -> dict[int, tuple[str, str]]:
    """stable hash id → (repo, path) for every corpus file (240 rows,
    driver-side — presentation-only; the pipelines run on hash ids)."""
    from alp_ray.sources.corpus import corpus_table
    from alp_ray.stages.extract import _stable_id

    nr, fpr, seed = _CORPUS_SHAPE
    t = corpus_table(nr, fpr, seed)
    return {
        _stable_id(r, p): (r, p)
        for r, p in zip(
            t.column("repo").to_pylist(), t.column("path").to_pylist()
        )
    }


def _q_corpus_extract(sf_dir: str):
    from alp_ray.pipelines.code_graph import corpus_to_edges
    from alp_ray.sources.corpus import synth_corpus

    nr, fpr, seed = _CORPUS_SHAPE
    corpus = synth_corpus(n_repos=nr, files_per_repo=fpr, seed=seed)
    return corpus_to_edges(corpus).select_columns(
        ["repo", "src_path", "dst_path"]
    )


def _q_corpus_lang_mixing(sf_dir: str):
    """Language mixing matrix of the corpus import graph: edge counts
    by (source-file language, target-file language) — the assortative
    structure of cross-language imports. Per-block partials, ≤|langs|²
    driver fold, zero shuffle."""
    import ray

    from alp_ray.pipelines.code_graph import corpus_to_edges
    from alp_ray.sources.corpus import synth_corpus

    nr, fpr, seed = _CORPUS_SHAPE
    corpus = synth_corpus(n_repos=nr, files_per_repo=fpr, seed=seed)
    edges = corpus_to_edges(corpus).select_columns(
        ["src_path", "dst_path"]
    )

    def _lang(arr) -> np.ndarray:
        import pyarrow.compute as pc

        out = np.full(len(arr), "other", dtype=object)
        for ext, name in ((".py", "py"), (".c", "c"), (".js", "js")):
            m = np.asarray(pc.ends_with(arr, pattern=ext))
            out[m] = name
        return out

    def partial(batch: pa.Table) -> pa.Table:
        if "src_path" not in batch.column_names or batch.num_rows == 0:
            return pa.table({
                "lang_src": pa.array([], pa.string()),
                "lang_dst": pa.array([], pa.string()),
                "n_edges": pa.array([], pa.int64()),
            })
        ls = _lang(batch.column("src_path"))
        ld = _lang(batch.column("dst_path"))
        key = np.char.add(np.char.add(ls.astype(str), "|"),
                          ld.astype(str))
        uniq, cnt = np.unique(key, return_counts=True)
        pairs = [k.split("|", 1) for k in uniq]
        return pa.table({
            "lang_src": pa.array([p[0] for p in pairs], pa.string()),
            "lang_dst": pa.array([p[1] for p in pairs], pa.string()),
            "n_edges": pa.array(cnt.astype(np.int64)),
        })

    agg: dict[tuple[str, str], int] = {}
    for t in ray.get(
        edges.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if "lang_src" not in t.column_names or t.num_rows == 0:
            continue
        for a, b, c in zip(
            t.column("lang_src").to_pylist(),
            t.column("lang_dst").to_pylist(),
            t.column("n_edges").to_pylist(),
        ):
            agg[(a, b)] = agg.get((a, b), 0) + int(c)
    rows = sorted(agg.items())
    return pa.table({
        "lang_src": pa.array([r[0][0] for r in rows], pa.string()),
        "lang_dst": pa.array([r[0][1] for r in rows], pa.string()),
        "n_edges": pa.array([r[1] for r in rows], pa.int64()),
    })


def _corpus_lang_mixing_sql() -> str:
    lang = (
        "CASE WHEN {c} LIKE '%.py' THEN 'py' "
        "WHEN {c} LIKE '%.c' THEN 'c' "
        "WHEN {c} LIKE '%.js' THEN 'js' ELSE 'other' END"
    )
    return (
        f"WITH {_corpus_edges_cte()} "
        f"SELECT {lang.format(c='src_path')} AS lang_src, "
        f"{lang.format(c='dst_path')} AS lang_dst, "
        "CAST(COUNT(*) AS BIGINT) AS n_edges FROM e GROUP BY 1, 2"
    )


def _q_corpus_pagerank(sf_dir: str):
    from alp_ray.pipelines.code_graph import corpus_pagerank
    from alp_ray.sources.corpus import synth_corpus

    nr, fpr, seed = _CORPUS_SHAPE
    corpus = synth_corpus(n_repos=nr, files_per_repo=fpr, seed=seed)
    table, res = corpus_pagerank(corpus, P=4)
    assert res.applied_iterations == _CORPUS_PR_K, res
    names = _corpus_names()
    ids = table.column("vertex").to_pylist()
    pr = _round_half_away(
        np.asarray(table.column("pr"), np.float64), 7
    )
    return pa.table(
        {
            "repo": pa.array([names[i][0] for i in ids], pa.string()),
            "path": pa.array([names[i][1] for i in ids], pa.string()),
            "pr": pa.array(pr),
        }
    )


def _q_corpus_components(sf_dir: str):
    from alp_ray.pipelines.code_graph import corpus_components
    from alp_ray.sources.corpus import synth_corpus

    nr, fpr, seed = _CORPUS_SHAPE
    corpus = synth_corpus(n_repos=nr, files_per_repo=fpr, seed=seed)
    tbl = corpus_components(corpus, P=4)
    # Canonicalize the representative to the component's minimum
    # "repo:path" string (the engine's min-HASH-id rep is opaque to
    # SQL): a 212-row presentation step on the collected result.
    names = _corpus_names()
    vs = tbl.column("vertex").to_pylist()
    cs = tbl.column("component").to_pylist()
    member = np.array([f"{names[v][0]}:{names[v][1]}" for v in vs])
    comp = np.array([str(c) for c in cs])
    rep: dict[str, str] = {}
    for c, m in zip(comp, member):
        if c not in rep or m < rep[c]:
            rep[c] = m
    return pa.table(
        {
            "repo": pa.array([names[v][0] for v in vs], pa.string()),
            "path": pa.array([names[v][1] for v in vs], pa.string()),
            "component": pa.array(
                [rep[c] for c in comp], pa.string()
            ),
        }
    )


def _q_dedup_exact(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.dedup import exact_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return _cast(
        exact_dedup(docs), {"h": pa.string(), "keep_id": pa.int64()}
    )


def _q_token_counts(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import TokenCountStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = docs.map_batches(
        TokenCountStage, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "n_tokens", "n_subwords"])
    return _cast(
        out,
        {"doc_id": pa.int64(), "n_tokens": pa.int64(),
         "n_subwords": pa.int64()},
    )


def _q_tfidf_terms(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import tfidf_terms

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    n_docs = docs.count()
    from alp_ray.util import concat_blocks

    tab = concat_blocks(
        tfidf_terms(docs),
        columns={
            "term": pa.string(), "tf": pa.int64(), "df": pa.int64(),
        },
    )
    tf = np.asarray(tab.column("tf"), np.float64)
    df = np.asarray(tab.column("df"), np.float64)
    tfidf = _round_half_away(tf * np.log(float(n_docs) / df), 6)
    return pa.table({
        "term": tab.column("term"),
        "tf": tab.column("tf"),
        "df": tab.column("df"),
        "tfidf": pa.array(tfidf),
    }).cast(pa.schema([
        ("term", pa.string()), ("tf", pa.int64()),
        ("df", pa.int64()), ("tfidf", pa.float64()),
    ]))


def _q_tfidf_top_term(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import TfidfTopTermStage, tfidf_terms

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    n_docs = docs.count()
    # Vocabulary-sized df table → broadcast once (small-side lookup).
    from alp_ray.util import concat_blocks

    stats = concat_blocks(
        tfidf_terms(docs),
        columns={
            "term": pa.string(), "tf": pa.int64(), "df": pa.int64(),
        },
    )
    vocab = np.asarray(stats.column("term"), dtype=object)
    dfv = np.asarray(stats.column("df"), np.int64)
    order = np.argsort(vocab, kind="stable")
    ref = ray.put((vocab[order], dfv[order]))
    out = docs.map_batches(
        TfidfTopTermStage,
        fn_constructor_args=(ref, n_docs),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return _cast(out, {
        "doc_id": pa.int64(), "term": pa.string(),
        "tfidf": pa.float64(),
    })


def _q_bigram_counts(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import bigram_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return _cast(
        bigram_counts(docs),
        {"bigram": pa.string(), "cnt": pa.int64()},
    )


def _q_doc_stats(sf_dir: str):
    import pyarrow.compute as pc

    import ray.data

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "n_words": pc.count_substring_regex(
                    text, "[A-Za-z]+"
                ).cast(pa.int64()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def _q_window_hourly(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    width_us = 3600 * 1_000_000

    def key(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column("ts").cast(pa.int64()))
        w = (ts // width_us) * width_us
        return pa.table(
            {
                "window_start_us": pa.array(w),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )

    out = (
        ev.map_batches(key, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(
            Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
        )
    )

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": batch.column("window_start_us")
                .cast(pa.int64()),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pa.array(
                    _round_half_away(
                        np.asarray(
                            batch.column("sum_value"), dtype=np.float64
                        ),
                        6,
                    )
                ),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def _q_json_extract(sf_dir: str):
    import pyarrow.compute as pc

    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "props"]
    )

    def extract(batch: pa.Table) -> pa.Table:
        # props is a JSON object like {"k": 87}: extract k as BIGINT.
        ks = pc.extract_regex(
            batch.column("props"), r'"k":\s*(?P<k>-?\d+)'
        )
        kvals = pc.struct_field(ks, "k")
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "k": pc.cast(kvals, pa.int64()),
            }
        )

    return ev.map_batches(extract, batch_format="pyarrow")


def _q_multimodal(sf_dir: str):
    import ray.data

    from alp_ray.stages.multimodal import DecodeImageStage, synth_media

    media = ray.data.from_arrow(synth_media(96, seed=42))
    return media.filter(expr="kind == 'image'").map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=16,
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["media_id", "channel_means"])


def _q_approx_distinct(sf_dir: str):
    """HLL cardinality sketch over the documents (rows-only: the
    estimate is implementation-defined; accuracy vs exact distinct is
    pinned by pytest to <5%)."""
    import ray.data

    from alp_ray.stages.sketch import approx_distinct

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    est = approx_distinct(docs, "text", p=12)
    return pa.table({"estimate": pa.array([round(est, 2)], pa.float64())})


def _q_multimodal_audio(sf_dir: str):
    import ray.data

    from alp_ray.stages.multimodal import AudioFeatureStage, synth_media

    media = ray.data.from_arrow(synth_media(96, seed=42))
    return media.filter(expr="kind == 'audio'").map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=16,
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["media_id", "frame_energy"])


def _q_multimodal_frames(sf_dir: str):
    import ray.data

    from alp_ray.stages.multimodal import FrameSampleStage, synth_media

    media = ray.data.from_arrow(synth_media(96, seed=42))
    return media.filter(expr="kind == 'video'").map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(fake=True),
        batch_size=8,
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).select_columns(["media_id", "frame_index"])


def _q_ann_ivf(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.ann import build_ivf, ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    C, bucketed = build_ivf(emb, n_centroids=8)
    bucketed = bucketed.materialize()
    q = np.asarray(
        emb.filter(expr="vec_id == 0").take(1)[0]["embedding"],
        dtype=np.float64,
    )
    t = ivf_topk(bucketed, C, q, k=10, nprobe=4)
    return pa.table(
        {
            "vec_id": t.column("vec_id"),
            "cosine": pa.array(
                _round_half_away(np.asarray(t.column("cosine")), 6)
            ),
        }
    )


def _q_ann_ivf_recall(sf_dir: str):
    """Quantifies the IVF index's approximate contract: recall@10 of
    ivf_topk (8 centroids, nprobe=4) against brute-force cosine top-10
    for the standard query point. Deliberately rows-only: the operator
    is approximate by design (it provably misses exact neighbors), so
    the honest oracle is a measured recall, not an exact twin."""
    import ray.data

    from alp_ray.pipelines.ann import build_ivf, cosine_topk, ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.asarray(
        emb.filter(expr="vec_id == 0").take(1)[0]["embedding"],
        dtype=np.float64,
    )
    exact = set(
        np.asarray(
            cosine_topk(emb, q, k=10).column("vec_id")
        ).tolist()
    )
    C, bucketed = build_ivf(emb, n_centroids=8)
    approx = set(
        np.asarray(
            ivf_topk(
                bucketed.materialize(), C, q, k=10, nprobe=4
            ).column("vec_id")
        ).tolist()
    )
    return pa.table(
        {
            "k": pa.array([10], pa.int64()),
            "nprobe": pa.array([4], pa.int64()),
            "recall": pa.array(
                [len(exact & approx) / 10.0], pa.float64()
            ),
        }
    )


def _q_partitioned_sink(sf_dir: str):
    """Resumable-output round-trip (north rule: partitioned parquet,
    one directory per key range, _SUCCESS markers): token counts →
    write_partitioned by doc_id → read_partitioned (marker-pruned
    paths) → rows. Hash-compared against the plain token-count twin,
    proving the sink is lossless and duplicate-free."""
    import tempfile

    import ray.data

    from alp_ray.sources.sink import read_partitioned, write_partitioned
    from alp_ray.stages.text import TokenCountStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = docs.map_batches(
        TokenCountStage, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "n_tokens"])
    root = tempfile.mkdtemp(prefix="alp_sink_")
    write_partitioned(out, root, "doc_id", n_parts=8)
    back = read_partitioned(root)
    return _cast(
        back.select_columns(["doc_id", "n_tokens"]),
        {"doc_id": pa.int64(), "n_tokens": pa.int64()},
    )


def _q_community_lpa(sf_dir: str):
    from alp_ray.pipelines.labelprop import community_lpa
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_DENSE, sparse=True), dedup=False
    )
    labels = community_lpa(edges, n=MOD_DENSE, max_iters=5)
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "community": pa.array(labels),
        }
    )


def _q_sessions(sf_dir: str):
    import ray.data

    from alp_ray.stages.window import sessionize

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    out = sessionize(ev, gap_s=1800).select_columns(
        ["user_id", "session_id", "n_events"]
    )
    return _cast(
        out,
        {"user_id": pa.int64(), "session_id": pa.int64(),
         "n_events": pa.int64()},
    )


def _q_inverted_index(sf_dir: str):
    """Inverted-index build over documents: (term, df, ascending
    posting list); terms with df > 400 keep exact df, empty postings
    (stopword guard)."""
    import ray.data

    from alp_ray.stages.text import inverted_index

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return inverted_index(docs, max_postings=400)


def _q_global_rank(sf_dir: str):
    """Distributed global ROW_NUMBER over (value, event_id): one range
    sort + per-block offsets — Ray Data's missing rank operator."""
    import ray.data

    from alp_ray.stages.relational import global_rank

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return global_rank(ev, by="value", id_col="event_id")


def _urgent_custkeys(sf_dir: str):
    import pyarrow.compute as pc

    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table({
            "o_custkey": b.column("o_custkey").cast(pa.int64())
        }).filter(
            pc.equal(b.column("o_orderpriority"), "1-URGENT")
        ),
        batch_format="pyarrow",
    )


def _q_anti_join(sf_dir: str):
    """Customers with NO urgent order (distributed anti join — both
    sides large, no broadcast assumption)."""
    import ray.data

    from alp_ray.stages.relational import semi_anti_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return semi_anti_join(
        cust, _urgent_custkeys(sf_dir), "c_custkey", "o_custkey",
        anti=True,
    )


def _q_semi_join(sf_dir: str):
    """Customers with at least one urgent order (distributed semi
    join)."""
    import ray.data

    from alp_ray.stages.relational import semi_anti_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return semi_anti_join(
        cust, _urgent_custkeys(sf_dir), "c_custkey", "o_custkey",
        anti=False,
    )


def _q_rolling_window(sf_dir: str):
    """Per-user moving 5-event value sum (ROWS 4 PRECEDING), exact
    integer cents."""
    import ray.data

    from alp_ray.stages.window import rolling_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return rolling_sum(ev, window=5)


def _q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): counts + exact
    cents totals at every prefix level in one pass (suppressed keys
    become '')."""
    import ray.data

    from alp_ray.stages.relational import rollup_aggregate

    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    return rollup_aggregate(
        od, keys=("o_orderpriority", "o_orderstatus"),
        value_col="o_totalprice",
    )


def _q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all four grouping
    subsets in one pass; grouping_id = bitmask of suppressed keys."""
    import ray.data

    from alp_ray.stages.relational import cube_aggregate

    od = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    return cube_aggregate(
        od, keys=("o_orderpriority", "o_orderstatus"),
        value_col="o_totalprice",
    )


def _q_pca_embeddings(sf_dir: str):
    """Distributed 2-component PCA over the embedding column (two-pass
    covariance partials + broadcast projection). No SQL twin
    (eigendecomposition) — NumPy-oracled in tests/test_linalg.py."""
    import ray.data

    from alp_ray.pipelines.linalg import pca

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out, _ = pca(emb, k=2)
    return out


def _q_grouped_mode(sf_dir: str):
    """Per-user most frequent event type (deterministic tiebreak:
    lexicographically smallest token)."""
    import ray.data

    from alp_ray.stages.relational import grouped_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return grouped_mode(ev, key="user_id", token_col="event_type")


def _q_cohort_retention(sf_dir: str):
    """Weekly cohort retention triangle (k=0 rows are cohort sizes)."""
    import ray.data

    from alp_ray.stages.window import cohort_retention

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return cohort_retention(ev, period_s=7 * 86400, max_k=4)


def _q_funnel(sf_dir: str):
    """view → click → purchase conversion funnel per user (stage k+1
    strictly after the earliest qualifying stage-k event)."""
    import ray.data

    from alp_ray.stages.window import funnel

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    return funnel(ev, stages=("view", "click", "purchase"))


def _q_first_last_touch(sf_dir: str):
    """First-/last-touch attribution per user (argmin/argmax by
    (ts, event_id))."""
    import ray.data

    from alp_ray.stages.window import first_last_touch

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return first_last_touch(ev)


def _q_user_sequences(sf_dir: str):
    """Per-user event-type sequence in (ts, event_id) order — the
    behavior-sequence extraction for sequence-model training."""
    import ray.data

    from alp_ray.stages.window import keyed_sequence

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return keyed_sequence(ev)


_CMS_WIDTH = 1024


def _q_cms_counts(sf_dir: str):
    """Count-min sketch over lineitem part keys + point-query readback
    per distinct key (est ≥ true by construction); pure-BIGINT hash
    rows so the twin replays every counter exactly."""
    import ray.data

    from alp_ray.stages.sketch import cms_counts

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    )
    return cms_counts(li, key_col="l_partkey", width=_CMS_WIDTH)


def _cms_sql(width: int) -> str:
    from alp_ray.stages.sketch import CMS_P, CMS_ROWS

    rows = ", ".join(
        f"c{j} AS MATERIALIZED (SELECT ((k * {a} + {b}) % {CMS_P}) "
        f"% {width} AS b, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM keys GROUP BY b)"
        for j, (a, b) in enumerate(CMS_ROWS)
    )
    joins = " ".join(
        f"JOIN c{j} e{j} ON e{j}.b = "
        f"((cnt.k * {a} + {b}) % {CMS_P}) % {width}"
        for j, (a, b) in enumerate(CMS_ROWS)
    )
    least = "LEAST(" + ", ".join(
        f"e{j}.c" for j in range(len(CMS_ROWS))
    ) + ")"
    return (
        "WITH keys AS MATERIALIZED (SELECT l_partkey AS k "
        "FROM lineitem), "
        "cnt AS MATERIALIZED (SELECT k, CAST(COUNT(*) AS BIGINT) AS "
        f"true_cnt FROM keys GROUP BY k), {rows} "
        f"SELECT cnt.k AS l_partkey, {least} AS est, cnt.true_cnt "
        f"FROM cnt {joins}"
    )


def _q_rare_term_pairs(sf_dir: str):
    """Entity-resolution blocking pairs: docs sharing a rare term
    (df ≤ max(16, N//8)), integer min-tf · (N//df) overlap score."""
    import ray.data

    from alp_ray.stages.text import rare_term_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _cast(
        rare_term_pairs(docs),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "sim": pa.int64()},
    )


_RARE_TERM_PAIRS_SQL = (
    "WITH nd AS (SELECT GREATEST(16, COUNT(DISTINCT doc_id) // 8) "
    "AS cap, COUNT(DISTINCT doc_id) AS n FROM documents), "
    "tok AS MATERIALIZED (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS tok FROM documents), "
    "tf AS MATERIALIZED (SELECT doc_id, tok, "
    "CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, tok), "
    "df AS MATERIALIZED (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df "
    "FROM tf GROUP BY tok), "
    "rare AS (SELECT tok, df FROM df "
    "WHERE df <= (SELECT cap FROM nd)) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(SUM(LEAST(a.tf, b.tf) * ((SELECT n FROM nd) // r.df)) "
    "AS BIGINT) AS sim "
    "FROM tf a JOIN tf b ON b.tok = a.tok AND b.doc_id > a.doc_id "
    "JOIN rare r ON r.tok = a.tok "
    "GROUP BY doc_a, doc_b"
)


def _q_lang_vocab_overlap(sf_dir: str):
    """Cross-language vocabulary Jaccard (corpus contamination / shared
    token diagnostic): distinct (lang, term) partials per block, one
    bounded driver dedup (vocab × langs rows — loud fail above 5M),
    integer floor-division Jaccard percentage. Pairs with an empty
    intersection are omitted on both sides."""
    import ray
    import ray.data

    from alp_ray.stages.text import _doc_tokens

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        values, doc_idx = _doc_tokens(batch, "text")
        langs = np.asarray(batch.column("lang"), dtype=object)[doc_idx]
        terms = np.asarray(values, dtype=object)
        key = np.char.add(
            np.char.add(langs.astype(str), "\x00"), terms.astype(str)
        )
        _, idx = np.unique(key, return_index=True)
        return pa.table({
            "lang": pa.array(list(langs[idx]), pa.string()),
            "term": pa.array(list(terms[idx]), pa.string()),
        })

    parts = [
        t
        for t in ray.get(
            docs.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if "lang" in t.column_names and t.num_rows
    ]
    lt = pa.concat_tables(parts).to_pandas().drop_duplicates()
    assert len(lt) < 5_000_000, "lang×vocab exceeds driver bound"
    vocab = {
        lang: set(g["term"]) for lang, g in lt.groupby("lang")
    }
    langs = sorted(vocab)
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1:]:
            inter = len(vocab[la] & vocab[lb])
            if inter == 0:
                continue
            uni = len(vocab[la] | vocab[lb])
            rows.append((la, lb, inter, uni, (100 * inter) // uni))
    return pa.table({
        "lang_a": pa.array([r[0] for r in rows], pa.string()),
        "lang_b": pa.array([r[1] for r in rows], pa.string()),
        "inter": pa.array([r[2] for r in rows], pa.int64()),
        "uni": pa.array([r[3] for r in rows], pa.int64()),
        "jacc_pct": pa.array([r[4] for r in rows], pa.int64()),
    })


_LANG_VOCAB_SQL = (
    "WITH lt AS MATERIALIZED (SELECT DISTINCT lang, tok FROM ("
    "SELECT lang, unnest(string_split(text, ' ')) AS tok "
    "FROM documents)), "
    "pairs AS (SELECT a.lang AS lang_a, b.lang AS lang_b, "
    "CAST(COUNT(*) AS BIGINT) AS inter FROM lt a "
    "JOIN lt b ON b.tok = a.tok AND a.lang < b.lang "
    "GROUP BY lang_a, lang_b), "
    "sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM lt "
    "GROUP BY lang) "
    "SELECT p.lang_a, p.lang_b, p.inter, "
    "sa.c + sb.c - p.inter AS uni, "
    "(100 * p.inter) // (sa.c + sb.c - p.inter) AS jacc_pct "
    "FROM pairs p JOIN sz sa ON sa.lang = p.lang_a "
    "JOIN sz sb ON sb.lang = p.lang_b"
)


def _q_event_transitions(sf_dir: str):
    """Markov next-event transition counts over per-user sequences —
    coarse user-hash partitions, in-kernel pair counting, tiny driver
    fold; LEAD() twin."""
    import ray.data

    from alp_ray.stages.window import transition_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return transition_counts(ev)


_EVENT_TRANSITIONS_SQL = (
    "WITH o AS (SELECT user_id, event_type, "
    "LEAD(event_type) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS nxt FROM events) "
    "SELECT event_type AS from_type, nxt AS to_type, "
    "CAST(COUNT(*) AS BIGINT) AS cnt FROM o WHERE nxt IS NOT NULL "
    "GROUP BY from_type, to_type"
)


def _q_zscore_outliers(sf_dir: str):
    """Per-user z-score outlier events (|z| > 2): exact integer-cents
    moments broadcast back to a scoring pass."""
    import ray.data

    from alp_ray.stages.relational import zscore_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "value"],
    )
    return zscore_outliers(
        ev, key="user_id", value_col="value", id_col="event_id",
    )


def _q_grouped_median(sf_dir: str):
    """Exact per-user median event value (keyed exact quantile)."""
    import ray.data

    from alp_ray.stages.relational import grouped_median

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    return grouped_median(ev, key="user_id", value_col="value")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_pivot_events(sf_dir: str):
    """Pivot event_type into per-user count + exact cents-sum columns
    (conditional-aggregation spread; partials combine in-batch)."""
    import ray.data

    from alp_ray.stages.relational import pivot_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )
    return pivot_counts(
        ev, key="user_id", pivot_col="event_type",
        categories=_EVENT_TYPES, value_col="value",
    )


_BM25_TERMS = ("dup", "vector", "hash")


def _q_bm25(sf_dir: str):
    """BM25 keyword scoring (k1=1.2, b=0.75, Robertson idf+1) for a
    3-term query; all docs matching ≥1 term."""
    import ray.data

    from alp_ray.stages.text import bm25_scores

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_scores(docs, list(_BM25_TERMS))


def _q_sequence_pack(sf_dir: str):
    """Concat-and-chunk pretraining sequence assignment: token stream
    in doc_id order cut into 256-token sequences; per doc its token
    count and first/last sequence index."""
    import ray.data

    from alp_ray.stages.text import sequence_pack

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return sequence_pack(docs, seq_len=256)


def _q_chunk_manifest(sf_dir: str):
    """Per-(doc, sequence) loader manifest for the 256-token
    concat-and-chunk layout: the within-document token span each
    training sequence takes. All-integer expansion of sequence_pack."""
    import ray.data

    from alp_ray.stages.text import chunk_manifest

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_manifest(docs, seq_len=256)


_CHUNK_MANIFEST_SQL = (
    "WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) "
    "AS BIGINT) AS n FROM documents), "
    "c AS (SELECT doc_id, n, CAST(COALESCE(SUM(n) OVER ("
    "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "1 PRECEDING), 0) AS BIGINT) AS bef FROM t), "
    "x AS (SELECT doc_id, n, bef, unnest(range(bef // 256, "
    "(bef + n - 1) // 256 + 1)) AS chunk_id FROM c) "
    "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
    "GREATEST(0, chunk_id * 256 - bef) AS tok_start, "
    "LEAST(n, (chunk_id + 1) * 256 - bef) AS tok_end FROM x"
)


def _q_copurchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: item pairs bought together in ≥2
    orders, weighted by order count (bipartite projection of the
    order-part graph). Whole orders co-locate by hash; pairs are
    pre-aggregated per partition before the one (a,b)-keyed sum."""
    import ray.data

    from alp_ray.stages.relational import co_occurrence

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return co_occurrence(li, min_count=2)


def _q_running_window(sf_dir: str):
    """Per-user ordered window functions (ROW_NUMBER / running SUM /
    LAG gap) — integer-exact: running sums in cents, gaps in µs."""
    import ray.data

    from alp_ray.stages.window import keyed_running

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return keyed_running(ev)


def _q_ann_top10(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.ann import cosine_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    t = cosine_topk(emb, np.asarray(q, dtype=np.float64), k=10)
    return pa.table(
        {
            "vec_id": t.column("vec_id"),
            "cosine": pa.array(
                _round_half_away(np.asarray(t.column("cosine")), 6)
            ),
        }
    )


def _q_norm2(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.ann import norm2

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return pa.table(
        {"norm2": pa.array([round(norm2(emb), 6)], pa.float64())}
    )


def _q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs — since round 5 this windowed row
    runs the SQL-expressible polynomial-hash family (hash-exact twin,
    proven at both sfs as q `minhash_poly_pairs` in round 4) so the
    driver's hard-signal window carries a full oracle instead of
    `no_oracle`.  Identical band-bucket first-match-band physical
    plan; the seeded blake2b production default stays available as
    `minhash_seeded_pairs` (appended after the window)."""
    import ray.data

    from alp_ray.pipelines.dedup import minhash_poly_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_poly_pairs(docs, max_bucket=10**9)


def _q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs — since round 5 this windowed row runs
    the 31-bit polynomial word-fingerprint family (hash-exact twin,
    proven at both sfs as q `simhash_poly_pairs` in round 4).  Same
    pigeonhole 4-band bucketing + first-match-band emission; the
    seeded blake2b production default stays available as
    `simhash_seeded_pairs` (appended after the window)."""
    import ray.data

    from alp_ray.pipelines.dedup import simhash_poly_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_poly_pairs(docs)


def _q_minhash_seeded_pairs(sf_dir: str):
    """Production blake2b-seeded MinHash-LSH variant (rows-only: the
    seeded permutation family is not SQL-expressible).  This was the
    windowed `minhash_pairs` implementation through round 4."""
    import ray.data

    from alp_ray.pipelines.dedup import minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs)


def _q_simhash_seeded_pairs(sf_dir: str):
    """Production blake2b-seeded SimHash variant (rows-only).  This
    was the windowed `simhash_pairs` implementation through round 4."""
    import ray.data

    from alp_ray.pipelines.dedup import simhash_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs)


def _q_simhash_poly_pairs(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3) over the 31-bit polynomial
    word-fingerprint family — HASH-EXACT twin (pure BIGINT bit
    arithmetic both sides); the Ray plan keeps the pigeonhole 4-band
    bucketing + first-match-band emission of simhash_pairs."""
    import ray.data

    from alp_ray.pipelines.dedup import simhash_poly_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_poly_pairs(docs)


def _q_length_buckets(sf_dir: str):
    """Length-bucketed batch assignment (pad-efficiency batching, the
    counterpart of sequence_pack's concat-and-chunk): bucket =
    #boundaries ≤ n_tokens, batch = within-bucket doc_id-ordered
    ROW_NUMBER // 8 — all-integer, one range sort + O(#blocks)
    offsets, no join."""
    import ray.data

    from alp_ray.stages.text import length_bucket_batches

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return length_bucket_batches(docs)


def _q_ann_pq_recall(sf_dir: str):
    """Product-quantization ADC search quality: recall@10 of PQ codes
    (16 subspaces × 64 centroids = 96-bit codes, ~10× the float32
    storage) vs brute-force L2 top-10 for the standard query. Rows-only like
    ann_ivf_recall: PQ is approximate BY DESIGN, so the honest oracle
    is the measured recall, asserted ≥ 0.5 in-query (fails loudly if
    quantization ever degenerates)."""
    import ray.data

    from alp_ray.pipelines.ann import (
        _as_matrix, pq_encode, pq_topk, pq_train,
    )

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    q = np.asarray(
        emb.filter(expr="vec_id == 0").take(1)[0]["embedding"],
        dtype=np.float64,
    )

    def l2_part(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), np.int64)
        V = _as_matrix(batch.column("embedding"))
        d = ((V - q[None, :]) ** 2).sum(axis=1)
        top = np.lexsort((ids, d))[:10]
        return pa.table(
            {"vec_id": pa.array(ids[top]), "d": pa.array(d[top])}
        )

    parts = emb.map_batches(
        l2_part, batch_format="pyarrow"
    ).take_all()
    ids = np.array([r["vec_id"] for r in parts], np.int64)
    dd = np.array([r["d"] for r in parts])
    exact = set(ids[np.lexsort((ids, dd))[:10]].tolist())

    books = pq_train(emb, m_sub=16, k=64)
    codes = pq_encode(emb, books).materialize()
    approx = set(
        np.asarray(
            pq_topk(codes, books, q, k=10).column("vec_id")
        ).tolist()
    )
    recall = len(exact & approx) / 10.0
    assert recall >= 0.5, f"PQ recall degenerated: {recall}"
    return pa.table(
        {
            "k": pa.array([10], pa.int64()),
            "m_sub": pa.array([16], pa.int64()),
            "recall": pa.array([recall], pa.float64()),
        }
    )


def _q_approx_distinct_poly(sf_dir: str):
    """HLL sketch STATE over the polynomial text fingerprint — the
    register array is pure BIGINT arithmetic, so the (m, Σreg, zeros,
    checksum) summary is hash-exact vs the twin; the float estimate
    stays out of the gate (libm log in the small-range branch) and is
    tolerance-tested in pytest."""
    import ray.data

    from alp_ray.stages.sketch import approx_distinct_poly

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    state, _est = approx_distinct_poly(docs)
    # Fixture guard: every testdata sf has ≫ 4·m distinct docs, so the
    # HLL++ sketch must be in dense mode here (sparse mode is gated by
    # approx_distinct_sparse below).
    assert state["mode"] == "dense", state
    return pa.table(
        {
            "m": pa.array([state["m"]], pa.int64()),
            "sum_reg": pa.array([state["sum_reg"]], pa.int64()),
            "zero_reg": pa.array([state["zero_reg"]], pa.int64()),
            "checksum": pa.array([state["checksum"]], pa.int64()),
        }
    )


def _q_approx_distinct_sparse(sf_dir: str):
    """HLL++ SPARSE-mode state (Heule et al. 2013) over a ≤200-doc
    slice: below the 4·m distinct-fingerprint threshold the sketch
    holds the exact sorted fingerprint set, so n_exact is the true
    distinct count and the checksum folds the sorted fingerprints —
    both pure BIGINT, twin = COUNT(DISTINCT fv) + the same fold."""
    import ray.data

    from alp_ray.stages.sketch import approx_distinct_poly

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def take_slice(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        return batch.filter(pa.array(ids < 200)).select(["text"])

    state, est = approx_distinct_poly(
        docs.map_batches(take_slice, batch_format="pyarrow")
    )
    assert state["mode"] == "sparse", state
    assert est == float(state["n_exact"])  # sparse estimate is exact
    return pa.table(
        {
            "m": pa.array([state["m"]], pa.int64()),
            "n_exact": pa.array([state["n_exact"]], pa.int64()),
            "checksum": pa.array([state["checksum"]], pa.int64()),
        }
    )


def _q_embedding_quantize(sf_dir: str):
    """Symmetric per-vector int8 quantization of the embedding column
    (scale / Σcodes / max dequant error) — elementwise float64
    expressions mirrored op-for-op by the twin, so ROUND sees equal
    doubles on both sides."""
    import ray.data

    from alp_ray.pipelines.ann import quantize_embeddings

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return quantize_embeddings(emb)


def _q_minhash_poly_pairs(sf_dir: str):
    """MinHash-LSH pairs from the SQL-expressible polynomial hash
    family (word-fingerprint triples + literal affine permutations mod
    M31) — upgrades the LSH dedup family from rows-only to HASH-EXACT:
    the twin recomputes every signature in BIGINT arithmetic and emits
    pairs where some band of 2 consecutive signatures agrees. Same
    band-bucket first-match-band physical plan as minhash_pairs
    (`max_bucket` lifted so the skew guard can't diverge from the
    brute twin at gate scales)."""
    import ray.data

    from alp_ray.pipelines.dedup import minhash_poly_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_poly_pairs(docs, max_bucket=10**9)


# Planted near-duplicates: the synthetic embeddings contain NO natural
# pairs at cosine ≥ 0.95 (max natural cosine is far below — the round-2
# query returned 0 rows at every sf, proving nothing). Every vec_id
# divisible by _NEARDUP_EVERY gets a planted copy at id + _NEARDUP_OFF
# perturbed by an exact-dyadic, SQL-expressible formula, so the LSH
# pipeline must emit a deterministic nonzero pair set that an exact
# all-pairs DuckDB twin reproduces hash-for-hash.
_NEARDUP_EVERY = 25
_NEARDUP_OFF = 10_000_000


def _q_embedding_near_dup(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.ann import _as_matrix
    from alp_ray.pipelines.dedup import embedding_cosine_pairs

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id"), np.int64)
        V = _as_matrix(batch.column("embedding"))  # float64 upcast
        d = V.shape[1]
        sel = np.flatnonzero(ids % _NEARDUP_EVERY == 0)
        pid = ids[sel]
        # w_k = v_k + ((id + k) % 7 - 3) · 2⁻¹⁰ — every term exact in
        # float64, so the SQL twin computes bit-identical vectors.
        C = (((pid[:, None] + np.arange(d)[None, :]) % 7) - 3) * 2.0**-10
        all_ids = np.concatenate([ids, pid + _NEARDUP_OFF])
        M = np.concatenate([V, V[sel] + C])
        return pa.table(
            {
                "vec_id": pa.array(all_ids),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(M.reshape(-1), type=pa.float64()), d
                ),
            }
        )

    aug = emb.map_batches(plant, batch_format="pyarrow")
    df = embedding_cosine_pairs(aug, threshold=0.95).to_pandas()
    return pa.table(
        {
            "id_a": pa.array(df["id_a"].to_numpy(np.int64), pa.int64()),
            "id_b": pa.array(df["id_b"].to_numpy(np.int64), pa.int64()),
            "cosine": pa.array(
                _round_half_away(
                    df["cosine"].to_numpy(np.float64), 6
                )
            ),
        }
    )


def _q_langid(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import LangIdStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred", "lang_conf"])


def _q_fingerprints(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import FingerprintStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        FingerprintStage, batch_format="pyarrow", concurrency=(1, 4)
    ).select_columns(["doc_id", "fingerprint"])


def _q_kmeans(sf_dir: str):
    """K-means assignment with a FULL hash oracle (kmeans.hpp:60
    kpp_initialisation + :224 Lloyd/argmin): deterministic
    farthest-point init over the _KM_SAMPLE smallest vec_ids, exactly
    _KM_L Lloyd steps (no early break), integer (vec_id, cluster)
    output. Margin asserts inside kmeans() guarantee every argmin/
    argmax decision clears a 1e-9 relative gap, so the engine's
    block-partial summation order vs the twin's sequential list_sum
    cannot flip an assignment."""
    import ray.data

    from alp_ray.pipelines.linalg import kmeans

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    _, assign = kmeans(
        emb, k=_KM_K, max_iters=_KM_L, sample_size=_KM_SAMPLE,
        init="greedy", fixed_iters=True, assign_margin=1e-9,
    )
    return assign.select_columns(["vec_id", "cluster"])


def _q_quality(sf_dir: str):
    import ray.data

    from alp_ray.stages.text import QualityScoreStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = docs.map_batches(
        QualityScoreStage, batch_format="pyarrow", concurrency=(1, 4)
    )

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "q_score": pa.array(
                    _round_half_away(
                        np.asarray(batch.column("q_score"), np.float64), 6
                    )
                ),
                "q_n_chars": batch.column("q_n_chars"),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


_PPR_SEEDS = 50  # personalized teleport support: vertices 0..49


def _q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (teleport vector uniform over the first
    _PPR_SEEDS vertices), fixed _PR_K power steps — random jumps AND
    dangling mass land on the teleport distribution
    (simple_pagerank.hpp semantics generalized per Jeh & Widom)."""
    from alp_ray.pipelines.pagerank import pagerank
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir), n=MOD_DENSE, P=4
    )
    t = np.zeros(MOD_DENSE)
    t[:_PPR_SEEDS] = 1.0 / _PPR_SEEDS
    pagerank(
        engine, conv=0.0, max_iters=_PR_K, sync_every=_PR_K,
        personalize=t,
    )
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "pr": pa.array(_round_half_away(pr, 7)),
        }
    )


def _q_spmv_input_masked(sf_dir: str):
    from alp_ray.functions.semiring import PLUS_FIRST
    from alp_ray.stages.graph import spmv

    edges = _dense_edges(sf_dir)
    in_mask = np.arange(0, MOD_DENSE, 5, dtype=np.int64)
    y = spmv(
        edges, _x_tuple(edges), PLUS_FIRST, weight_col=None,
        input_mask=in_mask,
    )
    return _cast(y, {"vertex": pa.int64(), "val": pa.float64()})


def _q_matrix_zip(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.matrix import matrix_zip

    v = np.arange(MOD_DENSE, dtype=np.int64)

    def vec(vals):
        return ray.data.from_arrow(
            pa.table({"vertex": v, "val": vals.astype(np.float64)})
        )

    out = matrix_zip(
        vec((v * 7) % MOD_DENSE), vec((v * 13) % MOD_DENSE),
        vec(v % 10 + 1),
    )
    return _cast(
        out,
        {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
    )


def _q_matrix_ewise_union(sf_dir: str):
    from alp_ray.pipelines.matrix import matrix_ewise

    A = _dense_edges(sf_dir, weighted=True)
    B = _swapped_weighted(sf_dir)
    out = matrix_ewise(A, B, monoid_agg="sum", intersect=False)
    return _cast(
        out,
        {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
    )


def _q_matrix_ewise_intersect(sf_dir: str):
    from alp_ray.pipelines.matrix import matrix_ewise

    A = _dense_edges(sf_dir, weighted=True)
    B = _swapped_weighted(sf_dir)
    out = matrix_ewise(A, B, monoid_agg="sum", intersect=True)
    return _cast(
        out,
        {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
    )


def _swapped_weighted(sf_dir: str):
    """Bᵀ of the weighted dense graph — the weight formula is symmetric
    in (src, dst), so the SQL twin derives it identically."""
    base = _dense_edges(sf_dir, weighted=True)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("dst"),
                "dst": batch.column("src"),
                "weight": batch.column("weight"),
            }
        )

    return base.map_batches(swap, batch_format="pyarrow")


def _q_outer(sf_dir: str):
    from alp_ray.pipelines.matrix import outer

    ui = np.arange(0, MOD_DENSE, 50, dtype=np.int64)
    vi = np.arange(0, MOD_DENSE, 77, dtype=np.int64)
    uv = (ui // 10 + 1).astype(np.float64)
    vv = (vi % 5 + 1).astype(np.float64)
    out = outer((uv, ui), (vv, vi))
    return _cast(
        out,
        {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()},
    )


def _q_dot_degrees(sf_dir: str):
    from alp_ray.stages.graph import degrees, ewise_inner, fold

    e = _dense_edges(sf_dir)
    out_d = degrees(e, key="src", name="val").rename_columns(
        ["vertex", "val"]
    )
    in_d = degrees(e, key="dst", name="val").rename_columns(
        ["vertex", "val"]
    )
    prod = ewise_inner(out_d, in_d, np.multiply)
    return pa.table(
        {"dot": pa.array([int(fold(prod, "sum"))], pa.int64())}
    )


def _q_zip_unzip(sf_dir: str):
    from alp_ray.stages.graph import degrees, unzip_vectors, zip_vectors

    e = _dense_edges(sf_dir)
    out_d = degrees(e, key="src", name="val").rename_columns(
        ["vertex", "val"]
    )
    in_d = degrees(e, key="dst", name="val").rename_columns(
        ["vertex", "val"]
    )
    z = unzip_vectors(zip_vectors(out_d, in_d))
    return _cast(
        z,
        {"vertex": pa.int64(), "first": pa.int64(), "second": pa.int64()},
    )


def _q_sparse_nn(sf_dir: str):
    from alp_ray.pipelines.linalg import sparse_nn_inference

    W = _dense_edges(sf_dir, weighted=True).materialize()
    x0 = (
        ((np.arange(MOD_DENSE) % 7) + 1).astype(np.float64),
        np.arange(MOD_DENSE, dtype=np.int64),
    )
    xv, xi = sparse_nn_inference(
        [W, W], biases=[0.5, 0.25], x0=x0, threshold=30.0
    )
    return pa.table(
        {
            "vertex": pa.array(xi),
            "val": pa.array(_round_half_away(xv, 6)),
        }
    )


_NN_N, _NN_FAN, _NN_L = 601, 8, 3


def _nn_layer_arrays(l: int):
    """Arithmetic layer l: src v emits fan edges dst=(v*(l+3)+j*j+l)%n,
    weight=((v+j+l)%5)-2, duplicates pre-summed (the engine's
    no_duplicates FP contract; SQL twin GROUPs BY (src,dst)). All
    integers — exact in float64, so the driver hash is FP-order-proof."""
    n, fan = _NN_N, _NN_FAN
    v = np.repeat(np.arange(n, dtype=np.int64), fan)
    j = np.tile(np.arange(fan, dtype=np.int64), n)
    src, dst = v, (v * (l + 3) + j * j + l) % n
    w = ((v + j + l) % 5 - 2).astype(np.float64)
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    starts = np.flatnonzero(
        np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
    )
    return src[starts], dst[starts], np.add.reduceat(w, starts)


def _q_sparse_nn_engine(sf_dir: str):
    """Multi-layer forward pass on the ENGINE path: all layers stashed
    per shard, one superstep per layer selected via the _edges_key
    scalar (zero rebuilds / driver round-trips between layers).
    Ref: sparse_nn_single_inference.hpp:52+."""
    from alp_ray.pipelines.linalg import sparse_nn_engine
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_arrays(
        np.array([0], np.int64), np.array([1], np.int64),
        None, n=_NN_N, P=4,
    )
    keys = []
    for l in range(_NN_L):
        s, d, w = _nn_layer_arrays(l)
        engine.add_edge_layer(f"l{l}", s, d, w)
        keys.append(f"l{l}")
    x0 = (np.arange(_NN_N, dtype=np.int64) % 7).astype(np.float64)
    ids0 = np.flatnonzero(x0 > 0)
    xv, xi = sparse_nn_engine(
        engine, keys, biases=[-1.0, -2.0, -3.0],
        x0=(x0[ids0], ids0), threshold=40.0,
    )
    engine.shutdown()
    return pa.table(
        {"vertex": pa.array(xi), "val": pa.array(xv)}
    )


def _q_bicgstab(sf_dir: str):
    """Nonsymmetric diagonally-dominant system A = W + diag(1 + row
    sums), built Dataset-natively and solved with the engine in
    ``for_linear_system`` orientation (superstep applies A, not Aᵀ)."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.pipelines.linalg import bicgstab
    from alp_ray.state.engine import GraphEngine

    e = _dense_edges(sf_dir, weighted=True).materialize()
    ar = np.arange(MOD_DENSE, dtype=np.int64)
    base_diag = ray.data.from_arrow(
        pa.table({"src": ar, "dst": ar, "weight": np.ones(MOD_DENSE)})
    )

    def row_diag(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        return pa.table(
            {"src": s, "dst": s, "weight": batch.column("weight")}
        )

    entries = (
        e.union(base_diag)
        .union(e.map_batches(row_diag, batch_format="pyarrow"))
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )

    def swap(batch: pa.Table) -> pa.Table:
        # for_linear_system orientation: store entry (row, col) as
        # src=col → dst=row so the superstep computes y = A·x.
        return pa.table(
            {
                "src": batch.column("dst"),
                "dst": batch.column("src"),
                "weight": batch.column("weight"),
            }
        )

    engine = GraphEngine.from_dataset(
        entries.map_batches(swap, batch_format="pyarrow"),
        n=MOD_DENSE, P=4, weighted=True,
    )
    # Fixed iteration count (tol=0) so the unrolled DuckDB twin runs
    # the identical _BI_K steps.
    b = ((np.arange(MOD_DENSE) % 7) + 1).astype(np.float64) / MOD_DENSE
    x, iters, res = bicgstab(engine, b, tol=0.0, max_iters=_BI_K)
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "x": pa.array(_round_half_away(x, 6)),
        }
    )


def _q_bicgstab_complex(sf_dir: str):
    """BiCGstab over a general COMPLEX (non-Hermitian) diagonally-
    dominant system C = W + diag(1 + Σ(|Re w| + |Im w|)) — ≙ the
    reference's bicgstab.hpp templated over ``std::complex`` (the last
    complex-domain capability after round 4's HPD CG). The engine holds
    the 2n real embedding [[Cr, −Ci], [Ci, Cr]] in for_linear_system
    orientation with P=4 | n=600 (plane co-sharding), and the solver's
    ρ/α/ω are genuinely complex scalar collectives.

    Fixture weights: Re w = (u+v)%10+1, Im w = (2u+v)%7−3 (integers →
    the diag groupby sums exactly in any order)."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.pipelines.linalg import bicgstab_complex
    from alp_ray.sources.tables import derived_edges
    from alp_ray.state.engine import GraphEngine

    n = MOD_CPLX
    e = derived_edges(sf_dir, mod=n).materialize()

    def cw(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("src"), np.int64)
        v = np.asarray(batch.column("dst"), np.int64)
        return pa.table(
            {
                "src": u,
                "dst": v,
                "cr": ((u + v) % 10 + 1).astype(np.float64),
                "ci": ((2 * u + v) % 7 - 3).astype(np.float64),
            }
        )

    ew = e.map_batches(cw, batch_format="pyarrow")
    ar = np.arange(n, dtype=np.int64)
    base_diag = ray.data.from_arrow(
        pa.table(
            {"src": ar, "dst": ar,
             "cr": np.ones(n), "ci": np.zeros(n)}
        )
    )

    def dom_diag(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("src"), np.int64)
        cr = np.asarray(batch.column("cr"), np.float64)
        ci = np.asarray(batch.column("ci"), np.float64)
        return pa.table(
            {
                "src": u,
                "dst": u,
                "cr": np.abs(cr) + np.abs(ci),
                "ci": np.zeros(u.size),
            }
        )

    entries = (
        ew.union(base_diag)
        .union(ew.map_batches(dom_diag, batch_format="pyarrow"))
        .groupby(["src", "dst"])
        .aggregate(Sum("cr", alias_name="cr"), Sum("ci", alias_name="ci"))
    )

    def embed_swap(batch: pa.Table) -> pa.Table:
        # Entry (row=src, col=dst, cr+i·ci) → the 4 embedding edges in
        # for_linear_system orientation (engine src=col, dst=row):
        # M[r,c]=cr, M[r+n,c+n]=cr, M[r,c+n]=−ci, M[r+n,c]=ci.
        r = np.asarray(batch.column("src"), np.int64)
        c = np.asarray(batch.column("dst"), np.int64)
        cr = np.asarray(batch.column("cr"), np.float64)
        ci = np.asarray(batch.column("ci"), np.float64)
        return pa.table(
            {
                "src": np.concatenate([c, c + n, c + n, c]),
                "dst": np.concatenate([r, r + n, r, r + n]),
                "weight": np.concatenate([cr, cr, -ci, ci]),
            }
        )

    engine = GraphEngine.from_dataset(
        entries.map_batches(embed_swap, batch_format="pyarrow"),
        n=2 * n, P=4, weighted=True,
    )
    br = ((np.arange(n) % 7) + 1).astype(np.float64) / n
    bi = ((np.arange(n) % 5) - 2).astype(np.float64) / n
    xr, xi, iters, res = bicgstab_complex(
        engine, br, bi, tol=0.0, max_iters=_BIC_K
    )
    engine.shutdown()
    # Gate-robustness invariant (the CG pattern): no rounded digit may
    # sit near a .5 half-boundary, so engine-vs-twin dot-order drift
    # can never flip a ROUND(·, 6) value.
    for plane, name in ((xr, "xr"), (xi, "xi")):
        frac = np.abs(plane) * 1e6 % 1.0
        margin = float(np.min(np.abs(frac - 0.5)))
        assert margin > 1e-4, (
            f"complex-bicgstab fixture too close to a rounding "
            f"half-boundary on {name} (margin={margin:.2e}); rescale b "
            f"in _q_bicgstab_complex"
        )
    return pa.table(
        {
            "vertex": pa.array(np.arange(n, dtype=np.int64)),
            "xr": pa.array(_round_half_away(xr, 6)),
            "xi": pa.array(_round_half_away(xi, 6)),
        }
    )


def _q_ngram_jaccard(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.dedup import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard_pairs(docs, threshold=0.5)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": batch.column("id_a").cast(pa.int64()),
                "id_b": batch.column("id_b").cast(pa.int64()),
                "jaccard": pa.array(
                    _round_half_away(
                        np.asarray(batch.column("jaccard"), np.float64), 6
                    )
                ),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


_DEDUP_CC_ROUNDS = 8  # unrolled max-prop rounds in the SQL twin


def _q_dedup_clusters(sf_dir: str):
    """Transitive near-dup dedup: exact n-gram Jaccard pairs (the
    SQL-expressible candidate set) → connected components over the pair
    graph on the shard engine → keep the MAX doc_id per cluster plus
    all singletons. Max-propagation is idempotent, so the fixed-round
    SQL twin is exact as long as it unrolls ≥ the applied superstep
    count (asserted here)."""
    import ray.data

    from alp_ray.pipelines.dedup import cc_dedup_keep, ngram_jaccard_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    kept, iters = cc_dedup_keep(docs, pairs)
    assert iters <= _DEDUP_CC_ROUNDS, iters
    return _cast(
        kept.select_columns(["doc_id"]), {"doc_id": pa.int64()}
    )


def _q_minhash_keep(sf_dir: str):
    import ray.data

    from alp_ray.pipelines.dedup import minhash_dedup_keep

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    kept = minhash_dedup_keep(docs, threshold=0.9)
    return _cast(
        kept.select_columns(["doc_id"]), {"doc_id": pa.int64()}
    )


_WALK_STEPS = 4
_BC_SOURCES = (0, 1, 2, 3)  # betweenness sample
_BC_LEVELS = 12             # BFS level cap (both sides)


def _q_betweenness(sf_dir: str):
    """Sampled Brandes betweenness over the symmetric sparse graph —
    fixed sources + level cap make the unrolled SQL twin exact
    (σ/levels are integers; δ rounds at 6)."""
    from alp_ray.pipelines.betweenness import betweenness
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    bc = betweenness(
        engine, sources=list(_BC_SOURCES), max_levels=_BC_LEVELS
    )
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_SPARSE, dtype=np.int64)),
            "bc": pa.array(_round_half_away(bc, 6)),
        }
    )


def _q_random_walks(sf_dir: str):
    """One deterministic walk per vertex over the dense directed graph
    (integer step hash → bit-exact SQL twin via ROW_NUMBER neighbour
    ranks)."""
    from alp_ray.pipelines.walks import random_walks

    out = random_walks(
        _dense_edges(sf_dir), n=MOD_DENSE, steps=_WALK_STEPS
    )
    return _cast(
        out,
        {"walk_id": pa.int64(), "step": pa.int64(),
         "vertex": pa.int64()},
    )


def _q_coloring(sf_dir: str):
    """Deterministic Jones-Plassmann coloring on the symmetric sparse
    graph — priorities are an integer mixed hash, so the whole
    computation is integer-exact and the unrolled SQL twin matches
    bit-for-bit. Both sides run exactly _COLOR_K rounds."""
    from alp_ray.pipelines.coloring import coloring
    from alp_ray.stages.graph import symmetrize
    from alp_ray.sources.tables import derived_edges
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    colors = coloring(engine, max_rounds=_COLOR_K)
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_SPARSE, dtype=np.int64)),
            "color": pa.array(colors),
        }
    )


def _q_asof_purchase(sf_dir: str):
    """Each click joined to the user's most recent prior-or-equal
    purchase (the as-of join the prompt lists as a must-have custom
    operator; DuckDB's native ASOF JOIN is the oracle)."""
    import ray.data

    from alp_ray.stages.relational import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    clicks = ev.filter(expr="event_type == 'click'")
    purchases = ev.filter(expr="event_type == 'purchase'")
    out = asof_join(
        clicks, purchases, key="user_id", on="ts",
        right_value_cols=("value",),
    )
    return _cast(
        out,
        {"user_id": pa.int64(), "event_id": pa.int64(),
         "ts": pa.int64(), "value_r": pa.float64()},
    )


def _q_window_hopping(sf_dir: str):
    import ray.data

    from alp_ray.stages.window import hopping_window

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    out = hopping_window(ev, width_s=3600, hop_s=900)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("window_start").cast(
                    pa.int64()
                ),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events").cast(pa.int64()),
                "sum_value": pa.array(
                    _round_half_away(
                        np.asarray(
                            batch.column("sum_value"), np.float64
                        ),
                        6,
                    )
                ),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def _q_topk_per_user(sf_dir: str):
    import ray.data

    from alp_ray.stages.relational import topk_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value", "event_id"],
    )
    out = topk_per_group(
        ev, key="user_id", order_col="value", tie_col="event_id", k=3
    )
    return _cast(
        out,
        {"user_id": pa.int64(), "value": pa.float64(),
         "event_id": pa.int64()},
    )


def _q_doc_sample(sf_dir: str):
    import ray.data

    from alp_ray.stages.relational import hash_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return _cast(hash_sample(docs, pct=5), {"doc_id": pa.int64()})


def _q_nation_revenue(sf_dir: str):
    """Fact ⋈ dimension enrich without ANY shuffle: orders broadcast-
    joins customer then nation (small sides ray.put once, joined per
    batch), per-batch int-cent partials by nationkey, driver merge of
    the bounded (25 × #blocks) partial rows. Prices are exact 2-decimal
    floats, so floor(x·100+0.5) cents make sums integer-exact on both
    sides of the gate."""
    import ray.data

    from alp_ray.stages.relational import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("c_custkey"),
                "c_nationkey": b.column("c_nationkey"),
            }
        ),
        batch_format="pyarrow",
    )
    enriched = broadcast_join(orders, cust, on="o_custkey")
    n_nations = 32  # bound on distinct nationkeys (25 in TPC-H)

    def partial(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), np.int64)
        cents = np.floor(
            np.asarray(batch.column("o_totalprice"), np.float64) * 100
            + 0.5
        ).astype(np.int64)
        sums = np.zeros(n_nations, np.int64)
        np.add.at(sums, nk, cents)
        cnt = np.bincount(nk, minlength=n_nations)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "c_nationkey": nz.astype(np.int64),
                "cents": sums[nz],
                "cnt": cnt[nz].astype(np.int64),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            enriched.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
    )
    nk = np.asarray(parts.column("c_nationkey"), np.int64)
    sums = np.zeros(n_nations, np.int64)
    cnts = np.zeros(n_nations, np.int64)
    np.add.at(sums, nk, np.asarray(parts.column("cents"), np.int64))
    np.add.at(cnts, nk, np.asarray(parts.column("cnt"), np.int64))
    nation = (
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name"],
        )
        .to_pandas()
        .set_index("n_nationkey")["n_name"]
    )
    nz = np.flatnonzero(cnts)
    return pa.table(
        {
            "nation": pa.array([nation[k] for k in nz]),
            "revenue_cents": pa.array(sums[nz]),
            "n_orders": pa.array(cnts[nz]),
        }
    )


def _q_price_bands(sf_dir: str):
    """Interval-containment join without a shuffle: an 11-band interval
    table broadcast once, lineitem prices resolved per batch by
    searchsorted (range_join), then bounded per-band integer-cent
    partials merged driver-side."""
    import ray.data

    from alp_ray.stages.relational import range_join

    n_bands = 11
    bands = pa.table(
        {
            "band": np.arange(n_bands, dtype=np.int64),
            "lo": np.arange(n_bands) * 10_000.0,
            "hi": (np.arange(n_bands) + 1) * 10_000.0,
        }
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    joined = range_join(li, bands, value_col="l_extendedprice")

    def partial(batch: pa.Table) -> pa.Table:
        bd = np.asarray(batch.column("band"), np.int64)
        cents = np.floor(
            np.asarray(batch.column("l_extendedprice"), np.float64)
            * 100
            + 0.5
        ).astype(np.int64)
        sums = np.zeros(n_bands, np.int64)
        np.add.at(sums, bd, cents)
        cnt = np.bincount(bd, minlength=n_bands)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "band": nz.astype(np.int64),
                "cents": sums[nz],
                "cnt": cnt[nz].astype(np.int64),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            joined.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
    )
    bd = np.asarray(parts.column("band"), np.int64)
    sums = np.zeros(n_bands, np.int64)
    cnts = np.zeros(n_bands, np.int64)
    np.add.at(sums, bd, np.asarray(parts.column("cents"), np.int64))
    np.add.at(cnts, bd, np.asarray(parts.column("cnt"), np.int64))
    nz = np.flatnonzero(cnts)
    return pa.table(
        {
            "band": pa.array(nz.astype(np.int64)),
            "n_items": pa.array(cnts[nz]),
            "cents": pa.array(sums[nz]),
        }
    )


def _q_assortativity(sf_dir: str):
    """Degree assortativity of the symmetric sparse graph — integer
    moment partials make the scalar exact; only the final six-term
    formula is FP (mirrored verbatim in the twin)."""
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.stages.stats import degree_assortativity

    r = degree_assortativity(
        symmetrize(
            derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True),
            dedup=True,
        )
    )
    return pa.table(
        {
            "assortativity": pa.array(
                _round_half_away(np.array([r]), 6)
            )
        }
    )


def _q_heavy_hitters(sf_dir: str):
    """Exact top-20 tokens via Misra-Gries candidates + exact verify
    pass — provably exact (asserted) without any token shuffle."""
    import ray.data

    from alp_ray.stages.sketch import heavy_hitters

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return heavy_hitters(docs, text_col="text", k=20, counters=2048)


def _q_train_test_split(sf_dir: str):
    """Exact per-language 20% test split of documents (bracket
    selection on the key hash — see stratified_split)."""
    import ray.data

    from alp_ray.stages.relational import stratified_split

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = stratified_split(
        docs, stratum_col="lang", key_col="doc_id", test_frac=0.2
    )
    return _cast(out, {"doc_id": pa.int64(), "lang": pa.string()})


_NS_SEEDS = (0, 1, 2, 3, 4, 5, 6, 7)
_NS_FANOUTS = (5, 3)


def _q_neighbor_sample(sf_dir: str):
    """GraphSAGE-style 2-hop minibatch sampling over the sparse graph:
    deterministic arithmetic-hash neighbor ranking makes the sample
    reproducible and SQL-expressible (ROW_NUMBER over the same hash)."""
    from alp_ray.pipelines.sampling import neighbor_sample
    from alp_ray.sources.tables import derived_edges

    out = neighbor_sample(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True),
        seeds=list(_NS_SEEDS),
        fanouts=_NS_FANOUTS,
    )
    return _cast(
        out, {"src": pa.int64(), "dst": pa.int64(), "hop": pa.int64()}
    )


def _neighbor_sample_sql() -> str:
    """Two ROW_NUMBER hops mirroring neighbor_sample's hash ranking and
    expand-each-vertex-once frontier rule."""
    seeds = ", ".join(str(s) for s in _NS_SEEDS)
    k1, k2 = _NS_FANOUTS

    def hop(name: str, members: str, k: int) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT src, dst FROM ("
            "SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src "
            "ORDER BY (src * 1000003 + dst * 7919) % 1000000007, dst"
            f") AS r FROM e WHERE src IN ({members})) WHERE r <= {k})"
        )

    return (
        f"WITH e AS MATERIALIZED ({_E_SPARSE}), "
        + hop("s1", seeds, k1)
        + ", "
        + hop(
            "s2",
            f"SELECT DISTINCT dst FROM s1 WHERE dst NOT IN ({seeds})",
            k2,
        )
        + " SELECT src, dst, 1 AS hop FROM s1 "
        "UNION ALL SELECT src, dst, 2 AS hop FROM s2"
    )


_KTRUSS_K = 30
_KTRUSS_ROUNDS = 6  # unrolled peel rounds in the SQL twin


def _q_ktruss(sf_dir: str):
    """k-truss (k=30) of the dense graph: per-round distributed
    triangle support (oriented-CSR wedge kernel) + peel; round count
    asserted ≤ the twin's unroll (fixpoint rounds are no-ops)."""
    from alp_ray.pipelines.ktruss import ktruss
    from alp_ray.sources.tables import derived_edges

    out, rounds = ktruss(
        derived_edges(sf_dir, mod=MOD_DENSE, sparse=False, dedup=True),
        k=_KTRUSS_K,
    )
    assert rounds <= _KTRUSS_ROUNDS, rounds
    return out


def _ktruss_sql(K: int, k: int) -> str:
    """Unrolled support-and-peel rounds over the canonical undirected
    dense edge set."""
    need = k - 2
    parts = [
        f"WITH ed AS MATERIALIZED ({_E_DENSE}), ",
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM ed)",
    ]
    for r in range(1, K + 1):
        p = r - 1
        parts.append(
            f", t{r} AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, "
            f"e2.v AS c FROM e{p} e1 JOIN e{p} e2 ON e2.u = e1.v "
            f"JOIN e{p} e3 ON e3.u = e1.u AND e3.v = e2.v)"
            f", s{r} AS MATERIALIZED (SELECT u, v, COUNT(*) AS c FROM ("
            f"SELECT a AS u, b AS v FROM t{r} "
            f"UNION ALL SELECT b, c FROM t{r} "
            f"UNION ALL SELECT a, c FROM t{r}) GROUP BY u, v)"
            f", e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{p} e "
            f"JOIN s{r} s ON s.u = e.u AND s.v = e.v "
            f"WHERE s.c >= {need})"
        )
    parts.append(f" SELECT u AS src, v AS dst FROM e{K}")
    return "".join(parts)


# Truss decomposition fixture: sparse graph + planted K7/K5 cliques so
# several truss levels exist; twin unrolls levels k=3.._TRUSS_MAX_K with
# _TRUSS_ROUNDS peel rounds each (extra rounds/levels are fixpoint
# no-ops, so over-unrolling is always safe).
_TRUSS_MAX_K = 10
_TRUSS_ROUNDS = 8
_TRUSS_K7 = (100, 300, 500, 700, 900, 1100, 1300)
_TRUSS_K5 = (50, 250, 450, 650, 850)


def _truss_clique_pairs() -> list[tuple[int, int]]:
    pairs = []
    for clique in (_TRUSS_K7, _TRUSS_K5):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                pairs.append((clique[i], clique[j]))
    return pairs


def _q_truss_decomposition(sf_dir: str):
    """Full per-edge truss decomposition t(e) = max k with e in the
    k-truss — the decomposition the reference's smoke k-truss samples
    at one k. Sparse graph + planted K7/K5 cliques (deterministic
    level structure); level/round counts asserted within the twin's
    unroll bounds (extra unrolled rounds are fixpoint no-ops)."""
    import ray.data

    from alp_ray.pipelines.ktruss import truss_decomposition
    from alp_ray.sources.tables import derived_edges

    pairs = _truss_clique_pairs()
    cl = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    edges = derived_edges(
        sf_dir, mod=MOD_SPARSE, sparse=True, dedup=False
    ).union(cl)
    out, rounds = truss_decomposition(edges)
    assert max(rounds) <= _TRUSS_MAX_K, rounds
    assert all(r <= _TRUSS_ROUNDS for r in rounds.values()), rounds
    return _cast(
        out,
        {"src": pa.int64(), "dst": pa.int64(), "trussness": pa.int64()},
    )


def _truss_sql(max_k: int, R: int) -> str:
    """Twin of `_q_truss_decomposition`: levels k=3..max_k, each an
    unrolled ``_ktruss_sql``-style support-and-peel chain of R rounds
    starting from the previous level's fixpoint; trussness = the max
    level an edge survives (2 if absent from every level)."""
    vals = ", ".join(f"({a}, {b})" for a, b in _truss_clique_pairs())
    parts = [
        f"WITH ed AS MATERIALIZED (SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION ALL SELECT * FROM (VALUES {vals}) AS cl(src, dst)), ",
        "lv2_0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM ed WHERE src != dst)",
    ]
    prev = "lv2_0"
    survivors = []
    for k in range(3, max_k + 1):
        need = k - 2
        cur = f"lv{k}_0"
        parts.append(f", {cur} AS MATERIALIZED (SELECT u, v FROM {prev})")
        for r in range(1, R + 1):
            p = f"lv{k}_{r - 1}"
            parts.append(
                f", t{k}_{r} AS MATERIALIZED (SELECT e1.u AS a, "
                f"e1.v AS b, e2.v AS c FROM {p} e1 "
                f"JOIN {p} e2 ON e2.u = e1.v "
                f"JOIN {p} e3 ON e3.u = e1.u AND e3.v = e2.v)"
                f", s{k}_{r} AS MATERIALIZED (SELECT u, v, COUNT(*) AS c "
                f"FROM (SELECT a AS u, b AS v FROM t{k}_{r} "
                f"UNION ALL SELECT b, c FROM t{k}_{r} "
                f"UNION ALL SELECT a, c FROM t{k}_{r}) GROUP BY u, v)"
                f", lv{k}_{r} AS MATERIALIZED (SELECT e.u, e.v "
                f"FROM lv{k}_{r - 1} e "
                f"JOIN s{k}_{r} s ON s.u = e.u AND s.v = e.v "
                f"WHERE s.c >= {need})"
            )
        prev = f"lv{k}_{R}"
        survivors.append((k, prev))
    union = " UNION ALL ".join(
        f"SELECT u, v, {k} AS k FROM {cte}" for k, cte in survivors
    )
    parts.append(
        f", mx AS MATERIALIZED (SELECT u, v, MAX(k) AS k "
        f"FROM ({union}) GROUP BY u, v) "
        "SELECT e.u AS src, e.v AS dst, "
        "CAST(COALESCE(mx.k, 2) AS BIGINT) AS trussness "
        "FROM lv2_0 e LEFT JOIN mx ON mx.u = e.u AND mx.v = e.v"
    )
    return "".join(parts)


_WTRUSS_THR = 5.0   # weighted-truss support threshold (integer-valued
                    # weights → exact float sums on both sides)
_WTRUSS_ROUNDS = 8  # unrolled peel rounds (extra rounds are no-ops)


def _q_ktruss_weighted(sf_dir: str, method: str = "auto"):
    """WEIGHTED k-truss (min-weight triangle support ≥ θ) over the
    sparse graph + planted K7/K5 cliques with w = (u+v)%10+1 — the
    weighted generalization of the support-and-peel loop; round count
    asserted within the twin's unroll. ``method='shuffle'`` forces the
    all-Dataset scale path (weight carried through orientation and
    wedge emission, min-folded at the closing-pair match) — same
    fixpoint, same twin."""
    import ray.data

    from alp_ray.pipelines.ktruss import ktruss_weighted
    from alp_ray.sources.tables import derived_edges

    pairs = _truss_clique_pairs()
    cl = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    base = derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True, dedup=False)

    def add_w(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        return pa.table(
            {
                "src": s,
                "dst": d,
                "weight": ((s + d) % 10 + 1).astype(np.float64),
            }
        )

    edges = base.union(cl).map_batches(add_w, batch_format="pyarrow")
    out, rounds = ktruss_weighted(
        edges, threshold=_WTRUSS_THR, method=method
    )
    assert rounds <= _WTRUSS_ROUNDS, rounds
    return pa.table(
        {
            "src": out.column("src").cast(pa.int64()),
            "dst": out.column("dst").cast(pa.int64()),
            "weight": out.column("weight").cast(pa.float64()),
        }
    )


def _q_ktruss_weighted_shuffle(sf_dir: str):
    """The weighted k-truss on the all-Dataset SHUFFLE path — the
    10^12-edge composition (pipelines/ktruss.py
    `_round_shuffle_weighted`). Same fixpoint as the broadcast peel,
    pinned to the same LEAST/SUM unrolled twin."""
    return _q_ktruss_weighted(sf_dir, method="shuffle")


def _wtruss_sql(R: int, thr: float) -> str:
    """Twin of `_q_ktruss_weighted`: R unrolled weighted
    support-and-peel rounds — per-triangle LEAST of the three edge
    weights, summed per edge over its three roles, peel below thr.
    Integer-valued weights sum exactly in any order."""
    vals = ", ".join(f"({a}, {b})" for a, b in _truss_clique_pairs())
    parts = [
        f"WITH ed AS MATERIALIZED (SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION ALL SELECT * FROM (VALUES {vals}) AS cl(src, dst)), ",
        "w0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u, "
        "GREATEST(src, dst) AS v FROM ed WHERE src != dst), ",
        "e0 AS MATERIALIZED (SELECT u, v, "
        "CAST((u + v) % 10 + 1 AS DOUBLE) AS w FROM w0)",
    ]
    for r in range(1, R + 1):
        p = r - 1
        parts.append(
            f", t{r} AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, "
            f"e2.v AS c, LEAST(e1.w, e2.w, e3.w) AS tw "
            f"FROM e{p} e1 JOIN e{p} e2 ON e2.u = e1.v "
            f"JOIN e{p} e3 ON e3.u = e1.u AND e3.v = e2.v)"
            f", s{r} AS MATERIALIZED (SELECT u, v, SUM(tw) AS sw FROM ("
            f"SELECT a AS u, b AS v, tw FROM t{r} "
            f"UNION ALL SELECT b, c, tw FROM t{r} "
            f"UNION ALL SELECT a, c, tw FROM t{r}) GROUP BY u, v)"
            f", e{r} AS MATERIALIZED (SELECT e.u, e.v, e.w FROM e{p} e "
            f"JOIN s{r} s ON s.u = e.u AND s.v = e.v "
            f"WHERE s.sw >= {thr})"
        )
    parts.append(
        f" SELECT u AS src, v AS dst, w AS weight FROM e{R}"
    )
    return "".join(parts)


_MIS_ROUNDS = 8  # unrolled select/remove rounds in the SQL twin


def _q_mis(sf_dir: str):
    """Deterministic maximal independent set over the symmetric sparse
    graph (fixed priority keys ⇒ equals the sequential greedy scan in
    key order, so the fixed-round SQL twin is exact; extra rounds are
    no-ops on an empty undecided set)."""
    from alp_ray.pipelines.mis import maximal_independent_set
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    mask, rounds = maximal_independent_set(engine)
    engine.shutdown()
    assert rounds <= _MIS_ROUNDS, rounds
    return pa.table(
        {"vertex": pa.array(np.flatnonzero(mask).astype(np.int64))}
    )


def _mis_sql(K: int) -> str:
    """Unrolled parallel-greedy MIS rounds over the priority keys
    (HUGEINT reproduction of coloring._priority_key)."""
    parts = [
        "WITH keys AS MATERIALIZED (SELECT v, (CAST(xor("
        "CAST(((CAST(v AS HUGEINT) * 11400714819323198485) "
        "% 9223372036854775808) AS BIGINT), "
        "CAST(((CAST(v AS HUGEINT) * 11400714819323198485) "
        "% 9223372036854775808) // 536870912 AS BIGINT)"
        ") AS BIGINT) % 67108864) * 67108864 + v AS key "
        f"FROM (SELECT range::BIGINT AS v FROM range({MOD_SPARSE}))), ",
        f"ed AS MATERIALIZED ({_E_SPARSE}), ",
        "es AS MATERIALIZED (SELECT src, dst FROM ed "
        "UNION SELECT dst AS src, src AS dst FROM ed), ",
        "u0 AS MATERIALIZED (SELECT v FROM keys)",
    ]
    for k in range(1, K + 1):
        p = k - 1
        parts.append(
            f", m{k} AS MATERIALIZED (SELECT u.v FROM u{p} u "
            "JOIN keys kv ON kv.v = u.v WHERE NOT EXISTS ("
            f"SELECT 1 FROM es e JOIN u{p} w ON w.v = e.src "
            "JOIN keys kw ON kw.v = e.src "
            "WHERE e.dst = u.v AND kw.key < kv.key))"
            f", r{k} AS MATERIALIZED (SELECT DISTINCT u.v FROM u{p} u "
            f"JOIN es e ON e.dst = u.v JOIN m{k} m ON m.v = e.src)"
            f", u{k} AS MATERIALIZED (SELECT v FROM u{p} "
            f"WHERE v NOT IN (SELECT v FROM m{k}) "
            f"AND v NOT IN (SELECT v FROM r{k}))"
        )
    union = " UNION ALL ".join(
        f"SELECT v FROM m{k}" for k in range(1, K + 1)
    )
    parts.append(f" SELECT v AS vertex FROM ({union})")
    return "".join(parts)


_HC_SOURCES = (0, 1, 2, 3, 4, 5, 6, 7)  # harmonic-closeness sample
_HC_LEVELS = 10                         # BFS level cap (both sides)


def _q_harmonic_closeness(sf_dir: str):
    """Sampled harmonic closeness over the symmetric sparse graph:
    multi-column BFS supersteps (one sweep serves all sources), then
    hc(v) = Σ_s 1/d(s,v) for 0 < d ≤ L — integer levels make the
    unrolled SQL twin exact to 6 decimals."""
    from alp_ray.pipelines.closeness import harmonic_closeness
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    hc = harmonic_closeness(
        engine, sources=list(_HC_SOURCES), max_levels=_HC_LEVELS
    )
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_SPARSE, dtype=np.int64)),
            "hc": pa.array(_round_half_away(hc, 6)),
        }
    )


def _q_reciprocity(sf_dir: str):
    """Directed-edge reciprocity of the sparse graph — integer counts
    from one self-join, ratio mirrored verbatim in the twin."""
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.stats import reciprocity

    matched, total = reciprocity(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True, dedup=True)
    )
    return pa.table(
        {
            "n_edges": pa.array([total], pa.int64()),
            "n_reciprocal": pa.array([matched], pa.int64()),
            "reciprocity": pa.array(
                _round_half_away(
                    np.array([matched / total if total else 0.0]), 6
                )
            ),
        }
    )


def _q_eccentricity(sf_dir: str):
    """Per-source eccentricity + reachable-set size from the same
    multi-source BFS sweep as harmonic closeness (shared SQL closure)."""
    from alp_ray.pipelines.closeness import eccentricity
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize
    from alp_ray.state.engine import GraphEngine

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=False
    )
    engine = GraphEngine.from_dataset(
        edges, n=MOD_SPARSE, P=4, dedupe=True
    )
    ecc, reach = eccentricity(
        engine, sources=list(_HC_SOURCES), max_levels=_HC_LEVELS
    )
    engine.shutdown()
    return pa.table(
        {
            "source": pa.array(
                np.asarray(_HC_SOURCES, np.int64)
            ),
            "ecc": pa.array(ecc),
            "n_reached": pa.array(reach),
        }
    )


def _q_clustering(sf_dir: str):
    """Local clustering coefficient (per-vertex triangles over the
    degree-ordered oriented CSR, each triangle credited to all three
    endpoints). Integer T(v)/deg make the SQL twin exact."""
    from alp_ray.pipelines.clustering import clustering_coefficient
    from alp_ray.sources.tables import derived_edges

    out = clustering_coefficient(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True)
    )
    return _cast(
        out, {"vertex": pa.int64(), "cc": pa.float64()}, round6=("cc",)
    )


def _q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the symmetric sparse graph:
    SpGEMM with the middle vertex's 1/ln(deg) as edge weight, existing
    edges removed via a native left_anti join."""
    from alp_ray.pipelines.linkpred import adamic_adar
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    )
    out = adamic_adar(edges, exclude_edges=True)
    return _cast(
        out,
        {"u": pa.int64(), "v": pa.int64(), "aa": pa.float64()},
        round6=("aa",),
    )


def _q_avg_nbr_degree(sf_dir: str):
    """Barrat-style average neighbor degree per vertex (symmetric
    sparse graph); integer sums, one exact division."""
    from alp_ray.pipelines.linkpred import average_neighbor_degree
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    )
    out = average_neighbor_degree(edges)
    return _cast(
        out,
        {"vertex": pa.int64(), "avg_nbr_deg": pa.float64()},
    )


def _q_jaccard_linkpred(sf_dir: str):
    """Neighborhood-Jaccard link prediction over the symmetric sparse
    graph (integer wedge counts + broadcast degree enrich; the only FP
    op is the final exact small-integer division)."""
    from alp_ray.pipelines.linkpred import jaccard_similarity
    from alp_ray.sources.tables import derived_edges
    from alp_ray.stages.graph import symmetrize

    edges = symmetrize(
        derived_edges(sf_dir, mod=MOD_SPARSE, sparse=True), dedup=True
    )
    out = jaccard_similarity(edges, exclude_edges=True)
    return _cast(
        out,
        {"u": pa.int64(), "v": pa.int64(), "jaccard": pa.float64()},
    )


def _q_distinct_parts(sf_dir: str):
    """Exact per-supplier COUNT(DISTINCT part) over lineitem."""
    import ray.data

    from alp_ray.stages.relational import grouped_distinct_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )
    return grouped_distinct_count(
        li, key="l_suppkey", item_col="l_partkey"
    )


def _q_pearson_corr(sf_dir: str):
    """Pearson correlation of (l_quantity, l_extendedprice) from exact
    integer moment partials; only the final formula runs in floats."""
    import ray.data

    from alp_ray.stages.stats import pearson_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    r = pearson_corr(li, "l_quantity", "l_extendedprice")
    return pa.table({"corr": pa.array([round(r, 6)], pa.float64())})


def _q_degree_hist(sf_dir: str):
    """Degree histogram (degree, n_vertices): one exact-degree groupby
    + per-block partial histograms merged driver-side (bounded by the
    number of DISTINCT degrees — tiny even at 100 TB)."""
    from alp_ray.stages.stats import degree_histogram

    return degree_histogram(_dense_edges(sf_dir), key="src")


def _q_percentiles(sf_dir: str):
    """Exact two-pass bracket selection (no global sort): per-block
    quantile samples bracket each target rank, pass 2 counts below +
    collects the bracket. Rank convention k=ceil(q·n) = DuckDB
    quantile_disc."""
    import ray.data

    from alp_ray.stages.stats import exact_percentiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    return exact_percentiles(
        li, "l_extendedprice", (0.25, 0.5, 0.9, 0.99)
    )


def _q_weighted_sample(sf_dir: str):
    """A-Res weighted sampling (Efraimidis-Spirakis): k=20 docs by
    -ln(u)/len(text) with an arithmetic-hash u — deterministic and
    SQL-verbatim reproducible."""
    import pyarrow.compute as pc

    import ray.data

    from alp_ray.stages.stats import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def wof(batch: pa.Table) -> np.ndarray:
        return np.asarray(
            pc.utf8_length(batch.column("text")), np.float64
        )

    out = weighted_sample(docs, "doc_id", wof, k=20)
    return pa.table({
        "doc_id": out.column("doc_id"),
        "score": pa.array(
            _round_half_away(
                np.asarray(out.column("score"), np.float64), 8
            )
        ),
    })


def _plant_pii(batch: pa.Table) -> pa.Table:
    """Deterministically plant one email/URL/phone into every 3rd doc
    (the synth corpus contains none) so the scrub operator is
    non-vacuous; the SQL twin rebuilds the identical planted text with
    string concatenation."""
    import pyarrow.compute as pc

    ids = np.asarray(batch.column("doc_id"), np.int64)
    extra = [
        (
            " contact user%d@example.com or https://ex%d.org/a call "
            "%d-555-%04d" % (i, i, (i % 900) + 100, i % 10000)
        )
        if i % 3 == 0
        else ""
        for i in ids
    ]
    t = pc.binary_join_element_wise(
        batch.column("text"), pa.array(extra, pa.string()), ""
    )
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", t
    )


def _q_pii_scrub(sf_dir: str):
    """PII redaction (emails/URLs/phones → typed placeholders) with
    per-class counts; PII planted deterministically per doc_id."""
    import ray.data

    from alp_ray.stages.text import PiiScrubStage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = docs.map_batches(_plant_pii, batch_format="pyarrow").map_batches(
        PiiScrubStage, batch_format="pyarrow", concurrency=(1, 4)
    )
    return out.select_columns(
        ["doc_id", "n_urls", "n_emails", "n_phones", "clean_text"]
    )


def _q_paragraph_dedup(sf_dir: str):
    """Cross-document paragraph-repetition removal (CCNet/Gopher-style
    20-token chunks; corpus-wide first occurrence wins)."""
    import ray.data

    from alp_ray.pipelines.dedup import paragraph_dedup_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return paragraph_dedup_stats(docs)


def _q_dup_spans(sf_dir: str):
    """Exact substring-span dedup stats (Lee et al. 2022 primitive):
    per-doc count of distinct 8-token windows shared with ≥1 other
    document. One coarse hash-partitioned map_groups + one doc-keyed
    groupby — no joins, no driver materialization."""
    import ray.data

    from alp_ray.pipelines.dedup import dup_span_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dup_span_stats(docs, k=8)


def _q_decontaminate(sf_dir: str):
    """Training-data decontamination: flag docs sharing any 13-token
    gram with the benchmark subset (doc_id < 10), gram set broadcast
    once via ray.put."""
    import pyarrow.compute as pc

    import ray.data

    from alp_ray.pipelines.dedup import benchmark_ngrams, decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    grams = benchmark_ngrams(
        docs, lambda b: pc.less(b.column("doc_id"), 10), n=13
    )
    return decontaminate(docs, grams, n=13)


# ------------------------------------------------- unrolled SQL twins --
#
# Iterative algorithms get DuckDB oracles by unrolling a FIXED number of
# synchronous updates as chained CTEs (the pattern proven by sssp_hops4 /
# the recursive-CTE CC oracle). FP care: every scalar expression mirrors
# the numpy kernel's operation ORDER (e.g. `val * (0.85 / c)` — scale
# first — and `s * (1.0/d)` for the Kamvar threshold), so both sides run
# the same IEEE ops; only reduction order differs, which the 6/7-decimal
# rounding absorbs (sums are exact integers in labelprop/LPA).

_E_SPARSE601 = (
    "SELECT DISTINCT l_orderkey % {m} AS src, "
    "(l_partkey * 7 + l_suppkey) % {m} AS dst "
    "FROM lineitem WHERE l_linenumber = 1 "
    "AND l_orderkey % {m} != (l_partkey * 7 + l_suppkey) % {m}"
).format(m=MOD_DENSE)


def _q_weighted_pagerank(sf_dir: str):
    """Weighted PageRank (transition ∝ edge weight) over the dense
    weighted graph: fixed 20 plus_times power steps."""
    from alp_ray.pipelines.pagerank import weighted_pagerank
    from alp_ray.state.engine import GraphEngine

    engine = GraphEngine.from_dataset(
        _dense_edges(sf_dir, weighted=True), n=MOD_DENSE, P=4,
        weighted=True,
    )
    weighted_pagerank(engine, max_iters=_PR_K, sync_every=_PR_K)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    return pa.table(
        {
            "vertex": pa.array(np.arange(MOD_DENSE, dtype=np.int64)),
            "pr": pa.array(_round_half_away(pr, 7)),
        }
    )


def _weighted_pagerank_sql(K: int) -> str:
    """_pagerank_sql with outdeg → Σweight and each edge contributing
    (pr·(α/wsum))·weight in the engine's multiply order."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_WEIGHTED}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "ws AS MATERIALIZED (SELECT src, SUM(weight) AS c FROM e "
        "GROUP BY src), ",
        f"pr0 AS MATERIALIZED (SELECT v, CAST(1.0/{MOD_DENSE} AS DOUBLE) "
        "AS val FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"pr{k - 1}"
        parts.append(
            f", pr{k} AS MATERIALIZED (SELECT v.v AS v, "
            "COALESCE(y.s, 0.0) + (0.85 * COALESCE((SELECT SUM(p.val) "
            f"FROM {p} p LEFT JOIN ws d ON d.src = p.v "
            "WHERE d.src IS NULL), 0.0) + (1.0 - 0.85)) "
            f"/ {MOD_DENSE}.0 AS val "
            "FROM verts v LEFT JOIN ("
            "SELECT e.dst AS v, SUM(p.val * (0.85 / d.c) * e.weight) AS s "
            f"FROM {p} p JOIN e ON e.src = p.v "
            "JOIN ws d ON d.src = p.v "
            "GROUP BY e.dst) y ON y.v = v.v)"
        )
    parts.append(f" SELECT v AS vertex, ROUND(val, 7) AS pr FROM pr{K}")
    return "".join(parts)


def _pagerank_sql(K: int) -> str:
    """simple_pagerank semantics (α=0.85, dangling mass, uniform
    teleport), K unrolled power steps — matches _q_pagerank's fixed-K
    run step for step."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM e "
        "GROUP BY src), ",
        f"pr0 AS MATERIALIZED (SELECT v, CAST(1.0/{MOD_DENSE} AS DOUBLE) "
        "AS val FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"pr{k - 1}"
        parts.append(
            f", pr{k} AS MATERIALIZED (SELECT v.v AS v, "
            "COALESCE(y.s, 0.0) + (0.85 * COALESCE((SELECT SUM(p.val) "
            f"FROM {p} p LEFT JOIN outdeg d ON d.src = p.v "
            "WHERE d.src IS NULL), 0.0) + (1.0 - 0.85)) "
            f"/ {MOD_DENSE}.0 AS val "
            "FROM verts v LEFT JOIN ("
            "SELECT e.dst AS v, SUM(p.val * (0.85 / d.c)) AS s "
            f"FROM {p} p JOIN e ON e.src = p.v "
            "JOIN outdeg d ON d.src = p.v "
            "GROUP BY e.dst) y ON y.v = v.v)"
        )
    parts.append(f" SELECT v AS vertex, ROUND(val, 7) AS pr FROM pr{K}")
    return "".join(parts)


def _hits_sql(K: int) -> str:
    """HITS twin: 2K half-steps unrolled, mirroring the engine's FP
    shape exactly — scale AFTER the edge sum (one multiply), norm
    1.0/sqrt(Σval²), final self-normalization of both vectors."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "h0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS val "
        "FROM verts)",
    ]
    for k in range(1, K + 1):
        parts.append(
            f", a{k} AS MATERIALIZED (SELECT v.v AS v, "
            f"COALESCE(y.s, 0.0) * (SELECT 1.0/sqrt(SUM(val*val)) "
            f"FROM h{k - 1}) AS val "
            "FROM verts v LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.val) AS s FROM h{k - 1} p "
            "JOIN e ON e.src = p.v GROUP BY e.dst) y ON y.v = v.v)"
        )
        parts.append(
            f", h{k} AS MATERIALIZED (SELECT v.v AS v, "
            f"COALESCE(y.s, 0.0) * (SELECT 1.0/sqrt(SUM(val*val)) "
            f"FROM a{k}) AS val "
            "FROM verts v LEFT JOIN ("
            f"SELECT e.src AS v, SUM(p.val) AS s FROM a{k} p "
            "JOIN e ON e.dst = p.v GROUP BY e.src) y ON y.v = v.v)"
        )
    parts.append(
        " SELECT v.v AS vertex, "
        f"ROUND(a.val * (SELECT 1.0/sqrt(SUM(val*val)) FROM a{K}), 6) "
        "AS auth, "
        f"ROUND(h.val * (SELECT 1.0/sqrt(SUM(val*val)) FROM h{K}), 6) "
        "AS hub "
        f"FROM verts v JOIN a{K} a ON a.v = v.v JOIN h{K} h ON h.v = v.v"
    )
    return "".join(parts)


def _katz_sql(K: int) -> str:
    """Katz twin: K unrolled steps of α·(in-edge sum) + 1 from x₀ = 0,
    mirroring _q_katz expression for expression (α is 2⁻⁹ — the decimal
    literal converts to double exactly, and the multiply is exact)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "x0 AS MATERIALIZED (SELECT v, CAST(0.0 AS DOUBLE) AS val "
        "FROM verts)",
    ]
    for k in range(1, K + 1):
        parts.append(
            f", x{k} AS MATERIALIZED (SELECT v.v AS v, "
            f"{_KATZ_ALPHA!r} * COALESCE(y.s, 0.0) + 1.0 AS val "
            "FROM verts v LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.val) AS s FROM x{k - 1} p "
            "JOIN e ON e.src = p.v GROUP BY e.dst) y ON y.v = v.v)"
        )
    parts.append(
        f" SELECT v AS vertex, ROUND(val, 6) AS katz FROM x{K}"
    )
    return "".join(parts)


def _eigc_sql(K: int) -> str:
    """Eigenvector-centrality twin: the _hits_sql authority chain
    alone — scale AFTER the edge sum by the input's 1.0/sqrt(Σval²),
    final self-normalization."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "x0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS val "
        "FROM verts)",
    ]
    for k in range(1, K + 1):
        parts.append(
            f", x{k} AS MATERIALIZED (SELECT v.v AS v, "
            f"COALESCE(y.s, 0.0) * (SELECT 1.0/sqrt(SUM(val*val)) "
            f"FROM x{k - 1}) AS val "
            "FROM verts v LEFT JOIN ("
            f"SELECT e.dst AS v, SUM(p.val) AS s FROM x{k - 1} p "
            "JOIN e ON e.src = p.v GROUP BY e.dst) y ON y.v = v.v)"
        )
    parts.append(
        " SELECT v.v AS vertex, "
        f"ROUND(x.val * (SELECT 1.0/sqrt(SUM(val*val)) FROM x{K}), 6) "
        "AS eigc "
        f"FROM verts v JOIN x{K} x ON x.v = v.v"
    )
    return "".join(parts)


def _bfs_closure_ctes(L: int) -> str:
    """Shared unrolled multi-source BFS closure (anti-join discovery,
    integer levels): CTE chain ending in ``v{L}(s, v, lvl)``."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    src_list = ", ".join(str(s) for s in _HC_SOURCES)
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_SPARSE})), ",
        f"srcs AS MATERIALIZED (SELECT unnest([{src_list}])::BIGINT "
        "AS s), ",
        "v0 AS MATERIALIZED (SELECT s, s AS v, 0 AS lvl FROM srcs), ",
        "f0 AS MATERIALIZED (SELECT * FROM v0)",
    ]
    for l in range(1, L + 1):
        parts.append(
            f", n{l} AS MATERIALIZED (SELECT DISTINCT f.s, e.dst AS v, "
            f"{l} AS lvl FROM f{l - 1} f JOIN es e ON e.src = f.v "
            f"LEFT JOIN v{l - 1} vi ON vi.s = f.s AND vi.v = e.dst "
            "WHERE vi.v IS NULL)"
            f", v{l} AS MATERIALIZED (SELECT * FROM v{l - 1} "
            f"UNION ALL SELECT * FROM n{l})"
            f", f{l} AS MATERIALIZED (SELECT * FROM n{l})"
        )
    return "".join(parts)


def _harmonic_sql(L: int) -> str:
    """BFS closure, then hc(v) = Σ_s 1/lvl."""
    return _bfs_closure_ctes(L) + (
        " SELECT vt.v AS vertex, ROUND(COALESCE(h.hsum, 0.0), 6) AS hc "
        "FROM verts vt LEFT JOIN ("
        f"SELECT v, SUM(1.0/lvl) AS hsum FROM v{L} WHERE lvl > 0 "
        "GROUP BY v) h ON h.v = vt.v"
    )


def _ecc_sql(L: int) -> str:
    """BFS closure, then per-source max level + reachable count."""
    return _bfs_closure_ctes(L) + (
        f" SELECT s AS source, MAX(lvl) AS ecc, "
        f"COUNT(*) AS n_reached FROM v{L} GROUP BY s"
    )


def _ngram_pair_ctes() -> str:
    """CTE chain ending in ``j(id_a, id_b, jac)`` — exact all-pairs
    5-gram Jaccard reproducing ``_shingles``' polynomial byte-window
    hash (shared by the ngram_jaccard and dedup_clusters twins)."""
    return (
        "norm AS MATERIALIZED (SELECT doc_id, "
        "lower(trim(regexp_replace(text, '[ \\t\\n\\r\\f]+', ' ', "
        "'g'))) AS t FROM documents), "
        "sh AS MATERIALIZED (SELECT DISTINCT doc_id, "
        "(ascii(substr(t, i, 1))::BIGINT "
        "+ ascii(substr(t, i + 1, 1))::BIGINT * 257 "
        "+ ascii(substr(t, i + 2, 1))::BIGINT * 66049 "
        "+ ascii(substr(t, i + 3, 1))::BIGINT * 16974593 "
        "+ ascii(substr(t, i + 4, 1))::BIGINT * 67503107) "
        "% 2147483647 AS h "
        "FROM norm, UNNEST(range(1, length(t) - 3)) AS u(i)), "
        "sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz "
        "FROM sh GROUP BY doc_id), "
        "inter AS MATERIALIZED (SELECT a.doc_id AS id_a, "
        "b.doc_id AS id_b, COUNT(*) AS i FROM sh a "
        "JOIN sh b ON b.h = a.h AND b.doc_id > a.doc_id "
        "GROUP BY 1, 2), "
        "j AS (SELECT id_a, id_b, CAST(i AS DOUBLE) "
        "/ (sa.sz + sb.sz - i) AS jac FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a "
        "JOIN sizes sb ON sb.doc_id = id_b)"
    )


def _dedup_clusters_sql(K: int) -> str:
    """Unrolled max-label propagation over the symmetric exact-Jaccard
    pair graph (K rounds, idempotent), then keep docs that are not a
    non-canonical cluster member."""
    parts = [
        f"WITH {_ngram_pair_ctes()}, ",
        "p AS MATERIALIZED (SELECT id_a, id_b FROM j "
        "WHERE jac >= 0.5), ",
        "es AS MATERIALIZED (SELECT id_a AS v, id_b AS w FROM p "
        "UNION SELECT id_b AS v, id_a AS w FROM p), ",
        "l0 AS MATERIALIZED (SELECT DISTINCT v, v AS lbl FROM es)",
    ]
    for k in range(1, K + 1):
        parts.append(
            f", l{k} AS MATERIALIZED (SELECT v, MAX(lbl) AS lbl FROM ("
            f"SELECT v, lbl FROM l{k - 1} "
            f"UNION ALL SELECT e.v, l.lbl FROM es e "
            f"JOIN l{k - 1} l ON l.v = e.w) GROUP BY v)"
        )
    parts.append(
        " SELECT doc_id FROM documents WHERE doc_id NOT IN ("
        f"SELECT v FROM l{K} WHERE lbl <> v)"
    )
    return "".join(parts)


def _corpus_edges_cte() -> str:
    """Shared CTE prefix: parquet corpus → line split → per-language
    regexp import extraction → DISTINCT string edge table. Mirrors
    ImportExtractor (stages/extract.py) line for line: one import per
    line, anchored patterns, py module → path rewrite."""
    p = _corpus_oracle_parquet()
    return (
        "lines AS MATERIALIZED (SELECT repo, path, lang, "
        "UNNEST(string_split(content, chr(10))) AS line "
        f"FROM read_parquet('{p}')), "
        "hits AS MATERIALIZED (SELECT repo, path AS src_path, CASE "
        "WHEN lang = 'py' AND regexp_matches(line, "
        "'^import [A-Za-z0-9_.]+\\s*$') THEN "
        "replace(regexp_extract(line, "
        "'^import ([A-Za-z0-9_.]+)\\s*$', 1), '.', '/') || '.py' "
        "WHEN lang = 'js' AND regexp_matches(line, "
        "'require\\(''\\./[^'']+''\\)') THEN "
        "regexp_extract(line, 'require\\(''\\./([^'']+)''\\)', 1) "
        "WHEN lang = 'c' AND regexp_matches(line, "
        "'^#include \"[^\"]+\"\\s*$') THEN "
        "regexp_extract(line, '^#include \"([^\"]+)\"\\s*$', 1) "
        "END AS dst_path FROM lines), "
        "e AS MATERIALIZED (SELECT DISTINCT repo, src_path, dst_path "
        "FROM hits WHERE dst_path IS NOT NULL)"
    )


def _corpus_extract_sql() -> str:
    return (
        f"WITH {_corpus_edges_cte()} "
        "SELECT repo, src_path, dst_path FROM e"
    )


def _corpus_pagerank_sql(K: int) -> str:
    """simple_pagerank over the corpus import graph, string-keyed —
    exactly _pagerank_sql's unrolled recurrence but with (repo, path)
    vertices restricted to the edge table's endpoint set (the engine's
    vertex universe is the dense-id mapping built FROM the edges)."""
    parts = [
        f"WITH {_corpus_edges_cte()}, ",
        "verts AS MATERIALIZED (SELECT repo, p FROM ("
        "SELECT repo, src_path AS p FROM e "
        "UNION SELECT repo, dst_path AS p FROM e)), ",
        "nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts), ",
        "outdeg AS MATERIALIZED (SELECT repo, src_path AS p, "
        "COUNT(*) AS c FROM e GROUP BY 1, 2), ",
        "pr0 AS MATERIALIZED (SELECT repo, p, "
        "1.0 / (SELECT n FROM nv) AS val FROM verts)",
    ]
    for k in range(1, K + 1):
        pp = f"pr{k - 1}"
        parts.append(
            f", pr{k} AS MATERIALIZED (SELECT v.repo, v.p, "
            "COALESCE(y.s, 0.0) + (0.85 * COALESCE((SELECT SUM(pp.val) "
            f"FROM {pp} pp LEFT JOIN outdeg d "
            "ON d.repo = pp.repo AND d.p = pp.p "
            "WHERE d.p IS NULL), 0.0) + (1.0 - 0.85)) "
            "/ (SELECT CAST(n AS DOUBLE) FROM nv) AS val "
            "FROM verts v LEFT JOIN ("
            "SELECT e.repo, e.dst_path AS p, "
            "SUM(pp.val * (0.85 / d.c)) AS s "
            f"FROM {pp} pp JOIN e "
            "ON e.repo = pp.repo AND e.src_path = pp.p "
            "JOIN outdeg d ON d.repo = pp.repo AND d.p = pp.p "
            "GROUP BY e.repo, e.dst_path) y "
            "ON y.repo = v.repo AND y.p = v.p)"
        )
    parts.append(
        f" SELECT repo, p AS path, ROUND(val, 7) AS pr FROM pr{K}"
    )
    return "".join(parts)


def _corpus_components_sql(K: int) -> str:
    """Connected components on the symmetrized import graph via
    min-label propagation over 'repo:path' strings, K ≥ diameter rounds
    (4 suffice; min-label is idempotent at the fixpoint, so extra
    rounds are exact no-ops). Labels ARE the canonical representative
    (component-minimum member string) the Ray query emits."""
    parts = [
        f"WITH {_corpus_edges_cte()}, ",
        "es AS MATERIALIZED (SELECT repo, src_path AS a, dst_path AS b "
        "FROM e UNION SELECT repo, dst_path, src_path FROM e), ",
        "verts AS MATERIALIZED (SELECT repo, p FROM ("
        "SELECT repo, src_path AS p FROM e "
        "UNION SELECT repo, dst_path AS p FROM e)), ",
        "c0 AS MATERIALIZED (SELECT repo, p, "
        "repo || ':' || p AS lbl FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"c{k - 1}"
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT c.repo, c.p, "
            "LEAST(c.lbl, COALESCE(m.ml, c.lbl)) AS lbl "
            f"FROM {p} c LEFT JOIN ("
            "SELECT es.repo, es.b AS p, MIN(cc.lbl) AS ml "
            f"FROM {p} cc JOIN es "
            "ON es.repo = cc.repo AND es.a = cc.p "
            "GROUP BY es.repo, es.b) m "
            "ON m.repo = c.repo AND m.p = c.p)"
        )
    parts.append(
        f" SELECT repo, p AS path, lbl AS component FROM c{K}"
    )
    return "".join(parts)


# HPCG twin: 8³ fine / 4³ coarse 27-point grids are sf-independent
# constants (like the corpus), so the whole V-cycle / preconditioned-CG
# recurrence unrolls into CTEs mirroring the engine's exact op order.
_HPCG_FINE = 8
_HPCG_PCG_K = 4


def _hpcg_grid_cte(tag: str, s: int) -> str:
    """co{tag}: grid coords; e{tag}: 27-point box-halo entries
    (diag 26, off-diag -1) for an s×s×s grid, index x-fastest."""
    n = s * s * s
    return (
        f"co{tag} AS MATERIALIZED (SELECT range::BIGINT AS i, "
        f"(range % {s})::BIGINT AS x, "
        f"((range // {s}) % {s})::BIGINT AS y, "
        f"(range // {s * s})::BIGINT AS z FROM range({n})), "
        f"e{tag} AS MATERIALIZED (SELECT a.i AS src, b.i AS dst, "
        "CASE WHEN a.i = b.i THEN 26.0 ELSE -1.0 END AS w "
        f"FROM co{tag} a JOIN co{tag} b ON abs(a.x - b.x) <= 1 "
        "AND abs(a.y - b.y) <= 1 AND abs(a.z - b.z) <= 1)"
    )


def _hpcg_smoother_steps(
    parts: list[str], z_in: str, prefix: str, tag: str, r_cte: str
) -> str:
    """Append one smoother run (forward 0,1 then backward 1,0 — each
    color step: full y = A·z, then z[i%2==c] = (r−y+z·26)/26)."""
    cur = z_in
    for k, c in enumerate((0, 1, 1, 0)):
        y = f"{prefix}y{k}"
        nxt = f"{prefix}z{k}"
        parts.append(
            f", {y} AS MATERIALIZED (SELECT e{tag}.src AS i, "
            f"SUM(z.v * e{tag}.w) AS y FROM {cur} z "
            f"JOIN e{tag} ON e{tag}.dst = z.i GROUP BY e{tag}.src)"
            f", {nxt} AS MATERIALIZED (SELECT z.i, "
            f"CASE WHEN z.i % 2 = {c} THEN "
            f"(r.v - y.y + z.v * 26.0) / 26.0 ELSE z.v END AS v "
            f"FROM {cur} z JOIN {y} y ON y.i = z.i "
            f"JOIN {r_cte} r ON r.i = z.i)"
        )
        cur = nxt
    return cur


def _hpcg_vcycle_ctes(
    parts: list[str], prefix: str, rf_cte: str, s: int
) -> str:
    """Append one 2-level V-cycle reading fine residual ``rf_cte``;
    returns the name of the final fine-z CTE. Grid CTEs co/e for tags
    'f'/'c' must already be in ``parts``."""
    n = s * s * s
    cs = s // 2
    parts.append(
        f", {prefix}zinit AS MATERIALIZED (SELECT range::BIGINT AS i, "
        f"0.0 AS v FROM range({n}))"
    )
    zpre = _hpcg_smoother_steps(
        parts, f"{prefix}zinit", f"{prefix}pre", "f", rf_cte
    )
    # r_c = R·(r − A·z) at injection points fi = 2x + 2s·y + 2s²·z.
    parts.append(
        f", {prefix}axz AS MATERIALIZED (SELECT ef.src AS i, "
        f"SUM(z.v * ef.w) AS y FROM {zpre} z "
        "JOIN ef ON ef.dst = z.i GROUP BY ef.src)"
        f", {prefix}cmap AS MATERIALIZED (SELECT range::BIGINT AS ci, "
        f"(2 * (range % {cs}) + {2 * s} * ((range // {cs}) % {cs}) "
        f"+ {2 * s * s} * (range // {cs * cs}))::BIGINT AS fi "
        f"FROM range({cs * cs * cs}))"
        f", {prefix}rc AS MATERIALIZED (SELECT c.ci AS i, "
        f"r.v - a.y AS v FROM {prefix}cmap c "
        f"JOIN {rf_cte} r ON r.i = c.fi "
        f"JOIN {prefix}axz a ON a.i = c.fi)"
        f", {prefix}zcinit AS MATERIALIZED (SELECT range::BIGINT AS i, "
        f"0.0 AS v FROM range({cs * cs * cs}))"
    )
    zc = _hpcg_smoother_steps(
        parts, f"{prefix}zcinit", f"{prefix}crs", "c", f"{prefix}rc"
    )
    parts.append(
        f", {prefix}zp AS MATERIALIZED (SELECT z.i, "
        f"CASE WHEN c.ci IS NOT NULL THEN z.v + zc.v ELSE z.v END AS v "
        f"FROM {zpre} z LEFT JOIN {prefix}cmap c ON c.fi = z.i "
        f"LEFT JOIN {zc} zc ON zc.i = c.ci)"
    )
    return _hpcg_smoother_steps(
        parts, f"{prefix}zp", f"{prefix}post", "f", rf_cte
    )


def _hpcg_vcycle_sql() -> str:
    s = _HPCG_FINE
    n = s * s * s
    parts = [
        f"WITH {_hpcg_grid_cte('f', s)}, {_hpcg_grid_cte('c', s // 2)}, ",
        "rf AS MATERIALIZED (SELECT range::BIGINT AS i, "
        f"CAST((range % 9) + 1 AS DOUBLE) / 10.0 AS v FROM range({n}))",
    ]
    zf = _hpcg_vcycle_ctes(parts, "m", "rf", s)
    parts.append(f" SELECT i AS vertex, ROUND(v, 6) AS z FROM {zf}")
    return "".join(parts)


def _hpcg_pcg_sql(K: int) -> str:
    """Full preconditioned CG (hpcg.hpp:97), K iterations, one V-cycle
    per iteration; scalar collectives as scalar subqueries."""
    s = _HPCG_FINE
    n = s * s * s
    parts = [
        f"WITH {_hpcg_grid_cte('f', s)}, {_hpcg_grid_cte('c', s // 2)}, ",
        "b AS MATERIALIZED (SELECT range::BIGINT AS i, "
        f"CAST((range % 7) + 1 AS DOUBLE) / 10.0 AS v FROM range({n})), ",
        # x₀ = 0 → r₀ = b.
        "x0 AS MATERIALIZED (SELECT i, 0.0 AS v FROM b), "
        "r0 AS MATERIALIZED (SELECT i, v FROM b)",
    ]
    for k in range(1, K + 1):
        zf = _hpcg_vcycle_ctes(parts, f"i{k}", f"r{k - 1}", s)
        parts.append(
            f", rz{k} AS MATERIALIZED (SELECT "
            f"(SELECT SUM(r.v * z.v) FROM r{k - 1} r "
            f"JOIN {zf} z ON z.i = r.i) AS v)"
        )
        if k == 1:
            parts.append(
                f", p1 AS MATERIALIZED (SELECT i, v FROM {zf})"
            )
        else:
            parts.append(
                f", p{k} AS MATERIALIZED (SELECT p.i, "
                f"((SELECT v FROM rz{k}) / (SELECT v FROM rz{k - 1})) "
                f"* p.v + z.v AS v FROM p{k - 1} p "
                f"JOIN {zf} z ON z.i = p.i)"
            )
        parts.append(
            f", ap{k} AS MATERIALIZED (SELECT ef.src AS i, "
            f"SUM(p.v * ef.w) AS y FROM p{k} p "
            "JOIN ef ON ef.dst = p.i GROUP BY ef.src)"
            f", al{k} AS MATERIALIZED (SELECT "
            f"(SELECT v FROM rz{k}) / (SELECT SUM(p.v * a.y) "
            f"FROM p{k} p JOIN ap{k} a ON a.i = p.i) AS v)"
            f", x{k} AS MATERIALIZED (SELECT x.i, "
            f"x.v + (SELECT v FROM al{k}) * p.v AS v "
            f"FROM x{k - 1} x JOIN p{k} p ON p.i = x.i)"
            f", r{k} AS MATERIALIZED (SELECT r.i, "
            f"r.v + (-(SELECT v FROM al{k})) * a.y AS v "
            f"FROM r{k - 1} r JOIN ap{k} a ON a.i = r.i)"
        )
    parts.append(
        f" SELECT i AS vertex, ROUND(v, 6) AS x FROM x{K}"
    )
    return "".join(parts)


def _ppr_sql(K: int) -> str:
    """Personalized PageRank twin: like _pagerank_sql but the teleport /
    dangling offset is scaled by the per-vertex teleport value instead
    of the uniform 1/n (pr_new = y + coef·t[v], coef NOT divided by n)."""
    tv = (
        f"CASE WHEN v.v < {_PPR_SEEDS} THEN 1.0 / {_PPR_SEEDS} "
        "ELSE 0.0 END"
    )
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM e "
        "GROUP BY src), ",
        f"pr0 AS MATERIALIZED (SELECT v, CAST(1.0/{MOD_DENSE} AS DOUBLE) "
        "AS val FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"pr{k - 1}"
        parts.append(
            f", pr{k} AS MATERIALIZED (SELECT v.v AS v, "
            "COALESCE(y.s, 0.0) + (0.85 * COALESCE((SELECT SUM(p.val) "
            f"FROM {p} p LEFT JOIN outdeg d ON d.src = p.v "
            "WHERE d.src IS NULL), 0.0) + (1.0 - 0.85)) "
            f"* ({tv}) AS val "
            "FROM verts v LEFT JOIN ("
            "SELECT e.dst AS v, SUM(p.val * (0.85 / d.c)) AS s "
            f"FROM {p} p JOIN e ON e.src = p.v "
            "JOIN outdeg d ON d.src = p.v "
            "GROUP BY e.dst) y ON y.v = v.v)"
        )
    parts.append(f" SELECT v AS vertex, ROUND(val, 7) AS pr FROM pr{K}")
    return "".join(parts)


def _labelprop_sql(K: int) -> str:
    """Kamvar thresholded propagation over the symmetric weighted sparse
    graph, K unrolled steps (fixpoint-idempotent, so K ≥ the Ray side's
    early-converged iteration count also matches)."""
    es = (
        "SELECT src, dst, CAST((src + dst) % 10 + 1 AS DOUBLE) AS weight "
        f"FROM (SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE}))"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_SPARSE})), ",
        "dsum AS MATERIALIZED (SELECT dst AS v, SUM(weight) AS d FROM es "
        "GROUP BY dst), ",
        "f0 AS MATERIALIZED (SELECT v, CASE WHEN v < 20 "
        "THEN CAST(v % 2 AS DOUBLE) ELSE 0.0 END AS f FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"f{k - 1}"
        parts.append(
            f", f{k} AS MATERIALIZED (SELECT v.v AS v, "
            "CASE WHEN v.v < 20 THEN CAST(v.v % 2 AS DOUBLE) "
            "WHEN COALESCE(y.s, 0.0) * COALESCE(1.0 / d.d, 0.0) >= 0.5 "
            "THEN 1.0 ELSE 0.0 END AS f "
            "FROM verts v "
            "LEFT JOIN (SELECT e.dst AS v, SUM(p.f * e.weight) AS s "
            f"FROM {p} p JOIN es e ON e.src = p.v GROUP BY e.dst) y "
            "ON y.v = v.v "
            "LEFT JOIN dsum d ON d.v = v.v)"
        )
    parts.append(
        f" SELECT v AS vertex, CAST(f AS BIGINT) AS label FROM f{K}"
    )
    return "".join(parts)


def _pregel_pagerank_sql(K: int) -> str:
    """pregel_pagerank (α=0.15, no dangling correction), K unrolled
    synchronous updates from score ≡ 1."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM e "
        "GROUP BY src), ",
        "s0 AS MATERIALIZED (SELECT v, CAST(1.0 AS DOUBLE) AS s "
        "FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"s{k - 1}"
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT v.v AS v, "
            "0.15 + (1.0 - 0.15) * COALESCE(m.s, 0.0) AS s "
            "FROM verts v LEFT JOIN ("
            "SELECT e.dst AS v, SUM(p.s / d.c) AS s "
            f"FROM {p} p JOIN e ON e.src = p.v "
            "JOIN outdeg d ON d.src = p.v GROUP BY e.dst) m "
            "ON m.v = v.v)"
        )
    parts.append(
        f" SELECT v AS vertex, ROUND(s, 6) AS score FROM s{K}"
    )
    return "".join(parts)


def _community_lpa_sql(K: int) -> str:
    """Synchronous community LPA (argmax in-neighbour label count, ties →
    smallest label, no-in-neighbour keeps), K unrolled steps."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE601}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE601})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"l{k - 1}"
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT e.dst AS v, p.lab AS lab, "
            "COUNT(*) AS c "
            f"FROM {p} p JOIN es e ON e.src = p.v GROUP BY e.dst, p.lab)"
            f", b{k} AS (SELECT v, lab, ROW_NUMBER() OVER "
            f"(PARTITION BY v ORDER BY c DESC, lab ASC) AS rn FROM c{k})"
            f", l{k} AS (SELECT v.v AS v, COALESCE(b.lab, p.lab) AS lab "
            "FROM verts v "
            f"LEFT JOIN (SELECT v, lab FROM b{k} WHERE rn = 1) b "
            "ON b.v = v.v "
            f"JOIN {p} p ON p.v = v.v)"
        )
    parts.append(f" SELECT v AS vertex, lab AS community FROM l{K}")
    return "".join(parts)


def _betweenness_sql(L: int) -> str:
    """Keyed (per-source) unrolled Brandes: L forward BFS steps
    (anti-join discovery, integer σ sums) then L backward dependency
    steps (the same IEEE δ expression as the engine kernel)."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    src_list = ", ".join(str(s) for s in _BC_SOURCES)
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_SPARSE})), ",
        f"srcs AS MATERIALIZED (SELECT unnest([{src_list}])::BIGINT "
        "AS s), ",
        "v0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS DOUBLE) "
        "AS sigma, 0 AS lvl FROM srcs), ",
        "f0 AS MATERIALIZED (SELECT * FROM v0)",
    ]
    for l in range(1, L + 1):
        parts.append(
            f", n{l} AS MATERIALIZED (SELECT f.s, e.dst AS v, "
            f"SUM(f.sigma) AS sigma, {l} AS lvl "
            f"FROM f{l - 1} f JOIN es e ON e.src = f.v "
            f"LEFT JOIN v{l - 1} vi ON vi.s = f.s AND vi.v = e.dst "
            "WHERE vi.v IS NULL GROUP BY f.s, e.dst)"
            f", v{l} AS MATERIALIZED (SELECT * FROM v{l - 1} "
            f"UNION ALL SELECT * FROM n{l})"
            f", f{l} AS MATERIALIZED (SELECT * FROM n{l})"
        )
    parts.append(
        f", b{L} AS MATERIALIZED (SELECT s, v, sigma, lvl, "
        f"CAST(0 AS DOUBLE) AS delta FROM v{L})"
    )
    for l in range(L, 0, -1):
        p = f"b{l}"
        parts.append(
            f", m{l} AS MATERIALIZED (SELECT w.s, e.dst AS v, "
            "SUM((1.0 + w.delta) / w.sigma) AS ms "
            f"FROM {p} w JOIN es e ON e.src = w.v WHERE w.lvl = {l} "
            "GROUP BY w.s, e.dst)"
            f", b{l - 1} AS MATERIALIZED (SELECT d.s, d.v, d.sigma, "
            "d.lvl, CASE WHEN d.lvl = "
            f"{l - 1} THEN d.delta + d.sigma * COALESCE(m.ms, 0.0) "
            "ELSE d.delta END AS delta "
            f"FROM {p} d LEFT JOIN m{l} m ON m.s = d.s AND m.v = d.v)"
        )
    parts.append(
        " SELECT vt.v AS vertex, ROUND(COALESCE(SUM("
        "CASE WHEN dd.v = dd.s THEN 0.0 ELSE dd.delta END), 0.0), 6) "
        "AS bc FROM verts vt LEFT JOIN b0 dd ON dd.v = vt.v "
        "GROUP BY vt.v"
    )
    return "".join(parts)


def _walks_sql(K: int) -> str:
    """Deterministic walks: per step a LEFT JOIN on the ROW_NUMBER
    neighbour rank selected by the same integer hash as the engine
    (dangling vertices absorb). All-integer ⇒ bit-exact."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_DENSE}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        "nbr AS MATERIALIZED (SELECT src, dst, "
        "ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn "
        "FROM e), ",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS c FROM e "
        "GROUP BY src), ",
        "w0 AS MATERIALIZED (SELECT v AS walk_id, v AS cur FROM verts)",
    ]
    for t in range(1, K + 1):
        p = f"w{t - 1}"
        parts.append(
            f", w{t} AS MATERIALIZED (SELECT w.walk_id, "
            "COALESCE(nb.dst, w.cur) AS cur "
            f"FROM {p} w "
            "LEFT JOIN deg d ON d.src = w.cur "
            "LEFT JOIN nbr nb ON nb.src = w.cur AND nb.rn = "
            f"((w.walk_id * 1000003 + {t} * 10007 + w.cur * 257) "
            "% 2147483647) % d.c)"
        )
    unions = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, cur AS vertex FROM w{t}"
        for t in range(0, K + 1)
    )
    parts.append(f" SELECT * FROM ({unions})")
    return "".join(parts)


def _coloring_sql(K: int) -> str:
    """Jones-Plassmann, K unrolled rounds, all-integer (bit-exact):
    per round a masked max over uncolored neighbours selects the local
    priority maxima, then each selected vertex takes the mex of its
    colored neighbours' colors (candidate anti-join)."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        f"verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_SPARSE})), ",
        # splitmix-style priority key, packed (prio26, id26) — mirrors
        # alp_ray.pipelines.coloring._priority_key exactly.
        "keys AS MATERIALIZED (SELECT v, "
        "(xor(x1, x1 >> 29) % 67108864) * 67108864 + v AS key FROM ("
        "SELECT v, CAST(((CAST(v AS HUGEINT) * 11400714819323198485) "
        "% 18446744073709551616) % 9223372036854775808 AS BIGINT) AS x1 "
        "FROM verts)), ",
        "c0 AS MATERIALIZED (SELECT v, CAST(-1 AS BIGINT) AS color "
        "FROM verts)",
    ]
    for k in range(1, K + 1):
        p = f"c{k - 1}"
        parts.append(
            f", mx{k} AS MATERIALIZED (SELECT e.dst AS v, "
            f"MAX(kk.key) AS mx FROM es e JOIN {p} cu ON cu.v = e.src "
            "AND cu.color < 0 JOIN keys kk ON kk.v = e.src "
            "GROUP BY e.dst)"
            f", sel{k} AS MATERIALIZED (SELECT c.v FROM {p} c "
            "JOIN keys kk ON kk.v = c.v "
            f"LEFT JOIN mx{k} m ON m.v = c.v "
            "WHERE c.color < 0 AND kk.key > COALESCE(m.mx, -1))"
            f", nc{k} AS MATERIALIZED (SELECT s.v, MIN(r.c) AS color "
            f"FROM sel{k} s CROSS JOIN "
            "(SELECT range::BIGINT AS c FROM range(128)) r "
            "WHERE NOT EXISTS (SELECT 1 FROM es e "
            f"JOIN {p} cc ON cc.v = e.src "
            "WHERE e.dst = s.v AND cc.color = r.c) GROUP BY s.v)"
            f", c{k} AS MATERIALIZED (SELECT c.v, "
            f"COALESCE(n.color, c.color) AS color FROM {p} c "
            f"LEFT JOIN nc{k} n ON n.v = c.v)"
        )
    parts.append(f" SELECT v AS vertex, color FROM c{K}")
    return "".join(parts)


def _bicgstab_sql(K: int) -> str:
    """BiCGstab on the nonsymmetric A = W + diag(1 + row sums), K
    unrolled steps. Scalars (rho/beta/alpha/omega) live in single-row
    CTEs (scalar subqueries = the allreduce); every vector update
    mirrors the engine kernel's FP op order."""
    parts = [
        f"WITH verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        f"ew AS MATERIALIZED ({_E_WEIGHTED}), ",
        "A AS MATERIALIZED (SELECT src, dst, "
        "CAST(SUM(weight) AS DOUBLE) AS weight FROM ("
        "SELECT src, dst, weight FROM ew "
        "UNION ALL SELECT v AS src, v AS dst, 1.0 AS weight FROM verts "
        "UNION ALL SELECT src, src AS dst, weight FROM ew"
        ") GROUP BY 1, 2), ",
        "b AS MATERIALIZED (SELECT v, "
        f"CAST((v % 7) + 1 AS DOUBLE) / {MOD_DENSE} AS val FROM verts), ",
        # state s0: x, r, p, vv (rhat == b throughout)
        "s0 AS MATERIALIZED (SELECT v, 0.0 AS x, val AS r, 0.0 AS p, "
        "0.0 AS vv FROM b), ",
        "sc0 AS MATERIALIZED (SELECT 1.0 AS rho, 1.0 AS alpha, "
        "1.0 AS omega)",
    ]
    for k in range(1, K + 1):
        p = f"s{k - 1}"
        sc = f"sc{k - 1}"
        parts.append(
            # rho_new = rhat·r ; beta = (rho_new/rho)·(alpha/omega)
            f", r1_{k} AS MATERIALIZED (SELECT "
            f"(SELECT SUM(b.val * s.r) FROM {p} s "
            "JOIN b ON b.v = s.v) AS rho_new)"
            f", be_{k} AS MATERIALIZED (SELECT "
            f"((SELECT rho_new FROM r1_{k}) / (SELECT rho FROM {sc})) "
            f"* ((SELECT alpha FROM {sc}) / (SELECT omega FROM {sc})) "
            "AS beta)"
            # p = r + beta*(p - omega*vv)
            f", p_{k} AS MATERIALIZED (SELECT v, "
            f"r + (SELECT beta FROM be_{k}) "
            f"* (p - (SELECT omega FROM {sc}) * vv) AS p "
            f"FROM {p})"
            # vv = A p
            f", v_{k} AS MATERIALIZED (SELECT A.src AS v, "
            f"SUM(p.p * A.weight) AS vv FROM p_{k} p "
            "JOIN A ON A.dst = p.v GROUP BY A.src)"
            # alpha = rho_new / (rhat·vv)
            f", al_{k} AS MATERIALIZED (SELECT "
            f"(SELECT rho_new FROM r1_{k}) / "
            f"(SELECT SUM(b.val * v.vv) FROM v_{k} v "
            "JOIN b ON b.v = v.v) AS alpha)"
            # s = r - alpha*vv
            f", sv_{k} AS MATERIALIZED (SELECT s.v, "
            f"s.r - (SELECT alpha FROM al_{k}) * v.vv AS s "
            f"FROM {p} s JOIN v_{k} v ON v.v = s.v)"
            # t = A s
            f", t_{k} AS MATERIALIZED (SELECT A.src AS v, "
            f"SUM(s.s * A.weight) AS t FROM sv_{k} s "
            "JOIN A ON A.dst = s.v GROUP BY A.src)"
            # omega = (t·s)/(t·t)
            f", om_{k} AS MATERIALIZED (SELECT "
            f"(SELECT SUM(t.t * s.s) FROM t_{k} t "
            f"JOIN sv_{k} s ON s.v = t.v) / "
            f"(SELECT SUM(t.t * t.t) FROM t_{k} t) AS omega)"
            # x = x + alpha*p + omega*s ; r = s - omega*t
            f", s{k} AS MATERIALIZED (SELECT o.v, "
            f"o.x + (SELECT alpha FROM al_{k}) * p.p "
            f"+ (SELECT omega FROM om_{k}) * s.s AS x, "
            f"s.s - (SELECT omega FROM om_{k}) * t.t AS r, "
            "p.p AS p, v.vv AS vv "
            f"FROM {p} o JOIN p_{k} p ON p.v = o.v "
            f"JOIN sv_{k} s ON s.v = o.v JOIN t_{k} t ON t.v = o.v "
            f"JOIN v_{k} v ON v.v = o.v)"
            f", sc{k} AS MATERIALIZED (SELECT "
            f"(SELECT rho_new FROM r1_{k}) AS rho, "
            f"(SELECT alpha FROM al_{k}) AS alpha, "
            f"(SELECT omega FROM om_{k}) AS omega)"
        )
    parts.append(f" SELECT v AS vertex, ROUND(x, 6) AS x FROM s{K}")
    return "".join(parts)


def _bicgstab_complex_sql(K: int) -> str:
    """Twin of `_q_bicgstab_complex`: K unrolled COMPLEX BiCGstab steps
    over (re, im) column pairs. Every complex scalar op mirrors the
    engine's explicit naive formulas (`_cmul`/`_cdiv` in
    alp_ray/pipelines/linalg.py — never Python's Smith-scaled builtin),
    every order-sensitive SUM is a sequential ``list_sum`` (thread-
    invariant), and dots are conjugate-left (ρ = r̂ᴴr, ω = tᴴs/tᴴt)
    with r̂ = b throughout. Engine-vs-twin summation-order drift is
    absorbed by ROUND(·, 6) under the query's asserted half-boundary
    margin."""
    n = MOD_CPLX

    def cdot(left_re, left_im, tbl, re_col, im_col, join):
        """Conjugate-left complex dot ⟨left, right⟩ as (re, im) SQL
        expression pair, plane sums sequential like the engine's
        (uᵣ·vᵣ + uᵢ·vᵢ, uᵣ·vᵢ − uᵢ·vᵣ)."""
        re = (
            f"(SELECT list_sum(list({left_re} * {re_col} ORDER BY s.v)) "
            f"FROM {tbl} s {join}) + "
            f"(SELECT list_sum(list({left_im} * {im_col} ORDER BY s.v)) "
            f"FROM {tbl} s {join})"
        )
        im = (
            f"(SELECT list_sum(list({left_re} * {im_col} ORDER BY s.v)) "
            f"FROM {tbl} s {join}) - "
            f"(SELECT list_sum(list({left_im} * {re_col} ORDER BY s.v)) "
            f"FROM {tbl} s {join})"
        )
        return re, im

    bjoin = "JOIN b ON b.v = s.v"
    parts = [
        f"WITH verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({n})), ",
        f"ew AS MATERIALIZED (SELECT src, dst, "
        "CAST((src + dst) % 10 + 1 AS DOUBLE) AS cr, "
        "CAST((2 * src + dst) % 7 - 3 AS DOUBLE) AS ci "
        f"FROM ({_E_CPLX})), ",
        # Complex entries (r=row, c=col): off-diag + base diag 1 +
        # row-dominance diag — integer-valued, sums exact in any order.
        "A AS MATERIALIZED (SELECT r, c, "
        "CAST(SUM(cr) AS DOUBLE) AS cr, CAST(SUM(ci) AS DOUBLE) AS ci "
        "FROM ("
        "SELECT src AS r, dst AS c, cr, ci FROM ew "
        "UNION ALL SELECT v, v, 1.0, 0.0 FROM verts "
        "UNION ALL SELECT src, src, ABS(cr) + ABS(ci), 0.0 FROM ew"
        ") GROUP BY 1, 2), ",
        "b AS MATERIALIZED (SELECT v, "
        f"CAST((v % 7) + 1 AS DOUBLE) / {n} AS br, "
        f"CAST((v % 5) - 2 AS DOUBLE) / {n} AS bi FROM verts), ",
        # state: x, r, p, vv (each as re/im pair); rhat == b throughout
        "s0 AS MATERIALIZED (SELECT v, 0.0 AS xr, 0.0 AS xi, "
        "br AS rre, bi AS rim, 0.0 AS pr, 0.0 AS pi, "
        "0.0 AS vr, 0.0 AS vi FROM b), ",
        "sc0 AS MATERIALIZED (SELECT 1.0 AS rho_re, 0.0 AS rho_im, "
        "1.0 AS al_re, 0.0 AS al_im, 1.0 AS om_re, 0.0 AS om_im)",
    ]
    for k in range(1, K + 1):
        p = f"s{k - 1}"
        sc = f"sc{k - 1}"
        rho_re, rho_im = cdot("b.br", "b.bi", p, "s.rre", "s.rim", bjoin)
        rv_re, rv_im = cdot("b.br", "b.bi", f"v_{k}", "s.vr", "s.vi", bjoin)
        parts.append(
            # rho_new = <b, r>
            f", r1_{k} AS MATERIALIZED (SELECT {rho_re} AS nre, "
            f"{rho_im} AS nim)"
            # beta = cmul(cdiv(rho_new, rho), cdiv(alpha, omega))
            f", be_{k} AS MATERIALIZED (WITH q AS (SELECT "
            f"((SELECT nre FROM r1_{k}) * (SELECT rho_re FROM {sc}) + "
            f"(SELECT nim FROM r1_{k}) * (SELECT rho_im FROM {sc})) / "
            f"((SELECT rho_re FROM {sc}) * (SELECT rho_re FROM {sc}) + "
            f"(SELECT rho_im FROM {sc}) * (SELECT rho_im FROM {sc})) "
            "AS qre, "
            f"((SELECT nim FROM r1_{k}) * (SELECT rho_re FROM {sc}) - "
            f"(SELECT nre FROM r1_{k}) * (SELECT rho_im FROM {sc})) / "
            f"((SELECT rho_re FROM {sc}) * (SELECT rho_re FROM {sc}) + "
            f"(SELECT rho_im FROM {sc}) * (SELECT rho_im FROM {sc})) "
            "AS qim), "
            "aw AS (SELECT "
            f"((SELECT al_re FROM {sc}) * (SELECT om_re FROM {sc}) + "
            f"(SELECT al_im FROM {sc}) * (SELECT om_im FROM {sc})) / "
            f"((SELECT om_re FROM {sc}) * (SELECT om_re FROM {sc}) + "
            f"(SELECT om_im FROM {sc}) * (SELECT om_im FROM {sc})) "
            "AS awre, "
            f"((SELECT al_im FROM {sc}) * (SELECT om_re FROM {sc}) - "
            f"(SELECT al_re FROM {sc}) * (SELECT om_im FROM {sc})) / "
            f"((SELECT om_re FROM {sc}) * (SELECT om_re FROM {sc}) + "
            f"(SELECT om_im FROM {sc}) * (SELECT om_im FROM {sc})) "
            "AS awim) "
            "SELECT q.qre * aw.awre - q.qim * aw.awim AS bre, "
            "q.qre * aw.awim + q.qim * aw.awre AS bim FROM q, aw)"
            # t = p − ω·vv ; p = r + β·t   (caxpy expression order)
            f", p_{k} AS MATERIALIZED (SELECT v, "
            f"rre + ((SELECT bre FROM be_{k}) * "
            f"(pr + ((-(SELECT om_re FROM {sc})) * vr - "
            f"(-(SELECT om_im FROM {sc})) * vi)) - "
            f"(SELECT bim FROM be_{k}) * "
            f"(pi + ((-(SELECT om_re FROM {sc})) * vi + "
            f"(-(SELECT om_im FROM {sc})) * vr))) AS pr, "
            f"rim + ((SELECT bre FROM be_{k}) * "
            f"(pi + ((-(SELECT om_re FROM {sc})) * vi + "
            f"(-(SELECT om_im FROM {sc})) * vr)) + "
            f"(SELECT bim FROM be_{k}) * "
            f"(pr + ((-(SELECT om_re FROM {sc})) * vr - "
            f"(-(SELECT om_im FROM {sc})) * vi))) AS pi "
            f"FROM {p})"
            # vv = C·p (complex spmv; real plane then imag plane terms,
            # each a sequential col-ordered reduction like the engine's
            # src-ordered gather)
            f", v_{k} AS MATERIALIZED (SELECT A.r AS v, "
            f"list_sum(list(A.cr * p.pr ORDER BY A.c)) + "
            f"list_sum(list((0.0 - A.ci) * p.pi ORDER BY A.c)) AS vr, "
            f"list_sum(list(A.ci * p.pr ORDER BY A.c)) + "
            f"list_sum(list(A.cr * p.pi ORDER BY A.c)) AS vi "
            f"FROM A JOIN p_{k} p ON p.v = A.c GROUP BY A.r)"
            # alpha = cdiv(rho_new, <b, vv>)
            f", al_{k} AS MATERIALIZED (WITH rv AS (SELECT "
            f"{rv_re} AS rvre, {rv_im} AS rvim) "
            "SELECT "
            f"((SELECT nre FROM r1_{k}) * rv.rvre + "
            f"(SELECT nim FROM r1_{k}) * rv.rvim) / "
            "(rv.rvre * rv.rvre + rv.rvim * rv.rvim) AS al_re, "
            f"((SELECT nim FROM r1_{k}) * rv.rvre - "
            f"(SELECT nre FROM r1_{k}) * rv.rvim) / "
            "(rv.rvre * rv.rvre + rv.rvim * rv.rvim) AS al_im "
            "FROM rv)"
            # s = r − α·vv
            f", sv_{k} AS MATERIALIZED (SELECT s.v, "
            f"s.rre + ((-(SELECT al_re FROM al_{k})) * v.vr - "
            f"(-(SELECT al_im FROM al_{k})) * v.vi) AS sre, "
            f"s.rim + ((-(SELECT al_re FROM al_{k})) * v.vi + "
            f"(-(SELECT al_im FROM al_{k})) * v.vr) AS sim "
            f"FROM {p} s JOIN v_{k} v ON v.v = s.v)"
            # t = C·s
            f", t_{k} AS MATERIALIZED (SELECT A.r AS v, "
            f"list_sum(list(A.cr * s.sre ORDER BY A.c)) + "
            f"list_sum(list((0.0 - A.ci) * s.sim ORDER BY A.c)) AS tr, "
            f"list_sum(list(A.ci * s.sre ORDER BY A.c)) + "
            f"list_sum(list(A.cr * s.sim ORDER BY A.c)) AS ti "
            f"FROM A JOIN sv_{k} s ON s.v = A.c GROUP BY A.r)"
            # omega = cdiv(<t,s>, tt) with tt real: (ts·tt)/(tt·tt)
            f", om_{k} AS MATERIALIZED (WITH d AS (SELECT "
            f"(SELECT list_sum(list(t.tr * s.sre ORDER BY t.v)) "
            f"FROM t_{k} t JOIN sv_{k} s ON s.v = t.v) + "
            f"(SELECT list_sum(list(t.ti * s.sim ORDER BY t.v)) "
            f"FROM t_{k} t JOIN sv_{k} s ON s.v = t.v) AS tsre, "
            f"(SELECT list_sum(list(t.tr * s.sim ORDER BY t.v)) "
            f"FROM t_{k} t JOIN sv_{k} s ON s.v = t.v) - "
            f"(SELECT list_sum(list(t.ti * s.sre ORDER BY t.v)) "
            f"FROM t_{k} t JOIN sv_{k} s ON s.v = t.v) AS tsim, "
            f"(SELECT list_sum(list(t.tr * t.tr ORDER BY t.v)) "
            f"FROM t_{k} t) + "
            f"(SELECT list_sum(list(t.ti * t.ti ORDER BY t.v)) "
            f"FROM t_{k} t) AS tt) "
            "SELECT (d.tsre * d.tt) / (d.tt * d.tt) AS om_re, "
            "(d.tsim * d.tt) / (d.tt * d.tt) AS om_im FROM d)"
            # x += α·p + ω·s ; r = s − ω·t
            f", s{k} AS MATERIALIZED (SELECT o.v, "
            f"(o.xr + ((SELECT al_re FROM al_{k}) * p.pr - "
            f"(SELECT al_im FROM al_{k}) * p.pi)) + "
            f"((SELECT om_re FROM om_{k}) * s.sre - "
            f"(SELECT om_im FROM om_{k}) * s.sim) AS xr, "
            f"(o.xi + ((SELECT al_re FROM al_{k}) * p.pi + "
            f"(SELECT al_im FROM al_{k}) * p.pr)) + "
            f"((SELECT om_re FROM om_{k}) * s.sim + "
            f"(SELECT om_im FROM om_{k}) * s.sre) AS xi, "
            f"s.sre + ((-(SELECT om_re FROM om_{k})) * t.tr - "
            f"(-(SELECT om_im FROM om_{k})) * t.ti) AS rre, "
            f"s.sim + ((-(SELECT om_re FROM om_{k})) * t.ti + "
            f"(-(SELECT om_im FROM om_{k})) * t.tr) AS rim, "
            "p.pr AS pr, p.pi AS pi, v.vr AS vr, v.vi AS vi "
            f"FROM {p} o JOIN p_{k} p ON p.v = o.v "
            f"JOIN sv_{k} s ON s.v = o.v JOIN t_{k} t ON t.v = o.v "
            f"JOIN v_{k} v ON v.v = o.v)"
            f", sc{k} AS MATERIALIZED (SELECT "
            f"(SELECT nre FROM r1_{k}) AS rho_re, "
            f"(SELECT nim FROM r1_{k}) AS rho_im, "
            f"(SELECT al_re FROM al_{k}) AS al_re, "
            f"(SELECT al_im FROM al_{k}) AS al_im, "
            f"(SELECT om_re FROM om_{k}) AS om_re, "
            f"(SELECT om_im FROM om_{k}) AS om_im)"
        )
    parts.append(
        f" SELECT v AS vertex, ROUND(xr, 6) AS xr, ROUND(xi, 6) AS xi "
        f"FROM s{K}"
    )
    return "".join(parts)


def _kcore_sql(K: int) -> str:
    """Coreness via the h-index fixpoint (Lü et al. 2016): c₀ = degree,
    c_{t+1}(v) = H-index of neighbours' c_t — converges to the exact
    peeling coreness (an INTEGER graph invariant, so the engine's peel
    loop and this iteration agree exactly once both converge; K=40 ≫
    the ≤25 iterations measured at sf0.1). Restricted to present
    (degree > 0) vertices like the Ray query."""
    es = (
        f"SELECT src, dst FROM ({_E_SPARSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
    )
    parts = [
        f"WITH es AS MATERIALIZED ({es}), ",
        "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c FROM es "
        "GROUP BY src), ",
        "c0 AS MATERIALIZED (SELECT v, c FROM deg)",
    ]
    for k in range(1, K + 1):
        p = f"c{k - 1}"
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT d.v, "
            "COALESCE(h.h, 0) AS c FROM deg d LEFT JOIN ("
            "SELECT v, MAX(rnk) AS h FROM ("
            "SELECT e.dst AS v, p.c AS val, "
            "ROW_NUMBER() OVER (PARTITION BY e.dst "
            "ORDER BY p.c DESC) AS rnk "
            f"FROM {p} p JOIN es e ON e.src = p.v"
            ") WHERE val >= rnk GROUP BY v) h ON h.v = d.v)"
        )
    parts.append(
        f" SELECT v AS vertex, CAST(c AS BIGINT) AS core FROM c{K}"
    )
    return "".join(parts)


def _cg_sql(K: int) -> str:
    """Conjugate gradient on A = W_sym + diag(1 + weighted degree),
    K unrolled steps with scalar-subquery dots (the allreduce).

    Every order-sensitive SUM is written as
    ``list_sum(list(expr ORDER BY <total key>))`` — a sequential
    reduction in one fixed order — so the twin's x is BITWISE
    identical in any DuckDB thread configuration. Plain ``SUM`` over
    doubles is parallel-accumulation-order nondeterministic, which is
    exactly the driver-vs-local flake this twin suffered for three
    rounds: a ~1e-16 dot drift amplified through 12 steps can flip a
    ROUND(x, 6) digit. The residual engine-vs-twin order difference is
    absorbed by ROUND(…, 6); `_q_conjugate_gradient` asserts every
    |frac(x·10⁶) − 0.5| clears a 1e-4 margin so that absorption is a
    checked invariant, not luck."""
    sym = (
        "SELECT src, dst, CAST((src + dst) % 10 + 1 AS DOUBLE) AS weight "
        f"FROM (SELECT src, dst FROM ({_E_DENSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_DENSE}))"
    )
    parts = [
        f"WITH verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({MOD_DENSE})), ",
        f"sym AS MATERIALIZED ({sym}), ",
        # ord gives the diagonal group a total order: base (-1), then
        # incident-edge contributions by neighbor id; off-diagonal
        # groups are singletons (sym is DISTINCT).
        "A AS MATERIALIZED (SELECT src, dst, "
        "CAST(list_sum(list(weight ORDER BY ord)) AS DOUBLE) AS weight "
        "FROM ("
        "SELECT src, dst, weight, CAST(0 AS BIGINT) AS ord FROM sym "
        "UNION ALL SELECT v AS src, v AS dst, 1.0 AS weight, "
        "CAST(-1 AS BIGINT) AS ord FROM verts "
        "UNION ALL SELECT src, src AS dst, weight, dst AS ord FROM sym"
        ") GROUP BY 1, 2), ",
        "s0 AS MATERIALIZED (SELECT v, 0.0 AS x, "
        "CAST((v % 7) + 1 AS DOUBLE) / 10.0 AS r, "
        "CAST((v % 7) + 1 AS DOUBLE) / 10.0 AS p FROM verts), ",
        "rr0 AS MATERIALIZED (SELECT list_sum(list(r * r ORDER BY v)) "
        "AS val FROM s0)",
    ]
    parts.extend(_cg_unrolled_steps(K))
    parts.append(f" SELECT v AS vertex, ROUND(x, 6) AS x FROM s{K}")
    return "".join(parts)


def _cg_unrolled_steps(K: int) -> list[str]:
    """The K unrolled CG iterations shared by the real and complex
    twins — depends only on CTEs ``A`` (src, dst, weight), ``s0`` and
    ``rr0`` defined by the caller's prefix. Every order-sensitive SUM
    is a sequential list_sum reduction (thread-invariant)."""
    parts = []
    for k in range(1, K + 1):
        p = f"s{k - 1}"
        parts.append(
            f", ap{k} AS MATERIALIZED (SELECT A.dst AS v, "
            f"list_sum(list(s.p * A.weight ORDER BY A.src)) AS ap "
            f"FROM {p} s "
            "JOIN A ON A.src = s.v GROUP BY A.dst)"
            f", al{k} AS MATERIALIZED (SELECT "
            f"(SELECT val FROM rr{k - 1}) / "
            f"(SELECT list_sum(list(s.p * a.ap ORDER BY s.v)) "
            f"FROM {p} s "
            f"JOIN ap{k} a ON a.v = s.v) AS alpha)"
            f", t{k} AS MATERIALIZED (SELECT s.v, "
            f"s.x + (SELECT alpha FROM al{k}) * s.p AS x, "
            f"s.r - (SELECT alpha FROM al{k}) * a.ap AS r, s.p AS p "
            f"FROM {p} s JOIN ap{k} a ON a.v = s.v)"
            f", rr{k} AS MATERIALIZED (SELECT "
            f"list_sum(list(r * r ORDER BY v)) AS val "
            f"FROM t{k})"
            f", s{k} AS MATERIALIZED (SELECT v, x, r, "
            f"r + ((SELECT val FROM rr{k}) / "
            f"(SELECT val FROM rr{k - 1})) * p AS p FROM t{k})"
        )
    return parts


def _cg_complex_sql(K: int) -> str:
    """Twin of `_q_conjugate_gradient_complex`: the SAME K unrolled CG
    steps (shared via `_cg_unrolled_steps`) over the symmetric 2n×2n
    real embedding [[Ar, −Ai], [Ai, Ar]] of the Hermitian fixture —
    complex HPD CG's α/β are real, so the embedded real recurrence IS
    the complex recurrence, plane by plane."""
    n = MOD_DENSE
    symw = (
        "SELECT src, dst, "
        "CAST((src + dst) % 10 + 1 AS DOUBLE) AS wr, "
        "CAST(CASE WHEN src < dst THEN (src * dst) % 5 + 1 "
        "ELSE -((src * dst) % 5 + 1) END AS DOUBLE) AS wi "
        f"FROM (SELECT src, dst FROM ({_E_DENSE}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({_E_DENSE}))"
    )
    parts = [
        f"WITH verts AS MATERIALIZED (SELECT range::BIGINT AS v "
        f"FROM range({2 * n})), ",
        f"symw AS MATERIALIZED ({symw}), ",
        # Embedded off-diagonal blocks + base diag (ord −1) + per-edge
        # diagonal-dominance contributions (ord = neighbor id); all
        # weights are integer-valued doubles, so the group sums are
        # exact in any order — ord only pins DuckDB's own reduction.
        "A AS MATERIALIZED (SELECT src, dst, "
        "CAST(list_sum(list(weight ORDER BY ord)) AS DOUBLE) AS weight "
        "FROM ("
        "SELECT src, dst, wr AS weight, CAST(0 AS BIGINT) AS ord "
        "FROM symw "
        f"UNION ALL SELECT src + {n}, dst + {n}, wr, "
        "CAST(0 AS BIGINT) FROM symw "
        f"UNION ALL SELECT src, dst + {n}, -wi, CAST(0 AS BIGINT) "
        "FROM symw "
        f"UNION ALL SELECT src + {n}, dst, wi, CAST(0 AS BIGINT) "
        "FROM symw "
        "UNION ALL SELECT v AS src, v AS dst, 1.0, CAST(-1 AS BIGINT) "
        "FROM verts "
        "UNION ALL SELECT src, src AS dst, wr + ABS(wi), dst FROM symw "
        f"UNION ALL SELECT src + {n}, src + {n} AS dst, wr + ABS(wi), "
        "dst FROM symw"
        ") GROUP BY 1, 2), ",
        "s0 AS MATERIALIZED (SELECT v, 0.0 AS x, "
        "CAST((v % 7) + 1 AS DOUBLE) / 10.0 AS r, "
        "CAST((v % 7) + 1 AS DOUBLE) / 10.0 AS p FROM verts), ",
        "rr0 AS MATERIALIZED (SELECT list_sum(list(r * r ORDER BY v)) "
        "AS val FROM s0)",
    ]
    parts.extend(_cg_unrolled_steps(K))
    parts.append(
        f" SELECT a.v AS vertex, ROUND(a.x, 6) AS xr, "
        f"ROUND(b.x, 6) AS xi FROM s{K} a "
        f"JOIN s{K} b ON b.v = a.v + {n} WHERE a.v < {n}"
    )
    return "".join(parts)


def _kmeans_sql(k: int, L: int) -> str:
    """Unrolled k-means twin of `_q_kmeans`: greedy farthest-point
    init (k−1 steps over the ORDER BY vec_id LIMIT sample) + L Lloyd
    steps + final assignment — every distance/mean reduction is a
    sequential ``list_sum(list(… ORDER BY …))`` so the twin is bitwise
    thread-invariant; ROW_NUMBER(ORDER BY d2, cluster) mirrors
    np.argmin's first-minimum tie rule."""
    d2 = (
        "list_sum(list((p.val - c.cval) * (p.val - c.cval) "
        "ORDER BY p.dim)) AS d2"
    )
    parts = [
        "WITH samp AS MATERIALIZED (SELECT vec_id, embedding "
        f"FROM embeddings ORDER BY vec_id LIMIT {_KM_SAMPLE}), ",
        "pts AS MATERIALIZED (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS dim, "
        "CAST(unnest(embedding) AS DOUBLE) AS val FROM samp), ",
        "apts AS MATERIALIZED (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS dim, "
        "CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings), ",
        "pk0 AS MATERIALIZED (SELECT MIN(vec_id) AS vec_id FROM samp), ",
        "cent0 AS MATERIALIZED (SELECT 0 AS cluster, dim, val AS cval "
        "FROM pts WHERE vec_id = (SELECT vec_id FROM pk0))",
    ]
    for j in range(1, k):
        parts.append(
            f", nd{j} AS MATERIALIZED (SELECT p.vec_id, c.cluster, {d2} "
            f"FROM pts p JOIN cent{j - 1} c ON c.dim = p.dim "
            "GROUP BY p.vec_id, c.cluster)"
            f", md{j} AS MATERIALIZED (SELECT vec_id, MIN(d2) AS md "
            f"FROM nd{j} WHERE vec_id NOT IN "
            f"(SELECT vec_id FROM pk{j - 1}) GROUP BY vec_id)"
            f", pick{j} AS MATERIALIZED (SELECT vec_id FROM md{j} "
            "ORDER BY md DESC, vec_id LIMIT 1)"
            f", pk{j} AS MATERIALIZED (SELECT vec_id FROM pk{j - 1} "
            f"UNION ALL SELECT vec_id FROM pick{j})"
            f", cent{j} AS MATERIALIZED (SELECT * FROM cent{j - 1} "
            f"UNION ALL SELECT {j} AS cluster, dim, val AS cval "
            f"FROM pts WHERE vec_id = (SELECT vec_id FROM pick{j}))"
        )
    parts.append(
        f", lc0 AS MATERIALIZED (SELECT * FROM cent{k - 1})"
    )
    for i in range(1, L + 1):
        parts.append(
            f", ad{i} AS MATERIALIZED (SELECT p.vec_id, c.cluster, {d2} "
            f"FROM apts p JOIN lc{i - 1} c ON c.dim = p.dim "
            "GROUP BY p.vec_id, c.cluster)"
            f", a{i} AS MATERIALIZED (SELECT vec_id, cluster FROM ("
            "SELECT vec_id, cluster, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY d2, cluster) AS rn "
            f"FROM ad{i}) WHERE rn = 1)"
            f", m{i} AS MATERIALIZED (SELECT a.cluster, p.dim, "
            "list_sum(list(p.val ORDER BY p.vec_id)) / COUNT(*) AS mval "
            f"FROM a{i} a JOIN apts p USING (vec_id) "
            "GROUP BY a.cluster, p.dim)"
            # Empty clusters keep their previous centroid (engine:
            # newC[c] stays C[c] when no partials arrived).
            f", lc{i} AS MATERIALIZED (SELECT c.cluster, c.dim, "
            f"COALESCE(m.mval, c.cval) AS cval FROM lc{i - 1} c "
            f"LEFT JOIN m{i} m ON m.cluster = c.cluster "
            "AND m.dim = c.dim)"
        )
    parts.append(
        f", fd AS MATERIALIZED (SELECT p.vec_id, c.cluster, {d2} "
        f"FROM apts p JOIN lc{L} c ON c.dim = p.dim "
        "GROUP BY p.vec_id, c.cluster) "
        "SELECT vec_id, cluster FROM (SELECT vec_id, cluster, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id "
        "ORDER BY d2, cluster) AS rn FROM fd) WHERE rn = 1"
    )
    return "".join(parts)


def _langid_sql() -> str:
    """Character-trigram language ID: same profiles, same scoring
    (hits/n_trigrams), same alphabetical-first argmax and 0.01
    threshold as LangIdStage — the divisions are single IEEE ops on
    identical integers, so values match bit-for-bit."""
    from alp_ray.stages.text import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)
    score_exprs = []
    for lang in langs:
        tri_list = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in _LANG_PROFILES[lang]
        )
        score_exprs.append(
            f"CASE WHEN n_tris > 0 THEN CAST(length(list_filter(tris, "
            f"x -> x IN ({tri_list}))) AS DOUBLE) / n_tris "
            f"ELSE 0.0 END AS s_{lang}"
        )
    best = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN s_{lg} = best THEN '{lg}'" for lg in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return (
        "WITH t AS (SELECT doc_id, lower(text) AS s FROM documents), "
        "tri AS (SELECT doc_id, "
        "CASE WHEN length(s) >= 3 THEN "
        "list_transform(range(length(s) - 2), i -> s[i + 1 : i + 3]) "
        "ELSE [] END AS tris, "
        "GREATEST(length(s) - 2, 0) AS n_tris FROM t), "
        f"sc AS (SELECT doc_id, n_tris, {', '.join(score_exprs)} "
        "FROM tri), "
        f"b AS (SELECT doc_id, n_tris, {best} AS best, * FROM sc) "
        "SELECT doc_id, "
        f"CASE WHEN best > 0.01 THEN {pick} ELSE 'und' END AS lang_pred, "
        "best AS lang_conf FROM b"
    )


def _quality_sql() -> str:
    from alp_ray.stages.text import _STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return (
        "WITH s AS (SELECT doc_id, "
        "CAST(length(text) AS BIGINT) AS n_chars, "
        "GREATEST(length(text), 1) AS L, "
        "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS letters, "
        "length(regexp_extract_all(text, '[A-Za-z]+')) AS n_words, "
        "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) "
        "AS punct_n, "
        "length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_n, "
        "length(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
        f"w -> w IN ({stop_list}))) AS stop_n "
        "FROM documents) "
        "SELECT doc_id, "
        "ROUND(LEAST(GREATEST("
        "0.25 * LEAST(GREATEST((CASE WHEN n_words > 0 THEN "
        "CAST(letters AS DOUBLE) / n_words ELSE 0.0 END) / 6.0, 0.0), 1.0)"
        " + 0.25 * LEAST(GREATEST(1.0 - (CAST(punct_n AS DOUBLE) / L) * 4"
        ", 0.0), 1.0)"
        " + 0.25 * LEAST(GREATEST(1.0 - (CAST(digit_n AS DOUBLE) / L) * 4"
        ", 0.0), 1.0)"
        " + 0.25 * LEAST(GREATEST((CASE WHEN n_words > 0 THEN "
        "CAST(stop_n AS DOUBLE) / n_words ELSE 0.0 END) * 3, 0.0), 1.0)"
        ", 0.0), 1.0), 6) AS q_score, "
        "n_chars AS q_n_chars FROM s"
    )


def _minhash_poly_sql(K: int = 8, bands: int = 4) -> str:
    """Brute-force twin of `_q_minhash_poly_pairs`: recompute every
    signature in BIGINT arithmetic (the hash family is designed to be
    SQL-expressible — word fingerprints via the _FINGERPRINT_SQL
    Horner law, shingle = word-triple polynomial, K literal affine
    permutations mod M31), then emit every doc pair where some band of
    K/bands consecutive signatures agrees. The Ray side's band-bucket
    plan emits exactly that set (first-match-band + in-group chunk
    compare filters pure bucket collisions)."""
    R = K // bands
    norm = (
        "regexp_replace(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), "
        "'\\s+', ' ', 'g')"
    )
    band_pred = " OR ".join(
        "(" + " AND ".join(
            f"a.sig[{bd * R + r + 1}] = b.sig[{bd * R + r + 1}]"
            for r in range(R)
        ) + ")"
        for bd in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(K)
    )
    return (
        "WITH w AS MATERIALIZED (SELECT doc_id, "
        f"generate_subscripts(string_split({norm}, ' '), 1) AS wi, "
        f"unnest(string_split({norm}, ' ')) AS word FROM documents), "
        "f AS MATERIALIZED (SELECT doc_id, wi, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(regexp_extract_all(word, '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(h, c) -> (h * 1000003 + c) % 2147483647) AS fv FROM w), "
        "sh AS MATERIALIZED (SELECT a.doc_id, "
        "((a.fv * 1000003 + b.fv) % 2147483647 * 1000003 + c.fv) "
        "% 2147483647 AS h0 "
        "FROM f a JOIN f b ON b.doc_id = a.doc_id AND b.wi = a.wi + 1 "
        "JOIN f c ON c.doc_id = a.doc_id AND c.wi = a.wi + 2), "
        f"perm AS (SELECT range AS i, 999983 - 2 * range AS pa, "
        f"12289 * (range + 1) AS pb FROM range({K})), "
        "sg AS MATERIALIZED (SELECT doc_id, i, "
        "MIN((pa * h0 + pb) % 2147483647) AS s "
        "FROM sh CROSS JOIN perm GROUP BY doc_id, i), "
        "sv AS MATERIALIZED (SELECT doc_id, list(s ORDER BY i) AS sig "
        "FROM sg GROUP BY doc_id) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        f"CAST({agree} AS DOUBLE) / {K} AS est_jaccard "
        "FROM sv a JOIN sv b ON b.doc_id > a.doc_id "
        f"WHERE {band_pred}"
    )


def _hll_poly_sql(p: int = 6) -> str:
    """Twin of `_q_approx_distinct_poly`: the HLL register array in
    pure BIGINT arithmetic — fingerprint (the _FINGERPRINT_SQL law),
    index = low p bits, rank = (31−p)+1 − bit_length(suffix) via an
    integer CASE ladder (no FP log), per-register MAX, then the same
    order-checksum fold."""
    m = 1 << p
    w = 31 - p
    norm = (
        "regexp_replace(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), "
        "'\\s+', ' ', 'g')"
    )
    ladder = "CASE " + " ".join(
        f"WHEN v >= {1 << (w - 1 - k)} THEN {w - k}"
        for k in range(w)
    ) + " ELSE 0 END"
    return (
        "WITH f AS MATERIALIZED (SELECT "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(regexp_extract_all({norm}, '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(h, c) -> (h * 1000003 + c) % 2147483647) AS fv "
        "FROM documents), "
        f"r AS MATERIALIZED (SELECT fv & {m - 1} AS idx, "
        f"fv >> {p} AS v FROM f), "
        f"rk AS MATERIALIZED (SELECT idx, {w + 1} - ({ladder}) AS rank "
        "FROM r), "
        "regs AS MATERIALIZED (SELECT t.range AS idx, "
        "COALESCE(MAX(rk.rank), 0) AS reg "
        f"FROM range({m}) t LEFT JOIN rk ON rk.idx = t.range "
        "GROUP BY t.range) "
        f"SELECT CAST({m} AS BIGINT) AS m, "
        "CAST(SUM(reg) AS BIGINT) AS sum_reg, "
        "CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS zero_reg, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list(reg ORDER BY idx)), "
        "(h, c) -> (h * 1000003 + c) % 2147483647) AS checksum "
        "FROM regs"
    )


def _simhash_poly_sql() -> str:
    """Brute-force twin of `_q_simhash_poly_pairs`: per-word
    fingerprints (the _FINGERPRINT_SQL law), bit j of the 31-bit
    signature = sign of Σ(2·((fv>>j)&1) − 1), pairs where
    bit_count(xor) ≤ 3 — by pigeonhole exactly the 4-band LSH set."""
    norm = (
        "regexp_replace(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), "
        "'\\s+', ' ', 'g')"
    )
    return (
        "WITH w AS MATERIALIZED (SELECT doc_id, "
        f"unnest(string_split({norm}, ' ')) AS word FROM documents), "
        "f AS MATERIALIZED (SELECT doc_id, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(regexp_extract_all(word, '.'), "
        "c -> CAST(ord(c) AS BIGINT))), "
        "(h, c) -> (h * 1000003 + c) % 2147483647) AS fv FROM w), "
        "bits AS MATERIALIZED (SELECT doc_id, b.range AS b, "
        "SUM(((fv >> b.range) & 1) * 2 - 1) AS s "
        "FROM f CROSS JOIN range(31) b GROUP BY doc_id, b.range), "
        "sh AS MATERIALIZED (SELECT doc_id, "
        "SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) "
        "AS h FROM bits GROUP BY doc_id) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming "
        "FROM sh a JOIN sh b ON b.doc_id > a.doc_id "
        "WHERE bit_count(xor(a.h, b.h)) <= 3"
    )


_FINGERPRINT_SQL = (
    "SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(regexp_extract_all(regexp_replace(regexp_replace("
    "text, '^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g'), '.'), "
    "c -> CAST(ord(c) AS BIGINT))), "
    "(h, c) -> (h * 1000003 + c) % 2147483647) AS fingerprint "
    "FROM documents"
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from alp_ray.pipelines.code_graph import flagship

    return flagship(sf_scale=0.001)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # Graph build + BLAS-level primitives (SURVEY §2.3-2.6)
        "edges_distinct": _q_edges,
        "out_degrees": _q_out_degrees,
        "in_degrees": _q_in_degrees,
        "spmv_plus_times": _q_spmv_plus_times,
        "spmv_transpose": _q_spmv_transpose,
        "spmv_min_plus": _q_spmv_min_plus,
        "spmv_masked": _q_spmv_masked,
        "ewise_add_degrees": _q_ewise_add_degrees,
        # Algorithms (SURVEY §2.7)
        "spy_downsample": _q_spy,
        "spgemm_two_hop": _q_spgemm,
        "triangle_count": _q_triangles,
        "connected_components": _q_components,
        "scc": _q_scc,
        "khop2": _q_khop2,
        "sssp_hops4": _q_sssp4,
        "sssp_full": _q_sssp_full,
        "pagerank": _q_pagerank,
        "weighted_pagerank": _q_weighted_pagerank,
        "pregel_pagerank": _q_pregel_pagerank,
        "labelprop": _q_labelprop,
        "conjugate_gradient": _q_conjugate_gradient,
        "kcore": _q_kcore,
        "hits": _q_hits,
        # North-star corpus pipeline
        "corpus_extract": _q_corpus_extract,
        "corpus_pagerank": _q_corpus_pagerank,
        "corpus_components": _q_corpus_components,
        # Training-data pipeline operators
        "dedup_exact": _q_dedup_exact,
        "token_counts": _q_token_counts,
        "doc_stats": _q_doc_stats,
        "quality_scores": _q_quality,
        "langid": _q_langid,
        "fingerprints": _q_fingerprints,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_near_dup": _q_embedding_near_dup,
        "ann_top10": _q_ann_top10,
        "norm2_embeddings": _q_norm2,
        "kmeans_assign": _q_kmeans,
        "window_hourly": _q_window_hourly,
        "sessions": _q_sessions,
        "running_window": _q_running_window,
        "copurchase_pairs": _q_copurchase_pairs,
        "inverted_index": _q_inverted_index,
        "sequence_pack": _q_sequence_pack,
        "bm25_search": _q_bm25,
        "global_rank": _q_global_rank,
        "anti_join_urgent": _q_anti_join,
        "pivot_events": _q_pivot_events,
        "grouped_median": _q_grouped_median,
        "zscore_outliers": _q_zscore_outliers,
        "user_sequences": _q_user_sequences,
        "first_last_touch": _q_first_last_touch,
        "grouped_mode": _q_grouped_mode,
        "funnel_conversion": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "pca_embeddings": _q_pca_embeddings,
        "rollup_orders": _q_rollup_orders,
        "cube_orders": _q_cube_orders,
        "rolling_window": _q_rolling_window,
        "semi_join_urgent": _q_semi_join,
        "json_extract": _q_json_extract,
        "multimodal_decode": _q_multimodal,
        "multimodal_audio": _q_multimodal_audio,
        "multimodal_frames": _q_multimodal_frames,
        "approx_distinct_docs": _q_approx_distinct,
        "ann_ivf_top10": _q_ann_ivf,
        "ann_ivf_recall": _q_ann_ivf_recall,
        "partitioned_sink": _q_partitioned_sink,
        "community_lpa": _q_community_lpa,
        # Round 2: BLAS variants, solvers, dedup tails
        "spmv_input_masked": _q_spmv_input_masked,
        "matrix_zip": _q_matrix_zip,
        "matrix_ewise_union": _q_matrix_ewise_union,
        "matrix_ewise_intersect": _q_matrix_ewise_intersect,
        "outer_product": _q_outer,
        "dot_degrees": _q_dot_degrees,
        "zip_unzip_degrees": _q_zip_unzip,
        "sparse_nn": _q_sparse_nn,
        "sparse_nn_engine": _q_sparse_nn_engine,
        "bicgstab": _q_bicgstab,
        "hpcg_vcycle": _q_hpcg_vcycle,
        "hpcg_pcg": _q_hpcg_pcg,
        "ewise_lambda_matrix": _q_ewise_lambda_matrix,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "nation_revenue": _q_nation_revenue,
        "price_bands": _q_price_bands,
        "neighbor_sample": _q_neighbor_sample,
        "assortativity": _q_assortativity,
        "train_test_split": _q_train_test_split,
        "heavy_hitters": _q_heavy_hitters,
        "mis": _q_mis,
        "ktruss": _q_ktruss,
        "minhash_keep": _q_minhash_keep,
        "personalized_pagerank": _q_personalized_pagerank,
        "graph_coloring": _q_coloring,
        "random_walks": _q_random_walks,
        "betweenness": _q_betweenness,
        # Round 3: corpus statistics operators
        "tfidf_terms": _q_tfidf_terms,
        "tfidf_top_term": _q_tfidf_top_term,
        "bigram_counts": _q_bigram_counts,
        # Relational / temporal custom operators
        "asof_purchase": _q_asof_purchase,
        "window_hopping": _q_window_hopping,
        "topk_per_user": _q_topk_per_user,
        "doc_sample": _q_doc_sample,
        "adamic_adar": _q_adamic_adar,
        "jaccard_linkpred": _q_jaccard_linkpred,
        "avg_nbr_degree": _q_avg_nbr_degree,
        "harmonic_closeness": _q_harmonic_closeness,
        "eccentricity": _q_eccentricity,
        "reciprocity": _q_reciprocity,
        "clustering_coeff": _q_clustering,
        # Distributed statistics
        "degree_hist": _q_degree_hist,
        "pearson_corr": _q_pearson_corr,
        "distinct_parts": _q_distinct_parts,
        "percentiles_price": _q_percentiles,
        "weighted_sample": _q_weighted_sample,
        # Training-data hygiene operators
        "pii_scrub": _q_pii_scrub,
        "paragraph_dedup": _q_paragraph_dedup,
        "dup_spans": _q_dup_spans,
        "decontaminate": _q_decontaminate,
        # Round-4 additions (appended AFTER the driver's gated-50
        # window so previously-verified rows keep their hard signal;
        # these are hash-checked by the local full-sweep replica)
        "ewise_masked": _q_ewise_masked,
        "fold_masked_complement": _q_fold_masked_complement,
        "conjugate_gradient_complex": _q_conjugate_gradient_complex,
        "minhash_poly_pairs": _q_minhash_poly_pairs,
        "simhash_poly_pairs": _q_simhash_poly_pairs,
        "embedding_quantize": _q_embedding_quantize,
        "approx_distinct_poly": _q_approx_distinct_poly,
        "ann_pq_recall": _q_ann_pq_recall,
        "length_buckets": _q_length_buckets,
        # Round-5 additions (appended AFTER the window as always)
        "minhash_seeded_pairs": _q_minhash_seeded_pairs,
        "simhash_seeded_pairs": _q_simhash_seeded_pairs,
        "bicgstab_complex": _q_bicgstab_complex,
        "approx_distinct_sparse": _q_approx_distinct_sparse,
        "truss_decomposition": _q_truss_decomposition,
        "ktruss_weighted": _q_ktruss_weighted,
        "ktruss_weighted_shuffle": _q_ktruss_weighted_shuffle,
        "katz_centrality": _q_katz,
        "eigencentrality": _q_eigencentrality,
        "repetition_scores": _q_repetition,
        "densest_subgraph": _q_densest,
        "modularity": _q_modularity,
        "gopher_quality": _q_gopher_quality,
        "chunk_manifest": _q_chunk_manifest,
        "mst_forest": _q_mst,
        "salsa": _q_salsa,
        "maximal_matching": _q_matching,
        "rarity_scores": _q_rarity,
        "onion_layers": _q_onion,
        "event_transitions": _q_event_transitions,
        "cms_counts": _q_cms_counts,
        "vertex_cover": _q_vertex_cover,
        "lang_vocab_overlap": _q_lang_vocab_overlap,
        "rich_club": _q_rich_club,
        "rare_term_pairs": _q_rare_term_pairs,
        "effective_resistance": _q_effective_resistance,
        "square_count": _q_square_count,
        "snapshot_diff": _q_snapshot_diff,
        "pareto_frontier": _q_pareto_frontier,
        "canonical_docs": _q_canonical_docs,
        "zorder_events": _q_zorder_events,
        "hyperball": _q_hyperball,
        "wl_colors": _q_wl_colors,
        "butterfly_count": _q_butterfly_count,
        "kn_continuation": _q_kn_continuation,
        "feature_hashing": _q_feature_hashing,
        "user_trend": _q_user_trend,
        "join_cardinality": _q_join_cardinality,
        "hourly_active": _q_hourly_active,
        "decayed_activity": _q_decayed_activity,
        "corpus_lang_mixing": _q_corpus_lang_mixing,
        "interarrival_stats": _q_interarrival,
        "assoc_rules": _q_assoc_rules,
        "rendezvous_shards": _q_rendezvous,
    }


def oracle_sql() -> dict[str, str]:
    x = _x_of_src()
    return {
        "edges_distinct": f"SELECT src, dst FROM ({_E_DENSE})",
        "out_degrees": (
            f"SELECT src AS vertex, COUNT(*) AS degree FROM ({_E_DENSE}) "
            "GROUP BY src"
        ),
        "in_degrees": (
            f"SELECT dst AS vertex, COUNT(*) AS degree FROM ({_E_DENSE}) "
            "GROUP BY dst"
        ),
        "spmv_plus_times": (
            f"SELECT dst AS vertex, CAST(SUM({x}) AS DOUBLE) AS val "
            f"FROM ({_E_DENSE}) GROUP BY dst"
        ),
        "spmv_transpose": (
            "SELECT src AS vertex, CAST(SUM((dst % 7) + 1) AS DOUBLE) AS val "
            f"FROM ({_E_DENSE}) GROUP BY src"
        ),
        "spmv_min_plus": (
            f"SELECT dst AS vertex, CAST(MIN({x} + weight) AS DOUBLE) AS val "
            f"FROM ({_E_WEIGHTED}) GROUP BY dst"
        ),
        "spmv_masked": (
            f"SELECT dst AS vertex, CAST(SUM((src % 7) + 1) AS DOUBLE) AS val "
            f"FROM ({_E_DENSE}) WHERE dst % 3 = 0 GROUP BY dst"
        ),
        "ewise_add_degrees": (
            "SELECT vertex, CAST(SUM(c) AS BIGINT) AS val FROM ("
            f"  SELECT src AS vertex, COUNT(*) AS c FROM ({_E_DENSE}) GROUP BY src"
            "  UNION ALL "
            f"  SELECT dst AS vertex, COUNT(*) AS c FROM ({_E_DENSE}) GROUP BY dst"
            ") GROUP BY vertex"
        ),
        "ewise_masked": (
            "WITH od AS (SELECT src AS vertex, COUNT(*) AS c "
            f"FROM ({_E_DENSE}) GROUP BY src), "
            "id_ AS (SELECT dst AS vertex, COUNT(*) AS c "
            f"FROM ({_E_DENSE}) GROUP BY dst) "
            "SELECT od.vertex, CAST(od.c * id_.c AS BIGINT) AS val "
            "FROM od JOIN id_ ON id_.vertex = od.vertex "
            "WHERE od.c >= 5"
        ),
        "fold_masked_complement": (
            "SELECT CAST(SUM(c) AS BIGINT) AS val FROM ("
            f"SELECT src, COUNT(*) AS c FROM ({_E_DENSE}) GROUP BY src) "
            f"WHERE src NOT IN (SELECT DISTINCT dst FROM ({_E_DENSE}) "
            "WHERE dst % 2 = 0)"
        ),
        "spgemm_two_hop": (
            f"SELECT a.src, b.dst, CAST(COUNT(*) AS DOUBLE) AS weight "
            f"FROM ({_E_SPARSE}) a JOIN ({_E_SPARSE}) b ON b.src = a.dst "
            "GROUP BY 1, 2"
        ),
        "spy_downsample": (
            "SELECT CAST(FLOOR(src / (601.0 / 16)) AS BIGINT) AS bucket_i, "
            "CAST(FLOOR(dst / (601.0 / 16)) AS BIGINT) AS bucket_j, "
            f"COUNT(*) AS count FROM ({_E_DENSE}) GROUP BY 1, 2"
        ),
        "triangle_count": (
            "WITH ec AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
            f"FROM ({_E_DENSE}) GROUP BY 1, 2) "
            "SELECT COUNT(*) AS n_triangles FROM ec e1 "
            "JOIN ec e2 ON e2.a = e1.b "
            "JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b"
        ),
        "scc": (
            f"WITH es AS ({_E_SPARSE}), "
            f"verts AS (SELECT range::BIGINT AS v FROM range({MOD_SPARSE})), "
            "reach AS ("
            "  WITH RECURSIVE r(v, u) AS ("
            "    SELECT v, v FROM verts "
            "    UNION "
            "    SELECT r.v, es.dst FROM r JOIN es ON es.src = r.u"
            "  ) SELECT * FROM r"
            ") "
            "SELECT r1.v AS vertex, CAST(MIN(r1.u) AS BIGINT) AS scc "
            "FROM reach r1 JOIN reach r2 ON r1.v = r2.u AND r1.u = r2.v "
            "GROUP BY r1.v"
        ),
        "connected_components": (
            "WITH es AS ("
            f"  SELECT src, dst FROM ({_E_SPARSE}) "
            f"  UNION SELECT dst AS src, src AS dst FROM ({_E_SPARSE})"
            "), verts AS (SELECT DISTINCT src AS v FROM es), "
            "reach AS ("
            "  WITH RECURSIVE r(v, u) AS ("
            "    SELECT v, v FROM verts "
            "    UNION "
            "    SELECT r.v, es.dst FROM r JOIN es ON es.src = r.u"
            "  ) SELECT * FROM r"
            ") "
            "SELECT v AS vertex, CAST(MAX(u) AS BIGINT) AS label "
            "FROM reach GROUP BY v"
        ),
        "khop2": (
            f"WITH e AS ({_E_DENSE}) "
            "SELECT DISTINCT vertex FROM ("
            "  SELECT 0 AS vertex "
            "  UNION ALL SELECT dst FROM e WHERE src = 0 "
            "  UNION ALL SELECT e2.dst FROM e e1 "
            "    JOIN e e2 ON e2.src = e1.dst WHERE e1.src = 0"
            ")"
        ),
        "sssp_hops4": (
            f"WITH e AS ({_E_WEIGHTED}), "
            "b0 AS (SELECT 0 AS v, CAST(0 AS DOUBLE) AS d), "
            "b1 AS (SELECT v, MIN(d) AS d FROM ("
            "  SELECT * FROM b0 UNION ALL "
            "  SELECT e.dst, b0.d + e.weight FROM b0 JOIN e ON e.src = b0.v"
            ") GROUP BY v), "
            "b2 AS (SELECT v, MIN(d) AS d FROM ("
            "  SELECT * FROM b1 UNION ALL "
            "  SELECT e.dst, b1.d + e.weight FROM b1 JOIN e ON e.src = b1.v"
            ") GROUP BY v), "
            "b3 AS (SELECT v, MIN(d) AS d FROM ("
            "  SELECT * FROM b2 UNION ALL "
            "  SELECT e.dst, b2.d + e.weight FROM b2 JOIN e ON e.src = b2.v"
            ") GROUP BY v), "
            "b4 AS (SELECT v, MIN(d) AS d FROM ("
            "  SELECT * FROM b3 UNION ALL "
            "  SELECT e.dst, b3.d + e.weight FROM b3 JOIN e ON e.src = b3.v"
            ") GROUP BY v) "
            "SELECT v AS vertex, ROUND(d, 6) AS dist FROM b4"
        ),
        "sssp_full": _sssp_full_oracle(),
        "dedup_exact": (
            "SELECT md5(text) AS h, MIN(doc_id) AS keep_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "token_counts": (
            "SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens, "
            "CAST(length(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords "
            "FROM documents"
        ),
        "partitioned_sink": (
            "SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "doc_stats": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) "
            "AS n_words FROM documents"
        ),
        "window_hourly": (
            "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) "
            "AS window_start_us, event_type, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "json_extract": (
            "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) "
            "AS k FROM events"
        ),
        "sessions": (
            "WITH gaps AS ("
            "  SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts) > INTERVAL 1800 SECOND "
            "    THEN 1 ELSE 0 END AS new_session "
            "  FROM events"
            "), tagged AS ("
            "  SELECT user_id, ts, SUM(new_session) OVER "
            "    (PARTITION BY user_id ORDER BY ts "
            "     ROWS UNBOUNDED PRECEDING) AS session_id "
            "  FROM gaps"
            ") "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "COUNT(*) AS n_events FROM tagged GROUP BY 1, 2"
        ),
        "global_rank": (
            "SELECT event_id, CAST(ROW_NUMBER() OVER ("
            "ORDER BY value, event_id) - 1 AS BIGINT) AS rank "
            "FROM events"
        ),
        "grouped_median": (
            "SELECT user_id, ROUND(median(value), 6) AS median "
            "FROM events GROUP BY user_id"
        ),
        "kmeans_assign": _kmeans_sql(_KM_K, _KM_L),
        "distinct_parts": (
            "SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT)"
            " AS n_distinct FROM lineitem GROUP BY l_suppkey"
        ),
        "pearson_corr": (
            "WITH c AS (SELECT "
            "CAST(ROUND(l_quantity * 100) AS BIGINT) AS x, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y "
            "FROM lineitem), "
            "m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
            "CAST(SUM(x) AS DOUBLE) AS sx, "
            "CAST(SUM(y) AS DOUBLE) AS sy, "
            "CAST(SUM(x * x) AS DOUBLE) AS sxx, "
            "CAST(SUM(y * y) AS DOUBLE) AS syy, "
            "CAST(SUM(x * y) AS DOUBLE) AS sxy FROM c) "
            "SELECT ROUND((n * sxy - sx * sy) / "
            "(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) "
            "AS corr FROM m"
        ),
        "grouped_mode": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT user_id, event_type, cnt, ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn "
            "FROM c) "
            "SELECT user_id, event_type AS mode_token, "
            "CAST(cnt AS BIGINT) AS mode_count FROM r WHERE rn = 1"
        ),
        "cohort_retention": (
            "WITH wk AS (SELECT user_id, "
            "CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS w "
            "FROM events), "
            "f AS (SELECT user_id, MIN(w) AS w0 FROM wk "
            "GROUP BY user_id), "
            "uw AS (SELECT DISTINCT user_id, w FROM wk), "
            "r AS (SELECT f.w0, uw.w - f.w0 AS k FROM uw "
            "JOIN f USING (user_id) "
            "WHERE uw.w - f.w0 BETWEEN 1 AND 4) "
            "SELECT w0 AS cohort_period, k, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM r GROUP BY 1, 2 "
            "UNION ALL "
            "SELECT w0, 0, CAST(COUNT(*) AS BIGINT) FROM f GROUP BY 1"
        ),
        "funnel_conversion": (
            "WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e "
            "JOIN t1 USING (user_id) WHERE e.event_type = 'click' "
            "AND e.ts > t1.ts1 GROUP BY e.user_id), "
            "t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e "
            "JOIN t2 USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.ts > t2.ts2 GROUP BY e.user_id) "
            "SELECT t1.user_id, CAST(1 "
            "+ CASE WHEN t2.ts2 IS NULL THEN 0 ELSE 1 END "
            "+ CASE WHEN t3.ts3 IS NULL THEN 0 ELSE 1 END AS BIGINT) "
            "AS stages_reached "
            "FROM t1 LEFT JOIN t2 USING (user_id) "
            "LEFT JOIN t3 USING (user_id)"
        ),
        "first_last_touch": (
            "WITH r AS (SELECT user_id, event_id, event_type, "
            "ROW_NUMBER() OVER w AS rf, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rl, "
            "COUNT(*) OVER (PARTITION BY user_id) AS n FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT f.user_id, f.event_id AS first_id, "
            "f.event_type AS first_token, l.event_id AS last_id, "
            "l.event_type AS last_token, CAST(f.n AS BIGINT) AS n_events "
            "FROM (SELECT * FROM r WHERE rf = 1) f "
            "JOIN (SELECT * FROM r WHERE rl = 1) l USING (user_id)"
        ),
        "user_sequences": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "string_agg(event_type, ',' ORDER BY ts, event_id) "
            "AS sequence FROM events GROUP BY user_id"
        ),
        "zscore_outliers": (
            "WITH c AS (SELECT event_id, user_id, "
            "CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT user_id, COUNT(*) AS n, SUM(cents) AS s, "
            "SUM(cents * cents) AS ss FROM c GROUP BY user_id), "
            "sc AS (SELECT c.event_id, c.user_id, "
            "(c.cents - (CAST(m.s AS DOUBLE) / m.n)) / sqrt(GREATEST("
            "CAST(m.ss AS DOUBLE) / m.n - (CAST(m.s AS DOUBLE) / m.n) "
            "* (CAST(m.s AS DOUBLE) / m.n), 0)) AS z "
            "FROM c JOIN m USING (user_id) "
            "WHERE m.ss * m.n > m.s * m.s) "
            "SELECT event_id, user_id, ROUND(z, 6) AS z FROM sc "
            "WHERE ABS(z) > 2"
        ),
        "rolling_window": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS 4 PRECEDING) AS BIGINT) AS window_cents "
            "FROM events"
        ),
        "cube_orders": (
            "SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '' "
            "ELSE o_orderpriority END AS o_orderpriority, "
            "CASE WHEN GROUPING(o_orderstatus) = 1 THEN '' "
            "ELSE o_orderstatus END AS o_orderstatus, "
            "CAST(GROUPING(o_orderpriority) + "
            "2 * GROUPING(o_orderstatus) AS BIGINT) AS grouping_id, "
            "COUNT(*) AS n_rows, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders "
            "GROUP BY CUBE(o_orderpriority, o_orderstatus)"
        ),
        "rollup_orders": (
            "SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN '' "
            "ELSE o_orderpriority END AS o_orderpriority, "
            "CASE WHEN GROUPING(o_orderstatus) = 1 THEN '' "
            "ELSE o_orderstatus END AS o_orderstatus, "
            "CAST(2 - GROUPING(o_orderpriority) - "
            "GROUPING(o_orderstatus) AS BIGINT) AS level, "
            "COUNT(*) AS n_rows, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders "
            "GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
        ),
        "pivot_events": (
            "SELECT user_id, "
            + ", ".join(
                # CAST the SUM itself: DuckDB SUM(BIGINT) returns
                # HUGEINT, which pandas materializes as float64 and
                # the driver's value hash is dtype-sensitive (the
                # round-4 red row — values were exactly equal).
                f"COUNT(*) FILTER (WHERE event_type = '{c}') AS n_{c}, "
                f"CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT)) "
                f"FILTER (WHERE event_type = '{c}'), 0) AS BIGINT) "
                f"AS cents_{c}"
                for c in _EVENT_TYPES
            )
            + " FROM events GROUP BY user_id"
        ),
        "anti_join_urgent": (
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "semi_join_urgent": (
            "SELECT c_custkey FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "bm25_search": (
            "WITH st AS (SELECT COUNT(*) AS n, CAST(SUM(len("
            "string_split(text, ' '))) AS DOUBLE) AS tot "
            "FROM documents), "
            "tok AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            f"q AS (SELECT unnest({list(_BM25_TERMS)!r}) AS term), "
            "df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) "
            "AS df FROM tok WHERE term IN (SELECT term FROM q) "
            "GROUP BY term), "
            "dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) "
            "AS DOUBLE) AS dl FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf "
            "FROM tok WHERE term IN (SELECT term FROM q) "
            "GROUP BY doc_id, term) "
            "SELECT tf.doc_id, ROUND(SUM("
            "ln(1 + ((SELECT n FROM st) - df.df + 0.5) / (df.df + 0.5)) "
            "* (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * ((1 - 0.75) + 0.75 * dl.dl / "
            "((SELECT tot FROM st) / (SELECT n FROM st))))"
            "), 6) AS score "
            "FROM tf JOIN df USING (term) JOIN dl USING (doc_id) "
            "GROUP BY tf.doc_id"
        ),
        "sequence_pack": (
            "WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) "
            "AS BIGINT) AS n FROM documents), "
            "c AS (SELECT doc_id, n, COALESCE(SUM(n) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS bef FROM t) "
            "SELECT doc_id, n AS n_tokens, "
            "CAST(bef // 256 AS BIGINT) AS seq_start, "
            "CAST((bef + n - 1) // 256 AS BIGINT) AS seq_end FROM c"
        ),
        "inverted_index": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "td AS (SELECT DISTINCT term, doc_id FROM tok), "
            "agg AS (SELECT term, COUNT(*) AS df, array_to_string("
            "list(doc_id ORDER BY doc_id), ',') AS p FROM td "
            "GROUP BY term) "
            "SELECT term, CAST(df AS BIGINT) AS df, "
            "CASE WHEN df <= 400 THEN p ELSE '' END AS postings FROM agg"
        ),
        "copurchase_pairs": (
            "WITH op AS (SELECT DISTINCT l_orderkey AS o, "
            "l_partkey AS p FROM lineitem) "
            "SELECT a.p AS item_a, b.p AS item_b, "
            "COUNT(*) AS n_groups "
            "FROM op a JOIN op b ON a.o = b.o AND a.p < b.p "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2"
        ),
        "running_window": (
            "SELECT event_id, user_id, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents, "
            "COALESCE(CAST(date_diff('microsecond', "
            "LAG(ts) OVER w, ts) AS BIGINT), -1) AS gap_us "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "ann_top10": (
            "WITH q AS (SELECT embedding AS qv FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, ROUND(CAST(list_cosine_similarity(embedding, "
            "(SELECT qv FROM q)) AS DOUBLE), 6) AS cosine "
            "FROM embeddings "
            "ORDER BY list_cosine_similarity(embedding, (SELECT qv FROM q)) "
            "DESC, vec_id LIMIT 10"
        ),
        "norm2_embeddings": (
            "SELECT ROUND(SQRT(SUM(v * v)), 6) AS norm2 FROM ("
            "  SELECT UNNEST(embedding) AS v FROM embeddings)"
        ),
        "pagerank": _pagerank_sql(_PR_K),
        "weighted_pagerank": _weighted_pagerank_sql(_PR_K),
        "hits": _hits_sql(_HITS_K),
        "harmonic_closeness": _harmonic_sql(_HC_LEVELS),
        "eccentricity": _ecc_sql(_HC_LEVELS),
        "reciprocity": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "m AS (SELECT COUNT(*) AS n_edges, "
            "SUM(CASE WHEN EXISTS (SELECT 1 FROM ed r "
            "WHERE r.src = ed.dst AND r.dst = ed.src) "
            "THEN 1 ELSE 0 END) AS n_reciprocal FROM ed) "
            "SELECT n_edges, CAST(n_reciprocal AS BIGINT) AS n_reciprocal, "
            "ROUND(n_reciprocal::DOUBLE / n_edges, 6) AS reciprocity "
            "FROM m"
        ),
        "pregel_pagerank": _pregel_pagerank_sql(_PPR_ROUNDS - 1),
        "personalized_pagerank": _ppr_sql(_PR_K),
        "asof_purchase": (
            "SELECT l.user_id, l.event_id, "
            "CAST(epoch_us(l.ts) AS BIGINT) AS ts, r.value AS value_r "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "ASOF JOIN (SELECT * FROM events "
            "WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "window_hopping": (
            "SELECT (epoch_us(ts) // 900000000 - i) * 900000000 "
            "AS window_start, event_type, COUNT(*) AS n_events, "
            "ROUND(SUM(value), 6) AS sum_value "
            "FROM events CROSS JOIN "
            "(SELECT unnest(range(4)) AS i) hops "
            "GROUP BY 1, 2"
        ),
        "topk_per_user": (
            "SELECT user_id, value, event_id FROM events "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY value DESC, event_id) <= 3"
        ),
        "doc_sample": (
            "SELECT doc_id FROM documents "
            "WHERE (doc_id * 40503) % 65536 < 3276"
        ),
        "adamic_adar": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "es AS MATERIALIZED (SELECT src, dst FROM ed "
            "UNION SELECT dst AS src, src AS dst FROM ed), "
            "deg AS MATERIALIZED (SELECT src AS w, COUNT(*) AS c "
            "FROM es GROUP BY src) "
            "SELECT e1.src AS u, e2.dst AS v, "
            "ROUND(SUM(1.0/ln(d.c)), 6) AS aa "
            "FROM es e1 JOIN es e2 ON e1.dst = e2.src "
            "JOIN deg d ON d.w = e1.dst "
            "WHERE e1.src < e2.dst AND NOT EXISTS ("
            "SELECT 1 FROM es x WHERE x.src = e1.src "
            "AND x.dst = e2.dst) "
            "GROUP BY e1.src, e2.dst"
        ),
        "avg_nbr_degree": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "es AS MATERIALIZED (SELECT src, dst FROM ed "
            "UNION SELECT dst AS src, src AS dst FROM ed), "
            "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c "
            "FROM es GROUP BY src) "
            "SELECT es.src AS vertex, "
            "ROUND(CAST(SUM(d.c) AS DOUBLE) / COUNT(*), 6) "
            "AS avg_nbr_deg "
            "FROM es JOIN deg d ON d.v = es.dst GROUP BY es.src"
        ),
        "jaccard_linkpred": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "es AS MATERIALIZED (SELECT src, dst FROM ed "
            "UNION SELECT dst AS src, src AS dst FROM ed), "
            "deg AS MATERIALIZED (SELECT src AS w, COUNT(*) AS c "
            "FROM es GROUP BY src), "
            "cm AS MATERIALIZED (SELECT e1.src AS u, e2.dst AS v, "
            "COUNT(*) AS common "
            "FROM es e1 JOIN es e2 ON e1.dst = e2.src "
            "WHERE e1.src < e2.dst AND NOT EXISTS ("
            "SELECT 1 FROM es x WHERE x.src = e1.src "
            "AND x.dst = e2.dst) "
            "GROUP BY e1.src, e2.dst) "
            "SELECT u, v, ROUND(CAST(common AS DOUBLE) / "
            "(du.c + dv.c - common), 6) AS jaccard "
            "FROM cm JOIN deg du ON du.w = cm.u "
            "JOIN deg dv ON dv.w = cm.v"
        ),
        "clustering_coeff": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "es AS MATERIALIZED (SELECT src, dst FROM ed "
            "UNION SELECT dst AS src, src AS dst FROM ed), "
            "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c "
            "FROM es GROUP BY src), "
            "tri AS MATERIALIZED (SELECT e1.src AS v, COUNT(*) AS t "
            "FROM es e1 JOIN es e2 ON e1.src = e2.src "
            "AND e1.dst < e2.dst "
            "JOIN es e3 ON e3.src = e1.dst AND e3.dst = e2.dst "
            "GROUP BY e1.src) "
            "SELECT d.v AS vertex, ROUND(CASE WHEN d.c >= 2 THEN "
            "2.0 * COALESCE(t.t, 0) / (d.c * (d.c - 1.0)) "
            "ELSE 0.0 END, 6) AS cc "
            "FROM deg d LEFT JOIN tri t ON t.v = d.v"
        ),
        "degree_hist": (
            "SELECT c AS degree, COUNT(*) AS n_vertices FROM ("
            f"SELECT src, COUNT(*) AS c FROM ({_E_DENSE}) GROUP BY src"
            ") GROUP BY c"
        ),
        "percentiles_price": (
            "SELECT CAST(q AS DOUBLE) AS q, value FROM ("
            "SELECT 0.25 AS q, quantile_disc(l_extendedprice, 0.25) "
            "AS value FROM lineitem UNION ALL "
            "SELECT 0.5, quantile_disc(l_extendedprice, 0.5) "
            "FROM lineitem UNION ALL "
            "SELECT 0.9, quantile_disc(l_extendedprice, 0.9) "
            "FROM lineitem UNION ALL "
            "SELECT 0.99, quantile_disc(l_extendedprice, 0.99) "
            "FROM lineitem)"
        ),
        "weighted_sample": (
            "SELECT doc_id, ROUND(score, 8) AS score FROM ("
            "SELECT doc_id, -ln((((doc_id * 48271 + 13) % 2147483647) "
            "+ 1) / 2147483648.0) / length(text) AS score "
            "FROM documents ORDER BY score, doc_id LIMIT 20)"
        ),
        "conjugate_gradient": _cg_sql(_CG_K),
        "conjugate_gradient_complex": _cg_complex_sql(_CG_K),
        "minhash_pairs": _minhash_poly_sql(),
        "simhash_pairs": _simhash_poly_sql(),
        "minhash_poly_pairs": _minhash_poly_sql(),
        "simhash_poly_pairs": _simhash_poly_sql(),
        "approx_distinct_poly": _hll_poly_sql(),
        "approx_distinct_sparse": (
            # HLL++ sparse mode = the exact sorted fingerprint set:
            # n_exact is COUNT(DISTINCT fv), checksum folds the sorted
            # distinct fingerprints with the same polynomial law.
            "WITH f AS MATERIALIZED (SELECT DISTINCT "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(regexp_extract_all(regexp_replace("
            "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), "
            "'\\s+', ' ', 'g'), '.'), "
            "c -> CAST(ord(c) AS BIGINT))), "
            "(h, c) -> (h * 1000003 + c) % 2147483647) AS fv "
            "FROM documents WHERE doc_id < 200) "
            "SELECT CAST(64 AS BIGINT) AS m, "
            "CAST(COUNT(*) AS BIGINT) AS n_exact, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list(fv ORDER BY fv)), "
            "(h, c) -> (h * 1000003 + c) % 2147483647) AS checksum "
            "FROM f"
        ),
        "length_buckets": (
            "WITH f AS MATERIALIZED (SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "b AS MATERIALIZED (SELECT doc_id, n_tokens, "
            "CAST(CASE WHEN n_tokens >= 512 THEN 5 "
            "WHEN n_tokens >= 256 THEN 4 WHEN n_tokens >= 128 THEN 3 "
            "WHEN n_tokens >= 64 THEN 2 WHEN n_tokens >= 32 THEN 1 "
            "ELSE 0 END AS BIGINT) AS bucket FROM f) "
            "SELECT doc_id, n_tokens, bucket, "
            "CAST((ROW_NUMBER() OVER (PARTITION BY bucket "
            "ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch_idx FROM b"
        ),
        "embedding_quantize": (
            "WITH e AS MATERIALIZED (SELECT vec_id, "
            "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings), "
            "s AS MATERIALIZED (SELECT vec_id, MAX(ABS(x)) AS scale "
            "FROM e GROUP BY vec_id), "
            "c AS MATERIALIZED (SELECT e.vec_id, e.x, s.scale, "
            "CASE WHEN s.scale > 0 THEN s.scale ELSE 1 END AS safe, "
            "CASE WHEN s.scale > 0 THEN ROUND(e.x / s.scale * 127) "
            "ELSE 0 END AS code "
            "FROM e JOIN s USING (vec_id)) "
            "SELECT vec_id, ROUND(MIN(scale), 6) AS scale, "
            "CAST(SUM(code) AS BIGINT) AS sum_codes, "
            "ROUND(MAX(ABS(code / 127 * safe - x)), 6) AS max_err "
            "FROM c GROUP BY vec_id"
        ),
        "bicgstab": _bicgstab_sql(_BI_K),
        "bicgstab_complex": _bicgstab_complex_sql(_BIC_K),
        "embedding_near_dup": (
            "WITH base AS MATERIALIZED (SELECT vec_id, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "pl AS MATERIALIZED (SELECT "
            f"vec_id + {_NEARDUP_OFF} AS vec_id, "
            "list(x + (((vec_id + k - 1) % 7) - 3) * 0.0009765625 "
            "ORDER BY k) AS v FROM ("
            "SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS x, "
            "generate_subscripts(embedding, 1) AS k FROM embeddings "
            f"WHERE vec_id % {_NEARDUP_EVERY} = 0) GROUP BY vec_id), "
            "aug AS MATERIALIZED ("
            "SELECT * FROM base UNION ALL SELECT * FROM pl) "
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine "
            "FROM aug a JOIN aug b ON b.vec_id > a.vec_id "
            "WHERE list_cosine_similarity(a.v, b.v) >= 0.95"
        ),
        "corpus_extract": _corpus_extract_sql(),
        "corpus_pagerank": _corpus_pagerank_sql(_CORPUS_PR_K),
        "corpus_components": _corpus_components_sql(_CORPUS_CC_K),
        "hpcg_vcycle": _hpcg_vcycle_sql(),
        "hpcg_pcg": _hpcg_pcg_sql(_HPCG_PCG_K),
        "ewise_lambda_matrix": (
            "SELECT src, dst, ROUND(weight / (1 + src % 5), 6) AS weight "
            f"FROM ({_E_WEIGHTED})"
        ),
        # Exact all-pairs 5-gram Jaccard ≥ 0.5 — the same polynomial
        # shingle hash as _shingles (dedup.py:65: bytes of the
        # whitespace-normalized lowercased text, Σ c_j·257^j mod 2³¹−1,
        # per-doc DISTINCT). Valid as the twin of the LSH-candidate-
        # verified Ray pipeline because MinHash recall at est ≥ 0.3 for
        # true J ≥ 0.5 is exhaustive on this corpus (checked at sf0.001
        # / sf0.01; all docs ASCII and ≥ 5 normalized chars, so the
        # byte windows are substr windows and the short-doc blake2b
        # fallback never fires).
        "ngram_jaccard": (
            f"WITH {_ngram_pair_ctes()} "
            "SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM j "
            "WHERE jac >= 0.5"
        ),
        "dedup_clusters": _dedup_clusters_sql(_DEDUP_CC_ROUNDS),
        "nation_revenue": (
            "SELECT n.n_name AS nation, "
            "CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents, COUNT(*) AS n_orders "
            "FROM orders o "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "GROUP BY n.n_name"
        ),
        "price_bands": (
            "WITH bands AS (SELECT range::BIGINT AS band, "
            "range * 10000.0 AS lo, (range + 1) * 10000.0 AS hi "
            "FROM range(11)) "
            "SELECT b.band, COUNT(*) AS n_items, "
            "CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS cents FROM lineitem l JOIN bands b "
            "ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi "
            "GROUP BY b.band"
        ),
        "neighbor_sample": _neighbor_sample_sql(),
        "mis": _mis_sql(_MIS_ROUNDS),
        "ktruss": _ktruss_sql(_KTRUSS_ROUNDS, _KTRUSS_K),
        "truss_decomposition": _truss_sql(_TRUSS_MAX_K, _TRUSS_ROUNDS),
        "ktruss_weighted": _wtruss_sql(_WTRUSS_ROUNDS, _WTRUSS_THR),
        "ktruss_weighted_shuffle": _wtruss_sql(
            _WTRUSS_ROUNDS, _WTRUSS_THR
        ),
        "katz_centrality": _katz_sql(_KATZ_K),
        "eigencentrality": _eigc_sql(_EIGC_K),
        "repetition_scores": _REPETITION_SQL,
        "densest_subgraph": _densest_sql(_DENSEST_ROUNDS),
        "modularity": _MODULARITY_SQL,
        "gopher_quality": _gopher_quality_sql(),
        "chunk_manifest": _CHUNK_MANIFEST_SQL,
        "mst_forest": _mst_sql(MOD_DENSE, _MST_ROUNDS, _MST_D),
        "salsa": _salsa_sql(_SALSA_K),
        "maximal_matching": _matching_sql(MOD_DENSE, _MATCH_ROUNDS),
        "rarity_scores": _rarity_sql(),
        "onion_layers": _onion_sql(_ONION_WAVES),
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "cms_counts": _cms_sql(_CMS_WIDTH),
        "vertex_cover": _vertex_cover_sql(MOD_DENSE, _MATCH_ROUNDS),
        "lang_vocab_overlap": _LANG_VOCAB_SQL,
        "rich_club": _rich_club_sql(_RICH_CLUB_K),
        "rare_term_pairs": _RARE_TERM_PAIRS_SQL,
        "effective_resistance": _effres_sql(_EFFRES_K),
        "square_count": _SQUARE_COUNT_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "pareto_frontier": _PARETO_SQL,
        "canonical_docs": _CANONICAL_DOCS_SQL,
        "zorder_events": _zorder_sql(_Z_BITS),
        "hyperball": _hyperball_sql(_HB_P, _HB_ROUNDS),
        "wl_colors": _wl_sql(_WL_K),
        "butterfly_count": _BUTTERFLY_SQL,
        "kn_continuation": _KN_SQL,
        "feature_hashing": _feature_hashing_sql(),
        "user_trend": _USER_TREND_SQL,
        "join_cardinality": _join_cardinality_sql(_JC_P),
        "hourly_active": _HOURLY_ACTIVE_SQL,
        "decayed_activity": _DECAYED_SQL,
        "corpus_lang_mixing": _corpus_lang_mixing_sql(),
        "interarrival_stats": _INTERARRIVAL_SQL,
        "assoc_rules": _ASSOC_RULES_SQL,
        "rendezvous_shards": _rendezvous_sql(_RDV_SHARDS),
        "heavy_hitters": (
            "WITH toks AS (SELECT unnest(regexp_extract_all("
            "text, '\\S+')) AS tok FROM documents), "
            "c AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok) "
            "SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 20"
        ),
        "train_test_split": (
            "WITH h AS (SELECT doc_id, lang, "
            "(doc_id * 1000003) % 1000000007 AS hh FROM documents), "
            "c AS (SELECT lang, COUNT(*) AS cnt FROM documents "
            "GROUP BY lang), "
            "r AS (SELECT doc_id, lang, ROW_NUMBER() OVER ("
            "PARTITION BY lang ORDER BY hh, doc_id) AS rk FROM h) "
            "SELECT r.doc_id, r.lang FROM r JOIN c ON c.lang = r.lang "
            "WHERE rk <= CAST(floor(cnt * 0.2) AS BIGINT)"
        ),
        "assortativity": (
            f"WITH ed AS MATERIALIZED ({_E_SPARSE}), "
            "es AS MATERIALIZED (SELECT src, dst FROM ed "
            "UNION SELECT dst AS src, src AS dst FROM ed), "
            "deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c "
            "FROM es GROUP BY src), "
            "m AS (SELECT COUNT(*) AS n, SUM(du.c) AS sx, "
            "SUM(dv.c) AS sy, SUM(du.c * du.c) AS sxx, "
            "SUM(dv.c * dv.c) AS syy, SUM(du.c * dv.c) AS sxy "
            "FROM es e JOIN deg du ON du.v = e.src "
            "JOIN deg dv ON dv.v = e.dst) "
            "SELECT ROUND((n::DOUBLE * sxy - sx::DOUBLE * sy) / "
            "(sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx) * "
            "sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)), 6) "
            "AS assortativity FROM m"
        ),
        "graph_coloring": _coloring_sql(_COLOR_K),
        "random_walks": _walks_sql(_WALK_STEPS),
        "betweenness": _betweenness_sql(_BC_LEVELS),
        "kcore": _kcore_sql(40),
        "labelprop": _labelprop_sql(_LP_K),
        "community_lpa": _community_lpa_sql(_LPA_K),
        "quality_scores": _quality_sql(),
        "fingerprints": _FINGERPRINT_SQL,
        "langid": _langid_sql(),
        "spmv_input_masked": (
            "SELECT dst AS vertex, CAST(SUM((src % 7) + 1) AS DOUBLE) "
            f"AS val FROM ({_E_DENSE}) WHERE src % 5 = 0 GROUP BY dst"
        ),
        "matrix_zip": (
            "SELECT (v * 7) % 601 AS src, (v * 13) % 601 AS dst, "
            "CAST(v % 10 + 1 AS DOUBLE) AS weight "
            "FROM (SELECT range::BIGINT AS v FROM range(601))"
        ),
        "matrix_ewise_union": (
            "SELECT src, dst, CAST(SUM(weight) AS DOUBLE) AS weight "
            f"FROM (SELECT * FROM ({_E_WEIGHTED}) UNION ALL "
            f"SELECT dst AS src, src AS dst, weight FROM ({_E_WEIGHTED})"
            ") GROUP BY 1, 2"
        ),
        "matrix_ewise_intersect": (
            "SELECT src, dst, CAST(SUM(weight) AS DOUBLE) AS weight "
            f"FROM (SELECT * FROM ({_E_WEIGHTED}) UNION ALL "
            f"SELECT dst AS src, src AS dst, weight FROM ({_E_WEIGHTED})"
            ") GROUP BY 1, 2 HAVING COUNT(*) = 2"
        ),
        "outer_product": (
            "SELECT u.v AS src, w.v AS dst, u.x * w.x AS weight "
            "FROM (SELECT range::BIGINT * 50 AS v, "
            "CAST(range * 50 // 10 + 1 AS DOUBLE) AS x FROM range(13)) u "
            "CROSS JOIN (SELECT range::BIGINT * 77 AS v, "
            "CAST((range * 77) % 5 + 1 AS DOUBLE) AS x FROM range(8)) w"
        ),
        "dot_degrees": (
            "WITH o AS (SELECT src AS vertex, COUNT(*) AS d "
            f"FROM ({_E_DENSE}) GROUP BY src), "
            "i AS (SELECT dst AS vertex, COUNT(*) AS d "
            f"FROM ({_E_DENSE}) GROUP BY dst) "
            "SELECT CAST(SUM(o.d * i.d) AS BIGINT) AS dot "
            "FROM o JOIN i ON i.vertex = o.vertex"
        ),
        "zip_unzip_degrees": (
            "WITH o AS (SELECT src AS vertex, COUNT(*) AS d "
            f"FROM ({_E_DENSE}) GROUP BY src), "
            "i AS (SELECT dst AS vertex, COUNT(*) AS d "
            f"FROM ({_E_DENSE}) GROUP BY dst) "
            "SELECT o.vertex, o.d AS \"first\", i.d AS \"second\" "
            "FROM o JOIN i ON i.vertex = o.vertex"
        ),
        "sparse_nn": (
            f"WITH e AS MATERIALIZED ({_E_WEIGHTED}), "
            "x0 AS (SELECT range::BIGINT AS v, "
            "CAST((range % 7) + 1 AS DOUBLE) AS x FROM range(601)), "
            "y1 AS MATERIALIZED (SELECT e.dst AS v, "
            "SUM(x0.x * e.weight) + 0.5 AS s "
            "FROM x0 JOIN e ON e.src = x0.v GROUP BY e.dst), "
            "l1 AS MATERIALIZED (SELECT v, "
            "LEAST(GREATEST(s, 0.0), 30.0) AS x FROM y1 "
            "WHERE GREATEST(s, 0.0) > 0), "
            "y2 AS MATERIALIZED (SELECT e.dst AS v, "
            "SUM(l1.x * e.weight) + 0.25 AS s "
            "FROM l1 JOIN e ON e.src = l1.v GROUP BY e.dst), "
            "l2 AS (SELECT v, LEAST(GREATEST(s, 0.0), 30.0) AS x "
            "FROM y2 WHERE GREATEST(s, 0.0) > 0) "
            "SELECT v AS vertex, ROUND(x, 6) AS val FROM l2"
        ),
        # Engine path: 3 arithmetic integer-weight layers (exact in
        # float64 ⇒ no ROUND needed), sparse frontier == the WHERE x>0
        # filters. Layer l: dst=(v*(l+3)+j*j+l)%601, w=((v+j+l)%5)-2,
        # duplicate (src,dst) pre-summed via GROUP BY.
        "sparse_nn_engine": (
            "WITH verts AS (SELECT range::BIGINT AS v FROM range(601)), "
            "js AS (SELECT range::BIGINT AS j FROM range(8)), "
            "e0 AS MATERIALIZED (SELECT v AS src, "
            "(v * 3 + j * j) % 601 AS dst, "
            "SUM(CAST((v + j) % 5 - 2 AS DOUBLE)) AS w "
            "FROM verts, js GROUP BY 1, 2), "
            "e1 AS MATERIALIZED (SELECT v AS src, "
            "(v * 4 + j * j + 1) % 601 AS dst, "
            "SUM(CAST((v + j + 1) % 5 - 2 AS DOUBLE)) AS w "
            "FROM verts, js GROUP BY 1, 2), "
            "e2 AS MATERIALIZED (SELECT v AS src, "
            "(v * 5 + j * j + 2) % 601 AS dst, "
            "SUM(CAST((v + j + 2) % 5 - 2 AS DOUBLE)) AS w "
            "FROM verts, js GROUP BY 1, 2), "
            "x0 AS (SELECT v, CAST(v % 7 AS DOUBLE) AS x FROM verts "
            "WHERE v % 7 > 0), "
            "y1 AS MATERIALIZED (SELECT e0.dst AS v, "
            "SUM(x0.x * e0.w) - 1.0 AS s "
            "FROM x0 JOIN e0 ON e0.src = x0.v GROUP BY e0.dst), "
            "l1 AS (SELECT v, LEAST(GREATEST(s, 0.0), 40.0) AS x "
            "FROM y1 WHERE GREATEST(s, 0.0) > 0), "
            "y2 AS MATERIALIZED (SELECT e1.dst AS v, "
            "SUM(l1.x * e1.w) - 2.0 AS s "
            "FROM l1 JOIN e1 ON e1.src = l1.v GROUP BY e1.dst), "
            "l2 AS (SELECT v, LEAST(GREATEST(s, 0.0), 40.0) AS x "
            "FROM y2 WHERE GREATEST(s, 0.0) > 0), "
            "y3 AS MATERIALIZED (SELECT e2.dst AS v, "
            "SUM(l2.x * e2.w) - 3.0 AS s "
            "FROM l2 JOIN e2 ON e2.src = l2.v GROUP BY e2.dst), "
            "l3 AS (SELECT v, LEAST(GREATEST(s, 0.0), 40.0) AS x "
            "FROM y3 WHERE GREATEST(s, 0.0) > 0) "
            "SELECT v AS vertex, x AS val FROM l3"
        ),
        # Corpus statistics: single-space split matches the Ray side's
        # pc.split_pattern(text, ' ') token-for-token; counts are exact
        # integers, and tf·ln(N/df) is the same double expression
        # (libm log) rounded half-away at 6 on both sides.
        "tfidf_terms": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "g AS (SELECT term, COUNT(*)::BIGINT AS tf, "
            "COUNT(DISTINCT doc_id)::BIGINT AS df FROM toks "
            "GROUP BY term) "
            "SELECT term, tf, df, ROUND(tf * ln("
            "(SELECT COUNT(*) FROM documents) / CAST(df AS DOUBLE)"
            "), 6) AS tfidf FROM g"
        ),
        "tfidf_top_term": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS term FROM documents), "
            "g AS (SELECT doc_id, term, COUNT(*)::DOUBLE AS tf "
            "FROM toks GROUP BY doc_id, term), "
            "df AS (SELECT term, COUNT(DISTINCT doc_id) AS df "
            "FROM toks GROUP BY term), "
            "s AS (SELECT g.doc_id, g.term, ROUND(g.tf * ln("
            "(SELECT COUNT(*) FROM documents) / CAST(df.df AS DOUBLE)"
            "), 6) AS tfidf FROM g JOIN df USING (term)), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY tfidf DESC, term) AS rn FROM s) "
            "SELECT doc_id, term, tfidf FROM r WHERE rn = 1"
        ),
        "bigram_counts": (
            "WITH t AS (SELECT string_split(text, ' ') AS l "
            "FROM documents), "
            "p AS (SELECT unnest(list_zip(l, l[2:])) AS pr FROM t) "
            "SELECT pr[1] || ' ' || pr[2] AS bigram, "
            "COUNT(*)::BIGINT AS cnt "
            "FROM p WHERE pr[2] IS NOT NULL GROUP BY 1"
        ),
        # Training-data hygiene twins. The PII plant expression rebuilds
        # _plant_pii's strings verbatim; the regexes are RE2 on BOTH
        # engines (pyarrow and DuckDB), replaced in the same order
        # (URL → EMAIL → PHONE), each class counted on the text AFTER
        # the previous class was replaced.
        "pii_scrub": (
            "WITH planted AS (SELECT doc_id, text || CASE WHEN "
            "doc_id % 3 = 0 THEN ' contact user' || doc_id "
            "|| '@example.com or https://ex' || doc_id || '.org/a call '"
            " || ((doc_id % 900) + 100) || '-555-' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
            "ELSE '' END AS text FROM documents), "
            "s1 AS (SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, 'https?://[^\\s]+')) "
            "AS BIGINT) AS n_urls, "
            "regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g') "
            "AS text FROM planted), "
            "s2 AS (SELECT doc_id, n_urls, "
            "CAST(length(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "AS BIGINT) AS n_emails, "
            "regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g') AS text FROM s1) "
            "SELECT doc_id, n_urls, n_emails, "
            "CAST(length(regexp_extract_all(text, "
            "'[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones, "
            "regexp_replace(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}', "
            "'<PHONE>', 'g') AS clean_text FROM s2"
        ),
        "paragraph_dedup": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "idx AS (SELECT doc_id, t, "
            "unnest(range((len(t) + 19) // 20)) AS i FROM toks), "
            "p2 AS (SELECT doc_id, i AS para_idx, array_to_string("
            "list_slice(t, i * 20 + 1, (i + 1) * 20), ' ') AS para "
            "FROM idx), "
            "keep AS (SELECT para, MIN(doc_id * 1048576 + para_idx) "
            "AS mk FROM p2 GROUP BY para) "
            "SELECT doc_id, CAST(SUM(n_paras) AS BIGINT) AS n_paras, "
            "CAST(SUM(kept) AS BIGINT) AS n_kept, "
            "CAST(SUM(chars) AS BIGINT) AS kept_chars FROM ("
            "SELECT doc_id, COUNT(*) AS n_paras, 0 AS kept, 0 AS chars "
            "FROM p2 GROUP BY doc_id "
            "UNION ALL "
            "SELECT mk // 1048576 AS doc_id, 0, 1, length(para) "
            "FROM keep) GROUP BY doc_id"
        ),
        "dup_spans": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "w AS (SELECT doc_id, t, unnest(range(len(t) - 7)) AS i "
            "FROM toks WHERE len(t) >= 8), "
            "wins AS (SELECT doc_id, array_to_string("
            "list_slice(t, i + 1, i + 8), ' ') AS win FROM w), "
            "dw AS (SELECT DISTINCT doc_id, win FROM wins), "
            "dup AS (SELECT win FROM dw GROUP BY win "
            "HAVING COUNT(*) >= 2) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_windows "
            "FROM dw WHERE win IN (SELECT win FROM dup) GROUP BY doc_id"
        ),
        "decontaminate": (
            "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
            "FROM documents), "
            "w AS (SELECT doc_id, t, unnest(range(len(t) - 12)) AS i "
            "FROM toks WHERE len(t) >= 13), "
            "g AS (SELECT doc_id, array_to_string("
            "list_slice(t, i + 1, i + 13), ' ') AS gram FROM w), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10) "
            "SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated "
            "FROM g JOIN bench ON g.gram = bench.gram GROUP BY g.doc_id"
        ),
    }
