"""Distributed statistics operators: degree histogram, exact
percentiles, weighted deterministic sampling.

All three follow the combiner discipline (SURVEY §7 "pre-aggregate
inside map_batches"): the per-block partial is tiny and bounded (a
histogram slice, a quantile sketch + bracket counts, a k-row top-k), so
what reaches the driver / the final combine is O(#blocks · bound), not
O(rows) — the shapes stay valid at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from alp_ray.util import half_away_int

import ray
import ray.data


def degree_histogram(
    edges: "ray.data.Dataset", key: str = "src"
) -> pa.Table:
    """Histogram of vertex degrees: (degree, n_vertices), degree
    ascending. Plan: one groupby for exact per-vertex degrees (the
    unavoidable key exchange), then per-block partial histograms —
    O(#distinct degrees) each, merged driver-side (power-law graphs
    have O(log n) distinct degrees; the merge is trivially small)."""
    from alp_ray.stages.graph import degrees

    deg = degrees(edges, key=key, name="degree")

    def partial(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("degree"), np.int64)
        vals, cnts = np.unique(d, return_counts=True)
        return pa.table({"degree": vals, "n": cnts})

    parts = deg.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table({
            "degree": pa.array([], pa.int64()),
            "n_vertices": pa.array([], pa.int64()),
        })
    d = np.array([p["degree"] for p in parts], np.int64)
    n = np.array([p["n"] for p in parts], np.int64)
    order = np.argsort(d, kind="stable")
    d, n = d[order], n[order]
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    return pa.table({
        "degree": d[starts],
        "n_vertices": np.add.reduceat(n, starts),
    })


def degree_assortativity(
    edges_sym: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> float:
    """Pearson degree-degree correlation over the edges of a SYMMETRIC
    graph (Newman, "Assortative mixing in networks", PRL 89, 2002).

    Plan: one degree groupby, two hash joins to attach deg(src)/deg(dst)
    to every edge (sized by ``join_partitions`` — no broadcast, so the
    vertex set never needs to fit anywhere), then per-batch INTEGER
    moment partials (n, Σx, Σy, Σx², Σy², Σxy — exact in int64) merged
    driver-side. The only FP ops are the final six-term formula, so the
    scalar is bitwise reproducible and SQL-twinnable."""
    from alp_ray.stages.graph import degrees
    from alp_ray.util import join_partitions

    e = edges_sym.select_columns(["src", "dst"]).materialize()
    if num_partitions is None:
        num_partitions = join_partitions(e.count())
    deg = degrees(e, key="src", name="__du").materialize()

    def as_dst(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": batch.column("src").cast(pa.int64()),
                "__dv": batch.column("__du"),
            }
        )

    degd = deg.map_batches(as_dst, batch_format="pyarrow").materialize()
    j1 = e.join(
        deg, join_type="inner", num_partitions=num_partitions,
        on=("src",),
    ).materialize()
    j2 = j1.join(
        degd, join_type="inner", num_partitions=num_partitions,
        on=("dst",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if "__du" not in batch.column_names or batch.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table(
                {k: z for k in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            )
        x = np.asarray(batch.column("__du"), np.int64)
        y = np.asarray(batch.column("__dv"), np.int64)
        return pa.table(
            {
                "n": pa.array([x.size]),
                "sx": pa.array([int(x.sum())]),
                "sy": pa.array([int(y.sum())]),
                "sxx": pa.array([int((x * x).sum())]),
                "syy": pa.array([int((y * y).sum())]),
                "sxy": pa.array([int((x * y).sum())]),
            }
        )

    parts = pa.concat_tables(
        ray.get(
            j2.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
    )
    n = float(sum(np.asarray(parts.column("n"), np.int64)))
    sx = float(sum(np.asarray(parts.column("sx"), np.int64)))
    sy = float(sum(np.asarray(parts.column("sy"), np.int64)))
    sxx = float(sum(np.asarray(parts.column("sxx"), np.int64)))
    syy = float(sum(np.asarray(parts.column("syy"), np.int64)))
    sxy = float(sum(np.asarray(parts.column("sxy"), np.int64)))
    num = n * sxy - sx * sy
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    return float(num / den)


def reciprocity(
    edges: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> tuple[int, int]:
    """(n_reciprocal, n_edges) of a DISTINCT directed edge table: one
    self-hash-join against the reversed edges (sized by
    ``join_partitions``), counts only — integers, so the final ratio is
    bitwise SQL-twinnable."""
    from alp_ray.util import join_partitions

    e = edges.select_columns(["src", "dst"]).materialize()
    total = e.count()
    if num_partitions is None:
        num_partitions = join_partitions(total)

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("dst").cast(pa.int64()),
                "dst": batch.column("src").cast(pa.int64()),
            }
        )

    rev = e.map_batches(swap, batch_format="pyarrow").materialize()
    matched = e.join(
        rev, join_type="inner", num_partitions=num_partitions,
        on=("src", "dst"),
    ).count()
    return matched, total


def exact_percentiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    sample_per_block: int = 1024,
) -> pa.Table:
    """EXACT order statistics of a numeric column without a global sort:
    the classic two-pass bracket selection.

    Pass 1 (one map_batches): per-block row count + an evenly-spaced
    sorted sample of ``sample_per_block`` values. The merged sample
    brackets each target rank with rank error ≤ Σ_b n_b/sample ≈
    n/sample, so the bracket holds ≈ 2·#blocks·(block/sample) values.
    Pass 2 (one map_batches): per block, exact count of values below
    each bracket floor + the values inside each bracket (bounded).
    The driver sorts the in-bracket values (small) and indexes the
    exact k-th. Rank convention: k = ceil(q·n) (1-based) — DuckDB's
    ``quantile_disc``.

    Falls back to widening the bracket once if a skewed distribution
    (mass concentrated on one value) leaves a rank outside; degenerate
    all-equal brackets resolve immediately since the bracket values
    contain the answer by construction.
    """
    qs = tuple(float(q) for q in qs)

    def pass1(batch: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(batch.column(col), np.float64))
        if v.size > sample_per_block:
            idx = np.linspace(0, v.size - 1, sample_per_block).astype(
                np.int64
            )
            samp = v[idx]
        else:
            samp = v
        return pa.table({
            "n": pa.array([v.size], pa.int64()),
            "sample": pa.array([samp], pa.list_(pa.float64())),
        })

    p1 = ds.select_columns([col]).map_batches(
        pass1, batch_format="pyarrow"
    ).take_all()
    n_total = int(sum(r["n"] for r in p1))
    if n_total == 0:
        return pa.table({
            "q": pa.array(qs, pa.float64()),
            "value": pa.array([None] * len(qs), pa.float64()),
        })
    merged = np.sort(np.concatenate([np.asarray(r["sample"]) for r in p1]))
    ranks = [max(1, int(np.ceil(q * n_total))) for q in qs]
    # Bracket each rank between two merged-sample values (pad by one
    # sample step each side to absorb the per-block sampling error).
    brackets = []
    for k in ranks:
        pos = (k - 1) / max(1, n_total - 1) * (merged.size - 1)
        lo_i = max(0, int(np.floor(pos)) - max(2, merged.size // 256))
        hi_i = min(
            merged.size - 1,
            int(np.ceil(pos)) + max(2, merged.size // 256),
        )
        brackets.append((merged[lo_i], merged[hi_i]))
    lo_arr = np.array([b[0] for b in brackets])
    hi_arr = np.array([b[1] for b in brackets])

    def pass2(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col), np.float64)
        below = np.array(
            [int((v < lo).sum()) for lo in lo_arr], np.int64
        )
        inside = [
            v[(v >= lo) & (v <= hi)]
            for lo, hi in zip(lo_arr, hi_arr)
        ]
        return pa.table({
            "below": pa.array([below], pa.list_(pa.int64())),
            "inside": pa.array(
                [np.concatenate(inside) if inside else np.empty(0)],
                pa.list_(pa.float64()),
            ),
            "sizes": pa.array(
                [np.array([x.size for x in inside], np.int64)],
                pa.list_(pa.int64()),
            ),
        })

    p2 = ds.select_columns([col]).map_batches(
        pass2, batch_format="pyarrow"
    ).take_all()
    below_tot = np.sum([np.asarray(r["below"]) for r in p2], axis=0)
    vals = []
    for i, k in enumerate(ranks):
        parts = []
        for r in p2:
            ins = np.asarray(r["inside"])
            sizes = np.asarray(r["sizes"])
            off = int(sizes[:i].sum())
            parts.append(ins[off : off + int(sizes[i])])
        inside = np.sort(np.concatenate(parts))
        j = k - 1 - int(below_tot[i])
        assert 0 <= j < inside.size, (
            f"bracket missed rank {k} (below={below_tot[i]}, "
            f"in-bracket={inside.size}) — widen sample_per_block"
        )
        vals.append(inside[j])
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array(vals, pa.float64()),
    })


def weighted_sample(
    ds: "ray.data.Dataset",
    key: str,
    weight_of,
    k: int = 20,
    mult: int = 48271,
    mod: int = 2147483647,
) -> pa.Table:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res, Inf. Proc. Lett. 97(5), 2006): score
    -ln(u)/w with u ∈ (0,1) from an ARITHMETIC hash of the key (builtin
    hash() is salted per process — CLAUDE.md gotcha), keep the k
    smallest scores. Reproducible across engines: the same formula is
    SQL-verbatim, which is the whole point vs random_shuffle sampling.

    ``weight_of(batch) -> np.ndarray`` computes per-row weights from the
    batch (e.g. content length). Two-stage top-k: per-block partial
    (≤ k rows leave each block), tiny driver-side final merge.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(key), np.int64)
        w = np.asarray(weight_of(batch), np.float64)
        u = ((ids * mult + 13) % mod + 1).astype(np.float64) / (mod + 1)
        score = -np.log(u) / w
        order = np.argsort(score, kind="stable")[:k]
        return pa.table({key: ids[order], "score": score[order]})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    ids = np.array([r[key] for r in parts], np.int64)
    sc = np.array([r["score"] for r in parts], np.float64)
    order = np.lexsort((ids, sc))[:k]
    return pa.table({key: ids[order], "score": sc[order]})


def pearson_corr(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    x_scale: int = 100,
    y_scale: int = 100,
) -> float:
    """Exact-moment Pearson correlation between two numeric columns:
    per-batch INTEGER moment partials (n, Σx, Σy, Σx², Σy², Σxy over
    fixed-point cents — exact in int64) merged driver-side; only the
    final six-term formula runs in floats, so the scalar is bitwise
    reproducible and SQL-twinnable (the twin writes the same formula
    over the same integer sums — never SQL's corr(), which accumulates
    differently). Int64 bound: Σxy < 2⁶³ needs n·(x·scale)·(y·scale)
    < 9.2e18 — at larger volumes shard the sum into per-block Python
    ints (arbitrary precision) before combining."""

    def partials(batch: pa.Table) -> pa.Table:
        x = half_away_int(batch.column(x_col), x_scale)
        y = half_away_int(batch.column(y_col), y_scale)
        return pa.table({
            "n": pa.array([x.size], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    rows = ds.select_columns([x_col, y_col]).map_batches(
        partials, batch_format="pyarrow"
    ).take_all()  # O(#blocks) scalar rows — the small-aggregate escape
    n = float(sum(r["n"] for r in rows))
    sx = float(sum(r["sx"] for r in rows))
    sy = float(sum(r["sy"] for r in rows))
    sxx = float(sum(r["sxx"] for r in rows))
    syy = float(sum(r["syy"] for r in rows))
    sxy = float(sum(r["sxy"] for r in rows))
    num = n * sxy - sx * sy
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    return float(num / den) if den > 0 else 0.0
