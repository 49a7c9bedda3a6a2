"""Replicates the driver's correctness gate locally at sf0.001:
run every queries() entry, run its oracle_sql() twin in DuckDB over the
same parquet, compare row count + column names + order-insensitive
values. This is the same compare the driver performs at sf0.01."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())


@pytest.fixture(scope="module")
def con():
    return _duck()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_no_hugeint(name, con):
    """DuckDB SUM(BIGINT) returns HUGEINT, which pandas materializes
    as float64 while the Ray side emits int64 — the driver's value
    hash is dtype-sensitive, so any HUGEINT column in a twin is a
    latent red row (the round-4 pivot_events failure).  Every
    aggregate must carry an explicit CAST."""
    desc = con.execute(f"DESCRIBE {entrymod.oracle_sql()[name]}").df()
    bad = [
        (c, t)
        for c, t in zip(desc["column_name"], desc["column_type"])
        if "HUGEINT" in t.upper()
    ]
    assert not bad, f"{name}: HUGEINT oracle columns {bad}"


def _dtype_kind(dtype) -> str:
    if np.issubdtype(dtype, np.floating):
        return "f"
    if np.issubdtype(dtype, np.integer):
        return "i"
    if np.issubdtype(dtype, np.bool_):
        return "b"
    return "o"


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    got_raw = _to_df(q(SF))
    want_raw = con.execute(entrymod.oracle_sql()[name]).df()
    # Dtype-KIND parity before normalization: the driver hashes raw
    # values, so an int64-vs-float64 column with equal values still
    # hash-mismatches (round-4 pivot_events).
    for c in got_raw.columns:
        if c in want_raw.columns:
            gk, wk = _dtype_kind(got_raw[c].dtype), _dtype_kind(
                want_raw[c].dtype
            )
            assert gk == wk, (
                f"{name}.{c}: Ray dtype kind {gk} "
                f"({got_raw[c].dtype}) vs oracle {wk} "
                f"({want_raw[c].dtype}) — equal values would still "
                f"fail the driver's value hash"
            )
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), atol=2e-6,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (a == b).all(), f"{name}.{c} mismatch"
    # Standing ulp audit (the round-2..4 red-row class): the driver
    # hashes RAW values, so float columns must be EXACTLY equal, not
    # equal-after-re-rounding — a Ray-vs-twin op-order drift that
    # flips a ROUND(·, 6) digit, or an unrounded emission the
    # allclose above would mask, fails here. All 130 oracled queries
    # verified bitwise-equal when this gate was introduced.
    key = sorted(got_raw.columns)
    g = got_raw.sort_values(key).reset_index(drop=True)
    w = want_raw.sort_values(key).reset_index(drop=True)
    for c in key:
        if not np.issubdtype(g[c].dtype, np.floating):
            continue
        a = g[c].to_numpy(np.float64)
        b = w[c].to_numpy(np.float64)
        exact = (a == b) | (np.isnan(a) & np.isnan(b))
        assert exact.all(), (
            f"{name}.{c}: floats not BITWISE equal (driver hashes raw "
            f"values); first diff at row {int(np.flatnonzero(~exact)[0])}: "
            f"{a[~exact][0]!r} vs {b[~exact][0]!r}"
        )


def test_rows_only_queries_run():
    """Non-SQL-expressible queries must still run and return rows
    with a stable schema."""
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(ORACLED)):
        df = _to_df(qs[name](SF))
        assert df is not None and len(df.columns) > 0, name
        assert len(df) >= 0


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"repo", "path", "pr"} <= set(df.columns)
    # Utility files (high in-degree) should outrank leaf files.
    top = df.sort_values("pr", ascending=False).head(10)
    assert (top["pr"] > df["pr"].median()).all()


# The driver gates only the FIRST 50 queries() entries in dict insertion
# order (CLAUDE.md window discipline) — frozen here so an accidental
# reorder can never silently drop a driver-verified row out of the
# hard-signal window. New queries must be APPENDED after the window.
_GATE_WINDOW = [
    "edges_distinct", "out_degrees", "in_degrees", "spmv_plus_times",
    "spmv_transpose", "spmv_min_plus", "spmv_masked",
    "ewise_add_degrees", "spy_downsample", "spgemm_two_hop",
    "triangle_count", "connected_components", "scc", "khop2",
    "sssp_hops4", "sssp_full", "pagerank", "weighted_pagerank",
    "pregel_pagerank", "labelprop", "conjugate_gradient", "kcore",
    "hits", "corpus_extract", "corpus_pagerank", "corpus_components",
    "dedup_exact", "token_counts", "doc_stats", "quality_scores",
    "langid", "fingerprints", "minhash_pairs", "simhash_pairs",
    "embedding_near_dup", "ann_top10", "norm2_embeddings",
    "kmeans_assign", "window_hourly", "sessions", "running_window",
    "copurchase_pairs", "inverted_index", "sequence_pack",
    "bm25_search", "global_rank", "anti_join_urgent", "pivot_events",
    "grouped_median", "zscore_outliers",
]


def test_gate_window_order_frozen():
    keys = list(entrymod.queries().keys())[:50]
    assert keys == _GATE_WINDOW, (
        "the first 50 queries() keys changed — driver-verified rows "
        "would fall out of the hard-signal window; append new queries "
        "at the END"
    )


def test_every_window_query_is_oracled():
    """Round-5 invariant: zero no_oracle rows inside the window."""
    oracled = set(entrymod.oracle_sql().keys())
    missing = [k for k in _GATE_WINDOW if k not in oracled]
    assert not missing, f"window rows without oracle_sql: {missing}"
