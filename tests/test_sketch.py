"""HyperLogLog approximate distinct vs exact cardinality."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.stages.sketch import approx_distinct


@pytest.mark.parametrize("true_n", [100, 5_000, 60_000])
def test_hll_within_tolerance(true_n):
    rng = np.random.RandomState(1)
    # Values repeated ~3x on average, shuffled across blocks.
    vals = rng.randint(0, true_n, true_n * 3)
    present = np.unique(vals).size
    ds = ray.data.from_arrow(
        pa.table({"v": vals.astype(np.int64)})
    ).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - present) / present < 0.05, (est, present)


def test_hll_matches_docs_exact_scale():
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    exact = ds.to_pandas()["text"].nunique()
    est = approx_distinct(ds, "text", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_heavy_hitters_exact_topk():
    import collections

    from alp_ray.stages.sketch import heavy_hitters

    rng = np.random.RandomState(9)
    vocab = [f"w{i:03d}" for i in range(300)]
    # Zipf-ish frequencies so the top-k is well separated.
    docs = []
    for d in range(40):
        words = [
            vocab[min(int(rng.zipf(1.3)) - 1, 299)] for _ in range(200)
        ]
        docs.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(40, dtype=np.int64),
                  "text": docs})
    )
    got = heavy_hitters(ds, text_col="text", k=10, counters=64)
    cnt = collections.Counter(
        w for t in docs for w in t.split()
    )
    want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
    have = list(zip(got.column("tok").to_pylist(),
                    got.column("cnt").to_pylist()))
    assert have == want


def test_heavy_hitters_n_total_survives_emptied_summary():
    """Uniform high-cardinality blocks empty the Misra-Gries summary
    (top counters+1 counts all equal → everything compresses to 0);
    the block's token count must still reach the driver so the
    exactness bound n_total/(counters+1) stays honest. With a planted
    hot token the top-1 must come back with its EXACT count."""
    import collections

    from alp_ray.stages.sketch import heavy_hitters

    # 4 blocks × 64 distinct singleton tokens (> counters=8, all count
    # 1 → compression subtracts 1 and empties the summary), plus one
    # block of a single hot token repeated 600 times.
    docs = [
        " ".join(f"u{b:02d}x{i:03d}" for i in range(64))
        for b in range(4)
    ] + ["hot " * 600]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": np.arange(5, dtype=np.int64),
                  "text": docs})
    ).repartition(5)
    got = heavy_hitters(ds, text_col="text", k=1, counters=8)
    assert got.column("tok").to_pylist() == ["hot"]
    assert got.column("cnt").to_pylist() == [600]
    cnt = collections.Counter(w for t in docs for w in t.split())
    # The assert inside heavy_hitters already used n_total; re-derive
    # the bound here to document it: 600 > (64*4+600)/9 ≈ 95.
    assert 600 > sum(cnt.values()) / 9


def test_approx_distinct_poly_estimate_accuracy():
    """The poly-hash HLL estimate must land within the standard HLL
    error envelope (~1.04/sqrt(m) ~ 13% at m=64; allow 3 sigma) on a
    corpus of distinct texts, and the state summary must be stable
    across block splits (mergeable by elementwise max)."""
    import ray.data
    from alp_ray.stages.sketch import approx_distinct_poly

    n = 400
    texts = [f"document number {i} with unique payload {i*i}"
             for i in range(n)]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    state, est = approx_distinct_poly(ds)
    assert state["m"] == 64
    assert abs(est - n) / n < 0.40
    # Split into many blocks: identical registers (max-merge law).
    ds4 = ray.data.from_arrow(
        pa.table({"text": texts})
    ).repartition(7)
    state4, est4 = approx_distinct_poly(ds4)
    assert state4 == state and est4 == est


def test_approx_distinct_poly_sparse_mode_exact():
    """Below the 4·m distinct threshold the HLL++ sketch stays sparse:
    the estimate is EXACT and the state is partition-independent."""
    import ray.data
    from alp_ray.stages.sketch import approx_distinct_poly

    texts = [f"sparse doc {i}" for i in range(100)] * 3  # 100 distinct
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    state, est = approx_distinct_poly(ds)
    assert state["mode"] == "sparse"
    assert state["n_exact"] == 100 and est == 100.0
    ds9 = ray.data.from_arrow(pa.table({"text": texts})).repartition(9)
    state9, est9 = approx_distinct_poly(ds9)
    assert state9 == state and est9 == est


def test_approx_distinct_poly_promotion_is_partition_independent():
    """Crossing the threshold (here 4·64 = 256 < 300 distinct) promotes
    to dense registers identically for any block layout, including
    layouts where every individual block stays sparse."""
    import ray.data
    from alp_ray.stages.sketch import approx_distinct_poly

    texts = [f"promo doc {i} x{i*i}" for i in range(300)]
    one = ray.data.from_arrow(pa.table({"text": texts}))
    s1, e1 = approx_distinct_poly(one)
    assert s1["mode"] == "dense"
    many = ray.data.from_arrow(pa.table({"text": texts})).repartition(8)
    s8, e8 = approx_distinct_poly(many)
    assert s8 == s1 and e8 == e1
