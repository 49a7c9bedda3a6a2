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
