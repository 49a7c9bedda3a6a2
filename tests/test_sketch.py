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
