"""Count-min sketch guarantee + event-transition correctness."""

import numpy as np
import pyarrow as pa


def test_cms_overestimates_never_under(ray_session):
    import ray.data

    from alp_ray.stages.sketch import cms_counts

    rng = np.random.default_rng(5)
    # Zipf-ish keys: heavy hitters + long tail.
    keys = np.concatenate([
        np.zeros(500, np.int64),
        rng.integers(0, 5000, 4000),
    ])
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    out = cms_counts(ds, key_col="k", width=256).to_pandas()
    assert (out["est"] >= out["true_cnt"]).all()
    # Exact totals, and the heavy hitter's estimate is tight-ish.
    assert out["true_cnt"].sum() == keys.size
    hh = out[out["k"] == 0].iloc[0]
    assert hh.true_cnt >= 500
    # CMS error bound: e·N/width with d=4 rows is far below N; just
    # check the estimate didn't blow past twice the truth for the hh.
    assert hh.est <= 2 * hh.true_cnt


def test_transition_counts_tiny(ray_session):
    import pandas as pd

    import ray.data

    from alp_ray.stages.window import transition_counts

    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 8, 9], pa.int64()),
        "ts": pa.array(
            pd.to_datetime([
                "2024-01-01", "2024-01-02", "2024-01-03",
                "2024-01-01", "2024-01-02", "2024-01-01",
            ])
        ),
        "event_type": pa.array(["a", "b", "a", "a", "a", "b"]),
    })
    out = transition_counts(ray.data.from_arrow(ev)).to_pandas()
    got = {
        (r.from_type, r.to_type): r.cnt for r in out.itertuples()
    }
    # user 7: a→b, b→a; user 8: a→a; user 9: none.
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 1}
