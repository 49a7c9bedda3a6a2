"""dataset_diff: added/removed/changed semantics + dup-key guard."""

import numpy as np
import pyarrow as pa
import pytest


def test_dataset_diff_semantics(ray_session):
    import ray.data

    from alp_ray.stages.relational import dataset_diff

    a = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"]),
    })
    b = pa.table({
        "id": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array(["b", "CHANGED", "d", "e"]),
    })
    out = (
        dataset_diff(
            ray.data.from_arrow(a), ray.data.from_arrow(b),
            key_col="id", value_col="v",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.to_numpy())) == [
        (1, "removed"), (3, "changed"), (5, "added"),
    ]


def test_dataset_diff_duplicate_keys_raise(ray_session):
    import ray
    import ray.data

    from alp_ray.stages.relational import dataset_diff

    a = pa.table({
        "id": pa.array([1, 1], pa.int64()),
        "v": pa.array(["x", "y"]),
    })
    b = pa.table({
        "id": pa.array([1], pa.int64()),
        "v": pa.array(["x"]),
    })
    with pytest.raises(Exception, match="duplicate keys|RayTaskError"):
        dataset_diff(
            ray.data.from_arrow(a), ray.data.from_arrow(b),
            key_col="id", value_col="v",
        ).to_pandas()
