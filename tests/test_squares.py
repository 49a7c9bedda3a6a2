"""4-cycle counting: known tiny graphs + a dense-codegree oracle."""

import numpy as np
import pyarrow as pa


def _count_via_query(ray_session, s, d, n):
    import ray
    import ray.data

    from alp_ray.stages.relational import co_occurrence

    es = pa.table({
        "src": pa.array(np.concatenate([s, d]).astype(np.int64)),
        "dst": pa.array(np.concatenate([d, s]).astype(np.int64)),
    })
    cn = co_occurrence(
        ray.data.from_arrow(es), group_col="src", item_col="dst",
        min_count=2, max_group=n,
    )
    total = 0
    for t in ray.get(cn.materialize().to_arrow_refs()):
        if "n_groups" in t.column_names and t.num_rows:
            c = np.asarray(t.column("n_groups"), np.int64)
            total += int((c * (c - 1) // 2).sum())
    return total // 2


def _count_dense(s, d, n):
    A = np.zeros((n, n), np.int64)
    A[s, d] = 1
    A[d, s] = 1
    C = A @ A
    iu = np.triu_indices(n, 1)
    c = C[iu]
    return int((c * (c - 1) // 2).sum()) // 2


def test_square_count_known_graphs(ray_session):
    # C4 cycle: exactly one square.
    s = np.array([0, 1, 2, 3])
    d = np.array([1, 2, 3, 0])
    assert _count_via_query(ray_session, s, d, 4) == 1
    # K4: three squares.
    s = np.array([0, 0, 0, 1, 1, 2])
    d = np.array([1, 2, 3, 2, 3, 3])
    assert _count_via_query(ray_session, s, d, 4) == 3
    # Triangle: none.
    s = np.array([0, 1, 2])
    d = np.array([1, 2, 0])
    assert _count_via_query(ray_session, s, d, 3) == 0


def test_square_count_random_vs_dense(ray_session):
    rng = np.random.RandomState(41)
    n = 40
    mask = np.triu(rng.rand(n, n) < 0.2, 1)
    s, d = np.nonzero(mask)
    assert _count_via_query(ray_session, s, d, n) == _count_dense(s, d, n)
