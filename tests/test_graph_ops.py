"""Dataset-path graph ops (stages/graph.py) vs NumPy oracles — the
eWise inner/outer-join and spmv semantics SURVEY §7 flags as easy to
get silently wrong."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.functions.semiring import MIN_PLUS, PLUS_FIRST, PLUS_TIMES
from alp_ray.pipelines.spy import spy
from alp_ray.stages.graph import (
    canonicalize,
    dedup_edges,
    degrees,
    ewise_union,
    fold,
    spmv,
    symmetrize,
)


def _edges_ds(src, dst, w=None):
    cols = {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return ray.data.from_arrow(pa.table(cols))


def test_dedup_and_symmetrize_and_canonicalize():
    src = [0, 0, 1, 2, 2, 3]
    dst = [1, 1, 0, 3, 3, 3]  # dup (0,1), dup (2,3), self-loop (3,3)
    ds = _edges_ds(src, dst)
    dd = dedup_edges(ds).to_pandas()
    assert len(dd) == 4  # (0,1),(1,0),(2,3),(3,3)
    sym = symmetrize(ds).to_pandas()
    got = set(map(tuple, sym[["src", "dst"]].to_numpy()))
    assert got == {(0, 1), (1, 0), (2, 3), (3, 2)}
    canon = canonicalize(ds).to_pandas()
    got = set(map(tuple, canon[["src", "dst"]].to_numpy()))
    assert got == {(0, 1), (2, 3)}


def test_degrees():
    ds = _edges_ds([0, 0, 1, 2], [1, 2, 2, 0])
    out = degrees(ds, key="src", name="deg").to_pandas()
    m = dict(zip(out["src"], out["deg"]))
    assert m == {0: 2, 1: 1, 2: 1}


def test_spmv_dataset_x_input():
    """x passed as a vertex-state Dataset (not a tuple)."""
    src = np.array([0, 1, 2, 0], np.int64)
    dst = np.array([1, 2, 0, 2], np.int64)
    w = np.array([2.0, 3.0, 4.0, 5.0])
    edges = _edges_ds(src, dst, w)
    x_ds = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [1.0, 10.0, 100.0]})
    )
    y = spmv(edges, x_ds, PLUS_TIMES).to_pandas()
    got = dict(zip(y["vertex"], y["val"]))
    # y[1] = x[0]*2; y[2] = x[1]*3 + x[0]*5; y[0] = x[2]*4
    assert got == {0: 400.0, 1: 2.0, 2: 35.0}


def test_spmv_sparse_x_skips_missing():
    src = np.array([0, 1], np.int64)
    dst = np.array([2, 2], np.int64)
    edges = _edges_ds(src, dst)
    # x only defined at vertex 0 (GraphBLAS sparse-vector semantics:
    # absent ≠ 0 — vertex 1 contributes nothing, not identity).
    y = spmv(edges, (np.array([7.0]), np.array([0], np.int64)),
             PLUS_FIRST, weight_col=None).to_pandas()
    assert dict(zip(y["vertex"], y["val"])) == {2: 7.0}


def test_spmv_min_plus_weighted():
    src = np.array([0, 1, 0], np.int64)
    dst = np.array([2, 2, 2], np.int64)
    w = np.array([5.0, 1.0, 2.0])
    edges = _edges_ds(src, dst, w)
    x = (np.array([10.0, 100.0]), np.array([0, 1], np.int64))
    y = spmv(edges, x, MIN_PLUS).to_pandas()
    assert dict(zip(y["vertex"], y["val"])) == {2: 12.0}


def test_ewise_union_and_fold():
    x = ray.data.from_arrow(
        pa.table({"vertex": [0, 1], "val": [1.0, 2.0]})
    )
    y = ray.data.from_arrow(
        pa.table({"vertex": [1, 2], "val": [10.0, 20.0]})
    )
    z = ewise_union(x, y, "sum").to_pandas()
    assert dict(zip(z["vertex"], z["val"])) == {0: 1.0, 1: 12.0, 2: 20.0}
    assert fold(x, "sum") == 3.0
    assert fold(y, "max") == 20.0


def test_spy_counts():
    # 100-vertex grid; bucket into 4x4.
    rng = np.random.RandomState(5)
    src = rng.randint(0, 100, 500).astype(np.int64)
    dst = rng.randint(0, 100, 500).astype(np.int64)
    out = spy(_edges_ds(src, dst), 100, 100, 4, 4).to_pandas()
    bi = (src / 25.0).astype(np.int64)
    bj = (dst / 25.0).astype(np.int64)
    want = {}
    for a, b in zip(bi, bj):
        want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (row["bucket_i"], row["bucket_j"]): row["count"]
        for _, row in out.iterrows()
    }
    assert got == want
    assert out["count"].sum() == 500


def test_spmv_output_mask_and_invert():
    src = np.array([0, 0, 1], np.int64)
    dst = np.array([1, 2, 2], np.int64)
    edges = _edges_ds(src, dst)
    x = (np.array([1.0, 10.0]), np.array([0, 1], np.int64))
    # Structural output mask {1}: only vertex 1 produced.
    y = spmv(edges, x, PLUS_FIRST, weight_col=None,
             mask=np.array([1])).to_pandas()
    assert dict(zip(y["vertex"], y["val"])) == {1: 1.0}
    # Inverted mask (≙ descriptors::invert_mask): complement of {1}.
    y = spmv(edges, x, PLUS_FIRST, weight_col=None,
             mask=np.array([1]), invert_mask=True).to_pandas()
    assert dict(zip(y["vertex"], y["val"])) == {2: 11.0}


def test_zip_unzip_roundtrip():
    from alp_ray.stages.graph import unzip_vectors, zip_vectors

    x = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [1.0, 2.0, 3.0]})
    )
    y = ray.data.from_arrow(
        pa.table({"vertex": [1, 2, 3], "val": [20.0, 30.0, 40.0]})
    )
    z = zip_vectors(x, y)
    back = unzip_vectors(z).to_pandas().sort_values("vertex")
    assert list(back["vertex"]) == [1, 2]
    assert list(back["first"]) == [2.0, 3.0]
    assert list(back["second"]) == [20.0, 30.0]


def test_dense_id_mapping_dataset_native():
    from alp_ray.pipelines.code_graph import (
        dense_id_mapping_ds,
        densify,
        remap_edges_dense,
    )

    rng = np.random.RandomState(12)
    src = rng.choice(np.array([5, -3, 900, 17, 42], np.int64), 60)
    dst = rng.choice(np.array([5, -3, 900, 17, 1000], np.int64), 60)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ds = _edges_ds(src, dst)
    mapping = dense_id_mapping_ds(ds).to_pandas().sort_values("vertex")
    # dense ids are 0..n-1 in sorted-vertex order == driver densify.
    _, _, uniq = densify(src, dst)
    np.testing.assert_array_equal(mapping["vertex"].to_numpy(), uniq)
    np.testing.assert_array_equal(
        mapping["dense_id"].to_numpy(), np.arange(len(uniq))
    )
    s_d, d_d, _ = densify(src, dst)
    want = sorted(zip(s_d.tolist(), d_d.tolist()))
    # Both physical forms: broadcast-searchsorted (small mapping) and
    # the shuffle-join path (forced with threshold=0).
    for thresh in (5_000_000, 0):
        remapped = remap_edges_dense(
            ds, dense_id_mapping_ds(ds), broadcast_threshold=thresh
        ).to_pandas()
        got = sorted(map(tuple, remapped[["src", "dst"]].to_numpy()))
        assert got == want, f"threshold={thresh}"



def test_ewise_inner_op_variant():
    from alp_ray.stages.graph import ewise_inner

    x = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [4.0, 9.0, 16.0]})
    )
    y = ray.data.from_arrow(
        pa.table({"vertex": [1, 2, 3], "val": [3.0, 4.0, 5.0]})
    )
    # op variant: intersection only (vertex 0 and 3 absent from output).
    z = ewise_inner(x, y, np.subtract).to_pandas()
    assert dict(zip(z["vertex"], z["val"])) == {1: 6.0, 2: 12.0}


def test_spmv_hot_source_skew():
    """Edge-balanced Dataset spmv handles a pathological hot source
    (one vertex owning 80% of edges) — the skew mitigation documented
    in the engine (gather-vs-scatter kernel choice)."""
    rng = np.random.RandomState(77)
    n = 200
    hot_dst = rng.randint(0, n, 800).astype(np.int64)
    hot_src = np.zeros(800, np.int64)  # vertex 0 = hot source
    rest_src = rng.randint(1, n, 200).astype(np.int64)
    rest_dst = rng.randint(0, n, 200).astype(np.int64)
    src = np.concatenate([hot_src, rest_src])
    dst = np.concatenate([hot_dst, rest_dst])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    x = rng.rand(n)
    y = spmv(
        _edges_ds(src, dst), (x, np.arange(n, dtype=np.int64)),
        PLUS_FIRST, weight_col=None,
    ).to_pandas()
    expect = np.zeros(n)
    for s_, d_ in zip(src, dst):
        expect[d_] += x[s_]
    got = np.zeros(n)
    got[y["vertex"].to_numpy()] = y["val"].to_numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_blas0_scalar_ops():
    from alp_ray.functions.scalar import apply, fold_all, foldl, foldr
    from alp_ray.functions.semiring import MONOID_MAX, MONOID_PLUS

    assert apply(np.add, 2, 3) == 5
    assert foldl(np.multiply, 4, 5) == 20
    assert foldr(np.subtract, 4, 10) == -6  # op(x, inout)
    assert fold_all(MONOID_PLUS, [1, 2, 3]) == 6.0
    assert fold_all(MONOID_MAX, []) == MONOID_MAX.identity


def test_spmv_empty_x_and_empty_mask():
    """Regression (ADVICE r1): an empty broadcast vector or an empty
    non-inverted mask must yield an empty result, not an IndexError
    from the clipped searchsorted gather."""
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 0], np.int64)
    edges = _edges_ds(src, dst)
    y = spmv(
        edges,
        (np.array([], np.float64), np.array([], np.int64)),
        PLUS_FIRST,
        weight_col=None,
    ).to_pandas()
    assert len(y) == 0
    y2 = spmv(
        edges,
        (np.ones(3), np.arange(3, dtype=np.int64)),
        PLUS_FIRST,
        weight_col=None,
        mask=np.array([], np.int64),
    ).to_pandas()
    assert len(y2) == 0


def test_ewise_mul_add_and_binary_ops():
    """Fused z += x.*y (eWiseMulAdd) and the full ops.hpp operator
    table."""
    from alp_ray.functions.semiring import BINARY_OPS
    from alp_ray.stages.graph import ewise_mul_add

    x = ray.data.from_arrow(
        pa.table({"vertex": [0, 1, 2], "val": [2.0, 3.0, 4.0]})
    )
    y = ray.data.from_arrow(
        pa.table({"vertex": [1, 2, 3], "val": [10.0, 20.0, 30.0]})
    )
    z = ray.data.from_arrow(
        pa.table({"vertex": [2, 3], "val": [100.0, 200.0]})
    )
    out = ewise_mul_add(x, y, z).to_pandas()
    got = dict(zip(out["vertex"], out["val"]))
    # x∩y = {1: 30, 2: 80}; ⊕ z = {1: 30, 2: 180, 3: 200}
    assert got == {1: 30.0, 2: 180.0, 3: 200.0}

    assert len(BINARY_OPS) == 27  # the complete ops.hpp surface
    a = np.array([1.0, 5.0, 0.0])
    b = np.array([4.0, 2.0, 7.0])
    assert list(BINARY_OPS["left_assign"](a, b)) == [1.0, 5.0, 0.0]
    assert list(BINARY_OPS["abs_diff"](a, b)) == [3.0, 3.0, 7.0]
    assert list(BINARY_OPS["any_or"](a, b)) == [1.0, 5.0, 7.0]
    assert list(BINARY_OPS["divide_reverse"](a, b)) == [4.0, 0.4, np.inf]
    assert list(BINARY_OPS["argmin"](a, b)) == [1.0, 2.0, 0.0]
    assert BINARY_OPS["zip"](a, b).shape == (3, 2)
