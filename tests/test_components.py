"""CC + label-prop + triangles goldens (FIXTURES.md F3/F4)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.pipelines.components import connected_components
from alp_ray.pipelines.labelprop import label_propagation
from alp_ray.pipelines.triangles import triangle_count
from alp_ray.state.engine import GraphEngine

from . import oracle


def _sym(src, dst):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    key = s * 100000 + d
    _, idx = np.unique(key, return_index=True)
    return s[idx], d[idx]


def test_cc_cliques_path_isolated():
    # K4 (0-3) ∪ K3 (4-6) ∪ isolated (7) ∪ P5 (8-12): 4 components.
    edges = []
    for i in range(4):
        for j in range(i + 1, 4):
            edges.append((i, j))
    for i in range(4, 7):
        for j in range(i + 1, 7):
            edges.append((i, j))
    for i in range(8, 12):
        edges.append((i, i + 1))
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    s, d = _sym(src, dst)
    n = 13
    engine = GraphEngine.from_arrays(s, d, n=n, P=3)
    connected_components(engine)
    labels = engine.get_state_by_vertex("label").astype(np.int64)
    engine.shutdown()
    expect = oracle.connected_components_maxlabel(s, d, n)
    np.testing.assert_array_equal(labels, expect)
    assert len(set(labels.tolist())) == 4
    assert labels[7] == 7  # isolated keeps own id


def test_cc_random_vs_oracle():
    rng = np.random.RandomState(3)
    n, m = 300, 500
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    s, d = _sym(src[keep], dst[keep])
    engine = GraphEngine.from_arrays(s, d, n=n, P=4)
    connected_components(engine)
    labels = engine.get_state_by_vertex("label").astype(np.int64)
    engine.shutdown()
    np.testing.assert_array_equal(
        labels, oracle.connected_components_maxlabel(s, d, n)
    )


def _tri_ds(src, dst):
    return ray.data.from_arrow(
        pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)})
    )


def test_triangles_known_graphs():
    # K4: 4 triangles.
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert triangle_count(_tri_ds([e[0] for e in k4], [e[1] for e in k4])) == 4
    # C6 ring: 0 triangles.
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    assert triangle_count(_tri_ds([e[0] for e in c6], [e[1] for e in c6])) == 0
    # K5: 10 triangles.
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert (
        triangle_count(_tri_ds([e[0] for e in k5], [e[1] for e in k5])) == 10
    )


def test_triangles_random_vs_oracle():
    rng = np.random.RandomState(9)
    n = 64
    mask = rng.rand(n, n) < 0.2
    src, dst = np.nonzero(np.triu(mask, 1))
    got = triangle_count(_tri_ds(src, dst))
    want = oracle.triangle_count(src, dst, n)
    assert got == want
    assert want > 0


def test_labelprop_two_clusters():
    # Two dumbbell clusters bridged weakly; seeds 0 (label 0), 5 (label 1).
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    w = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.1]
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    n = 6
    seed_mask = np.zeros(n, bool)
    seed_mask[[0, 5]] = True
    seed_labels = np.zeros(n)
    seed_labels[5] = 1.0

    engine = GraphEngine.from_arrays(s, d, ww, n=n, P=2)
    res = label_propagation(engine, seed_labels, seed_mask)
    f = engine.get_state_by_vertex("f")
    engine.shutdown()
    expect = oracle.label_prop(s, d, ww, n, seed_labels, seed_mask)
    assert res.converged
    np.testing.assert_array_equal(f, expect)


def test_labelprop_random_vs_oracle():
    rng = np.random.RandomState(17)
    n = 40
    mask = np.triu(rng.rand(n, n) < 0.15, 1)
    src, dst = np.nonzero(mask)
    w = rng.rand(src.size) + 0.5
    s = np.concatenate([src, dst]).astype(np.int64)
    d = np.concatenate([dst, src]).astype(np.int64)
    ww = np.concatenate([w, w])
    seed_mask = np.zeros(n, bool)
    seed_mask[:4] = True
    seed_labels = np.array([0.0, 1.0, 1.0, 0.0] + [0.0] * (n - 4))

    engine = GraphEngine.from_arrays(s, d, ww, n=n, P=3)
    label_propagation(engine, seed_labels, seed_mask)
    f = engine.get_state_by_vertex("f")
    engine.shutdown()
    expect = oracle.label_prop(s, d, ww, n, seed_labels, seed_mask)
    np.testing.assert_array_equal(f, expect)


def test_community_lpa_two_cliques():
    from alp_ray.pipelines.labelprop import community_lpa

    # Two K5 cliques joined by one weak edge: LPA should find 2
    # communities (each clique converges to its min... most frequent →
    # every member sees the same multiset; deterministic tie-break).
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))  # weak bridge
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    s, d = _sym(src, dst)
    labels = community_lpa(_tri_ds(s, d), n=10)
    # Each clique ends with one label; bridge must not merge them.
    c0 = set(labels[:5].tolist())
    c1 = set(labels[5:].tolist())
    assert len(c0) == 1 and len(c1) == 1
    assert c0 != c1


def test_minhash_dedup_keep_filters_losers():
    import pyarrow as pa

    import ray.data

    from alp_ray.pipelines.dedup import minhash_dedup_keep

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta " * 4,
        "one two three four five six seven eight nine ten " * 4,
    ]
    texts.append(texts[0])  # exact dup of doc 0 → id 2 must be dropped
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": np.arange(3, dtype=np.int64), "text": texts}
        )
    )
    kept = minhash_dedup_keep(ds, threshold=0.9).to_pandas()
    assert set(kept["doc_id"]) == {0, 1}


def test_triangles_shuffle_path_matches_broadcast():
    from alp_ray.pipelines.triangles import triangle_count

    rng = np.random.RandomState(10)
    n = 80
    mask = rng.rand(n, n) < 0.15
    src, dst = np.nonzero(np.triu(mask, 1))
    ds = _tri_ds(src, dst)
    got_b = triangle_count(ds, method="broadcast")
    got_s = triangle_count(ds, method="shuffle")
    want = oracle.triangle_count(src, dst, n)
    assert got_b == got_s == want


def test_triangles_shuffle_degree_join_route():
    """Force the degree table onto the hash-JOIN attachment (the
    10^12-vertex route) with a zero broadcast limit: identical count."""
    from alp_ray.pipelines.triangles import triangle_count

    rng = np.random.RandomState(12)
    n = 60
    mask = rng.rand(n, n) < 0.2
    src, dst = np.nonzero(np.triu(mask, 1))
    ds = _tri_ds(src, dst)
    got = triangle_count(ds, method="shuffle", degree_broadcast_limit=0)
    assert got == oracle.triangle_count(src, dst, n)


def test_modularity_two_cliques():
    """Two K4s joined by one bridge edge, labelled by clique:
    m=13, within = 12, d_A = d_B = 13 → Q = 2*(6/13 - (13/26)^2)."""
    import numpy as np
    import ray.data

    from alp_ray.pipelines.community import modularity_contributions

    a = [(i, j) for i in range(4) for j in range(4) if i != j]
    b = [(i + 4, j + 4) for i, j in a]
    bridge = [(0, 4), (4, 0)]
    src, dst = zip(*(a + b + bridge))
    edges = ray.data.from_arrow(
        __import__("pyarrow").table({
            "src": list(map(int, src)), "dst": list(map(int, dst)),
        })
    )
    labels = np.array([3] * 4 + [7] * 4, np.int64)
    out = modularity_contributions(
        edges, labels, np.arange(8)
    ).to_pandas().sort_values("community").reset_index(drop=True)
    assert out["community"].tolist() == [3, 7]
    assert out["n_vertices"].tolist() == [4, 4]
    assert out["m2_within"].tolist() == [12, 12]
    assert out["deg_sum"].tolist() == [13, 13]
    exp = 12 / 26.0 - (13 / 26.0) * (13 / 26.0)
    assert np.allclose(out["q_contrib"].to_numpy(), [exp, exp],
                       rtol=0, atol=0)
    q = out["q_contrib"].sum()
    assert abs(q - 2 * exp) < 1e-15
