"""MatrixMarket / SNAP readers — incl. replaying the reference's
10-vertex PageRank golden from an .mtx fixture file end-to-end
(≙ tests/smoke/simple_pagerank.cpp:56-91: MatrixFileReader →
buildMatrixUnique → simple_pagerank → golden check)."""

import numpy as np
import pytest

from alp_ray.sources.matrixmarket import (
    read_matrix_market,
    read_snap_edges,
)

from .test_pagerank import GOLDEN, RING_DST, RING_SRC


def _write_ring_mtx(path) -> str:
    lines = [
        "%%MatrixMarket matrix coordinate pattern general",
        "% the reference smoke graph: 10-ring + chord 7->9",
        "10 10 11",
    ]
    for s, d in zip(RING_SRC, RING_DST):
        lines.append(f"{s + 1} {d + 1}")
    p = str(path / "ring.mtx")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    return p


def test_mtx_pattern_roundtrip_and_golden(tmp_path):
    from alp_ray.pipelines.pagerank import pagerank
    from alp_ray.state.engine import GraphEngine

    p = _write_ring_mtx(tmp_path)
    ds, info = read_matrix_market(p)
    assert (info.nrows, info.ncols, info.nnz_stored) == (10, 10, 11)
    assert info.pattern and not info.symmetric
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    want = sorted(zip(RING_SRC.tolist(), RING_DST.tolist()))
    assert list(map(tuple, df[["src", "dst"]].to_numpy())) == want
    # End-to-end: file → Dataset → engine → PageRank → printed golden.
    engine = GraphEngine.from_dataset(ds, n=info.nrows, P=3)
    res = pagerank(engine, alpha=0.85, conv=1e-7)
    pr = engine.get_state_by_vertex("pr")
    engine.shutdown()
    assert res.converged
    np.testing.assert_allclose(pr, GOLDEN, rtol=5e-6)


def test_mtx_symmetric_real(tmp_path):
    p = str(tmp_path / "sym.mtx")
    with open(p, "w") as f:
        f.write(
            "%%MatrixMarket matrix coordinate real symmetric\n"
            "3 3 4\n"
            "1 1 5.0\n"
            "2 1 1.5\n"
            "3 1 2.5\n"
            "3 2 4.0\n"
        )
    ds, info = read_matrix_market(p)
    assert info.symmetric and not info.pattern
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    got = set(map(tuple, df[["src", "dst", "weight"]].to_numpy()))
    want = {
        (0, 0, 5.0),
        (1, 0, 1.5), (0, 1, 1.5),
        (2, 0, 2.5), (0, 2, 2.5),
        (2, 1, 4.0), (1, 2, 4.0),
    }
    assert got == want


def test_snap_edges_and_chunk_boundaries(tmp_path):
    # 5,000 edges across many tiny chunks: the byte-range ownership
    # rule must parse every line exactly once.
    rng = np.random.RandomState(3)
    src = rng.randint(0, 500, 5000)
    dst = rng.randint(0, 500, 5000)
    p = str(tmp_path / "edges.txt")
    with open(p, "w") as f:
        f.write("# Directed graph\n# src\tdst\n")
        for s, d in zip(src, dst):
            f.write(f"{s}\t{d}\n")
    ds = read_snap_edges(p, target_chunk=1024)  # force ~50 chunks
    df = ds.to_pandas()
    assert len(df) == 5000
    got = sorted(zip(df["src"], df["dst"]))
    want = sorted(zip(src.tolist(), dst.tolist()))
    assert got == want


def test_mtx_chunked_parse_exact(tmp_path):
    rng = np.random.RandomState(5)
    n, m = 300, 4000
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    w = np.round(rng.rand(m), 6)
    p = str(tmp_path / "big.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{n} {n} {m}\n")
        for s, d, v in zip(src, dst, w):
            f.write(f"{s + 1} {d + 1} {v}\n")
    ds, info = read_matrix_market(p, target_chunk=2048)
    df = ds.to_pandas()
    assert len(df) == m
    got = sorted(zip(df["src"], df["dst"], df["weight"]))
    want = sorted(zip(src.tolist(), dst.tolist(), w.tolist()))
    for g, x in zip(got, want):
        assert g[0] == x[0] and g[1] == x[1]
        assert g[2] == pytest.approx(x[2])


def test_knn_neighbourhood_contract_via_mtx(tmp_path):
    """Replay the reference knn smoke contract ("Neighbourhood size is
    421 (out of n)" for a 4-hop from source n/2, smoketests.sh:129 /
    tests/smoke/knn.cpp:89-90,274) end-to-end: deterministic symmetric
    community graph → .mtx file → parallel reader → engine → khop —
    size checked against an independent NumPy BFS oracle."""
    from alp_ray.pipelines.traversal import khop
    from alp_ray.state.engine import GraphEngine

    # Ring of 20 cliques (8 vertices each) bridged by single edges:
    # local 4-hop neighbourhoods stay well below n, like facebook's.
    n_cliq, sz = 20, 8
    n = n_cliq * sz
    edges = set()
    for c in range(n_cliq):
        base = c * sz
        for i in range(sz):
            for j in range(i + 1, sz):
                edges.add((base + i, base + j))
        # bridge: last vertex of clique c -> first of clique c+1
        nxt = ((c + 1) % n_cliq) * sz
        edges.add((base + sz - 1, nxt))
    edges = sorted(edges)
    p = str(tmp_path / "cliques.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write(f"{n} {n} {len(edges)}\n")
        for s, d in edges:
            # symmetric MM stores the lower triangle: row >= col
            f.write(f"{max(s, d) + 1} {min(s, d) + 1}\n")

    ds, info = read_matrix_market(p)
    assert info.symmetric and info.pattern
    df = ds.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    # reader mirrors symmetric entries: both directions present
    assert len(df) == 2 * len(edges)

    engine = GraphEngine.from_arrays(src, dst, None, n=n, P=4)
    source, k = n // 2, 4
    mask, size = khop(engine, source=source, k=k)
    engine.shutdown()

    # independent BFS oracle
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    seen = {source}
    frontier = {source}
    for _ in range(k):
        frontier = {
            v for u in frontier for v in adj.get(u, [])
        } - seen
        seen |= frontier
    assert size == len(seen)
    assert set(np.flatnonzero(mask).tolist()) == seen
    # the contract shape: a k-hop ball strictly between the clique and
    # the whole graph ("Neighbourhood size is N (out of n)")
    assert sz < size < n
