"""The north-star pipeline: code corpus → import-edge graph → analytics.

End-to-end: ``(repo,path,commit,lang,content)`` parquet/Dataset →
per-language import extraction (map_batches actor pool) → stable hash
vertex ids → dedup (buildMatrixUnique contract) → dense-id remap →
GraphShard engine → {PageRank, CC, label-prop, triangles} → vertex
results joined back to (repo, path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.pipelines.components import connected_components
from alp_ray.pipelines.pagerank import PageRankResult, pagerank
from alp_ray.sources.corpus import synth_corpus
from alp_ray.stages.extract import ImportExtractor, add_vertex_ids, _stable_id
from alp_ray.stages.graph import dedup_edges, symmetrize
from alp_ray.state.engine import GraphEngine
from alp_ray.util import join_partitions


def _auto_concurrency() -> tuple[int, int]:
    """Size actor pools to the cluster (a fixed cap would pin the fused
    synth→extract stage to a fraction of the cores)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # Floor at half the cores: Ray Data's autoscaler ramps the pool too
    # slowly for short jobs if min=1.
    return (max(2, cpus // 2), max(4, cpus))


def corpus_to_edges(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """corpus → distinct (repo, src_path, dst_path, src, dst) edge table."""
    extracted = corpus.map_batches(
        ImportExtractor, batch_format="pyarrow",
        concurrency=_auto_concurrency(),
    )
    with_ids = extracted.map_batches(add_vertex_ids, batch_format="pyarrow")
    # Dedup on (src, dst) while keeping the name columns: group on the
    # full key (names are functions of the hash ids, so this is the same
    # distinct set — buildMatrixUnique's no-duplicates contract).
    from ray.data.aggregate import Count

    return (
        with_ids.groupby(["repo", "src_path", "dst_path", "src", "dst"])
        .aggregate(Count(alias_name="cnt"))
        .drop_columns(["cnt"])
    )


def corpus_to_edge_ids(
    corpus: "ray.data.Dataset", dedup: bool = True
) -> "ray.data.Dataset":
    """corpus → distinct (src, dst) int64 edge table — the cheap path for
    graph builds (int-keyed dedup shuffle; the string name columns are
    only materialized by ``corpus_to_edges`` when a caller needs them).

    ``dedup=False`` skips the distinct shuffle for consumers that dedup
    at ingestion (GraphEngine.from_dataset(dedupe=True))."""
    extracted = corpus.map_batches(
        ImportExtractor, batch_format="pyarrow",
        concurrency=_auto_concurrency(),
    )
    with_ids = extracted.map_batches(
        add_vertex_ids, batch_format="pyarrow"
    )
    ids = with_ids.select_columns(["src", "dst"])
    return dedup_edges(ids) if dedup else ids


def densify(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash ids → dense 0..n-1 (driver-side; the engine-internal remap).
    Returns (src_dense, dst_dense, id_of_dense)."""
    uniq = np.unique(np.concatenate([src, dst]))
    return (
        np.searchsorted(uniq, src),
        np.searchsorted(uniq, dst),
        uniq,
    )


def dense_id_mapping_ds(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Dataset-native dense-id assignment — the 10^12-vertex path where a
    driver-side np.unique cannot hold the vertex set.

    per-block unique → ONE range-partitioning sort → per-block local
    unique with block-boundary dedup (a duplicate vertex can only span
    ADJACENT blocks after the sort, so the driver reconciles with
    O(#blocks) first/last scalars) → contiguous ids per block. Returns
    a ``(vertex, dense_id)`` mapping Dataset. The sort is the ONLY
    shuffle — the round-2 groupby-distinct before it was pure fixed
    overhead (~3 s at any size on Ray 2.49) since the sort already
    co-locates equal keys.
    """
    import pyarrow as pa

    def explode(batch: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                np.asarray(batch.column("src"), np.int64),
                np.asarray(batch.column("dst"), np.int64),
            ]
        )
        return pa.table({"vertex": np.unique(v)})

    distinct = (
        edges.map_batches(explode, batch_format="pyarrow")
        .sort("vertex")
        .materialize()
    )
    refs = distinct.to_arrow_refs()

    @ray.remote
    def _info(tbl: pa.Table):
        # Empty range-sort partitions surface as COLUMN-LESS blocks
        # (they never pass through a UDF) — treat them as empty.
        if "vertex" not in tbl.column_names or tbl.num_rows == 0:
            return 0, None, None
        v = np.asarray(tbl.column("vertex"), np.int64)
        u = np.unique(v)
        if u.size == 0:
            return 0, None, None
        return int(u.size), int(u[0]), int(u[-1])

    infos = ray.get([_info.remote(r) for r in refs])
    counts, drop_first = [], []
    prev_last = None
    for cnt, first, last in infos:
        drop = cnt > 0 and prev_last is not None and first == prev_last
        counts.append(cnt - (1 if drop else 0))
        drop_first.append(drop)
        if cnt:
            prev_last = last
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    @ray.remote
    def _tag(tbl: pa.Table, offset: int, drop: bool) -> pa.Table:
        if "vertex" not in tbl.column_names or tbl.num_rows == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "dense_id": pa.array([], pa.int64()),
                }
            )
        u = np.unique(np.asarray(tbl.column("vertex"), np.int64))
        if drop:
            u = u[1:]
        return pa.table(
            {
                "vertex": pa.array(u),
                "dense_id": pa.array(
                    np.arange(offset, offset + u.size, dtype=np.int64)
                ),
            }
        )

    out_refs = [
        _tag.remote(r, int(offsets[i]), drop_first[i])
        for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out_refs)


def remap_edges_dense(
    edges: "ray.data.Dataset",
    mapping: "ray.data.Dataset",
    broadcast_threshold: int = 5_000_000,
) -> "ray.data.Dataset":
    """Rewrite (src, dst) hash ids to dense ids.

    Two physical forms, picked by mapping size — the small-side-
    broadcast-vs-shuffle-join choice:
    - mapping ≤ ``broadcast_threshold`` vertices: ``ray.put`` the sorted
      (vertex → dense) arrays ONCE and remap each edge block with a
      vectorized searchsorted inside map_batches — no shuffle at all.
    - larger: two hash joins against the mapping (all-Dataset; no
      driver or broadcast copy of the vertex set)."""
    mapping = mapping.materialize()
    n_vertices = mapping.count()
    if n_vertices <= broadcast_threshold:
        tbl = pa.concat_tables(
            ray.get(mapping.to_arrow_refs())
        ).combine_chunks()
        verts = np.asarray(tbl.column("vertex"), np.int64)
        dense = np.asarray(tbl.column("dense_id"), np.int64)
        order = np.argsort(verts)
        mref = ray.put((verts[order], dense[order]))

        def remap(batch: pa.Table) -> pa.Table:
            v_sorted, d_of = ray.get(mref)
            s = np.asarray(batch.column("src"), np.int64)
            d = np.asarray(batch.column("dst"), np.int64)
            ps = np.clip(
                np.searchsorted(v_sorted, s), 0, v_sorted.size - 1
            )
            pd = np.clip(
                np.searchsorted(v_sorted, d), 0, v_sorted.size - 1
            )
            # Every endpoint must be in the mapping (it was built from
            # these edges); a miss would silently mis-map.
            assert (v_sorted[ps] == s).all() and (v_sorted[pd] == d).all()
            return pa.table({"src": d_of[ps], "dst": d_of[pd]})

        return edges.map_batches(remap, batch_format="pyarrow")
    # Shuffle-join path. Size the join partition count to the data:
    # Ray 2.49's hash join breaks on EMPTY partitions, so tiny inputs
    # must not be over-partitioned; materialize between the chained
    # joins (two lazy hash-joins in one plan trip the operator).
    parts = int(np.clip(n_vertices // 10_000, 2, 64))
    m_src = mapping.rename_columns(["src", "src_dense"])
    m_dst = mapping.rename_columns(["dst", "dst_dense"])
    first = edges.join(
        m_src, join_type="inner", num_partitions=parts, on=("src",)
    ).materialize()
    out = first.join(
        m_dst, join_type="inner", num_partitions=parts, on=("dst",)
    )
    return out.select_columns(["src_dense", "dst_dense"]).rename_columns(
        ["src", "dst"]
    )


def build_engine_from_corpus(
    corpus: "ray.data.Dataset",
    P: int = 8,
    symmetric: bool = False,
    num_cpus_per_shard: float = 0,
) -> tuple[GraphEngine, "ray.data.Dataset"]:
    """Returns (engine over dense ids, (vertex, dense_id) mapping
    Dataset). Fully Dataset-native: hash-id edges → sorted-distinct
    dense-id mapping (``dense_id_mapping_ds``) → two-join remap
    (``remap_edges_dense``) → streaming shard ingest
    (``GraphEngine.from_dataset``: blocks flow worker → object store →
    shard actor). The driver holds handles and counters only — no edge
    or vertex table ever materializes on it, so the same code path runs
    at 10^12-file scale."""
    edges = corpus_to_edge_ids(corpus, dedup=False)
    if symmetric:
        edges = symmetrize(edges, dedup=False)
    edges = edges.materialize()
    mapping = dense_id_mapping_ds(edges).materialize()
    n = mapping.count()
    dense = remap_edges_dense(edges, mapping)
    # Dedup happens AT ingestion (shard-local distinct == global
    # distinct under src-partitioning) — no standalone distinct shuffle
    # anywhere in the build.
    engine = GraphEngine.from_dataset(
        dense, n=n, P=P, num_cpus_per_shard=num_cpus_per_shard,
        dedupe=True,
    )
    return engine, mapping


def _state_with_hash_ids(
    engine: GraphEngine,
    mapping: "ray.data.Dataset",
    state_name: str,
) -> "ray.data.Dataset":
    """engine state (dense vertex ids) ⋈ mapping → (vertex hash id,
    value) — the Dataset-native inverse of the dense remap."""
    state = engine.state_dataset([state_name]).rename_columns(
        ["dense_id", state_name]
    )
    joined = state.join(
        mapping,
        join_type="inner",
        num_partitions=join_partitions(engine.n),
        on=("dense_id",),
    )
    return joined.select_columns(["vertex", state_name])


def corpus_pagerank(
    corpus: "ray.data.Dataset",
    alpha: float = 0.85,
    conv: float = 1e-6,
    P: int = 8,
) -> tuple[pa.Table, PageRankResult]:
    """PageRank over the import graph; returns (vertex_hash_id, pr) table
    + run stats. Note: per the BASELINE metric, conv defaults to 1e-6."""
    engine, mapping = build_engine_from_corpus(corpus, P=P)
    res = pagerank(engine, alpha=alpha, conv=conv)
    out = _state_with_hash_ids(engine, mapping, "pr")
    # Small-result escape hatch (≙ PinnedVector): rankings are O(n) and
    # the caller asked for a table.
    from alp_ray.util import concat_blocks

    tbl = concat_blocks(
        out, columns={"vertex": pa.int64(), "pr": pa.float64()}
    )
    engine.shutdown()
    return tbl.select(["vertex", "pr"]), res


def corpus_components(
    corpus: "ray.data.Dataset", P: int = 8
) -> pa.Table:
    engine, mapping = build_engine_from_corpus(corpus, P=P, symmetric=True)
    connected_components(engine)

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dense_id": batch.column("vertex").cast(pa.int64()),
                "label_dense": batch.column("label").cast(pa.int64()),
            }
        )

    labels = engine.state_dataset(["label"]).map_batches(
        to_int, batch_format="pyarrow"
    )
    # Two joins: dense vertex → hash id, dense component label → hash id
    # of the representative (materialize between — chained lazy joins
    # trip Ray 2.49's hash-join operator).
    parts = join_partitions(engine.n)
    j1 = labels.join(
        mapping, join_type="inner", num_partitions=parts, on=("dense_id",)
    ).materialize()
    m2 = mapping.rename_columns(["component", "label_dense"])
    j2 = j1.select_columns(["vertex", "label_dense"]).join(
        m2, join_type="inner", num_partitions=parts, on=("label_dense",)
    )
    from alp_ray.util import concat_blocks

    tbl = concat_blocks(
        j2.select_columns(["vertex", "component"]),
        columns={"vertex": pa.int64(), "component": pa.int64()},
    )
    engine.shutdown()
    return tbl.select(["vertex", "component"])


def flagship(sf_scale: float = 0.001) -> "ray.data.Dataset":
    """The ``entry()`` pipeline: synthesize a corpus sized off the sf
    (deterministic), verify the sha256 invariant en route, extract the
    import graph, PageRank it, and return (repo, path, pr) — scores
    joined back by stable hash id (a Dataset join, not a driver map)."""
    n_repos = max(2, int(20 * (sf_scale / 0.001)))
    corpus = synth_corpus(n_repos=n_repos, files_per_repo=60, seed=42)
    pr_table, _ = corpus_pagerank(corpus, P=4)
    pr_ds = ray.data.from_arrow(pr_table)

    def with_id(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        ids = np.fromiter(
            (_stable_id(r, p) for r, p in zip(repos, paths)),
            dtype=np.int64,
            count=len(repos),
        )
        return pa.table(
            {
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "vertex": pa.array(ids),
            }
        )

    files = corpus.map_batches(with_id, batch_format="pyarrow")
    joined = files.join(
        pr_ds,
        join_type="left_outer",
        num_partitions=join_partitions(pr_table.num_rows),
        on=("vertex",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pr = pc.fill_null(
            batch.column("pr").cast(pa.float64()), 0.0
        )
        return pa.table(
            {
                "repo": batch.column("repo"),
                "path": batch.column("path"),
                "pr": pr,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
