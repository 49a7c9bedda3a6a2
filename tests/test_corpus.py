"""Corpus synthesis + extraction: the north-rule input slice (SURVEY §7.1-2)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from alp_ray.sources.corpus import expected_edges, synth_corpus
from alp_ray.stages.extract import (
    ImportExtractor,
    Sha256Stage,
    add_vertex_ids,
    content_passthrough_roundtrip,
)

N_REPOS, FILES = 3, 30


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(N_REPOS, FILES, seed=42).materialize()


def test_corpus_schema_and_determinism(corpus):
    names = set(corpus.schema().names)
    assert names >= {"repo", "path", "commit", "lang", "content"}
    assert corpus.count() == N_REPOS * FILES
    # Regenerate → byte-identical contents (determinism).
    t2 = synth_corpus(N_REPOS, FILES, seed=42).to_pandas()
    d1 = sorted(corpus.to_pandas()["content"])
    d2 = sorted(t2["content"])
    assert d1 == d2


def test_sha256_passthrough_invariant(corpus):
    """Per-row sha256(content) equality across a pass-through stage —
    the BASELINE.json input_hint invariant."""
    with_digest = corpus.map_batches(Sha256Stage, batch_format="pyarrow", concurrency=2)
    after = with_digest.map_batches(
        content_passthrough_roundtrip, batch_format="pyarrow"
    )
    df = after.to_pandas()
    recomputed = [
        hashlib.sha256(c.encode()).hexdigest() for c in df["content"]
    ]
    assert list(df["sha256"]) == recomputed


def test_edge_extraction_exact(corpus):
    """Extracted edges == generator ground truth, exactly (FIXTURES.md F1)."""
    got = (
        corpus.map_batches(ImportExtractor, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values(["repo", "src_path", "dst_path"])
        .reset_index(drop=True)
    )
    want = (
        expected_edges(N_REPOS, FILES, seed=42)
        .to_pandas()
        .sort_values(["repo", "src_path", "dst_path"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(want) > 0


def test_vertex_ids_stable_and_distinct(corpus):
    edges = corpus.map_batches(ImportExtractor, batch_format="pyarrow", concurrency=2)
    with_ids = edges.map_batches(add_vertex_ids, batch_format="pyarrow")
    df = with_ids.to_pandas()
    # Same (repo,path) always maps to the same id.
    m1 = df.groupby(["repo", "src_path"])["src"].nunique()
    assert (m1 == 1).all()
    # Distinct files map to distinct ids (no collisions at this scale).
    pairs = df[["repo", "src_path"]].drop_duplicates()
    assert df.groupby("src")["src_path"].nunique().max() == 1
    assert len(pairs) == df["src"].nunique()
