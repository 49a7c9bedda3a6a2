"""Training-data hygiene operators: PII scrub, paragraph-repetition
removal, decontamination — semantics edge cases the corpus-level driver
twin can't isolate (empty docs, boundary chunks, nested PII)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from alp_ray.pipelines.dedup import (
    benchmark_ngrams,
    decontaminate,
    paragraph_dedup_stats,
)
from alp_ray.stages.text import PiiScrubStage


def _docs(rows):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })
    )


def test_pii_scrub_order_and_counts():
    # The email inside the URL is consumed by the URL rule (order
    # contract); the bare email and phone are caught by their own rules.
    ds = _docs([
        (1, "mail a@b.com or https://x.test/a@b.com now 123-456-7890"),
        (2, "clean text, no pii 12-34"),
    ])
    out = (
        ds.map_batches(PiiScrubStage, batch_format="pyarrow",
                       concurrency=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "clean_text"] == (
        "mail <EMAIL> or <URL> now <PHONE>"
    )
    assert (
        out.loc[1, ["n_urls", "n_emails", "n_phones"]].tolist() == [1, 1, 1]
    )
    assert out.loc[2, "clean_text"] == "clean text, no pii 12-34"
    assert out.loc[2, ["n_urls", "n_emails", "n_phones"]].sum() == 0


def test_paragraph_dedup_first_occurrence_wins():
    # 25 tokens → chunks of 20 + 5. Doc 2 repeats doc 1's first chunk
    # (tokens 0..19) as its only paragraph → doc 2 keeps nothing.
    toks = [f"w{i}" for i in range(25)]
    d1 = " ".join(toks)
    d2 = " ".join(toks[:20])
    stats = (
        paragraph_dedup_stats(_docs([(1, d1), (2, d2)]))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert stats.loc[1, "n_paras"] == 2 and stats.loc[1, "n_kept"] == 2
    assert stats.loc[2, "n_paras"] == 1 and stats.loc[2, "n_kept"] == 0
    assert stats.loc[1, "kept_chars"] == len(d1) - 1  # join vs split space


def test_paragraph_dedup_within_doc_repeat():
    # The same 20-token paragraph twice inside ONE doc dedupes too.
    p = " ".join(["x"] * 20)
    stats = paragraph_dedup_stats(_docs([(7, p + " " + p)])).to_pandas()
    assert stats.loc[0, "n_paras"] == 2
    assert stats.loc[0, "n_kept"] == 1


def test_decontaminate_flags_only_overlapping_docs():
    bench_text = " ".join(f"b{i}" for i in range(13))
    dirty = "prefix " + bench_text + " suffix"
    clean = " ".join(f"c{i}" for i in range(30))
    ds = _docs([(0, bench_text), (5, dirty), (6, clean)])
    grams = benchmark_ngrams(
        ds, lambda b: pc.less(b.column("doc_id"), 1), n=13
    )
    assert len(grams) == 1
    out = decontaminate(ds, grams, n=13).to_pandas()
    flagged = set(out["doc_id"])
    assert flagged == {0, 5}
    assert out.set_index("doc_id").loc[5, "n_contaminated"] == 1


def test_decontaminate_window_never_crosses_docs():
    # Six tokens per doc: no 13-gram exists anywhere, even though the
    # concatenated token stream would produce one.
    half = " ".join(f"h{i}" for i in range(7))
    ds = _docs([(1, half), (2, half)])
    grams = benchmark_ngrams(ds, lambda b: pc.less(b.column("doc_id"), 99))
    assert grams == []
