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


def _dup_span_oracle(rows, k):
    """Set-based reference: distinct k-token windows per doc; count
    windows appearing in ≥2 docs."""
    wins = {d: set() for d, _ in rows}
    for d, t in rows:
        toks = t.split(" ")
        for i in range(max(0, len(toks) - k + 1)):
            wins[d].add(" ".join(toks[i:i + k]))
    from collections import Counter

    df = Counter(w for s in wins.values() for w in s)
    return {
        d: sum(1 for w in s if df[w] >= 2)
        for d, s in wins.items()
        if any(df[w] >= 2 for w in s)
    }


def test_dup_spans_matches_set_oracle():
    from alp_ray.pipelines.dedup import dup_span_stats

    rng = np.random.RandomState(3)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab, rng.randint(2, 30)).tolist()))
        for d in range(40)
    ]
    # Plant an exact shared 8-token span across two otherwise-random docs.
    span = " ".join(vocab[:8])
    rows[5] = (5, rows[5][1] + " " + span)
    rows[9] = (9, span + " " + rows[9][1])
    got = (
        dup_span_stats(_docs(rows), k=8)
        .to_pandas()
        .set_index("doc_id")["dup_windows"]
        .to_dict()
    )
    assert got == _dup_span_oracle(rows, 8)
    assert got[5] >= 1 and got[9] >= 1


def test_dup_spans_short_docs_and_within_doc_repeat():
    from alp_ray.pipelines.dedup import dup_span_stats

    # Doc 1 repeats its own window — NOT a cross-doc dup (distinct per
    # doc, df counts docs). Docs shorter than k emit nothing.
    w = " ".join(["a"] * 8)
    out = dup_span_stats(
        _docs([(1, w + " " + w), (2, "too short"), (3, "")]), k=8
    ).to_pandas()
    assert len(out) == 0


def test_minhash_poly_matches_python_oracle():
    """Polynomial MinHash signatures + first-match-band pair set must
    equal a direct per-doc Python computation of the same hash law
    (the law the DuckDB twin re-implements in BIGINT arithmetic)."""
    import re as _re

    import ray.data
    from alp_ray.pipelines.dedup import (
        MinHashPolyStage, minhash_poly_pairs,
    )

    B, P, K, BANDS = 1000003, (1 << 31) - 1, 8, 4
    R = K // BANDS
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words entirely here now",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "xy",          # 1 word -> no shingles
        "   ",         # empty after norm -> no shingles
        "a b",         # 2 words -> no shingles
    ]
    ids = list(range(len(texts)))

    def F(w):
        h = 0
        for c in w:
            h = (h * B + ord(c)) % P
        return h

    def sig_of(t):
        ws = _re.sub(r"\s+", " ", t.strip()).split(" ")
        if len(ws) < 3:
            return None
        h0 = [
            ((F(ws[i]) * B + F(ws[i + 1])) % P * B + F(ws[i + 2])) % P
            for i in range(len(ws) - 2)
        ]
        return [
            min(((999983 - 2 * i) * h + 12289 * (i + 1)) % P for h in h0)
            for i in range(K)
        ]

    want = {i: sig_of(t) for i, t in enumerate(texts)}
    stage = MinHashPolyStage(num_perm=K)
    got = stage(pa.table({"doc_id": ids, "text": texts}))
    got_map = {
        r["doc_id"]: list(r["sig"]) for r in got.to_pylist()
    }
    assert set(got_map) == {i for i, s in want.items() if s is not None}
    for i, s in got_map.items():
        assert s == want[i], i

    # Pair set: (a,b) iff some band of R consecutive sigs agrees.
    expected = set()
    keys = sorted(got_map)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            sa, sb = want[a], want[b]
            if any(
                sa[bd * R:(bd + 1) * R] == sb[bd * R:(bd + 1) * R]
                for bd in range(BANDS)
            ):
                expected.add((a, b))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    )
    pairs = minhash_poly_pairs(ds, num_perm=K, bands=BANDS)
    got_pairs = {
        (r["id_a"], r["id_b"]) for r in pairs.take_all()
    }
    assert got_pairs == expected
    assert (0, 3) in got_pairs  # the exact dup must collide


def test_quantize_embeddings_zero_vector_and_roundtrip():
    import ray.data
    from alp_ray.pipelines.ann import quantize_embeddings

    vecs = [
        [0.5, -1.0, 0.25, 0.0],
        [0.0, 0.0, 0.0, 0.0],   # zero vector: scale 0, codes 0
        [2.0, 2.0, 2.0, 2.0],   # uniform: codes all 127, err 0
    ]
    ds = ray.data.from_arrow(
        pa.table({"vec_id": [0, 1, 2], "embedding": vecs})
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(ds).take_all()}
    assert out[1]["scale"] == 0.0
    assert out[1]["sum_codes"] == 0
    assert out[1]["max_err"] == 0.0
    assert out[2]["sum_codes"] == 4 * 127
    assert out[2]["max_err"] == 0.0
    assert out[0]["scale"] == 1.0
    # codes: round(0.5*127)=64 (63.5 half-away), -127, round(31.75)=32
    assert out[0]["sum_codes"] == 64 - 127 + 32


def test_simhash_poly_matches_python_oracle():
    """31-bit polynomial SimHash signatures + Hamming<=3 pair set must
    equal a direct Python computation of the same BIGINT law."""
    import re as _re

    import ray.data
    from alp_ray.pipelines.dedup import (
        SimHashPolyStage, simhash_poly_pairs,
    )

    B, P = 1000003, (1 << 31) - 1
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # close
        "one two three four five six seven eight nine",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup
        "",
    ]
    ids = list(range(len(texts)))

    def F(w):
        h = 0
        for c in w:
            h = (h * B + ord(c)) % P
        return h

    def simhash(t):
        ws = _re.sub(r"\s+", " ", t.strip()).split(" ")
        sh = 0
        for j in range(31):
            s = sum(2 * ((F(w) >> j) & 1) - 1 for w in ws)
            if s > 0:
                sh |= 1 << j
        return sh

    want = [simhash(t) for t in texts]
    got = SimHashPolyStage()(pa.table({"doc_id": ids, "text": texts}))
    got_map = {r["doc_id"]: r["simhash"] for r in got.to_pylist()}
    assert got_map == dict(enumerate(want))

    expected = set()
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if bin(want[a] ^ want[b]).count("1") <= 3:
                expected.add((a, b))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_poly_pairs(ds).take_all()
    }
    assert pairs == expected
    assert (0, 3) in pairs


def test_pq_adc_recall_on_separable_clusters():
    """PQ encode + ADC top-k must retrieve the query's own cluster on
    well-separated synthetic clusters (recall@k = 1 there), and codes
    must be within [0, k)."""
    import ray.data
    from alp_ray.pipelines.ann import pq_encode, pq_topk, pq_train

    rng = np.random.RandomState(3)
    centers = rng.randn(4, 8) * 10
    X = np.concatenate(
        [centers[i] + 0.01 * rng.randn(25, 8) for i in range(4)]
    )
    ids = np.arange(100)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": X.tolist()})
    )
    books = pq_train(ds, m_sub=4, k=8, sample_size=100)
    assert books.shape == (4, 8, 2)
    codes = pq_encode(ds, books).materialize()
    got = pq_topk(codes, books, X[0], k=10)
    top_ids = set(np.asarray(got.column("vec_id")).tolist())
    # All 10 nearest by ADC must be from cluster 0 (ids 0..24).
    assert top_ids <= set(range(25))
    assert len(top_ids) == 10
