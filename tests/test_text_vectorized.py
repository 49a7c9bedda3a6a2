"""Vectorized text-stage kernels vs naive per-char Python oracles.

The vectorized Arrow/numpy implementations in alp_ray.stages.text are
the production kernels; these tests pin their semantics to the obvious
per-row definitions (the round-1 implementations) on tricky inputs:
empty strings, whitespace-only, punctuation/digit/upper mixes, and
multiple languages."""

import re

import numpy as np
import pyarrow as pa

from alp_ray.stages.text import (
    _LANG_PROFILES,
    _STOPWORDS,
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
)

TEXTS = [
    "the cat sat on the mat and the dog ran to the house",
    "key agg row scan slow fast table value part hash",
    "",
    "   ",
    "a",
    "der die das ein und sch ich nicht",
    "Hello, World! 123 Testing... UPPER case? yes-no_maybe",
    "une de la le les et que pour dans ce qui",
    "12345 67890 !!!",
]


def _table():
    return pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})


def test_quality_matches_naive():
    out = QualityScoreStage()(_table())
    word_re = re.compile(r"[A-Za-z]+")
    stop = frozenset(_STOPWORDS)
    for i, s in enumerate(TEXTS):
        L = max(len(s), 1)
        words = word_re.findall(s)
        mw = sum(map(len, words)) / len(words) if words else 0.0
        st = (
            sum(1 for w in words if w.lower() in stop) / len(words)
            if words
            else 0.0
        )
        pu = len(re.findall(r"[^A-Za-z0-9\s]", s)) / L
        di = len(re.findall(r"[0-9]", s)) / L
        sc = float(
            np.clip(
                0.25 * np.clip(mw / 6.0, 0, 1)
                + 0.25 * np.clip(1 - pu * 4, 0, 1)
                + 0.25 * np.clip(1 - di * 4, 0, 1)
                + 0.25 * np.clip(st * 3, 0, 1),
                0,
                1,
            )
        )
        assert abs(out.column("q_mean_word_len")[i].as_py() - mw) < 1e-12
        assert abs(out.column("q_stopword_ratio")[i].as_py() - st) < 1e-12
        assert abs(out.column("q_punct_ratio")[i].as_py() - pu) < 1e-12
        assert abs(out.column("q_digit_ratio")[i].as_py() - di) < 1e-12
        assert abs(out.column("q_score")[i].as_py() - sc) < 1e-12
        assert out.column("q_n_chars")[i].as_py() == len(s)


def test_langid_matches_naive():
    out = LangIdStage()(_table())
    langs_sorted = sorted(_LANG_PROFILES)
    for i, s in enumerate(TEXTS):
        tl = s.lower()
        tris = [tl[j : j + 3] for j in range(max(len(tl) - 2, 0))]
        scores = [
            (
                sum(1 for tr in tris if tr in set(_LANG_PROFILES[lang]))
                / len(tris)
                if tris
                else 0.0
            )
            for lang in langs_sorted
        ]
        bi = int(np.argmax(scores))
        exp = langs_sorted[bi] if scores[bi] > 0.01 else "und"
        assert out.column("lang_pred")[i].as_py() == exp
        assert abs(out.column("lang_conf")[i].as_py() - scores[bi]) < 1e-12


def test_fingerprint_matches_naive_horner():
    out = FingerprintStage()(_table())
    for i, s in enumerate(TEXTS):
        h = 0
        for ch in re.sub(r"\s+", " ", s.strip()):
            h = (h * 1000003 + ord(ch)) % ((1 << 31) - 1)
        assert out.column("fingerprint")[i].as_py() == h


def test_term_stat_partials_vs_naive():
    from collections import Counter

    from alp_ray.stages.text import term_stat_partials

    texts = ["a b a c", "b b d", "a", "c c c a"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = term_stat_partials(t)
    tf = Counter()
    df = Counter()
    for s in texts:
        toks = s.split(" ")
        tf.update(toks)
        df.update(set(toks))
    got = {
        out.column("term")[i].as_py(): (
            out.column("tf")[i].as_py(), out.column("df")[i].as_py()
        )
        for i in range(out.num_rows)
    }
    assert got == {w: (tf[w], df[w]) for w in tf}


def test_bigram_count_partials_vs_naive():
    from collections import Counter

    from alp_ray.stages.text import bigram_count_partials

    texts = ["a b a c", "b b", "x", "c a c a"]
    t = pa.table({"text": texts})
    out = bigram_count_partials(t)
    want = Counter()
    for s in texts:
        toks = s.split(" ")
        want.update(
            f"{x} {y}" for x, y in zip(toks, toks[1:])
        )
    got = {
        out.column("bigram")[i].as_py(): out.column("cnt")[i].as_py()
        for i in range(out.num_rows)
    }
    assert got == dict(want)


def test_inverted_index_postings_and_stopword_guard():
    import ray.data

    from alp_ray.stages.text import inverted_index

    tbl = pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "text": pa.array(
            ["cat dog cat", "dog fish", "dog dog bird"], pa.string()
        ),
    })
    out = (
        inverted_index(
            ray.data.from_arrow(tbl), max_postings=2, n_parts=3
        )
        .to_pandas()
        .set_index("term")
        .sort_index()
    )
    # dog is in all 3 docs -> df exact, postings truncated (guard).
    assert out.loc["dog", "df"] == 3 and out.loc["dog", "postings"] == ""
    assert out.loc["cat", "df"] == 1 and out.loc["cat", "postings"] == "3"
    assert out.loc["fish", "postings"] == "1"
    assert out.loc["bird", "postings"] == "2"
    assert len(out) == 4


def test_bm25_matches_textbook_formula():
    import math

    import ray.data

    from alp_ray.stages.text import bm25_scores

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["cat cat dog", "dog mouse", "bird bird bird bird"],
            pa.string(),
        ),
    })
    out = (
        bm25_scores(ray.data.from_arrow(tbl), ["cat", "dog"])
        .to_pandas()
        .set_index("doc_id")["score"]
    )
    n, avgdl, k1, b = 3, 9 / 3, 1.2, 0.75

    def ref(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out.loc[1] == round(ref(2, 1, 3) + ref(1, 2, 3), 6)
    assert out.loc[2] == round(ref(1, 2, 2), 6)
    assert 3 not in out.index  # no query term -> excluded


def test_sequence_pack_boundary_straddle():
    import ray.data

    from alp_ray.stages.text import sequence_pack

    # Docs of 3/4/2 tokens, seq_len=4: stream positions 0-2, 3-6, 7-8.
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "d e f g", "h i"], pa.string()),
    })
    out = (
        sequence_pack(ray.data.from_arrow(tbl).repartition(2), seq_len=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0].tolist() == [3, 0, 0]
    assert out.loc[1].tolist() == [4, 0, 1]   # straddles seqs 0 and 1
    assert out.loc[2].tolist() == [2, 1, 2]   # tokens 7-8 -> seqs 1..2


def test_length_bucket_batches_matches_row_number_law():
    """bucket = #boundaries <= n_tokens; within-bucket doc_id-ordered
    ranks // batch_docs — must equal the plain sequential law."""
    import ray.data

    from alp_ray.stages.text import length_bucket_batches

    texts = [
        " ".join(["w"] * n)
        for n in [5, 40, 70, 33, 600, 200, 1, 64, 65, 128, 31, 32]
    ]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = {
        r["doc_id"]: r
        for r in length_bucket_batches(ds, batch_docs=2).take_all()
    }
    bnd = [32, 64, 128, 256, 512]
    want_bucket = {
        i: sum(1 for b in bnd if len(t.split()) >= b)
        for i, t in zip(ids, texts)
    }
    # sequential law
    ranks = {}
    for b in sorted(set(want_bucket.values())):
        members = sorted(i for i in ids if want_bucket[i] == b)
        for j, i in enumerate(members):
            ranks[i] = j // 2
    for i in ids:
        assert out[i]["bucket"] == want_bucket[i], i
        assert out[i]["batch_idx"] == ranks[i], i
        assert out[i]["n_tokens"] == len(texts[i].split())


def test_repetition_scores_batch():
    import duckdb
    import pyarrow as pa

    from alp_ray.stages.text import repetition_scores_batch

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b\na b\nxyz\na b",       # dup lines: "a b" x3
            "one two one two one two",   # top bigram dominates
            "",                          # degenerate: 1 empty line
            "unique lines\nonly here",
        ]),
    })
    out = repetition_scores_batch(docs).to_pandas()
    assert out["n_lines"].tolist() == [4, 1, 1, 2]
    # doc0: 4 lines, 2 distinct -> 2/4; chars 3+3+3+3=12, distinct 3+3=6
    assert out["dup_line_frac"].tolist() == [0.5, 0.0, 0.0, 0.0]
    assert out["dup_line_char_frac"][0] == 0.5
    assert out["dup_line_char_frac"][2] == 0.0  # 0 chars -> 0.0
    # doc1: 6 tokens, 5 bigram slots, "one two" x3 -> 3/5
    assert out["top_bigram_frac"][1] == 3.0 / 5.0
    # doc2: 1 token ("") -> 0 bigrams -> 0.0
    assert out["top_bigram_frac"][2] == 0.0

    # Cross-check every value against the SQL twin on the same rows.
    import __ray_entry__ as em

    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(em.oracle_sql()["repetition_scores"])
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    got = out.sort_values("doc_id").reset_index(drop=True)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_chunk_manifest_tiles_exactly(ray_session):
    """Spans per doc tile [0, n_tokens) without gaps; per-chunk token
    totals are exactly seq_len except the final partial chunk."""
    import ray.data

    from alp_ray.stages.text import chunk_manifest, sequence_pack

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    W = 64
    man = chunk_manifest(docs, seq_len=W).to_pandas()
    pack = sequence_pack(docs, seq_len=W).to_pandas()
    # Per-doc: spans start at 0, end at n_tokens, no gaps or overlap.
    g = man.sort_values(["doc_id", "chunk_id"]).groupby("doc_id")
    sizes = g.apply(
        lambda d: int((d.tok_end - d.tok_start).sum()),
        include_groups=False,
    )
    n_tok = pack.set_index("doc_id")["n_tokens"]
    assert (sizes == n_tok.loc[sizes.index]).all()
    first = g.first()
    assert (first.tok_start == 0).all()
    # Chunk ids agree with sequence_pack's first/last assignment.
    rng = g.agg(lo=("chunk_id", "min"), hi=("chunk_id", "max"))
    pk = pack.set_index("doc_id").loc[rng.index]
    assert (rng.lo == pk.seq_start).all() and (rng.hi == pk.seq_end).all()
    # Per-chunk totals: W everywhere except the last chunk.
    per_chunk = man.groupby("chunk_id").apply(
        lambda d: int((d.tok_end - d.tok_start).sum()),
        include_groups=False,
    )
    assert (per_chunk.iloc[:-1] == W).all() and per_chunk.iloc[-1] <= W


def test_rare_term_pairs(ray_session):
    import pyarrow as pa

    import ray.data

    from alp_ray.stages.text import rare_term_pairs

    # 4 docs; "zebra" rare (docs 0,1,2 — tf 2,1,1), "a" common.
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a zebra zebra", "a zebra", "zebra a", "a a a",
        ]),
    })
    out = (
        rare_term_pairs(ray.data.from_arrow(docs), df_cap=3)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # weight = N//df = 4//3 = 1; sims = min(tf) pairs among {0,1,2}.
    assert list(map(tuple, out.to_numpy())) == [
        (0, 1, 1), (0, 2, 1), (1, 2, 1),
    ]


def test_rare_term_pairs_layout_independent(ray_session):
    import pyarrow as pa

    import ray.data

    from alp_ray.stages.text import rare_term_pairs

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words, 12)) + (" rareword" if i % 9 == 0
                                           else "")
        for i in range(60)
    ]
    docs = pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts),
    })
    one = rare_term_pairs(ray.data.from_arrow(docs), df_cap=8)
    many = rare_term_pairs(
        ray.data.from_arrow(docs).repartition(13), df_cap=8
    )
    a = one.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(
        drop=True
    )
    b = many.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(
        drop=True
    )
    assert a.equals(b) and len(a) > 0


def test_rarity_score_stage(ray_session):
    import ray

    import pyarrow as pa

    from alp_ray.stages.text import RarityScoreStage

    # Corpus: "a" x4, "b" x2, "z" x1  (N=7) → rarities 1, 3, 7.
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a b z", "a a b"]),
    })
    vocab = np.array(["a", "b", "z"], dtype=object)
    cnt = np.array([4, 2, 1], np.int64)
    ref = ray.put((vocab, cnt, 7))
    out = RarityScoreStage(ref, keep_max=2)(docs).to_pandas()
    # doc0: 1+1+3+7 = 12 over 4 tokens → mean 3 → dropped
    # doc1: 1+1+3 = 5 over 3 tokens → mean 1 → kept
    assert out["rarity"].tolist() == [12, 5]
    assert out["n_tokens"].tolist() == [4, 3]
    assert out["mean_rarity"].tolist() == [3, 1]
    assert out["keep"].tolist() == [0, 1]


def test_gopher_quality_batch():
    import duckdb
    import pyarrow as pa

    from alp_ray.stages.text import gopher_quality_batch

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            # 31 distinct-ish words incl. stopwords, mean wlen ~4.2:
            " ".join(
                f"word{i}" if i % 3 else "the" for i in range(31)
            ),
            "tiny doc",                          # fails word-count rule
            "aa " * 29 + "aa",                   # 30 words, 1 distinct
        ]),
    })
    out = gopher_quality_batch(docs).to_pandas()
    assert out["n_words"].tolist() == [31, 2, 30]
    assert out["n_distinct_words"][2] == 1
    assert out["stop_hits"][0] == 11           # "the" x11
    assert out["keep"].tolist() == [1, 0, 0]
    # ttr floor-division law: doc2 = 100*1//30 = 3
    assert out["ttr_pct"][2] == 3

    # Cross-check every value against the SQL twin on the same rows.
    import __ray_entry__ as em

    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(em.oracle_sql()["gopher_quality"])
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    got = out.sort_values("doc_id").reset_index(drop=True)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
