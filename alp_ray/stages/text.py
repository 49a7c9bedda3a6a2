"""Text-analysis stages for training-data pipelines (documents table).

Not present in the reference (its element types are numeric PODs —
SURVEY §2.10); these are the large-scale-corpus operators the engine needs
to be useful at 100 TB. All are vectorized ``map_batches`` stages over
Arrow string columns; stateful setup (compiled regexes, stopword tables,
n-gram profiles) happens once per actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from alp_ray.util import round_half_away
import pyarrow.compute as pc

# Tiny per-language character-trigram profiles for heuristic language ID.
# Deterministic, dependency-free; good enough to separate en/de/fr/es-ish
# synthetic text. Real deployments plug in fastText/CLD3 via the same stage.
_LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing",
           " to", "ed ", " in", "ion"),
    "de": ("er ", " de", "der", "en ", "ie ", " di", "die", "ch ", "sch",
           "ein", " un", "und", "ung"),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion",
           " et", "et ", "que", " qu"),
    "es": (" de", "de ", " la", "la ", "os ", " qu", "que", "ue ", "el ",
           " el", "ión", " en", "en "),
}


class TokenCountStage:
    """Whitespace tokens + a BPE-ish subword proxy count per document."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # BPE-ish: runs of letters, runs of digits, single punctuation.
        self._bpe = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_tokens = pc.count_substring_regex(text, r"\S+")
        n_subwords = pc.count_substring_regex(text, self._bpe)
        return batch.append_column(
            "n_tokens", pc.cast(n_tokens, pa.int64())
        ).append_column("n_subwords", pc.cast(n_subwords, pa.int64()))


_STOPWORDS = (
    "the of and to in a is that it for on as with was at by an be this "
    "which or from had not are but have they you were her she his all"
).split()


class QualityScoreStage:
    """Heuristic quality signals: length, mean word length, punctuation /
    digit / uppercase / stopword ratios, and a composite score in [0,1].

    Fully vectorized over the Arrow string column: per-char classes are
    ``pc.count_substring_regex`` counts, stopword membership is a
    flattened-list ``pc.is_in`` + ``np.add.reduceat`` segment sum — no
    per-row Python. The regex definitions (words = ``[A-Za-z]+`` runs,
    punct = ``[^A-Za-z0-9\\s]``) are the spec and match the DuckDB
    oracle twin character-class for character-class."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self._stop_set = pa.array(_STOPWORDS, pa.string())

    def _counts(self, text: pa.ChunkedArray, pattern: str) -> np.ndarray:
        return np.asarray(
            pc.count_substring_regex(text, pattern), dtype=np.float64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
        letters = self._counts(text, "[A-Za-z]")
        n_words = self._counts(text, "[A-Za-z]+")
        punct_n = self._counts(text, r"[^A-Za-z0-9\s]")
        digit_n = self._counts(text, "[0-9]")
        upper_n = self._counts(text, "[A-Z]")
        # Stopword hits: lowercase → split on non-letter runs → flat
        # membership test → per-document segment sum.
        words = pc.split_pattern_regex(
            pc.utf8_lower(text), "[^a-z]+"
        ).combine_chunks()
        flat_hit = pc.is_in(
            words.flatten(), value_set=self._stop_set
        ).cast(pa.int8())
        offsets = np.asarray(words.offsets, dtype=np.int64)
        hits = np.asarray(flat_hit, dtype=np.int8)
        if hits.size:
            seg = np.add.reduceat(
                hits.astype(np.int64), np.minimum(offsets[:-1], hits.size - 1)
            )
            seg[offsets[:-1] == offsets[1:]] = 0
            stop_n = seg.astype(np.float64)
        else:
            stop_n = np.zeros(len(n_chars))
        L = np.maximum(n_chars, 1).astype(np.float64)
        has_w = n_words > 0
        mean_wlen = np.where(has_w, letters / np.maximum(n_words, 1), 0.0)
        stop = np.where(has_w, stop_n / np.maximum(n_words, 1), 0.0)
        punct = punct_n / L
        digit = digit_n / L
        upper = upper_n / L
        score = np.clip(
            0.25 * (mean_wlen / 6.0).clip(0, 1)
            + 0.25 * (1 - punct * 4).clip(0, 1)
            + 0.25 * (1 - digit * 4).clip(0, 1)
            + 0.25 * (stop * 3).clip(0, 1),
            0.0,
            1.0,
        )
        out = batch
        for name, arr in (
            ("q_n_chars", n_chars),
            ("q_mean_word_len", mean_wlen),
            ("q_punct_ratio", punct),
            ("q_digit_ratio", digit),
            ("q_upper_ratio", upper),
            ("q_stopword_ratio", stop),
            ("q_score", score),
        ):
            out = out.append_column(name, pa.array(arr))
        return out


def _tri_key(c0: np.ndarray, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Pack a codepoint trigram into one int64 (codepoints < 2^21)."""
    return (
        c0.astype(np.int64)
        | (c1.astype(np.int64) << 21)
        | (c2.astype(np.int64) << 42)
    )


class LangIdStage:
    """Character-trigram-profile language ID (heuristic n-gram scorer).

    Vectorized: the batch's texts are lowered and concatenated into one
    codepoint array (utf-32 view), trigram windows are packed int64 keys,
    per-language hits are a sorted ``np.isin`` + per-document
    ``reduceat`` — no per-row or per-trigram Python. Semantics identical
    to the per-char definition (trigrams over CHARACTERS, profile match,
    best score, 0.01 threshold)."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.langs = sorted(_LANG_PROFILES)
        self.prof_keys = []
        for lang in self.langs:
            ks = []
            for tri in _LANG_PROFILES[lang]:
                cs = np.frombuffer(
                    tri.encode("utf-32-le"), dtype=np.uint32
                )
                ks.append(int(_tri_key(cs[0:1], cs[1:2], cs[2:3])[0]))
            self.prof_keys.append(np.sort(np.array(ks, np.int64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        lowered = [t.lower() for t in texts]
        lens = np.array([len(t) for t in lowered], np.int64)
        flat = (
            np.frombuffer(
                "".join(lowered).encode("utf-32-le"), dtype=np.uint32
            )
            if n
            else np.empty(0, np.uint32)
        )
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_tris = np.maximum(lens - 2, 0)
        if flat.size >= 3:
            keys_all = _tri_key(flat[:-2], flat[1:-1], flat[2:])
            # Valid windows (not crossing a doc boundary), one gather:
            # position j of doc d maps to flat index starts[d] + j.
            total = int(n_tris.sum())
            woff = np.concatenate([[0], np.cumsum(n_tris)[:-1]])
            pos = (
                np.repeat(starts, n_tris)
                + np.arange(total)
                - np.repeat(woff, n_tris)
            )
            keys = keys_all[pos]
        else:
            keys = np.empty(0, np.int64)
        tri_offs = np.concatenate([[0], np.cumsum(n_tris)])
        scores = np.zeros((len(self.langs), n))
        for li, prof in enumerate(self.prof_keys):
            if keys.size:
                pos = np.searchsorted(prof, keys)
                pos = np.clip(pos, 0, prof.size - 1)
                hit = (prof[pos] == keys).astype(np.int64)
                seg = np.add.reduceat(
                    hit, np.minimum(tri_offs[:-1], max(hit.size - 1, 0))
                )
                seg[tri_offs[:-1] == tri_offs[1:]] = 0
            else:
                seg = np.zeros(n, np.int64)
            scores[li] = np.where(
                n_tris > 0, seg / np.maximum(n_tris, 1), 0.0
            )
        best_i = scores.argmax(axis=0)
        best = scores[best_i, np.arange(n)] if n else np.empty(0)
        langs_arr = np.array(self.langs, object)[best_i]
        langs_out = np.where(best > 0.01, langs_arr, "und")
        return batch.append_column(
            "lang_pred", pa.array(list(langs_out), pa.string())
        ).append_column("lang_conf", pa.array(best, pa.float64()))


class FingerprintStage:
    """Document fingerprint via polynomial rolling hash of the
    whitespace-normalized text (deterministic, order-sensitive):
    ``h = (h·B + codepoint) mod (2³¹−1)`` — the Mersenne-31 modulus
    keeps every intermediate below 2⁵² so the Horner recurrence runs
    vectorized in int64 across the whole batch (one numpy step per char
    POSITION, not per char), and the DuckDB twin's ``list_reduce`` over
    BIGINT computes the identical value."""

    BASE = 1000003
    MOD = (1 << 31) - 1

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self._ws = re.compile(r"\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        norm = [self._ws.sub(" ", t.strip()) for t in texts]
        lens = np.array([len(t) for t in norm], np.int64)
        flat = (
            np.frombuffer(
                "".join(norm).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            if n
            else np.empty(0, np.int64)
        )
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if n else []
        h = np.zeros(n, np.int64)
        max_len = int(lens.max()) if n else 0
        for j in range(max_len):
            active = lens > j
            idx = starts[active] + j
            h[active] = (h[active] * self.BASE + flat[idx]) % self.MOD
        return batch.append_column("fingerprint", pa.array(h))


class PiiScrubStage:
    """PII redaction: replace emails / URLs / simple phone numbers with
    typed placeholders and count each redaction class per document.

    Patterns are RE2 (pyarrow's regex engine) and are chosen so the
    DuckDB twin (also RE2) behaves byte-for-byte identically:

    - URL    ``https?://[^\\s]+``               → ``<URL>``
    - EMAIL  ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}`` → ``<EMAIL>``
    - PHONE  ``[0-9]{3}-[0-9]{3}-[0-9]{4}``     → ``<PHONE>``

    Replacement ORDER matters (URL first so an address inside a URL is
    consumed by the URL rule) and is part of the operator contract.
    Fully vectorized: three ``count_substring_regex`` + three
    ``replace_substring_regex`` Arrow kernel calls per batch, compiled
    patterns held per actor."""

    URL = r"https?://[^\s]+"
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        out = batch
        for name, pat, repl in (
            ("n_urls", self.URL, "<URL>"),
            ("n_emails", self.EMAIL, "<EMAIL>"),
            ("n_phones", self.PHONE, "<PHONE>"),
        ):
            cnt = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, repl)
            out = out.append_column(name, cnt)
        i = out.schema.get_field_index(self.text_col)
        return out.set_column(i, "clean_text", text)


# ------------------------------------------------------- TF-IDF / n-grams --


def _doc_tokens(batch: pa.Table, text_col: str):
    """Whitespace-split tokens of a batch: (flat StringArray, doc index
    per token). Single-space split matches the SQL twin's
    ``string_split(text, ' ')`` exactly (empties, if any, are kept as
    tokens on BOTH sides)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    counts = np.diff(np.asarray(toks.offsets))
    doc_idx = np.repeat(np.arange(counts.size), counts)
    return toks.values, doc_idx


def _ranked_codes(values: "pa.StringArray"):
    """Dictionary-encode tokens and remap codes to LEXICOGRAPHIC rank,
    so integer comparisons order exactly like DuckDB/Python string
    order (ASCII corpus): per-batch O(V log V) python compares on the
    vocabulary only, everything per-token stays int64-vectorized."""
    enc = pc.dictionary_encode(values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dictionary = np.asarray(enc.dictionary, dtype=object)
    order = np.argsort(dictionary, kind="stable")
    rank = np.empty(dictionary.size, np.int64)
    rank[order] = np.arange(dictionary.size)
    codes = rank[np.asarray(enc.indices, np.int64)]
    return codes, dictionary[order]


def term_stat_partials(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-batch combiner for corpus TF-IDF: (term, tf, df) partials.
    df partials SUM exactly because documents never split across
    batches. Feed into ``groupby('term').aggregate(Sum, Sum)`` — the
    partial-then-small-shuffle pattern (vocabulary-sized exchange, not
    token-sized)."""
    values, doc_idx = _doc_tokens(batch, text_col)
    if len(values) == 0:
        return pa.table({
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        })
    codes, vocab = _ranked_codes(values)
    order = np.lexsort((codes, doc_idx))
    d, c = doc_idx[order], codes[order]
    b = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
    starts = np.flatnonzero(b)
    tf = np.diff(np.r_[starts, d.size])
    g_code = c[starts]
    o2 = np.argsort(g_code, kind="stable")
    g2, tf2 = g_code[o2], tf[o2]
    b2 = np.r_[True, g2[1:] != g2[:-1]]
    s2 = np.flatnonzero(b2)
    return pa.table({
        "term": pa.array(list(vocab[g2[s2]]), pa.string()),
        "tf": pa.array(np.add.reduceat(tf2, s2)),
        "df": pa.array(np.diff(np.r_[s2, g2.size])),
    })


def tfidf_terms(docs, text_col: str = "text"):
    """Corpus-level (term, tf, df) via per-batch combine + one
    vocabulary-sized groupby — the idf itself (ln(N/df)) is applied by
    the caller so N comes from one place."""
    from ray.data.aggregate import Sum

    parts = docs.map_batches(
        lambda b: term_stat_partials(b, text_col), batch_format="pyarrow"
    )
    agg = parts.groupby("term").aggregate(Sum("tf"), Sum("df"))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "term": b.column("term"),
            "tf": b.column("sum(tf)"),
            "df": b.column("sum(df)"),
        })

    return agg.map_batches(project, batch_format="pyarrow")


class TfidfTopTermStage:
    """Per-document argmax tf·idf term (ties: lexicographically first
    term), with the corpus df table BROADCAST once via ``ray.put`` —
    the small-side-lookup pattern; no per-doc shuffle. Scores are
    rounded half-away at 6 decimals BEFORE the argmax so the ordering
    matches the SQL twin's ``ORDER BY ROUND(tf*ln(N/df), 6) DESC,
    term``."""

    def __init__(self, df_ref, n_docs: int,
                 text_col: str = "text", doc_col: str = "doc_id") -> None:
        import ray

        vocab, df = ray.get(df_ref)
        self.vocab = np.asarray(vocab, dtype=object)   # sorted
        self.idf = np.log(float(n_docs) / np.asarray(df, np.float64))
        self.text_col = text_col
        self.doc_col = doc_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, doc_idx = _doc_tokens(batch, self.text_col)
        doc_ids = np.asarray(batch.column(self.doc_col))
        codes, bvocab = _ranked_codes(values)
        # Map batch-local vocabulary to the global (sorted) vocabulary.
        gidx = np.searchsorted(self.vocab, bvocab)
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        b = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(b)
        tf = np.diff(np.r_[starts, d.size]).astype(np.float64)
        g_doc, g_code = d[starts], c[starts]
        score = tf * self.idf[gidx[g_code]]
        score_r = np.floor(score * 1e6 + 0.5) / 1e6  # ROUND half-away
        # Per doc: best = (score_r desc, global term rank asc).
        o = np.lexsort((gidx[g_code], -score_r, g_doc))
        gd = g_doc[o]
        first = np.flatnonzero(np.r_[True, gd[1:] != gd[:-1]])
        sel = o[first]
        return pa.table({
            self.doc_col: pa.array(doc_ids[g_doc[sel]]),
            "term": pa.array(
                list(self.vocab[gidx[g_code[sel]]]), pa.string()
            ),
            "tfidf": pa.array(score_r[sel]),
        })


def bigram_count_partials(
    batch: pa.Table, text_col: str = "text"
) -> pa.Table:
    """Per-batch (bigram, cnt) combiner: adjacent same-document token
    pairs joined with a space — Arrow kernels end-to-end
    (slice + binary_join_element_wise + value_counts)."""
    values, doc_idx = _doc_tokens(batch, text_col)
    n = len(values)
    if n < 2:
        return pa.table({
            "bigram": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        })
    left = values.slice(0, n - 1)
    right = values.slice(1, n - 1)
    joined = pc.binary_join_element_wise(left, right, " ")
    same = pa.array(doc_idx[1:] == doc_idx[:-1])
    vc = pc.value_counts(joined.filter(same))
    return pa.table({
        "bigram": vc.field("values"),
        "cnt": pc.cast(vc.field("counts"), pa.int64()),
    })


def bigram_counts(docs, text_col: str = "text"):
    """Corpus bigram counts: per-batch combine + one bigram-keyed
    groupby sum."""
    from ray.data.aggregate import Sum

    parts = docs.map_batches(
        lambda b: bigram_count_partials(b, text_col),
        batch_format="pyarrow",
    )
    agg = parts.groupby("bigram").aggregate(Sum("cnt"))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "bigram": b.column("bigram"),
            "cnt": b.column("sum(cnt)"),
        })

    return agg.map_batches(project, batch_format="pyarrow")


def inverted_index(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 400,
    n_parts: int | None = None,
):
    """Distributed inverted-index build: (term, df, postings) with
    ``postings`` the comma-joined ascending doc-id list — the search /
    retrieval-side counterpart of the dedup family. Terms whose df
    exceeds ``max_postings`` keep their EXACT df but an empty postings
    string (the stopword guard: an unbounded posting list for a term in
    every document is the classic index blowup; real systems tier those
    into skip-list blocks instead).

    Physical plan: per-batch distinct (term, doc) pairs (a document
    never splits across batches, so batch-local distinct is global) →
    co-locate whole TERMS by blake2b(term) % n_parts → one vectorized
    kernel per partition (np.unique factorize + lexsort + bincount +
    ListArray/binary_join posting assembly — no per-term Python loop).
    """
    import hashlib

    import ray.data  # noqa: F401  (docs is a Dataset)

    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "term": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "__part": pa.array([], pa.int64()),
        })
        if len(batch) == 0:
            return empty
        toks = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = np.diff(np.asarray(toks.offsets, np.int64))
        doc_of = np.repeat(
            np.asarray(batch.column(id_col), np.int64), counts
        )
        words = np.array(toks.values.to_pylist(), dtype=object)
        if words.size == 0:
            return empty
        uniq, inv = np.unique(words, return_inverse=True)
        order = np.lexsort((inv, doc_of))
        d, t = doc_of[order], inv[order]
        keep = np.r_[True, (d[1:] != d[:-1]) | (t[1:] != t[:-1])]
        d, t = d[keep], t[keep]
        part = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(),
                    "little",
                )
                % n_parts
                for w in uniq
            ),
            dtype=np.int64,
            count=uniq.size,
        )[t]
        return pa.table({
            "term": pa.array(uniq[t].tolist(), pa.string()),
            id_col: pa.array(d),
            "__part": pa.array(part),
        })

    tagged = docs.select_columns([id_col, text_col]).map_batches(
        pairs, batch_format="pyarrow"
    )

    def build(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.string()),
        })
        if "term" not in group.column_names or group.num_rows == 0:
            return empty
        terms = np.array(group.column("term").to_pylist(), dtype=object)
        d = np.asarray(group.column(id_col), np.int64)
        uniq, tcode = np.unique(terms, return_inverse=True)
        order = np.lexsort((d, tcode))
        tcode, d = tcode[order], d[order]
        df = np.bincount(tcode, minlength=uniq.size).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(df)]).astype(np.int32)
        doc_strs = pa.array(d).cast(pa.string())
        postings = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), doc_strs), ","
        )
        postings = pc.if_else(
            pa.array(df <= max_postings), postings, ""
        )
        return pa.table({
            "term": pa.array(uniq.tolist(), pa.string()),
            "df": pa.array(df),
            "postings": postings,
        })

    return tagged.groupby("__part").map_groups(
        build, batch_format="pyarrow"
    )


def bm25_scores(
    docs,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 keyword scoring (Robertson idf with +1 floor): score every
    document against a small query-term set; returns (doc_id, score)
    for docs matching ≥1 term, score rounded to 6 dp.

    Two passes, both streaming: (1) one map_batches partials pass +
    tiny global Sum for N, total tokens, and per-term document
    frequencies (O(len(terms)) scalars to the driver — the legitimate
    small-aggregate escape); (2) one map_batches scoring pass with the
    idf table captured by closure (broadcast via the task closure, not
    re-shipped per batch). Term frequencies come from one flattened
    token comparison per query term — vectorized, no per-row loop.
    Production note: at 100 TB the scoring pass would prune via the
    ``inverted_index`` postings instead of scanning every doc; the
    formula and partials are unchanged."""
    from ray.data.aggregate import Sum

    def stats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = np.diff(np.asarray(toks.offsets, np.int64))
        words = np.array(toks.values.to_pylist(), dtype=object)
        doc_of = np.repeat(np.arange(len(batch)), counts)
        cols = {
            "n_docs": pa.array([len(batch)], pa.int64()),
            "n_tokens": pa.array([int(counts.sum())], pa.int64()),
        }
        for i, t in enumerate(terms):
            hit = doc_of[words == t]
            cols[f"df_{i}"] = pa.array(
                [int(np.unique(hit).size)], pa.int64()
            )
        return pa.table(cols)

    part = docs.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow"
    )
    agg = part.aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        *[Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))],
    )
    n = int(agg["n_docs"])
    avgdl = agg["n_tokens"] / n
    idf = [
        float(np.log(1.0 + (n - agg[f"df_{i}"] + 0.5)
                     / (agg[f"df_{i}"] + 0.5)))
        for i in range(len(terms))
    ]

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        })
        if len(batch) == 0:
            return empty
        toks = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        counts = np.diff(np.asarray(toks.offsets, np.int64))
        words = np.array(toks.values.to_pylist(), dtype=object)
        doc_of = np.repeat(np.arange(len(batch)), counts)
        dl = counts.astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch))
        for i, t in enumerate(terms):
            tf = np.bincount(
                doc_of[words == t], minlength=len(batch)
            ).astype(np.float64)
            s += idf[i] * (tf * (k1 + 1.0)) / (tf + norm)
        keep = s > 0
        ids = np.asarray(batch.column(id_col), np.int64)[keep]
        return pa.table({
            id_col: pa.array(ids),
            "score": pa.array(round_half_away(s[keep], 6)),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def sequence_pack(
    docs,
    seq_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """LLM-pretraining sequence assignment (concat-and-chunk): lay the
    corpus's token stream out in ``id`` order, cut it into fixed
    ``seq_len`` training sequences, and report for every document its
    token count and the first/last sequence it lands in (docs may
    straddle a boundary — the standard packing used when documents are
    concatenated with separators and chunked).

    Physical plan: one range sort by id, then per-block token sums →
    O(#blocks) driver-side offset scalars → per-block prefix sums (the
    global_rank / dense-id-mapping pattern). All-integer, no second
    shuffle."""
    import ray
    import ray.data

    def with_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = np.diff(np.asarray(toks.offsets, np.int64))
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_tokens": pa.array(n),
        })

    sorted_ds = (
        docs.select_columns([id_col, text_col])
        .map_batches(with_tokens, batch_format="pyarrow")
        .sort(id_col)
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _tokens(tbl: pa.Table) -> int:
        if "n_tokens" not in tbl.column_names:
            return 0
        return int(
            np.asarray(tbl.column("n_tokens"), np.int64).sum()
        )

    sums = ray.get([_tokens.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    @ray.remote
    def _assign(tbl: pa.Table, offset: int) -> pa.Table:
        if "n_tokens" not in tbl.column_names or tbl.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "seq_start": pa.array([], pa.int64()),
                "seq_end": pa.array([], pa.int64()),
            })
        n = np.asarray(tbl.column("n_tokens"), np.int64)
        before = offset + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table({
            id_col: tbl.column(id_col),
            "n_tokens": pa.array(n),
            "seq_start": pa.array(before // seq_len),
            "seq_end": pa.array((before + np.maximum(n, 1) - 1)
                                // seq_len),
        })

    out = [
        _assign.remote(r, int(offsets[i])) for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out)


RARITY_KEEP_MAX = 30  # keep docs whose mean token rarity ≤ this


class RarityScoreStage:
    """CCNet-style rarity (inverse-document-frequency surprisal)
    filter with an INTEGER proxy: each token occurrence contributes
    ``N_corpus_tokens // cnt(token)`` (floor division — the integer
    analogue of -log p(token)), a document's score is the occurrence
    sum, and ``keep`` thresholds the per-token mean. CCNet filters on
    KenLM perplexity; the floor-division proxy keeps the whole pipeline
    integer-exact so the DuckDB twin is rounding-free.

    Corpus statistics (sorted vocab, per-term counts, total tokens) are
    BROADCAST once per actor via ``ray.put`` — the small-side-lookup
    pattern of TfidfTopTermStage; per batch everything is vectorized
    (searchsorted vocab remap + reduceat segment sums).
    """

    def __init__(self, stats_ref, text_col: str = "text",
                 doc_col: str = "doc_id",
                 keep_max: int = RARITY_KEEP_MAX) -> None:
        import ray

        vocab, cnt, n_total = ray.get(stats_ref)
        self.vocab = np.asarray(vocab, dtype=object)   # sorted
        self.term_rarity = np.int64(n_total) // np.asarray(cnt, np.int64)
        self.text_col = text_col
        self.doc_col = doc_col
        self.keep_max = keep_max

    def __call__(self, batch: pa.Table) -> pa.Table:
        values, doc_idx = _doc_tokens(batch, self.text_col)
        codes, bvocab = _ranked_codes(values)
        gidx = np.searchsorted(self.vocab, bvocab)
        occ = self.term_rarity[gidx[codes]]
        # split(' ') yields ≥1 token per doc and doc_idx is
        # nondecreasing by construction, so run starts cover every row.
        starts = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
        rarity = np.add.reduceat(occ, starts)
        nt = np.diff(np.r_[starts, occ.size]).astype(np.int64)
        mean = rarity // nt
        return pa.table({
            self.doc_col: batch.column(self.doc_col),
            "rarity": pa.array(rarity),
            "n_tokens": pa.array(nt),
            "mean_rarity": pa.array(mean),
            "keep": pa.array((mean <= self.keep_max).astype(np.int64)),
        })


def chunk_manifest(
    docs,
    seq_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Concat-and-chunk LOADER MANIFEST: one row per (document,
    training-sequence) pair with the within-document token span
    ``[tok_start, tok_end)`` that sequence takes from the document —
    the materialization plan a pretraining data loader executes after
    :func:`sequence_pack` decides the layout. A document straddling a
    boundary emits one row per covered sequence.

    Same physical plan as sequence_pack (one range sort by id,
    per-block token sums → O(#blocks) driver offset scalars →
    per-block expansion); the expansion is pure integer arithmetic
    (np.repeat + arange), so the DuckDB twin (window prefix sum +
    ``unnest(range(...))``) is rounding-free.
    """
    import ray
    import ray.data

    def with_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        n = np.diff(np.asarray(toks.offsets, np.int64))
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_tokens": pa.array(n),
        })

    sorted_ds = (
        docs.select_columns([id_col, text_col])
        .map_batches(with_tokens, batch_format="pyarrow")
        .sort(id_col)
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _tokens(tbl: pa.Table) -> int:
        if "n_tokens" not in tbl.column_names:
            return 0
        return int(np.asarray(tbl.column("n_tokens"), np.int64).sum())

    sums = ray.get([_tokens.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    @ray.remote
    def _expand(tbl: pa.Table, offset: int) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "tok_end": pa.array([], pa.int64()),
        })
        if "n_tokens" not in tbl.column_names or tbl.num_rows == 0:
            return empty
        ids = np.asarray(tbl.column(id_col), np.int64)
        n = np.asarray(tbl.column("n_tokens"), np.int64)
        off = offset + np.concatenate([[0], np.cumsum(n)[:-1]])
        # split(' ') yields ≥1 token per doc, so n ≥ 1 everywhere.
        first = off // seq_len
        last = (off + n - 1) // seq_len
        per_doc = last - first + 1
        ridx = np.repeat(np.arange(ids.size), per_doc)
        starts = np.repeat(first, per_doc)
        # chunk ids: consecutive run per doc starting at `first`.
        run = np.arange(ridx.size) - np.repeat(
            np.concatenate([[0], np.cumsum(per_doc)[:-1]]), per_doc
        )
        chunk = starts + run
        o, nn = off[ridx], n[ridx]
        tok_start = np.maximum(0, chunk * seq_len - o)
        tok_end = np.minimum(nn, (chunk + 1) * seq_len - o)
        return pa.table({
            id_col: pa.array(ids[ridx]),
            "chunk_id": pa.array(chunk),
            "tok_start": pa.array(tok_start),
            "tok_end": pa.array(tok_end),
        })

    out = [
        _expand.remote(r, int(offsets[i])) for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out)


def length_bucket_batches(
    docs: "ray.data.Dataset",
    boundaries: tuple = (32, 64, 128, 256, 512),
    batch_docs: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Length-bucketed batch assignment — the pad-efficiency batching
    strategy complementary to ``sequence_pack`` (concat-and-chunk):
    docs are bucketed by token count (bucket i = #boundaries ≤ n) and
    batched ``batch_docs`` at a time within each bucket in doc_id
    order, so every batch pads to its bucket's bound instead of the
    corpus max. Emits (doc_id, n_tokens, bucket, batch_idx) — all
    integer, deterministic, ROW_NUMBER-twinnable.

    Distributed form: ONE range sort by (bucket, doc_id) carrying the
    payload columns, per-block local ranks shifted by O(#blocks)
    driver count scalars (the global_rank pattern), within-bucket
    ranks from a ≤|boundaries|+1-entry bucket-start broadcast — no
    join, no second shuffle."""
    import ray

    bnd = np.asarray(boundaries, np.int64)

    def feats(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n = np.asarray(
            pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        )
        bucket = np.searchsorted(bnd, n, side="right").astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "n_tokens": pa.array(n),
                "bucket": pa.array(bucket),
            }
        )

    sorted_ds = (
        docs.map_batches(feats, batch_format="pyarrow")
        .sort(["bucket", id_col])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _meta(tbl: pa.Table):
        if id_col not in tbl.column_names or tbl.num_rows == 0:
            return 0, np.zeros(bnd.size + 1, np.int64)
        bk = np.asarray(tbl.column("bucket"), np.int64)
        return tbl.num_rows, np.bincount(bk, minlength=bnd.size + 1)

    metas = ray.get([_meta.remote(r) for r in refs])
    counts = np.array([m[0] for m in metas], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    per_bucket = np.sum([m[1] for m in metas], axis=0)
    bucket_starts = np.concatenate([[0], np.cumsum(per_bucket)[:-1]])
    sref = ray.put(bucket_starts)

    @ray.remote
    def _tag(tbl: pa.Table, offset: int) -> pa.Table:
        if id_col not in tbl.column_names or tbl.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "batch_idx": pa.array([], pa.int64()),
                }
            )
        st = ray.get(sref)
        bk = np.asarray(tbl.column("bucket"), np.int64)
        rank = np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
        local = rank - st[bk]
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "n_tokens": tbl.column("n_tokens"),
                "bucket": pa.array(bk),
                "batch_idx": pa.array(local // batch_docs),
            }
        )

    import ray.data

    return ray.data.from_arrow_refs(
        [_tag.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


# ------------------------------------------- within-doc repetition --

def repetition_scores_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style within-document repetition filters (Rae et al.
    2021, "Scaling Language Models", Table A1 — the repetition-removal
    family): per document,

    - ``n_lines`` and ``dup_line_frac`` — fraction of line occurrences
      beyond the first occurrence of that exact line;
    - ``dup_line_char_frac`` — fraction of line CHARACTERS sitting in
      those duplicate occurrences;
    - ``top_bigram_frac`` — count of the most frequent word bigram over
      the number of bigram slots (0.0 for docs with < 2 tokens).

    Embarrassingly parallel (a doc never spans blocks): ONE map_batches
    pass, zero shuffle, Arrow split kernels + numpy segment reductions.
    FP contract for the DuckDB twin: every fraction is a single IEEE
    double division of two exactly-representable integers — bitwise
    reproducible on both sides with no rounding step at all.

    Lines split on chr(10), tokens on a single space (the _doc_tokens /
    string_split(text, ' ') convention — empties kept on both sides).
    """
    n_docs = batch.num_rows
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    # --- lines ---
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n_lines = np.diff(np.asarray(lines.offsets)).astype(np.int64)
    lidx = np.repeat(np.arange(n_lines.size), n_lines)
    lvals = lines.values
    llen = np.asarray(pc.utf8_length(lvals), dtype=np.int64)
    codes, _ = _ranked_codes(lvals)
    order = np.lexsort((codes, lidx))
    d_s, c_s, l_s = lidx[order], codes[order], llen[order]
    first = np.ones(d_s.size, bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    n_distinct = np.bincount(d_s[first], minlength=n_docs)
    total_chars = np.bincount(lidx, weights=llen, minlength=n_docs)
    distinct_chars = np.bincount(
        d_s[first], weights=l_s[first], minlength=n_docs
    )
    # ints < 2^53 held exactly in float64: subtraction exact, one
    # correctly-rounded divide — mirrors CAST(a-b AS DOUBLE)/CAST(...).
    dup_line_frac = (n_lines - n_distinct) / n_lines
    dup_line_char_frac = np.zeros(n_docs)
    nz = total_chars > 0
    np.divide(total_chars - distinct_chars, total_chars,
              out=dup_line_char_frac, where=nz)

    # --- word bigrams ---
    top = np.zeros(n_docs, np.int64)
    n_bigrams = np.zeros(n_docs, np.int64)
    values, tidx = _doc_tokens(batch, text_col)
    n = len(values)
    if n >= 2:
        left = values.slice(0, n - 1)
        right = values.slice(1, n - 1)
        joined = pc.binary_join_element_wise(left, right, " ")
        same = tidx[1:] == tidx[:-1]
        bdoc = tidx[1:][same]
        if bdoc.size:
            bcodes, _ = _ranked_codes(joined.filter(pa.array(same)))
            order = np.lexsort((bcodes, bdoc))
            bd, bc = bdoc[order], bcodes[order]
            run_start = np.ones(bd.size, bool)
            run_start[1:] = (bd[1:] != bd[:-1]) | (bc[1:] != bc[:-1])
            starts = np.nonzero(run_start)[0]
            run_len = np.diff(np.append(starts, bd.size))
            np.maximum.at(top, bd[starts], run_len)
            n_bigrams = np.bincount(bdoc, minlength=n_docs)
    top_bigram_frac = np.zeros(n_docs)
    nz = n_bigrams > 0
    np.divide(top, n_bigrams, out=top_bigram_frac, where=nz)

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(n_lines),
            "dup_line_frac": pa.array(dup_line_frac),
            "dup_line_char_frac": pa.array(dup_line_char_frac),
            "top_bigram_frac": pa.array(top_bigram_frac),
        }
    )


# Gopher quality-rule thresholds (Rae et al. 2021 Table A1 family,
# re-scaled to the synthetic corpus so both keep classes are populated).
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 90
GOPHER_MIN_TTR_PCT = 45           # 100·distinct/total words
GOPHER_MIN_MWL_X100 = 400         # 100·word-chars/words (mean wlen ≥4)
GOPHER_MAX_MWL_X100 = 520         # mean word length ≤ 5.2
GOPHER_MIN_STOP_HITS = 1


def gopher_quality_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style document QUALITY rules (Rae et al. 2021, Table A1 —
    the companion of :func:`repetition_scores_batch`'s repetition
    family): per document the word count, distinct-word count,
    word-character sum and stopword-hit count, plus the two derived
    integer ratios the rules threshold on —

    - ``ttr_pct``       = (100·n_distinct) // n_words   (type-token ratio)
    - ``mean_wlen_x100``= (100·n_word_chars) // n_words

    and ``keep`` (int64 0/1): word count in
    [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS], ttr ≥ GOPHER_MIN_TTR_PCT,
    mean word length within [MIN,MAX]_MWL, and ≥ GOPHER_MIN_STOP_HITS
    stopword occurrence (the "contains common English words" rule,
    over the first 8 entries of the shared ``_STOPWORDS`` list).

    Embarrassingly parallel, ONE map_batches pass, zero shuffle. Every
    output is an INTEGER (ratios are floor divisions), so the DuckDB
    twin is rounding-free by construction. Tokens split on a single
    space (the ``_doc_tokens`` / ``string_split(text, ' ')``
    convention).
    """
    n_docs = batch.num_rows
    values, tidx = _doc_tokens(batch, text_col)
    n_words = np.bincount(tidx, minlength=n_docs).astype(np.int64)
    tok_len = np.asarray(pc.utf8_length(values), dtype=np.int64)
    # bincount(weights=) sums in float64 — exact below 2^53 chars/doc.
    n_chars = np.bincount(
        tidx, weights=tok_len, minlength=n_docs
    ).astype(np.int64)
    stop_hit = np.asarray(
        pc.is_in(
            values, value_set=pa.array(_STOPWORDS[:8], pa.string())
        ).cast(pa.int8()),
        dtype=np.int64,
    )
    stop_hits = np.bincount(
        tidx, weights=stop_hit, minlength=n_docs
    ).astype(np.int64)
    # Distinct tokens per doc: sort (doc, code) pairs once, count run
    # starts — the repetition_scores_batch dup-line trick.
    codes, _ = _ranked_codes(values)
    order = np.lexsort((codes, tidx))
    d_s, c_s = tidx[order], codes[order]
    first = np.ones(d_s.size, bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
    n_distinct = np.bincount(d_s[first], minlength=n_docs).astype(
        np.int64
    )
    safe_w = np.maximum(n_words, 1)
    ttr_pct = (100 * n_distinct) // safe_w
    mwl_x100 = (100 * n_chars) // safe_w
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (ttr_pct >= GOPHER_MIN_TTR_PCT)
        & (mwl_x100 >= GOPHER_MIN_MWL_X100)
        & (mwl_x100 <= GOPHER_MAX_MWL_X100)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    ).astype(np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "n_word_chars": pa.array(n_chars),
            "stop_hits": pa.array(stop_hits),
            "ttr_pct": pa.array(ttr_pct),
            "mean_wlen_x100": pa.array(mwl_x100),
            "keep": pa.array(keep),
        }
    )


def rare_term_df_cap(n_docs: int) -> int:
    """Blocking-key rarity cap: terms in ≤ max(16, n_docs // 8) docs.
    Corpus-relative so the operator stays meaningful at every sf (a
    fixed cap empties out as the corpus grows)."""
    return max(16, n_docs // 8)


def rare_term_pairs(
    docs,
    df_cap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Entity-resolution BLOCKING: candidate document pairs that share
    a RARE term (df ≤ ``df_cap``, default ``rare_term_df_cap(N)``),
    scored by the integer rare-term
    overlap Σ min(tf_a, tf_b) · (N_docs // df) — the df cap is both the
    semantic filter (common terms carry no signal) and the scale guard
    (a term's pair fan-out is ≤ df², so one partition emits at most
    df_cap²/2 pairs per term; no all-pairs path exists).

    Physical plan: per-block (doc, term, tf) partials for rare-term
    candidates, terms co-located by the coarse hash partition, pairs
    emitted in-kernel per term, then one (doc_a, doc_b) groupby sums
    the weighted overlaps. All-integer."""
    import ray.data
    from ray.data.aggregate import Sum

    from alp_ray.util import coarse_parts

    n_docs = docs.count()
    if df_cap is None:
        df_cap = rare_term_df_cap(n_docs)
    # Corpus df per term (vocabulary-sized exchange).
    stats = tfidf_terms(docs, text_col).to_pandas()
    rare = stats[stats["df"] <= df_cap]
    import ray as _ray

    rare_ref = _ray.put((
        np.sort(rare["term"].to_numpy(dtype=object)),
        rare.sort_values("term")["df"].to_numpy().astype(np.int64),
    ))

    import hashlib

    n_parts = coarse_parts()

    def _term_part(vocab_arr: np.ndarray) -> np.ndarray:
        # blake2b per VOCAB entry (block-vocabulary-sized, not
        # token-sized); builtin hash() is per-process-salted.
        return np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        t.encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                % n_parts
                for t in vocab_arr
            ],
            np.int64,
        )

    def doc_term_tf(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "term": pa.array([], pa.string()),
            "doc": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "__part": pa.array([], pa.int64()),
        })
        values, doc_idx = _doc_tokens(batch, text_col)
        ids = np.asarray(batch.column(id_col), np.int64)
        rare_vocab, _ = _ray.get(rare_ref)
        if rare_vocab.size == 0 or len(values) == 0:
            return empty
        codes, bvocab = _ranked_codes(values)
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        b = np.r_[True, (d[1:] != d[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(b)
        tf = np.diff(np.r_[starts, d.size]).astype(np.int64)
        g_doc, g_code = d[starts], c[starts]
        pos = np.searchsorted(rare_vocab, bvocab[g_code])
        ok = (pos < rare_vocab.size) & (
            rare_vocab[np.minimum(pos, rare_vocab.size - 1)]
            == bvocab[g_code]
        )
        terms = bvocab[g_code[ok]]
        vparts = _term_part(bvocab)
        return pa.table({
            "term": pa.array(list(terms), pa.string()),
            "doc": pa.array(ids[g_doc[ok]]),
            "tf": pa.array(tf[ok]),
            "__part": pa.array(vparts[g_code[ok]]),
        })

    tagged = docs.map_batches(doc_term_tf, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        })
        if "term" not in group.column_names or group.num_rows == 0:
            return empty
        rare_vocab, df = _ray.get(rare_ref)
        term = group.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        enc = term.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tvoc = np.asarray(enc.dictionary, dtype=object)
        tcode = np.asarray(enc.indices, np.int64)
        wmap = (np.int64(n_docs) // df)[
            np.searchsorted(rare_vocab, tvoc)
        ]
        doc = np.asarray(group.column("doc"), np.int64)
        tf = np.asarray(group.column("tf"), np.int64)
        order = np.lexsort((doc, tcode))
        tcode, doc, tf = tcode[order], doc[order], tf[order]
        # co_occurrence's segment repeat/arange pair expansion — one
        # vectorized pass, no per-term dispatch.
        starts = np.flatnonzero(np.r_[True, tcode[1:] != tcode[:-1]])
        d = np.diff(np.r_[starts, tcode.size])
        pos = np.arange(tcode.size, dtype=np.int64) - np.repeat(starts, d)
        n_right = np.repeat(d, d) - 1 - pos
        total = int(n_right.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(tcode.size, dtype=np.int64), n_right)
        cum_e = np.concatenate([[0], np.cumsum(n_right)[:-1]])
        off = np.arange(total, dtype=np.int64) - np.repeat(cum_e, n_right)
        right = left + 1 + off
        a, b = doc[left], doc[right]
        s = np.minimum(tf[left], tf[right]) * wmap[tcode[left]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # Partition-local pre-aggregation of (pair, weight) sums.
        key = lo * np.int64(1 << 31) + hi
        order2 = np.argsort(key, kind="stable")
        key, lo, hi, s = key[order2], lo[order2], hi[order2], s[order2]
        st2 = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        return pa.table({
            "doc_a": pa.array(lo[st2]),
            "doc_b": pa.array(hi[st2]),
            "s": pa.array(np.add.reduceat(s, st2)),
        })

    return (
        tagged.groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("s", alias_name="sim"))
    )


def kn_continuation(
    docs,
    text_col: str = "text",
    n_parts: int | None = None,
):
    """Kneser-Ney continuation statistics per word w: the continuation
    count N1+(·w) = |{l : c(l, w) > 0}| (how many DISTINCT left
    contexts precede w — the numerator of the KN lower-order
    distribution) plus w's total bigram count. The classic n-gram LM
    smoothing statistic (Kneser & Ney 1995).

    Physical plan: per-block pre-aggregated (left, w) pair counts,
    words co-located by a blake2b coarse hash partition (partitioning
    only — never a gated value), ONE vectorized kernel per partition
    computing distinct-left and total counts. All-integer."""
    import hashlib

    import ray

    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "l": pa.array([], pa.string()),
            "w": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "__part": pa.array([], pa.int64()),
        })
        values, tidx = _doc_tokens(batch, text_col)
        n = len(values)
        if n < 2:
            return empty
        same = pa.array(tidx[1:] == tidx[:-1])
        left = values.slice(0, n - 1).filter(same)
        right = values.slice(1, n - 1).filter(same)
        if len(left) == 0:
            return empty
        joined = pc.binary_join_element_wise(left, right, "\x00")
        codes, vocab = _ranked_codes(joined)
        uniq, cnt = np.unique(codes, return_counts=True)
        pairs = vocab[uniq]
        ls, ws = zip(*(p.split("\x00", 1) for p in pairs))
        part = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(
                        w.encode(), digest_size=8
                    ).digest(),
                    "little",
                )
                % n_parts
                for w in ws
            ],
            np.int64,
        )
        return pa.table({
            "l": pa.array(list(ls), pa.string()),
            "w": pa.array(list(ws), pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
            "__part": pa.array(part),
        })

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "w": pa.array([], pa.string()),
            "continuation": pa.array([], pa.int64()),
            "bigram_total": pa.array([], pa.int64()),
        })
        if "w" not in group.column_names or group.num_rows == 0:
            return empty
        wcodes, wvocab = _ranked_codes(
            group.column("w").combine_chunks()
            if isinstance(group.column("w"), pa.ChunkedArray)
            else group.column("w")
        )
        lcodes, _ = _ranked_codes(
            group.column("l").combine_chunks()
            if isinstance(group.column("l"), pa.ChunkedArray)
            else group.column("l")
        )
        cnt = np.asarray(group.column("cnt"), np.int64)
        order = np.lexsort((lcodes, wcodes))
        wc, lc, ct = wcodes[order], lcodes[order], cnt[order]
        # distinct (l, w) per w + total count per w.
        pair_first = np.r_[True, (wc[1:] != wc[:-1]) | (lc[1:] != lc[:-1])]
        w_first = np.r_[True, wc[1:] != wc[:-1]]
        starts = np.flatnonzero(w_first)
        contin = np.add.reduceat(pair_first.astype(np.int64), starts)
        total = np.add.reduceat(ct, starts)
        return pa.table({
            "w": pa.array(list(wvocab[wc[starts]]), pa.string()),
            "continuation": pa.array(contin),
            "bigram_total": pa.array(total),
        })

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )


FEATURE_HASH_DIM = 64
_FH_P = 2_147_483_647
_FH_MULT = 1_000_003


def feature_hashing_batch(
    batch: pa.Table,
    dim: int = FEATURE_HASH_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Hashing-trick bag-of-words vectorizer (Weinberger et al. 2009):
    sparse (doc, bucket, count) rows with
    bucket = polyhash(token) % dim — the fixed-dimension featurizer
    feeding linear models / MinHash-free dedup at corpus scale without
    a vocabulary build. The token hash is the SQL-reproducible
    character fold ``h = (h·1000003 + ord(c)) % (2³¹−1)``, computed
    once per BLOCK-VOCABULARY entry (not per occurrence).

    Embarrassingly parallel: docs never span blocks, so the sparse
    rows need no shuffle at all."""
    values, doc_idx = _doc_tokens(batch, text_col)
    ids = np.asarray(batch.column(id_col), np.int64)
    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int64()),
        "value": pa.array([], pa.int64()),
    })
    if len(values) == 0:
        return empty
    codes, vocab = _ranked_codes(values)

    def ph(t: str) -> int:
        h = 0
        for ch in t:
            h = (h * _FH_MULT + ord(ch)) % _FH_P
        return h

    vbucket = np.array([ph(t) % dim for t in vocab], np.int64)
    b = vbucket[codes]
    key = doc_idx * np.int64(dim) + b
    order = np.argsort(key, kind="stable")
    key = key[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    cnt = np.diff(np.r_[starts, key.size]).astype(np.int64)
    ks = key[starts]
    return pa.table({
        id_col: pa.array(ids[ks // dim]),
        "bucket": pa.array(ks % dim),
        "value": pa.array(cnt),
    })
