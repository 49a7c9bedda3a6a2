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
            # Valid windows: those not crossing a document boundary.
            tri_starts = starts[:, None]  # per doc
            idx = [
                keys_all[s : s + c]
                for s, c in zip(starts, n_tris)
            ]
            keys = np.concatenate(idx) if idx else np.empty(0, np.int64)
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
