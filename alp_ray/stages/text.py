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
    digit / uppercase / stopword ratios, and a composite score in [0,1]."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self._word = re.compile(r"[A-Za-z]+")
        self._stop = frozenset(_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        mean_wlen = np.zeros(n)
        punct = np.zeros(n)
        digit = np.zeros(n)
        upper = np.zeros(n)
        stop = np.zeros(n)
        for i, t in enumerate(texts):
            L = max(len(t), 1)
            n_chars[i] = len(t)
            words = self._word.findall(t)
            if words:
                mean_wlen[i] = sum(map(len, words)) / len(words)
                stop[i] = sum(
                    1 for w in words if w.lower() in self._stop
                ) / len(words)
            punct[i] = sum(1 for c in t if not c.isalnum() and not c.isspace()) / L
            digit[i] = sum(c.isdigit() for c in t) / L
            upper[i] = sum(c.isupper() for c in t) / L
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


class LangIdStage:
    """Character-trigram-profile language ID (heuristic n-gram scorer)."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self.profiles = {
            lang: frozenset(tris) for lang, tris in _LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs, confs = [], []
        for t in texts:
            tl = t.lower()
            tris = [tl[i : i + 3] for i in range(max(len(tl) - 2, 0))]
            if not tris:
                langs.append("und")
                confs.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles.items():
                hits = sum(1 for tr in tris if tr in prof)
                score = hits / len(tris)
                if score > best:
                    best_lang, best = lang, score
            langs.append(best_lang if best > 0.01 else "und")
            confs.append(best)
        return batch.append_column(
            "lang_pred", pa.array(langs, pa.string())
        ).append_column("lang_conf", pa.array(confs, pa.float64()))


class FingerprintStage:
    """64-bit document fingerprint via polynomial rolling hash of the
    whitespace-normalized text (deterministic, order-sensitive)."""

    BASE = 1000003
    MOD = (1 << 61) - 1

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        self._ws = re.compile(r"\s+")

    def _fp(self, t: str) -> int:
        h = 0
        for ch in self._ws.sub(" ", t.strip()):
            h = (h * self.BASE + ord(ch)) % self.MOD
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = np.fromiter(
            (self._fp(t) for t in texts), dtype=np.int64, count=len(texts)
        )
        return batch.append_column("fingerprint", pa.array(fps))
