"""Deduplication family over the documents table.

Five strategies, all expressed Ray-Data-first (map_batches feature
stages + groupby bucket shuffles — never a driver-side pairwise loop):

- exact:            md5(text) → hash-partition groupby → keep min doc_id.
- minhash_lsh:      shingle → minhash (k permutations) → band buckets →
                    groupby(band, bucket) → pairs → verified Jaccard.
- simhash:          64-bit simhash over token hashes; near-dup if
                    Hamming distance ≤ t (banded buckets, 4×16-bit).
- ngram_jaccard:    exact n-gram Jaccard over candidate pairs from LSH.
- embedding_cosine: near-dup by cosine ≥ τ over an embedding column,
                    bucketed by random-hyperplane LSH.

Each returns a "keep" table (survivors) and/or a duplicate-pairs table.
At 100 TB every stage stays streaming: buckets are the only shuffle keys,
and verification joins group only within buckets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from alp_ray.util import coarse_parts, join_partitions
from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------- exact --


def exact_dedup(
    docs: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Survivors = min id per exact text hash. ≙ DuckDB oracle:
    GROUP BY md5(text) → min(doc_id)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {id_col: batch.column(id_col), "h": pa.array(hs, pa.string())}
        )

    return (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name="keep_id"))
        .select_columns(["h", "keep_id"])
    )


def canonical_docs(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Canonical-representative selection: within every exact-text
    cluster keep the HIGHEST-QUALITY document (quality = word count
    here; ties → smallest id) instead of exact_dedup's blind min-id.
    The standard "best-of-cluster" hygiene step after dedup.

    Argmax rides ONE packed int64 key (nw·2³² + (2³²−1−id)) through a
    per-block partial max + the same single hash-keyed groupby
    exact_dedup uses — integer-exact, ROW_NUMBER twin."""
    from ray.data.aggregate import Max

    def add_key(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in text.to_pylist()
        ]
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nw = np.diff(np.asarray(toks.offsets, np.int64))
        ids = np.asarray(batch.column(id_col), np.int64)
        key = nw * (1 << 32) + ((1 << 32) - 1 - ids)
        t = pa.table({
            "h": pa.array(hs, pa.string()),
            "key": pa.array(key),
        })
        # Per-block per-hash partial max before the shuffle.
        return t.group_by("h").aggregate([("key", "max")]) \
            .rename_columns(["h", "key"])

    agg = (
        docs.map_batches(add_key, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Max("key", alias_name="key"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        if "key" not in batch.column_names or batch.num_rows == 0:
            return pa.table({
                "h": pa.array([], pa.string()),
                "canonical_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
            })
        k = np.asarray(batch.column("key"), np.int64)
        return pa.table({
            "h": batch.column("h"),
            "canonical_id": pa.array((1 << 32) - 1 - (k % (1 << 32))),
            "n_words": pa.array(k >> 32),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


# -------------------------------------------------------------- minhash --


_SHINGLE_P = (1 << 31) - 1


def _shingles(text: str, k: int) -> np.ndarray:
    """Unique k-gram fingerprints as a sorted int64 array — vectorized
    polynomial hash over the byte windows (sliding_window_view · powers
    mod 2³¹−1), no per-window digest calls."""
    t = " ".join(text.split()).lower()
    data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if data.size < k:
        h = hashlib.blake2b(t.encode(), digest_size=4).digest()
        return np.array(
            [int.from_bytes(h, "little") % _SHINGLE_P], dtype=np.int64
        )
    win = np.lib.stride_tricks.sliding_window_view(data, k)
    pows = np.power(257, np.arange(k), dtype=np.int64) % _SHINGLE_P
    vals = (win * pows[None, :]).sum(axis=1) % _SHINGLE_P
    return np.unique(vals)


class MinHashStage:
    """doc → (doc_id, minhash signature list). Permutations are the
    classic (a*x+b) mod p family over the Mersenne prime 2³¹−1, seeded
    once per actor; 31-bit operands keep every product inside int64.

    Vectorized across the WHOLE batch: texts are concatenated into one
    byte array, shingle keys for every window computed in one pass, and
    each permutation chunk reduces per-document with
    ``np.minimum.reduceat`` — no per-document Python in the hot path
    (the min over windows equals the min over unique shingles, so the
    per-doc ``np.unique`` of the naive form is unnecessary)."""

    P = (1 << 31) - 1

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        id_col: str = "doc_id",
        text_col: str = "text",
        seed: int = 42,
        perm_chunk: int = 16,
    ) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.P, size=num_perm).astype(np.int64)
        self.b = rng.randint(0, self.P, size=num_perm).astype(np.int64)
        self.k = shingle_k
        self.num_perm = num_perm
        self.id_col = id_col
        self.text_col = text_col
        self.perm_chunk = perm_chunk
        self.pows = (
            np.power(257, np.arange(self.k), dtype=np.int64) % _SHINGLE_P
        )

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k) % self.P
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % self.P
        return vals.min(axis=0)

    def _batch_signatures(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        encs = [" ".join(t.split()).lower().encode("utf-8") for t in texts]
        lens = np.array([len(e) for e in encs], np.int64)
        counts = np.maximum(lens - self.k + 1, 0)
        sig = np.empty((n, self.num_perm), np.int64)
        flat = (
            np.frombuffer(b"".join(encs), dtype=np.uint8).astype(np.int64)
            if n
            else np.empty(0, np.int64)
        )
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if n else []
        total = int(counts.sum())
        if total:
            win = np.lib.stride_tricks.sliding_window_view(flat, self.k)
            # Valid (non-boundary-crossing) window positions per doc.
            woff = np.concatenate([[0], np.cumsum(counts)])
            pos = (
                np.repeat(starts, counts)
                + np.arange(total)
                - np.repeat(woff[:-1], counts)
            )
            keys = ((win[pos] * self.pows[None, :]).sum(axis=1)
                    % _SHINGLE_P) % self.P
            red_idx = np.minimum(woff[:-1], total - 1)
            for c0 in range(0, self.num_perm, self.perm_chunk):
                a = self.a[c0 : c0 + self.perm_chunk]
                b = self.b[c0 : c0 + self.perm_chunk]
                hv = (keys[:, None] * a[None, :] + b[None, :]) % self.P
                sig[:, c0 : c0 + a.size] = np.minimum.reduceat(
                    hv, red_idx, axis=0
                )
        # Short docs (< k bytes): single blake2b fallback shingle —
        # identical to the naive path; also overwrites the garbage rows
        # reduceat produces for empty segments.
        for i in np.flatnonzero(counts == 0):
            sh = _shingles(texts[i], self.k) % self.P
            sig[i] = ((sh[:, None] * self.a + self.b) % self.P).min(0)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        sig = self._batch_signatures(texts)
        return pa.table(
            {
                self.id_col: ids,
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.ravel(), pa.int64()), self.num_perm
                ),
            }
        )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    max_bucket: int = 512,
) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs with estimated Jaccard (from full
    signature agreement), deduped across bands. rows_per_band =
    num_perm // bands; collision threshold ≈ (1/bands)^(1/rows).

    ``max_bucket``: buckets larger than this emit NO pairs (logged, not
    silent) — an oversized bucket is quadratic in pair count and at
    corpus scale is near-always degenerate content (empty/boilerplate
    shingle sets), which exact_dedup already collapses. ≙ the
    degree-based skew guard of SURVEY §7.8.
    """
    sigs = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm,
            shingle_k=shingle_k,
            id_col=id_col,
            text_col=text_col,
            seed=seed,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return _lsh_pairs_from_sigs(
        sigs, num_perm=num_perm, bands=bands, id_col=id_col,
        max_bucket=max_bucket,
    )


def _lsh_pairs_from_sigs(
    sigs: "ray.data.Dataset",
    num_perm: int,
    bands: int,
    id_col: str,
    max_bucket: int,
) -> "ray.data.Dataset":
    """Band-bucket + first-match-band pair emission shared by every
    signature family (seeded-permutation MinHash, polynomial MinHash):
    input rows are (id_col, sig fixed_size_list<int64>[num_perm])."""
    rows = num_perm // bands

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), np.int64)
        n = ids.size
        sig_col = batch.column("sig").combine_chunks()
        S = np.asarray(sig_col.flatten(), np.int64).reshape(n, num_perm)
        # Per-band bucket key: two Mersenne-31 polynomial folds of the
        # band's row chunk (band index as salt) packed into 62 bits —
        # fully vectorized (n × bands), replacing the per-(doc, band)
        # blake2b loop. Values < 2³¹ keep every product inside int64.
        M31 = (1 << 31) - 1
        buckets = np.empty((n, bands), np.int64)
        for b in range(bands):
            chunk = S[:, b * rows : (b + 1) * rows]
            h1 = np.full(n, b + 1, np.int64)
            h2 = np.full(n, 2 * b + 7, np.int64)
            for j in range(chunk.shape[1]):
                h1 = (h1 * 1000003 + chunk[:, j]) % M31
                h2 = (h2 * 999979 + chunk[:, j]) % M31
            buckets[:, b] = h1 | (h2 << 31)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n)
                ),
                "bucket": pa.array(buckets.ravel()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.repeat(S, bands, axis=0).ravel(), pa.int64()
                    ),
                    num_perm,
                ),
            }
        )

    # Coarse partitioning: co-locate whole buckets under ``part =
    # bucket % n_parts`` and process ALL of a partition's buckets in ONE
    # vectorized call — ~cluster-core group invocations instead of one per bucket
    # (Ray's per-group dispatch costs ~100 µs; corpora shed millions of
    # buckets). At cluster scale raise ``n_parts`` to ≈ total cores.
    n_parts = coarse_parts()
    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        part = np.asarray(batch.column("bucket")) % n_parts
        return batch.append_column("part", pa.array(part))

    tagged = buckets.map_batches(tag, batch_format="pyarrow")

    empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64())}
    )

    def emit_part(group: pa.Table) -> pa.Table:
        ids_all = np.asarray(group.column(id_col), np.int64)
        if ids_all.size == 0:
            return empty_pairs
        band_all = np.asarray(group.column("band"), np.int64)
        bucket_all = np.asarray(group.column("bucket"), np.int64)
        sig_col = group.column("sig").combine_chunks()
        S_all = np.asarray(sig_col.flatten(), np.int64).reshape(
            ids_all.size, num_perm
        )
        # Segment rows by (band, bucket); ids sorted within segments so
        # triu pairs come out ordered.
        order = np.lexsort((ids_all, bucket_all, band_all))
        ids_all = ids_all[order]
        band_all = band_all[order]
        bucket_all = bucket_all[order]
        S_all = S_all[order]
        new_seg = np.r_[
            True,
            (band_all[1:] != band_all[:-1])
            | (bucket_all[1:] != bucket_all[:-1]),
        ]
        seg_starts = np.flatnonzero(new_seg)
        seg_ends = np.r_[seg_starts[1:], ids_all.size]
        out_a, out_b, out_e = [], [], []
        for s, e in zip(seg_starts, seg_ends):
            sz = e - s
            if sz < 2:
                continue
            if sz > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "minhash_lsh: dropping oversized bucket "
                    "(%d > %d docs)", sz, max_bucket,
                )
                continue
            ids = ids_all[s:e]
            sigs_m = S_all[s:e]
            band = int(band_all[s])
            ia, ib = np.triu_indices(int(sz), 1)
            # FIRST-MATCH-BAND dedup (no global pair-dedup shuffle): a
            # colliding pair's band chunks are all available here, so
            # emit the pair only from the smallest band whose chunks
            # agree. Pairs sharing a bucket by pure 62-bit hash
            # collision (chunks unequal in every band) are dropped —
            # false candidates with ~2⁻⁶² probability each.
            eqb = (
                sigs_m[ia].reshape(-1, bands, rows)
                == sigs_m[ib].reshape(-1, bands, rows)
            ).all(axis=2)
            first = np.argmax(eqb, axis=1)
            keep = eqb.any(axis=1) & (first == band)
            if not keep.any():
                continue
            ia, ib = ia[keep], ib[keep]
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_e.append((sigs_m[ia] == sigs_m[ib]).mean(axis=1))
        if not out_a:
            return empty_pairs
        return pa.table(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "est_jaccard": np.concatenate(out_e),
            }
        )

    # Each qualifying pair is emitted exactly once across all bands, so
    # no (id_a, id_b) dedup aggregate is needed afterwards — that
    # shuffle was the dominant cost of the pipeline (Ray's shuffle
    # aggregate carries seconds of fixed overhead per run).
    return tagged.groupby("part").map_groups(
        emit_part, batch_format="pyarrow"
    )


_WS_RE = re.compile(r"\s+")


def _word_fingerprints(texts: list[str]):
    """Per-word polynomial fingerprints for a whole batch, vectorized
    by char POSITION (the FingerprintStage Horner law, mod M31):
    returns (F flat word hashes, doc_of_word). Normalization: strip +
    collapse whitespace + split(' ') — an empty doc yields one empty
    word with F = 0 (the SQL twins mirror all of this exactly)."""
    B, P = 1000003, (1 << 31) - 1
    words_per_doc = [_WS_RE.sub(" ", t.strip()).split(" ") for t in texts]
    wc = np.array([len(ws) for ws in words_per_doc], np.int64)
    flat_words = [w for ws in words_per_doc for w in ws]
    lens = np.array([len(w) for w in flat_words], np.int64)
    chars = (
        np.frombuffer(
            "".join(flat_words).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        if flat_words
        else np.empty(0, np.int64)
    )
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    F = np.zeros(len(flat_words), np.int64)
    for j in range(int(lens.max()) if lens.size else 0):
        active = lens > j
        F[active] = (F[active] * B + chars[starts[active] + j]) % P
    return F, np.repeat(np.arange(len(texts)), wc)


class MinHashPolyStage:
    """MinHash signatures from a FULLY SQL-EXPRESSIBLE hash family —
    unlike ``MinHashStage``'s seeded permutations, every value here is
    reproducible in DuckDB BIGINT arithmetic, so the LSH pair set gets
    a hash-exact oracle:

    - word fingerprint F(w): Horner ``h·B + codepoint (mod M31)``
      (the FingerprintStage law — twin: list_reduce over ord()),
    - shingle hash over word TRIPLES: ``((F₁·B + F₂)·B + F₃) mod M31``,
    - K permutations: ``hᵢ = (aᵢ·h₀ + bᵢ) mod M31``, aᵢ/bᵢ literal
      constants; signature i = min over the document's shingles.

    Documents with < 3 words have no shingles and emit NO signature
    (mirrored by the twin). Vectorized: one numpy step per char
    POSITION across all words of the batch, triple hashing by flat
    shifted slices, per-doc minima via ``np.minimum.reduceat``.
    Intermediates < 2⁵² stay exact in int64 (M31 · B < 2⁵¹)."""

    BASE = 1000003
    MOD = (1 << 31) - 1

    def __init__(
        self,
        num_perm: int = 8,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        self.num_perm = num_perm
        self.id_col = id_col
        self.text_col = text_col
        # Affine permutation constants — literal (no RNG), < 2²⁰ so
        # aᵢ·h₀ < 2⁵¹; the SQL twin carries the same VALUES table.
        self.a = np.array(
            [999983 - 2 * i for i in range(num_perm)], np.int64
        )
        self.b = np.array(
            [12289 * (i + 1) for i in range(num_perm)], np.int64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col), np.int64)
        texts = batch.column(self.text_col).to_pylist()
        empty = pa.table(
            {
                self.id_col: pa.array([], pa.int64()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.int64()), self.num_perm
                ),
            }
        )
        if not texts:
            return empty
        F, doc_of_word = _word_fingerprints(texts)
        # Word triples within each document (no doc-crossing triples).
        ok = np.zeros(F.size, bool)
        if F.size >= 3:
            ok[: F.size - 2] = (
                doc_of_word[: F.size - 2] == doc_of_word[2:]
            )
        ti = np.flatnonzero(ok)
        if ti.size == 0:
            return empty
        h0 = (
            (F[ti] * self.BASE + F[ti + 1]) % self.MOD * self.BASE
            + F[ti + 2]
        ) % self.MOD
        tdoc = doc_of_word[ti]
        seg = np.flatnonzero(np.r_[True, tdoc[1:] != tdoc[:-1]])
        docs_with = tdoc[seg]
        sig = np.empty((docs_with.size, self.num_perm), np.int64)
        for i in range(self.num_perm):
            hi = (self.a[i] * h0 + self.b[i]) % self.MOD
            sig[:, i] = np.minimum.reduceat(hi, seg)
        return pa.table(
            {
                self.id_col: pa.array(ids[docs_with]),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.ravel(), pa.int64()), self.num_perm
                ),
            }
        )


def minhash_poly_pairs(
    docs: "ray.data.Dataset",
    num_perm: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 512,
) -> "ray.data.Dataset":
    """MinHash-LSH near-duplicate pairs over the polynomial hash
    family — the SAME band-bucket + first-match-band physical plan as
    ``minhash_lsh_pairs`` (no pair-dedup shuffle, no all-pairs), but
    every signature value is DuckDB-reproducible, so the emitted pair
    set has a hash-exact SQL oracle: pair (a, b) appears iff some band
    agrees on all rows (pure 62-bit bucket collisions are filtered by
    the in-group chunk compare), with est_jaccard = exact dyadic
    agreeing-signature fraction."""
    sigs = docs.map_batches(
        MinHashPolyStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return _lsh_pairs_from_sigs(
        sigs, num_perm=num_perm, bands=bands, id_col=id_col,
        max_bucket=max_bucket,
    )


class SimHashPolyStage:
    """31-bit SimHash over the SQL-expressible word-fingerprint family
    (`_word_fingerprints`): bit j of the signature is the sign of
    Σ_words (2·((F(w)>>j)&1) − 1) — pure BIGINT arithmetic the DuckDB
    twin replays bit-for-bit. Vectorized: the (words × 31) bit matrix
    folds per document with np.add.reduceat."""

    BITS = 31

    def __init__(
        self, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col), np.int64)
        texts = batch.column(self.text_col).to_pylist()
        if not texts:
            return pa.table(
                {
                    self.id_col: pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                }
            )
        F, doc_of_word = _word_fingerprints(texts)
        bits = (
            (F[:, None] >> np.arange(self.BITS)[None, :]) & 1
        ) * 2 - 1
        seg = np.flatnonzero(
            np.r_[True, doc_of_word[1:] != doc_of_word[:-1]]
        )
        sums = np.add.reduceat(bits, seg, axis=0)
        sh = (
            (sums > 0).astype(np.int64)
            << np.arange(self.BITS, dtype=np.int64)[None, :]
        ).sum(axis=1, dtype=np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids[doc_of_word[seg]]),
                "simhash": pa.array(sh),
            }
        )


def simhash_poly_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Near-dup pairs (Hamming ≤ max_hamming) over the 31-bit
    polynomial SimHash — same pigeonhole banding as ``simhash_pairs``
    (4 bands of ≤8 bits: any pair within distance 3 shares ≥1 exact
    band) but with a HASH-EXACT brute-force DuckDB twin, since every
    signature is BIGINT-reproducible. First-match-band emission keeps
    the plan free of a pair-dedup shuffle."""
    sigs = docs.map_batches(
        SimHashPolyStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    n_parts = coarse_parts()

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col), np.int64)
        hs = np.asarray(batch.column("simhash"), np.int64)
        n = ids.size
        key = np.empty((n, 4), np.int64)
        for b in range(4):
            key[:, b] = (hs >> (8 * b)) & 0xFF
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "key": pa.array(key.ravel()),
                "simhash": pa.array(np.repeat(hs, 4)),
                "part": pa.array(
                    (key.ravel() * 4 + np.tile(np.arange(4), n))
                    % n_parts
                ),
            }
        )

    empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )

    def emit_part(group: pa.Table) -> pa.Table:
        if "band" not in group.column_names or group.num_rows == 0:
            return empty_pairs
        ids_all = np.asarray(group.column(id_col), np.int64)
        band_all = np.asarray(group.column("band"), np.int64)
        key_all = np.asarray(group.column("key"), np.int64)
        hs_all = np.asarray(group.column("simhash"), np.int64)
        order = np.lexsort((ids_all, key_all, band_all))
        ids_all, band_all = ids_all[order], band_all[order]
        key_all, hs_all = key_all[order], hs_all[order]
        new_seg = np.r_[
            True,
            (band_all[1:] != band_all[:-1]) | (key_all[1:] != key_all[:-1]),
        ]
        seg_starts = np.flatnonzero(new_seg)
        seg_ends = np.r_[seg_starts[1:], ids_all.size]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(seg_starts, seg_ends):
            if e - s < 2:
                continue
            ids = ids_all[s:e]
            hs = hs_all[s:e]
            band = int(band_all[s])
            ia, ib = np.triu_indices(int(e - s), 1)
            x = hs[ia] ^ hs[ib]
            ham = _popcount64(x.view(np.uint64))
            # First-match-band: emit only from the smallest band whose
            # 8-bit chunk agrees (chunk equality is derivable from the
            # pair's simhashes — all bands visible here).
            first = np.full(ia.size, 4, np.int64)
            for b in range(3, -1, -1):
                eq = ((x >> (8 * b)) & 0xFF) == 0
                first[eq] = b
            keep = (ham <= max_hamming) & (first == band)
            if not keep.any():
                continue
            out_a.append(ids[ia][keep])
            out_b.append(ids[ib][keep])
            out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return empty_pairs
        return pa.table(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    return (
        sigs.map_batches(to_bands, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_part, batch_format="pyarrow")
    )


def minhash_dedup_keep(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    **kwargs,
) -> "ray.data.Dataset":
    """Survivor ids: connected near-dup pairs keep the min id (union by
    min over the pair graph — one CC pass over the dup-pair edges)."""
    pairs = minhash_lsh_pairs(docs, **kwargs).filter(
        expr=f"est_jaccard >= {threshold}"
    )
    id_col = kwargs.get("id_col", "doc_id")
    # Losers = any id that appears as the larger member of a dup pair.
    # Survivor filter = ANTI-JOIN against the loser set (left_outer +
    # null test) — the loser table never lands on the driver, so the
    # filter scales with the dup count, not driver memory.
    losers = (
        pairs.map_batches(
            lambda b: pa.table({id_col: b.column("id_b")}),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .aggregate(Count(alias_name="__loser"))
        .materialize()
    )
    if losers.count() == 0:
        return docs
    joined = docs.join(
        losers,
        join_type="left_outer",
        num_partitions=join_partitions(losers.count()),
        on=(id_col,),
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_null(batch.column("__loser"))
        return batch.filter(mask).drop_columns(["__loser"])

    return joined.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------- transitive clustering --


def cc_dedup_keep(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "doc_id",
    P: int = 4,
) -> tuple["ray.data.Dataset", int]:
    """TRANSITIVE near-dup clustering: connected components over the
    verified dup-pair graph; every cluster keeps exactly ONE canonical
    document — its MAX id ("keep latest") — and docs in no pair are all
    kept. This is the union-find closure ``minhash_dedup_keep``'s
    pairwise loser rule approximates (pairs (1,3),(2,3) keep {1,2}
    there; one canonical doc, {3}, here).

    Ray-native shape (the corpus_components chain re-used on the pair
    graph): pairs → symmetric edges → ``dense_id_mapping_ds`` →
    ``remap_edges_dense`` → GraphShard engine max-label propagation
    (ref semantics: Pregel CC `pregel/connected_components.hpp`) →
    dense losers joined back to ids → anti-join against docs. Only the
    DUP-PAIR vertices ride the engine, so cost scales with the dup
    count, not the corpus; the anti-join is the only corpus-wide step.
    The dense mapping is sorted by id, so max-dense == max-id and the
    canonical choice survives the remap.

    Returns ``(kept_docs, applied_cc_iterations)`` — the iteration
    count lets hash-gated callers assert a constant for unrolled SQL
    twins (max-propagation is idempotent, so an SQL twin with more
    rounds is exact).
    """
    from alp_ray.pipelines.code_graph import (
        dense_id_mapping_ds,
        remap_edges_dense,
    )
    from alp_ray.pipelines.components import connected_components
    from alp_ray.state.engine import GraphEngine

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("id_a"), np.int64)
        b = np.asarray(batch.column("id_b"), np.int64)
        return pa.table(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow"
    ).materialize()
    # Empty pair set: an all-rows-filtered Dataset keeps its pre-map
    # schema on some blocks, which would break the mapping sort.
    if edges.count() == 0:
        return docs, 0
    mapping = dense_id_mapping_ds(edges).materialize()
    n = mapping.count()
    dense = remap_edges_dense(edges, mapping)
    engine = GraphEngine.from_dataset(dense, n=n, P=P, dedupe=True)
    res = connected_components(engine)

    def dense_losers(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("vertex"), np.int64)
        lbl = np.asarray(batch.column("label"), np.float64).astype(
            np.int64
        )
        return pa.table({"dense_id": v[lbl != v]})

    losers = (
        engine.state_dataset(["label"])
        .map_batches(dense_losers, batch_format="pyarrow")
        .join(
            mapping,
            join_type="inner",
            num_partitions=join_partitions(n),
            on=("dense_id",),
        )
        .materialize()
    )
    engine.shutdown()

    def to_marker(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column("vertex").cast(pa.int64()),
                "__loser": np.ones(batch.num_rows, np.int8),
            }
        )

    loser_ids = losers.map_batches(
        to_marker, batch_format="pyarrow"
    ).materialize()
    if loser_ids.count() == 0:
        return docs, res.iterations
    joined = docs.join(
        loser_ids,
        join_type="left_outer",
        num_partitions=join_partitions(loser_ids.count()),
        on=(id_col,),
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_null(batch.column("__loser"))
        return batch.filter(mask).drop_columns(["__loser"])

    return joined.map_batches(keep, batch_format="pyarrow"), res.iterations


# -------------------------------------------------------------- simhash --


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount via a byte LUT (portable across numpy 1.x)."""
    return (
        _POPCNT8[np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)]
        .sum(axis=1)
        .astype(np.int64)
    )


class SimHashStage:
    """64-bit SimHash over token blake2b hashes.

    Vectorized per batch: the batch's tokens are deduplicated, each
    UNIQUE token hashed once (vocabulary is much smaller than the token
    stream for natural text), then the ±1 bit accumulation is a single
    ``np.add.reduceat`` over the per-document token runs. Bit-for-bit
    identical to the naive per-token definition."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, np.int64)
        for tok in text.lower().split():
            digest = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            bits = np.unpackbits(
                np.frombuffer(digest, np.uint8), bitorder="little"
            )
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def _batch_simhash(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        toks = [t.lower().split() for t in texts]
        counts = np.array([len(x) for x in toks], np.int64)
        flat: list[str] = [w for doc in toks for w in doc]
        out = np.zeros(n, np.uint64)
        if flat:
            arr = np.array(flat, dtype=object)
            uniq, inv = np.unique(arr, return_inverse=True)
            signs = np.empty((uniq.size, 64), np.int64)
            for i, tok in enumerate(uniq):
                digest = hashlib.blake2b(
                    tok.encode(), digest_size=8
                ).digest()
                bits = np.unpackbits(
                    np.frombuffer(digest, np.uint8), bitorder="little"
                )
                signs[i] = bits.astype(np.int64) * 2 - 1
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            acc = np.add.reduceat(
                signs[inv], np.minimum(offs, len(flat) - 1), axis=0
            )
            acc[counts == 0] = 0
            hbits = (acc > 0).astype(np.uint8)
            out = np.packbits(hbits, axis=1, bitorder="little").view(
                np.uint64
            )[:, 0]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        hs = self._batch_simhash(texts)
        return pa.table(
            {
                self.id_col: ids,
                "simhash": pa.array(hs.view(np.int64)),
            }
        )


def simhash_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Banding: 4
    16-bit bands — any pair within distance 3 shares ≥1 exact band
    (pigeonhole), so buckets are exact-match groupbys."""
    sigs = docs.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        hs = np.asarray(batch.column("simhash")).view(np.uint64)
        out_id, out_band, out_key, out_h = [], [], [], []
        for b in range(4):
            key = (hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_band.append(np.full(ids.size, b, np.int32))
            out_key.append(key.astype(np.int64))
            out_h.append(hs.view(np.int64))
        return pa.table(
            {
                id_col: np.concatenate(out_id),
                "band": np.concatenate(out_band),
                "key": np.concatenate(out_key),
                "simhash": np.concatenate(out_h),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col))
        if ids.size < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        hs = np.asarray(group.column("simhash")).view(np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        ia, ib = np.triu_indices(ids.size, 1)
        x = hs[ia] ^ hs[ib]
        ham = _popcount64(x)
        keep = ham <= max_hamming
        return pa.table(
            {"id_a": ids[ia][keep], "id_b": ids[ib][keep],
             "hamming": ham[keep]}
        )

    pairs = (
        sigs.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(emit, batch_format="pyarrow")
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# ------------------------------------------------------- ngram jaccard --


def _batch_shingle_sets(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document UNIQUE shingle keys for a whole batch in one
    vectorized pass: ``(doc_idx, key)`` arrays, doc-major sorted.
    Identical per-document values to ``_shingles`` (same normalization,
    polynomial hash, and short-doc blake2b fallback)."""
    encs = [" ".join(t.split()).lower().encode("utf-8") for t in texts]
    lens = np.array([len(e) for e in encs], np.int64)
    counts = np.maximum(lens - k + 1, 0)
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(len(texts)), counts)
    if total:
        flat = np.frombuffer(b"".join(encs), np.uint8).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        woff = np.concatenate([[0], np.cumsum(counts)])
        pos = (
            np.repeat(starts, counts)
            + np.arange(total)
            - np.repeat(woff[:-1], counts)
        )
        win = np.lib.stride_tricks.sliding_window_view(flat, k)
        pows = np.power(257, np.arange(k), dtype=np.int64) % _SHINGLE_P
        keys = (win[pos] * pows[None, :]).sum(axis=1) % _SHINGLE_P
    else:
        keys = np.empty(0, np.int64)
    short = np.flatnonzero(counts == 0)
    if short.size:
        doc_of = np.concatenate([doc_of, short])
        keys = np.concatenate([
            keys,
            np.array(
                [int(_shingles(texts[i], k)[0]) for i in short],
                np.int64,
            ),
        ])
    order = np.lexsort((keys, doc_of))
    doc_of, keys = doc_of[order], keys[order]
    uniq = np.r_[
        True, (doc_of[1:] != doc_of[:-1]) | (keys[1:] != keys[:-1])
    ]
    return doc_of[uniq], keys[uniq]


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard for pairs surviving MinHash-LSH candidate
    generation. Verification is DISTRIBUTED: candidate pairs join their
    two texts back (two hash joins, materialized between per the Ray
    2.49 chained-join workaround) and a map_batches stage computes the
    exact shingle-set Jaccard per pair — the pair table and the corpus
    never land on the driver."""
    cand = minhash_lsh_pairs(
        docs, shingle_k=shingle_k, id_col=id_col, text_col=text_col,
        **lsh_kwargs,
    ).filter(expr="est_jaccard >= 0.3").materialize()
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    if cand.count() == 0:
        return ray.data.from_arrow(empty)
    texts = docs.select_columns([id_col, text_col])
    ta = texts.map_batches(
        lambda b: pa.table(
            {"id_a": b.column(id_col), "__text_a": b.column(text_col)}
        ),
        batch_format="pyarrow",
    )
    tb = texts.map_batches(
        lambda b: pa.table(
            {"id_b": b.column(id_col), "__text_b": b.column(text_col)}
        ),
        batch_format="pyarrow",
    )
    parts = join_partitions(cand.count())
    j1 = cand.join(
        ta, join_type="inner", num_partitions=parts, on=("id_a",)
    ).materialize()
    j2 = j1.join(tb, join_type="inner", num_partitions=parts, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = np.asarray(batch.column("id_a"), np.int64)
        b = np.asarray(batch.column("id_b"), np.int64)
        n = a.size
        # Batch-wide vectorized shingle sets (one rolling-hash pass per
        # side — the _batch_signatures concatenation idiom), then all
        # pair intersections at once: concat both sides' unique keys
        # tagged by pair, lexsort, count adjacent duplicates per pair.
        pa_idx, ka = _batch_shingle_sets(
            batch.column("__text_a").to_pylist(), shingle_k
        )
        pb_idx, kb = _batch_shingle_sets(
            batch.column("__text_b").to_pylist(), shingle_k
        )
        size_a = np.bincount(pa_idx, minlength=n)
        size_b = np.bincount(pb_idx, minlength=n)
        cp = np.concatenate([pa_idx, pb_idx])
        ck = np.concatenate([ka, kb])
        order = np.lexsort((ck, cp))
        cp, ck = cp[order], ck[order]
        dup = (cp[1:] == cp[:-1]) & (ck[1:] == ck[:-1])
        inter = np.bincount(cp[1:][dup], minlength=n)
        union = size_a + size_b - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        return pa.table(
            {"id_a": a[keep], "id_b": b[keep], "jaccard": jac[keep]}
        )

    return j2.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------- embedding near-dup --


def embedding_cosine_pairs(
    emb: "ray.data.Dataset",
    threshold: float = 0.95,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dims: int | None = None,
    max_bucket: int = 512,
) -> "ray.data.Dataset":
    """Near-dup pairs by cosine ≥ threshold, bucketed by random-hyperplane
    LSH (sign pattern of `planes` projections). Multi-probe: each vector
    also lands in its 1-bit-flip neighbour buckets so near-misses across
    a hyperplane still collide.

    Scale shape (same physical plan as ``minhash_lsh_pairs``): the
    ×(planes+1) multi-probe replication carries (id, bucket, base-key)
    ONLY — 24 bytes each, not the vectors; whole buckets are co-located
    under a coarse ``bucket % n_parts`` partition and processed in ONE
    vectorized map_groups call per partition (no per-bucket dispatch);
    multi-probe duplicates are resolved IN-KERNEL — a colliding pair's
    full co-occurring-bucket set is derivable from the two base keys
    (their XOR has popcount ≤ 2), so the pair is emitted only from its
    canonical (minimal) co-bucket and the global ``groupby(id_a, id_b)``
    dedup shuffle is gone. Buckets over ``max_bucket`` drop with a log
    line (≙ the MinHash skew guard); exact cosines come from joining the
    two vectors back to the candidate pair list — O(candidate pairs)
    vector traffic instead of O(n·planes)."""
    if dims is None:
        first = emb.take(1)[0]
        dims = len(first[vec_col])
    rng = np.random.RandomState(seed)
    H = rng.randn(dims, planes)
    href = ray.put(H)
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )

    n_parts = coarse_parts()

    def to_buckets(batch: pa.Table) -> pa.Table:
        Hm = ray.get(href)
        ids = np.asarray(batch.column(id_col))
        from alp_ray.pipelines.ann import _as_matrix

        V = _as_matrix(batch.column(vec_col))
        signs = (V @ Hm) > 0
        base = np.packbits(
            signs, axis=1, bitorder="little"
        ).astype(np.uint32)
        key = np.zeros(ids.size, np.int64)
        for b in range(base.shape[1]):
            key |= base[:, b].astype(np.int64) << (8 * b)
        out_ids = [ids]
        out_keys = [key]
        for p in range(planes):  # multi-probe neighbours, ids only
            out_ids.append(ids)
            out_keys.append(key ^ (1 << p))
        bucket = np.concatenate(out_keys)
        return pa.table(
            {
                id_col: np.concatenate(out_ids),
                "bucket": bucket,
                # base sign-key rides along so the kernel can derive a
                # pair's full co-occurring-bucket set (XOR popcount ≤ 2)
                # and dedup multi-probe collisions without a shuffle.
                "base": np.concatenate([key] * (planes + 1)),
                "part": bucket % n_parts,
            }
        )

    def _popcount(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(
            x.astype(np.uint64).view(np.uint8).reshape(x.size, 8), axis=1
        ).sum(axis=1, dtype=np.int64)

    empty_cand = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64())}
    )

    def emit_part(group: pa.Table) -> pa.Table:
        if "bucket" not in group.column_names or len(group) == 0:
            return empty_cand
        ids_all = np.asarray(group.column(id_col), np.int64)
        bucket_all = np.asarray(group.column("bucket"), np.int64)
        base_all = np.asarray(group.column("base"), np.int64)
        order = np.lexsort((ids_all, bucket_all))
        ids_all, bucket_all, base_all = (
            ids_all[order], bucket_all[order], base_all[order]
        )
        new_seg = np.r_[True, bucket_all[1:] != bucket_all[:-1]]
        seg_starts = np.flatnonzero(new_seg)
        seg_ends = np.r_[seg_starts[1:], ids_all.size]
        out_a, out_b = [], []
        for s, e in zip(seg_starts, seg_ends):
            sz = e - s
            if sz < 2:
                continue
            if sz > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "embedding_cosine: dropping oversized bucket "
                    "(%d > %d vectors)", sz, max_bucket,
                )
                continue
            ids = ids_all[s:e]
            base = base_all[s:e]
            K = int(bucket_all[s])
            ia, ib = np.triu_indices(int(sz), 1)
            ba, bb = base[ia], base[ib]
            xor = ba ^ bb
            pc = _popcount(xor)
            # Canonical co-bucket of the pair, derived from the base
            # keys alone (deterministic, partition-independent):
            #   pc=0 → both probes of the shared base bucket → base;
            #   pc=1 → co-buckets {base_a, base_b} → min;
            #   pc=2 → co-buckets {base_a^low, base_a^high} → min
            #          (base_b^low == base_a^high).
            low = xor & -xor
            canon = np.where(
                pc == 0,
                ba,
                np.where(
                    pc == 1,
                    np.minimum(ba, bb),
                    np.minimum(ba ^ low, bb ^ low),
                ),
            )
            keep = (pc <= 2) & (canon == K)
            if not keep.any():
                continue
            out_a.append(ids[ia[keep]])
            out_b.append(ids[ib[keep]])
        if not out_a:
            return empty_cand
        return pa.table(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # Each colliding pair is emitted exactly once (from its canonical
    # co-bucket), so no (id_a, id_b) dedup aggregate runs afterwards —
    # that shuffle carried seconds of fixed overhead per run.
    cand = (
        emb.select_columns([id_col, vec_col])
        .map_batches(to_buckets, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_part, batch_format="pyarrow")
        .materialize()
    )
    if cand.count() == 0:
        return ray.data.from_arrow(empty)
    vecs = emb.select_columns([id_col, vec_col])

    # map_batches projections (not rename_columns): robust to pandas-
    # backed blocks, always emit Arrow, and PACK the vector as a binary
    # blob — Ray 2.49's hash join rejects list-typed non-key fields, so
    # the float64 payload rides the shuffle as bytes and is viewed back
    # zero-copy in the verify stage.
    def _proj(id_name, vec_name):
        def fn(b: pa.Table) -> pa.Table:
            from alp_ray.pipelines.ann import _as_matrix

            V = _as_matrix(b.column(vec_col))
            return pa.table(
                {
                    id_name: b.column(id_col),
                    vec_name: pa.array(
                        [V[i].tobytes() for i in range(V.shape[0])],
                        pa.binary(),
                    ),
                }
            )

        return fn

    va = vecs.map_batches(_proj("id_a", "__va"), batch_format="pyarrow")
    vb = vecs.map_batches(_proj("id_b", "__vb"), batch_format="pyarrow")
    parts = join_partitions(cand.count())
    j1 = cand.join(
        va, join_type="inner", num_partitions=parts, on=("id_a",)
    ).materialize()
    j2 = j1.join(vb, join_type="inner", num_partitions=parts, on=("id_b",))

    def _bin_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
        """binary column of equal-width float64 blobs → (n, d) matrix,
        zero-copy off the Arrow data buffer when offsets are uniform
        (always true for freshly-built join output; per-row fallback
        otherwise)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.frombuffer(col.buffers()[1], np.int32)[
            col.offset : col.offset + len(col) + 1
        ]
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all():
            flat = np.frombuffer(col.buffers()[2], np.uint8)[
                offs[0] : offs[-1]
            ]
            return flat.view(np.float64).reshape(len(col), -1)
        return np.stack(
            [np.frombuffer(x, np.float64) for x in col.to_pylist()]
        )

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = np.asarray(batch.column("id_a"), np.int64)
        b = np.asarray(batch.column("id_b"), np.int64)
        Va = _bin_matrix(batch.column("__va"))
        Vb = _bin_matrix(batch.column("__vb"))
        na = np.maximum(np.linalg.norm(Va, axis=1), 1e-12)
        nb = np.maximum(np.linalg.norm(Vb, axis=1), 1e-12)
        cos = (Va * Vb).sum(axis=1) / (na * nb)
        keep = cos >= threshold
        return pa.table(
            {"id_a": a[keep], "id_b": b[keep], "cosine": cos[keep]}
        )

    return j2.map_batches(verify, batch_format="pyarrow")


# ----------------------------------------- paragraph-repetition removal --


PARA_LEN = 20          # tokens per paragraph chunk
_PARA_KEY_SHIFT = 20   # key = doc_id << shift | para_idx (para_idx < 2^20)


def _paragraph_partials(
    batch: pa.Table, id_col: str, text_col: str, para_len: int
) -> pa.Table:
    """Per-batch paragraph table: (para, key, chars) — one row per
    paragraph chunk of ``para_len`` tokens (last chunk may be shorter).
    Paragraph strings are built with ZERO per-row Python: the
    single-space token split's flat values are re-listed at paragraph
    boundaries (paragraphs tile the token stream exactly, so the list
    offsets are just every para_len-th token start) and joined with one
    ``pc.binary_join``. key packs (doc_id, para_idx) so a Min-aggregate
    finds the corpus-wide FIRST occurrence of each paragraph."""
    import pyarrow.compute as pc

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    doc_ids = np.asarray(batch.column(id_col), np.int64)
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    n_tok = np.diff(offs)
    n_para = -(-n_tok // para_len)          # ceil; empty docs → 0 paras
    total = int(n_para.sum())
    if total == 0:
        return pa.table({
            "para": pa.array([], pa.string()),
            "key": pa.array([], pa.int64()),
            "chars": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
        })
    cum = np.concatenate([[0], np.cumsum(n_para)[:-1]])
    para_idx = np.arange(total) - np.repeat(cum, n_para)
    starts = np.repeat(offs[:-1], n_para) + para_idx * para_len
    list_offs = np.concatenate([starts, offs[-1:]]).astype(np.int32)
    paras = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(list_offs), toks.values), " "
    )
    keys = (np.repeat(doc_ids, n_para) << _PARA_KEY_SHIFT) | para_idx
    return pa.table({
        "para": paras,
        "key": pa.array(keys),
        "chars": pc.cast(pc.utf8_length(paras), pa.int64()),
        id_col: pa.array(np.repeat(doc_ids, n_para)),
    })


def paragraph_dedup_stats(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    para_len: int = PARA_LEN,
) -> "ray.data.Dataset":
    """Cross-document paragraph-repetition removal (CCNet/Gopher-style):
    chunk every document into ``para_len``-token paragraphs, keep only
    the corpus-wide FIRST occurrence (min (doc_id, para_idx)) of each
    distinct paragraph string, and report per-document
    (n_paras, n_kept, kept_chars).

    Shuffle plan (scale path): per-batch vectorized paragraph emission →
    ONE paragraph-keyed groupby Min(key) (the only wide exchange, keyed
    by paragraph text ≙ hash partitioning on content) → per-batch
    re-keying of winners to their doc → ONE doc-keyed groupby Sum.
    No joins, no driver materialization; paragraph count ≈ tokens/20 so
    the exchange is ~5% of corpus token volume."""
    from ray.data.aggregate import Sum

    paras = docs.map_batches(
        lambda b: _paragraph_partials(b, id_col, text_col, para_len),
        batch_format="pyarrow",
    ).materialize()

    def totals(batch: pa.Table) -> pa.Table:
        # Per-doc paragraph counts ride the same partials (docs never
        # split across batches, so per-batch value_counts sum exactly).
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column(id_col))
        return pa.table({
            id_col: vc.field("values"),
            "n_paras": pc.cast(vc.field("counts"), pa.int64()),
            "n_kept": pa.array(np.zeros(len(vc), np.int64)),
            "kept_chars": pa.array(np.zeros(len(vc), np.int64)),
        })

    totals_ds = paras.map_batches(totals, batch_format="pyarrow")

    winners = (
        paras.groupby("para")
        .aggregate(Min("key", alias_name="mk"), Min("chars",
                                                    alias_name="chars_m"))
    )

    def rekey(batch: pa.Table) -> pa.Table:
        if "mk" not in batch.column_names or len(batch) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_paras": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "kept_chars": pa.array([], pa.int64()),
            })
        mk = np.asarray(batch.column("mk"), np.int64)
        chars = np.asarray(batch.column("chars_m"), np.int64)
        return pa.table({
            id_col: pa.array(mk >> _PARA_KEY_SHIFT),
            "n_paras": pa.array(np.zeros(mk.size, np.int64)),
            "n_kept": pa.array(np.ones(mk.size, np.int64)),
            "kept_chars": pa.array(chars),
        })

    kept_ds = winners.map_batches(rekey, batch_format="pyarrow")

    agg = (
        totals_ds.union(kept_ds)
        .groupby(id_col)
        .aggregate(Sum("n_paras", alias_name="n_paras"),
                   Sum("n_kept", alias_name="n_kept"),
                   Sum("kept_chars", alias_name="kept_chars"))
    )
    return agg


# ------------------------------------------------------ decontamination --


def benchmark_ngrams(
    docs: "ray.data.Dataset",
    bench_pred,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[str]:
    """Collect the DISTINCT token n-grams of the (small) benchmark
    subset — the broadcast side of decontamination. ``bench_pred`` is a
    pyarrow-compute predicate over the id column. The result is
    driver-held by design: benchmark suites are tiny (thousands of
    docs) next to the corpus."""
    import pyarrow.compute as pc

    sub = docs.map_batches(
        lambda b: b.filter(bench_pred(b)), batch_format="pyarrow"
    )
    grams: set[str] = set()
    for batch in sub.iter_batches(batch_format="pyarrow"):
        t = _token_ngrams(pa.table(batch), n, id_col, text_col)
        grams.update(t.column("gram").to_pylist())
    return sorted(grams)


def _token_ngrams(
    batch: pa.Table, n: int, id_col: str, text_col: str
) -> pa.Table:
    """All sliding token n-grams of a batch: (doc_id, gram) —
    ``n`` shifted zero-copy slices of the flat token values joined
    element-wise; windows crossing a document boundary are masked out."""
    import pyarrow.compute as pc

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    doc_ids = np.asarray(batch.column(id_col), np.int64)
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    counts = np.diff(offs)
    values = toks.values
    total = len(values)
    if total < n:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
        })
    doc_of_tok = np.repeat(np.arange(counts.size), counts)
    shifted = [values.slice(k, total - n + 1) for k in range(n)]
    args = list(shifted) + [" "]
    grams = pc.binary_join_element_wise(*args)
    valid = doc_of_tok[n - 1:] == doc_of_tok[: total - n + 1]
    return pa.table({
        id_col: pa.array(doc_ids[doc_of_tok[: total - n + 1][valid]]),
        "gram": pc.filter(grams, pa.array(valid)),
    })


class DecontaminateStage:
    """Flag corpus documents sharing any token n-gram with a broadcast
    benchmark gram set (training-data decontamination). The gram set
    rides ``ray.put`` ONCE and is read per actor in ``__init__`` —
    never re-shipped per batch. Per batch: one n-way element-wise join
    builds all sliding grams, one ``pc.is_in`` tests membership, one
    ``reduceat`` counts hits per document."""

    def __init__(self, grams_ref, n: int = 13,
                 id_col: str = "doc_id", text_col: str = "text") -> None:
        self.gram_set = pa.array(ray.get(grams_ref), pa.string())
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _token_ngrams(batch, self.n, self.id_col, self.text_col)
        if len(t) == 0:
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                "n_contaminated": pa.array([], pa.int64()),
            })
        hit = pc.is_in(t.column("gram"), value_set=self.gram_set)
        ids = np.asarray(t.column(self.id_col), np.int64)
        hits = np.asarray(hit, bool).astype(np.int64)
        # Per-doc segment sum (grams are emitted doc-major).
        b = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.flatnonzero(b)
        seg = np.add.reduceat(hits, starts)
        doc = ids[starts]
        nz = seg > 0
        return pa.table({
            self.id_col: pa.array(doc[nz]),
            "n_contaminated": pa.array(seg[nz]),
        })


def decontaminate(
    docs: "ray.data.Dataset",
    grams: list[str],
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document contaminated-window counts vs a broadcast benchmark
    gram set (docs with zero hits are dropped)."""
    ref = ray.put(grams)
    return docs.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={
            "grams_ref": ref, "n": n,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ------------------------------------------------- exact substring spans --

_SPAN_BASE = 0x9E3779B97F4A7C15  # odd ⇒ invertible mod 2^64


def _span_partials(
    batch: pa.Table, k: int, n_parts: int, id_col: str, text_col: str
) -> pa.Table:
    """Per-batch (h, doc_id, part) rows: one per DISTINCT k-token window
    per document. Window identity is a polynomial combine (base
    ``_SPAN_BASE``, mod 2^64) of per-token blake2b hashes — injective up
    to hash collisions on the token SEQUENCE, and token sequences map
    1:1 to space-joined window strings, so grouping by ``h`` equals
    grouping by the window text (the SQL-twin contract). blake2b runs
    once per UNIQUE token in the batch; everything else is NumPy."""
    import pyarrow.compute as pc

    empty = pa.table({
        "h": pa.array([], pa.int64()),
        id_col: pa.array([], pa.int64()),
        "part": pa.array([], pa.int64()),
    })
    if len(batch) == 0:
        return empty
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    doc_ids = np.asarray(batch.column(id_col), np.int64)
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    n_tok = np.diff(offs)
    n_win = np.maximum(n_tok - (k - 1), 0)
    total = int(n_win.sum())
    if total == 0:
        return empty
    words = np.array(toks.values.to_pylist(), dtype=object)
    uniq, inv = np.unique(words, return_inverse=True)
    th = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8).digest(),
                "little",
            )
            for w in uniq
        ),
        dtype=np.uint64,
        count=uniq.size,
    )[inv]
    cum = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    win_idx = np.arange(total) - np.repeat(cum, n_win)
    starts = np.repeat(offs[:-1], n_win) + win_idx
    wh = np.zeros(total, np.uint64)
    mult = 1
    with np.errstate(over="ignore"):
        for j in range(k):
            wh += th[starts + j] * np.uint64(mult)
            mult = (mult * _SPAN_BASE) & 0xFFFFFFFFFFFFFFFF
    wdoc = np.repeat(doc_ids, n_win)
    # Distinct (doc, window) — exact globally because a document is one
    # row and rows never split across batches.
    order = np.lexsort((wh, wdoc))
    wh, wdoc = wh[order], wdoc[order]
    keep = np.ones(total, bool)
    keep[1:] = (wh[1:] != wh[:-1]) | (wdoc[1:] != wdoc[:-1])
    wh, wdoc = wh[keep], wdoc[keep]
    return pa.table({
        "h": pa.array(wh.view(np.int64)),
        id_col: pa.array(wdoc),
        "part": pa.array((wh % np.uint64(n_parts)).astype(np.int64)),
    })


def dup_span_stats(
    docs: "ray.data.Dataset",
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Exact substring-span deduplication statistics (the Lee et al.
    2022 "Deduplicating Training Data" primitive): for every document,
    count its DISTINCT k-token windows that also occur in at least one
    OTHER document. Returns (doc_id, dup_windows) for docs with ≥1 hit.

    Shuffle plan: per-batch vectorized window hashing (≈ tokens/1
    windows, but only DISTINCT (doc, window) pairs leave the batch) →
    ONE coarse hash-partitioned ``map_groups`` that counts docs per
    window and attributes shared windows back to docs (vectorized
    bincount — no per-window dispatch) → one doc-keyed groupby Sum.
    No joins, no driver materialization; skew-free because window
    hashes are uniform."""
    from ray.data.aggregate import Sum

    n_parts = coarse_parts()
    pairs = docs.map_batches(
        lambda b: _span_partials(b, k, n_parts, id_col, text_col),
        batch_format="pyarrow",
    )

    def per_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "dup_windows": pa.array([], pa.int64()),
        })
        if "h" not in tbl.column_names or tbl.num_rows == 0:
            return empty
        h = np.asarray(tbl.column("h"), np.int64)
        d = np.asarray(tbl.column(id_col), np.int64)
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        new = np.ones(h.size, bool)
        new[1:] = h[1:] != h[:-1]
        seg = np.cumsum(new) - 1
        dup = np.bincount(seg)[seg] >= 2  # rows per h == docs per h
        if not dup.any():
            return empty
        ud, cnt = np.unique(d[dup], return_counts=True)
        return pa.table({
            id_col: pa.array(ud),
            "dup_windows": pa.array(cnt.astype(np.int64)),
        })

    partials = pairs.groupby("part").map_groups(
        per_part, batch_format="pyarrow"
    )
    return partials.groupby(id_col).aggregate(
        Sum("dup_windows", alias_name="dup_windows")
    )
