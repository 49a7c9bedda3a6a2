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

import numpy as np
import pyarrow as pa

import ray
import ray.data
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
    once per actor; 31-bit operands keep every product inside int64 so
    the whole signature is one vectorized (shingles × perms) matmul-mod
    (no Python bignum path)."""

    P = (1 << 31) - 1

    def __init__(
        self,
        num_perm: int = 64,
        shingle_k: int = 5,
        id_col: str = "doc_id",
        text_col: str = "text",
        seed: int = 42,
    ) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.P, size=num_perm).astype(np.int64)
        self.b = rng.randint(0, self.P, size=num_perm).astype(np.int64)
        self.k = shingle_k
        self.num_perm = num_perm
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k) % self.P
        # (a*x + b) mod p per permutation, min over shingles; a,x < 2³¹
        # so a*x < 2⁶² fits int64 exactly.
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % self.P
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        sigs = [
            self.signature(t)
            for t in batch.column(self.text_col).to_pylist()
        ]
        return pa.table(
            {
                self.id_col: ids,
                "sig": pa.array(
                    [s.tolist() for s in sigs],
                    pa.list_(pa.int64(), self.num_perm),
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
    rows = num_perm // bands
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

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sig_arr = batch.column("sig").to_pylist()
        out_id, out_band, out_bucket, out_sig = [], [], [], []
        for i, sig in zip(ids, sig_arr):
            for b in range(bands):
                chunk = np.asarray(sig[b * rows : (b + 1) * rows], np.int64)
                hb = hashlib.blake2b(
                    b.to_bytes(2, "little") + chunk.tobytes(),
                    digest_size=8,
                ).digest()
                bucket = int.from_bytes(hb, "little") & 0x7FFFFFFFFFFFFFFF
                out_id.append(i)
                out_band.append(b)
                out_bucket.append(bucket)
                out_sig.append(sig)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.int64(), num_perm)),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col))
        if ids.size > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh: dropping oversized bucket (%d > %d docs)",
                ids.size, max_bucket,
            )
            ids = ids[:0]
        if ids.size < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        sigs_m = np.array(group.column("sig").to_pylist())
        order = np.argsort(ids)
        ids, sigs_m = ids[order], sigs_m[order]
        ia, ib = np.triu_indices(ids.size, 1)
        est = (sigs_m[ia] == sigs_m[ib]).mean(axis=1)
        return pa.table(
            {
                "id_a": ids[ia],
                "id_b": ids[ib],
                "est_jaccard": est,
            }
        )

    pairs = buckets.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pyarrow"
    )
    # A pair can collide in several bands — dedup on (id_a, id_b).
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Min("est_jaccard", alias_name="est_jaccard"))
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
    losers = pairs.map_batches(
        lambda b: pa.table({"loser": b.column("id_b")}),
        batch_format="pyarrow",
    ).groupby("loser").aggregate(Count(alias_name="c"))
    loser_set = set(
        r["loser"] for r in losers.select_columns(["loser"]).take_all()
    )
    loser_ref = ray.put(loser_set)

    def keep(batch: pa.Table) -> pa.Table:
        ls = ray.get(loser_ref)
        ids = np.asarray(batch.column(id_col))
        mask = ~np.isin(ids, np.fromiter(ls, np.int64, len(ls))) if ls else np.ones(ids.size, bool)
        return batch.filter(pa.array(mask))

    return docs.map_batches(keep, batch_format="pyarrow")


# -------------------------------------------------------------- simhash --


class SimHashStage:
    """64-bit SimHash over token blake2b hashes."""

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        hs = [
            self.simhash64(t)
            for t in batch.column(self.text_col).to_pylist()
        ]
        return pa.table(
            {
                self.id_col: ids,
                "simhash": pa.array(
                    np.array(hs, dtype=np.uint64).view(np.int64)
                ),
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
        ham = np.zeros(x.size, np.int64)
        for i, v in enumerate(x):
            ham[i] = bin(int(v)).count("1")
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


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    shingle_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **lsh_kwargs,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard for pairs surviving MinHash-LSH candidate
    generation — verification join grouped within buckets only."""
    cand = minhash_lsh_pairs(
        docs, shingle_k=shingle_k, id_col=id_col, text_col=text_col,
        **lsh_kwargs,
    ).filter(expr="est_jaccard >= 0.3")
    cand_rows = cand.take_all()
    if not cand_rows:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    need_ids = sorted(
        {r["id_a"] for r in cand_rows} | {r["id_b"] for r in cand_rows}
    )
    texts = {}
    id_arr = np.array(need_ids, np.int64)
    for b in docs.iter_batches(batch_format="pyarrow"):
        ids = np.asarray(b.column(id_col))
        hit = np.isin(ids, id_arr)
        for i, t in zip(ids[hit], np.asarray(b.column(text_col).to_pylist(), object)[hit]):
            texts[int(i)] = t
    out_a, out_b, out_j = [], [], []
    for r in cand_rows:
        sa = _shingles(texts[r["id_a"]], shingle_k)
        sb = _shingles(texts[r["id_b"]], shingle_k)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / max(union, 1)
        if j >= threshold:
            out_a.append(r["id_a"])
            out_b.append(r["id_b"])
            out_j.append(j)
    return ray.data.from_arrow(
        pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )
    )


# -------------------------------------------------- embedding near-dup --


def embedding_cosine_pairs(
    emb: "ray.data.Dataset",
    threshold: float = 0.95,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dims: int | None = None,
) -> "ray.data.Dataset":
    """Near-dup pairs by cosine ≥ threshold, bucketed by random-hyperplane
    LSH (sign pattern of `planes` projections); exact cosine verified
    within buckets. Multi-probe: each vector also lands in its 1-bit-flip
    neighbour buckets so near-misses across a hyperplane still collide."""
    if dims is None:
        first = emb.take(1)[0]
        dims = len(first[vec_col])
    rng = np.random.RandomState(seed)
    H = rng.randn(dims, planes)
    href = ray.put(H)

    def to_buckets(batch: pa.Table) -> pa.Table:
        Hm = ray.get(href)
        ids = np.asarray(batch.column(id_col))
        V = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        signs = (V @ Hm) > 0
        base = np.packbits(
            signs, axis=1, bitorder="little"
        ).astype(np.uint32)
        key = np.zeros(ids.size, np.int64)
        for b in range(base.shape[1]):
            key |= base[:, b].astype(np.int64) << (8 * b)
        out_ids = [ids]
        out_keys = [key]
        out_vecs = [V]
        for p in range(planes):  # multi-probe neighbours
            out_ids.append(ids)
            out_keys.append(key ^ (1 << p))
            out_vecs.append(V)
        return pa.table(
            {
                id_col: np.concatenate(out_ids),
                "bucket": np.concatenate(out_keys),
                vec_col: pa.array(
                    np.concatenate(out_vecs).tolist(),
                    pa.list_(pa.float64(), dims),
                ),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col))
        uniq, idx = np.unique(ids, return_index=True)
        if uniq.size < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        V = np.array(group.column(vec_col).to_pylist())[idx]
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.maximum(norms, 1e-12)
        S = Vn @ Vn.T
        ia, ib = np.triu_indices(uniq.size, 1)
        cos = S[ia, ib]
        keep = cos >= threshold
        return pa.table(
            {"id_a": uniq[ia][keep], "id_b": uniq[ib][keep],
             "cosine": cos[keep]}
        )

    pairs = (
        emb.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine")
    )
