"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (the exact baseline). ≙ reference
  algorithms/cosine_similarity.hpp:116 generalized to batch top-k.
- ``ivf_topk``: IVF-style scale path — k-means coarse quantizer built on
  a sample, vectors bucketed by nearest centroid (hash-partition
  groupby), queries probe only ``nprobe`` nearest buckets.
- ``norm2`` ≙ algorithms/norm.hpp:76-88.

Scale notes: the query matrix is ``ray.put`` once (read zero-copy per
actor, never re-shipped per batch); per-batch partial top-k keeps only
k rows per (query, batch) so the final combine is tiny.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(batch_col) -> np.ndarray:
    """Vector column → (n, d) float64. Fixed-size-list columns reshape
    ZERO-COPY from the Arrow buffer; anything else (tensor extension,
    variable list, pandas objects) falls back to to_pylist."""
    col = batch_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        return np.asarray(col.flatten(), dtype=np.float64).reshape(-1, d)
    return np.array(col.to_pylist(), dtype=np.float64)


class _BruteTopK:
    def __init__(self, q_ref, k: int, id_col: str, vec_col: str) -> None:
        Q = ray.get(q_ref)  # (nq, d), already L2-normalized
        self.Q = Q
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col))
        if ids.size == 0:
            # Upstream filters (e.g. ivf probe pruning) legitimately
            # produce empty batches; argpartition/norm would raise.
            return pa.table(
                {"query": pa.array([], pa.int64()),
                 self.id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        V = _as_matrix(batch.column(self.vec_col))
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = Vn @ self.Q.T  # (nb, nq)
        k = min(self.k, ids.size)
        out_q, out_id, out_sim = [], [], []
        # Partial top-k per query within this batch.
        top = np.argpartition(-S, kth=k - 1, axis=0)[:k]
        for qi in range(self.Q.shape[0]):
            rows = top[:, qi]
            out_q.append(np.full(rows.size, qi, np.int64))
            out_id.append(ids[rows])
            out_sim.append(S[rows, qi])
        return pa.table(
            {
                "query": np.concatenate(out_q),
                self.id_col: np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def cosine_topk(
    emb: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact top-k by cosine for each query row; returns a small arrow
    table (query, id, cosine) sorted by (query, -cosine, id)."""
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(Qn)
    partials = emb.map_batches(
        _BruteTopK,
        fn_constructor_args=(qref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return _combine_topk(partials, k, id_col)


def _combine_topk(
    partials: "ray.data.Dataset", k: int, id_col: str
) -> pa.Table:
    """Final combine: partials are ≤ k rows per (query, block) — tiny."""
    heaps: dict[int, list] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        qs = np.asarray(b.column("query"))
        ids = np.asarray(b.column(id_col))
        sims = np.asarray(b.column("cosine"))
        for q, i, s in zip(qs, ids, sims):
            h = heaps.setdefault(int(q), [])
            item = (float(s), -int(i))
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    out_q, out_id, out_sim = [], [], []
    for q in sorted(heaps):
        for s, negi in sorted(heaps[q], reverse=True):
            out_q.append(q)
            out_id.append(-negi)
            out_sim.append(s)
    return pa.table(
        {
            "query": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_sim, pa.float64()),
        }
    )


def build_ivf(
    emb: "ray.data.Dataset",
    n_centroids: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist_path: str | None = None,
):
    """Coarse quantizer (mini k-means on a sample) + bucketed dataset.
    Returns (centroids, bucketed_ds with 'bucket' column).

    ``persist_path``: optionally write the bucketed vectors as
    hive-partitioned parquet on ``bucket`` — the storage layout that
    makes ``ivf_topk_from_store`` prune NON-PROBED BUCKETS AT THE READ
    (partition filter), not post-scan."""
    sample = emb.limit(sample_size).to_pandas()
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(X.shape[0], size=min(n_centroids, X.shape[0]),
                     replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(C.shape[0]):
            pts = X[a == c]
            if pts.size:
                C[c] = pts.mean(0)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        V = _as_matrix(batch.column(vec_col))
        d = ((V[:, None, :] - Cm[None, :, :]) ** 2).sum(-1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: pa.array(
                    V.tolist(), pa.list_(pa.float64(), V.shape[1])
                ),
                "bucket": pa.array(d.argmin(1).astype(np.int64)),
            }
        )

    bucketed = emb.map_batches(assign, batch_format="pyarrow")
    if persist_path is not None:
        bucketed.write_parquet(persist_path, partition_cols=["bucket"])
    return C, bucketed


class _IvfTopK:
    """ONE pass over the bucketed vectors serving ALL queries: each
    batch contributes partial top-k only to the queries probing that
    row's bucket (vectorized mask per query)."""

    def __init__(self, q_ref, probe_sets, k, id_col, vec_col) -> None:
        self.Q = ray.get(q_ref)  # (nq, d) L2-normalized
        self.probe = probe_sets  # list[np.ndarray] of bucket ids
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col))
        out_q, out_id, out_sim = [], [], []
        if ids.size:
            bk = np.asarray(batch.column("bucket"), np.int64)
            V = _as_matrix(batch.column(self.vec_col))
            Vn = V / np.maximum(
                np.linalg.norm(V, axis=1, keepdims=True), 1e-12
            )
            S = Vn @ self.Q.T  # (nb, nq)
            for qi in range(self.Q.shape[0]):
                sel = np.isin(bk, self.probe[qi])
                if not sel.any():
                    continue
                sims = S[sel, qi]
                sids = ids[sel]
                kk = min(self.k, sims.size)
                top = np.argpartition(-sims, kth=kk - 1)[:kk]
                out_q.append(np.full(kk, qi, np.int64))
                out_id.append(sids[top])
                out_sim.append(sims[top])
        if not out_q:
            return pa.table(
                {"query": pa.array([], pa.int64()),
                 self.id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query": np.concatenate(out_q),
                self.id_col: np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def ivf_topk(
    bucketed: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: ONE scan serves every query; each query ranks
    only rows of its ``nprobe`` nearest buckets. Per-batch partial
    top-k + tiny driver combine (same shape as ``cosine_topk``)."""
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe = [
        np.sort(np.argsort(d[qi])[:nprobe]) for qi in range(Q.shape[0])
    ]
    qref = ray.put(Qn)
    partials = bucketed.map_batches(
        _IvfTopK,
        fn_constructor_args=(qref, probe, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return _combine_topk(partials, k, id_col)


def ivf_topk_from_store(
    path: str,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF top-k over a hive-partitioned bucket store: the union of all
    queries' probed buckets becomes a PARTITION FILTER on read_parquet,
    so non-probed buckets never leave storage — prune at the read."""
    import glob

    import ray.data
    from ray.data.datasource.partitioning import Partitioning

    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe_union = sorted(
        {int(b) for qi in range(Q.shape[0])
         for b in np.argsort(d[qi])[:nprobe]}
    )
    # Partition-path pruning (Ray 2.49's parquet partition-filter
    # pushdown is broken, so enumerate the probed bucket directories —
    # non-probed buckets genuinely never leave storage).
    files = [
        f
        for b in probe_union
        for f in sorted(glob.glob(f"{path}/bucket={b}/*.parquet"))
    ]
    bucketed = ray.data.read_parquet(
        files, partitioning=Partitioning("hive", base_dir=path)
    )
    return ivf_topk(
        bucketed, centroids, Q, k=k, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )


def norm2(emb: "ray.data.Dataset", vec_col: str = "embedding") -> float:
    """Frobenius/2-norm over all embedding entries
    (≙ algorithms/norm.hpp:76-88: foldl of squares + sqrt)."""

    def sq(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch.column(vec_col))
        return pa.table({"ss": [float((V * V).sum())]})

    total = emb.map_batches(sq, batch_format="pyarrow").sum("ss")
    return float(np.sqrt(total or 0.0))


def quantize_embeddings(
    emb: "ray.data.Dataset",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> "ray.data.Dataset":
    """Symmetric per-vector int8-style quantization of an embedding
    column — the storage-reduction pass of a large-scale vector
    pipeline: ``scale = max|x|``, ``code = round_half_away(x/scale·Q)``
    with Q = 2^(bits−1) − 1, dequant error ``|code/Q·scale − x|``.

    Emits per-vector (scale, sum of codes, max abs error) — elementwise
    float64 expressions in one fixed op order, so the DuckDB twin
    computes bitwise-identical doubles (no iterative drift; the ROUND
    inputs are equal on both sides by construction). Zero vectors
    quantize to all-zero codes with scale 0.
    """
    from alp_ray.util import round_half_away

    q = float((1 << (bits - 1)) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch.column(vec_col))
        scale = np.abs(x).max(axis=1)
        safe = np.where(scale > 0, scale, 1.0)
        codes = round_half_away(x / safe[:, None] * q, 0)
        codes[scale == 0] = 0.0
        err = np.abs(codes / q * safe[:, None] - x).max(axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "scale": pa.array(round_half_away(scale, 6)),
                "sum_codes": pa.array(
                    codes.sum(axis=1).astype(np.int64)
                ),
                "max_err": pa.array(round_half_away(err, 6)),
            }
        )

    return emb.map_batches(fn, batch_format="pyarrow")


def pq_train(
    emb: "ray.data.Dataset",
    m_sub: int = 4,
    k: int = 16,
    sample_size: int = 512,
    iters: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks: split d dims into ``m_sub``
    subspaces, independent mini k-means per subspace over a BOUNDED
    sample (the same bounded-sample contract as build_ivf — at 100 TB
    the training set never exceeds ``sample_size`` vectors). Returns
    (m_sub, k, d_sub) float64 codebooks."""
    sample = emb.limit(sample_size).to_pandas()
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    d = X.shape[1]
    assert d % m_sub == 0, (d, m_sub)
    ds = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.empty((m_sub, k, ds))
    for s in range(m_sub):
        Xs = X[:, s * ds:(s + 1) * ds]
        C = Xs[rng.choice(Xs.shape[0], size=min(k, Xs.shape[0]),
                          replace=False)]
        for _ in range(iters):
            dist = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = dist.argmin(1)
            for c in range(C.shape[0]):
                pts = Xs[a == c]
                if pts.size:
                    C[c] = pts.mean(0)
        books[s] = C
    return books


def pq_encode(
    emb: "ray.data.Dataset",
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Encode every vector as m_sub uint8-style codes (argmin centroid
    per subspace) — the 8-32× storage-reduction pass; codebooks ride a
    single ray.put broadcast."""
    bref = ray.put(books)
    m_sub, k, ds = books.shape

    def enc(batch: pa.Table) -> pa.Table:
        Bm = ray.get(bref)
        V = _as_matrix(batch.column(vec_col))
        codes = np.empty((V.shape[0], m_sub), np.int64)
        for s in range(m_sub):
            Vs = V[:, s * ds:(s + 1) * ds]
            dist = ((Vs[:, None, :] - Bm[s][None, :, :]) ** 2).sum(-1)
            codes[:, s] = dist.argmin(1)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.int64()), m_sub
                ),
            }
        )

    return emb.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    codes_ds: "ray.data.Dataset",
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over PQ codes: one (m_sub × k)
    query-to-centroid distance table, then per-batch table LOOKUPS
    (never reconstructing vectors); per-block partial top-k combined
    driver-side (O(#blocks·k) rows, same as cosine_topk)."""
    m_sub, kc, ds = books.shape
    q = np.asarray(query, np.float64)
    table = np.empty((m_sub, kc))
    for s in range(m_sub):
        table[s] = (
            (books[s] - q[s * ds:(s + 1) * ds][None, :]) ** 2
        ).sum(-1)
    tref = ray.put(table)

    def part(batch: pa.Table) -> pa.Table:
        T = ray.get(tref)
        ids = np.asarray(batch.column(id_col), np.int64)
        C = np.asarray(
            batch.column("codes").combine_chunks().flatten(), np.int64
        ).reshape(ids.size, m_sub)
        dist = T[np.arange(m_sub)[None, :], C].sum(axis=1)
        # id tiebreaker: partial top-k independent of block splits.
        top = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top]),
                "dist": pa.array(dist[top]),
            }
        )

    parts = codes_ds.map_batches(part, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in parts], np.int64)
    dist = np.array([r["dist"] for r in parts])
    top = np.lexsort((ids, dist))[:k]
    return pa.table(
        {id_col: pa.array(ids[top]), "dist": pa.array(dist[top])}
    )
