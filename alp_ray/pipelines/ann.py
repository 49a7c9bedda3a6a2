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
    return np.array(batch_col.to_pylist(), dtype=np.float64)


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
    # Final combine: partials are ≤ k rows per (query, block) — tiny.
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
):
    """Coarse quantizer (mini k-means on a sample) + bucketed dataset.
    Returns (centroids, bucketed_ds with 'bucket' column)."""
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
        return batch.append_column(
            "bucket", pa.array(d.argmin(1).astype(np.int64))
        )

    return C, emb.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    bucketed: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k probing only the nprobe nearest buckets per
    query (prune at the read: non-probed buckets never leave storage)."""
    Q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    d = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe = np.argsort(d, axis=1)[:, :nprobe]
    tables = []
    for qi in range(Q.shape[0]):
        buckets = [int(b) for b in probe[qi]]

        def probe_filter(batch: pa.Table, buckets=tuple(buckets)) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(
                batch.column("bucket"),
                value_set=pa.array(buckets, pa.int64()),
            )
            return batch.filter(mask)

        sub = bucketed.map_batches(probe_filter, batch_format="pyarrow")
        t = cosine_topk(sub, Q[qi : qi + 1], k=k, id_col=id_col,
                        vec_col=vec_col)
        t = t.set_column(
            0, "query", pa.array(np.full(t.num_rows, qi, np.int64))
        )
        tables.append(t)
    return pa.concat_tables(tables)


def norm2(emb: "ray.data.Dataset", vec_col: str = "embedding") -> float:
    """Frobenius/2-norm over all embedding entries
    (≙ algorithms/norm.hpp:76-88: foldl of squares + sqrt)."""

    def sq(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch.column(vec_col))
        return pa.table({"ss": [float((V * V).sum())]})

    total = emb.map_batches(sq, batch_format="pyarrow").sum("ss")
    return float(np.sqrt(total or 0.0))
