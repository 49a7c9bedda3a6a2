"""Approximate aggregates (sketches) — absent from the reference
(SURVEY §2.10: "no sketches/approximate aggregates") but essential for
100 TB training-data pipelines (cardinality of near-dup keys, vocab
sizes, user counts) where exact distinct means an all-to-all shuffle.

HyperLogLog (Flajolet et al. 2007): per-block partial REGISTER arrays
(a map_batches combiner — 2^p bytes per block regardless of input
size), merged by elementwise max. The whole reduction ships
O(blocks · 2^p) bytes instead of shuffling the keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data


def _hash64(values: list) -> np.ndarray:
    """64-bit blake2b of each value's string form (hashing is the one
    inherently per-row step; the digest loop is C)."""
    out = np.empty(len(values), np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8)
        out[i] = int.from_bytes(d.digest(), "little")
    return out


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of `rest` + 1, vectorized via log2.
    lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    rank = np.clip(lz + 1, 1, 64 - p + 1)
    regs = np.zeros(m, np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # small-range correction
    return float(e)


def approx_distinct(
    ds: "ray.data.Dataset", col: str, p: int = 12
) -> float:
    """HLL estimate of the number of distinct values in ``col``
    (standard error ≈ 1.04/√2^p ≈ 1.6% at p=12)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash64(batch.column(col).to_pylist())
        regs = _registers(h, p)
        return pa.table(
            {
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs, pa.int64()), 1 << p
                )
            }
        )

    merged = np.zeros(1 << p, np.int64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        col_arr = b.column("regs").combine_chunks()
        R = np.asarray(col_arr.flatten(), np.int64).reshape(-1, 1 << p)
        merged = np.maximum(merged, R.max(axis=0))
    return _estimate(merged, p)
