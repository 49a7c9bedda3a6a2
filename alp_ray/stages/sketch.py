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


def heavy_hitters(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    k: int = 20,
    counters: int = 2048,
) -> pa.Table:
    """EXACT top-k most frequent whitespace tokens without a token
    shuffle — the Misra-Gries candidate pass + exact verify pass
    (mergeable-summaries construction, Agarwal et al., PODS 2012).

    Pass 1 (one map_batches): per-block exact token counts compressed
    to a Misra-Gries summary of ``counters`` entries (keep top-m,
    subtract the (m+1)-th count). The driver multi-way-merges the block
    summaries (sum per token, keep top-m, subtract the (m+1)-th) —
    total undercount error ≤ n/(m+1), so every token with true count
    > n/(m+1) is in the merged candidate set. Pass 2 (one
    map_batches): exact counts of the ≤ m broadcast candidates,
    summed driver-side. The result is PROVABLY exact top-k iff the
    exact k-th candidate count exceeds n/(m+1) — asserted, so a
    too-small ``counters`` fails loudly instead of silently
    approximating. Ties broken (count DESC, token ASC) to match the
    SQL ``ORDER BY cnt DESC, tok LIMIT k`` twin.

    A tree-merge level between pass 1 and the driver (one map_batches
    folding ~64 block summaries per task) bounds the driver's input to
    O(#blocks/64 · m) rows; MG summaries are mergeable under
    sum-then-compress, and the pass-2 exactness assert holds
    regardless of merge topology.
    """
    import pyarrow.compute as pc

    import ray

    def _tokens(batch: pa.Table) -> np.ndarray:
        split = pc.split_pattern_regex(
            batch.column(text_col), pattern=r"\s+"
        )
        flat = pc.list_flatten(split)
        toks = np.asarray(flat.to_numpy(zero_copy_only=False))
        return toks[toks != ""]

    def pass1(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch)
        uniq, cnt = np.unique(toks, return_counts=True)
        n_block = int(cnt.sum())
        if uniq.size > counters:
            order = np.lexsort((uniq, -cnt))
            uniq, cnt = uniq[order], cnt[order]
            sub = int(cnt[counters])
            uniq, cnt = uniq[:counters], cnt[:counters] - sub
            keep = cnt > 0
            uniq, cnt = uniq[keep], cnt[keep]
        # n_block rides an UNCONDITIONAL sentinel row (tok="", cnt=0 —
        # real tokens are never empty) so the total token count
        # survives even when compression empties the summary (top
        # counters+1 counts all equal); riding row 0 of the summary
        # dropped it in that case and silently shrank the exactness
        # bound n_total/(counters+1).
        return pa.table(
            {
                "tok": pa.array([""] + uniq.tolist(), pa.string()),
                "cnt": pa.array(
                    np.r_[0, cnt].astype(np.int64)
                ),
                "n_block": pa.array(
                    np.r_[n_block, np.zeros(uniq.size, np.int64)]
                ),
            }
        )

    def _mg_compress(uniq: np.ndarray, cnt: np.ndarray):
        if uniq.size > counters:
            order = np.lexsort((uniq, -cnt))
            uniq, cnt = uniq[order], cnt[order]
            sub = int(cnt[counters])
            uniq, cnt = uniq[:counters], cnt[:counters] - sub
            keep = cnt > 0
            uniq, cnt = uniq[keep], cnt[keep]
        return uniq, cnt

    def mg_merge(batch: pa.Table) -> pa.Table:
        """Tree-merge level: fold many block summaries into one MG
        summary (sum per token, compress to ``counters``)."""
        if "tok" not in batch.column_names or len(batch) == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "n_block": pa.array([], pa.int64()),
                }
            )
        toks = np.asarray(batch.column("tok"))
        cnts = np.asarray(batch.column("cnt"), np.int64)
        nb = int(np.asarray(batch.column("n_block"), np.int64).sum())
        real = toks != ""  # drop incoming sentinel rows before merging
        uniq, inv = np.unique(toks[real], return_inverse=True)
        cnt = np.bincount(
            inv, weights=cnts[real], minlength=uniq.size
        ).astype(np.int64)
        uniq, cnt = _mg_compress(uniq, cnt)
        # Sentinel row carries the folded token count unconditionally
        # (an emptied summary must not drop it).
        return pa.table(
            {
                "tok": pa.array([""] + uniq.tolist(), pa.string()),
                "cnt": pa.array(np.r_[0, cnt].astype(np.int64)),
                "n_block": pa.array(
                    np.r_[nb, np.zeros(uniq.size, np.int64)]
                ),
            }
        )

    from alp_ray.util import concat_blocks

    p1 = (
        ds.select_columns([text_col])
        .map_batches(pass1, batch_format="pyarrow")
        .map_batches(
            mg_merge, batch_size=counters * 64, batch_format="pyarrow"
        )
    )
    t1 = concat_blocks(
        p1,
        columns={
            "tok": pa.string(), "cnt": pa.int64(), "n_block": pa.int64()
        },
    )
    toks = np.asarray(t1.column("tok"))
    cnts = np.asarray(t1.column("cnt"), np.int64)
    n_total = int(
        np.asarray(t1.column("n_block"), np.int64).sum()
    )
    real = toks != ""  # sentinel count-carrier rows are not tokens
    toks, cnts = toks[real], cnts[real]
    if toks.size:
        uniq, inv = np.unique(toks, return_inverse=True)
        merged_cnt = np.bincount(
            inv, weights=cnts, minlength=uniq.size
        ).astype(np.int64)
        cand, _ = _mg_compress(uniq, merged_cnt)
    else:
        cand = np.array([], dtype=object)
    cref = ray.put(np.sort(cand))

    def pass2(batch: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        toks = _tokens(batch)
        pos = np.searchsorted(cs, toks)
        ok = (pos < cs.size) & (cs[np.clip(pos, 0, cs.size - 1)] == toks)
        cnt = np.bincount(pos[ok], minlength=cs.size)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "tok": pa.array(cs[nz].tolist(), pa.string()),
                "cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    p2 = (
        ds.select_columns([text_col])
        .map_batches(pass2, batch_format="pyarrow")
        .take_all()
    )
    exact: dict[str, int] = {}
    for r in p2:
        exact[r["tok"]] = exact.get(r["tok"], 0) + int(r["cnt"])
    top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:k]
    bound = n_total / (counters + 1)
    assert top and top[-1][1] > bound, (
        f"heavy_hitters not provably exact: k-th count {top[-1][1] if top else 0} "
        f"<= error bound {bound:.1f} — raise counters"
    )
    return pa.table(
        {
            "tok": pa.array([t for t, _ in top], pa.string()),
            "cnt": pa.array([c for _, c in top], pa.int64()),
        }
    )


def approx_distinct_poly(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    p: int = 6,
    sparse_threshold: int | None = None,
) -> tuple[dict, float]:
    """HyperLogLog++ over the SQL-EXPRESSIBLE polynomial fingerprint of
    the whitespace-normalized text (FingerprintStage law, 31-bit):
    register index = low p bits, rank = 1 + leading-zero count of the
    remaining 31−p bits (pure BIGINT arithmetic — the DuckDB twin
    replays the state bit-for-bit). Returns the integer sketch STATE
    summary — the gate-comparable object — plus the float estimate
    (tested by tolerance in pytest, not hashed: the dense small-range
    branch takes a libm log).

    SPARSE MODE (the HLL++ refinement, Heule et al. 2013): while the
    total distinct-fingerprint count is ≤ ``sparse_threshold``
    (default 4·m) the sketch keeps the exact sorted fingerprint set —
    the estimate is EXACT and the state is
    {mode: "sparse", m, n_exact, checksum-over-sorted-fps}. Promotion
    to dense registers is a pure function of the fingerprint SET (a
    block whose local distinct count overflows promotes early, but
    local > thr ⇒ global > thr, so the merged mode is
    partition-independent — the hash-gate invariant). Dense state keeps
    the round-4 fields (m, sum_reg, zero_reg, register checksum) plus
    mode: "dense".

    Same distribution contract as ``approx_distinct``: per-block
    partials bounded by max(thr, 2^p) ints, union/max merge."""
    from alp_ray.stages.text import FingerprintStage

    m = 1 << p
    w = 31 - p
    mask = m - 1
    thr = 4 * m if sparse_threshold is None else sparse_threshold
    M31 = (1 << 31) - 1

    def _ranks(fv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = fv & mask
        v = fv >> p
        bl = np.zeros(v.size, np.int64)
        for k in range(w):
            bl[v >= (1 << k)] = k + 1
        return idx, (w + 1) - bl  # v == 0 -> rank w+1

    def partial(batch: pa.Table) -> pa.Table:
        fv = np.unique(np.asarray(batch.column("fingerprint"), np.int64))
        if fv.size <= thr:
            # sparse partial: the exact sorted fingerprint set
            return pa.table(
                {
                    "kind": pa.array(np.zeros(fv.size, np.int64)),
                    "idx": pa.array(np.full(fv.size, -1, np.int64)),
                    "val": pa.array(fv),
                }
            )
        idx, rank = _ranks(fv)
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, idx, rank)
        return pa.table(
            {
                "kind": pa.array(np.ones(m, np.int64)),
                "idx": pa.array(np.arange(m)),
                "val": pa.array(regs),
            }
        )

    parts = (
        ds.map_batches(
            FingerprintStage, fn_constructor_args=(text_col,),
            batch_format="pyarrow", concurrency=(1, 8),
        )
        .select_columns(["fingerprint"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    fps: list[int] = []
    regs = np.zeros(m, np.int64)
    any_dense = False
    for r in parts:
        if r["kind"] == 0:
            fps.append(r["val"])
        else:
            any_dense = True
            regs[r["idx"]] = max(regs[r["idx"]], r["val"])
    fp_set = np.unique(np.asarray(fps, np.int64))
    if not any_dense and fp_set.size <= thr:
        checksum = 0
        for x in fp_set:
            checksum = (checksum * 1000003 + int(x)) % M31
        state = {
            "mode": "sparse",
            "m": m,
            "n_exact": int(fp_set.size),
            "checksum": int(checksum),
        }
        return state, float(fp_set.size)
    if fp_set.size:  # promote the surviving sparse partials
        idx, rank = _ranks(fp_set)
        np.maximum.at(regs, idx, rank)
    checksum = 0
    for x in regs:
        checksum = (checksum * 1000003 + int(x)) % M31
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    state = {
        "mode": "dense",
        "m": m,
        "sum_reg": int(regs.sum()),
        "zero_reg": zeros,
        "checksum": int(checksum),
    }
    return state, float(e)


# Count-min sketch row hashes: ((k·A_j + B_j) % P) % width, pure BIGINT
# arithmetic so the DuckDB twin replays every counter exactly.
CMS_P = (1 << 31) - 1
CMS_ROWS = (
    (1_000_003, 12_289),
    (2_654_435_761 % CMS_P, 514_229),
    (805_306_457, 39_916_801 % CMS_P),
    (1_073_741_827 % CMS_P, 95_279),
)


def cms_counts(
    ds: "ray.data.Dataset",
    key_col: str,
    width: int = 1024,
) -> "ray.data.Dataset":
    """Count-min sketch (Cormode & Muthukrishnan 2005) over an integer
    key column, plus the point-query readback for every distinct key:
    (key, est, true_cnt). The CMS guarantee est ≥ true_cnt is asserted
    in tests; the sketch rows are d=4 pairwise-independent-ish integer
    hash rows (constants above) of ``width`` counters each.

    Distribution: per-block d×width int64 counter partials (np.add.at)
    folded on the driver (d·width ints — sketch-sized, never
    key-sized), true counts via the degrees partial-combine groupby,
    estimates via a broadcast-sketch map_batches — no key-sized
    driver state."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    d = len(CMS_ROWS)

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key_col), np.int64)
        regs = np.zeros((d, width), np.int64)
        for j, (a, b) in enumerate(CMS_ROWS):
            np.add.at(regs[j], ((k * a + b) % CMS_P) % width, 1)
        return pa.table(
            {
                "row": pa.array(np.repeat(np.arange(d), width)),
                "bucket": pa.array(np.tile(np.arange(width), d)),
                "c": pa.array(regs.reshape(-1)),
            }
        )

    sk = np.zeros((d, width), np.int64)
    for tbl in ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if "row" not in tbl.column_names or tbl.num_rows == 0:
            continue
        r = np.asarray(tbl.column("row"), np.int64)
        b = np.asarray(tbl.column("bucket"), np.int64)
        c = np.asarray(tbl.column("c"), np.int64)
        np.add.at(sk, (r, b), c)
    sk_ref = ray.put(sk)

    def block_counts(batch: pa.Table) -> pa.Table:
        t = batch.group_by(key_col).aggregate([(key_col, "count")])
        return t.rename_columns([key_col, "n"])

    true_cnt = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="true_cnt"))
    )

    def estimate(batch: pa.Table, _ref=sk_ref) -> pa.Table:
        if key_col not in batch.column_names or batch.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "est": pa.array([], pa.int64()),
                    "true_cnt": pa.array([], pa.int64()),
                }
            )
        import ray as _ray

        s = _ray.get(_ref)
        k = np.asarray(batch.column(key_col), np.int64)
        est = np.full(k.size, np.iinfo(np.int64).max)
        for j, (a, b) in enumerate(CMS_ROWS):
            est = np.minimum(est, s[j][((k * a + b) % CMS_P) % width])
        return pa.table(
            {
                key_col: pa.array(k),
                "est": pa.array(est),
                "true_cnt": batch.column("true_cnt").cast(pa.int64()),
            }
        )

    return true_cnt.map_batches(estimate, batch_format="pyarrow")


def hll_int_registers(
    ds: "ray.data.Dataset", key_col: str, p: int = 6
) -> np.ndarray:
    """HLL registers over an INTEGER key column, driver-folded (2^p
    ints — sketch-sized). Fingerprints use the quadratic mixer
    ``h = k·2654435761 % M31; h ← (h²+h) % M31`` (the hyperball
    lesson: purely linear maps keep sequential keys an arithmetic
    progression with biased leading-zero ranks), rank law identical to
    approx_distinct_poly."""
    import ray

    m = 1 << p
    w = 31 - p
    M31 = (1 << 31) - 1

    def partial(batch: pa.Table) -> pa.Table:
        if key_col not in batch.column_names or batch.num_rows == 0:
            return pa.table(
                {"idx": pa.array([], pa.int64()),
                 "val": pa.array([], pa.int64())}
            )
        k = np.unique(np.asarray(batch.column(key_col), np.int64))
        h = (k * 2_654_435_761) % M31
        h = (h * h + h) % M31
        idx = h & (m - 1)
        v = h >> p
        bl = np.zeros(v.size, np.int64)
        for j in range(w):
            bl[v >= (1 << j)] = j + 1
        rank = (w + 1) - bl
        regs = np.zeros(m, np.int64)
        np.maximum.at(regs, idx, rank)
        return pa.table(
            {"idx": pa.array(np.arange(m)), "val": pa.array(regs)}
        )

    regs = np.zeros(m, np.int64)
    for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    ):
        if "idx" in t.column_names and t.num_rows:
            np.maximum.at(
                regs,
                np.asarray(t.column("idx"), np.int64),
                np.asarray(t.column("val"), np.int64),
            )
    return regs


def hll_state_row(regs: np.ndarray) -> tuple[int, int, int]:
    """(sum_reg, zero_reg, order-checksum) — the integer gate state of
    a register array (approx_distinct_poly's summary law)."""
    M31 = (1 << 31) - 1
    checksum = 0
    for r in regs:
        checksum = (checksum * 1_000_003 + int(r)) % M31
    return int(regs.sum()), int((regs == 0).sum()), checksum
