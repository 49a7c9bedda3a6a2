"""Relational / temporal operators Ray Data lacks natively, built per
SURVEY §2.10's note: the reference has no joins/sort/top-k as API —
these exist as *engine-level* tools for training-data pipelines
(prompt: "as-of join, range join, windowed aggregate" as custom
operators), expressed as map_batches + coarse-partition map_groups.

Partitioning assumption (documented per the custom-operator contract):
each stage co-locates whole KEYS via ``key % n_parts``; a single key's
rows must fit one worker (true for per-user event histories; for
pathological keys add a salt + two-stage combine like the dedup
max_bucket guard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.util import coarse_parts, half_away_int, round_half_away


def _cents(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """value·100 rounded HALF-AWAY-FROM-ZERO (exact std::round law —
    decided on the double itself, no +0.5 carry), matching DuckDB
    ``ROUND(value * 100)`` in the SQL twins bit-for-bit. np.rint is
    banker's (half-to-even) and diverges deterministically whenever
    value·100 is exactly representable at .5 — the round-3 driver
    `pivot_events` red row."""
    return half_away_int(values, 100.0)


def _part_tag(ds, key: str, n_parts: int):
    def tag(batch: pa.Table) -> pa.Table:
        part = np.asarray(batch.column(key), np.int64) % n_parts
        return batch.append_column("__part", pa.array(part))

    return ds.map_batches(tag, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str = "user_id",
    on: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
    n_parts: int | None = None,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """For every left row, attach the LATEST right row with
    ``right.on <= left.on`` and equal ``key`` (inner semantics: left
    rows with no prior right row are dropped) — DuckDB's
    ``ASOF JOIN ... ON l.key = r.key AND l.on >= r.on``.

    Physical plan: tag side → union → co-locate whole keys by
    ``key % n_parts`` → ONE vectorized group call per partition that
    sorts by (key, on) and binary-searches each left row into its key's
    right history. No per-key dispatch, no driver materialization.
    """
    if n_parts is None:
        n_parts = coarse_parts()
    on_t = pa.int64()

    def prep(side: int, cols: tuple[str, ...]):
        def fn(batch: pa.Table) -> pa.Table:
            out = {
                key: batch.column(key).cast(pa.int64()),
                "__on": batch.column(on).cast(on_t),
                "__side": pa.array(
                    np.full(len(batch), side, np.int8)
                ),
            }
            for i, c in enumerate(
                ("event_id",) if side == 0 else right_value_cols
            ):
                out[f"__c{side}_{i}"] = batch.column(c)
            return pa.table(out)

        return fn

    l = left.map_batches(prep(0, ()), batch_format="pyarrow")
    r = right.map_batches(
        prep(1, right_value_cols), batch_format="pyarrow"
    )
    both = _part_tag(l.union(r), key, n_parts)

    def emit(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side"), np.int8)
        k = np.asarray(group.column(key), np.int64)
        t = np.asarray(group.column("__on"), np.int64)
        is_l = side == 0
        lk, lt = k[is_l], t[is_l]
        rk, rt = k[~is_l], t[~is_l]
        out_cols: dict = {}
        if lk.size == 0 or rk.size == 0:
            cols = {key: pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    on: pa.array([], on_t)}
            for i, c in enumerate(right_value_cols):
                cols[c + suffix] = pa.array([], pa.float64())
            return pa.table(cols)
        l_ids = np.asarray(group.column("__c0_0"))[is_l]
        r_vals = [
            np.asarray(group.column(f"__c1_{i}"))[~is_l]
            for i in range(len(right_value_cols))
        ]
        ro = np.lexsort((rt, rk))
        rk, rt = rk[ro], rt[ro]
        r_vals = [v[ro] for v in r_vals]
        # Per-key right segment bounds, then per-left binary search of
        # its timestamp within the segment. One searchsorted call per
        # distinct key present on the left (vectorized inside).
        lo_all = np.searchsorted(rk, lk, side="left")
        hi_all = np.searchsorted(rk, lk, side="right")
        match = np.full(lk.size, -1, np.int64)
        order_l = np.argsort(lk, kind="stable")
        pos = 0
        while pos < order_l.size:
            u = lk[order_l[pos]]
            end = pos
            while end < order_l.size and lk[order_l[end]] == u:
                end += 1
            sel = order_l[pos:end]
            lo, hi = lo_all[sel[0]], hi_all[sel[0]]
            if hi > lo:
                idx = lo + np.searchsorted(
                    rt[lo:hi], lt[sel], side="right"
                ) - 1
                ok = idx >= lo
                match[sel[ok]] = idx[ok]
            pos = end
        hit = match >= 0
        cols = {
            key: pa.array(lk[hit]),
            "event_id": pa.array(l_ids[hit]),
            on: pa.array(lt[hit], on_t),
        }
        for i, c in enumerate(right_value_cols):
            cols[c + suffix] = pa.array(r_vals[i][match[hit]])
        return pa.table(cols)

    return both.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def topk_per_group(
    ds: "ray.data.Dataset",
    key: str = "user_id",
    order_col: str = "value",
    tie_col: str = "event_id",
    k: int = 3,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Top-k rows per key by (order_col DESC, tie_col ASC) — the
    relational sort/limit-per-key the reference lacks. Two-stage:
    in-batch partial top-k per key (the combiner — at most k rows per
    (key, block) ever shuffle), then a coarse-partition final top-k."""
    if n_parts is None:
        n_parts = coarse_parts()

    def partial(batch: pa.Table) -> pa.Table:
        kk = np.asarray(batch.column(key), np.int64)
        vv = np.asarray(batch.column(order_col), np.float64)
        tt = np.asarray(batch.column(tie_col), np.int64)
        order = np.lexsort((tt, -vv, kk))
        kk, vv, tt = kk[order], vv[order], tt[order]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        rank = np.arange(kk.size) - np.repeat(
            starts, np.diff(np.r_[starts, kk.size])
        )
        keep = rank < k
        return pa.table(
            {key: kk[keep], order_col: vv[keep], tie_col: tt[keep]}
        )

    parts = _part_tag(
        ds.select_columns([key, order_col, tie_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key,
        n_parts,
    )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # Empty coarse partitions arrive WITHOUT columns — emit the
            # typed empty table so downstream blocks share one schema.
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    order_col: pa.array([], pa.float64()),
                    tie_col: pa.array([], pa.int64()),
                }
            )
        return partial(group.drop_columns(["__part"]))

    return parts.groupby("__part").map_groups(
        final, batch_format="pyarrow"
    )


def broadcast_join(
    large: "ray.data.Dataset",
    small: "ray.data.Dataset | pa.Table",
    on: str | tuple[str, ...],
    how: str = "inner",
    max_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """Map-side join against a SMALL dimension table: the small side is
    collected once, ``ray.put`` once, and every large-side batch joins
    against the shared plasma copy (zero-copy reads) — NO shuffle of the
    large side at all, the canonical 100-TB enrich pattern for
    fact ⋈ dimension. Refuses loudly (not OOM) above ``max_rows``; use
    ``Dataset.join`` for genuinely large both-sides joins.

    ``how``: "inner" or "left" (pyarrow join semantics per batch —
    batch-local is exact because only large-side rows are emitted and
    each joins the FULL small table).
    """
    keys = [on] if isinstance(on, str) else list(on)
    from alp_ray.util import concat_blocks

    if isinstance(small, pa.Table):
        small_tbl = small.combine_chunks()
    else:
        small_tbl = concat_blocks(small.materialize())
    if small_tbl.num_rows > max_rows:
        raise ValueError(
            f"broadcast_join small side has {small_tbl.num_rows} rows "
            f"> max_rows={max_rows}; use a shuffle join"
        )
    sref = ray.put(small_tbl)
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def fn(batch: pa.Table) -> pa.Table:
        st = ray.get(sref)
        return batch.join(
            st, keys=keys, join_type=join_type, right_suffix="_r"
        )

    return large.map_batches(fn, batch_format="pyarrow")


def range_join(
    large: "ray.data.Dataset",
    intervals: "ray.data.Dataset | pa.Table",
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
    max_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Interval containment join: for every large-side row attach the
    interval with ``lo <= value < hi``. Intervals must be DISJOINT and
    sorted-able (the common banding/bucketing case: price bands, time
    epochs, size classes) — each row matches ≤ 1 interval, checked at
    broadcast time.

    Physical plan mirrors ``broadcast_join``: the interval table is tiny
    (it describes a partitioning of the value axis), so it rides ONE
    ``ray.put`` and each batch resolves membership with a vectorized
    ``searchsorted`` against the sorted ``lo`` bounds — no shuffle, no
    per-row loop. ``how="left"`` keeps non-matching rows with nulls.
    """
    from alp_ray.util import concat_blocks

    if isinstance(intervals, pa.Table):
        itbl = intervals.combine_chunks()
    else:
        itbl = concat_blocks(intervals.materialize())
    if itbl.num_rows > max_rows:
        raise ValueError(
            f"range_join interval side has {itbl.num_rows} rows "
            f"> max_rows={max_rows}"
        )
    lo = np.asarray(itbl.column(lo_col), np.float64)
    hi = np.asarray(itbl.column(hi_col), np.float64)
    order = np.argsort(lo, kind="stable")
    lo, hi = lo[order], hi[order]
    if np.any(hi[:-1] > lo[1:]) or np.any(hi <= lo):
        raise ValueError("range_join intervals must be disjoint, lo < hi")
    payload = itbl.take(pa.array(order))
    sref = ray.put((lo, hi, payload))
    drop_miss = how == "inner"

    def fn(batch: pa.Table) -> pa.Table:
        slo, shi, pt = ray.get(sref)
        v = np.asarray(batch.column(value_col), np.float64)
        idx = np.searchsorted(slo, v, side="right") - 1
        ok = (idx >= 0) & (v < shi[np.clip(idx, 0, None)])
        if drop_miss:
            batch = batch.filter(pa.array(ok))
            idx = idx[ok]
            picked = pt.take(pa.array(idx))
        else:
            # Null-masked indices: take() emits null rows for misses.
            mi = pa.array(
                np.where(ok, idx, 0), type=pa.int64(), mask=~ok
            )
            picked = pt.take(mi)
        for name in pt.column_names:
            col = picked.column(name)
            out_name = name if name not in batch.column_names else (
                name + "_r"
            )
            batch = batch.append_column(out_name, col)
        return batch

    return large.map_batches(fn, batch_format="pyarrow")


def stratified_split(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    test_frac: float = 0.2,
    mult: int = 1_000_003,
    mod: int = 1_000_000_007,
    sample_per_block: int = 512,
) -> "ray.data.Dataset":
    """EXACT stratified test-set selection: within every stratum the
    ``floor(count·test_frac)`` rows with the smallest
    ``(hash(key), key)`` pair form the test split — deterministic,
    reproducible, and per-stratum proportions exact (not just expected,
    as a plain hash threshold gives).

    Physical plan is the two-pass BRACKET SELECTION of
    ``exact_percentiles`` run per stratum (strata are few — languages,
    sources): pass 1 per-block per-stratum counts + sorted hash
    samples → driver brackets each stratum's k-th smallest hash; pass 2
    exact below-bracket counts + the (hash, key) pairs inside the
    bracket (bounded) → driver picks the exact threshold pair; pass 3
    is a stateless broadcast filter. No sort, no groupby — three
    streaming passes whose driver state is O(#strata · bracket).
    SQL twin: ``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY
    hash, key) <= floor(cnt·frac)``.
    """

    def pass1(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column(stratum_col))
        k = np.asarray(batch.column(key_col), np.int64)
        h = (k * mult) % mod
        cats, codes = np.unique(s, return_inverse=True)
        names, ns, samples = [], [], []
        for ci, cat in enumerate(cats):
            hh = np.sort(h[codes == ci])
            if hh.size > sample_per_block:
                idx = np.linspace(
                    0, hh.size - 1, sample_per_block
                ).astype(np.int64)
                samp = hh[idx]
            else:
                samp = hh
            names.append(str(cat))
            ns.append(hh.size)
            samples.append(samp)
        return pa.table(
            {
                "stratum": pa.array(names),
                "n": pa.array(ns, pa.int64()),
                "sample": pa.array(
                    [list(map(int, x)) for x in samples],
                    pa.list_(pa.int64()),
                ),
            }
        )

    cols = ds.select_columns([stratum_col, key_col]).materialize()
    p1 = cols.map_batches(pass1, batch_format="pyarrow").take_all()
    counts: dict[str, int] = {}
    samples: dict[str, list] = {}
    for r in p1:
        counts[r["stratum"]] = counts.get(r["stratum"], 0) + int(r["n"])
        samples.setdefault(r["stratum"], []).append(
            np.asarray(r["sample"], np.int64)
        )
    ks = {
        s: int(np.floor(c * test_frac)) for s, c in counts.items()
    }
    brackets: dict[str, tuple[int, int]] = {}
    for s, k in ks.items():
        if k <= 0:
            continue
        merged = np.sort(np.concatenate(samples[s]))
        pos = (k - 1) / max(1, counts[s] - 1) * (merged.size - 1)
        pad = max(2, merged.size // 256)
        lo_i = max(0, int(np.floor(pos)) - pad)
        hi_i = min(merged.size - 1, int(np.ceil(pos)) + pad)
        brackets[s] = (int(merged[lo_i]), int(merged[hi_i]))
    if not brackets:
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    stratum_col: pa.array([], pa.string()),
                }
            )
        )
    bref = ray.put(brackets)

    def pass2(batch: pa.Table) -> pa.Table:
        br = ray.get(bref)
        s = np.asarray(batch.column(stratum_col))
        k = np.asarray(batch.column(key_col), np.int64)
        h = (k * mult) % mod
        names, below, hs, ids = [], [], [], []
        for cat, (lo, hi) in br.items():
            m = s == cat
            hm, km = h[m], k[m]
            inside = (hm >= lo) & (hm <= hi)
            names.append(cat)
            below.append(int((hm < lo).sum()))
            hs.append(list(map(int, hm[inside])))
            ids.append(list(map(int, km[inside])))
        return pa.table(
            {
                "stratum": pa.array(names),
                "below": pa.array(below, pa.int64()),
                "hs": pa.array(hs, pa.list_(pa.int64())),
                "ids": pa.array(ids, pa.list_(pa.int64())),
            }
        )

    p2 = cols.map_batches(pass2, batch_format="pyarrow").take_all()
    below_tot: dict[str, int] = {}
    pair_h: dict[str, list] = {}
    pair_i: dict[str, list] = {}
    for r in p2:
        st = r["stratum"]
        below_tot[st] = below_tot.get(st, 0) + int(r["below"])
        pair_h.setdefault(st, []).append(np.asarray(r["hs"], np.int64))
        pair_i.setdefault(st, []).append(np.asarray(r["ids"], np.int64))
    thresholds: dict[str, tuple[int, int]] = {}
    for st, (lo, hi) in brackets.items():
        hh = np.concatenate(pair_h[st])
        ii = np.concatenate(pair_i[st])
        order = np.lexsort((ii, hh))
        j = ks[st] - 1 - below_tot[st]
        assert 0 <= j < hh.size, (
            f"bracket missed rank {ks[st]} for stratum {st} "
            f"(below={below_tot[st]}, in-bracket={hh.size}) — "
            "widen sample_per_block"
        )
        thresholds[st] = (int(hh[order][j]), int(ii[order][j]))
    tref = ray.put(thresholds)

    def filt(batch: pa.Table) -> pa.Table:
        th = ray.get(tref)
        s = np.asarray(batch.column(stratum_col))
        k = np.asarray(batch.column(key_col), np.int64)
        h = (k * mult) % mod
        keep = np.zeros(k.size, bool)
        for cat, (hstar, istar) in th.items():
            m = s == cat
            keep |= m & ((h < hstar) | ((h == hstar) & (k <= istar)))
        return pa.table(
            {key_col: k[keep], stratum_col: pa.array(s[keep])}
        )

    return cols.map_batches(filt, batch_format="pyarrow")


def hash_sample(
    ds: "ray.data.Dataset",
    key: str = "doc_id",
    pct: int = 5,
    mult: int = 40503,
    mod: int = 65536,
) -> "ray.data.Dataset":
    """Deterministic value-based sampling: keep rows where
    ``(key·mult) % mod < mod·pct/100`` — reproducible across runs and
    engines (unlike random_shuffle-based sampling), expressible in SQL
    verbatim. Keep ``key·mult`` within int64 (mult small)."""
    cut = mod * pct // 100

    def fn(batch: pa.Table) -> pa.Table:
        kk = np.asarray(batch.column(key), np.int64)
        keep = (kk * mult) % mod < cut
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def co_occurrence(
    ds: "ray.data.Dataset",
    group_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_count: int = 2,
    max_group: int = 1024,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Bipartite projection / market-basket co-occurrence: for every
    unordered item pair appearing together in ≥ ``min_count`` groups,
    the number of groups containing both. The classic item-item graph
    build behind recommender / link-prediction pipelines; pair weight
    = |{g : a ∈ g ∧ b ∈ g}|.

    Physical plan: co-locate whole groups by ``group % n_parts`` → ONE
    vectorized kernel per partition that sorts (group, item), dedupes
    within group, emits each group's d·(d−1)/2 pairs via segment
    repeat/arange index arithmetic (no per-group dispatch), and
    PRE-AGGREGATES pair counts partition-locally → one (a, b)-keyed
    groupby Sum of the pre-reduced partials. Output volume per group is
    d², so groups larger than ``max_group`` items are dropped with a
    warning — the standard heavy-basket guard (a group that large adds
    ~no ranking signal but 10⁶ pairs)."""
    from ray.data.aggregate import Sum

    if n_parts is None:
        n_parts = coarse_parts()
    tagged = _part_tag(
        ds.select_columns([group_col, item_col]), group_col, n_parts
    )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "item_a": pa.array([], pa.int64()),
            "item_b": pa.array([], pa.int64()),
            "n_groups": pa.array([], pa.int64()),
        })
        if group_col not in group.column_names or group.num_rows == 0:
            return empty
        g = np.asarray(group.column(group_col), np.int64)
        it = np.asarray(group.column(item_col), np.int64)
        order = np.lexsort((it, g))
        g, it = g[order], it[order]
        # Distinct (group, item).
        keep = np.r_[True, (g[1:] != g[:-1]) | (it[1:] != it[:-1])]
        g, it = g[keep], it[keep]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        d = np.diff(np.r_[starts, g.size])
        big = d > max_group
        if big.any():
            import logging

            logging.getLogger(__name__).warning(
                "co_occurrence: dropping %d group(s) larger than %d "
                "items (heavy-basket guard)", int(big.sum()), max_group,
            )
            sel = np.repeat(~big, d)
            g, it = g[sel], it[sel]
            starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]) \
                if g.size else np.array([], np.int64)
            d = np.diff(np.r_[starts, g.size])
        # Every element pairs with the later elements of its group:
        # element at in-group position p contributes (d - 1 - p)
        # pairs (itself as the left endpoint). All-integer index
        # arithmetic — one repeat per endpoint, no per-group loop.
        pos = np.arange(g.size, dtype=np.int64) - np.repeat(starts, d)
        n_right = np.repeat(d, d) - 1 - pos
        total = int(n_right.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(g.size, dtype=np.int64), n_right)
        cum_e = np.concatenate([[0], np.cumsum(n_right)[:-1]])
        off = np.arange(total, dtype=np.int64) - np.repeat(cum_e, n_right)
        a, b = it[left], it[left + 1 + off]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # Partition-local pre-aggregation: same pair across groups.
        key = np.stack([lo, hi], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table({
            "item_a": pa.array(uniq[:, 0]),
            "item_b": pa.array(uniq[:, 1]),
            "n_groups": pa.array(cnt.astype(np.int64)),
        })

    partials = tagged.groupby("__part").map_groups(
        pairs, batch_format="pyarrow"
    )
    agg = partials.groupby(["item_a", "item_b"]).aggregate(
        Sum("n_groups", alias_name="n_groups")
    )

    def threshold(batch: pa.Table) -> pa.Table:
        if "n_groups" not in batch.column_names or len(batch) == 0:
            return pa.table({
                "item_a": pa.array([], pa.int64()),
                "item_b": pa.array([], pa.int64()),
                "n_groups": pa.array([], pa.int64()),
            })
        keep = np.asarray(batch.column("n_groups"), np.int64) >= min_count
        return batch.filter(pa.array(keep))

    return agg.map_batches(threshold, batch_format="pyarrow")


def global_rank(
    ds: "ray.data.Dataset",
    by: str,
    id_col: str,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Distributed global ROW_NUMBER: rank every row by ``(by, id)``
    ascending (the id tiebreaker makes the total order — and therefore
    the result — unique and deterministic). Returns (id, rank),
    0-based. Ray Data has no rank/percent_rank operator; this is the
    dense_id_mapping pattern reapplied: ONE range-partitioning sort,
    then per-block local ranks shifted by O(#blocks) driver-side count
    scalars — no second shuffle, no driver data."""
    import ray

    sorted_ds = ds.select_columns([by, id_col]).sort(
        [by, id_col]
    ).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        # Empty range-sort partitions surface as column-less blocks.
        if id_col not in tbl.column_names:
            return 0
        return tbl.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    @ray.remote
    def _tag(tbl: pa.Table, offset: int) -> pa.Table:
        if id_col not in tbl.column_names or tbl.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                rank_col: pa.array([], pa.int64()),
            })
        return pa.table({
            id_col: tbl.column(id_col).cast(pa.int64()),
            rank_col: pa.array(
                np.arange(offset, offset + tbl.num_rows, dtype=np.int64)
            ),
        })

    out = [
        _tag.remote(r, int(offsets[i])) for i, r in enumerate(refs)
    ]
    return ray.data.from_arrow_refs(out)


def semi_anti_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    anti: bool = False,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Distributed SEMI (keep left rows whose key exists on the right)
    or ANTI (keep those whose key does not) join — neither exists in
    Ray Data's join operator. Only the LEFT key column is returned
    (the filter predicate form; callers re-join attributes if needed).

    Physical plan: the right side is reduced to per-batch DISTINCT keys
    (the combiner — duplicate foreign keys never shuffle), both sides
    co-locate by ``key % n_parts``, and one vectorized ``np.isin`` per
    partition emits survivors. No driver materialization, no broadcast
    assumption: works when BOTH sides are large (the broadcast_join
    small-side variant already covers the dimension-table case)."""
    if n_parts is None:
        n_parts = coarse_parts()

    def prep_left(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column(left_on).cast(pa.int64()),
            "__side": pa.array(np.zeros(len(batch), np.int8)),
        })

    def prep_right(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch.column(right_on), np.int64))
        return pa.table({
            "k": pa.array(k),
            "__side": pa.array(np.ones(k.size, np.int8)),
        })

    both = _part_tag(
        left.select_columns([left_on])
        .map_batches(prep_left, batch_format="pyarrow")
        .union(
            right.select_columns([right_on]).map_batches(
                prep_right, batch_format="pyarrow"
            )
        ),
        "k",
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        if "k" not in group.column_names or group.num_rows == 0:
            return pa.table({left_on: pa.array([], pa.int64())})
        k = np.asarray(group.column("k"), np.int64)
        side = np.asarray(group.column("__side"), np.int8)
        lk = k[side == 0]
        rk = np.unique(k[side == 1])
        hit = np.isin(lk, rk, assume_unique=False)
        keep = ~hit if anti else hit
        return pa.table({left_on: pa.array(lk[keep])})

    return both.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def pivot_counts(
    ds: "ray.data.Dataset",
    key: str,
    pivot_col: str,
    categories: tuple[str, ...],
    value_col: str | None = None,
) -> "ray.data.Dataset":
    """Pivot a categorical column into per-category aggregate columns:
    per key, ``n_<cat>`` row counts (and ``cents_<cat>`` exact integer
    value sums when ``value_col`` is given). The category list is an
    explicit argument — at scale you know your schema; discovering it
    would be a full extra pass.

    Physical plan: per-batch conditional partials (one boolean mask +
    bincount per category — the combiner: a batch of any size reduces
    to ≤ #keys-in-batch rows) → ONE key-grouped Sum. The shuffle moves
    pre-reduced partials only."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key), np.int64)
        cat = np.array(batch.column(pivot_col).to_pylist(), dtype=object)
        uk, inv = np.unique(k, return_inverse=True)
        cols: dict = {key: pa.array(uk)}
        if value_col is not None:
            cents = _cents(batch.column(value_col))
        for c in categories:
            m = cat == c
            cols[f"n_{c}"] = pa.array(
                np.bincount(inv[m], minlength=uk.size).astype(np.int64)
            )
            if value_col is not None:
                cols[f"cents_{c}"] = pa.array(
                    np.bincount(
                        inv[m], weights=cents[m], minlength=uk.size
                    ).astype(np.int64)
                )
        return pa.table(cols)

    cols = [key, pivot_col] + ([value_col] if value_col else [])
    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in categories]
    if value_col is not None:
        aggs += [
            Sum(f"cents_{c}", alias_name=f"cents_{c}")
            for c in categories
        ]
    return (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*aggs)
    )


def grouped_median(
    ds: "ray.data.Dataset",
    key: str,
    value_col: str,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Exact per-key median (DuckDB semantics: lower-middle /
    mean-of-two-middles for odd/even counts). The global exact
    percentile op covers ungrouped quantiles; this is its keyed
    sibling. Whole keys co-locate by hash; one lexsort per partition
    and pure index arithmetic picks every key's middle elements — no
    per-key dispatch or loop."""
    if n_parts is None:
        n_parts = coarse_parts()
    tagged = _part_tag(
        ds.select_columns([key, value_col]), key, n_parts
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key: pa.array([], pa.int64()),
            "median": pa.array([], pa.float64()),
        })
        if key not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key), np.int64)
        v = np.asarray(group.column(value_col), np.float64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        cnt = np.diff(np.r_[starts, k.size])
        lo = starts + (cnt - 1) // 2
        hi = starts + cnt // 2
        med = (v[lo] + v[hi]) / 2.0
        return pa.table({
            key: pa.array(k[starts]),
            "median": pa.array(round_half_away(med, 6)),
        })

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def rollup_aggregate(
    ds: "ray.data.Dataset",
    keys: tuple[str, ...],
    value_col: str,
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(keys): aggregates at every prefix level of the
    key hierarchy — (k1, k2, …), (k1, …), …, () — in ONE pass. Each
    batch emits its rows once per level with suppressed keys replaced
    by the sentinel '' and a ``level`` column, pre-aggregated in-batch,
    then a single groupby Sum combines partials: the shuffle carries
    ≤ levels × distinct-key-combos rows per batch regardless of batch
    size. Counts and exact integer-cents sums (SQL twin: GROUP BY
    ROLLUP with COALESCE'd keys)."""
    from ray.data.aggregate import Sum

    levels = len(keys) + 1

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column(value_col))
        key_arrs = [
            np.array(batch.column(c).to_pylist(), dtype=object)
            for c in keys
        ]
        out: dict = {c: [] for c in keys}
        out.update({"level": [], "n_rows": [], "cents": []})
        for lvl in range(levels):
            cols = [
                key_arrs[i] if i < lvl
                else np.full(len(batch), "", object)
                for i in range(len(keys))
            ]
            combo = np.array(
                ["\x00".join(t) for t in zip(*cols)], dtype=object
            ) if keys else np.full(len(batch), "", object)
            uniq, inv = np.unique(combo, return_inverse=True)
            n = np.bincount(inv, minlength=uniq.size)
            s = np.bincount(
                inv, weights=cents, minlength=uniq.size
            ).astype(np.int64)
            parts = [u.split("\x00") for u in uniq]
            for i, c in enumerate(keys):
                out[c].append(
                    np.array([p[i] for p in parts], dtype=object)
                )
            out["level"].append(np.full(uniq.size, lvl, np.int64))
            out["n_rows"].append(n.astype(np.int64))
            out["cents"].append(s)
        cols = {
            c: pa.array(np.concatenate(out[c]).tolist(), pa.string())
            for c in keys
        }
        cols["level"] = pa.array(np.concatenate(out["level"]))
        cols["n_rows"] = pa.array(np.concatenate(out["n_rows"]))
        cols["cents"] = pa.array(np.concatenate(out["cents"]))
        return pa.table(cols)

    return (
        ds.select_columns([*keys, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([*keys, "level"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("cents", alias_name="cents"),
        )
    )


def zscore_outliers(
    ds: "ray.data.Dataset",
    key: str,
    value_col: str,
    id_col: str,
    threshold: float = 2.0,
) -> "ray.data.Dataset":
    """Per-key z-score outlier detection: rows with
    |x − μ_key| / σ_key > threshold. Two streaming passes: (1)
    per-batch integer-cents moment partials (count, Σx, Σx²) → one
    key-grouped Sum → a small per-key moment table broadcast once; (2)
    a scoring pass filters each batch against its keys' (μ, σ). All
    moments are exact int64 sums of cents, so both sides derive
    bit-identical μ/σ — no accumulation-algorithm drift (DuckDB's
    stddev_* uses a different algorithm; the twin writes the moment
    formula explicitly). Keys with σ = 0 emit nothing."""
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key), np.int64)
        c = _cents(batch.column(value_col))
        uk, inv = np.unique(k, return_inverse=True)
        return pa.table({
            key: pa.array(uk),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(
                np.bincount(inv, weights=c).astype(np.int64)
            ),
            "ss": pa.array(
                np.bincount(inv, weights=c * c).astype(np.int64)
            ),
        })

    mom = (
        ds.select_columns([key, value_col])
        .map_batches(moments, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )
    mtbl = broadcast_join(
        ds.select_columns([id_col, key, value_col]), mom, on=key
    )

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            key: pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
        })
        if "n" not in batch.column_names or len(batch) == 0:
            return empty
        c = _cents(batch.column(value_col)).astype(np.float64)
        ni = np.asarray(batch.column("n"), np.int64)
        si = np.asarray(batch.column("s"), np.int64)
        ssi = np.asarray(batch.column("ss"), np.int64)
        # σ > 0 decided EXACTLY in integers (n·Σx² > (Σx)²) — the float
        # moment difference is only trusted once positivity is known,
        # so both sides (this and the SQL twin) share one predicate.
        pos = ssi * ni > si * si
        n, s, ss = (ni.astype(np.float64), si.astype(np.float64),
                    ssi.astype(np.float64))
        mean = s / n
        var = ss / n - mean * mean
        sd = np.sqrt(np.maximum(var, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(pos, (c - mean) / sd, 0.0)
        keep = pos & (np.abs(z) > threshold)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()).filter(
                pa.array(keep)
            ),
            key: batch.column(key).cast(pa.int64()).filter(
                pa.array(keep)
            ),
            "z": pa.array(round_half_away(z[keep], 6)),
        })

    return mtbl.map_batches(score, batch_format="pyarrow")


def grouped_mode(
    ds: "ray.data.Dataset",
    key: str,
    token_col: str,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key MODE of a categorical column (deterministic: highest
    count, lexicographically-smallest token breaking ties). Whole keys
    co-locate by hash; counts come from the segment boundaries of one
    (key, token) lexsort and the winner per key from a second tiny
    lexsort over the per-(key, token) count rows — no per-key dispatch.
    Returns (key, mode_token, mode_count)."""
    if n_parts is None:
        n_parts = coarse_parts()
    tagged = _part_tag(ds.select_columns([key, token_col]), key, n_parts)

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key: pa.array([], pa.int64()),
            "mode_token": pa.array([], pa.string()),
            "mode_count": pa.array([], pa.int64()),
        })
        if key not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key), np.int64)
        tok = np.array(group.column(token_col).to_pylist(), dtype=object)
        tu, tcode = np.unique(tok, return_inverse=True)
        order = np.lexsort((tcode, k))
        k, tcode = k[order], tcode[order]
        starts = np.flatnonzero(
            np.r_[True, (k[1:] != k[:-1]) | (tcode[1:] != tcode[:-1])]
        )
        cnt = np.diff(np.r_[starts, k.size]).astype(np.int64)
        gk, gt = k[starts], tcode[starts]
        # Winner per key: sort by (key, -count, token) and take segment
        # heads. tcode order == lexicographic token order (np.unique).
        o2 = np.lexsort((gt, -cnt, gk))
        gk, gt, cnt = gk[o2], gt[o2], cnt[o2]
        heads = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]])
        return pa.table({
            key: pa.array(gk[heads]),
            "mode_token": pa.array(
                tu[gt[heads]].tolist(), pa.string()
            ),
            "mode_count": pa.array(cnt[heads]),
        })

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def cube_aggregate(
    ds: "ray.data.Dataset",
    keys: tuple[str, ...],
    value_col: str,
) -> "ray.data.Dataset":
    """GROUP BY CUBE(keys): aggregates for EVERY subset of the key set
    (2^k groupings) in one pass — rollup_aggregate's lattice-complete
    sibling. Suppressed keys become '' and ``grouping_id`` is the
    bitmask of suppressed keys (bit i = keys[i] suppressed), matching
    SQL's GROUPING() encoding. Same shuffle shape: per-batch in-batch
    pre-aggregation per grouping, one groupby Sum of partials."""
    from ray.data.aggregate import Sum

    k = len(keys)

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column(value_col))
        key_arrs = [
            np.array(batch.column(c).to_pylist(), dtype=object)
            for c in keys
        ]
        out: dict = {c: [] for c in keys}
        out.update({"grouping_id": [], "n_rows": [], "cents": []})
        for mask in range(1 << k):
            cols = [
                np.full(len(batch), "", object) if (mask >> i) & 1
                else key_arrs[i]
                for i in range(k)
            ]
            combo = np.array(
                ["\x00".join(t) for t in zip(*cols)], dtype=object
            ) if k else np.full(len(batch), "", object)
            uniq, inv = np.unique(combo, return_inverse=True)
            parts = [u.split("\x00") for u in uniq]
            for i, c in enumerate(keys):
                out[c].append(
                    np.array([p[i] for p in parts], dtype=object)
                )
            out["grouping_id"].append(
                np.full(uniq.size, mask, np.int64)
            )
            out["n_rows"].append(
                np.bincount(inv, minlength=uniq.size).astype(np.int64)
            )
            out["cents"].append(
                np.bincount(
                    inv, weights=cents, minlength=uniq.size
                ).astype(np.int64)
            )
        cols = {
            c: pa.array(np.concatenate(out[c]).tolist(), pa.string())
            for c in keys
        }
        cols["grouping_id"] = pa.array(np.concatenate(out["grouping_id"]))
        cols["n_rows"] = pa.array(np.concatenate(out["n_rows"]))
        cols["cents"] = pa.array(np.concatenate(out["cents"]))
        return pa.table(cols)

    return (
        ds.select_columns([*keys, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([*keys, "grouping_id"])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("cents", alias_name="cents"),
        )
    )


def grouped_distinct_count(
    ds: "ray.data.Dataset",
    key: str,
    item_col: str,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Exact per-key COUNT(DISTINCT item) — the keyed counterpart of
    the HLL sketch (use that when approximate is acceptable; this when
    the count gates correctness). Per-batch distinct (key, item) pairs
    (the combiner — duplicate pairs never shuffle), whole keys
    co-locate by hash, one lexsort + segment count per partition.
    Returns (key, n_distinct)."""
    if n_parts is None:
        n_parts = coarse_parts()

    def pairs(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(key), np.int64)
        it = np.asarray(batch.column(item_col), np.int64)
        u = np.unique(np.stack([k, it], axis=1), axis=0)
        return pa.table({
            key: pa.array(u[:, 0]),
            item_col: pa.array(u[:, 1]),
        })

    tagged = _part_tag(
        ds.select_columns([key, item_col]).map_batches(
            pairs, batch_format="pyarrow"
        ),
        key,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key: pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
        })
        if key not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key), np.int64)
        it = np.asarray(group.column(item_col), np.int64)
        order = np.lexsort((it, k))
        k, it = k[order], it[order]
        keep = np.r_[True, (k[1:] != k[:-1]) | (it[1:] != it[:-1])]
        k = k[keep]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        return pa.table({
            key: pa.array(k[starts]),
            "n_distinct": pa.array(
                np.diff(np.r_[starts, k.size]).astype(np.int64)
            ),
        })

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def dataset_diff(
    ds_a: "ray.data.Dataset",
    ds_b: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Snapshot diff between two dataset versions keyed by ``key_col``:
    one row per key whose state differs — status ``removed`` (key only
    in A), ``added`` (key only in B), ``changed`` (present in both,
    ``value_col`` differs). Unchanged keys are not emitted. Keys must
    be unique per side (a data-versioning contract; duplicate keys
    raise loudly rather than emit nonsense).

    Physical plan: side-tag both inputs, union, co-locate keys by the
    coarse hash partition, ONE vectorized compare per partition (no
    join — Ray 2.49's hash join is avoided entirely). SQL twin:
    FULL OUTER JOIN + CASE."""
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch.column(key_col), np.int64)
            return pa.table({
                "k": pa.array(k),
                "val": batch.column(value_col).cast(pa.string()),
                "side": pa.array(
                    np.full(k.size, side, np.int64)
                ),
                "__part": pa.array((k * 2654435761) % n_parts),
            })
        return fn

    both = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")
    )

    def compare(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "status": pa.array([], pa.string()),
        })
        if "k" not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column("k"), np.int64)
        side = np.asarray(group.column("side"), np.int64)
        val = group.column("val")
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        enc = val.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = np.asarray(enc.indices, np.int64)
        order = np.lexsort((side, k))
        k, side, code = k[order], side[order], code[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        cnt = np.diff(np.r_[starts, k.size])
        two = cnt == 2
        dup2 = np.zeros(starts.size, bool)
        dup2[two] = side[starts[two]] == side[starts[two] + 1]
        if (cnt > 2).any() or dup2.any():
            raise ValueError(
                "dataset_diff: duplicate keys within one side"
            )
        out_k, out_s = [], []
        one = cnt == 1
        if one.any():
            s1 = starts[one]
            out_k.append(k[s1])
            out_s.append(
                np.where(side[s1] == 0, "removed", "added")
            )
        if two.any():
            s2 = starts[two]
            ch = code[s2] != code[s2 + 1]
            out_k.append(k[s2][ch])
            out_s.append(np.full(int(ch.sum()), "changed", object))
        if not out_k:
            return empty
        return pa.table({
            key_col: pa.array(np.concatenate(out_k)),
            "status": pa.array(
                list(np.concatenate(out_s)), pa.string()
            ),
        })

    return both.groupby("__part").map_groups(
        compare, batch_format="pyarrow"
    )
