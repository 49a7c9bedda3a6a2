"""Windowed aggregates + sessionization over the events stream table.

The reference is strictly batch/BSP (no windows/watermarks — SURVEY
§2.10); these are custom operators per the north rule's "operators Ray
Data lacks": (a) tumbling windows = pure composition (map_batches window
key + groupby aggregate); (b) sessionization = groupby(user) +
map_groups gap-split (partitioning assumption: one user's events fit in
one group — document + salt if a user is pathological).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Mean, Sum


def tumbling_window(
    events: "ray.data.Dataset",
    ts_col: str = "ts",
    width_s: int = 3600,
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> "ray.data.Dataset":
    """Per (window_start, *keys): count + sum + mean of value."""

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64())  # µs since epoch
        w = pc.multiply(
            pc.divide(ts, width_s * 1_000_000), width_s * 1_000_000
        )
        return batch.append_column(
            "window_start", w.cast(pa.timestamp("us"))
        )

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", *keys])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )


def hopping_window(
    events: "ray.data.Dataset",
    ts_col: str = "ts",
    width_s: int = 3600,
    hop_s: int = 900,
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> "ray.data.Dataset":
    """Hopping (sliding) windows: width_s window every hop_s — each
    event lands in ``width_s // hop_s`` overlapping windows (flat emit +
    in-batch replication, then ONE groupby; hop must divide width).
    Returns (window_start, *keys, n_events, sum_value)."""
    assert width_s % hop_s == 0
    reps = width_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column(ts_col).cast(pa.int64()))
        base = ts // hop_us  # hop index containing the event
        n = ts.size
        # Window starts (base - i) * hop for i in 0..reps-1: the event
        # lies in [start, start + width) for each, by construction.
        w = (
            np.repeat(base, reps)
            - np.tile(np.arange(reps, dtype=np.int64), n)
        ) * hop_us
        cols = {"window_start": pa.array(w)}
        for c in (*keys, value_col):
            cols[c] = batch.column(c).take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), reps))
            )
        return pa.table(cols)

    return (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start", *keys])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def sessionize(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Split each user's event stream into sessions at gaps > gap_s.
    Returns (user_id, session_id, session_start, session_end, n_events).

    Physical plan (the asof_join pattern): co-locate whole users by
    ``user % n_parts`` → ONE vectorized call per partition that
    lexsorts by (user, ts) and derives every session's bounds from
    segment boundaries — no per-user group dispatch, no per-session
    Python loop. Partitioning assumption: one partition's events fit a
    worker (users are hash-spread; a pathological single user is one
    sort run, not a blowup)."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()
    gap_us = gap_s * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        user_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        u = np.asarray(group.column(user_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        if u.size == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_sess = new_user | np.r_[False, np.diff(t) > gap_us]
        seg = np.flatnonzero(new_sess)  # first event of each session
        starts = t[seg]
        ends = t[np.r_[seg[1:] - 1, u.size - 1]]
        counts = np.diff(np.r_[seg, u.size])
        users = u[seg]
        # session_id = rank within user: own index minus the index of
        # the user's first session (accumulated max over firsts).
        s_idx = np.arange(seg.size, dtype=np.int64)
        first_of_user = np.maximum.accumulate(
            np.where(new_user[seg], s_idx, -1)
        )
        sid = s_idx - first_of_user
        return pa.table(
            {
                user_col: pa.array(users),
                "session_id": pa.array(sid),
                "session_start": pa.array(starts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(ends, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(counts),
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def keyed_running(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key ordered window functions — the ROW_NUMBER / running-SUM /
    LAG family Ray Data has no native operator for. For every event:
    its rank within the key's (ts, id)-ordered stream, the running sum
    of ``value`` (in exact integer cents — FP cumsum order would flake
    hash gates), and the µs gap to the key's previous event (-1 for the
    first). Returns (id, key, seq, running_cents, gap_us).

    Physical plan: sessionize's coarse key-hash partition → ONE
    vectorized lexsort + segment-prefix kernel per partition. Whole
    keys co-locate, so partition-local prefix sums are globally exact;
    nothing is per-row or per-key Python."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts, half_away_int

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        cents = half_away_int(batch.column(value_col))
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__cents": pa.array(cents),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "seq": pa.array([], pa.int64()),
                "running_cents": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        i = np.asarray(group.column(id_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        c = np.asarray(group.column("__cents"), np.int64)
        order = np.lexsort((i, t, u))
        u, i, t, c = u[order], i[order], t[order], c[order]
        idx = np.arange(u.size, dtype=np.int64)
        new_key = np.r_[True, u[1:] != u[:-1]]
        first = np.maximum.accumulate(np.where(new_key, idx, -1))
        seq = idx - first + 1
        cs = np.cumsum(c)
        before = np.where(first > 0, cs[np.maximum(first - 1, 0)], 0)
        running = cs - before
        gap = np.r_[np.int64(0), t[1:] - t[:-1]]
        gap[new_key] = -1
        return pa.table(
            {
                id_col: pa.array(i),
                key_col: pa.array(u),
                "seq": pa.array(seq),
                "running_cents": pa.array(running),
                "gap_us": pa.array(gap),
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def rolling_sum(
    events: "ray.data.Dataset",
    window: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key moving-window aggregate — SQL's ``ROWS window-1
    PRECEDING``: for each event, the sum of ``value`` over the key's
    last ``window`` events in (ts, id) order, as exact integer cents.
    Same physical plan as keyed_running (whole keys co-locate, one
    lexsort + prefix-sum kernel per partition); the window sum is a
    cumsum difference clamped at each key's segment start, so cost is
    O(rows) regardless of window size."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts, half_away_int

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        cents = half_away_int(batch.column(value_col))
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__cents": pa.array(cents),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "window_cents": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        i = np.asarray(group.column(id_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        c = np.asarray(group.column("__cents"), np.int64)
        order = np.lexsort((i, t, u))
        u, i, c = u[order], i[order], c[order]
        idx = np.arange(u.size, dtype=np.int64)
        new_key = np.r_[True, u[1:] != u[:-1]]
        first = np.maximum.accumulate(np.where(new_key, idx, -1))
        cs = np.cumsum(c)
        lo = np.maximum(idx - window, first - 1)
        base = np.where(lo >= 0, cs[np.maximum(lo, 0)], 0)
        base[lo < 0] = 0
        return pa.table(
            {
                id_col: pa.array(i),
                key_col: pa.array(u),
                "window_cents": pa.array(cs - base),
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def keyed_sequence(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    token_col: str = "event_type",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key ordered sequence extraction (SQL's ``string_agg(x, ','
    ORDER BY ts, id)``): each key's token stream joined in event order —
    the behavior-sequence representation sequence models train on.
    Whole keys co-locate by hash; one lexsort per partition and a
    ListArray/binary_join assembles every key's string without a
    per-key loop. Returns (key, n_events, sequence)."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__tok": batch.column(token_col).cast(pa.string()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sequence": pa.array([], pa.string()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        i = np.asarray(group.column(id_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        tok = group.column("__tok")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        order = np.lexsort((i, t, u))
        u = u[order]
        tok = tok.take(pa.array(order))
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, u.size])
        offs = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)
        seqs = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), tok), ","
        )
        return pa.table(
            {
                key_col: pa.array(u[starts]),
                "n_events": pa.array(cnt.astype(np.int64)),
                "sequence": seqs,
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def first_last_touch(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    token_col: str = "event_type",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """First-/last-touch attribution: per key, the token and event id
    of its earliest and latest event in (ts, id) order — the argmin /
    argmax-by-time aggregate behind marketing attribution and session
    labeling. Same coarse key-hash plan; segment boundaries of one
    lexsort ARE the answers. Returns (key, first_id, first_token,
    last_id, last_token, n_events)."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__tok": batch.column(token_col).cast(pa.string()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "first_id": pa.array([], pa.int64()),
                "first_token": pa.array([], pa.string()),
                "last_id": pa.array([], pa.int64()),
                "last_token": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        i = np.asarray(group.column(id_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        tok = group.column("__tok")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        order = np.lexsort((i, t, u))
        u, i = u[order], i[order]
        tok = tok.take(pa.array(order))
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], u.size] - 1
        return pa.table(
            {
                key_col: pa.array(u[starts]),
                "first_id": pa.array(i[starts]),
                "first_token": tok.take(pa.array(starts)),
                "last_id": pa.array(i[ends]),
                "last_token": tok.take(pa.array(ends)),
                "n_events": pa.array(
                    (ends - starts + 1).astype(np.int64)
                ),
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def funnel(
    events: "ray.data.Dataset",
    stages: tuple[str, ...],
    key_col: str = "user_id",
    ts_col: str = "ts",
    token_col: str = "event_type",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Ordered-funnel analysis: per key, how many of the given stages
    completed IN ORDER (stage k+1 must occur STRICTLY after the
    earliest qualifying stage-k event). Returns (key, stages_reached)
    for keys that reached stage 1 — the conversion-funnel aggregate.

    Whole keys co-locate by hash; within a partition each stage is one
    vectorized pass (ts-sorted rows ⇒ the first masked row per key IS
    its earliest qualifying event; np.unique's first-occurrence index
    finds all keys' winners at once). No per-key loop; per-stage cost
    is O(rows)."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__tok": batch.column(token_col).cast(pa.string()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )
    never = np.iinfo(np.int64).max

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "stages_reached": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        t = np.asarray(group.column("__ts"), np.int64)
        tok = np.array(group.column("__tok").to_pylist(), dtype=object)
        order = np.lexsort((t, u))
        u, t, tok = u[order], t[order], tok[order]
        uk, ucode = np.unique(u, return_inverse=True)
        prev = np.full(uk.size, -1, np.int64)   # all ts >= 0 qualify
        reached = np.zeros(uk.size, np.int64)
        for s in stages:
            mask = (tok == s) & (t > prev[ucode])
            idx = np.flatnonzero(mask)
            winners, pos = np.unique(ucode[idx], return_index=True)
            prev = np.full(uk.size, never, np.int64)
            prev[winners] = t[idx[pos]]
            reached[winners] += 1
        keep = reached >= 1
        return pa.table(
            {
                key_col: pa.array(uk[keep]),
                "stages_reached": pa.array(reached[keep]),
            }
        )

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def cohort_retention(
    events: "ray.data.Dataset",
    period_s: int = 7 * 86400,
    max_k: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Cohort retention: users cohorted by the period of their FIRST
    event; for each cohort and offset k = 1..max_k, how many users
    returned (had any event) exactly k periods later — plus the cohort
    size as the k = 0 row. The period-over-period retention triangle
    every product-analytics stack computes.

    Whole users co-locate by hash; a partition reduces to per-(cohort,
    k) partial counts (distinct (user, period) pairs via one lexsort —
    a user's many events in one period count once), then one tiny
    (cohort, k)-keyed Sum combines partials. Returns (cohort_period,
    k, n) with cohort_period an absolute period index (epoch µs //
    period)."""
    from ray.data.aggregate import Sum

    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()
    period_us = period_s * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_period": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        u = np.asarray(group.column(key_col), np.int64)
        w = np.asarray(group.column("__ts"), np.int64) // period_us
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        heads = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        w0 = w[heads]                       # cohort period per user
        # Distinct (user, period) pairs.
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        uu, ww = u[keep], w[keep]
        ucode = np.searchsorted(u[heads], uu)
        k = ww - w0[ucode]
        sel = (k >= 1) & (k <= max_k)
        pairs = np.stack([w0[ucode][sel], k[sel]], axis=1)
        if pairs.size:
            uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        else:
            uniq = np.zeros((0, 2), np.int64)
            cnt = np.zeros(0, np.int64)
        cw, cc = np.unique(w0, return_counts=True)  # cohort sizes
        return pa.table(
            {
                "cohort_period": pa.array(
                    np.concatenate([uniq[:, 0], cw])
                ),
                "k": pa.array(
                    np.concatenate(
                        [uniq[:, 1], np.zeros(cw.size, np.int64)]
                    )
                ),
                "n": pa.array(
                    np.concatenate([cnt, cc]).astype(np.int64)
                ),
            }
        )

    return (
        tagged.groupby("__part")
        .map_groups(emit, batch_format="pyarrow")
        .groupby(["cohort_period", "k"])
        .aggregate(Sum("n", alias_name="n"))
    )


def transition_counts(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    token_col: str = "event_type",
    n_parts: int | None = None,
) -> "pa.Table":
    """Markov transition matrix of per-key event sequences: counts of
    adjacent (from_type → to_type) pairs in (ts, id) order — the
    behavior-model / next-event-prediction statistic (SQL:
    ``LEAD() OVER (PARTITION BY key ORDER BY ts, id)`` + GROUP BY).

    Physical plan: whole keys co-locate by the keyed_sequence coarse
    hash partition, each partition counts its pairs in-kernel (one
    lexsort + np.unique — no per-key loop), and the tiny
    (|types|² bounded) partials fold on the driver. All-integer."""
    import ray

    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col).cast(pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.int64()),
                "__tok": batch.column(token_col).cast(pa.string()),
            }
        )

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key_col), np.int64)
        ts = np.asarray(group.column("__ts"), np.int64)
        ev = np.asarray(group.column(id_col), np.int64)
        tok = group.column("__tok")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        enc = tok.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = np.asarray(enc.dictionary, dtype=object)
        codes = np.asarray(enc.indices, np.int64)
        order = np.lexsort((ev, ts, k))
        k, codes = k[order], codes[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        frm = codes[:-1][same]
        to = codes[1:][same]
        pair = frm * len(vocab) + to
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_type": pa.array(
                    list(vocab[uniq // len(vocab)]), pa.string()
                ),
                "to_type": pa.array(
                    list(vocab[uniq % len(vocab)]), pa.string()
                ),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = (
        tagged.groupby("__part")
        .map_groups(emit, batch_format="pyarrow")
        .materialize()
    )
    blocks = [
        t
        for t in ray.get(parts.to_arrow_refs())
        if "from_type" in t.column_names and t.num_rows
    ]
    if not blocks:
        return pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    allp = pa.concat_tables(blocks).to_pandas()
    out = (
        allp.groupby(["from_type", "to_type"], as_index=False)["cnt"]
        .sum()
        .sort_values(["from_type", "to_type"])
    )
    return pa.table(
        {
            "from_type": pa.array(out["from_type"], pa.string()),
            "to_type": pa.array(out["to_type"], pa.string()),
            "cnt": pa.array(out["cnt"].to_numpy().astype(np.int64)),
        }
    )


def user_trend(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key least-squares TREND of value over time, emitted as the
    exact INTEGER regression moments — slope = sxy_num / sxx_num with

        sxx_num = n·Σx² − (Σx)²,   sxy_num = n·Σxy − Σx·Σy

    over x = HOURS since the key's first event (integer division of
    the µs timestamps — hour granularity keeps (Σx)² far inside int64
    even at 1000× this event volume; seconds would overflow at ~10⁵
    events/key) and y = value cents. Keeping numerator / denominator
    as integers makes the operator rounding-free (the caller divides);
    per-entity trend extraction is the standard feature-engineering
    pass before churn/LTV models.

    Physical plan: whole keys co-locate by the coarse hash partition;
    one vectorized kernel computes every key's moments."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts, round_half_away

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(val_col), np.float64)
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "__ts": batch.column(ts_col).cast(pa.int64()),
            "__cents": pa.array(
                round_half_away(v * 100.0, 0).astype(np.int64)
            ),
        })

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sxx_num": pa.array([], pa.int64()),
            "sxy_num": pa.array([], pa.int64()),
        })
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key_col), np.int64)
        ts = np.asarray(group.column("__ts"), np.int64)
        y = np.asarray(group.column("__cents"), np.int64)
        order = np.argsort(k, kind="stable")
        k, ts, y = k[order], ts[order], y[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        n = np.diff(np.r_[starts, k.size]).astype(np.int64)
        tmin = np.minimum.reduceat(ts, starts)
        x = (ts - np.repeat(tmin, n)) // 3_600_000_000
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxx = np.add.reduceat(x * x, starts)
        sxy = np.add.reduceat(x * y, starts)
        return pa.table({
            key_col: pa.array(k[starts]),
            "n": pa.array(n),
            "sxx_num": pa.array(n * sxx - sx * sx),
            "sxy_num": pa.array(n * sxy - sx * sy),
        })

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )


def interarrival_stats(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-key inter-arrival-time statistics over the (ts, id)-ordered
    event stream: gap count, min/max gap and the LOWER MEDIAN gap (the
    ⌈n/2⌉-th smallest — an exact integer order statistic, not the
    float mid-average), all in µs. The burstiness / engagement-cadence
    features of behavioral models; keys with < 2 events emit nothing.

    Whole keys co-locate by the coarse hash partition; one lexsort per
    partition computes every key's gaps and order statistics."""
    from alp_ray.stages.relational import _part_tag
    from alp_ray.util import coarse_parts

    if n_parts is None:
        n_parts = coarse_parts()

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "__ts": batch.column(ts_col).cast(pa.int64()),
            "__id": batch.column(id_col).cast(pa.int64()),
        })

    tagged = _part_tag(
        events.map_batches(prep, batch_format="pyarrow"),
        key_col,
        n_parts,
    )

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({
            key_col: pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "min_gap_us": pa.array([], pa.int64()),
            "median_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
        })
        if key_col not in group.column_names or group.num_rows == 0:
            return empty
        k = np.asarray(group.column(key_col), np.int64)
        ts = np.asarray(group.column("__ts"), np.int64)
        ev = np.asarray(group.column("__id"), np.int64)
        order = np.lexsort((ev, ts, k))
        k, ts = k[order], ts[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        gk = k[1:][same]
        gap = (ts[1:] - ts[:-1])[same]
        order2 = np.lexsort((gap, gk))
        gk, gap = gk[order2], gap[order2]
        starts = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1]])
        n = np.diff(np.r_[starts, gk.size]).astype(np.int64)
        med_idx = starts + (n - 1) // 2
        return pa.table({
            key_col: pa.array(gk[starts]),
            "n_gaps": pa.array(n),
            "min_gap_us": pa.array(gap[starts]),
            "median_gap_us": pa.array(gap[med_idx]),
            "max_gap_us": pa.array(gap[starts + n - 1]),
        })

    return tagged.groupby("__part").map_groups(
        emit, batch_format="pyarrow"
    )
