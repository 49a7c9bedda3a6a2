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
) -> "ray.data.Dataset":
    """Split each user's event stream into sessions at gaps > gap_s.
    Returns (user_id, session_id, session_start, session_end, n_events)."""

    def split(group: pa.Table) -> pa.Table:
        ts = np.asarray(group.column(ts_col).cast(pa.int64()))
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        user = group.column(user_col)[0].as_py()
        gaps = np.diff(ts) > gap_s * 1_000_000
        session_of = np.zeros(ts.size, np.int64)
        if gaps.size:
            session_of[1:] = np.cumsum(gaps)
        n_sessions = int(session_of[-1]) + 1 if ts.size else 0
        starts = np.empty(n_sessions, np.int64)
        ends = np.empty(n_sessions, np.int64)
        counts = np.empty(n_sessions, np.int64)
        for s in range(n_sessions):
            mask = session_of == s
            starts[s] = ts[mask].min()
            ends[s] = ts[mask].max()
            counts[s] = mask.sum()
        return pa.table(
            {
                user_col: pa.array(np.full(n_sessions, user, np.int64)),
                "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
                "session_start": pa.array(starts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(ends, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(counts),
            }
        )

    return events.groupby(user_col).map_groups(
        split, batch_format="pyarrow"
    )
