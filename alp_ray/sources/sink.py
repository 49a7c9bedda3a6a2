"""Resumable partitioned-parquet sink.

North-rule requirement: output is written as one directory per key
range so a killed job resumes by SKIPPING finished partitions — never
one giant file. Complements the iteration-state checkpointing in
``alp_ray.state.checkpoint`` (which resumes mid-algorithm); this
resumes the WRITE phase.

Layout: ``root/part=<k>/*.parquet`` (hive) + ``root/part=<k>/_SUCCESS``
written only after the partition's rows are fully flushed. A re-run
lists the markers (driver-side, O(#partitions) stats), filters the
completed partitions out of the Dataset, writes only the remainder,
then marks the newly finished ones.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from alp_ray.util import coarse_parts


def _done_parts(root: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(root):
        return done
    for name in os.listdir(root):
        if name.startswith("part=") and os.path.exists(
            os.path.join(root, name, "_SUCCESS")
        ):
            done.add(int(name.split("=", 1)[1]))
    return done


def write_partitioned(
    ds: "ray.data.Dataset",
    root: str,
    key_col: str,
    n_parts: int | None = None,
    resume: bool = True,
) -> dict:
    """Write ``ds`` hive-partitioned by ``part = key % n_parts``.

    With ``resume=True`` (default), partitions that already carry a
    ``_SUCCESS`` marker are filtered out BEFORE the write (pruned at
    the map stage, so their rows never shuffle or serialize), making a
    re-run after a crash idempotent. Returns
    ``{"written": [...], "skipped": [...], "n_parts": N}``."""
    if n_parts is None:
        n_parts = coarse_parts()
    done = _done_parts(root) if resume else set()

    def tag(batch: pa.Table) -> pa.Table:
        part = np.asarray(batch.column(key_col), np.int64) % n_parts
        out = batch.append_column("part", pa.array(part))
        if done:
            keep = ~np.isin(part, np.fromiter(done, np.int64))
            out = out.filter(pa.array(keep))
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    # mode="append": completed partitions' files must survive the rerun.
    tagged.write_parquet(root, partition_cols=["part"], mode="append")
    written = []
    for name in sorted(os.listdir(root)):
        if not name.startswith("part="):
            continue
        k = int(name.split("=", 1)[1])
        marker = os.path.join(root, name, "_SUCCESS")
        if k not in done:
            with open(marker, "w") as f:
                f.write("")
            written.append(k)
    return {
        "written": written,
        "skipped": sorted(done),
        "n_parts": n_parts,
    }


def read_partitioned(
    root: str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Read back a ``write_partitioned`` directory, pruning by
    partition PATHS (Ray 2.49's parquet partition-filter pushdown is
    broken — CLAUDE.md): only `part=` dirs with a _SUCCESS marker are
    listed, so a half-written partition from a crashed run is never
    read."""
    paths = [
        os.path.join(root, f"part={k}", f)
        for k in sorted(_done_parts(root))
        for f in sorted(os.listdir(os.path.join(root, f"part={k}")))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(paths, columns=columns)
