"""Resumable partitioned-parquet sink: crash-resume semantics."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from alp_ray.sources.sink import (
    read_partitioned,
    write_partitioned,
)


def _ds(n=1000):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "val": (np.arange(n) * 7 % 13).astype(np.float64),
            }
        )
    )


def test_write_read_roundtrip(tmp_path):
    root = str(tmp_path / "out")
    res = write_partitioned(_ds(), root, "doc_id", n_parts=8)
    assert res["written"] == list(range(8)) and res["skipped"] == []
    back = read_partitioned(root).to_pandas()
    assert len(back) == 1000
    assert set(back["doc_id"]) == set(range(1000))


def test_resume_skips_finished_partitions(tmp_path):
    root = str(tmp_path / "out")
    write_partitioned(_ds(), root, "doc_id", n_parts=8)
    # Simulate a crash: partition 3 lost its marker mid-write → a
    # re-run must rewrite ONLY partition 3 and skip the other 7.
    os.remove(os.path.join(root, "part=3", "_SUCCESS"))
    for f in os.listdir(os.path.join(root, "part=3")):
        os.remove(os.path.join(root, "part=3", f))
    res = write_partitioned(_ds(), root, "doc_id", n_parts=8)
    assert res["written"] == [3]
    assert res["skipped"] == [0, 1, 2, 4, 5, 6, 7]
    back = read_partitioned(root).to_pandas()
    # No duplicates from the finished partitions, nothing missing.
    assert len(back) == 1000
    assert sorted(back["doc_id"]) == list(range(1000))


def test_half_written_partition_never_read(tmp_path):
    root = str(tmp_path / "out")
    write_partitioned(_ds(), root, "doc_id", n_parts=4)
    os.remove(os.path.join(root, "part=2", "_SUCCESS"))
    back = read_partitioned(root).to_pandas()
    assert set(back["doc_id"] % 4) == {0, 1, 3}
