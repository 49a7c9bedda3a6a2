"""Checkpoint/resume equivalence (north rule: resumable from checkpoint)."""

import json
import os

import numpy as np

from alp_ray.pipelines.pagerank import pagerank
from alp_ray.state.checkpoint import Checkpointer
from alp_ray.state.engine import GraphEngine


def _graph(seed=5, n=80, m=400):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx], n


def test_resume_equals_uninterrupted(tmp_path):
    src, dst, n = _graph()
    # Uninterrupted run (sync_every=1: exact per-iteration stop, same
    # discipline the checkpointed/resumed run uses — the equivalence
    # claim is then bitwise up to FP reduction order).
    e1 = GraphEngine.from_arrays(src, dst, n=n, P=3)
    pagerank(e1, conv=1e-9, sync_every=1)
    pr_full = e1.get_state_by_vertex("pr")
    e1.shutdown()

    # Interrupted: run 5 iterations with checkpointing, "kill", resume.
    ckpt = Checkpointer(str(tmp_path / "ck"), every=1)
    e2 = GraphEngine.from_arrays(src, dst, n=n, P=3)
    pagerank(e2, conv=1e-9, max_iters=5, checkpointer=ckpt)
    e2.shutdown()  # the kill

    e3 = GraphEngine.from_arrays(src, dst, n=n, P=3)
    res = pagerank(e3, conv=1e-9, checkpointer=ckpt)
    pr_resumed = e3.get_state_by_vertex("pr")
    e3.shutdown()

    assert res.converged
    np.testing.assert_allclose(pr_resumed, pr_full, atol=1e-12)


def test_manifest_contents_and_lineage(tmp_path):
    src, dst, n = _graph(seed=6)
    ckpt = Checkpointer(str(tmp_path / "ck"), every=2)
    e = GraphEngine.from_arrays(src, dst, n=n, P=3)
    pagerank(e, conv=1e-9, max_iters=6, checkpointer=ckpt)
    e.shutdown()
    latest = ckpt.latest()
    assert latest["iteration"] == 6
    assert latest["P"] == 3 and latest["n"] == n
    assert "residual" in latest["metrics"]
    assert len(latest["partitions"]) == 3
    assert sum(p["rows"] for p in latest["partitions"]) == n
    for p in latest["partitions"]:
        assert os.path.exists(p["path"])


def test_partitioning_mismatch_rejected(tmp_path):
    src, dst, n = _graph(seed=7)
    ckpt = Checkpointer(str(tmp_path / "ck"), every=1)
    e = GraphEngine.from_arrays(src, dst, n=n, P=3)
    pagerank(e, conv=1e-9, max_iters=2, checkpointer=ckpt)
    e.shutdown()
    e2 = GraphEngine.from_arrays(src, dst, n=n, P=4)
    try:
        ckpt.try_resume(e2, ["pr"])
        raised = False
    except ValueError:
        raised = True
    finally:
        e2.shutdown()
    assert raised


def test_torn_checkpoint_ignored(tmp_path):
    """A checkpoint dir without a complete MANIFEST (kill mid-write)
    must be invisible to resume."""
    src, dst, n = _graph(seed=8)
    ckpt = Checkpointer(str(tmp_path / "ck"), every=1)
    e = GraphEngine.from_arrays(src, dst, n=n, P=3)
    pagerank(e, conv=1e-9, max_iters=3, checkpointer=ckpt)
    e.shutdown()
    # Simulate a kill mid-checkpoint: iter_000009 dir with data files but
    # no manifest.
    torn = tmp_path / "ck" / "iter_000009"
    torn.mkdir()
    (torn / "part_00000.parquet").write_bytes(b"garbage")
    latest = ckpt.latest()
    assert latest["iteration"] == 3  # torn dir ignored
