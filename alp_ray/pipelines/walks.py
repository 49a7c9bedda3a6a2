"""Deterministic random-walk sampling (the DeepWalk/node2vec input
stage of graph-ML training pipelines; not in the reference, whose
algorithm set stops at traversals — SURVEY §2.7).

Walks are DETERMINISTIC: step t from vertex c of walk w moves to the
``h(w, t, c) % outdeg(c)``-th smallest out-neighbour (dangling vertices
absorb), with an integer mix hash — reproducible across runs/engines
and exactly SQL-expressible (ROW_NUMBER neighbour ranks + the same
arithmetic), so the driver oracle is bit-exact.

Physical plan: the adjacency CSR (neighbours sorted per source) is
built ONCE in a worker task and broadcast by ref; walk batches advance
all their walks one step at a time fully vectorized. Scale path: for
graphs beyond one object, replace the broadcast with an iterative
frontier join per step (same hash ⇒ same walks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_M31 = 2147483647


def _mix(w: np.ndarray, t: int, c: np.ndarray) -> np.ndarray:
    """Integer step hash — mirrored verbatim by the SQL twin."""
    return (w * 1000003 + t * 10007 + c * 257) % _M31


@ray.remote(num_returns=2)
def _build_csr(n: int, *tables: pa.Table) -> tuple:
    from alp_ray.util import concat_blocks

    t = concat_blocks(
        list(tables), columns={"src": pa.int64(), "dst": pa.int64()}
    )
    src = np.asarray(t.column("src"), np.int64)
    dst = np.asarray(t.column("dst"), np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(n + 1))
    return (indptr, dst), n


class _WalkStage:
    def __init__(self, bundle_ref, steps: int) -> None:
        self.indptr, self.nbrs = ray.get(bundle_ref)
        self.steps = steps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("id"), np.int64)
        cur = ids.copy()
        out_w = [ids]
        out_t = [np.zeros(ids.size, np.int64)]
        out_v = [cur.copy()]
        for t in range(1, self.steps + 1):
            deg = self.indptr[cur + 1] - self.indptr[cur]
            h = _mix(ids, t, cur)
            has = deg > 0
            if self.nbrs.size:
                pick = self.indptr[cur] + np.where(
                    has, h % np.maximum(deg, 1), 0
                )
                nxt = self.nbrs[np.minimum(pick, self.nbrs.size - 1)]
                cur = np.where(has, nxt, cur)
            # no edges at all: every vertex absorbs in place
            out_w.append(ids)
            out_t.append(np.full(ids.size, t, np.int64))
            out_v.append(cur.copy())
        return pa.table(
            {
                "walk_id": np.concatenate(out_w),
                "step": np.concatenate(out_t),
                "vertex": np.concatenate(out_v),
            }
        )


def random_walks(
    edges: "ray.data.Dataset",
    n: int,
    steps: int = 4,
    seeds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """One walk per seed (default: every vertex 0..n-1); returns
    (walk_id, step, vertex) rows for steps 0..steps."""
    bundle_ref, _ = _build_csr.remote(n, *edges.to_arrow_refs())
    if seeds is None:
        seeds = ray.data.range(n)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return seeds.map_batches(
        _WalkStage,
        fn_constructor_args=(bundle_ref, steps),
        batch_format="pyarrow",
        concurrency=(1, max(2, cpus)),
    )
