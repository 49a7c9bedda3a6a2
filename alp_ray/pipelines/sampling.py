"""GraphSAGE-style multi-hop neighbor sampling (Hamilton et al.,
"Inductive Representation Learning on Large Graphs", NeurIPS 2017) —
the minibatch-subgraph extraction step a training pipeline runs per
batch of seed vertices.

Determinism contract: neighbors of each frontier vertex are ranked by
the arithmetic hash ``(src·1000003 + dst·7919) % 1000000007`` with dst
as the tiebreaker (builtin ``hash()`` is salted per process — never
usable for this), so the sample is reproducible across runs, engines
and SQL (``ROW_NUMBER() OVER (PARTITION BY src ORDER BY hash, dst)``).

Scale shape: each hop is ONE pass over the edge table — a broadcast
membership filter (the frontier is bounded by the fanout budget
Σ|seeds|·Πk_i, tiny by construction for minibatch sampling) followed by
``topk_per_group``'s two-stage partial top-k (≤ k rows per (vertex,
block) ever shuffle). No driver loop over vertices; the only
driver-side state is the bounded frontier id array itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from alp_ray.stages.relational import topk_per_group

_A, _B, _M = 1_000_003, 7_919, 1_000_000_007


def _rank_hash(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    return (src * _A + dst * _B) % _M


def neighbor_sample(
    edges: "ray.data.Dataset",
    seeds,
    fanouts: tuple[int, ...] = (5, 3),
) -> "ray.data.Dataset":
    """Sampled edge list ``(src, dst, hop)`` for a multi-hop frontier
    expansion from ``seeds``: hop h keeps the ``fanouts[h-1]``
    lowest-hash out-neighbors of every frontier vertex. The next
    frontier is the sampled dsts minus every vertex already expanded
    (each vertex is expanded at most once). ``edges`` must be distinct
    (duplicate rows would double-enter the ranking).
    """
    frontier = np.unique(np.asarray(seeds, np.int64))
    used = frontier.copy()
    hops: list["ray.data.Dataset"] = []
    for hop, k in enumerate(fanouts, 1):
        if frontier.size == 0:
            break
        fref = ray.put(np.sort(frontier))

        def cand(batch: pa.Table, _fref=fref) -> pa.Table:
            f = ray.get(_fref)
            s = np.asarray(batch.column("src"), np.int64)
            d = np.asarray(batch.column("dst"), np.int64)
            pos = np.searchsorted(f, s)
            keep = (pos < f.size) & (f[np.clip(pos, 0, f.size - 1)] == s)
            s, d = s[keep], d[keep]
            # topk_per_group ranks DESC — negate (|hash| < 2^30 is
            # exact in float64).
            return pa.table(
                {
                    "src": s,
                    "dst": d,
                    "__negh": -_rank_hash(s, d).astype(np.float64),
                }
            )

        picked = topk_per_group(
            edges.map_batches(cand, batch_format="pyarrow"),
            key="src",
            order_col="__negh",
            tie_col="dst",
            k=k,
        ).materialize()
        if picked.count() == 0:
            # No frontier vertex has an out-edge — blocks past the
            # empty groupby lose the schema, so stop before touching
            # their columns.
            break

        def out(batch: pa.Table, _h=hop) -> pa.Table:
            if "src" not in batch.column_names:
                # Empty sort partitions surface as column-less blocks
                # (they bypass the map_groups UDF) — normalize.
                return pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "hop": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "src": batch.column("src").cast(pa.int64()),
                    "dst": batch.column("dst").cast(pa.int64()),
                    "hop": pa.array(
                        np.full(batch.num_rows, _h, np.int64)
                    ),
                }
            )

        hops.append(picked.map_batches(out, batch_format="pyarrow"))
        # Bounded driver collect: ≤ |frontier|·k sampled dsts.
        dsts = np.unique(
            np.concatenate(
                [
                    np.asarray(t.column("dst"), np.int64)
                    for t in ray.get(picked.to_arrow_refs())
                    if "dst" in t.column_names
                ]
                or [np.empty(0, np.int64)]
            )
        )
        frontier = np.setdiff1d(dsts, used)
        used = np.union1d(used, frontier)
    if not hops:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "hop": pa.array([], pa.int64()),
                }
            )
        )
    out_ds = hops[0]
    for h in hops[1:]:
        out_ds = out_ds.union(h)
    return out_ds


def neighbor_sample_numpy(
    src: np.ndarray,
    dst: np.ndarray,
    seeds,
    fanouts: tuple[int, ...] = (5, 3),
) -> list[tuple[int, int, int]]:
    """Sequential oracle (tests): same hash ranking, same frontier
    semantics."""
    frontier = sorted(set(int(s) for s in seeds))
    used = set(frontier)
    out: list[tuple[int, int, int]] = []
    adj: dict[int, list[int]] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, []).append(d)
    for hop, k in enumerate(fanouts, 1):
        nxt = set()
        for v in frontier:
            nbrs = sorted(
                set(adj.get(v, [])),
                key=lambda d: ((v * _A + d * _B) % _M, d),
            )[:k]
            for d in nbrs:
                out.append((v, d, hop))
                nxt.add(d)
        frontier = sorted(nxt - used)
        used |= set(frontier)
    return out
