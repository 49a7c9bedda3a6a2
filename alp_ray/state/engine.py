"""GraphShard actor engine — the performance path for iterative algorithms.

≙ the reference's execution model: the matrix is ingested ONCE into
compressed storage (CRS+CCS, reference/matrix.hpp:912-930) and every
primitive then runs over the resident structure; vectors are process-local
slices and only small messages/collectives cross process boundaries
(BSP1D distribution, bsp1d/distribution.hpp:42-96 — except we replace its
"allgather the whole input vector" (noted there to not scale) with a
partitioned sparse exchange).

Design
------
- Vertices are dense ids ``0..n-1``; vertex ``v`` lives on shard ``v % P``
  at local index ``v // P`` (modulo partitioning — no boundary table, and
  consecutive ids scatter across shards which de-skews id-correlated load).
- Shard ``p`` holds the CSC-like compressed block of all edges with
  ``src % P == p``, lexsorted by ``(dst % P, dst)`` so (a) contributions to
  each destination shard are a contiguous slice and (b) per-destination
  combine is a vectorized ``ufunc.reduceat`` over precomputed segment
  starts — the SPA of reference/coordinates.hpp re-expressed as sort-based
  segment reduction.
- Vertex state (pr, labels, degrees, masks) lives ON the shards in a
  ``dict[str, np.ndarray]`` and never moves; a superstep is:

    1. ``scatter`` on every shard: a user ``pre_fn`` derives the message
       vector x from local state (≙ eWiseLambda, base/blas1.hpp:3746), the
       semiring's mul produces per-edge contributions gathered at
       ``x[src_local]``, the add monoid segment-reduces per destination,
       and the shard returns P sparse partials ``(dst_local_ids, vals)`` —
       one per destination shard — via ``num_returns=P(+1)`` so partials
       flow shard→shard through the object store without driver copies
       (+1: a small dict of scalar partials from pre_fn, e.g. PageRank's
       dangling mass — ≙ masked foldl + allreduce,
       simple_pagerank.hpp:312-314, collectives.hpp:121).
    2. ``gather`` on every shard: merge the P incoming partials (concat +
       lexsort + reduceat), materialize the dense local y (identity-filled),
       and run a user ``post_fn(state, y, scalars)`` that updates state and
       returns scalar partials (residuals, change counts) — reduced
       driver-side (≙ collectives allreduce).

At cluster scale the same layout holds: P = #workers × cores, shards are
placed by Ray, and the only per-iteration traffic is the P×P sparse partial
exchange (bounded by nnz, not n²) plus O(P) scalars to the driver.

Skew notes (SURVEY §7.8):
- Hot DESTINATIONS (popular files imported everywhere) are cheap by
  construction: each scatter pre-reduces per (shard, dst), so a hot dst
  receives at most P partial entries per superstep regardless of its
  in-degree — the salt-split/two-stage-reduce the north rule asks for is
  built into the exchange.
- Hot SOURCES concentrate scatter work on the owner shard (edges are
  partitioned by src so x never moves). Modulo partitioning decorrelates
  id-adjacent hubs, but a single vertex with an extreme out-degree still
  lands whole. The engine's dual physical form is the mitigation: the
  Dataset scatter+shuffle spmv (stages/graph.py) partitions by EDGE
  blocks (perfectly balanced) at the cost of shuffling contributions —
  use it for iterations over graphs with pathological out-degree skew,
  exactly like the reference's gather-vs-scatter kernel choice
  (reference/blas2.hpp:1132 cost model).
"""

from __future__ import annotations

from typing import Any, Callable

from ray import cloudpickle as pickle

import numpy as np
import pyarrow as pa

import ray

from alp_ray.functions.semiring import SEMIRINGS, Monoid, Semiring


def _part_of(v: np.ndarray, P: int) -> np.ndarray:
    return v % P


def _local_of(v: np.ndarray, P: int) -> np.ndarray:
    return v // P


def local_size(n: int, P: int, p: int) -> int:
    """Number of vertices on shard p: |{v < n : v % P == p}|."""
    return (n - p + P - 1) // P if p < n else 0


def _merge_sparse(
    partials: list[tuple[np.ndarray, np.ndarray]], monoid: Monoid
) -> tuple[np.ndarray, np.ndarray]:
    """Combine per-shard sparse partials (ids already reduced within each)."""
    parts = [p for p in partials if p is not None and len(p[0])]
    if not parts:
        return np.empty(0, np.int64), np.empty(0)
    ids = np.concatenate([p[0] for p in parts])
    vals = np.concatenate([p[1] for p in parts])
    order = np.argsort(ids, kind="stable")
    ids, vals = ids[order], vals[order]
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    return ids[starts], monoid.segment_reduce(vals, starts)


@ray.remote
class GraphShard:
    """One partition of the graph + its vertex-state slice."""

    def __init__(
        self,
        part: int,
        P: int,
        n: int,
        edges: tuple[np.ndarray, np.ndarray, np.ndarray | None] | None = None,
        parquet_path: str | None = None,
        synth: dict | None = None,
        deferred: bool = False,
        dedupe: bool = False,
    ) -> None:
        self.part = part
        self.P = P
        self.n = n
        self.n_local = local_size(n, P, part)
        self.state: dict[str, np.ndarray] = {}
        self._dedupe = dedupe
        if deferred:
            # Streaming ingest (GraphEngine.from_dataset): edge chunks
            # arrive via ingest_block from map_batches workers — through
            # the object store, never the driver — then finalize_build
            # compresses once (≙ buildMatrixUnique's PARALLEL IOMode with
            # each process receiving its partition of the nonzero
            # stream, base/io.hpp:1336 + iomode.hpp).
            self._pending: list[tuple] = []
            return
        if synth is not None:
            # Parallel synthetic build: each shard deterministically
            # generates its own residue class of a zipf-skewed random
            # graph (bench scale probe) — no driver-side edge array.
            rng = np.random.RandomState(synth["seed"] * 7919 + part)
            m_local = synth["m"] // P
            src_local = rng.randint(0, self.n_local, m_local)
            src = src_local * P + part
            dst = (rng.zipf(synth.get("a", 1.3), m_local) % n).astype(
                np.int64
            )
            keep = src != dst
            src, dst, w = src[keep].astype(np.int64), dst[keep], None
        elif parquet_path is not None:
            import pyarrow.dataset as pads

            # PARALLEL IOMode (iomode.hpp): each shard ingests exactly its
            # hive partition of the once-written partitioned edge store.
            dset = pads.dataset(parquet_path, partitioning="hive")
            t = dset.to_table(filter=pads.field("part") == part)
            src = t.column("src").to_numpy().astype(np.int64)
            dst = t.column("dst").to_numpy().astype(np.int64)
            w = (
                t.column("weight").to_numpy().astype(np.float64)
                if "weight" in t.column_names
                else None
            )
        else:
            src, dst, w = edges
        self._build(src, dst, w)

    def ingest_block(
        self, src: np.ndarray, dst: np.ndarray, w: np.ndarray | None
    ) -> int:
        self._pending.append((src, dst, w))
        return int(src.size)

    def finalize_build(self) -> int:
        """Concatenate ingested chunks, build compressed storage, free
        the staging buffers. Returns this shard's edge count."""
        if self._pending:
            src = np.concatenate([p[0] for p in self._pending])
            dst = np.concatenate([p[1] for p in self._pending])
            ws = [p[2] for p in self._pending]
            w = (
                np.concatenate(ws)
                if all(x is not None for x in ws)
                else None
            )
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            w = None
        self._pending = []
        if self._dedupe and src.size:
            # Shard-local distinct == global distinct (edges are
            # partitioned by src), so ingestion-time dedup replaces the
            # upstream groupby shuffle — exactly buildMatrixUnique's
            # no-duplicates ingestion contract enforced at build.
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            if w is not None:
                w = w[order]
            keep = np.r_[
                True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            ]
            src, dst = src[keep], dst[keep]
            if w is not None:
                w = w[keep]
        self._build(src, dst, w)
        return self.m_local

    def state_table(self, names: list[str]) -> pa.Table:
        """(vertex, *state columns) as one Arrow block — stays in the
        object store (callers wrap the refs in a Dataset)."""
        cols: dict = {"vertex": self.vertex_ids()}
        for nm in names:
            cols[nm] = self.state[nm]
        return pa.table(cols)

    def _build(
        self, src: np.ndarray, dst: np.ndarray, w: np.ndarray | None
    ) -> None:
        P = self.P
        assert src.size == 0 or np.all(src % P == self.part)
        dst_part = _part_of(dst, P)
        # src is the final tiebreaker: without it, edge order within a dst
        # segment is ingest-block ARRIVAL order (nondeterministic under
        # streaming from_dataset ingest), so segment_reduce's FP summation
        # order — and hence iterative solvers' last-ulp outputs — would
        # vary run to run.
        order = np.lexsort((src, dst, dst_part))
        src, dst, dst_part = src[order], dst[order], dst_part[order]
        self.src_local = _local_of(src, P)
        self.w = w[order].astype(np.float64) if w is not None else None
        self.m_local = int(src.size)
        # Per-unique-dst segments (contiguous after the lexsort).
        if dst.size:
            seg_starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            self.seg_starts = seg_starts
            self.out_dst_local = _local_of(dst[seg_starts], P)
            seg_parts = dst_part[seg_starts]
            # Slice of unique-dst indices belonging to each dest shard.
            self.qbounds = np.searchsorted(seg_parts, np.arange(P + 1))
        else:
            self.seg_starts = np.empty(0, np.int64)
            self.out_dst_local = np.empty(0, np.int64)
            self.qbounds = np.zeros(P + 1, np.int64)
        self.dst = dst

    # ---- state management (≙ grb::set / buildVector, base/io.hpp) ----
    def set_state(self, name: str, value: Any) -> int:
        if np.isscalar(value):
            self.state[name] = np.full(self.n_local, value, dtype=np.float64)
        else:
            arr = np.asarray(value)
            assert arr.shape[0] == self.n_local
            self.state[name] = arr.copy()
        return self.n_local

    def set_state_use_index(self, name: str) -> None:
        """≙ set<descriptors::use_index> (descriptors.hpp:167): value ← id."""
        self.state[name] = np.arange(
            self.part, self.n, self.P, dtype=np.float64
        )

    def get_state(self, name: str) -> np.ndarray:
        return self.state[name]

    def vertex_ids(self) -> np.ndarray:
        return np.arange(self.part, self.n, self.P, dtype=np.int64)

    def dump_edges(self) -> tuple:
        """(src, dst, w) of the ACTIVE edge set, global ids — test/debug
        oracle extraction; O(m_local), never on a hot path."""
        src = self.src_local * self.P + self.part
        return src, self.dst.copy(), (
            self.w.copy() if self.w is not None else None
        )

    def num_edges(self) -> int:
        return self.m_local

    def compute_out_degrees(self, name: str = "outdeg") -> None:
        """Shard-local out-degrees (edges are partitioned by src, so this
        needs no communication) — ≙ the pattern-semiring row-sum vxm
        (simple_pagerank.hpp:210-222) but free under our partitioning.
        Hot-split sources keep their ORIGINAL out-degree (their edges
        were re-homed, not deleted)."""
        deg = np.bincount(
            self.src_local, minlength=self.n_local
        ).astype(np.float64)
        hot = getattr(self, "hot_local", None)
        if hot is not None and hot.size:
            deg[hot] += self.hot_outdeg
        self.state[name] = deg

    def compute_out_weight_sums(self, name: str = "wsum") -> None:
        """Shard-local Σ edge-weight per src (weighted out-degree) — the
        weighted-PageRank normalizer; free under src-partitioning like
        compute_out_degrees. Integer weights sum exactly in float64.
        Must run BEFORE any hot-source split (re-homed edges would need
        their weight totals tracked like hot_outdeg)."""
        assert self.w is not None, "engine has no edge weights"
        hot = getattr(self, "hot_local", None)
        assert hot is None or hot.size == 0, (
            "compute_out_weight_sums before extract_hot_sources"
        )
        self.state[name] = np.bincount(
            self.src_local, weights=self.w, minlength=self.n_local
        ).astype(np.float64)

    def map_local(self, fn_bytes: bytes, scalars: dict | None = None) -> Any:
        """≙ eWiseLambda over local slices; fn(state, ctx) -> scalar partials."""
        fn = pickle.loads(fn_bytes)
        return fn(self.state, self._ctx(scalars))

    def _ctx(self, scalars: dict | None = None) -> dict:
        return {
            "part": self.part,
            "P": self.P,
            "n": self.n,
            "n_local": self.n_local,
            "m_local": self.m_local,
            "scalars": scalars or {},
        }

    # ---- superstep phase 1 (≙ vxm_generic, reference/blas2.hpp:870) ----
    def scatter(
        self,
        pre_fn_bytes: bytes,
        semiring_name: str,
        scalars: dict | None = None,
    ):
        """Returns P sparse partials + 1 scalar dict (num_returns=P+1)."""
        if scalars and scalars.get("_edges_key") is not None:
            self.use_edges(scalars["_edges_key"])
        sr = SEMIRINGS[semiring_name]
        pre = pickle.loads(pre_fn_bytes)
        out = pre(self.state, self._ctx(scalars))
        if isinstance(out, tuple) and len(out) == 3:
            x, active, pre_scalars = out
        elif isinstance(out, tuple):
            x, active = out
            pre_scalars = {}
        else:
            x, active, pre_scalars = out, None, {}
        w = self.w if self.w is not None else None
        results: list[tuple[np.ndarray, np.ndarray] | None] = []
        if active is None:
            # Dense frontier: precomputed segments, pure reduceat.
            xs = x[self.src_local]
            wv = w if w is not None else np.ones(self.m_local)
            contrib = sr.mul(xs, wv if xs.ndim == 1 else wv[:, None])
            if self.m_local:
                seg_vals = sr.add.segment_reduce(contrib, self.seg_starts)
            else:
                seg_vals = np.empty(0)
            for q in range(self.P):
                lo, hi = self.qbounds[q], self.qbounds[q + 1]
                if hi > lo:
                    results.append(
                        (self.out_dst_local[lo:hi], seg_vals[lo:hi])
                    )
                else:
                    results.append(None)
        else:
            # Sparse frontier (≙ active-set sparsification,
            # pregel.hpp:826-837): mask edges by active source, re-segment.
            mask = active[self.src_local]
            dst = self.dst[mask]
            xs = x[self.src_local[mask]]
            ws = w[mask] if w is not None else np.ones(xs.shape[0])
            contrib = sr.mul(xs, ws if xs.ndim == 1 else ws[:, None])
            # Group by (dest shard, dst) so per-shard slices are contiguous
            # AND u_part below is sorted for searchsorted.
            order = np.lexsort((dst, _part_of(dst, self.P)))
            dst, contrib = dst[order], contrib[order]
            if dst.size:
                starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
                u_dst = dst[starts]
                vals = sr.add.segment_reduce(contrib, starts)
                u_part = _part_of(u_dst, self.P)
                qb = np.searchsorted(u_part, np.arange(self.P + 1))
                for q in range(self.P):
                    lo, hi = qb[q], qb[q + 1]
                    if hi > lo:
                        results.append(
                            (_local_of(u_dst[lo:hi], self.P), vals[lo:hi])
                        )
                    else:
                        results.append(None)
            else:
                results = [None] * self.P
        return (*results, pre_scalars)

    # ---- superstep phase 2 (combine + update; ≙ fold/eWise + allreduce) ----
    def gather(
        self,
        semiring_name: str,
        post_fn_bytes: bytes,
        scalars: dict | None,
        *partials,
    ) -> dict:
        sr = SEMIRINGS[semiring_name]
        post = pickle.loads(post_fn_bytes)
        ncols = int(scalars["_ncols"]) if scalars and "_ncols" in scalars \
            else None
        shape = self.n_local if ncols is None else (self.n_local, ncols)
        y = np.full(shape, sr.add.identity, dtype=np.float64)
        # Each partial has unique, per-shard-reduced ids → dense accumulate
        # is a plain gather/ufunc/scatter per partial, O(total nnz), no sort
        # (the SPA merge, vectorized).
        for p in partials:
            if p is None or len(p[0]) == 0:
                continue
            ids, vals = p
            y[ids] = sr.add.ufunc(y[ids], vals)
        out = post(self.state, y, self._ctx(scalars))
        return out or {}

    def scatter_packed(
        self,
        pre_fn_bytes: bytes,
        semiring_name: str,
        scalars: dict | None = None,
    ) -> tuple:
        """Packed variant of ``scatter``: ONE object
        ``(ids, vals, offsets, scalar_dict)`` where the per-destination
        partial for shard q is ``ids[offsets[q]:offsets[q+1]]`` (and same
        for vals). Three arrays per bundle regardless of P — readers map
        the plasma buffers zero-copy and slice, so per-gather
        deserialization is O(P) array views, not O(P²). The dense-frontier
        path emits its precomputed contiguous layout with no extra copy.
        On a multi-node cluster prefer the ``split`` exchange so only
        column q ships to shard q."""
        if scalars and scalars.get("_edges_key") is not None:
            self.use_edges(scalars["_edges_key"])
        sr = SEMIRINGS[semiring_name]
        pre = pickle.loads(pre_fn_bytes)
        out = pre(self.state, self._ctx(scalars))
        if isinstance(out, tuple) and len(out) == 3:
            x, active, pre_scalars = out
        elif isinstance(out, tuple):
            x, active = out
            pre_scalars = {}
        else:
            x, active, pre_scalars = out, None, {}
        w = self.w
        hx_ids, hx = self._hot_x_out(x)
        if active is not None and hx_ids.size:
            keep = active[self.hot_local]
            hx_ids, hx = hx_ids[keep], hx[keep]
        if active is None:
            xs = x[self.src_local]
            wv = w if w is not None else self._ones()
            contrib = sr.mul(xs, wv if xs.ndim == 1 else wv[:, None])
            if self.m_local:
                seg_vals = sr.add.segment_reduce(contrib, self.seg_starts)
            else:
                seg_vals = np.empty(0)
            return (
                self.out_dst_local, seg_vals, self.qbounds,
                pre_scalars, hx_ids, hx,
            )
        # Sparse frontier: mask by active source, re-segment (grouped by
        # (dest shard, dst) so the packed layout holds).
        mask = active[self.src_local]
        dst = self.dst[mask]
        xs = x[self.src_local[mask]]
        ws = w[mask] if w is not None else np.ones(xs.shape[0])
        contrib = sr.mul(xs, ws if xs.ndim == 1 else ws[:, None])
        order = np.lexsort((dst, _part_of(dst, self.P)))
        dst, contrib = dst[order], contrib[order]
        if dst.size:
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            u_dst = dst[starts]
            vals = sr.add.segment_reduce(contrib, starts)
            u_part = _part_of(u_dst, self.P)
            qb = np.searchsorted(u_part, np.arange(self.P + 1))
            return (
                _local_of(u_dst, self.P), vals, qb,
                pre_scalars, hx_ids, hx,
            )
        return (
            np.empty(0, np.int64),
            np.empty(0),
            np.zeros(self.P + 1, np.int64),
            pre_scalars,
            hx_ids,
            hx,
        )

    # ---- hot-source split (skew guard, SURVEY §7.8) -------------------
    #
    # A source with extreme out-degree concentrates scatter work on its
    # owner shard (edges are partitioned by src). The split re-homes a
    # hot vertex's edges to their DESTINATION shards at build time;
    # each superstep the owner ships only the hot x VALUES (O(#hot)
    # scalars riding the existing bundle), and every gather applies its
    # local slice of hot contributions — work spreads by dst, semantics
    # unchanged (FP sum order differs, as with any repartition).

    def extract_hot_sources(self, threshold: int):
        """Remove local sources with out-degree > threshold from the
        resident storage; returns P packages (one per destination
        shard): (hot_src_global, dst_local, w). Call with
        num_returns=P so packages flow shard→shard."""
        deg = np.bincount(self.src_local, minlength=self.n_local)
        hot_local = np.flatnonzero(deg > threshold)
        self.hot_local = hot_local
        self.hot_outdeg = deg[hot_local].astype(np.float64)
        if hot_local.size == 0:
            z = np.empty(0, np.int64)
            empty = (z, z, np.empty(0))
            return tuple(empty for _ in range(self.P)) if self.P > 1 \
                else (empty,)
        is_hot = np.zeros(self.n_local, bool)
        is_hot[hot_local] = True
        mask = is_hot[self.src_local]
        # self.src_local/self.dst/self.w are in (dst_part, dst) order.
        h_src = self.src_local[mask] * self.P + self.part  # global ids
        h_dst = self.dst[mask]
        h_w = (
            self.w[mask] if self.w is not None
            else np.ones(int(mask.sum()))
        )
        keep = ~mask
        w_keep = self.w[keep] if self.w is not None else None
        self._build(
            self.src_local[keep] * self.P + self.part,
            self.dst[keep],
            w_keep,
        )
        h_part = _part_of(h_dst, self.P)
        order = np.argsort(h_part, kind="stable")
        h_src, h_dst, h_w = h_src[order], h_dst[order], h_w[order]
        qb = np.searchsorted(h_part[order], np.arange(self.P + 1))
        out = []
        for q in range(self.P):
            lo, hi = qb[q], qb[q + 1]
            out.append(
                (
                    h_src[lo:hi],
                    _local_of(h_dst[lo:hi], self.P),
                    h_w[lo:hi],
                )
            )
        return tuple(out) if self.P > 1 else (out[0],)

    def install_hot_edges(self, *packages) -> int:
        """Receive re-homed hot edges (this shard owns their DSTS).
        Stored as per-hot-source segments sorted by global source id."""
        srcs = np.concatenate([p[0] for p in packages]) if packages \
            else np.empty(0, np.int64)
        dsts = np.concatenate([p[1] for p in packages]) if packages \
            else np.empty(0, np.int64)
        ws = np.concatenate([p[2] for p in packages]) if packages \
            else np.empty(0)
        order = np.lexsort((dsts, srcs))
        srcs, dsts, ws = srcs[order], dsts[order], ws[order]
        starts = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1]]) \
            if srcs.size else np.empty(0, np.int64)
        self.hot_in_ids = srcs[starts] if srcs.size else srcs
        self.hot_in_bounds = np.r_[starts, srcs.size] if srcs.size \
            else np.zeros(1, np.int64)
        self.hot_in_dst = dsts
        self.hot_in_w = ws
        return int(srcs.size)

    def _hot_x_out(self, x: np.ndarray) -> tuple:
        hot = getattr(self, "hot_local", None)
        if hot is None or hot.size == 0:
            return np.empty(0, np.int64), np.empty(0)
        return hot * self.P + self.part, x[hot]

    def _apply_hot(self, sr, y: np.ndarray, bundles) -> None:
        ids_sorted = getattr(self, "hot_in_ids", None)
        if ids_sorted is None or ids_sorted.size == 0:
            return
        for b in bundles:
            h_ids, h_x = b[-2], b[-1]
            if len(h_ids) == 0:
                continue
            pos = np.searchsorted(ids_sorted, h_ids)
            pos_c = np.clip(pos, 0, ids_sorted.size - 1)
            for j in np.flatnonzero(ids_sorted[pos_c] == h_ids):
                seg = slice(
                    self.hot_in_bounds[pos_c[j]],
                    self.hot_in_bounds[pos_c[j] + 1],
                )
                dl = self.hot_in_dst[seg]
                contrib = sr.mul(
                    np.full(dl.size, h_x[j]), self.hot_in_w[seg]
                )
                # dsts unique within one hot source's local segment.
                y[dl] = sr.add.ufunc(y[dl], contrib)

    # ---- keyed (non-monoid) exchange: per-(dst,label) counts ----------
    def scatter_label_counts(
        self, label_state: str = "lab", mask_state: str | None = None
    ) -> tuple:
        """Community-LPA scatter: every edge sends its source's label to
        its destination; counts are PRE-REDUCED per (dst, label) before
        leaving the shard (the non-monoid analogue of scatter_packed's
        per-dst combine). Returns one packed bundle
        ``(dst_local, label, count, qbounds)``.

        ``mask_state``: if given, only edges whose SOURCE has
        state[mask_state] > 0.5 participate (the sparse active set of
        the keyed exchange — used by coloring to send only COLORED
        neighbours' colors)."""
        lab = self.state[label_state]
        if self.m_local == 0:
            z = np.empty(0, np.int64)
            return z, z, z, np.zeros(self.P + 1, np.int64)
        le = lab[self.src_local].astype(np.int64)
        if mask_state is not None:
            sel = self.state[mask_state][self.src_local] > 0.5
            if not sel.any():
                z = np.empty(0, np.int64)
                return z, z, z, np.zeros(self.P + 1, np.int64)
            return self._label_counts_masked(le, sel)
        # (dest shard, dst, label) sort so per-shard slices are
        # contiguous AND identical (dst, label) pairs are adjacent.
        dpart = _part_of(self.dst, self.P)
        order = np.lexsort((le, self.dst, dpart))
        d_s, l_s = self.dst[order], le[order]
        starts = np.flatnonzero(
            np.r_[True, (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])]
        )
        counts = np.diff(np.r_[starts, d_s.size])
        u_dst = d_s[starts]
        u_lab = l_s[starts]
        u_part = _part_of(u_dst, self.P)
        qb = np.searchsorted(u_part, np.arange(self.P + 1))
        return _local_of(u_dst, self.P), u_lab, counts, qb

    def _label_counts_masked(
        self, le: np.ndarray, sel: np.ndarray
    ) -> tuple:
        dst = self.dst[sel]
        le = le[sel]
        dpart = _part_of(dst, self.P)
        order = np.lexsort((le, dst, dpart))
        d_s, l_s = dst[order], le[order]
        starts = np.flatnonzero(
            np.r_[True, (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])]
        )
        counts = np.diff(np.r_[starts, d_s.size])
        u_dst = d_s[starts]
        u_lab = l_s[starts]
        u_part = _part_of(u_dst, self.P)
        qb = np.searchsorted(u_part, np.arange(self.P + 1))
        return _local_of(u_dst, self.P), u_lab, counts, qb

    def gather_color_mex(
        self,
        q: int,
        *bundles,
        select_state: str = "selected",
        color_state: str = "color",
    ) -> float:
        """Coloring gather: merge incoming (dst_local, color) pairs from
        COLORED neighbours and assign each selected vertex the smallest
        color not present among them (the mex). Returns #colored."""
        sel = self.state[select_state] > 0.5
        colors = self.state[color_state]
        if not sel.any():
            return 0.0
        ids_l, col_l = [], []
        for b in bundles:
            ids, labs, _cnts, off = b
            lo, hi = off[q], off[q + 1]
            if hi > lo:
                ids_l.append(ids[lo:hi])
                col_l.append(labs[lo:hi])
        if ids_l:
            ids = np.concatenate(ids_l)
            cols = np.concatenate(col_l)
            keep = sel[ids]
            ids, cols = ids[keep], cols[keep]
        else:
            ids = np.empty(0, np.int64)
            cols = np.empty(0, np.int64)
        # Per selected vertex: mex over its sorted UNIQUE colors —
        # vectorized: within each vertex's run, rank = position; the
        # mex is the first rank where color != rank (else run length).
        out = colors.copy()
        if ids.size:
            order = np.lexsort((cols, ids))
            ids_s, cols_s = ids[order], cols[order]
            uniq = np.r_[
                True,
                (ids_s[1:] != ids_s[:-1]) | (cols_s[1:] != cols_s[:-1]),
            ]
            ids_s, cols_s = ids_s[uniq], cols_s[uniq]
            starts = np.flatnonzero(
                np.r_[True, ids_s[1:] != ids_s[:-1]]
            )
            seg_len = np.diff(np.r_[starts, ids_s.size])
            rank = np.arange(ids_s.size) - np.repeat(starts, seg_len)
            big = np.int64(1 << 60)
            cand = np.where(cols_s != rank, rank, big)
            mex = np.minimum.reduceat(cand, starts)
            mex = np.where(mex == big, seg_len, mex)
            out[ids_s[starts]] = mex
            got_msg = np.zeros(sel.size, bool)
            got_msg[ids_s] = True
        else:
            got_msg = np.zeros(sel.size, bool)
        # Selected vertices with NO colored neighbour get color 0.
        fresh = sel & ~got_msg
        out[fresh] = 0
        n_colored = float(sel.sum())
        self.state[color_state] = out
        self.state[select_state] = np.zeros(sel.size)
        return n_colored

    def gather_label_argmax(
        self, q: int, *bundles, label_state: str = "lab"
    ) -> float:
        """Merge incoming (dst_local, label, count) triples, pick the
        most frequent label per vertex (ties → smallest label), keep the
        old label for vertices with no in-neighbours. Returns the
        number of changed labels (the convergence scalar)."""
        ids_l, lab_l, cnt_l = [], [], []
        for b in bundles:
            ids, labs, cnts, off = b
            lo, hi = off[q], off[q + 1]
            if hi > lo:
                ids_l.append(ids[lo:hi])
                lab_l.append(labs[lo:hi])
                cnt_l.append(cnts[lo:hi])
        lab = self.state[label_state]
        if not ids_l:
            return 0.0
        ids = np.concatenate(ids_l)
        labs = np.concatenate(lab_l)
        cnts = np.concatenate(cnt_l)
        key = ids * np.int64(self.n) + labs
        order = np.argsort(key, kind="stable")
        key_s, cnt_s = key[order], cnts[order]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        tot = np.add.reduceat(cnt_s, starts)
        u_ids = key_s[starts] // self.n
        u_lab = key_s[starts] % self.n
        # argmax per vertex, ties → smallest label: lexsort by
        # (vertex, -count, label) then take the first row per vertex.
        o2 = np.lexsort((u_lab, -tot, u_ids))
        v_s, l_s = u_ids[o2], u_lab[o2]
        firsts = np.flatnonzero(np.r_[True, v_s[1:] != v_s[:-1]])
        picked_v, picked_l = v_s[firsts], l_s[firsts]
        new = lab.copy()
        new[picked_v] = picked_l.astype(lab.dtype)
        changed = float(np.sum(new != lab))
        self.state[label_state] = new
        return changed

    def _ones(self) -> np.ndarray:
        if getattr(self, "_ones_cache", None) is None or \
                self._ones_cache.size != self.m_local:
            self._ones_cache = np.ones(self.m_local)
        return self._ones_cache

    def gather_packed(
        self,
        semiring_name: str,
        post_fn_bytes: bytes,
        scalars: dict | None,
        q: int,
        *bundles,
    ) -> dict:
        sr = SEMIRINGS[semiring_name]
        post = pickle.loads(post_fn_bytes)
        ncols = int(scalars["_ncols"]) if scalars and "_ncols" in scalars \
            else None
        y = self._accumulate_packed(sr, q, bundles, ncols)
        out = post(self.state, y, self._ctx(scalars))
        return out or {}

    def _accumulate_packed(
        self, sr, q: int, bundles, ncols: int | None = None
    ) -> np.ndarray:
        # ncols > 1: multi-column superstep (thin dense right-hand
        # matrix, e.g. multi-source Brandes) — partial vals are
        # (k, ncols) blocks, the dense accumulate is row-indexed.
        shape = self.n_local if ncols is None else (self.n_local, ncols)
        y = np.full(shape, sr.add.identity, dtype=np.float64)
        for b in bundles:
            ids, vals, off = b[0], b[1], b[2]
            lo, hi = off[q], off[q + 1]
            if hi > lo:
                seg_i = ids[lo:hi]
                y[seg_i] = sr.add.ufunc(y[seg_i], vals[lo:hi])
        # Hot-split contributions: every bundle ends with (hot_ids,
        # hot_x); this shard applies the hot edges it re-homed.
        self._apply_hot(sr, y, bundles)
        return y

    def gather_pipelined(
        self,
        semiring_name: str,
        post_fn_bytes: bytes,
        post_scalars_fn_bytes: bytes | None,
        static_scalars: dict | None,
        q: int,
        bundle_refs: list,
    ) -> dict:
        """Gather variant for the driver-free pipeline (≙ the reference's
        NONBLOCKING backend, nonblocking/pipeline.cpp: primitives enqueue
        and execute without host sync). ``bundle_refs`` arrive as DATA
        (a list of ObjectRefs, not resolved args) so the task spec stays
        tiny; the explicit ray.get here is deadlock-free because every
        caller submits all scatter_k tasks before any gather_k, and actor
        queues preserve submission order. Each bundle is
        (partials_list, scalar_dict); scalars are reduced here (the
        allreduce) and the pickled driver hook (e.g. PageRank's
        dangling→offset) applied before the normal gather."""
        outs = ray.get(bundle_refs)
        scalar_dicts = [o[3] for o in outs]
        merged = dict(static_scalars or {})
        for key in {k for d in scalar_dicts if d for k in d}:
            merged[key] = float(
                np.sum([d[key] for d in scalar_dicts if d and key in d])
            )
        if post_scalars_fn_bytes is not None:
            hook = pickle.loads(post_scalars_fn_bytes)
            merged.update(hook(merged))
        return self.gather_packed(
            semiring_name, post_fn_bytes, merged, q, *outs
        )

    def scatter_packed2(
        self,
        pre_fn_bytes: bytes,
        semiring_name: str,
        scalars: dict | None = None,
    ) -> tuple:
        """scatter_packed split into (bundle, scalars) as TWO objects
        (call with num_returns=2) so the synchronous superstep driver
        fetches only the scalar dict, never the partial arrays. The
        bundle ends with (hot_ids, hot_x) like the pipelined layout."""
        out = self.scatter_packed(pre_fn_bytes, semiring_name, scalars)
        return (out[0], out[1], out[2], out[4], out[5]), out[3]

    def gather_scatter_packed(
        self,
        semiring_name: str,
        post_fn_bytes: bytes,
        post_scalars_fn_bytes: bytes | None,
        static_scalars: dict | None,
        q: int,
        bundle_refs: list,
        pre_fn_bytes: bytes,
        next_scalars: dict | None = None,
    ) -> tuple:
        """Fused superstep tail+head: gather iteration k, then immediately
        scatter iteration k+1 — ONE actor task per shard per iteration
        instead of two, which matters because driver-side task submission
        (~0.3-0.6 ms each in this sandbox) is the binding constraint of
        the pipelined loop at large P. ``next_scalars`` (if given) are
        the static scalars of iteration k+1 — per-iteration scalars is
        how layered runs swap the active edge set / bias inside the
        pipeline. Returns (bundle_{k+1}, post_scalars_k) as two objects
        (num_returns=2)."""
        post_scalars = self.gather_pipelined(
            semiring_name,
            post_fn_bytes,
            post_scalars_fn_bytes,
            static_scalars,
            q,
            bundle_refs,
        )
        bundle = self.scatter_packed(
            pre_fn_bytes, semiring_name,
            next_scalars if next_scalars is not None else static_scalars,
        )
        return bundle, post_scalars

    # ---- multi-edge-set support (layered graphs, sparse NN) -----------
    #
    # A shard can hold SEVERAL compressed edge sets keyed by name and
    # swap the active one in O(1) (pointer swap, no copy) — the
    # GraphChallenge sparse-DNN shape (sparse_nn_single_inference.hpp:
    # one vxm per layer over a DIFFERENT weight matrix) without
    # rebuilding actors between layers. The swap rides the superstep's
    # ``scalars["_edges_key"]`` so layer selection costs zero extra
    # actor round-trips.

    def stash_edges(self, key: str) -> int:
        """Store the currently-built edge arrays under ``key``."""
        assert getattr(self, "hot_local", None) is None or \
            not self.hot_local.size, "edge stash incompatible with hot split"
        if not hasattr(self, "_edge_stash"):
            self._edge_stash = {}
        self._edge_stash[key] = (
            self.src_local, self.w, self.m_local, self.seg_starts,
            self.out_dst_local, self.qbounds, self.dst,
        )
        self._active_edges = key
        return self.m_local

    def use_edges(self, key: str) -> int:
        """Swap the active edge set to stash entry ``key`` (no-op if
        already active)."""
        if getattr(self, "_active_edges", None) == key:
            return self.m_local
        (self.src_local, self.w, self.m_local, self.seg_starts,
         self.out_dst_local, self.qbounds, self.dst) = self._edge_stash[key]
        self._active_edges = key
        return self.m_local

    def build_and_stash(
        self, key: str,
        src: np.ndarray, dst: np.ndarray, w: np.ndarray | None,
    ) -> int:
        """Build a new edge set from this shard's slice and stash it."""
        self._build(src, dst, w)
        return self.stash_edges(key)

    def synth_layer(
        self, key: str, fan: int, seed: int,
        wlow: int = -2, whigh: int = 3,
    ) -> int:
        """Deterministic in-actor synthesis of one sparse layer: every
        LOCAL source emits ``fan`` edges to uniform destinations with
        small-integer weights (exact in float64 — keeps multi-layer
        accumulation bitwise reproducible). Duplicate (src,dst) pairs
        are pre-summed (the no_duplicates FP contract: segment sums
        must see unique keys or tie order leaks into last-ulp)."""
        rng = np.random.RandomState(
            (seed * 1_000_003 + self.part * 7919 + 13) % (2**31 - 1)
        )
        src = np.repeat(
            np.arange(self.part, self.n, self.P, dtype=np.int64), fan
        )
        dst = rng.randint(0, self.n, src.size).astype(np.int64)
        w = rng.randint(wlow, whigh, src.size).astype(np.float64)
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        if src.size:
            starts = np.flatnonzero(
                np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            )
            w = np.add.reduceat(w, starts)
            src, dst = src[starts], dst[starts]
        return self.build_and_stash(key, src, dst, w)

    # ---- transpose exchange (builds Aᵀ as a second stashed edge set) ---

    def reversed_bundle(self) -> tuple:
        """``(bounds, dst, src_global, w)`` of the ACTIVE edge set grouped
        by destination shard: the edge-level slice
        ``[bounds[q]:bounds[q+1]]`` belongs to shard q. ``dst`` is already
        sorted by (dst_part, dst, src) from ``_build``, so the slices are
        contiguous with zero re-sorting — one object per shard, receivers
        slice it zero-copy (the fused-exchange idiom; on multi-node the
        split mode would ship column q to shard q only)."""
        assert not getattr(self, "hot_local", np.empty(0)).size, \
            "transpose exchange incompatible with hot split"
        dst_part = _part_of(self.dst, self.P)
        bounds = np.searchsorted(dst_part, np.arange(self.P + 1))
        src = self.src_local * self.P + self.part
        return bounds, self.dst, src, self.w

    def ingest_reversed(self, q: int, *bundles) -> int:
        """Stage slice q of every shard's reversed bundle into the
        pending buffers with (src, dst) SWAPPED — the shard-to-shard
        exchange that builds the transpose without the driver ever
        touching edge data. Finish with ``finalize_build``."""
        if not hasattr(self, "_pending"):
            self._pending = []
        total = 0
        for bounds, dst, src, w in bundles:
            lo, hi = int(bounds[q]), int(bounds[q + 1])
            if hi > lo:
                self._pending.append((
                    dst[lo:hi], src[lo:hi],
                    w[lo:hi] if w is not None else None,
                ))
                total += hi - lo
        return total


class _ShardIngest:
    """map_batches stage routing each edge block's P slices straight to
    the owning GraphShard actors (worker → object store → actor; the
    driver never touches edge data). The per-batch ray.get provides
    backpressure and guarantees every chunk has landed by the time the
    Dataset is fully consumed."""

    def __init__(self, shards: list, P: int, weighted: bool) -> None:
        self.shards = shards
        self.P = P
        self.weighted = weighted

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), np.int64)
        dst = np.asarray(batch.column("dst"), np.int64)
        w = (
            np.asarray(batch.column("weight"), np.float64)
            if self.weighted
            else None
        )
        part = src % self.P
        order = np.argsort(part, kind="stable")
        src, dst, part = src[order], dst[order], part[order]
        if w is not None:
            w = w[order]
        bounds = np.searchsorted(part, np.arange(self.P + 1))
        refs = []
        for p in range(self.P):
            lo, hi = bounds[p], bounds[p + 1]
            if hi > lo:
                refs.append(
                    self.shards[p].ingest_block.remote(
                        src[lo:hi],
                        dst[lo:hi],
                        w[lo:hi] if w is not None else None,
                    )
                )
        if refs:
            ray.get(refs)
        return pa.table({"n": pa.array([len(src)], pa.int64())})


class GraphEngine:
    """Driver-side handle over P GraphShard actors.

    Build once (≙ buildMatrixUnique + Launcher, §3.1), then run up to 1000
    supersteps without touching the edge data again.
    """

    def __init__(
        self, shards: list, P: int, n: int, m: int,
        exchange: str = "fused",
    ):
        self.shards = shards
        self.P = P
        self.n = n
        self.m = m
        # "fused": one partial-bundle object per shard (zero-copy slicing,
        # single-node fast path). "split": per-destination objects
        # (num_returns=P) — the multi-node shape where column q ships only
        # to shard q.
        self.exchange = exchange

    # -- construction ------------------------------------------------------
    @classmethod
    def from_arrays(
        cls,
        src: np.ndarray,
        dst: np.ndarray,
        w: np.ndarray | None = None,
        n: int | None = None,
        P: int = 8,
        num_cpus_per_shard: float = 0,
    ) -> "GraphEngine":
        """Small/driver-side build: partition by src % P and ship slices."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if n is None:
            n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
        P = max(1, min(P, n))
        parts = src % P
        order = np.argsort(parts, kind="stable")
        src, dst = src[order], dst[order]
        w = np.asarray(w, dtype=np.float64)[order] if w is not None else None
        bounds = np.searchsorted(parts[order], np.arange(P + 1))
        shards = []
        for p in range(P):
            lo, hi = bounds[p], bounds[p + 1]
            edges = (
                src[lo:hi],
                dst[lo:hi],
                w[lo:hi] if w is not None else None,
            )
            shards.append(
                GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                    p, P, n, edges=edges
                )
            )
        return cls(shards, P, n, int(src.size))

    @classmethod
    def for_linear_system(
        cls,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n: int | None = None,
        P: int = 8,
        num_cpus_per_shard: float = 0,
    ) -> "GraphEngine":
        """Engine whose superstep computes ``y = A·x`` for the matrix
        ``A[rows[i], cols[i]] = vals[i]`` (general, nonsymmetric).

        The superstep natively computes y[dst] = Σ_src x[src]·w (i.e.
        Aᵀx for edge-oriented storage), so this builder stores each
        entry as src=col → dst=row — the orientation iterative SOLVERS
        need (bicgstab on nonsymmetric A; for SPD systems, e.g. CG,
        either orientation is equivalent)."""
        return cls.from_arrays(
            np.asarray(cols, np.int64),
            np.asarray(rows, np.int64),
            np.asarray(vals, np.float64),
            n=n,
            P=P,
            num_cpus_per_shard=num_cpus_per_shard,
        )

    @classmethod
    def synth_zipf(
        cls,
        n: int,
        m: int,
        P: int,
        seed: int = 1,
        zipf_a: float = 1.3,
        num_cpus_per_shard: float = 0,
    ) -> "GraphEngine":
        """Parallel in-actor synthesis of an m-edge zipf-skewed graph
        (bench scale probe): build cost is max-shard, not driver."""
        shards = [
            GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                p, P, n, synth={"seed": seed, "m": m, "a": zipf_a}
            )
            for p in range(P)
        ]
        # m after self-loop removal differs slightly per shard; count it.
        ms = ray.get([s.num_edges.remote() for s in shards])
        return cls(shards, P, n, int(sum(ms)))

    @classmethod
    def from_dataset(
        cls,
        edges: "ray.data.Dataset",
        n: int,
        P: int = 8,
        weighted: bool = False,
        num_cpus_per_shard: float = 0,
        dedupe: bool = False,
    ) -> "GraphEngine":
        """Streaming distributed build from an edge Dataset — the
        Dataset-native ingestion path: each map_batches worker routes its
        block's ``src % P`` slices directly to the owning shard actors,
        so edge data flows worker → object store → shard and the driver
        holds only handles and counters. ≙ PARALLEL IOMode ingestion
        (iomode.hpp; reference/matrix.hpp:245-293 parallel CRS build)
        without the reference's per-process file re-scan."""
        import ray.data  # noqa: F401  (Dataset type only)

        P = max(1, min(P, n)) if n > 0 else 1
        shards = [
            GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                p, P, n, deferred=True, dedupe=dedupe
            )
            for p in range(P)
        ]
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        edges.map_batches(
            _ShardIngest,
            fn_constructor_args=(shards, P, weighted),
            batch_format="pyarrow",
            concurrency=(1, max(2, cpus)),
        ).sum("n")
        ms = ray.get([s.finalize_build.remote() for s in shards])
        return cls(shards, P, n, int(sum(ms)))

    @classmethod
    def from_partitioned_parquet(
        cls, path: str, n: int, m: int, P: int,
        num_cpus_per_shard: float = 0,
    ) -> "GraphEngine":
        """Scale build: shards ingest their own hive partition in parallel
        (written once via ``write_partitioned_edges``). On a real cluster
        pass num_cpus_per_shard=1 and P = total cores so shards spread and
        reserve their core; tests use 0 to avoid deadlocking a tiny
        local session when two engines briefly coexist."""
        shards = [
            GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                p, P, n, parquet_path=path
            )
            for p in range(P)
        ]
        return cls(shards, P, n, m)

    @classmethod
    def synth_layer_stack(
        cls,
        n: int,
        P: int,
        keys: list[str],
        fan: int,
        seed: int = 1,
        wlow: int = -2,
        whigh: int = 3,
        num_cpus_per_shard: float = 0,
    ) -> "GraphEngine":
        """Engine holding ``len(keys)`` stashed edge sets (layers),
        synthesized deterministically in-actor (GraphChallenge sparse-DNN
        scale probe: L sparse weight matrices, one vxm each — the
        ``_edges_key`` scalar selects the active layer per superstep).
        ``m`` is the total nnz across layers."""
        shards = [
            GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                p, P, n, deferred=True
            )
            for p in range(P)
        ]
        m = 0
        for li, key in enumerate(keys):
            m += int(sum(ray.get([
                s.synth_layer.remote(key, fan, seed + li, wlow, whigh)
                for s in shards
            ])))
        return cls(shards, P, n, m)

    def add_edge_layer(
        self, key: str,
        src: np.ndarray, dst: np.ndarray, w: np.ndarray | None = None,
    ) -> int:
        """Driver-side build of an additional stashed edge set (small
        layers / tests; scale builds use ``synth_layer_stack`` or
        streaming ingest + ``stash_edges``)."""
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        w = np.asarray(w, np.float64) if w is not None else None
        parts = src % self.P
        order = np.argsort(parts, kind="stable")
        src, dst = src[order], dst[order]
        w = w[order] if w is not None else None
        bounds = np.searchsorted(parts[order], np.arange(self.P + 1))
        ms = ray.get([
            s.build_and_stash.remote(
                key,
                src[bounds[p]:bounds[p + 1]],
                dst[bounds[p]:bounds[p + 1]],
                w[bounds[p]:bounds[p + 1]] if w is not None else None,
            )
            for p, s in enumerate(self.shards)
        ])
        return int(sum(ms))

    def stash_edges(self, key: str) -> None:
        ray.get([s.stash_edges.remote(key) for s in self.shards])

    def build_reversed(
        self, fwd_key: str = "fwd", rev_key: str = "rev"
    ) -> None:
        """Build the transpose Aᵀ as a second stashed edge set via a
        shard-to-shard exchange (each shard's edges are already grouped
        by destination shard, so the exchange is P zero-copy bundle
        reads per shard — no driver traffic, no Dataset shuffle). Both
        orientations end up stashed; the FORWARD set stays active.
        ≙ descriptors::transpose_matrix (descriptors.hpp:106) made
        resident: algorithms that alternate A / Aᵀ (HITS) swap per
        superstep via the ``_edges_key`` scalar."""
        ray.get([s.stash_edges.remote(fwd_key) for s in self.shards])
        bundles = [s.reversed_bundle.remote() for s in self.shards]
        ray.get([
            s.ingest_reversed.remote(q, *bundles)
            for q, s in enumerate(self.shards)
        ])
        ray.get([s.finalize_build.remote() for s in self.shards])
        ray.get([s.stash_edges.remote(rev_key) for s in self.shards])
        ray.get([s.use_edges.remote(fwd_key) for s in self.shards])

    def use_edges(self, key: str) -> None:
        ray.get([s.use_edges.remote(key) for s in self.shards])

    def dump_edges(self) -> tuple:
        """(src, dst, w) of the active edge set, concatenated across
        shards — tests/debug only (drags all edges to the driver)."""
        parts = ray.get([s.dump_edges.remote() for s in self.shards])
        src = np.concatenate([p[0] for p in parts])
        dst = np.concatenate([p[1] for p in parts])
        ws = [p[2] for p in parts]
        w = (
            np.concatenate(ws) if all(x is not None for x in ws) else None
        )
        return src, dst, w

    # -- state -------------------------------------------------------------
    def enable_hot_source_split(self, threshold: int) -> int:
        """Re-home the edges of sources with out-degree > threshold to
        their destination shards (the skew guard of SURVEY §7.8 as an
        IN-ENGINE mechanism): per superstep the owner ships O(#hot)
        x-scalars in its bundle instead of scanning a mega-row alone.
        Fused exchange only. Returns the number of re-homed edges."""
        assert self.exchange == "fused", "hot split requires fused mode"
        P = self.P
        if P == 1:
            # Single shard: nothing to spread.
            self._hot_enabled = True
            return 0
        per = [
            s.extract_hot_sources.options(num_returns=P).remote(threshold)
            for s in self.shards
        ]
        moved = ray.get(
            [
                self.shards[q].install_hot_edges.remote(
                    *[per[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        )
        self._hot_enabled = True
        return int(sum(moved))

    def set_state(self, name: str, value) -> None:
        ray.get([s.set_state.remote(name, value) for s in self.shards])

    def set_state_use_index(self, name: str) -> None:
        ray.get([s.set_state_use_index.remote(name) for s in self.shards])

    def compute_out_degrees(self, name: str = "outdeg") -> None:
        ray.get([s.compute_out_degrees.remote(name) for s in self.shards])

    def compute_out_weight_sums(self, name: str = "wsum") -> None:
        ray.get(
            [s.compute_out_weight_sums.remote(name) for s in self.shards]
        )

    def set_state_by_vertex(self, name: str, values: np.ndarray) -> None:
        """values: dense array of length n, driver-side (small graphs)."""
        refs = []
        for p, s in enumerate(self.shards):
            refs.append(s.set_state.remote(name, values[p :: self.P]))
        ray.get(refs)

    def get_state_by_vertex(self, name: str) -> np.ndarray:
        """Collect a state vector to the driver (small results only —
        ≙ PinnedVector escape hatch, base/pinnedvector.hpp)."""
        slices = ray.get([s.get_state.remote(name) for s in self.shards])
        out = np.empty(self.n, dtype=slices[0].dtype if self.n else np.float64)
        for p, sl in enumerate(slices):
            out[p :: self.P] = sl
        return out

    def state_dataset(self, names: list[str]) -> "ray.data.Dataset":
        """Vertex state as a Dataset (vertex + one column per name)
        without a driver copy: one block per shard, built ON the shard
        and wrapped by ObjectRef — the data never lands on the driver."""
        import ray.data

        refs = [s.state_table.remote(list(names)) for s in self.shards]
        return ray.data.from_arrow_refs(refs)

    def map_local(self, fn: Callable, scalars: dict | None = None) -> list:
        fb = pickle.dumps(fn)
        return ray.get(
            [s.map_local.remote(fb, scalars) for s in self.shards]
        )

    # -- the superstep -----------------------------------------------------
    def superstep(
        self,
        pre_fn: Callable,
        semiring: Semiring | str,
        post_fn: Callable,
        scalars: dict | None = None,
        scalar_reduce: Callable | None = None,
        post_scalars_fn: Callable[[dict], dict] | None = None,
    ) -> dict:
        """One BSP superstep over all shards.

        pre_fn(state, ctx) -> x | (x, active) | (x, active, scalar_partials)
        post_fn(state, y_dense_local, ctx) -> scalar_partials
        post_scalars_fn: driver hook mapping reduced pre-scalars → extra
          scalars visible to post_fn via ctx["scalars"] (e.g. PageRank's
          dangling-mass offset, simple_pagerank.hpp:351).
        scalar_reduce(key, list) -> reduced value (default: sum).
        """
        sr_name = semiring if isinstance(semiring, str) else semiring.name
        pre_b = pickle.dumps(pre_fn)
        post_b = pickle.dumps(post_fn)
        P = self.P
        if self.exchange == "fused":
            # One object per shard; gathers map it zero-copy and slice
            # their column (single-node fast path).
            bundle_refs, scalar_refs = [], []
            for s in self.shards:
                b_ref, s_ref = s.scatter_packed2.options(
                    num_returns=2
                ).remote(pre_b, sr_name, scalars)
                bundle_refs.append(b_ref)
                scalar_refs.append(s_ref)
            pre_scalars = self._reduce_scalars(
                ray.get(scalar_refs), scalar_reduce
            )
            merged = dict(scalars or {})
            merged.update(pre_scalars)
            if post_scalars_fn is not None:
                merged.update(post_scalars_fn(merged))
            g_refs = [
                s.gather_packed.remote(
                    sr_name, post_b, merged, q, *bundle_refs
                )
                for q, s in enumerate(self.shards)
            ]
            post_scalars = self._reduce_scalars(
                ray.get(g_refs), scalar_reduce
            )
            merged.update(post_scalars)
            return merged
        # "split" exchange: per-destination objects (num_returns=P+1) so a
        # multi-node cluster ships only column q to shard q.
        assert not getattr(self, "_hot_enabled", False), (
            "hot-source split rides the fused bundles only"
        )
        partial_refs: list[list] = []
        scalar_refs = []
        for s in self.shards:
            refs = s.scatter.options(num_returns=P + 1).remote(
                pre_b, sr_name, scalars
            )
            partial_refs.append(refs[:P])
            scalar_refs.append(refs[P])
        pre_scalars = self._reduce_scalars(
            ray.get(scalar_refs), scalar_reduce
        )
        merged = dict(scalars or {})
        merged.update(pre_scalars)
        if post_scalars_fn is not None:
            merged.update(post_scalars_fn(merged))
        # Phase 2: gather on all shards (shard q receives column q).
        out_refs = []
        for q, s in enumerate(self.shards):
            col = [partial_refs[p][q] for p in range(P)]
            out_refs.append(
                s.gather.remote(sr_name, post_b, merged, *col)
            )
        post_scalars = self._reduce_scalars(ray.get(out_refs), scalar_reduce)
        merged.update(post_scalars)
        return merged

    def run_supersteps(
        self,
        pre_fn: Callable,
        semiring: Semiring | str,
        post_fn: Callable,
        iters: int,
        scalars: dict | None = None,
        post_scalars_fn: Callable[[dict], dict] | None = None,
    ) -> list[dict]:
        """Submit ``iters`` supersteps as ONE task graph with no driver
        barrier until the end (≙ ALP's nonblocking fused pipeline,
        docs/Nonblocking_backend.md): per-actor serial execution orders
        scatter_k → gather_k → scatter_{k+1}; cross-shard ordering comes
        from the bundle refs; per-iteration scalar reduction (dangling
        mass, offsets) happens INSIDE the gathers. Returns the reduced
        post-scalars of every iteration (one driver ray.get total).

        This removes the 2-barrier-per-iteration driver latency — the
        sandbox's ~5 ms actor RPC floor otherwise dominates every
        iteration of a latency-bound loop.

        ``scalars`` may be a LIST of ``iters`` dicts — iteration k's
        scatter AND gather then see scalars[k] (how layered runs, e.g.
        the sparse NN, swap ``_edges_key``/bias per iteration with zero
        driver round-trips).
        """
        sr_name = semiring if isinstance(semiring, str) else semiring.name
        if isinstance(scalars, list):
            assert len(scalars) == iters
            sc = scalars
        else:
            sc = [scalars] * iters
        # Fn bytes go through the object store once — keeps every task
        # spec tiny (driver submission rate bounds the pipelined loop).
        pre_b = ray.put(pickle.dumps(pre_fn))
        post_b = ray.put(pickle.dumps(post_fn))
        hook_b = (
            ray.put(pickle.dumps(post_scalars_fn))
            if post_scalars_fn is not None
            else None
        )
        P = self.P
        all_out_refs: list[list] = []
        bundle_refs = [
            s.scatter_packed.remote(pre_b, sr_name, sc[0])
            for s in self.shards
        ]
        for k in range(iters):
            if k < iters - 1:
                nxt, outs = [], []
                for q, s in enumerate(self.shards):
                    b_ref, o_ref = s.gather_scatter_packed.options(
                        num_returns=2
                    ).remote(
                        sr_name, post_b, hook_b, sc[k], q,
                        bundle_refs, pre_b, sc[k + 1],
                    )
                    nxt.append(b_ref)
                    outs.append(o_ref)
                all_out_refs.append(outs)
                bundle_refs = nxt
            else:
                all_out_refs.append([
                    s.gather_pipelined.remote(
                        sr_name, post_b, hook_b, sc[k], q, bundle_refs
                    )
                    for q, s in enumerate(self.shards)
                ])
        flat = ray.get([r for refs in all_out_refs for r in refs])
        results = []
        for i in range(iters):
            results.append(
                self._reduce_scalars(flat[i * P : (i + 1) * P], None)
            )
        return results

    @staticmethod
    def _reduce_scalars(
        dicts: list[dict], scalar_reduce: Callable | None
    ) -> dict:
        out: dict = {}
        for key in {k for d in dicts if d for k in d}:
            vals = [d[key] for d in dicts if d and key in d]
            if scalar_reduce is not None:
                out[key] = scalar_reduce(key, vals)
            else:
                out[key] = float(np.sum(vals))
        return out

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def write_partitioned_edges(
    edges_ds: "ray.data.Dataset", P: int, path: str
) -> None:
    """Write the edge Dataset as hive-partitioned parquet on ``part =
    src % P`` — the once-per-graph shuffle that pins partitioning for all
    subsequent supersteps (SURVEY §7 "iterating without re-shuffling")."""

    def tag(batch: pa.Table) -> pa.Table:
        part = pa.array(
            np.asarray(batch.column("src")) % P, type=pa.int64()
        )
        return batch.append_column("part", part)

    edges_ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["part"]
    )
