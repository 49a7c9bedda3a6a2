"""Edge-table operators as pure Ray Data transforms (the shuffle path).

≙ reference BLAS2 scatter kernel (vxm_inner_kernel_scatter,
reference/blas2.hpp:284) with the SPA replaced by: in-batch combine
(pyarrow group_by per block — the "combiner") followed by a single
``groupby(dst)`` shuffle aggregate. Graph build utilities mirror
``buildMatrixUnique``'s no-duplicate contract (base/io.hpp:1336;
descriptors::no_duplicates) and the degree precompute that the reference
does with pattern-semiring mxv (simple_pagerank.hpp:210-222,
pregel.hpp:380-416).

Everything here streams: no stage materializes the full dataset; the only
wide steps are groupby aggregates keyed on vertex ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from alp_ray.util import join_partitions
from ray.data.aggregate import Count, Max, Min, Sum

from alp_ray.functions.semiring import Semiring

_AGG = {"sum": Sum, "min": Min, "max": Max}


_DEGREE_BROADCAST_LIMIT = 50_000_000


def orient_by_degree_rank(
    canon: "ray.data.Dataset",
    deg_ds: "ray.data.Dataset",
    m: int | None = None,
    broadcast_limit: int = _DEGREE_BROADCAST_LIMIT,
    carry: tuple[str, ...] = (),
) -> "ray.data.Dataset":
    """Orient each canonical (src, dst) edge low-rank → high-rank under
    the (degree, id)-lex rank, emitting (a, b, bd) — ``bd`` = deg(b)
    rides along so downstream wedge stages can rank-sort out-neighbour
    lists without re-resolving degrees.

    ``deg_ds``: (v, deg) Dataset covering every endpoint. Below
    ``broadcast_limit`` vertices the table ships ONCE via ray.put and
    orientation is a vectorized searchsorted lookup per batch; above it
    the degrees attach by TWO hash joins (src side, then dst side) —
    no O(n) driver/worker materialization, the scale path for
    10^12-vertex graphs where a broadcast degree table stops fitting
    (the join alternative promised in triangles.py / ktruss.py).
    ``carry`` columns (e.g. an edge weight) pass through unchanged,
    row-aligned with the oriented output."""
    from alp_ray.util import concat_blocks

    deg_ds = deg_ds.materialize()
    n = deg_ds.count()
    if n <= broadcast_limit:
        deg_tbl = concat_blocks(
            deg_ds, columns={"v": pa.int64(), "deg": pa.int64()}
        )
        dv = np.asarray(deg_tbl.column("v"), np.int64)
        dc = np.asarray(deg_tbl.column("deg"), np.int64)
        order = np.argsort(dv)
        deg_ref = ray.put((dv[order], dc[order]))

        class Orient:
            def __init__(self, deg_ref, carry) -> None:
                self.dv, self.dc = ray.get(deg_ref)
                self.carry = carry

            def _deg(self, x: np.ndarray) -> np.ndarray:
                return self.dc[np.searchsorted(self.dv, x)]

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = np.asarray(batch.column("src"), np.int64)
                b = np.asarray(batch.column("dst"), np.int64)
                da, db = self._deg(a), self._deg(b)
                a_first = (da < db) | ((da == db) & (a < b))
                cols = {
                    "a": pa.array(np.where(a_first, a, b)),
                    "b": pa.array(np.where(a_first, b, a)),
                    "bd": pa.array(np.where(a_first, db, da)),
                }
                for c in self.carry:
                    cols[c] = batch.column(c)
                return pa.table(cols)

        return canon.map_batches(
            Orient, fn_constructor_args=(deg_ref, carry),
            batch_format="pyarrow", concurrency=(1, 8),
        )

    # Join path: attach deg(src) then deg(dst) by hash join.
    def _proj(key: str, out: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: b.column("v").cast(pa.int64()),
                    out: b.column("deg").cast(pa.int64()),
                }
            )

        return fn

    d_src = deg_ds.map_batches(_proj("src", "__da"), batch_format="pyarrow")
    d_dst = deg_ds.map_batches(_proj("dst", "__db"), batch_format="pyarrow")
    parts = join_partitions(m, n)
    j1 = canon.join(
        d_src, join_type="inner", num_partitions=parts, on=("src",)
    ).materialize()  # Ray 2.49: materialize between chained joins
    j2 = j1.join(
        d_dst, join_type="inner", num_partitions=parts, on=("dst",)
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("src"), np.int64)
        b = np.asarray(batch.column("dst"), np.int64)
        da = np.asarray(batch.column("__da"), np.int64)
        db = np.asarray(batch.column("__db"), np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        cols = {
            "a": pa.array(np.where(a_first, a, b)),
            "b": pa.array(np.where(a_first, b, a)),
            "bd": pa.array(np.where(a_first, db, da)),
        }
        for c in carry:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return j2.map_batches(orient, batch_format="pyarrow")


def dedup_edges(
    edges: "ray.data.Dataset", cols: tuple[str, str] = ("src", "dst")
) -> "ray.data.Dataset":
    """Distinct (src, dst) — ≙ buildMatrixUnique's no-duplicates ingestion
    contract. Combiner: per-block distinct before the exchange; the
    exchange itself is a COARSE key-hash partition fold (one vectorized
    np.unique per partition) rather than a full two-key sort aggregate —
    identical pairs land in the same partition by construction, and the
    coarse groupby orders only the partition tag (~3× cheaper than the
    exact (src, dst) sort shuffle at 3M+ edges on Ray 2.49)."""
    from alp_ray.util import coarse_parts

    src, dst = cols
    n_parts = coarse_parts()

    def block_distinct(batch: pa.Table) -> pa.Table:
        t = batch.select([src, dst]).group_by([src, dst]).aggregate([])
        s = np.asarray(t.column(src), np.int64)
        d = np.asarray(t.column(dst), np.int64)
        part = (s * 2654435761 + d) % n_parts
        return pa.table({src: s, dst: d, "__part": part})

    def part_distinct(group: pa.Table) -> pa.Table:
        if src not in group.column_names or group.num_rows == 0:
            return pa.table(
                {src: pa.array([], pa.int64()),
                 dst: pa.array([], pa.int64())}
            )
        s = np.asarray(group.column(src), np.int64)
        d = np.asarray(group.column(dst), np.int64)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        return pa.table({src: s[keep], dst: d[keep]})

    return (
        edges.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_distinct, batch_format="pyarrow")
    )


def symmetrize(
    edges: "ray.data.Dataset", dedup: bool = True
) -> "ray.data.Dataset":
    """Undirected view: union with swapped endpoints, self-loops dropped,
    deduped (needed by CC — pregel_connected_components.hpp expects a
    symmetric graph).

    ``dedup=False`` skips the distinct groupby — the SHUFFLE-FREE form
    for consumers that dedup downstream anyway (the GraphShard engine's
    ``from_dataset(dedupe=True)`` ingestion dedups shard-locally, which
    equals global dedup under src-partitioning). At 100 TB the
    difference is an entire all-to-all exchange."""

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"src": batch.column("dst"), "dst": batch.column("src")}
        )

    fwd = edges.select_columns(["src", "dst"])
    rev = fwd.map_batches(swap, batch_format="pyarrow")
    both = fwd.union(rev).filter(
        expr="src != dst"
    )
    return dedup_edges(both) if dedup else both


def canonicalize(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Upper-triangle view (src < dst), self-loops dropped, deduped —
    the A of tr(A·A∘A)/6 triangle counting."""

    def canon(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"))
        d = np.asarray(batch.column("dst"))
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table({"src": lo, "dst": hi})

    return dedup_edges(edges.map_batches(canon, batch_format="pyarrow"))


def degrees(
    edges: "ray.data.Dataset", key: str = "src", name: str = "degree"
) -> "ray.data.Dataset":
    """Out-/in-degree table — ≙ pattern-semiring mxv row-sum
    (simple_pagerank.hpp:210-222). Pre-aggregates per block."""

    def block_counts(batch: pa.Table) -> pa.Table:
        t = batch.group_by(key).aggregate([(key, "count")])
        return t.rename_columns([key, "c"])

    return (
        edges.map_batches(block_counts, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("c", alias_name=name))
    )


class _ScatterStage:
    """Per-batch spmv scatter: gather x at src, multiply, pre-combine per
    dst within the block (the combiner that keeps the shuffle small)."""

    def __init__(
        self,
        x_ref,
        semiring: Semiring,
        transpose: bool,
        weight_col: str | None,
        mask_ref=None,
        invert_mask: bool = False,
        input_mask_ref=None,
        invert_input_mask: bool = False,
    ) -> None:
        # x is broadcast once via ray.put and read zero-copy per actor —
        # NOT re-shipped per batch.
        self.xv, self.xi = ray.get(x_ref) if not isinstance(x_ref, tuple) else x_ref
        self.sr = semiring
        self.src_col = "dst" if transpose else "src"
        self.dst_col = "src" if transpose else "dst"
        self.weight_col = weight_col
        self.mask = ray.get(mask_ref) if mask_ref is not None else None
        self.invert_mask = invert_mask
        self.input_mask = (
            ray.get(input_mask_ref) if input_mask_ref is not None else None
        )
        self.invert_input_mask = invert_input_mask

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {"vertex": pa.array([], pa.int64()),
             "val": pa.array([], pa.float64())}
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Empty x (or an empty non-inverted mask) yields no output — and
        # np.clip(pos, 0, -1) below would mis-index, so return early.
        if self.xi.size == 0 or len(batch) == 0:
            return self._empty()
        if self.mask is not None and self.mask.size == 0 \
                and not self.invert_mask:
            return self._empty()
        src = np.asarray(batch.column(self.src_col))
        dst = np.asarray(batch.column(self.dst_col))
        w = (
            np.asarray(batch.column(self.weight_col), dtype=np.float64)
            if self.weight_col and self.weight_col in batch.column_names
            else np.ones(len(src))
        )
        if self.mask is not None and self.mask.size > 0:
            pos = np.searchsorted(self.mask, dst)
            pos_c = np.clip(pos, 0, self.mask.size - 1)
            in_mask = self.mask[pos_c] == dst
            keep = ~in_mask if self.invert_mask else in_mask
            src, dst, w = src[keep], dst[keep], w[keep]
        if self.input_mask is not None:
            # INPUT mask (≙ the output+input-masked vxm/mxv overloads,
            # base/blas2.hpp:480-936): only sources in the mask
            # contribute — applied as a pre-filter on the src column so
            # masked-out contributions never shuffle.
            if self.input_mask.size == 0:
                if not self.invert_input_mask:
                    return self._empty()
            else:
                pos = np.searchsorted(self.input_mask, src)
                pos_c = np.clip(pos, 0, self.input_mask.size - 1)
                hit_in = self.input_mask[pos_c] == src
                keep = ~hit_in if self.invert_input_mask else hit_in
                src, dst, w = src[keep], dst[keep], w[keep]
        # Gather x[src] via binary search on the sorted broadcast vector;
        # rows whose src has no entry (sparse x) contribute nothing.
        pos = np.searchsorted(self.xi, src)
        pos_c = np.clip(pos, 0, self.xi.size - 1)
        hit = self.xi[pos_c] == src
        if not hit.all():
            src, dst, w, pos_c = src[hit], dst[hit], w[hit], pos_c[hit]
        contrib = self.sr.mul(self.xv[pos_c], w)
        # In-batch combine per dst (sort + segment reduce).
        order = np.argsort(dst, kind="stable")
        dst, contrib = dst[order], contrib[order]
        if dst.size:
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            u = dst[starts]
            vals = self.sr.add.segment_reduce(contrib, starts)
        else:
            u, vals = dst, contrib
        return pa.table({"vertex": u, "val": vals})


def spmv(
    edges: "ray.data.Dataset",
    x: "ray.data.Dataset | tuple[np.ndarray, np.ndarray]",
    semiring: Semiring,
    transpose: bool = False,
    weight_col: str | None = "weight",
    value_col: str = "val",
    mask: np.ndarray | None = None,
    invert_mask: bool = False,
    input_mask: np.ndarray | None = None,
    invert_input_mask: bool = False,
) -> "ray.data.Dataset":
    """y = A^T·x (or A·x with transpose=True… matching vxm/mxv duality —
    ``transpose`` swaps which endpoint is "input", ≙
    descriptors::transpose_matrix).

    x: a vertex-state Dataset ``(vertex, val)`` or a pre-sorted
    ``(values, ids)`` ndarray pair. The vector is broadcast (``ray.put``
    once), each edge block scatters and pre-combines, and one
    ``groupby(vertex)`` shuffle applies the add monoid — the scalable
    re-expression of reference/blas2.hpp's scatter kernel.

    ``mask``: sorted array of OUTPUT vertex ids — only masked outputs
    are produced (structural output mask, ≙ the masked mxv/vxm
    overloads, base/blas2.hpp:307; ``invert_mask`` ≙
    descriptors::invert_mask:66). Applied as a pre-filter on the
    destination column so masked-out contributions never shuffle.

    ``input_mask``: array of INPUT vertex ids — only sources in the
    mask contribute (≙ the output+input-masked overloads,
    base/blas2.hpp:480-936, the general input-mask the engine's sparse
    ``active`` frontier specializes).
    """
    if isinstance(x, ray.ObjectRef):
        # Contract: the ref holds a (values, ids) pair ALREADY sorted by
        # id — lets iterative callers (sparse_nn layer loop) chain spmvs
        # without ever pulling the vector to the driver.
        xref = x
    else:
        if isinstance(x, tuple):
            xv, xi = x
        else:
            tbl = _collect_vertex_table(x, value_col)
            xi = np.asarray(tbl.column("vertex"), dtype=np.int64)
            xv = np.asarray(tbl.column(value_col), dtype=np.float64)
        order = np.argsort(xi)
        xref = ray.put((xv[order], xi[order]))
    mask_ref = (
        ray.put(np.sort(np.asarray(mask, np.int64)))
        if mask is not None
        else None
    )
    input_mask_ref = (
        ray.put(np.sort(np.asarray(input_mask, np.int64)))
        if input_mask is not None
        else None
    )

    agg_cls = _AGG[semiring.add.arrow_agg]
    out = (
        edges.map_batches(
            _ScatterStage,
            fn_constructor_args=(
                xref, semiring, transpose, weight_col, mask_ref,
                invert_mask, input_mask_ref, invert_input_mask,
            ),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("vertex")
        .aggregate(agg_cls("val", alias_name=value_col))
    )
    return out


_BROADCAST_VERTEX_LIMIT = 50_000_000


def _collect_vertex_table(
    x: "ray.data.Dataset", value_col: str
) -> pa.Table:
    # Vertex-state tables are O(n) and only broadcast when small enough;
    # callers at cluster scale use the GraphShard engine instead. Fail
    # LOUDLY past the bound rather than OOM the driver.
    x = x.materialize()
    n = x.count()
    if n > _BROADCAST_VERTEX_LIMIT:
        raise ValueError(
            f"Dataset-path spmv broadcasts the vertex state to every "
            f"task; {n} rows exceeds the {_BROADCAST_VERTEX_LIMIT} "
            "bound — use GraphEngine (state/engine.py) for graphs "
            "this size"
        )
    dfs = x.to_pandas()
    return pa.table(
        {
            "vertex": np.asarray(dfs["vertex"], dtype=np.int64),
            value_col: np.asarray(dfs[value_col], dtype=np.float64),
        }
    )


def fold(
    x: "ray.data.Dataset", monoid_agg: str = "sum", value_col: str = "val"
):
    """Scalar ← vector reduce — ≙ grb::foldl to scalar + allreduce."""
    if monoid_agg == "sum":
        return x.sum(value_col)
    if monoid_agg == "min":
        return x.min(value_col)
    if monoid_agg == "max":
        return x.max(value_col)
    raise ValueError(monoid_agg)


def apply_mask(
    x: "ray.data.Dataset",
    mask: "ray.data.Dataset",
    invert: bool = False,
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Structural output mask — ≙ the reference's masked overloads
    (base/blas1.hpp:208-1796) and the ``structural_complement``
    descriptor (descriptors.hpp:117) when ``invert=True``: keep x's
    entries whose vertex IS (complement: is NOT) present in ``mask``.
    Implemented as union + groupby marker (one shuffle, no hash join —
    the Ray 2.49 join empty-partition workaround): mask rows carry
    −inf values so they can never win the Max and are dropped by the
    finite-value filter."""
    from ray.data.aggregate import Max

    def tag(flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            val = (
                np.asarray(batch.column(value_col), np.float64)
                if flag == 0 else np.full(n, -np.inf)
            )
            return pa.table(
                {
                    "vertex": batch.column("vertex").cast(pa.int64()),
                    value_col: pa.array(val),
                    "__m": pa.array(np.full(n, flag, np.int64)),
                }
            )

        return fn

    u = x.map_batches(tag(0), batch_format="pyarrow").union(
        mask.map_batches(tag(1), batch_format="pyarrow")
    )
    g = u.groupby("vertex").aggregate(
        Max(value_col, alias_name=value_col),
        Max("__m", alias_name="__m"),
    )
    want = 0 if invert else 1

    def fin(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vertex": pa.array([], pa.int64()),
                value_col: pa.array([], pa.float64()),
            }
        )
        if "__m" not in batch.column_names or len(batch) == 0:
            return empty
        v = np.asarray(batch.column(value_col), np.float64)
        m = np.asarray(batch.column("__m"), np.int64)
        keep = (m == want) & np.isfinite(v)
        return pa.table(
            {
                "vertex": batch.column("vertex").filter(pa.array(keep)),
                value_col: pa.array(v[keep]),
            }
        )

    return g.map_batches(fin, batch_format="pyarrow")


def ewise_inner_masked(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    mask: "ray.data.Dataset",
    op,
    invert_mask: bool = False,
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Masked eWiseApply (op variant) — ≙ grb::eWiseApply's
    mask-taking overloads (base/blas1.hpp:208): intersection eWise,
    then the structural output mask (inverted = the
    structural_complement descriptor)."""
    return apply_mask(
        ewise_inner(x, y, op, value_col=value_col),
        mask, invert=invert_mask, value_col=value_col,
    )


def fold_masked(
    x: "ray.data.Dataset",
    mask: "ray.data.Dataset",
    monoid_agg: str = "sum",
    invert_mask: bool = False,
    value_col: str = "val",
):
    """Masked foldl → scalar — ≙ grb::foldl(scalar, vector, mask,
    monoid) (base/blas1.hpp's masked fold overloads): reduce only the
    entries the (possibly complemented) structural mask admits."""
    return fold(
        apply_mask(x, mask, invert=invert_mask, value_col=value_col),
        monoid_agg=monoid_agg, value_col=value_col,
    )


def ewise_inner(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    op,
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Operator-variant eWiseApply (INTERSECTION semantics: output only
    where both inputs have an entry) — ≙ base/blas1.hpp:208 eWiseApply
    with a plain binary op, vs the monoid variant (``ewise_union``) whose
    missing side falls back to the identity. The inner-vs-outer-join
    distinction is exactly GraphBLAS's op-vs-monoid distinction
    (SURVEY §7 "easy to get silently wrong").

    ``op``: vectorized callable (np arrays) → np array.
    """
    a = x.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "__xa"]
    ).materialize()
    b = y.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "__xb"]
    ).materialize()
    joined = a.join(
        b,
        join_type="inner",
        num_partitions=join_partitions(a.count(), b.count()),
        on=("vertex",),
    )

    def apply(batch: pa.Table) -> pa.Table:
        xa = np.asarray(batch.column("__xa"), np.float64)
        xb = np.asarray(batch.column("__xb"), np.float64)
        return pa.table(
            {"vertex": batch.column("vertex"), value_col: op(xa, xb)}
        )

    return joined.map_batches(apply, batch_format="pyarrow")


def zip_vectors(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Two vertex-state tables → one pair-valued table (struct column) —
    ≙ grb::zip (reference/blas1.hpp:9975; pair element types as used by
    kmeans' Vector<pair>, kmeans.hpp:226). Inner-join semantics."""
    a = x.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "first"]
    ).materialize()
    b = y.select_columns(["vertex", value_col]).rename_columns(
        ["vertex", "second"]
    ).materialize()
    joined = a.join(
        b,
        join_type="inner",
        num_partitions=join_partitions(a.count(), b.count()),
        on=("vertex",),
    )

    def pack(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        pair = pa.StructArray.from_arrays(
            [
                batch.column("first").chunk(0)
                if batch.column("first").num_chunks
                else pa.array([], pa.float64()),
                batch.column("second").chunk(0)
                if batch.column("second").num_chunks
                else pa.array([], pa.float64()),
            ],
            names=["first", "second"],
        )
        return pa.table({"vertex": batch.column("vertex"), "pair": pair})

    return joined.map_batches(pack, batch_format="pyarrow")


def unzip_vectors(
    z: "ray.data.Dataset", pair_col: str = "pair"
) -> "ray.data.Dataset":
    """Inverse of ``zip_vectors`` — ≙ grb::unzip (reference/blas1.hpp:10023).
    Returns (vertex, first, second) flat columns."""

    def unpack(batch: pa.Table) -> pa.Table:
        pair = batch.column(pair_col)
        if isinstance(pair, pa.ChunkedArray):
            pair = pair.combine_chunks()
        return pa.table(
            {
                "vertex": batch.column("vertex"),
                "first": pair.field("first"),
                "second": pair.field("second"),
            }
        )

    return z.map_batches(unpack, batch_format="pyarrow")


def ewise_mul_add(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    z: "ray.data.Dataset",
    mul=np.multiply,
    add_monoid_agg: str = "sum",
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Fused ``z ⊕= x ⊗ y`` — the named eWiseMulAdd the reference
    dispatches internally (reference/blas1.hpp's 16 fused overloads):
    the x∩y product (op/intersection semantics) merged into z under the
    add monoid (union semantics). One join + one groupby — the fusion
    means the intermediate product is never materialized as its own
    Dataset pass."""
    prod = ewise_inner(x, y, mul, value_col=value_col)
    return ewise_union(
        prod, z, monoid_agg=add_monoid_agg, value_col=value_col
    )


def ewise_union(
    x: "ray.data.Dataset",
    y: "ray.data.Dataset",
    monoid_agg: str = "sum",
    value_col: str = "val",
) -> "ray.data.Dataset":
    """Monoid eWiseApply / eWiseAdd (union semantics: missing side ← identity)
    — ≙ base/blas1.hpp:1912 eWiseAdd. Implemented shuffle-style: union +
    groupby-aggregate (no join needed for commutative monoids)."""
    u = x.select_columns(["vertex", value_col]).union(
        y.select_columns(["vertex", value_col])
    )
    agg_cls = _AGG[monoid_agg]
    return u.groupby("vertex").aggregate(
        agg_cls(value_col, alias_name=value_col)
    )


def ewise_lambda_matrix(
    edges: "ray.data.Dataset",
    fn,
    weight_col: str = "weight",
) -> "ray.data.Dataset":
    """Named eWiseLambda over matrix nonzeroes — ≙ grb::eWiseLambda(f, A)
    (base/blas2.hpp:440): apply a VECTORIZED ``fn(src, dst, w) → w'`` to
    every stored entry (entry positions never change, matching the
    reference's in-place lambda contract). Pattern matrices (no weight
    column) see w ≡ 1."""

    def apply(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("dst"), np.int64)
        if weight_col in batch.column_names:
            w = np.asarray(batch.column(weight_col), np.float64)
        else:
            w = np.ones(len(batch))
        return pa.table(
            {
                "src": pa.array(s),
                "dst": pa.array(d),
                weight_col: pa.array(
                    np.asarray(fn(s, d, w), np.float64)
                ),
            }
        )

    return edges.map_batches(apply, batch_format="pyarrow")
