"""Link prediction: Adamic-Adar scores over a symmetric graph.

AA(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1/ln(deg(w)) (Adamic & Adar, "Friends
and neighbors on the web", Social Networks 25(3), 2003). Expressed as
the semiring composition the engine already owns: AA = A·D⁻ˡᵒᵍ·A where
D⁻ˡᵒᵍ = diag(1/ln deg) — i.e. an SpGEMM whose left operand carries the
middle vertex's 1/ln(deg) as edge weight (≙ grb::mxm over plus-times,
base/blas3.hpp:94, with a diagonal pre-scale ≙ eWiseLambda on A's
columns). Candidate pairs are the 2-hop co-neighbor pairs; existing
edges drop out via a native left_anti join (no driver materialization).

Scale shape: deg join + SpGEMM join are both key-partitioned hash
joins sized by ``join_partitions``; the per-batch emit pre-combines
(src,dst) partials before the one groupby — the same discipline as
``pipelines/matrix.spgemm``. Skew note: a hub vertex w contributes
deg(w)² join rows; at 100 TB cap contributions per middle vertex
(sample neighbors of super-hubs) — the natural AA semantics already
down-weights them by 1/ln(deg).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from alp_ray.util import round_half_away

import ray
import ray.data

from alp_ray.stages.graph import degrees
from alp_ray.util import join_partitions


def adamic_adar(
    edges_sym: "ray.data.Dataset",
    exclude_edges: bool = True,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """(u, v, aa) for co-neighbor pairs u < v of a SYMMETRIC deduped
    edge table; pairs already linked are excluded when
    ``exclude_edges`` (the link-prediction candidate set)."""
    e = edges_sym.select_columns(["src", "dst"]).materialize()
    if num_partitions is None:
        num_partitions = join_partitions(e.count())

    deg = degrees(e, key="src", name="deg")

    def invlog(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("deg"), np.float64)
        # deg-1 middles yield inf but only ever form u==v wedges, which
        # the canonical u<v filter drops before any sum.
        with np.errstate(divide="ignore"):
            w = 1.0 / np.log(d)
        return pa.table({
            "mid": batch.column("src").cast(pa.int64()),
            "wmid": w,
        })

    degm = deg.map_batches(invlog, batch_format="pyarrow").materialize()

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch.column("src").cast(pa.int64()),
            "mid": batch.column("dst").cast(pa.int64()),
        })

    def as_right(batch: pa.Table) -> pa.Table:
        return pa.table({
            "mid": batch.column("src").cast(pa.int64()),
            "v": batch.column("dst").cast(pa.int64()),
        })

    left = (
        e.map_batches(as_left, batch_format="pyarrow")
        .join(degm, join_type="inner",
              num_partitions=num_partitions, on=("mid",))
        .materialize()
    )
    right = e.map_batches(as_right, batch_format="pyarrow").materialize()
    wedges = left.join(
        right, join_type="inner",
        num_partitions=num_partitions, on=("mid",),
    )

    def emit(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u"), np.int64)
        v = np.asarray(batch.column("v"), np.int64)
        w = np.asarray(batch.column("wmid"), np.float64)
        keep = u < v  # canonical orientation; drops u==v wedges too
        u, v, w = u[keep], v[keep], w[keep]
        # In-batch combiner (deterministically ordered partial sums).
        order = np.lexsort((v, u))
        u, v, w = u[order], v[order], w[order]
        if u.size:
            starts = np.flatnonzero(
                np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
            )
            return pa.table({
                "u": u[starts],
                "v": v[starts],
                "aa": np.add.reduceat(w, starts),
            })
        return pa.table({"u": u, "v": v, "aa": w})

    from ray.data.aggregate import Sum

    pairs = (
        wedges.map_batches(emit, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("aa", alias_name="aa"))
    )
    if not exclude_edges:
        return pairs

    def canon(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch.column("src").cast(pa.int64()),
            "v": batch.column("dst").cast(pa.int64()),
        })

    linked = (
        e.filter(expr="src < dst")
        .map_batches(canon, batch_format="pyarrow")
        .materialize()
    )
    return pairs.materialize().join(
        linked, join_type="left_anti",
        num_partitions=num_partitions, on=("u", "v"),
    )


def adamic_adar_numpy(
    src: np.ndarray, dst: np.ndarray, n: int,
    exclude_edges: bool = True,
) -> dict[tuple[int, int], float]:
    """Dense oracle (tests): symmetric adjacency assumed."""
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    deg = A.sum(1)
    out: dict[tuple[int, int], float] = {}
    for u in range(n):
        for v in range(u + 1, n):
            if exclude_edges and A[u, v]:
                continue
            common = np.flatnonzero(A[u] * A[v])
            if common.size:
                out[(u, v)] = float(np.sum(1.0 / np.log(deg[common])))
    return out


def jaccard_similarity(
    edges_sym: "ray.data.Dataset",
    exclude_edges: bool = True,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Neighborhood Jaccard link prediction: (u, v, jaccard) for
    co-neighbor pairs u < v of a SYMMETRIC deduped edge table, with
    J(u,v) = |N(u)∩N(v)| / (deg(u)+deg(v)−|N(u)∩N(v)|). Common-neighbor
    counts ride the adamic_adar wedge plan (self-join on the middle,
    INTEGER in-batch combiner — no FP order anywhere until the final
    exact small-integer division); endpoint degrees attach via the
    broadcast dimension pattern (the degree table is O(vertices))."""
    from ray.data.aggregate import Sum

    from alp_ray.stages.graph import degrees
    from alp_ray.stages.relational import broadcast_join

    e = edges_sym.select_columns(["src", "dst"]).materialize()
    if num_partitions is None:
        num_partitions = join_partitions(e.count())
    deg = degrees(e, key="src", name="deg").map_batches(
        lambda b: pa.table({
            "k": b.column("src").cast(pa.int64()),
            "deg": b.column("deg").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    def as_left(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch.column("dst").cast(pa.int64()),
            "mid": batch.column("src").cast(pa.int64()),
        })

    def as_right(batch: pa.Table) -> pa.Table:
        return pa.table({
            "mid": batch.column("src").cast(pa.int64()),
            "v": batch.column("dst").cast(pa.int64()),
        })

    left = e.map_batches(as_left, batch_format="pyarrow").materialize()
    right = e.map_batches(as_right, batch_format="pyarrow").materialize()
    wedges = left.join(
        right, join_type="inner",
        num_partitions=num_partitions, on=("mid",),
    )

    def emit(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u"), np.int64)
        v = np.asarray(batch.column("v"), np.int64)
        keep = u < v
        u, v = u[keep], v[keep]
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        if u.size:
            starts = np.flatnonzero(
                np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
            )
            cnt = np.diff(np.r_[starts, u.size]).astype(np.int64)
            return pa.table({
                "u": u[starts], "v": v[starts], "common": cnt,
            })
        return pa.table({
            "u": u, "v": v, "common": np.zeros(0, np.int64),
        })

    pairs = (
        wedges.map_batches(emit, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("common", alias_name="common"))
    )
    if exclude_edges:
        def canon(batch: pa.Table) -> pa.Table:
            return pa.table({
                "u": batch.column("src").cast(pa.int64()),
                "v": batch.column("dst").cast(pa.int64()),
            })

        linked = (
            e.filter(expr="src < dst")
            .map_batches(canon, batch_format="pyarrow")
            .materialize()
        )
        pairs = pairs.materialize().join(
            linked, join_type="left_anti",
            num_partitions=num_partitions, on=("u", "v"),
        )

    def key_u(batch: pa.Table) -> pa.Table:
        # Empty shuffle partitions can surface COLUMN-LESS blocks —
        # re-type them so the broadcast joins see one schema.
        if "common" not in batch.column_names or len(batch) == 0:
            return pa.table({
                "k": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "common": pa.array([], pa.int64()),
            })
        return pa.table({
            "k": batch.column("u"),
            "v": batch.column("v"),
            "common": batch.column("common").cast(pa.int64()),
        })

    def key_v(batch: pa.Table) -> pa.Table:
        if "common" not in batch.column_names or len(batch) == 0:
            return pa.table({
                "u": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "common": pa.array([], pa.int64()),
                "deg_u": pa.array([], pa.int64()),
            })
        return pa.table({
            "u": batch.column("k"),
            "k": batch.column("v"),
            "common": batch.column("common"),
            "deg_u": batch.column("deg"),
        })

    j1 = broadcast_join(
        pairs.map_batches(key_u, batch_format="pyarrow"), deg, on="k"
    )
    j2 = broadcast_join(
        j1.map_batches(key_v, batch_format="pyarrow"), deg, on="k"
    )

    def finish(batch: pa.Table) -> pa.Table:
        if "common" not in batch.column_names or len(batch) == 0:
            return pa.table({
                "u": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            })
        u = np.asarray(batch.column("u"), np.int64)
        v = np.asarray(batch.column("k"), np.int64)
        c = np.asarray(batch.column("common"), np.float64)
        du = np.asarray(batch.column("deg_u"), np.float64)
        dv = np.asarray(batch.column("deg"), np.float64)
        return pa.table({
            "u": pa.array(u),
            "v": pa.array(v),
            "jaccard": pa.array(round_half_away(c / (du + dv - c), 6)),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def average_neighbor_degree(
    edges_sym: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Average neighbor degree per vertex over a SYMMETRIC deduped edge
    table — the per-vertex form of the degree-degree correlation that
    degree_assortativity summarizes as one scalar (Barrat et al., PNAS
    2004). Returns (vertex, avg_nbr_deg) rounded to 6 dp.

    Plan: one degree groupby, broadcast the O(n) degree table (the
    dimension-enrich pattern), then per-batch INTEGER partial sums of
    neighbor degrees per src + one src-keyed Sum; the only FP op is the
    final exact small-integer division."""
    from ray.data.aggregate import Sum

    from alp_ray.stages.graph import degrees
    from alp_ray.stages.relational import broadcast_join

    e = edges_sym.select_columns(["src", "dst"]).materialize()
    deg = degrees(e, key="src", name="deg").map_batches(
        lambda b: pa.table({
            "dst": b.column("src").cast(pa.int64()),
            "deg": b.column("deg").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    enriched = broadcast_join(e, deg, on="dst")

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"), np.int64)
        d = np.asarray(batch.column("deg"), np.int64)
        uk, inv = np.unique(s, return_inverse=True)
        return pa.table({
            "src": pa.array(uk),
            "sum_deg": pa.array(
                np.bincount(inv, weights=d).astype(np.int64)
            ),
            "cnt": pa.array(np.bincount(inv).astype(np.int64)),
        })

    agg = (
        enriched.map_batches(partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(
            Sum("sum_deg", alias_name="sum_deg"),
            Sum("cnt", alias_name="cnt"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        if "sum_deg" not in batch.column_names or len(batch) == 0:
            return pa.table({
                "vertex": pa.array([], pa.int64()),
                "avg_nbr_deg": pa.array([], pa.float64()),
            })
        s = np.asarray(batch.column("sum_deg"), np.float64)
        c = np.asarray(batch.column("cnt"), np.float64)
        return pa.table({
            "vertex": batch.column("src").cast(pa.int64()),
            "avg_nbr_deg": pa.array(round_half_away(s / c, 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
