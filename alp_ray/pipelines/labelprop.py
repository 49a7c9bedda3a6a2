"""Semi-supervised binary label propagation (Kamvar et al. 2003).

≙ include/graphblas/algorithms/label.hpp:122-290:
- D = row-sum diagonal of symmetric weight matrix W via dense mxv on ones
  (:163-169), inverted per entry (:184-187);
- loop: ``fNext = W·f`` (:217-218); threshold
  ``fNext[i] = (fNext[i]·Dinv[i] < 0.5 ? 0 : 1)`` (:228-231); clamp the
  first ``l`` seed labels via masked foldl with right_assign (:238-242);
- converged when no entry changed — dot with (or, not_equal) (:253);
  max 1000 iterations.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from alp_ray.state.engine import GraphEngine


@dataclass
class LabelPropResult:
    converged: bool
    iterations: int


def _rowsum_pre(state, ctx):
    return np.ones(ctx["n_local"])


def _rowsum_post(state, y, ctx):
    dinv = np.zeros_like(y)
    nz = y != 0
    dinv[nz] = 1.0 / y[nz]
    state["dinv"] = dinv
    return {}


def _pre(state, ctx):
    return state["f"]


def _post(state, y, ctx):
    f_new = (y * state["dinv"] >= 0.5).astype(np.float64)
    # Clamp seeds (masked fold with right_assign — :238-242).
    seed = state["seed_mask"] > 0.5
    f_new[seed] = state["seed_labels"][seed]
    changed = float(np.sum(f_new != state["f"]))
    state["f"] = f_new
    return {"changed": changed}


def community_lpa(
    edges: "ray.data.Dataset",
    n: int,
    max_iters: int = 20,
) -> np.ndarray:
    """Synchronous community label propagation (Raghavan et al. 2007) —
    the generic LPA promised by SURVEY §7.6, built on the Pregel layer's
    vocabulary but with a NON-monoid combine (per-label frequency +
    argmax), so it runs as a Dataset pipeline: scatter labels along
    edges, count per (vertex, label) with an in-batch combiner, pick the
    most frequent label (ties → smallest label; deterministic).

    ``edges``: SYMMETRIC (src, dst) Dataset with dense vertex ids < n.
    Returns the final label array.
    """
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Sum

    # Pin the edge table once: a lazy plan (extraction/symmetrize
    # groupbys upstream) would otherwise re-execute EVERY iteration.
    edges = edges.materialize()
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iters):
        lref = ray.put(labels)

        def scatter(batch: pa.Table) -> pa.Table:
            lab = ray.get(lref)
            src = np.asarray(batch.column("src"), np.int64)
            dst = np.asarray(batch.column("dst"), np.int64)
            t = pa.table({"vertex": dst, "label": lab[src]})
            g = t.group_by(["vertex", "label"]).aggregate(
                [("vertex", "count")]
            )
            return g.rename_columns(["vertex", "label", "c"])

        counts = (
            edges.map_batches(scatter, batch_format="pyarrow")
            .groupby(["vertex", "label"])
            .aggregate(Sum("c", alias_name="cnt"))
        )

        if n <= 1_000_000:
            # Small-n fast path: the (vertex,label,cnt) table is O(edges
            # touched) but the argmax itself is a driver-side lexsort —
            # groupby().map_groups costs ~1 Ray task per vertex group,
            # which dominates at small scale.
            cdf = counts.to_pandas()
            vv = cdf["vertex"].to_numpy(np.int64)
            ll = cdf["label"].to_numpy(np.int64)
            cc = cdf["cnt"].to_numpy(np.int64)
            order = np.lexsort((ll, -cc, vv))  # by vertex, max cnt, min lab
            vv, ll = vv[order], ll[order]
            firsts = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
            picked_v, picked_l = vv[firsts], ll[firsts]
        else:
            def pick(group: pa.Table) -> pa.Table:
                v = group.column("vertex")[0].as_py()
                lab = np.asarray(group.column("label"), np.int64)
                cnt = np.asarray(group.column("cnt"), np.int64)
                order = np.lexsort((lab, -cnt))  # max count, min label
                return pa.table(
                    {
                        "vertex": pa.array([v], pa.int64()),
                        "new_label": pa.array(
                            [int(lab[order[0]])], pa.int64()
                        ),
                    }
                )

            picked = counts.groupby("vertex").map_groups(
                pick, batch_format="pyarrow"
            ).to_pandas()
            picked_v = picked["vertex"].to_numpy()
            picked_l = picked["new_label"].to_numpy()
        new_labels = labels.copy()
        new_labels[picked_v] = picked_l
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return labels


def label_propagation(
    engine: GraphEngine,
    seed_labels: np.ndarray,
    seed_mask: np.ndarray,
    max_iters: int = 1000,
) -> LabelPropResult:
    """``seed_labels``/``seed_mask``: dense length-n arrays (mask: which
    vertices are clamped). Edge table must be symmetric and weighted
    (weight column used by plus_times). Result in state ``"f"``."""
    engine.set_state_by_vertex("seed_labels", seed_labels.astype(np.float64))
    engine.set_state_by_vertex("seed_mask", seed_mask.astype(np.float64))
    f0 = np.where(seed_mask, seed_labels, 0.0)
    engine.set_state_by_vertex("f", f0.astype(np.float64))
    # D row sums (W symmetric → in-sum == row sum).
    engine.superstep(_rowsum_pre, "plus_second", _rowsum_post)

    it = 0
    changed = np.inf
    # Pipelined chunks (≙ nonblocking backend): the thresholded update is
    # idempotent at its fixpoint, so overshooting convergence is a no-op.
    while it < max_iters:
        chunk = min(4, max_iters - it)
        results = engine.run_supersteps(_pre, "plus_times", _post, chunk)
        for r in results:
            changed = r["changed"]
            it += 1
            if changed == 0:
                break
        if changed == 0:
            break
    return LabelPropResult(converged=changed == 0, iterations=it)
