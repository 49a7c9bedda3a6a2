"""``ray job submit``-able entrypoint (≙ the reference's standalone
Launcher drivers, tests/smoke/simple_pagerank.cpp:211-365 — parse args,
build the graph once, run the algorithm, write results).

Usage (local or via ray job submit on a cluster):

    python -m alp_ray.job --pipeline pagerank \
        --n-repos 120 --files-per-repo 400 \
        --out /tmp/alp_ray_out --checkpoint-dir /tmp/alp_ray_ck

Owns its Ray session (guarded — safe under a driver-initialised session
too). Writes per-shard parquet results + prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--pipeline",
        choices=["pagerank", "components", "triangles"],
        default="pagerank",
    )
    ap.add_argument("--n-repos", type=int, default=40)
    ap.add_argument("--files-per-repo", type=int, default=200)
    ap.add_argument("--import-factor", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--conv", type=float, default=1e-6)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--out", default="/tmp/alp_ray_out")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False)
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)

    from alp_ray.pipelines.code_graph import build_engine_from_corpus
    from alp_ray.sources.corpus import synth_corpus

    t0 = time.perf_counter()
    corpus = synth_corpus(
        n_repos=args.n_repos,
        files_per_repo=args.files_per_repo,
        seed=args.seed,
        import_factor=args.import_factor,
    )
    summary: dict = {"pipeline": args.pipeline}

    if args.pipeline == "triangles":
        from alp_ray.pipelines.code_graph import corpus_to_edge_ids
        from alp_ray.pipelines.triangles import triangle_count

        n_tri = triangle_count(corpus_to_edge_ids(corpus))
        summary.update({"n_triangles": n_tri})
    else:
        engine, mapping = build_engine_from_corpus(
            corpus, P=args.shards, symmetric=args.pipeline == "components"
        )
        build_s = time.perf_counter() - t0
        ckpt = None
        if args.checkpoint_dir:
            from alp_ray.state.checkpoint import Checkpointer

            ckpt = Checkpointer(
                args.checkpoint_dir, every=args.checkpoint_every
            )
        if args.pipeline == "pagerank":
            from alp_ray.pipelines.pagerank import pagerank

            res = pagerank(
                engine, alpha=args.alpha, conv=args.conv,
                checkpointer=ckpt,
            )
            from alp_ray.pipelines.code_graph import _state_with_hash_ids

            out_ds = _state_with_hash_ids(engine, mapping, "pr")
            summary.update(
                {
                    "n_vertices": res.n,
                    "n_edges": res.m,
                    "iterations": res.iterations,
                    "converged": res.converged,
                    "residual": res.residual,
                    "build_sec": round(build_s, 3),
                    "iter_sec": round(res.iter_seconds, 3),
                    "edges_per_sec": round(res.edges_per_sec),
                }
            )
        else:
            from alp_ray.pipelines.components import connected_components

            res = connected_components(engine, checkpointer=ckpt)
            from alp_ray.pipelines.code_graph import _state_with_hash_ids

            out_ds = _state_with_hash_ids(engine, mapping, "label")
            summary.update(
                {
                    "n_vertices": res.n,
                    "n_edges": res.m,
                    "iterations": res.iterations,
                    "build_sec": round(build_s, 3),
                }
            )
        # Partitioned result sink: one file per shard block → a re-run
        # can skip/overwrite per partition.
        os.makedirs(args.out, exist_ok=True)
        out_ds.write_parquet(args.out)
        engine.shutdown()
        summary["out"] = args.out

    summary["total_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
