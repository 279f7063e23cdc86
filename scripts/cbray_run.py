"""CLI entrypoints for `ray job submit` — e.g.

    ray job submit -- python scripts/cbray_run.py pagerank \
        --n 100000 --extras 16 --g 8 --iters 20 --ckpt /tmp/cbray/job1

Owns its Ray session (guarded init), writes metrics + result parquet under
the checkpoint dir; rerunning resumes from the block manifest and the
latest iteration snapshot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("app", choices=["pagerank", "cc", "bfs", "triangles"])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--extras", type=int, default=16)
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ckpt", default="/tmp/cbray/job")
    ap.add_argument("--root", type=int, default=1)
    args = ap.parse_args()

    import numpy as np

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    import combblas_ray  # noqa: F401
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.pagerank import pagerank
    from combblas_ray.sources.corpus import arith_edges_dataset

    t0 = time.perf_counter()
    graph = Graph(n=args.n, edges=arith_edges_dataset(args.n, args.extras))
    graph = graph.remove_loops()
    if args.app in ("cc", "bfs", "triangles"):
        graph = graph.union_max()
    result = {"app": args.app, "n": args.n}

    if args.app == "triangles":
        result["triangles"] = alg.triangle_count(graph.edges, args.n)
    else:
        eng = SpmvEngine.from_graph(
            graph, args.g, os.path.join(args.ckpt, "blocks"),
            structural=args.app != "pagerank",
        )
        if args.app == "pagerank":
            r, info = pagerank(
                eng, iters=args.iters,
                ckpt_dir=os.path.join(args.ckpt, "iters"),
            )
            result.update({"iters": info["iters"], "sum": float(r.sum())})
        elif args.app == "cc":
            labels, it = alg.connected_components(eng)
            result.update({"iters": it,
                           "components": int(len(np.unique(labels)))})
        elif args.app == "bfs":
            d = alg.bfs_distances_auto(eng, args.root)
            result.update({"reached": int(np.isfinite(d).sum())})
        result["engine"] = eng.metrics()
    result["wall_sec"] = round(time.perf_counter() - t0, 3)
    os.makedirs(args.ckpt, exist_ok=True)
    with open(os.path.join(args.ckpt, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
