"""Benchmark harness.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address='local',
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": ..., "value": seconds, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the same PageRank job twice in FRESH processes
(num_cpus=8 then num_cpus=32) over the same synthetic arithmetic graph and
reports throughput at both plus the scaling efficiency
(= speedup / cpu-ratio). Block checkpoints are shared between the two runs
(the second resumes the same 2D partitioning), so only iteration
throughput is compared.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALING_N = int(os.environ.get("CBRAY_SCALING_N", 4_000_000))
SCALING_EXTRAS = int(os.environ.get("CBRAY_SCALING_EXTRAS", 32))
SCALING_G = 10
SCALING_ITERS = 10


def run_headline() -> None:
    import numpy as np

    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.pagerank import pagerank

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    ctx = get_context(sf_dir)
    nnz = ctx.edges.count()
    timings["build_edges"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng = ctx.engine("directed")
    timings["build_blocks"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    r, info = pagerank(eng, iters=10)
    timings["pagerank10"] = time.perf_counter() - t0
    pr_iter_sec = 10 / timings["pagerank10"]
    pr_eps = nnz * 10 / timings["pagerank10"]

    t0 = time.perf_counter()
    sym = ctx.engine("sym")
    timings["build_sym"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels_cc, cc_iters = alg.connected_components(sym)
    timings["cc_converged"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    root = int(np.searchsorted(ctx.labels, "m_0"))
    alg.min_plus_distances(sym, root, iters=12)
    timings["bfs12"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    alg.label_propagation(sym, (ctx.arith % 10).astype(np.int64), 10, 5)
    timings["labelprop5"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tri = alg.triangle_count(ctx.graph("sym").edges, ctx.n)
    timings["triangles"] = time.perf_counter() - t0

    total = sum(timings.values())
    out = {
        "metric": "headline_pipeline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_vertices": ctx.n,
        "nnz": int(nnz),
        "pagerank_iters_per_sec": round(pr_iter_sec, 3),
        "pagerank_edges_per_sec": round(pr_eps, 1),
        "cc_iters": cc_iters,
        "triangles": int(tri),
    }
    print(json.dumps(out))
    ray.shutdown()


def run_scaling_child(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    from combblas_ray.core.engine import SpmvEngine, build_blocks
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines.pagerank import pagerank
    from combblas_ray.sources.corpus import arith_edges_dataset

    n = SCALING_N
    ckpt = os.path.join(
        os.environ.get("CBRAY_CKPT_ROOT", "/tmp/cbray"),
        f"scaling_n{n}_x{SCALING_EXTRAS}_g{SCALING_G}",
    )
    t0 = time.perf_counter()
    graph = Graph(n=n, edges=arith_edges_dataset(n, SCALING_EXTRAS)).remove_loops()
    man = build_blocks(graph, SCALING_G, ckpt)
    build_sec = time.perf_counter() - t0

    pool = max(1, num_cpus - 2)
    eng = SpmvEngine.from_manifest(man, pool_size=pool, pool_cpus=1)
    # warmup iteration (actor residency, code paths)
    pagerank(eng, iters=1)
    t0 = time.perf_counter()
    _, info = pagerank(eng, iters=SCALING_ITERS)
    pr_sec = time.perf_counter() - t0
    nnz = eng.nnz()
    print(
        json.dumps(
            {
                "num_cpus": num_cpus,
                "pool_size": pool,
                "n": n,
                "nnz": nnz,
                "iters": SCALING_ITERS,
                "build_sec": round(build_sec, 3),
                "pagerank_sec": round(pr_sec, 3),
                "edges_per_sec": round(nnz * SCALING_ITERS / pr_sec, 1),
            }
        )
    )
    ray.shutdown()


def run_scaling() -> None:
    results = []
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child",
             "--cpus", str(cpus)],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"error": "child failed",
                              "stderr": proc.stderr[-2000:]}))
            sys.exit(1)
        results.append(json.loads(line[-1]))
    lo, hi = results
    speedup = lo["pagerank_sec"] / hi["pagerank_sec"]
    ratio = hi["num_cpus"] / lo["num_cpus"]
    eff = speedup / ratio
    print(
        json.dumps(
            {
                "metric": "pagerank_scaling_efficiency",
                "value": round(eff, 3),
                "unit": "efficiency",
                "queries": {
                    f"pagerank_{lo['num_cpus']}cpus": lo["pagerank_sec"],
                    f"pagerank_{hi['num_cpus']}cpus": hi["pagerank_sec"],
                },
                "sf": f"synthetic_n{SCALING_N}_x{SCALING_EXTRAS}",
                "num_cpus": hi["num_cpus"],
                "low": lo,
                "high": hi,
                "speedup": round(speedup, 3),
                "cpu_ratio": ratio,
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-child", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    if args.scaling_child:
        run_scaling_child(args.cpus)
    elif args.scaling:
        run_scaling()
    else:
        run_headline()
