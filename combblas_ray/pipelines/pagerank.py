"""PageRank = power iteration of semiring SpMV over the resident CSR grid.

The reference pattern is iterated ``SpMV<PlusTimesSRing>`` +
`MakeColStochastic`-style normalization (``MCL.cpp:388-394`` /
``ParFriends.h:2379-2451``); dangling-vertex handling mirrors the
isolated-vertex special-casing of CC (``CC.h:1415-1417``).

Scale design: the rank vector lives as ``g`` chunks in the object store;
every per-chunk elementwise step is a small Ray task, the SpMV is the
engine's 2D partial + combine, and the driver only ever touches scalars
(dangling mass, L1 delta). Checkpoint every ``ckpt_every`` iterations
writes per-chunk .npz + a manifest (iteration, chunk, path, rows, sha) —
resume picks up the latest complete iteration.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import ray

from ..core.engine import SpmvEngine


# num_cpus=0: O(n/g) elementwise chunk work must not queue behind the
# CPU-reserving block workers in scaling mode.
@ray.remote(num_returns=2, num_cpus=0)
def _make_x(r: np.ndarray, inv_outw: np.ndarray, dang: np.ndarray):
    """x = r / outw (0 on dangling) + this chunk's dangling mass."""
    return r * inv_outw, float(r[dang].sum())


@ray.remote(num_returns=2, num_cpus=0)
def _combine_update_delta(nrows: int, n: int, d: float, dmass: float,
                          r_prev: np.ndarray, *parts: np.ndarray):
    """Fused MergeContributions + axpy + L1 delta for the general path."""
    y = np.zeros(nrows, dtype=np.float64)
    for p in parts:
        y[: len(p)] += p
    r_new = (1.0 - d) / n + d * (y + dmass / n)
    return r_new, float(np.abs(r_new - r_prev).sum())


@ray.remote(num_returns=2, num_cpus=0)
def _combine_update(nrows: int, n: int, d: float, dmass: float,
                    dang: np.ndarray, *parts: np.ndarray):
    """Fused MergeContributions + PageRank axpy: sum the row-block partials,
    apply teleport + dangling mass, emit the chunk's next dangling mass.
    One task per row block per iteration — no separate update stage."""
    y = np.zeros(nrows, dtype=np.float64)
    for p in parts:
        y[: len(p)] += p
    r_new = (1.0 - d) / n + d * (y + dmass / n)
    return r_new, float(r_new[dang].sum())




def pagerank(
    engine: SpmvEngine,
    *,
    damping: float = 0.85,
    iters: int | None = None,
    tol: float | None = 1e-10,
    max_iters: int = 100,
    ckpt_dir: str | None = None,
    ckpt_every: int = 5,
    resume: bool = True,
    r0: np.ndarray | None = None,
    collect_trace: bool = False,
) -> tuple[np.ndarray, dict]:
    """Returns (rank vector, info). ``iters`` forces an exact iteration count
    (oracle mode); otherwise runs to L1 ``tol``. ``r0`` warm-starts the
    power iteration (incremental PageRank; a checkpoint resume wins over
    it when both are present). ``collect_trace`` records the
    per-iteration (dangling mass, L1 delta) pair in info["trace"] —
    the convergence-metrics feed (costs the delta sync even in fixed
    mode)."""
    n, g = engine.n, engine.g
    outw = engine.out_weights()
    dang_full = outw == 0.0
    inv_full = np.where(dang_full, 0.0, 1.0 / np.where(dang_full, 1.0, outw))

    inv_refs = engine.chunk(inv_full)
    dang_refs = engine.chunk(dang_full)

    start_iter = 0
    r_refs = None
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
        if resume:
            start_iter, r_refs = _load_latest(engine, ckpt_dir)
    if r_refs is None and r0 is not None:
        if len(r0) != n:
            raise ValueError(f"pagerank: r0 has {len(r0)} entries, n={n}")
        r_refs = engine.chunk(np.asarray(r0, dtype=np.float64))
        start_iter = 0
    if r_refs is None:
        r_refs = engine.chunk(np.full(n, 1.0 / n, dtype=np.float64))
        start_iter = 0

    total = iters if iters is not None else max_iters
    info = {"iters": 0, "delta": None, "iter_times": [], "resumed_at": start_iter}
    fixed = iters is not None
    sizes = engine.chunk_sizes()
    k = start_iter
    while k < total:
        t0 = time.perf_counter()
        made = [_make_x.remote(r_refs[i], inv_refs[i], dang_refs[i]) for i in range(g)]
        x_refs = [m[0] for m in made]
        # one sync point per iteration: the scalar dangling mass
        dmass = sum(ray.get([m[1] for m in made]))
        partials = engine.spmv_partial_refs(x_refs, "plus_times")
        upd = [
            _combine_update_delta.remote(
                sizes[i], n, damping, dmass, r_refs[i], *partials[i]
            )
            for i in range(g)
        ]
        new_refs = [u[0] for u in upd]
        if not fixed or collect_trace:
            delta = sum(ray.get([u[1] for u in upd]))
            info["delta"] = delta
        if collect_trace:
            info.setdefault("trace", []).append((dmass, delta))
        r_refs = new_refs
        k += 1
        info["iter_times"].append(time.perf_counter() - t0)
        if ckpt_dir and (k % ckpt_every == 0 or k == total):
            _checkpoint(ckpt_dir, k, r_refs)
        if not fixed and tol is not None and info["delta"] < tol:
            break
    info["iters"] = k
    if ckpt_dir:
        _write_metrics(ckpt_dir, engine, info)
    return engine.unchunk(r_refs), info


def _write_metrics(ckpt_dir: str, engine: SpmvEngine, info: dict) -> None:
    m = dict(engine.metrics())
    m.update(
        {
            "iters": info["iters"],
            "delta": info["delta"],
            "iter_time_mean_sec": (
                float(np.mean(info["iter_times"])) if info["iter_times"] else None
            ),
            "resumed_at": info.get("resumed_at", 0),
        }
    )
    tmp = os.path.join(ckpt_dir, "metrics.json.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(ckpt_dir, "metrics.json"))


def pagerank_prenormalized(
    engine: SpmvEngine,
    *,
    damping: float = 0.85,
    iters: int = 10,
) -> tuple[np.ndarray, dict]:
    """PageRank with the column-stochastic scaling baked into the resident
    blocks once (`DimApply` + `MakeColStochastic`, ``MCL.cpp:388-394``):
    the iteration is then a bare ``y = W r`` SpMV + axpy — the minimal
    per-iteration memory traffic. Mutates the engine's resident weights;
    use a dedicated engine (benchmark path).
    """
    n, g = engine.n, engine.g
    outw = engine.out_weights()
    dang_full = outw == 0.0
    inv_full = np.where(dang_full, 0.0, 1.0 / np.where(dang_full, 1.0, outw))
    engine.dim_apply("col", inv_full)

    dang_refs = engine.chunk(dang_full)
    r_refs = engine.chunk(np.full(n, 1.0 / n, dtype=np.float64))
    dmass = float(dang_full.sum()) / n  # sum of r0 over dangling vertices

    sizes = engine.chunk_sizes()
    info = {"iters": 0, "delta": None, "iter_times": []}
    for _ in range(iters):
        t0 = time.perf_counter()
        partials = engine.spmv_partial_refs(r_refs, "plus_times")
        upd = [
            _combine_update.remote(
                sizes[i], n, damping, dmass, dang_refs[i], *partials[i]
            )
            for i in range(g)
        ]
        r_refs = [u[0] for u in upd]
        dmass = sum(ray.get([u[1] for u in upd]))  # one scalar sync per iter
        info["iter_times"].append(time.perf_counter() - t0)
        info["iters"] += 1
    return engine.unchunk(r_refs), info


def _checkpoint(ckpt_dir: str, k: int, r_refs: list) -> None:
    from ..state.checkpoint import save_state

    save_state(ckpt_dir, "pr", k, r_refs)


def _load_latest(engine: SpmvEngine, ckpt_dir: str):
    from ..state.checkpoint import load_latest

    return load_latest(ckpt_dir, "pr", expected_sizes=engine.chunk_sizes())


def _ppr_update(t_chunk: np.ndarray, y: np.ndarray, bounds, *,
                d: float, dmass: float):
    """r' = (1-d)*t + d*(y + dmass*t) — teleport AND dangling mass both
    land on the personalization vector (standard PPR convention)."""
    return (1.0 - d) * t_chunk + d * (y + dmass * t_chunk)


def ppr_fixed(engine: SpmvEngine, seed_mask: np.ndarray, *,
              iters: int = 10, damping: float = 0.85) -> np.ndarray:
    """Personalized PageRank, exactly ``iters`` power iterations with the
    teleport vector t = seed_mask / |seeds| (r0 = t). Same chunked-refs
    discipline as `pagerank` — per iteration one x/dangling-mass task
    round + one fused SpMV-combine+update round; the driver syncs only
    the dangling-mass scalar. Reference analog: the same iterated
    ``SpMV<PlusTimesSRing>`` + axpy recipe (``MCL.cpp:388-394``) with a
    non-uniform teleport."""
    from functools import partial

    n = engine.n
    outw = engine.out_weights()
    dang_full = outw == 0.0
    inv_full = np.where(dang_full, 0.0,
                        1.0 / np.where(dang_full, 1.0, outw))
    t = seed_mask.astype(np.float64)
    ts = t.sum()
    if ts == 0:
        raise ValueError("ppr_fixed: empty seed set")
    t /= ts
    t_refs = engine.chunk(t)
    inv_refs = engine.chunk(inv_full)
    dang_refs = engine.chunk(dang_full)
    r_refs = t_refs
    for _ in range(iters):
        xs = [
            _make_x.remote(r, iv, dg)  # shared with pagerank's loop
            for r, iv, dg in zip(r_refs, inv_refs, dang_refs)
        ]
        dmass = float(sum(ray.get([x[1] for x in xs])))
        r_refs = engine.spmv_apply_refs(
            [x[0] for x in xs], "plus_times",
            partial(_ppr_update, d=damping, dmass=dmass), 1, t_refs,
        )[0]
    return engine.unchunk(r_refs)


def pagerank_incremental(
    engine: SpmvEngine,
    r_prev: np.ndarray,
    *,
    damping: float = 0.85,
    tol: float | None = 1e-10,
    max_iters: int = 100,
) -> tuple[np.ndarray, dict]:
    """Incremental PageRank: power iteration on an UPDATED graph
    warm-started from the previous converged rank vector. The power
    method's iteration count scales with the start's distance to the
    fixpoint, so a small edge delta converges in a handful of
    iterations instead of a cold-start run (the `mcl_incremental`
    discipline applied to the north-rule app; same fixpoint as a full
    re-run, to ``tol``). Handles vertex-set growth by padding new
    vertices at 1/n and renormalizing to unit mass."""
    n = engine.n
    r0 = np.full(n, 1.0 / n, dtype=np.float64)
    m = min(len(r_prev), n)
    r0[:m] = np.asarray(r_prev[:m], dtype=np.float64)
    s = r0.sum()
    if s > 0:
        r0 /= s
    return pagerank(engine, damping=damping, tol=tol,
                    max_iters=max_iters, r0=r0)
