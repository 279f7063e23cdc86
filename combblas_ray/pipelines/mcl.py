"""Markov clustering (HipMCL) — the reference's flagship application.

Parity with ``Applications/MCL.cpp``:
- ``AdjustLoops``: self-loop := column max      (MCL.cpp:462-473)
- ``MakeColStochastic``: w /= colsum            (MCL.cpp:388-394)
- loop until Chaos < eps                        (MCL.cpp:554-612):
    expand   A := A * A   (`MemEfficientSpGEMM`, here the hash-join
                           SpGEMM with the prune/select fused after)
    prune    hard threshold + per-column top-S  (`MCLPruneRecoverySelect`,
                           ParFriends.h:185-354, via the dst-partitioned
                           local top-k — a column's entries co-locate)
    inflate  w := w^r; re-normalize             (MCL.cpp:445-449)
    chaos    max_col(colmax - colssq)           (MCL.cpp:406-420)
- ``Interpret``: clusters = connected components of the converged matrix
                                                (MCL.cpp:371-385)

The per-iteration matrix is re-materialized (natural lineage cut — the
reference's rank-resident evolving A). Column stats travel as a broadcast
vector (scale path: keyed join, same semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.shuffle import _rt0, edge_group_apply_tasks


def _col_normalize(edges_ds, n: int):
    """w /= colsum(src) (MakeColStochastic, MCL.cpp:388-394) as ONE
    src-hash shuffle + whole-partition vectorized divide. A column's
    entries co-locate under the hash partition, so the sums never leave
    the partition — no driver vector, no broadcast (the scale path the
    reference gets from its column-distributed layout)."""

    def _norm(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"))
        if len(src) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "w": pa.array([], type=pa.float64())}
            )
        w = np.asarray(batch.column("w")).astype(np.float64)
        uk, inv = np.unique(src, return_inverse=True)
        s = np.bincount(inv, weights=w)[inv]
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "w": pa.array(w / np.where(s == 0, 1.0, s)),
            }
        )

    return edge_group_apply_tasks(edges_ds, "src", _norm)


def _split_sentinel(tbl: pa.Table):
    """(real edge rows, partition stats) from a _fused_post output.
    Stats = (chaos max, nnz expanded, nnz after prune, nnz after
    select) — the `MCLPruneRecoverySelect` log counts (``MCL.cpp``),
    carried as sentinel rows src=-1 keyed by dst 0..3."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        return tbl, (0.0, 0, 0, 0)
    src = np.asarray(tbl.column("src"))
    neg = src < 0
    if not neg.any():
        return tbl, (0.0, 0, 0, 0)
    dst = np.asarray(tbl.column("dst"))[neg]
    w = np.asarray(tbl.column("w"), dtype=np.float64)[neg]
    stats = np.zeros(4)
    stats[dst] = w
    return (tbl.filter(pa.array(~neg)),
            (float(stats[0]), int(stats[1]), int(stats[2]),
             int(stats[3])))


def mcl(
    sym_edges_ds,
    n: int,
    *,
    inflation: float = 2.0,
    prune_threshold: float = 1e-4,
    select: int = 50,
    eps: float = 1e-3,
    max_iters: int = 20,
    interpret: bool = True,
) -> tuple[np.ndarray, dict]:
    """Returns (cluster labels per vertex, info). Input: structural
    undirected edge Dataset (both directions present)."""
    import ray

    from ..core.graph import Graph

    import time

    t0 = time.perf_counter()
    # AdjustLoops: add self loops with weight = column max (here 1.0 on the
    # structural matrix), then normalize
    g = Graph(n=n, edges=sym_edges_ds).dedup_sum().apply(lambda w: np.ones_like(w))
    A = g.add_loops(1.0).edges
    A = _col_normalize(A, n).materialize()
    info = {"iters": 0, "chaos": [],
            "t_init": time.perf_counter() - t0, "t_iter": []}

    def _fused_post(tbl: pa.Table) -> pa.Table:
        """Per-partition (whole columns): normalize -> prune -> top-select
        -> inflate -> normalize -> chaos stats. Emits edges plus one
        sentinel row (src=-1) carrying the partition's chaos."""
        src = np.asarray(tbl.column("src"))
        dst = np.asarray(tbl.column("dst"))
        w = np.asarray(tbl.column("w")).astype(np.float64)
        n_expanded = len(src)
        if len(src) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "w": pa.array([], type=pa.float64())}
            )
        order = np.lexsort((dst, -w, src))
        src, dst, w = src[order], dst[order], w[order]

        def colsums(vals):
            u, starts = np.unique(src, return_index=True)
            sums = np.add.reduceat(vals, starts)
            # broadcast back per entry
            seg = np.zeros(len(src), dtype=np.int64)
            seg[starts[1:]] = 1
            return sums[np.cumsum(seg)]

        w = w / colsums(w)  # stochastic (prune threshold semantics)
        keep = w >= prune_threshold
        src, dst, w = src[keep], dst[keep], w[keep]
        n_pruned = len(src)
        if len(src) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "w": pa.array([], type=pa.float64())}
            )
        # top-`select` per column (already sorted by (src, -w))
        u, starts = np.unique(src, return_index=True)
        ends = np.append(starts[1:], len(src))
        keep_idx = np.concatenate(
            [np.arange(s, min(s + select, e)) for s, e in zip(starts, ends)]
        )
        src, dst, w = src[keep_idx], dst[keep_idx], w[keep_idx]
        w = w ** inflation
        w = w / colsums(w)
        # chaos: max over columns of (colmax - col sum of squares)
        u, starts = np.unique(src, return_index=True)
        chaos = float(
            (np.maximum.reduceat(w, starts)
             - np.add.reduceat(w * w, starts)).max()
        )
        sent = np.array([chaos, float(n_expanded), float(n_pruned),
                         float(len(src))])
        return pa.table(
            {
                "src": pa.array(np.append(src, np.full(4, -1))),
                "dst": pa.array(np.append(dst,
                                          np.arange(4, dtype=np.int64))),
                "w": pa.array(np.append(w, sent)),
            }
        )

    from ..core.spgemm import spgemm_tasks

    def _mcl_partitions() -> int:
        # Size the expansion fan-out to the cluster: on 32 CPUs the fixed
        # 8-way plan left 3/4 of the machine idle during the heavy first
        # iterations; cap so tiny clusters don't over-split the shuffle.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        return max(8, min(64, cpus))

    for it in range(max_iters):
        t1 = time.perf_counter()
        # ONE SpGEMM execution per iteration with the whole MCL column step
        # fused into the src-partitioned merge; the raw-task plan keeps the
        # iterative loop off Ray Data's per-round actor-pool spawn cost
        A_next = spgemm_tasks(
            A, A, n, num_partitions=_mcl_partitions(),
            partition_on="src", post_fn=_fused_post
        )
        # split the per-partition chaos sentinels in one warm task wave
        # (a filter operator execution per iteration costs more than the
        # split itself)
        halves = [
            _rt0(_split_sentinel).options(num_returns=2).remote(b)
            for b in A_next.to_arrow_refs()
        ]
        A = ray.data.from_arrow_refs([h[0] for h in halves])
        stats = ray.get([h[1] for h in halves])
        ch = max((st[0] for st in stats), default=0.0)
        info["chaos"].append(ch)
        info.setdefault("prune_stats", []).append((
            sum(st[1] for st in stats), sum(st[2] for st in stats),
            sum(st[3] for st in stats)))
        info["iters"] = it + 1
        info["t_iter"].append(time.perf_counter() - t1)
        if ch < eps:
            break
    if not interpret:  # metrics-only callers (chaos trace) skip the CC
        return None, info
    # Interpret: clusters = CC of the structural converged matrix
    t1 = time.perf_counter()
    clusters = _interpret_cc(A, n)
    info["t_interpret"] = time.perf_counter() - t1
    return clusters, info


def mcl_incremental(
    prev_edges_ds,
    prev_clusters: np.ndarray,
    delta_edges_ds,
    n: int,
    **mcl_kwargs,
) -> tuple[np.ndarray, dict]:
    """Incremental MCL (`Applications/Incremental/`, the
    ``IncrementalMCLSquare`` family, ``ParFriends.h:843-1237`` spec):
    instead of re-clustering the whole graph after a delta, re-run MCL
    only on the PERTURBED REGION — the delta's endpoints plus every
    vertex sharing a previous cluster with one — and carry the remaining
    clusters over unchanged. Cluster labels are canonical (min member
    dense id) on both paths, so on fixtures whose perturbation does not
    leak across cluster boundaries the result is IDENTICAL to a full
    re-run (asserted in tests).

    ``prev_edges_ds``: the pre-delta structural symmetric edge Dataset.
    ``prev_clusters``: labels from the previous (full or incremental) run.
    ``delta_edges_ds``: new symmetric structural edges.
    Returns (labels, info); info["affected"] = re-clustered vertex count.
    """
    import ray

    # 1. perturbed region: delta endpoints ∪ their previous clusters
    dv: set[int] = set()
    for t in ray.get(delta_edges_ds.to_arrow_refs()):
        if t.num_rows == 0 or "src" not in t.column_names:
            continue
        dv.update(np.asarray(t.column("src")).tolist())
        dv.update(np.asarray(t.column("dst")).tolist())
    if not dv:
        # empty delta: nothing perturbed, previous clustering stands
        return prev_clusters.copy(), {"affected": 0}
    aff_clusters = {int(prev_clusters[v]) for v in dv}
    affected = np.nonzero(
        np.isin(prev_clusters, np.fromiter(aff_clusters, dtype=np.int64))
    )[0]
    # delta may introduce brand-new vertices with no previous cluster row
    affected = np.unique(
        np.concatenate([affected, np.fromiter(dv, dtype=np.int64)])
    )
    info: dict = {"affected": int(len(affected))}

    # 2. merged edge set, induced on the affected set, compactly relabeled
    member = np.zeros(n, dtype=bool)
    member[affected] = True
    local_of = np.full(n, -1, dtype=np.int64)
    local_of[affected] = np.arange(len(affected))
    m_ref = ray.put((member, local_of))

    def _induce(batch: pa.Table, *, _ref=m_ref) -> pa.Table:
        mem, loc = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        keep = mem[src] & mem[dst]
        return pa.table(
            {
                "src": pa.array(loc[src[keep]]),
                "dst": pa.array(loc[dst[keep]]),
                "w": pa.array(np.asarray(batch.column("w"))[keep]),
            }
        )

    merged = prev_edges_ds.union(delta_edges_ds)
    sub = merged.map_batches(_induce, batch_format="pyarrow",
                             zero_copy_batch=True)

    # 3. re-cluster the region, map labels back to canonical global ids
    sub_labels, sub_info = mcl(sub, len(affected), **mcl_kwargs)
    info["mcl"] = sub_info
    out = prev_clusters.copy()
    glob = affected[sub_labels]  # label = min LOCAL id -> its global id
    # canonicalize: min GLOBAL id per new cluster
    uniq, inv = np.unique(glob, return_inverse=True)
    mins = np.full(len(uniq), np.iinfo(np.int64).max)
    np.minimum.at(mins, inv, affected)
    out[affected] = mins[inv]
    return out, info


def _cc_one_task(n: int, *tbls) -> np.ndarray:
    """Whole-graph min-label CC in ONE warm task (small-n interpret fast
    path): minimum.at over both edge directions + pointer jumping to a
    fixpoint. Labels = min member dense id — identical to the engine CC."""
    ss, dd = [], []
    for t in tbls:
        if t.num_rows == 0 or "src" not in t.column_names:
            continue
        ss.append(np.asarray(t.column("src"), dtype=np.int64))
        dd.append(np.asarray(t.column("dst"), dtype=np.int64))
    lab = np.arange(n, dtype=np.int64)
    if not ss:
        return lab
    src = np.concatenate(ss)
    dst = np.concatenate(dd)
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, dst, lab[src])
        np.minimum.at(l2, src, lab[dst])
        while True:
            l3 = l2[l2]
            if np.array_equal(l3, l2):
                break
            l2 = l3
        if np.array_equal(l2, lab):
            return lab
        lab = l2


_INTERPRET_LOCAL_MAX_N = 1 << 17  # <= 6.5M pruned entries in one task


def _interpret_cc(edges_ds, n: int) -> np.ndarray:
    """``Interpret``: clusters = connected components of the converged
    matrix structure (MCL.cpp:371-385), run on the distributed CC engine
    (min-label propagation + pointer jumping over a structural block
    grid) — no driver-side edge loop, labels = min member dense id (the
    same canonical labels the old union-find produced). Below
    ``_INTERPRET_LOCAL_MAX_N`` the converged matrix (<= select*n entries)
    fits one warm task — skip the engine build entirely."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n <= _INTERPRET_LOCAL_MAX_N:
        import ray

        from ..core.shuffle import _rt0

        return ray.get(
            _rt0(_cc_one_task).remote(n, *edges_ds.to_arrow_refs())
        )
    import shutil
    import tempfile

    from ..core.engine import SpmvEngine
    from ..core.graph import Graph
    from .algorithms import connected_components

    g = 1 if n < (1 << 20) else 4
    ckpt = tempfile.mkdtemp(prefix="mcl_interpret_", dir="/tmp")
    eng = None
    try:
        eng = SpmvEngine.from_graph(
            Graph(n=n, edges=edges_ds).union_max(), g, ckpt,
            resume=False, structural=True,
        )
        labels, _iters = connected_components(eng)
        return labels
    finally:
        if eng is not None:
            eng.shutdown()
        shutil.rmtree(ckpt, ignore_errors=True)
