"""Graph algorithms over the resident CSR engine + Dataset pipelines.

Parity map (reference file:line):
- ``connected_components``   <- FastSV/LACC min-label loop
  (``FastSV.h:335-374``, ``CC.h:1404-1544``): SpMV over the
  ``Select2ndMinSR`` semiring (``CC.h:62-84``) + pointer-jumping Shortcut
  (``CC.h:1321-1341``).
- ``cc_fixed`` — oracle-mode: pure synchronous min-label rounds (no
  jumping), exact-iteration semantics.
- ``bfs_distances``          <- level-synchronous BFS (``TopDownBFS.cpp:
  440-449``) expressed as min-plus relaxation (dense form).
- ``sssp``                   <- Bellman-Ford = iterated ``MinPlusSRing``
  SpMV (``Semirings.h:235-255``).
- ``label_propagation``      <- generalized CC inner step: per-class count
  SpMVs + argmax update.
- ``triangle_count``         <- masked SpGEMM recipe (``SpParMat.h:161``
  PruneI lower-triangular; ``Mult_AnXBn_Synch`` ``ParFriends.h:1447``;
  ``EWiseMult`` mask ``ParFriends.h:2629``) as a Dataset join pipeline.

Every iterative loop here is REFS-ONLY: vertex state lives as per-chunk
ObjectRefs in the object store end-to-end (the `FullyDistVec` analog);
the driver submits chunk kernels and syncs only small scalars
(convergence counts, frontier sizes). Full vectors materialize once, at
the final return.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from ..core.engine import SpmvEngine
from ..core.semiring import I64MAX

# int64 value-channel ceiling: the matchings encode (root, id) pairs as
# root*n + id, exact while n^2 <= int64 max -> n <= floor(sqrt(2^63 - 1))
_I64_ENC_MAX_N = 3_037_000_499


# --------------------------------------------------------------------------
# chunk kernels (module-level so cloudpickle ships them cheaply)
# --------------------------------------------------------------------------


def _iota(bounds):
    s, e = bounds
    return np.arange(s, e, dtype=np.float64)


def _min2(a, b):
    return np.minimum(a, b)


def _min2_b(a, y, bounds):
    """spmv_apply_refs adapter: fuse the partial combine with the
    elementwise min against prior state (one task round, not two)."""
    return np.minimum(a, y)


def _min2c_b(a, y, bounds):
    """`_min2_b` + a fused change COUNT: min-plus relaxation reaches its
    fixpoint when no chunk improves, and further rounds are no-ops —
    so fixed-`iters` (oracle-mode) loops may exit early EXACTLY. The
    count (truthiness-compatible with the old bool flag) also feeds the
    relaxation-trace queries."""
    m = np.minimum(a, y)
    return m, int((m < a).sum())


def _as_int(a):
    return a.astype(np.int64)


def _as_float(a):
    return a.astype(np.float64)


def _neq_inf_count(a, b):
    """Mismatch count treating +inf as a regular value (NaN-safe)."""
    return int(
        np.sum(np.nan_to_num(a, posinf=-1.0) != np.nan_to_num(b, posinf=-1.0))
    )


def _pair_len(pair):
    return int(len(pair[0]))


def _jump_step(jumped_f, idx):
    """Fused pointer-jump chunk kernel: int-cast + changed count."""
    nj = jumped_f.astype(np.int64)
    return nj, int(np.count_nonzero(nj != idx))


# Ceiling for the single-task Shortcut fast path (~64 MB of f8 labels).
# Below it the whole jump-to-stable loop runs in ONE task round; above it
# each jump is a distributed gather (3g tasks) + map + driver sync, which
# stays refs-only at any n but pays ~25 ms/round of task latency.
_CC_JUMP_LOCAL_MAX_N = 1 << 23


def _jump_to_stable(sizes, *chunks):
    """Whole pointer-jump Shortcut (CC.h:1321-1341) fused into one task:
    idx := idx[idx] until stable, returned as float label chunks."""
    idx = np.concatenate(chunks).astype(np.int64)
    while True:
        ni = idx[idx]
        if np.array_equal(ni, idx):
            break
        idx = ni
    out = idx.astype(np.float64)
    if len(sizes) == 1:
        return out
    return tuple(np.split(out, np.cumsum(sizes)[:-1]))


# --------------------------------------------------------------------------
# connected components
# --------------------------------------------------------------------------


def cc_fixed(engine: SpmvEngine, iters: int) -> np.ndarray:
    """`iters` synchronous rounds of l' = min(l, min over neighbors l[u])
    on the symmetrized engine. Returns dense-id component labels. Labels
    stay chunked in the object store across rounds."""
    l = engine.map_chunks_i(_iota)
    for _ in range(iters):
        l = engine.spmv_apply_refs(l, "select2nd_min", _min2_b, 1, l)[0]
    return engine.unchunk(l).astype(np.int64)


def connected_components(
    engine: SpmvEngine,
    max_iters: int = 100,
    *,
    ckpt_dir: str | None = None,
    ckpt_every: int = 5,
    resume: bool = True,
) -> tuple[np.ndarray, int]:
    """Min-label propagation + pointer-jumping shortcut, to convergence.
    Returns (labels, iterations). With ``ckpt_dir``, the label vector is
    snapshotted every ``ckpt_every`` rounds and restored on rerun. The
    label vector is chunked refs throughout; each pointer jump is a
    distributed gather (`Extract`, ``CC.h:419-577``)."""
    l = engine.map_chunks_i(_iota)
    start = 0
    if ckpt_dir and resume:
        from ..state.checkpoint import load_latest

        start, chunks = load_latest(ckpt_dir, "cc",
                                    expected_sizes=engine.chunk_sizes())
        if chunks is not None:
            l = list(chunks)  # already per-chunk ObjectRefs
    for k in range(start + 1, max_iters + 1):
        import ray

        l2 = engine.spmv_apply_refs(l, "select2nd_min", _min2_b, 1, l)[0]
        # Shortcut: parent = parent(parent) until stable (CC.h:1321-1341)
        if engine.n <= _CC_JUMP_LOCAL_MAX_N:
            r = _rt(_jump_to_stable).options(num_returns=engine.g).remote(
                engine.chunk_sizes(), *l2
            )
            l2 = [r] if engine.g == 1 else list(r)
        else:
            idx = engine.map_chunks(_as_int, l2)
            while True:
                jumped_f = engine.gather_refs(l2, idx)
                new_idx, changed = engine.map_chunks_n(
                    _jump_step, 2, jumped_f, idx
                )
                if sum(ray.get(changed)) == 0:
                    break
                idx = new_idx
            l2 = engine.map_chunks(_as_float, idx)
        if ckpt_dir and k % ckpt_every == 0:
            from ..state.checkpoint import save_state

            save_state(ckpt_dir, "cc", k, l2)
        if engine.chunks_equal(l2, l):
            return engine.unchunk(l2).astype(np.int64), k
        l = l2
    return engine.unchunk(l).astype(np.int64), max_iters


# --------------------------------------------------------------------------
# BFS / SSSP (min-plus relaxations)
# --------------------------------------------------------------------------


def _root_init(bounds, root):
    s, e = bounds
    d = np.full(e - s, np.inf)
    if s <= root < e:
        d[root - s] = 0.0
    return d


def min_plus_distances(
    engine: SpmvEngine, root: int, iters: int | None = None,
    max_iters: int = 10_000, trace: list | None = None
) -> np.ndarray:
    """d' = min(d, min over in-edges (w(u,v) + d[u])); fixed `iters` rounds
    (oracle mode) or until fixpoint. Unreached = +inf. Distance vector is
    chunked refs; convergence syncs one small count per round. Pass
    ``trace`` (a list) to record each round's improved-vertex count —
    the Bellman-Ford relaxation log (zero-count rounds never run, so
    the trace has one row per productive round)."""
    import ray

    d = engine.map_chunks_i(partial(_root_init, root=root))
    total = iters if iters is not None else max_iters
    for _ in range(total):
        d, ch = engine.spmv_apply_refs(d, "min_plus", _min2c_b, 2, d)
        n_impr = sum(ray.get(ch))
        if trace is not None and n_impr:
            trace.append(int(n_impr))
        if not n_impr:
            break  # fixpoint: remaining rounds are no-ops (exact)
    return engine.unchunk(d)


def _seed_init(bounds, seeds):
    s, e = bounds
    d = np.full(e - s, np.inf)
    local = seeds[(seeds >= s) & (seeds < e)] - s
    d[local] = 0.0
    return d


def msbfs_distances(engine: SpmvEngine, seeds: np.ndarray,
                    iters: int = 12) -> np.ndarray:
    """Multi-source BFS: distance to the NEAREST seed within ``iters``
    hops (min over seeds) — `min_plus_distances` with a seed-SET init
    (the multi-root pattern of the reference's batched BFS drivers).
    One fused min_plus SpMV + min round per level; unreached = +inf."""
    import ray

    seeds = np.asarray(seeds, dtype=np.int64)
    d = engine.map_chunks_i(partial(_seed_init, seeds=seeds))
    for _ in range(iters):
        d, ch = engine.spmv_apply_refs(d, "min_plus", _min2c_b, 2, d)
        if not any(ray.get(ch)):
            break  # fixpoint (exact)
    return engine.unchunk(d)


def _mod_seed_init(arith_chunk, mod):
    """Seed-distance init from the dictionary's arith chunk: 0 where
    arith %% mod == 0, +inf elsewhere — no driver seed array."""
    d = np.full(len(arith_chunk), np.inf)
    d[np.asarray(arith_chunk, dtype=np.int64) % mod == 0] = 0.0
    return d


def msbfs_mod_distances_refs(engine: SpmvEngine, arith_refs: list,
                             mod: int, iters: int = 12) -> list:
    """`msbfs_distances` with the seed set (arith %% mod == 0) generated
    PER CHUNK from the dictionary's arith slices — the whole loop is
    refs-only and the driver never holds a seed or distance array.
    Returns distance chunk refs (+inf = unreached)."""
    import ray

    d = engine.map_chunks(partial(_mod_seed_init, mod=mod), arith_refs)
    for _ in range(iters):
        d, ch = engine.spmv_apply_refs(d, "min_plus", _min2c_b, 2, d)
        if not any(ray.get(ch)):
            break  # fixpoint (exact)
    return d


def _topk_cand(deg_chunk, arith_chunk, bounds, k):
    """Per-chunk top-k candidates by (deg DESC, arith ASC): returns
    (global ids, degs, ariths) of at most k rows."""
    s, _e = bounds
    deg = np.asarray(deg_chunk, dtype=np.int64)
    ar = np.asarray(arith_chunk, dtype=np.int64)
    kk = min(k, len(deg))
    order = np.lexsort((ar, -deg))[:kk]
    return order.astype(np.int64) + s, deg[order], ar[order]


def top_by_degree(engine: SpmvEngine, arith_refs: list, k: int,
                  deg_refs: list | None = None) -> np.ndarray:
    """Distributed top-k vertices by (degree DESC, arith ASC) — the hub
    seed selector (`Reduce` + driver-k pattern, ``BetwCent.cpp:179``):
    per-chunk candidate top-k over fused row-sum refs, then an O(g*k)
    driver merge. No O(n) driver arrays. Returns dense ids in RANK
    order (callers needing sorted ids apply np.sort)."""
    import ray

    if deg_refs is None:
        deg_refs = engine.in_weights_refs()
    i_refs, d_refs, a_refs = engine.map_chunks_n(
        partial(_topk_cand, k=k), 3, deg_refs, arith_refs,
        with_bounds=True
    )
    ids = np.concatenate(ray.get(i_refs))
    deg = np.concatenate(ray.get(d_refs))
    ar = np.concatenate(ray.get(a_refs))
    top = np.lexsort((ar, -deg))[:k]
    return ids[top].astype(np.int64)


def _kseed_init(bounds, seeds):
    """(k, chunk) distance init: row i is seed i's BFS state."""
    s, e = bounds
    D = np.full((len(seeds), e - s), np.inf)
    sel = (seeds >= s) & (seeds < e)
    D[np.nonzero(sel)[0], seeds[sel] - s] = 0.0
    return D


def _kmin_f(D, Y, bounds):
    """spmm_apply_refs adapter: fused combine + elementwise min against
    the prior (k, chunk) distance state (+ fixpoint change flag)."""
    M = np.minimum(D, Y)
    return M, bool((M < D).any())


def kseed_distances_refs(engine: SpmvEngine, seeds: np.ndarray,
                         iters: int = 12) -> list:
    """K-source hop distances as CHUNKED (k, n/g) refs — the batched
    min-plus SpMM loop of the betweenness machinery
    (``BetwCent.cpp:179-187``) with the seeds kept SEPARATE (one row per
    seed). The driver never holds a (k, n) matrix; callers reduce the
    refs with `map_chunks` census kernels or gather seed columns only."""
    import ray

    seeds = np.asarray(seeds, dtype=np.int64)
    k = len(seeds)
    D = engine.map_chunks_n(
        partial(_kseed_init, seeds=seeds), 1, with_bounds=True
    )[0]
    for _ in range(iters):
        D, ch = engine.spmm_apply_refs(D, k, "min_plus", _kmin_f, 2, D)
        if not any(ray.get(ch)):
            break  # fixpoint: remaining rounds are no-ops (exact)
    return D


def fastsv(engine: SpmvEngine, max_iters: int = 200) -> tuple[np.ndarray, int]:
    """FastSV connected components (``FastSV.h:335-374``), with the
    reference's primitive structure mapped to distributed ops:
    - mngp = SpMV-min of grandparents          (Select2ndMinSR SpMV)
    - stochastic hooking: f[f[u]] = min(mngp)  (`Assign` scatter-min)
    - aggressive hooking: f[u] = min(f[u], mngp)
    - shortcutting: f = f[f]                   (`Extract` distributed gather)
    Converges when no grandparent changes. Returns (labels, iters).
    All vectors are chunked refs; hooking is `scatter_reduce_refs`."""
    f = engine.map_chunks_i(_iota)  # parent
    gp = f  # grandparent
    for it in range(1, max_iters + 1):
        # min nbr grandparent, fused with min against own grandparent
        mngp = engine.spmv_apply_refs(gp, "select2nd_min", _min2_b, 1, gp)[0]
        # stochastic hooking: scatter-min onto parents' slots
        f_idx = engine.map_chunks(_as_int, f)
        hook = engine.scatter_reduce_refs(
            list(zip(f_idx, mngp)), "select2nd_min"
        )
        f = engine.map_chunks(_min2, f, hook)
        # aggressive hooking onto own slot
        f = engine.map_chunks(_min2, f, mngp)
        # shortcutting: f = f[f] (distributed gather)
        f = engine.gather_refs(f, engine.map_chunks(_as_int, f))
        new_gp = engine.gather_refs(f, engine.map_chunks(_as_int, f))
        if engine.chunks_equal(new_gp, gp):
            return engine.unchunk(f).astype(np.int64), it
        gp = new_gp
    return engine.unchunk(f).astype(np.int64), max_iters


def _frontier_seed(bounds, root):
    """Parent-BFS seed: vals carry the PARENT id (root is its own parent),
    matching the select2nd parent-propagation semiring."""
    s, e = bounds
    if s <= root < e:
        return (np.array([root - s], dtype=np.int64),
                np.array([float(root)], dtype=np.float64))
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)


def _frontier_seed_zero(bounds, root):
    """Distance-BFS seed: vals carry d[root] = 0 so min_plus propagation
    (w + x) is correct by construction, not incidentally (a reused
    id-valued seed would break weighted SSSP-style reuse)."""
    s, e = bounds
    if s <= root < e:
        return (np.array([root - s], dtype=np.int64),
                np.array([0.0], dtype=np.float64))
    return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)


def _bfs_dense_x(pair, bounds):
    s, e = bounds
    x = np.full(e - s, np.inf)
    x[pair[0]] = pair[1]
    return x


def _dense_to_pair(res):
    idx = np.nonzero(np.isfinite(res))[0]
    return idx, res[idx]


def _bfs_step(deg, parents, dist, pair, bounds, level):
    """Per-chunk: drop visited candidates (EWiseMult exclude=true), set
    parents/dist, emit the next frontier pair (vals = global ids) and
    fused loop-control stats [n_frontier, edges_incident_to_frontier] —
    the edge count feeds the Beamer direction-switch heuristic."""
    idx, pv = pair
    unv = parents[idx] == -1
    fi = idx[unv]
    parents = parents.copy()
    dist = dist.copy()
    parents[fi] = pv[unv].astype(np.int64)
    dist[fi] = level
    stats = np.array([len(fi), int(deg[fi].sum())], dtype=np.int64)
    return parents, dist, (fi, (fi + bounds[0]).astype(np.float64)), stats


def _bfs_step_dense(deg, parents, dist, y, bounds, level):
    """Dense-branch step: convert the combined SpMV result to a sparse
    pair, then the shared `_bfs_step` (fused into the combine task)."""
    return _bfs_step(deg, parents, dist, _dense_to_pair(y), bounds, level)


def _neg_ones(bounds):
    s, e = bounds
    return np.full(e - s, -1, dtype=np.int64)


_BU_NONE = np.iinfo(np.int64).max  # engine's bottom-up "no parent" sentinel


def _bu_prep_p(pair, parents, bounds):
    """Per chunk: frontier pair -> membership bitmap; parents -> the
    unvisited row mask (the two bottom-up scan inputs)."""
    s, e = bounds
    bm = np.zeros(e - s, dtype=bool)
    bm[pair[0]] = True
    return bm, parents == -1


def _bu_step_p(deg, parents, dist, cand, bounds, level):
    """Bottom-up step: unvisited rows with a frontier neighbor adopt the
    min neighbor id as parent (same tie-break as the top-down
    select2nd_min semiring — exact cross-kernel parity)."""
    newly = (parents == -1) & (cand != _BU_NONE)
    parents = parents.copy()
    dist = dist.copy()
    parents[newly] = cand[newly]
    dist[newly] = level
    fi = np.nonzero(newly)[0]
    stats = np.array([len(fi), int(deg[fi].sum())], dtype=np.int64)
    return parents, dist, (fi, (fi + bounds[0]).astype(np.float64)), stats


def _bu_prep_d(pair, d, bounds):
    s, e = bounds
    bm = np.zeros(e - s, dtype=bool)
    bm[pair[0]] = True
    return bm, np.isinf(d)


def _bu_step_d(deg, d, cand, bounds, level):
    newly = np.isinf(d) & (cand != _BU_NONE)
    d = d.copy()
    d[newly] = level
    fi = np.nonzero(newly)[0]
    stats = np.array([len(fi), int(deg[fi].sum())], dtype=np.int64)
    return d, (fi, np.full(len(fi), float(level))), stats


def bfs_parents(engine: SpmvEngine, root: int, max_iters: int = 10_000,
                bottomup: bool = True, trace: list | None = None):
    """Direction-optimizing BFS producing the parent tree
    (``TopDownBFS.cpp:440-449`` + ``DirOptBFS.cpp``): sparse levels run
    top-down — ``fringe = SpMSpV(A, fringe)`` with the min-parent-id
    semiring, drop visited, ``parents.Set(fringe)``; dense levels run
    the TRUE bottom-up kernel — every unvisited row scans its own
    adjacency against frontier BITMAPS and steals the smallest frontier
    neighbor as parent (`engine.bottomup_apply_refs`), touching only
    O(nnz of unvisited rows) edges. Both kernels use the same
    min-neighbor-id tie-break, so the parent tree is identical
    (``bottomup=False`` forces the old dense-SpMV fallback — the pytest
    cross-kernel twin). Returns (parents, dist); parents[root]=root,
    unreached = -1. Frontier/parents/dist are chunked refs; the driver
    syncs one frontier-size scalar per level. Pass ``trace`` (a list)
    to record each level's direction decision as
    ``(level, fsize, fedges, m_rem, bottomup_used)`` — the Beamer-rule
    evidence channel (all integers; the SQL twin replays the same
    rule)."""
    import ray

    n = engine.n
    m = engine.nnz()
    deg_refs = engine.in_weights_refs()
    parents = engine.map_chunks_i(_neg_ones)
    dist = engine.map_chunks_i(_neg_ones)
    seed = engine.map_chunks_i(partial(_frontier_seed, root=root))
    parents, dist, frontier, sizes = engine.map_chunks_n(
        partial(_bfs_step, level=0), 4, deg_refs, parents, dist, seed,
        with_bounds=True
    )
    stats = np.sum(ray.get(sizes), axis=0)
    fsize, fedges = int(stats[0]), int(stats[1])
    m_rem = m - fedges  # edges incident to still-unvisited vertices (approx)
    level = 0
    while fsize and level < max_iters:
        level += 1
        # Direction switch (Beamer / `DirOptBFS.cpp`): bottom-up when the
        # frontier's incident EDGES rival the unexplored side, or the
        # frontier is a large vertex fraction — the edge test catches
        # hub-heavy frontiers that are small by vertex count. The 4x
        # multiplier is measured for THIS kernel pair (the vectorized
        # SpMSpV top-down is cheap per edge; bottom-up carries a fixed
        # bitmap-prep round), lower than Beamer's classic alpha=14.
        if bottomup:
            top_down = fsize * 50 < n and fedges * 4 < m_rem
        else:  # dense-SpMV twin keeps the legacy vertex-count rule
            top_down = fsize * 50 < n
        if trace is not None:
            trace.append((level, fsize, fedges, m_rem,
                          0 if top_down else 1))
        if top_down:
            # top-down: sparse frontier SpMSpV, merge+step in ONE fused
            # task round (2 rounds/level total — the latency floor)
            parents, dist, frontier, sizes = engine.spmspv_apply_refs(
                frontier, "select2nd_min", partial(_bfs_step, level=level),
                4, deg_refs, parents, dist,
            )
        elif bottomup:
            # bottom-up (`DirOptBFS.cpp`): unvisited rows steal parents
            # from the frontier bitmap; one prep round + one scan round
            fbit, unv = engine.map_chunks_n(
                _bu_prep_p, 2, frontier, parents, with_bounds=True
            )
            parents, dist, frontier, sizes = engine.bottomup_apply_refs(
                fbit, unv, partial(_bu_step_p, level=level), 4,
                deg_refs, parents, dist,
            )
        else:
            # dense select2nd_min SpMV fallback (cross-kernel twin)
            x = engine.map_chunks_i(_bfs_dense_x, frontier)
            parents, dist, frontier, sizes = engine.spmv_apply_refs(
                x, "select2nd_min", partial(_bfs_step_dense, level=level),
                4, deg_refs, parents, dist,
            )
        stats = np.sum(ray.get(sizes), axis=0)
        fsize, fedges = int(stats[0]), int(stats[1])
        m_rem -= fedges
    return engine.unchunk(parents), engine.unchunk(dist)


def _bfsd_sparse_step(deg, d, pair, bounds, level):
    """Per-chunk relax of SpMSpV candidates: vals = w + x = level."""
    idx, vals = pair
    newly = idx[vals < d[idx]]
    d = d.copy()
    d[newly] = level
    stats = np.array([len(newly), int(deg[newly].sum())], dtype=np.int64)
    return d, (newly, np.full(len(newly), float(level))), stats


def _bfsd_dense_step(deg, d, nd):
    nd = np.minimum(d, nd)
    newly = np.nonzero(nd < d)[0]
    stats = np.array([len(newly), int(deg[newly].sum())], dtype=np.int64)
    return nd, (newly, nd[newly]), stats


def _bfsd_dense_step_b(deg, d, nd, bounds):
    return _bfsd_dense_step(deg, d, nd)


def bfs_distances_auto(engine: SpmvEngine, root: int,
                       bottomup: bool = True) -> np.ndarray:
    """BFS distances with the direction-optimizing plan switch: frontier
    below n/50 runs top-down SpMSpV; dense levels run the bottom-up
    unvisited-row scan (``DirOptBFS.cpp``; ``bottomup=False`` forces the
    old dense min-plus SpMV — the cross-kernel pytest twin)."""
    n = engine.n
    import ray

    m = engine.nnz()
    deg_refs = engine.in_weights_refs()
    d = engine.map_chunks_i(partial(_root_init, root=root))
    frontier = engine.map_chunks_i(partial(_frontier_seed_zero, root=root))
    fsize = sum(engine.chunk_scalars(_pair_len, frontier))
    fedges, m_rem = fsize, m
    level = 0
    while fsize:
        level += 1
        if bottomup:
            top_down = fsize * 50 < n and fedges * 4 < m_rem
        else:
            top_down = fsize * 50 < n
        if top_down:
            # SpMSpV: val = w + x = 1 + (level-1) = level for structural
            # w=1; merge + relax fused into one task round
            d, frontier, sizes = engine.spmspv_apply_refs(
                frontier, "min_plus",
                partial(_bfsd_sparse_step, level=level), 3, deg_refs, d,
            )
        elif bottomup:
            fbit, unv = engine.map_chunks_n(
                _bu_prep_d, 2, frontier, d, with_bounds=True
            )
            d, frontier, sizes = engine.bottomup_apply_refs(
                fbit, unv, partial(_bu_step_d, level=level), 3,
                deg_refs, d,
            )
        else:
            d, frontier, sizes = engine.spmv_apply_refs(
                d, "min_plus", _bfsd_dense_step_b, 3, deg_refs, d
            )
        stats = np.sum(ray.get(sizes), axis=0)
        fsize, fedges = int(stats[0]), int(stats[1])
        m_rem -= fedges
    return engine.unchunk(d)


# --------------------------------------------------------------------------
# MIS / matching / orderings
# --------------------------------------------------------------------------


def _mis_x(active, prio):
    return np.where(active, prio, np.inf)


def _mis_winners(active, prio, nb_min):
    return active & (prio < nb_min)


def _count_true(a):
    return int(np.count_nonzero(a))


def _or2(a, b):
    return a | b


def _bool_to_f(a):
    return a.astype(np.float64)


def _mis_deact(active, winners, nb_win):
    return active & ~(winners | (nb_win > 0))


def _mis_winners_f(active, prio, nb_min, bounds):
    """Fused combine+winners (spmv_apply_refs adapter)."""
    return _mis_winners(active, prio, nb_min)


def _mis_deact_f(active, winners, nb_win, bounds):
    return _mis_deact(active, winners, nb_win)


def luby_mis(engine: SpmvEngine, seed: int = 5,
             prio_full: np.ndarray | None = None,
             max_rounds: int | None = None) -> np.ndarray:
    """Luby's maximal independent set over the symmetrized engine
    (`FilteredMIS.cpp` workload family): deterministic per-vertex
    priorities; iterate: v joins MIS if its priority beats every active
    neighbor's; neighbors of MIS vertices deactivate. Priorities are
    chunked once at init; the loop is refs-only.

    ``prio_full`` overrides the seeded permutation (must be distinct
    values — the `mis_fixed` oracle query injects the SQL-reproducible
    LCG bijection (v*48271 + b) mod p); it may be an aligned LIST of
    chunk refs (generated inside chunk kernels — no O(n) driver array).
    ``max_rounds`` caps the rounds for fixed-round oracle parity (the
    state after exactly K rounds is deterministic whether or not the
    MIS converged)."""
    n = engine.n
    if prio_full is None:
        prio_full = np.random.RandomState(seed).permutation(n)
    prio = (prio_full if isinstance(prio_full, list)
            else engine.chunk(prio_full.astype(np.float64)))
    active = engine.map_chunks_i(lambda b: np.ones(b[1] - b[0], dtype=bool))
    in_mis = engine.map_chunks_i(lambda b: np.zeros(b[1] - b[0], dtype=bool))
    rounds = 0
    while sum(engine.chunk_scalars(_count_true, active)):
        if max_rounds is not None and rounds >= max_rounds:
            break
        rounds += 1
        # min active-neighbor priority via SpMV over select2nd_min;
        # partial combine + winner test fused into one task round
        x = engine.map_chunks(_mis_x, active, prio)
        winners = engine.spmv_apply_refs(
            x, "select2nd_min", _mis_winners_f, 1, active, prio
        )[0]
        if sum(engine.chunk_scalars(_count_true, winners)) == 0:
            # isolated actives (no neighbors): nb_min = inf -> winners;
            # only reachable if priorities tie, which permutation prevents
            break
        in_mis = engine.map_chunks(_or2, in_mis, winners)
        # deactivate winners and their neighbors (combine+deact fused)
        win_ind = engine.map_chunks(_bool_to_f, winners)
        active = engine.spmv_apply_refs(
            win_ind, "plus_times", _mis_deact_f, 1, active, winners
        )[0]
    return engine.unchunk(in_mis)


def _katz_update_f(y, bounds, alpha):
    return 1.0 + alpha * y


def katz_fixed(engine: SpmvEngine, iters: int = 3,
               alpha: float = 0.125,
               trace: list | None = None) -> np.ndarray:
    """Katz centrality, exactly ``iters`` synchronous iterations of
    x_{k+1} = 1 + alpha * (A^T x_k) over the structural directed engine
    (the truncated walk-count series; plus_times SpMV per iteration,
    same engine family as `hits_fixed`). With ``alpha`` a power of two
    every value is a dyadic rational — scaling shifts exponents only, so
    sums stay EXACT in float64 (order-free) while the scaled integer
    magnitude fits 53 bits (guarded). One fused SpMV+update task round
    per iteration; x stays chunked refs."""
    m, e = np.frexp(alpha)
    if m != 0.5:
        raise ValueError("katz_fixed: alpha must be a power of two for "
                         "dyadic-exact float64 iteration")
    x = engine.chunk(np.ones(engine.n, dtype=np.float64))
    for _ in range(iters):
        x = engine.spmv_apply_refs(
            x, "plus_times", partial(_katz_update_f, alpha=alpha), 1
        )[0]
        if trace is not None:
            # dyadic values: the sum is order-free exact (span-guarded)
            trace.append(float(sum(engine.chunk_scalars(_w72_sumv, x))))
    out = engine.unchunk(x)
    # scaled-integer exactness bound: x * alpha^-iters must stay < 2^53
    if out.max(initial=0.0) * (1.0 / alpha) ** iters >= 2.0**53:
        raise NotImplementedError(
            "katz_fixed: walk counts exceed the exact dyadic float64 "
            "range at this (iters, alpha); reduce iters or use the "
            "approximate normalized variant"
        )
    return out


def _sigma_seed(bounds, root):
    s, e = bounds
    sig = np.zeros(e - s, dtype=np.int64)
    if s <= root < e:
        sig[root - s] = 1
    return sig


def _sigma_x(d, sigma, level):
    return np.where(d == level, sigma, np.int64(0))


_SIGMA_TRIP = np.int64(1) << 61


def _count_and_mass(a):
    """(nnz, float64 mass) of a frontier chunk — the mass feeds the
    pre-level overflow bound (float64 rounding is ~1e-16 relative,
    negligible against the 4x margin between the 2^61 guard and the
    2^63 wrap point)."""
    return int(np.count_nonzero(a)), float(a.astype(np.float64).sum())


def _sigma_level_guard(engine, x) -> int:
    """Pre-level input bound closing the wrap-around hole: with unit
    edge weights every per-vertex level sum is bounded by the TOTAL
    frontier path-count mass (all terms nonnegative), so mass < 2^61
    guarantees no intermediate int64 sum can reach 2^64 and alias back
    into range past the post-reduce check. Returns the frontier nnz."""
    parts = engine.chunk_scalars(_count_and_mass, x)
    nnz = sum(p[0] for p in parts)
    if sum(p[1] for p in parts) >= float(_SIGMA_TRIP):
        raise NotImplementedError(
            "bfs_sigma: total frontier path-count mass reached the "
            "int64 tripwire (2^61); a big-integer value channel is "
            "needed at this scale"
        )
    return nnz


def _sigma_update_f(d, sigma, y, bounds, level):
    """Fused combine+update: vertices first reached at this level take
    dist = level+1 and sigma = the plus_times_i64 path-count sum.
    Tripwire: counts are exact while every per-level sum stays in int64;
    any negative (wrapped) or >= 2^61 partial raises, and the driver's
    pre-level mass bound (`_sigma_level_guard`) rules out sums that wrap
    past 2^64 back into range — the reference's templated int64 channel
    has NO such guard (silent wrap), so this is strictly stronger than
    parity."""
    if np.any(y < 0) or np.any(y >= _SIGMA_TRIP):
        raise NotImplementedError(
            "bfs_sigma: path counts reached the int64 tripwire (2^61); "
            "a big-integer value channel is needed at this scale"
        )
    new = np.isinf(d) & (y > 0)
    d2, s2 = d.copy(), sigma.copy()
    d2[new] = level + 1.0
    s2[new] = y[new]
    return d2, s2


def bfs_sigma(engine: SpmvEngine, root: int, iters: int = 12):
    """Level-synchronous shortest-path counting from ``root`` — the sigma
    phase of Brandes betweenness (`BetwCent.cpp:179-187` runs it batched;
    this is the single-source analog as its own operator): per level ONE
    fused plus_times_i64 SpMV + update task round over the structural
    undirected engine; sigma[v] = sum of sigma over predecessors at
    dist[v]-1. d/sigma stay chunked refs; counts ride the EXACT int64
    value channel (round-4: the f64 2^53 ceiling became a 2^61 int64
    tripwire — 256x more headroom, and negative/overflow partials raise
    instead of silently losing precision). Returns (dist, sigma) full
    arrays (inf / 0 for unreached)."""
    d = engine.map_chunks_i(partial(_root_init, root=root))
    sigma = engine.map_chunks_i(partial(_sigma_seed, root=root))
    for level in range(iters):
        x = engine.map_chunks(partial(_sigma_x, level=float(level)),
                              d, sigma)
        if not _sigma_level_guard(engine, x):
            break  # frontier empty: all further rounds are no-ops
        d, sigma = engine.spmv_apply_refs(
            x, "plus_times_i64",
            partial(_sigma_update_f, level=float(level)), 2, d, sigma,
        )
    return engine.unchunk(d), engine.unchunk(sigma)


def _jp_x_prio(color, prio):
    return np.where(color < 0, prio, np.inf)


def _jp_winners_f(color, prio, nb_min, bounds):
    """Fused combine+winners: uncolored v wins when its priority is below
    every uncolored neighbor's (identity +inf -> isolated actives win)."""
    return (color < 0) & (prio < nb_min)


def _jp_x_mask(color):
    if np.any(color >= 62):
        raise NotImplementedError(
            "jp_coloring single-word path: >62 colors (the caller "
            "escalates to the multi-word SpMM mask before this fires)"
        )
    m = np.zeros(len(color), dtype=np.int64)
    c = color >= 0
    m[c] = np.int64(1) << color[c]
    return m


_JP_BITS = 62  # usable bits per int64 mask word (sign + headroom spared)


def _jp_x_mask_w(color, words):
    """Multi-word neighbor-color mask: (words, len) int64, word w carries
    colors [w*62, (w+1)*62) — the multi-word escalation of the bitmask
    channel (rides the same bor_second monoid as a k-row SpMM)."""
    M = np.zeros((words, len(color)), dtype=np.int64)
    c = np.nonzero(color >= 0)[0]
    w = color[c] // _JP_BITS
    b = color[c] % _JP_BITS
    M[w, c] = np.int64(1) << b
    return M


def _jp_assign_mw_f(color, winners, NB, bounds):
    """Multi-word assign: winners take the smallest color whose bit is
    absent across the word sequence (first non-full word's lowest zero
    bit; words looped — there are only a handful)."""
    out = color.copy()
    wsel = np.nonzero(winners)[0]
    if len(wsel) == 0:
        return out
    full = (np.int64(1) << _JP_BITS) - 1
    chosen = np.full(len(wsel), -1, dtype=np.int64)
    for w in range(NB.shape[0]):
        m = NB[w][wsel]
        low0 = np.bitwise_and(np.invert(m), m + 1)
        cand = w * _JP_BITS + np.frexp(low0.astype(np.float64))[1] - 1
        take = (chosen < 0) & ((m & full) != full)
        chosen[take] = cand[take]
    # all words full -> first bit of the next word
    chosen[chosen < 0] = NB.shape[0] * _JP_BITS
    out[wsel] = chosen
    return out


def _jp_assign_f(color, winners, nb_mask, bounds):
    """Fused combine+assign: winners take the smallest color absent from
    their colored neighbors' OR-mask (lowest zero bit, via the exact
    frexp exponent of ~m & (m+1) — powers of two convert exactly)."""
    out = color.copy()
    if np.any(winners):
        m = nb_mask[winners]
        low0 = np.bitwise_and(np.invert(m), m + 1)
        out[winners] = np.frexp(low0.astype(np.float64))[1] - 1
    return out


def jp_coloring(engine: SpmvEngine, seed: int = 5,
                prio_full: np.ndarray | None = None,
                max_rounds: int | None = None) -> np.ndarray:
    """Jones-Plassmann greedy graph coloring over the symmetrized
    structural engine — the classic parallel-symmetry-breaking sibling of
    `luby_mis` (same per-round winner rule; reference functor catalog
    `Operations.h:184-293` supplies the bitwise-or monoid used for the
    neighbor color mask). Per round, two fused SpMV+step task rounds:

    1. select2nd_min over uncolored-masked priorities -> winners
       (uncolored vertices whose priority beats every uncolored
       neighbor's; distinct priorities make ties impossible);
    2. bor_second over (1 << color) masks -> each winner takes the
       smallest color not used by any colored neighbor.

    Vertex state (color, priority) stays chunked refs; the driver syncs
    one uncolored-count scalar per round. ``max_rounds`` caps rounds for
    fixed-round oracle parity (uncolored vertices keep color -1).

    Past 62 colors the bitmask channel ESCALATES to a multi-word
    (words, n) mask carried by a bor_second SpMM — the round-3 verdict's
    ">62 colors raise" cliff is gone (the single-word SpMV fast path is
    kept for the common case; the driver tracks the palette high-water
    mark as one scalar per round)."""
    n = engine.n
    if prio_full is None:
        prio_full = np.random.RandomState(seed).permutation(n)
    prio = (prio_full if isinstance(prio_full, list)
            else engine.chunk(prio_full.astype(np.float64)))
    color = engine.map_chunks_i(
        lambda b: np.full(b[1] - b[0], -1, dtype=np.int64))
    rounds = 0
    max_color = -1
    while sum(engine.chunk_scalars(_count_uncolored, color)):
        if max_rounds is not None and rounds >= max_rounds:
            break
        rounds += 1
        x1 = engine.map_chunks(_jp_x_prio, color, prio)
        winners = engine.spmv_apply_refs(
            x1, "select2nd_min", _jp_winners_f, 1, color, prio
        )[0]
        words = max_color // _JP_BITS + 1 if max_color >= 0 else 1
        if max_color < _JP_BITS - 1:
            x2 = engine.map_chunks(_jp_x_mask, color)
            color = engine.spmv_apply_refs(
                x2, "bor_second", _jp_assign_f, 1, color, winners
            )[0]
        else:
            x2 = engine.map_chunks(partial(_jp_x_mask_w, words=words),
                                   color)
            color = engine.spmm_apply_refs(
                x2, words, "bor_second", _jp_assign_mw_f, 1, color, winners
            )[0]
        max_color = max(engine.chunk_scalars(_max_color, color))
    return engine.unchunk(color)


def _max_color(color):
    return int(color.max(initial=-1))


def _count_uncolored(color):
    return int(np.count_nonzero(color < 0))


def rcm_ordering(engine: SpmvEngine) -> np.ndarray:
    """Reverse Cuthill-McKee ordering, level-synchronous relaxation (the
    shape distributed RCM implementations use — reference app
    `Applications/Ordering/RCM.cpp`): per connected component, BFS from
    the min-degree vertex, order vertices by (component, BFS level,
    degree, id), then reverse. Returns perm where perm[old] = new index.
    The BFS loop is refs-only; the final lexsort is a one-time O(n log n)
    on the (small) output permutation."""
    import ray

    n = engine.n
    # structural degree = row sums of the 0/1 symmetric matrix
    deg = engine.in_weights().astype(np.int64)
    comp, _ = connected_components(engine)
    # min-degree root per component (ties -> smallest id)
    order = np.lexsort((np.arange(n), deg, comp))
    comp_sorted = comp[order]
    first = np.ones(n, dtype=bool)
    first[1:] = comp_sorted[1:] != comp_sorted[:-1]
    roots = order[first]
    # one multi-source BFS (components are disjoint), refs-only loop
    root_set = np.zeros(n, dtype=bool)
    root_set[roots] = True
    d_full = np.full(n, np.inf)
    d_full[roots] = 0.0
    d = engine.chunk(d_full)
    while True:
        nd = engine.spmv_apply_refs(d, "min_plus", _min2_b, 1, d)[0]
        if sum(engine.chunk_scalars(_neq_inf_count, nd, d)) == 0:
            break
        d = nd
    d = engine.unchunk(d)
    level = np.where(np.isfinite(d), d, n).astype(np.int64)
    cm = np.lexsort((np.arange(n), deg, level, comp))
    rcm = cm[::-1]
    perm = np.empty(n, dtype=np.int64)
    perm[rcm] = np.arange(n)
    return perm


def _mm_x(match, prio, bounds, n):
    s, e = bounds
    unmatched = match == -1
    return np.where(unmatched, prio * n + np.arange(s, e), I64MAX)


def _mm_active(match, nb):
    return int(np.count_nonzero((match == -1) & (nb != I64MAX)))


def _mm_props(match, prio, nb, bounds, n):
    """Per-chunk local-minimum proposals: (partner global idx, proposer
    code) sparse pair; proposer code = prio*n + global id (int64 value
    channel — exact while n^2 <= int64 max)."""
    s, e = bounds
    unmatched = match == -1
    has_nb = nb != I64MAX
    nb_prio = np.floor_divide(
        nb, n, where=has_nb, out=np.full(len(nb), I64MAX, dtype=np.int64)
    )
    local_min = unmatched & has_nb & (prio < nb_prio)
    proposers = np.nonzero(local_min)[0]
    partners = (nb[proposers] % n).astype(np.int64)
    codes = prio[proposers] * n + (proposers + s)
    return partners, codes


def _mm_props_f(match, prio, nb, bounds, n):
    """spmv_apply_refs adapter: fused combine + proposals + the active
    count (loop-control scalar), one task round instead of three."""
    partners, codes = _mm_props(match, prio, nb, bounds, n)
    return partners, codes, _mm_active(match, nb)


def _mm_accept(match, best, bounds, n):
    """Targets accept their min-code proposer (scatter-min result)."""
    hit = (best != I64MAX) & (match == -1)
    match = match.copy()
    match[hit] = (best[hit] % n).astype(np.int64)
    return match


def _mm_backpairs(match_old, best, bounds, n):
    """(proposer global idx, target global id) for accepted proposals."""
    s, e = bounds
    hit = (best != I64MAX) & (match_old == -1)
    props = (best[hit] % n).astype(np.int64)
    targets = np.nonzero(hit)[0] + s
    return props, targets


def _mm_setback(match, back):
    hit = back != I64MAX
    match = match.copy()
    match[hit] = back[hit].astype(np.int64)
    return match


def maximal_matching(engine: SpmvEngine, seed: int = 9,
                     prio_full: np.ndarray | None = None,
                     max_rounds: int | None = None) -> np.ndarray:
    """Maximal matching via local-minimum proposals (the
    `BipartiteMatchings` family's maximal-matching kernel, generalized to
    the symmetric graph): per round, every unmatched vertex whose priority
    beats all unmatched neighbors proposes to its min-priority unmatched
    neighbor; proposal targets accept their min-priority proposer. The
    global minimum always matches -> guaranteed progress. Returns partner
    ids (-1 = unmatched). Accepted (proposer, target) links route back via
    a second scatter — acc_v and acc_p are provably disjoint (a proposer
    beats every unmatched neighbor's priority, so it can't also be a
    proposal target), so the two writes never conflict."""
    n = engine.n
    if n > _I64_ENC_MAX_N:
        raise NotImplementedError(
            "maximal_matching: prio*n + id int64 encoding requires "
            "n^2 <= 2^63 - 1 (~3.04e9 vertices); a split prio/id channel "
            "is needed beyond that"
        )
    if prio_full is None:
        prio_full = np.random.RandomState(seed).permutation(n)
    prio = (prio_full if isinstance(prio_full, list)
            else engine.chunk(prio_full.astype(np.int64)))
    match = engine.map_chunks_i(_neg_ones)
    import ray

    rounds = 0
    while True:
        if max_rounds is not None and rounds >= max_rounds:
            break
        rounds += 1
        # encode (priority, id) as one comparable int64: prio*n + id
        x = engine.map_chunks_i(partial(_mm_x, n=n), match, prio)
        # min unmatched nbr code: combine + proposals + active count fused
        pr_idx, pr_code, act = engine.spmv_apply_refs(
            x, "select2nd_min_i64", partial(_mm_props_f, n=n), 3, match, prio
        )
        if sum(ray.get(act)) == 0:
            break  # no unmatched vertex has an unmatched neighbor: maximal
        # each target accepts its min-code (= min-priority) proposer
        best = engine.scatter_reduce_refs(
            list(zip(pr_idx, pr_code)), "select2nd_min_i64"
        )
        back_i, back_t = engine.map_chunks_n(
            partial(_mm_backpairs, n=n), 2, match, best, with_bounds=True
        )
        match = engine.map_chunks_i(partial(_mm_accept, n=n), match, best)
        back = engine.scatter_reduce_refs(
            list(zip(back_i, back_t)), "select2nd_min_i64"
        )
        match = engine.map_chunks(_mm_setback, match, back)
    return engine.unchunk(match)


def _md_reach(engine: SpmvEngine, source: int, enodes: np.ndarray):
    """`getReach` (``Applications/Ordering/MD.cpp:146-169``): vertices
    reachable from ``source`` where traversal may only pass THROUGH
    already-eliminated vertices (the quotient-graph neighborhood).
    Each hop is one distributed SpMSpV."""
    n = engine.n
    visited = np.zeros(n, dtype=bool)
    visited[source] = True
    x = np.array([source], dtype=np.int64)
    while len(x):
        ri, _ = engine.spmspv(x, np.ones(len(x)), "select2nd_min")
        new = ri[~visited[ri]]
        visited[new] = True
        x = new[enodes[new]]  # continue only through eliminated vertices
    reach = visited & ~enodes
    reach[source] = False
    return np.nonzero(reach)[0]


MD_DENSE_MAX = 4096  # below this, dense driver (k, n) beats task-round latency


def _md_ms_init(bounds, *, reach: np.ndarray):
    s, e = bounds
    k = len(reach)
    V = np.zeros((k, e - s), dtype=bool)
    sel = (reach >= s) & (reach < e)
    V[np.nonzero(sel)[0], reach[sel] - s] = True
    return V, V.astype(np.float64)


def _md_ms_step(V, prop, en_chunk):
    nxt = (prop > 0) & ~V
    Vn = V | nxt
    Fn = (nxt & en_chunk[None, :]).astype(np.float64)
    return Vn, Fn, bool(Fn.any())


def _md_ms_step_f(V, en_chunk, prop, bounds):
    """spmm_apply_refs adapter: fused combine + multisource-BFS step."""
    return _md_ms_step(V, prop, en_chunk)


def _md_ms_count(V, en_chunk):
    return (V & ~en_chunk[None, :]).sum(axis=1)


def md_ordering(engine: SpmvEngine) -> np.ndarray:
    """Minimum-degree ordering — `MD`
    (``Applications/Ordering/MD.cpp:289-361``). Like the reference, a
    sequential greedy driver loop (pick the min-degree vertex, eliminate,
    update the quotient-graph degrees of its reach set) whose inner
    traversals are distributed: single-source reach via SpMSpV hops,
    the batched reach-degree update via the multisource guided BFS
    (`getReachesSPMM`, ``MD.cpp:185-260``) with the (k, n) visited/
    frontier matrices kept as PER-CHUNK REFS in the object store (the
    betweenness discipline) — the driver holds only O(n) scalars per
    vertex plus O(k) count partials, never a dense (k, n) matrix.
    Returns perm where perm[k] = k-th eliminated vertex (dense ids)."""
    import ray

    n = engine.n
    # structural degree (loop-free symmetric engine): row sums
    deg = engine.in_weights().astype(np.float64)
    enodes = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    degrees = deg.copy()
    bounds = engine.bounds
    enodes_refs = engine.chunk(enodes)
    for i in range(n):
        s = int(np.argmin(degrees))  # min degree, ties -> min id
        order[i] = s
        enodes[s] = True
        degrees[s] = np.inf
        # refresh only the chunk containing s
        c = next(j for j, (lo, hi) in enumerate(bounds) if lo <= s < hi)
        enodes_refs[c] = ray.put(np.ascontiguousarray(
            enodes[bounds[c][0]:bounds[c][1]]))
        reach = _md_reach(engine, s, enodes)
        if not len(reach):
            continue
        k = len(reach)
        if n <= MD_DENSE_MAX:
            # small-n fast path: dense (k, n) on the driver skips the
            # ~3 task rounds per BFS level (the CC-shortcut trade)
            V = np.zeros((k, n), dtype=bool)
            V[np.arange(k), reach] = True
            F = V.copy()
            while F.any():
                nxt = engine.spmm(F.astype(np.float64), "plus_times") > 0
                nxt &= ~V
                V |= nxt
                F = nxt & enodes[None, :]
            degrees[reach] = (V & ~enodes[None, :]).sum(axis=1) - 1
            continue
        V, F = engine.map_chunks_n(
            partial(_md_ms_init, reach=reach), 2, with_bounds=True
        )
        while True:
            V, F, anyf = engine.spmm_apply_refs(
                F, k, "plus_times", _md_ms_step_f, 3, V, enodes_refs
            )
            if not any(ray.get(anyf)):
                break
        parts = ray.get(engine.map_chunks(_md_ms_count, V, enodes_refs))
        degrees[reach] = np.sum(parts, axis=0) - 1  # exclude self
    return order


def brute_md_ordering(U: np.ndarray) -> np.ndarray:
    """Pure-python MD oracle with identical tie-breaks (tests)."""
    n = U.shape[0]
    deg = (U > 0).sum(axis=0).astype(float)
    enodes = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    degrees = deg.copy()
    for i in range(n):
        s = int(np.argmin(degrees))
        order[i] = s
        enodes[s] = True
        degrees[s] = np.inf

        def reach_of(src):
            seen = {src}
            stack = [src]
            out = set()
            while stack:
                v = stack.pop()
                for w in np.nonzero(U[:, v] + U[v, :])[0]:
                    if w in seen:
                        continue
                    seen.add(int(w))
                    if enodes[w]:
                        stack.append(int(w))
                    else:
                        out.add(int(w))
            out.discard(src)
            return out

        for v in reach_of(s):
            degrees[v] = len(reach_of(v))
    return order


MM_DENSE_MAX = 1 << 23  # below this, driver mate/parent arrays are cheap


def _mm_roots_frontier(mate_col, bounds, *, enc):
    s, _ = bounds
    loc = np.nonzero(mate_col < 0)[0]
    g = loc + s
    return (loc, g * enc + g), len(loc)  # int64 value channel


def _mm_cand_filter(cand, parent_col, *, enc):
    """Per row chunk: drop claimed rows, split (root, parent-col)."""
    ri, rv = cand
    fresh = parent_col[ri] < 0
    ri, rv = ri[fresh], rv[fresh]
    rt = (rv // enc).astype(np.int64)
    return ri, rt, (rv % enc).astype(np.int64)


def _mm_cand_filter_f(parent_col, pair, bounds, *, enc):
    """spmspv_apply_refs adapter: fused merge + candidate filter."""
    return _mm_cand_filter(pair, parent_col, enc=enc)


def _trip0(t):
    return t[0]


def _trip1(t):
    return t[1]


def _mm_claim(trip, act, parent_col, mate_row, bounds, *, enc):
    """Per row chunk: claim rows for still-active roots; emit leaf
    candidates (unmatched rows) and continuation triples (matched)."""
    ri, rt, pc = trip
    keep = act > 0.5
    ri, rt, pc = ri[keep], rt[keep], pc[keep]
    parent_col = parent_col.copy()
    parent_col[ri] = pc
    row_g = ri + bounds[0]
    um = mate_row[ri] < 0
    leaf_pair = (rt[um], row_g[um])
    cont_col = mate_row[ri[~um]].astype(np.int64)
    cont_trip = (rt[~um], cont_col, rt[~um] * enc + cont_col)
    return parent_col, leaf_pair, cont_trip


def _mm_leaf_merge(pending, leaf, active):
    """Per col chunk: adopt min-row pending leaves for still-active
    roots, deactivate them."""
    leaf = leaf.copy()
    active = active.copy()
    new = (leaf < 0) & (pending != I64MAX) & (active > 0.5)
    leaf[new] = pending[new].astype(np.int64)
    active[new] = 0.0
    return leaf, active, int(new.sum())


def _mm_cont_filter(trip, act2):
    """Keep continuation edges only for roots still active AFTER this
    level's leaf adoption (the reference's second active[] read)."""
    _, col, val = trip
    keep = act2 > 0.5
    return col[keep], val[keep]


def _mm_aug_init(leaf):
    return leaf[leaf >= 0].astype(np.int64)


def _dense_to_pair_i64(res):
    """int64-channel analog of `_dense_to_pair` (sentinel = int64 max)."""
    idx = np.nonzero(res != I64MAX)[0]
    return idx, res[idx]


def _mm_merge_assign(scat, old):
    out = old.copy()
    f = scat != I64MAX
    out[f] = scat[f].astype(np.int64)
    return out


def _mm_next_cur(prev):
    p = prev.astype(np.int64)
    return p[p >= 0]


def _arr_len(a):
    return int(len(a))


def _count_nonneg(a):
    return int((a >= 0).sum())


def _neg_count(a):
    return int((a < 0).sum())


def _mm_refs(engine: SpmvEngine, max_phases: int):
    """Refs-only maximum matching: every per-vertex array (mate_col,
    mate_row, parent_col, leaf, active) lives as chunked ObjectRefs — the
    reference's own FullyDistVec layout (`BPMaximumMatching.h:231-420`).
    The driver syncs only per-chunk counts. Frontier routing across the
    col space reuses the scatter machinery (vals collide only for
    distinct roots reaching one col; min-val merge keeps one, identical
    to the dense path's per-row select2nd_min).

    The (root, parent) pair rides the INT64 value channel
    (`select2nd_min_i64`, sentinel = int64 max) as root*n + id — exact
    while n^2 <= 2^63 - 1, i.e. up to ~3.04e9 vertices (the former
    float64 channel capped at n^2 < 2^53 ~ 9.49e7). Guarded explicitly:
    beyond that the encode would silently corrupt, so raise instead."""
    import ray

    n = engine.n
    if n > _I64_ENC_MAX_N:
        raise NotImplementedError(
            f"maximum_matching: n={n} exceeds the exact int64 "
            "(root*n + id) encoding range (n^2 <= 2^63 - 1 required); "
            "split root/parent frontiers are needed beyond ~3.04e9 "
            "vertices"
        )
    enc = np.int64(n)
    mate_col = engine.map_chunks_i(_neg_ones)
    mate_row = engine.map_chunks_i(_neg_ones)
    for _phase in range(max_phases):
        rf = engine.map_chunks_n(
            partial(_mm_roots_frontier, enc=enc), 2, mate_col,
            with_bounds=True,
        )
        frontier, sizes = rf
        if sum(ray.get(sizes)) == 0:
            break
        parent_col = engine.map_chunks_i(_neg_ones)
        leaf = engine.map_chunks_i(_neg_ones)
        active = engine.map_chunks(lambda m: (m < 0).astype(np.float64),
                                   mate_col)
        fsize = 1
        while fsize:
            trip = engine.spmspv_apply_refs(
                frontier, "select2nd_min_i64",
                partial(_mm_cand_filter_f, enc=enc), 1, parent_col,
            )[0]
            act = engine.gather_refs(active, engine.map_chunks(_trip1, trip))
            parent_col, leaf_pair, cont = engine.map_chunks_n(
                partial(_mm_claim, enc=enc), 3, trip, act, parent_col,
                mate_row, with_bounds=True,
            )
            pending = engine.scatter_reduce_refs(
                list(zip(
                    engine.map_chunks(_trip0, leaf_pair),
                    engine.map_chunks(_trip1, leaf_pair),
                )),
                "select2nd_min_i64",
            )
            leaf, active, _found = engine.map_chunks_n(
                _mm_leaf_merge, 3, pending, leaf, active
            )
            act2 = engine.gather_refs(active, engine.map_chunks(_trip0, cont))
            cont_pairs = engine.map_chunks(_mm_cont_filter, cont, act2)
            routed = engine.scatter_reduce_refs(
                list(zip(
                    engine.map_chunks(_trip0, cont_pairs),
                    engine.map_chunks(_trip1, cont_pairs),
                )),
                "select2nd_min_i64",
            )
            frontier = engine.map_chunks(_dense_to_pair_i64, routed)
            fsize = sum(engine.chunk_scalars(_pair_len, frontier))
        if sum(engine.chunk_scalars(_count_nonneg, leaf)) == 0:
            break
        cur = engine.map_chunks(_mm_aug_init, leaf)
        while sum(engine.chunk_scalars(_arr_len, cur)):
            cols = engine.gather_refs(parent_col, cur)
            prev = engine.gather_refs(mate_col, cols)
            scat_mr = engine.scatter_reduce_refs(
                list(zip(cur, cols)), "select2nd_min_i64"
            )
            mate_row = engine.map_chunks(_mm_merge_assign, scat_mr, mate_row)
            scat_mc = engine.scatter_reduce_refs(
                list(zip(cols, cur)), "select2nd_min_i64"
            )
            mate_col = engine.map_chunks(_mm_merge_assign, scat_mc, mate_col)
            cur = engine.map_chunks(_mm_next_cur, prev)
    return (engine.unchunk(mate_col).astype(np.int64),
            engine.unchunk(mate_row).astype(np.int64))


def maximum_matching(engine: SpmvEngine, max_phases: int = 10_000):
    """Maximum-cardinality bipartite matching by multi-source BFS +
    vertex-disjoint augmenting paths — `maximumMatching`
    (``Applications/BipartiteMatchings/BPMaximumMatching.h:231-420``),
    on the bipartite view of the directed matrix (columns = src side,
    rows = dst side).

    Per phase: MS-BFS from every unmatched column (the reference's
    ``fringeCol``), each frontier step one distributed SpMSpV over the
    ``select2nd_min`` semiring with the (root, parent) pair encoded as
    ``root*n + parent`` (exact in float64 while n^2 < 2^53); rows keep
    ONE (root, parent) each so the BFS forest is vertex-disjoint by
    construction. Unmatched rows reached become leaves (one per root,
    min row id); all augmenting paths then flip in lockstep with
    vectorized pointer walks (the reference's `Augment`). Phases repeat
    until no augmenting path exists — a maximum matching (Berge).

    Returns (mate_col, mate_row): for the src side and dst side
    respectively, -1 where unmatched.

    Above ``MM_DENSE_MAX`` vertices the refs-only plan (`_mm_refs`) runs:
    all per-vertex state chunked in the object store, scatter/gather
    rounds instead of driver arrays. Both plans encode (root, parent)
    as root*n + id in the INT64 value channel (`select2nd_min_i64`) —
    exact while n^2 <= 2^63 - 1 (guarded in `_mm_refs`), i.e. up to
    ~3.04e9 vertices."""
    n = engine.n
    if n > MM_DENSE_MAX:
        return _mm_refs(engine, max_phases)
    mate_col = np.full(n, -1, dtype=np.int64)  # src side -> matched row
    mate_row = np.full(n, -1, dtype=np.int64)  # dst side -> matched col
    enc = np.int64(n)
    for _phase in range(max_phases):
        roots = np.nonzero(mate_col == -1)[0]
        if not len(roots):
            break
        # frontier: unmatched cols, val = root*n + parent(col itself)
        f_idx = roots
        f_val = roots * enc + roots  # int64 value channel
        parent_col = np.full(n, -1, dtype=np.int64)  # per row: its BFS col
        root_row = np.full(n, -1, dtype=np.int64)
        leaf = np.full(n, -1, dtype=np.int64)  # per root: leaf row
        active = np.ones(n, dtype=bool)  # roots still searching
        while len(f_idx):
            ri, rv = engine.spmspv(f_idx, f_val, "select2nd_min_i64")
            fresh = parent_col[ri] == -1
            ri, rv = ri[fresh], rv[fresh]
            rt = (rv // n).astype(np.int64)
            keep = active[rt]
            ri, rt = ri[keep], rt[keep]
            pc = (rv[keep] % n).astype(np.int64)
            parent_col[ri] = pc
            root_row[ri] = rt
            um = mate_row[ri] == -1
            # one leaf per root: min row id among its unmatched rows
            if um.any():
                lr, lt = ri[um], rt[um]
                order = np.lexsort((lr, lt))
                lr, lt = lr[order], lt[order]
                first = np.ones(len(lt), dtype=bool)
                first[1:] = lt[1:] != lt[:-1]
                new = leaf[lt[first]] == -1
                leaf[lt[first][new]] = lr[first][new]
                active[lt[first][new]] = False
            # continue BFS through matched rows' mates
            cont = ~um & active[rt]
            next_cols = mate_row[ri[cont]]
            f_idx = next_cols
            f_val = rt[cont] * enc + next_cols
        aug_roots = np.nonzero(leaf >= 0)[0]
        if not len(aug_roots):
            break
        # vectorized lockstep augmentation: all paths are vertex-disjoint
        cur = leaf[aug_roots]
        while len(cur):
            cols = parent_col[cur]
            prev = mate_col[cols]
            mate_row[cur] = cols
            mate_col[cols] = cur
            cont = prev >= 0
            cur = prev[cont]
    return mate_col, mate_row


def brute_max_matching_size(U_edges: list, n: int) -> int:
    """Hungarian-style augmenting DFS (test oracle): maximum bipartite
    matching size over (col, row) edge list."""
    adj: dict[int, list[int]] = {}
    for c, r in U_edges:
        adj.setdefault(int(c), []).append(int(r))
    mate_row = {}

    def try_aug(c, seen):
        for r in adj.get(c, ()):
            if r in seen:
                continue
            seen.add(r)
            if r not in mate_row or try_aug(mate_row[r], seen):
                mate_row[r] = c
                return True
        return False

    size = 0
    for c in range(n):
        if try_aug(c, set()):
            size += 1
    return size


# --------------------------------------------------------------------------
# label propagation (mode of neighbor classes)
# --------------------------------------------------------------------------


def lp_mod_init_kernel(a: np.ndarray, num_classes: int = 10) -> np.ndarray:
    """Chunk kernel: init class = arith id mod num_classes (lives here,
    not in the 14k-line query module, so worker processes importing the
    kernel stay light)."""
    return (a % num_classes).astype(np.int64)


def label_propagation(
    engine: SpmvEngine, init, num_classes: int, iters: int,
    trace: list | None = None
) -> np.ndarray:
    """Synchronous mode-of-neighbors update; tie -> smallest class id;
    isolated vertices keep their class. Each round is the fused
    engine.labelprop_round: indicator built inside the resident actors,
    per-class counts merged and argmax'd in one combine task — two task
    rounds per iteration, (k, n) state never leaves the object store.
    ``init`` is a dense int array OR an aligned list of chunk refs (the
    refs form keeps the init off the driver too). Pass ``trace`` (a
    list) to record each round's label-flip count."""
    cls = init if isinstance(init, list) else engine.chunk(
        init.astype(np.int64))
    for _ in range(iters):
        new_cls = engine.labelprop_round(cls, num_classes)
        if trace is not None:
            trace.append(int(sum(engine.chunk_scalars(_ne_count,
                                                      cls, new_cls))))
        cls = new_cls
    return engine.unchunk(cls)


def _ne_count(a, b):
    return int((np.asarray(a) != np.asarray(b)).sum())


# --------------------------------------------------------------------------
# triangle counting (Dataset-native masked SpGEMM)
# --------------------------------------------------------------------------


_FIB = np.uint64(11400714819323198485)  # Fibonacci multiplicative mix


def _tc_part(x: np.ndarray, g: int) -> np.ndarray:
    """Cheap well-mixed partition assignment for raw-task shuffles."""
    return ((x.astype(np.uint64) * _FIB) >> np.uint64(33)).astype(np.int64) % g


def _tc_split(arrs: tuple, p: np.ndarray, g: int):
    out = [tuple(a[p == i] for a in arrs) for i in range(g)]
    return out[0] if g == 1 else tuple(out)


def _tc_route_blocks(tbl: pa.Table, g: int, n: int):
    """Per input edge block: batch-local undirected dedup, route distinct
    pair keys by hash(key)."""
    import ray  # noqa: F401  (remote context)

    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        # empty hash-shuffle partitions may carry an empty schema
        key = np.empty(0, dtype=np.int64)
        return _tc_split((key,), _tc_part(key, g), g)
    src = np.asarray(tbl.column("src"))
    dst = np.asarray(tbl.column("dst"))
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    key = np.unique(lo[keep] * np.int64(n) + hi[keep])
    return _tc_split((key,), _tc_part(key, g), g)


def _tc_dedup_route_v(g: int, n: int, *parts):
    """Per key-partition: global dedup of pair keys, then route endpoint
    rows (v, key) by hash(v) for the degree/orientation stage. Returns
    g routed parts, then the partition's distinct key array (broadcast
    path input), then its count (num_returns = g + 2)."""
    key = np.unique(np.concatenate([p[0] for p in parts])) if parts else (
        np.empty(0, dtype=np.int64))
    a = (key // n).astype(np.int64)
    b = (key % n).astype(np.int64)
    v = np.concatenate([a, b])
    k2 = np.concatenate([key, key])
    routed = _tc_split((v, k2), _tc_part(v, g), g)
    if g == 1:
        routed = (routed,)
    return tuple(routed) + (key, int(len(key)))


def _attach_core(g: int, n: int, parts):
    """Shared degree/rank attach over a v-partition's (v, key) rows:
    deg(v) = row count (one row per distinct pair per endpoint), rank
    r(v) = deg*n + v. Returns (routed (other, v, r_v) parts split by
    hash(other), distinct vertices, their degrees)."""
    if parts:
        v = np.concatenate([p[0] for p in parts])
        key = np.concatenate([p[1] for p in parts])
    else:
        v = key = np.empty(0, dtype=np.int64)
    if len(v):
        uv, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        r = cnt[inv].astype(np.int64) * np.int64(n) + v
    else:
        uv = cnt = np.empty(0, dtype=np.int64)
        r = np.empty(0, dtype=np.int64)
    a = key // n
    b = key % n
    other = np.where(a == v, b, a)
    routed = _tc_split((other, v, r), _tc_part(other, g), g)
    return routed, uv, cnt.astype(np.int64)


def _tc_attach_route_other(g: int, n: int, *parts):
    """Per v-partition: route (other_endpoint, v, r_v) rows by
    hash(other) (see `_attach_core`)."""
    return _attach_core(g, n, parts)[0]


def _tc_wedge_route_key(g: int, n: int, *parts):
    """Per m-partition: rows (m, u, r_u) for every neighbor u of each m
    here; deg(m) = m's row count so r(m) is local. ins = lower-rank
    neighbors, outs = higher-rank; emit per-(u_in, u_out) wedge keys
    (pre-aggregated) and the oriented L membership rows, both routed by
    hash(wedge key)."""
    wk, wm, mk = _wedge_expand(n, parts)
    uk, cnt = (np.unique(wk, return_counts=True) if len(wk)
               else (wk, wk))
    cnt = cnt.astype(np.int64)
    pw = _tc_part(uk, g)
    pm = _tc_part(mk, g)
    out = [(uk[pw == i], cnt[pw == i], mk[pm == i]) for i in range(g)]
    return out[0] if g == 1 else tuple(out)


def _wedge_expand(n: int, parts):
    """Shared wedge expansion over an m-partition's (m, u, r_u) rows:
    deg(m) = m's row count so r(m) is local; ins = lower-rank neighbors,
    outs = higher-rank. Returns (wedge keys u_in*n + u_out, wedge
    midpoints, oriented-L membership keys m*n + u_out) — raw/
    unaggregated; all empty when the partition is."""
    if parts:
        m = np.concatenate([p[0] for p in parts])
        u = np.concatenate([p[1] for p in parts])
        ru = np.concatenate([p[2] for p in parts])
    else:
        m = u = ru = np.empty(0, dtype=np.int64)
    e = np.empty(0, dtype=np.int64)
    if not len(m):
        return e, e, e
    order = np.lexsort((ru, m))
    m, u, ru = m[order], u[order], ru[order]
    um, starts, cnts = np.unique(m, return_index=True, return_counts=True)
    rm = np.repeat(cnts.astype(np.int64) * np.int64(n) + um, cnts)
    is_out = ru > rm  # strict: ranks are unique (id tie-break)
    grp = np.repeat(np.arange(len(um)), cnts)
    n_out = np.bincount(grp, weights=is_out, minlength=len(um)).astype(np.int64)
    n_in = cnts - n_out
    out_start = starts + n_in  # outs are each group's suffix (sorted by ru)
    in_rows = np.nonzero(~is_out)[0]
    lens = n_out[grp[in_rows]]
    total = int(lens.sum())
    if total:
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.repeat(out_start[grp[in_rows]], lens) + (
            np.arange(total) - np.repeat(offs, lens)
        )
        wk = np.repeat(u[in_rows], lens) * np.int64(n) + u[idx]
        wm = np.repeat(m[in_rows], lens)
    else:
        wk = wm = e
    mk = m[is_out] * np.int64(n) + u[is_out]  # oriented edge, emitted once
    return wk, wm, mk


def _tc_close(*parts) -> int:
    """Per wedge-key partition: sum wedge multiplicities whose (u, w) key
    is an oriented L edge."""
    wk = np.concatenate([p[0] for p in parts])
    wc = np.concatenate([p[1] for p in parts])
    mk = np.sort(np.concatenate([p[2] for p in parts]))
    if not len(wk) or not len(mk):
        return 0
    pos = np.searchsorted(mk, wk)
    pos = np.minimum(pos, len(mk) - 1)
    return int(wc[mk[pos] == wk].sum())


def _pairs_scaffold(sym_edges_ds, g: int, n: int) -> list:
    """Shared head of every wedge-plan pipeline: per input block
    batch-local undirected dedup + route by hash(key), then per key
    partition global dedup + endpoint routing. Returns the g dedup task
    handles (num_returns = g + 2 each: g routed (v, key) parts, the
    partition's distinct key array, its count)."""
    blocks = sym_edges_ds.to_arrow_refs()
    routed = [
        _rt(_tc_route_blocks).options(num_returns=g).remote(bref, g, n)
        for bref in blocks
    ]
    routed = [[r] if g == 1 else list(r) for r in routed]
    return [
        _rt(_tc_dedup_route_v).options(num_returns=g + 2).remote(
            g, n, *[routed[j][i] for j in range(len(routed))]
        )
        for i in range(g)
    ]


def _tc_shuffle(pairs_parts: list, n: int, num_partitions: int) -> int:
    """Fully-distributed triangle count — the scale path when the oriented
    adjacency no longer fits one worker (the shuffle SpGEMM with a
    lower-triangular mask, ``Mult_AnXBn_Synch`` ``ParFriends.h:1447`` +
    PruneI ``SpParMat.h:161``). Three raw-task shuffle rounds over
    ``num_cpus=0`` tasks (the engine's scatter/gather discipline — Ray
    Data's actor-pool hash shuffle costs ~5s spawn per round here):

      route-by-v -> degree+rank, route-by-other -> wedge expansion +
      oriented-L membership, route-by-wedge-key -> closure partials.

    No process ever holds the full pair set, L, or wedge set."""
    import ray

    g = num_partitions
    t_attach = [
        _rt(_tc_attach_route_other).options(num_returns=g).remote(
            g, n, *[pairs_parts[j][i] for j in range(len(pairs_parts))]
        )
        for i in range(g)
    ]
    t_attach = [[t] if g == 1 else list(t) for t in t_attach]
    t_wedge = [
        _rt(_tc_wedge_route_key).options(num_returns=g).remote(
            g, n, *[t_attach[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    t_wedge = [[t] if g == 1 else list(t) for t in t_wedge]
    parts = [
        _rt(_tc_close).remote(*[t_wedge[j][i] for j in range(g)])
        for i in range(g)
    ]
    return int(sum(ray.get(parts)))


_RT_CACHE: dict = {}


def _rt(fn):
    """Cached @ray.remote(num_cpus=0) wrapper for module-level kernels."""
    import ray

    if fn not in _RT_CACHE:
        _RT_CACHE[fn] = ray.remote(num_cpus=0)(fn)
    return _RT_CACHE[fn]


def triangle_count(
    sym_edges_ds, n: int, method: str = "auto", num_partitions: int = 16,
    broadcast_max_edges: int = 200_000,
) -> int:
    """Count triangles from the structural undirected edge Dataset (both
    directions present, w=1). Distinct-pair dedup is ALWAYS distributed
    (one hash shuffle); every edge is then oriented from its LOWER
    (degree, id)-ranked endpoint — the standard degree-ordering that
    bounds wedge counts by O(m^1.5) even with hub vertices (the
    reference's equivalent is the lower-triangular PruneI mask,
    ``SpParMat.h:161``; id-order alone explodes on power-law hubs).

    method="broadcast": the oriented CSR adjacency + a sorted edge-key
    array are put in the object store ONCE; each map_batches task expands
    its edges' wedges vectorized (repeat/searchsorted) and emits a partial
    count — `EWiseMult(B, L)` fused into the multiply, no further shuffle.
    Right while the oriented L fits in worker memory.

    method="join": degree table + orientation + wedge expansion + closure
    all as distributed hash joins (the shuffle-SpGEMM scale-out path,
    ``Mult_AnXBn_Synch`` ``ParFriends.h:1447``) — nothing ever holds L
    whole.

    method="auto" (default): count the distinct pairs and pick the
    distributed join plan except for toy graphs — the reference's own
    cost-based plan switches (``FastSV.h:221-228``). Measured at sf0.1 /
    32 CPUs the raw-task join plan (1.3s) beats broadcast (3-5s) AND
    never holds L whole, so it is the default at any real size.
    """
    import ray

    g = num_partitions
    # distributed distinct-pair dedup as ONE raw-task shuffle round: per
    # input block batch-local unique + route by key hash, per partition
    # global unique. Raw num_cpus=0 tasks — Ray Data's actor-pool hash
    # shuffle pays ~5s of aggregator spawn per round on this box.
    dedup = _pairs_scaffold(sym_edges_ds, g, n)
    pair_counts = ray.get([d[g + 1] for d in dedup])
    m_distinct = int(sum(pair_counts))
    if method == "auto":
        method = "broadcast" if m_distinct <= broadcast_max_edges else "join"

    if method == "join":
        pairs_parts = [[d[i] for i in range(g)] for d in dedup]
        return _tc_shuffle(pairs_parts, n, num_partitions)

    # broadcast: assemble the (already deduped, distributed) pair keys
    # into one oriented CSR and ray.put it once — the small-side
    # broadcast pattern; only taken when the count is under threshold.
    keys_parts = ray.get([d[g] for d in dedup])
    key = (np.concatenate(keys_parts) if keys_parts
           else np.empty(0, dtype=np.int64))
    a = (key // n).astype(np.int64)
    b = (key % n).astype(np.int64)
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    # orientation rank: (deg, id) as a single comparable scalar
    rank = deg.astype(np.int64) * np.int64(n) + np.arange(n, dtype=np.int64)
    swap = rank[a] > rank[b]
    u = np.where(swap, b, a)
    v = np.where(swap, a, b)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    np.cumsum(indptr, out=indptr)
    keys = u * np.int64(n) + v  # sorted ascending by construction
    adj_ref = ray.put((indptr, v, keys, n))
    edges_ds = ray.data.from_arrow(
        pa.table({"src": pa.array(u), "dst": pa.array(v)})
    ).repartition(num_blocks=32)

    def _count(batch: pa.Table, *, _ref=adj_ref) -> pa.Table:
        indptr, adj_dst, keys, n = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        eu = np.asarray(batch.column("src"))
        ew = np.asarray(batch.column("dst"))
        starts, ends = indptr[ew], indptr[ew + 1]
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return pa.table({"c": pa.array([0], type=pa.int64())})
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.repeat(starts, lens) + (np.arange(total) - np.repeat(offs, lens))
        wedge_v = adj_dst[idx]  # wedge eu - ew - wedge_v (rank-increasing)
        uu = np.repeat(eu, lens)
        probe = uu * np.int64(n) + wedge_v
        pos = np.searchsorted(keys, probe)
        pos = np.minimum(pos, len(keys) - 1)
        hits = int((keys[pos] == probe).sum())
        return pa.table({"c": pa.array([hits], type=pa.int64())})

    parts = edges_ds.map_batches(_count, batch_format="pyarrow").take_all()
    return int(sum(p["c"] for p in parts))


# ---------------------------------------------------------------------------
# per-vertex triangles / local clustering coefficients
# ---------------------------------------------------------------------------


def _tc_auto_grid(edges_ds, floor: int = 4, cap: int = 64,
                  rows_per_part: int = 400_000) -> int:
    """Adaptive shuffle width for the wedge-plan pipelines: the g^2 task
    fan per wave costs ~25 ms/task on this box, so small inputs want a
    narrow grid while 100-TB inputs want the cap. Sized from the edge
    Dataset's (metadata) row count."""
    try:
        m = edges_ds.count()
    except Exception:
        return 16
    return max(floor, min(cap, -(-int(m) // rows_per_part)))


def _ccf_attach(g: int, n: int, *parts):
    """`_tc_attach_route_other` plus this v-partition's (vertex, degree)
    arrays as one extra return — degree = distinct-neighbor count (every
    endpoint row of v is routed here, one row per distinct pair)."""
    routed, uv, cnt = _attach_core(g, n, parts)
    if g == 1:
        routed = (routed,)
    return tuple(routed) + ((uv, cnt),)


def _ccf_wedge_route(g: int, n: int, *parts):
    """`_tc_wedge_route_key` variant that KEEPS the wedge midpoint:
    emits unaggregated (wedge key, midpoint) rows + the oriented-L
    membership keys, both routed by hash(wedge key) / hash(edge key)."""
    wk, wm, mk = _wedge_expand(n, parts)
    pw = _tc_part(wk, g)
    pm = _tc_part(mk, g)
    out = [(wk[pw == i], wm[pw == i], mk[pm == i]) for i in range(g)]
    return out[0] if g == 1 else tuple(out)


def _closed_corners(n: int, parts):
    """Shared closure prologue over a wedge-key partition: membership-
    test the (wk, wm) wedge rows against the sorted oriented-L keys;
    returns the closed wedges' corner ids (x, z, midpoint) — all empty
    when nothing closes."""
    e = np.empty(0, dtype=np.int64)
    wk = np.concatenate([p[0] for p in parts]) if parts else e
    wm = np.concatenate([p[1] for p in parts]) if parts else e
    mk = np.concatenate([p[2] for p in parts]) if parts else e
    if not len(wk) or not len(mk):
        return e, e, e
    mk = np.sort(mk)
    pos = np.searchsorted(mk, wk)
    pos = np.minimum(pos, len(mk) - 1)
    closed = mk[pos] == wk
    return wk[closed] // n, wk[closed] % n, wm[closed]


def _ccf_close_route_v(g: int, n: int, *parts):
    """Per wedge-key partition: each CLOSED wedge (x, z through midpoint
    m, edge (x, z) present in oriented L) credits one triangle to each of
    its three corners; per-vertex partial counts routed by hash(v)."""
    x, z, mid = _closed_corners(n, parts)
    uv, cnt = np.unique(np.concatenate([x, z, mid]), return_counts=True)
    return _tc_split((uv, cnt.astype(np.int64)), _tc_part(uv, g), g)


def _ccf_merge(deg_part, *parts):
    """Per v-partition: sum the triangle partials and align them with the
    degree rows; returns (v, deg, tri) int64 arrays (vertices with
    degree >= 1 only — isolated vertices have deg = tri = 0)."""
    uv_d, deg = deg_part
    if parts:
        v = np.concatenate([p[0] for p in parts])
        c = np.concatenate([p[1] for p in parts])
    else:
        v = c = np.empty(0, dtype=np.int64)
    tri = np.zeros(len(uv_d), dtype=np.int64)
    if len(v):
        # every triangle corner has degree >= 2, so it is present in uv_d
        # (routed by the same hash); uv_d is sorted (np.unique)
        np.add.at(tri, np.searchsorted(uv_d, v), c)
    return uv_d, deg, tri


def _ccf_merge_table(deg_part, *parts) -> pa.Table:
    """`_ccf_merge` emitting one Arrow block (Dataset-composable)."""
    uv_d, deg, tri = _ccf_merge(deg_part, *parts)
    return pa.table({
        "v": pa.array(uv_d, type=pa.int64()),
        "deg": pa.array(np.asarray(deg, dtype=np.int64), type=pa.int64()),
        "tri": pa.array(tri, type=pa.int64()),
    })


def clustering_coefficients(
    sym_edges_ds, n: int, num_partitions: int | None = None,
    materialize: bool = True,
):
    """Per-vertex triangle counts + distinct-neighbor degrees from the
    undirected edge Dataset: the `triangle_count` join plan
    (degree-ordered wedge expansion + closure against the oriented L,
    the reference's masked-SpGEMM recipe ``SpParMat.h:161`` +
    ``ParFriends.h:1447``) extended to keep the wedge MIDPOINT, so each
    closed wedge credits its three corners — the per-vertex row sums the
    reference reads off ``EWiseMult(A^2, A)``. Local coefficient =
    2*tri / (deg*(deg-1)).

    Fully distributed: the same route-by-v -> route-by-other ->
    route-by-wedge-key raw-task rounds as `_tc_shuffle` plus one final
    route-by-vertex merge; no task ever holds the pair set, L, or the
    wedge set whole. Returns an Arrow table (v, deg, tri) over vertices
    with degree >= 1; ``materialize=False`` returns the same rows as a
    Dataset of per-partition blocks instead (the scale form — per-vertex
    output never lands on the driver)."""
    import ray

    g = num_partitions or _tc_auto_grid(sym_edges_ds)
    dedup = _pairs_scaffold(sym_edges_ds, g, n)
    pairs_parts = [[d[i] for i in range(g)] for d in dedup]
    attach = [
        _rt(_ccf_attach).options(num_returns=g + 1).remote(
            g, n, *[pairs_parts[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    deg_parts = [t[g] for t in attach]
    attach = [[t[i] for i in range(g)] for t in attach]
    wedge = [
        _rt(_ccf_wedge_route).options(num_returns=g).remote(
            g, n, *[attach[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    wedge = [[t] if g == 1 else list(t) for t in wedge]
    close = [
        _rt(_ccf_close_route_v).options(num_returns=g).remote(
            g, n, *[wedge[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    close = [[t] if g == 1 else list(t) for t in close]
    merged = [
        _rt(_ccf_merge_table).remote(
            deg_parts[i], *[close[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    if not materialize:
        return ray.data.from_arrow_refs(merged)
    return pa.concat_tables(ray.get(merged))


# ---------------------------------------------------------------------------
# k-core (fixed synchronous peel rounds) and HITS (fixed iterations)
# ---------------------------------------------------------------------------


def _kcore_mask(active: np.ndarray, deg: np.ndarray, bounds, *, k: int):
    """active' = active AND (# active neighbors >= k)."""
    return (active * (deg >= k)).astype(np.float64)


def kcore_fixed(engine: SpmvEngine, k: int, rounds: int) -> np.ndarray:
    """k-core peeling, exactly ``rounds`` synchronous rounds:
    ``active_r = active_{r-1} AND (#active_{r-1} neighbors >= k)``.
    Active-neighbor degree = ONE structural plus_times SpMV over the
    undirected engine per round (the reference composite: iterated
    ``SpParMat::Reduce`` + ``Prune``, ``SpParMat.cpp`` reduce +
    ``SpParMat.h:152`` prune), fused with the mask kernel into one task
    per row chunk per round. Vertex state stays chunked in the object
    store; returns the 0/1 in-core indicator (float64, exact)."""
    active = engine.chunk(np.ones(engine.n, dtype=np.float64))
    for _ in range(rounds):
        active = engine.spmv_apply_refs(
            active, "plus_times", partial(_kcore_mask, k=k), 1, active
        )[0]
    return engine.unchunk(active)


def hits_fixed(eng_fwd: SpmvEngine, eng_rev: SpmvEngine, iters: int = 3):
    """HITS, exactly ``iters`` UN-normalized synchronous iterations over
    the structural directed graph: ``a_k[dst] = sum_src h_{k-1}[src]``
    (the forward engine pushes src->dst) and ``h_k[src] = sum_dst
    a_k[dst]`` (the transposed engine). Two plus_times semiring SpMVs
    per iteration (``ParFriends.h:2379``); normalization is omitted so
    every value is an exact integer count (the ranking is scale-free) —
    exact in the f64 value channel while max < 2^53 (guarded).

    Returns (auth, hub) int64 arrays."""
    if eng_fwd.n != eng_rev.n or eng_fwd.g != eng_rev.g:
        raise ValueError("hits_fixed: engines must share (n, g)")
    h = eng_fwd.chunk(np.ones(eng_fwd.n, dtype=np.float64))
    a = h
    for _ in range(iters):
        a = eng_fwd.spmv_refs(h, "plus_times")
        h = eng_rev.spmv_refs(a, "plus_times")
    auth = eng_fwd.unchunk(a)
    hub = eng_rev.unchunk(h)
    mx = max(auth.max(initial=0.0), hub.max(initial=0.0))
    if mx >= 2.0**53:
        raise NotImplementedError(
            "hits_fixed: counts exceed the exact float64 integer range; "
            "fewer iterations or a normalized (approximate) variant is "
            "needed at this scale"
        )
    return auth.astype(np.int64), hub.astype(np.int64)


# ---------------------------------------------------------------------------
# k-truss (fixed synchronous edge-peel rounds)
# ---------------------------------------------------------------------------


def _kt_key(part) -> np.ndarray:
    """Key partitions arrive as a bare array (round 0, from
    `_tc_dedup_route_v`) or a `(keys,)` tuple (from `_kt_filter`)."""
    return part[0] if isinstance(part, tuple) else part


def _kt_route_v(g: int, n: int, *parts):
    """From a (distinct) key partition: route endpoint rows (v, key) by
    hash(v) for the degree/orientation stage (the second half of
    `_tc_dedup_route_v`, without the re-dedup)."""
    key = (np.concatenate([_kt_key(p) for p in parts]) if parts
           else np.empty(0, dtype=np.int64))
    a = (key // n).astype(np.int64)
    b = (key % n).astype(np.int64)
    v = np.concatenate([a, b])
    k2 = np.concatenate([key, key])
    return _tc_split((v, k2), _tc_part(v, g), g)


def _kt_close_route_key(g: int, n: int, *parts):
    """Per wedge-key partition: each closed wedge (x, z through m)
    credits one SUPPORT to each of the triangle's three edges; per-edge
    (id-ordered key, count) partials routed by hash(key) — aligned with
    the surviving-edge partitions."""
    x, z, m = _closed_corners(n, parts)
    lo = np.concatenate([np.minimum(x, z), np.minimum(x, m),
                         np.minimum(m, z)])
    hi = np.concatenate([np.maximum(x, z), np.maximum(x, m),
                         np.maximum(m, z)])
    uk, cnt = np.unique(lo * np.int64(n) + hi, return_counts=True)
    return _tc_split((uk, cnt.astype(np.int64)), _tc_part(uk, g), g)


def _kt_keys_table(n: int, key_part) -> pa.Table:
    """One (src, dst) Arrow block from a surviving-key partition."""
    key = _kt_key(key_part)
    return pa.table({
        "src": pa.array((key // n).astype(np.int64), type=pa.int64()),
        "dst": pa.array((key % n).astype(np.int64), type=pa.int64()),
    })


def _kt_filter(min_supp: int, key_part, *supp_parts):
    """Per key partition: merge support partials; keep keys with
    support >= min_supp. Returns (surviving keys,) as a 1-tuple."""
    key = _kt_key(key_part)
    if supp_parts:
        uk = np.concatenate([p[0] for p in supp_parts])
        c = np.concatenate([p[1] for p in supp_parts])
    else:
        uk = c = np.empty(0, dtype=np.int64)
    supp = np.zeros(len(key), dtype=np.int64)
    if len(uk):
        su, inv = np.unique(uk, return_inverse=True)
        tot = np.zeros(len(su), dtype=np.int64)
        np.add.at(tot, inv, c)
        pos = np.searchsorted(key, su)  # key is sorted (np.unique upstream)
        supp[pos] = tot
    return (key[supp >= min_supp],)


def ktruss_fixed(sym_edges_ds, n: int, k: int, rounds: int,
                 num_partitions: int | None = None,
                 materialize: bool = True):
    """k-truss, exactly ``rounds`` synchronous edge-peel rounds: drop
    every edge whose SUPPORT (triangles it participates in, over the
    current surviving edge set) is < k-2, rounds times. Per round the
    `clustering_coefficients` wedge plan runs over the survivors and the
    closure stage credits each closed wedge to its three EDGES (the
    reference recipe is the same masked SpGEMM, ``SpParMat.h:161`` +
    ``ParFriends.h:1447``, re-reduced per edge instead of per vertex).
    All state stays as hash(key)-partitioned distinct-pair arrays in the
    object store; the driver submits task waves only.

    Returns the surviving distinct undirected pair keys (lo*n + hi) as
    one int64 array; ``materialize=False`` returns a Dataset of (src,
    dst) blocks instead (the scale form — the surviving edge set never
    lands on the driver)."""
    import ray

    g = num_partitions or _tc_auto_grid(sym_edges_ds)
    dedup = _pairs_scaffold(sym_edges_ds, g, n)
    # current surviving keys, partition i = hash(key) == i, each sorted
    keys = [d[g] for d in dedup]
    for _ in range(rounds):
        kv = [
            _rt(_kt_route_v).options(num_returns=g).remote(
                g, n, keys[i]
            )
            for i in range(g)
        ]
        kv = [[t] if g == 1 else list(t) for t in kv]
        attach = [
            _rt(_tc_attach_route_other).options(num_returns=g).remote(
                g, n, *[kv[j][i] for j in range(g)]
            )
            for i in range(g)
        ]
        attach = [[t] if g == 1 else list(t) for t in attach]
        wedge = [
            _rt(_ccf_wedge_route).options(num_returns=g).remote(
                g, n, *[attach[j][i] for j in range(g)]
            )
            for i in range(g)
        ]
        wedge = [[t] if g == 1 else list(t) for t in wedge]
        close = [
            _rt(_kt_close_route_key).options(num_returns=g).remote(
                g, n, *[wedge[j][i] for j in range(g)]
            )
            for i in range(g)
        ]
        close = [[t] if g == 1 else list(t) for t in close]
        keys = [
            _rt(_kt_filter).remote(
                k - 2, keys[i], *[close[j][i] for j in range(g)]
            )
            for i in range(g)
        ]
    if not materialize:
        return ray.data.from_arrow_refs(
            [_rt(_kt_keys_table).remote(n, kp) for kp in keys]
        )
    parts = [_kt_key(p) for p in ray.get(keys)]
    return (np.sort(np.concatenate(parts)) if parts
            else np.empty(0, dtype=np.int64))


def _kt_support_hist(key_part, *supp_parts):
    """Per key partition: merge the closed-wedge support partials over
    this partition's distinct edge keys (zeros kept for never-credited
    edges) and histogram -> (support_values, counts). The terminal
    reduce of the one-pass support plan: only the tiny histogram leaves
    the partition."""
    key = _kt_key(key_part)
    supp = np.zeros(len(key), dtype=np.int64)
    if supp_parts:
        uk = np.concatenate([p[0] for p in supp_parts])
        c = np.concatenate([p[1] for p in supp_parts])
        if len(uk):
            su, inv = np.unique(uk, return_inverse=True)
            tot = np.zeros(len(su), dtype=np.int64)
            np.add.at(tot, inv, c)
            pos = np.searchsorted(key, su)  # key sorted (np.unique upstream)
            supp[pos] = tot
    sv, sc = np.unique(supp, return_counts=True)
    return sv, sc.astype(np.int64)


def edge_support_hist(sym_edges_ds, n: int,
                      num_partitions: int | None = None):
    """Histogram of per-edge triangle SUPPORT over the distinct
    undirected edge set — the k-truss support metric
    (``ktruss_fixed``'s peel predicate, reference recipe masked SpGEMM
    ``SpParMat.h:161`` + ``ParFriends.h:1447``) surfaced as a census
    instead of a filter. Support 0 counts the graph's LOCAL BRIDGES
    (edges whose endpoints share no neighbor). One wedge/close pass of
    the distributed k-truss plan; per-partition histograms are the only
    driver traffic. Returns (support, n_edges) int64 arrays."""
    import ray

    g = num_partitions or _tc_auto_grid(sym_edges_ds)
    dedup = _pairs_scaffold(sym_edges_ds, g, n)
    keys = [d[g] for d in dedup]
    kv = [
        _rt(_kt_route_v).options(num_returns=g).remote(g, n, keys[i])
        for i in range(g)
    ]
    kv = [[t] if g == 1 else list(t) for t in kv]
    attach = [
        _rt(_tc_attach_route_other).options(num_returns=g).remote(
            g, n, *[kv[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    attach = [[t] if g == 1 else list(t) for t in attach]
    wedge = [
        _rt(_ccf_wedge_route).options(num_returns=g).remote(
            g, n, *[attach[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    wedge = [[t] if g == 1 else list(t) for t in wedge]
    close = [
        _rt(_kt_close_route_key).options(num_returns=g).remote(
            g, n, *[wedge[j][i] for j in range(g)]
        )
        for i in range(g)
    ]
    close = [[t] if g == 1 else list(t) for t in close]
    hists = ray.get([
        _rt(_kt_support_hist).remote(
            keys[i], *[close[j][i] for j in range(g)]
        )
        for i in range(g)
    ])
    sv = np.concatenate([h[0] for h in hists]) if hists \
        else np.empty(0, dtype=np.int64)
    sc = np.concatenate([h[1] for h in hists]) if hists \
        else np.empty(0, dtype=np.int64)
    if not len(sv):
        return sv, sc
    u, inv = np.unique(sv, return_inverse=True)
    tot = np.zeros(len(u), dtype=np.int64)
    np.add.at(tot, inv, sc)
    return u, tot


# --------------------------------------------------------------------------
# strongly connected components (fixed-round forward/backward coloring)
# --------------------------------------------------------------------------


def scc_coloring(eng_fwd: SpmvEngine, eng_rev: SpmvEngine,
                 iters: int) -> np.ndarray:
    """ONE fixed-round FW-BW min-label coloring round (the first round
    of an Orzan-style SCC decomposition, on the reference's min-label
    machinery ``CC.h:419-577``): ``bwd[v]`` = min label that REACHES v
    within `iters` hops (min-label rounds along edge direction, the
    forward engine), ``fwd[v]`` = min label v reaches (the transposed
    engine). ``fwd[v] == bwd[v] == r`` proves v and r are mutually
    reachable, so v joins r's SCC; every other vertex keeps its own id.
    This is a PARTIAL decomposition — it certifies exactly the SCCs
    containing each reach-region's minimum (given iters >= their
    diameter); `scc` iterates it (with trimming) to the full
    decomposition. Fixed rounds keep the DuckDB twin unrollable. Both
    label vectors stay chunked refs; two fused SpMV+min task rounds per
    iteration."""
    if eng_fwd.n != eng_rev.n:
        raise ValueError("scc_coloring: engines must share n")
    bwd = cc_fixed(eng_fwd, iters)
    fwd = cc_fixed(eng_rev, iters)
    return np.where(fwd == bwd, fwd, np.arange(eng_fwd.n, dtype=np.int64))


# --------------------------------------------------------------------------
# deterministic random walks (node2vec-style corpus sampling)
# --------------------------------------------------------------------------

_RW_T = 10007
_RW_W = 1000003
_RW_A = 1103515245
_RW_C = 12345
_RW_MOD = 2**31


def _rw_rank_kernel(t: pa.Table) -> pa.Table:
    """Per src-hash partition: neighbor rank (dst ascending) + outdegree
    for every distinct (src, dst) edge."""
    empty = pa.table({
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
        "rnk": pa.array([], type=pa.int64()),
        "odeg": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    src = np.asarray(t.column("src"), dtype=np.int64)
    dst = np.asarray(t.column("dst"), dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    new = np.empty(len(src), dtype=bool)
    new[0] = True
    new[1:] = src[1:] != src[:-1]
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    rnk = np.arange(len(src)) - starts[grp]
    odeg = np.bincount(grp).astype(np.int64)[grp]
    return pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "rnk": pa.array(rnk.astype(np.int64)), "odeg": pa.array(odeg),
    })


def _rw_lookup(part: pa.Table, walkers: np.ndarray, curs: np.ndarray,
               step: int):
    """One adjacency partition answers its walkers' next-hop requests:
    target rank = LCG(walker, step) % outdeg(cur); a cur with no
    out-edges returns dst -1 (the walk dies)."""
    src = np.asarray(part.column("src"), dtype=np.int64)
    dst = np.asarray(part.column("dst"), dtype=np.int64)
    rnk = np.asarray(part.column("rnk"), dtype=np.int64)
    out = np.full(len(walkers), -1, dtype=np.int64)
    lcg = ((walkers * _RW_W + step * _RW_T) * _RW_A + _RW_C) % _RW_MOD
    for i in range(len(walkers)):
        m = src == curs[i]
        if not m.any():
            continue
        want = lcg[i] % int(m.sum())
        hit = np.nonzero(m & (rnk == want))[0]
        if len(hit):
            out[i] = dst[hit[0]]
    return walkers, out


def random_walks(edges_ds, seeds: np.ndarray, steps: int,
                 num_partitions: int | None = None) -> pa.Table:
    """`steps` deterministic LCG-driven walk steps from `seeds` over the
    directed distinct-pair graph. The ranked adjacency is built ONCE
    (one src-hash shuffle) and stays partitioned in the object store;
    each step sends every walker's (cur, rank-request) to the ONE
    partition owning cur (num_cpus=0 tasks) — per step the data moved
    is O(walkers), never the edge table. Walks at a sink vertex stop.
    Returns (walker, step, vertex) including step 0. Mirrors the
    reference's roots-based traversal drivers (`SelectCandidates`,
    DirOptBFS.cpp:268) re-cast as corpus walk sampling."""
    import ray

    from ..core.shuffle import (_FIB64, _rt0, default_shuffle_blocks,
                                edge_group_apply_tasks)

    g = num_partitions or default_shuffle_blocks()
    ranked = edge_group_apply_tasks(edges_ds, "src", _rw_rank_kernel,
                                    num_partitions=g)
    parts = ranked.to_arrow_refs()  # parts[i] == src-hash partition i
    walkers = np.arange(len(seeds), dtype=np.int64)
    curs = np.asarray(seeds, dtype=np.int64)
    alive = np.ones(len(seeds), dtype=bool)
    rows_w = [walkers.copy()]
    rows_s = [np.zeros(len(seeds), dtype=np.int64)]
    rows_v = [curs.copy()]
    lookup = _rt0(_rw_lookup)
    for step in range(1, steps + 1):
        if not alive.any():
            break
        aw, ac = walkers[alive], curs[alive]
        p = ((ac.astype(np.uint64) * _FIB64) >> np.uint64(33)).astype(
            np.int64) % g
        futs = []
        for pi in np.unique(p):
            m = p == pi
            futs.append(lookup.remote(parts[pi], aw[m], ac[m], step))
        nxt = np.full(len(walkers), -1, dtype=np.int64)
        for w_ids, dsts in ray.get(futs):
            nxt[w_ids] = dsts
        alive = nxt >= 0
        curs = np.where(alive, nxt, curs)
        if alive.any():
            rows_w.append(walkers[alive])
            rows_s.append(np.full(int(alive.sum()), step, dtype=np.int64))
            rows_v.append(curs[alive])
    return pa.table({
        "walker": pa.array(np.concatenate(rows_w)),
        "step": pa.array(np.concatenate(rows_s)),
        "vertex": pa.array(np.concatenate(rows_v)),
    })


def scc(eng_fwd: SpmvEngine, eng_rev: SpmvEngine,
        max_rounds: int = 60) -> np.ndarray:
    """Full SCC decomposition: iterated trim + FW-BW min-label coloring
    (Orzan coloring with trimming — the standard parallel SCC scheme;
    the per-phase kernels are the reference's min-label machinery,
    ``CC.h:419-577``). Per outer round, over the UNASSIGNED subgraph:

    1. trim to fixpoint — a vertex with no unassigned in-neighbors or no
       unassigned out-neighbors is a singleton SCC (cheap plus_times
       indicator SpMVs);
    2. min-label coloring to fixpoint in both directions (assigned
       vertices are pinned at +inf so they neither relay nor receive);
    3. assign v to SCC r where fwd-min == bwd-min == r (mutual
       reachability proof).

    Each round assigns at least the unassigned minimum's SCC, so the
    loop terminates. The scc/fwd/bwd vectors are driver-resident O(n)
    numpy (the FullyDistVec analog — same discipline as
    `maximum_matching`); the per-iteration work is engine SpMVs.
    Assumes a loop-free edge table (the corpus build drops loops);
    self-loops would break the trim-singleton argument."""
    n = eng_fwd.n
    out = np.full(n, -1, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        unass = out < 0
        if not unass.any():
            break
        # 1. trim to fixpoint
        while True:
            ind = unass.astype(np.float64)
            n_in = eng_fwd.spmv(ind, "plus_times")   # unassigned in-nbrs
            n_out = eng_rev.spmv(ind, "plus_times")  # unassigned out-nbrs
            trim = unass & ((n_in == 0) | (n_out == 0))
            if not trim.any():
                break
            out[trim] = ids[trim]
            unass = out < 0
            if not unass.any():
                return out
        # 2. masked min-label coloring to fixpoint, both directions
        def _color(eng):
            x = np.where(unass, ids.astype(np.float64), np.inf)
            while True:
                y = eng.spmv(x, "select2nd_min")
                nx = np.where(unass, np.minimum(x, y), np.inf)
                if np.array_equal(nx, x, equal_nan=True):
                    return x
                x = nx

        bwd = _color(eng_fwd)
        fwd = _color(eng_rev)
        # 3. assign agreeing vertices (fwd==bwd==r is mutual reach)
        agree = unass & np.isfinite(fwd) & (fwd == bwd)
        if not agree.any():
            raise RuntimeError("scc: no progress (unexpected)")
        out[agree] = fwd[agree].astype(np.int64)
    if (out < 0).any():
        raise RuntimeError(f"scc: {int((out < 0).sum())} vertices "
                           f"unassigned after {max_rounds} rounds")
    return out


# ---------------------------------------------------------------------------
# Stress centrality (single source): the integer backward-accumulation
# half of Brandes (`BetwCent.cpp:205-230` runs the float delta variant;
# stress uses the INTEGER recurrence g(v) = sum_{w in succ(v)} (1 + g(w))
# so the whole pipeline stays order-free exact).
# ---------------------------------------------------------------------------


def _zeros_chunk(bounds):
    s, e = bounds
    return np.zeros(e - s)


def _zeros_chunk_i64(bounds):
    s, e = bounds
    return np.zeros(e - s, dtype=np.int64)


def _stress_gx(d, g, level):
    """Backward-pass x: 1 + g at the child level, 0 elsewhere (int64)."""
    return np.where(d == level, np.int64(1) + g, np.int64(0))


def _stress_gupd(d, g, y, bounds, level):
    """Vertices at ``level`` take g = sum over dist-(level+1) neighbors
    of (1 + g) — the plus_times_i64 SpMV restricted by the x mask.
    Same int64 tripwire as the sigma phase."""
    if np.any(y < 0) or np.any(y >= _SIGMA_TRIP):
        raise NotImplementedError(
            "stress_source: path counts reached the int64 tripwire (2^61)"
        )
    return np.where(d == level, y, g)


def stress_source(engine: SpmvEngine, root: int, iters: int = 12):
    """Single-source stress centrality: number of shortest paths from
    ``root`` passing THROUGH each vertex v (= sigma(v) * g(v), with
    g(v) the count of shortest-path-DAG paths starting at v). Forward
    pass = `bfs_sigma`'s level loop; backward pass = one masked
    plus_times_i64 SpMV per level from the deepest level up. All counts
    ride the EXACT int64 channel (round-4: 2^61 tripwire replaces the f64
    2^53 guard); d/sigma/g stay chunked refs, the driver syncs one
    frontier scalar per level."""
    d = engine.map_chunks_i(partial(_root_init, root=root))
    sigma = engine.map_chunks_i(partial(_sigma_seed, root=root))
    for level in range(iters):
        x = engine.map_chunks(partial(_sigma_x, level=float(level)),
                              d, sigma)
        if not _sigma_level_guard(engine, x):
            break
        d, sigma = engine.spmv_apply_refs(
            x, "plus_times_i64",
            partial(_sigma_update_f, level=float(level)), 2, d, sigma,
        )
    g = engine.map_chunks_i(_zeros_chunk_i64)
    for level in range(iters - 1, -1, -1):
        x = engine.map_chunks(partial(_stress_gx, level=float(level + 1)),
                              d, g)
        if not _sigma_level_guard(engine, x):
            continue  # no vertices at level+1: g at `level` stays 0
        g = engine.spmv_apply_refs(
            x, "plus_times_i64", partial(_stress_gupd, level=float(level)),
            1, d, g,
        )[0]
    df = engine.unchunk(d)
    sf = engine.unchunk(sigma)
    gf = engine.unchunk(g)
    # sigma*g products must stay exact in int64 (per-level sums are
    # already tripwired); check the product without wrapping
    if len(sf) and int(sf.max(initial=0)) * int(gf.max(initial=0)) >= 2**62:
        raise NotImplementedError(
            "stress_source: sigma*g products reached the int64 tripwire"
        )
    return df, sf, gf


# ---------------------------------------------------------------------------
# Widest (bottleneck) paths: the max_min semiring end-to-end.
# ---------------------------------------------------------------------------


def _bneck_seed(bounds, root, inf):
    s, e = bounds
    b = np.full(e - s, -np.inf)
    if s <= root < e:
        b[root - s] = inf
    return b


def _bneck_update_f(b, y, bounds):
    """Fused max-update + fixpoint change COUNT (monotone max-min
    relaxation: a no-improvement round ends the computation exactly;
    the count also feeds the relaxation-trace query)."""
    m = np.maximum(b, y)
    return m, int((m > b).sum())


def widest_paths_fixed(engine: SpmvEngine, root: int, iters: int,
                       inf: float = 1e9,
                       trace: list | None = None) -> np.ndarray:
    """Fixed-round widest-path (maximum-bottleneck) distances from
    ``root`` over the DIRECTED weighted engine: exactly ``iters``
    synchronous rounds of b = max(b, max_min-SpMV(b)) — the max_min
    semiring (mul = min(edge w, incoming bottleneck), add = max)
    driving the same fused SpMV+update loop as Bellman-Ford SSSP.
    Integer edge weights make every value integer-exact; the root
    carries the finite sentinel ``inf`` (SQL-representable, unlike
    np.inf). Unreached vertices stay -inf."""
    import ray

    b = engine.map_chunks_i(partial(_bneck_seed, root=root, inf=inf))
    for _ in range(iters):
        b, ch = engine.spmv_apply_refs(b, "max_min", _bneck_update_f, 2, b)
        n_impr = sum(ray.get(ch))
        if trace is not None and n_impr:
            trace.append(int(n_impr))
        if not n_impr:
            break  # fixpoint (exact)
    return engine.unchunk(b)


# ---------------------------------------------------------------------------
# Minimum spanning forest (distributed Boruvka)
# ---------------------------------------------------------------------------


def boruvka_msf(edges_ds, n: int, max_rounds: int = 40):
    """Minimum spanning forest by synchronous Boruvka over the
    edge Dataset: each round every component picks its minimum
    incident cross edge under the TOTAL order (w, u, v) — the
    lexicographic tie-break makes edge weights distinct, so the MSF is
    unique and equals Kruskal's under the same order (pytest gate).
    Per round: one streaming pass over the edges (component lookup via
    a broadcast label vector + per-batch per-component min partials),
    one component-keyed min reduce, then driver-side hooking
    (parent = other component, 2-cycles break to the smaller id) and
    pointer-jumping to roots. The component vector is a driver-resident
    FullyDistVec analog (same discipline as `scc`); edges never
    materialize on the driver — only <=#components candidate rows per
    round. Rounds halve the component count, so max_rounds = 40 covers
    n < 2^40.

    ``edges_ds``: (src, dst, w) with BOTH directions present (sym view);
    returns (msf_table(u, v, w), comp) — u < v, comp = final forest
    labels."""
    import ray

    from ..core.shuffle import group_apply_tasks

    comp = np.arange(n, dtype=np.int64)
    chosen_u, chosen_v, chosen_w = [], [], []

    _empty = pa.table({"c": pa.array([], type=pa.int64()),
                       "w": pa.array([], type=pa.float64()),
                       "u": pa.array([], type=pa.int64()),
                       "v": pa.array([], type=pa.int64())})

    def _first_per_c(c, w, u, v):
        order = np.lexsort((v, u, w, c))
        c, w, u, v = c[order], w[order], u[order], v[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        return c[first], w[first], u[first], v[first]

    for _ in range(max_rounds):
        comp_ref = ray.put(comp)

        def _minedge(t: pa.Table, *, _ref=comp_ref) -> pa.Table:
            if t.num_rows == 0 or "src" not in t.column_names:
                return _empty
            cm = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            s = np.asarray(t.column("src"), dtype=np.int64)
            d = np.asarray(t.column("dst"), dtype=np.int64)
            w = np.asarray(t.column("w"), dtype=np.float64)
            # canonical u < v so both directions of an edge agree
            u = np.minimum(s, d)
            v = np.maximum(s, d)
            cs, cd = cm[s], cm[d]
            cross = cs != cd
            if not cross.any():
                return _empty
            c, w, u, v = cs[cross], w[cross], u[cross], v[cross]
            c2, w2, u2, v2 = _first_per_c(c, w, u, v)
            return pa.table({"c": pa.array(c2), "w": pa.array(w2),
                             "u": pa.array(u2), "v": pa.array(v2)})

        def _minmerge(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "c" not in t.column_names:
                return _empty
            c2, w2, u2, v2 = _first_per_c(
                np.asarray(t.column("c"), dtype=np.int64),
                np.asarray(t.column("w"), dtype=np.float64),
                np.asarray(t.column("u"), dtype=np.int64),
                np.asarray(t.column("v"), dtype=np.int64))
            return pa.table({"c": pa.array(c2), "w": pa.array(w2),
                             "u": pa.array(u2), "v": pa.array(v2)})

        cand = group_apply_tasks(
            edges_ds.map_batches(_minedge, batch_format="pyarrow",
                                 zero_copy_batch=True),
            ["c"], _minmerge)
        tabs = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        if not tabs:
            break
        ct = pa.concat_tables(tabs)
        c = np.asarray(ct.column("c"), dtype=np.int64)
        w = np.asarray(ct.column("w"), dtype=np.float64)
        u = np.asarray(ct.column("u"), dtype=np.int64)
        v = np.asarray(ct.column("v"), dtype=np.int64)
        if len(c) == 0:
            break
        # hooking: each component points at the other endpoint's root
        parent = np.arange(n, dtype=np.int64)
        other = np.where(comp[u] == c, comp[v], comp[u])
        parent[c] = other
        # break mutual (2-cycle) hooks at the smaller id
        mutual = parent[parent[c]] == c
        keep_root = c[mutual & (c < parent[c])]
        parent[keep_root] = keep_root
        # pointer-jump to roots (log rounds, driver numpy)
        while True:
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        comp = parent[comp]
        # chosen edges: mutual picks & shared minima dedup on (u, v)
        key = np.lexsort((v, u))
        u, v, w = u[key], v[key], w[key]
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        chosen_u.append(u[new])
        chosen_v.append(v[new])
        chosen_w.append(w[new])

    uu = np.concatenate(chosen_u) if chosen_u else np.empty(0, np.int64)
    vv = np.concatenate(chosen_v) if chosen_v else np.empty(0, np.int64)
    ww = np.concatenate(chosen_w) if chosen_w else np.empty(0, np.float64)
    order = np.lexsort((vv, uu))
    msf = pa.table({"u": pa.array(uu[order]), "v": pa.array(vv[order]),
                    "w": pa.array(ww[order])})
    return msf, comp


# ---------------------------------------------------------------------------
# Iterative linear-algebra kernels (wave 72): power iteration, Sinkhorn
# balancing, Jacobi solve, normalized-adjacency feature propagation
# ---------------------------------------------------------------------------


def _w72_fill(ar, val):
    return np.full(len(ar), val, dtype=np.float64)


def _w72_sumsq(y):
    return float(np.dot(y, y))


def _w72_dot(a, b):
    return float(np.dot(a, b))


def _w72_scale(y, s):
    return y * s


def _w72_sumv(y):
    return float(y.sum())


def eigencentrality_refs(eng: SpmvEngine, arith_refs: list, iters: int):
    """Eigenvector centrality by power iteration on the structural
    symmetric adjacency: ``x_{k+1} = A x_k / ||A x_k||_2``, exactly
    ``iters`` normalized plus_times SpMVs from the uniform unit vector
    (SpMV + ``Reduce``/``Apply`` composition, ``ParFriends.h:2379`` +
    ``SpParMat.cpp:888``). Refs-only: the driver syncs ONE scalar (the
    squared norm) per iteration; vertex state stays chunked.

    Returns ``(x_refs, rayleigh)`` — the final unit vector and its
    Rayleigh quotient ``x^T A x`` (the lambda_1 estimate). An edgeless
    graph short-circuits at the uniform vector with rayleigh 0 (the
    SQL twin's norm-0 branch mirrors this fixed point)."""
    import math

    x = eng.map_chunks(partial(_w72_fill, val=1.0 / math.sqrt(eng.n)),
                       arith_refs)
    for _ in range(iters):
        y = eng.spmv_refs(x, "plus_times")
        nrm = math.sqrt(math.fsum(eng.chunk_scalars(_w72_sumsq, y)))
        if nrm == 0.0:
            return x, 0.0
        x = eng.map_chunks(partial(_w72_scale, s=1.0 / nrm), y)
    y = eng.spmv_refs(x, "plus_times")
    lam = math.fsum(eng.chunk_scalars(_w72_dot, x, y))
    return x, lam


def _w72_recip0(t):
    out = np.zeros_like(t)
    np.divide(1.0, t, out=out, where=t > 0)
    return out


def sinkhorn_refs(eng: SpmvEngine, arith_refs: list, iters: int):
    """Sinkhorn-Knopp doubly-stochastic balancing of the structural
    symmetric adjacency: alternating scaling vectors ``r = 1 / (A c)``,
    ``c = 1 / (A r)`` for exactly ``iters`` rounds from ``c = 1``
    (isolated vertices scale to 0). The TWO-SIDED generalization of
    ``MakeColStochastic``'s one-sided ``DimApply`` (``MCL.cpp:391``,
    ``SpParMat.cpp:171-206``): each half-round is one plus_times SpMV
    + an elementwise reciprocal, refs-only end-to-end.

    Returns ``(r_refs, c_refs)``; the balanced matrix is
    ``diag(r) A diag(c)`` (never materialized here)."""
    c = eng.map_chunks(partial(_w72_fill, val=1.0), arith_refs)
    r = c
    for _ in range(iters):
        r = eng.map_chunks(_w72_recip0, eng.spmv_refs(c, "plus_times"))
        c = eng.map_chunks(_w72_recip0, eng.spmv_refs(r, "plus_times"))
    return r, c


def _w72_jacobi_step(b, deg, y):
    return (b + y) / (deg + 1.0)


def _w72_resid_inf(b, deg, x, y):
    if not len(x):
        return 0.0
    return float(np.max(np.abs((deg + 1.0) * x - y - b)))


def jacobi_laplacian_refs(eng: SpmvEngine, b_refs: list, iters: int):
    """Jacobi iteration for the regularized Laplacian system
    ``(L + I) x = b`` with ``L = D - A`` over the structural symmetric
    adjacency: ``x_{k+1} = (b + A x_k) / (deg + 1)`` from ``x_0 = 0``,
    exactly ``iters`` rounds (diagonal preconditioning = the
    ``DimApply`` pattern fused into the SpMV step). Refs-only.

    Returns ``(x_refs, resid_inf)`` where ``resid_inf`` is
    ``||(L + I) x - b||_inf`` after the final round — the convergence
    certificate a solver user would log per checkpoint."""
    ones = eng.map_chunks(partial(_w72_fill, val=1.0), b_refs)
    deg = eng.spmv_refs(ones, "plus_times")
    x = eng.map_chunks(partial(_w72_fill, val=0.0), b_refs)
    for _ in range(iters):
        y = eng.spmv_refs(x, "plus_times")
        x = eng.map_chunks(_w72_jacobi_step, b_refs, deg, y)
    y = eng.spmv_refs(x, "plus_times")
    resid = max(eng.chunk_scalars(_w72_resid_inf, b_refs, deg, x, y))
    return x, resid


def _jm_binit(bounds, seeds_s, seeds_t):
    """(k, chunk) RHS init for pairwise solves: B[p] = e_{s_p} - e_{t_p}
    restricted to this chunk's vertex range."""
    c0, c1 = bounds
    B = np.zeros((len(seeds_s), c1 - c0))
    for arr, val in ((seeds_s, 1.0), (seeds_t, -1.0)):
        sel = (arr >= c0) & (arr < c1)
        B[np.nonzero(sel)[0], arr[sel] - c0] += val
    return B


def _jm_zeros(B):
    return np.zeros_like(B)


def _jm_step(B, deg, Y, bounds):
    # batched Jacobi round: X <- (B + A X) / (deg + 1), row-broadcast
    return (B + Y) / (deg + 1.0)


def _jm_rowdot(A, B):
    return (A * B).sum(axis=1)


def jacobi_multi_refs(eng: SpmvEngine, seeds_s: np.ndarray,
                      seeds_t: np.ndarray, iters: int):
    """BATCHED Jacobi solves of the regularized Laplacian systems
    ``(L + I) X = B`` with one RHS per seed pair, ``B[p] = e_{s_p} -
    e_{t_p}`` — the effective-resistance proxy kernel. All k solves ride
    ONE fused tall-skinny SpMM per round (`spmm_apply_refs`, the
    BetwCent batching of ``BetwCent.cpp:179-187``); the (k, n) solution
    state stays chunked in the object store end-to-end.

    Returns ``(B_refs, X_refs)``; callers reduce r_p = B[p] . X[p]
    (= x_{s_p} - x_{t_p}, the regularized pairwise resistance) via
    bounded per-chunk row-dot partials."""
    seeds_s = np.asarray(seeds_s, dtype=np.int64)
    seeds_t = np.asarray(seeds_t, dtype=np.int64)
    k = len(seeds_s)
    B = eng.map_chunks_n(
        partial(_jm_binit, seeds_s=seeds_s, seeds_t=seeds_t), 1,
        with_bounds=True)[0]
    deg = eng.in_weights_refs()
    X = eng.map_chunks(_jm_zeros, B)
    for _ in range(iters):
        X = eng.spmm_apply_refs(X, k, "plus_times", _jm_step, 1,
                                B, deg)[0]
    return B, X


def _w72_inv_sqrt1(deg):
    return 1.0 / np.sqrt(deg + 1.0)


def _w72_gcn_h0(ar, f):
    out = np.zeros((f, len(ar)), dtype=np.float64)
    if len(ar):
        out[np.asarray(ar, dtype=np.int64) % f,
            np.arange(len(ar))] = 1.0
    return out


def _w72_colscale(H, s):
    return H * s


def _w72_prop_combine(U, s, Y, bounds):
    # A-hat H for this row chunk: Y = A U arrived combined; add the
    # self-loop term U and rescale by s = 1/sqrt(deg+1). Bare-array
    # return (nout=1 `spmm_apply_refs` convention).
    return (Y + U) * s


def _w72_mat_act(H, W, relu):
    out = W.T @ H
    if relu:
        np.maximum(out, 0.0, out=out)
    return out


def gcn_prop_refs(eng: SpmvEngine, arith_refs: list,
                  w1: np.ndarray, w2: np.ndarray) -> list:
    """Two-layer GCN-style feature propagation
    ``H = A_hat relu(A_hat X W1) W2`` with the Kipf-Welling normalized
    self-looped adjacency ``A_hat = D^{-1/2} (A + I) D^{-1/2}``
    (D = deg + 1), X the deterministic one-hot ``arith % f`` feature
    block. Each propagation is ONE fused tall-skinny SpMM round
    (`spmm_apply_refs`, the BetwCent batching of ``BetwCent.cpp:
    179-187``); the self-loop add + both D^{-1/2} scalings ride the
    combine task, and the dense (f x f) weight multiply + activation is
    a per-chunk kernel — the message-passing step of a training-data
    featurization pipeline, refs-only end-to-end.

    Returns the final (w2.shape[1], chunk) state refs."""
    f = int(w1.shape[0])
    ones = eng.map_chunks(partial(_w72_fill, val=1.0), arith_refs)
    deg = eng.spmv_refs(ones, "plus_times")
    s = eng.map_chunks(_w72_inv_sqrt1, deg)
    H = eng.map_chunks(partial(_w72_gcn_h0, f=f), arith_refs)
    for W, relu in ((w1, True), (w2, False)):
        U = eng.map_chunks(_w72_colscale, H, s)
        P = eng.spmm_apply_refs(U, int(W.shape[0]), "plus_times",
                                _w72_prop_combine, 1, U, s)[0]
        H = eng.map_chunks(partial(_w72_mat_act, W=W, relu=relu), P)
    return H


# ---------------------------------------------------------------------------
# Wave 73: Chebyshev spectral filter + conjugate gradient (fixed rounds)
# ---------------------------------------------------------------------------


def _w73_lt(deg, v, av, lmax):
    # scaled-Laplacian apply: Lt v = (2/lmax) (deg*v - A v) - v
    return (2.0 / lmax) * (deg * v - av) - v


def _w73_max(d):
    return float(d.max()) if len(d) else 0.0


def _w73_cheb3(tp, tpp, lt_tp):
    # 3-term recurrence: T_j = 2 Lt T_{j-1} - T_{j-2}
    return 2.0 * lt_tp - tpp


def _w73_axpy(y, x, a):
    return y + a * x


def chebyshev_filter_refs(eng: SpmvEngine, b_refs: list, order: int):
    """Chebyshev polynomial filter y = sum_{j=0..order} theta_j T_j(Lt) b
    with theta_j = 1/(j+1), over the scaled Laplacian
    ``Lt = 2 L / lmax - I`` (L = D - A, deterministic spectral bound
    ``lmax = 2 (max_deg + 1)`` so both twins scale identically). The
    classic 3-term recurrence — each step is ONE plus_times SpMV plus
    fused chunk kernels (the GraphBLAS spectral-filter idiom; SpMV
    ``ParFriends.h:2379``). Refs-only; the driver holds only the lmax
    scalar. Returns y chunk refs."""
    ones = eng.map_chunks(partial(_w72_fill, val=1.0), b_refs)
    deg = eng.spmv_refs(ones, "plus_times")
    lmax = 2.0 * (max(eng.chunk_scalars(_w73_max, deg)) + 1.0)

    def lt(v_refs):
        av = eng.spmv_refs(v_refs, "plus_times")
        return eng.map_chunks(partial(_w73_lt, lmax=lmax), deg, v_refs, av)

    t_pp = b_refs                      # T_0
    t_p = lt(b_refs)                   # T_1
    y = eng.map_chunks(partial(_w73_axpy, a=1.0 / 2.0), t_pp, t_p)
    for j in range(2, order + 1):
        t_j = eng.map_chunks(_w73_cheb3, t_p, t_pp, lt(t_p))
        y = eng.map_chunks(partial(_w73_axpy, a=1.0 / (j + 1.0)), y, t_j)
        t_pp, t_p = t_p, t_j
    return y


def _w73_cg_q(deg, p, ap):
    # (L + I) p = (deg + 1) p - A p
    return (deg + 1.0) * p - ap


def _w73_saxpy(x, p, a):
    return x + a * p


def conjgrad_refs(eng: SpmvEngine, b_refs: list, iters: int):
    """Conjugate gradient on the SPD system ``(L + I) x = b``, exactly
    ``iters`` rounds from x0 = 0 (r0 = p0 = b). Every alpha/beta is
    GUARDED (0 when its denominator is non-positive) so the fixed
    unroll is total — the SQL twin carries the same CASE guards, and
    on an exactly-converged system both sides idle identically. One
    plus_times SpMV + two driver scalars (p^T q, r^T r) per round;
    vertex state stays chunked. Returns ``(x_refs, resid2)`` with
    ``resid2 = ||r||_2`` after the final round."""
    import math

    ones = eng.map_chunks(partial(_w72_fill, val=1.0), b_refs)
    deg = eng.spmv_refs(ones, "plus_times")
    x = eng.map_chunks(partial(_w72_fill, val=0.0), b_refs)
    r = b_refs
    p = b_refs
    rr = math.fsum(eng.chunk_scalars(_w72_dot, r, r))
    for _ in range(iters):
        ap = eng.spmv_refs(p, "plus_times")
        q = eng.map_chunks(_w73_cg_q, deg, p, ap)
        pq = math.fsum(eng.chunk_scalars(_w72_dot, p, q))
        alpha = rr / pq if pq > 0 else 0.0
        x = eng.map_chunks(partial(_w73_saxpy, a=alpha), x, p)
        r = eng.map_chunks(partial(_w73_saxpy, a=-alpha), r, q)
        rr_new = math.fsum(eng.chunk_scalars(_w72_dot, r, r))
        beta = rr_new / rr if rr > 0 else 0.0
        p = eng.map_chunks(partial(_w73_saxpy, a=beta), r, p)
        rr = rr_new
    return x, math.sqrt(max(rr, 0.0))


# ---------------------------------------------------------------------------
# Wave 74: SALSA authority walk + deflated power iteration (lambda_2)
# ---------------------------------------------------------------------------


def _w74_mul(a, b):
    return a * b


def salsa_refs(eng_fwd: SpmvEngine, eng_rev: SpmvEngine,
               arith_refs: list, iters: int):
    """SALSA authority scores, exactly ``iters`` un-teleported rounds of
    the alternating backward/forward stochastic walk on the STRUCTURAL
    directed graph: ``h = D_out^{-1} A a`` then ``a' = D_in^{-1} A^T h``
    (Lempel-Moran; the authority chain ``D_in^{-1} A^T D_out^{-1} A`` is
    row-stochastic on the reachable set, so scores stay O(1) without
    normalization). Two plus_times SpMVs + two reciprocal-scale chunk
    kernels per round, refs-only; vertices with no in-edges stay 0
    after round 1 (both twins share the guarded reciprocal).

    Engine convention matches `hits_fixed`: ``eng_fwd`` pushes src->dst
    (y[dst] = sum over in-neighbors), ``eng_rev`` is the transpose.
    Returns the authority chunk refs."""
    if eng_fwd.n != eng_rev.n or eng_fwd.g != eng_rev.g:
        raise ValueError("salsa_refs: engines must share (n, g)")
    ones = eng_fwd.map_chunks(partial(_w72_fill, val=1.0), arith_refs)
    din = eng_fwd.spmv_refs(ones, "plus_times")
    dout = eng_rev.spmv_refs(ones, "plus_times")
    rdin = eng_fwd.map_chunks(_w72_recip0, din)
    rdout = eng_fwd.map_chunks(_w72_recip0, dout)
    a = ones
    for _ in range(iters):
        h = eng_fwd.map_chunks(_w74_mul, rdout,
                               eng_rev.spmv_refs(a, "plus_times"))
        a = eng_fwd.map_chunks(_w74_mul, rdin,
                               eng_fwd.spmv_refs(h, "plus_times"))
    return a


def _w74_deflate(x1, y, lam_xv):
    # y - lam1 (x1 . v) x1 with the (x1 . v) scalar folded in by the driver
    return y - lam_xv * x1


def _w74_orth(w, x1, c):
    return w - c * x1


def fiedler_vector_refs(eng: SpmvEngine, arith_refs: list, b_refs: list,
                        iters: int):
    """Wielandt-deflated power iteration over the structural symmetric
    adjacency, returning the deflated VECTOR as well as the spectral
    estimates: first run `eigencentrality_refs` for (x1, lambda1), then
    iterate ``v <- normalize(A v - lambda1 (x1 . v) x1)`` from the
    deterministic start ``v0 = normalize(b - (x1 . b_hat) x1)`` (b = the
    arith-derived vector, unit-normalized first). Exactly ``iters``
    deflated rounds; the driver syncs two scalars per round. Returns
    ``(v_refs, rayleigh2, lambda1)`` — the chunked deflated vector (the
    spectral-bisection side indicator reads off its sign) plus the
    deflated Rayleigh quotient and the first eigenvalue."""
    import math

    x1, lam1 = eigencentrality_refs(eng, arith_refs, iters)
    bb = math.sqrt(math.fsum(eng.chunk_scalars(_w72_sumsq, b_refs)))
    w = eng.map_chunks(partial(_w72_scale, s=1.0 / bb if bb else 0.0),
                       b_refs)
    c = math.fsum(eng.chunk_scalars(_w72_dot, x1, w))
    v = eng.map_chunks(partial(_w74_orth, c=c), w, x1)
    nv = math.sqrt(math.fsum(eng.chunk_scalars(_w72_sumsq, v)))
    if nv == 0.0:
        return v, 0.0, lam1
    v = eng.map_chunks(partial(_w72_scale, s=1.0 / nv), v)
    for _ in range(iters):
        y = eng.spmv_refs(v, "plus_times")
        xv = math.fsum(eng.chunk_scalars(_w72_dot, x1, v))
        y = eng.map_chunks(partial(_w74_deflate, lam_xv=lam1 * xv),
                           x1, y)
        ny = math.sqrt(math.fsum(eng.chunk_scalars(_w72_sumsq, y)))
        if ny == 0.0:
            return y, 0.0, lam1
        v = eng.map_chunks(partial(_w72_scale, s=1.0 / ny), y)
    y = eng.spmv_refs(v, "plus_times")
    lam2 = math.fsum(eng.chunk_scalars(_w72_dot, v, y))
    return v, lam2, lam1


def lambda2_refs(eng: SpmvEngine, arith_refs: list, b_refs: list,
                 iters: int):
    """Second-eigenvalue estimate (scalars-only wrapper of
    `fiedler_vector_refs`): returns ``(rayleigh2, lambda1)``."""
    _, lam2, lam1 = fiedler_vector_refs(eng, arith_refs, b_refs, iters)
    return lam2, lam1


def power_rayleigh_trace_refs(eng: SpmvEngine, arith_refs: list,
                              iters: int):
    """Per-iteration Rayleigh-quotient trace of the power iteration —
    the convergence-curve diagnostic a spectral job logs per round.
    Identical recurrence to `eigencentrality_refs` plus ONE extra dot
    per round: after normalizing x_k, r_k = x_k^T (A x_k) where A x_k
    is the NEXT round's un-normalized vector, so the trace costs no
    additional SpMVs beyond the final one. Returns the list of
    ``iters`` Rayleigh values (driver floats)."""
    import math

    x = eng.map_chunks(partial(_w72_fill, val=1.0 / math.sqrt(eng.n)),
                       arith_refs)
    out = []
    y = eng.spmv_refs(x, "plus_times")
    for _ in range(iters):
        out.append(math.fsum(eng.chunk_scalars(_w72_dot, x, y)))
        nrm = math.sqrt(math.fsum(eng.chunk_scalars(_w72_sumsq, y)))
        if nrm == 0.0:
            out.extend([0.0] * (iters - len(out)))
            return out
        x = eng.map_chunks(partial(_w72_scale, s=1.0 / nrm), y)
        y = eng.spmv_refs(x, "plus_times")
    return out
