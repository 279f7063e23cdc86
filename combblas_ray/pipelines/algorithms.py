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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.engine import SpmvEngine


# --------------------------------------------------------------------------
# connected components
# --------------------------------------------------------------------------


def cc_fixed(engine: SpmvEngine, iters: int) -> np.ndarray:
    """`iters` synchronous rounds of l' = min(l, min over neighbors l[u])
    on the symmetrized engine. Returns dense-id component labels."""
    n = engine.n
    l = np.arange(n, dtype=np.float64)
    for _ in range(iters):
        nl = engine.spmv(l, "select2nd_min")
        l = np.minimum(l, nl)
    return l.astype(np.int64)


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
    snapshotted every ``ckpt_every`` rounds and restored on rerun."""
    n = engine.n
    l = np.arange(n, dtype=np.float64)
    start = 0
    if ckpt_dir and resume:
        from ..state.checkpoint import load_latest

        start, chunks = load_latest(ckpt_dir, "cc")
        if chunks is not None:
            l = engine.unchunk(chunks)
    for k in range(start + 1, max_iters + 1):
        nl = engine.spmv(l, "select2nd_min")
        l2 = np.minimum(l, nl)
        # Shortcut: parent = parent(parent) until stable (CC.h:1321-1341)
        idx = l2.astype(np.int64)
        while True:
            jumped = l2[idx].astype(np.int64)
            if np.array_equal(jumped, idx):
                break
            idx = jumped
        l2 = idx.astype(np.float64)
        if ckpt_dir and k % ckpt_every == 0:
            from ..state.checkpoint import save_state

            save_state(ckpt_dir, "cc", k, engine.chunk(l2))
        if np.array_equal(l2, l):
            return l2.astype(np.int64), k
        l = l2
    return l.astype(np.int64), max_iters


# --------------------------------------------------------------------------
# BFS / SSSP (min-plus relaxations, dense vector form)
# --------------------------------------------------------------------------


def min_plus_distances(
    engine: SpmvEngine, root: int, iters: int | None = None, max_iters: int = 10_000
) -> np.ndarray:
    """d' = min(d, min over in-edges (w(u,v) + d[u])); fixed `iters` rounds
    (oracle mode) or until fixpoint. Unreached = +inf."""
    n = engine.n
    d = np.full(n, np.inf)
    d[root] = 0.0
    total = iters if iters is not None else max_iters
    for _ in range(total):
        nd = engine.spmv(d, "min_plus")
        nd = np.minimum(d, nd)
        if iters is None and np.array_equal(
            np.nan_to_num(nd, posinf=-1), np.nan_to_num(d, posinf=-1)
        ):
            return nd
        d = nd
    return d


def fastsv(engine: SpmvEngine, max_iters: int = 200) -> tuple[np.ndarray, int]:
    """FastSV connected components (``FastSV.h:335-374``), with the
    reference's primitive structure mapped to distributed ops:
    - mngp = SpMV-min of grandparents          (Select2ndMinSR SpMV)
    - stochastic hooking: f[f[u]] = min(mngp)  (`Assign` scatter-min)
    - aggressive hooking: f[u] = min(f[u], mngp)
    - shortcutting: f = f[f]                   (`Extract` distributed gather)
    Converges when no grandparent changes. Returns (labels, iters)."""
    n = engine.n
    f = np.arange(n, dtype=np.float64)  # parent
    gp = f.copy()  # grandparent
    for it in range(1, max_iters + 1):
        mngp = engine.spmv(gp, "select2nd_min")  # min neighbor grandparent
        mngp = np.minimum(mngp, gp)
        # stochastic hooking: scatter-min onto parents' slots
        hook = engine.scatter_reduce(
            f.astype(np.int64), mngp, "select2nd_min"
        )
        f = np.minimum(f, hook)
        # aggressive hooking onto own slot
        f = np.minimum(f, mngp)
        # shortcutting: f = f[f] (distributed gather)
        f = engine.gather(f, f.astype(np.int64))
        new_gp = engine.gather(f, f.astype(np.int64))
        if np.array_equal(new_gp, gp):
            return f.astype(np.int64), it
        gp = new_gp
    return f.astype(np.int64), max_iters


def bfs_parents(engine: SpmvEngine, root: int, max_iters: int = 10_000):
    """Frontier-driven top-down BFS producing the parent tree — the actual
    reference loop (``TopDownBFS.cpp:440-449``): per level,
    ``fringe = SpMSpV(A, fringe)`` with the min-parent-id semiring,
    ``fringe = EWiseMult(fringe, parents, exclude=true)`` (drop visited),
    ``parents.Set(fringe)``. Parent tie-break: smallest dense id among
    previous-level neighbors. Returns (parents, dist); parents[root]=root,
    unreached = -1."""
    n = engine.n
    parents = np.full(n, -1, dtype=np.int64)
    dist = np.full(n, -1, dtype=np.int64)
    parents[root] = root
    dist[root] = 0
    frontier = np.array([root], dtype=np.int64)
    level = 0
    while len(frontier) and level < max_iters:
        level += 1
        if len(frontier) * 50 < n:
            # top-down: sparse frontier SpMSpV
            cand_idx, cand_parent = engine.spmspv(
                frontier, frontier.astype(np.float64), "select2nd_min"
            )
        else:
            # bottom-up analog (`DirOptBFS.cpp` switch): dense SpMV over
            # the frontier indicator; x = frontier vertex ids
            x = np.full(n, np.inf)
            x[frontier] = frontier.astype(np.float64)
            res = engine.spmv(x, "select2nd_min")
            cand_idx = np.nonzero(np.isfinite(res))[0]
            cand_parent = res[cand_idx]
        unvisited = parents[cand_idx] == -1  # EWiseMult exclude=true
        frontier = cand_idx[unvisited]
        parents[frontier] = cand_parent[unvisited].astype(np.int64)
        dist[frontier] = level
    return parents, dist


def bfs_distances_auto(engine: SpmvEngine, root: int) -> np.ndarray:
    """BFS distances with the sparse/dense plan switch: when the frontier
    is below n/50 use SpMSpV, else dense min-plus SpMV — the reference's
    density-threshold switch (``CC.h:1256``, ``FastSV.h:346``)."""
    n = engine.n
    d = np.full(n, np.inf)
    d[root] = 0.0
    frontier = np.array([root], dtype=np.int64)
    level = 0
    while len(frontier):
        level += 1
        if len(frontier) * 50 < n:
            # SpMSpV: val = w + x = 1 + (level-1) = level for structural w=1
            idx, vals = engine.spmspv(
                frontier, np.full(len(frontier), level - 1.0), "min_plus"
            )
            newly = idx[vals < d[idx]]
            d[newly] = level
            frontier = newly
        else:
            nd = np.minimum(d, engine.spmv(d, "min_plus"))
            newly = np.nonzero(nd < d)[0]
            d = nd
            frontier = newly
    return d


def luby_mis(engine: SpmvEngine, seed: int = 5) -> np.ndarray:
    """Luby's maximal independent set over the symmetrized engine
    (`FilteredMIS.cpp` workload family): deterministic per-vertex
    priorities; iterate: v joins MIS if its priority beats every active
    neighbor's; neighbors of MIS vertices deactivate."""
    n = engine.n
    rng = np.random.RandomState(seed)
    prio = rng.permutation(n).astype(np.float64)
    active = np.ones(n, dtype=bool)
    in_mis = np.zeros(n, dtype=bool)
    while active.any():
        # min active-neighbor priority via SpMV over select2nd_min
        x = np.where(active, prio, np.inf)
        nb_min = engine.spmv(x, "select2nd_min")
        winners = active & (prio < nb_min)
        if not winners.any():
            # isolated actives (no neighbors): nb_min = inf -> winners;
            # only reachable if priorities tie, which permutation prevents
            break
        in_mis[winners] = True
        # deactivate winners and their neighbors
        win_ind = np.zeros(n)
        win_ind[winners] = 1.0
        nb_win = engine.spmv(win_ind, "plus_times") > 0
        active &= ~(winners | nb_win)
    return in_mis


def rcm_ordering(engine: SpmvEngine) -> np.ndarray:
    """Reverse Cuthill-McKee ordering, level-synchronous relaxation (the
    shape distributed RCM implementations use — reference app
    `Applications/Ordering/RCM.cpp`): per connected component, BFS from
    the min-degree vertex, order vertices by (component, BFS level,
    degree, id), then reverse. Returns perm where perm[old] = new index.
    """
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
    # one multi-source BFS (components are disjoint)
    d = np.full(n, np.inf)
    d[roots] = 0.0
    while True:
        nd = np.minimum(d, engine.spmv(d, "min_plus"))
        if np.array_equal(np.nan_to_num(nd, posinf=-1), np.nan_to_num(d, posinf=-1)):
            break
        d = nd
    level = np.where(np.isfinite(d), d, n).astype(np.int64)
    cm = np.lexsort((np.arange(n), deg, level, comp))
    rcm = cm[::-1]
    perm = np.empty(n, dtype=np.int64)
    perm[rcm] = np.arange(n)
    return perm


def maximal_matching(engine: SpmvEngine, seed: int = 9) -> np.ndarray:
    """Maximal matching via local-minimum proposals (the
    `BipartiteMatchings` family's maximal-matching kernel, generalized to
    the symmetric graph): per round, every unmatched vertex whose priority
    beats all unmatched neighbors proposes to its min-priority unmatched
    neighbor; proposal targets accept their min-priority proposer. The
    global minimum always matches -> guaranteed progress. Returns partner
    ids (-1 = unmatched)."""
    n = engine.n
    rng = np.random.RandomState(seed)
    prio = rng.permutation(n).astype(np.float64)
    match = np.full(n, -1, dtype=np.int64)
    while True:
        unmatched = match == -1
        # encode (priority, id) as one comparable float: prio*n + id
        x = np.where(unmatched, prio * n + np.arange(n), np.inf)
        nb = engine.spmv(x, "select2nd_min")  # min unmatched neighbor code
        has_nb = np.isfinite(nb)
        if not (unmatched & has_nb).any():
            break  # no unmatched vertex has an unmatched neighbor: maximal
        nb_prio = np.floor_divide(nb, n, where=has_nb, out=np.full(n, np.inf))
        local_min = unmatched & has_nb & (prio < nb_prio)
        proposers = np.nonzero(local_min)[0]
        partners = (nb[proposers] % n).astype(np.int64)
        # each target accepts its min-priority proposer
        order = np.lexsort((prio[proposers], partners))
        sp, st = proposers[order], partners[order]
        first = np.ones(len(st), dtype=bool)
        first[1:] = st[1:] != st[:-1]
        acc_v, acc_p = sp[first], st[first]
        match[acc_v] = acc_p
        match[acc_p] = acc_v
    return match


# --------------------------------------------------------------------------
# label propagation (mode of neighbor classes)
# --------------------------------------------------------------------------


def label_propagation(
    engine: SpmvEngine, init: np.ndarray, num_classes: int, iters: int
) -> np.ndarray:
    """Synchronous mode-of-neighbors update; tie -> smallest class id;
    isolated vertices keep their class. Class counts are computed as one
    plus_times SpMV per class over 0/1 indicator vectors (batched SpMV =
    the SpMM pattern of BetwCent.cpp:179-187)."""
    n = engine.n
    cls = init.astype(np.int64).copy()
    classes = np.arange(num_classes)
    for _ in range(iters):
        ind = (cls[None, :] == classes[:, None]).astype(np.float64)
        counts = engine.spmm(ind, "plus_times")  # one roundtrip for all k
        total = counts.sum(axis=0)
        best = counts.argmax(axis=0)  # first max -> smallest class id
        cls = np.where(total > 0, best, cls).astype(np.int64)
    return cls


# --------------------------------------------------------------------------
# triangle counting (Dataset-native masked SpGEMM)
# --------------------------------------------------------------------------


def triangle_count(
    sym_edges_ds, n: int, method: str = "broadcast", num_partitions: int = 16
) -> int:
    """Count triangles from the structural undirected edge Dataset (both
    directions present, w=1): L = edges with src<dst; count closed wedges
    u<w<v with (u,v) in L.

    method="broadcast": L's CSR adjacency + a sorted edge-key array are put
    in the object store ONCE; each map_batches task expands its edges'
    wedges vectorized (repeat/searchsorted) and emits a partial count. This
    is the `EWiseMult(B, L)` mask fused into the multiply — no shuffle at
    all; right while L fits in worker memory (~10^9 edges).

    method="join": two distributed hash joins (the scale-out path when the
    filtered adjacency no longer fits: SUMMA-style shuffle SpGEMM).
    """
    if method == "join":
        from ..core.graph import Graph

        sym_edges_ds = Graph(n=n, edges=sym_edges_ds).dedup_sum().edges
        L = sym_edges_ds.filter(expr="src < dst").select_columns(["src", "dst"])
        paths = L.join(
            L,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("src",),
            left_suffix="_a",
            right_suffix="_b",
        )
        closed = paths.join(
            L.rename_columns({"src": "m_src", "dst": "m_dst"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src", "dst_b"),
            right_on=("m_src", "m_dst"),
        )
        return closed.count()

    import ray

    # Distinct undirected pairs (structural dedup in numpy), then orient
    # every edge from its LOWER (degree, id)-ranked endpoint — the standard
    # degree-ordering that bounds wedge counts by O(m^1.5) even with hub
    # vertices (the reference's equivalent is the lower-triangular PruneI
    # mask; id-order alone explodes on power-law hubs).
    srcs, dsts = [], []
    for t in ray.get(sym_edges_ds.to_arrow_refs()):
        srcs.append(np.asarray(t.column("src")))
        dsts.append(np.asarray(t.column("dst")))
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    keep = lo != hi
    pair = np.unique(lo[keep] * np.int64(n) + hi[keep])
    a = (pair // n).astype(np.int64)
    b = (pair % n).astype(np.int64)
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
