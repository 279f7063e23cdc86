"""Sparse matrix-matrix multiply (SpGEMM) as relational join + aggregate.

``C(i,j) = SR.add over k of SR.mul(A(i,k), B(k,j))`` — the semantics of the
reference's SUMMA kernels (`Mult_AnXBn_Synch` ``ParFriends.h:1447-1556``,
local kernel ``mtSpGEMM.h:212-460``). The SUMMA broadcast schedule is an
MPI artifact; here the inner-dimension co-location is ONE co-partitioned
warm-task hash join on k (`shuffle.hash_join_tasks`, multiply + partial
combine fused into the join task), and the (i,j) merge is one warm-task
keyed exchange (`shuffle.group_apply_tasks`).

Edge-table convention: a table row (src, dst, w) is the path src->dst, so
``compose(A, B)`` = paths A then B = matrix product B_mat @ A_mat under the
M[dst,src] convention used throughout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import group_reduce_per_key, keyed_reduce


def spgemm(A_ds, B_ds, n: int, *, add: str = "sum", num_partitions: int = 32,
           mask_ds=None, mask_anti: bool = False, partition_on: str = "pair",
           post_fn=None):
    """Compose path relations: C = {(i, j): i -k-> (A), k -j-> (B)} with
    w_C = add-combine over k of wA * wB.

    ``mask_ds`` (edge table) restricts output to (anti=False) or away from
    (anti=True) the mask's coordinate set — `EWiseMult(C, M, exclude)`
    (``ParFriends.h:2629-2647``) fused after the multiply.

    ``partition_on='src'`` hash-partitions the output merge by the SOURCE
    (column) index instead of the (i,j) pair, so every output column lands
    whole in one partition; ``post_fn`` (pa.Table -> pa.Table) then runs
    per partition with complete columns in hand — the fusion hook for
    per-column prune/select/normalize (`MCLPruneRecoverySelect` applied
    inside `MemEfficientSpGEMM`, ``ParFriends.h:452-779``).
    """
    from .shuffle import group_apply_tasks, hash_join_tasks

    A_ds = _edge_schema_guard(A_ds)
    B_ds = _edge_schema_guard(B_ds).map_batches(
        # positional rename (guarded schema IS (src, dst, w)): join key
        # gets the left's name, payload columns can't collide
        lambda b: b.rename_columns(["dst", "j_b", "w_b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def _mul(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch.column("src"))
        j = np.asarray(batch.column("j_b"))
        w = np.asarray(batch.column("w")) * np.asarray(batch.column("w_b"))
        # join-task-local partial combine before the (i,j) shuffle
        uk, red = group_reduce_per_key(w, i * np.int64(n) + j, "sum" if add == "sum" else add)
        return pa.table({"key": pa.array(uk), "w": pa.array(red)})

    # warm-task co-partitioned join on the contraction index k, with the
    # multiply + partial combine fused into the join task
    partial = hash_join_tasks(A_ds, B_ds, on="dst",
                              num_partitions=num_partitions, post=_mul)

    def _merge(batch: pa.Table) -> pa.Table:
        uk, red = group_reduce_per_key(
            np.asarray(batch.column("w")), np.asarray(batch.column("key")),
            "sum" if add == "sum" else add,
        )
        out_t = pa.table(
            {
                "src": pa.array((uk // n).astype(np.int64)),
                "dst": pa.array((uk % n).astype(np.int64)),
                "w": pa.array(red),
            }
        )
        if post_fn is not None:
            out_t = post_fn(out_t)
        return out_t

    if partition_on == "src":
        def _add_pcol(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "pcol", pa.array(np.asarray(batch.column("key")) // n)
            )

        partial = partial.map_batches(_add_pcol, batch_format="pyarrow",
                                      zero_copy_batch=True)
        out = group_apply_tasks(partial, ["pcol"], _merge,
                                num_partitions=num_partitions)
    else:
        out = group_apply_tasks(partial, ["key"], _merge,
                                num_partitions=num_partitions)
    if mask_ds is not None:
        out = coordinate_mask(out, mask_ds, n, anti=mask_anti,
                              num_partitions=num_partitions)
    return out


_EDGE_EMPTY = pa.table(
    {
        "src": pa.array([], type=pa.int64()),
        "dst": pa.array([], type=pa.int64()),
        "w": pa.array([], type=pa.float64()),
    }
)


def _edge_schema_guard(ds):
    """Hash-shuffle operators can emit EMPTY blocks with an empty schema;
    Arrow joins then fail with 'No match for key field'. Normalize every
    block to the (src, dst, w) schema (no-op for valid blocks)."""

    def _g(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return _EDGE_EMPTY
        return batch.select(["src", "dst", "w"])

    return ds.map_batches(_g, batch_format="pyarrow", zero_copy_batch=True)


_FIB = np.uint64(11400714819323198485)


def _sg_part(x: np.ndarray, g: int) -> np.ndarray:
    return ((x.astype(np.uint64) * _FIB) >> np.uint64(33)).astype(np.int64) % g


def _sg_route_inner(tbl, g: int, roles: str):
    """Route one edge block by the inner dimension k: role 'A' keys on
    dst, role 'B' on src, 'AB' emits both (num_returns = g or 2g)."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        # empty shuffle partitions may carry an empty schema
        src = dst = np.empty(0, dtype=np.int64)
        w = np.empty(0, dtype=np.float64)
    else:
        src = np.asarray(tbl.column("src"))
        dst = np.asarray(tbl.column("dst"))
        w = np.asarray(tbl.column("w"), dtype=np.float64)
    outs = []
    if "A" in roles:
        p = _sg_part(dst, g)
        outs.extend((src[p == i], dst[p == i], w[p == i]) for i in range(g))
    if "B" in roles:
        p = _sg_part(src, g)
        outs.extend((src[p == i], dst[p == i], w[p == i]) for i in range(g))
    return outs[0] if len(outs) == 1 else tuple(outs)


def _sg_local_mul(g: int, n: int, add: str, by_col: bool, nA: int, *parts):
    """Per inner-k partition: CSR-expand B's rows over A's entries with
    matching k (the local SpGEMM kernel, ``mtSpGEMM.h:212-460``),
    partial-combine by output key, route by output column (by_col) or
    key hash (num_returns = g)."""
    A = parts[:nA]
    B = parts[nA:]
    ai = np.concatenate([p[0] for p in A]) if A else np.empty(0, np.int64)
    ak = np.concatenate([p[1] for p in A]) if A else np.empty(0, np.int64)
    aw = np.concatenate([p[2] for p in A]) if A else np.empty(0, np.float64)
    bk = np.concatenate([p[0] for p in B]) if B else np.empty(0, np.int64)
    bj = np.concatenate([p[1] for p in B]) if B else np.empty(0, np.int64)
    bw = np.concatenate([p[2] for p in B]) if B else np.empty(0, np.float64)
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    if not len(ai) or not len(bk):
        out = [empty for _ in range(g)]
        return out[0] if g == 1 else tuple(out)
    order = np.argsort(bk, kind="stable")
    bk, bj, bw = bk[order], bj[order], bw[order]
    uk, starts = np.unique(bk, return_index=True)
    lens_all = np.append(starts[1:], len(bk)) - starts
    pos = np.minimum(np.searchsorted(uk, ak), len(uk) - 1)
    valid = uk[pos] == ak
    s = starts[pos[valid]]
    lens = lens_all[pos[valid]]
    total = int(lens.sum())
    if total == 0:
        out = [empty for _ in range(g)]
        return out[0] if g == 1 else tuple(out)
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    idx = np.repeat(s, lens) + (np.arange(total) - np.repeat(offs, lens))
    i = np.repeat(ai[valid], lens)
    j = bj[idx]
    w = np.repeat(aw[valid], lens) * bw[idx]
    key = i * np.int64(n) + j
    ukey, red = group_reduce_per_key(w, key, add)  # partition pre-combine
    p = _sg_part((ukey // n) if by_col else ukey, g)
    out = [(ukey[p == q], red[p == q]) for q in range(g)]
    return out[0] if g == 1 else tuple(out)


def _sg_merge(n: int, add: str, post_fn, *parts):
    """Per output partition: final combine + optional fused post_fn
    (whole output columns in hand when routed by column)."""
    key = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    if len(key):
        key, w = group_reduce_per_key(w, key, add)
    tbl = pa.table(
        {
            "src": pa.array((key // n).astype(np.int64)),
            "dst": pa.array((key % n).astype(np.int64)),
            "w": pa.array(w),
        }
    )
    if post_fn is not None:
        tbl = post_fn(tbl)
    return tbl


_SG_RT: dict = {}


def _sg_rt(fn):
    import ray

    if fn not in _SG_RT:
        _SG_RT[fn] = ray.remote(num_cpus=0)(fn)
    return _SG_RT[fn]


def spgemm_tasks(A_ds, B_ds, n: int, *, add: str = "sum",
                 num_partitions: int = 16, partition_on: str = "pair",
                 post_fn=None):
    """SpGEMM as TWO raw-task shuffle rounds (route by inner k ->
    local CSR-expand multiply with partition pre-combine -> route by
    output key/column -> merge + fused post_fn). Same semantics as
    ``spgemm`` but on warm ``num_cpus=0`` tasks — Ray Data's join/hash
    operators pay ~5s of actor-pool spawn per round on this box, which
    dominates iterative callers like MCL. A is B is detected and routed
    once with dual roles. Returns a Dataset."""
    import ray

    g = num_partitions
    by_col = partition_on == "src"
    same = A_ds is B_ds
    if same:
        blocks = A_ds.to_arrow_refs()
        routed = [
            _sg_rt(_sg_route_inner).options(num_returns=2 * g).remote(b, g, "AB")
            for b in blocks
        ]
        a_parts = [[r[i] for r in routed] for i in range(g)]
        b_parts = [[r[g + i] for r in routed] for i in range(g)]
    else:
        ab = A_ds.to_arrow_refs()
        bb = B_ds.to_arrow_refs()
        ra = [
            _sg_rt(_sg_route_inner).options(num_returns=g).remote(b, g, "A")
            for b in ab
        ]
        rb = [
            _sg_rt(_sg_route_inner).options(num_returns=g).remote(b, g, "B")
            for b in bb
        ]
        ra = [[r] if g == 1 else list(r) for r in ra]
        rb = [[r] if g == 1 else list(r) for r in rb]
        a_parts = [[r[i] for r in ra] for i in range(g)]
        b_parts = [[r[i] for r in rb] for i in range(g)]
    mul = [
        _sg_rt(_sg_local_mul).options(num_returns=g).remote(
            g, n, add, by_col, len(a_parts[i]), *a_parts[i], *b_parts[i]
        )
        for i in range(g)
    ]
    mul = [[m] if g == 1 else list(m) for m in mul]
    out_tbls = [
        _sg_rt(_sg_merge).remote(n, add, post_fn, *[mul[j][i] for j in range(g)])
        for i in range(g)
    ]
    return ray.data.from_arrow_refs(out_tbls)


def estimate_flop(A_ds, B_ds, n: int) -> float:
    """`EstimateFLOP` (``ParFriends.h:356-450``): flops = sum over k of
    nnz(A(:,k)) * nnz(B(k,:)). Inner-dimension histograms are computed as
    distributed partial bincounts (sparse (v, c) rows), merged into two
    O(n) vectors on the driver — never the edge sets themselves."""

    def _cnt(col):
        def _p(batch: pa.Table) -> pa.Table:
            c = np.bincount(np.asarray(batch.column(col)), minlength=n)
            nz = np.nonzero(c)[0]
            return pa.table({"v": pa.array(nz), "c": pa.array(c[nz])})

        return _p

    degA = np.zeros(n, dtype=np.int64)
    for r in A_ds.select_columns(["dst"]).map_batches(
        _cnt("dst"), batch_format="pyarrow"
    ).take_all():
        degA[r["v"]] += r["c"]
    degB = np.zeros(n, dtype=np.int64)
    for r in B_ds.select_columns(["src"]).map_batches(
        _cnt("src"), batch_format="pyarrow"
    ).take_all():
        degB[r["v"]] += r["c"]
    return float(np.dot(degA, degB))


def spgemm_phased(A_ds, B_ds, n: int, *, add: str = "sum",
                  num_partitions: int = 32, post_fn=None, mask_ds=None,
                  mask_anti: bool = False, partition_on: str = "pair",
                  per_process_memory: int = 2 << 30, phases: int | None = None,
                  max_phases: int = 64) -> tuple:
    """Memory-phased SpGEMM — `MemEfficientSpGEMM`
    (``ParFriends.h:452-779``): estimate the multiply's FLOP count
    (sampled column histograms, ``ParFriends.h:485-556``), split B's
    OUTPUT columns (our ``dst``) into ``phases`` hash groups so each
    phase's intermediate fits the per-process budget, run the join
    SpGEMM phase by phase with the fused ``post_fn`` (the
    `MCLPruneRecoverySelect` hook), and union the results. Output
    columns are disjoint across phases, so the union equals the
    unphased product exactly.

    Returns (C_ds, phases). ``phases`` overrides the estimator (tests /
    forced splits); the estimate is clamped to ``max_phases`` — beyond
    that the per-phase pipeline overhead dominates any memory win."""
    if phases is None:
        flops = estimate_flop(A_ds, B_ds, n)
        bytes_per_flop = 24  # key(i,j) + value + merge overhead
        budget = max(1, per_process_memory) * max(1, num_partitions)
        phases = max(1, min(max_phases,
                            int(np.ceil(flops * bytes_per_flop / budget))))
    if phases == 1:
        return (
            spgemm(A_ds, B_ds, n, add=add, num_partitions=num_partitions,
                   post_fn=post_fn, mask_ds=mask_ds, mask_anti=mask_anti,
                   partition_on=partition_on),
            1,
        )
    same = A_ds is B_ds
    B_ds = B_ds.materialize()  # scanned once per phase
    A_ds = B_ds if same else A_ds.materialize()
    outs = []
    for p in range(phases):
        def _phase(batch: pa.Table, *, _p=p, _k=phases) -> pa.Table:
            d = np.asarray(batch.column("dst"))
            return batch.filter(pa.array(d % _k == _p))

        Bp = B_ds.map_batches(_phase, batch_format="pyarrow",
                              zero_copy_batch=True)
        # materialize each phase before starting the next — the whole
        # point of phasing: only one phase's intermediate is in flight
        # at a time (ParFriends.h:569-760's per-phase loop). The raw-task
        # plan is used when its features suffice (no coordinate mask).
        if mask_ds is None:
            outs.append(
                spgemm_tasks(A_ds, Bp, n, add=add,
                             num_partitions=num_partitions,
                             partition_on=partition_on,
                             post_fn=post_fn).materialize()
            )
        else:
            outs.append(
                spgemm(A_ds, Bp, n, add=add, num_partitions=num_partitions,
                       post_fn=post_fn, mask_ds=mask_ds, mask_anti=mask_anti,
                       partition_on=partition_on).materialize()
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out, phases


def spgemm_broadcast(A_ds, B_ds, n: int, *, add: str = "sum"):
    """Plan B (broadcast join): B is small — build its CSR once, `ray.put`
    it, and compose against A inside `map_batches` with no shuffle on the
    big side except the final (i,j) merge of pre-combined partials. The
    analog of the reference's small-side/broadcast cost switches
    (`Extract` bcast test FastSV.h:221-228; SURVEY §4)."""
    import ray

    from .shuffle import group_apply_tasks, group_reduce_per_key

    rows_src, rows_dst, rows_w = [], [], []
    for t in ray.get(B_ds.to_arrow_refs()):
        if t.num_rows == 0 or "src" not in t.column_names:
            continue
        rows_src.append(np.asarray(t.column("src")))
        rows_dst.append(np.asarray(t.column("dst")))
        rows_w.append(np.asarray(t.column("w")))
    bs = np.concatenate(rows_src) if rows_src else np.empty(0, np.int64)
    bd = np.concatenate(rows_dst) if rows_dst else np.empty(0, np.int64)
    bw = np.concatenate(rows_w) if rows_w else np.empty(0, np.float64)
    order = np.argsort(bs, kind="stable")
    bs, bd, bw = bs[order], bd[order], bw[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, bs + 1, 1)
    np.cumsum(indptr, out=indptr)
    b_ref = ray.put((indptr, bd, bw))

    def _compose(batch: pa.Table, *, _ref=b_ref) -> pa.Table:
        indptr, bd, bw = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ai = np.asarray(batch.column("src"))
        ak = np.asarray(batch.column("dst"))
        aw = np.asarray(batch.column("w"))
        starts, ends = indptr[ak], indptr[ak + 1]
        lens = ends - starts
        total = int(lens.sum())
        if total == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.float64())})
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        idx = np.repeat(starts, lens) + (np.arange(total) - np.repeat(offs, lens))
        i = np.repeat(ai, lens)
        j = bd[idx]
        w = np.repeat(aw, lens) * bw[idx]
        uk, red = group_reduce_per_key(w, i * np.int64(n) + j, add)
        return pa.table({"key": pa.array(uk), "w": pa.array(red)})

    partial = A_ds.map_batches(_compose, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _merge(batch: pa.Table) -> pa.Table:
        uk, red = group_reduce_per_key(
            np.asarray(batch.column("w")), np.asarray(batch.column("key")), add
        )
        return pa.table(
            {
                "src": pa.array((uk // n).astype(np.int64)),
                "dst": pa.array((uk % n).astype(np.int64)),
                "w": pa.array(red),
            }
        )

    return group_apply_tasks(partial, ["key"], _merge)


def ewise_apply(
    A_ds,
    B_ds,
    n: int,
    fn,
    *,
    allow_a_nulls: bool = True,
    allow_b_nulls: bool = True,
    a_null: float = 0.0,
    b_null: float = 0.0,
    num_partitions: int = 16,
):
    """General coordinate-wise join of two edge tables —
    `EWiseApply(A, B, binop, allowANulls, allowBNulls, ANull, BNull)`
    (``ParFriends.h:2649-2697``): full/left/right/inner outer join on
    (src,dst) selected by the null flags, missing side filled with the
    null substitute, ``fn(wa, wb)`` vectorized numpy."""
    from .shuffle import hash_join_tasks

    how = (
        "full outer"
        if allow_a_nulls and allow_b_nulls
        else "left outer"
        if allow_b_nulls
        else "right outer"
        if allow_a_nulls
        else "inner"
    )

    def _key(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("src")) * np.int64(n) + np.asarray(
            batch.column("dst")
        )
        return pa.table({"key": pa.array(k), "w": batch.column("w")})

    ka = _edge_schema_guard(A_ds).map_batches(_key, batch_format="pyarrow",
                                              zero_copy_batch=True)
    kb = _edge_schema_guard(B_ds).map_batches(_key, batch_format="pyarrow",
                                              zero_copy_batch=True)
    # co-partitioned warm-task join: outer variants are exact because a
    # key's rows (both sides) land whole in one partition
    j = hash_join_tasks(ka, kb, on="key", num_partitions=num_partitions,
                        join_type=how, left_suffix="_a", right_suffix="_b")

    def _apply(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch.column("key"))
        # absent-side detection via Arrow null validity, NOT isnan: a
        # legitimate NaN weight must survive as NaN, only a missing join
        # side gets the a_null/b_null substitute (reference EWiseApply's
        # explicit nullity semantics, ParFriends.h:2649-2697).
        ca, cb = batch.column("w_a"), batch.column("w_b")
        miss_a = np.asarray(pc.is_null(ca))
        miss_b = np.asarray(pc.is_null(cb))
        wa = np.asarray(ca.fill_null(0.0) if ca.null_count else ca,
                        dtype=np.float64)
        wb = np.asarray(cb.fill_null(0.0) if cb.null_count else cb,
                        dtype=np.float64)
        wa = np.where(miss_a, a_null, wa)
        wb = np.where(miss_b, b_null, wb)
        return pa.table(
            {
                "src": pa.array((key // n).astype(np.int64)),
                "dst": pa.array((key % n).astype(np.int64)),
                "w": pa.array(fn(wa, wb)),
            }
        )

    return j.map_batches(_apply, batch_format="pyarrow")


def coordinate_mask(C_ds, mask_ds, n: int, *, anti: bool = False,
                    num_partitions: int = 32):
    """Keep C entries whose (src,dst) is (not, for anti) present in mask —
    `EWiseMult exclude` / `SetDifference` (``SpParMat.cpp:2815``)."""
    C_ds = _edge_schema_guard(C_ds)
    mask_ds = _edge_schema_guard(mask_ds)
    mask_keys = mask_ds.map_batches(
        lambda b: pa.table(
            {
                "key": pa.array(
                    np.asarray(b.column("src")) * np.int64(n)
                    + np.asarray(b.column("dst"))
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    keyed = C_ds.map_batches(
        lambda b: b.append_column(
            "key",
            pa.array(
                np.asarray(b.column("src")) * np.int64(n)
                + np.asarray(b.column("dst"))
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .shuffle import hash_join_tasks

    def _post(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in ("src", "dst", "w")}
        if anti:
            hit = batch.column("mhit")
            keep = pc.is_null(hit)
            return pa.table(cols).filter(keep)
        return pa.table(cols)

    return hash_join_tasks(
        keyed,
        mask_keys.map_batches(
            lambda b: b.append_column("mhit", pa.array(np.ones(b.num_rows))),
            batch_format="pyarrow",
        ),
        on="key",
        num_partitions=num_partitions,
        join_type="left outer" if anti else "inner",
        post=_post,
    )
