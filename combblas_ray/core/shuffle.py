"""Keyed shuffle / join layer.

Two tiers, same route + whole-partition-merge discipline (the
reference's ingest exchange + local merge, `SparseCommon`
``SpParMat.cpp:2906-2981`` + `RemoveDuplicates`):

1. **Warm raw-task exchanges (the default everywhere)** —
   `group_apply_tasks` (keyed reduce over any Arrow schema),
   `hash_join_tasks` (co-partitioned per-partition pyarrow joins,
   inner/outer, fused post kernels), `dedup_sum_tasks` /
   `edge_group_apply_tasks` (edge-table fast forms). num_cpus=0 tasks
   route with num_returns=g and per-partition `take` copies (an Arrow
   slice pickles its WHOLE parent buffer); merge fan-in is capped by a
   128-ary pre-combine tree. These skip the Ray Data hash-shuffle /
   join operators' per-use actor-pool spawn (~2-5 s at test scale;
   12.9 s vs 2.8 s for a 31M-row x 128-partition exchange).
2. **Dataset-native `keyed_reduce`** — hash `repartition(keys=...)` +
   whole-partition numpy (itself ~10x cheaper than
   ``groupby().aggregate()``; measured 27 s vs 2.3 s on a 1.8M-row
   dedup). Retained as the independent machinery that A/B-gates the
   warm-task tier (`Graph.dedup_sum(plan='shuffle')`) and for callers
   that want a plain streaming Dataset op.
"""

from __future__ import annotations

import numpy as np


def ensure_hash_shuffle() -> None:
    """Key-based repartition requires the hash shuffle strategy."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def default_shuffle_blocks() -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def keyed_reduce(ds, keys: list[str], np_reduce, num_blocks: int | None = None):
    """Hash-partition by ``keys`` then apply ``np_reduce`` (pa.Table ->
    pa.Table) once per whole partition."""
    ensure_hash_shuffle()
    nb = num_blocks or default_shuffle_blocks()
    return ds.repartition(num_blocks=nb, keys=keys).map_batches(
        np_reduce, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def group_sum_per_key(values: np.ndarray, keys: np.ndarray):
    """(unique_keys, sums) via sort-free bincount composition."""
    uk, inv = np.unique(keys, return_inverse=True)
    return uk, np.bincount(inv, weights=values)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic uint64 value hash."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def group_reduce_per_key(values: np.ndarray, keys: np.ndarray, op: str):
    """(unique_keys, reduced) — local whole-partition reduce used after a
    hash repartition. op in {sum, count, min, max} plus the reference's
    binary-functor tail (``Operations.h:184-293``):

    - ``band``/``bor``/``bxor`` — bitwise and/or/xor of int64-cast values
      (`bitwise_and/or/xor`, MPI_BAND/BOR/BXOR analogs);
    - ``lxor`` — logical exclusive-or = parity of nonzero count
      (`logical_xor`, MPI_LXOR);
    - ``rand`` — `RandReduce`: pick one element of the group. The
      reference flips an (optionally seeded) Mersenne coin per pairwise
      combine; here the pick is the group element whose value-hash is
      minimal (rendezvous hashing) — same "arbitrary but fair" contract,
      but associative and partition-invariant, so partial+final reduces
      compose deterministically.
    """
    uk, inv = np.unique(keys, return_inverse=True)
    if len(uk) == 0:
        # merge fns run on EMPTY partitions too (schema stability); the
        # 'rand' branch would otherwise index starts=[0] into nothing
        return uk, np.asarray(values, dtype=np.float64)
    if op == "sum":
        return uk, np.bincount(inv, weights=values)
    if op == "count":
        return uk, np.bincount(inv).astype(np.float64)
    if op == "lxor":
        nz = (np.asarray(values) != 0).astype(np.float64)
        return uk, np.bincount(inv, weights=nz) % 2.0
    if op == "rand":
        h = _mix64(np.ascontiguousarray(values, dtype=np.float64).view(np.uint64))
        order = np.lexsort((h, inv))
        starts = np.concatenate(([0], np.cumsum(np.bincount(inv))[:-1]))
        return uk, np.asarray(values)[order][starts]
    order = np.argsort(inv, kind="stable")
    sv = values[order]
    counts = np.bincount(inv)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    if op in ("band", "bor", "bxor"):
        ufunc = {"band": np.bitwise_and, "bor": np.bitwise_or,
                 "bxor": np.bitwise_xor}[op]
        red = ufunc.reduceat(sv.astype(np.int64), indptr[:-1])
        return uk, red.astype(np.float64)
    ufunc = np.minimum if op == "min" else np.maximum
    return uk, ufunc.reduceat(sv, indptr[:-1])


# ---------------------------------------------------------------------------
# Raw-task keyed sum (`SparseCommon` exchange + `RemoveDuplicates`,
# ``SpParMat.cpp:2906-2981``) — the warm-task alternative to the Ray Data
# hash shuffle for ONE-SHOT build steps on this box, where the hash-shuffle
# operator pays ~2s of actor-pool spawn per use. Same route/merge
# discipline as the engine's iterative shuffles (num_cpus=0 tasks,
# num_returns=g, refs passed as top-level args).
# ---------------------------------------------------------------------------

_FIB64 = np.uint64(11400714819323198485)
_RT_CACHE: dict = {}


def _rt0(fn):
    import ray

    if fn not in _RT_CACHE:
        _RT_CACHE[fn] = ray.remote(num_cpus=0)(fn)
    return _RT_CACHE[fn]


def _ds_route(tbl, g: int, n: int, drop_loops: bool = False):
    """Batch-local (src,dst) group-sum, then route fused keys by hash.
    ``drop_loops`` filters src == dst before combining (fused
    `RemoveLoops` — saves a separate filter pass over the merged table)."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        k = np.empty(0, dtype=np.int64)
        w = np.empty(0, dtype=np.float64)
        out = [(k, w)] * g
        return out[0] if g == 1 else tuple(out)
    src = np.asarray(tbl.column("src"))
    dst = np.asarray(tbl.column("dst"))
    w = np.asarray(tbl.column("w")).astype(np.float64)
    if drop_loops:
        keep = src != dst
        src, dst, w = src[keep], dst[keep], w[keep]
    uk, ws = group_sum_per_key(w, src * np.int64(n) + dst)
    p = ((uk.astype(np.uint64) * _FIB64) >> np.uint64(33)).astype(np.int64) % g
    order = np.argsort(p, kind="stable")
    uk, ws, p = uk[order], ws[order], p[order]
    counts = np.bincount(p, minlength=g)
    splits = np.cumsum(counts)[:-1]
    ks = np.split(uk, splits)
    vs = np.split(ws, splits)
    out = list(zip(ks, vs))
    return out[0] if g == 1 else tuple(out)


def _ds_merge(n: int, *parts):
    import pyarrow as pa

    ks = np.concatenate([p[0] for p in parts])
    ws = np.concatenate([p[1] for p in parts])
    uk, merged = group_sum_per_key(ws, ks)
    uk = uk.astype(np.int64)
    return pa.table({
        "src": pa.array(uk // n),
        "dst": pa.array(uk % n),
        "w": pa.array(merged.astype(np.float64)),
    })


def _ds_concat(*parts):
    """Tree fan-in stage for (keys, weights) pair partials: pre-combine
    with the keyed sum (associative) so tree nodes also SHRINK data."""
    ks = np.concatenate([p[0] for p in parts])
    ws = np.concatenate([p[1] for p in parts])
    return group_sum_per_key(ws, ks)


def dedup_sum_tasks(edges_ds, n: int, num_partitions: int | None = None,
                    drop_loops: bool = False):
    """Duplicate-merge an edge Dataset with + via warm raw tasks:
    per-block pre-combine + route (num_returns=g), per-partition merge
    (fan-in capped by a combining tree — the + monoid is associative, so
    tree nodes pre-reduce). ``drop_loops`` fuses `RemoveLoops` into the
    route tasks. Returns a Dataset (src, dst, w)."""
    import ray

    g = num_partitions or default_shuffle_blocks()
    blocks = edges_ds.to_arrow_refs()
    routed = [
        _rt0(_ds_route).options(num_returns=g).remote(b, g, n, drop_loops)
        for b in blocks
    ]
    routed = [[r] if g == 1 else list(r) for r in routed]
    merged = [
        _rt0(_ds_merge).remote(
            n,
            *_tree_fanin([routed[j][i] for j in range(len(routed))],
                         _ds_concat),
        )
        for i in range(g)
    ]
    return ray.data.from_arrow_refs(merged)


def _ga_route(tbl, g: int, key: str):
    """Route whole edge rows by key hash (num_returns=g)."""
    import pyarrow as pa

    if tbl.num_rows and key not in tbl.column_names:
        raise KeyError(
            f"edge_group_apply_tasks: key {key!r} not in {tbl.column_names}"
        )
    if tbl.num_rows == 0:
        e = pa.table({
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
            "w": pa.array([], type=pa.float64()),
        })
        return e if g == 1 else tuple([e] * g)
    k = np.asarray(tbl.column(key)).astype(np.uint64)
    p = ((k * _FIB64) >> np.uint64(33)).astype(np.int64) % g
    order = np.argsort(p, kind="stable")
    counts = np.bincount(p, minlength=g)
    offs = np.concatenate([[0], np.cumsum(counts)])
    # per-partition take, NOT take-then-slice: a pyarrow Table slice
    # pickles with its WHOLE parent buffer (g-fold shuffle blow-up)
    out = [
        tbl.take(pa.array(order[offs[i]:offs[i + 1]])) for i in range(g)
    ]
    return out[0] if g == 1 else tuple(out)


def _ga_merge(fn, *parts):
    # fn ALWAYS runs, including on an empty partition, so every output
    # block carries fn's output schema (fn must handle num_rows == 0)
    import pyarrow as pa

    ts = [t for t in parts if t.num_rows]
    return fn(pa.concat_tables(ts).combine_chunks() if ts else parts[0])


def edge_group_apply_tasks(edges_ds, key: str, np_apply,
                           num_partitions: int | None = None):
    """Warm raw-task analog of ``keyed_reduce`` for (src, dst, w) edge
    tables: route rows by ``key`` hash via num_cpus=0 tasks
    (num_returns=g), then one whole-partition ``np_apply`` per
    partition. Avoids the Ray Data hash-shuffle operator's ~2 s
    actor-pool spawn per use on one-shot steps (same discipline as
    `dedup_sum_tasks`); all of a key's rows co-locate, so keyed
    normalizations stay partition-local."""
    import ray

    g = num_partitions or default_shuffle_blocks()
    blocks = edges_ds.to_arrow_refs()
    routed = [
        _rt0(_ga_route).options(num_returns=g).remote(b, g, key)
        for b in blocks
    ]
    routed = [[r] if g == 1 else list(r) for r in routed]
    return ray.data.from_arrow_refs(
        [
            _rt0(_ga_merge).remote(
                np_apply,
                *_tree_fanin([routed[j][i] for j in range(len(routed))]),
            )
            for i in range(g)
        ]
    )


# ---------------------------------------------------------------------------
# Generic warm-task keyed shuffle + hash join over arbitrary Arrow tables.
# Same route/merge discipline as `dedup_sum_tasks` / the engine's iterative
# exchanges (`SpParMat.cpp:2906-2981` SparseCommon): num_cpus=0 tasks on a
# warm worker pool, num_returns=g routing, one whole-partition apply per
# partition. Used by the dedup/ANN family, whose chains of 2-6 Ray Data
# hash-shuffle / join operators each paid ~2-5 s of actor-pool spawn per
# use at toy scale.
# ---------------------------------------------------------------------------


def _col_hash(col, nrows: int) -> np.ndarray:
    """Deterministic uint64 hash of one Arrow column (int-like or
    string/binary). Strings hash via dictionary-encode + crc32 of the
    (small) dictionary, so per-row Python never runs."""
    import zlib

    import pyarrow as pa
    import pyarrow.types as pat

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pat.is_string(t) or pat.is_large_string(t) or pat.is_binary(t):
        enc = col.dictionary_encode()
        dic = enc.dictionary.to_pylist()
        hu = np.fromiter(
            (zlib.crc32(s.encode() if isinstance(s, str) else s)
             for s in dic),
            dtype=np.uint64, count=len(dic),
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        out = np.zeros(nrows, dtype=np.uint64)
        valid = idx >= 0 if idx.dtype.kind == "i" else ~np.isnan(idx)
        out[valid] = hu[idx[valid].astype(np.int64)]
        return _mix64(out)
    vals = np.asarray(col)
    if vals.dtype == np.float64 or vals.dtype == np.float32:
        return _mix64(vals.astype(np.float64).view(np.uint64))
    return _mix64(vals.astype(np.int64).view(np.uint64))


def _gen_route(tbl, g: int, keys):
    """Route whole rows of an arbitrary Arrow table by combined key hash
    (num_returns=g). Empty inputs keep their schema via slice(0, 0)."""
    import pyarrow as pa

    if tbl.num_rows == 0:
        e = tbl.slice(0, 0)
        return e if g == 1 else tuple([e] * g)
    acc = np.zeros(tbl.num_rows, dtype=np.uint64)
    for key in keys:
        acc = _mix64(acc * _FIB64 + _col_hash(tbl.column(key), tbl.num_rows))
    p = (acc >> np.uint64(33)).astype(np.int64) % g
    order = np.argsort(p, kind="stable")
    counts = np.bincount(p, minlength=g)
    offs = np.concatenate([[0], np.cumsum(counts)])
    # per-partition take, NOT take-then-slice: a pyarrow Table slice
    # pickles with its WHOLE parent buffer (g-fold shuffle blow-up)
    out = [
        tbl.take(pa.array(order[offs[i]:offs[i + 1]])) for i in range(g)
    ]
    return out[0] if g == 1 else tuple(out)


def _gen_merge(fn, *parts):
    # fn ALWAYS runs (fn must handle num_rows == 0) so every output block
    # carries fn's output schema; among all-empty parts keep the widest
    # schema (zero-column blocks can reach here from schema-less upstreams)
    import pyarrow as pa

    ts = [t for t in parts if t.num_rows]
    if ts:
        return fn(pa.concat_tables(ts).combine_chunks())
    return fn(max(parts, key=lambda t: t.num_columns))


def _gen_concat(*parts):
    """Pure concat of co-partition pieces (tree fan-in stage)."""
    import pyarrow as pa

    ts = [t for t in parts if t.num_rows]
    if ts:
        return pa.concat_tables(ts).combine_chunks()
    return max(parts, key=lambda t: t.num_columns)


_MERGE_FANIN = 128


def _tree_fanin(refs: list, concat_fn=None) -> list:
    """Cap per-task argument fan-in: with E input blocks each merge task
    would take E refs — at cluster scale (thousands of blocks) that is a
    driver/arg-pinning bottleneck, so pre-combine in a _MERGE_FANIN-ary
    tree of num_cpus=0 tasks. ``concat_fn`` defaults to the pure table
    concat (`_gen_concat`); associative leaf types pass a combining fn
    (e.g. `_ds_concat`'s keyed sum) so tree nodes also shrink data."""
    fn = _gen_concat if concat_fn is None else concat_fn
    while len(refs) > _MERGE_FANIN:
        refs = [
            _rt0(fn).remote(*refs[i:i + _MERGE_FANIN])
            for i in range(0, len(refs), _MERGE_FANIN)
        ]
    return refs


def group_apply_tasks(ds, keys: list[str], np_apply,
                      num_partitions: int | None = None):
    """Warm raw-task ``keyed_reduce`` for ANY Arrow-schema Dataset:
    hash-route rows on ``keys`` (ints or strings) with num_cpus=0 tasks,
    then one whole-partition ``np_apply(pa.Table) -> pa.Table`` per
    partition. Materializes the upstream into object-store refs (the Ray
    Data hash shuffle does the same at its barrier) but skips its per-use
    actor-pool spawn. All rows of a key co-locate in one partition."""
    import ray

    g = num_partitions or default_shuffle_blocks()
    blocks = ds.to_arrow_refs()
    routed = [
        _rt0(_gen_route).options(num_returns=g).remote(b, g, keys)
        for b in blocks
    ]
    routed = [[r] if g == 1 else list(r) for r in routed]
    return ray.data.from_arrow_refs(
        [
            _rt0(_gen_merge).remote(
                np_apply,
                *_tree_fanin([routed[j][i] for j in range(len(routed))]),
            )
            for i in range(g)
        ]
    )


def _gen_join(on, right_on, join_type, suffixes, schemas, left_parts_n,
              post, *parts):
    """Per-partition Arrow hash join (Acero) of co-routed sides; ``post``
    optionally transforms the joined table (fused next-stage kernel).
    ``schemas`` = (left, right) Arrow schemas used as the fallback for
    all-empty sides (Ray can materialize 0-row datasets as zero-column
    blocks, which would otherwise break the key reference)."""
    import pyarrow as pa

    def _side(ts, keys, schema):
        rows = [t for t in ts if t.num_rows]
        if rows:
            return pa.concat_tables(rows).combine_chunks()
        best = max(ts, key=lambda t: t.num_columns)
        if schema is not None and not all(k in best.column_names
                                          for k in keys):
            return schema.empty_table()
        return best

    lt = _side(parts[:left_parts_n], on, schemas[0])
    rt = _side(parts[left_parts_n:], right_on, schemas[1])
    joined = lt.join(
        rt, keys=list(on), right_keys=list(right_on),
        join_type=join_type, left_suffix=suffixes[0],
        right_suffix=suffixes[1],
    )
    return post(joined) if post is not None else joined


def hash_join_tasks(left_ds, right_ds, on, num_partitions: int | None = None,
                    post=None, *, right_on=None, join_type: str = "inner",
                    left_suffix: str | None = None,
                    right_suffix: str | None = None):
    """Warm raw-task hash join: both sides routed by the same key hash
    (num_cpus=0 tasks; the right side by ``right_on`` when the key
    columns are named differently), one pyarrow ``Table.join`` per
    partition — co-partitioning makes the partition-local joins exact,
    including the outer variants ("left outer" / "right outer" /
    "full outer": a key's rows all land in one partition, so partition-
    local null-padding is globally correct). ``post`` (pa.Table ->
    pa.Table), when given, is fused into the join task so the joined
    rows never re-ship. Replaces ``Dataset.join``'s per-use actor-pool
    spawn for one-shot steps.

    Contract: a side that can be globally EMPTY must carry its schema in
    at least one block (map_batches outputs always do; Ray's repartition
    of a fully-empty dataset erases the schema, and `ds.schema()` then
    returns None, so no fallback is possible)."""
    import ray

    on = [on] if isinstance(on, str) else list(on)
    right_on = (on if right_on is None
                else [right_on] if isinstance(right_on, str)
                else list(right_on))
    g = num_partitions or default_shuffle_blocks()
    lrefs = left_ds.to_arrow_refs()
    rrefs = right_ds.to_arrow_refs()
    schemas = (_arrow_schema(left_ds), _arrow_schema(right_ds))
    lrouted = [
        _rt0(_gen_route).options(num_returns=g).remote(b, g, on)
        for b in lrefs
    ]
    rrouted = [
        _rt0(_gen_route).options(num_returns=g).remote(b, g, right_on)
        for b in rrefs
    ]
    lrouted = [[r] if g == 1 else list(r) for r in lrouted]
    rrouted = [[r] if g == 1 else list(r) for r in rrouted]
    out = []
    for i in range(g):
        lcol = _tree_fanin([lrouted[j][i] for j in range(len(lrouted))])
        rcol = _tree_fanin([rrouted[j][i] for j in range(len(rrouted))])
        out.append(
            _rt0(_gen_join).remote(
                tuple(on), tuple(right_on), join_type,
                (left_suffix, right_suffix), schemas, len(lcol), post,
                *lcol, *rcol,
            )
        )
    return ray.data.from_arrow_refs(out)


def _arrow_schema(ds):
    """The dataset's Arrow schema, or None when unavailable — used only
    as the all-empty-side fallback in `_gen_join` (cheap: the dataset is
    already materialized by to_arrow_refs when this runs)."""
    import pyarrow as pa

    try:
        s = ds.schema(fetch_if_missing=True)
        base = getattr(s, "base_schema", None)
        return base if isinstance(base, pa.Schema) else None
    except Exception:
        return None
