"""Vertex-vector table operators (the FullyDist(Sp)Vec surface).

A vertex vector is a Dataset (v:int64, val) — dense (one row per vertex)
or sparse (active vertices only). Parity:

- ``ewise_join``   <- `EWiseApply` sparse/dense join family
                     (``ParFriends.h:2934-3131``): inner/left/outer join on
                     the index with null substitutes.
- ``invert``       <- `FullyDistSpVec::Invert` (``FullyDistSpVec.cpp:1900``):
                     vout[vin[k]] = k with a duplicate policy (min/max).
- ``uniq``         <- `FullyDistSpVec::Uniq` (``FullyDistSpVec.cpp:890``):
                     distinct values keeping one representative index.
- ``vec_reduce``   <- `FullyDistVec::Reduce` global fold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shuffle import group_apply_tasks, group_reduce_per_key, hash_join_tasks


def from_numpy(vals: np.ndarray, idx: np.ndarray | None = None):
    import ray

    if idx is None:
        idx = np.arange(len(vals), dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"v": pa.array(idx), "val": pa.array(vals)})
    )


def ewise_join(va_ds, vb_ds, fn, how: str = "inner", num_partitions: int = 16):
    """Join two vertex vectors on v; fn(val_a, val_b) vectorized numpy.
    how in {inner, left_outer, full_outer}; missing side passed as NaN."""
    j = hash_join_tasks(
        va_ds, vb_ds, on="v", num_partitions=num_partitions,
        join_type=how.replace("_", " "), left_suffix="_a",
        right_suffix="_b",
    )

    def _apply(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("val_a"), dtype=np.float64)
        b = np.asarray(batch.column("val_b"), dtype=np.float64)
        return pa.table({"v": batch.column("v"), "val": pa.array(fn(a, b))})

    return j.map_batches(_apply, batch_format="pyarrow")


def invert(vec_ds, dup: str = "min"):
    """out[val] = index, duplicates resolved by ``dup`` (min/max index)."""

    def _swap(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(np.asarray(batch.column("val")).astype(np.int64)),
                "idx": pa.array(np.asarray(batch.column("v")).astype(np.float64)),
            }
        )

    def _merge(batch: pa.Table) -> pa.Table:
        uk, red = group_reduce_per_key(
            np.asarray(batch.column("idx")), np.asarray(batch.column("key")), dup
        )
        return pa.table(
            {"v": pa.array(uk), "val": pa.array(red.astype(np.int64))}
        )

    return group_apply_tasks(vec_ds.map_batches(_swap, batch_format="pyarrow",
                                           zero_copy_batch=True), ["key"], _merge)


def uniq(vec_ds, rep: str = "min"):
    """Distinct values with one representative index (v=rep index, val)."""

    def _pre(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(np.asarray(batch.column("val")).astype(np.int64)),
                "idx": pa.array(np.asarray(batch.column("v")).astype(np.float64)),
            }
        )

    def _merge(batch: pa.Table) -> pa.Table:
        uk, red = group_reduce_per_key(
            np.asarray(batch.column("idx")), np.asarray(batch.column("key")), rep
        )
        return pa.table(
            {"v": pa.array(red.astype(np.int64)), "val": pa.array(uk)}
        )

    return group_apply_tasks(vec_ds.map_batches(_pre, batch_format="pyarrow",
                                           zero_copy_batch=True), ["key"], _merge)


def vec_reduce(vec_ds, op: str = "sum") -> float:
    """Global scalar fold over val."""
    col = "val"
    if op == "sum":
        return vec_ds.sum(col)
    if op == "min":
        return vec_ds.min(col)
    if op == "max":
        return vec_ds.max(col)
    raise ValueError(op)


# ---------------------------------------------------------------------------
# Sort-based RandPerm (`FullyDistVec::RandPerm`, FullyDistVec.cpp:784-922:
# attach random keys -> distributed sort -> re-id by global rank).
# ---------------------------------------------------------------------------

_RP_P = 2147483647  # 2^31 - 1, prime
_RP_A = 48271  # MINSTD multiplier, primitive root mod P


def _rp_key(i: np.ndarray, seed: int) -> np.ndarray:
    """key(i) = (a*i + b) mod P — a bijection on [0, P), so keys are
    DISTINCT whenever n <= P and the rank order is a true permutation.
    Mirrors the reference's attach-random-keys step with a seeded LCG
    scramble instead of a stateful RNG (partition-invariant, and exactly
    reproducible in the DuckDB oracle with BIGINT arithmetic)."""
    b = np.int64((seed * 2654435761 + 11) % _RP_P)
    return (i.astype(np.int64) * np.int64(_RP_A) + b) % np.int64(_RP_P)


def _rp_route(lo: int, hi: int, g: int, seed: int):
    """Range-bucket ids [lo, hi) by key; returns g shard arrays + the
    (g,) count vector (shard g of the num_returns=g+1 task)."""
    i = np.arange(lo, hi, dtype=np.int64)
    bucket = (_rp_key(i, seed) * np.int64(g)) // np.int64(_RP_P)
    order = np.argsort(bucket, kind="stable")
    counts = np.bincount(bucket, minlength=g)
    splits = np.cumsum(counts)[:-1]
    parts = np.split(i[order], splits)
    return (*parts, counts)


def _rp_merge(offset: int, seed: int, *shards) -> pa.Table:
    """Sort one key-range bucket locally; global rank = bucket offset +
    local rank (keys are distinct, so the order is unambiguous)."""
    i = (np.concatenate(shards) if shards
         else np.empty(0, dtype=np.int64))
    order = np.argsort(_rp_key(i, seed), kind="stable")
    rank = np.int64(offset) + np.arange(len(i), dtype=np.int64)
    return pa.table({"v": pa.array(i[order]), "val": pa.array(rank)})


def randperm(n: int, seed: int = 0, num_buckets: int | None = None):
    """Distributed sort-based random permutation: Dataset (v, val) with
    val = p(v), a bijection on [0, n).

    Plan (the engine's raw-task shuffle discipline — no Ray Data
    actor-pool spawn cost, no driver materialization beyond the g^2 tiny
    bucket counts used for the rank prefix sum):

      g route tasks (key + range-bucket, num_returns=g+1)
        -> driver prefix-sums the g bucket totals
        -> g merge tasks (local sort, rank = offset + arange).
    """
    import ray

    from ..pipelines.algorithms import _rt
    from .shuffle import default_shuffle_blocks

    g = num_buckets or max(1, min(default_shuffle_blocks(), n // 4096 + 1))
    bounds = np.linspace(0, n, g + 1).astype(np.int64)
    routed = [
        _rt(_rp_route).options(num_returns=g + 1).remote(
            int(bounds[k]), int(bounds[k + 1]), g, seed
        )
        for k in range(g)
    ]
    routed = [list(t) for t in routed]  # num_returns=g+1 >= 2 always
    counts = np.sum(ray.get([t[g] for t in routed]), axis=0)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    merged = [
        _rt(_rp_merge).remote(int(offsets[b]), seed,
                              *[routed[k][b] for k in range(g)])
        for b in range(g)
    ]
    return ray.data.from_arrow_refs(merged)


# ---------------------------------------------------------------------------
# RandReduce — the random tie-break reduce functor (Operations.h:184-201)
# ---------------------------------------------------------------------------

_RR_MULT = np.int64(2654435761)
_RR_M32 = np.int64(1) << 32
_RR_M31 = np.int64(1) << 31


def rand_reduce_key(v: np.ndarray, seed: int = 11) -> np.ndarray:
    """The `RandReduce` functor (reference ``Operations.h:184-201``: a
    reduce that picks a pseudo-random operand) made DETERMINISTIC and
    oracle-reproducible: reduce = min over the packed key
    ``h(v) << 31 | v`` with h the split-key Knuth scramble (every
    intermediate exact in int64 on both the numpy and the SQL side).
    min over packed (h, v) pairs is associative and commutative, so any
    reduction tree picks the same pseudo-random representative — unlike
    the reference's RNG-state version, replays and reorders can't change
    the result. Requires v < 2^31 (packed-width guard)."""
    v = np.asarray(v, dtype=np.int64)
    if len(v) and int(v.max()) >= _RR_M31:
        raise NotImplementedError(
            "rand_reduce_key: ids must fit 31 bits next to the 32-bit "
            "hash; widen the packing beyond 2^31 ids"
        )
    h = ((v % (1 << 20)) * _RR_MULT + v // (1 << 20) + seed) % _RR_M32
    return (h << np.int64(31)) | v


def rand_reduce_decode(key: np.ndarray) -> np.ndarray:
    """Recover the chosen operand from a reduced packed key."""
    return np.asarray(key, dtype=np.int64) & (_RR_M31 - 1)
