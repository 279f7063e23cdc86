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

from .shuffle import group_reduce_per_key, keyed_reduce


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
    j = va_ds.join(
        vb_ds,
        join_type=how,
        num_partitions=num_partitions,
        on=("v",),
        left_suffix="_a",
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

    return keyed_reduce(vec_ds.map_batches(_swap, batch_format="pyarrow",
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

    return keyed_reduce(vec_ds.map_batches(_pre, batch_format="pyarrow",
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
