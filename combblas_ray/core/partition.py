"""2D block partitioning arithmetic.

Replicates the reference's contiguous-range owner arithmetic so that a
vertex-vector chunk k is index-aligned with matrix block-row k:

- ``SpParMat::Owner`` (reference ``SpParMat.cpp:5081-5109``): row owner of
  global index ``i`` over ``pr`` process rows is ``min(i // (m // pr), pr-1)``
  (floor local size; last owner absorbs the remainder).
- ``FullyDist`` vector partitioning (reference ``FullyDist.h:110-150``) uses
  the same contiguous ranges.

On top of that we add a salting helper for power-law hub keys (the
reference's analog is random vertex renumbering, ``FullyDistVec::RandPerm``,
``TopDownBFS.cpp:344`` — "so that A(v,v) is load-balanced").

All functions are pure and vectorized (numpy) so they can run inside
``map_batches`` on Arrow columns with zero copies.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "local_size",
    "owner",
    "chunk_bounds",
    "block_id",
    "block_of",
    "salt_keys",
]


def local_size(n: int, parts: int) -> int:
    """Floor per-partition size; the last partition absorbs the remainder.

    Mirrors the reference's ``m_perproc = m / proccols`` integer division.
    """
    if parts <= 0:
        raise ValueError("parts must be positive")
    return max(1, n // parts) if n >= parts else 1


def owner(idx, n: int, parts: int):
    """Partition owner of global index/indices ``idx`` (vectorized).

    ``min(idx // local_size, parts - 1)`` — reference ``SpParMat.cpp:5081``.
    Accepts scalars or numpy arrays of int64.
    """
    ls = local_size(n, parts)
    out = np.asarray(idx, dtype=np.int64) // ls
    return np.minimum(out, parts - 1)


def chunk_bounds(n: int, parts: int) -> list[tuple[int, int]]:
    """[start, end) global-index range of each partition, aligned with owner()."""
    ls = local_size(n, parts)
    bounds = []
    for k in range(parts):
        start = k * ls
        end = (k + 1) * ls if k < parts - 1 else n
        bounds.append((min(start, n), min(max(end, start), n)))
    return bounds


def block_of(src, dst, n: int, gr: int, gc: int):
    """(block_row, block_col) of edges; block_row keys on ``dst`` (the SpMV
    output index), block_col on ``src`` (the SpMV input index).

    The matrix convention follows the reference apps: ``A(i, j)`` is the edge
    ``j -> i`` so ``y = A @ x`` propagates along edge direction
    (``TopDownBFS.cpp:271``).
    """
    return owner(dst, n, gr), owner(src, n, gc)


def block_id(br, bc, gc: int):
    """Flat block id ``br * gc + bc`` — mirrors ``CommGrid::GetRank``
    (reference ``CommGrid.h:106``)."""
    return np.asarray(br, dtype=np.int64) * gc + np.asarray(bc, dtype=np.int64)


def salt_keys(keys, num_salts: int, seed: int = 0x9E3779B9):
    """Deterministic salt in [0, num_salts) per occurrence of a hot key.

    Used to split a hot aggregation key (hub vertex) across ``num_salts``
    sub-partitions; a second, tiny, unsalted combine finishes the reduce.
    The salt is derived from a cheap integer hash of (key, running index) so
    re-execution of a task produces identical placement (deterministic
    lineage replay).
    """
    keys = np.asarray(keys, dtype=np.uint64)
    idx = np.arange(len(keys), dtype=np.uint64)
    h = (keys * np.uint64(0x9E3779B97F4A7C15) + idx * np.uint64(seed)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    h ^= h >> np.uint64(33)
    return (h % np.uint64(num_salts)).astype(np.int64)
