"""Deterministic R-MAT / Graph500 edge generator.

`DistEdgeList::GenGraph500Data` analog (``DistEdgeList.cpp:222-280``,
``RefGen21.h``): recursive-quadrant sampling with the Graph500 initiator
(a,b,c,d) = (0.57, 0.19, 0.19, 0.05). Per-batch independent seeded RNG
streams (the reference seeds per rank) make the output deterministic and
reproducible regardless of task scheduling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

INITIATOR = (0.57, 0.19, 0.19, 0.05)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based uniform hash (vectorized)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def rmat_batch(edge_ids: np.ndarray, scale: int, seed: int = 1) -> pa.Table:
    """Edges for a batch of global edge ids, fully vectorized. Each
    (edge id, bit level) pair gets an independent counter-hash draw, so the
    output is identical under ANY batching/scheduling."""
    a, b, c, _ = INITIATOR
    eids = edge_ids.astype(np.uint64)
    u = np.zeros(len(eids), dtype=np.int64)
    v = np.zeros(len(eids), dtype=np.int64)
    for bit in range(scale):
        h = _mix64(eids * np.uint64(2654435761) + np.uint64(seed * 1_000_003 + bit))
        r = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        q = np.where(r < a, 0, np.where(r < a + b, 1, np.where(r < a + b + c, 2, 3)))
        u = (u << 1) | (q >> 1)
        v = (v << 1) | (q & 1)
    return pa.table(
        {
            "src": pa.array(u),
            "dst": pa.array(v),
            "w": pa.array(np.ones(len(eids), dtype=np.float64)),
        }
    )


def rmat_dataset(scale: int, edgefactor: int = 16, seed: int = 1):
    """Lazy R-MAT edge Dataset: 2^scale vertices, edgefactor * 2^scale
    edges (duplicates/self-loops included, as in the reference — apply
    dedup_sum/remove_loops downstream)."""
    import ray

    n_edges = edgefactor * (1 << scale)
    ds = ray.data.range(n_edges)
    return ds.map_batches(
        lambda b: rmat_batch(b["id"], scale, seed),
        batch_format="numpy",
        batch_size=65536,
    )
