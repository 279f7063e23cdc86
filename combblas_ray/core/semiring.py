"""Semiring protocol + the built-in catalog.

The reference parameterizes every SpMV/SpGEMM/Reduce by a semiring struct
with ``add``/``multiply``/``id`` (``include/CombBLAS/Semirings.h``). Here a
semiring is a small Python object exposing *vectorized* numpy kernels:

- ``mul(edge_vals, x_vals) -> np.ndarray`` — the per-nonzero multiply,
  applied to whole blocks at once;
- ``reduce_segments(vals, indptr)`` — ordered per-row combine (CSR layout);
- ``reduce_unordered(vals, seg_ids, n)`` — unordered combine (shuffle merge);
- ``combine(a, b)`` — elementwise merge of two partial dense vectors
  (the cross-block / cross-actor reduce, MPI_Reduce analog).

Catalog parity with the reference (``Semirings.h``):
- ``plus_times``   <- ``PlusTimesSRing``      (Semirings.h:212-232)
- ``min_plus``     <- ``MinPlusSRing``        (Semirings.h:235-255)
- ``select2nd_min``<- app semiring ``Select2ndMinSR`` (CC.h:62-84,
                      FastSV.h:26-44): multiply returns the vector operand,
                      add is min — the min-label-propagation semiring.
- ``select2nd_max``<- ``SelectMaxSRing``      (Semirings.h:166-210) as used
                      by BFS parent selection (multiply = 2nd operand).
- ``bool_or_and``  <- ``BoolCopy*SRing``-style structural semiring.
- ``max_times``    <- max-plus/times family used by column stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .segments import segment_reduce, segment_sum

__all__ = ["Semiring", "SEMIRINGS", "get_semiring"]


@dataclass(frozen=True)
class Semiring:
    name: str
    mul: Callable[[np.ndarray, np.ndarray], np.ndarray]
    add_ufunc: np.ufunc
    identity: float
    dtype: np.dtype = np.dtype(np.float64)
    # True when the additive monoid is plain +: enables the bincount
    # fast path for unordered merges.
    is_plus: bool = field(default=False)

    def reduce_segments(self, vals: np.ndarray, indptr: np.ndarray) -> np.ndarray:
        return segment_reduce(self.add_ufunc, vals, indptr, self.identity)

    def reduce_unordered(self, vals: np.ndarray, seg_ids: np.ndarray, n: int) -> np.ndarray:
        if self.is_plus:
            return segment_sum(vals, seg_ids, n)
        out = np.full(n, self.identity, dtype=self.dtype)
        # ufunc.at is unbuffered (correct with repeated indices); only used
        # on already-combined per-block partials, never on raw nnz streams.
        self.add_ufunc.at(out, seg_ids, vals.astype(self.dtype, copy=False))
        return out

    def combine(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return self.add_ufunc(a, b)

    def empty(self, n: int) -> np.ndarray:
        return np.full(n, self.identity, dtype=self.dtype)


def _times(a, x):
    return a * x


def _plus(a, x):
    return a + x


def _second(a, x):
    # "multiply returns the second (vector) operand" — Select2nd semantics.
    return x if x.dtype != np.dtype(object) else np.asarray(x)


def _and(a, x):
    return np.logical_and(a != 0, x != 0).astype(np.float64)


def _min_mul(a, x):
    return np.minimum(a, x)


def _times_i64(a, x):
    return a.astype(np.int64) * x


I64MAX = np.iinfo(np.int64).max

SEMIRINGS: dict[str, Semiring] = {
    "plus_times": Semiring("plus_times", _times, np.add, 0.0, is_plus=True),
    "min_plus": Semiring("min_plus", _plus, np.minimum, np.inf),
    "min_times": Semiring("min_times", _times, np.minimum, np.inf),
    "select2nd_min": Semiring("select2nd_min", _second, np.minimum, np.inf),
    "select2nd_max": Semiring("select2nd_max", _second, np.maximum, -np.inf),
    "max_times": Semiring("max_times", _times, np.maximum, -np.inf),
    "plus_and": Semiring("plus_and", _and, np.add, 0.0, is_plus=True),
    # Boolean OR-AND structural semiring (`BoolCopy*SRing`): operands live
    # on the 0/1 domain, where max IS logical-or (identity 0 = false).
    "bool_or_and": Semiring("bool_or_and", _and, np.maximum, 0.0),
    # Exact int64 value channel for select/min-only flows (no arithmetic
    # ever leaves int64). The matchings' (root*n + id) pair encode rides
    # this channel, lifting the float64 2^53 ceiling (n <= ~3.04e9
    # vertices instead of ~9.49e7); identity = int64 max is the "no
    # value" sentinel (the +inf analog).
    "select2nd_min_i64": Semiring(
        "select2nd_min_i64", _second, np.minimum, I64MAX,
        dtype=np.dtype(np.int64),
    ),
    # Exact int64 plus_times channel (path counting past the f64 2^53
    # ceiling — the reference's templated 64-bit promote_trait types,
    # ``promote.h``): multiply casts the (structural 1.0) edge weight to
    # int64 so no value ever visits float; is_plus stays False so every
    # reduce takes the dtype-preserving reduceat/ufunc.at paths instead
    # of the float64 bincount fast path.
    "plus_times_i64": Semiring(
        "plus_times_i64", _times_i64, np.add, 0, dtype=np.dtype(np.int64),
    ),
    # Exact int64 select2nd_max channel (the max twin of
    # `select2nd_min_i64`): identity = int64 min is the "no value"
    # sentinel (the -inf analog). The dominating-set greedy rides this
    # to take exact closed-neighborhood score maxima past the float64
    # 2^53 ceiling.
    "select2nd_max_i64": Semiring(
        "select2nd_max_i64", _second, np.maximum,
        np.iinfo(np.int64).min, dtype=np.dtype(np.int64),
    ),
    # Widest-path (bottleneck) semiring: multiply = min(edge weight,
    # incoming bottleneck), add = max — `MaxMinSRing` of the reference's
    # semiring family (Semirings.h catalog; Operations.h min/max
    # functors). Identity -inf = unreached.
    "max_min": Semiring("max_min", _min_mul, np.maximum, -np.inf),
    # Bitwise-OR over int64 bitmask values carried on the x channel
    # (`bitwise_or` from the reference's binary-functor catalog,
    # Operations.h:184-293, as an SpMV additive monoid): y[v] = OR of
    # x[u] over neighbors u. Jones-Plassmann coloring rides this to
    # collect neighbor color masks in one SpMV (identity 0 = no bits).
    "bor_second": Semiring(
        "bor_second", _second, np.bitwise_or, 0, dtype=np.dtype(np.int64),
    ),
    # Longest-path (critical-path / tropical-max) semiring: multiply =
    # value + edge length, add = max — the max-plus twin of `min_plus`
    # (`Semirings.h` catalog's max-plus member; scheduling / earliest-
    # finish relaxation on DAGs). Identity -inf = unreachable.
    "max_plus": Semiring("max_plus", _plus, np.maximum, -np.inf),
}


def get_semiring(name: str | Semiring) -> Semiring:
    if isinstance(name, Semiring):
        return name
    return SEMIRINGS[name]
