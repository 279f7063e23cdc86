"""Vectorized segment reductions over CSR-ordered arrays.

These are the numpy analogs of the reference's local semiring kernels
(``dcsc_gespmv`` in ``Friends.h:64-120``, threaded merge
``MergeContributions`` in ``ParFriends.h:2011-2178``): given values laid out
in row-major CSR order with an ``indptr`` of segment boundaries, reduce each
segment with an associative op, without any Python-level loop.

``np.ufunc.reduceat`` has two sharp edges we fix here:
- an empty segment (``indptr[i] == indptr[i+1]``) returns ``a[indptr[i]]``
  instead of the identity;
- a segment starting at ``len(a)`` (trailing empties) raises.
"""

from __future__ import annotations

import numpy as np

__all__ = ["segment_reduce", "segment_sum"]


def segment_sum(values: np.ndarray, seg_ids: np.ndarray, num_segments: int) -> np.ndarray:
    """Unordered segment sum: ``out[s] = sum(values[seg_ids == s])``.

    Uses ``np.bincount`` (C-speed, no ordering requirement) — the workhorse
    for SpMV partials with the plus monoid.
    """
    if len(values) == 0:
        return np.zeros(num_segments, dtype=np.float64)
    return np.bincount(seg_ids, weights=values, minlength=num_segments).astype(
        np.float64, copy=False
    )


def segment_reduce(
    ufunc: np.ufunc,
    values: np.ndarray,
    indptr: np.ndarray,
    identity,
) -> np.ndarray:
    """Ordered segment reduce: ``out[i] = ufunc.reduce(values[indptr[i]:indptr[i+1]])``
    with empty segments set to ``identity``.

    ``values`` must be contiguous per segment (CSR order); ``indptr`` has
    ``num_segments + 1`` entries with ``indptr[-1] == len(values)``.
    """
    n_seg = len(indptr) - 1
    if n_seg == 0:
        return np.empty(0, dtype=np.asarray(values).dtype)
    starts = indptr[:-1]
    empty = starts == indptr[1:]
    if len(values) == 0:
        return np.full(n_seg, identity, dtype=np.result_type(type(identity)))
    # Segments starting at len(values) are a trailing-empty suffix (indptr is
    # nondecreasing); reduceat would raise on them. Reduce the valid prefix,
    # fill the suffix — and all other empty segments — with the identity.
    valid = starts < len(values)
    red = ufunc.reduceat(values, starts[valid])
    out = np.full(n_seg, identity, dtype=np.result_type(red.dtype, type(identity)))
    out[valid] = red
    out[empty] = identity
    return out
