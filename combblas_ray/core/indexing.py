"""Generalized Matlab-style indexing: `SubsRef` / `SpAsgn` with arbitrary
index vectors.

Reference semantics (``SpParMat.cpp:2030-2264`` SubsRef / SubsRefCol,
``SpParMat.cpp:2436-2482`` SpAsgn, golden tests
``ReleaseTests/IndexingTest.cpp`` / ``SpAsgnTest.cpp``):

- ``B = A(ri, ci)`` — ``B[i, j] = A[ri[i], ci[j]]``; ``ri`` / ``ci`` may be
  permuted, repeated, different lengths; B is ``len(ri) x len(ci)``.
  The reference builds permutation matrices and runs two SpGEMMs; here the
  index vectors are broadcast once (``ray.put``) as sorted multi-map
  inverses and each edge batch expands its matches vectorized — a
  dictionary join, no permutation-matrix SpGEMM needed.
- ``A(ri, ci) = B`` — ``ri`` / ``ci`` distinct: every A entry inside the
  ``ri x ci`` cross product is deleted, then B's entries are inserted at
  ``(ri[i], ci[j])``.

Scale note: the index vectors are driver/broadcast arrays — the
`FullyDistVec` analog (O(len) per node, like ``prune_column`` pvals). For
index vectors approaching n, route them through the chunked-refs vector
machinery instead (engine.scatter/gather) — same semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _multimap(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted values, positions) inverse of an index vector — supports
    repeats: all positions holding value v sit at
    ``pos[searchsorted(vals, v, 'left') : searchsorted(vals, v, 'right')]``."""
    idx = np.asarray(idx, dtype=np.int64)
    order = np.argsort(idx, kind="stable")
    return idx[order], order.astype(np.int64)


def subsref(edges_ds, ri: np.ndarray, ci: np.ndarray):
    """``B = A(ri, ci)`` as a Dataset of (bi, bj, w) triples.

    Each batch expands every edge into all (row-position, col-position)
    combinations its endpoints match — fully vectorized (cumsum/arange
    expansion), one pass, no shuffle."""
    rv, rp = _multimap(ri)
    cv, cp = _multimap(ci)
    maps_ref = ray.put((rv, rp, cv, cp))

    def _expand(batch: pa.Table, *, _ref=maps_ref) -> pa.Table:
        rv, rp, cv, cp = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        w = np.asarray(batch.column("w"))
        lo_r = np.searchsorted(rv, src, side="left")
        cr = np.searchsorted(rv, src, side="right") - lo_r
        lo_c = np.searchsorted(cv, dst, side="left")
        cc = np.searchsorted(cv, dst, side="right") - lo_c
        reps = cr * cc
        m = reps > 0
        if not m.any():
            return pa.table(
                {
                    "bi": pa.array([], type=pa.int64()),
                    "bj": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.float64()),
                }
            )
        lo_r, cr, lo_c, cc, reps, w = (
            lo_r[m], cr[m], lo_c[m], cc[m], reps[m], w[m],
        )
        eidx = np.repeat(np.arange(len(reps)), reps)
        base = np.concatenate(([0], np.cumsum(reps)))[:-1]
        local = np.arange(int(reps.sum()), dtype=np.int64) - base[eidx]
        a = local // cc[eidx]
        b = local % cc[eidx]
        return pa.table(
            {
                "bi": pa.array(rp[lo_r[eidx] + a]),
                "bj": pa.array(cp[lo_c[eidx] + b]),
                "w": pa.array(w[eidx]),
            }
        )

    return edges_ds.map_batches(_expand, batch_format="pyarrow",
                                zero_copy_batch=True)


def _sorted_member(sorted_vals: np.ndarray, x: np.ndarray) -> np.ndarray:
    if len(sorted_vals) == 0:
        return np.zeros(len(x), dtype=bool)
    pos = np.searchsorted(sorted_vals, x)
    pos = np.minimum(pos, len(sorted_vals) - 1)
    return sorted_vals[pos] == x


def spasgn(edges_ds, ri: np.ndarray, ci: np.ndarray, b_edges_ds):
    """``A(ri, ci) = B``: carve every A entry in the ``ri x ci`` cross
    product, then union in B's entries mapped through the index vectors
    (``b_edges_ds`` holds (src=i, dst=j, w) in B's local coordinates).
    ``ri`` / ``ci`` must be distinct (assignment targets)."""
    ri = np.asarray(ri, dtype=np.int64)
    ci = np.asarray(ci, dtype=np.int64)
    if len(np.unique(ri)) != len(ri) or len(np.unique(ci)) != len(ci):
        raise ValueError("SpAsgn requires distinct ri and ci")
    sets_ref = ray.put((np.sort(ri), np.sort(ci)))

    def _carve(batch: pa.Table, *, _ref=sets_ref) -> pa.Table:
        rset, cset = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        drop = _sorted_member(rset, src) & _sorted_member(cset, dst)
        return batch.filter(pa.array(~drop))

    vecs_ref = ray.put((ri, ci))

    def _embed(batch: pa.Table, *, _ref=vecs_ref) -> pa.Table:
        ri, ci = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        bi = np.asarray(batch.column("src"))
        bj = np.asarray(batch.column("dst"))
        return pa.table(
            {
                "src": pa.array(ri[bi]),
                "dst": pa.array(ci[bj]),
                "w": batch.column("w"),
            }
        )

    carved = edges_ds.map_batches(_carve, batch_format="pyarrow",
                                  zero_copy_batch=True)
    embedded = b_edges_ds.map_batches(_embed, batch_format="pyarrow",
                                      zero_copy_batch=True)
    return carved.union(embedded)
