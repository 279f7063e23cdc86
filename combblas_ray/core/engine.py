"""Resident CSR block engine — the iterative numeric core.

The reference keeps each rank's local sparse block (`spSeq`) resident for
the whole job (``SpParMat.h:448-449``) with preallocated SpMV buffers
(`OptimizeForGraph500`, ``SpParMat.cpp:3356-3455``). The Ray-native analog:

1. **Build**: the edge Dataset gets 2D block keys ``(br, bc)`` (dst-range x
   src-range, Owner arithmetic from `partition.py`), then ONE hash shuffle
   (``groupby(bid).map_groups``) materializes each block as a CSR `.npz`
   file under a checkpoint dir + a JSON manifest ``(bid, path, nnz, sha)``.
   This mirrors the reference ingest shuffle (`SparseCommon`,
   ``SpParMat.cpp:2906-2981``) and doubles as the resumable-lineage
   checkpoint: a rebuilt run with an existing complete manifest skips the
   shuffle entirely.

2. **Residency**: one `CsrBlockActor` per block loads its `.npz` once in
   ``__init__`` and serves per-iteration semiring SpMV partials from memory
   — the "stateful actor-pool workers holding resident CSR partitions
   across iterations" of the north star.

3. **Iteration**: the driver holds the vertex state as `gr` chunked numpy
   arrays in the object store (never one giant array), broadcasts each
   column chunk once per iteration (`ray.put`), actors return per-row-block
   partials, and small combine tasks reduce the `gc` partials per row block
   with the semiring's add (the `MergeContributions` step,
   ``ParFriends.h:2011-2178``).

Per-iteration data movement is ``O(n * (gr + gc) / g)`` — the classic 2D
SpMV communication volume — independent of nnz, so scaling to more nodes
adds compute without inflating the shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray

from .partition import chunk_bounds, local_size, owner
from .semiring import Semiring, get_semiring

MANIFEST_NAME = "manifest.json"


# --------------------------------------------------------------------------
# block build (one shuffle, checkpointed)
# --------------------------------------------------------------------------


def _block_file(ckpt_dir: str, bid: int) -> str:
    return os.path.join(ckpt_dir, f"block_{bid:06d}.npz")


def build_blocks(graph, g: int, ckpt_dir: str, *, resume: bool = True) -> dict:
    """Shuffle the edge table into a g x g block grid of CSR .npz files.

    Returns the manifest dict. If ``resume`` and a complete manifest exists
    (same n/g), the shuffle is skipped (checkpoint/resume path).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    mpath = os.path.join(ckpt_dir, MANIFEST_NAME)
    if resume and os.path.exists(mpath):
        with open(mpath) as f:
            man = json.load(f)
        if (
            man.get("complete")
            and man["n"] == graph.n
            and man["g"] == g
            and all(os.path.exists(b["path"]) for b in man["blocks"])
        ):
            return man

    n, gr, gc = graph.n, g, g

    def _key(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        br = owner(dst, n, gr)
        bc = owner(src, n, gc)
        return batch.append_column("bid", pa.array(br * gc + bc))

    keyed = graph.edges.map_batches(_key, batch_format="pyarrow", zero_copy_batch=True)

    ls_r = local_size(n, gr)
    ls_c = local_size(n, gc)

    def _build(group: pa.Table) -> pa.Table:
        bid = int(group.column("bid")[0].as_py())
        br, bc = bid // gc, bid % gc
        row0, col0 = br * ls_r, bc * ls_c
        nr = (n - row0) if br == gr - 1 else ls_r
        rows = (np.asarray(group.column("dst")) - row0).astype(np.int64)
        cols = (np.asarray(group.column("src")) - col0).astype(np.int64)
        w = np.asarray(group.column("w")).astype(np.float64)
        # local dedup-sum (SpTuples::RemoveDuplicates, SpParMat.cpp:2975-2978)
        key = rows * np.int64(n) + cols
        uk, inv = np.unique(key, return_inverse=True)
        w = np.bincount(inv, weights=w)
        rows = (uk // n).astype(np.int32)
        cols = (uk % n).astype(np.int32)
        # CSR layout: np.unique returned keys sorted => already row-major
        indptr = np.zeros(nr + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        path = _block_file(ckpt_dir, bid)
        tmp = path + ".tmp.npz"
        np.savez(tmp, indptr=indptr, rows=rows, cols=cols, w=w,
                 meta=np.array([bid, br, bc, row0, col0, nr], dtype=np.int64))
        os.replace(tmp, path)
        sha = hashlib.sha256(
            rows.tobytes() + cols.tobytes() + w.tobytes()
        ).hexdigest()[:16]
        return pa.table(
            {
                "bid": [bid],
                "br": [br],
                "bc": [bc],
                "path": [path],
                "nnz": [len(w)],
                "sha": [sha],
            }
        )

    man_rows = (
        keyed.groupby("bid")
        .map_groups(_build, batch_format="pyarrow")
        .take_all()
    )
    man = {
        "n": n,
        "g": g,
        "complete": True,
        "blocks": sorted(
            ({k: r[k] for k in ("bid", "br", "bc", "path", "nnz", "sha")} for r in man_rows),
            key=lambda b: b["bid"],
        ),
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mpath)
    return man


# --------------------------------------------------------------------------
# resident block actors
# --------------------------------------------------------------------------


@ray.remote
class CsrBlockActor:
    """Holds one CSR block resident; serves semiring SpMV partials.

    Setup cost (file load, CSR/CSC indexing) is paid once in __init__ —
    never per iteration (`OptimizeForGraph500` analog).
    """

    def __init__(self, path: str):
        z = np.load(path)
        self.indptr = z["indptr"]
        self.rows = z["rows"].astype(np.int64)
        self.cols = z["cols"].astype(np.int64)
        self.w = z["w"]
        meta = z["meta"]
        self.bid, self.br, self.bc = int(meta[0]), int(meta[1]), int(meta[2])
        self.nr = int(meta[5])
        self._csc = None  # built lazily for sparse-frontier SpMSpV

    def ping(self) -> int:
        return self.bid

    def spmv_partial(self, x_chunk: np.ndarray, sr_name: str) -> np.ndarray:
        """Dense-input SpMV partial for this block: y_local = A_blk (x) x_chunk."""
        sr = get_semiring(sr_name)
        vals = sr.mul(self.w, x_chunk[self.cols])
        if sr.is_plus:
            return np.bincount(self.rows, weights=vals, minlength=self.nr).astype(
                np.float64, copy=False
            )
        return sr.reduce_segments(vals, self.indptr)

    def _ensure_csc(self):
        if self._csc is None:
            order = np.lexsort((self.rows, self.cols))
            self._csc = (
                self.cols[order],
                self.rows[order],
                self.w[order],
            )
            nc_max = int(self._csc[0].max()) + 1 if len(self._csc[0]) else 0
            indptr = np.zeros(nc_max + 1, dtype=np.int64)
            np.add.at(indptr, self._csc[0] + 1, 1)
            np.cumsum(indptr, out=indptr)
            self._csc = self._csc + (indptr,)

    def spmspv_partial(
        self, frontier_idx: np.ndarray, frontier_val: np.ndarray, sr_name: str
    ):
        """Sparse-frontier SpMV (SpMSpV, ``ParFriends.h:2179-2336``):
        frontier indices are local to this block's column range. Returns
        (row_ids_local, vals) partial pairs (unmerged)."""
        sr = get_semiring(sr_name)
        self._ensure_csc()
        ccols, crows, cw, cindptr = self._csc
        nc = len(cindptr) - 1
        sel = frontier_idx[frontier_idx < nc]
        fval = frontier_val[frontier_idx < nc]
        starts, ends = cindptr[sel], cindptr[sel + 1]
        lens = ends - starts
        if lens.sum() == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        # expand [starts, ends) ranges vectorized
        idx = np.repeat(starts, lens) + (
            np.arange(lens.sum()) - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1], lens)
        )
        xv = np.repeat(fval, lens)
        vals = sr.mul(cw[idx], xv)
        rows = crows[idx]
        # local merge per row before shipping (partial combine)
        ur, inv = np.unique(rows, return_inverse=True)
        if sr.is_plus:
            merged = np.bincount(inv, weights=vals)
        else:
            merged = np.full(len(ur), sr.identity, dtype=np.float64)
            sr.add_ufunc.at(merged, inv, vals)
        return ur, merged

    def col_sums(self) -> np.ndarray:
        """Partial out-weight sums for this block's src (column) range —
        `Reduce(Row, plus)` fused into the resident blocks."""
        nc = int(self.cols.max()) + 1 if len(self.cols) else 0
        return np.bincount(self.cols, weights=self.w, minlength=nc)

    def row_sums(self) -> np.ndarray:
        return np.bincount(self.rows, weights=self.w, minlength=self.nr)

    def row_counts(self) -> np.ndarray:
        return np.bincount(self.rows, minlength=self.nr).astype(np.float64)


@ray.remote
def _combine(sr_name: str, nrows: int, *parts: np.ndarray) -> np.ndarray:
    """Merge per-row-block partials with the semiring add (MergeContributions)."""
    sr = get_semiring(sr_name)
    out = sr.empty(nrows)
    for p in parts:
        if len(p) < nrows:
            q = sr.empty(nrows)
            q[: len(p)] = p
            p = q
        out = sr.combine(out, p)
    return out


# --------------------------------------------------------------------------
# the engine
# --------------------------------------------------------------------------


@dataclass
class SpmvEngine:
    n: int
    g: int
    manifest: dict
    actors: dict = field(default_factory=dict)  # bid -> actor
    bounds: list = field(default_factory=list)

    @classmethod
    def from_graph(cls, graph, g: int, ckpt_dir: str, *, resume: bool = True):
        man = build_blocks(graph, g, ckpt_dir, resume=resume)
        return cls.from_manifest(man)

    @classmethod
    def from_manifest(cls, man: dict):
        n, g = man["n"], man["g"]
        actors = {
            b["bid"]: CsrBlockActor.remote(b["path"]) for b in man["blocks"]
        }
        eng = cls(n=n, g=g, manifest=man, actors=actors,
                  bounds=chunk_bounds(n, g))
        # block until all actors have loaded their blocks
        ray.get([a.ping.remote() for a in actors.values()])
        return eng

    # ---- chunked vertex-vector helpers ----

    def chunk(self, x: np.ndarray) -> list:
        return [ray.put(np.ascontiguousarray(x[s:e])) for s, e in self.bounds]

    def unchunk(self, refs: list) -> np.ndarray:
        return np.concatenate([np.asarray(c) for c in ray.get(refs)])

    def chunk_sizes(self) -> list[int]:
        return [e - s for s, e in self.bounds]

    # ---- SpMV ----

    def spmv_refs(self, x_refs: list, sr: Semiring | str) -> list:
        """Chunked y = A (x) over the semiring; x_refs/y_refs are per-chunk
        ObjectRefs (the driver never touches full vectors here)."""
        sr = get_semiring(sr)
        partials: dict[int, list] = {br: [] for br in range(self.g)}
        for bid, actor in self.actors.items():
            br, bc = bid // self.g, bid % self.g
            partials[br].append(actor.spmv_partial.remote(x_refs[bc], sr.name))
        out = []
        for br in range(self.g):
            nrows = self.bounds[br][1] - self.bounds[br][0]
            out.append(_combine.remote(sr.name, nrows, *partials[br]))
        return out

    def spmv(self, x: np.ndarray, sr: Semiring | str) -> np.ndarray:
        return self.unchunk(self.spmv_refs(self.chunk(x), sr))

    # ---- fused reductions over resident blocks ----

    def out_weights(self) -> np.ndarray:
        """Dense out-weight vector (sum of w per src)."""
        parts: dict[int, list] = {bc: [] for bc in range(self.g)}
        for bid, actor in self.actors.items():
            parts[bid % self.g].append(actor.col_sums.remote())
        chunks = []
        for bc in range(self.g):
            ncols = self.bounds[bc][1] - self.bounds[bc][0]
            chunks.append(_combine.remote("plus_times", ncols, *parts[bc]))
        return self.unchunk(chunks)

    def in_weights(self) -> np.ndarray:
        parts: dict[int, list] = {br: [] for br in range(self.g)}
        for bid, actor in self.actors.items():
            parts[bid // self.g].append(actor.row_sums.remote())
        chunks = []
        for br in range(self.g):
            nrows = self.bounds[br][1] - self.bounds[br][0]
            chunks.append(_combine.remote("plus_times", nrows, *parts[br]))
        return self.unchunk(chunks)

    def load_imbalance(self) -> float:
        """max block nnz / mean block nnz (`LoadImbalance`, ``SpParMat.h:99``)."""
        nnzs = [b["nnz"] for b in self.manifest["blocks"]]
        full = nnzs + [0] * (self.g * self.g - len(nnzs))
        mean = sum(full) / len(full) if full else 0.0
        return (max(full) / mean) if mean else 0.0

    def shutdown(self):
        for a in self.actors.values():
            ray.kill(a)
        self.actors = {}
