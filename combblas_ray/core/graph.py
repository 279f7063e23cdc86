"""Edge-table Graph: the Ray-Data-native `SpParMat`.

A directed graph / sparse matrix is ONE `ray.data.Dataset` with schema
``(src:int64, dst:int64, w:float64)`` — the `DistEdgeList`/`SpTuples` triple
form of the reference (``DistEdgeList.h:81-108``, ``SpTuples.h:65``). All
structural operators below are lazy Dataset transforms; the iterative
numeric core lives in `engine.py` (resident CSR block actors).

Operator parity (reference file:line):
- ``dedup_sum``      <- `SpTuples::RemoveDuplicates` after ingest shuffle
                        (``SpParMat.cpp:2975-2978``)
- ``remove_loops``   <- `SpParMat::RemoveLoops` (``SpParMat.cpp:3270``)
- ``add_loops``      <- `SpParMat::AddLoops` (``SpParMat.cpp:3290,3307``)
- ``transpose``      <- `SpParMat::Transpose` (``SpParMat.cpp:3541``) —
                        a column swap; the physical exchange is deferred to
                        the next keyed shuffle.
- ``apply``/``prune``<- `SpParMat::Apply`/`Prune` (``SpParMat.h:147-189``)
- ``reduce``         <- `SpParMat::Reduce(dim, binop)` (``SpParMat.cpp:888``)
- ``symmetrize``     <- `A += A^T` (``TopDownBFS.cpp:162``,
                        ``SpParMat.cpp:741``)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pyarrow as pa


@dataclass
class Graph:
    """n vertices (dense ids 0..n-1) + a lazy edge Dataset (src, dst, w)."""

    n: int
    edges: "ray.data.Dataset"  # noqa: F821
    labels: Optional[np.ndarray] = None  # id -> label (sorted), if labeled

    # ---- per-batch maps / filters (embarrassingly parallel, zero-copy) ----

    def apply(self, np_fn) -> "Graph":
        """Map over nonzero values in place (`SpParMat::Apply`)."""

        def _apply(batch: pa.Table) -> pa.Table:
            w = np_fn(np.asarray(batch.column("w")))
            return batch.set_column(batch.schema.get_field_index("w"), "w", pa.array(w))

        return self._with(self.edges.map_batches(_apply, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def prune(self, mask_fn) -> "Graph":
        """Drop nonzeros where ``mask_fn(src, dst, w)`` is True (`Prune`/`PruneI`)."""

        def _prune(batch: pa.Table) -> pa.Table:
            m = mask_fn(
                np.asarray(batch.column("src")),
                np.asarray(batch.column("dst")),
                np.asarray(batch.column("w")),
            )
            return batch.filter(pa.array(~m))

        return self._with(self.edges.map_batches(_prune, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def ewise_scale(self, dense) -> "Graph":
        """`EWiseScale(DenseParMat)` (``SpParMat.cpp:2830``): multiply
        each nonzero elementwise by a dense matrix, w(i,j) *= D[i,j].
        ``dense`` is either an (n, n) ndarray (broadcast once via
        ``ray.put`` — the reference's only app use is small BC tallies,
        ``BetwCent.cpp:195``) or a callable ``(dst_ids, src_ids) ->
        factors`` (the functional dense matrix — the form that scales:
        nothing n x n ever materializes)."""
        import ray

        if callable(dense):
            def _sc(batch: pa.Table) -> pa.Table:
                src = np.asarray(batch.column("src"))
                dst = np.asarray(batch.column("dst"))
                w = np.asarray(batch.column("w")) * np.asarray(
                    dense(dst, src), dtype=np.float64
                )
                return pa.table(
                    {"src": batch.column("src"), "dst": batch.column("dst"),
                     "w": pa.array(w)}
                )
        else:
            d_ref = ray.put(np.asarray(dense, dtype=np.float64))

            def _sc(batch: pa.Table, *, _ref=d_ref) -> pa.Table:
                D = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
                src = np.asarray(batch.column("src"))
                dst = np.asarray(batch.column("dst"))
                w = np.asarray(batch.column("w")) * D[dst, src]
                return pa.table(
                    {"src": batch.column("src"), "dst": batch.column("dst"),
                     "w": pa.array(w)}
                )

        return self._with(self.edges.map_batches(_sc, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    _PRUNE_OPS = {
        "lt": np.less, "le": np.less_equal, "gt": np.greater,
        "ge": np.greater_equal, "eq": np.equal, "ne": np.not_equal,
    }

    def prune_column(self, pvals: np.ndarray, op: str = "lt") -> "Graph":
        """Standalone vector `PruneColumn(pvals, binary_op)`
        (``SpParMat.cpp:2578-2654``, local kernel ``dcsc.cpp:759-838``):
        DROP every nonzero A(i,j) where ``op(A(i,j), pvals[j])`` is true,
        column j = ``src`` under the M[dst,src] convention. ``pvals`` is
        broadcast once via ``ray.put`` and indexed per batch."""
        import ray

        if len(pvals) != self.n:
            raise ValueError("pvals length must equal n")
        p_ref = ray.put(np.asarray(pvals, dtype=np.float64))
        ufunc = self._PRUNE_OPS[op]

        def _pc(batch: pa.Table, *, _ref=p_ref) -> pa.Table:
            pv = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            w = np.asarray(batch.column("w"))
            src = np.asarray(batch.column("src"))
            return batch.filter(pa.array(~ufunc(w, pv[src])))

        return self._with(self.edges.map_batches(_pc, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def prune_column_refs(self, pvals_refs: list, bounds: list,
                          op: str = "lt") -> "Graph":
        """Chunked-refs `PruneColumn`: ``pvals`` arrives as per-range
        chunk refs aligned with ``bounds`` (the engine/VertexDict state
        form) — no O(n) driver array, no full-vector broadcast. Each map
        task fetches only the chunks its batch touches (plasma
        zero-copy, process-cached), so a task reading one block range
        ships one chunk."""
        ufunc = self._PRUNE_OPS[op]
        starts = np.asarray([s for s, _ in bounds], dtype=np.int64)
        refs = list(pvals_refs)

        def _pc(batch: pa.Table, *, _r=refs, _s=starts) -> pa.Table:
            src = np.asarray(batch.column("src"), dtype=np.int64)
            w = np.asarray(batch.column("w"))
            if len(src) == 0:
                return batch
            drop = np.zeros(len(src), dtype=bool)
            ks = np.searchsorted(_s, src, side="right") - 1
            for k in np.unique(ks):
                sel = ks == k
                pv = _cached_vec_chunk(_r[int(k)])
                drop[sel] = ufunc(w[sel], pv[src[sel] - _s[int(k)]])
            return batch.filter(pa.array(~drop))

        return self._with(self.edges.map_batches(_pc, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def reduce_dense_refs(self, dim: str, agg: str, bounds: list) -> list:
        """Densified `Reduce(dim, agg)` as chunk refs aligned with
        ``bounds`` (identity 0 where the dimension is empty) — the
        `FullyDistVec` result form without a driver-side dense vector:
        each reduce partition routes its (v, val) rows to owner ranges
        (num_returns=g split tasks), each owner scatter-assigns its
        slices into a dense chunk (v is globally unique after the keyed
        reduce). Pairs with `prune_column_refs` / `engine.dim_apply_refs`."""
        from ..core.shuffle import _rt0

        g = len(bounds)
        routed = []
        for t in self.reduce(dim, agg).to_arrow_refs():
            r = _rt0(_owsr_route).options(num_returns=g).remote(t, bounds)
            routed.append([r] if g == 1 else list(r))
        return [
            _rt0(_owsr_merge).remote(e - s, *[rt[k] for rt in routed])
            for k, (s, e) in enumerate(bounds)
        ]

    def out_weight_sums_refs(self, bounds: list) -> list:
        """Chunked-refs out-weight sums — the `MakeColStochastic` input
        without a driver-side dense vector."""
        return self.reduce_dense_refs("row", "sum", bounds)

    def prune_column_by_index(self, cols: np.ndarray) -> "Graph":
        """`PruneColumnByIndex(ci)` (``SpDCCols.cpp:574``,
        ``dcsc.cpp:840-898``): drop ALL nonzeros in the listed columns."""
        import ray

        c_ref = ray.put(np.unique(np.asarray(cols, dtype=np.int64)))

        def _pci(batch: pa.Table, *, _ref=c_ref) -> pa.Table:
            ci = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            src = np.asarray(batch.column("src"))
            pos = np.searchsorted(ci, src)
            pos = np.minimum(pos, len(ci) - 1) if len(ci) else pos
            hit = (ci[pos] == src) if len(ci) else np.zeros(len(src), bool)
            return batch.filter(pa.array(~hit))

        return self._with(self.edges.map_batches(_pci, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def remove_loops(self) -> "Graph":
        return self._with(self.edges.filter(expr="src != dst"))

    def add_loops(self, value: float = 1.0) -> "Graph":
        import ray

        n = self.n
        diag = ray.data.range(n).map_batches(
            lambda b: pa.table(
                {
                    "src": pa.array(b["id"].astype(np.int64)),
                    "dst": pa.array(b["id"].astype(np.int64)),
                    "w": pa.array(np.full(len(b["id"]), value, dtype=np.float64)),
                }
            ),
            batch_format="numpy",
        )
        return self._with(self.remove_loops().edges.union(diag))

    def transpose(self) -> "Graph":
        def _swap(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("dst"),
                    "dst": batch.column("src"),
                    "w": batch.column("w"),
                }
            )

        return self._with(self.edges.map_batches(_swap, batch_format="pyarrow",
                                                 zero_copy_batch=True))

    def cast_bool(self) -> "Graph":
        """Structure-only copy: w := 1.0 (bool-matrix conversion,
        ``SpParMat.h:206``, used at ``TopDownBFS.cpp:207``)."""
        return self.apply(lambda w: np.ones_like(w))

    # ---- shuffling operators ----

    def dedup_sum(self, plan: str = "tasks",
                  drop_loops: bool = False) -> "Graph":
        """Merge duplicate (src,dst) entries with +: batch-local combine,
        ONE exchange on the fused key, whole-partition numpy merge
        (`RemoveDuplicates` after the ingest exchange,
        ``SpParMat.cpp:2975-2978``). plan='tasks' (default) routes via
        warm num_cpus=0 tasks — the Ray Data hash-shuffle operator pays
        ~2s of actor-pool spawn per use on this box; plan='shuffle' keeps
        the Dataset-native hash repartition (equality is pytest-gated)."""
        from .shuffle import dedup_sum_tasks, group_sum_per_key, keyed_reduce

        n = self.n
        if plan == "tasks":
            return self._with(
                dedup_sum_tasks(self.edges, n, drop_loops=drop_loops))
        if drop_loops:  # shuffle plan: fall back to the filter pass
            return self._with(
                self.edges.filter(expr="src != dst")).dedup_sum("shuffle")

        def _partial(batch: pa.Table) -> pa.Table:
            src = np.asarray(batch.column("src"))
            dst = np.asarray(batch.column("dst"))
            w = np.asarray(batch.column("w"))
            uk, ws = group_sum_per_key(w, src * np.int64(n) + dst)
            return pa.table({"key": pa.array(uk), "w": pa.array(ws)})

        def _merge(batch: pa.Table) -> pa.Table:
            uk, ws = group_sum_per_key(
                np.asarray(batch.column("w")), np.asarray(batch.column("key"))
            )
            return pa.table(
                {
                    "src": pa.array((uk // n).astype(np.int64)),
                    "dst": pa.array((uk % n).astype(np.int64)),
                    "w": pa.array(ws.astype(np.float64)),
                }
            )

        # plan='shuffle' stays on the Ray-Data-native keyed_reduce ON
        # PURPOSE: it is the independent machinery that A/B-gates the
        # warm-task route (test_shuffle.py::test_dedup_sum_plans_agree)
        partial = self.edges.map_batches(_partial, batch_format="pyarrow",
                                         zero_copy_batch=True)
        return self._with(keyed_reduce(partial, ["key"], _merge))

    def symmetrize(self) -> "Graph":
        """A := A + A^T with overlap summed (`operator+=`, ``SpParMat.cpp:741``)."""
        return self._with(self.edges.union(self.transpose().edges)).dedup_sum()

    def union_max(self) -> "Graph":
        """Undirected structural view: A | A^T with w = 1 (no double count)."""
        g = self._with(self.cast_bool().edges.union(self.transpose().cast_bool().edges))
        return g.dedup_sum().apply(lambda w: np.ones_like(w))

    # ---- reductions ----

    def reduce(self, dim: str, agg: str = "sum", unop=None):
        """Per-row/column reduce of nonzeros (`SpParMat::Reduce`,
        ``SpParMat.cpp:888-1118``): batch-local partial reduce, one hash
        shuffle on the vertex key, whole-partition final reduce.

        dim='row' groups by ``src`` (out-direction), dim='col' by ``dst``.
        Returns a Dataset (v, val). ``unop`` maps w first (e.g. ``lambda w:
        np.ones_like(w)`` for degrees). agg in {sum, count, min, max} plus
        the binary-functor tail {band, bor, bxor, lxor, rand}
        (``Operations.h:184-293`` — MPI_BAND/BOR/BXOR/LXOR + RandReduce);
        count composes as sum of local counts, every other op is
        associative so partial and final use the same op.
        """
        from .shuffle import group_apply_tasks, group_reduce_per_key

        key = "src" if dim == "row" else "dst"
        final_ufn = {"sum": "sum", "count": "sum", "min": "min", "max": "max",
                     "band": "band", "bor": "bor", "bxor": "bxor",
                     "lxor": "lxor", "rand": "rand"}[agg]

        def _partial(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column(key))
            w = np.asarray(batch.column("w")).astype(np.float64)
            if unop is not None:
                w = unop(w)
            uk, red = group_reduce_per_key(w, v, agg if agg != "count" else "count")
            return pa.table({"v": pa.array(uk), "val": pa.array(red)})

        def _final(batch: pa.Table) -> pa.Table:
            uk, red = group_reduce_per_key(
                np.asarray(batch.column("val")),
                np.asarray(batch.column("v")),
                final_ufn,
            )
            return pa.table({"v": pa.array(uk), "val": pa.array(red)})

        partial = self.edges.map_batches(_partial, batch_format="pyarrow",
                                         zero_copy_batch=True)
        return group_apply_tasks(partial, ["v"], _final)

    def degree_table(self, dim: str):
        """(v, cnt, wsum) per src (dim='row') or dst (dim='col') — the
        degree/colsum composite used by the degree queries."""
        from .shuffle import group_apply_tasks, group_sum_per_key

        key = "src" if dim == "row" else "dst"

        def _partial(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column(key))
            w = np.asarray(batch.column("w")).astype(np.float64)
            uk, ws = group_sum_per_key(w, v)
            _, cnts = group_sum_per_key(np.ones_like(w), v)
            return pa.table(
                {"v": pa.array(uk), "cnt": pa.array(cnts), "wsum": pa.array(ws)}
            )

        def _final(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch.column("v"))
            uk, cnts = group_sum_per_key(np.asarray(batch.column("cnt")), v)
            _, ws = group_sum_per_key(np.asarray(batch.column("wsum")), v)
            return pa.table(
                {
                    "v": pa.array(uk),
                    "cnt": pa.array(cnts.astype(np.int64)),
                    "wsum": pa.array(ws),
                }
            )

        partial = self.edges.map_batches(_partial, batch_format="pyarrow",
                                         zero_copy_batch=True)
        return group_apply_tasks(partial, ["v"], _final)

    def out_weight_sums(self) -> np.ndarray:
        """Dense out-weight vector (driver-side, length n) — the
        `MakeColStochastic` input (``MCL.cpp:388-394``)."""
        import ray

        out = np.zeros(self.n, dtype=np.float64)
        for t in ray.get(self.reduce("row", "sum").to_arrow_refs()):
            if t.num_rows == 0 or "v" not in t.column_names:
                continue  # empty shuffle partitions may carry an empty schema
            out[np.asarray(t.column("v"), dtype=np.int64)] = np.asarray(
                t.column("val"), dtype=np.float64
            )
        return out

    # ---- generalized indexing (`SubsRef` / `SpAsgn`) ----

    def subsref(self, ri: np.ndarray, ci: np.ndarray) -> "Graph":
        """``B = A(ri, ci)`` with arbitrary (permuted, repeated, ri != ci)
        index vectors (``SpParMat.cpp:2030-2264``). Returns a
        ``len(ri) x len(ci)`` matrix as a Graph with edges (src=bi, dst=bj,
        w); ``n = max(len(ri), len(ci))``."""
        from .indexing import subsref as _subsref

        out = _subsref(self.edges, ri, ci).map_batches(
            lambda b: pa.table({"src": b.column("bi"), "dst": b.column("bj"),
                                "w": b.column("w")}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return Graph(n=max(len(ri), len(ci)), edges=out)

    def spasgn(self, ri: np.ndarray, ci: np.ndarray, B: "Graph") -> "Graph":
        """``A(ri, ci) = B`` for distinct index vectors
        (``SpParMat.cpp:2436-2482``)."""
        from .indexing import spasgn as _spasgn

        return self._with(_spasgn(self.edges, ri, ci, B.edges))

    def nnz(self) -> int:
        return self.edges.count()

    # ---- helpers ----

    def _with(self, edges) -> "Graph":
        return Graph(n=self.n, edges=edges, labels=self.labels)


# --------------------------------------------------------------------------
# chunked-refs helpers (module-level: cloudpickled into map tasks)
# --------------------------------------------------------------------------

_VEC_CHUNK_CACHE: dict = {}


def _cached_vec_chunk(ref) -> np.ndarray:
    """Per-process cache of fetched vector chunks (plasma zero-copy on
    the same node) — the `ids._cached_chunk` pattern for numeric state."""
    import ray

    if isinstance(ref, np.ndarray):
        return ref
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    hit = _VEC_CHUNK_CACHE.get(key)
    if hit is None:
        hit = np.asarray(ray.get(ref))
        if len(_VEC_CHUNK_CACHE) > 64:  # bound per-process memory
            _VEC_CHUNK_CACHE.clear()
        _VEC_CHUNK_CACHE[key] = hit
    return hit


def _owsr_route(tbl: pa.Table, bounds: list):
    """Split one (v, val) reduce partition by owner range."""
    if tbl.num_rows == 0 or "v" not in tbl.column_names:
        e = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        return e if len(bounds) == 1 else tuple(e for _ in bounds)
    v = np.asarray(tbl.column("v"), dtype=np.int64)
    val = np.asarray(tbl.column("val"), dtype=np.float64)
    out = []
    for (s, e) in bounds:
        sel = (v >= s) & (v < e)
        out.append((v[sel] - s, val[sel]))
    return out[0] if len(out) == 1 else tuple(out)


def _owsr_merge(nrows: int, *parts) -> np.ndarray:
    out = np.zeros(nrows, dtype=np.float64)
    for idx, vals in parts:
        out[idx] = vals  # reduce() made v globally unique: pure scatter
    return out
