"""Per-scale-factor graph context: corpus -> labels -> edges -> engines.

Everything is cached per (n, variant) inside the driver process so the
driver's correctness sweep (one query call after another on the same
sf_dir) reuses the materialized edge Dataset and the resident CSR actor
pools instead of rebuilding per query. CSR block checkpoints live under
/tmp/cbray/<n>/ and are reused across driver processes (resume path).

Label resolution is DISTRIBUTED (round 4): the context holds the
``VertexDict`` (sorted label chunks in the object store, driver keeps
per-chunk offsets only) and queries resolve output labels through
``ctx.gather_labels`` / ``ctx.decoder()`` — the `Extract` route pattern
(``CC.h:419-577``). ``ctx.labels`` / ``ctx.arith`` remain as LAZY
driver-side arrays for the toy-n long tail and tests; the steady query
path does not touch them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

import ray

from ..core.engine import SpmvEngine
from ..core.graph import Graph
from ..core.ids import VertexDict, assign_and_encode, encode_edges
from ..sources import corpus as corpus_src

CKPT_ROOT = os.environ.get("CBRAY_CKPT_ROOT", "/tmp/cbray")

# duplicate-combine policy per payload field (TwitterEdge::operator+=:
# follower ORs, count sums, latest maxes)
PAYLOAD_SPEC = {"follower": "or", "cnt": "sum", "latest": "max"}


def default_grid() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(8, int(np.ceil(np.sqrt(cpus)))))


@dataclass
class GraphContext:
    n: int
    vdict: VertexDict  # distributed label dictionary (chunk refs)
    edges: "ray.data.Dataset" = None  # deduped, loop-free, dense-id edges
    _graphs: dict = field(default_factory=dict)
    _engines: dict = field(default_factory=dict)
    _labels: np.ndarray | None = None
    _arith: np.ndarray | None = None

    # ---- distributed label resolution (steady path) ----

    def lookup_id(self, label: str) -> int:
        """label -> dense id via the owning dictionary chunk (no driver
        dictionary)."""
        return self.vdict.lookup_id(label)

    def gather_labels(self, ids: np.ndarray) -> np.ndarray:
        """labels[ids] via chunk-routed gather — O(len(ids)) driver memory."""
        return self.vdict.gather_labels(ids)

    def decoder(self):
        """Task-side id->label / id->arith resolver for map_batches."""
        return self.vdict.decoder()

    # ---- lazy driver arrays (toy-n convenience ONLY; not the query path
    # for the driver-window queries or anything iterative) ----

    # Hard ceiling for the toy-n lazies: past this a driver label array
    # would silently allocate GBs; fail loudly instead — callers must use
    # gather_labels / decoder / vdict.arith_slice_refs (all distributed).
    TOY_N_MAX = 50_000_000

    def _toy_n_guard(self, what: str) -> None:
        if self.n > self.TOY_N_MAX:
            raise RuntimeError(
                f"ctx.{what} materializes an O(n) driver array and is "
                f"gated to n <= {self.TOY_N_MAX} (n={self.n}); use "
                "gather_labels/decoder/vdict.arith_slice_refs instead"
            )

    @property
    def labels(self) -> np.ndarray:
        """Dense id -> label, materialized ON FIRST TOUCH (toy-n only)."""
        self._toy_n_guard("labels")
        if self._labels is None:
            self._labels = self.vdict.materialize_labels()
        return self._labels

    @property
    def arith(self) -> np.ndarray:
        """Dense id -> arithmetic file index (int(label[2:])), lazy."""
        self._toy_n_guard("arith")
        if self._arith is None:
            import pyarrow as pa
            import pyarrow.compute as pc

            self._arith = pc.cast(
                pc.utf8_slice_codeunits(pa.array(self.labels), 2), pa.int64()
            ).to_numpy()
        return self._arith

    # ---- graphs ----

    def graph(self, variant: str = "directed") -> Graph:
        if variant in self._graphs:
            return self._graphs[variant]
        base = Graph(n=self.n, edges=self.edges)
        if variant == "directed":
            g = base
        elif variant == "sym":
            # undirected view: A union A^T, lazily; structural w=1 dedup is
            # applied at block build (all copies of an edge hash to the same
            # block) or inside the triangle counter — no extra global shuffle
            g = Graph(
                n=self.n,
                edges=base.edges.union(base.transpose().edges).materialize(),
            )
        elif variant == "reverse":
            # transposed directed view (HITS hub direction)
            g = Graph(n=self.n, edges=base.transpose().edges)
        elif variant == "sssp":
            g = self._sssp_graph(base)
        elif variant == "dag":
            g = self._dag_graph(base)
        elif variant == "payload":
            g = self._payload_graph(base)
        else:
            raise ValueError(variant)
        self._graphs[variant] = g
        return g

    def _sssp_graph(self, base: Graph) -> Graph:
        """Directed graph with integer lengths len(u,v) = 1 + (au + 2*av) % 7
        over the *arithmetic* file ids (SQL-replicable) — arith resolved
        task-side through the dictionary decoder (no driver array)."""
        import pyarrow as pa

        dec = self.decoder()

        def _w(batch, *, _dec=dec):
            src = np.asarray(batch.column("src"))
            dst = np.asarray(batch.column("dst"))
            au, av = _dec.arith(src), _dec.arith(dst)
            w = (1 + (au + 2 * av) % 7).astype(np.float64)
            return pa.table({"src": batch.column("src"), "dst": batch.column("dst"),
                             "w": pa.array(w)})

        return Graph(n=self.n, edges=base.edges.map_batches(
            _w, batch_format="pyarrow", zero_copy_batch=True))

    def _dag_graph(self, base: Graph) -> Graph:
        """Acyclic orientation src < dst (dense label order, the
        `q_dag_layers` convention) with the sssp-style integer lengths
        len(u,v) = 1 + (au + 2*av) % 7 over the *arithmetic* file ids
        (SQL-replicable) — the weighted scheduling DAG for critical-path
        (max_plus) relaxation. Arith resolved task-side through the
        dictionary decoder (no driver array)."""
        import pyarrow as pa

        dec = self.decoder()

        def _w(batch, *, _dec=dec):
            src = np.asarray(batch.column("src"))
            dst = np.asarray(batch.column("dst"))
            keep = src < dst
            src, dst = src[keep], dst[keep]
            au, av = _dec.arith(src), _dec.arith(dst)
            w = (1 + (au + 2 * av) % 7).astype(np.float64)
            return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                             "w": pa.array(w)})

        return Graph(n=self.n, edges=base.edges.map_batches(
            _w, batch_format="pyarrow", zero_copy_batch=True))

    def _payload_graph(self, base: Graph) -> Graph:
        """Struct-nonzero edges (`TwitterEdge.h:15-58` analog) with
        SQL-replicable arithmetic payload fields over the arith file ids:
        follower = (a_src + a_dst) % 3 == 0, cnt = (a_src*7 + a_dst) % 5,
        latest = (a_src + 2*a_dst) % 1000."""
        import pyarrow as pa

        dec = self.decoder()

        def _p(batch, *, _dec=dec):
            a_s = _dec.arith(np.asarray(batch.column("src")))
            a_d = _dec.arith(np.asarray(batch.column("dst")))
            return pa.table({
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "w": batch.column("w"),
                "follower": pa.array(((a_s + a_d) % 3 == 0).astype(np.int8)),
                "cnt": pa.array(((a_s * 7 + a_d) % 5).astype(np.int32)),
                "latest": pa.array(((a_s + 2 * a_d) % 1000).astype(np.int64)),
            })

        return Graph(n=self.n, edges=base.edges.map_batches(
            _p, batch_format="pyarrow", zero_copy_batch=True))

    # ---- engines (resident CSR actor pools) ----

    def engine(self, variant: str = "directed", g: int | None = None) -> SpmvEngine:
        g = g or default_grid()
        key = (variant, g)
        if key in self._engines:
            return self._engines[key]
        ckpt = os.path.join(CKPT_ROOT, f"n{self.n}", f"{variant}_g{g}")
        # dir_bool / rev_bool: STRUCTURAL (w=1 distinct-pair) engines over
        # the directed / transposed views — the bool-matrix type
        # conversion of the reference (`SpParMat` bool casts), used by
        # fixed-iteration integer-exact apps (HITS)
        graph_variant = {"dir_bool": "directed", "rev_bool": "reverse"}.get(
            variant, variant
        )
        eng = SpmvEngine.from_graph(
            self.graph(graph_variant), g, ckpt,
            structural=variant in ("sym", "dir_bool", "rev_bool"),
            payload=(PAYLOAD_SPEC if variant == "payload" else None),
        )
        self._engines[key] = eng
        return eng

    def shutdown(self):
        for eng in self._engines.values():
            eng.shutdown()
        self._engines.clear()


_CTX: dict[int, GraphContext] = {}


def get_context(sf_dir: str) -> GraphContext:
    n = corpus_src.n_files_for(sf_dir)
    return get_context_for_n(n)


def get_context_for_n(n: int) -> GraphContext:
    if n in _CTX:
        return _CTX[n]
    blocks = max(8, n // 50_000)
    corpus = corpus_src.corpus_dataset(n, override_num_blocks=blocks)
    # ONE corpus scan: extract string-labeled edges, then derive the vertex
    # dictionary + dense ids from it (ReadGeneralizedTuples two-pass analog,
    # SpParMat.cpp:3889-3984, with the reread replaced by a materialized
    # intermediate).
    labeled = corpus_src.extract_labeled_edges(corpus).materialize()
    # distributed dictionary build + encode: the driver holds per-chunk
    # counts/offsets only; labels stay chunked in the object store
    vdict, encoded = assign_and_encode(labeled)
    if vdict.n != n:
        # isolated files (possible only at toy n) still get vertex ids —
        # broadcast fast path, since the dictionary must be amended
        labels = np.sort(
            np.unique(
                np.concatenate(
                    [vdict.materialize_labels(),
                     np.array([f"m_{i}" for i in range(n)])]
                )
            )
        )
        encoded = encode_edges(labeled, labels)
        vdict = VertexDict.from_labels(labels)
    # loop-drop fused into the dedup merge tasks (no separate filter pass)
    graph = Graph(n=n, edges=encoded).dedup_sum(drop_loops=True)
    ctx = GraphContext(n=n, vdict=vdict, edges=graph.edges.materialize())
    _CTX[n] = ctx
    return ctx
