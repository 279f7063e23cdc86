"""Driver-facing query callables: one per implemented operator/pipeline.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the DuckDB oracle in ``oracle/sqlgen.py`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.ids import labels_table
from ..sources import corpus as corpus_src
from . import algorithms as alg
from .context import get_context
from .pagerank import pagerank

PR_ITERS = 10
CC_ITERS = 12
BFS_ITERS = 12
SSSP_ITERS = 25
LP_ITERS = 5
LP_CLASSES = 10


def _label_col(ctx, ids: np.ndarray) -> pa.Array:
    return pa.array(np.asarray(ctx.labels)[ids], type=pa.string())


def q_corpus_scan(sf_dir: str):
    n = corpus_src.n_files_for(sf_dir)
    return corpus_src.content_sha_dataset(corpus_src.corpus_dataset(n))


def q_edge_table(sf_dir: str):
    ctx = get_context(sf_dir)
    lab_ref = None

    import ray

    lab_ref = ray.put(np.asarray(ctx.labels))

    def _decode(batch: pa.Table, *, _ref=lab_ref) -> pa.Table:
        labels = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        return pa.table(
            {
                "src_label": pa.array(labels[src], type=pa.string()),
                "dst_label": pa.array(labels[dst], type=pa.string()),
                "w": batch.column("w"),
            }
        )

    return ctx.edges.map_batches(_decode, batch_format="pyarrow")


def q_vertex_ids(sf_dir: str):
    ctx = get_context(sf_dir)
    return labels_table(ctx.labels)


def q_out_degrees(sf_dir: str):
    return _degrees(sf_dir, "src", "outdeg", "outw")


def q_in_degrees(sf_dir: str):
    return _degrees(sf_dir, "dst", "indeg", "inw")


def _degrees(sf_dir: str, key: str, cnt_name: str, w_name: str):
    import ray

    ctx = get_context(sf_dir)
    lab_ref = ray.put(np.asarray(ctx.labels))
    agg = ctx.graph("directed").degree_table("row" if key == "src" else "col")

    def _decode(batch: pa.Table, *, _ref=lab_ref) -> pa.Table:
        labels = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        v = np.asarray(batch.column("v"))
        return pa.table(
            {
                "label": pa.array(labels[v], type=pa.string()),
                cnt_name: batch.column("cnt"),
                w_name: batch.column("wsum"),
            }
        )

    return agg.map_batches(_decode, batch_format="pyarrow")


def _x_mod11(ctx) -> np.ndarray:
    return ((ctx.arith % 11) + 1).astype(np.float64)


def q_spmv_plus_times(sf_dir: str):
    ctx = get_context(sf_dir)
    y = ctx.engine("directed").spmv(_x_mod11(ctx), "plus_times")
    mask = y > 0
    ids = np.nonzero(mask)[0]
    return pa.table({"label": _label_col(ctx, ids), "y": pa.array(y[ids])})


def q_spmv_min_plus(sf_dir: str):
    ctx = get_context(sf_dir)
    x = _x_mod11(ctx)
    n = ctx.n
    # min over in-edges of (w + x[src]); identity +inf marks "no in-edge"
    eng = ctx.engine("directed")
    y = eng.spmv(x, "min_plus")
    ids = np.nonzero(np.isfinite(y))[0]
    return pa.table({"label": _label_col(ctx, ids), "y": pa.array(y[ids])})


def q_pagerank(sf_dir: str):
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    r, _ = pagerank(eng, iters=PR_ITERS)
    score = np.round(r * ctx.n, 6)
    ids = np.arange(ctx.n)
    return pa.table({"label": _label_col(ctx, ids), "score": pa.array(score)})


def q_connected_components(sf_dir: str):
    ctx = get_context(sf_dir)
    comp = alg.cc_fixed(ctx.engine("sym"), CC_ITERS)
    ids = np.arange(ctx.n)
    return pa.table(
        {"label": _label_col(ctx, ids), "comp": _label_col(ctx, comp)}
    )


def q_bfs(sf_dir: str):
    ctx = get_context(sf_dir)
    root = int(np.searchsorted(ctx.labels, "m_0"))
    d = alg.min_plus_distances(ctx.engine("sym"), root, iters=BFS_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "dist": pa.array(d[ids].astype(np.int64)),
        }
    )


def q_sssp(sf_dir: str):
    ctx = get_context(sf_dir)
    root = int(np.searchsorted(ctx.labels, "m_1"))
    d = alg.min_plus_distances(ctx.engine("sssp"), root, iters=SSSP_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table({"label": _label_col(ctx, ids), "dist": pa.array(d[ids])})


def q_label_propagation(sf_dir: str):
    ctx = get_context(sf_dir)
    init = (ctx.arith % LP_CLASSES).astype(np.int64)
    cls = alg.label_propagation(ctx.engine("sym"), init, LP_CLASSES, LP_ITERS)
    ids = np.arange(ctx.n)
    return pa.table({"label": _label_col(ctx, ids), "cls": pa.array(cls)})


def q_triangle_count(sf_dir: str):
    ctx = get_context(sf_dir)
    cnt = alg.triangle_count(ctx.graph("sym").edges, ctx.n)
    return pa.table({"triangles": pa.array([cnt], type=pa.int64())})
