"""Driver-facing query callables: one per implemented operator/pipeline.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the DuckDB oracle in ``oracle/sqlgen.py`` exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.ids import labels_table
from ..util import ibincount
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
    """labels[ids] via the chunk-routed distributed gather
    (`VertexDict.gather_labels`, the Extract pattern of CC.h:419-577) —
    O(len(ids)) driver memory; the dictionary never materializes."""
    return pa.array(ctx.gather_labels(ids), type=pa.string())


def _pack20(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Pack (hi, lo) into one int64 key (hi << 20 | lo). ASSERTS the
    fields fit their widths so out-of-range scale factors fail loudly
    instead of silently colliding (round-3 advice: l_partkey exceeds
    2^20 at TPC-H SF ~5.3, suppkey at SF ~105)."""
    if len(lo) and (int(lo.max()) >= 1 << 20 or int(hi.max()) >= 1 << 43):
        raise NotImplementedError(
            "packed (hi<<20|lo) key: a field exceeds its width at this "
            "scale factor; widen the packing"
        )
    return hi << 20 | lo


def q_corpus_scan(sf_dir: str):
    n = corpus_src.n_files_for(sf_dir)
    return corpus_src.content_sha_dataset(corpus_src.corpus_dataset(n))


def q_edge_table(sf_dir: str):
    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _decode(batch: pa.Table, *, _dec=dec) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        return pa.table(
            {
                "src_label": _dec.take(src),
                "dst_label": _dec.take(dst),
                "w": batch.column("w"),
            }
        )

    return ctx.edges.map_batches(_decode, batch_format="pyarrow")


def q_vertex_ids(sf_dir: str):
    """The (vid, label) distmapper as a Dataset assembled per dictionary
    chunk — no driver-side label array."""
    from ..core.ids import vertex_ids_dataset

    ctx = get_context(sf_dir)
    return vertex_ids_dataset(ctx.vdict)


def q_out_degrees(sf_dir: str):
    return _degrees(sf_dir, "src", "outdeg", "outw")


def q_in_degrees(sf_dir: str):
    return _degrees(sf_dir, "dst", "indeg", "inw")


def _degrees(sf_dir: str, key: str, cnt_name: str, w_name: str):
    ctx = get_context(sf_dir)
    dec = ctx.decoder()
    agg = ctx.graph("directed").degree_table("row" if key == "src" else "col")

    def _decode(batch: pa.Table, *, _dec=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {
                "label": _dec.take(v),
                cnt_name: batch.column("cnt"),
                w_name: batch.column("wsum"),
            }
        )

    return agg.map_batches(_decode, batch_format="pyarrow")


def _x_mod11_kernel(a: np.ndarray) -> np.ndarray:
    return ((a % 11) + 1).astype(np.float64)


def _x_mod11_refs(ctx, eng) -> list:
    """x[v] = (arith(v) % 11) + 1 as engine-aligned chunk refs (generated
    from the dictionary chunks — no O(n) driver array)."""
    return eng.map_chunks(_x_mod11_kernel,
                          ctx.vdict.arith_slice_refs(eng.bounds))


def q_spmv_plus_times(sf_dir: str):
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    y = eng.unchunk(eng.spmv_refs(_x_mod11_refs(ctx, eng), "plus_times"))
    mask = y > 0
    ids = np.nonzero(mask)[0]
    return pa.table({"label": _label_col(ctx, ids), "y": pa.array(y[ids])})


def q_spmv_min_plus(sf_dir: str):
    ctx = get_context(sf_dir)
    # min over in-edges of (w + x[src]); identity +inf marks "no in-edge"
    eng = ctx.engine("directed")
    y = eng.unchunk(eng.spmv_refs(_x_mod11_refs(ctx, eng), "min_plus"))
    ids = np.nonzero(np.isfinite(y))[0]
    return pa.table({"label": _label_col(ctx, ids), "y": pa.array(y[ids])})


def _seed_mod_kernel(a: np.ndarray, mod: int = 97) -> np.ndarray:
    return (a % mod == 0).astype(np.float64)


def _reach_max_f(r, y, bounds):
    return np.maximum(r, y)


def q_reach2_bool(sf_dir: str):
    """Vertices reachable within 2 hops of the seed set (arith % 97 == 0),
    via two `bool_or_and` SpMVs — the BoolCopy*SRing structural semiring
    (Semirings.h + Operations.h catalog tail). Seeds generated per chunk;
    the reach vector stays chunked refs (fused SpMV+max rounds)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    r = eng.map_chunks(_seed_mod_kernel,
                       ctx.vdict.arith_slice_refs(eng.bounds))
    for _ in range(2):
        r = eng.spmv_apply_refs(r, "bool_or_and", _reach_max_f, 1, r)[0]
    rv = eng.unchunk(r)
    ids = np.nonzero(rv > 0)[0]
    return pa.table({"label": _label_col(ctx, ids)})


def q_harmonic2(sf_dir: str):
    """Distance-limited harmonic centrality h(v) = c1(v) + c2(v)/2 over
    the undirected structural graph, where c1 = distinct 1-hop and c2 =
    distinct 2-hop-only neighbors: ONE boolean SpGEMM (distinct wedge
    endpoints, add='max') with 1-hop pairs removed by the anti
    coordinate mask and loops dropped in the count partial. c2/2 is
    dyadic so the float column is bit-exact vs SQL."""
    return harmonic2_table(get_context(sf_dir))


def harmonic2_table(ctx):
    g = ctx.graph("sym")
    n = ctx.n
    from ..core import spgemm as SG
    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    c1 = ctx.engine("sym").in_weights().astype(np.int64)
    # shuffle width sized from the EXACT wedge volume sum(deg^2) — the
    # 2-hop expansion amplifies hub rows ~160x on this corpus, so the
    # edge-count heuristic undersizes badly (16 -> 40 parts = 6x here)
    wedges = float((c1.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    two = SG.spgemm_tasks(g.edges, g.edges, n, add="max",
                          num_partitions=gp)
    # anti-mask removes 1-hop pairs; loops (i,i) are absent from the
    # loop-free mask, so they survive here and are dropped inside the
    # count partial (saves a third full pass over the 2-hop table)
    two = SG.coordinate_mask(two, g.edges, n, anti=True,
                             num_partitions=gp)

    def _cnt_p(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"))
        keep = s != np.asarray(b.column("dst"))
        uk, c = group_sum_per_key(
            np.ones(int(keep.sum())), s[keep])
        return pa.table({"v": pa.array(uk), "c": pa.array(c)})

    def _cnt_m(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(np.asarray(t.column("c")),
                                  np.asarray(t.column("v")))
        return pa.table({"v": pa.array(uk), "c": pa.array(s)})

    cnts = group_apply_tasks(
        two.map_batches(_cnt_p, batch_format="pyarrow"), ["v"], _cnt_m
    ).to_pandas()
    c2 = np.zeros(n, dtype=np.int64)
    c2[cnts["v"].to_numpy(dtype=np.int64)] = cnts["c"].to_numpy(
        dtype=np.int64)
    ids = np.arange(n)
    return pa.table({
        "label": _label_col(ctx, ids),
        "c1": pa.array(c1),
        "c2": pa.array(c2),
        "harmonic": pa.array(c1 + 0.5 * c2),
    })


LP_CN_TOPK = 100
LP_CN_MIN = 2


def q_link_predict_cn(sf_dir: str):
    """Common-neighbors link prediction: for every non-adjacent vertex
    pair (a < b) with >= LP_CN_MIN shared neighbors, the shared-neighbor
    count (integer-exact), top-LP_CN_TOPK by (cn DESC, a, b). One
    add='sum' structural SpGEMM (wedge multiplicity = common-neighbor
    count) + the anti coordinate mask; the i<j/threshold cut is fused
    into the count partial; global top-k via sort+limit on the
    thresholded survivors."""
    return link_predict_cn_table(get_context(sf_dir))


def link_predict_cn_table(ctx):
    g = ctx.graph("sym")
    n = ctx.n
    from ..core import spgemm as SG

    c1 = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((c1.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    # structural distinct-pair cast: the lazy sym view is A union A^T
    # WITHOUT dedup (bidirectional edges appear twice; block build
    # normally dedups), and add='sum' must count WEDGES — 1 per distinct
    # common neighbor — so dedup first, then w := 1
    be = g.dedup_sum().cast_bool().edges
    cn = SG.spgemm_tasks(be, be, n, add="sum", num_partitions=gp)
    cn = SG.coordinate_mask(cn, g.edges, n, anti=True, num_partitions=gp)

    def _cut(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"))
        d = np.asarray(b.column("dst"))
        w = np.asarray(b.column("w"))
        keep = (s < d) & (w >= LP_CN_MIN)
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep]),
                         "cn": pa.array(w[keep].astype(np.int64))})

    top = (cn.map_batches(_cut, batch_format="pyarrow")
             .sort(["cn", "a", "b"], descending=[True, False, False])
             .limit(LP_CN_TOPK).to_pandas())
    return pa.table({
        "a": pa.array(ctx.gather_labels(top["a"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "b": pa.array(ctx.gather_labels(top["b"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "cn": pa.array(top["cn"].to_numpy(dtype=np.int64)),
    })


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
    root = ctx.lookup_id("m_0")
    d = alg.min_plus_distances(ctx.engine("sym"), root, iters=BFS_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "dist": pa.array(d[ids].astype(np.int64)),
        }
    )


KATZ_ITERS = 3
KATZ_ALPHA = 0.125  # power of two -> dyadic-exact float64 iteration


def q_katz_fixed(sf_dir: str):
    """Katz centrality after exactly KATZ_ITERS un-normalized truncated
    iterations (x = 1 + alpha*A^T x) over the structural directed graph;
    alpha = 1/8 keeps every value a dyadic rational, so the float column
    is bit-exact vs the SQL oracle (see `alg.katz_fixed`)."""
    ctx = get_context(sf_dir)
    katz = alg.katz_fixed(ctx.engine("dir_bool"), KATZ_ITERS, KATZ_ALPHA)
    ids = np.arange(ctx.n)
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "katz": pa.array(katz),
        }
    )


def q_bfs_sigma(sf_dir: str):
    """Shortest-path counts from m_0 over the undirected structural
    graph (the sigma phase of Brandes betweenness as a standalone
    operator; integer-exact, see `alg.bfs_sigma`)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    d, sig = alg.bfs_sigma(ctx.engine("sym"), root, iters=BFS_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "dist": pa.array(d[ids].astype(np.int64)),
            "sigma": pa.array(sig[ids].astype(np.int64)),
        }
    )


MSBFS_MOD = 97


def _reached_pairs(d_chunk, bounds):
    """(global ids, int dists) of the reached rows in a distance chunk."""
    s, _e = bounds
    loc = np.nonzero(np.isfinite(d_chunk))[0]
    return loc.astype(np.int64) + s, d_chunk[loc].astype(np.int64)


def _dist_hist_part(d_chunk):
    """Per-chunk (dist, count) histogram of reached rows."""
    dd = d_chunk[np.isfinite(d_chunk)].astype(np.int64)
    uk, c = np.unique(dd, return_counts=True)
    return uk, c.astype(np.int64)


def q_msbfs(sf_dir: str):
    """Multi-source BFS: hop distance to the nearest seed (arith %% 97
    == 0) within BFS_ITERS levels over the undirected structural graph
    (see `alg.msbfs_mod_distances_refs`). Unreached vertices are
    omitted. Refs-only: seeds generated per chunk from the dictionary's
    arith slices, distances stay chunked; the driver assembles only the
    output rows."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    d_refs = alg.msbfs_mod_distances_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), MSBFS_MOD,
        iters=BFS_ITERS)
    gi, dd = eng.map_chunks_n(_reached_pairs, 2, d_refs,
                              with_bounds=True)
    ids = np.concatenate(ray.get(gi))
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "dist": pa.array(np.concatenate(ray.get(dd))),
        }
    )


def q_sssp(sf_dir: str):
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_1")
    d = alg.min_plus_distances(ctx.engine("sssp"), root, iters=SSSP_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table({"label": _label_col(ctx, ids), "dist": pa.array(d[ids])})


def _lp_init_kernel(a: np.ndarray) -> np.ndarray:
    return alg.lp_mod_init_kernel(a, LP_CLASSES)


def q_label_propagation(sf_dir: str):
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    # init classes generated per chunk from the dictionary (arith % k) —
    # no O(n) driver array in the steady path
    init_refs = eng.map_chunks(
        partial(alg.lp_mod_init_kernel, num_classes=LP_CLASSES),
        ctx.vdict.arith_slice_refs(eng.bounds))
    cls = alg.label_propagation(eng, init_refs, LP_CLASSES, LP_ITERS)
    ids = np.arange(ctx.n)
    return pa.table({"label": _label_col(ctx, ids), "cls": pa.array(cls)})


def q_triangle_count(sf_dir: str):
    ctx = get_context(sf_dir)
    cnt = alg.triangle_count(ctx.graph("sym").edges, ctx.n, method="join")
    return pa.table({"triangles": pa.array([cnt], type=pa.int64())})


# ---------------------------------------------------------------------------
# wave 2: SpGEMM / EWise joins / selects / vector ops / relational breadth
# ---------------------------------------------------------------------------


def _decode_edge_labels(ctx, ds, val_name="w"):
    dec = ctx.decoder()

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        return pa.table(
            {
                "src_label": _d.take(src),
                "dst_label": _d.take(dst),
                val_name: batch.column("w"),
            }
        )

    return ds.map_batches(_dec, batch_format="pyarrow")


def q_spgemm_aa(sf_dir: str):
    """C = A*A (plus_times) as an edge table — `Mult_AnXBn_Synch` analog."""
    from ..core.spgemm import spgemm

    ctx = get_context(sf_dir)
    C = spgemm(ctx.edges, ctx.edges, ctx.n)
    return _decode_edge_labels(ctx, C, "val")


def q_ewise_mult(sf_dir: str):
    """A .* A^T (inner coordinate join, product) — `EWiseMult exclude=false`."""
    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    g = ctx.graph("directed")
    at = g.transpose().edges.rename_columns({"w": "w_b"})

    def _mul(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch.column("w")) * np.asarray(batch.column("w_b"))
        return pa.table(
            {"src": batch.column("src"), "dst": batch.column("dst"),
             "w": pa.array(w)}
        )

    j = hash_join_tasks(ctx.edges, at, on=("src", "dst"), post=_mul)
    return _decode_edge_labels(ctx, j, "val")


def q_set_difference(sf_dir: str):
    """A minus A^T (structural anti join) — `SetDifference` SpParMat.cpp:2815."""
    from ..core.spgemm import coordinate_mask

    ctx = get_context(sf_dir)
    at = ctx.graph("directed").transpose().edges
    out = coordinate_mask(ctx.edges, at, ctx.n, anti=True)
    return _decode_edge_labels(ctx, out, "w")


def q_kselect2(sf_dir: str):
    """Per-column 2nd-largest nonzero value — `Kselect` (SpParMat.cpp:1120)."""
    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _local(batch: pa.Table) -> pa.Table:
        dst = np.asarray(batch.column("dst"))
        w = np.asarray(batch.column("w"))
        order = np.lexsort((-w, dst))
        dst, w = dst[order], w[order]
        uk, starts = np.unique(dst, return_index=True)
        ends = np.append(starts[1:], len(dst))
        keep = ends - starts >= 2
        return pa.table(
            {
                "v": pa.array(uk[keep]),
                "val": pa.array(w[starts[keep] + 1]),
            }
        )

    # dst-partitioned: every column's nonzeros land in one partition, so the
    # local top-k IS the global top-k (no distributed median machinery needed)
    part = group_apply_tasks(ctx.edges, ["dst"], _local)

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {"label": _d.take(v),
             "v2": batch.column("val")}
        )

    return part.map_batches(_dec, batch_format="pyarrow")


def q_reduce_colmax(sf_dir: str):
    """Per-column max — `Reduce(Column, maximum)`."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()
    red = ctx.graph("directed").reduce("col", "max")

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {"label": _d.take(v),
             "maxw": batch.column("val")}
        )

    return red.map_batches(_dec, batch_format="pyarrow")


def q_subgraph(sf_dir: str):
    """Induced subgraph on vertices with arith id % 3 == 0, densely
    re-indexed — `SubsRef` A(ri,ri) (SpParMat.cpp:2030)."""
    ctx = get_context(sf_dir)
    import ray

    sel_mask = ctx.arith % 3 == 0
    sel_ids = np.nonzero(sel_mask)[0]  # dense ids, ascending = label-sorted
    sel_ref = ray.put(sel_ids)

    def _filter(batch: pa.Table, *, _ref=sel_ref) -> pa.Table:
        sel = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        si = np.searchsorted(sel, src)
        sj = np.searchsorted(sel, dst)
        si = np.minimum(si, len(sel) - 1)
        sj = np.minimum(sj, len(sel) - 1)
        keep = (sel[si] == src) & (sel[sj] == dst)
        return pa.table(
            {
                "si": pa.array(si[keep].astype(np.int64)),
                "sj": pa.array(sj[keep].astype(np.int64)),
                "w": pc.filter(batch.column("w"), pa.array(keep)),
            }
        )

    return ctx.edges.map_batches(_filter, batch_format="pyarrow",
                                 zero_copy_batch=True)


def q_invert_vec(sf_dir: str):
    """Invert the vector val[i] = (7i+3) % n (arith space): out[y] = min i —
    `FullyDistSpVec::Invert` (FullyDistSpVec.cpp:1900)."""
    from ..core import vecops

    ctx = get_context(sf_dir)
    n = ctx.n
    import ray

    def _vec(batch) -> pa.Table:
        ids = batch["id"].astype(np.int64)
        return pa.table(
            {"v": pa.array(ids), "val": pa.array((7 * ids + 3) % n)}
        )

    vec = ray.data.range(n).map_batches(_vec, batch_format="numpy")
    inv = vecops.invert(vec, dup="min")
    return inv.map_batches(
        lambda b: pa.table({"y": b.column("v"), "i": b.column("val")}),
        batch_format="pyarrow",
    )


def q_uniq_degrees(sf_dir: str):
    """Distinct in-degree values, keeping the lexicographically-least vertex
    as representative — `FullyDistSpVec::Uniq` (FullyDistSpVec.cpp:890)."""
    from ..core import vecops

    ctx = get_context(sf_dir)
    dec = ctx.decoder()
    deg = ctx.graph("directed").reduce("col", "count")
    uq = vecops.uniq(deg, rep="min")

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {
                "deg": pa.array(np.asarray(batch.column("val")).astype(np.int64)),
                "label": _d.take(v),
            }
        )

    return uq.map_batches(_dec, batch_format="pyarrow")


def q_prune_w2(sf_dir: str):
    """Edges with multiplicity >= 2 — `Prune` (SpParMat.h:177)."""
    ctx = get_context(sf_dir)
    pruned = ctx.graph("directed").prune(lambda s, d, w: w < 2.0)
    return _decode_edge_labels(ctx, pruned.edges, "w")


def q_bandwidth(sf_dir: str):
    """max |i - j| over edges in arithmetic id space — `Bandwidth()`
    (SpParMat.cpp:1743). One row."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _bw(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = _d.arith(np.asarray(batch.column("src")))
        dst = _d.arith(np.asarray(batch.column("dst")))
        m = int(np.abs(src - dst).max()) if len(src) else 0
        return pa.table({"bw": pa.array([m], type=pa.int64())})

    parts = ctx.edges.map_batches(_bw, batch_format="pyarrow").take_all()
    return pa.table(
        {"bw": pa.array([max(p["bw"] for p in parts)], type=pa.int64())}
    )


# ---- relational breadth over the provided TPC-H-ish tables ----


def q_tpch_q1(sf_dir: str):
    """TPC-H Q1-style pricing summary, all-Arrow: per-batch hash-aggregate
    partials (pyarrow group_by) -> key-hash shuffle -> whole-partition
    final combine via a warm-task keyed shuffle. No pandas, no driver-side merge."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("l_discount", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("l_quantity_sum"),
                "sum_base_price": g.column("l_extendedprice_sum"),
                "sum_disc": g.column("l_discount_sum"),
                "count_order": g.column("l_quantity_count"),
            }
        )

    def _final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_base_price", "sum"),
             ("sum_disc", "sum"), ("count_order", "sum")]
        )
        cnt = np.asarray(g.column("count_order_sum"), dtype=np.int64)
        sd = np.asarray(g.column("sum_disc_sum"), dtype=np.float64)
        # np.round (not pc.round): bit-exact vs the SQL oracle's ROUND
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": pa.array(np.round(
                    np.asarray(g.column("sum_qty_sum"), dtype=np.float64), 2)),
                "sum_base_price": pa.array(np.round(
                    np.asarray(g.column("sum_base_price_sum"),
                               dtype=np.float64), 2)),
                "count_order": pa.array(cnt),
                "avg_disc": pa.array(
                    np.round(sd / np.maximum(cnt, 1), 6)),
            }
        )

    part = ds.map_batches(_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return group_apply_tasks(part, ["l_returnflag", "l_linestatus"], _final)


def q_top_customers(sf_dir: str):
    """Top-10 customers by total order value (join + groupby + sort + limit)."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    def _p(batch: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(batch.column("o_totalprice")),
            np.asarray(batch.column("o_custkey")),
        )
        return pa.table({"key": pa.array(uk), "total": pa.array(s)})

    def _m(batch: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(batch.column("total")), np.asarray(batch.column("key"))
        )
        return pa.table({"c_custkey": pa.array(uk), "total": pa.array(s)})

    totals = group_apply_tasks(orders.map_batches(_p, batch_format="pyarrow"),
                          ["key"], _m)
    top = (
        totals.sort(["total", "c_custkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    # semi-join: push the 10 winning keys into the parquet read as a row
    # filter — never scan the whole customer table onto the driver

    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(top["c_custkey"].tolist()),
        )
        .to_pandas()
    )
    out = top.merge(cust, on="c_custkey")
    out["total"] = out["total"].round(2)
    return pa.Table.from_pandas(out[["c_custkey", "c_name", "total"]],
                                preserve_index=False)


def q_events_hourly(sf_dir: str):
    """Tumbling 1h window count+sum per event type (windowed aggregate)."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    from ..core.shuffle import group_apply_tasks

    def _p(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "hour", pc.floor_temporal(batch.column("ts"), unit="hour")
        )
        g = t.group_by(["hour", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "hour": g.column("hour"),
                "event_type": g.column("event_type"),
                "cnt": g.column("value_count"),
                "sum_value": g.column("value_sum"),
            }
        )

    def _final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["hour", "event_type"]).aggregate(
            [("cnt", "sum"), ("sum_value", "sum")]
        )
        return pa.table(
            {
                "hour": g.column("hour"),
                "event_type": g.column("event_type"),
                "cnt": g.column("cnt_sum"),
                "sum_value": pa.array(np.round(
                    np.asarray(g.column("sum_value_sum"), dtype=np.float64),
                    6)),
            }
        )

    part = ds.map_batches(_p, batch_format="pyarrow", zero_copy_batch=True)
    return group_apply_tasks(part, ["hour", "event_type"], _final)


SLIDE_WIN_H = 2  # window length (hours); hop is fixed at 1h


def q_events_sliding(sf_dir: str):
    """HOPPING window aggregate: 2h windows sliding by 1h — every event
    lands in SLIDE_WIN_H windows (window_start in {trunc(ts)-1h,
    trunc(ts)}), the complement of the tumbling `events_hourly`. The
    window replication happens inside the per-batch combiner (one
    concat_tables of shifted hour keys), so the shuffle still moves only
    (window, type) partials."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    from ..core.shuffle import group_apply_tasks

    def _p(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        reps = []
        for k in range(SLIDE_WIN_H):
            w = pc.subtract(
                hour, pa.scalar(k * 3600_000_000, type=pa.duration("us"))
            )
            reps.append(pa.table({
                "win": w,
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }))
        t = pa.concat_tables(reps)
        g = t.group_by(["win", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table({
            "win": g.column("win"),
            "event_type": g.column("event_type"),
            "cnt": g.column("value_count"),
            "sum_value": g.column("value_sum"),
        })

    def _final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["win", "event_type"]).aggregate(
            [("cnt", "sum"), ("sum_value", "sum")]
        )
        return pa.table({
            "win": g.column("win"),
            "event_type": g.column("event_type"),
            "cnt": g.column("cnt_sum"),
            "sum_value": pa.array(np.round(
                np.asarray(g.column("sum_value_sum"), dtype=np.float64),
                6)),
        })

    part = ds.map_batches(_p, batch_format="pyarrow", zero_copy_batch=True)
    return group_apply_tasks(part, ["win", "event_type"], _final)


TPCH_Q3_SEG = "BUILDING"
TPCH_Q3_DATE = (1998, 1, 1)


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3-style shipping-priority query: the three-table join chain
    customer |><| orders |><| lineitem with every filter pushed into the
    parquet read, then top-10 orders by revenue. Revenue is summed as
    exact integer cents (floor(price*(1-disc)*100) per line), so the
    result is float-sum-order independent — the aggregate stays
    hash-exact vs the SQL oracle regardless of partial-sum tree shape.
    Both joins are warm-task co-partitioned hash joins; the lineitem
    side pre-aggregates per batch before its shuffle, and the final
    per-order combine is fused into the join task (``post=``)."""
    import datetime

    import ray

    from ..core.shuffle import group_sum_per_key, hash_join_tasks

    cut = datetime.datetime(*TPCH_Q3_DATE)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == TPCH_Q3_SEG,
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < pa.scalar(cut),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pa.scalar(cut),
    )

    def _li_partial(batch: pa.Table) -> pa.Table:
        # per-line integer cents: exact in the float64 bincount channel
        # while a partition's per-order sum < 2^53 (cents are ~1e6/line)
        cents = np.floor(
            np.asarray(batch.column("l_extendedprice"))
            * (1.0 - np.asarray(batch.column("l_discount"))) * 100.0
        )
        uk, s = group_sum_per_key(cents, np.asarray(batch.column("l_orderkey")))
        return pa.table({"l_orderkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    li_part = li.map_batches(_li_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    # orders of BUILDING customers (semi-join; customer side is filtered small)
    ojoin = hash_join_tasks(orders, cust, on="o_custkey",
                            right_on="c_custkey")

    def _final(t: pa.Table) -> pa.Table:
        # all partials of an order co-locate: one exact per-order combine;
        # date/priority are functionally dependent on the key (min = the value)
        g = t.group_by("l_orderkey").aggregate(
            [("cents", "sum"), ("o_orderdate", "min"),
             ("o_orderpriority", "min")]
        )
        return pa.table({
            "l_orderkey": g.column("l_orderkey"),
            "rev_cents": g.column("cents_sum"),
            "o_orderdate": g.column("o_orderdate_min"),
            "o_orderpriority": g.column("o_orderpriority_min"),
        })

    rev = hash_join_tasks(li_part, ojoin, on="l_orderkey",
                          right_on="o_orderkey", post=_final)
    top = rev.sort(["rev_cents", "l_orderkey"],
                   descending=[True, False]).limit(10).to_pandas()
    return pa.Table.from_pandas(top, preserve_index=False)


TPCH_Q5_REGION = "ASIA"
TPCH_Q5_LO = (1996, 1, 1)
TPCH_Q5_HI = (1999, 1, 1)


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5-style local-supplier revenue: the six-table join
    region -> nation -> {customer, supplier} -> orders -> lineitem with
    the same-nation (c_nationkey = s_nationkey) constraint, revenue per
    nation in exact integer cents. The nation/region side (30 rows) is
    resolved driver-side and pushed into the parquet reads as isin row
    filters — the broadcast-small-side plan; the three big-table joins
    are warm-task co-partitioned hash joins with the final filter+group
    fused into the last join task."""
    import datetime

    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    lo = datetime.datetime(*TPCH_Q5_LO)
    hi = datetime.datetime(*TPCH_Q5_HI)
    # small side: nations of the target region (25+5 rows -> driver)
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet",
        filter=pc.field("r_name") == TPCH_Q5_REGION).to_pandas()
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nation = nation[nation.n_regionkey.isin(region.r_regionkey)]
    nkeys = nation.n_nationkey.tolist()
    nname = dict(zip(nation.n_nationkey, nation.n_name))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nkeys),
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(nkeys),
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(lo))
        & (pc.field("o_orderdate") < pa.scalar(hi)),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(batch.column("l_extendedprice"))
            * (1.0 - np.asarray(batch.column("l_discount"))) * 100.0
        ).astype(np.int64)
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "cents": pa.array(c)})

    li = li.map_batches(_cents, batch_format="pyarrow",
                        zero_copy_batch=True)
    oc = hash_join_tasks(orders, cust, on="o_custkey",
                         right_on="c_custkey")
    ls = hash_join_tasks(li, supp, on="l_suppkey", right_on="s_suppkey")

    def _grp(t: pa.Table) -> pa.Table:
        keep = np.asarray(t.column("c_nationkey")) == np.asarray(
            t.column("s_nationkey"))
        nk = np.asarray(t.column("s_nationkey"))[keep]
        cents = np.asarray(t.column("cents"), dtype=np.float64)[keep]
        uk, s = group_sum_per_key(cents, nk.astype(np.int64))
        return pa.table({"nationkey": pa.array(uk),
                         "rev_cents": pa.array(s.astype(np.int64))})

    part = hash_join_tasks(ls, oc, on="l_orderkey", right_on="o_orderkey",
                           post=_grp)

    def _final(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("rev_cents"), dtype=np.float64),
            np.asarray(t.column("nationkey")),
        )
        return pa.table({
            "n_name": pa.array([nname[int(k)] for k in uk],
                               type=pa.string()),
            "rev_cents": pa.array(s.astype(np.int64)),
        })

    return group_apply_tasks(part, ["nationkey"], _final)


TOPN_PER_LANG = 3


def q_group_topn(sf_dir: str):
    """Top-``TOPN_PER_LANG`` documents per language by (n_chars DESC,
    doc_id ASC) — the per-group ranking window (ROW_NUMBER() <= k).
    Per-batch combiner keeps at most k rows per group before the lang
    shuffle; the whole-partition final pass re-cuts exactly and attaches
    the in-group rank."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])

    def _topn(t: pa.Table, with_rank: bool) -> pa.Table:
        lang = np.asarray(t.column("lang"))
        nch = np.asarray(t.column("n_chars"), dtype=np.int64)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        ul, inv = np.unique(lang, return_inverse=True)
        order = np.lexsort((did, -nch, inv))
        gi = inv[order]  # sorted group ids
        starts = np.searchsorted(gi, np.arange(len(ul)))
        rank = np.arange(len(gi)) - starts[gi]
        keep = rank < TOPN_PER_LANG
        sel = order[keep]
        cols = {"lang": pa.array(lang[sel], type=pa.string()),
                "doc_id": pa.array(did[sel]),
                "n_chars": pa.array(nch[sel])}
        if with_rank:
            cols["rnk"] = pa.array((rank[keep] + 1).astype(np.int64))
        return pa.table(cols)

    part = ds.map_batches(lambda b: _topn(b, False), batch_format="pyarrow",
                          zero_copy_batch=True)
    return group_apply_tasks(part, ["lang"], lambda t: _topn(t, True))


def q_degree_corr_stats(sf_dir: str):
    """Degree-assortativity sufficient statistics over the directed
    graph: for each edge (u -> v) take du = outdeg(u), dv = indeg(v) and
    return ONE row of exact integer sums (m, sum_du, sum_dv, sum_dudv,
    sum_du2, sum_dv2) — the inputs to Pearson assortativity r, kept as
    BIGINTs so the aggregate is order-free exact (the float division
    happens in the consumer, not the shuffle). Two warm-task hash joins
    attach the degree tables; per-partition sums ride the join task."""
    ctx = get_context(sf_dir)
    g = ctx.graph("directed")

    from ..core.shuffle import hash_join_tasks

    def _proj(name):
        def _f(t: pa.Table) -> pa.Table:
            return pa.table({"v": t.column("v"), name: t.column("cnt")})
        return _f

    outd = g.degree_table("row").map_batches(_proj("du"),
                                             batch_format="pyarrow")
    ind = g.degree_table("col").map_batches(_proj("dv"),
                                            batch_format="pyarrow")

    def _edges_proj(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("src"), "dst": t.column("dst")})

    edges = ctx.edges.map_batches(_edges_proj, batch_format="pyarrow")
    e1 = hash_join_tasks(edges, outd, on="src", right_on="v")

    def _sums(t: pa.Table) -> pa.Table:
        du = np.asarray(t.column("du"), dtype=np.int64)
        dv = np.asarray(t.column("dv"), dtype=np.int64)
        return pa.table({
            "m": pa.array([np.int64(len(du))]),
            "sum_du": pa.array([du.sum()]),
            "sum_dv": pa.array([dv.sum()]),
            "sum_dudv": pa.array([(du * dv).sum()]),
            "sum_du2": pa.array([(du * du).sum()]),
            "sum_dv2": pa.array([(dv * dv).sum()]),
        })

    part = hash_join_tasks(e1, ind, on="dst", right_on="v",
                           post=_sums).to_pandas()
    return pa.Table.from_pandas(part.sum().to_frame().T.astype(np.int64),
                                preserve_index=False)


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered-sequence funnel over the events stream: stage k counts
    users whose FIRST stage-k event is strictly after their first
    stage-(k-1) event (view -> click -> purchase). One user_id hash
    shuffle co-locates each user's history; the per-partition pass is
    fully vectorized (one np.minimum.at chain per stage)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])
    I64 = np.iinfo(np.int64).max

    def _stage_counts(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]"
                                                ).astype(np.int64)
        et = np.asarray(t.column("event_type"))
        uu, inv = np.unique(uid, return_inverse=True)
        prev = np.full(len(uu), -np.iinfo(np.int64).max, dtype=np.int64)
        counts = []
        for stage in FUNNEL_STAGES:
            cur = np.full(len(uu), I64, dtype=np.int64)
            sel = (et == stage) & (ts > prev[inv])
            np.minimum.at(cur, inv[sel], ts[sel])
            counts.append(int(np.count_nonzero(cur < I64)))
            prev = cur
        return pa.table({
            "stage": pa.array(list(FUNNEL_STAGES), type=pa.string()),
            "n_users": pa.array(np.asarray(counts, dtype=np.int64)),
        })

    part = group_apply_tasks(ds, ["user_id"], _stage_counts)

    def _merge(t: pa.Table) -> pa.Table:
        st = np.asarray(t.column("stage"))
        us, inv = np.unique(st, return_inverse=True)
        s = np.bincount(inv, weights=np.asarray(t.column("n_users"),
                                                dtype=np.float64))
        return pa.table({"stage": pa.array(us, type=pa.string()),
                         "n_users": pa.array(s.astype(np.int64))})

    return group_apply_tasks(part, ["stage"], _merge)


def q_degree_hist(sf_dir: str):
    """Out-degree histogram on power-of-two buckets (bucket k counts
    vertices with 2^k <= outdeg < 2^(k+1)) — the link-graph skew profile
    that sizes salting/partitioning decisions. Bucket indices come from
    frexp exponents (pure integer logic: no libm log2 rounding hazard at
    2^k boundaries); per-batch count partials, one tiny keyed merge."""
    ctx = get_context(sf_dir)
    agg = ctx.graph("directed").degree_table("row")

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    def _p(batch: pa.Table) -> pa.Table:
        cnt = np.asarray(batch.column("cnt"), dtype=np.int64)
        b = (np.frexp(cnt.astype(np.float64))[1] - 1).astype(np.int64)
        ub, s = group_sum_per_key(np.ones(len(b)), b)
        return pa.table({"bucket": pa.array(ub),
                         "n_vertices": pa.array(s.astype(np.int64))})

    def _m(batch: pa.Table) -> pa.Table:
        ub, s = group_sum_per_key(
            np.asarray(batch.column("n_vertices"), dtype=np.float64),
            np.asarray(batch.column("bucket")),
        )
        return pa.table({"bucket": pa.array(ub),
                         "n_vertices": pa.array(s.astype(np.int64))})

    return group_apply_tasks(agg.map_batches(_p, batch_format="pyarrow"),
                             ["bucket"], _m)


# ---------------------------------------------------------------------------
# wave 3: training-data pipeline operators (documents / embeddings tables)
# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_token_stats(sf_dir: str):
    from ..functions import text as T

    return _docs(sf_dir).map_batches(T.token_stats, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_langid(sf_dir: str):
    from ..functions import text as T

    return _docs(sf_dir).map_batches(T.langid, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_quality(sf_dir: str):
    from ..functions import text as T

    return _docs(sf_dir).map_batches(T.quality, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_fingerprint(sf_dir: str):
    from ..functions import text as T

    return _docs(sf_dir).map_batches(T.fingerprint, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_dedup_exact(sf_dir: str):
    from ..functions import dedup as D

    return D.exact_dedup(_docs(sf_dir))


def q_dedup_exact_digest(sf_dir: str):
    """The digest scale path (128-bit key digest through the shuffle,
    ~100x fewer bytes): identical output to `dedup_exact` unless two
    distinct keys collide in 128 bits, so the same SQL oracle applies."""
    from ..functions import dedup as D

    return D.exact_dedup(_docs(sf_dir), digest=True)


def q_jaccard_pairs(sf_dir: str):
    from ..functions import dedup as D

    return D.jaccard_pairs(_docs(sf_dir), tau=0.5)


def q_events_outliers(sf_dir: str):
    """Per-type outlier counts: events with value strictly above the
    type's exact discrete p99 — quantile + filter fused into ONE keyed
    shuffle pass (all of a type's rows co-locate; the kernel sorts once
    and counts the tail). Types with no outliers are omitted."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "p99": pa.array([], type=pa.float64()),
            "n_above": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        val = np.asarray(t.column("value"), dtype=np.float64)
        order = np.lexsort((val, et))
        et, val = et[order], val[order]
        keys, starts, cnts = np.unique(et, return_index=True,
                                       return_counts=True)
        idx = starts + np.minimum(
            cnts - 1, np.ceil(0.99 * cnts).astype(np.int64) - 1)
        p99 = val[idx]
        # count strictly above p99 per group (few groups; per-group
        # searchsorted on the already-sorted slice)
        ends = starts + cnts
        above = np.array([
            int(cnts[i]) - int(np.searchsorted(
                val[starts[i]:ends[i]], p99[i], side="right"))
            for i in range(len(keys))
        ], dtype=np.int64)
        keep = above > 0
        return pa.table({
            "event_type": pa.array(keys[keep].tolist(), type=pa.string()),
            "p99": pa.array(p99[keep]),
            "n_above": pa.array(above[keep]),
        })

    return group_apply_tasks(ds, ["event_type"], _kernel)


def q_bigram_novelty(sf_dir: str):
    """Per-document novelty: the number of distinct bigrams that occur
    in NO other document (global df == 1) — a cheap document-uniqueness
    signal for dedup triage. Distinct per-doc bigrams ride the shared
    vectorized shingle kernel (k=2); df counting and the df==1 cut fuse
    into one bigram-keyed shuffle, then one tiny per-doc count reduce.
    Docs with no unique bigram are omitted."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key
    from ..functions.dedup import _flat_distinct_shingles

    docs = _docs(sf_dir)

    def _bg(batch: pa.Table) -> pa.Table:
        sh, pos = _flat_distinct_shingles(batch, k=2)
        did = np.asarray(batch.column("doc_id"), dtype=np.int64)[pos]
        return pa.table({"s": pa.array(sh, type=pa.string()),
                         "doc_id": pa.array(did)})

    def _df1(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("s")).astype(str)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        order = np.argsort(s, kind="stable")
        s, did = s[order], did[order]
        uniq, starts, cnts = np.unique(s, return_index=True,
                                       return_counts=True)
        solo = starts[cnts == 1]
        uk, c = group_sum_per_key(np.ones(len(solo)), did[solo])
        return pa.table({"doc_id": pa.array(uk),
                         "n_unique": pa.array(c.astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        uk, c = group_sum_per_key(
            np.asarray(t.column("n_unique"), dtype=np.float64),
            np.asarray(t.column("doc_id"), dtype=np.int64))
        return pa.table({"doc_id": pa.array(uk),
                         "n_unique": pa.array(c.astype(np.int64))})

    part = group_apply_tasks(
        docs.map_batches(_bg, batch_format="pyarrow"), ["s"], _df1)
    return group_apply_tasks(part, ["doc_id"], _merge)


def q_countmin(sf_dir: str):
    """Count-Min sketch of corpus token frequencies — the full (r, b,
    cnt) sketch table (exact integers; see `text.countmin_sketch`)."""
    from ..functions import text as T

    return T.countmin_sketch(_docs(sf_dir))


DUP_CLUSTER_ROUNDS = 6


def q_dup_clusters(sf_dir: str):
    """Near-dup cluster labels (canonical-doc assignment): fixed-round
    min-label CC over the exact Jaccard pair graph (see
    `dedup.dup_clusters`)."""
    from ..functions import dedup as D

    return D.dup_clusters(_docs(sf_dir), tau=0.5,
                          rounds=DUP_CLUSTER_ROUNDS)


def q_minhash_pairs(sf_dir: str):
    from ..functions import dedup as D

    return D.minhash_lsh_pairs(_docs(sf_dir), tau=0.5)


def q_simhash(sf_dir: str):
    from ..functions import dedup as D

    return D.simhash(_docs(sf_dir))


def q_ann_topk(sf_dir: str):
    import ray

    from ..functions import ann as A

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return A.ann_bruteforce_topk(emb, np.arange(10), k=5)


def q_ann_lsh(sf_dir: str):
    import ray

    from ..functions import ann as A

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return A.ann_lsh_topk(emb, np.arange(10), k=5)


# ---------------------------------------------------------------------------
# wave 4: frontier BFS parents, DimApply, MaskedReduce, MIS
# ---------------------------------------------------------------------------


def q_bfs_parents(sf_dir: str):
    """Top-down frontier BFS parent tree (SpMSpV loop, TopDownBFS.cpp:440)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    parents, dist = alg.bfs_parents(ctx.engine("sym"), root)
    ids = np.nonzero(parents >= 0)[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "parent_label": _label_col(ctx, parents[ids]),
        }
    )


def q_colstochastic(sf_dir: str):
    """Column-stochastic edge weights: w / out-weight(src) — `DimApply` +
    `MakeColStochastic` (MCL.cpp:388-394). Refs-only: the out-weight
    vector stays as engine chunk refs (`out_weights_refs`); map tasks
    fetch only the chunks their batch touches (process-cached plasma
    reads) — no O(n) driver array or full-vector broadcast."""
    from ..core.graph import _cached_vec_chunk

    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    ow_refs = eng.out_weights_refs()
    starts = np.asarray([s for s, _ in eng.bounds], dtype=np.int64)
    dec = ctx.decoder()

    def _norm(batch: pa.Table, *, _r=ow_refs, _s=starts, _d=dec) -> pa.Table:
        src = np.asarray(batch.column("src"), dtype=np.int64)
        dst = np.asarray(batch.column("dst"))
        w = np.asarray(batch.column("w"))
        ow = np.empty(len(src), dtype=np.float64)
        ks = np.searchsorted(_s, src, side="right") - 1
        for k in np.unique(ks):
            sel = ks == k
            ow[sel] = _cached_vec_chunk(_r[int(k)])[src[sel] - _s[int(k)]]
        wn = np.round(w / ow, 10)
        return pa.table(
            {
                "src_label": _d.take(src),
                "dst_label": _d.take(dst),
                "w_norm": pa.array(wn),
            }
        )

    return ctx.edges.map_batches(_norm, batch_format="pyarrow")


def q_masked_colsums(sf_dir: str):
    """Column sums restricted to source vertices with arith id % 5 == 0 —
    `MaskedReduce` (SpParMat.cpp:1849)."""
    import ray

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _mask(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = np.asarray(batch.column("src"))
        return batch.filter(pa.array(_d.arith(src) % 5 == 0))

    masked = ctx.edges.map_batches(_mask, batch_format="pyarrow",
                                   zero_copy_batch=True)
    from ..core.graph import Graph

    red = Graph(n=ctx.n, edges=masked).reduce("col", "sum")

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {
                "label": _d.take(v),
                "msum": batch.column("val"),
            }
        )

    return red.map_batches(_dec, batch_format="pyarrow")


def q_mis(sf_dir: str):
    """Luby maximal independent set (rows-only; invariants in pytest)."""
    ctx = get_context(sf_dir)
    in_mis = alg.luby_mis(ctx.engine("sym"))
    ids = np.arange(ctx.n)
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "in_mis": pa.array(in_mis.astype(np.int64)),
        }
    )


MIS_ROUNDS = 12
MIS_PRIO_P = 2147483647  # 2^31 - 1 (prime); 48271 is a primitive root
LCG_P47 = 140737488355213  # 2^47 - 115, prime (Miller-Rabin verified);
# 48271 * (2^47-115) < 2^63, so the affine map stays exact in int64


def lcg_modulus(n: int) -> int:
    """Prime-modulus ladder for the SQL-reproducible affine priority
    prio(v) = (v*48271 + b) mod p. An affine map mod a prime is injective
    on [0, p), so distinctness needs p > n; the int64 product bound
    48271*p < 2^63 caps the ladder at ~2^47 vertices (the round-3
    verdict's "LCG needs n < 2^31" cliff moves to 2^47; oracle queries
    always run at n << 2^31, where the rung — and hence the SQL — is
    unchanged)."""
    if n < MIS_PRIO_P:
        return MIS_PRIO_P
    if n < LCG_P47:
        return LCG_P47
    raise NotImplementedError(
        "LCG priority: no prime rung with 48271*p < 2^63 covers n >= 2^47;"
        " a 128-bit mulmod channel is needed beyond that"
    )


def _lcg_prio_refs(eng, b: int, p: int, dtype=np.float64) -> list:
    """Chunked LCG priorities generated INSIDE chunk kernels (no O(n)
    driver array): prio(v) = (v*48271 + b) mod p per engine chunk."""

    def _k(bounds, _b=b, _p=p, _dt=dtype):
        v = np.arange(bounds[0], bounds[1], dtype=np.int64)
        return ((v * 48271 + _b) % _p).astype(_dt)

    return eng.map_chunks_i(_k)


def q_mis_fixed(sf_dir: str):
    """Oracle-mode Luby MIS: SQL-reproducible LCG priorities
    prio(v) = (v*48271 + 11) mod p (affine bijection -> distinct;
    p from the `lcg_modulus` ladder, = 2^31-1 at every oracle scale) and
    exactly MIS_ROUNDS synchronous rounds — the `cc_fixed` trick applied
    to MIS, so DuckDB can unroll the identical rounds. Priorities are
    generated per chunk (round-4: no O(n) driver array)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    prio_refs = _lcg_prio_refs(eng, 11, lcg_modulus(ctx.n))
    in_mis = alg.luby_mis(eng, prio_full=prio_refs, max_rounds=MIS_ROUNDS)
    ids = np.arange(ctx.n)
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "in_mis": pa.array(in_mis.astype(np.int64)),
        }
    )


COLOR_ROUNDS = 8
COLOR_PRIO_B = 37


def q_coloring_fixed(sf_dir: str):
    """Oracle-mode Jones-Plassmann coloring: SQL-reproducible LCG
    priorities prio(v) = (v*48271 + 37) mod p (chunk-generated, ladder
    modulus) and exactly COLOR_ROUNDS synchronous rounds (the
    `mis_fixed` trick); per round a select2nd_min SpMV picks winners and
    a bor_second SpMV collects neighbor color masks (see
    `alg.jp_coloring`). Uncolored = -1."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    prio_refs = _lcg_prio_refs(eng, COLOR_PRIO_B, lcg_modulus(ctx.n))
    color = alg.jp_coloring(eng, prio_full=prio_refs,
                            max_rounds=COLOR_ROUNDS)
    ids = np.arange(ctx.n)
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "color": pa.array(color.astype(np.int64)),
        }
    )


MCL_SUB = 6000  # induced-subgraph size for the MCL query (~20 s at sf0.01;
# the full 60k-vertex graph runs in ~150 s — see pipelines/mcl.py — but that
# exceeds the driver's per-round budget, so the query stays bounded)


def q_mcl(sf_dir: str):
    """Markov clustering (HipMCL analog) on the induced subgraph of the
    first MCL_SUB arithmetic ids. Rows-only check (iterative clustering is
    not SQL-expressible); invariants in pytest."""
    import ray

    from .mcl import mcl

    ctx = get_context(sf_dir)
    sub = min(MCL_SUB, ctx.n)
    sel_ids = np.nonzero(ctx.arith < sub)[0]  # dense ids, label-sorted
    sel_ref = ray.put(sel_ids)

    def _sub(batch: pa.Table, *, _ref=sel_ref) -> pa.Table:
        sel = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        si = np.minimum(np.searchsorted(sel, src), len(sel) - 1)
        sj = np.minimum(np.searchsorted(sel, dst), len(sel) - 1)
        keep = (sel[si] == src) & (sel[sj] == dst)
        return pa.table(
            {
                "src": pa.array(si[keep].astype(np.int64)),
                "dst": pa.array(sj[keep].astype(np.int64)),
                "w": pc.filter(batch.column("w"), pa.array(keep)),
            }
        )

    sub_edges = ctx.graph("sym").edges.map_batches(
        _sub, batch_format="pyarrow", zero_copy_batch=True
    )
    clusters, _info = mcl(sub_edges, len(sel_ids), max_iters=8)
    labels = ctx.gather_labels(sel_ids)
    return pa.table(
        {
            "label": pa.array(labels, type=pa.string()),
            "cluster": pa.array(labels[clusters], type=pa.string()),
        }
    )


def q_mcl_incremental(sf_dir: str):
    """Incremental MCL (`Applications/Incremental/` family): cluster the
    MCL subgraph WITHOUT edges incident to its last MCL_INC_D ids, then
    feed those edges as the delta through ``mcl_incremental`` — only the
    perturbed region re-clusters. Rows-only (iterative); equality with a
    full re-run is asserted in pytest on a boundary-clean fixture.
    Bounded to MCL_SUB/3 ids (the query runs a full MCL as its baseline
    plus the incremental pass — twice the q_mcl work per vertex; the
    machinery itself is pytest-proven equal to a full re-run)."""
    import ray

    from .mcl import mcl, mcl_incremental

    ctx = get_context(sf_dir)
    sub = min(MCL_SUB // 3, ctx.n)
    sel_ids = np.nonzero(ctx.arith < sub)[0]
    sel_ref = ray.put(sel_ids)
    m = len(sel_ids)
    cut = m - min(10, m // 2)  # delta = edges touching the last ids

    def _split(which):
        def _f(batch: pa.Table, *, _ref=sel_ref) -> pa.Table:
            sel = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            src = np.asarray(batch.column("src"))
            dst = np.asarray(batch.column("dst"))
            si = np.minimum(np.searchsorted(sel, src), len(sel) - 1)
            sj = np.minimum(np.searchsorted(sel, dst), len(sel) - 1)
            keep = (sel[si] == src) & (sel[sj] == dst)
            delta = (si >= cut) | (sj >= cut)  # symmetric split
            keep &= delta if which == "delta" else ~delta
            return pa.table(
                {
                    "src": pa.array(si[keep].astype(np.int64)),
                    "dst": pa.array(sj[keep].astype(np.int64)),
                    "w": pc.filter(batch.column("w"), pa.array(keep)),
                }
            )
        return _f

    edges = ctx.graph("sym").edges
    prev = edges.map_batches(_split("prev"), batch_format="pyarrow",
                             zero_copy_batch=True)
    delta = edges.map_batches(_split("delta"), batch_format="pyarrow",
                              zero_copy_batch=True)
    prev_clusters, _ = mcl(prev, m, max_iters=8)
    clusters, info = mcl_incremental(prev, prev_clusters, delta, m,
                                     max_iters=8)
    assert info["affected"] > 0, info
    labels = ctx.gather_labels(sel_ids)
    return pa.table(
        {
            "label": pa.array(labels, type=pa.string()),
            "cluster": pa.array(labels[clusters], type=pa.string()),
        }
    )


def q_ewise_apply_outer(sf_dir: str):
    """Full-outer EWiseApply of A and A^T: val = 2*wA + wB with 0 nulls —
    `EWiseApply` null-policy join (ParFriends.h:2649)."""
    from ..core.spgemm import ewise_apply

    ctx = get_context(sf_dir)
    at = ctx.graph("directed").transpose().edges
    out = ewise_apply(
        ctx.edges, at, ctx.n, lambda a, b: 2.0 * a + b,
        allow_a_nulls=True, allow_b_nulls=True,
    )
    return _decode_edge_labels(ctx, out, "val")


def q_betweenness(sf_dir: str):
    """Batched Brandes betweenness from 16 deterministic sources
    (`BetwCent.cpp` analog). Rows-only: scores are verified against a
    brute-force Brandes in pytest."""
    from .betweenness import betweenness_centrality

    ctx = get_context(sf_dir)
    sources = np.arange(16, dtype=np.int64)  # dense ids
    bc = betweenness_centrality(ctx.engine("sym"), sources)
    ids = np.nonzero(bc > 0)[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "bc": pa.array(np.round(bc[ids], 6)),
        }
    )


SESSION_GAP_MIN = 30


def q_sessions(sf_dir: str):
    """Gap-based sessionization of the events stream: per user, order by
    (ts, event_id), close a session after a 30-minute silence. A stateful
    keyed window operator the reference lacks — implemented as a hash
    repartition on user_id + whole-partition vectorized session assembly.
    Output: (user_id, session_start_event, n_events, sum_value)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def _sessions(batch: pa.Table) -> pa.Table:
        """Whole-partition assembly in pure numpy (np.lexsort + reduceat)
        — round 4 removed the per-partition pandas conversion that was
        the one non-Arrow residue on this hot path."""
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "session_start_event": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "sum_value": pa.array([], type=pa.float64()),
            })
        uid = np.asarray(batch.column("user_id"), dtype=np.int64)
        tsi = np.asarray(batch.column("ts")).astype(
            "datetime64[us]").astype(np.int64)
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        val = np.asarray(batch.column("value"), dtype=np.float64)
        order = np.lexsort((eid, tsi, uid))
        uid, tsi, eid, val = uid[order], tsi[order], eid[order], val[order]
        gap_us = SESSION_GAP_MIN * 60 * 1_000_000
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (tsi[1:] - tsi[:-1] > gap_us)
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(uid))
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "session_start_event": pa.array(
                np.minimum.reduceat(eid, starts)),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "sum_value": pa.array(np.round(np.add.reduceat(val, starts), 6)),
        })

    return group_apply_tasks(ds, ["user_id"], _sessions)


def q_prune_rect(sf_dir: str):
    """Delete entries with src in S AND dst in T (S: arith%7==0,
    T: arith%3==0) — `SpParMat::Prune(ri,ci)` (SpParMat.cpp:2484)."""
    import ray

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _prune(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        drop = (_d.arith(src) % 7 == 0) & (_d.arith(dst) % 3 == 0)
        return batch.filter(pa.array(~drop))

    return _decode_edge_labels(
        ctx,
        ctx.edges.map_batches(_prune, batch_format="pyarrow",
                              zero_copy_batch=True),
        "w",
    )


def q_spasgn(sf_dir: str):
    """A(ri,ri) := B — `SpAsgn` (SpParMat.cpp:2436): carve the (ri x ri)
    region out of A (rectangular anti mask) and union in B; here ri =
    vertices with arith%7==0 and B = 9.0-weighted diagonal on ri."""
    import ray

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _carve(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        drop = (_d.arith(src) % 7 == 0) & (_d.arith(dst) % 7 == 0)
        return batch.filter(pa.array(~drop))

    carved = ctx.edges.map_batches(_carve, batch_format="pyarrow",
                                   zero_copy_batch=True)
    sel = np.nonzero(ctx.arith % 7 == 0)[0].astype(np.int64)
    diag = pa.table(
        {
            "src": pa.array(sel),
            "dst": pa.array(sel),
            "w": pa.array(np.full(len(sel), 9.0)),
        }
    )
    import ray as _ray

    out = carved.union(_ray.data.from_arrow(diag))
    return _decode_edge_labels(ctx, out, "w")


def q_subsref_perm(sf_dir: str):
    """General `SubsRef` B = A(ri, ci) with permuted, repeated, ri != ci
    index vectors (SpParMat.cpp:2030-2264; IndexingTest.cpp analog):
    ri[i] = file (7i+3) % 101 for i < 200 (repeats: 200 > 101),
    ci[j] = file (5j+2) % 173 for j < 150. Output (bi, bj, w)."""
    from ..core.indexing import subsref

    ctx = get_context(sf_dir)
    inv = np.empty(ctx.n, dtype=np.int64)
    inv[ctx.arith] = np.arange(ctx.n, dtype=np.int64)
    ri = inv[(7 * np.arange(200, dtype=np.int64) + 3) % 101]
    ci = inv[(5 * np.arange(150, dtype=np.int64) + 2) % 173]
    return subsref(ctx.edges, ri, ci)


def q_spasgn_general(sf_dir: str):
    """General `SpAsgn` A(ri, ci) := B with arbitrary distinct rectangular
    index vectors and a non-diagonal B (SpParMat.cpp:2436-2482;
    SpAsgnTest.cpp analog): ri[i] = file (11i+5) % n (300 rows),
    ci[j] = file (13j+1) % n (200 cols), B[i, (5i+2) % 200] = 1 + i % 4."""
    import ray

    from ..core.indexing import spasgn

    ctx = get_context(sf_dir)
    n = ctx.n
    inv = np.empty(n, dtype=np.int64)
    inv[ctx.arith] = np.arange(n, dtype=np.int64)
    bi = np.arange(300, dtype=np.int64)
    ri = inv[(11 * bi + 5) % n]
    ci = inv[(13 * np.arange(200, dtype=np.int64) + 1) % n]
    b_ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(bi),
                "dst": pa.array((5 * bi + 2) % 200),
                "w": pa.array((1 + bi % 4).astype(np.float64)),
            }
        )
    )
    return _decode_edge_labels(ctx, spasgn(ctx.edges, ri, ci, b_ds), "w")


def q_matching(sf_dir: str):
    """Maximal matching (BipartiteMatchings-family kernel). Rows-only;
    validity/maximality invariants asserted in pytest."""
    ctx = get_context(sf_dir)
    m = alg.maximal_matching(ctx.engine("sym"))
    ids = np.nonzero(m >= 0)[0]
    keep = ids < m[ids]  # one row per matched pair
    ids = ids[keep]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "partner": _label_col(ctx, m[ids]),
        }
    )


MATCH_ROUNDS = 12


def q_matching_fixed(sf_dir: str):
    """Oracle-mode maximal matching: SQL-reproducible LCG priorities
    (v*48271 + 23) mod 2^31-1 and exactly MATCH_ROUNDS propose/accept
    rounds — the `mis_fixed`/`cc_fixed` trick applied to the matching
    kernel so DuckDB can unroll the identical rounds."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    # matching keeps the 2^31-1 rung: its prio*n+id int64 encode bounds
    # prio*n < 2^63 (see alg.maximal_matching's guard); priorities are
    # chunk-generated (no O(n) driver array)
    prio_refs = _lcg_prio_refs(eng, 23, MIS_PRIO_P, dtype=np.int64)
    m = alg.maximal_matching(eng, prio_full=prio_refs,
                             max_rounds=MATCH_ROUNDS)
    ids = np.nonzero(m >= 0)[0]
    keep = ids < m[ids]  # one row per matched pair
    ids = ids[keep]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "partner": _label_col(ctx, m[ids]),
        }
    )


def q_rcm(sf_dir: str):
    """Reverse Cuthill-McKee ordering (Ordering/RCM.cpp analog).
    Rows-only; profile reduction asserted in pytest."""
    ctx = get_context(sf_dir)
    perm = alg.rcm_ordering(ctx.engine("sym"))
    ids = np.arange(ctx.n)
    return pa.table(
        {"label": _label_col(ctx, ids), "rcm_index": pa.array(perm)}
    )


def q_clean_corpus(sf_dir: str):
    """End-to-end training-data cleaning: quality filter (distinct-token
    ratio >= 0.3 and >= 20 tokens) then exact dedup (keep canonical doc) —
    the filter->dedup->keep pipeline of a pretraining corpus pass."""
    from ..functions import dedup as D
    from ..functions import text as T

    docs = _docs(sf_dir).materialize()  # scanned three times below
    qual = docs.map_batches(T.token_stats, batch_format="pyarrow",
                            zero_copy_batch=True)
    quality = docs.map_batches(T.quality, batch_format="pyarrow",
                               zero_copy_batch=True)
    # three distributed semi-joins on doc_id — no driver-side id sets
    keep_q = (quality.filter(expr="distinct_ratio >= 0.3")
              .select_columns(["doc_id"]))
    keep_t = qual.filter(expr="n_tokens >= 20").select_columns(["doc_id"])

    def _canon_only(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("doc_id"),
                                batch.column("canon_id"))
        return batch.filter(keep).select(["doc_id"])

    canon = D.exact_dedup(docs).map_batches(_canon_only,
                                            batch_format="pyarrow")
    from ..core.shuffle import hash_join_tasks

    np_ = D._join_partitions()
    kept = hash_join_tasks(
        hash_join_tasks(keep_q, keep_t, on="doc_id", num_partitions=np_),
        canon, on="doc_id", num_partitions=np_,
    )
    return kept.sort("doc_id")


def q_fastsv(sf_dir: str):
    """FastSV connected components (FastSV.h:335-374): must equal the
    min-label CC fixpoint, so it shares the CC oracle."""
    ctx = get_context(sf_dir)
    comp, _ = alg.fastsv(ctx.engine("sym"))
    ids = np.arange(ctx.n)
    return pa.table(
        {"label": _label_col(ctx, ids), "comp": _label_col(ctx, comp)}
    )


BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_token_counts_re(sf_dir: str):
    """BPE-ish regex token counting (vectorized Arrow regex kernels):
    (doc_id, n_re_tokens)."""

    def _cnt(batch: pa.Table) -> pa.Table:
        matches = pc.count_substring_regex(batch.column("text"), BPE_RE)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_re_tokens": pc.cast(matches, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(_cnt, batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_knn_components(sf_dir: str):
    """Embedding-space communities: kNN graph -> symmetrize -> connected
    components. The ANN-graph + graph-engine integration showcase.
    `knn_graph` is a COST SWITCH (`FastSV.h:221-228` style): exact 2D
    block-pair tiling up to KNN_EXACT_MAX vectors (the oracle-checked
    regime), sign-LSH candidates + exact re-rank above it (recall >= 0.95
    vs brute asserted in pytest test_knn_graph_lsh_recall)."""
    import ray

    from ..core.engine import SpmvEngine
    from ..core.graph import Graph
    from ..functions.ann import knn_graph

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    n = int(emb.max("vec_id")) + 1  # distributed max — no id materialization
    topk = knn_graph(emb, k=5)

    def _as_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("query_id"),
                "dst": batch.column("neighbor_id"),
                "w": pa.array(np.ones(batch.num_rows)),
            }
        )

    g = Graph(n=n, edges=topk.map_batches(_as_edges, batch_format="pyarrow",
                                          zero_copy_batch=True))
    import os

    from .context import CKPT_ROOT

    eng = SpmvEngine.from_graph(
        g.union_max(), 2, os.path.join(CKPT_ROOT, f"knn_n{n}"), structural=True
    )
    comp, _ = alg.connected_components(eng)
    eng.shutdown()
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "component": pa.array(comp),
        }
    )


def q_spmm_batch(sf_dir: str):
    """Batched SpMM: 3 simultaneous plus_times SpMVs with x_k[i] =
    ((i+k) % 7) + 1 — the tall-skinny multi-vector product
    (BetwCent.cpp:179-187). Output (label, y0, y1, y2)."""
    ctx = get_context(sf_dir)
    n = ctx.n
    X = np.stack([((ctx.arith + k) % 7 + 1).astype(np.float64) for k in range(3)])
    Y = ctx.engine("directed").spmm(X, "plus_times")
    ids = np.nonzero(Y.sum(axis=0) > 0)[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "y0": pa.array(Y[0, ids]),
            "y1": pa.array(Y[1, ids]),
            "y2": pa.array(Y[2, ids]),
        }
    )


def q_reduce_rowmin(sf_dir: str):
    """Per-row (src) min of nonzeros — `Reduce(Row, minimum)`."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()
    red = ctx.graph("directed").reduce("row", "min")

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {"label": _d.take(v),
             "minw": batch.column("val")}
        )

    return red.map_batches(_dec, batch_format="pyarrow")


def q_vec_ewise_add(sf_dir: str):
    """EWise join of the out-degree and in-degree vectors (full outer,
    nulls -> 0): val = outdeg + 2*indeg — `EWiseApply` vector family."""
    from ..core import vecops

    ctx = get_context(sf_dir)
    g = ctx.graph("directed")
    outd = g.reduce("row", "count")
    ind = g.reduce("col", "count")
    dec = ctx.decoder()
    joined = vecops.ewise_join(
        outd, ind,
        lambda a, b: np.nan_to_num(a) + 2 * np.nan_to_num(b),
        how="full_outer",
    )

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table(
            {
                "label": _d.take(v),
                "val": batch.column("val"),
            }
        )

    return joined.map_batches(_dec, batch_format="pyarrow")


def q_auction_matching(sf_dir: str):
    """Auction maximum-weight matching (AWPM analog) on the weighted
    directed graph. Rows-only; optimality vs brute force in pytest."""
    from .auction import auction_matching

    ctx = get_context(sf_dir)
    p2o, _price, _info = auction_matching(ctx.engine("sssp"), eps=0.1, max_rounds=300)
    ids = np.nonzero(p2o >= 0)[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "object": _label_col(ctx, p2o[ids]),
        }
    )


def q_vec_argmin(sf_dir: str):
    """Global argmin of the in-degree vector (`FullyDistVec::MinElement`,
    FullyDistVec.h:262): one row (label, minval); ties -> smallest label."""
    ctx = get_context(sf_dir)
    deg = ctx.graph("directed").reduce("col", "count")
    row = deg.sort(["val", "v"]).limit(1).take_all()[0]
    return pa.table(
        {
            "label": pa.array(
                ctx.gather_labels(np.array([int(row["v"])])).tolist(),
                type=pa.string()),
            "minval": pa.array([int(row["val"])], type=pa.int64()),
        }
    )


def q_asof_click(sf_dir: str):
    """As-of join: each event is annotated with the user's most recent
    STRICTLY-earlier 'click' event id (-1 if none) — the keyed as-of join
    from the custom-operator list: hash repartition on user_id +
    whole-partition vectorized forward-fill. (user_id, ts) is unique in
    the events table, so the order key is unambiguous."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id",
                                            "event_type"]
    )

    def _asof(batch: pa.Table) -> pa.Table:
        """Pure-numpy whole-partition forward-fill (np.lexsort +
        maximum.accumulate): global row positions are monotone, so a
        single running max of click positions, clamped to the row's own
        user-segment start, is the per-user at-or-before click; shifting
        one row inside the segment makes it strictly-before."""
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return pa.table({
                "event_id": pa.array([], type=pa.int64()),
                "prior_click": pa.array([], type=pa.int64()),
            })
        uid = np.asarray(batch.column("user_id"), dtype=np.int64)
        tsi = np.asarray(batch.column("ts")).astype(
            "datetime64[us]").astype(np.int64)
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        et = np.asarray(batch.column("event_type")).astype(str)
        order = np.lexsort((eid, tsi, uid))
        uid, eid, et = uid[order], eid[order], et[order]
        m = len(uid)
        pos = np.arange(m, dtype=np.int64)
        new = np.ones(m, dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new)[0]
        seg_first = np.repeat(starts, np.diff(np.append(starts, m)))
        z = np.where(et == "click", pos, -1)
        acc = np.maximum.accumulate(z)
        atob = np.where(acc >= seg_first, acc, -1)  # at-or-before click pos
        prev = np.full(m, -1, dtype=np.int64)
        prev[1:] = np.where(new[1:], -1, atob[:-1])  # strictly before
        prior = np.where(prev >= 0, eid[np.maximum(prev, 0)], -1)
        return pa.table({
            "event_id": pa.array(eid),
            "prior_click": pa.array(prior.astype(np.int64)),
        })

    return group_apply_tasks(ds, ["user_id"], _asof)


def q_prune_column(sf_dir: str):
    """Standalone vector PruneColumn (SpParMat.cpp:2578-2654): pvals =
    per-column max weight; drop entries with w < pvals[col] — keeps
    exactly each column's maxima. Refs-only: pvals densifies into CHUNK
    refs (`reduce_dense_refs`) and `prune_column_refs` fetches only the
    chunks each batch touches — no O(n) driver vector."""
    from ..core.partition import chunk_bounds

    ctx = get_context(sf_dir)
    g = ctx.graph("directed")
    bounds = chunk_bounds(ctx.n, max(2, min(16, ctx.n // 1000 or 2)))
    p_refs = g.reduce_dense_refs("row", "max", bounds)
    return _decode_edge_labels(
        ctx, g.prune_column_refs(p_refs, bounds, "lt").edges, "w")


def q_prune_column_idx(sf_dir: str):
    """PruneColumnByIndex (SpDCCols.cpp:574): drop every column whose
    ARITHMETIC id is divisible by 5 (the oracle's id space)."""
    ctx = get_context(sf_dir)
    g = ctx.graph("directed")
    cols = np.nonzero(ctx.arith % 5 == 0)[0].astype(np.int64)
    return _decode_edge_labels(ctx, g.prune_column_by_index(cols).edges, "w")


def q_spgemm_phased(sf_dir: str):
    """Memory-phased SpGEMM (MemEfficientSpGEMM, ParFriends.h:452-779):
    forced small per-process budget so the multiply runs in >1 output
    phases; must equal the unphased spgemm_aa exactly (shares its
    oracle)."""
    from ..core.spgemm import spgemm_phased

    ctx = get_context(sf_dir)
    C, phases = spgemm_phased(ctx.edges, ctx.edges, ctx.n, phases=3)
    assert phases > 1, phases
    return _decode_edge_labels(ctx, C, "val")


def q_max_matching(sf_dir: str):
    """Maximum-cardinality bipartite matching (BPMaximumMatching.h:231):
    (label, mate_label) over the directed bipartite view. Deterministic
    (min-root/min-parent tie-breaks) but iterative — rows-only; exact
    maximum size vs augmenting-DFS oracle in pytest."""
    ctx = get_context(sf_dir)
    mate_col, _mate_row = alg.maximum_matching(ctx.engine("directed"))
    ids = np.nonzero(mate_col >= 0)[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "mate": _label_col(ctx, mate_col[ids]),
        }
    )


def q_md_ordering(sf_dir: str):
    """Minimum-degree ordering (MD.cpp:289-361) on the induced subgraph
    of the first MD_SUB arithmetic ids (the greedy loop is inherently
    sequential — bounded like the mcl query). Rows-only; exact equality
    with the brute MD oracle in pytest."""
    import os

    import ray

    from ..core.engine import SpmvEngine
    from ..core.graph import Graph
    from .context import CKPT_ROOT

    ctx = get_context(sf_dir)
    sub = min(MD_SUB, ctx.n)
    sel_ids = np.nonzero(ctx.arith < sub)[0]
    sel_ref = ray.put(sel_ids)

    def _sub(batch: pa.Table, *, _ref=sel_ref) -> pa.Table:
        sel = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        si = np.minimum(np.searchsorted(sel, src), len(sel) - 1)
        sj = np.minimum(np.searchsorted(sel, dst), len(sel) - 1)
        keep = (sel[si] == src) & (sel[sj] == dst)
        return pa.table(
            {
                "src": pa.array(si[keep].astype(np.int64)),
                "dst": pa.array(sj[keep].astype(np.int64)),
                "w": pc.filter(batch.column("w"), pa.array(keep)),
            }
        )

    sub_edges = ctx.graph("sym").edges.map_batches(_sub, batch_format="pyarrow")
    g = Graph(n=len(sel_ids), edges=sub_edges).dedup_sum()
    eng = SpmvEngine.from_graph(
        g, 2, os.path.join(CKPT_ROOT, f"md_{sub}_{len(sel_ids)}"),
        structural=True,
    )
    order = alg.md_ordering(eng)
    eng.shutdown()
    labels = ctx.gather_labels(sel_ids)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order), dtype=np.int64)),
            "label": pa.array(labels[order], type=pa.string()),
        }
    )


MD_SUB = 150


def _emb(sf_dir: str):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def q_embed_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs (a < b, cosine >= 0.4) — exact,
    via 2D block-pair tiling (no driver matrix, no full broadcast)."""
    from ..functions.ann import embedding_dup_pairs

    return embedding_dup_pairs(_emb(sf_dir), tau=0.4)


def q_embed_dups_lsh(sf_dir: str):
    """Sign-LSH-bucketed embedding near-dup (scale path): candidates from
    canonical-bucket shuffle + exact per-bucket verify. Rows-only; recall
    vs the exact baseline asserted in pytest."""
    from ..functions.ann import embedding_dup_pairs_lsh

    return embedding_dup_pairs_lsh(_emb(sf_dir), tau=0.4)


def q_ann_ivf(sf_dir: str):
    """IVF ANN: distributed-Lloyd coarse quantizer + nprobe list scan.
    Rows-only; recall vs brute force asserted in pytest."""
    from ..functions.ann import ann_ivf_topk

    return ann_ivf_topk(_emb(sf_dir), np.arange(10), k=5)


def q_ewise_scale(sf_dir: str):
    """EWiseScale(DenseParMat) (SpParMat.cpp:2830): w(i,j) *= D[i,j] with
    the functional dense matrix D = ((arith_i + 2*arith_j) % 5) + 1 —
    nothing n x n materializes."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def factor(dst, src, *, _d=dec):
        return ((_d.arith(dst) + 2 * _d.arith(src)) % 5 + 1).astype(np.float64)

    g2 = ctx.graph("directed").ewise_scale(factor)
    return _decode_edge_labels(ctx, g2.edges, "w")


def q_sample_edges(sf_dir: str):
    """Deterministic 10% edge sample (`SelectCandidates`-style sampling,
    §2.8): keep edges whose Knuth-hash of (src*n+dst) lands under the
    rate — reproducible, shuffle-free, SQL-expressible."""
    ctx = get_context(sf_dir)
    n = ctx.n

    def _s(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        key = src * np.int64(n) + dst
        # split-key hash: every intermediate fits int64 EXACTLY on both
        # the numpy and the SQL side (no silent wrap, no SQL overflow)
        h = ((key % (1 << 20)) * np.int64(2654435761)
             + key // (1 << 20)) % np.int64(1 << 32)
        return batch.filter(pa.array(h % 100 < 10))

    return _decode_edge_labels(
        ctx, ctx.edges.map_batches(_s, batch_format="pyarrow",
                                   zero_copy_batch=True), "w")


def q_randperm_edges(sf_dir: str):
    """`RandPerm` (FullyDistVec.cpp:784 semantics, deterministic variant):
    relabel every vertex by the modular permutation p(i) = (i * 48271)
    mod n (48271 prime => bijection while n is not a multiple of it) and
    emit the permuted ARITHMETIC-space edge table — the skew-decorrelation
    primitive."""
    ctx = get_context(sf_dir)
    n = ctx.n
    if n % 48271 == 0:  # keep the bijection guarantee explicit
        raise ValueError("n multiple of 48271; pick another multiplier")
    dec = ctx.decoder()

    def _p(batch: pa.Table, *, _d=dec) -> pa.Table:
        src = _d.arith(np.asarray(batch.column("src")))
        dst = _d.arith(np.asarray(batch.column("dst")))
        return pa.table(
            {
                "psrc": pa.array((src * np.int64(48271)) % n),
                "pdst": pa.array((dst * np.int64(48271)) % n),
                "w": batch.column("w"),
            }
        )

    return ctx.edges.map_batches(_p, batch_format="pyarrow",
                                 zero_copy_batch=True)


RP_SEED = 7


def q_randperm_sorted(sf_dir: str):
    """Sort-based `RandPerm` (`FullyDistVec.cpp:784-922`): attach seeded
    pseudo-random keys, distributed range-bucket sort, global rank =
    bucket-count prefix sum + local rank. Unlike q_randperm_edges'
    fixed modular bijection, this is the reference's actual operator
    shape (random keys -> psort -> re-id); the key generator is a seeded
    LCG scramble so the oracle can replay it in BIGINT SQL."""
    ctx = get_context(sf_dir)
    from ..core.vecops import randperm

    def _lab(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("v"))
        return pa.table({
            "label": pa.array(np.char.add("m_", v.astype("U20"))),
            "p": batch.column("val"),
        })

    return randperm(ctx.n, seed=RP_SEED).map_batches(
        _lab, batch_format="pyarrow", zero_copy_batch=True
    )


FBFS_LATEST_MIN = 300


def q_filtered_bfs_payload(sf_dir: str):
    """BFS over the struct-payload graph keeping only edges with
    cnt > 0 AND latest >= 300 — the Twitter filtered-semantic BFS
    (`FilteredBFS.cpp:107-110` predicate over `TwitterEdge.h:15-58`
    struct nonzeros), as bool_or_and SpMVs over per-(block, predicate)
    cached filtered views."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("payload")
    root = ctx.lookup_id("m_7")
    spec = (("cnt", "gt", 0), ("latest", "ge", FBFS_LATEST_MIN))
    d = np.full(ctx.n, np.inf)
    d[root] = 0.0
    r = np.zeros(ctx.n)
    r[root] = 1.0
    for level in range(1, BFS_ITERS + 1):
        r = eng.spmv_filtered(r, "bool_or_and", spec=spec)
        new = (r > 0) & ~np.isfinite(d)
        if not new.any():
            break
        d[new] = level
        r = np.isfinite(d).astype(np.float64)
    ids = np.nonzero(np.isfinite(d))[0]
    return pa.table({
        "label": _label_col(ctx, ids),
        "dist": pa.array(d[ids].astype(np.int64)),
    })


KCORE_K = 3
KCORE_ROUNDS = 6
HITS_ITERS = 3
VOCAB_K = 100
DECON_MOD = 97


def q_clustering_coeff(sf_dir: str):
    """Per-vertex triangle count, distinct-neighbor degree and local
    clustering coefficient over the undirected view — the per-vertex row
    sums of the reference's masked-SpGEMM triangle recipe
    (``SpParMat.h:161`` + ``ParFriends.h:1447``), fully distributed (see
    `alg.clustering_coefficients`). `coeff` is left un-rounded: both
    sides compute the identical IEEE expression (2.0*tri)/(deg*(deg-1.0))
    over exact integers, so the doubles are bit-equal."""
    ctx = get_context(sf_dir)
    t = alg.clustering_coefficients(ctx.graph("sym").edges, ctx.n)
    v = np.asarray(t.column("v"), dtype=np.int64)
    deg = np.zeros(ctx.n, dtype=np.int64)
    tri = np.zeros(ctx.n, dtype=np.int64)
    deg[v] = np.asarray(t.column("deg"), dtype=np.int64)
    tri[v] = np.asarray(t.column("tri"), dtype=np.int64)
    coeff = np.zeros(ctx.n, dtype=np.float64)
    m = deg >= 2
    coeff[m] = (2.0 * tri[m]) / (deg[m] * (deg[m] - 1.0))
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "deg": pa.array(deg, type=pa.int64()),
        "tri": pa.array(tri, type=pa.int64()),
        "coeff": pa.array(coeff, type=pa.float64()),
    })


def q_kcore_fixed(sf_dir: str):
    """k-core membership after exactly KCORE_ROUNDS synchronous peel
    rounds (k = KCORE_K) — iterated structural Reduce + Prune
    (`SpParMat::Reduce` + `SpParMat.h:152`), one fused SpMV+mask task
    round per peel."""
    ctx = get_context(sf_dir)
    core = alg.kcore_fixed(ctx.engine("sym"), KCORE_K, KCORE_ROUNDS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "in_core": pa.array(core.astype(np.int64), type=pa.int64()),
    })


def q_hits_fixed(sf_dir: str):
    """HITS authority/hub counts after exactly HITS_ITERS un-normalized
    iterations over the STRUCTURAL directed graph (two plus_times SpMVs
    per iteration, `ParFriends.h:2379`; integer-exact, see
    `alg.hits_fixed`)."""
    ctx = get_context(sf_dir)
    auth, hub = alg.hits_fixed(
        ctx.engine("dir_bool"), ctx.engine("rev_bool"), HITS_ITERS
    )
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "auth": pa.array(auth, type=pa.int64()),
        "hub": pa.array(hub, type=pa.int64()),
    })


def q_vocab_topk(sf_dir: str):
    """Top-VOCAB_K corpus tokens by frequency (count DESC, token ASC) —
    the tokenizer-vocabulary construction step (see `text.vocab_topk`)."""
    from ..functions import text as textf

    return textf.vocab_topk(_docs(sf_dir), k=VOCAB_K)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: distinct 3-gram shingle overlap counts
    of every non-benchmark document against the broadcast benchmark
    shingle set (docs with doc_id %% DECON_MOD == 0; see
    `dedup.decontaminate`)."""
    from ..functions import dedup as dedupf

    return dedupf.decontaminate(_docs(sf_dir), bench_mod=DECON_MOD)


PPR_ITERS = 10
PPR_SEED_MOD = 101
CONT_TAU = 0.8


def q_ppr(sf_dir: str):
    """Personalized PageRank (PPR_ITERS fixed iterations) with teleport
    on the seed set {arith id %% PPR_SEED_MOD == 0} — dangling mass and
    restarts both land on the seeds (see `pagerank.ppr_fixed`)."""
    from .pagerank import ppr_fixed

    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    mask = (np.asarray(ctx.arith) % PPR_SEED_MOD) == 0
    r = ppr_fixed(eng, mask, iters=PPR_ITERS)
    score = np.round(r * ctx.n, 6)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "score": pa.array(score),
    })


def q_containment_pairs(sf_dir: str):
    """Exact containment near-dup pairs (|A∩B| / min size >= CONT_TAU)
    over distinct 3-gram shingles (see `dedup.containment_pairs`)."""
    from ..functions import dedup as dedupf

    return dedupf.containment_pairs(_docs(sf_dir), tau=CONT_TAU)


# k=3, 2 rounds: non-empty at both driver scales (the 4-truss of this
# corpus graph is empty — multi-round peel dynamics are pytest-covered
# on a crafted graph where round count changes the answer)
KTRUSS_K = 3
KTRUSS_ROUNDS = 2


def q_ktruss_fixed(sf_dir: str):
    """Edges surviving exactly KTRUSS_ROUNDS synchronous k-truss peel
    rounds (k = KTRUSS_K: drop edges with support < k-2 each round) —
    the per-EDGE reduction of the masked-SpGEMM triangle recipe (see
    `alg.ktruss_fixed`). Pairs canonicalized by label order so both
    sides agree on column orientation."""
    ctx = get_context(sf_dir)
    keys = alg.ktruss_fixed(
        ctx.graph("sym").edges, ctx.n, KTRUSS_K, KTRUSS_ROUNDS
    )
    n = np.int64(ctx.n)
    la = ctx.gather_labels((keys // n).astype(np.int64))
    lb = ctx.gather_labels((keys % n).astype(np.int64))
    swap = la > lb  # np.minimum has no unicode loop; orient explicitly
    return pa.table({
        "a_label": pa.array(np.where(swap, lb, la), type=pa.string()),
        "b_label": pa.array(np.where(swap, la, lb), type=pa.string()),
    })


def q_sample_stratified(sf_dir: str):
    """Deterministic language-balancing downsample (seeded LCG residue
    per doc_id, per-language quota; see `text.sample_stratified`)."""
    import ray

    from ..functions import text as textf

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    return textf.sample_stratified(docs)


def q_redact(sf_dir: str):
    """Regex redaction stage (PII-scrub machinery; see `text.Redactor`):
    pattern set compiled once per actor, two vectorized RE2 kernels per
    pattern per batch."""
    from ..functions import text as textf

    return textf.redact(_docs(sf_dir))


QUANTILES = (0.5, 0.9, 0.99)


def _quantile_kernel(t: pa.Table) -> pa.Table:
    """Per event_type partition: exact discrete quantiles
    sorted[ceil(q*n)-1] — `quantile_disc` semantics, element equality
    (no interpolation, so the oracle compare is exact)."""
    empty = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "q50": pa.array([], type=pa.float64()),
        "q90": pa.array([], type=pa.float64()),
        "q99": pa.array([], type=pa.float64()),
    })
    if t.num_rows == 0 or "event_type" not in t.column_names:
        return empty
    et = np.asarray(t.column("event_type")).astype(str)
    val = np.asarray(t.column("value"), dtype=np.float64)
    order = np.lexsort((val, et))
    et, val = et[order], val[order]
    keys, starts, cnts = np.unique(et, return_index=True,
                                   return_counts=True)
    cols = {"event_type": pa.array(keys.tolist(), type=pa.string())}
    for name, q in zip(("q50", "q90", "q99"), QUANTILES):
        idx = starts + np.minimum(
            cnts - 1, np.ceil(q * cnts).astype(np.int64) - 1
        )
        cols[name] = pa.array(val[idx], type=pa.float64())
    return pa.table(cols)


def q_events_quantiles(sf_dir: str):
    """Exact per-type value percentiles (p50/p90/p99, discrete
    quantile) — ONE keyed warm-task shuffle, whole-partition vectorized
    sort+pick per group."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return group_apply_tasks(ds, ["event_type"], _quantile_kernel)


# ---------------------------------------------------------------------------
# wave 5: sketches, tf-idf, window lag, rollup
# ---------------------------------------------------------------------------


def q_hll_registers(sf_dir: str):
    """HyperLogLog distinct-token sketch — the full (b, r) register
    table (integer-exact; see `text.hll_registers`)."""
    from ..functions import text as T

    return T.hll_registers(_docs(sf_dir))


def q_tfidf_topk(sf_dir: str):
    """Top-3 terms per document by integer tf-idf score
    tf * ((N*1e6) // df) (see `text.tfidf_topk`)."""
    from ..functions import text as T

    return T.tfidf_topk(_docs(sf_dir))


def _gap_kernel(t: pa.Table) -> pa.Table:
    """Per user-hash partition: LAG() over (PARTITION BY user ORDER BY
    ts, event_id) — whole-partition lexsort + shifted compare."""
    empty = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "prev_event_id": pa.array([], type=pa.int64()),
        "gap_us": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return empty
    eid = np.asarray(t.column("event_id"), dtype=np.int64)
    ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(np.int64)
    uid = np.asarray(t.column("user_id"), dtype=np.int64)
    order = np.lexsort((eid, ts, uid))
    eid, ts, uid = eid[order], ts[order], uid[order]
    same = np.zeros(len(eid), dtype=bool)
    same[1:] = uid[1:] == uid[:-1]
    idx = np.nonzero(same)[0]
    return pa.table({
        "event_id": pa.array(eid[idx]),
        "prev_event_id": pa.array(eid[idx - 1]),
        "gap_us": pa.array(ts[idx] - ts[idx - 1]),
    })


def q_event_gaps(sf_dir: str):
    """Per-event time gap to the user's previous event (the LAG window
    function): ONE user_id warm-task shuffle + whole-partition
    vectorized sort/shift — all rows of a user co-locate, so the
    partition-local lag is globally exact."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return group_apply_tasks(ds, ["user_id"], _gap_kernel)


def _rollup_kernel(t: pa.Table) -> pa.Table:
    """Finest-level (event_type, hour-of-day) partial: count + exact
    integer cents (floor(value*100 + 0.5) — same tie rule as the SQL
    twin; np.round/SQL round differ on halves)."""
    empty = pa.table({
        "event_type": pa.array([], type=pa.string()),
        "hr": pa.array([], type=pa.int64()),
        "cnt": pa.array([], type=pa.int64()),
        "cents": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "event_type" not in t.column_names:
        return empty
    et = np.asarray(t.column("event_type")).astype(str)
    ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(np.int64)
    hr = (ts // 3_600_000_000) % 24
    cents = np.floor(
        np.asarray(t.column("value"), dtype=np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    order = np.lexsort((hr, et))
    et, hr, cents = et[order], hr[order], cents[order]
    new = np.empty(len(et), dtype=bool)
    new[0] = True
    new[1:] = (et[1:] != et[:-1]) | (hr[1:] != hr[:-1])
    starts = np.nonzero(new)[0]
    grp = np.cumsum(new) - 1
    cnt = np.bincount(grp).astype(np.int64)
    cs = ibincount(grp, weights=cents.astype(np.float64)).astype(np.int64)
    return pa.table({
        "event_type": pa.array(et[starts].tolist(), type=pa.string()),
        "hr": pa.array(hr[starts]),
        "cnt": pa.array(cnt),
        "cents": pa.array(cs),
    })


def q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(event_type, hour-of-day): the finest level is one
    distributed keyed reduce; the coarser levels are derived from its
    <=|types|*24 output rows (bounded — the classic rollup-from-finest
    identity; sentinels 'ALL' / -1 stand in for the SQL NULLs)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    fine = group_apply_tasks(ds, ["event_type"], _rollup_kernel)
    tabs = [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _rollup_kernel(pa.table({}))
    fine_t = pa.concat_tables(tabs)
    et = np.asarray(fine_t.column("event_type")).astype(str)
    hr = np.asarray(fine_t.column("hr"), dtype=np.int64)
    cnt = np.asarray(fine_t.column("cnt"), dtype=np.int64)
    cents = np.asarray(fine_t.column("cents"), dtype=np.int64)
    uk, inv = np.unique(et, return_inverse=True)
    lvl1_cnt = np.bincount(inv, weights=cnt.astype(np.float64))
    lvl1_cents = np.bincount(inv, weights=cents.astype(np.float64))
    out_et = np.concatenate((et, uk, np.array(["ALL"])))
    out_hr = np.concatenate((hr, np.full(len(uk), -1, dtype=np.int64),
                             np.array([-1], dtype=np.int64)))
    out_cnt = np.concatenate((cnt, lvl1_cnt.astype(np.int64),
                              np.array([cnt.sum()], dtype=np.int64)))
    out_cents = np.concatenate((cents, lvl1_cents.astype(np.int64),
                                np.array([cents.sum()], dtype=np.int64)))
    return pa.table({
        "event_type": pa.array(out_et.tolist(), type=pa.string()),
        "hr": pa.array(out_hr),
        "cnt": pa.array(out_cnt),
        "cents": pa.array(out_cents),
    })


SCC_COLOR_ITERS = 8
RW_STEPS = 6
RW_WALKERS = 24


def q_scc_coloring(sf_dir: str):
    """Fixed-round SCC coloring: fwd/bwd min-label over the structural
    directed + transposed engines; v joins SCC r iff both directional
    minima agree on r (see `alg.scc_coloring`)."""
    ctx = get_context(sf_dir)
    scc = alg.scc_coloring(ctx.engine("dir_bool"), ctx.engine("rev_bool"),
                        SCC_COLOR_ITERS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "scc": _label_col(ctx, scc),
    })


def q_random_walks(sf_dir: str):
    """RW_WALKERS deterministic LCG walks of RW_STEPS steps from seeds
    m_0..m_{W-1} over the directed distinct-pair graph (see
    `alg.random_walks`; ranked-adjacency partitions are built once and
    each step moves O(walkers) data)."""
    ctx = get_context(sf_dir)
    seeds = ctx.vdict.lookup_ids([f"m_{w}" for w in range(RW_WALKERS)])
    walks = alg.random_walks(ctx.edges, seeds, RW_STEPS)
    return pa.table({
        "walker": walks.column("walker"),
        "step": walks.column("step"),
        "label": pa.array(
            ctx.gather_labels(
                np.asarray(walks.column("vertex"), dtype=np.int64)),
            type=pa.string()),
    })


def q_scc(sf_dir: str):
    """Full SCC decomposition (iterated trim + FW-BW coloring, see
    `alg.scc`). Rows-only: the round count is data-dependent, so there
    is no fixed-depth SQL unrolling; pytest verifies against a driver
    Tarjan on the n=500 fixture."""
    ctx = get_context(sf_dir)
    labels = alg.scc(ctx.engine("dir_bool"), ctx.engine("rev_bool"))
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "scc": _label_col(ctx, labels),
    })


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def _pivot_kernel(t: pa.Table) -> pa.Table:
    """Per user-hash partition: one wide row per user with per-type
    event counts (the PIVOT / conditional-aggregation kernel)."""
    cols = {"user_id": pa.array([], type=pa.int64())}
    for ty in PIVOT_TYPES:
        cols[f"n_{ty}"] = pa.array([], type=pa.int64())
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return pa.table(cols)
    uid = np.asarray(t.column("user_id"), dtype=np.int64)
    et = np.asarray(t.column("event_type")).astype(str)
    uu, inv = np.unique(uid, return_inverse=True)
    out = {"user_id": pa.array(uu)}
    for ty in PIVOT_TYPES:
        cnt = np.zeros(len(uu), dtype=np.int64)
        np.add.at(cnt, inv[et == ty], 1)
        out[f"n_{ty}"] = pa.array(cnt)
    return pa.table(out)


def q_pivot_user_type(sf_dir: str):
    """PIVOT events into one wide per-user row of per-type counts
    (conditional aggregation): ONE user_id warm-task shuffle +
    whole-partition vectorized scatter-adds."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return group_apply_tasks(ds, ["user_id"], _pivot_kernel)


OOV_VOCAB_K = 64


def q_oov_rate(sf_dir: str):
    """Out-of-vocabulary statistics per document against the corpus
    top-OOV_VOCAB_K vocabulary (tokenizer-coverage audit): (doc_id,
    n_tokens, n_oov), all integers. The vocabulary is a global top-k
    (value_counts combiner + keyed shuffle, `text.vocab_topk`) whose
    k rows broadcast once; the scan is one streaming map_batches with
    a vectorized sorted-membership probe."""
    import ray

    from ..functions import text as T

    docs = _docs(sf_dir)
    vt = T.vocab_topk(docs, k=OOV_VOCAB_K)
    vocab = np.sort(np.asarray(vt.column("tok")).astype(str))
    vref = ray.put(vocab)

    def _scan(batch: pa.Table, *, _ref=vref) -> pa.Table:
        v = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        toks = T.tokens_list(batch)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        if len(v):
            pos = np.minimum(np.searchsorted(v, flat), len(v) - 1)
            oov = (v[pos] != flat).astype(np.int64)
        else:
            oov = np.ones(len(flat), dtype=np.int64)
        doc_grp = np.repeat(np.arange(batch.num_rows), lens)
        n_oov = ibincount(doc_grp, weights=oov.astype(np.float64),
                            minlength=batch.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(lens),
            "n_oov": pa.array(n_oov),
        })

    return docs.map_batches(_scan, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_pagerank_incremental(sf_dir: str):
    """Incremental PageRank: a deterministic 1%-ish edge delta is
    removed, and the updated graph's ranks warm-start from the full
    graph's converged vector (see `pagerank.pagerank_incremental`).
    Rows-only: the fixpoint matches a cold re-run to tol (pytest
    asserts allclose + fewer warm iterations), but the float path
    differs per start so there is no hashable SQL twin."""
    import os

    from ..core.engine import SpmvEngine
    from .context import CKPT_ROOT
    from .pagerank import pagerank, pagerank_incremental

    ctx = get_context(sf_dir)
    r_prev, _ = pagerank(ctx.engine("directed"), tol=1e-10, max_iters=100)

    pruned = ctx.graph("directed").prune(
        lambda s, d, w: (s * 31 + d) % 101 == 0
    )
    eng = SpmvEngine.from_graph(
        pruned, ctx.engine("directed").g,
        os.path.join(CKPT_ROOT, f"princ_{ctx.n}"),
    )
    r, info = pagerank_incremental(eng, r_prev, tol=1e-10, max_iters=100)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "score": pa.array(np.round(r, 9)),
    })


# ---------------------------------------------------------------------------
# Wave 6: running total / anti join / sequence packing
# ---------------------------------------------------------------------------

SEQ_PACK_L = 512  # token budget per packed training sequence


def _runtot_kernel(t: pa.Table) -> pa.Table:
    """Per user-hash partition: SUM(cents) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) — whole-partition lexsort + segmented cumsum
    (integer cents via floor(value*100 + 0.5), same tie rule as SQL)."""
    empty = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "user_id": pa.array([], type=pa.int64()),
        "cum_cents": pa.array([], type=pa.int64()),
    })
    if t.num_rows == 0 or "user_id" not in t.column_names:
        return empty
    eid = np.asarray(t.column("event_id"), dtype=np.int64)
    ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(np.int64)
    uid = np.asarray(t.column("user_id"), dtype=np.int64)
    cents = np.floor(
        np.asarray(t.column("value"), dtype=np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    eid, uid, cents = eid[order], uid[order], cents[order]
    cs = np.cumsum(cents)
    new = np.empty(len(uid), dtype=bool)
    new[0] = True
    new[1:] = uid[1:] != uid[:-1]
    starts = np.nonzero(new)[0]
    seg_base = np.where(starts > 0, cs[starts - 1], 0)
    grp = np.cumsum(new) - 1
    cum = cs - seg_base[grp]
    return pa.table({
        "event_id": pa.array(eid),
        "user_id": pa.array(uid),
        "cum_cents": pa.array(cum),
    })


def q_running_total(sf_dir: str):
    """Per-user running total of event value (the cumulative-SUM window
    function): ONE user_id warm-task shuffle co-locates each user's
    rows, then a whole-partition vectorized lexsort + segmented cumsum
    — partition-local running totals are globally exact. Integer cents
    keep the sums order-free exact."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return group_apply_tasks(ds, ["user_id"], _runtot_kernel)


def q_cust_no_orders(sf_dir: str):
    """Anti join: customers that never placed an URGENT-priority order
    (`NOT EXISTS` with a pushed-down predicate). The priority filter is
    pushed into the parquet read (only matching row groups leave
    storage); both sides route by custkey hash on warm num_cpus=0
    tasks; the partition-local pyarrow `left anti` join is globally
    exact under co-partitioning (all rows of a key land in one
    partition). Account balance returned as exact integer cents."""
    import pyarrow.dataset as pads
    import ray

    from ..core.shuffle import hash_join_tasks

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )

    def _cents(t: pa.Table) -> pa.Table:
        bal = np.floor(
            np.asarray(t.column("c_acctbal"), dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_name": t.column("c_name"),
            "bal_cents": pa.array(bal),
        })

    return hash_join_tasks(
        cust, orders, on="c_custkey", right_on="o_custkey",
        join_type="left anti", post=_cents,
    )


def q_seq_pack(sf_dir: str):
    """Token-budget sequence packing prep: per language, docs in doc_id
    order are assigned to consecutive training-sequence bins of
    SEQ_PACK_L tokens (bin = floor(preceding-token-cumsum / L)).

    Plan: a SHUFFLE-FREE two-pass distributed prefix scan — a lang
    keyed shuffle would put every doc of a language in one partition
    (language skew is the worst key skew there is at corpus scale).
    Pass 1: per-block (block, lang, subtotal) partials (blocks are
    doc_id-ordered parquet row ranges); the driver prefix-sums the
    tiny (blocks x langs) grid; pass 2: per-block bin assignment with
    the broadcast offsets — bin is a pure function of the global
    per-lang cumsum, so the result is identical to the single-scan
    answer. NOTE: assumes doc_id order == block order within the
    parquet source (true for this corpus; a pre-sorted read at scale)."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def _ntok(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "ntok": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    enc = ds.map_batches(_ntok, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    refs = enc.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _subtotals(block: pa.Table):
        did = np.asarray(block.column("doc_id"), dtype=np.int64)
        lang = np.asarray(block.column("lang")).astype(str)
        nt = np.asarray(block.column("ntok"), dtype=np.int64)
        u, inv = np.unique(lang, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, nt)
        return int(did.min()) if len(did) else -1, u, s

    subs = ray.get([_subtotals.remote(r) for r in refs])
    # blocks are contiguous disjoint doc_id ranges but may come back in
    # any order — rank them by min doc_id, not by ref position
    rank = sorted(range(len(subs)), key=lambda i: subs[i][0])
    offsets: list[dict] = [None] * len(subs)
    running: dict[str, int] = {}
    for i in rank:
        offsets[i] = dict(running)
        _, u, s = subs[i]
        for l, v in zip(u, s):
            running[l] = running.get(l, 0) + int(v)

    @ray.remote(num_cpus=0)
    def _assign(block: pa.Table, off: dict):
        did = np.asarray(block.column("doc_id"), dtype=np.int64)
        lang = np.asarray(block.column("lang")).astype(str)
        nt = np.asarray(block.column("ntok"), dtype=np.int64)
        order = np.lexsort((did, lang))
        did, lang, nt = did[order], lang[order], nt[order]
        cs = np.cumsum(nt)
        new = np.empty(len(lang), dtype=bool)
        if len(lang):
            new[0] = True
            new[1:] = lang[1:] != lang[:-1]
        starts = np.nonzero(new)[0]
        seg_base = np.where(starts > 0, cs[starts - 1], 0)
        grp = np.cumsum(new) - 1
        local = cs - seg_base[grp]
        base = np.array([off.get(l, 0) for l in lang[starts]],
                        dtype=np.int64)
        cum = local + base[grp]
        return pa.table({
            "doc_id": pa.array(did),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "ntok": pa.array(nt),
            "bin": pa.array((cum - nt) // SEQ_PACK_L),
        })

    return ray.data.from_arrow_refs(
        [_assign.remote(r, offsets[i]) for i, r in enumerate(refs)]
    )


NBRJ_TOPK = 100
NBRJ_MIN = 2  # min shared neighbors for a candidate pair


def q_nbr_jaccard(sf_dir: str):
    """Neighborhood-Jaccard link prediction: for every non-adjacent
    pair (a < b) with >= NBRJ_MIN shared neighbors, the integer-scaled
    Jaccard of their neighbor sets — score = cn * 10^6 //
    (deg(a) + deg(b) - cn) — top-NBRJ_TOPK by (score DESC, a, b).
    Same wedge SpGEMM + anti-mask plan as `q_link_predict_cn`; the
    degree vector (one int per vertex, the FullyDistVec analog) is
    `ray.put` ONCE and read per task — no degree join shuffle."""
    return nbr_jaccard_table(get_context(sf_dir))


def nbr_jaccard_table(ctx):
    import ray

    from ..core import spgemm as SG

    g = ctx.graph("sym")
    n = ctx.n
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((deg.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges
    cn = SG.spgemm_tasks(be, be, n, add="sum", num_partitions=gp)
    cn = SG.coordinate_mask(cn, g.edges, n, anti=True, num_partitions=gp)
    deg_ref = ray.put(deg)

    def _score(b: pa.Table, *, _ref=deg_ref) -> pa.Table:
        dv = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = np.asarray(b.column("src"))
        d = np.asarray(b.column("dst"))
        w = np.asarray(b.column("w")).astype(np.int64)
        keep = (s < d) & (w >= NBRJ_MIN)
        s, d, w = s[keep], d[keep], w[keep]
        union = dv[s] + dv[d] - w
        return pa.table({
            "a": pa.array(s), "b": pa.array(d),
            "score": pa.array(w * 1_000_000 // union),
        })

    top = (cn.map_batches(_score, batch_format="pyarrow")
             .sort(["score", "a", "b"], descending=[True, False, False])
             .limit(NBRJ_TOPK).to_pandas())
    return pa.table({
        "a": pa.array(ctx.gather_labels(top["a"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "b": pa.array(ctx.gather_labels(top["b"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "score": pa.array(top["score"].to_numpy(dtype=np.int64)),
    })


def q_chunk_dups(sf_dir: str):
    """Cross-document chunk dedup (the paragraph-dedup analog): per doc,
    how many of its consecutive 8-token chunks occur verbatim in another
    document. Chunk identity = the fingerprint md5+Horner rolling hash
    over the chunk's tokens (bit-exact SQL twin — both sides group on
    the hash)."""
    import ray

    from ..functions.dedup import chunk_dup_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_dup_stats(ds)


def q_stress(sf_dir: str):
    """Single-source stress centrality from m_0 (integer Brandes: sigma
    forward + path-count backward accumulation, `alg.stress_source`).
    Emits reached vertices OTHER than the root with their dist / sigma /
    through-path count (all integer-exact)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    d, sig, g = alg.stress_source(ctx.engine("sym"), root, iters=BFS_ITERS)
    ids = np.nonzero(np.isfinite(d))[0]
    ids = ids[ids != root]
    stress = (sig[ids] * g[ids]).astype(np.int64)
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "dist": pa.array(d[ids].astype(np.int64)),
            "sigma": pa.array(sig[ids].astype(np.int64)),
            "stress": pa.array(stress),
        }
    )


# ---------------------------------------------------------------------------
# Wave 7: widest paths / community stats / JSON props extraction
# ---------------------------------------------------------------------------

WIDEST_ITERS = 8
BNECK_INF = 1e9  # finite root sentinel (SQL-representable)


def q_widest_paths(sf_dir: str):
    """Maximum-bottleneck path widths from m_1 over the directed
    integer-weighted graph (the SSSP weight rule), exactly WIDEST_ITERS
    synchronous max_min rounds — the max_min semiring end-to-end (see
    `alg.widest_paths_fixed`). Reached vertices only; the root reports
    the 10^9 sentinel."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_1")
    b = alg.widest_paths_fixed(ctx.engine("sssp"), root, WIDEST_ITERS,
                               inf=BNECK_INF)
    ids = np.nonzero(np.isfinite(b))[0]
    return pa.table(
        {
            "label": _label_col(ctx, ids),
            "width": pa.array(b[ids].astype(np.int64)),
        }
    )


def q_community_stats(sf_dir: str):
    """Per-component summary of the fixed-round CC labeling: vertex
    count + internal (distinct-pair, directed) edge count per
    component. The O(n) component vector (FullyDistVec analog) is
    `ray.put` ONCE; edge batches stream through a vectorized
    equal-label bincount partial and only (comp, count) partials reach
    the driver (output cardinality = number of components)."""
    import ray

    ctx = get_context(sf_dir)
    comp = alg.cc_fixed(ctx.engine("sym"), CC_ITERS)
    vcnt = np.bincount(comp, minlength=ctx.n)
    comp_ref = ray.put(comp)

    def _part(b: pa.Table, *, _ref=comp_ref) -> pa.Table:
        c = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = c[np.asarray(b.column("src"))]
        d = c[np.asarray(b.column("dst"))]
        m = s == d
        u, cnt = np.unique(s[m], return_counts=True)
        return pa.table({
            "comp": pa.array(u.astype(np.int64)),
            "ecnt": pa.array(cnt.astype(np.int64)),
        })

    from ..core.shuffle import group_apply_tasks

    def _merge(t: pa.Table) -> pa.Table:
        empty = pa.table({"comp": pa.array([], type=pa.int64()),
                          "ecnt": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "comp" not in t.column_names:
            return empty
        c = np.asarray(t.column("comp"), dtype=np.int64)
        e = np.asarray(t.column("ecnt"), dtype=np.int64)
        u, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, e)
        return pa.table({"comp": pa.array(u), "ecnt": pa.array(s)})

    # keyed reduce of the per-batch partials BEFORE the driver pull: the
    # driver sees exactly one row per component, not one per (batch,
    # component) pair
    parts = group_apply_tasks(
        ctx.edges.map_batches(_part, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["comp"], _merge,
    ).to_pandas()
    ecnt = parts.groupby("comp")["ecnt"].sum()
    comps = np.nonzero(vcnt)[0]
    e = np.zeros(len(comps), dtype=np.int64)
    idx = {c: i for i, c in enumerate(comps)}
    for c, v in ecnt.items():
        e[idx[c]] = v
    return pa.table({
        "comp": _label_col(ctx, comps),
        "n_vertices": pa.array(vcnt[comps].astype(np.int64)),
        "n_edges": pa.array(e),
    })


def q_json_props(sf_dir: str):
    """Semi-structured extraction: pull the integer `k` field out of
    the JSON `props` column (vectorized RE2 `extract_regex` per batch —
    the same engine DuckDB's regexp_extract uses) and aggregate per
    event type: count, sum, max. One streaming map_batches + a bounded
    per-type merge."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def _extract(b: pa.Table) -> pa.Table:
        ks = pc.extract_regex(b.column("props"), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64())
        et = np.asarray(b.column("event_type")).astype(str)
        kv = k.to_numpy(zero_copy_only=False)
        valid = ~pd_isnull(kv)
        et, kv = et[valid], kv[valid].astype(np.int64)
        u, inv = np.unique(et, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, kv)
        mx = np.full(len(u), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, kv)
        return pa.table({
            "event_type": pa.array(u.tolist(), type=pa.string()),
            "cnt": pa.array(cnt),
            "sum_k": pa.array(s),
            "max_k": pa.array(mx),
        })

    parts = ds.map_batches(
        _extract, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = parts.groupby("event_type").agg(
        cnt=("cnt", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max")
    ).reset_index()
    return pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "cnt": pa.array(out["cnt"].to_numpy(dtype=np.int64)),
        "sum_k": pa.array(out["sum_k"].to_numpy(dtype=np.int64)),
        "max_k": pa.array(out["max_k"].to_numpy(dtype=np.int64)),
    })


def pd_isnull(a: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.isnull(a)


ECC_SEEDS = ("m_0", "m_1", "m_2")


def q_ecc_sample(sf_dir: str):
    """Sampled eccentricities (the BFS-based diameter lower-bound
    estimator): for each seed vertex, the max BFS level reached within
    BFS_ITERS rounds plus the count of reached vertices — one
    refs-only min_plus BFS per seed over the undirected structural
    engine."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    seeds, eccs, reached = [], [], []
    for s in ECC_SEEDS:
        root = ctx.lookup_id(s)
        d = alg.min_plus_distances(eng, root, iters=BFS_ITERS)
        fin = np.isfinite(d)
        seeds.append(s)
        eccs.append(int(d[fin].max(initial=0.0)))
        reached.append(int(fin.sum()))
    return pa.table({
        "seed": pa.array(seeds, type=pa.string()),
        "ecc": pa.array(np.array(eccs, dtype=np.int64)),
        "n_reached": pa.array(np.array(reached, dtype=np.int64)),
    })


def q_coarsen(sf_dir: str):
    """Graph coarsening by matching contraction — the multilevel-method
    building block (S^T A S with S the matched-pair selection matrix,
    computed as a broadcast relabel + distributed dedup-sum rather than
    two SpGEMMs; `tests/test_wave6.py` asserts the SpGEMM form agrees):
    matched pairs from the fixed-round maximal matching collapse into
    super-vertices (min id), coarse edge weights sum, loops drop."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    prio_refs = _lcg_prio_refs(eng, 23, MIS_PRIO_P, dtype=np.int64)
    m = alg.maximal_matching(eng, prio_full=prio_refs,
                             max_rounds=MATCH_ROUNDS)
    return coarsen_table(ctx, m)


def coarsen_table(ctx, mates: np.ndarray):
    import ray

    from ..core.graph import Graph

    ids = np.arange(ctx.n, dtype=np.int64)
    comp = np.where(mates >= 0, np.minimum(ids, mates), ids)
    comp_ref = ray.put(comp)

    def _con(b: pa.Table, *, _ref=comp_ref) -> pa.Table:
        c = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = c[np.asarray(b.column("src"))]
        d = c[np.asarray(b.column("dst"))]
        return pa.table({
            "src": pa.array(s), "dst": pa.array(d),
            "w": b.column("w"),
        })

    contracted = ctx.edges.map_batches(
        _con, batch_format="pyarrow", zero_copy_batch=True
    )
    coarse = Graph(n=ctx.n, edges=contracted).dedup_sum(drop_loops=True)
    return _decode_edge_labels(ctx, coarse.edges, "w")


BIGRAM_K = 100


def q_bigram_topk(sf_dir: str):
    """Global top-k bigrams by frequency (collocation extraction for
    tokenizer merge-rule training; see `text.bigram_topk`)."""
    import ray

    from ..functions.text import bigram_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bigram_topk(ds, k=BIGRAM_K)


def q_modularity_stats(sf_dir: str):
    """Per-community modularity sufficient statistics over the
    fixed-round label-propagation classes: vertex count, degree sum
    (undirected distinct view) and internal-edge endpoint count — all
    BIGINT-exact; modularity Q is a driver-side scalar over them. Class
    vector broadcast once; endpoint partials reduce by class before the
    driver pull (bounded by the class count)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    init = (ctx.arith % LP_CLASSES).astype(np.int64)
    cls = alg.label_propagation(ctx.engine("sym"), init, LP_CLASSES,
                                LP_ITERS)
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    nv = np.bincount(cls, minlength=LP_CLASSES)
    ds = np.zeros(LP_CLASSES, dtype=np.int64)
    np.add.at(ds, cls, deg)
    cls_ref = ray.put(cls)

    def _part(b: pa.Table, *, _ref=cls_ref) -> pa.Table:
        c = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = c[np.asarray(b.column("src"))]
        d = c[np.asarray(b.column("dst"))]
        m = s == d
        u, cnt = np.unique(s[m], return_counts=True)
        return pa.table({
            "cls": pa.array(u.astype(np.int64)),
            "internal": pa.array(cnt.astype(np.int64)),
        })

    def _merge(t: pa.Table) -> pa.Table:
        empty = pa.table({"cls": pa.array([], type=pa.int64()),
                          "internal": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "cls" not in t.column_names:
            return empty
        c = np.asarray(t.column("cls"), dtype=np.int64)
        e = np.asarray(t.column("internal"), dtype=np.int64)
        u, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, e)
        return pa.table({"cls": pa.array(u), "internal": pa.array(s)})

    und = ctx.graph("sym").dedup_sum().edges  # distinct symmetric pairs
    parts = group_apply_tasks(
        und.map_batches(_part, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["cls"], _merge,
    ).to_pandas()
    internal = np.zeros(LP_CLASSES, dtype=np.int64)
    for c, v in zip(parts.cls, parts.internal):
        internal[c] = v
    present = np.nonzero(nv)[0]
    return pa.table({
        "cls": pa.array(present.astype(np.int64)),
        "n_vertices": pa.array(nv[present].astype(np.int64)),
        "deg_sum": pa.array(ds[present]),
        "internal": pa.array(internal[present]),
    })


def q_transpose(sf_dir: str):
    """A^T as an edge table — `SpParMat::Transpose` (SpParMat.cpp:3541;
    golden `ReleaseTests/Transpose_Test`). Pure per-batch column swap —
    zero shuffle (the 2D block key flips (br,bc)->(bc,br) lazily at the
    next repartition, exactly as the reference transposes ownership)."""
    ctx = get_context(sf_dir)
    return _decode_edge_labels(ctx, ctx.graph("directed").transpose().edges,
                               "w")


GALERKIN_NC = 64  # coarse vertex count
GALERKIN_WMOD = 3  # restriction weight = 1 + (i % 3)


def q_galerkin(sf_dir: str):
    """Galerkin triple product A_c = R * A * R^T with a deterministic
    weighted restriction R[c, i] = 1 + (i % 3) for c = i % 64 over
    arithmetic ids — the multilevel coarse-grid operator
    (`ReleaseTests/GalerkinNew.cpp`; `SpParMat::SubsRef_SR`'s
    permutation-matrix SpGEMM machinery, SpParMat.cpp:2030). R's coarse
    map is functional (each fine vertex has exactly one coarse row), so
    the two SpGEMMs collapse into one per-batch relabel + weight scale
    and a keyed dedup-sum on (csrc, cdst) — no permutation matrices
    materialize, the reference's own plan for selection-like R. Exact:
    every product/sum is a small integer in the f64 channel."""
    return galerkin_table(get_context(sf_dir))


def galerkin_table(ctx):
    from ..core.shuffle import group_apply_tasks

    dec = ctx.decoder()

    def _coarsen(batch: pa.Table, *, _d=dec) -> pa.Table:
        si = _d.arith(np.asarray(batch.column("src")))
        di = _d.arith(np.asarray(batch.column("dst")))
        w = np.asarray(batch.column("w"))
        wc = (1.0 + si % GALERKIN_WMOD) * w * (1.0 + di % GALERKIN_WMOD)
        key = (si % GALERKIN_NC) * GALERKIN_NC + (di % GALERKIN_NC)
        # per-batch combiner: coarse key space is tiny (NC^2)
        s = np.zeros(GALERKIN_NC * GALERKIN_NC, dtype=np.float64)
        np.add.at(s, key, wc)
        nz = np.nonzero(s)[0]
        return pa.table({
            "csrc": pa.array((nz // GALERKIN_NC).astype(np.int64)),
            "cdst": pa.array((nz % GALERKIN_NC).astype(np.int64)),
            "w": pa.array(s[nz]),
        })

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "csrc" not in t.column_names:
            return pa.table({"csrc": pa.array([], type=pa.int64()),
                             "cdst": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.float64())})
        key = (np.asarray(t.column("csrc")) * GALERKIN_NC
               + np.asarray(t.column("cdst")))
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), dtype=np.float64)
        np.add.at(s, inv, np.asarray(t.column("w")))
        return pa.table({
            "csrc": pa.array((u // GALERKIN_NC).astype(np.int64)),
            "cdst": pa.array((u % GALERKIN_NC).astype(np.int64)),
            "w": pa.array(s),
        })

    return group_apply_tasks(
        ctx.edges.map_batches(_coarsen, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["csrc", "cdst"], _merge,
    )


TPCH_Q4_LATE_DAYS = 60


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4-style order-priority check: count orders per priority
    that have at least one LATE line (l_shipdate > o_orderdate + 60
    days) — the EXISTS semi-join. The lineitem side reduces to one
    (orderkey, max shipdate) row per order inside its batches before
    the single co-partitioned hash join; the predicate + per-priority
    count fuse into the join task, so only tiny (priority, cnt)
    partials reach the driver. Timestamps compare as exact int64
    microseconds."""
    import ray

    from ..core.shuffle import hash_join_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def _li_max(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("l_orderkey"))
        s = np.asarray(batch.column("l_shipdate")).astype("datetime64[us]") \
            .astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, s)
        return pa.table({"l_orderkey": pa.array(u), "ship_us": pa.array(mx)})

    li_max = li.map_batches(_li_max, batch_format="pyarrow",
                            zero_copy_batch=True)
    late_us = TPCH_Q4_LATE_DAYS * 86400 * 1_000_000

    def _late_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        # partials of one order co-locate: final per-order max, then filter
        g = t.group_by("l_orderkey").aggregate(
            [("ship_us", "max"), ("o_orderdate", "min"),
             ("o_orderpriority", "min")])
        od = np.asarray(g.column("o_orderdate_min")) \
            .astype("datetime64[us]").astype(np.int64)
        late = np.asarray(g.column("ship_us_max")) > od + late_us
        pr = np.asarray(g.column("o_orderpriority_min")).astype(str)[late]
        u, c = np.unique(pr, return_counts=True)
        return pa.table({"o_orderpriority": pa.array(u.tolist(),
                                                     type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = hash_join_tasks(li_max, orders, on="l_orderkey",
                            right_on="o_orderkey",
                            post=_late_counts).to_pandas()
    g = parts.groupby("o_orderpriority", as_index=False)["cnt"].sum()
    return pa.table({
        "o_orderpriority": pa.array(g.o_orderpriority.tolist(),
                                    type=pa.string()),
        "cnt": pa.array(g.cnt.to_numpy().astype(np.int64)),
    })


WL_ROUNDS = 2
_WL_MASK61 = np.uint64((1 << 61) - 1)


def _wl_g(x: np.ndarray) -> np.ndarray:
    """Quadratic color mix g(x) = (x^2 + 3x + 7) mod 2^61 for x < 2^61,
    exact in uint64: x = hi*2^31 + lo, so x^2 mod 2^61 =
    ((hi*lo mod 2^29) << 32) + lo^2 (the hi^2*2^62 term vanishes).
    The DuckDB twin computes the same polynomial in HUGEINT."""
    x = x.astype(np.uint64)
    hi = x >> np.uint64(31)
    lo = x & np.uint64((1 << 31) - 1)
    sq = (((hi * lo) & np.uint64((1 << 29) - 1)) << np.uint64(32)) + lo * lo
    return (sq + np.uint64(3) * x + np.uint64(7)) & _WL_MASK61


def wl_refine(ctx, rounds: int = WL_ROUNDS) -> np.ndarray:
    """Weisfeiler-Lehman color refinement over the undirected distinct
    view: c0 = degree; each round c' = g((S + 1000003*c) mod 2^64 mod
    2^61) with S = sum over neighbors of g(c_u) mod 2^64 — a COMMUTATIVE
    multiset hash, so the neighbor aggregation is a plain keyed sum (no
    per-vertex sorting): one broadcast of the color vector + one keyed
    reduce per round, partials wrapped in native uint64. The per-vertex
    color vector is driver-resident (FullyDistVec analog, as in `scc`);
    the scale path chunks it like the engine's vertex state. Graph
    fingerprinting / iso-invariant bucketing for graph dedup."""
    import ray

    from ..core.shuffle import group_apply_tasks

    n = ctx.n
    und = ctx.graph("sym").dedup_sum().edges
    c = ctx.engine("sym").in_weights().astype(np.uint64)  # degree init
    for _ in range(rounds):
        gx = _wl_g(c)
        gx_ref = ray.put(gx)

        def _part(b: pa.Table, *, _ref=gx_ref) -> pa.Table:
            g_ = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            s = np.asarray(b.column("src"))
            d = np.asarray(b.column("dst"))
            u, inv = np.unique(s, return_inverse=True)
            acc = np.zeros(len(u), dtype=np.uint64)
            np.add.at(acc, inv, g_[d])  # uint64 wrap == mod 2^64
            return pa.table({"v": pa.array(u.astype(np.int64)),
                             "s": pa.array(acc.astype(np.int64))})

        def _merge(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "v" not in t.column_names:
                return pa.table({"v": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.int64())})
            v = np.asarray(t.column("v"), dtype=np.int64)
            sv = np.asarray(t.column("s")).view(np.uint64)
            u, inv = np.unique(v, return_inverse=True)
            acc = np.zeros(len(u), dtype=np.uint64)
            np.add.at(acc, inv, sv)
            return pa.table({"v": pa.array(u),
                             "s": pa.array(acc.astype(np.int64))})

        parts = group_apply_tasks(
            und.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True),
            ["v"], _merge,
        ).to_pandas()
        S = np.zeros(n, dtype=np.uint64)
        S[parts.v.to_numpy(dtype=np.int64)] = \
            parts.s.to_numpy(dtype=np.int64).view(np.uint64)
        t_ = (S + c * np.uint64(1000003)) & _WL_MASK61  # wraps mod 2^64 first
        c = _wl_g(t_)
    return c


def q_wl_refine(sf_dir: str):
    """2-round WL color refinement colors per vertex (exact 61-bit
    integers; see `wl_refine`)."""
    ctx = get_context(sf_dir)
    c = wl_refine(ctx, WL_ROUNDS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "color": pa.array(c.astype(np.int64)),
    })


NTILE_K = 4


def q_ntile(sf_dir: str):
    """NTILE(4) per user over events ordered by (ts, event_id) — the
    balanced-bucket window function. One user_id shuffle; each partition
    computes every resident user's tiles with a vectorized
    sort + segment-index pass (no per-row Python)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])

    def _tiles(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "tile": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"))
        ts = np.asarray(t.column("ts")).astype("datetime64[us]") \
            .astype(np.int64)
        eid = np.asarray(t.column("event_id"))
        order = np.lexsort((eid, ts, uid))
        uid, eid = uid[order], eid[order]
        # per-user positional index + group size
        uu, starts_idx, counts = np.unique(uid, return_index=True,
                                           return_counts=True)
        pos = np.arange(len(uid)) - np.repeat(starts_idx, counts)
        nsz = np.repeat(counts, counts)
        k = NTILE_K
        size, rem = nsz // k, nsz % k
        big = rem * (size + 1)  # rows covered by the (size+1)-sized tiles
        tile = np.where(
            pos < big,
            pos // np.maximum(size + 1, 1),
            rem + (pos - big) // np.maximum(size, 1),
        ) + 1
        return pa.table({"event_id": pa.array(eid),
                         "tile": pa.array(tile.astype(np.int64))})

    return group_apply_tasks(ev, ["user_id"], _tiles)


def q_cycle4(sf_dir: str):
    """Global 4-cycle statistic over the undirected distinct view: for
    every unordered pair a<b, C(cn(a,b), 2) summed — each 4-cycle is
    counted once per diagonal, so squares = pairs2 / 2. The
    common-neighbor counts come from one boolean SpGEMM (the
    triangle-count wedge plan re-aggregated); per-batch integer partials
    reduce to a single row, so nothing wide reaches the driver."""
    from ..core import spgemm as SG

    ctx = get_context(sf_dir)
    g = ctx.graph("sym")
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges
    cn = SG.spgemm_tasks(be, be, ctx.n, add="sum", num_partitions=gp)

    def _partial(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"))
        d = np.asarray(b.column("dst"))
        c = np.asarray(b.column("w")).astype(np.int64)
        c = c[s < d]
        tot = int((c * (c - 1) // 2).sum())
        return pa.table({"p2": pa.array([tot], type=pa.int64())})

    parts = cn.map_batches(_partial, batch_format="pyarrow").take_all()
    p2 = int(sum(p["p2"] for p in parts))
    return pa.table({"pairs2": pa.array([p2], type=pa.int64()),
                     "squares": pa.array([p2 // 2], type=pa.int64())})


# ---------------------------------------------------------------------------
# Wave 9: relational windows / market-basket / weighted link prediction /
# integer-exact k-means
# ---------------------------------------------------------------------------

TPCH_Q6_LO = (1996, 1, 1)
TPCH_Q6_HI = (1997, 1, 1)


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6-style forecasting-revenue-change query: one filtered
    streaming aggregate, no shuffle at all. Every predicate is pushed
    into the parquet read (shipdate window, discount band, quantity
    cap); revenue = floor(price * discount * 100) per line — identical
    IEEE double products on both sides, order-free integer sum. The
    single-row result is the canonical 'prune at the read' benchmark."""
    import datetime

    import ray

    lo = datetime.datetime(*TPCH_Q6_LO)
    hi = datetime.datetime(*TPCH_Q6_HI)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi))
        & (pc.field("l_discount") >= 0.05)
        & (pc.field("l_discount") <= 0.07)
        & (pc.field("l_quantity") < 24.0),
    )

    def _partial(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b.column("l_extendedprice"))
            * np.asarray(b.column("l_discount")) * 100.0
        )
        return pa.table({
            "rev_cents": pa.array([int(cents.sum())], type=pa.int64()),
            "nlines": pa.array([b.num_rows], type=pa.int64()),
        })

    parts = li.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    return pa.table({
        "rev_cents": pa.array([sum(p["rev_cents"] for p in parts)],
                              type=pa.int64()),
        "nlines": pa.array([sum(p["nlines"] for p in parts)],
                           type=pa.int64()),
    })


BASKET_TOPK = 20


def q_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence: the BASKET_TOPK part pairs (a < b)
    most often appearing in the same order, counting each order once
    per distinct pair. One orderkey shuffle (groups are bounded —
    ~4 lines/order — so the triangular pair expansion is O(lines), not
    all-pairs), pair emission batched by distinct run size
    (`dedup._run_pairs`), local pair pre-aggregation, then a pair-key
    reduce and a global sort+limit cut."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import _run_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        # distinct (order, part) then run structure over orders
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.ones(len(ok), dtype=bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        uo, starts, counts = np.unique(ok, return_index=True,
                                       return_counts=True)
        a, b = _run_pairs(starts, counts, pk)
        if len(a) == 0:
            return empty
        # local pre-aggregate: same pair may recur across orders
        key = np.lexsort((b, a))
        a, b = a[key], b[key]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        cnt = np.bincount(seg)
        return pa.table({"a": pa.array(a[new]), "b": pa.array(b[new]),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def _sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        g = t.group_by(["a", "b"]).aggregate([("cnt", "sum")])
        return pa.table({"a": g.column("a"), "b": g.column("b"),
                         "cnt": g.column("cnt_sum")})

    pairs = group_apply_tasks(
        group_apply_tasks(li, ["l_orderkey"], _pairs), ["a", "b"], _sum
    )
    top = pairs.sort(["cnt", "a", "b"],
                     descending=[True, False, False]) \
        .limit(BASKET_TOPK).to_pandas()
    return pa.Table.from_pandas(top, preserve_index=False)


RA_SCALE = 1_000_000_000
RA_MIN = 2  # >= 2 common neighbors (matches LP_CN_MIN class)
RA_TOPK = 20


def q_link_predict_ra(sf_dir: str):
    """Resource-allocation link prediction: for non-adjacent pairs
    (a < b) with >= RA_MIN common neighbors, score = sum over common
    neighbors z of RA_SCALE // deg(z) (integer-exact RA index;
    Adamic-Adar's log replaced by the SQL-reproducible reciprocal).
    ONE wedge expansion carries BOTH channels: edges route by midpoint
    z, each partition emits its z-runs' triangular pairs
    (`dedup._run_pairs`, a<b by sorted-run construction) with the
    per-z weight, pre-aggregates (ra, cn) locally, then one pair-keyed
    reduce + a LEFT ANTI join against the adjacency drops existing
    edges — half the data movement of running the CN SpGEMM twice.
    RA sums stay exact in int64; the degree vector is `ray.put` once."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks
    from ..functions.dedup import _run_pairs

    ctx = get_context(sf_dir)
    g = ctx.graph("sym")
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((deg.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges
    deg_ref = ray.put(deg)

    _empty = pa.table({"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64()),
                       "ra": pa.array([], type=pa.int64()),
                       "cn": pa.array([], type=pa.int64())})

    def _local_agg(a, b, v, c):
        order = np.lexsort((b, a))
        a, b, v, c = a[order], b[order], v[order], c[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        return pa.table({
            "a": pa.array(a[new]), "b": pa.array(b[new]),
            "ra": pa.array(ibincount(seg, weights=v.astype(np.float64))
                           .astype(np.int64)),
            "cn": pa.array(ibincount(seg, weights=c.astype(np.float64))
                           .astype(np.int64)),
        })

    def _wedges(t: pa.Table, *, _ref=deg_ref) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return _empty
        dv = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        z = np.asarray(t.column("dst"), dtype=np.int64)
        u = np.asarray(t.column("src"), dtype=np.int64)
        order = np.lexsort((u, z))
        z, u = z[order], u[order]
        uz, starts, counts = np.unique(z, return_index=True,
                                       return_counts=True)
        a, b = _run_pairs(starts, counts, u)
        if len(a) == 0:
            return _empty
        # per-pair midpoint weight: repeat each z-run's weight over its
        # C(deg,2) pairs in _run_pairs' distinct-size emission order
        w = np.empty(len(a), dtype=np.int64)
        pos = 0
        for m in np.unique(counts):
            if m < 2:
                continue
            runs = uz[counts == m]
            npair = int(m) * (int(m) - 1) // 2
            w[pos:pos + len(runs) * npair] = np.repeat(
                RA_SCALE // dv[runs], npair).reshape(
                    len(runs), npair).ravel()
            pos += len(runs) * npair
        return _local_agg(a, b, w, np.ones(len(a), dtype=np.int64))

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _empty
        return _local_agg(
            np.asarray(t.column("a"), dtype=np.int64),
            np.asarray(t.column("b"), dtype=np.int64),
            np.asarray(t.column("ra"), dtype=np.int64),
            np.asarray(t.column("cn"), dtype=np.int64),
        )

    pairs = group_apply_tasks(
        group_apply_tasks(be, ["dst"], _wedges, num_partitions=gp),
        ["a", "b"], _merge, num_partitions=gp,
    )

    def _adj(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep])})

    adj = be.map_batches(_adj, batch_format="pyarrow")

    def _cut(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64()),
                             "cn": pa.array([], type=pa.int64())})
        keep = np.asarray(t.column("cn"), dtype=np.int64) >= RA_MIN
        return pa.table({"a": t.column("a").filter(pa.array(keep)),
                         "b": t.column("b").filter(pa.array(keep)),
                         "score": t.column("ra").filter(pa.array(keep)),
                         "cn": t.column("cn").filter(pa.array(keep))})

    nonadj = hash_join_tasks(pairs, adj, on=["a", "b"],
                             join_type="left anti", post=_cut,
                             num_partitions=gp)
    top = nonadj.sort(["score", "a", "b"],
                      descending=[True, False, False]) \
        .limit(RA_TOPK).to_pandas()
    return pa.table({
        "a": pa.array(ctx.gather_labels(top["a"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "b": pa.array(ctx.gather_labels(top["b"].to_numpy(dtype=np.int64)),
                      type=pa.string()),
        "score": pa.array(top["score"].to_numpy(dtype=np.int64)),
        "cn": pa.array(top["cn"].to_numpy(dtype=np.int64)),
    })


def q_first_last_event(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE window: per user the first and last
    event type and the cents delta between last and first value, ordered
    by (ts, event_id). ONE user_id shuffle; each partition resolves all
    its users with a single lexsort + run boundaries."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def _fl(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "first_type": pa.array([], type=pa.string()),
            "last_type": pa.array([], type=pa.string()),
            "delta_cents": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]") \
            .astype(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        cents = np.floor(
            np.asarray(t.column("value")) * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, et, cents = uid[order], et[order], cents[order]
        uu, starts, counts = np.unique(uid, return_index=True,
                                       return_counts=True)
        last = starts + counts - 1
        return pa.table({
            "user_id": pa.array(uu),
            "first_type": pa.array(et[starts].tolist(), type=pa.string()),
            "last_type": pa.array(et[last].tolist(), type=pa.string()),
            "delta_cents": pa.array(cents[last] - cents[starts]),
            "n": pa.array(counts.astype(np.int64)),
        })

    return group_apply_tasks(ev, ["user_id"], _fl)


def q_dense_rank_spend(sf_dir: str):
    """DENSE_RANK window over a join: customers ranked by total order
    spend (exact integer cents) within their market segment. Per-batch
    per-customer partials BEFORE the custkey shuffle, co-partitioned
    hash join against customer, then one segment shuffle; each partition
    dense-ranks all its segments vectorized (distinct-spend
    searchsorted — no per-row loop)."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def _opart(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b.column("o_totalprice")) * 100.0 + 0.5)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    opart = orders.map_batches(_opart, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _combine(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "spend_cents": pa.array(s.astype(np.int64))})

    spend = group_apply_tasks(opart, ["o_custkey"], _combine)
    joined = hash_join_tasks(spend, cust, on="o_custkey",
                             right_on="c_custkey")

    def _rank(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "c_custkey": pa.array([], type=pa.int64()),
            "c_mktsegment": pa.array([], type=pa.string()),
            "spend_cents": pa.array([], type=pa.int64()),
            "drank": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "c_mktsegment" not in t.column_names:
            return empty
        seg = np.asarray(t.column("c_mktsegment")).astype(str)
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        sp = np.asarray(t.column("spend_cents"), dtype=np.int64)
        out_rank = np.empty(len(ck), dtype=np.int64)
        useg, inv = np.unique(seg, return_inverse=True)
        for si in range(len(useg)):  # few segments, vectorized inside
            m = inv == si
            u = np.unique(sp[m])
            out_rank[m] = len(u) - np.searchsorted(u, sp[m],
                                                   side="right") + 1
        return pa.table({
            "c_custkey": pa.array(ck),
            "c_mktsegment": pa.array(seg.tolist(), type=pa.string()),
            "spend_cents": pa.array(sp),
            "drank": pa.array(out_rank),
        })

    return group_apply_tasks(joined, ["c_mktsegment"], _rank)


def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(event_type, day-of-week): all four grouping sets.
    The finest (type, dow) level is one distributed keyed reduce; the
    three coarser levels derive from its bounded output (types x 7
    rows). dow = ((epoch_seconds // 86400) + 4) % 7 (0 = Monday) — pure
    integer arithmetic, identical in numpy and SQL."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def _fine(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_type": pa.array([], type=pa.string()),
            "dow": pa.array([], type=pa.int64()),
            "cnt": pa.array([], type=pa.int64()),
            "cents": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        secs = np.asarray(t.column("ts")).astype("datetime64[s]") \
            .astype(np.int64)
        dow = ((secs // 86400) + 4) % 7
        cents = np.floor(
            np.asarray(t.column("value")) * 100.0 + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(et, "|"), dow.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv)
        cs = np.bincount(inv, weights=cents.astype(np.float64))
        first = np.full(len(uk), -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.table({
            "event_type": pa.array(et[first].tolist(), type=pa.string()),
            "dow": pa.array(dow[first]),
            "cnt": pa.array(cnt.astype(np.int64)),
            "cents": pa.array(cs.astype(np.int64)),
        })

    fine = group_apply_tasks(ds, ["event_type"], _fine)
    tabs = [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _fine(pa.table({}))
    ft = pa.concat_tables(tabs)
    et = np.asarray(ft.column("event_type")).astype(str)
    dow = np.asarray(ft.column("dow"), dtype=np.int64)
    cnt = np.asarray(ft.column("cnt"), dtype=np.int64)
    cents = np.asarray(ft.column("cents"), dtype=np.int64)

    def _agg(keys):
        uk, inv = np.unique(keys, return_inverse=True)
        return uk, inv, ibincount(inv, weights=cnt.astype(np.float64)) \
            .astype(np.int64), \
            ibincount(inv, weights=cents.astype(np.float64)) \
            .astype(np.int64)

    ue, ie, ce, se = _agg(et)
    ud, idw, cd, sd = _agg(dow.astype(str))
    out_et = np.concatenate((et, ue, np.full(len(ud), "ALL"), ["ALL"]))
    out_dow = np.concatenate((
        dow, np.full(len(ue), -1, dtype=np.int64),
        np.sort(np.unique(dow)), np.array([-1], dtype=np.int64)))
    # dow-level sums must align with out_dow's sorted unique order
    ud_i = np.sort(np.unique(dow))
    dmap = {str(v): i for i, v in enumerate(ud_i)}
    cd_o = np.empty(len(ud_i), dtype=np.int64)
    sd_o = np.empty(len(ud_i), dtype=np.int64)
    for i, v in enumerate(ud):
        cd_o[dmap[v]] = cd[i]
        sd_o[dmap[v]] = sd[i]
    out_cnt = np.concatenate((cnt, ce, cd_o, [cnt.sum()]))
    out_cents = np.concatenate((cents, se, sd_o, [cents.sum()]))
    return pa.table({
        "event_type": pa.array(out_et.tolist(), type=pa.string()),
        "dow": pa.array(out_dow),
        "cnt": pa.array(out_cnt),
        "cents": pa.array(out_cents),
    })


KM_K = 4
KM_ROUNDS = 2
KM_QSCALE = 1 << 20  # quantization: q = floor((x + 0.5) * 2^20), exact


def _km_quant(t: pa.Table):
    """(vec_id, Q) with Q int64 (rows, dim): q = floor((x+0.5) * 2^20).
    float32 -> float64 is exact; +0.5 and the power-of-two scale incur
    the same single IEEE rounding in numpy and DuckDB, so both sides
    quantize bit-identically."""
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    emb = t.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.values, dtype=np.float64)
    q = np.floor((flat + 0.5) * KM_QSCALE).astype(np.int64)
    return ids, q.reshape(len(ids), -1)


def q_kmeans_fixed(sf_dir: str):
    """KM_ROUNDS Lloyd iterations of k-means over quantized embeddings —
    INTEGER-EXACT end to end: vectors quantize to q = floor((x+0.5)*2^20)
    (identical IEEE arithmetic both sides), distances are int64 sums of
    squares (< 2^46 at dim 64), argmin ties break to the lowest cluster
    id, centroid update is the integer floor mean (sum // count, keeps
    the previous centroid when a cluster empties). Distributed Lloyd:
    centroids broadcast per round, per-batch assign + per-cluster
    per-dim int64 partial sums; the driver holds only the k x dim
    centroid matrix (the IVF coarse-quantizer pattern, `ann.py`).
    Returns the assignment under the final centroids."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # deterministic init: the k lowest vec_ids (seed vectors)
    seed_t = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < KM_K,
    ).sort("vec_id").take_batch(KM_K, batch_format="pyarrow")
    _, cent = _km_quant(pa.table(seed_t))

    def _assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
        # int64-exact squared distances (rows, k); argmin -> lowest id
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(KM_ROUNDS):
        cref = ray.put(cent)

        def _partial(t: pa.Table, *, _c=cref) -> pa.Table:
            C = _c if isinstance(_c, np.ndarray) else ray.get(_c)
            ids, Q = _km_quant(t)
            a = _assign(Q, C)
            k, dim = C.shape
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, Q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.array(sums.tolist(),
                                 type=pa.list_(pa.int64())),
            })

        parts = emb.map_batches(_partial, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        k, dim = cent.shape
        tot = np.zeros((k, dim), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for p in parts:
            tot[p["cluster"]] += np.asarray(p["sums"], dtype=np.int64)
            cnt[p["cluster"]] += p["cnt"]
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = tot[nz] // cnt[nz, None]  # non-negative: floor == trunc

    cref = ray.put(cent)

    def _final(t: pa.Table, *, _c=cref) -> pa.Table:
        C = _c if isinstance(_c, np.ndarray) else ray.get(_c)
        ids, Q = _km_quant(t)
        return pa.table({"vec_id": pa.array(ids),
                         "cluster": pa.array(_assign(Q, C))})

    return emb.map_batches(_final, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Wave 10: closeness sampling / per-source stats / correlated subquery /
# repetition quality / collocation lift / Boruvka MSF
# ---------------------------------------------------------------------------


def q_closeness_sample(sf_dir: str):
    """Sampled closeness-centrality sufficient statistics: per seed the
    SUM of BFS distances to reached vertices plus the reach count (the
    harmonic/closeness estimator inputs; `ecc_sample`'s sibling with a
    sum instead of a max) — one refs-only min_plus BFS per seed."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    seeds, sums, reached = [], [], []
    for s in ECC_SEEDS:
        root = ctx.lookup_id(s)
        d = alg.min_plus_distances(eng, root, iters=BFS_ITERS)
        fin = np.isfinite(d)
        seeds.append(s)
        sums.append(int(d[fin].sum()))
        reached.append(int(fin.sum()))
    return pa.table({
        "seed": pa.array(seeds, type=pa.string()),
        "sum_d": pa.array(np.array(sums, dtype=np.int64)),
        "n_reached": pa.array(np.array(reached, dtype=np.int64)),
    })


def q_source_stats(sf_dir: str):
    """Per-source corpus audit: doc count, distinct languages, total
    chars, distinct texts (md5-low-64 digests — DuckDB's
    md5_number_lower bit-exactly; only (source, hash) distinct pairs
    shuffle, never text). The provenance-level dedup-rate report."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import md5_lower64

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "n_chars", "text"],
    )

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "h": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "chars": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "source" not in t.column_names:
            return empty
        src = np.asarray(t.column("source")).astype(str)
        lang = np.asarray(t.column("lang")).astype(str)
        nch = np.asarray(t.column("n_chars"), dtype=np.int64)
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        h = np.fromiter(
            (md5_lower64(txt[i].as_py()) for i in range(len(txt))),
            dtype=np.uint64, count=len(txt)).view(np.int64)
        # distinct (source, lang, h) rows with per-row docs/chars partials
        key = np.char.add(np.char.add(src, "\x1f"), lang)
        order = np.lexsort((h, key))
        key, src, lang, h, nch = (key[order], src[order], lang[order],
                                  h[order], nch[order])
        return pa.table({
            "source": pa.array(src.tolist(), type=pa.string()),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "h": pa.array(h),
            "n_docs": pa.array(np.ones(len(h), dtype=np.int64)),
            "chars": pa.array(nch),
        })

    def _final(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "source": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "n_langs": pa.array([], type=pa.int64()),
            "chars": pa.array([], type=pa.int64()),
            "n_distinct": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "source" not in t.column_names:
            return empty
        src = np.asarray(t.column("source")).astype(str)
        lang = np.asarray(t.column("lang")).astype(str)
        h = np.asarray(t.column("h"), dtype=np.int64)
        nd = np.asarray(t.column("n_docs"), dtype=np.int64)
        ch = np.asarray(t.column("chars"), dtype=np.int64)
        us, inv = np.unique(src, return_inverse=True)
        n_docs = np.bincount(inv, weights=nd.astype(np.float64))
        chars = np.bincount(inv, weights=ch.astype(np.float64))
        # distinct counts per source over (source, x) pairs
        def _distinct(vals):
            k = np.unique(np.stack([inv, vals]), axis=1)
            return np.bincount(k[0].astype(np.int64), minlength=len(us))

        sl = np.unique(np.char.add(np.char.add(src, "\x1f"), lang))
        n_langs = np.bincount(
            np.searchsorted(
                us, np.array([x.split("\x1f")[0] for x in sl])),
            minlength=len(us))
        n_distinct = _distinct(h)
        return pa.table({
            "source": pa.array(us.tolist(), type=pa.string()),
            "n_docs": pa.array(n_docs.astype(np.int64)),
            "n_langs": pa.array(n_langs.astype(np.int64)),
            "chars": pa.array(chars.astype(np.int64)),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
        })

    return group_apply_tasks(ds.map_batches(_partial,
                                            batch_format="pyarrow"),
                             ["source"], _final)


def q_big_spenders(sf_dir: str):
    """Correlated-scalar-subquery filter: customers whose total spend
    exceeds 2x their segment's MEAN spend — evaluated without division
    as spend_cents * seg_cnt > 2 * seg_sum_cents (integer
    cross-multiplication; exact). Spend partials combine per custkey,
    join to segment, then one segment shuffle computes the segment
    aggregates AND applies the filter in the same partition."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def _opart(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b.column("o_totalprice")) * 100.0 + 0.5)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    opart = orders.map_batches(_opart, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _combine(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "spend_cents": pa.array(s.astype(np.int64))})

    spend = group_apply_tasks(opart, ["o_custkey"], _combine)
    joined = hash_join_tasks(spend, cust, on="o_custkey",
                             right_on="c_custkey")

    def _filter(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "c_custkey": pa.array([], type=pa.int64()),
            "c_mktsegment": pa.array([], type=pa.string()),
            "spend_cents": pa.array([], type=pa.int64()),
        })
        if t.num_rows == 0 or "c_mktsegment" not in t.column_names:
            return empty
        seg = np.asarray(t.column("c_mktsegment")).astype(str)
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        sp = np.asarray(t.column("spend_cents"), dtype=np.int64)
        useg, inv = np.unique(seg, return_inverse=True)
        seg_sum = ibincount(inv, weights=sp.astype(np.float64)) \
            .astype(np.int64)
        seg_cnt = np.bincount(inv).astype(np.int64)
        keep = sp * seg_cnt[inv] > 2 * seg_sum[inv]
        return pa.table({
            "c_custkey": pa.array(ck[keep]),
            "c_mktsegment": pa.array(seg[keep].tolist(),
                                     type=pa.string()),
            "spend_cents": pa.array(sp[keep]),
        })

    return group_apply_tasks(joined, ["c_mktsegment"], _filter)


REP_W = 3


def q_rep_ngrams(sf_dir: str):
    """Per-doc duplicate-n-gram repetition statistics (the Gopher-style
    repetition quality filter): total/distinct/duplicated 3-grams + max
    token multiplicity — one streaming vectorized pass, no shuffle
    (`text.rep_ngram_stats`)."""
    import ray

    from ..functions.text import rep_ngram_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b: rep_ngram_stats(b, REP_W),
        batch_format="pyarrow", zero_copy_batch=True)


COLLOC_TOPK = 50
COLLOC_MIN = 5


def q_colloc_lift(sf_dir: str):
    """Top-k bigram collocations by integer lift-association score
    (cab * 10^12 // (ca * cb), cab >= COLLOC_MIN) — the
    phrase-extraction step scored by association rather than raw
    frequency (`text.colloc_lift_topk`)."""
    import ray

    from ..functions.text import colloc_lift_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return colloc_lift_topk(ds, COLLOC_TOPK, COLLOC_MIN)


def q_msf(sf_dir: str):
    """Minimum spanning forest (synchronous Boruvka, `alg.boruvka_msf`)
    over the undirected dedup-summed weighted graph. Rows-only: the
    round count is data-dependent (no fixed-depth SQL unrolling), but
    the lexicographic (w, u, v) total order makes the MSF unique —
    pytest proves exact edge-set equality against a Kruskal union-find
    brute on the same graph."""
    ctx = get_context(sf_dir)
    edges = ctx.graph("sym").dedup_sum().edges
    msf, _ = alg.boruvka_msf(edges, ctx.n)
    return pa.table({
        "u": pa.array(
            ctx.gather_labels(np.asarray(msf.column("u"), dtype=np.int64)),
            type=pa.string()),
        "v": pa.array(
            ctx.gather_labels(np.asarray(msf.column("v"), dtype=np.int64)),
            type=pa.string()),
        "w": msf.column("w"),
    })


ANF_P = 3  # 8 registers/vertex; 6-bit packing (rho <= 53 < 64)
ANF_M = 1 << ANF_P
ANF_ROUNDS = 3


def _anf_init_kernel(labels: np.ndarray) -> np.ndarray:
    """One chunk's (ANF_M, chunk_len) HLL register init from its label
    slice: bucket = md5 low ANF_P bits, rho = trailing zeros of the next
    52 bits (the `hll_registers` arithmetic) — integer-exact and
    SQL-reproducible."""
    from ..functions.text import _popcount64, md5_lower64

    m = len(labels)
    hu = np.fromiter((md5_lower64(x) for x in labels), dtype=np.uint64,
                     count=m)
    b = (hu & np.uint64(ANF_M - 1)).astype(np.int64)
    rest = ((hu >> np.uint64(ANF_P))
            & np.uint64((1 << 52) - 1)).astype(np.int64)
    lsb = (rest & -rest).astype(np.uint64)
    rho = np.where(rest > 0, _popcount64(lsb - np.uint64(1)) + 1, 53)
    R = np.zeros((ANF_M, m), dtype=np.float64)
    R[b, np.arange(m)] = rho.astype(np.float64)
    return R


def _anf_max_kernel(prev: np.ndarray, Y: np.ndarray, bounds) -> np.ndarray:
    return np.maximum(prev, Y)


def _anf_pack_kernel(labels: np.ndarray, R: np.ndarray) -> pa.Table:
    packed = (R.astype(np.int64)
              << (np.uint64(6) * np.arange(ANF_M, dtype=np.uint64)
                  )[:, None].astype(np.int64)).sum(axis=0)
    return pa.table({
        "label": pa.array(labels, type=pa.string()),
        "packed": pa.array(packed),
    })


def q_hyperanf(sf_dir: str):
    """HyperANF neighborhood-function sketch (Boldi-Rosa-Vigna): every
    vertex carries an 8-register HLL of its <=ANF_ROUNDS-hop ball,
    advanced by per-register max-merge over neighbors — one fused
    select2nd_max SpMM + elementwise-max task round per iteration.
    FULLY CHUNKED (round-4): register init comes from per-chunk label
    slices (`VertexDict.label_slice_refs`), the (8, n) register matrix
    lives only as per-chunk refs in the object store
    (`engine.spmm_apply_refs`), and the packed output assembles per
    chunk — no O(n) driver arrays anywhere (the round-3 verdict's
    driver-dense form is gone)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    lab_refs = ctx.vdict.label_slice_refs(eng.bounds)
    R_refs = eng.map_chunks(_anf_init_kernel, lab_refs)
    for _ in range(ANF_ROUNDS):
        R_refs = eng.spmm_apply_refs(
            R_refs, ANF_M, "select2nd_max", _anf_max_kernel, 1, R_refs
        )[0]
    tables = eng.map_chunks(_anf_pack_kernel, lab_refs, R_refs)
    return ray.data.from_arrow_refs(tables)


TPCH_Q10_LO = (1996, 7, 1)
TPCH_Q10_HI = (1996, 10, 1)
TPCH_Q10_TOPK = 20


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10-style returned-item report: customers ranked by revenue
    lost to returned lineitems ('R' flag) of orders in a quarter —
    orders date filter pushed into the read, per-order revenue partials
    BEFORE the shuffle, two co-partitioned warm-task joins
    (lineitem->orders->customer), nation name resolved from the 25-row
    driver-side table; exact integer cents."""
    import datetime

    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    lo = datetime.datetime(*TPCH_Q10_LO)
    hi = datetime.datetime(*TPCH_Q10_HI)
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nname = dict(zip(nation.n_nationkey, nation.n_name))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(lo))
        & (pc.field("o_orderdate") < pa.scalar(hi)),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )

    def _li_partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(batch.column("l_extendedprice"))
            * (1.0 - np.asarray(batch.column("l_discount"))) * 100.0
        )
        uk, s = group_sum_per_key(
            cents, np.asarray(batch.column("l_orderkey"), dtype=np.int64))
        return pa.table({"l_orderkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    li_part = li.map_batches(_li_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    lo_j = hash_join_tasks(li_part, orders, on="l_orderkey",
                           right_on="o_orderkey")

    def _cust_partial(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "rev_cents": pa.array(s.astype(np.int64))})

    per_cust = group_apply_tasks(lo_j, ["o_custkey"], _cust_partial)
    final = hash_join_tasks(per_cust, cust, on="o_custkey",
                            right_on="c_custkey")
    top = final.sort(["rev_cents", "o_custkey"],
                     descending=[True, False]) \
        .limit(TPCH_Q10_TOPK).to_pandas()
    return pa.table({
        "c_custkey": pa.array(top["o_custkey"].to_numpy(dtype=np.int64)),
        "c_name": pa.array(top["c_name"].astype(str).tolist(),
                           type=pa.string()),
        "rev_cents": pa.array(top["rev_cents"].to_numpy(dtype=np.int64)),
        "acctbal_cents": pa.array(
            np.floor(top["c_acctbal"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)),
        "n_name": pa.array([nname[int(k)] for k in top["c_nationkey"]],
                           type=pa.string()),
    })


# ---------------------------------------------------------------------------
# Wave 11: triangle enumeration / edge Jaccard / TPC-H Q18 + Q14
# ---------------------------------------------------------------------------


def _triangles_ids(ctx):
    """Id-level triangle enumeration dataset (a, m, c with a < m < c):
    the two-join plan of `q_triangles_list` — oriented adjacency
    (a < b) self-joined through the middle vertex (each triangle x<y<z
    appears exactly once as the wedge (x, y, z) through its middle y),
    then a LEFT SEMI join against the adjacency closes the (a, c)
    side. Both joins are co-partitioned warm tasks; fan sized by the
    oriented wedge volume (sum over b of smaller-deg * larger-deg <=
    sum deg^2)."""
    from ..core.shuffle import hash_join_tasks

    g = ctx.graph("sym")
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges

    def _orient(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep])})

    adj = be.map_batches(_orient, batch_format="pyarrow")
    # wedge through the middle: (a, b) x (b, c) with a < b < c
    left = adj.map_batches(
        lambda t: pa.table({"a": t.column("a"), "m": t.column("b")}),
        batch_format="pyarrow")
    right = adj.map_batches(
        lambda t: pa.table({"m": t.column("a"), "c": t.column("b")}),
        batch_format="pyarrow")
    wedges = hash_join_tasks(left, right, on="m", num_partitions=gp)
    return hash_join_tasks(
        wedges.map_batches(
            lambda t: t.select(["a", "m", "c"]), batch_format="pyarrow"),
        adj.map_batches(
            lambda t: pa.table({"a": t.column("a"), "c": t.column("b")}),
            batch_format="pyarrow"),
        on=["a", "c"], join_type="left semi", num_partitions=gp)


def q_triangles_list(sf_dir: str):
    """Triangle ENUMERATION (not just the count): every triangle
    a < b < c of the undirected distinct graph, as label triples (see
    `_triangles_ids` for the two-join plan)."""
    ctx = get_context(sf_dir)
    tri = _triangles_ids(ctx)
    dec = ctx.decoder()

    def _lab(t: pa.Table, *, _d=dec) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.string())})
        return pa.table({
            "a": _d.take(np.asarray(t.column("a"), dtype=np.int64)),
            "b": _d.take(np.asarray(t.column("m"), dtype=np.int64)),
            "c": _d.take(np.asarray(t.column("c"), dtype=np.int64)),
        })

    return tri.map_batches(_lab, batch_format="pyarrow")


EDGEJ_SCALE = 1_000_000


def q_edge_jaccard(sf_dir: str):
    """Edge-level neighborhood Jaccard: for every EXISTING edge (a < b),
    score = cn * 10^6 // (deg a + deg b - cn) — the shared-neighbor
    edge weighting of SNN/Jarvis-Patrick sparsification (the
    `nbr_jaccard` wedge plan with a SEMI join against the adjacency
    instead of the anti mask; cn = 0 edges score 0 and are kept)."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks
    from ..functions.dedup import _run_pairs

    ctx = get_context(sf_dir)
    g = ctx.graph("sym")
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((deg.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges

    _empty = pa.table({"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64()),
                       "cn": pa.array([], type=pa.int64())})

    def _wedge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return _empty
        z = np.asarray(t.column("dst"), dtype=np.int64)
        u = np.asarray(t.column("src"), dtype=np.int64)
        order = np.lexsort((u, z))
        z, u = z[order], u[order]
        _, starts, counts = np.unique(z, return_index=True,
                                      return_counts=True)
        a, b = _run_pairs(starts, counts, u)
        if len(a) == 0:
            return _empty
        key = np.lexsort((b, a))
        a, b = a[key], b[key]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        return pa.table({"a": pa.array(a[new]), "b": pa.array(b[new]),
                         "cn": pa.array(np.bincount(seg)
                                        .astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _empty
        gb = t.group_by(["a", "b"]).aggregate([("cn", "sum")])
        return pa.table({"a": gb.column("a"), "b": gb.column("b"),
                         "cn": gb.column("cn_sum")})

    cn = group_apply_tasks(
        group_apply_tasks(be, ["dst"], _wedge, num_partitions=gp),
        ["a", "b"], _merge, num_partitions=gp)

    def _adj(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep])})

    adj = be.map_batches(_adj, batch_format="pyarrow")
    deg_ref = ray.put(deg)

    def _score(t: pa.Table, *, _ref=deg_ref) -> pa.Table:
        dv = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "cn": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        c = np.asarray(t.column("cn"))
        c = np.where(np.isnan(c.astype(np.float64)), 0, c) \
            .astype(np.int64)
        union = dv[a] + dv[b] - c
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "cn": pa.array(c),
                         "score": pa.array(c * EDGEJ_SCALE // union)})

    # LEFT OUTER join: adjacency keeps cn=0 edges (score 0)
    scored = hash_join_tasks(adj, cn, on=["a", "b"], join_type="left outer",
                             post=_score, num_partitions=gp)
    out = pa.concat_tables(
        [t for t in ray.get(scored.to_arrow_refs()) if t.num_rows])
    a = np.asarray(out.column("a"), dtype=np.int64)
    b = np.asarray(out.column("b"), dtype=np.int64)
    return pa.table({
        "a": pa.array(ctx.gather_labels(a), type=pa.string()),
        "b": pa.array(ctx.gather_labels(b), type=pa.string()),
        "cn": out.column("cn"),
        "score": out.column("score"),
    })


TPCH_Q18_QTY = 150


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18-style large-volume orders: orders whose total lineitem
    quantity exceeds TPCH_Q18_QTY, with customer key and integer total
    quantity — per-order quantity partials combine before one orderkey
    reduce; the HAVING cut happens in the reduce task; survivors join
    orders+customer keys co-partitioned."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def _qpart(b: pa.Table) -> pa.Table:
        q = np.floor(np.asarray(b.column("l_quantity")) + 0.5)
        uk, s = group_sum_per_key(
            q, np.asarray(b.column("l_orderkey"), dtype=np.int64))
        return pa.table({"l_orderkey": pa.array(uk),
                         "qty": pa.array(s.astype(np.int64))})

    part = li.map_batches(_qpart, batch_format="pyarrow",
                          zero_copy_batch=True)

    def _having(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("qty"), dtype=np.float64),
            np.asarray(t.column("l_orderkey"), dtype=np.int64))
        keep = s > TPCH_Q18_QTY
        return pa.table({"l_orderkey": pa.array(uk[keep]),
                         "sum_qty": pa.array(s[keep].astype(np.int64))})

    big = group_apply_tasks(part, ["l_orderkey"], _having)

    def _fin(t: pa.Table) -> pa.Table:
        # co-partitioned join keeps the LEFT key name (l_orderkey)
        if t.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "price_cents": pa.array([], type=pa.int64()),
                "sum_qty": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "price_cents": pa.array(
                np.floor(np.asarray(t.column("o_totalprice")) * 100.0
                         + 0.5).astype(np.int64)),
            "sum_qty": t.column("sum_qty"),
        })

    return hash_join_tasks(big, orders, on="l_orderkey",
                           right_on="o_orderkey", post=_fin)


TPCH_Q14_LO = (1996, 9, 1)
TPCH_Q14_HI = (1996, 10, 1)


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14-style promotion-effect: revenue from PROMO-type parts
    vs all revenue in one ship month — the division-free sufficient
    statistics (promo_cents, total_cents, nlines). The part type map
    joins co-partitioned; conditional aggregation fused into the join
    task; one-row integer result."""
    import datetime

    import ray

    from ..core.shuffle import hash_join_tasks

    lo = datetime.datetime(*TPCH_Q14_LO)
    hi = datetime.datetime(*TPCH_Q14_HI)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def _cents(b: pa.Table) -> pa.Table:
        c = np.floor(
            np.asarray(b.column("l_extendedprice"))
            * (1.0 - np.asarray(b.column("l_discount"))) * 100.0
        ).astype(np.int64)
        return pa.table({"l_partkey": b.column("l_partkey"),
                         "cents": pa.array(c)})

    li_c = li.map_batches(_cents, batch_format="pyarrow",
                          zero_copy_batch=True)

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_type" not in t.column_names:
            z = np.int64(0)
            return pa.table({"promo_cents": pa.array([z]),
                             "total_cents": pa.array([z]),
                             "nlines": pa.array([z])})
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        promo = np.asarray(t.column("p_type")).astype(str) == "PROMO"
        return pa.table({
            "promo_cents": pa.array([int(cents[promo].sum())],
                                    type=pa.int64()),
            "total_cents": pa.array([int(cents.sum())], type=pa.int64()),
            "nlines": pa.array([len(cents)], type=pa.int64()),
        })

    parts = hash_join_tasks(li_c, part, on="l_partkey",
                            right_on="p_partkey", post=_agg).take_all()
    return pa.table({
        "promo_cents": pa.array(
            [sum(p["promo_cents"] for p in parts)], type=pa.int64()),
        "total_cents": pa.array(
            [sum(p["total_cents"] for p in parts)], type=pa.int64()),
        "nlines": pa.array([sum(p["nlines"] for p in parts)],
                           type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Wave 12: interval self-join / skyline / retention cohorts
# ---------------------------------------------------------------------------

PAIRWIN_US = 3_600_000_000  # 1h pairing window, microseconds


def q_window_pair_join(sf_dir: str):
    """Time-window SELF-join: per user, the number of ORDERED event
    pairs (e1 before e2, e1 != e2) whose timestamps lie within one
    hour — the interval-join cardinality statistic. One user_id
    shuffle; each partition answers all its users with a vectorized
    two-pointer (searchsorted over the sorted per-user timestamp runs),
    never materializing the pairs."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "pairs_1h": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]") \
            .astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        uu, starts, counts = np.unique(uid, return_index=True,
                                       return_counts=True)
        # one GLOBAL searchsorted over all runs: a composite key
        # rank * SHIFT + rel is strictly run-ordered, and adding W
        # never crosses into the next user's block (SHIFT > rel+W)
        rel = ts - ts.min()
        shift = int(rel.max()) + PAIRWIN_US + 1
        rank = np.repeat(np.arange(len(uu), dtype=np.int64), counts)
        assert shift < (1 << 62) // max(len(uu), 1), \
            "window_pair_join composite-key overflow"
        key = rank * shift + rel
        # per event: later same-user events with ts <= ts_i + W
        # (ties pair exactly once by position order)
        hi = np.searchsorted(key, key + PAIRWIN_US, side="right")
        later = hi - (np.arange(len(key)) + 1)
        out = np.zeros(len(uu), dtype=np.int64)
        np.add.at(out, rank, later)
        return pa.table({"user_id": pa.array(uu),
                         "pairs_1h": pa.array(out)})

    return group_apply_tasks(ev, ["user_id"], _pairs)


def q_skyline_parts(sf_dir: str):
    """Skyline (Pareto-front) filter: parts not DOMINATED by any other
    part — dominated = another part with size >= and price <= (one
    strict). The classic distributed-skyline shape: the local skyline
    is a sound combiner (dominators survive locally), so one per-batch
    skyline pass feeds a single small global verify. Prices compare as
    exact integer cents."""
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    )

    _EMPTY_SKY = pa.table({"p_partkey": pa.array([], type=pa.int64()),
                           "p_size": pa.array([], type=pa.int64()),
                           "price_cents": pa.array([], type=pa.int64())})

    def _sky_core(k, sz, pc_) -> pa.Table:
        # exact 2D skyline with ties: a row survives iff
        #   price == min price of its size group  AND
        #   price <  min price over all STRICTLY larger sizes
        # (equal (size, price) duplicates don't dominate each other).
        # One sort by size desc + per-group mins + exclusive prefix min.
        order = np.lexsort((pc_, -sz))
        sz, pc_, k = sz[order], pc_[order], k[order]
        gstart = np.ones(len(k), dtype=bool)
        gstart[1:] = sz[1:] != sz[:-1]
        gidx = np.cumsum(gstart) - 1
        gmin = pc_[gstart]  # sorted by price within group: first = min
        prev_best = np.concatenate((
            [np.iinfo(np.int64).max], np.minimum.accumulate(gmin)[:-1]))
        keep = (pc_ == gmin[gidx]) & (pc_ < prev_best[gidx])
        return pa.table({"p_partkey": pa.array(k[keep]),
                         "p_size": pa.array(sz[keep]),
                         "price_cents": pa.array(pc_[keep])})

    def _local_sky(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_SKY
        return _sky_core(
            np.asarray(t.column("p_partkey"), dtype=np.int64),
            np.asarray(t.column("p_size"), dtype=np.int64),
            np.floor(np.asarray(t.column("p_retailprice")) * 100.0
                     + 0.5).astype(np.int64))

    local = ds.map_batches(_local_sky, batch_format="pyarrow",
                           zero_copy_batch=True)
    tabs = [t for t in ray.get(local.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _EMPTY_SKY
    merged = pa.concat_tables(tabs)
    return _sky_core(
        np.asarray(merged.column("p_partkey"), dtype=np.int64),
        np.asarray(merged.column("p_size"), dtype=np.int64),
        np.asarray(merged.column("price_cents"), dtype=np.int64))


def q_retention_cohorts(sf_dir: str):
    """Cohort retention: users bucketed by first-event week (cohort),
    counted as retained in each later week they were active —
    (cohort_week, week_offset, users). One user_id shuffle; each
    partition derives every resident user's cohort AND distinct active
    weeks in the same vectorized pass; the (cohort, offset) matrix is
    bounded (weeks^2) so the final combine is a driver-side bincount.
    Weeks = epoch_days // 7 (pure integer, identical in SQL)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _cohort(t: pa.Table) -> pa.Table:
        empty = pa.table({"cohort_week": pa.array([], type=pa.int64()),
                          "week_offset": pa.array([], type=pa.int64()),
                          "users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        wk = (np.asarray(t.column("ts")).astype("datetime64[s]")
              .astype(np.int64) // 86400) // 7
        # distinct (user, week)
        key = np.lexsort((wk, uid))
        uid, wk = uid[key], wk[key]
        new = np.ones(len(uid), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])
        uid, wk = uid[new], wk[new]
        ustart = np.ones(len(uid), dtype=bool)
        ustart[1:] = uid[1:] != uid[:-1]
        cohort = np.repeat(wk[ustart],
                           np.diff(np.nonzero(
                               np.append(ustart, True))[0]))
        off = wk - cohort
        pk = cohort * 10000 + off  # offsets < 10000 weeks
        upk, cnt = np.unique(pk, return_counts=True)
        return pa.table({
            "cohort_week": pa.array((upk // 10000).astype(np.int64)),
            "week_offset": pa.array((upk % 10000).astype(np.int64)),
            "users": pa.array(cnt.astype(np.int64)),
        })

    fine = group_apply_tasks(ev, ["user_id"], _cohort)
    tabs = [t for t in ray.get(fine.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _cohort(pa.table({}))
    ft = pa.concat_tables(tabs)
    cw = np.asarray(ft.column("cohort_week"), dtype=np.int64)
    wo = np.asarray(ft.column("week_offset"), dtype=np.int64)
    us = np.asarray(ft.column("users"), dtype=np.int64)
    pk = cw * 10000 + wo
    upk, inv = np.unique(pk, return_inverse=True)
    tot = ibincount(inv, weights=us.astype(np.float64)).astype(np.int64)
    return pa.table({
        "cohort_week": pa.array((upk // 10000).astype(np.int64)),
        "week_offset": pa.array((upk % 10000).astype(np.int64)),
        "users": pa.array(tot),
    })


# ---------------------------------------------------------------------------
# multimodal actor-pool pipelines, oracle-exact (integer synthesis)
# ---------------------------------------------------------------------------


def q_image_stats(sf_dir: str):
    """Binary image payloads -> stateful actor-pool decode -> integer
    per-item statistics. The synthetic payloads are pure integer
    arithmetic (pixel i = (i*(id+7)) % 251), so the decode output is
    SQL-reproducible — the first driver-checkable evidence for the
    multimodal decode path (reference analog: typed I/O handlers,
    TwitterEdge.h:78-130)."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")
    return blobs.map_batches(
        M.IntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


def q_image_resize_stats(sf_dir: str):
    """Chained actor pools: decode -> 2x2 mean-pool resize -> integer
    stats over the RESIZED payload. Pooled pixel = (sum of 2x2 block)//4
    (exact: sum <= 1020 so the float64 mean truncation equals integer
    floor division), keeping the whole chain oracle-exact."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")
    resized = M.resize_pipeline(blobs, concurrency=2, batch_size=64)
    return resized.map_batches(
        M.IntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


def q_video_frames(sf_dir: str):
    """Video payloads -> actor-pool frame sampling (every 2nd frame) ->
    one row per sampled frame with its integer pixel sum — the
    decode/sample/per-frame-feature layout of a video pretraining
    pipeline, oracle-exact via the integer frame synthesis."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="video")
    return blobs.map_batches(
        M.VideoFrameSumStage, batch_format="pyarrow", batch_size=32,
        concurrency=2, fn_constructor_kwargs={"stride": 2},
    )


# ---------------------------------------------------------------------------
# Wave 14: rich club / TPC-H Q12, Q13 / rolling window
# ---------------------------------------------------------------------------

RICH_DEG = 8


def q_rich_club(sf_dir: str):
    """Rich-club sufficient statistics: nv = vertices with degree >
    RICH_DEG, ne = undirected distinct edges with BOTH endpoints rich
    (the rich-club coefficient's numerator/denominator inputs
    2*ne / (nv*(nv-1)) — returned as exact integers). Degree vector
    broadcast once; one streaming pass over the a < b adjacency."""
    import ray

    ctx = get_context(sf_dir)
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    rich = deg > RICH_DEG
    rich_ref = ray.put(rich)
    be = ctx.graph("sym").dedup_sum().cast_bool().edges

    def _cnt(b: pa.Table, *, _ref=rich_ref) -> pa.Table:
        m = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = (s < d) & m[s] & m[d]
        return pa.table({"ne": pa.array([int(keep.sum())],
                                        type=pa.int64())})

    parts = be.map_batches(_cnt, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    return pa.table({
        "nv": pa.array([int(rich.sum())], type=pa.int64()),
        "ne": pa.array([sum(p["ne"] for p in parts)], type=pa.int64()),
    })


TPCH_Q12_YEAR = 1995


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12-style shipping-priority counts: lineitems shipped in
    one year, joined co-partitioned to orders, grouped by returnflag
    (this corpus' shipmode stand-in) with conditional high/low priority
    counts fused into the join task; bounded (3-row) driver combine."""
    import datetime

    import ray

    from ..core.shuffle import hash_join_tasks

    lo = datetime.datetime(TPCH_Q12_YEAR, 1, 1)
    hi = datetime.datetime(TPCH_Q12_YEAR + 1, 1, 1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    )

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderpriority" not in t.column_names:
            return pa.table({"l_returnflag": pa.array([], type=pa.string()),
                             "high_count": pa.array([], type=pa.int64()),
                             "low_count": pa.array([], type=pa.int64())})
        flag = np.asarray(t.column("l_returnflag")).astype(str)
        pri = np.asarray(t.column("o_orderpriority")).astype(str)
        high = (pri == "1-URGENT") | (pri == "2-HIGH")
        uf, inv = np.unique(flag, return_inverse=True)
        hi_c = np.bincount(inv, weights=high).astype(np.int64)
        lo_c = np.bincount(inv, weights=~high).astype(np.int64)
        return pa.table({"l_returnflag": pa.array(uf.tolist(),
                                                  type=pa.string()),
                         "high_count": pa.array(hi_c),
                         "low_count": pa.array(lo_c)})

    parts = hash_join_tasks(li, orders, on="l_orderkey",
                            right_on="o_orderkey", post=_agg).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["l_returnflag"], [0, 0])
        e[0] += p["high_count"]
        e[1] += p["low_count"]
    flags = sorted(agg)
    return pa.table({
        "l_returnflag": pa.array(flags, type=pa.string()),
        "high_count": pa.array([agg[f][0] for f in flags], type=pa.int64()),
        "low_count": pa.array([agg[f][1] for f in flags], type=pa.int64()),
    })


TPCH_Q13_EXCL = "4-NOT SPECIFIED"


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13-style customer order-count distribution: per-customer
    counts over the filtered orders (priority-class exclusion standing
    in for the NOT LIKE comment predicate), LEFT OUTER join keeps
    zero-order customers, bounded histogram (c_count, custdist)
    combined from per-partition partials."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != TPCH_Q13_EXCL,
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def _part(b: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.ones(b.num_rows),
            np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cnt": pa.array(s.astype(np.int64))})

    counts = group_apply_tasks(
        orders.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"],
        lambda t: (lambda uk, s: pa.table(
            {"o_custkey": pa.array(uk),
             "cnt": pa.array(s.astype(np.int64))}))(
            *group_sum_per_key(
                np.asarray(t.column("cnt"), dtype=np.float64),
                np.asarray(t.column("o_custkey"), dtype=np.int64)))
        if t.num_rows and "o_custkey" in t.column_names
        else pa.table({"o_custkey": pa.array([], type=pa.int64()),
                       "cnt": pa.array([], type=pa.int64())}),
    )

    def _hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_count": pa.array([], type=pa.int64()),
                             "custdist": pa.array([], type=pa.int64())})
        c = np.asarray(t.column("cnt"))
        c = np.where(np.isnan(c.astype(np.float64)), 0, c).astype(np.int64)
        u, k = np.unique(c, return_counts=True)
        return pa.table({"c_count": pa.array(u),
                         "custdist": pa.array(k.astype(np.int64))})

    parts = hash_join_tasks(cust, counts, on="c_custkey",
                            right_on="o_custkey", join_type="left outer",
                            post=_hist).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["c_count"]] = agg.get(p["c_count"], 0) + p["custdist"]
    ks = sorted(agg)
    return pa.table({
        "c_count": pa.array(ks, type=pa.int64()),
        "custdist": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


ROLL_WIN = 4  # current row + 3 preceding


def q_rolling_sum4(sf_dir: str):
    """Bounded-frame window aggregate: per user, the rolling sum of
    integer event cents over ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    ordered by (ts, event_id) — ONE user_id shuffle, then a
    whole-partition vectorized segmented difference of prefix sums
    (cum[i] - cum[max(segment_start, i-3)])."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def _roll(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "roll_cents": pa.array([], type=pa.int64())})
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(
            np.asarray(t.column("value")) * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, cents = u[order], eid[order], cents[order]
        m = len(u)
        segnew = np.ones(m, dtype=bool)
        segnew[1:] = u[1:] != u[:-1]
        seg_start = np.maximum.accumulate(
            np.where(segnew, np.arange(m), 0))
        cum0 = np.concatenate(([0], np.cumsum(cents)))
        i = np.arange(m)
        lo = np.maximum(seg_start, i - (ROLL_WIN - 1))
        roll = cum0[i + 1] - cum0[lo]
        return pa.table({"event_id": pa.array(eid),
                         "user_id": pa.array(u),
                         "roll_cents": pa.array(roll)})

    return group_apply_tasks(ev, ["user_id"], _roll)


# ---------------------------------------------------------------------------
# Wave 15: reciprocity / simhash pairs / range search / TPC-H Q16 / mode
# ---------------------------------------------------------------------------


def q_reciprocity(sf_dir: str):
    """Directed-graph reciprocity sufficient statistics: n_edges =
    distinct non-loop directed edges, n_recip = directed edges whose
    reverse also exists (the reciprocity coefficient's numerator;
    r = n_recip / n_edges). One unordered-pair shuffle; each partition
    counts its both-direction pairs vectorized — the coordinate-
    intersect of A with A^T (EWiseMult(A, A^T) nnz) without
    materializing the transpose."""
    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    be = ctx.graph("directed").dedup_sum().cast_bool().edges

    def _pairize(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "a": pa.array(np.minimum(s, d)),
            "b": pa.array(np.maximum(s, d)),
            "fwd": pa.array((s < d).astype(np.int64)),
        })

    pairs = be.map_batches(_pairize, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            z = np.int64(0)
            return pa.table({"n_edges": pa.array([z]),
                             "n_recip": pa.array([z])})
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        f = np.asarray(t.column("fwd"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, f = a[order], b[order], f[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        seg = np.cumsum(new) - 1
        nseg = int(seg[-1]) + 1
        has_f = np.bincount(seg, weights=f, minlength=nseg) > 0
        has_r = np.bincount(seg, weights=1 - f, minlength=nseg) > 0
        return pa.table({
            "n_edges": pa.array([len(a)], type=pa.int64()),
            "n_recip": pa.array([2 * int((has_f & has_r).sum())],
                                type=pa.int64()),
        })

    parts = group_apply_tasks(pairs, ["a", "b"], _cnt).take_all()
    return pa.table({
        "n_edges": pa.array([sum(p["n_edges"] for p in parts)],
                            type=pa.int64()),
        "n_recip": pa.array([sum(p["n_recip"] for p in parts)],
                            type=pa.int64()),
    })


SH_T = 3  # max hamming distance


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs: doc pairs whose 64-bit SimHash codes
    differ in <= SH_T bits, found by 4-band 16-bit blocking (pigeonhole:
    hamming <= 3 over 4 bands forces at least one equal band) + exact
    popcount verify — the classic Manku/Charikar web-dedup layout. Two
    shuffles: band-bucket candidate generation, pair-keyed dedup+verify;
    codes travel with the pairs so verify never re-reads the corpus."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import _run_pairs, simhash

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh = simhash(docs)

    def _bands(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("doc_id"), dtype=np.int64)
        c = np.asarray(t.column("simhash"), dtype=np.int64)
        u = c.view(np.uint64)
        bands, vals, ids, codes = [], [], [], []
        for bi in range(4):
            bands.append(np.full(len(d), bi, dtype=np.int64))
            vals.append(((u >> np.uint64(16 * bi))
                         & np.uint64(0xFFFF)).astype(np.int64))
            ids.append(d)
            codes.append(c)
        return pa.table({
            "band": pa.array(np.concatenate(bands)),
            "val": pa.array(np.concatenate(vals)),
            "doc_id": pa.array(np.concatenate(ids)),
            "code": pa.array(np.concatenate(codes)),
        })

    bands = sh.map_batches(_bands, batch_format="pyarrow",
                           zero_copy_batch=True)

    _empty = pa.table({"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64()),
                       "ca": pa.array([], type=pa.int64()),
                       "cb": pa.array([], type=pa.int64())})

    def _cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "band" not in t.column_names:
            return _empty
        band = np.asarray(t.column("band"), dtype=np.int64)
        val = np.asarray(t.column("val"), dtype=np.int64)
        d = np.asarray(t.column("doc_id"), dtype=np.int64)
        c = np.asarray(t.column("code"), dtype=np.int64)
        order = np.lexsort((d, val, band))
        band, val, d, c = band[order], val[order], d[order], c[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (val[1:] != val[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [len(d)])))
        la, ra, lc, rc = _run_pairs(starts, sizes, d, c)
        if len(la) == 0:
            return _empty
        return pa.table({"a": pa.array(la), "b": pa.array(ra),
                         "ca": pa.array(lc), "cb": pa.array(rc)})

    cands = group_apply_tasks(bands, ["band", "val"], _cand)

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "hamm": pa.array([], type=pa.int64())})
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        ca = np.asarray(t.column("ca"), dtype=np.int64)
        cb = np.asarray(t.column("cb"), dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, ca, cb = a[order], b[order], ca[order], cb[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b, ca, cb = a[keep], b[keep], ca[keep], cb[keep]
        x = (ca.view(np.uint64) ^ cb.view(np.uint64))
        ham = np.unpackbits(
            x[:, None].view(np.uint8), axis=1).sum(axis=1).astype(np.int64)
        ok = ham <= SH_T
        return pa.table({"a": pa.array(a[ok]), "b": pa.array(b[ok]),
                         "hamm": pa.array(ham[ok])})

    return group_apply_tasks(cands, ["a", "b"], _verify)


RS_Q = 4  # query vectors: vec_id < RS_Q
RS_MIN = 18_000_000_000_000  # integer dot-product threshold


def q_range_search(sf_dir: str):
    """Threshold (range) similarity search: all (query, vector) pairs
    with integer dot product >= RS_MIN over the `kmeans_fixed`
    quantization q = floor((x+0.5)*2^20) — exact on both sides. The
    RS_Q query rows broadcast once (`ray.put`); each batch answers with
    one int64 matmul + threshold mask (the brute-force range-scan
    baseline of the ANN family, `ann.py` discipline)."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    seed_t = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < RS_Q,
    ).sort("vec_id").take_batch(RS_Q, batch_format="pyarrow")
    qids, qmat = _km_quant(pa.table(seed_t))
    qref = ray.put((qids, qmat))

    def _scan(t: pa.Table, *, _ref=qref) -> pa.Table:
        qi, qm = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t)
        if len(ids) == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "dot": pa.array([], type=pa.int64())})
        d = qm @ Q.T  # (RS_Q, rows) int64 exact (< 2^44 per term * 64)
        qq, vv = np.nonzero(d >= RS_MIN)
        return pa.table({"qid": pa.array(qi[qq]),
                         "vec_id": pa.array(ids[vv]),
                         "dot": pa.array(d[qq, vv])})

    return emb.map_batches(_scan, batch_format="pyarrow",
                           zero_copy_batch=True)


Q16_EXCL_BRAND = "Brand#1"
Q16_SIZES = (1, 7, 14, 21, 28, 35, 42, 49)


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16-style supplier-count report: distinct suppliers able to
    supply parts of each (brand, size) among the selected sizes,
    excluding one brand and suppliers with negative account balance
    (the complaints anti-join stand-in). Bad-supplier set broadcast
    once; part attributes join co-partitioned on partkey with the
    (brand, size, supp) projection fused; distinct via one more keyed
    shuffle; bounded counts combine driver-side."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    bad = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"],
        filter=pc.field("s_acctbal") < 0.0,
    ).take_all()
    bad_set = np.sort(np.array([r["s_suppkey"] for r in bad],
                               dtype=np.int64))
    bad_ref = ray.put(bad_set)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=(pc.field("p_brand") != Q16_EXCL_BRAND)
        & pc.field("p_size").isin(list(Q16_SIZES)),
    )

    def _proj(t: pa.Table, *, _ref=bad_ref) -> pa.Table:
        bs = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             "p_size": pa.array([], type=pa.int64()),
                             "supp": pa.array([], type=pa.int64())})
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        ok = np.ones(len(sk), dtype=bool)
        if len(bs):
            pos = np.searchsorted(bs, sk)
            pos[pos >= len(bs)] = len(bs) - 1
            ok = bs[pos] != sk
        return pa.table({
            "p_brand": t.column("p_brand").filter(pa.array(ok)),
            "p_size": pa.array(
                np.asarray(t.column("p_size"), dtype=np.int64)[ok]),
            "supp": pa.array(sk[ok]),
        })

    proj = hash_join_tasks(li, part, on="l_partkey", right_on="p_partkey",
                           post=_proj)

    def _distinct_cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             "p_size": pa.array([], type=pa.int64()),
                             "supplier_cnt": pa.array([], type=pa.int64())})
        br = np.asarray(t.column("p_brand")).astype(str)
        sz = np.asarray(t.column("p_size"), dtype=np.int64)
        sp = np.asarray(t.column("supp"), dtype=np.int64)
        trip = np.unique(
            np.stack([br, sz.astype(str), sp.astype(str)], axis=1), axis=0)
        key = np.char.add(np.char.add(trip[:, 0], "\x1f"), trip[:, 1])
        ug, cnt = np.unique(key, return_counts=True)
        b_out = [k.split("\x1f")[0] for k in ug]
        s_out = [int(k.split("\x1f")[1]) for k in ug]
        return pa.table({"p_brand": pa.array(b_out, type=pa.string()),
                         "p_size": pa.array(s_out, type=pa.int64()),
                         "supplier_cnt": pa.array(cnt.astype(np.int64))})

    parts = group_apply_tasks(proj, ["p_brand", "p_size"],
                              _distinct_cnt).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["p_brand"], p["p_size"])
        agg[k] = agg.get(k, 0) + p["supplier_cnt"]
    ks = sorted(agg)
    return pa.table({
        "p_brand": pa.array([k[0] for k in ks], type=pa.string()),
        "p_size": pa.array([k[1] for k in ks], type=pa.int64()),
        "supplier_cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_mode_hour(sf_dir: str):
    """Per-type modal hour-of-day: the hour with the most events of each
    type (ties -> lowest hour) and its count — the MODE aggregate as
    bounded (type x 24) per-batch partials + a driver-side argmax.
    Hour = (epoch_us // 3600e6) % 24, pure integer (equals
    extract(hour) for the post-1970 timestamps here)."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def _part(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        hour = (t // 3_600_000_000) % 24
        et = np.asarray(b.column("event_type")).astype(str)
        key = np.char.add(np.char.add(et, "\x1f"), hour.astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array([k.split("\x1f")[0] for k in uk],
                                   type=pa.string()),
            "hour": pa.array([int(k.split("\x1f")[1]) for k in uk],
                             type=pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["event_type"], p["hour"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    best: dict[str, tuple] = {}
    for (et, hour), cnt in agg.items():
        cur = best.get(et)
        if cur is None or (-cnt, hour) < (-cur[1], cur[0]):
            best[et] = (hour, cnt)
    ets = sorted(best)
    return pa.table({
        "event_type": pa.array(ets, type=pa.string()),
        "hour": pa.array([best[e][0] for e in ets], type=pa.int64()),
        "cnt": pa.array([best[e][1] for e in ets], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 16: TPC-H Q7 / Q15 / Q17 / Q22 + regression sufficient statistics
# ---------------------------------------------------------------------------

Q7_LO_YEAR, Q7_HI_YEAR = 1995, 1997  # shipdate in [1995, 1997)


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7-style international shipping volume: revenue between
    every (supplier nation != customer nation) pair by ship year.
    Customer nation rides the co-partitioned orders|><|customer join;
    the supplier->nation map broadcasts once (supplier is the smallest
    dimension, the reference's replicated small side); lineitem joins
    orders co-partitioned with the (snat, cnat, year) partial fused
    into the join task; output is bounded (<= nations^2 x years)."""
    import datetime

    import ray

    from ..core.shuffle import hash_join_tasks

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).take_all()
    skeys = np.array([r["s_suppkey"] for r in sup], dtype=np.int64)
    snats = np.array([r["s_nationkey"] for r in sup], dtype=np.int64)
    o = np.argsort(skeys)
    smap_ref = ray.put((skeys[o], snats[o]))
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ojoin = hash_join_tasks(orders, cust, on="o_custkey",
                            right_on="c_custkey")

    lo = datetime.datetime(Q7_LO_YEAR, 1, 1)
    hi = datetime.datetime(Q7_HI_YEAR, 1, 1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )

    def _post(t: pa.Table, *, _ref=smap_ref) -> pa.Table:
        empty = pa.table({"snat": pa.array([], type=pa.int64()),
                          "cnat": pa.array([], type=pa.int64()),
                          "l_year": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "c_nationkey" not in t.column_names:
            return empty
        sk, sn = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        lsup = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pos = np.searchsorted(sk, lsup)
        pos[pos >= len(sk)] = len(sk) - 1 if len(sk) else 0
        snat = sn[pos]
        cnat = np.asarray(t.column("c_nationkey"), dtype=np.int64)
        keep = snat != cnat
        if not keep.any():
            return empty
        ship = np.asarray(t.column("l_shipdate")).astype("datetime64[us]")
        year = ship.astype("datetime64[Y]").astype(np.int64)[keep] + 1970
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"))
            * (1.0 - np.asarray(t.column("l_discount"))) * 100.0
        )[keep].astype(np.int64)
        key = ((snat[keep] * 32 + cnat[keep]) * 4096
               + (year - Q7_LO_YEAR))
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64))
        return pa.table({"snat": pa.array(uk // (32 * 4096)),
                         "cnat": pa.array((uk // 4096) % 32),
                         "l_year": pa.array(uk % 4096 + Q7_LO_YEAR),
                         "cents": pa.array(s.astype(np.int64))})

    parts = hash_join_tasks(li, ojoin, on="l_orderkey",
                            right_on="o_orderkey", post=_post).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["snat"], p["cnat"], p["l_year"])
        agg[k] = agg.get(k, 0) + p["cents"]
    ks = sorted(agg, key=lambda k: (nname[k[0]], nname[k[1]], k[2]))
    return pa.table({
        "supp_nation": pa.array([nname[k[0]] for k in ks],
                                type=pa.string()),
        "cust_nation": pa.array([nname[k[1]] for k in ks],
                                type=pa.string()),
        "l_year": pa.array([k[2] for k in ks], type=pa.int64()),
        "rev_cents": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


Q15_LO = (1996, 1, 1)
Q15_HI = (1996, 4, 1)


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15-style top supplier(s): per-supplier quarterly revenue
    (the revenue0 view) as per-batch integer-cents partials + one keyed
    shuffle, then the max-revenue supplier set (ties kept, as in the
    spec) joined to supplier names via the broadcast dimension."""
    import datetime

    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    lo = datetime.datetime(*Q15_LO)
    hi = datetime.datetime(*Q15_HI)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )

    def _part(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b.column("l_extendedprice"))
            * (1.0 - np.asarray(b.column("l_discount"))) * 100.0)
        uk, s = group_sum_per_key(cents,
                                  np.asarray(b.column("l_suppkey"),
                                             dtype=np.int64))
        return pa.table({"l_suppkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("l_suppkey"), dtype=np.int64))
        return pa.table({"l_suppkey": pa.array(uk),
                         "total_rev_cents": pa.array(s.astype(np.int64))})

    per_supp = group_apply_tasks(
        li.map_batches(_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_suppkey"], _merge).take_all()
    if not per_supp:
        return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                         "s_name": pa.array([], type=pa.string()),
                         "total_rev_cents": pa.array([], type=pa.int64())})
    best = max(p["total_rev_cents"] for p in per_supp)
    winners = sorted(p["l_suppkey"] for p in per_supp
                     if p["total_rev_cents"] == best)
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).take_all()
    names = {r["s_suppkey"]: r["s_name"] for r in sup}
    return pa.table({
        "s_suppkey": pa.array(winners, type=pa.int64()),
        "s_name": pa.array([names[w] for w in winners], type=pa.string()),
        "total_rev_cents": pa.array([best] * len(winners),
                                    type=pa.int64()),
    })


Q17_BRAND = "Brand#2"


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17-style small-quantity-order revenue: lineitems of one
    brand's parts whose quantity is below 0.2x the part's average
    quantity. The correlated scalar subquery becomes a per-part
    whole-group kernel inside one co-partitioned shuffle (a part's
    lines all land together, so avg + the conditional sum are exact in
    one pass); the fraction test runs division-free as
    5 * qty * cnt < sum_qty in integers. Brand part ids broadcast once
    into the parquet read filter. One-row output (cents + line count),
    division by 7.0 left to the reader as documented."""
    import ray

    from ..core.shuffle import group_apply_tasks

    pt = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pc.field("p_brand") == Q17_BRAND,
    ).take_all()
    pset = np.sort(np.array([r["p_partkey"] for r in pt], dtype=np.int64))
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
        filter=pc.field("l_partkey").isin(pset.tolist()),
    )

    def _group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return pa.table({"cents": pa.array([], type=pa.int64()),
                             "nlines": pa.array([], type=pa.int64())})
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        qty = np.asarray(t.column("l_quantity")).astype(np.int64)
        cents = np.floor(
            np.asarray(t.column("l_extendedprice")) * 100.0).astype(
            np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        cnt = np.bincount(inv)
        sq = ibincount(inv, weights=qty.astype(np.float64)).astype(
            np.int64)
        low = 5 * qty * cnt[inv] < sq[inv]
        return pa.table({
            "cents": pa.array([int(cents[low].sum())], type=pa.int64()),
            "nlines": pa.array([int(low.sum())], type=pa.int64()),
        })

    parts = group_apply_tasks(li, ["l_partkey"], _group).take_all()
    return pa.table({
        "cents": pa.array([sum(p["cents"] for p in parts)],
                          type=pa.int64()),
        "nlines": pa.array([sum(p["nlines"] for p in parts)],
                           type=pa.int64()),
    })


Q22_SEGS = ("BUILDING", "AUTOMOBILE", "MACHINERY")
Q22_CUTOFF = (2000, 1, 1)  # "no recent orders" (every customer here has
#                            SOME order, so the spec's empty-order test
#                            is re-dated to keep the query non-vacuous)


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22-style global sales opportunity: customers in selected
    market segments (the phone-prefix stand-in) with account balance
    above the average positive balance of those segments AND no orders
    since Q22_CUTOFF. Phase 1: one streaming pass -> (n_pos,
    sum_pos_cents) scalars. Phase 2: the above-average test runs
    division-free (bal_cents * n_pos > sum_pos) inside a co-partitioned
    LEFT OUTER join against per-partition-distinct recent-order
    custkeys (the NOT EXISTS). Output: per-segment customer count +
    total balance cents."""
    import datetime

    import ray

    from ..core.shuffle import hash_join_tasks

    segs = list(Q22_SEGS)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
        filter=pc.field("c_mktsegment").isin(segs),
    )

    def _pos_part(b: pa.Table) -> pa.Table:
        bal = np.asarray(b.column("c_acctbal"))
        pos = bal > 0.0
        cents = np.floor(bal[pos] * 100.0)
        return pa.table({"n": pa.array([int(pos.sum())], type=pa.int64()),
                         "s": pa.array([int(cents.sum())],
                                       type=pa.int64())})

    stats = cust.map_batches(_pos_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    n_pos = sum(p["n"] for p in stats)
    sum_pos = sum(p["s"] for p in stats)

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderdate")
        >= pa.scalar(datetime.datetime(*Q22_CUTOFF)),
    )

    def _dedup(b: pa.Table) -> pa.Table:
        uk = np.unique(np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "has_o": pa.array(np.ones(len(uk),
                                                   dtype=np.int8))})

    ouniq = ords.map_batches(_dedup, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _post(t: pa.Table, *, _n=n_pos, _s=sum_pos) -> pa.Table:
        empty = pa.table({"c_mktsegment": pa.array([], type=pa.string()),
                          "numcust": pa.array([], type=pa.int64()),
                          "totbal_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "c_acctbal" not in t.column_names:
            return empty
        has_order = pc.is_valid(t.column("has_o")).to_numpy(
            zero_copy_only=False)
        bal_cents = np.floor(
            np.asarray(t.column("c_acctbal")) * 100.0).astype(np.int64)
        keep = (~has_order) & (bal_cents * _n > _s)
        if not keep.any():
            return empty
        seg = np.asarray(t.column("c_mktsegment")).astype(str)[keep]
        us, inv = np.unique(seg, return_inverse=True)
        return pa.table({
            "c_mktsegment": pa.array(us.tolist(), type=pa.string()),
            "numcust": pa.array(np.bincount(inv).astype(np.int64)),
            "totbal_cents": pa.array(ibincount(
                inv, weights=bal_cents[keep].astype(np.float64)
            ).astype(np.int64)),
        })

    # LEFT OUTER keeps order-less customers; dedup partials of one key
    # co-locate so a customer with orders joins >=1 non-null row and a
    # customer without joins exactly one null row.
    parts = hash_join_tasks(cust, ouniq, on="c_custkey",
                            right_on="o_custkey", join_type="left outer",
                            post=_post).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["c_mktsegment"], [0, 0])
        e[0] += p["numcust"]
        e[1] += p["totbal_cents"]
    ks = sorted(agg)
    return pa.table({
        "c_mktsegment": pa.array(ks, type=pa.string()),
        "numcust": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "totbal_cents": pa.array([agg[k][1] for k in ks],
                                 type=pa.int64()),
    })


def q_regr_stats(sf_dir: str):
    """Per-type linear-regression sufficient statistics of event value
    (cents) against hour-of-day: n, sum_x, sum_y, sum_xy, sum_x2,
    sum_y2 as exact integers — everything COVAR / CORR / REGR_SLOPE
    need, shuffle-free (bounded per-batch partials, driver combine of
    <= n_types rows)."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def _part(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        x = (t // 3_600_000_000) % 24
        y = np.floor(np.asarray(b.column("value")) * 100.0 + 0.5).astype(
            np.int64)
        et = np.asarray(b.column("event_type")).astype(str)
        ue, inv = np.unique(et, return_inverse=True)
        def bc(w):
            return ibincount(inv, weights=w.astype(np.float64)).astype(
                np.int64)
        return pa.table({
            "event_type": pa.array(ue.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_x": pa.array(bc(x)),
            "sum_y": pa.array(bc(y)),
            "sum_xy": pa.array(bc(x * y)),
            "sum_x2": pa.array(bc(x * x)),
            "sum_y2": pa.array(bc(y * y)),
        })

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[str, np.ndarray] = {}
    for p in parts:
        v = np.array([p["n"], p["sum_x"], p["sum_y"], p["sum_xy"],
                      p["sum_x2"], p["sum_y2"]], dtype=np.int64)
        agg[p["event_type"]] = agg.get(p["event_type"], 0) + v
    ks = sorted(agg)
    cols = ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
    out = {"event_type": pa.array(ks, type=pa.string())}
    for i, c in enumerate(cols):
        out[c] = pa.array([int(agg[k][i]) for k in ks], type=pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# wave 17: TPC-H Q9 / Q19, edit-distance window, language Gini, audio stats
# ---------------------------------------------------------------------------

Q9_PART = "widget"


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9-style product-type profit: revenue of lineitems whose
    part name contains Q9_PART, by supplier nation x ship year (profit
    = discounted revenue cents; this corpus has no partsupp cost side).
    Parts filter at the read (LIKE pushdown), lineitem joins the
    filtered parts co-partitioned on partkey with the supplier->nation
    broadcast map + bounded (nation x year) partials fused into the
    join task."""
    import ray

    from ..core.shuffle import hash_join_tasks

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).take_all()
    skeys = np.array([r["s_suppkey"] for r in sup], dtype=np.int64)
    snats = np.array([r["s_nationkey"] for r in sup], dtype=np.int64)
    o = np.argsort(skeys)
    smap_ref = ray.put((skeys[o], snats[o]))
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pc.match_substring(pc.field("p_name"), Q9_PART),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def _post(t: pa.Table, *, _ref=smap_ref) -> pa.Table:
        empty = pa.table({"snat": pa.array([], type=pa.int64()),
                          "l_year": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return empty
        sk, sn = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        lsup = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pos = np.searchsorted(sk, lsup)
        pos[pos >= len(sk)] = len(sk) - 1 if len(sk) else 0
        snat = sn[pos]
        ship = np.asarray(t.column("l_shipdate")).astype("datetime64[us]")
        year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"))
            * (1.0 - np.asarray(t.column("l_discount"))) * 100.0
        ).astype(np.int64)
        key = snat * 4096 + (year - 1970)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64))
        return pa.table({"snat": pa.array(uk // 4096),
                         "l_year": pa.array(uk % 4096 + 1970),
                         "cents": pa.array(s.astype(np.int64))})

    parts = hash_join_tasks(li, part, on="l_partkey",
                            right_on="p_partkey", post=_post).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["snat"], p["l_year"])
        agg[k] = agg.get(k, 0) + p["cents"]
    ks = sorted(agg, key=lambda k: (nname[k[0]], k[1]))
    return pa.table({
        "nation": pa.array([nname[k[0]] for k in ks], type=pa.string()),
        "l_year": pa.array([k[1] for k in ks], type=pa.int64()),
        "profit_cents": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# (brand, size_lo, size_hi, qty_lo, qty_hi) disjuncts
Q19_CLAUSES = (("Brand#1", 1, 5, 1, 11),
               ("Brand#2", 1, 10, 10, 20),
               ("Brand#3", 1, 15, 20, 30))


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    (brand, size-range, quantity-range) clauses evaluated vectorized
    inside one co-partitioned lineitem |><| part join; one-row integer
    output (revenue cents + matching line count)."""
    import ray

    from ..core.shuffle import hash_join_tasks

    brands = sorted({c[0] for c in Q19_CLAUSES})
    max_size = max(c[2] for c in Q19_CLAUSES)
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin(brands)
        & (pc.field("p_size") <= max_size),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
    )

    def _post(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return pa.table({"cents": pa.array([], type=pa.int64()),
                             "nlines": pa.array([], type=pa.int64())})
        br = np.asarray(t.column("p_brand")).astype(str)
        sz = np.asarray(t.column("p_size"), dtype=np.int64)
        qty = np.asarray(t.column("l_quantity")).astype(np.int64)
        keep = np.zeros(t.num_rows, dtype=bool)
        for b, slo, shi, qlo, qhi in Q19_CLAUSES:
            keep |= ((br == b) & (sz >= slo) & (sz <= shi)
                     & (qty >= qlo) & (qty <= qhi))
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"))
            * (1.0 - np.asarray(t.column("l_discount"))) * 100.0
        ).astype(np.int64)
        return pa.table({
            "cents": pa.array([int(cents[keep].sum())], type=pa.int64()),
            "nlines": pa.array([int(keep.sum())], type=pa.int64()),
        })

    parts = hash_join_tasks(li, part, on="l_partkey",
                            right_on="p_partkey", post=_post).take_all()
    return pa.table({
        "cents": pa.array([sum(p["cents"] for p in parts)],
                          type=pa.int64()),
        "nlines": pa.array([sum(p["nlines"] for p in parts)],
                           type=pa.int64()),
    })


ED_W = 3    # neighbor window (doc_id distance)
ED_K = 96   # codepoint prefix compared
ED_B = 512  # doc_id partition width


def q_edit_window(sf_dir: str):
    """Edit-distance profile over neighbor document pairs: exact
    byte-level Levenshtein between the ED_K-codepoint prefixes of every
    doc pair at doc_id distance 1..ED_W — the near-dup verify kernel
    (`text.levenshtein_batch`, one vectorized DP over the pair axis)
    driven through a boundary-overlap routed shuffle: docs route to
    partition doc_id // ED_B, and the first ED_W docs of each partition
    also copy to the previous partition so cross-boundary pairs form
    locally. No all-pairs stage anywhere."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import levenshtein_batch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _route(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        txt = pc.utf8_slice_codeunits(b.column("text"), 0, ED_K)
        pk = ids // ED_B
        base = pa.table({"pk": pa.array(pk), "doc_id": pa.array(ids),
                         "text": txt})
        low = (ids % ED_B < ED_W) & (pk > 0)
        if not low.any():
            return base
        extra = pa.table({"pk": pa.array(pk[low] - 1),
                          "doc_id": pa.array(ids[low]),
                          "text": txt.filter(pa.array(low))})
        return pa.concat_tables([base, extra])

    routed = docs.map_batches(_route, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "dist": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return empty
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        pk = np.asarray(t.column("pk"), dtype=np.int64)
        # overlap copies duplicate (pk-1, id); dedup on id within the
        # hash partition (several pk values co-locate per partition).
        # "own" must OR over copies: the home row proves this partition
        # owns the doc's pair emission even when the surviving unique
        # row is the overlap copy.
        home = pk == ids // ED_B
        uids, first, inv = np.unique(ids, return_index=True,
                                     return_inverse=True)
        own = np.bincount(inv, weights=home.astype(np.float64)) > 0
        txt = t.column("text").take(pa.array(first)).to_pylist()
        ai, bi = [], []
        for d in range(1, ED_W + 1):
            pos = np.searchsorted(uids, uids + d)
            ok = (pos < len(uids))
            okp = np.flatnonzero(ok)
            okp = okp[uids[pos[okp]] == uids[okp] + d]
            okp = okp[own[okp]]
            ai.append(okp)
            bi.append(pos[okp])
        ai = np.concatenate(ai) if ai else np.zeros(0, np.int64)
        bi = np.concatenate(bi) if bi else np.zeros(0, np.int64)
        if len(ai) == 0:
            return empty
        dist = levenshtein_batch([txt[i] for i in ai],
                                 [txt[j] for j in bi])
        return pa.table({"a": pa.array(uids[ai]),
                         "b": pa.array(uids[bi]),
                         "dist": pa.array(dist)})

    return group_apply_tasks(routed, ["pk"], _pairs)


def q_lang_gini(sf_dir: str):
    """Per-source language-diversity sufficient statistics: document
    count n and sum of squared per-language counts (Gini impurity
    = 1 - sumsq/n^2, left rational) — exact integers, shuffle-free
    bounded (source x lang) per-batch partials."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def _part(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("source")).astype(str)
        lng = np.asarray(b.column("lang")).astype(str)
        key = np.char.add(np.char.add(src, "\x1f"), lng)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "source": pa.array([k.split("\x1f")[0] for k in uk],
                               type=pa.string()),
            "lang": pa.array([k.split("\x1f")[1] for k in uk],
                             type=pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["source"], p["lang"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    per_src: dict[str, list[int]] = {}
    for (src, _), cnt in agg.items():
        e = per_src.setdefault(src, [0, 0])
        e[0] += cnt
        e[1] += cnt * cnt
    ks = sorted(per_src)
    return pa.table({
        "source": pa.array(ks, type=pa.string()),
        "n": pa.array([per_src[k][0] for k in ks], type=pa.int64()),
        "sumsq": pa.array([per_src[k][1] for k in ks], type=pa.int64()),
    })


def q_audio_stats(sf_dir: str):
    """Binary audio payloads (int16 PCM, integer synthesis) -> stateful
    actor-pool feature extraction -> integer per-item statistics
    (n_samples, |PCM| sum, energy, zero crossings). The audio sibling
    of `image_stats`: driver-checkable evidence for the audio decode
    class; the float/codec stage (`AudioFeatureStage`) stays beside it,
    pytest-backed."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="audio")
    return blobs.map_batches(
        M.AudioIntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


# ---------------------------------------------------------------------------
# wave 18: TPC-H Q2 / Q8 / Q11 / Q20 adaptations + Bloom-filter probe
# ---------------------------------------------------------------------------

Q2_SUB = "bolt"
Q2_SIZES = (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2-style minimum-cost supplier: for every selected part
    (name contains Q2_SUB, size in Q2_SIZES), the supplier with the
    lowest account balance among suppliers that actually shipped it
    (distinct (part, supplier) pairs from lineitem stand in for
    partsupp). Distinct pairs: per-batch dedup + one partkey shuffle;
    the per-part argmin (bal, suppkey tie-break) runs as a whole-group
    kernel inside the co-partitioned join with the filtered part
    table; supplier attributes broadcast once."""
    import ray

    from ..core.shuffle import hash_join_tasks

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal"],
    ).take_all()
    skeys = np.array([r["s_suppkey"] for r in sup], dtype=np.int64)
    sbal = np.array([int(np.floor(r["s_acctbal"] * 100.0)) for r in sup],
                    dtype=np.int64)
    snames = np.array([r["s_name"] for r in sup])
    o = np.argsort(skeys)
    smap_ref = ray.put((skeys[o], sbal[o], snames[o]))

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name"],
        filter=pc.match_substring(pc.field("p_name"), Q2_SUB)
        & pc.field("p_size").isin(list(Q2_SIZES)),
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def _dedup(b: pa.Table) -> pa.Table:
        pk = np.asarray(b.column("l_partkey"), dtype=np.int64)
        sk = np.asarray(b.column("l_suppkey"), dtype=np.int64)
        u = np.unique(_pack20(pk, sk))
        return pa.table({"l_partkey": pa.array(u >> 20),
                         "l_suppkey": pa.array(u & ((1 << 20) - 1))})

    pairs = li.map_batches(_dedup, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _post(t: pa.Table, *, _ref=smap_ref) -> pa.Table:
        empty = pa.table({"p_partkey": pa.array([], type=pa.int64()),
                          "p_name": pa.array([], type=pa.string()),
                          "s_suppkey": pa.array([], type=pa.int64()),
                          "s_name": pa.array([], type=pa.string()),
                          "bal_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "p_name" not in t.column_names:
            return empty
        sk, bal, nm = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        ls = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pos = np.searchsorted(sk, ls)
        pos[pos >= len(sk)] = len(sk) - 1 if len(sk) else 0
        b = bal[pos]
        # per-part argmin under (bal, suppkey): lexsort + first-of-group
        # (duplicate (pk, supp) pairs across batches collapse to the
        # same argmin, so cross-batch dedup is unnecessary here)
        order = np.lexsort((ls, b, pk))
        pk_s = pk[order]
        firsts = np.ones(len(pk_s), dtype=bool)
        firsts[1:] = pk_s[1:] != pk_s[:-1]
        w = order[firsts]
        names = t.column("p_name").take(pa.array(w))
        return pa.table({
            "p_partkey": pa.array(pk[w]),
            "p_name": names,
            "s_suppkey": pa.array(ls[w]),
            "s_name": pa.array(nm[pos[w]].tolist(), type=pa.string()),
            "bal_cents": pa.array(b[w]),
        })

    return hash_join_tasks(pairs, part, on="l_partkey",
                           right_on="p_partkey", post=_post)


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8-style market share: per (customer region, order year),
    total lineitem revenue vs the share supplied from the SAME region
    (local content). Customer->nation->region rides the co-partitioned
    orders join; supplier->region broadcasts; bounded
    (region x year) partials fuse into the lineitem join; division
    left rational (total_cents, local_cents)."""
    import ray

    from ..core.shuffle import hash_join_tasks

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).take_all()
    n2r = {r["n_nationkey"]: r["n_regionkey"] for r in nat}
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    rname = {r["r_regionkey"]: r["r_name"] for r in reg}
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).take_all()
    skeys = np.array([r["s_suppkey"] for r in sup], dtype=np.int64)
    sregs = np.array([n2r[r["s_nationkey"]] for r in sup], dtype=np.int64)
    o = np.argsort(skeys)
    smap_ref = ray.put((skeys[o], sregs[o]))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def _creg(b: pa.Table) -> pa.Table:
        cn = np.asarray(b.column("c_nationkey"), dtype=np.int64)
        lut = np.full(int(max(n2r) + 1), -1, dtype=np.int64)
        for k, v in n2r.items():
            lut[k] = v
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "c_reg": pa.array(lut[cn])})

    cust_r = cust.map_batches(_creg, batch_format="pyarrow",
                              zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    ojoin = hash_join_tasks(orders, cust_r, on="o_custkey",
                            right_on="c_custkey")
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def _post(t: pa.Table, *, _ref=smap_ref) -> pa.Table:
        empty = pa.table({"c_reg": pa.array([], type=pa.int64()),
                          "o_year": pa.array([], type=pa.int64()),
                          "total": pa.array([], type=pa.int64()),
                          "local": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "c_reg" not in t.column_names:
            return empty
        sk, sr = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ls = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pos = np.searchsorted(sk, ls)
        pos[pos >= len(sk)] = len(sk) - 1 if len(sk) else 0
        sreg = sr[pos]
        creg = np.asarray(t.column("c_reg"), dtype=np.int64)
        od = np.asarray(t.column("o_orderdate")).astype("datetime64[us]")
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"))
            * (1.0 - np.asarray(t.column("l_discount"))) * 100.0
        ).astype(np.int64)
        key = creg * 4096 + (year - 1970)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=cents.astype(np.float64))
        loc = np.bincount(inv, weights=np.where(sreg == creg, cents,
                                                0).astype(np.float64))
        return pa.table({"c_reg": pa.array(uk // 4096),
                         "o_year": pa.array(uk % 4096 + 1970),
                         "total": pa.array(tot.astype(np.int64)),
                         "local": pa.array(loc.astype(np.int64))})

    parts = hash_join_tasks(li, ojoin, on="l_orderkey",
                            right_on="o_orderkey", post=_post).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        e = agg.setdefault((p["c_reg"], p["o_year"]), [0, 0])
        e[0] += p["total"]
        e[1] += p["local"]
    ks = sorted(agg, key=lambda k: (rname[k[0]], k[1]))
    return pa.table({
        "r_name": pa.array([rname[k[0]] for k in ks], type=pa.string()),
        "o_year": pa.array([k[1] for k in ks], type=pa.int64()),
        "total_cents": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "local_cents": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11-style important stock: parts whose total revenue value
    exceeds 1.3x the mean per-part value — the HAVING-over-scalar-
    subquery pattern run division-free and scale-free
    (10 * value * n_parts > 13 * grand_total). One partkey shuffle produces
    per-part values; the bounded survivors filter against two scalars
    combined driver-side."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def _part(b: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(b.column("l_extendedprice"))
            * (1.0 - np.asarray(b.column("l_discount"))) * 100.0)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("l_partkey"), dtype=np.int64))
        return pa.table({"l_partkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("l_partkey"), dtype=np.int64))
        return pa.table({"l_partkey": pa.array(uk),
                         "value_cents": pa.array(s.astype(np.int64))})

    per_part = group_apply_tasks(
        li.map_batches(_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_partkey"], _merge).materialize()

    def _scal(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column("value_cents"), dtype=np.int64)
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64()),
                         "s": pa.array([int(v.sum())], type=pa.int64())})

    sc = per_part.map_batches(_scal, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    n_parts = sum(p["n"] for p in sc)
    total = sum(p["s"] for p in sc)

    def _filt(b: pa.Table, *, _n=n_parts, _t=total) -> pa.Table:
        v = np.asarray(b.column("value_cents"), dtype=np.int64)
        keep = 10 * v * _n > 13 * _t
        return pa.table({
            "l_partkey": pa.array(
                np.asarray(b.column("l_partkey"), dtype=np.int64)[keep]),
            "value_cents": pa.array(v[keep]),
        })

    return per_part.map_batches(_filt, batch_format="pyarrow",
                                zero_copy_batch=True)


Q20_YEAR = 1996


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20-style dominant supplier detection: (part, supplier)
    pairs where the supplier shipped MORE THAN HALF of the part's total
    quantity in one year (2*qty > total, division-free — the
    availqty > 0.5*sum(l_quantity) analog without partsupp). One
    partkey shuffle; per-part totals + the pair filter run in one
    whole-group kernel."""
    import datetime

    import ray

    from ..core.shuffle import group_apply_tasks

    lo = datetime.datetime(Q20_YEAR, 1, 1)
    hi = datetime.datetime(Q20_YEAR + 1, 1, 1)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )

    def _part(b: pa.Table) -> pa.Table:
        pk = np.asarray(b.column("l_partkey"), dtype=np.int64)
        sk = np.asarray(b.column("l_suppkey"), dtype=np.int64)
        qty = np.asarray(b.column("l_quantity")).astype(np.int64)
        key = _pack20(pk, sk)
        uk, inv = np.unique(key, return_inverse=True)
        s = ibincount(inv, weights=qty.astype(np.float64)).astype(
            np.int64)
        return pa.table({"l_partkey": pa.array(uk >> 20),
                         "l_suppkey": pa.array(uk & ((1 << 20) - 1)),
                         "qty": pa.array(s)})

    def _group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return pa.table({"l_partkey": pa.array([], type=pa.int64()),
                             "l_suppkey": pa.array([], type=pa.int64()),
                             "qty": pa.array([], type=pa.int64()),
                             "total_qty": pa.array([], type=pa.int64())})
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        q = np.asarray(t.column("qty"), dtype=np.int64)
        # combine per-batch partials to (part, supp), then part totals
        key = _pack20(pk, sk)
        uk, inv = np.unique(key, return_inverse=True)
        qs = ibincount(inv, weights=q.astype(np.float64)).astype(
            np.int64)
        upk = uk >> 20
        up, pinv = np.unique(upk, return_inverse=True)
        tot = ibincount(pinv, weights=qs.astype(np.float64)).astype(
            np.int64)
        keep = 2 * qs > tot[pinv]
        return pa.table({"l_partkey": pa.array(upk[keep]),
                         "l_suppkey": pa.array((uk & ((1 << 20) - 1))[keep]),
                         "qty": pa.array(qs[keep]),
                         "total_qty": pa.array(tot[pinv][keep])})

    parts = li.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True)
    return group_apply_tasks(parts, ["l_partkey"], _group)


BLOOM_M = 1 << 14  # bits
BLOOM_K = 4        # hash functions: 14-bit slices of md5-low-64
BLOOM_SEG = "BUILDING"


def q_bloom_probe(sf_dir: str):
    """Deterministic Bloom-filter membership sketch: a BLOOM_M-bit /
    BLOOM_K-hash filter built over one segment's customer keys
    (per-batch partial bitsets OR-combined — the broadcast artifact is
    the 2 KiB bitset, never the key set), probed by every order. Bits
    j = (md5_low64(key) >> 14j) & (2^14-1), DuckDB-reproducible.
    Output: probes / bloom-positives / true members (false-positive
    rate left rational)."""
    import ray

    from ..functions.text import md5_lower64

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == BLOOM_SEG,
    )

    def _bits_of(keys: np.ndarray) -> np.ndarray:
        h = np.fromiter((md5_lower64(str(int(k))) for k in keys),
                        dtype=np.uint64, count=len(keys))
        return np.stack([(h >> np.uint64(14 * j))
                         & np.uint64(BLOOM_M - 1)
                         for j in range(BLOOM_K)], axis=1).astype(np.int64)

    def _build(b: pa.Table) -> pa.Table:
        keys = np.unique(np.asarray(b.column("c_custkey"),
                                    dtype=np.int64))
        bits = np.zeros(BLOOM_M, dtype=bool)
        if len(keys):
            bits[_bits_of(keys).ravel()] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          type=pa.binary())})

    parts = cust.map_batches(_build, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    bitset = np.zeros(BLOOM_M, dtype=bool)
    for p in parts:
        bitset |= np.unpackbits(
            np.frombuffer(p["bits"], dtype=np.uint8)).astype(bool)
    bits_ref = ray.put(bitset)
    # exact membership side (bounded here; the scale path is the
    # existing co-partitioned semi-join — see q_tpch_q22)
    keys = cust.take_all()
    key_arr = np.sort(np.array([r["c_custkey"] for r in keys],
                               dtype=np.int64))
    keys_ref = ray.put(key_arr)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def _probe(b: pa.Table, *, _bref=bits_ref, _kref=keys_ref) -> pa.Table:
        bits = _bref if isinstance(_bref, np.ndarray) else ray.get(_bref)
        karr = _kref if isinstance(_kref, np.ndarray) else ray.get(_kref)
        ck = np.asarray(b.column("o_custkey"), dtype=np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        pos_u = bits[_bits_of(uk)].all(axis=1)
        true_u = np.zeros(len(uk), dtype=bool)
        if len(karr):
            p = np.searchsorted(karr, uk)
            p[p >= len(karr)] = len(karr) - 1
            true_u = karr[p] == uk
        return pa.table({
            "n_orders": pa.array([b.num_rows], type=pa.int64()),
            "n_pos": pa.array([int(pos_u[inv].sum())], type=pa.int64()),
            "n_true": pa.array([int(true_u[inv].sum())],
                               type=pa.int64()),
        })

    parts = orders.map_batches(_probe, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    return pa.table({
        "n_orders": pa.array([sum(p["n_orders"] for p in parts)],
                             type=pa.int64()),
        "n_pos": pa.array([sum(p["n_pos"] for p in parts)],
                          type=pa.int64()),
        "n_true": pa.array([sum(p["n_true"] for p in parts)],
                           type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 19: bipartite projection, priority sampling, TPC-H Q21,
# double-sweep BFS, positional token search
# ---------------------------------------------------------------------------


def q_bipartite_proj(sf_dir: str):
    """Bipartite projection of the (user, event_type) incidence onto
    event types: for every type pair, the number of distinct users with
    both — the co-occurrence graph build (user-movie / doc-term
    projection class). Per-batch distinct pairs -> one user shuffle ->
    per-user pair expansion (type sets are bounded) with bounded
    (type, type) counts per partition; driver combines <= types^2
    rows."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def _dedup(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("user_id"), dtype=np.int64)
        t = np.asarray(b.column("event_type")).astype(str)
        key = np.char.add(np.char.add(u.astype(str), "\x1f"), t)
        _, idx = np.unique(key, return_index=True)
        return pa.table({"user_id": pa.array(u[idx]),
                         "event_type": pa.array(t[idx].tolist(),
                                                type=pa.string())})

    pairs = ev.map_batches(_dedup, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _proj(t: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.array([], type=pa.string()),
                          "t2": pa.array([], type=pa.string()),
                          "users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        ty = np.asarray(t.column("event_type")).astype(str)
        key = np.char.add(np.char.add(u.astype(str), "\x1f"), ty)
        _, idx = np.unique(key, return_index=True)  # cross-batch dedup
        u, ty = u[idx], ty[idx]
        ut, tcode = np.unique(ty, return_inverse=True)
        order = np.lexsort((tcode, u))
        u, tc = u[order], tcode[order]
        starts = np.nonzero(np.concatenate(
            ([True], u[1:] != u[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(u)]))
        cnt: dict[tuple, int] = {}
        for s, e in zip(starts, ends):
            row = tc[s:e]
            for i in range(len(row)):
                for j in range(i + 1, len(row)):
                    k = (row[i], row[j])
                    cnt[k] = cnt.get(k, 0) + 1
        if not cnt:
            return empty
        ks = sorted(cnt)
        return pa.table({
            "t1": pa.array([ut[a] for a, _ in ks], type=pa.string()),
            "t2": pa.array([ut[b] for _, b in ks], type=pa.string()),
            "users": pa.array([cnt[k] for k in ks], type=pa.int64()),
        })

    parts = group_apply_tasks(pairs, ["user_id"], _proj).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["t1"], p["t2"])
        agg[k] = agg.get(k, 0) + p["users"]
    ks = sorted(agg)
    return pa.table({
        "t1": pa.array([k[0] for k in ks], type=pa.string()),
        "t2": pa.array([k[1] for k in ks], type=pa.string()),
        "users": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


PS_K = 5


def q_priority_sample(sf_dir: str):
    """Deterministic uniform sample WITHOUT replacement, PS_K docs per
    language: priority = md5-low-63 of the doc id, keep the K smallest
    (priority, doc_id) per group — the distributed order-invariant
    sampling primitive (each batch keeps its local top-K, partials
    combine exactly). DuckDB-reproducible priorities."""
    import ray

    from ..functions.text import md5_lower64

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        lng = np.asarray(b.column("lang")).astype(str)
        prio = np.fromiter(
            (md5_lower64(str(int(i))) & ((1 << 63) - 1) for i in ids),
            dtype=np.int64, count=len(ids))
        keep = np.zeros(len(ids), dtype=bool)
        order = np.lexsort((ids, prio, lng))
        lx = lng[order]
        pos_in_group = np.arange(len(lx))
        if len(lx):
            starts = np.concatenate(
                ([0], np.nonzero(lx[1:] != lx[:-1])[0] + 1))
            grp = np.searchsorted(starts, pos_in_group, side="right") - 1
            keep[order[pos_in_group - starts[grp] < PS_K]] = True
        return pa.table({"lang": pa.array(lng[keep].tolist(),
                                          type=pa.string()),
                         "doc_id": pa.array(ids[keep]),
                         "prio": pa.array(prio[keep])})

    parts = docs.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    rows = sorted(((p["lang"], p["prio"], p["doc_id"]) for p in parts))
    out: list[tuple] = []
    seen: dict[str, int] = {}
    for lang, prio, did in rows:
        c = seen.get(lang, 0)
        if c < PS_K:
            seen[lang] = c + 1
            out.append((lang, did, prio))
    return pa.table({
        "lang": pa.array([r[0] for r in out], type=pa.string()),
        "doc_id": pa.array([r[1] for r in out], type=pa.int64()),
        "prio": pa.array([r[2] for r in out], type=pa.int64()),
    })


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21-style blame analysis: on finished multi-supplier
    orders, the supplier who was the ONLY one with a returned ('R')
    line — the EXISTS(other supplier) AND NOT EXISTS(other R supplier)
    pair as one vectorized whole-group kernel per order inside the
    co-partitioned lineitem |><| orders join; per-supplier counts
    combine driver-side (bounded by the supplier dimension)."""
    import ray

    from ..core.shuffle import hash_join_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )

    def _post(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], type=pa.int64()),
                          "numwait": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return empty
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        isr = np.asarray(t.column("l_returnflag")).astype(str) == "R"
        # distinct (order, supplier) and (order, R-supplier) pairs
        pair = _pack20(ok, sk)
        up = np.unique(pair)
        uo = up >> 20
        ns = np.bincount(np.unique(uo, return_inverse=True)[1])
        upr = np.unique(pair[isr])
        uor = upr >> 20
        ords, oinv = np.unique(uo, return_inverse=True)
        nr = np.zeros(len(ords), dtype=np.int64)
        ridx = np.searchsorted(ords, uor)
        np.add.at(nr, ridx, 1)
        # blamed orders: >=2 distinct suppliers, exactly one R supplier
        blamed = (ns >= 2) & (nr == 1)
        if not blamed.any():
            return empty
        bo = ords[blamed]
        # the single R supplier of each blamed order
        sel = np.isin(uor, bo)
        bsupp = (upr & ((1 << 20) - 1))[sel]
        us, cnt = np.unique(bsupp, return_counts=True)
        return pa.table({"l_suppkey": pa.array(us),
                         "numwait": pa.array(cnt.astype(np.int64))})

    parts = hash_join_tasks(li, orders, on="l_orderkey",
                            right_on="o_orderkey", post=_post).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["l_suppkey"]] = agg.get(p["l_suppkey"], 0) + p["numwait"]
    ks = sorted(agg)
    return pa.table({
        "l_suppkey": pa.array(ks, type=pa.int64()),
        "numwait": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_double_sweep(sf_dir: str):
    """Double-sweep diameter lower bound: BFS from m_0, re-root at the
    farthest reached vertex (tie -> smallest id), BFS again; report the
    second root, its eccentricity and reach (both sweeps truncated at
    BFS_ITERS rounds, matching the unrolled SQL twin). The adaptive
    re-seeding composition the iFUB/diameter estimators build on."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    root = ctx.lookup_id("m_0")
    d1 = alg.min_plus_distances(eng, root, iters=BFS_ITERS)
    fin = np.isfinite(d1)
    # farthest reached, ties to the smallest vertex id
    cand = np.nonzero(fin & (d1 == d1[fin].max()))[0]
    root2 = int(cand.min())
    d2 = alg.min_plus_distances(eng, root2, iters=BFS_ITERS)
    fin2 = np.isfinite(d2)
    return pa.table({
        "label": pa.array(ctx.gather_labels(np.array([root2])).tolist(),
                          type=pa.string()),
        "ecc": pa.array([int(d2[fin2].max())], type=pa.int64()),
        "reached": pa.array([int(fin2.sum())], type=pa.int64()),
    })


POS_TOKEN = "data"


def q_token_pos(sf_dir: str):
    """Positional token search: the 1-based index of the first
    occurrence of POS_TOKEN in each document's whitespace token stream
    (docs without it drop out) — the concordance / KWIC primitive, one
    streaming Arrow pass (split -> flatten + parent indices -> masked
    group-min), no shuffle."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _pos(b: pa.Table) -> pa.Table:
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        parent = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        idx_in_doc = np.arange(len(flat)) - offs[parent]
        hit = flat == POS_TOKEN
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        if not hit.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        hp, hi = parent[hit], idx_in_doc[hit]
        # first occurrence per parent: hits are in document order
        firsts = np.ones(len(hp), dtype=bool)
        firsts[1:] = hp[1:] != hp[:-1]
        return pa.table({
            "doc_id": pa.array(ids[hp[firsts]]),
            "pos": pa.array(hi[firsts] + 1),
        })

    return docs.map_batches(_pos, batch_format="pyarrow",
                            zero_copy_batch=True)


# ---------------------------------------------------------------------------
# wave 20: bipartiteness check, bond percolation CC, Kronecker product,
# max drawdown, time-decayed counters
# ---------------------------------------------------------------------------


def q_bipartite_check(sf_dir: str):
    """Bipartiteness test of m_0's BFS-reached subgraph: 2-color by BFS
    parity, count odd (same-parity) edges among distinct undirected
    reached edges. One BFS + one streaming edge pass with the parity
    vector broadcast (`ray.put` once); output
    (reached, odd_edges, is_bipartite)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    root = ctx.lookup_id("m_0")
    d = alg.min_plus_distances(eng, root, iters=BFS_ITERS)
    fin = np.isfinite(d)
    par = np.where(fin, d.astype(np.int64) % 2, -1).astype(np.int8)
    pref = ray.put(par)

    def _odd(b: pa.Table, *, _ref=pref) -> pa.Table:
        p = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(b.column("src"), dtype=np.int64)
        dst = np.asarray(b.column("dst"), dtype=np.int64)
        keep = (src != dst) & (p[src] >= 0) & (p[dst] >= 0)
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        e = np.unique(u << 32 | v)
        eu, ev = e >> 32, e & ((1 << 32) - 1)
        odd = pa.table({"k": pa.array(e[p[eu] == p[ev]])})
        return odd

    parts = ctx.edges.map_batches(_odd, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    odd_keys = {p["k"] for p in parts}  # cross-batch dedup (bounded)
    return pa.table({
        "reached": pa.array([int(fin.sum())], type=pa.int64()),
        "odd_edges": pa.array([len(odd_keys)], type=pa.int64()),
        "is_bipartite": pa.array([int(not odd_keys)], type=pa.int64()),
    })


PERC_P = 60  # keep 60% of edges


def q_percolation_cc(sf_dir: str):
    """Bond percolation: keep each distinct edge with the deterministic
    Knuth-hash rule (rate PERC_P%), then CC_ITERS rounds of synchronous
    min-id propagation over the sampled undirected graph; output
    (kept_edges, n_components). The percolation-threshold experiment
    primitive. Per-round movement: per-batch (vertex, min-neighbor)
    partials; the O(n) component vector stays driver-side between
    rounds (FullyDistVec analog, the `scc`/Boruvka discipline)."""
    from ..core.shuffle import group_reduce_per_key

    ctx = get_context(sf_dir)
    n = ctx.n

    def _s(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("src"), dtype=np.int64)
        dst = np.asarray(batch.column("dst"), dtype=np.int64)
        keep = src != dst
        key = src[keep] * np.int64(n) + dst[keep]
        h = ((key % (1 << 20)) * np.int64(2654435761)
             + key // (1 << 20)) % np.int64(1 << 32)
        ok = h % 100 < PERC_P
        u = np.unique(key[ok])
        return pa.table({"src": pa.array(u // n), "dst": pa.array(u % n)})

    sampled = ctx.edges.map_batches(
        _s, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _kept(b: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(b.column("src"), dtype=np.int64)
                      * n + np.asarray(b.column("dst"), dtype=np.int64))
        return pa.table({"k": pa.array(k)})

    kept = len({k["k"] for k in sampled.map_batches(
        _kept, batch_format="pyarrow", zero_copy_batch=True).take_all()})

    comp = np.arange(n, dtype=np.int64)
    import ray

    for _ in range(CC_ITERS):
        cref = ray.put(comp)

        def _round(b: pa.Table, *, _ref=cref) -> pa.Table:
            c = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            src = np.asarray(b.column("src"), dtype=np.int64)
            dst = np.asarray(b.column("dst"), dtype=np.int64)
            v = np.concatenate([dst, src])
            m = np.concatenate([c[src], c[dst]])
            uk, mn = group_reduce_per_key(m.astype(np.float64), v, "min")
            return pa.table({"v": pa.array(uk),
                             "m": pa.array(mn.astype(np.int64))})

        parts = sampled.map_batches(_round, batch_format="pyarrow",
                                    zero_copy_batch=True).take_all()
        new = comp.copy()
        if parts:
            vv = np.fromiter((p["v"] for p in parts), np.int64,
                             len(parts))
            mm = np.fromiter((p["m"] for p in parts), np.int64,
                             len(parts))
            np.minimum.at(new, vv, mm)
        if np.array_equal(new, comp):
            break
        comp = new

    return pa.table({
        "kept_edges": pa.array([kept], type=pa.int64()),
        "n_components": pa.array([len(np.unique(comp))],
                                 type=pa.int64()),
    })


KRON_B = tuple((p, q, p + q + 1) for p in range(5) for q in range(5)
               if (2 * p + 3 * q) % 5 == 0)


def q_kron_product(sf_dir: str):
    """Kronecker graph product A (x) B: A = the full dedup-summed edge
    table, B = a fixed 5-vertex stencil broadcast into every task —
    the Graph500/R-MAT generator's algebraic core (big x small kron,
    `GenGraph500Data` builds exactly this product implicitly). Kron
    vertex (i, p) -> i*5 + p, weight = w_a * w_b. One partial-sum pass
    + one keyed merge; the expansion is a vectorized tile inside the
    merge task, so output rows never concentrate."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    ctx = get_context(sf_dir)
    n = ctx.n

    def _part(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("src"), dtype=np.int64)
        dst = np.asarray(b.column("dst"), dtype=np.int64)
        w = np.asarray(b.column("w"))
        key = src * np.int64(n) + dst
        uk, s = group_sum_per_key(w.astype(np.float64), key)
        return pa.table({"k": pa.array(uk), "w": pa.array(s)})

    bp = np.array([b[0] for b in KRON_B], dtype=np.int64)
    bq = np.array([b[1] for b in KRON_B], dtype=np.int64)
    bw = np.array([b[2] for b in KRON_B], dtype=np.int64)

    def _kron(t: pa.Table) -> pa.Table:
        empty = pa.table({"ksrc": pa.array([], type=pa.int64()),
                          "kdst": pa.array([], type=pa.int64()),
                          "w": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "k" not in t.column_names:
            return empty
        uk, s = group_sum_per_key(
            np.asarray(t.column("w"), dtype=np.float64),
            np.asarray(t.column("k"), dtype=np.int64))
        wa = s.astype(np.int64)
        asrc, adst = uk // n, uk % n
        nb = len(bp)
        ksrc = np.repeat(asrc, nb) * 5 + np.tile(bp, len(asrc))
        kdst = np.repeat(adst, nb) * 5 + np.tile(bq, len(adst))
        w = np.repeat(wa, nb) * np.tile(bw, len(wa))
        return pa.table({"ksrc": pa.array(ksrc), "kdst": pa.array(kdst),
                         "w": pa.array(w)})

    parts = ctx.edges.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return group_apply_tasks(parts, ["k"], _kron)


def q_max_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the running value balance (cents):
    max over time of (prefix-peak - running total) — the
    cummax-over-cumsum window composite. One user shuffle; segmented
    cumsum/cummax run vectorized over the whole partition (the cummax
    segment reset rides an offset channel, exact in int64)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def _dd(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "max_drawdown": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, cents = uid[order], cents[order]
        starts = np.nonzero(np.concatenate(
            ([True], uid[1:] != uid[:-1])))[0]
        seg = np.cumsum(np.concatenate(
            ([False], uid[1:] != uid[:-1]))).astype(np.int64)
        cum = np.cumsum(cents)
        cum -= np.repeat(cum[starts] - cents[starts], np.diff(
            np.concatenate((starts, [len(uid)]))))
        # segment cummax: add a per-segment offset that dominates the
        # value range, accumulate, remove (exact: |cum| < 2^44,
        # seg < 2^17 per partition)
        off = seg << 45
        peak = np.maximum.accumulate(cum + off) - off
        dd = peak - cum
        uu = uid[starts]
        mdd = np.maximum.reduceat(dd, starts)
        return pa.table({"user_id": pa.array(uu),
                         "max_drawdown": pa.array(mdd)})

    return group_apply_tasks(ev, ["user_id"], _dd)


DECAY_US = 4 * 86_400_000_000  # half-life bucket: 4 days
DECAY_REF = "2024-01-31 00:00:00"


def q_decayed_counts(sf_dir: str):
    """Time-decayed counters per event type: each event contributes
    cents >> age, age = whole 4-day periods before DECAY_REF — the
    exponential-decay sketch with exact dyadic arithmetic (bit shift on
    both sides). Shuffle-free bounded partials + raw sums alongside."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    ref_us = np.datetime64(DECAY_REF, "us").astype(np.int64)

    def _part(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        age = np.clip((ref_us - t) // DECAY_US, 0, 62)
        cents = np.floor(np.asarray(b.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        dec = cents >> age
        et = np.asarray(b.column("event_type")).astype(str)
        ue, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(ue.tolist(), type=pa.string()),
            "decayed": pa.array(ibincount(
                inv, weights=dec.astype(np.float64)).astype(np.int64)),
            "raw": pa.array(ibincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64)),
        })

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["event_type"], [0, 0])
        e[0] += p["decayed"]
        e[1] += p["raw"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "decayed": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "raw": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 21: PQ codes, KWIC extraction, running distinct, GF(2) parity
# reach, weighted triangle strength
# ---------------------------------------------------------------------------

PQ_NSEED = 4   # centroids per subspace = quantized seed vectors 0..3
PQ_SUB = 8     # subspaces of 8 dims each (64-dim embeddings)


def q_pq_codes(sf_dir: str):
    """Product-quantization codes: each embedding split into PQ_SUB
    8-dim subvectors, each assigned to the nearest of PQ_NSEED fixed
    integer centroids (the quantized seed vectors — `range_search`'s
    quantization q = floor((x+0.5)*2^20), exact on both sides; ties ->
    lowest centroid). The vector-compression primitive behind IVF-PQ
    ANN. Centroid matrix broadcast once; one batched einsum per
    batch."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    seed_t = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < PQ_NSEED,
    ).sort("vec_id").take_batch(PQ_NSEED, batch_format="pyarrow")
    _, cmat = _km_quant(pa.table(seed_t))  # (4, 64) int64
    cref = ray.put(cmat)

    def _codes(t: pa.Table, *, _ref=cref) -> pa.Table:
        C = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        ids, Q = _km_quant(t)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64()),
                             "code": pa.array([], type=pa.int64())})
        d = Q.shape[1] // PQ_SUB
        Qs = Q.reshape(len(ids), PQ_SUB, d)          # (B, S, d)
        Cs = C.reshape(PQ_NSEED, PQ_SUB, d)          # (K, S, d)
        diff = Qs[:, None, :, :] - Cs[None, :, :, :]  # (B, K, S, d)
        d2 = (diff * diff).sum(axis=3)               # (B, K, S) int64
        code = d2.argmin(axis=1)                     # ties -> lowest K
        B = len(ids)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, PQ_SUB)),
            "s": pa.array(np.tile(np.arange(PQ_SUB, dtype=np.int64), B)),
            "code": pa.array(code.reshape(B * PQ_SUB)),
        })

    return emb.map_batches(_codes, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_kwic(sf_dir: str):
    """Keyword-in-context extraction: the 3-token window (previous,
    match, next — clamped at document edges) around the FIRST
    occurrence of POS_TOKEN per document. token_pos's sibling with
    string assembly; hits are <= 1/doc so the per-hit join loop is
    bounded."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _kwic(b: pa.Table) -> pa.Table:
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        parent = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        idx = np.arange(len(flat)) - offs[parent]
        hit = flat == POS_TOKEN
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        if not hit.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "ctx3": pa.array([], type=pa.string())})
        hp, hi = parent[hit], idx[hit]
        firsts = np.ones(len(hp), dtype=bool)
        firsts[1:] = hp[1:] != hp[:-1]
        hp, hi = hp[firsts], hi[firsts]
        ntok = offs[hp + 1] - offs[hp]
        lo = np.maximum(hi - 1, 0) + offs[hp]
        hi_ex = np.minimum(hi + 2, ntok) + offs[hp]
        ctx = [" ".join(flat[a:z]) for a, z in zip(lo, hi_ex)]
        return pa.table({"doc_id": pa.array(ids[hp]),
                         "ctx3": pa.array(ctx, type=pa.string())})

    return docs.map_batches(_kwic, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_running_distinct(sf_dir: str):
    """Per-event running count of DISTINCT event types the user has
    produced so far (inclusive; order ts, event_id) — the cumulative
    cardinality window, which SQL can only express via a
    first-occurrence flag + running sum. One user shuffle; the
    first-occurrence marking and segmented cumsum run vectorized over
    the whole partition."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def _run(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "run_distinct": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        _, tcode = np.unique(np.asarray(t.column("event_type"))
                             .astype(str), return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s, c_s, e_s = uid[order], ts[order], tcode[order], \
            eid[order]
        # first occurrence of (user, type) in time order: sort by
        # (user, type, ts, eid), mark group heads, scatter back
        o2 = np.lexsort((e_s, t_s, c_s, u_s))
        head = np.ones(len(o2), dtype=bool)
        head[1:] = (u_s[o2][1:] != u_s[o2][:-1]) | \
                   (c_s[o2][1:] != c_s[o2][:-1])
        first = np.zeros(len(o2), dtype=np.int64)
        first[o2] = head.astype(np.int64)
        # segmented running sum over the time order
        seg_start = np.concatenate(([True], u_s[1:] != u_s[:-1]))
        cum = np.cumsum(first)
        starts = np.nonzero(seg_start)[0]
        base = np.repeat(cum[starts] - first[starts],
                         np.diff(np.concatenate((starts, [len(u_s)]))))
        return pa.table({"event_id": pa.array(e_s),
                         "run_distinct": pa.array(cum - base)})

    return group_apply_tasks(ev, ["user_id"], _run)


def q_reach2_parity(sf_dir: str):
    """GF(2) 2-hop reachability: ordered vertex pairs (i, j) with an
    ODD number of length-2 directed paths — A^2 over the xor-and
    semiring (`lxor` add), the Operations.h bitwise-catalog tail
    exercised end-to-end through the raw-task SpGEMM."""
    from ..core import spgemm as SG

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum().cast_bool()
    deg = ctx.engine("directed").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    two = SG.spgemm_tasks(g.edges, g.edges, ctx.n, add="lxor",
                          num_partitions=gp)

    dec = ctx.decoder()

    def _odd(t: pa.Table, *, _d=dec) -> pa.Table:
        empty = pa.table({"src_label": pa.array([], type=pa.string()),
                          "dst_label": pa.array([], type=pa.string())})
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty
        w = np.asarray(t.column("w"))
        keep = w % 2 == 1
        if not keep.any():
            return empty
        return pa.table({
            "src_label": _d.take(
                np.asarray(t.column("src"), dtype=np.int64)[keep]),
            "dst_label": _d.take(
                np.asarray(t.column("dst"), dtype=np.int64)[keep]),
        })

    return two.map_batches(_odd, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_triangle_strength(sf_dir: str):
    """Weighted triangle aggregate: sum over all triangles a < b < c of
    min(w_ab, w_bc, w_ca) on canonical undirected dedup-summed weights
    — the enumeration plan of `triangles_list` carrying weight
    channels, with the min-over-cycle fused into the closing join.
    One-row output (n_triangles, strength)."""
    import ray

    from ..core.shuffle import group_sum_per_key, hash_join_tasks

    ctx = get_context(sf_dir)
    n = ctx.n
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))

    def _canon(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        w = np.asarray(b.column("w")).astype(np.float64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        c = np.maximum(s[keep], d[keep])
        uk, ws = group_sum_per_key(w[keep], a * n + c)
        return pa.table({"a": pa.array(uk // n), "b": pa.array(uk % n),
                         "w": pa.array(ws)})

    from ..core.shuffle import group_apply_tasks

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        uk, ws = group_sum_per_key(
            np.asarray(t.column("w"), dtype=np.float64),
            np.asarray(t.column("a"), dtype=np.int64) * n
            + np.asarray(t.column("b"), dtype=np.int64))
        return pa.table({"a": pa.array(uk // n), "b": pa.array(uk % n),
                         "w": pa.array(ws.astype(np.int64))})

    uw = group_apply_tasks(
        ctx.edges.map_batches(_canon, batch_format="pyarrow",
                              zero_copy_batch=True),
        ["a", "b"], _merge).materialize()

    left = uw.map_batches(
        lambda t: pa.table({"a": t.column("a"), "m": t.column("b"),
                            "wab": t.column("w")}),
        batch_format="pyarrow")
    right = uw.map_batches(
        lambda t: pa.table({"m": t.column("a"), "c": t.column("b"),
                            "wbc": t.column("w")}),
        batch_format="pyarrow")
    wedges = hash_join_tasks(left, right, on="m", num_partitions=gp)
    closing = uw.map_batches(
        lambda t: pa.table({"a": t.column("a"), "c": t.column("b"),
                            "wac": t.column("w")}),
        batch_format="pyarrow")

    def _strength(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "wab" not in t.column_names:
            return pa.table({"nt": pa.array([], type=pa.int64()),
                             "st": pa.array([], type=pa.int64())})
        m = np.minimum(np.minimum(
            np.asarray(t.column("wab"), dtype=np.int64),
            np.asarray(t.column("wbc"), dtype=np.int64)),
            np.asarray(t.column("wac"), dtype=np.int64))
        return pa.table({"nt": pa.array([t.num_rows], type=pa.int64()),
                         "st": pa.array([int(m.sum())], type=pa.int64())})

    parts = hash_join_tasks(
        wedges.map_batches(
            lambda t: t.select(["a", "c", "wab", "wbc"]),
            batch_format="pyarrow"),
        closing, on=["a", "c"], num_partitions=gp,
        post=_strength).take_all()
    return pa.table({
        "n_triangles": pa.array([sum(p["nt"] for p in parts)],
                                type=pa.int64()),
        "strength": pa.array([sum(p["st"] for p in parts)],
                             type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 22: activity streaks, byte audit, directed 3-cycles, repo
# provenance, top-2 share
# ---------------------------------------------------------------------------


def q_max_streak(sf_dir: str):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern: one user shuffle, per-partition distinct
    active days + island detection vectorized (diff over sorted unique
    days; islands split where the gap exceeds 1)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _streak(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "max_streak": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        day = (np.asarray(t.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        key = np.unique(uid << 20 | day)
        u, d = key >> 20, key & ((1 << 20) - 1)
        # island heads: new user or day gap > 1
        head = np.ones(len(u), dtype=bool)
        head[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        isl = np.cumsum(head) - 1
        ln = np.bincount(isl)
        iu = u[head]
        uu, inv = np.unique(iu, return_inverse=True)
        best = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(best, inv, ln)
        return pa.table({"user_id": pa.array(uu),
                         "max_streak": pa.array(best)})

    return group_apply_tasks(ev, ["user_id"], _streak)


def q_byte_stats(sf_dir: str):
    """UTF-8 inflation audit per language: document count, total
    codepoints and total encoded bytes — the encoding-cost profile a
    tokenizer-budget planner needs. Shuffle-free bounded partials on
    Arrow kernels (utf8_length / binary_length)."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        lng = np.asarray(b.column("lang")).astype(str)
        chars = np.asarray(pc.utf8_length(b.column("text")),
                           dtype=np.int64)
        byts = np.asarray(pc.binary_length(b.column("text")),
                          dtype=np.int64)
        ul, inv = np.unique(lng, return_inverse=True)
        return pa.table({
            "lang": pa.array(ul.tolist(), type=pa.string()),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "n_chars": pa.array(ibincount(
                inv, weights=chars.astype(np.float64)).astype(np.int64)),
            "n_bytes": pa.array(ibincount(
                inv, weights=byts.astype(np.float64)).astype(np.int64)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[str, np.ndarray] = {}
    for p in parts:
        v = np.array([p["n_docs"], p["n_chars"], p["n_bytes"]],
                     dtype=np.int64)
        agg[p["lang"]] = agg.get(p["lang"], 0) + v
    ks = sorted(agg)
    return pa.table({
        "lang": pa.array(ks, type=pa.string()),
        "n_docs": pa.array([int(agg[k][0]) for k in ks],
                           type=pa.int64()),
        "n_chars": pa.array([int(agg[k][1]) for k in ks],
                            type=pa.int64()),
        "n_bytes": pa.array([int(agg[k][2]) for k in ks],
                            type=pa.int64()),
    })


def q_cycle3_directed(sf_dir: str):
    """Directed 3-cycle census: trace(A^3) over the loop-free distinct
    directed adjacency = 3x the number of directed 3-cycles. One
    structural raw-task SpGEMM (2-path counts) closed by a
    co-partitioned join against the reversed edge table, count fused
    into the join task."""
    from ..core import spgemm as SG
    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum().cast_bool()
    deg = ctx.engine("directed").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    two = SG.spgemm_tasks(g.edges, g.edges, ctx.n, add="sum",
                          num_partitions=gp)
    rev = g.edges.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src")}),
        batch_format="pyarrow")

    def _close(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table({"c": pa.array([], type=pa.int64())})
        return pa.table({"c": pa.array(
            [int(np.asarray(t.column("w")).sum())], type=pa.int64())})

    parts = hash_join_tasks(two, rev, on=["src", "dst"],
                            num_partitions=gp, post=_close).take_all()
    return pa.table({"closed_walks3": pa.array(
        [sum(p["c"] for p in parts)], type=pa.int64())})


def q_repo_stats(sf_dir: str):
    """Per-repository provenance audit over the flagship corpus table
    (repo, path, commit, lang, content): file count, distinct
    languages, total import statements (vectorized substring count on
    content — the only content scan). Bounded (repo x lang) partials,
    driver combine."""
    from ..sources import corpus as C

    n = C.n_files_for(sf_dir)
    ds = C.corpus_dataset(n)

    def _part(b: pa.Table) -> pa.Table:
        repo = np.asarray(b.column("repo")).astype(str)
        lang = np.asarray(b.column("lang")).astype(str)
        imps = np.asarray(pc.count_substring(b.column("content"),
                                             "import m_"),
                          dtype=np.int64)
        key = np.char.add(np.char.add(repo, "\x1f"), lang)
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "repo": pa.array([k.split("\x1f")[0] for k in uk],
                             type=pa.string()),
            "lang": pa.array([k.split("\x1f")[1] for k in uk],
                             type=pa.string()),
            "files": pa.array(np.bincount(inv).astype(np.int64)),
            "imports": pa.array(ibincount(
                inv, weights=imps.astype(np.float64)).astype(np.int64)),
        })

    parts = ds.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        e = agg.setdefault((p["repo"], p["lang"]), [0, 0])
        e[0] += p["files"]
        e[1] += p["imports"]
    per_repo: dict[str, list[int]] = {}
    langs: dict[str, set] = {}
    for (repo, lang), (f, im) in agg.items():
        e = per_repo.setdefault(repo, [0, 0])
        e[0] += f
        e[1] += im
        langs.setdefault(repo, set()).add(lang)
    ks = sorted(per_repo)
    return pa.table({
        "repo": pa.array(ks, type=pa.string()),
        "n_files": pa.array([per_repo[k][0] for k in ks],
                            type=pa.int64()),
        "n_langs": pa.array([len(langs[k]) for k in ks],
                            type=pa.int64()),
        "n_imports": pa.array([per_repo[k][1] for k in ks],
                              type=pa.int64()),
    })


TOP2_K = 2


def q_top2_share(sf_dir: str):
    """Top-2 users by spend per event type with the type total alongside
    (share left rational) — top-k per group AFTER aggregation: pair
    totals in one (type, user) co-partitioned shuffle, per-partition
    top-k partials (exact: a pair's total is complete in its
    partition), bounded driver cut."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"],
    )

    def _pair(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type")).astype(str)
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        cents = np.floor(np.asarray(b.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), uid.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        s = ibincount(inv, weights=cents.astype(np.float64)).astype(
            np.int64)
        return pa.table({
            "event_type": pa.array([k.split("\x1f")[0] for k in uk],
                                   type=pa.string()),
            "user_id": pa.array([int(k.split("\x1f")[1]) for k in uk],
                                type=pa.int64()),
            "uc": pa.array(s),
        })

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "user_id": pa.array([], type=pa.int64()),
                             "uc": pa.array([], type=pa.int64()),
                             "tc_part": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        uc = np.asarray(t.column("uc"), dtype=np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), uid.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        s = ibincount(inv, weights=uc.astype(np.float64)).astype(
            np.int64)
        pe = np.array([k.split("\x1f")[0] for k in uk])
        pu = np.array([int(k.split("\x1f")[1]) for k in uk],
                      dtype=np.int64)
        # per-type partial: top-k pairs (tc_part = 0) + ONE marker row
        # per type carrying this partition's type sum (user_id = -1) —
        # markers sum to the exact type total across partitions
        order = np.lexsort((pu, -s, pe))
        pe_s = pe[order]
        head = np.ones(len(pe_s), dtype=bool)
        head[1:] = pe_s[1:] != pe_s[:-1]
        grp = np.cumsum(head) - 1
        starts = np.nonzero(head)[0]
        rank = np.arange(len(pe_s)) - starts[grp]
        keep = rank < TOP2_K
        ue, einv = np.unique(pe, return_inverse=True)
        tsum = ibincount(einv, weights=s.astype(np.float64)).astype(
            np.int64)
        return pa.table({
            "event_type": pa.array(pe_s[keep].tolist() + ue.tolist(),
                                   type=pa.string()),
            "user_id": pa.array(np.concatenate(
                [pu[order][keep], np.full(len(ue), -1, np.int64)])),
            "uc": pa.array(np.concatenate(
                [s[order][keep], np.zeros(len(ue), np.int64)])),
            "tc_part": pa.array(np.concatenate(
                [np.zeros(int(keep.sum()), np.int64), tsum])),
        })

    parts = group_apply_tasks(
        ev.map_batches(_pair, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type", "user_id"], _merge).take_all()
    by_type: dict[str, list] = {}
    totals: dict[str, int] = {}
    for p in parts:
        if p["user_id"] < 0:
            totals[p["event_type"]] = totals.get(p["event_type"], 0) \
                + p["tc_part"]
        else:
            by_type.setdefault(p["event_type"], []).append(
                (-p["uc"], p["user_id"]))
    rows = []
    for et, cand in sorted(by_type.items()):
        cand.sort()
        for r, (nuc, uid) in enumerate(cand[:TOP2_K], start=1):
            rows.append((et, r, uid, -nuc, totals[et]))
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], type=pa.string()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "user_cents": pa.array([r[3] for r in rows], type=pa.int64()),
        "type_cents": pa.array([r[4] for r in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 23: co-citation, similarity histogram, Markov transitions,
# exact MAD, degree quantiles
# ---------------------------------------------------------------------------

COCIT_TOPK = 50
COCIT_MIN = 2


def q_cocitation_topk(sf_dir: str):
    """Co-citation strength: vertex pairs (i < j) sharing in-neighbors,
    count = |common in-neighbors| — A^T A through the raw-task SpGEMM
    (the transpose-times-self shape; bibliographic-coupling twin of the
    wedge A A^T). Threshold + global top-k by (cnt DESC, i, j)."""
    from ..core import spgemm as SG

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum().cast_bool()
    deg = ctx.engine("directed").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    rev = g.edges.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src"),
                            "w": t.column("w")}),
        batch_format="pyarrow")
    ata = SG.spgemm_tasks(rev, g.edges, ctx.n, add="sum",
                          num_partitions=gp)

    def _cut(t: pa.Table) -> pa.Table:
        empty = pa.table({"i": pa.array([], type=pa.int64()),
                          "j": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty
        i = np.asarray(t.column("src"), dtype=np.int64)
        j = np.asarray(t.column("dst"), dtype=np.int64)
        w = np.asarray(t.column("w")).astype(np.int64)
        keep = (i < j) & (w >= COCIT_MIN)
        return pa.table({"i": pa.array(i[keep]), "j": pa.array(j[keep]),
                         "cnt": pa.array(w[keep])})

    top = (ata.map_batches(_cut, batch_format="pyarrow",
                           zero_copy_batch=True)
           .sort(["cnt", "i", "j"], descending=[True, False, False])
           .limit(COCIT_TOPK).take_all())
    return pa.table({
        "a": pa.array(
            ctx.gather_labels(np.array([r["i"] for r in top], dtype=np.int64)),
            type=pa.string()),
        "b": pa.array(
            ctx.gather_labels(np.array([r["j"] for r in top], dtype=np.int64)),
            type=pa.string()),
        "cnt": pa.array([r["cnt"] for r in top], type=pa.int64()),
    })


SIMH_N = 128
SIMH_SHIFT = 40


def q_sim_hist(sf_dir: str):
    """Pairwise-similarity histogram over the first SIMH_N embeddings:
    exact integer dot products (kmeans quantization) bucketed by
    >> SIMH_SHIFT, counted over unordered pairs i < j — the similarity
    -distribution audit behind dedup-threshold tuning. Query matrix
    broadcast once; per-batch partial histograms."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < SIMH_N,
    )
    all_t = emb.sort("vec_id").take_batch(SIMH_N, batch_format="pyarrow")
    aids, amat = _km_quant(pa.table(all_t))
    aref = ray.put((aids, amat))

    def _hist(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        d = Q @ am.T  # (batch, SIMH_N) exact int64
        mask = ids[:, None] < ai[None, :]
        b = (d[mask] >> SIMH_SHIFT)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = emb.map_batches(_hist, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["bucket"]] = agg.get(p["bucket"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "bucket": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_transition_counts(sf_dir: str):
    """Event-type Markov transition counts: consecutive (by ts,
    event_id) event-type pairs per user, summed globally — the
    transition-matrix estimator. One user shuffle, vectorized shifted
    compare, bounded (types^2) output."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def _trans(t: pa.Table) -> pa.Table:
        empty = pa.table({"from_type": pa.array([], type=pa.string()),
                          "to_type": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        ut, tcode = np.unique(np.asarray(t.column("event_type"))
                              .astype(str), return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u_s, c_s = uid[order], tcode[order]
        same = u_s[1:] == u_s[:-1]
        frm, to = c_s[:-1][same], c_s[1:][same]
        if not len(frm):
            return empty
        key = frm * len(ut) + to
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "from_type": pa.array(ut[uk // len(ut)].tolist(),
                                  type=pa.string()),
            "to_type": pa.array(ut[uk % len(ut)].tolist(),
                                type=pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    parts = group_apply_tasks(ev, ["user_id"], _trans).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["from_type"], p["to_type"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "from_type": pa.array([k[0] for k in ks], type=pa.string()),
        "to_type": pa.array([k[1] for k in ks], type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_events_mad(sf_dir: str):
    """Exact per-type median absolute deviation (lower median both
    times, integer cents) — the robust-scale statistic; one keyed
    shuffle, whole-group two-phase order statistics vectorized."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _mad(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "med_cents": pa.array([], type=pa.int64()),
                          "mad_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        cents = np.floor(np.asarray(t.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        ue = np.unique(et)
        meds, mads = [], []
        for e in ue:  # groups per partition are bounded (n_types)
            v = np.sort(cents[et == e])
            med = int(v[(len(v) - 1) // 2])
            d = np.sort(np.abs(v - med))
            meds.append(med)
            mads.append(int(d[(len(d) - 1) // 2]))
        return pa.table({
            "event_type": pa.array(ue.tolist(), type=pa.string()),
            "med_cents": pa.array(meds, type=pa.int64()),
            "mad_cents": pa.array(mads, type=pa.int64()),
        })

    return group_apply_tasks(ev, ["event_type"], _mad)


DEGQ = (50, 90, 99)


def q_degree_quantiles(sf_dir: str):
    """Discrete p50/p90/p99 of the out-degree distribution (vertices
    with >= 1 out-edge) — the skew-profile diagnostic feeding partition
    sizing. Degrees from one keyed reduce; the order statistics run in
    one whole-set kernel (rank = ceil(p/100 * n), 1-based)."""
    ctx = get_context(sf_dir)
    deg = ctx.engine("dir_bool").out_weights()  # structural counts
    v = np.sort(deg[deg > 0]).astype(np.int64)
    n = len(v)
    out = []
    for p in DEGQ:
        rank = max(1, -(-p * n // 100))  # ceil
        out.append(int(v[rank - 1]))
    return pa.table({
        "p": pa.array(list(DEGQ), type=pa.int64()),
        "degree": pa.array(out, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 24: interval coverage, forward as-of, reorder gaps, vertex
# cover, greedy k-center
# ---------------------------------------------------------------------------

COV_WIN_US = 30 * 60 * 1_000_000  # 30-minute activity window


def q_interval_coverage(sf_dir: str):
    """Interval-union coverage: total time each user is 'active' when
    every event opens a 30-minute window — the sweep-line union-length
    op (overlaps collapse). One user shuffle; contribution = clip(end -
    max(start, running-max prior end), 0), vectorized with the
    offset-channel segment cummax."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )

    def _cov(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "covered_us": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        e = s + COV_WIN_US
        seg = np.cumsum(np.concatenate(
            ([False], u[1:] != u[:-1]))).astype(np.int64)
        off = seg << 52  # ts fits < 2^51; segment channel dominates
        prev_max = np.empty(len(e), dtype=np.int64)
        acc = np.maximum.accumulate(e + off)
        prev_max[1:] = acc[:-1] - off[1:]
        heads = np.concatenate(([True], u[1:] != u[:-1]))
        prev_max[heads] = -(1 << 62)
        contrib = np.clip(e - np.maximum(s, prev_max), 0, None)
        uu, inv = np.unique(u, return_inverse=True)
        cov = np.bincount(inv, weights=contrib.astype(
            np.float64)).astype(np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "covered_us": pa.array(cov)})

    return group_apply_tasks(ev, ["user_id"], _cov)


FR_FROM, FR_TO = "view", "purchase"


def q_first_response(sf_dir: str):
    """Forward as-of: for every FR_FROM event, the microseconds until
    the user's NEXT FR_TO event (strictly later in (ts, event_id)
    order; views with no later purchase drop out) — asof_click's
    forward twin, one user shuffle + a reverse segmented cummin."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pc.field("event_type").isin([FR_FROM, FR_TO]),
    )

    def _fr(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "wait_us": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        order = np.lexsort((eid, ts, uid))
        u, s, e, k = uid[order], ts[order], eid[order], et[order]
        # sentinel must stay BELOW the 2^52 segment-offset granularity
        # (epoch-us < 2^51 until 2041), or the offset channel cannot
        # dominate and the segmented suffix-min leaks across users
        BIG = np.int64(1 << 51)
        tt = np.where(k == FR_TO, s, BIG)
        # reverse segmented cummin of purchase ts STRICTLY AFTER row i
        seg = np.cumsum(np.concatenate(
            ([False], u[1:] != u[:-1]))).astype(np.int64)
        segr = seg[::-1]
        # suffix min within segments, excluding self: shift by one
        offr = segr << 52
        rmin = np.minimum.accumulate(tt[::-1] + offr)
        nxt = np.full(len(u), BIG)
        nxt[:-1] = (rmin - offr)[::-1][1:]
        tails = np.concatenate((u[1:] != u[:-1], [True]))
        nxt[tails] = BIG
        hit = (k == FR_FROM) & (nxt < BIG)
        return pa.table({"event_id": pa.array(e[hit]),
                         "wait_us": pa.array(nxt[hit] - s[hit])})

    return group_apply_tasks(ev, ["user_id"], _fr)


def q_order_gap_stats(sf_dir: str):
    """Customer reorder-interval sufficient statistics: per customer
    with >= 2 orders, the number of consecutive-order gaps, total and
    max gap in whole days ((ts2-ts1) // 86400s, order by (date, key))
    — the LAG class on the orders table. One custkey shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )

    def _gaps(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], type=pa.int64()),
                          "n_gaps": pa.array([], type=pa.int64()),
                          "sum_days": pa.array([], type=pa.int64()),
                          "max_days": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        od = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").astype(np.int64)
        ok = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        order = np.lexsort((ok, od, ck))
        c, d = ck[order], od[order]
        same = c[1:] == c[:-1]
        gap = (d[1:] - d[:-1]) // 86_400_000_000
        gc, gd = c[1:][same], gap[same]
        if not len(gc):
            return empty
        uu, inv = np.unique(gc, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sm = ibincount(inv, weights=gd.astype(np.float64)).astype(
            np.int64)
        mx = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(mx, inv, gd)
        return pa.table({"o_custkey": pa.array(uu),
                         "n_gaps": pa.array(n),
                         "sum_days": pa.array(sm),
                         "max_days": pa.array(mx)})

    return group_apply_tasks(orders, ["o_custkey"], _gaps)


def q_vertex_cover(sf_dir: str):
    """2-approximate minimum vertex cover: both endpoints of the
    fixed-round maximal matching (`matching_fixed`'s chain) — the
    classic approximation-algorithm composition; maximality makes the
    endpoint set a valid cover."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    prio_refs = _lcg_prio_refs(eng, 23, MIS_PRIO_P, dtype=np.int64)
    m = alg.maximal_matching(eng, prio_full=prio_refs,
                             max_rounds=MATCH_ROUNDS)
    ids = np.nonzero(m >= 0)[0]
    return pa.table({"label": _label_col(ctx, ids)})


KC_K = 6


def q_k_center(sf_dir: str):
    """Greedy farthest-point k-center selection (Gonzalez): start at
    vec 0, then KC_K-1 rounds of argmax over min squared distance to
    the chosen centers (exact int64 on the kmeans quantization; ties ->
    lowest id; chosen vecs excluded) — the coreset/seed-selection
    primitive. Per round: centers broadcast, per-batch (max, argmax)
    partials, bounded driver pick."""
    import ray

    # NOTE: no .materialize() here — a MaterializedDataset surviving the
    # query outlives ray.shutdown() in test teardown and the GC then
    # touches the dead core worker (hard process exit); the per-round
    # re-read is a cheap pruned parquet scan
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    centers = [0]
    for _ in range(KC_K - 1):
        # take_all (complete consumption), NOT take_batch: a limit-
        # truncated dataset leaves a _StatsManager execution entry
        # behind, and its background thread then makes a remote call
        # after ray.shutdown() -> hard process exit (core_worker c++
        # fatal). The filter bounds the read to len(centers) rows.
        rows = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(centers),
        ).take_all()
        rows.sort(key=lambda r: r["vec_id"])
        c_t = pa.table({
            "vec_id": pa.array([r["vec_id"] for r in rows],
                               type=pa.int64()),
            "embedding": pa.array([list(r["embedding"]) for r in rows]),
        })
        _, cmat = _km_quant(c_t)
        cref = ray.put(cmat)
        chosen = np.array(sorted(centers), dtype=np.int64)
        sref = ray.put(chosen)

        def _far(t: pa.Table, *, _c=cref, _s=sref) -> pa.Table:
            C = _c if isinstance(_c, np.ndarray) else ray.get(_c)
            S = _s if isinstance(_s, np.ndarray) else ray.get(_s)
            ids, Q = _km_quant(t)
            if len(ids) == 0:
                return pa.table({"md": pa.array([], type=pa.int64()),
                                 "i": pa.array([], type=pa.int64())})
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            md = d2.min(axis=1)
            pos = np.searchsorted(S, ids)
            pos[pos >= len(S)] = len(S) - 1 if len(S) else 0
            mask = (len(S) > 0) & (S[pos] == ids)
            md[mask] = -1  # exclude already-chosen
            best = np.lexsort((ids, -md))[0]
            return pa.table({"md": pa.array([int(md[best])],
                                            type=pa.int64()),
                             "i": pa.array([int(ids[best])],
                                           type=pa.int64())})

        parts = emb.map_batches(_far, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        best = min((-p["md"], p["i"]) for p in parts)
        centers.append(int(best[1]))
    return pa.table({
        "rank": pa.array(np.arange(KC_K, dtype=np.int64)),
        "vec_id": pa.array(np.array(centers, dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 25: attribute mixing, monthly buckets, schema harmonization,
# degree moments, per-language quality
# ---------------------------------------------------------------------------

LANG_NAMES = ("py", "js", "go", "rs")


def q_lang_mixing(sf_dir: str):
    """Vertex-attribute mixing matrix: directed edge counts between file
    languages (lang = corpus arithmetic id % 4 joined onto both edge
    endpoints) — the assortativity-by-attribute profile. Attribute
    vector broadcast once; bounded (4 x 4) per-batch partials."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _mix(b: pa.Table, *, _d=dec) -> pa.Table:
        src = np.asarray(b.column("src"), dtype=np.int64)
        dst = np.asarray(b.column("dst"), dtype=np.int64)
        key = (_d.arith(src) % 4) * 4 + (_d.arith(dst) % 4)
        cnt = np.bincount(key, minlength=16).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"k": pa.array(nz), "cnt": pa.array(cnt[nz])})

    parts = ctx.edges.map_batches(_mix, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    agg = np.zeros(16, dtype=np.int64)
    for p in parts:
        agg[p["k"]] += p["cnt"]
    nz = np.nonzero(agg)[0]
    return pa.table({
        "lang_src": pa.array([LANG_NAMES[k // 4] for k in nz],
                             type=pa.string()),
        "lang_dst": pa.array([LANG_NAMES[k % 4] for k in nz],
                             type=pa.string()),
        "cnt": pa.array(agg[nz]),
    })


def q_orders_monthly(sf_dir: str):
    """Monthly order report: order count + total price cents per
    calendar month — the coarse time-bucket roll-up (numpy
    datetime64[M] on one side, date_trunc on the other, both exact).
    Shuffle-free bounded partials."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def _part(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("o_orderdate")).astype("datetime64[us]")
        mon = d.astype("datetime64[M]").astype(np.int64)  # months since 1970
        cents = np.floor(np.asarray(b.column("o_totalprice"))
                         * 100.0).astype(np.int64)
        uk, inv = np.unique(mon, return_inverse=True)
        return pa.table({
            "mon": pa.array(uk),
            "n_orders": pa.array(np.bincount(inv).astype(np.int64)),
            "cents": pa.array(ibincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64)),
        })

    parts = orders.map_batches(_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["mon"], [0, 0])
        e[0] += p["n_orders"]
        e[1] += p["cents"]
    ks = sorted(agg)
    return pa.table({
        "o_year": pa.array([k // 12 + 1970 for k in ks], type=pa.int64()),
        "o_month": pa.array([k % 12 + 1 for k in ks], type=pa.int64()),
        "n_orders": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "total_cents": pa.array([agg[k][1] for k in ks],
                                type=pa.int64()),
    })


def q_party_counts(sf_dir: str):
    """Schema harmonization: customers and suppliers unioned into one
    'party' profile per nation — count and balance cents per role,
    wide-row output (n_customers, n_suppliers, cust_bal_cents,
    supp_bal_cents). Two pruned reads, bounded partials."""
    import ray

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {r["n_nationkey"]: r["n_name"] for r in nat}

    def _mk(nk_col, bal_col, role):
        def _part(b: pa.Table) -> pa.Table:
            nk = np.asarray(b.column(nk_col), dtype=np.int64)
            cents = np.floor(np.asarray(b.column(bal_col))
                             * 100.0).astype(np.int64)
            uk, inv = np.unique(nk, return_inverse=True)
            return pa.table({
                "nk": pa.array(uk),
                "role": pa.array([role] * len(uk), type=pa.string()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "cents": pa.array(ibincount(
                    inv, weights=cents.astype(np.float64)).astype(
                    np.int64)),
            })
        return _part

    parts = (cust.map_batches(_mk("c_nationkey", "c_acctbal", "c"),
                              batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
             + sup.map_batches(_mk("s_nationkey", "s_acctbal", "s"),
                               batch_format="pyarrow",
                               zero_copy_batch=True).take_all())
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["nk"], [0, 0, 0, 0])
        if p["role"] == "c":
            e[0] += p["n"]
            e[2] += p["cents"]
        else:
            e[1] += p["n"]
            e[3] += p["cents"]
    ks = sorted(agg, key=lambda k: nname[k])
    return pa.table({
        "n_name": pa.array([nname[k] for k in ks], type=pa.string()),
        "n_customers": pa.array([agg[k][0] for k in ks],
                                type=pa.int64()),
        "n_suppliers": pa.array([agg[k][1] for k in ks],
                                type=pa.int64()),
        "cust_bal_cents": pa.array([agg[k][2] for k in ks],
                                   type=pa.int64()),
        "supp_bal_cents": pa.array([agg[k][3] for k in ks],
                                   type=pa.int64()),
    })


def q_degree_moments(sf_dir: str):
    """Degree-sequence graphlet statistics of the undirected distinct
    graph: vertex/edge counts, wedge count sum C(d,2) and claw (3-star)
    count sum C(d,3) — exact integers from one degree pass (the
    graphlet-census normalizers that pair with triangle counts)."""
    ctx = get_context(sf_dir)
    g = ctx.engine("sym")
    d = g.in_weights().astype(np.int64)  # structural sym: distinct nbrs
    d = d[d > 0]
    wedges = int((d * (d - 1) // 2).sum())
    claws = int((d * (d - 1) * (d - 2) // 6).sum())
    return pa.table({
        "n_vertices": pa.array([len(d)], type=pa.int64()),
        "deg_sum": pa.array([int(d.sum())], type=pa.int64()),
        "wedges": pa.array([wedges], type=pa.int64()),
        "claws": pa.array([claws], type=pa.int64()),
    })


def q_quality_by_lang(sf_dir: str):
    """Per-language corpus quality sufficient statistics: document
    count, total tokens, total distinct-per-doc tokens, total token
    chars — the aggregate behind per-language quality dashboards.
    One streaming Arrow pass (flatten + parent indices), bounded
    partials, no shuffle."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        nrows = b.num_rows
        n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        order = np.lexsort((flat, par))
        sp, st = par[order], flat[order]
        new = np.ones(len(sp), dtype=bool)
        new[1:] = (sp[1:] != sp[:-1]) | (st[1:] != st[:-1])
        n_dist = np.bincount(sp[new], minlength=nrows).astype(np.int64)
        chars = np.bincount(par, weights=np.char.str_len(flat),
                            minlength=nrows).astype(np.int64)
        lng = np.asarray(b.column("lang")).astype(str)
        ul, inv = np.unique(lng, return_inverse=True)
        def bc(w):
            return np.bincount(inv, weights=w.astype(
                np.float64)).astype(np.int64)
        return pa.table({
            "lang": pa.array(ul.tolist(), type=pa.string()),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_tokens": pa.array(bc(n_tok)),
            "sum_distinct": pa.array(bc(n_dist)),
            "sum_tok_chars": pa.array(bc(chars)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[str, np.ndarray] = {}
    for p in parts:
        v = np.array([p["n_docs"], p["sum_tokens"], p["sum_distinct"],
                      p["sum_tok_chars"]], dtype=np.int64)
        agg[p["lang"]] = agg.get(p["lang"], 0) + v
    ks = sorted(agg)
    cols = ["n_docs", "sum_tokens", "sum_distinct", "sum_tok_chars"]
    out = {"lang": pa.array(ks, type=pa.string())}
    for i, c in enumerate(cols):
        out[c] = pa.array([int(agg[k][i]) for k in ks], type=pa.int64())
    return pa.table(out)


# ---------------------------------------------------------------------------
# wave 26: continuation counts, butterfly census, rolling DAU, video
# motion, supplier concentration
# ---------------------------------------------------------------------------


def q_continuation_counts(sf_dir: str):
    """Kneser-Ney continuation counts: for each token, the number of
    DISTINCT tokens that precede it anywhere in the corpus — the
    smoothing statistic LM pipelines need beside raw bigram counts.
    Distinct bigrams per batch -> one token-keyed shuffle -> distinct
    left contexts per right token."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _bigrams(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        same = par[1:] == par[:-1]
        left, right = flat[:-1][same], flat[1:][same]
        key = np.char.add(np.char.add(left, "\x1f"), right)
        uk = np.unique(key)
        parts = np.char.partition(uk, "\x1f")
        return pa.table({"left": pa.array(parts[:, 0].tolist(),
                                          type=pa.string()),
                         "tok": pa.array(parts[:, 2].tolist(),
                                         type=pa.string())})

    bg = docs.map_batches(_bigrams, batch_format="pyarrow",
                          zero_copy_batch=True)

    def _cont(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "cont_cnt": pa.array([], type=pa.int64())})
        tok = np.asarray(t.column("tok")).astype(str)
        left = np.asarray(t.column("left")).astype(str)
        key = np.char.add(np.char.add(tok, "\x1f"), left)
        uk = np.unique(key)
        rt = np.char.partition(uk, "\x1f")[:, 0]
        ut, cnt = np.unique(rt, return_counts=True)
        return pa.table({"tok": pa.array(ut.tolist(), type=pa.string()),
                         "cont_cnt": pa.array(cnt.astype(np.int64))})

    return group_apply_tasks(bg, ["tok"], _cont)


def q_butterfly_count(sf_dir: str):
    """Bipartite butterfly (2x2 biclique) census of the (user,
    event_type) incidence: sum over type pairs of C(shared_users, 2) —
    the bipartite clustering normalizer, one row. Rides the
    `bipartite_proj` machinery."""
    proj = q_bipartite_proj(sf_dir)
    u = np.asarray(proj.column("users"), dtype=np.int64)
    return pa.table({"butterflies": pa.array(
        [int((u * (u - 1) // 2).sum())], type=pa.int64())})


DAU_WIN = 7


def q_rolling_dau(sf_dir: str):
    """Rolling 7-day active users: for every day, the number of
    DISTINCT users active in [day-6, day] — the DAU/WAU streaming
    dashboard statistic. Each distinct (user, day) expands to its 7
    window days; one shuffle dedups (user, window-day) and counts
    (the distinct-over-sliding-window op SQL needs a lateral expand
    for, same shape both sides)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _expand(b: pa.Table) -> pa.Table:
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        key = np.unique(uid << 20 | day)
        u, d = key >> 20, key & ((1 << 20) - 1)
        wd = (d[:, None] + np.arange(DAU_WIN)).ravel()
        wu = np.repeat(u, DAU_WIN)
        k2 = np.unique(wu << 20 | wd)
        return pa.table({"wday": pa.array(k2 & ((1 << 20) - 1)),
                         "user_id": pa.array(k2 >> 20)})

    ex = ev.map_batches(_expand, batch_format="pyarrow",
                        zero_copy_batch=True)

    def _cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "wday" not in t.column_names:
            return pa.table({"wday": pa.array([], type=pa.int64()),
                             "dau": pa.array([], type=pa.int64())})
        key = np.unique(
            np.asarray(t.column("user_id"), dtype=np.int64) << 20
            | np.asarray(t.column("wday"), dtype=np.int64))
        wd = key & ((1 << 20) - 1)
        uw, cnt = np.unique(wd, return_counts=True)
        return pa.table({"wday": pa.array(uw),
                         "dau": pa.array(cnt.astype(np.int64))})

    parts = group_apply_tasks(ex, ["wday"], _cnt).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["wday"]] = agg.get(p["wday"], 0) + p["dau"]
    ks = sorted(agg)
    return pa.table({
        "day": pa.array(ks, type=pa.int64()),
        "dau": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_video_motion(sf_dir: str):
    """Temporal-difference motion energy per video payload: sum of
    |frame_t - frame_{t-1}| over all pixels (exact int64) through the
    `VideoMotionStage` actor pool — the scene-change feature; the
    temporal sibling of `video_frames`."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="video")
    return blobs.map_batches(
        M.VideoMotionStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


def q_supplier_hhi(sf_dir: str):
    """Supplier concentration profile: per supplier, lineitem count,
    distinct parts and the Herfindahl numerator sum(c_p^2) over
    per-part line counts (HHI = sumsq/total^2 left rational) — the
    concentration-index class. One suppkey shuffle, whole-group
    vectorized."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def _hhi(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return pa.table({"l_suppkey": pa.array([], type=pa.int64()),
                             "n_lines": pa.array([], type=pa.int64()),
                             "n_parts": pa.array([], type=pa.int64()),
                             "sumsq": pa.array([], type=pa.int64())})
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        key = _pack20(sk, pk)
        uk, c = np.unique(key, return_counts=True)
        us = uk >> 20
        uu, inv = np.unique(us, return_inverse=True)
        n_parts = np.bincount(inv).astype(np.int64)
        # integer accumulation (np.add.at on int64): exact past 2^53,
        # unlike float64-weighted bincount (round-3 advice)
        sumsq = np.zeros(len(uu), dtype=np.int64)
        np.add.at(sumsq, inv, c * c)
        n_lines = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_lines, inv, c)
        return pa.table({"l_suppkey": pa.array(uu),
                         "n_lines": pa.array(n_lines),
                         "n_parts": pa.array(n_parts),
                         "sumsq": pa.array(sumsq)})

    return group_apply_tasks(li, ["l_suppkey"], _hhi)


# ---------------------------------------------------------------------------
# wave 27: embedding label stats, global deciles, peak hour load,
# commit nibbles, hapax counts
# ---------------------------------------------------------------------------


def q_emb_label_stats(sf_dir: str):
    """Per-class embedding statistics: vector count and total quantized
    squared norm per label (exact int64 on the kmeans quantization) —
    the class-balance / energy audit over the labeled embedding table.
    Shuffle-free bounded partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def _part(b: pa.Table) -> pa.Table:
        lab = np.asarray(b.column("label"), dtype=np.int64)
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        n2 = (mat * mat).sum(axis=1)
        uk, inv = np.unique(lab, return_inverse=True)
        return pa.table({
            "label": pa.array(uk),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_norm2": pa.array(ibincount(
                inv, weights=n2.astype(np.float64)).astype(np.int64)),
        })

    parts = emb.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["label"], [0, 0])
        e[0] += p["n"]
        e[1] += p["sum_norm2"]
    ks = sorted(agg)
    return pa.table({
        "label": pa.array(ks, type=pa.int64()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "sum_norm2": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


DECILE_K = 10


def q_doc_deciles(sf_dir: str):
    """GLOBAL NTILE: every document's length decile under the total
    order (n_chars, doc_id) — the global-rank window function, which
    distributes as a two-phase rank: (1) one bounded scan counts docs
    per n_chars value (the split-point histogram), (2) one n_chars-
    keyed shuffle assigns within-group ranks locally against the
    broadcast prefix offsets. NTILE's balanced-bucket rule (first n%k
    buckets one larger) applied to the global rank."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _cnt(b: pa.Table) -> pa.Table:
        nc = np.asarray(b.column("n_chars"), dtype=np.int64)
        uk, c = np.unique(nc, return_counts=True)
        return pa.table({"nc": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_cnt, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["nc"]] = hist.get(p["nc"], 0) + p["c"]
    ks = sorted(hist)
    n_total = sum(hist.values())
    offsets = {}
    acc = 0
    for k in ks:
        offsets[k] = acc
        acc += hist[k]
    off_ref = ray.put(offsets)

    def _rank(t: pa.Table, *, _ref=off_ref, _n=n_total) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "decile": pa.array([], type=pa.int64())})
        offs = _ref if isinstance(_ref, dict) else ray.get(_ref)
        nc = np.asarray(t.column("n_chars"), dtype=np.int64)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        order = np.lexsort((did, nc))
        nc_s, did_s = nc[order], did[order]
        starts = np.nonzero(np.concatenate(
            ([True], nc_s[1:] != nc_s[:-1])))[0]
        within = np.arange(len(nc_s)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(nc_s)]))))
        base = np.array([offs[int(v)] for v in nc_s[starts]],
                        dtype=np.int64)
        rank = np.repeat(base, np.diff(np.concatenate(
            (starts, [len(nc_s)])))) + within  # 0-based global rank
        k = DECILE_K
        size, rem = _n // k, _n % k
        big = rem * (size + 1)
        tile = np.where(
            rank < big,
            rank // max(size + 1, 1),
            rem + (rank - big) // max(size, 1),
        ) + 1
        return pa.table({"doc_id": pa.array(did_s),
                         "decile": pa.array(tile.astype(np.int64))})

    return group_apply_tasks(docs, ["n_chars"], _rank)


def q_peak_hour_load(sf_dir: str):
    """Per-user peak load: the absolute hour bucket with the most
    events and its count (ties -> earliest hour) — the burstiness
    profile. One user shuffle, whole-group bincount + argmax."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _peak(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "peak_hour": pa.array([], type=pa.int64()),
                             "peak_cnt": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        hr = (np.asarray(t.column("ts")).astype("datetime64[us]")
              .astype(np.int64) // 3_600_000_000)
        key = uid << 24 | (hr & ((1 << 24) - 1))
        uk, c = np.unique(key, return_counts=True)
        uu = uk >> 24
        order = np.lexsort((uk & ((1 << 24) - 1), -c, uu))
        head = np.ones(len(order), dtype=bool)
        head[1:] = uu[order][1:] != uu[order][:-1]
        w = order[head]
        return pa.table({
            "user_id": pa.array(uu[w]),
            "peak_hour": pa.array(uk[w] & ((1 << 24) - 1)),
            "peak_cnt": pa.array(c[w].astype(np.int64)),
        })

    return group_apply_tasks(ev, ["user_id"], _peak)


def q_commit_nibbles(sf_dir: str):
    """Low-nibble histogram of corpus commit hashes (the hex-suffix
    uniformity audit over the flagship corpus' commit column) —
    bounded 16-row partials over the real string column."""
    from ..sources import corpus as C

    n = C.n_files_for(sf_dir)
    ds = C.corpus_dataset(n)

    def _nib(b: pa.Table) -> pa.Table:
        com = np.asarray(b.column("commit")).astype(str)
        last = np.array([c[-1] for c in com])
        uk, c = np.unique(last, return_counts=True)
        return pa.table({"nibble": pa.array(uk.tolist(),
                                            type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(_nib, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["nibble"]] = agg.get(p["nibble"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "nibble": pa.array(ks, type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_hapax_counts(sf_dir: str):
    """Vocabulary tail profile per language: distinct tokens and hapax
    legomena (global frequency exactly 1) — the vocabulary-cutoff
    statistic. Per-batch (lang, token) count partials -> one keyed
    shuffle (pairs complete per partition) -> bounded per-lang
    partials."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        lng = np.asarray(b.column("lang")).astype(str)[par]
        key = np.char.add(np.char.add(lng, "\x1f"), flat)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"lang": pa.array(sp[:, 0].tolist(),
                                          type=pa.string()),
                         "tok": pa.array(sp[:, 2].tolist(),
                                         type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    pairs = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.column_names:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n_distinct": pa.array([], type=pa.int64()),
                             "n_hapax": pa.array([], type=pa.int64())})
        lng = np.asarray(t.column("lang")).astype(str)
        tok = np.asarray(t.column("tok")).astype(str)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        key = np.char.add(np.char.add(lng, "\x1f"), tok)
        uk, inv = np.unique(key, return_inverse=True)
        tot = ibincount(inv, weights=c.astype(np.float64)).astype(
            np.int64)
        ul = np.array([k.split("\x1f")[0] for k in uk])
        uu, linv = np.unique(ul, return_inverse=True)
        nd = np.bincount(linv).astype(np.int64)
        nh = np.bincount(linv, weights=(tot == 1).astype(
            np.float64)).astype(np.int64)
        return pa.table({"lang": pa.array(uu.tolist(), type=pa.string()),
                         "n_distinct": pa.array(nd),
                         "n_hapax": pa.array(nh)})

    parts = group_apply_tasks(pairs, ["lang", "tok"], _merge).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["lang"], [0, 0])
        e[0] += p["n_distinct"]
        e[1] += p["n_hapax"]
    ks = sorted(agg)
    return pa.table({
        "lang": pa.array(ks, type=pa.string()),
        "n_distinct": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_hapax": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 28: Benford audit, edge multiplicity, full-outer nation roles,
# per-dimension embedding stats, quantity-discount grid
# ---------------------------------------------------------------------------


def q_benford_digits(sf_dir: str):
    """Benford first-significant-digit histogram of positive event
    value cents — the numeric fraud/synthetic-data audit. Bounded
    9-row partials, no shuffle."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    )

    def _part(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        first = np.array([s[0] for s in cents.astype(str)])
        uk, c = np.unique(first, return_counts=True)
        return pa.table({"digit": pa.array(uk.tolist(),
                                           type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["digit"]] = agg.get(p["digit"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "digit": pa.array(ks, type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_edge_multiplicity(sf_dir: str):
    """Multigraph edge-multiplicity histogram: how many distinct
    directed pairs carry weight w (the parallel-edge count from the
    corpus import extraction) — the multigraph audit. One bounded
    histogram pass over the dedup-summed weights."""
    ctx = get_context(sf_dir)

    def _hist(b: pa.Table) -> pa.Table:
        w = np.asarray(b.column("w")).astype(np.int64)
        uk, c = np.unique(w, return_counts=True)
        return pa.table({"w": pa.array(uk),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ctx.edges.map_batches(_hist, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["w"]] = agg.get(p["w"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "w": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_nation_roles_outer(sf_dir: str):
    """FULL OUTER join of per-nation customer counts vs supplier counts
    — most nations lack suppliers at small sf, so both null sides are
    exercised end-to-end through the co-partitioned outer join
    (coalesced to zero). The outer-join driver evidence."""
    import ray

    from ..core.shuffle import group_sum_per_key, hash_join_tasks

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey"]
    )
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]
    )

    def _cnt(col):
        def _p(b: pa.Table) -> pa.Table:
            nk = np.asarray(b.column(col), dtype=np.int64)
            uk, c = np.unique(nk, return_counts=True)
            return pa.table({col: pa.array(uk),
                             "cnt": pa.array(c.astype(np.int64))})
        return _p

    def _merge(col):
        def _m(t: pa.Table) -> pa.Table:
            uk, s = group_sum_per_key(
                np.asarray(t.column("cnt"), dtype=np.float64),
                np.asarray(t.column(col), dtype=np.int64))
            return pa.table({col: pa.array(uk),
                             "cnt": pa.array(s.astype(np.int64))})
        return _m

    from ..core.shuffle import group_apply_tasks

    cc = group_apply_tasks(
        cust.map_batches(_cnt("c_nationkey"), batch_format="pyarrow",
                         zero_copy_batch=True),
        ["c_nationkey"], _merge("c_nationkey"))
    sc = group_apply_tasks(
        sup.map_batches(_cnt("s_nationkey"), batch_format="pyarrow",
                        zero_copy_batch=True),
        ["s_nationkey"], _merge("s_nationkey"))

    def _post(t: pa.Table) -> pa.Table:
        # co-partitioned full outer: keys coalesce into c_nationkey,
        # colliding cnt columns carry the suffixes (cnt_l / cnt_r)
        empty = pa.table({"nk": pa.array([], type=pa.int64()),
                          "n_cust": pa.array([], type=pa.int64()),
                          "n_supp": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "c_nationkey" not in t.column_names:
            return empty
        nk = np.asarray(t.column("c_nationkey"), dtype=np.int64)

        def cnt(col):
            if col in t.column_names:
                return np.asarray(pc.fill_null(t.column(col), 0),
                                  dtype=np.int64)
            return np.zeros(t.num_rows, dtype=np.int64)

        return pa.table({"nk": pa.array(nk),
                         "n_cust": pa.array(cnt("cnt_l")),
                         "n_supp": pa.array(cnt("cnt_r"))})

    out = hash_join_tasks(cc, sc, on="c_nationkey",
                          right_on="s_nationkey",
                          join_type="full outer",
                          left_suffix="_l", right_suffix="_r",
                          post=_post).take_all()
    rows = sorted((r["nk"], r["n_cust"], r["n_supp"]) for r in out)
    return pa.table({
        "n_nationkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_cust": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_supp": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def q_emb_dim_stats(sf_dir: str):
    """Per-dimension embedding sufficient statistics (sum q, sum q^2
    over the kmeans quantization) — the feature-normalization audit,
    64 bounded rows, one columnar pass."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def _part(b: pa.Table) -> pa.Table:
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        return pa.table({
            "dim": pa.array(np.arange(mat.shape[1], dtype=np.int64)),
            "n": pa.array(np.full(mat.shape[1], len(mat), np.int64)),
            "sum_q": pa.array(mat.sum(axis=0)),
            "sum_q2": pa.array((mat * mat).sum(axis=0)),
        })

    parts = emb.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["dim"], [0, 0, 0])
        e[0] += p["n"]
        e[1] += p["sum_q"]
        e[2] += p["sum_q2"]
    ks = sorted(agg)
    return pa.table({
        "dim": pa.array(ks, type=pa.int64()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "sum_q": pa.array([agg[k][1] for k in ks], type=pa.int64()),
        "sum_q2": pa.array([agg[k][2] for k in ks], type=pa.int64()),
    })


def q_qty_disc_grid(sf_dir: str):
    """Quantity-band x discount-percent contingency grid over lineitem
    (chi-square sufficient counts) — bounded (5 x ~11) partials,
    shuffle-free."""
    import ray

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    )

    def _part(b: pa.Table) -> pa.Table:
        qb = np.asarray(b.column("l_quantity")).astype(np.int64) // 10
        dp = np.floor(np.asarray(b.column("l_discount")) * 100.0
                      + 0.5).astype(np.int64)
        key = qb * 101 + dp
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"qty_band": pa.array(uk // 101),
                         "disc_pct": pa.array(uk % 101),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = li.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["qty_band"], p["disc_pct"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "qty_band": pa.array([k[0] for k in ks], type=pa.int64()),
        "disc_pct": pa.array([k[1] for k in ks], type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 29: DAG layering, out-of-order audit, degree joint histogram,
# pixel histogram, multiset except
# ---------------------------------------------------------------------------

DAG_ITERS = 12


def q_dag_layers(sf_dir: str):
    """Longest-path layering (critical-path schedule) of the acyclic
    orientation src < dst (dense order): layer(v) = max over incoming
    (layer(u) + 1), DAG_ITERS synchronous max-plus rounds — the
    topological-scheduling primitive. Per-round movement: per-batch
    (dst, max candidate) partials; the O(n) layer vector stays driver-
    side between rounds (FullyDistVec analog, `percolation_cc`
    discipline)."""
    from ..core.shuffle import group_reduce_per_key

    ctx = get_context(sf_dir)
    n = ctx.n

    def _orient(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s < d
        u = np.unique(s[keep] * n + d[keep])
        return pa.table({"src": pa.array(u // n), "dst": pa.array(u % n)})

    dag = ctx.edges.map_batches(_orient, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    import ray

    layer = np.zeros(n, dtype=np.int64)
    for _ in range(DAG_ITERS):
        lref = ray.put(layer)

        def _round(b: pa.Table, *, _ref=lref) -> pa.Table:
            L = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            s = np.asarray(b.column("src"), dtype=np.int64)
            d = np.asarray(b.column("dst"), dtype=np.int64)
            uk, mx = group_reduce_per_key(
                (L[s] + 1).astype(np.float64), d, "max")
            return pa.table({"v": pa.array(uk),
                             "m": pa.array(mx.astype(np.int64))})

        parts = dag.map_batches(_round, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        new = layer.copy()
        if parts:
            vv = np.fromiter((p["v"] for p in parts), np.int64,
                             len(parts))
            mm = np.fromiter((p["m"] for p in parts), np.int64,
                             len(parts))
            np.maximum.at(new, vv, mm)
        if np.array_equal(new, layer):
            break
        layer = new
    # free the materialized DAG before the query returns (see
    # util.quiesce_data_stats for the post-shutdown hazard class)
    del dag
    ids = np.arange(n)
    return pa.table({
        "label": _label_col(ctx, ids),
        "layer": pa.array(layer),
    })


def q_ooo_events(sf_dir: str):
    """Out-of-order stream audit: per user, events whose timestamp runs
    BACKWARD relative to arrival order (event_id) — inversion count +
    max backward skew in microseconds (the watermark-sizing statistic).
    One user shuffle; running max over arrival order vectorized."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def _ooo(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_late": pa.array([], type=pa.int64()),
                          "max_skew_us": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, uid))  # arrival order within user
        u, s = uid[order], ts[order]
        seg = np.cumsum(np.concatenate(
            ([False], u[1:] != u[:-1]))).astype(np.int64)
        off = seg << 52
        runmax = np.maximum.accumulate(s + off) - off
        prev = np.empty_like(runmax)
        prev[1:] = runmax[:-1]
        heads = np.concatenate(([True], u[1:] != u[:-1]))
        skew = np.where(heads, 0, prev - s)
        late = skew > 0
        uu, inv = np.unique(u, return_inverse=True)
        n_late = np.bincount(inv, weights=late.astype(
            np.float64)).astype(np.int64)
        mx = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(mx, inv, np.where(late, skew, 0))
        return pa.table({"user_id": pa.array(uu),
                         "n_late": pa.array(n_late),
                         "max_skew_us": pa.array(mx)})

    return group_apply_tasks(ev, ["user_id"], _ooo)


def q_deg_joint_hist(sf_dir: str):
    """Joint (out-degree, in-degree) distribution of the directed
    structural graph — the hub/authority skew diagnostic feeding
    partition sizing. Two fused degree vectors, bounded grid counts."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("dir_bool")
    od = eng.out_weights().astype(np.int64)
    idg = eng.in_weights().astype(np.int64)
    key = od * 100_000 + idg
    uk, c = np.unique(key, return_counts=True)
    return pa.table({
        "outdeg": pa.array(uk // 100_000),
        "indeg": pa.array(uk % 100_000),
        "cnt": pa.array(c.astype(np.int64)),
    })


def q_pixel_hist(sf_dir: str):
    """Global pixel-value histogram over every image payload (251 bins)
    — the exposure/equalization audit through the decode actor pool;
    bounded per-batch partials."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")

    class _Hist:
        def __init__(self):
            import struct
            self.header = struct.Struct("<III")

        def __call__(self, batch: pa.Table) -> pa.Table:
            h = np.zeros(256, dtype=np.int64)
            for payload in batch.column("payload").to_pylist():
                pix = np.frombuffer(payload, dtype=np.uint8,
                                    offset=self.header.size)
                h += np.bincount(pix, minlength=256)
            nz = np.nonzero(h)[0]
            return pa.table({"pixel": pa.array(nz.astype(np.int64)),
                             "cnt": pa.array(h[nz])})

    parts = blobs.map_batches(_Hist, batch_format="pyarrow",
                              batch_size=64, concurrency=2).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["pixel"]] = agg.get(p["pixel"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "pixel": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


TE_LANG_A, TE_LANG_B = "en", "es"


def q_token_except(sf_dir: str):
    """Multiset EXCEPT ALL: token occurrences in TE_LANG_A documents
    minus those in TE_LANG_B, per token (excess > 0 only) — the
    bag-difference op behind corpus-drift reports. Per-batch (lang,
    token) partials -> one token shuffle -> per-token difference."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"],
        filter=pc.field("lang").isin([TE_LANG_A, TE_LANG_B]),
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        lng = np.asarray(b.column("lang")).astype(str)[par]
        key = np.char.add(np.char.add(flat, "\x1f"), lng)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"tok": pa.array(sp[:, 0].tolist(),
                                         type=pa.string()),
                         "lang": pa.array(sp[:, 2].tolist(),
                                          type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    pairs = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _diff(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "excess": pa.array([], type=pa.int64())})
        tok = np.asarray(t.column("tok")).astype(str)
        lng = np.asarray(t.column("lang")).astype(str)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        ut, inv = np.unique(tok, return_inverse=True)
        ca = ibincount(inv, weights=np.where(lng == TE_LANG_A, c, 0
                                               ).astype(np.float64)
                         ).astype(np.int64)
        cb = ibincount(inv, weights=np.where(lng == TE_LANG_B, c, 0
                                               ).astype(np.float64)
                         ).astype(np.int64)
        ex = ca - cb
        keep = ex > 0
        return pa.table({"tok": pa.array(ut[keep].tolist(),
                                         type=pa.string()),
                         "excess": pa.array(ex[keep])})

    return group_apply_tasks(pairs, ["tok"], _diff)


# ---------------------------------------------------------------------------
# wave 30: configuration-model stats, curation funnel, dup-cluster
# sizes, similarity by label, null-model audit
# ---------------------------------------------------------------------------


def q_config_model_stats(sf_dir: str):
    """Configuration-model null expectation numerators: sum over
    distinct directed edges of outdeg(src) * indeg(dst), plus edge
    count and degree-square sums — the modularity/assortativity
    normalizers as exact integers. Degree vectors broadcast once; one
    streaming edge pass."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("dir_bool")
    od = eng.out_weights().astype(np.int64)
    idg = eng.in_weights().astype(np.int64)
    dref = ray.put((od, idg))

    def _part(b: pa.Table, *, _ref=dref) -> pa.Table:
        o, i = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        u = np.unique(s * len(o) + d)
        us, ud = u // len(o), u % len(o)
        return pa.table({
            "m": pa.array([len(u)], type=pa.int64()),
            "dd": pa.array([int((o[us] * i[ud]).sum())],
                           type=pa.int64()),
        })

    parts = ctx.edges.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    return pa.table({
        "m": pa.array([sum(p["m"] for p in parts)], type=pa.int64()),
        "sum_dout_din": pa.array([sum(p["dd"] for p in parts)],
                                 type=pa.int64()),
        "sum_dout2": pa.array([int((od * od).sum())], type=pa.int64()),
        "sum_din2": pa.array([int((idg * idg).sum())],
                             type=pa.int64()),
    })


FF_MIN_CHARS = 150
FF_DR_NUM, FF_DR_DEN = 3, 10  # distinct_ratio >= 0.3, division-free


def q_filter_funnel(sf_dir: str):
    """Data-curation funnel: documents surviving each successive
    quality gate — (0) all, (1) n_chars >= FF_MIN_CHARS, (2) distinct
    token ratio >= 0.3 (run division-free: n_distinct * DEN >=
    n_tokens * NUM), (3) non-'zh' language (the langid stand-in) —
    one streaming pass, per-batch 4-counter partials."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        nrows = b.num_rows
        n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        order = np.lexsort((flat, par))
        sp, st = par[order], flat[order]
        new = np.ones(len(sp), dtype=bool)
        new[1:] = (sp[1:] != sp[:-1]) | (st[1:] != st[:-1])
        n_dist = np.bincount(sp[new], minlength=nrows).astype(np.int64)
        nc = np.asarray(b.column("n_chars"), dtype=np.int64)
        lng = np.asarray(b.column("lang")).astype(str)
        s1 = nc >= FF_MIN_CHARS
        s2 = s1 & (n_dist * FF_DR_DEN >= n_tok * FF_DR_NUM)
        s3 = s2 & (lng != "zh")
        return pa.table({
            "stage": pa.array(np.arange(4, dtype=np.int64)),
            "survivors": pa.array(np.array(
                [nrows, int(s1.sum()), int(s2.sum()), int(s3.sum())],
                dtype=np.int64)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg = np.zeros(4, dtype=np.int64)
    for p in parts:
        agg[p["stage"]] += p["survivors"]
    return pa.table({
        "stage": pa.array(np.arange(4, dtype=np.int64)),
        "survivors": pa.array(agg),
    })


def q_dup_size_hist(sf_dir: str):
    """Duplicate-cluster size histogram: how many near-dup clusters
    have k members — the dedup-impact summary over the `dup_clusters`
    assignment (bounded counts; singleton docs are out of the pair
    graph and excluded, as in the cluster table itself)."""
    clusters = q_dup_clusters(sf_dir)

    def _sizes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster" not in t.column_names:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "sz": pa.array([], type=pa.int64())})
        cl = np.asarray(t.column("cluster"), dtype=np.int64)
        uk, c = np.unique(cl, return_counts=True)
        return pa.table({"cluster": pa.array(uk),
                         "sz": pa.array(c.astype(np.int64))})

    parts = clusters.map_batches(_sizes, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["cluster"]] = agg.get(p["cluster"], 0) + p["sz"]
    hist: dict[int, int] = {}
    for sz in agg.values():
        hist[sz] = hist.get(sz, 0) + 1
    ks = sorted(hist)
    return pa.table({
        "size": pa.array(ks, type=pa.int64()),
        "n_clusters": pa.array([hist[k] for k in ks], type=pa.int64()),
    })


SIML_N = 128


def q_sim_by_label(sf_dir: str):
    """Metric-learning audit: over the first SIML_N embeddings, the
    exact integer dot-product sums and pair counts for SAME-label vs
    CROSS-label pairs — is the embedding space class-separating?
    Two-row output; query matrix broadcast once."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < SIML_N,
    )
    all_t = emb.sort("vec_id").take_batch(SIML_N, batch_format="pyarrow")
    tt = pa.table(all_t)
    aids, amat = _km_quant(tt.select(["vec_id", "embedding"]))
    alab = np.asarray(tt.column("label"), dtype=np.int64)
    aref = ray.put((aids, amat, alab))

    def _acc(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am, al = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        lab = np.asarray(t.column("label"), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"same": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        d = Q @ am.T
        mask = ids[:, None] < ai[None, :]
        same = lab[:, None] == al[None, :]
        rows = []
        for flag in (True, False):
            m = mask & (same == flag)
            rows.append((int(flag), int(m.sum()), int(d[m].sum())))
        return pa.table({
            "same": pa.array([r[0] for r in rows], type=pa.int64()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "s": pa.array([r[2] for r in rows], type=pa.int64()),
        })

    parts = emb.map_batches(_acc, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg = {0: [0, 0], 1: [0, 0]}
    for p in parts:
        agg[p["same"]][0] += p["n"]
        agg[p["same"]][1] += p["s"]
    return pa.table({
        "same_label": pa.array([0, 1], type=pa.int64()),
        "n_pairs": pa.array([agg[0][0], agg[1][0]], type=pa.int64()),
        "sum_dot": pa.array([agg[0][1], agg[1][1]], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 31: ball conductance, spend Gini, trigram L1, 1-NN accuracy,
# segment momentum
# ---------------------------------------------------------------------------

BALL_R = 2


def q_ball_conductance(sf_dir: str):
    """Local community quality of the BALL_R-hop ball around m_0 on
    the undirected view: volume (degree sum inside), cut (distinct
    undirected edges leaving) and internal edge count — the
    seed-expansion sweep-cut statistics, exact integers. One truncated
    BFS + one streaming edge pass with the membership broadcast."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    root = ctx.lookup_id("m_0")
    d = alg.min_plus_distances(eng, root, iters=BALL_R)
    inside = np.isfinite(d)
    deg = eng.in_weights().astype(np.int64)
    vol = int(deg[inside].sum())
    mref = ray.put(inside)

    def _cut(b: pa.Table, *, _ref=mref) -> pa.Table:
        m = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = np.asarray(b.column("src"), dtype=np.int64)
        t = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s != t
        u = np.minimum(s[keep], t[keep])
        v = np.maximum(s[keep], t[keep])
        e = np.unique(u << 32 | v)
        eu, ev = e >> 32, e & ((1 << 32) - 1)
        cut = e[m[eu] != m[ev]]
        internal = e[m[eu] & m[ev]]
        return pa.table({"k": pa.array(np.concatenate([cut, internal])),
                         "is_cut": pa.array(np.concatenate(
                             [np.ones(len(cut), np.int8),
                              np.zeros(len(internal), np.int8)]))})

    parts = ctx.edges.map_batches(_cut, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    cutset, inset = set(), set()
    for p in parts:
        (cutset if p["is_cut"] else inset).add(p["k"])
    return pa.table({
        "ball_size": pa.array([int(inside.sum())], type=pa.int64()),
        "volume": pa.array([vol], type=pa.int64()),
        "cut_edges": pa.array([len(cutset)], type=pa.int64()),
        "internal_edges": pa.array([len(inset)], type=pa.int64()),
    })


def q_spend_gini(sf_dir: str):
    """Wealth-inequality statistics of customer spend: n, total cents
    and the exact Gini numerator sum_i (2*rank_i - n - 1) * x_(i) over
    the global order (spend, custkey) — Gini = num / (n * total), left
    rational. Per-customer spend via one keyed reduce; the global rank
    distributes as the `doc_deciles` two-phase split-histogram rank."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _spend(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice"))
                         * 100.0)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    spend = group_apply_tasks(
        orders.map_batches(_spend, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], _merge).materialize()

    def _hist(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("cents"), dtype=np.int64)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(uk),
                         "n": pa.array(n.astype(np.int64))})

    parts = spend.map_batches(_hist, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["c"]] = hist.get(p["c"], 0) + p["n"]
    ks = sorted(hist)
    n_total = sum(hist.values())
    offsets = {}
    acc = 0
    for k in ks:
        offsets[k] = acc
        acc += hist[k]
    off_ref = ray.put(offsets)

    def _gini(t: pa.Table, *, _ref=off_ref, _n=n_total) -> pa.Table:
        if t.num_rows == 0 or "cents" not in t.column_names:
            return pa.table({"num": pa.array([], type=pa.int64()),
                             "tot": pa.array([], type=pa.int64())})
        offs = _ref if isinstance(_ref, dict) else ray.get(_ref)
        c = np.asarray(t.column("cents"), dtype=np.int64)
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        order = np.lexsort((ck, c))
        c_s = c[order]
        starts = np.nonzero(np.concatenate(
            ([True], c_s[1:] != c_s[:-1])))[0]
        within = np.arange(len(c_s)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(c_s)]))))
        base = np.array([offs[int(v)] for v in c_s[starts]],
                        dtype=np.int64)
        rank = np.repeat(base, np.diff(np.concatenate(
            (starts, [len(c_s)])))) + within + 1  # 1-based
        num = int(((2 * rank - _n - 1) * c_s).sum())
        return pa.table({"num": pa.array([num], type=pa.int64()),
                         "tot": pa.array([int(c_s.sum())],
                                         type=pa.int64())})

    gp = group_apply_tasks(spend, ["cents"], _gini).take_all()
    return pa.table({
        "n": pa.array([n_total], type=pa.int64()),
        "total_cents": pa.array([sum(p["tot"] for p in gp)],
                                type=pa.int64()),
        "gini_num": pa.array([sum(p["num"] for p in gp)],
                             type=pa.int64()),
    })


TRI_LANG_A, TRI_LANG_B = "en", "fr"


def q_trigram_l1(sf_dir: str):
    """Character-trigram profile divergence: L1 distance between the
    trigram count profiles of two languages (plus each profile's mass)
    — the langid-confusability statistic, exact integers. Per-batch
    (lang, trigram) partials -> one trigram shuffle -> per-trigram
    |c_a - c_b| partial sums."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"],
        filter=pc.field("lang").isin([TRI_LANG_A, TRI_LANG_B]),
    )

    def _part(b: pa.Table) -> pa.Table:
        lng = np.asarray(b.column("lang")).astype(str)
        rows_t, rows_l, rows_c = [], [], []
        texts = b.column("text").to_pylist()
        # vectorized per batch: concatenate with separators, slice 3-grams
        for lang in (TRI_LANG_A, TRI_LANG_B):
            segs = [t for t, l in zip(texts, lng) if l == lang]
            if not segs:
                continue
            joined = "\x1e".join(segs)
            arr = np.frombuffer(joined.encode("utf-32-le"),
                                dtype=np.uint32)
            tri = np.stack([arr[:-2], arr[1:-1], arr[2:]], axis=1)
            ok = ~(tri == 0x1e).any(axis=1)
            tri = tri[ok]
            key = (tri[:, 0].astype(np.uint64) << 42
                   | tri[:, 1].astype(np.uint64) << 21
                   | tri[:, 2].astype(np.uint64))
            uk, c = np.unique(key, return_counts=True)
            rows_t.append(uk.astype(np.int64))
            rows_l.append(np.full(len(uk), lang == TRI_LANG_A,
                                  dtype=np.int8))
            rows_c.append(c.astype(np.int64))
        if not rows_t:
            return pa.table({"tri": pa.array([], type=pa.int64()),
                             "is_a": pa.array([], type=pa.int8()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({"tri": pa.array(np.concatenate(rows_t)),
                         "is_a": pa.array(np.concatenate(rows_l)),
                         "cnt": pa.array(np.concatenate(rows_c))})

    pairs = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _l1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tri" not in t.column_names:
            return pa.table({"l1": pa.array([], type=pa.int64()),
                             "ma": pa.array([], type=pa.int64()),
                             "mb": pa.array([], type=pa.int64())})
        tri = np.asarray(t.column("tri"), dtype=np.int64)
        isa = np.asarray(t.column("is_a"), dtype=np.int8)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        uk, inv = np.unique(tri, return_inverse=True)
        ca = np.bincount(inv, weights=np.where(isa == 1, c, 0).astype(
            np.float64)).astype(np.int64)
        cb = np.bincount(inv, weights=np.where(isa == 0, c, 0).astype(
            np.float64)).astype(np.int64)
        return pa.table({
            "l1": pa.array([int(np.abs(ca - cb).sum())],
                           type=pa.int64()),
            "ma": pa.array([int(ca.sum())], type=pa.int64()),
            "mb": pa.array([int(cb.sum())], type=pa.int64()),
        })

    parts = group_apply_tasks(pairs, ["tri"], _l1).take_all()
    return pa.table({
        "l1_dist": pa.array([sum(p["l1"] for p in parts)],
                            type=pa.int64()),
        "mass_a": pa.array([sum(p["ma"] for p in parts)],
                           type=pa.int64()),
        "mass_b": pa.array([sum(p["mb"] for p in parts)],
                           type=pa.int64()),
    })


KNN1_N = 256


def q_knn1_accuracy(sf_dir: str):
    """1-NN classification accuracy over the first KNN1_N embeddings:
    nearest neighbor = max exact integer dot (tie -> lowest id, self
    excluded); correct when labels match — the embedding-space
    evaluation metric. Query matrix broadcast once; per-batch argmax
    partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < KNN1_N,
    )
    all_rows = emb.take_all()
    all_rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in all_rows],
                           type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in all_rows]),
    })
    aids, amat = _km_quant(tt)
    alab = np.array([r["label"] for r in all_rows], dtype=np.int64)
    aref = ray.put((aids, amat, alab))

    def _nn(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am, al = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        lab = np.asarray(t.column("label"), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "correct": pa.array([], type=pa.int64())})
        d = Q @ am.T
        d[ids[:, None] == ai[None, :]] = np.iinfo(np.int64).min  # no self
        # argmax with tie -> lowest neighbor id: lexsort per row
        best = np.argmax(d, axis=1)  # first max = lowest index = lowest id
        correct = al[best] == lab
        return pa.table({"n": pa.array([len(ids)], type=pa.int64()),
                         "correct": pa.array([int(correct.sum())],
                                             type=pa.int64())})

    parts = emb.map_batches(_nn, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    return pa.table({
        "n": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
        "n_correct": pa.array([sum(p["correct"] for p in parts)],
                              type=pa.int64()),
    })


def q_segment_momentum(sf_dir: str):
    """Month-over-month revenue momentum per market segment: monthly
    cents with the previous month's delta (the LAG-on-aggregate
    report). Customer segment rides the co-partitioned orders join;
    bounded (segment x month) partials; the LAG runs on the bounded
    aggregate driver-side."""
    import ray

    from ..core.shuffle import hash_join_tasks

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _post(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_mktsegment" not in t.column_names:
            return pa.table({"seg": pa.array([], type=pa.string()),
                             "mon": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        seg = np.asarray(t.column("c_mktsegment")).astype(str)
        mon = (np.asarray(t.column("o_orderdate"))
               .astype("datetime64[us]").astype("datetime64[M]")
               .astype(np.int64))
        cents = np.floor(np.asarray(t.column("o_totalprice"))
                         * 100.0).astype(np.int64)
        key = np.char.add(np.char.add(seg, "\x1f"), mon.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        s = ibincount(inv, weights=cents.astype(np.float64)).astype(
            np.int64)
        return pa.table({
            "seg": pa.array([k.split("\x1f")[0] for k in uk],
                            type=pa.string()),
            "mon": pa.array([int(k.split("\x1f")[1]) for k in uk],
                            type=pa.int64()),
            "cents": pa.array(s),
        })

    parts = hash_join_tasks(orders, cust, on="o_custkey",
                            right_on="c_custkey", post=_post).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["seg"], p["mon"])
        agg[k] = agg.get(k, 0) + p["cents"]
    rows = []
    for seg in sorted({k[0] for k in agg}):
        mons = sorted(m for s, m in agg if s == seg)
        prev = None
        for m in mons:
            c = agg[(seg, m)]
            rows.append((seg, m // 12 + 1970, m % 12 + 1, c,
                         c - prev if prev is not None else None))
            prev = c
    return pa.table({
        "c_mktsegment": pa.array([r[0] for r in rows], type=pa.string()),
        "o_year": pa.array([r[1] for r in rows], type=pa.int64()),
        "o_month": pa.array([r[2] for r in rows], type=pa.int64()),
        "cents": pa.array([r[3] for r in rows], type=pa.int64()),
        "delta": pa.array([r[4] for r in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 32: relational division, RANGE window frame, apportionment,
# quartile mobility, time heatmap
# ---------------------------------------------------------------------------


DIV_TOPK = 3


def q_supplies_all(sf_dir: str):
    """Relational DIVISION: suppliers that shipped EVERY one of the
    brand's DIV_TOPK most-shipped parts (popularity rank: line count
    DESC, partkey ASC — a scale-stable divisor; the full-brand divisor
    goes vacuous as the part table grows). Distinct (supplier,
    target-part) pairs -> per-supplier distinct count == |divisor|;
    the divisor set broadcasts once (the small side, as division
    requires)."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    pt = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"],
        filter=pc.field("p_brand") == Q17_BRAND,
    ).take_all()
    bset = np.sort(np.array([r["p_partkey"] for r in pt],
                            dtype=np.int64))
    li_b = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"],
        filter=pc.field("l_partkey").isin(bset.tolist()),
    )

    def _pc(b: pa.Table) -> pa.Table:
        uk, c = group_sum_per_key(
            np.ones(b.num_rows),
            np.asarray(b.column("l_partkey"), dtype=np.int64))
        return pa.table({"k": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    pop = li_b.map_batches(_pc, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    cnt: dict[int, int] = {}
    for p in pop:
        cnt[p["k"]] = cnt.get(p["k"], 0) + p["c"]
    top = sorted(cnt, key=lambda k: (-cnt[k], k))[:DIV_TOPK]
    pset = np.sort(np.array(top, dtype=np.int64))
    need = len(pset)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"],
        filter=pc.field("l_partkey").isin(pset.tolist()),
    )

    def _pairs(b: pa.Table) -> pa.Table:
        sk = np.asarray(b.column("l_suppkey"), dtype=np.int64)
        pk = np.asarray(b.column("l_partkey"), dtype=np.int64)
        u = np.unique(_pack20(sk, pk))
        return pa.table({"l_suppkey": pa.array(u >> 20),
                         "l_partkey": pa.array(u & ((1 << 20) - 1))})

    pairs = li.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _div(t: pa.Table, *, _need=need) -> pa.Table:
        if t.num_rows == 0 or "l_suppkey" not in t.column_names:
            return pa.table({"l_suppkey": pa.array([], type=pa.int64())})
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        u = np.unique(_pack20(sk, pk))
        us, c = np.unique(u >> 20, return_counts=True)
        return pa.table({"l_suppkey": pa.array(us[c == _need])})

    return group_apply_tasks(pairs, ["l_suppkey"], _div)


RANGE_WIN_US = 3_600_000_000  # 1 hour


def q_range_frame_sum(sf_dir: str):
    """Value-based RANGE window frame: per event, the sum of the user's
    value cents over [ts - 1h, ts] INCLUDING timestamp peers (SQL RANGE
    frame semantics: all rows sharing the current ts are in-frame) —
    the row-frame `rolling_sum4`'s value-frame sibling. One user
    shuffle; per-user prefix sums + two searchsorted cuts."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def _rs(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "range_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, s, e, c = uid[order], ts[order], eid[order], cents[order]
        starts = np.nonzero(np.concatenate(
            ([True], u[1:] != u[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(u)]))
        out_e, out_s = [], []
        for a, z in zip(starts, ends):  # per-user slices, vectorized
            seg_ts, seg_c = s[a:z], c[a:z]
            pref = np.concatenate(([0], np.cumsum(seg_c)))
            lo = np.searchsorted(seg_ts, seg_ts - RANGE_WIN_US, "left")
            hi = np.searchsorted(seg_ts, seg_ts, "right")  # peers in
            out_e.append(e[a:z])
            out_s.append(pref[hi] - pref[lo])
        return pa.table({"event_id": pa.array(np.concatenate(out_e)),
                         "range_cents": pa.array(
                             np.concatenate(out_s).astype(np.int64))})

    return group_apply_tasks(ev, ["user_id"], _rs)


MIX_TOTAL = 1000


def q_mixture_alloc(sf_dir: str):
    """Training-mixture apportionment: MIX_TOTAL sampling slots
    allocated across languages proportional to token mass by the
    largest-remainder (Hamilton) method — exact integers, remainder
    ties -> lang ascending. Token masses from one streaming pass;
    the apportionment itself is O(langs) driver arithmetic."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def _mass(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        lng = np.asarray(b.column("lang")).astype(str)
        ul, inv = np.unique(lng, return_inverse=True)
        return pa.table({
            "lang": pa.array(ul.tolist(), type=pa.string()),
            "m": pa.array(np.bincount(inv, weights=n_tok.astype(
                np.float64)).astype(np.int64)),
        })

    parts = docs.map_batches(_mass, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    mass: dict[str, int] = {}
    for p in parts:
        mass[p["lang"]] = mass.get(p["lang"], 0) + p["m"]
    langs = sorted(mass)
    total = sum(mass.values())
    base = {l: MIX_TOTAL * mass[l] // total for l in langs}
    rem = {l: MIX_TOTAL * mass[l] % total for l in langs}
    left = MIX_TOTAL - sum(base.values())
    for l in sorted(langs, key=lambda x: (-rem[x], x))[:left]:
        base[l] += 1
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "tokens": pa.array([mass[l] for l in langs], type=pa.int64()),
        "seats": pa.array([base[l] for l in langs], type=pa.int64()),
    })


MOB_YEAR_A, MOB_YEAR_B = 1996, 1999


def q_mobility_matrix(sf_dir: str):
    """Spend-quartile mobility: customers active in both MOB_YEAR_A and
    MOB_YEAR_B, bucketed by threshold quartiles of each year's
    per-customer spend (t_p = discrete quantile at ceil(p*n/100);
    quartile = 1 + [x > t25] + [x > t50] + [x > t75]), counted as a
    4 x 4 transition matrix — the cohort-mobility report. Per-year
    spends via keyed reduces; thresholds from bounded value
    histograms; one co-partitioned join pairs the years."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    def year_spend(year):
        import datetime
        lo = datetime.datetime(year, 1, 1)
        hi = datetime.datetime(year + 1, 1, 1)
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
            filter=(pc.field("o_orderdate") >= pa.scalar(lo))
            & (pc.field("o_orderdate") < pa.scalar(hi)),
        )

        def _p(b: pa.Table) -> pa.Table:
            cents = np.floor(np.asarray(b.column("o_totalprice"))
                             * 100.0)
            uk, s = group_sum_per_key(
                cents, np.asarray(b.column("o_custkey"),
                                  dtype=np.int64))
            return pa.table({"o_custkey": pa.array(uk),
                             "cents": pa.array(s.astype(np.int64))})

        def _m(t: pa.Table) -> pa.Table:
            uk, s = group_sum_per_key(
                np.asarray(t.column("cents"), dtype=np.float64),
                np.asarray(t.column("o_custkey"), dtype=np.int64))
            return pa.table({"o_custkey": pa.array(uk),
                             "cents": pa.array(s.astype(np.int64))})

        return group_apply_tasks(
            orders.map_batches(_p, batch_format="pyarrow",
                               zero_copy_batch=True),
            ["o_custkey"], _m).materialize()

    def thresholds(spend_ds):
        def _h(b: pa.Table) -> pa.Table:
            c = np.asarray(b.column("cents"), dtype=np.int64)
            uk, n = np.unique(c, return_counts=True)
            return pa.table({"c": pa.array(uk),
                             "n": pa.array(n.astype(np.int64))})

        parts = spend_ds.map_batches(_h, batch_format="pyarrow",
                                     zero_copy_batch=True).take_all()
        hist: dict[int, int] = {}
        for p in parts:
            hist[p["c"]] = hist.get(p["c"], 0) + p["n"]
        ks = sorted(hist)
        n = sum(hist.values())
        ts = []
        for pctl in (25, 50, 75):
            rank = max(1, -(-pctl * n // 100))
            acc = 0
            for k in ks:
                acc += hist[k]
                if acc >= rank:
                    ts.append(k)
                    break
        return ts

    sa, sb = year_spend(MOB_YEAR_A), year_spend(MOB_YEAR_B)
    ta, tb = thresholds(sa), thresholds(sb)

    def _post(t: pa.Table, *, _ta=tuple(ta), _tb=tuple(tb)) -> pa.Table:
        if t.num_rows == 0 or "cents_l" not in t.column_names:
            return pa.table({"qa": pa.array([], type=pa.int64()),
                             "qb": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        ca = np.asarray(t.column("cents_l"), dtype=np.int64)
        cb = np.asarray(t.column("cents_r"), dtype=np.int64)
        qa = 1 + sum((ca > x).astype(np.int64) for x in _ta)
        qb = 1 + sum((cb > x).astype(np.int64) for x in _tb)
        key = (qa - 1) * 4 + (qb - 1)  # quartiles are 1..4: pack 0-based
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"qa": pa.array(uk // 4 + 1),
                         "qb": pa.array(uk % 4 + 1),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = hash_join_tasks(sa, sb, on="o_custkey",
                            left_suffix="_l", right_suffix="_r",
                            post=_post).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["qa"], p["qb"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "q_a": pa.array([k[0] for k in ks], type=pa.int64()),
        "q_b": pa.array([k[1] for k in ks], type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_dow_hour_heat(sf_dir: str):
    """Weekday x hour-of-day event heatmap counts (pure integer epoch
    arithmetic: dow = (epoch_days + 4) % 7, Thursday-anchored) —
    bounded (7 x 24) partials, shuffle-free."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    )

    def _part(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        day = us // 86_400_000_000
        dow = (day + 4) % 7  # 1970-01-01 was a Thursday; 0 = Sunday ->
        #                      keep ISO-agnostic integer convention
        hour = (us // 3_600_000_000) % 24
        key = dow * 24 + hour
        cnt = np.bincount(key, minlength=168).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"k": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz])})

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg = np.zeros(168, dtype=np.int64)
    for p in parts:
        agg[p["k"]] += p["cnt"]
    nz = np.nonzero(agg)[0]
    return pa.table({
        "dow": pa.array(nz // 24),
        "hour": pa.array(nz % 24),
        "cnt": pa.array(agg[nz]),
    })


# ---------------------------------------------------------------------------
# wave 33: spectral moment, idempotency dedup, multiset intersect,
# continuous percentile, Pareto coverage
# ---------------------------------------------------------------------------


def q_closed_walks4(sf_dir: str):
    """Fourth spectral moment trace(A^4) = sum over (i, j) of
    paths2(i,j) * paths2(j,i) over the distinct directed adjacency —
    one structural SpGEMM (A^2) closed against its own transpose by a
    co-partitioned join with the product fused. One-row output."""
    from ..core import spgemm as SG
    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum().cast_bool()
    deg = ctx.engine("directed").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    two = SG.spgemm_tasks(g.edges, g.edges, ctx.n, add="sum",
                          num_partitions=gp).materialize()
    rev = two.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src"),
                            "w2": t.column("w")}),
        batch_format="pyarrow")

    def _close(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w2" not in t.column_names:
            return pa.table({"c": pa.array([], type=pa.int64())})
        w = np.asarray(t.column("w")).astype(np.int64)
        w2 = np.asarray(t.column("w2")).astype(np.int64)
        return pa.table({"c": pa.array([int((w * w2).sum())],
                                       type=pa.int64())})

    parts = hash_join_tasks(two, rev, on=["src", "dst"],
                            num_partitions=gp, post=_close).take_all()
    return pa.table({"closed_walks4": pa.array(
        [sum(p["c"] for p in parts)], type=pa.int64())})


IDEM_BUCKET_US = 60_000_000  # 1-minute idempotency window


def q_idem_dedup(sf_dir: str):
    """Exactly-once audit: events vs distinct (user, type, minute)
    idempotency keys per type — the streaming-dedup effectiveness
    report. Per-batch distinct partials -> one keyed shuffle for the
    exact global distinct count."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
    )

    def _part(b: pa.Table) -> pa.Table:
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        minute = (np.asarray(b.column("ts")).astype("datetime64[us]")
                  .astype(np.int64) // IDEM_BUCKET_US)
        et = np.asarray(b.column("event_type")).astype(str)
        key = np.char.add(np.char.add(et, "\x1f"), np.char.add(
            np.char.add(uid.astype(str), ":"), minute.astype(str)))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"event_type": pa.array(sp[:, 0].tolist(),
                                                type=pa.string()),
                         "ik": pa.array(sp[:, 2].tolist(),
                                        type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    pairs = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_keys": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        ik = np.asarray(t.column("ik")).astype(str)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), ik)
        uk, inv = np.unique(key, return_inverse=True)
        tot = ibincount(inv, weights=c.astype(np.float64)).astype(
            np.int64)
        ue = np.array([k.split("\x1f")[0] for k in uk])
        uu, einv = np.unique(ue, return_inverse=True)
        return pa.table({
            "event_type": pa.array(uu.tolist(), type=pa.string()),
            "n_events": pa.array(ibincount(
                einv, weights=tot.astype(np.float64)).astype(np.int64)),
            "n_keys": pa.array(np.bincount(einv).astype(np.int64)),
        })

    parts = group_apply_tasks(pairs, ["event_type", "ik"],
                              _merge).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["event_type"], [0, 0])
        e[0] += p["n_events"]
        e[1] += p["n_keys"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "n_events": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_keys": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


def q_token_intersect(sf_dir: str):
    """Multiset INTERSECT ALL mass between two language token bags:
    sum over tokens of min(c_a, c_b) plus the distinct-common count —
    `token_except`'s dual. One token shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"],
        filter=pc.field("lang").isin([TE_LANG_A, TE_LANG_B]),
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        lng = np.asarray(b.column("lang")).astype(str)[par]
        key = np.char.add(np.char.add(flat, "\x1f"), lng)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"tok": pa.array(sp[:, 0].tolist(),
                                         type=pa.string()),
                         "lang": pa.array(sp[:, 2].tolist(),
                                          type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    pairs = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _inter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"mass": pa.array([], type=pa.int64()),
                             "common": pa.array([], type=pa.int64())})
        tok = np.asarray(t.column("tok")).astype(str)
        lng = np.asarray(t.column("lang")).astype(str)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        uk, inv = np.unique(tok, return_inverse=True)
        ca = ibincount(inv, weights=np.where(lng == TE_LANG_A, c, 0
                                               ).astype(np.float64)
                         ).astype(np.int64)
        cb = ibincount(inv, weights=np.where(lng == TE_LANG_B, c, 0
                                               ).astype(np.float64)
                         ).astype(np.int64)
        m = np.minimum(ca, cb)
        return pa.table({
            "mass": pa.array([int(m.sum())], type=pa.int64()),
            "common": pa.array([int((m > 0).sum())], type=pa.int64()),
        })

    parts = group_apply_tasks(pairs, ["tok"], _inter).take_all()
    return pa.table({
        "intersect_mass": pa.array([sum(p["mass"] for p in parts)],
                                   type=pa.int64()),
        "common_tokens": pa.array([sum(p["common"] for p in parts)],
                                  type=pa.int64()),
    })


PCTL_NUM, PCTL_DEN = 3, 8  # p37.5


def q_pctl_cont(sf_dir: str):
    """Continuous percentile as exact rationals: PERCENTILE_CONT(3/8)
    interpolates between order statistics at h = (n-1)*3/8; output the
    two bracketing values plus the fractional position (num, den) so
    the interpolated value lo + (hi-lo)*num/den stays rational — the
    float-free percentile_cont. One keyed shuffle per type, whole-group
    order statistics."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _pc(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "lo": pa.array([], type=pa.int64()),
                          "hi": pa.array([], type=pa.int64()),
                          "frac_num": pa.array([], type=pa.int64()),
                          "frac_den": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        cents = np.floor(np.asarray(t.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        rows = []
        for e in np.unique(et):
            v = np.sort(cents[et == e])
            n = len(v)
            pos_num = (n - 1) * PCTL_NUM  # h = pos_num / PCTL_DEN
            k = pos_num // PCTL_DEN
            rem = pos_num % PCTL_DEN
            lo = int(v[k])
            hi = int(v[min(k + 1, n - 1)]) if rem else lo
            rows.append((e, lo, hi, rem, PCTL_DEN))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows],
                                   type=pa.string()),
            "lo": pa.array([r[1] for r in rows], type=pa.int64()),
            "hi": pa.array([r[2] for r in rows], type=pa.int64()),
            "frac_num": pa.array([r[3] for r in rows], type=pa.int64()),
            "frac_den": pa.array([r[4] for r in rows], type=pa.int64()),
        })

    return group_apply_tasks(ev, ["event_type"], _pc)


PARETO_PCT = 80


def q_pareto80(sf_dir: str):
    """Pareto coverage: the smallest number of top customers whose
    spend reaches PARETO_PCT% of total revenue (plus the covered
    cents) — division-free via 100*cum >= PCT*total on the descending
    global rank (the `spend_gini` two-phase machinery with reversed
    order)."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _spend(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice")) * 100.0)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    def _merge(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    spend = group_apply_tasks(
        orders.map_batches(_spend, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], _merge).materialize()

    def _hist(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("cents"), dtype=np.int64)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(uk),
                         "n": pa.array(n.astype(np.int64)),
                         "s": pa.array(uk * n.astype(np.int64))})

    parts = spend.map_batches(_hist, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    hist: dict[int, list[int]] = {}
    for p in parts:
        e = hist.setdefault(p["c"], [0, 0])
        e[0] += p["n"]
        e[1] += p["s"]
    total = sum(v[1] for v in hist.values())
    # walk values DESCENDING; within a value customers are
    # interchangeable (equal cents), so the boundary count is closed
    # form: smallest j with 100*(before + j*c) >= PCT*total
    target = PARETO_PCT * total
    n_top = covered = 0
    before = 0
    for c in sorted(hist, reverse=True):
        n, sv = hist[c]
        if 100 * (before + sv) >= target:
            j = max(0, -(-(target - 100 * before) // (100 * c)))
            n_top += int(j)
            covered = before + int(j) * c
            break
        before += sv
        n_top += n
    else:
        covered = before
    return pa.table({
        "n_top": pa.array([n_top], type=pa.int64()),
        "covered_cents": pa.array([covered], type=pa.int64()),
        "total_cents": pa.array([total], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 34: neighbor-degree curve, systematic sampling, peel schedule,
# n_chars audit, dominant-dimension histogram
# ---------------------------------------------------------------------------


def q_knn_curve(sf_dir: str):
    """Average-neighbor-degree curve knn(d): per out-degree class d,
    the number of vertices, their total out-neighbor out-degree sum
    and edge count — the degree-assortativity curve's exact integer
    sufficient statistics. Degree vector broadcast once; one streaming
    edge pass + bounded by-degree partials."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("dir_bool")
    od = eng.out_weights().astype(np.int64)
    dref = ray.put(od)

    def _part(b: pa.Table, *, _ref=dref) -> pa.Table:
        d = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        s = np.asarray(b.column("src"), dtype=np.int64)
        t = np.asarray(b.column("dst"), dtype=np.int64)
        u = np.unique(s * len(d) + t)
        us, ut = u // len(d), u % len(d)
        ds = d[us]
        uk, inv = np.unique(ds, return_inverse=True)
        return pa.table({
            "d": pa.array(uk),
            "nbr_deg_sum": pa.array(ibincount(
                inv, weights=d[ut].astype(np.float64)).astype(np.int64)),
            "n_edges": pa.array(np.bincount(inv).astype(np.int64)),
        })

    parts = ctx.edges.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["d"], [0, 0])
        e[0] += p["nbr_deg_sum"]
        e[1] += p["n_edges"]
    uv, cv = np.unique(od[od > 0], return_counts=True)
    nvert = dict(zip(uv.tolist(), cv.tolist()))
    ks = sorted(agg)
    return pa.table({
        "d": pa.array(ks, type=pa.int64()),
        "n_vertices": pa.array([nvert.get(k, 0) for k in ks],
                               type=pa.int64()),
        "n_edges": pa.array([agg[k][1] for k in ks], type=pa.int64()),
        "nbr_deg_sum": pa.array([agg[k][0] for k in ks],
                                type=pa.int64()),
    })


SYS_STEP = 37


def q_systematic_sample(sf_dir: str):
    """Systematic sampling: every SYS_STEP-th document under the global
    (n_chars, doc_id) order (rank % STEP == 0, 0-based) — the
    equal-spaced design sibling of `priority_sample`, riding the
    two-phase distributed rank."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _cnt(b: pa.Table) -> pa.Table:
        nc = np.asarray(b.column("n_chars"), dtype=np.int64)
        uk, c = np.unique(nc, return_counts=True)
        return pa.table({"nc": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_cnt, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["nc"]] = hist.get(p["nc"], 0) + p["c"]
    offsets = {}
    acc = 0
    for k in sorted(hist):
        offsets[k] = acc
        acc += hist[k]
    off_ref = ray.put(offsets)

    def _pick(t: pa.Table, *, _ref=off_ref) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64())})
        offs = _ref if isinstance(_ref, dict) else ray.get(_ref)
        nc = np.asarray(t.column("n_chars"), dtype=np.int64)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        order = np.lexsort((did, nc))
        nc_s, did_s = nc[order], did[order]
        starts = np.nonzero(np.concatenate(
            ([True], nc_s[1:] != nc_s[:-1])))[0]
        within = np.arange(len(nc_s)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(nc_s)]))))
        base = np.array([offs[int(v)] for v in nc_s[starts]],
                        dtype=np.int64)
        rank = np.repeat(base, np.diff(np.concatenate(
            (starts, [len(nc_s)])))) + within
        keep = rank % SYS_STEP == 0
        return pa.table({"doc_id": pa.array(did_s[keep]),
                         "rank": pa.array(rank[keep])})

    return group_apply_tasks(docs, ["n_chars"], _pick)


PEEL_ROUNDS = 6
PEEL_K = 3  # the corpus degree shell: k=3 strips the low-degree fringe


def q_peel_trace(sf_dir: str):
    """k-core peeling SCHEDULE: vertices removed in each of PEEL_ROUNDS
    synchronous degree < PEEL_K pruning rounds on the undirected
    distinct graph (plus the surviving count) — the peel-depth profile
    (kcore gives the final core; this is the trace). O(n) alive/degree
    vectors driver-resident between rounds (FullyDistVec analog)."""
    import ray

    from ..core.shuffle import group_reduce_per_key

    ctx = get_context(sf_dir)
    n = ctx.n

    def _und(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        c = np.maximum(s[keep], d[keep])
        u = np.unique(a * n + c)
        return pa.table({"a": pa.array(u // n), "b": pa.array(u % n)})

    und = ctx.edges.map_batches(_und, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    alive = np.ones(n, dtype=bool)
    removed_per_round = []
    for _ in range(PEEL_ROUNDS):
        aref = ray.put(alive)

        def _deg(b: pa.Table, *, _ref=aref) -> pa.Table:
            al = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            a = np.asarray(b.column("a"), dtype=np.int64)
            c = np.asarray(b.column("b"), dtype=np.int64)
            keep = al[a] & al[c]
            v = np.concatenate([a[keep], c[keep]])
            uk, s = group_reduce_per_key(
                np.ones(len(v)), v, "sum")
            return pa.table({"v": pa.array(uk),
                             "d": pa.array(s.astype(np.int64))})

        parts = und.map_batches(_deg, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        deg = np.zeros(n, dtype=np.int64)
        for p in parts:
            deg[p["v"]] += p["d"]
        kill = alive & (deg < PEEL_K)
        removed_per_round.append(int(kill.sum()))
        if not kill.any():
            break
        alive &= ~kill
    rounds = len(removed_per_round)
    rm = np.array(removed_per_round, dtype=np.int64)
    return pa.table({
        "round": pa.array(np.arange(1, rounds + 1, dtype=np.int64)),
        "removed": pa.array(rm),
        "surviving": pa.array(n - np.cumsum(rm)),
    })


def q_nchars_audit(sf_dir: str):
    """Schema constraint validation: does the materialized n_chars
    column equal length(text)? Counts of matches / mismatches and the
    max absolute deviation — the data-quality assertion class,
    shuffle-free."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
    )

    def _part(b: pa.Table) -> pa.Table:
        actual = np.asarray(pc.utf8_length(b.column("text")),
                            dtype=np.int64)
        claimed = np.asarray(b.column("n_chars"), dtype=np.int64)
        diff = np.abs(actual - claimed)
        return pa.table({
            "n_match": pa.array([int((diff == 0).sum())],
                                type=pa.int64()),
            "n_mismatch": pa.array([int((diff != 0).sum())],
                                   type=pa.int64()),
            "max_abs_diff": pa.array([int(diff.max()) if len(diff)
                                      else 0], type=pa.int64()),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    return pa.table({
        "n_match": pa.array([sum(p["n_match"] for p in parts)],
                            type=pa.int64()),
        "n_mismatch": pa.array([sum(p["n_mismatch"] for p in parts)],
                               type=pa.int64()),
        "max_abs_diff": pa.array([max(p["max_abs_diff"]
                                      for p in parts)],
                                 type=pa.int64()),
    })


def q_dominant_dim_hist(sf_dir: str):
    """Dominant-feature histogram: per embedding the argmax quantized
    dimension (ties -> lowest dim), counted per dimension — the
    feature-collapse audit. One columnar pass, bounded 64-row
    partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def _part(b: pa.Table) -> pa.Table:
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        arg = mat.argmax(axis=1)  # first max = lowest dim on ties
        cnt = np.bincount(arg, minlength=mat.shape[1]).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"dim": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz])})

    parts = emb.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["dim"]] = agg.get(p["dim"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "dim": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 35: triad motifs, digit ratio, basket triples, key-gap audit,
# per-user gap percentile
# ---------------------------------------------------------------------------


def q_motif_counts(sf_dir: str):
    """Directed triad motif counts: feed-forward loops (2-path i->k->j
    closed by edge i->j), 3-cycles (closed by j->i; = trace(A^3)) and
    mutual edge pairs — the FFL-vs-FBL motif comparison. One
    structural SpGEMM joined against the edge table with BOTH closure
    channels fused; reciprocity from one self-join."""
    from ..core import spgemm as SG
    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum().cast_bool()
    deg = ctx.engine("directed").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    two = SG.spgemm_tasks(g.edges, g.edges, ctx.n, add="sum",
                          num_partitions=gp).materialize()

    def _fwd(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table({"c": pa.array([], type=pa.int64())})
        return pa.table({"c": pa.array(
            [int(np.asarray(t.column("w")).sum())], type=pa.int64())})

    ffl = sum(p["c"] for p in hash_join_tasks(
        two, g.edges.map_batches(
            lambda t: pa.table({"src": t.column("src"),
                                "dst": t.column("dst")}),
            batch_format="pyarrow"),
        on=["src", "dst"], num_partitions=gp, post=_fwd).take_all())
    rev = g.edges.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src")}),
        batch_format="pyarrow")
    cyc = sum(p["c"] for p in hash_join_tasks(
        two, rev, on=["src", "dst"], num_partitions=gp,
        post=_fwd).take_all())

    def _mut(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s != d
        return pa.table({"k": pa.array(np.unique(
            s[keep] * ctx.n + d[keep]))})

    keys = set()
    for p in g.edges.map_batches(_mut, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all():
        keys.add(p["k"])
    mutual = sum(1 for k in keys
                 if (k % ctx.n) * ctx.n + k // ctx.n in keys
                 and k // ctx.n < k % ctx.n)
    return pa.table({
        "feed_forward": pa.array([ffl], type=pa.int64()),
        "cycles3_walks": pa.array([cyc], type=pa.int64()),
        "mutual_pairs": pa.array([mutual], type=pa.int64()),
    })


def q_digit_ratio(sf_dir: str):
    """Numeric-token profile per source: total tokens and tokens
    containing a digit — the PII/number-heaviness quality signal.
    One streaming Arrow pass, bounded partials."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = pc.list_flatten(toks)
        hasd = np.asarray(pc.match_substring_regex(flat, "[0-9]"))
        par = np.asarray(pc.list_parent_indices(toks))
        src = np.asarray(b.column("source")).astype(str)[par]
        us, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(us.tolist(), type=pa.string()),
            "n_tokens": pa.array(np.bincount(inv).astype(np.int64)),
            "n_digit": pa.array(ibincount(
                inv, weights=hasd.astype(np.float64)).astype(np.int64)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["source"], [0, 0])
        e[0] += p["n_tokens"]
        e[1] += p["n_digit"]
    ks = sorted(agg)
    return pa.table({
        "source": pa.array(ks, type=pa.string()),
        "n_tokens": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_digit": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


TRIPLE_MINSUP = 2
TRIPLE_TOPK = 20


def q_basket_triples(sf_dir: str):
    """Frequent part TRIPLES across orders (support >= TRIPLE_MINSUP,
    top-TRIPLE_TOPK by (support DESC, parts ASC)) — the 3-itemset
    mining step above `basket_pairs`; per-order groups are tiny (~4
    lines) so the triangular triple expansion stays bounded. One
    orderkey shuffle + one triple-keyed reduce."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _triples(t: pa.Table) -> pa.Table:
        empty = pa.table({"p1": pa.array([], type=pa.int64()),
                          "p2": pa.array([], type=pa.int64()),
                          "p3": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        u = np.unique(_pack20(ok, pk))
        uo, up = u >> 20, u & ((1 << 20) - 1)
        cnt: dict[tuple, int] = {}
        starts = np.nonzero(np.concatenate(
            ([True], uo[1:] != uo[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(uo)]))
        for a, z in zip(starts, ends):
            parts_o = up[a:z]
            m = len(parts_o)
            for i in range(m):
                for j in range(i + 1, m):
                    for k in range(j + 1, m):
                        key = (parts_o[i], parts_o[j], parts_o[k])
                        cnt[key] = cnt.get(key, 0) + 1
        if not cnt:
            return empty
        ks = list(cnt)
        return pa.table({
            "p1": pa.array([k[0] for k in ks], type=pa.int64()),
            "p2": pa.array([k[1] for k in ks], type=pa.int64()),
            "p3": pa.array([k[2] for k in ks], type=pa.int64()),
            "cnt": pa.array([cnt[k] for k in ks], type=pa.int64()),
        })

    per_order = group_apply_tasks(li, ["l_orderkey"], _triples)

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p1" not in t.column_names:
            return pa.table({"p1": pa.array([], type=pa.int64()),
                             "p2": pa.array([], type=pa.int64()),
                             "p3": pa.array([], type=pa.int64()),
                             "support": pa.array([], type=pa.int64())})
        key = (np.asarray(t.column("p1"), dtype=np.int64) << 40
               | np.asarray(t.column("p2"), dtype=np.int64) << 20
               | np.asarray(t.column("p3"), dtype=np.int64))
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        s = ibincount(inv, weights=c.astype(np.float64)).astype(
            np.int64)
        keep = s >= TRIPLE_MINSUP
        uk, s = uk[keep], s[keep]
        return pa.table({
            "p1": pa.array(uk >> 40), "p2": pa.array((uk >> 20)
                                                     & ((1 << 20) - 1)),
            "p3": pa.array(uk & ((1 << 20) - 1)),
            "support": pa.array(s),
        })

    top = (group_apply_tasks(per_order, ["p1", "p2", "p3"], _merge)
           .sort(["support", "p1", "p2", "p3"],
                 descending=[True, False, False, False])
           .limit(TRIPLE_TOPK).take_all())
    return pa.table({
        "p1": pa.array([r["p1"] for r in top], type=pa.int64()),
        "p2": pa.array([r["p2"] for r in top], type=pa.int64()),
        "p3": pa.array([r["p3"] for r in top], type=pa.int64()),
        "support": pa.array([r["support"] for r in top],
                            type=pa.int64()),
    })


def q_orderkey_gaps(sf_dir: str):
    """Key-density audit: count, min, max and missing key count of the
    orderkey sequence (max - min + 1 - n_distinct) — the gap-free
    surrogate-key assertion, shuffle-free scalar partials with exact
    distinct via per-batch dedup + a final bounded union."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )

    def _part(b: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(b.column("o_orderkey"),
                                 dtype=np.int64))
        return pa.table({"k": pa.array(k)})

    keys = set()
    for p in orders.map_batches(_part, batch_format="pyarrow",
                                zero_copy_batch=True).take_all():
        keys.add(p["k"])
    lo, hi, n = min(keys), max(keys), len(keys)
    return pa.table({
        "n_distinct": pa.array([n], type=pa.int64()),
        "min_key": pa.array([lo], type=pa.int64()),
        "max_key": pa.array([hi], type=pa.int64()),
        "missing": pa.array([hi - lo + 1 - n], type=pa.int64()),
    })


GAPQ_P = 95


def q_user_gap_p95(sf_dir: str):
    """Per-user p95 of inter-event gaps (discrete quantile at
    ceil(p*n/100), microseconds; users with >= 2 events) — per-entity
    tail-latency percentiles, one user shuffle with whole-group order
    statistics."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def _p95(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "p95_gap_us": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        same = u[1:] == u[:-1]
        gu, gap = u[1:][same], (s[1:] - s[:-1])[same]
        if not len(gu):
            return empty
        out_u, out_p = [], []
        for x in np.unique(gu):
            g = np.sort(gap[gu == x])
            rank = max(1, -(-GAPQ_P * len(g) // 100))
            out_u.append(int(x))
            out_p.append(int(g[rank - 1]))
        return pa.table({"user_id": pa.array(out_u, type=pa.int64()),
                         "p95_gap_us": pa.array(out_p,
                                                type=pa.int64())})

    return group_apply_tasks(ev, ["user_id"], _p95)


# ---------------------------------------------------------------------------
# wave 36: triplet violations, peak concurrency, quantile bins, YoY
# movers, max type run
# ---------------------------------------------------------------------------

TRIP_N = 256


def q_triplet_violations(sf_dir: str):
    """Metric-learning triplet audit over the first TRIP_N embeddings:
    for every anchor, positive = the NEXT same-label vector and
    negative = the NEXT different-label vector (by vec_id; anchors
    missing either drop out); a violation is dot(a,p) <= dot(a,n) on
    exact quantized dots. Output (n_triplets, n_violations)."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < TRIP_N,
    )
    rows = emb.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in rows]),
    })
    ids, mat = _km_quant(tt)
    lab = np.array([r["label"] for r in rows], dtype=np.int64)
    # next same-label / next diff-label per anchor (driver arithmetic
    # over the bounded TRIP_N set; the dot evaluation is distributed)
    pos = np.full(len(ids), -1, dtype=np.int64)
    neg = np.full(len(ids), -1, dtype=np.int64)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if pos[i] < 0 and lab[j] == lab[i]:
                pos[i] = j
            if neg[i] < 0 and lab[j] != lab[i]:
                neg[i] = j
            if pos[i] >= 0 and neg[i] >= 0:
                break
    ok = (pos >= 0) & (neg >= 0)
    aref = ray.put((ids, mat, pos, neg, ok))

    def _v(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am, p, ng, okm = _ref if isinstance(_ref, tuple) \
            else ray.get(_ref)
        bids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        if len(bids) == 0:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        idx = np.searchsorted(ai, bids)
        keep = okm[idx]
        if not keep.any():
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "v": pa.array([0], type=pa.int64())})
        Qa = Q[keep]
        pi, ni = p[idx[keep]], ng[idx[keep]]
        dp = (Qa * am[pi]).sum(axis=1)
        dn = (Qa * am[ni]).sum(axis=1)
        return pa.table({"n": pa.array([int(keep.sum())],
                                       type=pa.int64()),
                         "v": pa.array([int((dp <= dn).sum())],
                                       type=pa.int64())})

    parts = emb.map_batches(_v, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    return pa.table({
        "n_triplets": pa.array([sum(p["n"] for p in parts)],
                               type=pa.int64()),
        "n_violations": pa.array([sum(p["v"] for p in parts)],
                                 type=pa.int64()),
    })


CONC_WIN_US = 30 * 60 * 1_000_000


def q_peak_concurrency(sf_dir: str):
    """Global peak concurrency: the maximum number of simultaneously
    open 30-minute event windows (half-open [ts, ts+30m); at equal
    instants closings precede openings) — the distributed sweep line:
    per time-bucket partitions compute local delta prefixes, the
    driver chains bounded per-bucket (total, max) partials (a classic
    two-phase scan). Output (max_concurrent)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    )
    BUCKET_US = 86_400_000_000  # one-day scan buckets

    def _deltas(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        e = s + CONC_WIN_US
        t = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), np.int64),
                            np.full(len(e), -1, np.int64)])
        return pa.table({"bucket": pa.array(t // BUCKET_US),
                         "t": pa.array(t), "d": pa.array(d)})

    deltas = ev.map_batches(_deltas, batch_format="pyarrow",
                            zero_copy_batch=True)

    def _scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "t" not in t.column_names:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "total": pa.array([], type=pa.int64()),
                             "pmax": pa.array([], type=pa.int64())})
        tt = np.asarray(t.column("t"), dtype=np.int64)
        dd = np.asarray(t.column("d"), dtype=np.int64)
        bb = np.asarray(t.column("bucket"), dtype=np.int64)
        out_b, out_t, out_m = [], [], []
        for b in np.unique(bb):
            m = bb == b
            order = np.lexsort((dd[m], tt[m]))  # (t, d): -1 first
            run = np.cumsum(dd[m][order])
            out_b.append(int(b))
            out_t.append(int(run[-1]))
            out_m.append(int(run.max()))
        return pa.table({"bucket": pa.array(out_b, type=pa.int64()),
                         "total": pa.array(out_t, type=pa.int64()),
                         "pmax": pa.array(out_m, type=pa.int64())})

    parts = group_apply_tasks(deltas, ["bucket"], _scan).take_all()
    per_bucket: dict[int, list[int]] = {}
    for p in parts:
        e = per_bucket.setdefault(p["bucket"], [0, -(1 << 62)])
        # one bucket maps to one partition; rows are unique per bucket
        e[0] = p["total"]
        e[1] = p["pmax"]
    acc = 0
    best = 0
    for b in sorted(per_bucket):
        tot, mx = per_bucket[b]
        best = max(best, acc + mx)
        acc += tot
    return pa.table({"max_concurrent": pa.array([best],
                                                type=pa.int64())})


def q_price_quartile_bins(sf_dir: str):
    """Equal-mass quantile binning: lineitem price cents bucketed by
    threshold quartiles (t_p at ceil rank), with per-bin counts and
    sums — the quantile-binned aggregate. Thresholds from a bounded
    value histogram; one binning pass."""
    import ray

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def _h(b: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(b.column("l_extendedprice"))
                     * 100.0).astype(np.int64)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(uk),
                         "n": pa.array(n.astype(np.int64))})

    parts = li.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["c"]] = hist.get(p["c"], 0) + p["n"]
    ks = sorted(hist)
    n = sum(hist.values())
    ts = []
    for pctl in (25, 50, 75):
        rank = max(1, -(-pctl * n // 100))
        acc = 0
        for k in ks:
            acc += hist[k]
            if acc >= rank:
                ts.append(k)
                break
    tref = ray.put(tuple(ts))

    def _bin(b: pa.Table, *, _ref=tref) -> pa.Table:
        t = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        c = np.floor(np.asarray(b.column("l_extendedprice"))
                     * 100.0).astype(np.int64)
        q = 1 + sum((c > x).astype(np.int64) for x in t)
        uk, inv = np.unique(q, return_inverse=True)
        return pa.table({
            "bin": pa.array(uk),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_cents": pa.array(ibincount(
                inv, weights=c.astype(np.float64)).astype(np.int64)),
        })

    parts = li.map_batches(_bin, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["bin"], [0, 0])
        e[0] += p["n"]
        e[1] += p["sum_cents"]
    ks2 = sorted(agg)
    return pa.table({
        "bin": pa.array(ks2, type=pa.int64()),
        "n": pa.array([agg[k][0] for k in ks2], type=pa.int64()),
        "sum_cents": pa.array([agg[k][1] for k in ks2],
                              type=pa.int64()),
    })


YOY_TOPK = 10


def q_yoy_movers(sf_dir: str):
    """Year-over-year movers: the YOY_TOPK customers with the largest
    absolute spend change between MOB_YEAR_A and MOB_YEAR_B (among
    customers active BOTH years; order |delta| DESC, custkey) — the
    change-detection report on the `mobility_matrix` join."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key, \
        hash_join_tasks

    def year_spend(year):
        import datetime
        lo = datetime.datetime(year, 1, 1)
        hi = datetime.datetime(year + 1, 1, 1)
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
            filter=(pc.field("o_orderdate") >= pa.scalar(lo))
            & (pc.field("o_orderdate") < pa.scalar(hi)),
        )

        def _p(b: pa.Table) -> pa.Table:
            cents = np.floor(np.asarray(b.column("o_totalprice"))
                             * 100.0)
            uk, s = group_sum_per_key(
                cents, np.asarray(b.column("o_custkey"),
                                  dtype=np.int64))
            return pa.table({"o_custkey": pa.array(uk),
                             "cents": pa.array(s.astype(np.int64))})

        def _m(t: pa.Table) -> pa.Table:
            uk, s = group_sum_per_key(
                np.asarray(t.column("cents"), dtype=np.float64),
                np.asarray(t.column("o_custkey"), dtype=np.int64))
            return pa.table({"o_custkey": pa.array(uk),
                             "cents": pa.array(s.astype(np.int64))})

        return group_apply_tasks(
            orders.map_batches(_p, batch_format="pyarrow",
                               zero_copy_batch=True),
            ["o_custkey"], _m)

    def _delta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cents_l" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "delta": pa.array([], type=pa.int64()),
                             "absd": pa.array([], type=pa.int64())})
        d = (np.asarray(t.column("cents_r"), dtype=np.int64)
             - np.asarray(t.column("cents_l"), dtype=np.int64))
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "delta": pa.array(d),
            "absd": pa.array(np.abs(d)),
        })

    j = hash_join_tasks(year_spend(MOB_YEAR_A), year_spend(MOB_YEAR_B),
                        on="o_custkey", left_suffix="_l",
                        right_suffix="_r", post=_delta)
    top = (j.sort(["absd", "o_custkey"], descending=[True, False])
           .limit(YOY_TOPK).take_all())
    return pa.table({
        "o_custkey": pa.array([r["o_custkey"] for r in top],
                              type=pa.int64()),
        "delta_cents": pa.array([r["delta"] for r in top],
                                type=pa.int64()),
    })


def q_max_type_run(sf_dir: str):
    """Longest consecutive same-type run per event type across user
    streams (order ts, event_id within user) — categorical
    run-length encoding statistics, one user shuffle with vectorized
    run detection + bounded per-type maxima."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def _runs(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "max_run": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        ut, tc = np.unique(np.asarray(t.column("event_type"))
                           .astype(str), return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], tc[order]
        head = np.ones(len(u), dtype=bool)
        head[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1])
        rid = np.cumsum(head) - 1
        ln = np.bincount(rid)
        rt = c[head]
        best = np.zeros(len(ut), dtype=np.int64)
        np.maximum.at(best, rt, ln)
        nz = best > 0
        return pa.table({"event_type": pa.array(ut[nz].tolist(),
                                                type=pa.string()),
                         "max_run": pa.array(best[nz])})

    parts = group_apply_tasks(ev, ["user_id"], _runs).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["event_type"]] = max(agg.get(p["event_type"], 0),
                                   p["max_run"])
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "max_run": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 37: dataset split, wedge-sample estimator, path uniqueness,
# referential integrity, lag-2 autocorrelation
# ---------------------------------------------------------------------------

SPLIT_TRAIN, SPLIT_VAL = 8, 1  # md5 % 10: 0-7 train, 8 val, 9 test


def q_data_split(sf_dir: str):
    """Deterministic train/val/test split: md5-low-64(doc_id) % 10 ->
    0-7 train / 8 val / 9 test — the reproducible holdout-assignment
    primitive; per-split doc counts + doc_id sums (identity check).
    Shuffle-free."""
    import ray

    from ..functions.text import md5_lower64

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def _part(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        h = np.fromiter((md5_lower64(str(int(i))) % 10 for i in ids),
                        dtype=np.int64, count=len(ids))
        split = np.where(h < SPLIT_TRAIN, 0,
                         np.where(h < SPLIT_TRAIN + SPLIT_VAL, 1, 2))
        uk, inv = np.unique(split, return_inverse=True)
        return pa.table({
            "split": pa.array(uk),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64)),
            "id_sum": pa.array(ibincount(
                inv, weights=ids.astype(np.float64)).astype(np.int64)),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["split"], [0, 0])
        e[0] += p["n_docs"]
        e[1] += p["id_sum"]
    names = {0: "train", 1: "val", 2: "test"}
    ks = sorted(agg)
    return pa.table({
        "split": pa.array([names[k] for k in ks], type=pa.string()),
        "n_docs": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "id_sum": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


WEDGE_SAMPLE_MOD = 7  # keep wedges whose LCG lands on 0 (1/7 sample)


def q_wedge_sample_est(sf_dir: str):
    """Wedge-sampling triangle estimator calibration: deterministically
    sample wedges (a-m-c, a < c, LCG on the wedge key % MOD == 0),
    count how many close, and report (sampled, closed, total_wedges)
    so estimate = closed/sampled * total is reproducible — exact
    bookkeeping for an approximate counter. Wedge enumeration +
    closure check ride the `triangles_list` join plan."""
    import ray

    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    n = ctx.n
    g = ctx.graph("sym")
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    be = g.dedup_sum().cast_bool().edges

    def _orient(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep])})

    adj = be.map_batches(_orient, batch_format="pyarrow")
    # wedges through any middle m: (a, m) x (m, c) over the UNDIRECTED
    # adjacency with a < c to count each unordered wedge once
    und = be.map_batches(
        lambda t: pa.table({"m": t.column("src"), "x": t.column("dst")}),
        batch_format="pyarrow")

    def _wedge(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64()),
                          "tw": pa.array([], type=pa.int64()),
                          "sw": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "x" not in t.column_names:
            return empty
        # rows: (m, x) joined with (m, x2): pairs x < x2
        m = np.asarray(t.column("m"), dtype=np.int64)
        x = np.asarray(t.column("x"), dtype=np.int64)
        x2 = np.asarray(t.column("x_r"), dtype=np.int64)
        keep = x < x2
        a, c, mm = x[keep], x2[keep], m[keep]
        key = (a * n + c) % np.int64(1 << 31)
        lcg = (key * np.int64(48271) + mm) % np.int64(
            WEDGE_SAMPLE_MOD)
        sel = lcg == 0
        out = pa.table({
            "a": pa.array(a[sel]), "c": pa.array(c[sel]),
            "tw": pa.array(np.full(sel.sum(), 0, np.int64)),
            "sw": pa.array(np.ones(int(sel.sum()), np.int64)),
        })
        tot = pa.table({"a": pa.array([-1], type=pa.int64()),
                        "c": pa.array([-1], type=pa.int64()),
                        "tw": pa.array([int(keep.sum())],
                                       type=pa.int64()),
                        "sw": pa.array([0], type=pa.int64())})
        return pa.concat_tables([out, tot])

    wedges = hash_join_tasks(
        und, und.map_batches(
            lambda t: pa.table({"m": t.column("m"),
                                "x_r": t.column("x")}),
            batch_format="pyarrow"),
        on="m", num_partitions=gp, post=_wedge).materialize()

    def _tot(b: pa.Table) -> pa.Table:
        tw = np.asarray(b.column("tw"), dtype=np.int64)
        sw = np.asarray(b.column("sw"), dtype=np.int64)
        return pa.table({"tw": pa.array([int(tw.sum())],
                                        type=pa.int64()),
                         "sw": pa.array([int(sw.sum())],
                                        type=pa.int64())})

    tots = wedges.map_batches(_tot, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    total_wedges = sum(p["tw"] for p in tots)
    sampled = sum(p["sw"] for p in tots)

    sampled_ds = wedges.map_batches(
        lambda t: t.filter(pa.array(
            np.asarray(t.column("a"), dtype=np.int64) >= 0)).select(
            ["a", "c"]),
        batch_format="pyarrow")

    def _closed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c": pa.array([], type=pa.int64())})
        return pa.table({"c": pa.array([t.num_rows], type=pa.int64())})

    closed = sum(p["c"] for p in hash_join_tasks(
        sampled_ds, adj.map_batches(
            lambda t: pa.table({"a": t.column("a"),
                                "c": t.column("b")}),
            batch_format="pyarrow"),
        on=["a", "c"], join_type="left semi", num_partitions=gp,
        post=_closed).take_all())
    return pa.table({
        "total_wedges": pa.array([total_wedges], type=pa.int64()),
        "sampled": pa.array([sampled], type=pa.int64()),
        "closed": pa.array([closed], type=pa.int64()),
    })


def q_path_unique_audit(sf_dir: str):
    """Corpus (repo, path) uniqueness assertion: distinct pairs vs rows
    and the maximum duplicate multiplicity — the primary-key audit on
    the flagship table. Per-batch distinct partials + one keyed
    shuffle."""
    from ..sources import corpus as C
    from ..core.shuffle import group_apply_tasks

    n = C.n_files_for(sf_dir)
    ds = C.corpus_dataset(n)

    def _part(b: pa.Table) -> pa.Table:
        repo = np.asarray(b.column("repo")).astype(str)
        path = np.asarray(b.column("path")).astype(str)
        key = np.char.add(np.char.add(repo, "\x1f"), path)
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk.tolist(), type=pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    pairs = ds.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"rows": pa.array([], type=pa.int64()),
                             "distinct": pa.array([], type=pa.int64()),
                             "maxdup": pa.array([], type=pa.int64())})
        k = np.asarray(t.column("k")).astype(str)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        tot = ibincount(inv, weights=c.astype(np.float64)).astype(
            np.int64)
        return pa.table({
            "rows": pa.array([int(tot.sum())], type=pa.int64()),
            "distinct": pa.array([len(uk)], type=pa.int64()),
            "maxdup": pa.array([int(tot.max())], type=pa.int64()),
        })

    parts = group_apply_tasks(pairs, ["k"], _merge).take_all()
    return pa.table({
        "n_rows": pa.array([sum(p["rows"] for p in parts)],
                           type=pa.int64()),
        "n_distinct": pa.array([sum(p["distinct"] for p in parts)],
                               type=pa.int64()),
        "max_dup": pa.array([max(p["maxdup"] for p in parts)],
                            type=pa.int64()),
    })


def q_ref_integrity(sf_dir: str):
    """Cross-table referential integrity: documents.doc_id vs
    embeddings.vec_id through the co-partitioned FULL OUTER join —
    matched keys and each side's orphans. The FK-audit class."""
    import ray

    from ..core.shuffle import hash_join_tasks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "isd": pa.array(
                                np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow")
    vecs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        lambda t: pa.table({"vec_id": t.column("vec_id"),
                            "isv": pa.array(
                                np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow")

    def _post(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], type=pa.int64()),
                             "d": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        hd = pc.is_valid(t.column("isd")).to_numpy(
            zero_copy_only=False) if "isd" in t.column_names \
            else np.zeros(t.num_rows, bool)
        hv = pc.is_valid(t.column("isv")).to_numpy(
            zero_copy_only=False) if "isv" in t.column_names \
            else np.zeros(t.num_rows, bool)
        return pa.table({
            "m": pa.array([int((hd & hv).sum())], type=pa.int64()),
            "d": pa.array([int((hd & ~hv).sum())], type=pa.int64()),
            "v": pa.array([int((~hd & hv).sum())], type=pa.int64()),
        })

    parts = hash_join_tasks(docs, vecs, on="doc_id",
                            right_on="vec_id",
                            join_type="full outer",
                            post=_post).take_all()
    return pa.table({
        "matched": pa.array([sum(p["m"] for p in parts)],
                            type=pa.int64()),
        "docs_only": pa.array([sum(p["d"] for p in parts)],
                              type=pa.int64()),
        "vecs_only": pa.array([sum(p["v"] for p in parts)],
                              type=pa.int64()),
    })


def q_lag2_match(sf_dir: str):
    """Lag-2 autocorrelation proxy: per event type, pairs at positions
    (t-2, t) within a user stream and how many repeat the same type —
    the periodicity signal. One user shuffle, vectorized shift."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def _l2(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_pairs": pa.array([], type=pa.int64()),
                          "n_match": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        ut, tc = np.unique(np.asarray(t.column("event_type"))
                           .astype(str), return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], tc[order]
        same_user = u[2:] == u[:-2]
        frm = c[:-2][same_user]
        match = (c[2:][same_user] == frm)
        if not len(frm):
            return empty
        uk, inv = np.unique(frm, return_inverse=True)
        return pa.table({
            "event_type": pa.array(ut[uk].tolist(), type=pa.string()),
            "n_pairs": pa.array(np.bincount(inv).astype(np.int64)),
            "n_match": pa.array(ibincount(
                inv, weights=match.astype(np.float64)).astype(
                np.int64)),
        })

    parts = group_apply_tasks(ev, ["user_id"], _l2).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["event_type"], [0, 0])
        e[0] += p["n_pairs"]
        e[1] += p["n_match"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "n_pairs": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_match": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 38: language confusion matrix, DAG path counts, positional
# profile, price spread, order-size histogram
# ---------------------------------------------------------------------------


def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: counts per (true lang, predicted
    lang) over the marker-token heuristic (`text.langid`) — the
    classifier-evaluation matrix. One streaming pass; bounded 5x5
    partials."""
    import ray

    from ..functions.text import langid

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def _conf(b: pa.Table) -> pa.Table:
        pred = langid(b.select(["doc_id", "text"]))
        tl = np.asarray(b.column("lang")).astype(str)
        pl = np.asarray(pred.column("pred_lang")).astype(str)
        key = np.char.add(np.char.add(tl, "\x1f"), pl)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"true_lang": pa.array(sp[:, 0].tolist(),
                                               type=pa.string()),
                         "pred_lang": pa.array(sp[:, 2].tolist(),
                                               type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_conf, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["true_lang"], p["pred_lang"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "true_lang": pa.array([k[0] for k in ks], type=pa.string()),
        "pred_lang": pa.array([k[1] for k in ks], type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


PATHC_MOD = (1 << 61) - 1


def q_dag_path_counts(sf_dir: str):
    """DAG path-count DP: c(v) = 1 + sum over dag edges u->v of c(u)
    (the number of distinct descending-id paths ENDING at v, counting
    the empty path) mod 2^61-1, iterated synchronously to the fixpoint
    (<= DAG_ITERS rounds, the `dag_layers` depth bound). The classic
    topological DP beyond max-plus; O(n) count vector driver-resident
    between rounds."""
    from ..core.shuffle import group_reduce_per_key

    ctx = get_context(sf_dir)
    n = ctx.n

    def _orient(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s < d
        u = np.unique(s[keep] * n + d[keep])
        return pa.table({"src": pa.array(u // n), "dst": pa.array(u % n)})

    dag = ctx.edges.map_batches(_orient, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    import ray

    cnt = np.ones(n, dtype=np.int64)  # the empty path
    for _ in range(DAG_ITERS):
        cref = ray.put(cnt)

        def _round(b: pa.Table, *, _ref=cref) -> pa.Table:
            C = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
            s = np.asarray(b.column("src"), dtype=np.int64)
            d = np.asarray(b.column("dst"), dtype=np.int64)
            uk, sm = group_reduce_per_key(
                (C[s] % PATHC_MOD).astype(np.float64), d, "sum")
            return pa.table({"v": pa.array(uk),
                             "m": pa.array(sm.astype(np.int64))})

        parts = dag.map_batches(_round, batch_format="pyarrow",
                                zero_copy_batch=True).take_all()
        new = np.ones(n, dtype=np.int64)
        if parts:
            vv = np.fromiter((p["v"] for p in parts), np.int64,
                             len(parts))
            mm = np.fromiter((p["m"] for p in parts), np.int64,
                             len(parts))
            np.add.at(new, vv, mm % PATHC_MOD)
            new %= PATHC_MOD
        if np.array_equal(new, cnt):
            break
        cnt = new
    ids = np.arange(n)
    return pa.table({
        "label": _label_col(ctx, ids),
        "paths": pa.array(cnt),
    })


POS_HEAD = 10


def q_pos_profile(sf_dir: str):
    """Positional token profile: token count and total codepoint length
    for HEAD positions (< POS_HEAD) vs the TAIL — do openings use
    shorter words? One streaming pass, two-row output."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        col = b.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.utf8_length(flat), dtype=np.int64)
        parent = np.asarray(pc.list_parent_indices(toks),
                            dtype=np.int64)
        offs = np.asarray(toks.offsets, dtype=np.int64)
        idx = np.arange(len(lens)) - offs[parent]
        head = idx < POS_HEAD
        return pa.table({
            "bucket": pa.array(["head", "tail"], type=pa.string()),
            "n_tokens": pa.array([int(head.sum()),
                                  int((~head).sum())],
                                 type=pa.int64()),
            "sum_len": pa.array([int(lens[head].sum()),
                                 int(lens[~head].sum())],
                                type=pa.int64()),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg = {"head": [0, 0], "tail": [0, 0]}
    for p in parts:
        agg[p["bucket"]][0] += p["n_tokens"]
        agg[p["bucket"]][1] += p["sum_len"]
    return pa.table({
        "bucket": pa.array(["head", "tail"], type=pa.string()),
        "n_tokens": pa.array([agg["head"][0], agg["tail"][0]],
                             type=pa.int64()),
        "sum_len": pa.array([agg["head"][1], agg["tail"][1]],
                            type=pa.int64()),
    })


SPREAD_TOPK = 15


def q_price_spread(sf_dir: str):
    """Per-part price volatility: top-SPREAD_TOPK parts by
    (max - min) extended-price cents (tie -> partkey), with line
    counts — min/max keyed reduce + bounded top-k cut."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice"],
    )

    def _mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return pa.table({"l_partkey": pa.array([], type=pa.int64()),
                             "spread": pa.array([], type=pa.int64()),
                             "n_lines": pa.array([], type=pa.int64())})
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        c = np.floor(np.asarray(t.column("l_extendedprice"))
                     * 100.0).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, c)
        np.maximum.at(mx, inv, c)
        return pa.table({"l_partkey": pa.array(uk),
                         "spread": pa.array(mx - mn),
                         "n_lines": pa.array(
                             np.bincount(inv).astype(np.int64))})

    per_part = group_apply_tasks(li, ["l_partkey"], _mm)
    top = (per_part.sort(["spread", "l_partkey"],
                         descending=[True, False])
           .limit(SPREAD_TOPK).take_all())
    return pa.table({
        "l_partkey": pa.array([r["l_partkey"] for r in top],
                              type=pa.int64()),
        "spread": pa.array([r["spread"] for r in top],
                           type=pa.int64()),
        "n_lines": pa.array([r["n_lines"] for r in top],
                            type=pa.int64()),
    })


def q_order_lines_hist(sf_dir: str):
    """Order-size distribution: how many orders have k lineitems —
    the fan-out histogram. One orderkey-keyed partial + bounded
    histogram combine."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )

    def _p(b: pa.Table) -> pa.Table:
        uk, c = group_sum_per_key(
            np.ones(b.num_rows),
            np.asarray(b.column("l_orderkey"), dtype=np.int64))
        return pa.table({"l_orderkey": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    def _m(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        uk, s = group_sum_per_key(
            np.asarray(t.column("c"), dtype=np.float64),
            np.asarray(t.column("l_orderkey"), dtype=np.int64))
        kk, n = np.unique(s.astype(np.int64), return_counts=True)
        return pa.table({"k": pa.array(kk),
                         "n": pa.array(n.astype(np.int64))})

    parts = group_apply_tasks(
        li.map_batches(_p, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_orderkey"], _m).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["k"]] = agg.get(p["k"], 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "n_lines": pa.array(ks, type=pa.int64()),
        "n_orders": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 39: source vocabulary Jaccard, unpivot, modal transition,
# iceberg cells, churn flags
# ---------------------------------------------------------------------------

SVJ_TOPK = 25


def q_source_vocab_jaccard(sf_dir: str):
    """Source-pair vocabulary overlap: for the SVJ_TOPK source pairs by
    shared distinct tokens, the intersection size plus both vocabulary
    sizes (Jaccard = inter / (na + nb - inter), left rational) — the
    corpus-slice similarity matrix. Distinct (token, source) pairs ->
    one token shuffle -> per-token source-pair expansion (sources are
    bounded) -> bounded pair counts."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def _pairs(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks))
        src = np.asarray(b.column("source")).astype(str)[par]
        key = np.char.add(np.char.add(flat, "\x1f"), src)
        uk = np.unique(key)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"tok": pa.array(sp[:, 0].tolist(),
                                         type=pa.string()),
                         "source": pa.array(sp[:, 2].tolist(),
                                            type=pa.string())})

    pairs = docs.map_batches(_pairs, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _expand(t: pa.Table) -> pa.Table:
        empty = pa.table({"sa": pa.array([], type=pa.string()),
                          "sb": pa.array([], type=pa.string()),
                          "inter": pa.array([], type=pa.int64()),
                          "size1": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        tok = np.asarray(t.column("tok")).astype(str)
        src = np.asarray(t.column("source")).astype(str)
        key = np.char.add(np.char.add(tok, "\x1f"), src)
        uk = np.unique(key)
        sp = np.char.partition(uk, "\x1f")
        ut, tinv = np.unique(sp[:, 0], return_inverse=True)
        ss = sp[:, 2]
        order = np.argsort(tinv, kind="stable")
        tinv_s, ss_s = tinv[order], ss[order]
        starts = np.nonzero(np.concatenate(
            ([True], tinv_s[1:] != tinv_s[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(tinv_s)]))
        cnt: dict[tuple, int] = {}
        size: dict[str, int] = {}
        for a, z in zip(starts, ends):
            row = sorted(ss_s[a:z])
            for x in row:
                size[x] = size.get(x, 0) + 1
            for i in range(len(row)):
                for j in range(i + 1, len(row)):
                    k = (row[i], row[j])
                    cnt[k] = cnt.get(k, 0) + 1
        out_a = [k[0] for k in cnt] + list(size)
        out_b = [k[1] for k in cnt] + [""] * len(size)
        out_i = [cnt[k] for k in cnt] + [0] * len(size)
        out_s = [0] * len(cnt) + [size[s] for s in size]
        return pa.table({"sa": pa.array(out_a, type=pa.string()),
                         "sb": pa.array(out_b, type=pa.string()),
                         "inter": pa.array(out_i, type=pa.int64()),
                         "size1": pa.array(out_s, type=pa.int64())})

    parts = group_apply_tasks(pairs, ["tok"], _expand).take_all()
    inter: dict[tuple, int] = {}
    vocab: dict[str, int] = {}
    for p in parts:
        if p["sb"]:
            k = (p["sa"], p["sb"])
            inter[k] = inter.get(k, 0) + p["inter"]
        else:
            vocab[p["sa"]] = vocab.get(p["sa"], 0) + p["size1"]
    top = sorted(inter, key=lambda k: (-inter[k], k))[:SVJ_TOPK]
    return pa.table({
        "sa": pa.array([k[0] for k in top], type=pa.string()),
        "sb": pa.array([k[1] for k in top], type=pa.string()),
        "inter": pa.array([inter[k] for k in top], type=pa.int64()),
        "na": pa.array([vocab[k[0]] for k in top], type=pa.int64()),
        "nb": pa.array([vocab[k[1]] for k in top], type=pa.int64()),
    })


def q_party_unpivot(sf_dir: str):
    """UNPIVOT (melt): the per-nation wide party profile unpivoted to
    (nation, metric, value) long form — the wide-to-long reshape
    class. Rides the `party_counts` machinery; bounded output."""
    wide = q_party_counts(sf_dir)
    names = np.asarray(wide.column("n_name")).astype(str)
    metrics = ["n_customers", "n_suppliers", "cust_bal_cents",
               "supp_bal_cents"]
    out_n, out_m, out_v = [], [], []
    for m in metrics:
        vals = np.asarray(wide.column(m), dtype=np.int64)
        out_n.extend(names.tolist())
        out_m.extend([m] * len(names))
        out_v.extend(vals.tolist())
    return pa.table({
        "n_name": pa.array(out_n, type=pa.string()),
        "metric": pa.array(out_m, type=pa.string()),
        "value": pa.array(out_v, type=pa.int64()),
    })


def q_modal_transition(sf_dir: str):
    """Markov summary: per from-type, the modal next type (tie ->
    alphabetical) with its count — the transition-matrix argmax row,
    riding `transition_counts`."""
    t = q_transition_counts(sf_dir)
    frm = np.asarray(t.column("from_type")).astype(str)
    to = np.asarray(t.column("to_type")).astype(str)
    cnt = np.asarray(t.column("cnt"), dtype=np.int64)
    best: dict[str, tuple] = {}
    for f, tt, c in zip(frm, to, cnt):
        cur = best.get(f)
        if cur is None or (-c, tt) < (-cur[1], cur[0]):
            best[f] = (tt, c)
    ks = sorted(best)
    return pa.table({
        "from_type": pa.array(ks, type=pa.string()),
        "to_type": pa.array([best[k][0] for k in ks],
                            type=pa.string()),
        "cnt": pa.array([best[k][1] for k in ks], type=pa.int64()),
    })


ICE_MIN = 12


def q_iceberg_cells(sf_dir: str):
    """Iceberg aggregate: only the (event_type, hour-of-day) cells with
    at least ICE_MIN events surface — the classic iceberg query,
    bounded partials + threshold at the combine."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def _part(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        hour = (t // 3_600_000_000) % 24
        et = np.asarray(b.column("event_type")).astype(str)
        key = np.char.add(np.char.add(et, "\x1f"), hour.astype(str))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"event_type": pa.array(sp[:, 0].tolist(),
                                                type=pa.string()),
                         "hour": pa.array([int(x) for x in sp[:, 2]],
                                          type=pa.int64()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["event_type"], p["hour"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(k for k in agg if agg[k] >= ICE_MIN)
    return pa.table({
        "event_type": pa.array([k[0] for k in ks], type=pa.string()),
        "hour": pa.array([k[1] for k in ks], type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


CHURN_DAYS = 7


def q_churn_flags(sf_dir: str):
    """Churn audit: users whose LAST event precedes the corpus maximum
    timestamp by more than CHURN_DAYS days — (n_users, n_churned,
    cutoff_us). Per-user max via one keyed reduce; the global max is a
    scalar pass."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_reduce_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _mx(b: pa.Table) -> pa.Table:
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        uk, m = group_reduce_per_key(t.astype(np.float64), uid, "max")
        return pa.table({"user_id": pa.array(uk),
                         "mx": pa.array(m.astype(np.int64))})

    def _mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        uk, m = group_reduce_per_key(
            np.asarray(t.column("mx"), dtype=np.float64),
            np.asarray(t.column("user_id"), dtype=np.int64), "max")
        return pa.table({"user_id": pa.array(uk),
                         "mx": pa.array(m.astype(np.int64))})

    per_user = group_apply_tasks(
        ev.map_batches(_mx, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id"], _mm).take_all()
    gmax = max(p["mx"] for p in per_user)
    cutoff = gmax - CHURN_DAYS * 86_400_000_000
    churned = sum(1 for p in per_user if p["mx"] < cutoff)
    return pa.table({
        "n_users": pa.array([len(per_user)], type=pa.int64()),
        "n_churned": pa.array([churned], type=pa.int64()),
        "cutoff_us": pa.array([cutoff], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 40: LCC share, rank-cut top spenders, neighborhood diversity,
# segment median, farthest pair
# ---------------------------------------------------------------------------


def q_lcc_share(sf_dir: str):
    """Largest-connected-component summary: total vertices, LCC size
    and component count after the fixed CC rounds — the connectivity
    health metric riding `cc_fixed`."""
    ctx = get_context(sf_dir)
    comp = alg.cc_fixed(ctx.engine("sym"), CC_ITERS)
    _, counts = np.unique(comp, return_counts=True)
    return pa.table({
        "n": pa.array([ctx.n], type=pa.int64()),
        "lcc_size": pa.array([int(counts.max())], type=pa.int64()),
        "n_components": pa.array([len(counts)], type=pa.int64()),
    })


RANK_CUT = 5


def q_top_spenders_ties(sf_dir: str):
    """Top spenders by RANK <= RANK_CUT with TIES INCLUDED — RANK-cut
    semantics (can return more rows than the cut when boundary spends
    tie), vs LIMIT's arbitrary tie truncation. Per-customer spend via
    one keyed reduce; the boundary value from the bounded descending
    histogram; final filter streams."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_sum_per_key

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def _p(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("o_totalprice")) * 100.0)
        uk, s = group_sum_per_key(
            cents, np.asarray(b.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    def _m(t: pa.Table) -> pa.Table:
        uk, s = group_sum_per_key(
            np.asarray(t.column("cents"), dtype=np.float64),
            np.asarray(t.column("o_custkey"), dtype=np.int64))
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(s.astype(np.int64))})

    spend = group_apply_tasks(
        orders.map_batches(_p, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["o_custkey"], _m).materialize()

    def _h(b: pa.Table) -> pa.Table:
        c = np.asarray(b.column("cents"), dtype=np.int64)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(uk),
                         "n": pa.array(n.astype(np.int64))})

    parts = spend.map_batches(_h, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["c"]] = hist.get(p["c"], 0) + p["n"]
    # RANK() over cents DESC: rank of value v = 1 + #customers above v;
    # keep values whose rank <= RANK_CUT
    acc = 0
    cutoff = None
    for c in sorted(hist, reverse=True):
        if acc + 1 <= RANK_CUT:
            cutoff = c
        else:
            break
        acc += hist[c]
    out = spend.map_batches(
        lambda t, _cut=cutoff: t.filter(pa.array(
            np.asarray(t.column("cents"), dtype=np.int64) >= _cut)),
        batch_format="pyarrow").take_all()
    rows = sorted(((-r["cents"], r["o_custkey"]) for r in out))
    return pa.table({
        "o_custkey": pa.array([r[1] for r in rows], type=pa.int64()),
        "cents": pa.array([-r[0] for r in rows], type=pa.int64()),
    })


def q_nbr_lang_div(sf_dir: str):
    """Attribute neighborhood diversity: per vertex the number of
    DISTINCT languages among its out-neighbors (lang = arith % 4),
    histogrammed — how attribute-mixed are egonets? Lang vector
    broadcast; distinct (src, lang) pairs per batch; one src-keyed
    shuffle; bounded 0-4 histogram."""
    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _pairs(b: pa.Table, *, _d=dec) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        key = np.unique(s * 4 + (_d.arith(d) % 4))
        return pa.table({"src": pa.array(key // 4),
                         "lg": pa.array(key % 4)})

    pairs = ctx.edges.map_batches(_pairs, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _div(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        key = np.unique(
            np.asarray(t.column("src"), dtype=np.int64) * 4
            + np.asarray(t.column("lg"), dtype=np.int64))
        us, c = np.unique(key // 4, return_counts=True)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"k": pa.array(uk.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    parts = group_apply_tasks(pairs, ["src"], _div).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["k"]] = agg.get(p["k"], 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "n_langs": pa.array(ks, type=pa.int64()),
        "n_vertices": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_segment_median(sf_dir: str):
    """Per-market-segment lower-median order value (cents) — the
    grouped order statistic THROUGH a join: segment rides the
    co-partitioned customer join, medians run whole-group per
    segment."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    j = hash_join_tasks(orders, cust, on="o_custkey",
                        right_on="c_custkey")

    def _tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_mktsegment" not in t.column_names:
            return pa.table({"seg": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64())})
        return pa.table({
            "seg": t.column("c_mktsegment"),
            "cents": pa.array(np.floor(
                np.asarray(t.column("o_totalprice")) * 100.0
            ).astype(np.int64)),
        })

    tagged = j.map_batches(_tag, batch_format="pyarrow")

    def _med(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "seg" not in t.column_names:
            return pa.table({"c_mktsegment": pa.array([],
                                                      type=pa.string()),
                             "median_cents": pa.array([],
                                                      type=pa.int64()),
                             "n_orders": pa.array([], type=pa.int64())})
        seg = np.asarray(t.column("seg")).astype(str)
        c = np.asarray(t.column("cents"), dtype=np.int64)
        out_s, out_m, out_n = [], [], []
        for s in np.unique(seg):
            v = np.sort(c[seg == s])
            out_s.append(s)
            out_m.append(int(v[(len(v) - 1) // 2]))
            out_n.append(len(v))
        return pa.table({
            "c_mktsegment": pa.array(out_s, type=pa.string()),
            "median_cents": pa.array(out_m, type=pa.int64()),
            "n_orders": pa.array(out_n, type=pa.int64()),
        })

    return group_apply_tasks(tagged, ["seg"], _med)


FP_N = 128


def q_farthest_pair(sf_dir: str):
    """Most-dissimilar embedding pair among the first FP_N vectors:
    the (i, j) minimizing the exact integer dot (tie -> (i, j) asc) —
    the diversity-anchor selection. Matrix broadcast; per-batch argmin
    partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < FP_N,
    )
    rows = emb.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in rows]),
    })
    aids, amat = _km_quant(tt)
    aref = ray.put((aids, amat))

    def _mn(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        if len(ids) == 0:
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "dot": pa.array([], type=pa.int64())})
        d = Q @ am.T
        mask = ids[:, None] < ai[None, :]
        if not mask.any():
            return pa.table({"i": pa.array([], type=pa.int64()),
                             "j": pa.array([], type=pa.int64()),
                             "dot": pa.array([], type=pa.int64())})
        dm = np.where(mask, d, np.iinfo(np.int64).max)
        mval = dm.min()
        rr, cc = np.nonzero(dm == mval)
        # ties -> globally smallest (i, j): batch row order is not
        # guaranteed sorted, so resolve over ids explicitly
        bi, bj = min(zip(ids[rr].tolist(), ai[cc].tolist()))
        return pa.table({"i": pa.array([int(bi)], type=pa.int64()),
                         "j": pa.array([int(bj)], type=pa.int64()),
                         "dot": pa.array([int(mval)],
                                         type=pa.int64())})

    parts = emb.map_batches(_mn, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    best = min(((p["dot"], p["i"], p["j"]) for p in parts))
    return pa.table({
        "i": pa.array([best[1]], type=pa.int64()),
        "j": pa.array([best[2]], type=pa.int64()),
        "dot": pa.array([best[0]], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 41: winsorized stats, never-discounted parts, label centroids,
# max idle gap, token-length histogram
# ---------------------------------------------------------------------------

WINS_LO, WINS_HI = 5, 95


def q_winsorized_stats(sf_dir: str):
    """Winsorized event-value statistics: cents clipped to the [p5,
    p95] discrete thresholds before summing — the outlier-robust mean
    numerator (n, clipped_sum, lo, hi). Thresholds from the bounded
    value histogram; one clipping pass."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    )

    def _h(b: pa.Table) -> pa.Table:
        c = np.floor(np.asarray(b.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(uk),
                         "n": pa.array(n.astype(np.int64))})

    parts = ev.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    hist: dict[int, int] = {}
    for p in parts:
        hist[p["c"]] = hist.get(p["c"], 0) + p["n"]
    ks = sorted(hist)
    n = sum(hist.values())
    ts = []
    for pctl in (WINS_LO, WINS_HI):
        rank = max(1, -(-pctl * n // 100))
        acc = 0
        for k in ks:
            acc += hist[k]
            if acc >= rank:
                ts.append(k)
                break
    lo, hi = ts
    tref = ray.put((lo, hi))

    def _clip(b: pa.Table, *, _ref=tref) -> pa.Table:
        l, h = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        c = np.floor(np.asarray(b.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(np.clip(c, l, h).sum())],
                                       type=pa.int64()),
                         "n": pa.array([len(c)], type=pa.int64())})

    parts = ev.map_batches(_clip, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    return pa.table({
        "n": pa.array([sum(p["n"] for p in parts)], type=pa.int64()),
        "clipped_sum": pa.array([sum(p["s"] for p in parts)],
                                type=pa.int64()),
        "lo": pa.array([lo], type=pa.int64()),
        "hi": pa.array([hi], type=pa.int64()),
    })


def q_never_discounted(sf_dir: str):
    """Parts never sold at a discount: parts present in lineitem whose
    MAX discount is zero — the negative-evidence aggregate (count +
    total parts). One partkey max-reduce."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_reduce_per_key

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_discount"]
    )

    def _mx(b: pa.Table) -> pa.Table:
        dp = np.floor(np.asarray(b.column("l_discount")) * 100.0
                      + 0.5).astype(np.int64)
        uk, m = group_reduce_per_key(
            dp.astype(np.float64),
            np.asarray(b.column("l_partkey"), dtype=np.int64), "max")
        return pa.table({"l_partkey": pa.array(uk),
                         "mx": pa.array(m.astype(np.int64))})

    def _mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return pa.table({"tot": pa.array([], type=pa.int64()),
                             "nz": pa.array([], type=pa.int64())})
        uk, m = group_reduce_per_key(
            np.asarray(t.column("mx"), dtype=np.float64),
            np.asarray(t.column("l_partkey"), dtype=np.int64), "max")
        return pa.table({"tot": pa.array([len(uk)], type=pa.int64()),
                         "nz": pa.array([int((m == 0).sum())],
                                        type=pa.int64())})

    parts = group_apply_tasks(
        li.map_batches(_mx, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["l_partkey"], _mm).take_all()
    return pa.table({
        "n_parts": pa.array([sum(p["tot"] for p in parts)],
                            type=pa.int64()),
        "never_discounted": pa.array([sum(p["nz"] for p in parts)],
                                     type=pa.int64()),
    })


def q_label_centroids(sf_dir: str):
    """Per-label centroid floor-means on the quantized embeddings:
    (label, dim, floor(sum q / n)) — the feature-store class centroid
    table, exact integers. Bounded (labels x dims) partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def _part(b: pa.Table) -> pa.Table:
        lab = np.asarray(b.column("label"), dtype=np.int64)
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        ul, inv = np.unique(lab, return_inverse=True)
        dims = mat.shape[1]
        sums = np.zeros((len(ul), dims), dtype=np.int64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ul, dims)),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                    len(ul))),
            "s": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnt, dims)),
        })

    parts = emb.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        k = (p["label"], p["dim"])
        e = agg.setdefault(k, [0, 0])
        e[0] += p["s"]
        e[1] += p["n"]
    ks = sorted(agg)
    # floor division of possibly-negative sums: Python // floors ✓
    return pa.table({
        "label": pa.array([k[0] for k in ks], type=pa.int64()),
        "dim": pa.array([k[1] for k in ks], type=pa.int64()),
        "centroid_q": pa.array([agg[k][0] // agg[k][1] for k in ks],
                               type=pa.int64()),
    })


def q_max_idle_gap(sf_dir: str):
    """Largest idle gap in the GLOBAL event stream: the maximum
    difference between consecutive event timestamps and when it starts
    — a two-phase distributed adjacent scan (per day-bucket: min, max
    and max internal gap; the driver chains bounded bucket summaries,
    adding the cross-bucket boundary gaps)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    )
    BUCKET_US = 86_400_000_000

    def _b(b: pa.Table) -> pa.Table:
        t = np.asarray(b.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        return pa.table({"bucket": pa.array(t // BUCKET_US),
                         "t": pa.array(t)})

    bt = ev.map_batches(_b, batch_format="pyarrow",
                        zero_copy_batch=True)

    def _scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "t" not in t.column_names:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "mn": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64()),
                             "g": pa.array([], type=pa.int64()),
                             "at": pa.array([], type=pa.int64())})
        tt = np.asarray(t.column("t"), dtype=np.int64)
        bb = np.asarray(t.column("bucket"), dtype=np.int64)
        out = {"bucket": [], "mn": [], "mx": [], "g": [], "at": []}
        for b in np.unique(bb):
            v = np.sort(tt[bb == b])
            gaps = np.diff(v)
            if len(gaps):
                gi = int(np.argmax(gaps))
                g, at = int(gaps[gi]), int(v[gi])
            else:
                g, at = -1, -1
            out["bucket"].append(int(b))
            out["mn"].append(int(v[0]))
            out["mx"].append(int(v[-1]))
            out["g"].append(g)
            out["at"].append(at)
        return pa.table({k: pa.array(vv, type=pa.int64())
                         for k, vv in out.items()})

    parts = group_apply_tasks(bt, ["bucket"], _scan).take_all()
    parts.sort(key=lambda p: p["bucket"])
    best_g, best_at = -1, -1
    prev_mx = None
    for p in parts:
        if prev_mx is not None:
            bg = p["mn"] - prev_mx
            if bg > best_g or (bg == best_g and prev_mx < best_at):
                best_g, best_at = bg, prev_mx
        if p["g"] > best_g or (p["g"] == best_g and p["at"] < best_at):
            best_g, best_at = p["g"], p["at"]
        prev_mx = p["mx"]
    return pa.table({
        "gap_us": pa.array([best_g], type=pa.int64()),
        "at_us": pa.array([best_at], type=pa.int64()),
    })


def q_tok_len_hist(sf_dir: str):
    """Token-length histogram over the whole corpus (codepoints) —
    the tokenizer-profile curve, one Arrow pass, bounded partials."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        lens = np.asarray(pc.utf8_length(pc.list_flatten(toks)),
                          dtype=np.int64)
        uk, c = np.unique(lens, return_counts=True)
        return pa.table({"len": pa.array(uk),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["len"]] = agg.get(p["len"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "len": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 42: part growth curve, bounce rate, audio energy histogram,
# P3 census, blob collisions
# ---------------------------------------------------------------------------


def q_part_growth(sf_dir: str):
    """Catalog growth curve: per calendar month, how many parts appear
    in lineitem-joined orders for the FIRST time, plus the cumulative
    count — the vocabulary-growth class on the part dimension. First
    month per part via one keyed min-reduce through the co-partitioned
    orders join; bounded month histogram + prefix sum."""
    import ray

    from ..core.shuffle import group_apply_tasks, group_reduce_per_key, \
        hash_join_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def _post(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderdate" not in t.column_names:
            return pa.table({"l_partkey": pa.array([], type=pa.int64()),
                             "mon": pa.array([], type=pa.int64())})
        mon = (np.asarray(t.column("o_orderdate"))
               .astype("datetime64[us]").astype("datetime64[M]")
               .astype(np.int64))
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        uk, m = group_reduce_per_key(mon.astype(np.float64), pk, "min")
        return pa.table({"l_partkey": pa.array(uk),
                         "mon": pa.array(m.astype(np.int64))})

    partials = hash_join_tasks(li, orders, on="l_orderkey",
                               right_on="o_orderkey", post=_post)

    def _first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return pa.table({"mon": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        uk, m = group_reduce_per_key(
            np.asarray(t.column("mon"), dtype=np.float64),
            np.asarray(t.column("l_partkey"), dtype=np.int64), "min")
        um, c = np.unique(m.astype(np.int64), return_counts=True)
        return pa.table({"mon": pa.array(um),
                         "n": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(partials, ["l_partkey"], _first).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["mon"]] = agg.get(p["mon"], 0) + p["n"]
    ks = sorted(agg)
    cum = np.cumsum([agg[k] for k in ks])
    return pa.table({
        "o_year": pa.array([k // 12 + 1970 for k in ks],
                           type=pa.int64()),
        "o_month": pa.array([k % 12 + 1 for k in ks], type=pa.int64()),
        "new_parts": pa.array([agg[k] for k in ks], type=pa.int64()),
        "cum_parts": pa.array(cum.astype(np.int64)),
    })


def q_bounce_stats(sf_dir: str):
    """Session bounce rate: 30-minute-gap sessionization, counting
    sessions and single-event (bounce) sessions per user stream —
    the engagement-quality metric riding the `sessions` discipline.
    One user shuffle, vectorized session-boundary detection."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap_us = SESSION_GAP_MIN * 60_000_000

    def _b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"ns": pa.array([], type=pa.int64()),
                             "nb": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        new_sess = np.ones(len(u), dtype=bool)
        new_sess[1:] = (u[1:] != u[:-1]) | (s[1:] - s[:-1] > gap_us)
        sid = np.cumsum(new_sess)
        sizes = np.bincount(sid)[1:]
        return pa.table({"ns": pa.array([len(sizes)], type=pa.int64()),
                         "nb": pa.array([int((sizes == 1).sum())],
                                        type=pa.int64())})

    parts = group_apply_tasks(ev, ["user_id"], _b).take_all()
    return pa.table({
        "n_sessions": pa.array([sum(p["ns"] for p in parts)],
                               type=pa.int64()),
        "n_bounce": pa.array([sum(p["nb"] for p in parts)],
                             type=pa.int64()),
    })


AEH_SHIFT = 27


def q_audio_energy_hist(sf_dir: str):
    """Audio energy-band histogram: per payload the int64 energy
    (sum of squares) bucketed by >> AEH_SHIFT — the loudness-profile
    audit through the audio actor pool."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="audio")
    stats = blobs.map_batches(
        M.AudioIntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )

    def _h(b: pa.Table) -> pa.Table:
        e = np.asarray(b.column("sq_sum"), dtype=np.int64) >> AEH_SHIFT
        uk, c = np.unique(e, return_counts=True)
        return pa.table({"band": pa.array(uk),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = stats.map_batches(_h, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["band"]] = agg.get(p["band"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "band": pa.array(ks, type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_p3_count(sf_dir: str):
    """3-edge path (P4 subgraph) census of the undirected distinct
    graph via the closed form sum over edges (d(u)-1)(d(v)-1) minus
    3 * triangles (paths whose middle edge closes a triangle are
    counted there) — graphlet arithmetic over one degree broadcast +
    the existing triangle count. One streaming edge pass."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    deg = eng.in_weights().astype(np.int64)
    dref = ray.put(deg)

    def _canon(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        t = np.asarray(b.column("dst"), dtype=np.int64)
        keep = s != t
        u = np.minimum(s[keep], t[keep])
        v = np.maximum(s[keep], t[keep])
        return pa.table({"k": pa.array(np.unique(u << 32 | v))})

    canon = ctx.edges.map_batches(_canon, batch_format="pyarrow",
                                  zero_copy_batch=True)

    from ..core.shuffle import group_apply_tasks

    def _sum(t: pa.Table, *, _ref=dref) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"s": pa.array([], type=pa.int64())})
        d = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        e = np.unique(np.asarray(t.column("k"), dtype=np.int64))
        eu, ev = e >> 32, e & ((1 << 32) - 1)
        return pa.table({"s": pa.array(
            [int(((d[eu] - 1) * (d[ev] - 1)).sum())], type=pa.int64())})

    parts = group_apply_tasks(canon, ["k"], _sum).take_all()
    middle_sum = sum(p["s"] for p in parts)
    tri = int(np.asarray(
        q_triangle_count(sf_dir).column("triangles"))[0])
    return pa.table({
        "middle_sum": pa.array([middle_sum], type=pa.int64()),
        "triangles": pa.array([tri], type=pa.int64()),
        "p3_paths": pa.array([middle_sum - 3 * tri], type=pa.int64()),
    })


def q_blob_collisions(sf_dir: str):
    """Payload near-collision audit: image payloads grouped by the
    (width, height, px_sum) content key — collision-group count and
    the largest group (the cheap multimodal pre-dedup signature).
    Decode through the actor pool; one key shuffle."""
    from ..core.shuffle import group_apply_tasks
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")
    stats = blobs.map_batches(
        M.IntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )

    def _key(b: pa.Table) -> pa.Table:
        w = np.asarray(b.column("width"), dtype=np.int64)
        h = np.asarray(b.column("height"), dtype=np.int64)
        s = np.asarray(b.column("px_sum"), dtype=np.int64)
        return pa.table({"k": pa.array(((w * 64 + h) << 32) | s)})

    keyed = stats.map_batches(_key, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _g(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "g": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        k = np.asarray(t.column("k"), dtype=np.int64)
        uk, c = np.unique(k, return_counts=True)
        return pa.table({"n": pa.array([int(c.sum())], type=pa.int64()),
                         "g": pa.array([len(uk)], type=pa.int64()),
                         "mx": pa.array([int(c.max())],
                                        type=pa.int64())})

    parts = group_apply_tasks(keyed, ["k"], _g).take_all()
    return pa.table({
        "n_items": pa.array([sum(p["n"] for p in parts)],
                            type=pa.int64()),
        "n_groups": pa.array([sum(p["g"] for p in parts)],
                             type=pa.int64()),
        "max_group": pa.array([max(p["mx"] for p in parts)],
                              type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 43: KS statistic, rank-sum U, chi-square cells, quarterly top
# order, norm outliers
# ---------------------------------------------------------------------------

KS_TYPE_A, KS_TYPE_B = "click", "purchase"


def q_ks_stat(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov numerator between the value-cents
    distributions of two event types, division-free: KS = max over the
    merged value walk of |cum_a * n_b - cum_b * n_a| (the exact
    cross-multiplied CDF gap), with both sample sizes alongside.
    Bounded per-type value histograms -> one driver walk."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        filter=pc.field("event_type").isin([KS_TYPE_A, KS_TYPE_B]),
    )

    def _h(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type")).astype(str)
        c = np.floor(np.asarray(b.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        isa = et == KS_TYPE_A
        out = {}
        for flag, name in ((isa, 1), (~isa, 0)):
            uk, n = np.unique(c[flag], return_counts=True)
            out[name] = (uk, n)
        return pa.table({
            "c": pa.array(np.concatenate([out[1][0], out[0][0]])),
            "is_a": pa.array(np.concatenate(
                [np.ones(len(out[1][0]), np.int8),
                 np.zeros(len(out[0][0]), np.int8)])),
            "n": pa.array(np.concatenate(
                [out[1][1], out[0][1]]).astype(np.int64)),
        })

    parts = ev.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    ha: dict[int, int] = {}
    hb: dict[int, int] = {}
    for p in parts:
        tgt = ha if p["is_a"] else hb
        tgt[p["c"]] = tgt.get(p["c"], 0) + p["n"]
    na, nb = sum(ha.values()), sum(hb.values())
    ks = 0
    ca = cb = 0
    for v in sorted(set(ha) | set(hb)):
        ca += ha.get(v, 0)
        cb += hb.get(v, 0)
        ks = max(ks, abs(ca * nb - cb * na))
    return pa.table({
        "ks_num": pa.array([ks], type=pa.int64()),
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb], type=pa.int64()),
    })


def q_rank_sum_u(sf_dir: str):
    """Mann-Whitney rank-sum numerators between the same two event
    types: DOUBLED midranks (2 * midrank = min_rank + max_rank of the
    tie group, integer-exact) summed for sample A, plus both sizes —
    U follows as n_a*n_b + n_a(n_a+1)/2 - R_a with R_a = r2_sum/2.
    Bounded value histograms -> one exact driver walk."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        filter=pc.field("event_type").isin([KS_TYPE_A, KS_TYPE_B]),
    )

    def _h(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type")).astype(str)
        c = np.floor(np.asarray(b.column("value")) * 100.0
                     + 0.5).astype(np.int64)
        isa = et == KS_TYPE_A
        rows_c, rows_f, rows_n = [], [], []
        for flag, name in ((isa, 1), (~isa, 0)):
            uk, n = np.unique(c[flag], return_counts=True)
            rows_c.append(uk)
            rows_f.append(np.full(len(uk), name, np.int8))
            rows_n.append(n.astype(np.int64))
        return pa.table({"c": pa.array(np.concatenate(rows_c)),
                         "is_a": pa.array(np.concatenate(rows_f)),
                         "n": pa.array(np.concatenate(rows_n))})

    parts = ev.map_batches(_h, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    ha: dict[int, int] = {}
    hb: dict[int, int] = {}
    for p in parts:
        tgt = ha if p["is_a"] else hb
        tgt[p["c"]] = tgt.get(p["c"], 0) + p["n"]
    na, nb = sum(ha.values()), sum(hb.values())
    r2_sum = 0
    pos = 0  # ranks assigned so far
    for v in sorted(set(ha) | set(hb)):
        ta, tb = ha.get(v, 0), hb.get(v, 0)
        tie = ta + tb
        # doubled midrank of the tie group = (pos+1) + (pos+tie)
        r2 = (pos + 1) + (pos + tie)
        r2_sum += r2 * ta
        pos += tie
    return pa.table({
        "r2_sum_a": pa.array([r2_sum], type=pa.int64()),
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb], type=pa.int64()),
    })


def q_chi2_cells(sf_dir: str):
    """Chi-square preparation table for the (lang, source) contingency:
    per cell the observed count with its row, column and grand totals
    — everything the test statistic needs, exact integers. Bounded
    grid partials."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def _part(b: pa.Table) -> pa.Table:
        lng = np.asarray(b.column("lang")).astype(str)
        src = np.asarray(b.column("source")).astype(str)
        key = np.char.add(np.char.add(lng, "\x1f"), src)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"lang": pa.array(sp[:, 0].tolist(),
                                          type=pa.string()),
                         "source": pa.array(sp[:, 2].tolist(),
                                            type=pa.string()),
                         "obs": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["lang"], p["source"])
        agg[k] = agg.get(k, 0) + p["obs"]
    rows = {k: 0 for k in {a for a, _ in agg}}
    cols = {k: 0 for k in {b for _, b in agg}}
    for (a, b), c in agg.items():
        rows[a] += c
        cols[b] += c
    total = sum(agg.values())
    ks = sorted(agg)
    return pa.table({
        "lang": pa.array([k[0] for k in ks], type=pa.string()),
        "source": pa.array([k[1] for k in ks], type=pa.string()),
        "obs": pa.array([agg[k] for k in ks], type=pa.int64()),
        "row_n": pa.array([rows[k[0]] for k in ks], type=pa.int64()),
        "col_n": pa.array([cols[k[1]] for k in ks], type=pa.int64()),
        "grand_n": pa.array([total] * len(ks), type=pa.int64()),
    })


def q_quarter_top_order(sf_dir: str):
    """Per-quarter revenue concentration: the largest single order vs
    the quarter total (cents) — bounded (year, quarter) partials with
    max+sum channels."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def _part(b: pa.Table) -> pa.Table:
        d = np.asarray(b.column("o_orderdate")).astype("datetime64[us]")
        mon = d.astype("datetime64[M]").astype(np.int64)
        qtr = mon // 3
        cents = np.floor(np.asarray(b.column("o_totalprice"))
                         * 100.0).astype(np.int64)
        uk, inv = np.unique(qtr, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, cents)
        return pa.table({
            "q": pa.array(uk),
            "mx": pa.array(mx),
            "tot": pa.array(ibincount(
                inv, weights=cents.astype(np.float64)).astype(np.int64)),
        })

    parts = orders.map_batches(_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["q"], [np.iinfo(np.int64).min, 0])
        e[0] = max(e[0], p["mx"])
        e[1] += p["tot"]
    ks = sorted(agg)
    return pa.table({
        "o_year": pa.array([k * 3 // 12 + 1970 for k in ks],
                           type=pa.int64()),
        "quarter": pa.array([k * 3 % 12 // 3 + 1 for k in ks],
                            type=pa.int64()),
        "max_cents": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "total_cents": pa.array([agg[k][1] for k in ks],
                                type=pa.int64()),
    })


NORM_TOPK = 5


def q_norm_outliers(sf_dir: str):
    """Embedding norm outliers: the NORM_TOPK vectors by quantized
    squared norm (DESC, tie vec_id) — the magnitude-outlier audit.
    Per-batch norms, global sort+limit."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def _n(b: pa.Table) -> pa.Table:
        ids, Q = _km_quant(b)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "norm2": pa.array([], type=pa.int64())})
        return pa.table({"vec_id": pa.array(ids),
                         "norm2": pa.array((Q * Q).sum(axis=1))})

    top = (emb.map_batches(_n, batch_format="pyarrow",
                           zero_copy_batch=True)
           .sort(["norm2", "vec_id"], descending=[True, False])
           .limit(NORM_TOPK).take_all())
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in top], type=pa.int64()),
        "norm2": pa.array([r["norm2"] for r in top], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 44: RFM segmentation, embedding ranges, part lift, Benford by
# type, slow gaps
# ---------------------------------------------------------------------------

RFM_R_DAYS = (400, 900)            # recency band edges (days)
RFM_F = (5, 12)                    # frequency band edges (orders)
RFM_M_CENTS = (10_000_000, 30_000_000)  # monetary band edges


def q_rfm_cells(sf_dir: str):
    """RFM segmentation: per customer recency (days since last order vs
    the global max date), frequency (order count) and monetary (total
    cents), bucketed into fixed integer bands and counted per (r, f,
    m) cell — the classic marketing segmentation cube, exact integers.
    One custkey reduce + bounded 27-cell combine."""
    import ray

    from ..core.shuffle import group_apply_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _per(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "last_us": pa.array([], type=pa.int64()),
                             "freq": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").astype(np.int64)
        c = np.floor(np.asarray(t.column("o_totalprice"))
                     * 100.0).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, d)
        return pa.table({
            "o_custkey": pa.array(uk),
            "last_us": pa.array(mx),
            "freq": pa.array(np.bincount(inv).astype(np.int64)),
            "cents": pa.array(ibincount(
                inv, weights=c.astype(np.float64)).astype(np.int64)),
        })

    per = group_apply_tasks(orders, ["o_custkey"], _per).materialize()
    gmax = max(p["mx"] for p in per.map_batches(
        lambda b: pa.table({"mx": pa.array(
            [int(np.asarray(b.column("last_us"),
                            dtype=np.int64).max())], type=pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).take_all())

    def _cells(b: pa.Table, *, _g=gmax) -> pa.Table:
        last = np.asarray(b.column("last_us"), dtype=np.int64)
        rec_days = (_g - last) // 86_400_000_000
        f = np.asarray(b.column("freq"), dtype=np.int64)
        m = np.asarray(b.column("cents"), dtype=np.int64)
        rb = ((rec_days > RFM_R_DAYS[0]).astype(np.int64)
              + (rec_days > RFM_R_DAYS[1]))
        fb = (f > RFM_F[0]).astype(np.int64) + (f > RFM_F[1])
        mb = ((m > RFM_M_CENTS[0]).astype(np.int64)
              + (m > RFM_M_CENTS[1]))
        key = rb * 9 + fb * 3 + mb
        cnt = np.bincount(key, minlength=27).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"k": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz])})

    parts = per.map_batches(_cells, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg = np.zeros(27, dtype=np.int64)
    for p in parts:
        agg[p["k"]] += p["n"]
    nz = np.nonzero(agg)[0]
    return pa.table({
        "r_band": pa.array(nz // 9),
        "f_band": pa.array((nz // 3) % 3),
        "m_band": pa.array(nz % 3),
        "n_customers": pa.array(agg[nz]),
    })


def q_emb_dim_range(sf_dir: str):
    """Per-dimension quantized min/max envelope — the feature-range
    audit completing `emb_dim_stats`. One columnar pass."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def _part(b: pa.Table) -> pa.Table:
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        return pa.table({
            "dim": pa.array(np.arange(mat.shape[1], dtype=np.int64)),
            "mn": pa.array(mat.min(axis=0)),
            "mx": pa.array(mat.max(axis=0)),
        })

    parts = emb.map_batches(_part, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["dim"], [p["mn"], p["mx"]])
        e[0] = min(e[0], p["mn"])
        e[1] = max(e[1], p["mx"])
    ks = sorted(agg)
    return pa.table({
        "dim": pa.array(ks, type=pa.int64()),
        "min_q": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "max_q": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


LIFT_SCALE = 1_000_000_000
LIFT_TOPK = 5
LIFT_MINSUP = 2


def q_part_lift_topk(sf_dir: str):
    """Market-basket lift for part pairs: integer association score
    support_ab * n_orders * SCALE // (support_a * support_b), pairs
    with support >= LIFT_MINSUP, top-LIFT_TOPK by (lift DESC, pair) —
    `colloc_lift`'s basket sibling. Pair counts from the per-order
    expansion; margins from one order-distinct pass."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def _o(b: pa.Table) -> pa.Table:
        ok = np.asarray(b.column("l_orderkey"), dtype=np.int64)
        pk = np.asarray(b.column("l_partkey"), dtype=np.int64)
        u = np.unique(_pack20(ok, pk))
        return pa.table({"l_orderkey": pa.array(u >> 20),
                         "l_partkey": pa.array(u & ((1 << 20) - 1))})

    d = li.map_batches(_o, batch_format="pyarrow",
                       zero_copy_batch=True)

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64()),
                          "ns": pa.array([], type=pa.int64()),
                          "s1": pa.array([], type=pa.int64()),
                          "p1": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        u = np.unique(_pack20(ok, pk))
        uo, up = u >> 20, u & ((1 << 20) - 1)
        cnt: dict[tuple, int] = {}
        starts = np.nonzero(np.concatenate(
            ([True], uo[1:] != uo[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(uo)]))
        for a, z in zip(starts, ends):
            row = up[a:z]
            for i in range(len(row)):
                for j in range(i + 1, len(row)):
                    k = (row[i], row[j])
                    cnt[k] = cnt.get(k, 0) + 1
        # marginals: per-part order counts + partition order count
        upk, pc_ = np.unique(up, return_counts=True)
        ks = list(cnt)
        return pa.table({
            "a": pa.array([k[0] for k in ks]
                          + upk.tolist() + [-1], type=pa.int64()),
            "b": pa.array([k[1] for k in ks]
                          + [-1] * len(upk) + [-1], type=pa.int64()),
            "cnt": pa.array([cnt[k] for k in ks]
                            + [0] * len(upk) + [0], type=pa.int64()),
            "ns": pa.array([0] * len(ks) + [0] * len(upk)
                           + [len(starts)], type=pa.int64()),
            "s1": pa.array([0] * len(ks) + pc_.astype(int).tolist()
                           + [0], type=pa.int64()),
            "p1": pa.array([0] * len(ks) + upk.tolist() + [-1],
                           type=pa.int64()),
        })

    parts = group_apply_tasks(d, ["l_orderkey"], _pairs).take_all()
    pair_cnt: dict[tuple, int] = {}
    marg: dict[int, int] = {}
    n_orders = 0
    for p in parts:
        if p["b"] >= 0:
            k = (p["a"], p["b"])
            pair_cnt[k] = pair_cnt.get(k, 0) + p["cnt"]
        elif p["p1"] >= 0:
            marg[p["p1"]] = marg.get(p["p1"], 0) + p["s1"]
        else:
            n_orders += p["ns"]
    rows = []
    for (a, b), cab in pair_cnt.items():
        if cab < LIFT_MINSUP:
            continue
        lift = cab * n_orders * LIFT_SCALE // (marg[a] * marg[b])
        rows.append((-lift, a, b, cab))
    rows.sort()
    rows = rows[:LIFT_TOPK]
    return pa.table({
        "p1": pa.array([r[1] for r in rows], type=pa.int64()),
        "p2": pa.array([r[2] for r in rows], type=pa.int64()),
        "support": pa.array([r[3] for r in rows], type=pa.int64()),
        "lift_scaled": pa.array([-r[0] for r in rows],
                                type=pa.int64()),
    })


def q_benford_by_type(sf_dir: str):
    """First-digit histogram PER EVENT TYPE (Benford audit by segment)
    — bounded (type x 9) partials."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _part(b: pa.Table) -> pa.Table:
        cents = np.floor(np.asarray(b.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        et = np.asarray(b.column("event_type")).astype(str)
        keep = cents > 0
        first = np.array([s[0] for s in cents[keep].astype(str)])
        key = np.char.add(np.char.add(et[keep], "\x1f"), first)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"event_type": pa.array(sp[:, 0].tolist(),
                                                type=pa.string()),
                         "digit": pa.array(sp[:, 2].tolist(),
                                           type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["event_type"], p["digit"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array([k[0] for k in ks], type=pa.string()),
        "digit": pa.array([k[1] for k in ks], type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


SLOW_GAP_US = 3_600_000_000


def q_slow_gaps(sf_dir: str):
    """Tail-latency budget: per event type, consecutive-event gaps
    within user streams and how many exceed one hour (per the FROM
    event's type) — the SLO-breach counter. One user shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def _g(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_gaps": pa.array([], type=pa.int64()),
                          "n_over": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        ut, tc = np.unique(np.asarray(t.column("event_type"))
                           .astype(str), return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, s, c = uid[order], ts[order], tc[order]
        same = u[1:] == u[:-1]
        frm = c[:-1][same]
        over = (s[1:] - s[:-1])[same] > SLOW_GAP_US
        if not len(frm):
            return empty
        uk, inv = np.unique(frm, return_inverse=True)
        return pa.table({
            "event_type": pa.array(ut[uk].tolist(), type=pa.string()),
            "n_gaps": pa.array(np.bincount(inv).astype(np.int64)),
            "n_over": pa.array(ibincount(
                inv, weights=over.astype(np.float64)).astype(np.int64)),
        })

    parts = group_apply_tasks(ev, ["user_id"], _g).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["event_type"], [0, 0])
        e[0] += p["n_gaps"]
        e[1] += p["n_over"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "n_gaps": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_over": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 45: repo density, source modal language, aspect histogram,
# token second moment, status-priority grid
# ---------------------------------------------------------------------------


def q_repo_density(sf_dir: str):
    """Per-repo import-graph density numerators: file count and
    INTERNAL edge count (both endpoints in the repo, repo = arith %
    100) — the block-density profile of the corpus partitioning.
    Attribute vector broadcast; bounded 100-row partials."""
    from ..core.ids import arith_mod_hist

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _part(b: pa.Table, *, _d=dec) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        rs, rd = _d.arith(s) % 100, _d.arith(d) % 100
        same = rs == rd
        uk, c = np.unique(rs[same], return_counts=True)
        return pa.table({"repo": pa.array(uk),
                         "e": pa.array(c.astype(np.int64))})

    parts = ctx.edges.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["repo"]] = agg.get(p["repo"], 0) + p["e"]
    # per-dict-chunk bincount partials (100 values per chunk), not an O(n)
    # driver arith array
    files = arith_mod_hist(ctx.vdict, 100)
    ks = sorted(set(range(100)) & set(np.nonzero(files)[0].tolist()))
    return pa.table({
        "repo": pa.array([f"repo_{k}" for k in ks], type=pa.string()),
        "n_files": pa.array([int(files[k]) for k in ks],
                            type=pa.int64()),
        "internal_edges": pa.array([agg.get(k, 0) for k in ks],
                                   type=pa.int64()),
    })


def q_source_modal_lang(sf_dir: str):
    """Source purity: per source the modal language (tie ->
    alphabetical) with its count and the source total — the
    slice-purity audit. Bounded (source x lang) partials."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def _part(b: pa.Table) -> pa.Table:
        src = np.asarray(b.column("source")).astype(str)
        lng = np.asarray(b.column("lang")).astype(str)
        key = np.char.add(np.char.add(src, "\x1f"), lng)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"source": pa.array(sp[:, 0].tolist(),
                                            type=pa.string()),
                         "lang": pa.array(sp[:, 2].tolist(),
                                          type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["source"], p["lang"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    best: dict[str, tuple] = {}
    total: dict[str, int] = {}
    for (src, lng), c in agg.items():
        total[src] = total.get(src, 0) + c
        cur = best.get(src)
        if cur is None or (-c, lng) < (-cur[1], cur[0]):
            best[src] = (lng, c)
    ks = sorted(best)
    return pa.table({
        "source": pa.array(ks, type=pa.string()),
        "modal_lang": pa.array([best[k][0] for k in ks],
                               type=pa.string()),
        "modal_cnt": pa.array([best[k][1] for k in ks],
                              type=pa.int64()),
        "total": pa.array([total[k] for k in ks], type=pa.int64()),
    })


def q_aspect_hist(sf_dir: str):
    """Image aspect histogram: payload counts per (width, height)
    through the decode actor pool — the shape-bucketing knob for
    batched image processing."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")
    stats = blobs.map_batches(
        M.IntStatsStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )

    def _h(b: pa.Table) -> pa.Table:
        w = np.asarray(b.column("width"), dtype=np.int64)
        h = np.asarray(b.column("height"), dtype=np.int64)
        key = w * 64 + h
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = stats.map_batches(_h, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["k"]] = agg.get(p["k"], 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "width": pa.array([k // 64 for k in ks], type=pa.int64()),
        "height": pa.array([k % 64 for k in ks], type=pa.int64()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_token_f2(sf_dir: str):
    """Vocabulary collision mass: total tokens, distinct tokens and the
    second moment sum f^2 over global token frequencies (the Simpson
    /collision statistic behind dedup-shingle sizing). Per-batch
    partials -> one token shuffle (frequencies complete per key)."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def _part(b: pa.Table) -> pa.Table:
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        uk, c = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(uk.tolist(), type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    pairs = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _m(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "d": pa.array([], type=pa.int64()),
                             "f2": pa.array([], type=pa.int64())})
        tok = np.asarray(t.column("tok")).astype(str)
        c = np.asarray(t.column("cnt"), dtype=np.int64)
        uk, inv = np.unique(tok, return_inverse=True)
        f = ibincount(inv, weights=c.astype(np.float64)).astype(
            np.int64)
        return pa.table({"n": pa.array([int(f.sum())], type=pa.int64()),
                         "d": pa.array([len(uk)], type=pa.int64()),
                         "f2": pa.array([int((f * f).sum())],
                                        type=pa.int64())})

    parts = group_apply_tasks(pairs, ["tok"], _m).take_all()
    return pa.table({
        "n_tokens": pa.array([sum(p["n"] for p in parts)],
                             type=pa.int64()),
        "n_distinct": pa.array([sum(p["d"] for p in parts)],
                               type=pa.int64()),
        "sum_f2": pa.array([sum(p["f2"] for p in parts)],
                           type=pa.int64()),
    })


def q_status_priority_grid(sf_dir: str):
    """Order (status x priority) contingency grid — the workload-mix
    snapshot, bounded 15-cell partials."""
    import ray

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    )

    def _part(b: pa.Table) -> pa.Table:
        st = np.asarray(b.column("o_orderstatus")).astype(str)
        pr = np.asarray(b.column("o_orderpriority")).astype(str)
        key = np.char.add(np.char.add(st, "\x1f"), pr)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"o_orderstatus": pa.array(sp[:, 0].tolist(),
                                                   type=pa.string()),
                         "o_orderpriority": pa.array(
                             sp[:, 2].tolist(), type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = orders.map_batches(_part, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["o_orderstatus"], p["o_orderpriority"])
        agg[k] = agg.get(k, 0) + p["cnt"]
    ks = sorted(agg)
    return pa.table({
        "o_orderstatus": pa.array([k[0] for k in ks], type=pa.string()),
        "o_orderpriority": pa.array([k[1] for k in ks],
                                    type=pa.string()),
        "cnt": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 46: class outliers, vertex net flow, DAG layer histogram,
# linenumber audit, cross-repo cut
# ---------------------------------------------------------------------------


def q_class_outliers(sf_dir: str):
    """In-class embedding outliers: per label, members whose squared
    distance to the label's floor-mean centroid exceeds 2x the label's
    mean squared distance (division-free: d2 * n > 2 * sum_d2) —
    the mislabeled-sample screen. Pass 1 builds centroids (exact
    integer sums), pass 2 accumulates d2 sums, pass 3 counts; all
    bounded (labels x dims) driver state."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def _sums(b: pa.Table) -> pa.Table:
        lab = np.asarray(b.column("label"), dtype=np.int64)
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        ul, inv = np.unique(lab, return_inverse=True)
        dims = mat.shape[1]
        sums = np.zeros((len(ul), dims), dtype=np.int64)
        np.add.at(sums, inv, mat)
        return pa.table({
            "label": pa.array(np.repeat(ul, dims)),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                    len(ul))),
            "s": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(np.bincount(inv).astype(np.int64),
                                    dims)),
        })

    parts = emb.map_batches(_sums, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        e = agg.setdefault((p["label"], p["dim"]), [0, 0])
        e[0] += p["s"]
        e[1] += p["n"]
    labels = sorted({k[0] for k in agg})
    dims = max(k[1] for k in agg) + 1
    cent = {}
    nmem = {}
    for l in labels:
        cent[l] = np.array([agg[(l, d)][0] // agg[(l, d)][1]
                            for d in range(dims)], dtype=np.int64)
        nmem[l] = agg[(l, 0)][1]
    cref = ray.put((np.array(labels, dtype=np.int64),
                    np.stack([cent[l] for l in labels])))

    def _d2(b: pa.Table, *, _ref=cref) -> pa.Table:
        ls, C = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        lab = np.asarray(b.column("label"), dtype=np.int64)
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        li = np.searchsorted(ls, lab)
        diff = mat - C[li]
        d2 = (diff * diff).sum(axis=1)
        ul, inv = np.unique(lab, return_inverse=True)
        return pa.table({"label": pa.array(ul),
                         "sd2": pa.array(ibincount(
                             inv, weights=d2.astype(np.float64)
                         ).astype(np.int64))})

    parts = emb.map_batches(_d2, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    sum_d2: dict[int, int] = {}
    for p in parts:
        sum_d2[p["label"]] = sum_d2.get(p["label"], 0) + p["sd2"]
    sref = ray.put((np.array(labels, dtype=np.int64),
                    np.array([sum_d2[l] for l in labels],
                             dtype=np.int64),
                    np.array([nmem[l] for l in labels],
                             dtype=np.int64)))

    def _cnt(b: pa.Table, *, _c=cref, _s=sref) -> pa.Table:
        ls, C = _c if isinstance(_c, tuple) else ray.get(_c)
        ls2, S, N = _s if isinstance(_s, tuple) else ray.get(_s)
        lab = np.asarray(b.column("label"), dtype=np.int64)
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        li = np.searchsorted(ls, lab)
        diff = mat - C[li]
        d2 = (diff * diff).sum(axis=1)
        out = d2 * N[li] > 2 * S[li]
        ul, inv = np.unique(lab, return_inverse=True)
        return pa.table({"label": pa.array(ul),
                         "n_out": pa.array(ibincount(
                             inv, weights=out.astype(np.float64)
                         ).astype(np.int64))})

    parts = emb.map_batches(_cnt, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    n_out: dict[int, int] = {}
    for p in parts:
        n_out[p["label"]] = n_out.get(p["label"], 0) + p["n_out"]
    return pa.table({
        "label": pa.array(labels, type=pa.int64()),
        "n": pa.array([nmem[l] for l in labels], type=pa.int64()),
        "n_outliers": pa.array([n_out.get(l, 0) for l in labels],
                               type=pa.int64()),
    })


def q_vertex_netflow(sf_dir: str):
    """Vertex flow imbalance over dedup-summed weights: counts of
    source-like (out > in), sink-like (in > out) and balanced vertices
    plus the extreme net flows — the conservation audit. Two fused
    degree vectors."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    outw = eng.out_weights().astype(np.int64)
    inw = eng.in_weights().astype(np.int64)
    net = outw - inw
    return pa.table({
        "n_sources": pa.array([int((net > 0).sum())], type=pa.int64()),
        "n_sinks": pa.array([int((net < 0).sum())], type=pa.int64()),
        "n_balanced": pa.array([int((net == 0).sum())],
                               type=pa.int64()),
        "max_net": pa.array([int(net.max())], type=pa.int64()),
        "min_net": pa.array([int(net.min())], type=pa.int64()),
    })


def q_dag_layer_hist(sf_dir: str):
    """Critical-path layer histogram: vertex counts per longest-path
    layer of the dense-order DAG (`dag_layers` summarized) — the
    pipeline-stage width profile."""
    t = q_dag_layers(sf_dir)
    lay = np.asarray(t.column("layer"), dtype=np.int64)
    uk, c = np.unique(lay, return_counts=True)
    return pa.table({
        "layer": pa.array(uk, type=pa.int64()),
        "n_vertices": pa.array(c.astype(np.int64)),
    })


def q_linenumber_audit(sf_dir: str):
    """Lineitem linenumber contiguity assertion: per order, does
    max(l_linenumber) equal the line count (1-based dense)? —
    (n_orders, n_violations). One orderkey reduce."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"],
    )

    def _a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return pa.table({"n": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        ln = np.asarray(t.column("l_linenumber"), dtype=np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, ln)
        cnt = np.bincount(inv)
        bad = mx != cnt
        return pa.table({"n": pa.array([len(uk)], type=pa.int64()),
                         "v": pa.array([int(bad.sum())],
                                       type=pa.int64())})

    parts = group_apply_tasks(li, ["l_orderkey"], _a).take_all()
    return pa.table({
        "n_orders": pa.array([sum(p["n"] for p in parts)],
                             type=pa.int64()),
        "n_violations": pa.array([sum(p["v"] for p in parts)],
                                 type=pa.int64()),
    })


XREPO_TOPK = 10


def q_repo_cross_topk(sf_dir: str):
    """Cross-repo cut profile: the XREPO_TOPK repo pairs by directed
    cross-edge count (tie -> pair asc) plus the total cut — what a
    repo-partitioned placement would ship. Bounded (100 x 100) pair
    partials."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _part(b: pa.Table, *, _d=dec) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        rs, rd = _d.arith(s) % 100, _d.arith(d) % 100
        cross = rs != rd
        key = rs[cross] * 100 + rd[cross]
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    parts = ctx.edges.map_batches(_part, batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["k"]] = agg.get(p["k"], 0) + p["c"]
    total = sum(agg.values())
    top = sorted(agg, key=lambda k: (-agg[k], k))[:XREPO_TOPK]
    return pa.table({
        "repo_a": pa.array([f"repo_{k // 100}" for k in top],
                           type=pa.string()),
        "repo_b": pa.array([f"repo_{k % 100}" for k in top],
                           type=pa.string()),
        "cnt": pa.array([agg[k] for k in top], type=pa.int64()),
        "total_cut": pa.array([total] * len(top), type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 47: monthly active customers, round-number bias, dimension sign
# correlation, user span, part-name vocabulary
# ---------------------------------------------------------------------------


def q_monthly_active_customers(sf_dir: str):
    """Monthly active customers: distinct ordering customers per
    calendar month — the MAU curve. Distinct (custkey, month) pairs
    per batch -> one keyed shuffle -> bounded month counts."""
    import ray

    from ..core.shuffle import group_apply_tasks

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def _pairs(b: pa.Table) -> pa.Table:
        ck = np.asarray(b.column("o_custkey"), dtype=np.int64)
        mon = (np.asarray(b.column("o_orderdate"))
               .astype("datetime64[us]").astype("datetime64[M]")
               .astype(np.int64))
        key = np.unique(ck << 16 | mon)
        return pa.table({"o_custkey": pa.array(key >> 16),
                         "mon": pa.array(key & ((1 << 16) - 1))})

    pairs = orders.map_batches(_pairs, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "mon" not in t.column_names:
            return pa.table({"mon": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        key = np.unique(
            np.asarray(t.column("o_custkey"), dtype=np.int64) << 16
            | np.asarray(t.column("mon"), dtype=np.int64))
        um, c = np.unique(key & ((1 << 16) - 1), return_counts=True)
        return pa.table({"mon": pa.array(um),
                         "n": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(pairs, ["mon"], _cnt).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["mon"]] = agg.get(p["mon"], 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "o_year": pa.array([k // 12 + 1970 for k in ks],
                           type=pa.int64()),
        "o_month": pa.array([k % 12 + 1 for k in ks], type=pa.int64()),
        "active_customers": pa.array([agg[k] for k in ks],
                                     type=pa.int64()),
    })


def q_round_bias(sf_dir: str):
    """Round-number bias: per event type, values landing on whole
    dollars (cents % 100 == 0) — the human-entry / synthetic-data
    fingerprint beside Benford. Bounded partials."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def _part(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type")).astype(str)
        cents = np.floor(np.asarray(b.column("value")) * 100.0
                         + 0.5).astype(np.int64)
        rnd = cents % 100 == 0
        ue, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(ue.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_round": pa.array(ibincount(
                inv, weights=rnd.astype(np.float64)).astype(np.int64)),
        })

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["event_type"], [0, 0])
        e[0] += p["n"]
        e[1] += p["n_round"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_round": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


SIGN_TOPK = 10
SIGN_MID = 1 << 19  # q > mid  <=>  raw value > 0


def q_dim_sign_corr(sf_dir: str):
    """Feature sign co-occurrence: for every dimension pair, how many
    vectors agree in sign (q > 2^19 on both or neither) — computed as
    the +-1 Gram matrix (agree = (n + B^T B) / 2, exact integers, one
    matmul per batch), top-SIGN_TOPK pairs by agreement (tie -> pair
    asc). The redundant-feature screen."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def _gram(b: pa.Table) -> pa.Table:
        mat = np.stack([
            np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                     * (1 << 20)).astype(np.int64)
            for e in b.column("embedding").to_pylist()])
        B = np.where(mat > SIGN_MID, 1, -1).astype(np.int64)
        G = B.T @ B  # (dims, dims)
        dims = G.shape[0]
        iu, ju = np.triu_indices(dims, k=1)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "g": pa.array(G[iu, ju]),
            "n": pa.array(np.full(len(iu), len(mat), np.int64)),
        })

    parts = emb.map_batches(_gram, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        e = agg.setdefault((p["i"], p["j"]), [0, 0])
        e[0] += p["g"]
        e[1] += p["n"]
    rows = []
    for (i, j), (g, n) in agg.items():
        rows.append((-(n + g) // 2, i, j, (n + g) // 2, n))
    rows.sort()
    rows = rows[:SIGN_TOPK]
    return pa.table({
        "dim_i": pa.array([r[1] for r in rows], type=pa.int64()),
        "dim_j": pa.array([r[2] for r in rows], type=pa.int64()),
        "agree": pa.array([r[3] for r in rows], type=pa.int64()),
        "n": pa.array([r[4] for r in rows], type=pa.int64()),
    })


def q_user_span(sf_dir: str):
    """Per-user activity envelope: first/last event day and event
    count — the lifetime-span table. One user reduce."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def _env(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "span_days": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        day = (np.asarray(t.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        uk, inv = np.unique(uid, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, day)
        np.maximum.at(mx, inv, day)
        return pa.table({"user_id": pa.array(uk),
                         "span_days": pa.array(mx - mn),
                         "n_events": pa.array(
                             np.bincount(inv).astype(np.int64))})

    return group_apply_tasks(ev, ["user_id"], _env)


PNAME_TOPK = 10


def q_pname_vocab_topk(sf_dir: str):
    """Dimension-table vocabulary: the PNAME_TOPK most common words in
    part names (cnt DESC, word ASC) — attribute-text profiling on the
    small side. Bounded partials."""
    import ray

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )

    def _v(b: pa.Table) -> pa.Table:
        col = b.column("p_name")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, " ")
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        uk, c = np.unique(flat, return_counts=True)
        return pa.table({"word": pa.array(uk.tolist(),
                                          type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = part.map_batches(_v, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["word"]] = agg.get(p["word"], 0) + p["cnt"]
    top = sorted(agg, key=lambda k: (-agg[k], k))[:PNAME_TOPK]
    return pa.table({
        "word": pa.array(top, type=pa.string()),
        "cnt": pa.array([agg[k] for k in top], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 48: session size histogram, degree tails, document extremes
# ---------------------------------------------------------------------------


def q_session_size_hist(sf_dir: str):
    """Session-size distribution: sessions with k events under the
    30-minute-gap rule — `bounce_stats` generalized to the full
    histogram. One user shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap_us = SESSION_GAP_MIN * 60_000_000

    def _h(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"size": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts")).astype("datetime64[us]").astype(
            np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        new_sess = np.ones(len(u), dtype=bool)
        new_sess[1:] = (u[1:] != u[:-1]) | (s[1:] - s[:-1] > gap_us)
        sizes = np.bincount(np.cumsum(new_sess))[1:]
        uk, c = np.unique(sizes, return_counts=True)
        return pa.table({"size": pa.array(uk.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(ev, ["user_id"], _h).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[p["size"]] = agg.get(p["size"], 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "size": pa.array(ks, type=pa.int64()),
        "n_sessions": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_degree_tails(sf_dir: str):
    """Degree-tail audit of the undirected structural graph: isolated
    and pendant (degree-1) vertex counts plus the maximum degree and
    how many vertices attain it — the hub/fringe summary."""
    ctx = get_context(sf_dir)
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    mx = int(deg.max())
    return pa.table({
        "n_isolated": pa.array([int((deg == 0).sum())],
                               type=pa.int64()),
        "n_pendant": pa.array([int((deg == 1).sum())],
                              type=pa.int64()),
        "max_deg": pa.array([mx], type=pa.int64()),
        "n_at_max": pa.array([int((deg == mx).sum())],
                             type=pa.int64()),
    })


def q_doc_length_extremes(sf_dir: str):
    """Document length extremes: the shortest and longest documents by
    n_chars (ties -> lowest doc_id) — the envelope lookup. Per-batch
    argmin/argmax partials."""
    import ray

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def _ex(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        nc = np.asarray(b.column("n_chars"), dtype=np.int64)
        lo = min(zip(nc.tolist(), ids.tolist()))
        hi = min(zip((-nc).tolist(), ids.tolist()))
        return pa.table({
            "lo_c": pa.array([lo[0]], type=pa.int64()),
            "lo_id": pa.array([lo[1]], type=pa.int64()),
            "hi_c": pa.array([-hi[0]], type=pa.int64()),
            "hi_id": pa.array([hi[1]], type=pa.int64()),
        })

    parts = docs.map_batches(_ex, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    lo = min((p["lo_c"], p["lo_id"]) for p in parts)
    hi = min((-p["hi_c"], p["hi_id"]) for p in parts)
    return pa.table({
        "min_chars": pa.array([lo[0]], type=pa.int64()),
        "min_doc": pa.array([lo[1]], type=pa.int64()),
        "max_chars": pa.array([-hi[0]], type=pa.int64()),
        "max_doc": pa.array([hi[1]], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 49 (round 4): RandReduce functor end-to-end
# ---------------------------------------------------------------------------

RR_SEED = 11


def q_rand_parent(sf_dir: str):
    """Seeded pseudo-random in-neighbor per vertex — the `RandReduce`
    random tie-break functor (reference ``Operations.h:184-201``, used
    for random parent/star hooks) as its deterministic, oracle-exact
    analog: reduce = min over packed ``h(a_src) << 31 | a_src`` keys
    (split-key Knuth scramble over ARITHMETIC ids; associative, so any
    reduction tree — per-batch partials then a dst-keyed shuffle min —
    picks the same pseudo-random representative). Output
    (label, parent)."""
    from ..core.shuffle import group_apply_tasks
    from ..core.vecops import rand_reduce_decode, rand_reduce_key

    ctx = get_context(sf_dir)
    dec = ctx.decoder()

    def _partial(batch: pa.Table, *, _d=dec) -> pa.Table:
        dst = np.asarray(batch.column("dst"))
        src = np.asarray(batch.column("src"))
        key = rand_reduce_key(_d.arith(src), seed=RR_SEED)
        order = np.lexsort((key, dst))
        dst, key = dst[order], key[order]
        ud, starts = np.unique(dst, return_index=True)
        return pa.table({"dst": pa.array(ud.astype(np.int64)),
                         "k": pa.array(key[starts])})

    part = ctx.edges.map_batches(_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def _final(t: pa.Table, *, _d=dec) -> pa.Table:
        if t.num_rows == 0 or "dst" not in t.column_names:
            return pa.table({"label": pa.array([], type=pa.string()),
                             "parent": pa.array([], type=pa.string())})
        dst = np.asarray(t.column("dst"), dtype=np.int64)
        k = np.asarray(t.column("k"), dtype=np.int64)
        order = np.lexsort((k, dst))
        dst, k = dst[order], k[order]
        ud, starts = np.unique(dst, return_index=True)
        parent_a = rand_reduce_decode(k[starts])
        parent = np.char.add("m_", parent_a.astype("U"))
        return pa.table({"label": _d.take(ud),
                         "parent": pa.array(parent, type=pa.string())})

    return group_apply_tasks(part, ["dst"], _final)


def q_sigma_hist(sf_dir: str):
    """Shortest-path-count histogram from m_0: (sigma, n_vertices) over
    the reached set — the aggregate face of the exact int64 sigma
    channel (`plus_times_i64` + 2^61 tripwire; per-vertex twin:
    `bfs_sigma`)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    d, sig = alg.bfs_sigma(ctx.engine("sym"), root, iters=BFS_ITERS)
    reached = np.isfinite(d)
    uk, cnt = np.unique(sig[reached], return_counts=True)
    return pa.table({
        "sigma": pa.array(uk.astype(np.int64)),
        "n_vertices": pa.array(cnt.astype(np.int64)),
    })


PREP_MIN_TOKS = 5
PREP_MIN_DR_NUM, PREP_MIN_DR_DEN = 1, 2  # distinct_ratio >= 1/2


def q_prep_corpus(sf_dir: str):
    """The LLM-data preparation flagship as ONE pipeline: exact dedup
    (keep only each duplicate group's canonical min-id doc) -> quality
    gate (>= PREP_MIN_TOKS tokens, distinct-token ratio >= 1/2) ->
    deterministic md5 train/val/test split. One digest-keyed shuffle;
    the quality stats ride the dedup rows, so the whole prep is a single
    pass + one exchange. Output (doc_id, split, n_tokens)."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import dedup_key
    from ..functions.text import md5_lower64

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def _keyed(batch: pa.Table) -> pa.Table:
        import hashlib

        keys = dedup_key(batch)
        ks = np.asarray(keys).astype(str)
        uniq, inv = np.unique(ks, return_inverse=True)
        if len(uniq):
            dgs = np.frombuffer(
                b"".join(
                    hashlib.blake2b(k.encode(), digest_size=16).digest()
                    for k in uniq
                ),
                dtype=np.int64,
            ).reshape(-1, 2)
        else:
            dgs = np.zeros((0, 2), dtype=np.int64)
        toks = pc.split_pattern(batch.column("text"), " ")
        ntoks = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # distinct tokens per doc = the dedup key's token count
        ndist = np.char.count(uniq[inv].astype(str), " ") + 1
        return pa.table({
            "kh": pa.array(dgs[inv, 0]),
            "kh2": pa.array(dgs[inv, 1]),
            "doc_id": batch.column("doc_id"),
            "ntoks": pa.array(ntoks),
            "ndist": pa.array(ndist.astype(np.int64)),
        })

    def _canon(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "split": pa.array([], type=pa.string()),
                          "n_tokens": pa.array([], type=pa.int64())})
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        k1 = np.asarray(batch.column("kh"), dtype=np.int64)
        k2 = np.asarray(batch.column("kh2"), dtype=np.int64)
        nt = np.asarray(batch.column("ntoks"), dtype=np.int64)
        nd = np.asarray(batch.column("ndist"), dtype=np.int64)
        order = np.lexsort((ids, k2, k1))
        ids, k1, k2, nt, nd = (ids[order], k1[order], k2[order],
                               nt[order], nd[order])
        new = np.ones(len(ids), dtype=bool)
        new[1:] = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        ids, nt, nd = ids[new], nt[new], nd[new]  # canonical reps
        keep = (nt >= PREP_MIN_TOKS) & (
            nd * PREP_MIN_DR_DEN >= nt * PREP_MIN_DR_NUM)
        ids, nt = ids[keep], nt[keep]
        if not len(ids):
            return empty
        h = np.fromiter((md5_lower64(str(int(i))) % 10 for i in ids),
                        dtype=np.int64, count=len(ids))
        names = np.array(["train", "val", "test"])
        split = names[np.where(h < SPLIT_TRAIN, 0,
                               np.where(h < SPLIT_TRAIN + SPLIT_VAL, 1, 2))]
        return pa.table({
            "doc_id": pa.array(ids),
            "split": pa.array(split, type=pa.string()),
            "n_tokens": pa.array(nt),
        })

    keyed = docs.map_batches(_keyed, batch_format="pyarrow")
    return group_apply_tasks(keyed, ["kh", "kh2"], _canon)


# ---------------------------------------------------------------------------
# wave 50: edge support census, SymSpell edit-1 vocabulary pairs,
# above-own-average orders, order-to-ship lag quantiles, 1-NN margins
# ---------------------------------------------------------------------------


def q_edge_support_hist(sf_dir: str):
    """Per-edge triangle-SUPPORT histogram over the distinct undirected
    edge set (k-truss's peel predicate as a census; support 0 = local
    bridges) — one distributed wedge/close pass of the k-truss plan
    (`alg.edge_support_hist`; reference recipe `SpParMat.h:161` +
    `ParFriends.h:1447`), per-partition histograms only on the
    driver."""
    ctx = get_context(sf_dir)
    sv, sc = alg.edge_support_hist(ctx.graph("sym").edges, ctx.n)
    return pa.table({"support": pa.array(sv, type=pa.int64()),
                     "n_edges": pa.array(sc, type=pa.int64())})


def _tok_vocab_fn(col: str):
    """Batch kernel: distinct whitespace tokens of `col` as a `tok`
    table (the vocabulary partial for edit1_pairs)."""

    def _f(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table({"tok": pa.array([], type=pa.string())})
        toks = pc.list_flatten(pc.split_pattern(b.column(col), " "))
        return pa.table({"tok": pc.unique(toks).cast(pa.string())})

    return _f


def q_edit1_pairs(sf_dir: str):
    """All vocabulary pairs at levenshtein distance exactly 1 over the
    union of document tokens and part-name words — the SymSpell
    deletion-neighborhood near-dup operator (`dedup.edit1_pairs`): no
    quadratic verify, candidates are distance<=1 by construction."""
    import ray

    from ..functions.dedup import edit1_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_name"])
    return edit1_pairs(
        docs.map_batches(_tok_vocab_fn("text"), batch_format="pyarrow",
                         zero_copy_batch=True),
        parts.map_batches(_tok_vocab_fn("p_name"), batch_format="pyarrow",
                          zero_copy_batch=True),
    )


def q_above_avg_orders(sf_dir: str):
    """Per customer: order count and how many of their own orders are
    strictly above their personal average price — the correlated-
    subquery pattern, exact via the integer cross-multiplication
    cents*n > sum_cents (no division). One custkey shuffle,
    whole-partition vectorized."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], type=pa.int64()),
                          "n_orders": pa.array([], type=pa.int64()),
                          "n_above": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cents = np.floor(
            np.asarray(t.column("o_totalprice"), dtype=np.float64) * 100
            + 0.5).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = ibincount(inv, cents)
        above = cents * n[inv] > s[inv]
        na = ibincount(inv, above, minlength=len(uk))
        return pa.table({"o_custkey": pa.array(uk),
                         "n_orders": pa.array(n),
                         "n_above": pa.array(na)})

    return group_apply_tasks(o, ["o_custkey"], _k)


SHIP_LAG_QS = (0.5, 0.9)


def q_ship_lag_stats(sf_dir: str):
    """Order-to-ship lag (whole days, exact: timestamps are
    midnight-aligned) quantiles/extremes per order priority — the
    fulfillment-latency profile. One co-partitioned hash join
    (orderkey) with the lag computation fused into the join task, then
    one priority shuffle with a whole-partition sort+pick quantile
    kernel (`quantile_disc` semantics, element-exact)."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    US_DAY = np.int64(86_400_000_000)

    def _lag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"prio": pa.array([], type=pa.string()),
                             "lag": pa.array([], type=pa.int64())})
        ship = np.asarray(t.column("l_shipdate")).astype(
            "datetime64[us]").view(np.int64)
        ordd = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64)
        return pa.table({
            "prio": t.column("o_orderpriority"),
            "lag": pa.array((ship - ordd) // US_DAY),
        })

    lags = hash_join_tasks(li, o, on="l_orderkey",
                           right_on="o_orderkey", post=_lag)

    def _q(t: pa.Table) -> pa.Table:
        empty = pa.table({"prio": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "lag_q50": pa.array([], type=pa.int64()),
                          "lag_q90": pa.array([], type=pa.int64()),
                          "lag_min": pa.array([], type=pa.int64()),
                          "lag_max": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "prio" not in t.column_names:
            return empty
        p = np.asarray(t.column("prio")).astype(str)
        v = np.asarray(t.column("lag"), dtype=np.int64)
        order = np.lexsort((v, p))
        p, v = p[order], v[order]
        keys, starts, cnts = np.unique(p, return_index=True,
                                       return_counts=True)
        cols = {"prio": pa.array(keys.tolist(), type=pa.string()),
                "n": pa.array(cnts.astype(np.int64))}
        for name, qq in zip(("lag_q50", "lag_q90"), SHIP_LAG_QS):
            idx = starts + np.minimum(
                cnts - 1, np.ceil(qq * cnts).astype(np.int64) - 1)
            cols[name] = pa.array(v[idx])
        cols["lag_min"] = pa.array(v[starts])
        cols["lag_max"] = pa.array(v[starts + cnts - 1])
        return pa.table(cols)

    return group_apply_tasks(lags, ["prio"], _q)


def q_knn_margin(sf_dir: str):
    """Per-label 1-NN MARGIN statistics over the first KNN1_N
    embeddings: margin = (best same-label dot) - (best other-label dot)
    on the exact quantized integer dots (the separability face of
    `knn1_accuracy`). Subset matrix broadcast once via ray.put;
    per-batch vectorized masked-argmax partials; exact int64 sums."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < KNN1_N,
    )
    all_rows = emb.take_all()  # bounded: KNN1_N rows by construction
    all_rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in all_rows],
                           type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in all_rows]),
    })
    aids, amat = _km_quant(tt)
    alab = np.array([r["label"] for r in all_rows], dtype=np.int64)
    aref = ray.put((aids, amat, alab))
    I64MIN = np.iinfo(np.int64).min

    def _mg(t: pa.Table, *, _ref=aref) -> pa.Table:
        empty = pa.table({"label": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "n_pos": pa.array([], type=pa.int64()),
                          "sum_margin": pa.array([], type=pa.int64())})
        ai, am, al = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        lab = np.asarray(t.column("label"), dtype=np.int64)
        if len(ids) == 0:
            return empty
        d = Q @ am.T
        d[ids[:, None] == ai[None, :]] = I64MIN  # exclude self
        same = lab[:, None] == al[None, :]
        bs = np.where(same, d, I64MIN).max(axis=1)
        bo = np.where(~same, d, I64MIN).max(axis=1)
        ok = (bs > I64MIN) & (bo > I64MIN)
        if not ok.any():
            return empty
        lab, bs, bo = lab[ok], bs[ok], bo[ok]
        uk, inv = np.unique(lab, return_inverse=True)
        return pa.table({
            "label": pa.array(uk),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_pos": pa.array(ibincount(inv, bs > bo, minlength=len(uk))),
            "sum_margin": pa.array(ibincount(inv, bs - bo,
                                             minlength=len(uk))),
        })

    parts = emb.map_batches(_mg, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(int(p["label"]), [0, 0, 0])
        e[0] += p["n"]
        e[1] += p["n_pos"]
        e[2] += p["sum_margin"]
    ks = sorted(agg)
    return pa.table({
        "label": pa.array(ks, type=pa.int64()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_pos": pa.array([agg[k][1] for k in ks], type=pa.int64()),
        "sum_margin": pa.array([agg[k][2] for k in ks],
                               type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 51: 1-NN confusion matrix, repeat buyers, cross-modal lang norms,
# msbfs distance histogram, vocabulary growth curve
# ---------------------------------------------------------------------------


def q_knn_confusion(sf_dir: str):
    """Full 1-NN label CONFUSION MATRIX over the first KNN1_N
    embeddings (true label x nearest-neighbor label x count) — the
    matrix face of `knn1_accuracy`, same exact quantized-dot plan:
    subset broadcast once, per-batch argmax + packed-pair count
    partials."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=pc.field("vec_id") < KNN1_N,
    )
    all_rows = emb.take_all()  # bounded: KNN1_N rows by construction
    all_rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in all_rows],
                           type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in all_rows]),
    })
    aids, amat = _km_quant(tt)
    alab = np.array([r["label"] for r in all_rows], dtype=np.int64)
    aref = ray.put((aids, amat, alab))
    NLAB = np.int64(int(alab.max()) + 1 if len(alab) else 1)

    def _cf(t: pa.Table, *, _ref=aref) -> pa.Table:
        empty = pa.table({"true_label": pa.array([], type=pa.int64()),
                          "pred_label": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        ai, am, al = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        lab = np.asarray(t.column("label"), dtype=np.int64)
        if len(ids) == 0:
            return empty
        d = Q @ am.T
        d[ids[:, None] == ai[None, :]] = np.iinfo(np.int64).min
        best = np.argmax(d, axis=1)  # tie -> lowest id (first max)
        key = lab * NLAB + al[best]
        uk, c = np.unique(key, return_counts=True)
        return pa.table({"true_label": pa.array(uk // NLAB),
                         "pred_label": pa.array(uk % NLAB),
                         "n": pa.array(c.astype(np.int64))})

    parts = emb.map_batches(_cf, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (int(p["true_label"]), int(p["pred_label"]))
        agg[k] = agg.get(k, 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "true_label": pa.array([k[0] for k in ks], type=pa.int64()),
        "pred_label": pa.array([k[1] for k in ks], type=pa.int64()),
        "n": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_repeat_buyers(sf_dir: str):
    """Customers with at least one calendar month holding >= 2 of their
    orders: per such customer, the number of repeat months and the max
    orders in any month — the habit/retention face of the correlated
    HAVING pattern. One custkey shuffle; months pack into the key."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], type=pa.int64()),
                          "n_repeat_months": pa.array([], type=pa.int64()),
                          "max_month_orders": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype("datetime64[M]")
        ym = d.view(np.int64)  # months since 1970-01 (< 2^20: ~87k yrs)
        key = _pack20(ck, ym)  # width-asserted pack
        uk, cnt = np.unique(key, return_counts=True)
        cust = uk >> 20
        uc, inv = np.unique(cust, return_inverse=True)
        rep = ibincount(inv, cnt >= 2, minlength=len(uc))
        mx = np.zeros(len(uc), dtype=np.int64)
        np.maximum.at(mx, inv, cnt)
        keep = rep >= 1
        return pa.table({"o_custkey": pa.array(uc[keep]),
                         "n_repeat_months": pa.array(rep[keep]),
                         "max_month_orders": pa.array(mx[keep])})

    return group_apply_tasks(o, ["o_custkey"], _k)


def q_lang_norm_stats(sf_dir: str):
    """Cross-modal join: per document LANGUAGE, the count and total
    quantized squared norm of the docs' embedding vectors (vec_id ==
    doc_id) — the modality-bridge aggregate (text metadata x embedding
    table). Co-partitioned hash join with the per-lang partial fused
    into the join task; exact int64."""
    import ray

    from ..core.shuffle import hash_join_tasks

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])

    def _n2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "n2": pa.array([], type=pa.int64())})
        ids, Q = _km_quant(t)
        return pa.table({"vec_id": pa.array(ids),
                         "n2": pa.array((Q * Q).sum(axis=1))})

    norms = emb.map_batches(_n2, batch_format="pyarrow",
                            zero_copy_batch=True)

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "sum_norm2": pa.array([], type=pa.int64())})
        lng = np.asarray(t.column("lang")).astype(str)
        n2 = np.asarray(t.column("n2"), dtype=np.int64)
        uk, inv = np.unique(lng, return_inverse=True)
        return pa.table({
            "lang": pa.array(uk.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_norm2": pa.array(ibincount(inv, n2, minlength=len(uk))),
        })

    parts = hash_join_tasks(norms, docs, on="vec_id", right_on="doc_id",
                            post=_agg).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["lang"], [0, 0])
        e[0] += p["n"]
        e[1] += p["sum_norm2"]
    ks = sorted(agg)
    return pa.table({
        "lang": pa.array(ks, type=pa.string()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "sum_norm2": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


def q_distance_hist(sf_dir: str):
    """Histogram of nearest-seed hop distances (the aggregate face of
    `msbfs`, like `sigma_hist` is to `bfs_sigma`): (dist, n_vertices)
    over the reached set within BFS_ITERS levels."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    d_refs = alg.msbfs_mod_distances_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), MSBFS_MOD,
        iters=BFS_ITERS)
    # bounded reduce: per-chunk histograms (<= BFS_ITERS+1 rows each)
    uk_refs, c_refs = eng.map_chunks_n(_dist_hist_part, 2, d_refs)
    acc: dict[int, int] = {}
    for uk, c in zip(ray.get(uk_refs), ray.get(c_refs)):
        for k, v in zip(uk, c):
            acc[int(k)] = acc.get(int(k), 0) + int(v)
    ks = sorted(acc)
    return pa.table({"dist": pa.array(ks, type=pa.int64()),
                     "n_vertices": pa.array([acc[k] for k in ks],
                                            type=pa.int64())})


VG_BUCKETS = 10


def q_vocab_growth(sf_dir: str):
    """BIGRAM-vocabulary growth (Heaps-law curve, exact): per corpus
    DECILE (by doc_id order), how many consecutive-token bigrams make
    their FIRST-EVER appearance there — per-batch min-doc combiner ->
    one bigram shuffle -> bounded decile histogram. The
    streaming-novelty census behind dedup/novelty-rate dashboards
    (bigrams, not unigrams: the synthetic token vocabulary saturates in
    the first decile)."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    n_docs = docs.count()

    def _pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], type=pa.string()),
                          "md": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = tokens_list(b)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        if len(flat) < 2:
            return empty
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        bi = np.char.add(np.char.add(flat[:-1][same], " "),
                         flat[1:][same])
        did = np.asarray(b.column("doc_id"), dtype=np.int64)[
            par[:-1][same]]
        # per-batch min doc per bigram (combiner before the shuffle)
        order = np.lexsort((did, bi))
        ft, fd = bi[order], did[order]
        first = np.concatenate([[True], ft[1:] != ft[:-1]])
        return pa.table({"tok": pa.array(ft[first].tolist(),
                                         type=pa.string()),
                         "md": pa.array(fd[first])})

    pairs = docs.map_batches(_pairs, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _hist(t: pa.Table, *, _n=n_docs) -> pa.Table:
        empty = pa.table({"decile": pa.array([], type=pa.int64()),
                          "new_tokens": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        tok = np.asarray(t.column("tok")).astype(str)
        md = np.asarray(t.column("md"), dtype=np.int64)
        order = np.lexsort((md, tok))
        tok, md = tok[order], md[order]
        first = np.concatenate([[True], tok[1:] != tok[:-1]])
        dec = np.floor(md[first] * VG_BUCKETS / np.float64(_n)).astype(
            np.int64)
        uk, c = np.unique(dec, return_counts=True)
        return pa.table({"decile": pa.array(uk),
                         "new_tokens": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(pairs, ["tok"], _hist).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["decile"])] = agg.get(int(p["decile"]), 0) \
            + p["new_tokens"]
    ks = sorted(agg)
    return pa.table({
        "decile": pa.array(ks, type=pa.int64()),
        "new_tokens": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 52: weighted median, component-size histogram, audio lag-1
# autocorrelation, int64 polynomial SpMV filter, KMV distinct sketch
# ---------------------------------------------------------------------------


def q_weighted_median_price(sf_dir: str):
    """Per brand: QUANTITY-WEIGHTED median part price (lower weighted
    median over cents: smallest price with 2*cumweight >= total) and
    the total shipped quantity — the weighted-holistic-aggregate class.
    Join fused to (brand, cents, weight) partials, one brand shuffle,
    whole-partition sort+cumsum pick."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_quantity"])
    p = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"])

    def _pw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"p_brand": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        br = np.asarray(t.column("p_brand")).astype(str)
        cents = np.floor(np.asarray(t.column("p_retailprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        qty = np.asarray(t.column("l_quantity"),
                         dtype=np.float64).astype(np.int64)
        key = np.char.add(np.char.add(br, "\x1f"),
                          np.char.zfill(cents.astype(str), 12))
        uk, inv = np.unique(key, return_inverse=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "p_brand": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "cents": pa.array(sp[:, 2].astype(np.int64)),
            "w": pa.array(ibincount(inv, qty, minlength=len(uk))),
        })

    pw = hash_join_tasks(li, p, on="l_partkey", right_on="p_partkey",
                         post=_pw)

    def _med(t: pa.Table) -> pa.Table:
        empty = pa.table({"p_brand": pa.array([], type=pa.string()),
                          "wmedian_cents": pa.array([], type=pa.int64()),
                          "total_qty": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "p_brand" not in t.column_names:
            return empty
        br = np.asarray(t.column("p_brand")).astype(str)
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        w = np.asarray(t.column("w"), dtype=np.int64)
        order = np.lexsort((cents, br))
        br, cents, w = br[order], cents[order], w[order]
        keys, starts, cnts = np.unique(br, return_index=True,
                                       return_counts=True)
        cw = np.cumsum(w)
        meds, tots = [], []
        for s, c in zip(starts, cnts):
            base = cw[s - 1] if s else 0
            seg = cw[s:s + c] - base
            tot = seg[-1]
            pos = np.searchsorted(2 * seg, tot)  # first 2*cum >= tot
            meds.append(cents[s + pos])
            tots.append(tot)
        return pa.table({
            "p_brand": pa.array(keys.tolist(), type=pa.string()),
            "wmedian_cents": pa.array(np.array(meds, dtype=np.int64)),
            "total_qty": pa.array(np.array(tots, dtype=np.int64)),
        })

    return group_apply_tasks(pw, ["p_brand"], _med)


def q_cc_size_hist(sf_dir: str):
    """Connected-component SIZE histogram (size, n_components) under
    the same fixed-round min-label partition as `connected_components`
    — the aggregate face of CC, like `distance_hist` is to `msbfs`."""
    ctx = get_context(sf_dir)
    comp = alg.cc_fixed(ctx.engine("sym"), CC_ITERS)
    sizes = np.bincount(comp.astype(np.int64), minlength=0)
    sizes = sizes[sizes > 0]
    uk, c = np.unique(sizes, return_counts=True)
    return pa.table({"size": pa.array(uk.astype(np.int64)),
                     "n_components": pa.array(c.astype(np.int64))})


def q_audio_lag_corr(sf_dir: str):
    """Lag-1 autocorrelation sufficient statistics per audio payload
    (n_samples, sum x_t*x_{t+1}) — the periodicity feature through the
    `AudioLagCorrStage` actor pool; exact int64."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="audio")
    return blobs.map_batches(
        M.AudioLagCorrStage, batch_format="pyarrow", batch_size=64,
        concurrency=2,
    )


def _x_mod11_i64_kernel(a: np.ndarray) -> np.ndarray:
    return ((a % 11) + 1).astype(np.int64)


def q_poly_filter(sf_dir: str):
    """Matrix-polynomial filter p(A)x = A^2 x + A x + x on the EXACT
    int64 channel (`plus_times_i64`, the `bfs_sigma` semiring): two
    chained SpMV rounds over chunk refs, vector never on the driver
    until the labeled output. The Chebyshev/Krylov building block
    (reference: iterated `SpMV` chains, e.g. `Applications/` power
    methods) as one oracle-exact query."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    x_refs = eng.map_chunks(_x_mod11_i64_kernel,
                            ctx.vdict.arith_slice_refs(eng.bounds))
    y_refs = eng.spmv_refs(x_refs, "plus_times_i64")
    z_refs = eng.spmv_refs(y_refs, "plus_times_i64")
    p = (eng.unchunk(z_refs) + eng.unchunk(y_refs)
         + eng.unchunk(x_refs)).astype(np.int64)
    ids = np.arange(ctx.n)
    return pa.table({"label": _label_col(ctx, ids),
                     "p": pa.array(p)})


KMV_K = 64
KMV_MASK = (1 << 40) - 1


def q_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values) distinct-count sketch vs exact, per
    language, over the BIGRAM vocabulary: estimate = (k-1)*2^40 //
    h_k on the masked md5 low-64 hash (deterministic, bit-exact in
    SQL), falling back to the candidate count below k. The
    mergeable-sketch class beside HLL: per-partition k-smallest
    candidate lists merge losslessly (any global k-smallest hash is in
    its partition's k-smallest)."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import md5_lower64, tokens_list

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["lang", "text"])

    def _bi(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "tok": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        toks = tokens_list(b)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        if len(flat) < 2:
            return empty
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        bi = np.char.add(np.char.add(flat[:-1][same], " "),
                         flat[1:][same])
        lng = np.asarray(b.column("lang")).astype(str)[par[:-1][same]]
        key = np.char.add(np.char.add(lng, "\x1f"), bi)
        uk = np.unique(key)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"lang": pa.array(sp[:, 0].tolist(),
                                          type=pa.string()),
                         "tok": pa.array(sp[:, 2].tolist(),
                                         type=pa.string())})

    pairs = docs.map_batches(_bi, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _cand(t: pa.Table) -> pa.Table:
        """Per tok-partition: per-lang exact distinct count + the k
        smallest masked hashes (bounded partial: <= nlang*k rows)."""
        empty = pa.table({"lang": pa.array([], type=pa.string()),
                          "n_exact": pa.array([], type=pa.int64()),
                          "hs": pa.array([], type=pa.list_(pa.int64()))})
        if t.num_rows == 0 or "lang" not in t.column_names:
            return empty
        key = np.char.add(np.char.add(
            np.asarray(t.column("lang")).astype(str), "\x1f"),
            np.asarray(t.column("tok")).astype(str))
        uk = np.unique(key)  # global distinct: a (lang,tok) never splits
        sp = np.char.partition(uk, "\x1f")
        lng, tok = sp[:, 0], sp[:, 2]
        h = np.array([md5_lower64(s) & KMV_MASK for s in tok],
                     dtype=np.int64)
        langs, inv = np.unique(lng, return_inverse=True)
        n_ex, hs = [], []
        for li in range(len(langs)):
            hh = np.unique(h[inv == li])  # dedup masked hashes locally
            n_ex.append(int((inv == li).sum()))
            hs.append(hh[:KMV_K].tolist())
        return pa.table({"lang": pa.array(langs.tolist(),
                                          type=pa.string()),
                         "n_exact": pa.array(n_ex, type=pa.int64()),
                         "hs": pa.array(hs, type=pa.list_(pa.int64()))})

    parts = group_apply_tasks(pairs, ["tok"], _cand).take_all()
    agg: dict[str, list] = {}
    for p in parts:
        e = agg.setdefault(p["lang"], [0, []])
        e[0] += p["n_exact"]
        e[1].extend(p["hs"])
    ks = sorted(agg)
    ests = []
    for k in ks:
        hh = np.unique(np.array(agg[k][1], dtype=np.int64))
        if len(hh) < KMV_K:
            ests.append(int(len(hh)))
        else:
            ests.append(int((KMV_K - 1) * (1 << 40) // hh[KMV_K - 1]))
    return pa.table({
        "lang": pa.array(ks, type=pa.string()),
        "n_exact": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "kmv_est": pa.array(ests, type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 53: prefix census, same-repo triangles, discount monotonicity,
# top-k year overlap, record-breaking events
# ---------------------------------------------------------------------------

PREFIX_D = 5


def q_prefix_census(sf_dir: str):
    """Distinct token-prefix counts per depth 1..PREFIX_D (the trie
    profile behind tokenizer merge-rule / autocomplete sizing). Key
    insight for one-shuffle distribution: all tokens sharing any prefix
    share their FIRST CHARACTER, so routing the distinct vocabulary by
    first char makes prefix dedup partition-local."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    vocab = docs.map_batches(_tok_vocab_fn("text"),
                             batch_format="pyarrow",
                             zero_copy_batch=True)

    def _c1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"c1": pa.array([], type=pa.string()),
                             "tok": pa.array([], type=pa.string())})
        tok = np.unique(np.asarray(t.column("tok")).astype(str))
        tok = tok[np.char.str_len(tok) > 0]
        return pa.table({
            "c1": pa.array([s[0] for s in tok.tolist()],
                           type=pa.string()),
            "tok": pa.array(tok.tolist(), type=pa.string()),
        })

    keyed = vocab.map_batches(_c1, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _census(t: pa.Table) -> pa.Table:
        empty = pa.table({"depth": pa.array([], type=pa.int64()),
                          "n_prefixes": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        tok = np.unique(np.asarray(t.column("tok")).astype(str))
        lens = np.char.str_len(tok)
        depths, counts = [], []
        for d in range(1, PREFIX_D + 1):
            sub = tok[lens >= d]
            if not len(sub):
                continue
            depths.append(d)
            counts.append(len(np.unique(
                sub.astype(f"U{d}"))))  # truncation = prefix
        return pa.table({"depth": pa.array(depths, type=pa.int64()),
                         "n_prefixes": pa.array(counts,
                                                type=pa.int64())})

    parts = group_apply_tasks(keyed, ["c1"], _census).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["depth"])] = agg.get(int(p["depth"]), 0) \
            + p["n_prefixes"]
    ks = sorted(agg)
    return pa.table({
        "depth": pa.array(ks, type=pa.int64()),
        "n_prefixes": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_tri_repo_mix(sf_dir: str):
    """Triangle REPO-MIX census: for every triangle, the number of
    distinct repos among its three vertices (1 = community-internal,
    3 = fully cross-cutting; repo = arith % 100 from the corpus
    layout) — the homophily profile of the triangle population. The
    `triangles_list` two-join plan (`_triangles_ids`) with an
    arith-decoder classification stage instead of labeling; bounded
    (n_repos, count) partials."""
    ctx = get_context(sf_dir)
    tri = _triangles_ids(ctx)
    dec = ctx.decoder()

    def _cls(t: pa.Table, *, _d=dec) -> pa.Table:
        empty = pa.table({"n_repos": pa.array([], type=pa.int64()),
                          "n_triangles": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        a = np.asarray(t.column("a"), dtype=np.int64)
        m = np.asarray(t.column("m"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        ra = _d.arith(a) % 100
        rm = _d.arith(m) % 100
        rc = _d.arith(c) % 100
        eq = ((ra == rm).astype(np.int64) + (ra == rc)
              + (rm == rc))  # 3 pairs equal -> 1 repo; 1 -> 2; 0 -> 3
        nrep = np.where(eq == 3, 1, np.where(eq >= 1, 2, 3))
        uk, cnt = np.unique(nrep, return_counts=True)
        return pa.table({
            "n_repos": pa.array(uk.astype(np.int64)),
            "n_triangles": pa.array(cnt.astype(np.int64)),
        })

    parts = tri.map_batches(_cls, batch_format="pyarrow").take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["n_repos"])] = agg.get(int(p["n_repos"]), 0) \
            + p["n_triangles"]
    ks = sorted(agg)
    return pa.table({
        "n_repos": pa.array(ks, type=pa.int64()),
        "n_triangles": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_disc_monotone(sf_dir: str):
    """Discount-sequence monotonicity audit: orders whose per-line
    discount INCREASES somewhere along the linenumber order (policy
    says discounts only tighten), plus the total violation count —
    the sequence-predicate class over a keyed sort. One orderkey
    shuffle, segment-vectorized diff."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_discount"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_orders": pa.array([], type=pa.int64()),
                          "n_nonmonotone": pa.array([], type=pa.int64()),
                          "n_violations": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        ln = np.asarray(t.column("l_linenumber"), dtype=np.int64)
        dc = np.floor(np.asarray(t.column("l_discount"),
                                 dtype=np.float64) * 100
                      + 0.5).astype(np.int64)
        # (linenumber, cents) order: the synthetic lineitem table has
        # duplicate (orderkey, linenumber) pairs, so the discount value
        # itself is the deterministic tiebreaker (mirrored in the SQL
        # window ORDER BY)
        order = np.lexsort((dc, ln, ok))
        ok, dc = ok[order], dc[order]
        same = ok[1:] == ok[:-1]
        inc = same & (dc[1:] > dc[:-1])
        uo, inv = np.unique(ok, return_inverse=True)
        viol = ibincount(inv[1:], inc, minlength=len(uo))
        return pa.table({
            "n_orders": pa.array([len(uo)], type=pa.int64()),
            "n_nonmonotone": pa.array([int((viol > 0).sum())],
                                      type=pa.int64()),
            "n_violations": pa.array([int(inc.sum())], type=pa.int64()),
        })

    parts = group_apply_tasks(li, ["l_orderkey"], _k).take_all()
    return pa.table({
        "n_orders": pa.array([sum(p["n_orders"] for p in parts)],
                             type=pa.int64()),
        "n_nonmonotone": pa.array(
            [sum(p["n_nonmonotone"] for p in parts)], type=pa.int64()),
        "n_violations": pa.array(
            [sum(p["n_violations"] for p in parts)], type=pa.int64()),
    })


TOPK_YEARS = (1995, 1996)
TOPK_K = 50


def q_topk_overlap(sf_dir: str):
    """Churn-of-the-leaderboard: |top-K customers by order revenue in
    1995 ∩ top-K in 1996| (rank by cents DESC, custkey ASC — fully
    deterministic) — the set-overlap-of-derived-top-k class. Per-year
    spend via one custkey shuffle; two bounded top-K pulls."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def _per_year(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "yr": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        yr = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[Y]").view(np.int64) + 1970
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        sel = (yr == TOPK_YEARS[0]) | (yr == TOPK_YEARS[1])
        if not sel.any():
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "yr": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        ck, yr, cents = ck[sel], yr[sel], cents[sel]
        key = _pack20(ck, yr - 1970)
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "o_custkey": pa.array(uk >> 20),
            "yr": pa.array((uk & ((1 << 20) - 1)) + 1970),
            "cents": pa.array(ibincount(inv, cents, minlength=len(uk))),
        })

    per = group_apply_tasks(o, ["o_custkey"], _per_year).materialize()

    def _topk(yr: int) -> set:
        ds = per.filter(expr=f"yr == {yr}")
        rows = ds.sort(["cents", "o_custkey"],
                       descending=[True, False]).take(TOPK_K)
        return {r["o_custkey"] for r in rows}

    a, b = _topk(TOPK_YEARS[0]), _topk(TOPK_YEARS[1])
    return pa.table({
        "k": pa.array([TOPK_K], type=pa.int64()),
        "n_overlap": pa.array([len(a & b)], type=pa.int64()),
    })


def q_record_counts(sf_dir: str):
    """Record-breaking events per type: how many events set a new
    running maximum of value (cents; strictly greater than every
    earlier event of the type, ordered by ts then event_id; the first
    event is a record) — the running-extremum census. One type shuffle,
    np.maximum.accumulate per segment."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_events": pa.array([], type=pa.int64()),
                          "n_records": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        v = np.floor(np.asarray(t.column("value"), dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        order = np.lexsort((eid, tsi, et))
        et, v = et[order], v[order]
        keys, starts, cnts = np.unique(et, return_index=True,
                                       return_counts=True)
        # per-segment running max (segments contiguous post-sort; the
        # segment count is the type cardinality, tiny)
        rec = np.zeros(len(v), dtype=bool)
        for s, c in zip(starts, cnts):
            seg = v[s:s + c]
            rm = np.maximum.accumulate(seg)
            rec[s] = True
            rec[s + 1:s + c] = seg[1:] > rm[:-1]
        return pa.table({
            "event_type": pa.array(keys.tolist(), type=pa.string()),
            "n_events": pa.array(cnts.astype(np.int64)),
            "n_records": pa.array(ibincount(
                np.repeat(np.arange(len(keys)), cnts), rec,
                minlength=len(keys))),
        })

    return group_apply_tasks(ev, ["event_type"], _k)


# ---------------------------------------------------------------------------
# wave 54: induced-subgraph APSP, successor variety, year-end ledger,
# nation x priority grid, per-dim embedding quartiles
# ---------------------------------------------------------------------------

APSP_K = 32


def _seed_cols(D, bounds, seeds):
    """Per-chunk gather of the seed COLUMNS of the (K, chunk) distance
    state: (positions of local seeds in the seed array, (K, n_local)
    submatrix) — bounded output."""
    s, e = bounds
    sel = np.nonzero((seeds >= s) & (seeds < e))[0]
    return sel.astype(np.int64), D[:, seeds[sel] - s]


def q_apsp_top(sf_dir: str):
    """Hub-to-hub shortest hop distances: the APSP_K highest-degree
    vertices (ties by arith id), distances over the FULL graph within
    BFS_ITERS hops via K-source min-plus SpMM (one (K, n) frontier
    matrix, `eng.spmm(D, "min_plus")` per round — the batched-BFS
    form of the betweenness machinery). Output = the K x K hub
    distance matrix as (a_label, b_label, dist); unreachable-in-window
    pairs omitted. Refs-only: hub seeds via the distributed top-k, the
    (K, n) state as per-chunk refs (`alg.kseed_distances_refs`), and
    only the K seed COLUMNS gathered back (bounded K x K driver
    state)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    S = np.sort(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), APSP_K))
    K = len(S)
    D_refs = alg.kseed_distances_refs(eng, S, iters=BFS_ITERS)
    pos_refs, sub_refs = eng.map_chunks_n(
        partial(_seed_cols, seeds=S), 2, D_refs, with_bounds=True)
    H = np.full((K, K), np.inf)
    for pos, sub in zip(ray.get(pos_refs), ray.get(sub_refs)):
        H[:, pos] = sub
    la = np.asarray(ctx.gather_labels(S)).astype(str)
    ii, jj = np.nonzero(np.isfinite(H) & ~np.eye(K, dtype=bool))
    return pa.table({
        "a_label": pa.array(la[ii].tolist(), type=pa.string()),
        "b_label": pa.array(la[jj].tolist(), type=pa.string()),
        "dist": pa.array(H[ii, jj].astype(np.int64)),
    })


SUCC_K = 20


def q_succ_variety(sf_dir: str):
    """Successor variety: for each token, the number of DISTINCT tokens
    that follow it anywhere in the corpus; global top-SUCC_K by
    (variety DESC, token ASC) — the stemming/segmentation signal
    (Harris). Per-batch distinct-pair combiner -> one predecessor
    shuffle -> bounded per-partition top-k partials."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])

    def _pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], type=pa.string()),
                          "suc": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        toks = tokens_list(b)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        if len(flat) < 2:
            return empty
        same = par[1:] == par[:-1]
        if not same.any():
            return empty
        key = np.unique(np.char.add(np.char.add(
            flat[:-1][same], "\x1f"), flat[1:][same]))
        sp = np.char.partition(key, "\x1f")
        return pa.table({"tok": pa.array(sp[:, 0].tolist(),
                                         type=pa.string()),
                         "suc": pa.array(sp[:, 2].tolist(),
                                         type=pa.string())})

    pairs = docs.map_batches(_pairs, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _var(t: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], type=pa.string()),
                          "variety": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        key = np.unique(np.char.add(np.char.add(
            np.asarray(t.column("tok")).astype(str), "\x1f"),
            np.asarray(t.column("suc")).astype(str)))
        sp = np.char.partition(key, "\x1f")
        uk, c = np.unique(sp[:, 0], return_counts=True)
        # per-partition top-k partial (global merge is driver-side)
        o = np.lexsort((uk, -c))[:SUCC_K]
        return pa.table({"tok": pa.array(uk[o].tolist(),
                                         type=pa.string()),
                         "variety": pa.array(c[o].astype(np.int64))})

    parts = group_apply_tasks(pairs, ["tok"], _var).take_all()
    tok = np.array([p["tok"] for p in parts], dtype=str)
    var = np.array([p["variety"] for p in parts], dtype=np.int64)
    o = np.lexsort((tok, -var))[:SUCC_K]
    return pa.table({"tok": pa.array(tok[o].tolist(), type=pa.string()),
                     "variety": pa.array(var[o])})


LEDGER_Y0, LEDGER_Y1 = 1992, 1998


def q_yearend_ledger(sf_dir: str):
    """Year-end cumulative ledger per customer over a DENSE year spine
    (1992..1998): cumulative order count and spend cents at each year
    end, carry-forward across orderless years — the gap-fill +
    as-of-accumulate class. One custkey shuffle; the kernel builds the
    spine as a (customers x years) matrix and cumsums along the year
    axis."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"])
    NY = LEDGER_Y1 - LEDGER_Y0 + 1

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], type=pa.int64()),
                          "yr": pa.array([], type=pa.int64()),
                          "cum_orders": pa.array([], type=pa.int64()),
                          "cum_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        yr = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[Y]").view(np.int64) + 1970
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        # spine rows for EVERY customer seen (even all-post-spine
        # ones: the SQL twin's DISTINCT o_custkey spine keeps them)
        uc, inv = np.unique(ck, return_inverse=True)
        keep = yr <= LEDGER_Y1  # post-spine orders never accumulate
        yi = np.maximum(yr[keep] - LEDGER_Y0, 0)  # pre-spine -> cell 0
        cell = inv[keep] * NY + yi
        cnt = np.zeros(len(uc) * NY, dtype=np.int64)
        np.add.at(cnt, cell, 1)
        cs = np.zeros(len(uc) * NY, dtype=np.int64)
        np.add.at(cs, cell, cents[keep])
        cum_n = np.cumsum(cnt.reshape(len(uc), NY), axis=1)
        cum_c = np.cumsum(cs.reshape(len(uc), NY), axis=1)
        return pa.table({
            "o_custkey": pa.array(np.repeat(uc, NY)),
            "yr": pa.array(np.tile(
                np.arange(LEDGER_Y0, LEDGER_Y1 + 1, dtype=np.int64),
                len(uc))),
            "cum_orders": pa.array(cum_n.reshape(-1)),
            "cum_cents": pa.array(cum_c.reshape(-1)),
        })

    return group_apply_tasks(o, ["o_custkey"], _k)


def q_nation_priority_grid(sf_dir: str):
    """Order counts per (customer nation, order priority) — the
    3-table star-join grid (orders x customer x nation): one
    co-partitioned custkey join with the per-(nationkey, priority)
    partial fused into the join task, the 25-row nation dimension
    applied driver-side."""
    import ray

    from ..core.shuffle import hash_join_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderpriority"])
    c = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).take_all()
    nmap = {int(r["n_nationkey"]): r["n_name"] for r in nat}

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"nk": pa.array([], type=pa.int64()),
                             "prio": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        nk = np.asarray(t.column("c_nationkey"), dtype=np.int64)
        pr = np.asarray(t.column("o_orderpriority")).astype(str)
        key = np.char.add(np.char.add(nk.astype(str), "\x1f"), pr)
        uk, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "nk": pa.array(sp[:, 0].astype(np.int64)),
            "prio": pa.array(sp[:, 2].tolist(), type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    parts = hash_join_tasks(o, c, on="o_custkey", right_on="c_custkey",
                            post=_agg).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (nmap[int(p["nk"])], p["prio"])
        agg[k] = agg.get(k, 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "n_name": pa.array([k[0] for k in ks], type=pa.string()),
        "o_orderpriority": pa.array([k[1] for k in ks],
                                    type=pa.string()),
        "n_orders": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


EMB_QUARTS = (0.25, 0.5, 0.75)


def q_emb_dim_quartiles(sf_dir: str):
    """Per-dimension exact discrete quartiles of the quantized
    embedding values (q25/q50/q75, `quantile_disc` semantics) — the
    holistic per-feature profile beside `emb_dim_stats`' moments. One
    dim-keyed shuffle of (dim, q) pairs, whole-partition sort+pick."""
    import ray

    from ..core.shuffle import group_apply_tasks

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])

    def _flat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"dim": pa.array([], type=pa.int64()),
                             "q": pa.array([], type=pa.int64())})
        ids, Q = _km_quant(t)
        nd = Q.shape[1]
        return pa.table({
            "dim": pa.array(np.tile(np.arange(nd, dtype=np.int64),
                                    len(ids))),
            "q": pa.array(Q.reshape(-1)),
        })

    flat = emb.map_batches(_flat, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _quart(t: pa.Table) -> pa.Table:
        empty = pa.table({"dim": pa.array([], type=pa.int64()),
                          "q25": pa.array([], type=pa.int64()),
                          "q50": pa.array([], type=pa.int64()),
                          "q75": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "dim" not in t.column_names:
            return empty
        dm = np.asarray(t.column("dim"), dtype=np.int64)
        v = np.asarray(t.column("q"), dtype=np.int64)
        order = np.lexsort((v, dm))
        dm, v = dm[order], v[order]
        keys, starts, cnts = np.unique(dm, return_index=True,
                                       return_counts=True)
        cols = {"dim": pa.array(keys)}
        for name, qq in zip(("q25", "q50", "q75"), EMB_QUARTS):
            idx = starts + np.minimum(
                cnts - 1, np.ceil(qq * cnts).astype(np.int64) - 1)
            cols[name] = pa.array(v[idx])
        return pa.table(cols)

    return group_apply_tasks(flat, ["dim"], _quart)


# ---------------------------------------------------------------------------
# wave 55: directed hub asymmetry, dup-graph triangles, loyal customers,
# peak-position census, lineitem covariance sufficient stats
# ---------------------------------------------------------------------------


def q_hub_asymmetry(sf_dir: str):
    """DIRECTED distance asymmetry among the hubs: for every unordered
    hub pair {a, b} (same APSP_K top-degree set as `apsp_top`),
    classify d(a->b) vs d(b->a) within BFS_ITERS hops over the
    directed structural graph — symmetric / asymmetric (both finite,
    different) / one-way / unreachable. Same K-source min-plus SpMM
    machinery on the `dir_bool` engine (refs-only, like `apsp_top`);
    one bounded count row."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("dir_bool")
    sym = ctx.engine("sym")
    S = np.sort(alg.top_by_degree(
        sym, ctx.vdict.arith_slice_refs(sym.bounds), APSP_K))
    K = len(S)
    D_refs = alg.kseed_distances_refs(eng, S, iters=BFS_ITERS)
    pos_refs, sub_refs = eng.map_chunks_n(
        partial(_seed_cols, seeds=S), 2, D_refs, with_bounds=True)
    H = np.full((K, K), np.inf)  # H[i, j] = d(S[i] -> S[j])
    for pos, sub in zip(ray.get(pos_refs), ray.get(sub_refs)):
        H[:, pos] = sub
    iu, ju = np.triu_indices(K, k=1)
    ab, ba = H[iu, ju], H[ju, iu]
    fa, fb = np.isfinite(ab), np.isfinite(ba)
    return pa.table({
        "n_pairs": pa.array([len(ab)], type=pa.int64()),
        "n_symmetric": pa.array([int((fa & fb & (ab == ba)).sum())],
                                type=pa.int64()),
        "n_asymmetric": pa.array([int((fa & fb & (ab != ba)).sum())],
                                 type=pa.int64()),
        "n_oneway": pa.array([int((fa ^ fb).sum())], type=pa.int64()),
        "n_unreachable": pa.array([int((~fa & ~fb).sum())],
                                  type=pa.int64()),
    })


DUPG_TAU = 0.5


def q_dupgraph_triangles(sf_dir: str):
    """COMPOSITE pipeline: near-duplicate pair graph (exact jaccard >=
    DUPG_TAU, `dedup.jaccard_pairs`) fed into the masked-SpGEMM
    triangle counter — triangles in the duplicate graph measure
    cluster cliquishness (transitivity of near-duplication). The
    dedup output Dataset streams straight into the graph algorithm;
    nothing materializes on the driver."""
    import ray

    from ..functions import dedup as D

    pairs = D.jaccard_pairs(_docs(sf_dir), tau=DUPG_TAU)

    def _sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "dst": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.float64())})
        a = np.asarray(t.column("a"), dtype=np.int64)
        b = np.asarray(t.column("b"), dtype=np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
            "w": pa.array(np.ones(2 * len(a))),
        })

    sym = pairs.map_batches(_sym, batch_format="pyarrow")
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    cnt = alg.triangle_count(sym, n_docs, method="join")
    return pa.table({"dup_triangles": pa.array([int(cnt)],
                                               type=pa.int64())})


LOYAL_YEARS = (1995, 1996, 1997)


def q_loyal_customers(sf_dir: str):
    """Relational division over DERIVED sets: customers with at least
    one order in EVERY year of LOYAL_YEARS. One custkey shuffle,
    bitmask-vectorized; single count row."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])

    def _k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"n_loyal": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        yr = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[Y]").view(np.int64) + 1970
        uc, inv = np.unique(ck, return_inverse=True)
        mask = np.zeros(len(uc), dtype=np.int64)
        for bit, y in enumerate(LOYAL_YEARS):
            np.bitwise_or.at(mask, inv[yr == y], 1 << bit)
        full = (1 << len(LOYAL_YEARS)) - 1
        return pa.table({"n_loyal": pa.array([int((mask == full).sum())],
                                             type=pa.int64())})

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    return pa.table({"n_loyal": pa.array(
        [sum(p["n_loyal"] for p in parts)], type=pa.int64())})


PEAK_BUCKETS = 4


def q_peak_position(sf_dir: str):
    """Peak-position census: for each user, WHERE in their event
    sequence the maximum-value event falls (first max by (ts,
    event_id); position quartile floor(idx * 4 / n)) — histogram of
    (quartile, n_users). The argmax-position class over a keyed
    sequence scan."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"quartile": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        v = np.floor(np.asarray(t.column("value"), dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        order = np.lexsort((eid, tsi, uid))
        uid, v = uid[order], v[order]
        uu, starts, cnts = np.unique(uid, return_index=True,
                                     return_counts=True)
        quart = np.empty(len(uu), dtype=np.int64)
        for x, (s, c) in enumerate(zip(starts, cnts)):
            idx = int(np.argmax(v[s:s + c]))  # first max in seq order
            quart[x] = idx * PEAK_BUCKETS // c
        uk, n = np.unique(quart, return_counts=True)
        return pa.table({"quartile": pa.array(uk),
                         "n_users": pa.array(n.astype(np.int64))})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["quartile"])] = agg.get(int(p["quartile"]), 0) \
            + p["n_users"]
    ks = sorted(agg)
    return pa.table({
        "quartile": pa.array(ks, type=pa.int64()),
        "n_users": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_lineitem_cov(sf_dir: str):
    """Pairwise covariance SUFFICIENT STATISTICS over (quantity,
    price cents, discount cents): n, the three sums, three sums of
    squares, and the three cross-products — all exact int64, one
    shuffle-free bounded-partial pass (the correlation-matrix feed;
    `regr_stats`' multi-column generalization)."""
    import ray

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"])

    cols = ("q", "p", "d")

    def _part(t: pa.Table) -> pa.Table:
        q = np.floor(np.asarray(t.column("l_quantity"),
                                dtype=np.float64)).astype(np.int64)
        p = np.floor(np.asarray(t.column("l_extendedprice"),
                                dtype=np.float64) * 100
                     + 0.5).astype(np.int64)
        d = np.floor(np.asarray(t.column("l_discount"),
                                dtype=np.float64) * 100
                     + 0.5).astype(np.int64)
        v = {"q": q, "p": p, "d": d}
        out = {"n": pa.array([len(q)], type=pa.int64())}
        for a in cols:
            out[f"sum_{a}"] = pa.array([int(v[a].sum())],
                                       type=pa.int64())
        for i, a in enumerate(cols):
            for b in cols[i:]:
                out[f"sum_{a}{b}"] = pa.array(
                    [int((v[a] * v[b]).sum())], type=pa.int64())
        return pa.table(out)

    parts = li.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    keys = ["n"] + [f"sum_{a}" for a in cols] + [
        f"sum_{a}{b}" for i, a in enumerate(cols) for b in cols[i:]]
    return pa.table({k: pa.array([sum(p[k] for p in parts)],
                                 type=pa.int64()) for k in keys})


# ---------------------------------------------------------------------------
# wave 56: monthly autocorrelation, type-audience overlap, home-supplied
# customers, hourly unique users, multi-supplier orders
# ---------------------------------------------------------------------------


def q_orders_autocorr(sf_dir: str):
    """Lag-1 autocorrelation SUFFICIENT STATISTICS of the monthly
    order-count series (two-level: distributed per-month counts, then
    one tiny ordered scan): n months, sum, sum of squares, lag-1
    cross-sum — exact int64, the seasonality-strength feed."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate"])

    def _m(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ym": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        ym = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[M]").view(np.int64)
        uk, c = np.unique(ym, return_counts=True)
        return pa.table({"ym": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    per = o.map_batches(_m, batch_format="pyarrow",
                        zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ym" not in t.column_names:
            return pa.table({"ym": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        ym = np.asarray(t.column("ym"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(ym, return_inverse=True)
        return pa.table({"ym": pa.array(uk),
                         "c": pa.array(ibincount(inv, c,
                                                 minlength=len(uk)))})

    months = group_apply_tasks(per, ["ym"], _merge).take_all()
    months.sort(key=lambda r: r["ym"])
    c = np.array([m["c"] for m in months], dtype=np.int64)
    return pa.table({
        "n_months": pa.array([len(c)], type=pa.int64()),
        "sum_c": pa.array([int(c.sum())], type=pa.int64()),
        "sum_cc": pa.array([int((c * c).sum())], type=pa.int64()),
        "sum_lag": pa.array([int((c[:-1] * c[1:]).sum()) if len(c) > 1
                             else 0], type=pa.int64()),
    })


def q_type_audience_jaccard(sf_dir: str):
    """Audience overlap between event types: for every type pair
    (a < b), |users(a)|, |users(b)|, |users(a) ∩ users(b)| — exact
    integer Jaccard feed. One user shuffle; each partition contributes
    bitmask-per-user partials, pair counts stay bounded (T^2 rows)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"ta": pa.array([], type=pa.string()),
                          "tb": pa.array([], type=pa.string()),
                          "n_a": pa.array([], type=pa.int64()),
                          "n_b": pa.array([], type=pa.int64()),
                          "n_both": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        types, ti = np.unique(et, return_inverse=True)
        uu, ui = np.unique(uid, return_inverse=True)
        has = np.zeros((len(uu), len(types)), dtype=bool)
        has[ui, ti] = True
        ta, tb, na, nb, nb2 = [], [], [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                ta.append(types[i])
                tb.append(types[j])
                na.append(int(has[:, i].sum()))
                nb.append(int(has[:, j].sum()))
                nb2.append(int((has[:, i] & has[:, j]).sum()))
        return pa.table({"ta": pa.array(ta, type=pa.string()),
                         "tb": pa.array(tb, type=pa.string()),
                         "n_a": pa.array(na, type=pa.int64()),
                         "n_b": pa.array(nb, type=pa.int64()),
                         "n_both": pa.array(nb2, type=pa.int64())})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        e = agg.setdefault((p["ta"], p["tb"]), [0, 0, 0])
        e[0] += p["n_a"]
        e[1] += p["n_b"]
        e[2] += p["n_both"]
    ks = sorted(agg)
    return pa.table({
        "ta": pa.array([k[0] for k in ks], type=pa.string()),
        "tb": pa.array([k[1] for k in ks], type=pa.string()),
        "n_a": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_b": pa.array([agg[k][1] for k in ks], type=pa.int64()),
        "n_both": pa.array([agg[k][2] for k in ks], type=pa.int64()),
    })


def q_home_supplied_customers(sf_dir: str):
    """Customers with at least one lineitem whose SUPPLIER sits in the
    customer's own nation — a 4-table reachability semi-join
    (lineitem -> orders -> customer x supplier): supplier nation map
    broadcast (small side), two co-partitioned joins, distinct-cust
    count. Single count row."""
    import ray

    from ..core.shuffle import hash_join_tasks

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
    c = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).take_all()
    smap_k = np.array(sorted(int(r["s_suppkey"]) for r in sup),
                      dtype=np.int64)
    smap_v = np.array([dict((int(r["s_suppkey"]), int(r["s_nationkey"]))
                            for r in sup)[k] for k in smap_k],
                      dtype=np.int64)
    sref = ray.put((smap_k, smap_v))

    def _sn(t: pa.Table, *, _r=sref) -> pa.Table:
        sk, sv = _r if isinstance(_r, tuple) else ray.get(_r)
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "snk": pa.array([], type=pa.int64())})
        s = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pos = np.minimum(np.searchsorted(sk, s), len(sk) - 1)
        ok_ = sk[pos] == s
        return pa.table({
            "o_custkey": pa.array(np.asarray(
                t.column("o_custkey"), dtype=np.int64)[ok_]),
            "snk": pa.array(sv[pos][ok_]),
        })

    # lineitem x orders (orderkey co-partition), supplier nation mapped
    lo = hash_join_tasks(li, o, on="l_orderkey", right_on="o_orderkey",
                         post=_sn)

    def _match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_home": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cn = np.asarray(t.column("c_nationkey"), dtype=np.int64)
        sn = np.asarray(t.column("snk"), dtype=np.int64)
        home = np.unique(ck[cn == sn])
        return pa.table({"n_home": pa.array([len(home)],
                                            type=pa.int64())})

    parts = hash_join_tasks(lo, c, on="o_custkey",
                            right_on="c_custkey",
                            post=_match).take_all()
    return pa.table({"n_home": pa.array(
        [sum(p["n_home"] for p in parts)], type=pa.int64())})


def q_hourly_uniques(sf_dir: str):
    """Distinct users per tumbling 1-hour window x event type — the
    windowed COUNT DISTINCT (holistic, unlike `events_hourly`'s
    algebraic count+sum): one (type, hour) shuffle of per-batch
    distinct partials."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id"])
    US_H = np.int64(3_600_000_000)

    def _dedupe(et, hr, uid):
        order = np.lexsort((uid, hr, et))
        et, hr, uid = et[order], hr[order], uid[order]
        first = np.concatenate([[True],
                                (et[1:] != et[:-1]) | (hr[1:] != hr[:-1])
                                | (uid[1:] != uid[:-1])])
        return et[first], hr[first], uid[first]

    def _pre(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "hr": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        hr = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64) // US_H
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        et, hr, uid = _dedupe(et, hr, uid)
        return pa.table({
            "event_type": pa.array(et.tolist(), type=pa.string()),
            "hr": pa.array(hr),
            "user_id": pa.array(uid),
        })

    pre = ev.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _cnt(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "hr": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et, hr, _ = _dedupe(
            np.asarray(t.column("event_type")).astype(str),
            np.asarray(t.column("hr"), dtype=np.int64),
            np.asarray(t.column("user_id"), dtype=np.int64))
        grp = np.concatenate([[True], (et[1:] != et[:-1])
                              | (hr[1:] != hr[:-1])])
        starts = np.flatnonzero(grp)
        cnts = np.diff(np.concatenate([starts, [len(et)]]))
        return pa.table({
            "event_type": pa.array(et[starts].tolist(),
                                   type=pa.string()),
            "hr": pa.array(hr[starts]),
            "n_users": pa.array(cnts.astype(np.int64)),
        })

    return group_apply_tasks(pre, ["event_type", "hr"], _cnt)


MSO_SUPP, MSO_PART = 3, 2


def q_multi_supplier_orders(sf_dir: str):
    """Orders sourced from >= MSO_SUPP distinct suppliers AND >=
    MSO_PART distinct parts — the multi-facet HAVING over two distinct
    counts. One orderkey shuffle; single count row plus the max facet
    values (envelope)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_partkey"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_orders": pa.array([], type=pa.int64()),
                          "max_supps": pa.array([], type=pa.int64()),
                          "max_parts": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok_ = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        uo, inv = np.unique(ok_, return_inverse=True)
        # distinct suppliers per order
        su = np.unique(inv * np.int64(1 << 40) + sk)
        ns = np.bincount((su >> 40).astype(np.int64),
                         minlength=len(uo)).astype(np.int64)
        pu = np.unique(inv * np.int64(1 << 40) + pk)
        npt = np.bincount((pu >> 40).astype(np.int64),
                          minlength=len(uo)).astype(np.int64)
        hit = (ns >= MSO_SUPP) & (npt >= MSO_PART)
        return pa.table({
            "n_orders": pa.array([int(hit.sum())], type=pa.int64()),
            "max_supps": pa.array([int(ns.max()) if len(ns) else 0],
                                  type=pa.int64()),
            "max_parts": pa.array([int(npt.max()) if len(npt) else 0],
                                  type=pa.int64()),
        })

    parts = group_apply_tasks(li, ["l_orderkey"], _k).take_all()
    return pa.table({
        "n_orders": pa.array([sum(p["n_orders"] for p in parts)],
                             type=pa.int64()),
        "max_supps": pa.array([max(p["max_supps"] for p in parts)],
                              type=pa.int64()),
        "max_parts": pa.array([max(p["max_parts"] for p in parts)],
                              type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 57: diversified top-k, nation p90 outliers, order-index curve,
# Fano burstiness, adjacent embedding dots
# ---------------------------------------------------------------------------

DIV_K, DIV_PER_CUST = 10, 2


def q_diverse_top_orders(sf_dir: str):
    """DIVERSIFIED top-k: the DIV_K highest-price orders with at most
    DIV_PER_CUST per customer (rank cents DESC, orderkey ASC) — the
    quota-constrained ranking class. Per-customer top-quota partials
    (one custkey shuffle) then a bounded driver merge; the quota makes
    the per-group partial provably sufficient."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                          "o_custkey": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        order = np.lexsort((ok_, -cents, ck))
        ck, ok_, cents = ck[order], ok_[order], cents[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], ck[1:] != ck[:-1]]))
        rank = np.arange(len(ck)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(ck)]])))
        keep = rank < DIV_PER_CUST
        return pa.table({"o_orderkey": pa.array(ok_[keep]),
                         "o_custkey": pa.array(ck[keep]),
                         "cents": pa.array(cents[keep])})

    cand = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    cand.sort(key=lambda r: (-r["cents"], r["o_orderkey"]))
    top = cand[:DIV_K]
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in top],
                               type=pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in top],
                              type=pa.int64()),
        "cents": pa.array([r["cents"] for r in top], type=pa.int64()),
    })


def q_nation_p90_orders(sf_dir: str):
    """Per customer NATION: order count and how many orders price
    strictly above the nation's own exact discrete p90 (two-level
    holistic: join to nation, per-nation sort+pick quantile + tail
    count fused in one partition kernel)."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"])
    c = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])

    def _proj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"nk": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        return pa.table({
            "nk": t.column("c_nationkey").cast(pa.int64()),
            "cents": pa.array(np.floor(np.asarray(
                t.column("o_totalprice"), dtype=np.float64) * 100
                + 0.5).astype(np.int64)),
        })

    j = hash_join_tasks(o, c, on="o_custkey", right_on="c_custkey",
                        post=_proj)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"nk": pa.array([], type=pa.int64()),
                          "n_orders": pa.array([], type=pa.int64()),
                          "p90_cents": pa.array([], type=pa.int64()),
                          "n_above": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "nk" not in t.column_names:
            return empty
        nk = np.asarray(t.column("nk"), dtype=np.int64)
        v = np.asarray(t.column("cents"), dtype=np.int64)
        order = np.lexsort((v, nk))
        nk, v = nk[order], v[order]
        keys, starts, cnts = np.unique(nk, return_index=True,
                                       return_counts=True)
        idx = starts + np.minimum(
            cnts - 1, np.ceil(0.9 * cnts).astype(np.int64) - 1)
        p90 = v[idx]
        above = np.empty(len(keys), dtype=np.int64)
        for x, (s, cn) in enumerate(zip(starts, cnts)):
            above[x] = int((v[s:s + cn] > p90[x]).sum())
        return pa.table({"nk": pa.array(keys),
                         "n_orders": pa.array(cnts.astype(np.int64)),
                         "p90_cents": pa.array(p90),
                         "n_above": pa.array(above)})

    return group_apply_tasks(j, ["nk"], _k)


OIDX_BUCKETS = 3  # 1st order, 2nd order, 3rd+


def q_order_index_cents(sf_dir: str):
    """Customer learning curve: orders bucketed by their per-customer
    lifetime INDEX (1st, 2nd, 3rd+; rank by date then orderkey), with
    exact count and cents sum per bucket — the rank-then-rebucket
    sequence class."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                          "n_orders": pa.array([], type=pa.int64()),
                          "sum_cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        order = np.lexsort((ok_, d, ck))
        ck, cents = ck[order], cents[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], ck[1:] != ck[:-1]]))
        rank = np.arange(len(ck)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(ck)]])))
        bucket = np.minimum(rank, OIDX_BUCKETS - 1)
        return pa.table({
            "bucket": pa.array(np.arange(OIDX_BUCKETS,
                                         dtype=np.int64)),
            "n_orders": pa.array(np.bincount(
                bucket, minlength=OIDX_BUCKETS).astype(np.int64)),
            "sum_cents": pa.array(ibincount(
                bucket, cents, minlength=OIDX_BUCKETS)),
        })

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    agg = np.zeros((OIDX_BUCKETS, 2), dtype=np.int64)
    for p in parts:
        agg[int(p["bucket"]), 0] += p["n_orders"]
        agg[int(p["bucket"]), 1] += p["sum_cents"]
    return pa.table({
        "bucket": pa.array(np.arange(OIDX_BUCKETS, dtype=np.int64) + 1),
        "n_orders": pa.array(agg[:, 0]),
        "sum_cents": pa.array(agg[:, 1]),
    })


def q_fano_factor(sf_dir: str):
    """Burstiness sufficient statistics per event type: over the
    per-hour count series (observed hours only), n_hours, sum and sum
    of squares — the Fano (variance/mean) feed, exact int64. Two-level:
    per-(type,hour) counts then bounded per-type reduction in the same
    keyed shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    US_H = np.int64(3_600_000_000)

    def _pre(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "hr": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        hr = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64) // US_H
        key = np.char.add(np.char.add(et, "\x1f"),
                          np.char.zfill(hr.astype(str), 12))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "event_type": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "hr": pa.array(sp[:, 2].astype(np.int64)),
            "c": pa.array(c.astype(np.int64)),
        })

    pre = ev.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_hours": pa.array([], type=pa.int64()),
                          "sum_c": pa.array([], type=pa.int64()),
                          "sum_cc": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        hr = np.asarray(t.column("hr"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        # merge split per-batch partials for the same (type, hour)
        key = np.char.add(np.char.add(et, "\x1f"),
                          np.char.zfill(hr.astype(str), 12))
        uk, inv = np.unique(key, return_inverse=True)
        tot = ibincount(inv, c, minlength=len(uk))
        sp = np.char.partition(uk, "\x1f")
        types, tinv = np.unique(sp[:, 0], return_inverse=True)
        return pa.table({
            "event_type": pa.array(types.tolist(), type=pa.string()),
            "n_hours": pa.array(np.bincount(
                tinv, minlength=len(types)).astype(np.int64)),
            "sum_c": pa.array(ibincount(tinv, tot,
                                        minlength=len(types))),
            "sum_cc": pa.array(ibincount(tinv, tot * tot,
                                         minlength=len(types))),
        })

    return group_apply_tasks(pre, ["event_type"], _k)


EPD_BLK = 256  # small enough that the gate corpora exercise block boundaries


def q_emb_pair_dots(sf_dir: str):
    """Quantized dot products between CONSECUTIVE vec_ids (i, i+1) —
    the O(N) adjacent-pair similarity scan (a cheap drift/continuity
    audit over the embedding stream). Range-block routing: each row
    goes to block vec_id // EPD_BLK, block-boundary rows ALSO to the
    previous block (Acero joins reject list payloads, so no join);
    each partition sorts its ids and dots the consecutive pairs whose
    LEFT id it owns."""
    import ray

    from ..core.shuffle import group_apply_tasks

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])

    def _route(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"blk": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "qv": pa.array([], type=pa.list_(
                                 pa.int64()))})
        ids, Q = _km_quant(t)
        blk = ids // EPD_BLK
        qv = Q.tolist()
        # boundary rows also serve the previous block's last pair
        bd = np.flatnonzero((ids % EPD_BLK == 0) & (ids > 0))
        out_blk = np.concatenate([blk, blk[bd] - 1])
        out_ids = np.concatenate([ids, ids[bd]])
        out_qv = qv + [qv[int(i)] for i in bd]
        return pa.table({"blk": pa.array(out_blk),
                         "vec_id": pa.array(out_ids),
                         "qv": pa.array(out_qv,
                                        type=pa.list_(pa.int64()))})

    routed = emb.map_batches(_route, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _dot(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "dot": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return empty
        ids = np.asarray(t.column("vec_id"), dtype=np.int64)
        blk = np.asarray(t.column("blk"), dtype=np.int64)
        qv = t.column("qv")
        if isinstance(qv, pa.ChunkedArray):
            qv = qv.combine_chunks()
        M = np.asarray(qv.values, dtype=np.int64).reshape(len(ids), -1)
        # sort (id asc, blk desc) so a duplicate id keeps its HOME
        # copy (larger blk): the own-check below reads the kept blk, and
        # a boundary id acting as LEFT of its (x, x+1) pair must carry
        # its home block or the pair would be silently dropped when
        # blk and blk-1 hash to the same partition
        order = np.lexsort((-blk, ids))
        ids, blk, M = ids[order], blk[order], M[order]
        first = np.concatenate([[True], ids[1:] != ids[:-1]])
        ids, blk, M = ids[first], blk[first], M[first]
        adj = ids[1:] == ids[:-1] + 1
        own = blk[:-1] == ids[:-1] // EPD_BLK  # left id owned here
        keep = adj & own
        if not keep.any():
            return empty
        dots = (M[:-1][keep] * M[1:][keep]).sum(axis=1)
        return pa.table({"vec_id": pa.array(ids[:-1][keep]),
                         "dot": pa.array(dots)})

    return group_apply_tasks(routed, ["blk"], _dot)


# ---------------------------------------------------------------------------
# wave 58: 1-NN hubness, hub bisector census, Lorenz deciles,
# co-purchase degree histogram, comeback customers
# ---------------------------------------------------------------------------


def q_nn_hubness(sf_dir: str):
    """HUBNESS histogram of the 1-NN graph over the first KNN1_N
    embeddings: for each vector, how many OTHER vectors choose it as
    their nearest neighbor (exact quantized dots, tie -> lowest id);
    output (indeg, n_vectors) — the hubness pathology census of
    embedding spaces (high-hubness spaces degrade kNN retrieval)."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < KNN1_N,
    )
    all_rows = emb.take_all()  # bounded: KNN1_N rows
    all_rows.sort(key=lambda r: r["vec_id"])
    tt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in all_rows],
                           type=pa.int64()),
        "embedding": pa.array([list(r["embedding"]) for r in all_rows]),
    })
    aids, amat = _km_quant(tt)
    aref = ray.put((aids, amat))

    def _nn(t: pa.Table, *, _ref=aref) -> pa.Table:
        ai, am = _ref if isinstance(_ref, tuple) else ray.get(_ref)
        ids, Q = _km_quant(t.select(["vec_id", "embedding"]))
        if len(ids) == 0:
            return pa.table({"target": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        d = Q @ am.T
        d[ids[:, None] == ai[None, :]] = np.iinfo(np.int64).min
        best = ai[np.argmax(d, axis=1)]
        uk, c = np.unique(best, return_counts=True)
        return pa.table({"target": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    parts = emb.map_batches(_nn, batch_format="pyarrow",
                            zero_copy_batch=True).take_all()
    indeg = np.zeros(len(aids), dtype=np.int64)
    pos = {int(v): i for i, v in enumerate(aids)}
    for p in parts:
        indeg[pos[int(p["target"])]] += p["c"]
    uk, c = np.unique(indeg, return_counts=True)
    return pa.table({"indeg": pa.array(uk),
                     "n_vectors": pa.array(c.astype(np.int64))})


def _bisector_census(D):
    """Per-chunk 6-way census over the (2, chunk) hub-distance state:
    (closer_a, closer_b, tie, only_a, only_b, neither) counts."""
    fa, fb = np.isfinite(D[0]), np.isfinite(D[1])
    both = fa & fb
    return np.array([
        int((both & (D[0] < D[1])).sum()),
        int((both & (D[1] < D[0])).sum()),
        int((both & (D[0] == D[1])).sum()),
        int((fa & ~fb).sum()),
        int((fb & ~fa).sum()),
        int((~fa & ~fb).sum()),
    ], dtype=np.int64)


def q_hub_bisector(sf_dir: str):
    """Voronoi bisector census between the TWO top-degree hubs: among
    all vertices, how many are strictly closer (hop distance within
    BFS_ITERS, undirected) to hub A vs hub B, equidistant, reached by
    only one, or by neither — the 2-seed msbfs variant keeping the
    seeds SEPARATE (msbfs min-merges them). Refs-only end-to-end: hub
    seeds via the distributed (deg DESC, arith ASC) top-k, the (2, n)
    distance state as per-chunk refs (`alg.kseed_distances_refs`), and
    the census reduced from bounded per-chunk counts — the driver never
    holds an O(n) array."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    top2 = alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), 2)
    D_refs = alg.kseed_distances_refs(eng, top2, iters=BFS_ITERS)
    parts = np.sum(ray.get(eng.map_chunks(_bisector_census, D_refs)),
                   axis=0)
    names = ["n_closer_a", "n_closer_b", "n_tie", "n_only_a",
             "n_only_b", "n_neither"]
    return pa.table({nm: pa.array([int(v)], type=pa.int64())
                     for nm, v in zip(names, parts)})


LORENZ_BUCKETS = 10


def q_lorenz_deciles(sf_dir: str):
    """Lorenz curve of customer spend: customers ranked by total cents
    (ties by custkey), bucketed into LORENZ_BUCKETS rank deciles;
    per decile the customer count and cents sum — the inequality curve
    whose cumulative form reads off Gini/Pareto. Per-cust sums via one
    shuffle; the decile assignment needs global ranks, done on the
    bounded per-cust aggregate."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"])

    def _k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(ibincount(inv, cents,
                                                     minlength=len(uk)))})

    per = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    ck = np.array([p["o_custkey"] for p in per], dtype=np.int64)
    cents = np.array([p["cents"] for p in per], dtype=np.int64)
    order = np.lexsort((ck, cents))  # ascending spend, ties by key
    cents = cents[order]
    n = len(cents)
    dec = np.arange(n, dtype=np.int64) * LORENZ_BUCKETS // n
    return pa.table({
        "decile": pa.array(np.arange(LORENZ_BUCKETS, dtype=np.int64)),
        "n_customers": pa.array(np.bincount(
            dec, minlength=LORENZ_BUCKETS).astype(np.int64)),
        "sum_cents": pa.array(ibincount(dec, cents,
                                        minlength=LORENZ_BUCKETS)),
    })


def q_copurchase_degree_hist(sf_dir: str):
    """Co-purchase projection degree census: for each part, the number
    of DISTINCT partner parts it shares an order with; output
    (partners, n_parts) histogram. Order-local distinct pair expansion
    (bounded basket sizes), symmetric emission, one partner shuffle
    with partition-local distinct, bounded histogram partials."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import _run_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"])

    def _pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], type=pa.int64()),
                          "y": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        ok_ = np.asarray(t.column("l_orderkey"), dtype=np.int64)
        pk = np.asarray(t.column("l_partkey"), dtype=np.int64)
        order = np.lexsort((pk, ok_))
        ok_, pk = ok_[order], pk[order]
        keep = np.ones(len(ok_), dtype=bool)
        keep[1:] = (ok_[1:] != ok_[:-1]) | (pk[1:] != pk[:-1])
        ok_, pk = ok_[keep], pk[keep]
        uo, starts, counts = np.unique(ok_, return_index=True,
                                       return_counts=True)
        a, b = _run_pairs(starts, counts, pk)
        if len(a) == 0:
            return empty
        x = np.concatenate([a, b])
        y = np.concatenate([b, a])
        assert int(y.max()) < 1 << 30, "partkey exceeds 2^30 pack width"
        key = np.unique(x * np.int64(1 << 30) + y)  # local dedup
        return pa.table({"x": pa.array((key >> 30).astype(np.int64)),
                         "y": pa.array((key & ((1 << 30) - 1))
                                       .astype(np.int64))})

    pairs = group_apply_tasks(li, ["l_orderkey"], _pairs)

    def _deg(t: pa.Table) -> pa.Table:
        empty = pa.table({"partners": pa.array([], type=pa.int64()),
                          "n_parts": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "x" not in t.column_names:
            return empty
        x = np.asarray(t.column("x"), dtype=np.int64)
        y = np.asarray(t.column("y"), dtype=np.int64)
        key = np.unique(x * np.int64(1 << 30) + y)
        deg = np.bincount((key >> 30).astype(np.int64))
        deg = deg[deg > 0]
        uk, c = np.unique(deg, return_counts=True)
        return pa.table({"partners": pa.array(uk.astype(np.int64)),
                         "n_parts": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(pairs, ["x"], _deg).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["partners"])] = agg.get(int(p["partners"]), 0) \
            + p["n_parts"]
    ks = sorted(agg)
    return pa.table({
        "partners": pa.array(ks, type=pa.int64()),
        "n_parts": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


COMEBACK_DAYS = 365


def q_comeback_customers(sf_dir: str):
    """Dormancy-reactivation census: customers with at least one gap of
    >= COMEBACK_DAYS whole days between CONSECUTIVE orders (ordered by
    date then orderkey), plus the total number of such comeback gaps.
    One custkey shuffle, segment diff."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"])
    US_DAY = np.int64(86_400_000_000)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_comeback": pa.array([], type=pa.int64()),
                          "n_gaps": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64)
        order = np.lexsort((ok_, d, ck))
        ck, d = ck[order], d[order]
        same = ck[1:] == ck[:-1]
        gap = same & ((d[1:] - d[:-1]) // US_DAY >= COMEBACK_DAYS)
        uc, inv = np.unique(ck, return_inverse=True)
        per = ibincount(inv[1:], gap, minlength=len(uc))
        return pa.table({
            "n_comeback": pa.array([int((per > 0).sum())],
                                   type=pa.int64()),
            "n_gaps": pa.array([int(gap.sum())], type=pa.int64()),
        })

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    return pa.table({
        "n_comeback": pa.array([sum(p["n_comeback"] for p in parts)],
                               type=pa.int64()),
        "n_gaps": pa.array([sum(p["n_gaps"] for p in parts)],
                           type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 59: clustering-by-degree curve, spend-decile priority grid,
# dup-cluster language purity, core-periphery mixing, last-order status
# ---------------------------------------------------------------------------


def q_cc_by_degree(sf_dir: str):
    """The C(k) curve feed: per log2-degree bucket, vertex count, total
    triangles and total wedges C(d,2) — the degree-resolved clustering
    profile (exact integers; the famous clustering-vs-degree decay
    reads off as 2*sum_tri/sum_wedges per bucket). Rides the
    distributed per-vertex triangle recipe
    (`alg.clustering_coefficients`)."""
    ctx = get_context(sf_dir)
    t = alg.clustering_coefficients(ctx.graph("sym").edges, ctx.n)
    deg = np.asarray(t.column("deg"), dtype=np.int64)
    tri = np.asarray(t.column("tri"), dtype=np.int64)
    m = deg >= 2
    deg, tri = deg[m], tri[m]
    # floor(log2(deg)) via frexp (exact: deg < 2^53)
    bucket = np.frexp(deg.astype(np.float64))[1].astype(np.int64) - 1
    wedges = deg * (deg - 1) // 2
    uk, inv = np.unique(bucket, return_inverse=True)
    return pa.table({
        "log2_deg": pa.array(uk),
        "n_vertices": pa.array(np.bincount(inv).astype(np.int64)),
        "sum_tri": pa.array(ibincount(inv, tri, minlength=len(uk))),
        "sum_wedges": pa.array(ibincount(inv, wedges,
                                         minlength=len(uk))),
    })


def q_decile_priority_grid(sf_dir: str):
    """Derived-dimension grid: orders counted by (customer spend-decile
    x priority). Two passes — the bounded per-customer spend aggregate
    assigns rank deciles (the `lorenz_deciles` machinery), the decile
    map broadcasts back over orders for the grid count (classification
    by global quantile, then regroup)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"])

    def _k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        return pa.table({"o_custkey": pa.array(uk),
                         "cents": pa.array(ibincount(inv, cents,
                                                     minlength=len(uk)))})

    per = group_apply_tasks(
        o.map_batches(lambda t: t.select(["o_custkey", "o_totalprice"]),
                      batch_format="pyarrow"),
        ["o_custkey"], _k).take_all()
    ck = np.array([p["o_custkey"] for p in per], dtype=np.int64)
    cents = np.array([p["cents"] for p in per], dtype=np.int64)
    order = np.lexsort((ck, cents))
    n = len(ck)
    dec = np.empty(n, dtype=np.int64)
    dec[order] = np.arange(n, dtype=np.int64) * LORENZ_BUCKETS // n
    so = np.argsort(ck)
    dref = None
    import ray as _ray

    dref = _ray.put((ck[so], dec[so]))

    def _grid(t: pa.Table, *, _r=dref) -> pa.Table:
        keys, decs = _r if isinstance(_r, tuple) else _ray.get(_r)
        if t.num_rows == 0:
            return pa.table({"decile": pa.array([], type=pa.int64()),
                             "prio": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        ckb = np.asarray(t.column("o_custkey"), dtype=np.int64)
        pr = np.asarray(t.column("o_orderpriority")).astype(str)
        pos = np.searchsorted(keys, ckb)
        d = decs[pos]
        key = np.char.add(np.char.add(d.astype(str), "\x1f"), pr)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "decile": pa.array(sp[:, 0].astype(np.int64)),
            "prio": pa.array(sp[:, 2].tolist(), type=pa.string()),
            "n": pa.array(c.astype(np.int64)),
        })

    parts = o.map_batches(_grid, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (int(p["decile"]), p["prio"])
        agg[k] = agg.get(k, 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "decile": pa.array([k[0] for k in ks], type=pa.int64()),
        "o_orderpriority": pa.array([k[1] for k in ks],
                                    type=pa.string()),
        "n_orders": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_dup_cluster_purity(sf_dir: str):
    """COMPOSITE dedup -> metadata audit: near-dup clusters (the
    `dup_clusters` fixed-round min-label assignment; every clustered
    doc has a partner, so clusters have >= 2 members) joined to
    document language — how many clusters are language-PURE vs mixed.
    The contamination check run after every dedup pass."""
    import ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks
    from ..functions import dedup as D

    lab = D.dup_clusters(_docs(sf_dir), tau=0.5,
                         rounds=DUP_CLUSTER_ROUNDS)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    j = hash_join_tasks(lab, docs, on="doc_id")

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_clusters": pa.array([], type=pa.int64()),
                          "n_pure": pa.array([], type=pa.int64()),
                          "n_mixed": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "cluster" not in t.column_names:
            return empty
        lbl = np.asarray(t.column("cluster"), dtype=np.int64)
        lng = np.asarray(t.column("lang")).astype(str)
        order = np.lexsort((lng, lbl))
        lbl, lng = lbl[order], lng[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], lbl[1:] != lbl[:-1]]))
        cnts = np.diff(np.concatenate([starts, [len(lbl)]]))
        pure = mixed = 0
        for s, c in zip(starts, cnts):
            if (lng[s:s + c] == lng[s]).all():
                pure += 1
            else:
                mixed += 1
        return pa.table({
            "n_clusters": pa.array([pure + mixed], type=pa.int64()),
            "n_pure": pa.array([pure], type=pa.int64()),
            "n_mixed": pa.array([mixed], type=pa.int64()),
        })

    parts = group_apply_tasks(j, ["cluster"], _k).take_all()
    return pa.table({
        "n_clusters": pa.array([sum(p["n_clusters"] for p in parts)],
                               type=pa.int64()),
        "n_pure": pa.array([sum(p["n_pure"] for p in parts)],
                           type=pa.int64()),
        "n_mixed": pa.array([sum(p["n_mixed"] for p in parts)],
                            type=pa.int64()),
    })


def q_core_periphery_mix(sf_dir: str):
    """Core-periphery mixing matrix: distinct undirected edges
    classified by hub membership of their endpoints (core = the APSP_K
    top-degree set) — (core-core, core-periphery,
    periphery-periphery) counts. Hub set broadcast; one edge pass with
    batch-local dedup riding the distinct-pair graph."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    S = np.sort(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), APSP_K))
    sref = ray.put(S)
    be = ctx.graph("sym").dedup_sum().cast_bool().edges

    def _cls(t: pa.Table, *, _r=sref) -> pa.Table:
        sel = _r if isinstance(_r, np.ndarray) else ray.get(_r)
        empty = pa.table({"n_cc": pa.array([], type=pa.int64()),
                          "n_cp": pa.array([], type=pa.int64()),
                          "n_pp": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d  # each undirected edge once
        s, d = s[keep], d[keep]
        ic = np.isin(s, sel).astype(np.int64) + np.isin(d, sel)
        return pa.table({
            "n_cc": pa.array([int((ic == 2).sum())], type=pa.int64()),
            "n_cp": pa.array([int((ic == 1).sum())], type=pa.int64()),
            "n_pp": pa.array([int((ic == 0).sum())], type=pa.int64()),
        })

    parts = be.map_batches(_cls, batch_format="pyarrow").take_all()
    return pa.table({
        "n_cc": pa.array([sum(p["n_cc"] for p in parts)],
                         type=pa.int64()),
        "n_cp": pa.array([sum(p["n_cp"] for p in parts)],
                         type=pa.int64()),
        "n_pp": pa.array([sum(p["n_pp"] for p in parts)],
                         type=pa.int64()),
    })


def q_last_order_status(sf_dir: str):
    """Final-state census: the status of each customer's LAST order
    (by date, ties by orderkey DESC -> the latest key wins), counted
    per status — the last-value-per-group class on the orders domain.
    One custkey shuffle, segment argmax."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_orderstatus"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderstatus": pa.array([], type=pa.string()),
                          "n_customers": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64)
        st = np.asarray(t.column("o_orderstatus")).astype(str)
        order = np.lexsort((ok_, d, ck))
        ck, st = ck[order], st[order]
        last = np.concatenate([ck[1:] != ck[:-1], [True]])
        uk, c = np.unique(st[last], return_counts=True)
        return pa.table({
            "o_orderstatus": pa.array(uk.tolist(), type=pa.string()),
            "n_customers": pa.array(c.astype(np.int64)),
        })

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["o_orderstatus"]] = agg.get(p["o_orderstatus"], 0) \
            + p["n_customers"]
    ks = sorted(agg)
    return pa.table({
        "o_orderstatus": pa.array(ks, type=pa.string()),
        "n_customers": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 60: BFS children histogram, length-frequency grid, user type
# diversity, strong-tie triangles, nation top brand
# ---------------------------------------------------------------------------


def q_bfs_children_hist(sf_dir: str):
    """BFS tree SHAPE census: histogram of children-per-parent in the
    deterministic parent tree (parent = lexicographically smallest
    neighbor one level closer, the `bfs_parents` rule) — output
    (n_children, n_parents). Tree fan-out profile for frontier-cost
    models."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    parents, dist = alg.bfs_parents(ctx.engine("sym"), root)
    ids = np.nonzero((parents >= 0) & (np.arange(ctx.n) != root))[0]
    cnt = np.bincount(parents[ids].astype(np.int64))
    cnt = cnt[cnt > 0]
    uk, c = np.unique(cnt, return_counts=True)
    return pa.table({"n_children": pa.array(uk.astype(np.int64)),
                     "n_parents": pa.array(c.astype(np.int64))})


def q_len_freq_grid(sf_dir: str):
    """Vocabulary (token length x log2 global frequency) census — the
    joint profile behind subword-tokenizer sizing. One token shuffle
    for exact global frequencies, bounded (len, bucket) partials."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])

    def _cnt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        toks = tokens_list(b)
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        uk, c = np.unique(flat, return_counts=True)
        return pa.table({"tok": pa.array(uk.tolist(),
                                         type=pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    partial = docs.map_batches(_cnt, batch_format="pyarrow",
                               zero_copy_batch=True)

    def _grid(t: pa.Table) -> pa.Table:
        empty = pa.table({"tok_len": pa.array([], type=pa.int64()),
                          "log2_freq": pa.array([], type=pa.int64()),
                          "n_tokens": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        tok = np.asarray(t.column("tok")).astype(str)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(tok, return_inverse=True)
        freq = ibincount(inv, c, minlength=len(uk))
        ln = np.char.str_len(uk).astype(np.int64)
        lf = np.frexp(freq.astype(np.float64))[1].astype(np.int64) - 1
        key = ln * np.int64(1 << 20) + lf
        kk, n = np.unique(key, return_counts=True)
        return pa.table({
            "tok_len": pa.array((kk >> 20).astype(np.int64)),
            "log2_freq": pa.array((kk & ((1 << 20) - 1))
                                  .astype(np.int64)),
            "n_tokens": pa.array(n.astype(np.int64)),
        })

    parts = group_apply_tasks(partial, ["tok"], _grid).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (int(p["tok_len"]), int(p["log2_freq"]))
        agg[k] = agg.get(k, 0) + p["n_tokens"]
    ks = sorted(agg)
    return pa.table({
        "tok_len": pa.array([k[0] for k in ks], type=pa.int64()),
        "log2_freq": pa.array([k[1] for k in ks], type=pa.int64()),
        "n_tokens": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_user_type_div_hist(sf_dir: str):
    """Behavioral-diversity census: histogram of DISTINCT event types
    per user (n_types, n_users) — one user shuffle, bounded partials."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_types": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        key = np.unique(np.char.add(np.char.add(
            uid.astype(str), "\x1f"), et))
        sp = np.char.partition(key, "\x1f")
        _, c = np.unique(sp[:, 0], return_counts=True)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"n_types": pa.array(uk.astype(np.int64)),
                         "n_users": pa.array(n.astype(np.int64))})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["n_types"])] = agg.get(int(p["n_types"]), 0) \
            + p["n_users"]
    ks = sorted(agg)
    return pa.table({
        "n_types": pa.array(ks, type=pa.int64()),
        "n_users": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_strong_triangles(sf_dir: str):
    """Strong-tie closure: triangle count over the FULL distinct
    undirected graph and over the PRUNED w >= 2 subgraph (symmetric
    multiplicity; `PruneI` -> masked-SpGEMM composite, `SpParMat.h:161`)
    — output rows (w_min, triangles). Strong ties close triangles at a
    different rate than weak ones (Granovetter)."""
    ctx = get_context(sf_dir)
    g = ctx.graph("sym").dedup_sum()
    rows = []
    for wmin in (1, 2):
        if wmin == 1:
            edges = g.edges
        else:
            def _f(t: pa.Table, *, _w=wmin) -> pa.Table:
                w = np.asarray(t.column("w"), dtype=np.float64)
                return t.filter(pa.array(w >= _w))

            edges = g.edges.map_batches(_f, batch_format="pyarrow")
        cnt = alg.triangle_count(edges, ctx.n, method="join")
        rows.append((wmin, int(cnt)))
    return pa.table({
        "w_min": pa.array([r[0] for r in rows], type=pa.int64()),
        "triangles": pa.array([r[1] for r in rows], type=pa.int64()),
    })


def q_nation_top_brand(sf_dir: str):
    """Group-ARGMAX over a join chain: for each customer nation, the
    part brand with the highest revenue cents (ties -> brand asc).
    lineitem->orders->customer joins co-partitioned with fused
    projections; the part->brand map is the documented broadcast small
    side; per-(nation, brand) partials are bounded (25 x 25)."""
    import ray

    from ..core.shuffle import hash_join_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice",
                 "l_discount"])
    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"])
    c = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    p = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"]).take_all()
    pk = np.array(sorted(int(r["p_partkey"]) for r in p),
                  dtype=np.int64)
    bmap = dict((int(r["p_partkey"]), r["p_brand"]) for r in p)
    bv = np.array([bmap[k] for k in pk], dtype=object)
    pref = ray.put((pk, bv))

    def _rev(t: pa.Table, *, _r=pref) -> pa.Table:
        kk, vv = _r if isinstance(_r, tuple) else ray.get(_r)
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "brand": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64())})
        part = np.asarray(t.column("l_partkey"), dtype=np.int64)
        pos = np.minimum(np.searchsorted(kk, part), len(kk) - 1)
        okm = kk[pos] == part
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64)
            * (1.0 - np.asarray(t.column("l_discount"),
                                dtype=np.float64)) * 100).astype(
            np.int64)
        return pa.table({
            "o_custkey": pa.array(np.asarray(
                t.column("o_custkey"), dtype=np.int64)[okm]),
            "brand": pa.array(vv[pos][okm].tolist(),
                              type=pa.string()),
            "cents": pa.array(cents[okm]),
        })

    lo = hash_join_tasks(li, o, on="l_orderkey", right_on="o_orderkey",
                         post=_rev)

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"nk": pa.array([], type=pa.int64()),
                             "brand": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64())})
        nk = np.asarray(t.column("c_nationkey"), dtype=np.int64)
        br = np.asarray(t.column("brand")).astype(str)
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        key = np.char.add(np.char.add(
            np.char.zfill(nk.astype(str), 4), "\x1f"), br)
        uk, inv = np.unique(key, return_inverse=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "nk": pa.array(sp[:, 0].astype(np.int64)),
            "brand": pa.array(sp[:, 2].tolist(), type=pa.string()),
            "cents": pa.array(ibincount(inv, cents,
                                        minlength=len(uk))),
        })

    parts = hash_join_tasks(lo, c, on="o_custkey",
                            right_on="c_custkey",
                            post=_agg).take_all()
    agg: dict[tuple, int] = {}
    for r in parts:
        k = (int(r["nk"]), r["brand"])
        agg[k] = agg.get(k, 0) + r["cents"]
    best: dict[int, tuple] = {}
    for (nk, br), cents in sorted(agg.items()):
        cur = best.get(nk)
        if cur is None or cents > cur[1]:
            best[nk] = (br, cents)
    ks = sorted(best)
    return pa.table({
        "nk": pa.array(ks, type=pa.int64()),
        "top_brand": pa.array([best[k][0] for k in ks],
                              type=pa.string()),
        "cents": pa.array([best[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 61: daily new users, centroid distances, priority escalation,
# supplier brand span, discount-band revenue share
# ---------------------------------------------------------------------------


def q_daily_new_users(sf_dir: str):
    """User-novelty curve: per day, the number of distinct active
    users and how many of them are NEW (first-ever event that day) —
    the acquisition/returning split. Two bounded aggregates off one
    user shuffle: per-user first-day plus per-(day,user) distinct."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    US_DAY = np.int64(86_400_000_000)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], type=pa.int64()),
                          "n_active": pa.array([], type=pa.int64()),
                          "n_new": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        day = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64) // US_DAY
        key = np.unique(_pack20(uid, day))  # width-asserted pack
        u = (key >> 20).astype(np.int64)
        d = (key & ((1 << 20) - 1)).astype(np.int64)
        act_d, act_c = np.unique(d, return_counts=True)
        # first day per user: key sorted -> first row of each user run
        first = np.concatenate([[True], u[1:] != u[:-1]])
        new_d, new_c = np.unique(d[first], return_counts=True)
        days = np.union1d(act_d, new_d)
        na = np.zeros(len(days), dtype=np.int64)
        na[np.searchsorted(days, act_d)] = act_c
        nn = np.zeros(len(days), dtype=np.int64)
        nn[np.searchsorted(days, new_d)] = new_c
        return pa.table({"day": pa.array(days),
                         "n_active": pa.array(na),
                         "n_new": pa.array(nn)})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[int, list[int]] = {}
    for p in parts:
        e = agg.setdefault(int(p["day"]), [0, 0])
        e[0] += p["n_active"]
        e[1] += p["n_new"]
    ks = sorted(agg)
    return pa.table({
        "day": pa.array(ks, type=pa.int64()),
        "n_active": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_new": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


def q_centroid_dists(sf_dir: str):
    """Pairwise exact squared distances between the per-label integer
    centroids (the `label_centroids` floor-means) — the class-geometry
    audit (which classes sit close). Bounded: labels^2 driver rows over
    the distributed centroid aggregate."""
    t = q_label_centroids(sf_dir)
    lab = np.asarray(t.column("label"), dtype=np.int64)
    dim = np.asarray(t.column("dim"), dtype=np.int64)
    cq = np.asarray(t.column("centroid_q"), dtype=np.int64)
    ul = np.unique(lab)
    nd = int(dim.max()) + 1
    C = np.zeros((len(ul), nd), dtype=np.int64)
    C[np.searchsorted(ul, lab), dim] = cq
    la, lb, d2 = [], [], []
    for i in range(len(ul)):
        for j in range(i + 1, len(ul)):
            diff = C[i] - C[j]
            la.append(int(ul[i]))
            lb.append(int(ul[j]))
            d2.append(int((diff * diff).sum()))
    return pa.table({"la": pa.array(la, type=pa.int64()),
                     "lb": pa.array(lb, type=pa.int64()),
                     "dist2": pa.array(d2, type=pa.int64())})


def q_priority_escalation(sf_dir: str):
    """Consecutive-order priority ESCALATION census per customer:
    transitions classified by the leading priority digit (1-URGENT ..
    5-LOW; lower digit = more urgent) as up (more urgent), down, or
    same — the order-domain sequence-transition matrix summary. Orders
    sequenced by (date, orderkey); one custkey shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_orderpriority"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_up": pa.array([], type=pa.int64()),
                          "n_down": pa.array([], type=pa.int64()),
                          "n_same": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64)
        pr = np.asarray(t.column("o_orderpriority")).astype(str)
        dig = pr.astype('U1').astype(np.int64)  # leading digit
        order = np.lexsort((ok_, d, ck))
        ck, dig = ck[order], dig[order]
        same_c = ck[1:] == ck[:-1]
        diff = dig[1:] - dig[:-1]
        return pa.table({
            "n_up": pa.array([int((same_c & (diff < 0)).sum())],
                             type=pa.int64()),
            "n_down": pa.array([int((same_c & (diff > 0)).sum())],
                               type=pa.int64()),
            "n_same": pa.array([int((same_c & (diff == 0)).sum())],
                               type=pa.int64()),
        })

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    return pa.table({
        "n_up": pa.array([sum(p["n_up"] for p in parts)],
                         type=pa.int64()),
        "n_down": pa.array([sum(p["n_down"] for p in parts)],
                           type=pa.int64()),
        "n_same": pa.array([sum(p["n_same"] for p in parts)],
                           type=pa.int64()),
    })


def q_supplier_brand_span(sf_dir: str):
    """Supplier assortment census: distinct part BRANDS shipped per
    supplier, as a (brands, n_suppliers) histogram — the supply-chain
    diversity profile. Brand map broadcast; one suppkey shuffle of
    distinct (supplier, brand) partials."""
    import ray

    from ..core.shuffle import group_apply_tasks

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_partkey"])
    p = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"]).take_all()
    pk = np.array(sorted(int(r["p_partkey"]) for r in p),
                  dtype=np.int64)
    bmap = dict((int(r["p_partkey"]), r["p_brand"]) for r in p)
    bv = np.array([bmap[k] for k in pk], dtype=object)
    pref = ray.put((pk, bv))

    def _pre(t: pa.Table, *, _r=pref) -> pa.Table:
        kk, vv = _r if isinstance(_r, tuple) else ray.get(_r)
        empty = pa.table({"sk": pa.array([], type=pa.int64()),
                          "brand": pa.array([], type=pa.string())})
        if t.num_rows == 0:
            return empty
        sk = np.asarray(t.column("l_suppkey"), dtype=np.int64)
        part = np.asarray(t.column("l_partkey"), dtype=np.int64)
        pos = np.minimum(np.searchsorted(kk, part), len(kk) - 1)
        okm = kk[pos] == part
        key = np.unique(np.char.add(np.char.add(
            sk[okm].astype(str), "\x1f"),
            vv[pos][okm].astype(str)))
        sp = np.char.partition(key, "\x1f")
        return pa.table({"sk": pa.array(sp[:, 0].astype(np.int64)),
                         "brand": pa.array(sp[:, 2].tolist(),
                                           type=pa.string())})

    pre = li.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"brands": pa.array([], type=pa.int64()),
                          "n_suppliers": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "sk" not in t.column_names:
            return empty
        key = np.unique(np.char.add(np.char.add(
            np.asarray(t.column("sk"), dtype=np.int64).astype(str),
            "\x1f"), np.asarray(t.column("brand")).astype(str)))
        sp = np.char.partition(key, "\x1f")
        _, c = np.unique(sp[:, 0], return_counts=True)
        uk, n = np.unique(c, return_counts=True)
        return pa.table({"brands": pa.array(uk.astype(np.int64)),
                         "n_suppliers": pa.array(n.astype(np.int64))})

    parts = group_apply_tasks(pre, ["sk"], _k).take_all()
    agg: dict[int, int] = {}
    for p_ in parts:
        agg[int(p_["brands"])] = agg.get(int(p_["brands"]), 0) \
            + p_["n_suppliers"]
    ks = sorted(agg)
    return pa.table({
        "brands": pa.array(ks, type=pa.int64()),
        "n_suppliers": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


DISC_BANDS = (0, 3, 6, 9)


def q_disc_band_share(sf_dir: str):
    """Revenue by discount band (cents bands 0-2, 3-5, 6-8, 9+):
    lineitem count and exact revenue cents per band — the promo-mix
    profile, shuffle-free bounded partials."""
    import ray

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_extendedprice"])

    def _part(t: pa.Table) -> pa.Table:
        dc = np.floor(np.asarray(t.column("l_discount"),
                                 dtype=np.float64) * 100
                      + 0.5).astype(np.int64)
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64)
            * 100 + 0.5).astype(np.int64)
        band = np.searchsorted(np.array(DISC_BANDS[1:], dtype=np.int64),
                               dc, side="right")
        n = np.bincount(band, minlength=len(DISC_BANDS)).astype(
            np.int64)
        s = ibincount(band, cents, minlength=len(DISC_BANDS))
        return pa.table({
            "band": pa.array(np.arange(len(DISC_BANDS),
                                       dtype=np.int64)),
            "n_lines": pa.array(n),
            "sum_cents": pa.array(s),
        })

    parts = li.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg = np.zeros((len(DISC_BANDS), 2), dtype=np.int64)
    for p in parts:
        agg[int(p["band"]), 0] += p["n_lines"]
        agg[int(p["band"]), 1] += p["sum_cents"]
    keep = agg[:, 0] > 0  # SQL GROUP BY omits empty bands
    return pa.table({
        "band": pa.array(np.arange(len(DISC_BANDS),
                                   dtype=np.int64)[keep]),
        "n_lines": pa.array(agg[keep, 0]),
        "sum_cents": pa.array(agg[keep, 1]),
    })


# ---------------------------------------------------------------------------
# wave 62: type-run histogram, LSH bucket census, status-line grid,
# quality-gate grid, local homophily histogram
# ---------------------------------------------------------------------------


def q_type_run_hist(sf_dir: str):
    """Run-length DISTRIBUTION of consecutive same-type events per
    user sequence ((ts, event_id) order): histogram (run_len, n_runs)
    — the full islands census behind `max_type_run`'s extremum. One
    user shuffle, vectorized run detection."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"run_len": pa.array([], type=pa.int64()),
                          "n_runs": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        order = np.lexsort((eid, tsi, uid))
        uid, et = uid[order], et[order]
        new = np.concatenate([[True], (uid[1:] != uid[:-1])
                              | (et[1:] != et[:-1])])
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate([starts, [len(uid)]]))
        uk, c = np.unique(lens, return_counts=True)
        return pa.table({"run_len": pa.array(uk.astype(np.int64)),
                         "n_runs": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["run_len"])] = agg.get(int(p["run_len"]), 0) \
            + p["n_runs"]
    ks = sorted(agg)
    return pa.table({
        "run_len": pa.array(ks, type=pa.int64()),
        "n_runs": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


LSHC_DIMS = 8


def q_lsh_bucket_census(sf_dir: str):
    """Sign-LSH bucket BALANCE audit: bucket = the 8-bit sign pattern
    of dims 0..7 of the quantized embedding (q >= 2^19 -> original
    value >= 0, bit set); output the histogram of bucket sizes
    (bucket_size, n_buckets). Skewed bucket occupancy predicts LSH
    probe blowup — the planning census before `ann_lsh_topk`."""
    import ray

    from ..core.shuffle import group_apply_tasks

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    HALF = np.int64(1 << 19)  # q = floor((x+0.5)*2^20); x>=0 <=> q>=2^19

    def _b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        _, Q = _km_quant(t)
        bits = (Q[:, :LSHC_DIMS] >= HALF).astype(np.int64)
        bucket = (bits << np.arange(LSHC_DIMS,
                                    dtype=np.int64)).sum(axis=1)
        uk, c = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(uk),
                         "c": pa.array(c.astype(np.int64))})

    parts = emb.map_batches(_b, batch_format="pyarrow",
                            zero_copy_batch=True)

    def _m(t: pa.Table) -> pa.Table:
        empty = pa.table({"bucket_size": pa.array([], type=pa.int64()),
                          "n_buckets": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "bucket" not in t.column_names:
            return empty
        b = np.asarray(t.column("bucket"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(b, return_inverse=True)
        tot = ibincount(inv, c, minlength=len(uk))
        sz, n = np.unique(tot, return_counts=True)
        return pa.table({"bucket_size": pa.array(sz.astype(np.int64)),
                         "n_buckets": pa.array(n.astype(np.int64))})

    parts2 = group_apply_tasks(parts, ["bucket"], _m).take_all()
    agg: dict[int, int] = {}
    for p in parts2:
        agg[int(p["bucket_size"])] = agg.get(int(p["bucket_size"]), 0) \
            + p["n_buckets"]
    ks = sorted(agg)
    return pa.table({
        "bucket_size": pa.array(ks, type=pa.int64()),
        "n_buckets": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_status_line_grid(sf_dir: str):
    """Cross-table consistency audit: lineitem counts per
    (o_orderstatus, l_linestatus) pair — the order-vs-line lifecycle
    agreement grid, one co-partitioned orderkey join with the pair
    count fused in."""
    import ray

    from ..core.shuffle import hash_join_tasks

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_linestatus"])
    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderstatus"])

    def _agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"os": pa.array([], type=pa.string()),
                             "ls": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        osv = np.asarray(t.column("o_orderstatus")).astype(str)
        lsv = np.asarray(t.column("l_linestatus")).astype(str)
        key = np.char.add(np.char.add(osv, "\x1f"), lsv)
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"os": pa.array(sp[:, 0].tolist(),
                                        type=pa.string()),
                         "ls": pa.array(sp[:, 2].tolist(),
                                        type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    parts = hash_join_tasks(li, o, on="l_orderkey",
                            right_on="o_orderkey",
                            post=_agg).take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (p["os"], p["ls"])
        agg[k] = agg.get(k, 0) + p["n"]
    ks = sorted(agg)
    return pa.table({
        "o_orderstatus": pa.array([k[0] for k in ks],
                                  type=pa.string()),
        "l_linestatus": pa.array([k[1] for k in ks],
                                 type=pa.string()),
        "n_lines": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_quality_gate_grid(sf_dir: str):
    """Quality-gate 2x2 census: documents counted by (passes the
    length gate, passes the distinct-ratio gate) — the audit face of
    `prep_corpus`'s fused filter (which cells does the gate actually
    cut?). Shuffle-free bounded partials."""
    import ray

    from ..functions.text import tokens_list

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])

    def _part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"pass_len": pa.array([], type=pa.int64()),
                             "pass_ratio": pa.array([], type=pa.int64()),
                             "n_docs": pa.array([], type=pa.int64())})
        toks = tokens_list(b)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(pc.list_flatten(toks)).astype(str)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        par = np.asarray(pc.list_parent_indices(toks), dtype=np.int64)
        # distinct-per-doc, fully vectorized: sort (doc, token), count
        # first occurrences per doc
        order = np.lexsort((flat, par))
        pp, ff = par[order], flat[order]
        first = np.concatenate([[True], (pp[1:] != pp[:-1])
                                | (ff[1:] != ff[:-1])])
        nd = np.bincount(pp[first], minlength=b.num_rows).astype(
            np.int64)
        pl = (lens >= PREP_MIN_TOKS).astype(np.int64)
        pr = (nd * PREP_MIN_DR_DEN >= lens * PREP_MIN_DR_NUM).astype(
            np.int64)
        key = pl * 2 + pr
        c = np.bincount(key, minlength=4).astype(np.int64)
        return pa.table({
            "pass_len": pa.array(np.array([0, 0, 1, 1],
                                          dtype=np.int64)),
            "pass_ratio": pa.array(np.array([0, 1, 0, 1],
                                            dtype=np.int64)),
            "n_docs": pa.array(c),
        })

    parts = docs.map_batches(_part, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    agg = np.zeros(4, dtype=np.int64)
    for p in parts:
        agg[int(p["pass_len"]) * 2 + int(p["pass_ratio"])] += \
            p["n_docs"]
    keep = agg > 0
    pl = np.array([0, 0, 1, 1], dtype=np.int64)
    pr = np.array([0, 1, 0, 1], dtype=np.int64)
    return pa.table({
        "pass_len": pa.array(pl[keep]),
        "pass_ratio": pa.array(pr[keep]),
        "n_docs": pa.array(agg[keep]),
    })


HOMO_BUCKETS = 10


def q_local_homophily_hist(sf_dir: str):
    """Node-level homophily distribution: per vertex, the share of
    distinct neighbors in the SAME repo (repo = arith % 100), bucketed
    floor(share * 10) — histogram (decile, n_vertices) over vertices
    with >= 1 neighbor. Per-edge same-repo flags via the arith decoder,
    one endpoint shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    be = ctx.graph("sym").dedup_sum().cast_bool().edges
    dec = ctx.decoder()

    def _flag(t: pa.Table, *, _d=dec) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], type=pa.int64()),
                             "same": pa.array([], type=pa.int64())})
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        same = (_d.arith(s) % 100 == _d.arith(d) % 100).astype(np.int64)
        return pa.table({"v": pa.array(s), "same": pa.array(same)})

    flags = be.map_batches(_flag, batch_format="pyarrow")

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], type=pa.int64()),
                          "n_vertices": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "v" not in t.column_names:
            return empty
        v = np.asarray(t.column("v"), dtype=np.int64)
        sm = np.asarray(t.column("same"), dtype=np.int64)
        uk, inv = np.unique(v, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        same = ibincount(inv, sm, minlength=len(uk))
        dec_ = same * np.int64(HOMO_BUCKETS) // tot
        dec_ = np.minimum(dec_, HOMO_BUCKETS - 1)  # share==1 -> top
        uk2, c = np.unique(dec_, return_counts=True)
        return pa.table({"decile": pa.array(uk2.astype(np.int64)),
                         "n_vertices": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(flags, ["v"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["decile"])] = agg.get(int(p["decile"]), 0) \
            + p["n_vertices"]
    ks = sorted(agg)
    return pa.table({
        "decile": pa.array(ks, type=pa.int64()),
        "n_vertices": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 63: brand rank concordance, 2-hop ball census, dedup share by
# source, type gap medians, brand price mode
# ---------------------------------------------------------------------------

BRC_YEARS = (1995, 1996)


def q_brand_rank_concordance(sf_dir: str):
    """Kendall-tau SUFFICIENT COUNTS between two years' brand revenue
    rankings: over all brand pairs, concordant / discordant / tied
    (exact integer cents revenues; the rank-stability audit between
    periods). Distributed per-(brand, year) sums; the 25-brand pair
    scan is driver-side."""
    import ray

    from ..core.shuffle import hash_join_tasks

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice",
                 "l_discount"])
    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_orderdate"])
    p = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"]).take_all()
    pk = np.array(sorted(int(r["p_partkey"]) for r in p),
                  dtype=np.int64)
    bmap = dict((int(r["p_partkey"]), r["p_brand"]) for r in p)
    bv = np.array([bmap[k] for k in pk], dtype=object)
    pref = ray.put((pk, bv))

    def _agg(t: pa.Table, *, _r=pref) -> pa.Table:
        kk, vv = _r if isinstance(_r, tuple) else ray.get(_r)
        empty = pa.table({"brand": pa.array([], type=pa.string()),
                          "yr": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        yr = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[Y]").view(np.int64) + 1970
        sel = (yr == BRC_YEARS[0]) | (yr == BRC_YEARS[1])
        if not sel.any():
            return empty
        part = np.asarray(t.column("l_partkey"), dtype=np.int64)[sel]
        pos = np.minimum(np.searchsorted(kk, part), len(kk) - 1)
        okm = kk[pos] == part
        cents = np.floor(
            np.asarray(t.column("l_extendedprice"),
                       dtype=np.float64)[sel]
            * (1.0 - np.asarray(t.column("l_discount"),
                                dtype=np.float64)[sel])
            * 100).astype(np.int64)
        key = np.char.add(np.char.add(
            vv[pos][okm].astype(str), "\x1f"),
            yr[sel][okm].astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "brand": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "yr": pa.array(sp[:, 2].astype(np.int64)),
            "cents": pa.array(ibincount(inv, cents[okm],
                                        minlength=len(uk))),
        })

    parts = hash_join_tasks(li, o, on="l_orderkey",
                            right_on="o_orderkey",
                            post=_agg).take_all()
    agg: dict[tuple, int] = {}
    for r in parts:
        k = (r["brand"], int(r["yr"]))
        agg[k] = agg.get(k, 0) + r["cents"]
    brands = sorted({k[0] for k in agg})
    a = np.array([agg.get((b, BRC_YEARS[0]), 0) for b in brands],
                 dtype=np.int64)
    b = np.array([agg.get((b, BRC_YEARS[1]), 0) for b in brands],
                 dtype=np.int64)
    conc = disc = ties = 0
    for i in range(len(brands)):
        for j in range(i + 1, len(brands)):
            da, db = a[i] - a[j], b[i] - b[j]
            if da == 0 or db == 0:
                ties += 1
            elif (da > 0) == (db > 0):
                conc += 1
            else:
                disc += 1
    return pa.table({
        "n_pairs": pa.array([conc + disc + ties], type=pa.int64()),
        "n_concordant": pa.array([conc], type=pa.int64()),
        "n_discordant": pa.array([disc], type=pa.int64()),
        "n_tied": pa.array([ties], type=pa.int64()),
    })


def q_reach2_hist(sf_dir: str):
    """2-hop BALL-SIZE census: per vertex, |{u != v : dist(v, u) <=
    2}| over the undirected distinct graph, as a histogram
    (ball_size, n_vertices). ONE fused SpGEMM: C = A(A + I) covers
    1-hop UNION 2-hop in the same multiply (self-loops on the right =
    the identity term), `partition_on='src'` lands every vertex's ball
    whole in one merge partition, and the histogram partial runs as the
    merge's `post_fn` — no second shuffle, no union stage (was: SpGEMM
    + union + src shuffle). The neighborhood-function feed (HyperANF's
    exact small-radius twin)."""
    import ray

    from ..core.spgemm import spgemm

    ctx = get_context(sf_dir)
    be = ctx.graph("sym").dedup_sum().cast_bool()

    def _eye(b: pa.Table) -> pa.Table:
        i = np.asarray(b.column("id"), dtype=np.int64)
        return pa.table({"src": pa.array(i), "dst": pa.array(i),
                         "w": pa.array(np.ones(len(i)))})

    eye = ray.data.range(ctx.n).map_batches(_eye, batch_format="pyarrow")

    def _ball_hist(t: pa.Table) -> pa.Table:
        empty = pa.table({"ball_size": pa.array([], type=pa.int64()),
                          "n_vertices": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        s = s[s != d]  # (src, dst) rows are distinct post-merge
        if not len(s):
            return empty
        _, cnt = np.unique(s, return_counts=True)
        uk, c = np.unique(cnt, return_counts=True)
        return pa.table({"ball_size": pa.array(uk.astype(np.int64)),
                         "n_vertices": pa.array(c.astype(np.int64))})

    both = spgemm(be.edges, be.edges.union(eye), ctx.n,
                  partition_on="src", post_fn=_ball_hist)

    parts = both.take_all()  # bounded histogram partials
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["ball_size"])] = agg.get(int(p["ball_size"]), 0) \
            + p["n_vertices"]
    ks = sorted(agg)
    return pa.table({
        "ball_size": pa.array(ks, type=pa.int64()),
        "n_vertices": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_dedup_share_by_source(sf_dir: str):
    """Exact-dedup survivor share per SOURCE: per source, document
    count and how many are their duplicate group's canonical (min
    doc_id) representative — the per-slice dedup yield audit
    (composite dedup -> metadata group)."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import dedup_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"])

    def _keyed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string())})
        keys = dedup_key(b.select(["doc_id", "text"]))
        return pa.table({"k": keys,
                         "doc_id": b.column("doc_id"),
                         "source": b.column("source")})

    keyed = docs.map_batches(_keyed, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _canon(t: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "n_docs": pa.array([], type=pa.int64()),
                          "n_canonical": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "k" not in t.column_names:
            return empty
        k = np.asarray(t.column("k")).astype(str)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        src_ = np.asarray(t.column("source")).astype(str)
        order = np.lexsort((did, k))
        k, did, src_ = k[order], did[order], src_[order]
        first = np.concatenate([[True], k[1:] != k[:-1]])
        canon = np.zeros(len(k), dtype=np.int64)
        canon[first] = 1
        uk, inv = np.unique(src_, return_inverse=True)
        return pa.table({
            "source": pa.array(uk.tolist(), type=pa.string()),
            "n_docs": pa.array(np.bincount(
                inv, minlength=len(uk)).astype(np.int64)),
            "n_canonical": pa.array(ibincount(inv, canon,
                                              minlength=len(uk))),
        })

    parts = group_apply_tasks(keyed, ["k"], _canon).take_all()
    agg: dict[str, list[int]] = {}
    for p in parts:
        e = agg.setdefault(p["source"], [0, 0])
        e[0] += p["n_docs"]
        e[1] += p["n_canonical"]
    ks = sorted(agg)
    return pa.table({
        "source": pa.array(ks, type=pa.string()),
        "n_docs": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "n_canonical": pa.array([agg[k][1] for k in ks],
                                type=pa.int64()),
    })


def q_type_gap_median(sf_dir: str):
    """Per event type: exact discrete median and p90 of the
    inter-event gaps (microseconds) in the type's GLOBAL (ts,
    event_id) order — the arrival-process profile; sequence diff +
    holistic quantile in one keyed shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_gaps": pa.array([], type=pa.int64()),
                          "gap_q50_us": pa.array([], type=pa.int64()),
                          "gap_q90_us": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((eid, tsi, et))
        et, tsi = et[order], tsi[order]
        same = et[1:] == et[:-1]
        gaps = (tsi[1:] - tsi[:-1])[same]
        ge = et[1:][same]
        if not len(gaps):
            return empty
        o2 = np.lexsort((gaps, ge))
        ge, gaps = ge[o2], gaps[o2]
        keys, starts, cnts = np.unique(ge, return_index=True,
                                       return_counts=True)
        q50 = gaps[starts + np.minimum(
            cnts - 1, np.ceil(0.5 * cnts).astype(np.int64) - 1)]
        q90 = gaps[starts + np.minimum(
            cnts - 1, np.ceil(0.9 * cnts).astype(np.int64) - 1)]
        return pa.table({
            "event_type": pa.array(keys.tolist(), type=pa.string()),
            "n_gaps": pa.array(cnts.astype(np.int64)),
            "gap_q50_us": pa.array(q50),
            "gap_q90_us": pa.array(q90),
        })

    return group_apply_tasks(ev, ["event_type"], _k)


def q_brand_price_mode(sf_dir: str):
    """Modal retail price per brand (exact cents; ties -> lowest
    cents) with its multiplicity — the numeric-mode class. Bounded
    (brand, cents) partials, driver argmax."""
    import ray

    p = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_brand", "p_retailprice"])

    def _part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"brand": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        br = np.asarray(t.column("p_brand")).astype(str)
        cents = np.floor(np.asarray(t.column("p_retailprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(br, "\x1f"),
                          np.char.zfill(cents.astype(str), 12))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "brand": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "cents": pa.array(sp[:, 2].astype(np.int64)),
            "c": pa.array(c.astype(np.int64)),
        })

    parts = p.map_batches(_part, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    agg: dict[tuple, int] = {}
    for r in parts:
        k = (r["brand"], int(r["cents"]))
        agg[k] = agg.get(k, 0) + r["c"]
    best: dict[str, tuple] = {}
    for (br, cents), c in sorted(agg.items()):
        cur = best.get(br)
        if cur is None or c > cur[1]:
            best[br] = (cents, c)
    ks = sorted(best)
    return pa.table({
        "p_brand": pa.array(ks, type=pa.string()),
        "modal_cents": pa.array([best[k][0] for k in ks],
                                type=pa.int64()),
        "n": pa.array([best[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 64: customer concentration, weekend split, name-key audit,
# id alignment audit, region profile
# ---------------------------------------------------------------------------


def q_cust_concentration(sf_dir: str):
    """Per-customer spend CONCENTRATION census: decile of (largest
    order / total spend) per customer with >= 1 order, bucket =
    max_cents * 10 // total_cents (integer-exact, no division) —
    histogram (decile, n_customers). The whale-order dependence
    profile."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_totalprice"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], type=pa.int64()),
                          "n_customers": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        tot = ibincount(inv, cents, minlength=len(uk))
        mx = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(mx, inv, cents)
        dec = np.minimum(mx * np.int64(10) // tot, 9)
        ud, c = np.unique(dec, return_counts=True)
        return pa.table({"decile": pa.array(ud.astype(np.int64)),
                         "n_customers": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["decile"])] = agg.get(int(p["decile"]), 0) \
            + p["n_customers"]
    ks = sorted(agg)
    return pa.table({
        "decile": pa.array(ks, type=pa.int64()),
        "n_customers": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_weekend_split(sf_dir: str):
    """Weekend-vs-weekday split per event type: count and exact value
    cents sums (epoch day % 7: day 0 = Thursday, so weekend = days 2
    and 3 of the modulus) — the calendar-effect profile, shuffle-free
    bounded partials."""
    import ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"])
    US_DAY = np.int64(86_400_000_000)

    def _part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "is_weekend": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "sum_cents": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        day = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64) // US_DAY
        # epoch day 0 = Thursday; Saturday = 2, Sunday = 3 (mod 7)
        wk = (((day % 7) == 2) | ((day % 7) == 3)).astype(np.int64)
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(et, "\x1f"), wk.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "event_type": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "is_weekend": pa.array(sp[:, 2].astype(np.int64)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_cents": pa.array(ibincount(inv, cents,
                                            minlength=len(uk))),
        })

    parts = ev.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    agg: dict[tuple, list[int]] = {}
    for p in parts:
        k = (p["event_type"], int(p["is_weekend"]))
        e = agg.setdefault(k, [0, 0])
        e[0] += p["n"]
        e[1] += p["sum_cents"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array([k[0] for k in ks], type=pa.string()),
        "is_weekend": pa.array([k[1] for k in ks], type=pa.int64()),
        "n": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "sum_cents": pa.array([agg[k][1] for k in ks],
                              type=pa.int64()),
    })


def q_name_key_audit(sf_dir: str):
    """Cross-FIELD consistency audit: parse the numeric suffix out of
    c_name ('Customer#000000042' -> 42) and compare to c_custkey —
    (n_rows, n_match, sum_parsed); the string-parse data-contract
    check. Same audit over supplier names rides the same kernel."""
    import ray

    out = {}
    for tbl, keycol, namecol in (("customer", "c_custkey", "c_name"),
                                 ("supplier", "s_suppkey", "s_name")):
        ds = ray.data.read_parquet(f"{sf_dir}/{tbl}.parquet",
                                   columns=[keycol, namecol])

        def _k(t: pa.Table, *, _kc=keycol, _nc=namecol) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"n": pa.array([], type=pa.int64()),
                                 "m": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.int64())})
            key = np.asarray(t.column(_kc), dtype=np.int64)
            nm = np.asarray(t.column(_nc)).astype(str)
            parsed = np.char.partition(nm, "#")[:, 2].astype(np.int64)
            return pa.table({
                "n": pa.array([len(key)], type=pa.int64()),
                "m": pa.array([int((parsed == key).sum())],
                              type=pa.int64()),
                "s": pa.array([int(parsed.sum())], type=pa.int64()),
            })

        parts = ds.map_batches(_k, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        out[tbl] = [sum(p["n"] for p in parts),
                    sum(p["m"] for p in parts),
                    sum(p["s"] for p in parts)]
    return pa.table({
        "tbl": pa.array(sorted(out), type=pa.string()),
        "n_rows": pa.array([out[k][0] for k in sorted(out)],
                           type=pa.int64()),
        "n_match": pa.array([out[k][1] for k in sorted(out)],
                            type=pa.int64()),
        "sum_parsed": pa.array([out[k][2] for k in sorted(out)],
                               type=pa.int64()),
    })


def q_id_alignment_audit(sf_dir: str):
    """Cross-TABLE key alignment: embeddings.vec_id vs
    documents.doc_id — counts of aligned ids, embedding-only ids and
    document-only ids (full-outer key audit between the two
    modalities). Co-partitioned full outer join with the count fused
    in."""
    import ray

    from ..core.shuffle import hash_join_tasks

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id"]).map_batches(
        lambda t: t.append_column(
            "has_e", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"]).map_batches(
        lambda t: t.append_column(
            "has_d", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")

    def _cnt(t: pa.Table) -> pa.Table:
        # pyarrow full-outer joins COALESCE the key columns, so side
        # membership rides explicit marker columns
        if t.num_rows == 0:
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "eo": pa.array([], type=pa.int64()),
                             "do_": pa.array([], type=pa.int64())})
        e_null = np.asarray(pc.is_null(t.column("has_e")))
        d_null = np.asarray(pc.is_null(t.column("has_d")))
        return pa.table({
            "b": pa.array([int((~e_null & ~d_null).sum())],
                          type=pa.int64()),
            "eo": pa.array([int((~e_null & d_null).sum())],
                           type=pa.int64()),
            "do_": pa.array([int((e_null & ~d_null).sum())],
                            type=pa.int64()),
        })

    parts = hash_join_tasks(emb, docs, on="vec_id",
                            right_on="doc_id",
                            join_type="full outer",
                            post=_cnt).take_all()
    return pa.table({
        "n_aligned": pa.array([sum(p["b"] for p in parts)],
                              type=pa.int64()),
        "n_emb_only": pa.array([sum(p["eo"] for p in parts)],
                               type=pa.int64()),
        "n_doc_only": pa.array([sum(p["do_"] for p in parts)],
                               type=pa.int64()),
    })


def q_region_profile(sf_dir: str):
    """Dimensional rollup: per region, nation / customer / supplier
    counts — the 4-table star profile over the tiny dimension chain
    (all small sides driver-resident by design; the fact-side counts
    come from bounded partials)."""
    import ray

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey"]).take_all()
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet",
        columns=["r_regionkey", "r_name"]).take_all()
    n2r = {int(r["n_nationkey"]): int(r["n_regionkey"]) for r in nat}
    rname = {int(r["r_regionkey"]): r["r_name"] for r in reg}
    nref = None
    import ray as _ray

    nk = np.array(sorted(n2r), dtype=np.int64)
    rv = np.array([n2r[k] for k in nk], dtype=np.int64)
    nref = _ray.put((nk, rv))

    def _cnt_fn(col):
        def _f(t: pa.Table, *, _r=nref, _c=col) -> pa.Table:
            kk, vv = _r if isinstance(_r, tuple) else _ray.get(_r)
            if t.num_rows == 0:
                return pa.table({"rk": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            nkv = np.asarray(t.column(_c), dtype=np.int64)
            pos = np.minimum(np.searchsorted(kk, nkv), len(kk) - 1)
            okm = kk[pos] == nkv
            rk = vv[pos][okm]
            uk, c = np.unique(rk, return_counts=True)
            return pa.table({"rk": pa.array(uk),
                             "c": pa.array(c.astype(np.int64))})
        return _f

    cust = _ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_nationkey"])
    sup = _ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_nationkey"])
    cc = cust.map_batches(_cnt_fn("c_nationkey"),
                          batch_format="pyarrow").take_all()
    sc = sup.map_batches(_cnt_fn("s_nationkey"),
                         batch_format="pyarrow").take_all()
    nreg: dict[int, int] = {}
    for k in n2r.values():
        nreg[k] = nreg.get(k, 0) + 1
    ca: dict[int, int] = {}
    for p in cc:
        ca[int(p["rk"])] = ca.get(int(p["rk"]), 0) + p["c"]
    sa: dict[int, int] = {}
    for p in sc:
        sa[int(p["rk"])] = sa.get(int(p["rk"]), 0) + p["c"]
    ks = sorted(rname)
    return pa.table({
        "r_name": pa.array([rname[k] for k in ks], type=pa.string()),
        "n_nations": pa.array([nreg.get(k, 0) for k in ks],
                              type=pa.int64()),
        "n_customers": pa.array([ca.get(k, 0) for k in ks],
                                type=pa.int64()),
        "n_suppliers": pa.array([sa.get(k, 0) for k in ks],
                                type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 65: Gram diagonal, language run stats, user lifetime histogram
# ---------------------------------------------------------------------------


def _sq_unop(w: np.ndarray) -> np.ndarray:
    return w * w


def q_col_sumsq(sf_dir: str):
    """Gram-matrix diagonal diag(A^T A): per column, the sum of
    squared in-edge weights — `Reduce(Column, plus, square)` with the
    squaring UNOP fused into the batch-local partial (the
    `SpParMat::Reduce(dim, binop, unop)` three-argument form). Exact:
    weights are integral counts, w^2 sums stay far below 2^53."""
    ctx = get_context(sf_dir)
    dec = ctx.decoder()
    red = ctx.graph("directed").reduce("col", "sum", unop=_sq_unop)

    def _dec(batch: pa.Table, *, _d=dec) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.string()),
                             "sum_w2": pa.array([], type=pa.int64())})
        v = np.asarray(batch.column("v"))
        return pa.table({
            "label": _d.take(v),
            "sum_w2": pa.array(np.asarray(
                batch.column("val"),
                dtype=np.float64).astype(np.int64)),
        })

    return red.map_batches(_dec, batch_format="pyarrow")


def q_lang_run_stats(sf_dir: str):
    """Language RUN statistics along the document stream (doc_id
    order): total runs, longest run, and the count of language
    switches — the stream-locality audit (a shuffled corpus should
    have short runs). Two-phase distributed adjacent scan: per
    doc_id-range bucket (first/last lang, head/tail run lengths, runs,
    maxrun), then an EXACT bounded boundary chain on the driver (a run
    spanning buckets accumulates tail + heads across the chain)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang"])
    BKT = 512

    def _pre(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bkt": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string())})
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        return pa.table({"bkt": pa.array(did // BKT),
                         "doc_id": t.column("doc_id"),
                         "lang": t.column("lang")})

    pre = docs.map_batches(_pre, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"bkt": pa.array([], type=pa.int64()),
                          "first_lang": pa.array([], type=pa.string()),
                          "last_lang": pa.array([], type=pa.string()),
                          "head_len": pa.array([], type=pa.int64()),
                          "tail_len": pa.array([], type=pa.int64()),
                          "runs": pa.array([], type=pa.int64()),
                          "maxrun": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "bkt" not in t.column_names:
            return empty
        bkt = np.asarray(t.column("bkt"), dtype=np.int64)
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        lng = np.asarray(t.column("lang")).astype(str)
        out = {k: [] for k in ("bkt", "first_lang", "last_lang",
                               "head_len", "tail_len", "runs",
                               "maxrun")}
        for b in np.unique(bkt):
            m = bkt == b
            order = np.argsort(did[m])
            ls = lng[m][order]
            new = np.concatenate([[True], ls[1:] != ls[:-1]])
            starts = np.flatnonzero(new)
            lens = np.diff(np.concatenate([starts, [len(ls)]]))
            out["bkt"].append(int(b))
            out["first_lang"].append(ls[0])
            out["last_lang"].append(ls[-1])
            out["head_len"].append(int(lens[0]))
            out["tail_len"].append(int(lens[-1]))
            out["runs"].append(int(len(starts)))
            out["maxrun"].append(int(lens.max()))
        return pa.table({
            "bkt": pa.array(out["bkt"], type=pa.int64()),
            "first_lang": pa.array(out["first_lang"],
                                   type=pa.string()),
            "last_lang": pa.array(out["last_lang"], type=pa.string()),
            "head_len": pa.array(out["head_len"], type=pa.int64()),
            "tail_len": pa.array(out["tail_len"], type=pa.int64()),
            "runs": pa.array(out["runs"], type=pa.int64()),
            "maxrun": pa.array(out["maxrun"], type=pa.int64()),
        })

    parts = group_apply_tasks(pre, ["bkt"], _k).take_all()
    parts.sort(key=lambda r: r["bkt"])
    runs = maxrun = 0
    carry = 0  # length of the run ending at the previous bucket's end
    prev_last = None
    for p in parts:
        single = p["runs"] == 1
        if prev_last is not None and p["first_lang"] == prev_last:
            runs += p["runs"] - 1  # boundary merges two runs into one
            spanning = carry + p["head_len"]
            maxrun = max(maxrun, spanning)
            carry = (carry + p["tail_len"]) if single \
                else p["tail_len"]
        else:
            runs += p["runs"]
            carry = p["tail_len"]
        maxrun = max(maxrun, p["maxrun"], carry)
        prev_last = p["last_lang"]
    n_switches = runs - 1 if runs else 0
    return pa.table({
        "n_runs": pa.array([runs], type=pa.int64()),
        "max_run": pa.array([maxrun], type=pa.int64()),
        "n_switches": pa.array([n_switches], type=pa.int64()),
    })


def q_user_lifetime_hist(sf_dir: str):
    """User LIFETIME (whole days between first and last event)
    histogram: (days, n_users) — the engagement-span census. One user
    shuffle, per-user min/max."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    US_DAY = np.int64(86_400_000_000)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"days": pa.array([], type=pa.int64()),
                          "n_users": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        uk, inv = np.unique(uid, return_inverse=True)
        lo = np.full(len(uk), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lo, inv, tsi)
        hi = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(hi, inv, tsi)
        days = (hi // US_DAY) - (lo // US_DAY)
        uk2, c = np.unique(days, return_counts=True)
        return pa.table({"days": pa.array(uk2.astype(np.int64)),
                         "n_users": pa.array(c.astype(np.int64))})

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["days"])] = agg.get(int(p["days"]), 0) + p["n_users"]
    ks = sorted(agg)
    return pa.table({
        "days": pa.array(ks, type=pa.int64()),
        "n_users": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 66: cross-source duplicate leakage, user trend split,
# CC weight-threshold curve
# ---------------------------------------------------------------------------


def q_cross_source_dups(sf_dir: str):
    """LEAKAGE detection: exact-duplicate groups (sorted-distinct-token
    key) that SPAN more than one source — the train/test-contamination
    face of exact dedup (a duplicate crossing source slices leaks
    between splits drawn per source). Output: total multi-doc groups,
    groups spanning >1 source, docs inside spanning groups."""
    import ray

    from ..core.shuffle import group_apply_tasks
    from ..functions.dedup import dedup_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"])

    def _keyed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.string()),
                             "source": pa.array([], type=pa.string())})
        keys = dedup_key(b.select(["doc_id", "text"]))
        return pa.table({"k": keys, "source": b.column("source")})

    keyed = docs.map_batches(_keyed, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _grp(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_groups": pa.array([], type=pa.int64()),
                          "n_spanning": pa.array([], type=pa.int64()),
                          "n_docs_spanning": pa.array([],
                                                      type=pa.int64())})
        if t.num_rows == 0 or "k" not in t.column_names:
            return empty
        k = np.asarray(t.column("k")).astype(str)
        src_ = np.asarray(t.column("source")).astype(str)
        order = np.lexsort((src_, k))
        k, src_ = k[order], src_[order]
        starts = np.flatnonzero(np.concatenate(
            [[True], k[1:] != k[:-1]]))
        cnts = np.diff(np.concatenate([starts, [len(k)]]))
        groups = spanning = span_docs = 0
        for s, c in zip(starts, cnts):
            if c < 2:
                continue
            groups += 1
            if (src_[s:s + c] != src_[s]).any():
                spanning += 1
                span_docs += int(c)
        return pa.table({
            "n_groups": pa.array([groups], type=pa.int64()),
            "n_spanning": pa.array([spanning], type=pa.int64()),
            "n_docs_spanning": pa.array([span_docs], type=pa.int64()),
        })

    parts = group_apply_tasks(keyed, ["k"], _grp).take_all()
    return pa.table({
        "n_groups": pa.array([sum(p["n_groups"] for p in parts)],
                             type=pa.int64()),
        "n_spanning": pa.array([sum(p["n_spanning"] for p in parts)],
                               type=pa.int64()),
        "n_docs_spanning": pa.array(
            [sum(p["n_docs_spanning"] for p in parts)],
            type=pa.int64()),
    })


def q_user_trend_split(sf_dir: str):
    """Per-user TREND census: split each user's event sequence
    ((ts, event_id) order) at the midpoint floor(n/2); compare the
    value-cents sums of the two halves scaled to a common denominator
    (first*ceil vs second*floor half sizes — exact cross
    multiplication); count rising / falling / flat users. Users with
    < 2 events are flat by definition of empty halves? they are
    EXCLUDED (no two halves to compare)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_rising": pa.array([], type=pa.int64()),
                          "n_falling": pa.array([], type=pa.int64()),
                          "n_flat": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        tsi = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        eid = np.asarray(t.column("event_id"), dtype=np.int64)
        v = np.floor(np.asarray(t.column("value"), dtype=np.float64)
                     * 100 + 0.5).astype(np.int64)
        order = np.lexsort((eid, tsi, uid))
        uid, v = uid[order], v[order]
        uu, starts, cnts = np.unique(uid, return_index=True,
                                     return_counts=True)
        rising = falling = flat = 0
        for s, c in zip(starts, cnts):
            if c < 2:
                continue
            h = int(c) // 2
            a = int(v[s:s + h].sum())          # first half (h events)
            b = int(v[s + h:s + c].sum())      # second half (c-h)
            # per-event averages compared exactly: a/h vs b/(c-h)
            lhs, rhs = a * (int(c) - h), b * h
            if rhs > lhs:
                rising += 1
            elif rhs < lhs:
                falling += 1
            else:
                flat += 1
        return pa.table({
            "n_rising": pa.array([rising], type=pa.int64()),
            "n_falling": pa.array([falling], type=pa.int64()),
            "n_flat": pa.array([flat], type=pa.int64()),
        })

    parts = group_apply_tasks(ev, ["user_id"], _k).take_all()
    return pa.table({
        "n_rising": pa.array([sum(p["n_rising"] for p in parts)],
                             type=pa.int64()),
        "n_falling": pa.array([sum(p["n_falling"] for p in parts)],
                              type=pa.int64()),
        "n_flat": pa.array([sum(p["n_flat"] for p in parts)],
                           type=pa.int64()),
    })


def q_cc_threshold_curve(sf_dir: str):
    """Connectivity PERSISTENCE under edge-weight thresholds: the
    number of connected components (fixed CC_ITERS min-label rounds,
    counting every vertex; weight-dropped vertices become singletons)
    on the symmetric-multiplicity graph pruned at w >= 1 and w >= 2 —
    `PruneI` -> CC composite (the weighted-percolation face of
    `strong_triangles`)."""
    import ray

    from ..core.engine import SpmvEngine
    from ..core.graph import Graph

    ctx = get_context(sf_dir)
    g = ctx.graph("sym").dedup_sum()
    rows = []
    for wmin in (1, 2):
        if wmin == 1:
            eng = ctx.engine("sym")
            comp = alg.cc_fixed(eng, CC_ITERS)
        else:
            def _f(t: pa.Table, *, _w=wmin) -> pa.Table:
                w = np.asarray(t.column("w"), dtype=np.float64)
                return t.filter(pa.array(w >= _w))

            edges = g.edges.map_batches(_f, batch_format="pyarrow")
            eng = SpmvEngine.from_graph(
                Graph(n=ctx.n, edges=edges), 4,
                f"/tmp/cbray/ccthr_n{ctx.n}_w{wmin}",
                structural=True)
            comp = alg.cc_fixed(eng, CC_ITERS)
            eng.shutdown()
        rows.append((wmin, int(len(np.unique(comp)))))
    return pa.table({
        "w_min": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_components": pa.array([r[1] for r in rows],
                                 type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 67: CC convergence trace, BFS frontier trace, whale share
# ---------------------------------------------------------------------------


def _ne_count(a: np.ndarray, b: np.ndarray) -> int:
    return int((np.asarray(a) != np.asarray(b)).sum())


def q_cc_convergence_trace(sf_dir: str):
    """Algorithm OBSERVABILITY: per min-label round 1..CC_ITERS, how
    many vertex labels changed — the convergence trace behind CC's
    round budget (the driver pulls ONE scalar per round; labels stay
    chunked refs). Rounds after convergence report 0."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    l = eng.map_chunks_i(alg._iota)
    rounds, changed = [], []
    for r in range(1, CC_ITERS + 1):
        nl = eng.spmv_apply_refs(l, "select2nd_min", alg._min2_b, 1,
                                 l)[0]
        c = sum(eng.chunk_scalars(_ne_count, nl, l))
        rounds.append(r)
        changed.append(int(c))
        l = nl
    return pa.table({"round": pa.array(rounds, type=pa.int64()),
                     "n_changed": pa.array(changed, type=pa.int64())})


def q_bfs_frontier_trace(sf_dir: str):
    """BFS FRONTIER-SIZE trace from m_0: per level 1..BFS_ITERS, the
    number of newly reached vertices (level sizes; level 0 = the
    root). The frontier-cost profile that motivates direction
    switching — derived from the oracle-green distance machinery."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    d = alg.min_plus_distances(ctx.engine("sym"), root,
                               iters=BFS_ITERS)
    dd = d[np.isfinite(d)].astype(np.int64)
    uk, c = np.unique(dd, return_counts=True)
    return pa.table({"level": pa.array(uk, type=pa.int64()),
                     "n_vertices": pa.array(c.astype(np.int64))})


WHALE_K = 10


def q_whale_share(sf_dir: str):
    """Whale concentration: total event value cents of the top
    WHALE_K users (rank by cents DESC, user_id ASC) vs the global
    total — exact integer pair (no ratio). Per-user sums via one
    shuffle; bounded top-k pull."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def _k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        uid = np.asarray(t.column("user_id"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("value"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        uk, inv = np.unique(uid, return_inverse=True)
        return pa.table({"user_id": pa.array(uk),
                         "cents": pa.array(ibincount(inv, cents,
                                                     minlength=len(uk)))})

    per = group_apply_tasks(ev, ["user_id"], _k).take_all()
    uid = np.array([p["user_id"] for p in per], dtype=np.int64)
    cents = np.array([p["cents"] for p in per], dtype=np.int64)
    order = np.lexsort((uid, -cents))[:WHALE_K]
    return pa.table({
        "k": pa.array([WHALE_K], type=pa.int64()),
        "topk_cents": pa.array([int(cents[order].sum())],
                               type=pa.int64()),
        "total_cents": pa.array([int(cents.sum())], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 68: suffix census, edge degree grid, same-day orders,
# blob byte histogram
# ---------------------------------------------------------------------------


def q_suffix_census(sf_dir: str):
    """Distinct token-SUFFIX counts per depth 1..PREFIX_D (the
    stemming-side trie profile; mirror of `prefix_census`). Routing by
    LAST character makes suffix dedup partition-local; suffixes are
    gathered vectorized via take_along_axis over the padded char
    matrix (no per-token Python)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    vocab = docs.map_batches(_tok_vocab_fn("text"),
                             batch_format="pyarrow",
                             zero_copy_batch=True)

    def _cz(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"cz": pa.array([], type=pa.string()),
                             "tok": pa.array([], type=pa.string())})
        tok = np.unique(np.asarray(t.column("tok")).astype(str))
        tok = tok[np.char.str_len(tok) > 0]
        return pa.table({
            "cz": pa.array([s[-1] for s in tok.tolist()],
                           type=pa.string()),
            "tok": pa.array(tok.tolist(), type=pa.string()),
        })

    keyed = vocab.map_batches(_cz, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _census(t: pa.Table) -> pa.Table:
        empty = pa.table({"depth": pa.array([], type=pa.int64()),
                          "n_suffixes": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "tok" not in t.column_names:
            return empty
        tok = np.unique(np.asarray(t.column("tok")).astype(str))
        lens = np.char.str_len(tok).astype(np.int64)
        L = max(int(lens.max()), 1)
        m = np.asarray(tok, dtype=f"U{L}").view(np.uint32).reshape(
            -1, L)
        depths, counts = [], []
        for d in range(1, PREFIX_D + 1):
            rows = lens >= d
            if not rows.any():
                continue
            idx = (lens[rows, None] - d
                   + np.arange(d, dtype=np.int64)[None, :])
            suf = np.take_along_axis(m[rows], idx, axis=1)
            if d < L:  # pad to a common width for the string view
                suf = np.concatenate(
                    [suf, np.zeros((suf.shape[0], L - d),
                                   np.uint32)], axis=1)
            sufs = suf.reshape(-1).view(f"U{L}").reshape(-1)
            depths.append(d)
            counts.append(len(np.unique(sufs)))
        return pa.table({"depth": pa.array(depths, type=pa.int64()),
                         "n_suffixes": pa.array(counts,
                                                type=pa.int64())})

    parts = group_apply_tasks(keyed, ["cz"], _census).take_all()
    agg: dict[int, int] = {}
    for p in parts:
        agg[int(p["depth"])] = agg.get(int(p["depth"]), 0) \
            + p["n_suffixes"]
    ks = sorted(agg)
    return pa.table({
        "depth": pa.array(ks, type=pa.int64()),
        "n_suffixes": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_edge_deg_grid(sf_dir: str):
    """Edge-endpoint DEGREE MIXING matrix: every distinct undirected
    edge classified by the (sorted) log2-degree buckets of its two
    endpoints — (lo_bucket, hi_bucket, n_edges); the assortativity
    grid partition planners read. Degree vector broadcast once."""
    import ray

    ctx = get_context(sf_dir)
    deg = ctx.engine("sym").in_weights().astype(np.int64)
    dref = ray.put(deg)
    be = ctx.graph("sym").dedup_sum().cast_bool().edges

    def _cls(t: pa.Table, *, _r=dref) -> pa.Table:
        dv = _r if isinstance(_r, np.ndarray) else ray.get(_r)
        empty = pa.table({"lo_bucket": pa.array([], type=pa.int64()),
                          "hi_bucket": pa.array([], type=pa.int64()),
                          "n_edges": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < d
        s, d = s[keep], d[keep]
        bs = np.frexp(np.maximum(dv[s], 1).astype(
            np.float64))[1].astype(np.int64) - 1
        bd = np.frexp(np.maximum(dv[d], 1).astype(
            np.float64))[1].astype(np.int64) - 1
        lo = np.minimum(bs, bd)
        hi = np.maximum(bs, bd)
        key = lo * np.int64(64) + hi
        uk, c = np.unique(key, return_counts=True)
        return pa.table({
            "lo_bucket": pa.array((uk // 64).astype(np.int64)),
            "hi_bucket": pa.array((uk % 64).astype(np.int64)),
            "n_edges": pa.array(c.astype(np.int64)),
        })

    parts = be.map_batches(_cls, batch_format="pyarrow").take_all()
    agg: dict[tuple, int] = {}
    for p in parts:
        k = (int(p["lo_bucket"]), int(p["hi_bucket"]))
        agg[k] = agg.get(k, 0) + p["n_edges"]
    ks = sorted(agg)
    return pa.table({
        "lo_bucket": pa.array([k[0] for k in ks], type=pa.int64()),
        "hi_bucket": pa.array([k[1] for k in ks], type=pa.int64()),
        "n_edges": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


def q_same_day_orders(sf_dir: str):
    """Same-day multi-order census: customers placing >= 2 orders on
    one calendar day — (n_customers, n_cust_days, n_orders_involved).
    The fraud/dup-submission audit; one custkey shuffle."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])
    US_DAY = np.int64(86_400_000_000)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_customers": pa.array([], type=pa.int64()),
                          "n_cust_days": pa.array([], type=pa.int64()),
                          "n_orders_involved": pa.array(
                              [], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        day = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[us]").view(np.int64) // US_DAY
        key = _pack20(ck, day)
        uk, cnt = np.unique(key, return_counts=True)
        multi = cnt >= 2
        custs = np.unique((uk[multi] >> 20))
        return pa.table({
            "n_customers": pa.array([len(custs)], type=pa.int64()),
            "n_cust_days": pa.array([int(multi.sum())],
                                    type=pa.int64()),
            "n_orders_involved": pa.array([int(cnt[multi].sum())],
                                          type=pa.int64()),
        })

    parts = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    return pa.table({
        "n_customers": pa.array([sum(p["n_customers"] for p in parts)],
                                type=pa.int64()),
        "n_cust_days": pa.array([sum(p["n_cust_days"] for p in parts)],
                                type=pa.int64()),
        "n_orders_involved": pa.array(
            [sum(p["n_orders_involved"] for p in parts)],
            type=pa.int64()),
    })


def q_blob_bytes_hist(sf_dir: str):
    """Payload-size census per modality: histogram of blob byte
    lengths for image / audio / video payloads — the storage- and
    batch-size-planning profile (large-binary columns want small
    batches). Rides the synthetic blob pipelines; SQL-reproducible
    because the synthesis is pure integer arithmetic."""
    from ..functions import multimodal as M

    rows = {"kind": [], "nbytes": [], "n_items": []}
    for kind in ("image", "audio", "video"):
        blobs = M.blob_dataset_from_docs(sf_dir, kind=kind)

        def _ln(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"nbytes": pa.array([], type=pa.int64()),
                                 "c": pa.array([], type=pa.int64())})
            ln = pc.binary_length(t.column("payload"))
            uk, c = np.unique(np.asarray(ln, dtype=np.int64),
                              return_counts=True)
            return pa.table({"nbytes": pa.array(uk),
                             "c": pa.array(c.astype(np.int64))})

        parts = blobs.map_batches(_ln, batch_format="pyarrow").take_all()
        agg: dict[int, int] = {}
        for p in parts:
            agg[int(p["nbytes"])] = agg.get(int(p["nbytes"]), 0) \
                + p["c"]
        for k in sorted(agg):
            rows["kind"].append(kind)
            rows["nbytes"].append(k)
            rows["n_items"].append(agg[k])
    return pa.table({
        "kind": pa.array(rows["kind"], type=pa.string()),
        "nbytes": pa.array(rows["nbytes"], type=pa.int64()),
        "n_items": pa.array(rows["n_items"], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 69: busy minutes, BFS level cut
# ---------------------------------------------------------------------------

BUSY_K = 3


def q_busy_minutes(sf_dir: str):
    """Windowed THRESHOLD census: per event type, the number of
    distinct epoch HOURS holding >= BUSY_K events — the burst-window
    count behind rate-limit sizing (hour windows: the sf0.001 stream
    never puts two events in one minute). One (type, hour) count pass,
    bounded partials."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    US_HOUR = np.int64(3_600_000_000)

    def _pre(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "mn": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        et = np.asarray(t.column("event_type")).astype(str)
        mn = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64) // US_HOUR
        key = np.char.add(np.char.add(et, "\x1f"),
                          np.char.zfill(mn.astype(str), 14))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({
            "event_type": pa.array(sp[:, 0].tolist(), type=pa.string()),
            "mn": pa.array(sp[:, 2].astype(np.int64)),
            "c": pa.array(c.astype(np.int64)),
        })

    pre = ev.map_batches(_pre, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "n_busy_minutes": pa.array([],
                                                     type=pa.int64())})
        if t.num_rows == 0 or "event_type" not in t.column_names:
            return empty
        et = np.asarray(t.column("event_type")).astype(str)
        mn = np.asarray(t.column("mn"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        key = np.char.add(np.char.add(et, "\x1f"),
                          np.char.zfill(mn.astype(str), 14))
        uk, inv = np.unique(key, return_inverse=True)
        tot = ibincount(inv, c, minlength=len(uk))
        sp = np.char.partition(uk, "\x1f")
        busy = tot >= BUSY_K
        types, tinv = np.unique(sp[:, 0], return_inverse=True)
        nb = ibincount(tinv, busy, minlength=len(types))
        keep = nb > 0
        return pa.table({
            "event_type": pa.array(types[keep].tolist(),
                                   type=pa.string()),
            "n_busy_minutes": pa.array(nb[keep]),
        })

    parts = group_apply_tasks(pre, ["event_type"], _k).take_all()
    agg: dict[str, int] = {}
    for p in parts:
        agg[p["event_type"]] = agg.get(p["event_type"], 0) \
            + p["n_busy_minutes"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "n_busy_minutes": pa.array([agg[k] for k in ks],
                                   type=pa.int64()),
    })


def q_bfs_level_cut(sf_dir: str):
    """BFS-DAG structure census from m_0: distinct undirected edges
    classified by their endpoints' BFS levels — same-level /
    cross-level (levels differ by exactly 1; BFS guarantees no larger
    gap among reached pairs) / touching an unreached endpoint. The
    frontier-expansion cost anatomy. Levels broadcast once; one edge
    pass."""
    import ray

    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    d = alg.min_plus_distances(ctx.engine("sym"), root,
                               iters=BFS_ITERS)
    lev = np.where(np.isfinite(d), d, -1.0).astype(np.int64)
    lref = ray.put(lev)
    be = ctx.graph("sym").dedup_sum().cast_bool().edges

    def _cls(t: pa.Table, *, _r=lref) -> pa.Table:
        lv = _r if isinstance(_r, np.ndarray) else ray.get(_r)
        empty = pa.table({"n_same": pa.array([], type=pa.int64()),
                          "n_cross": pa.array([], type=pa.int64()),
                          "n_unreached": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        s = np.asarray(t.column("src"), dtype=np.int64)
        dd = np.asarray(t.column("dst"), dtype=np.int64)
        keep = s < dd
        s, dd = s[keep], dd[keep]
        la, lb = lv[s], lv[dd]
        reached = (la >= 0) & (lb >= 0)
        return pa.table({
            "n_same": pa.array([int((reached & (la == lb)).sum())],
                               type=pa.int64()),
            "n_cross": pa.array([int((reached & (la != lb)).sum())],
                                type=pa.int64()),
            "n_unreached": pa.array([int((~reached).sum())],
                                    type=pa.int64()),
        })

    parts = be.map_batches(_cls, batch_format="pyarrow").take_all()
    return pa.table({
        "n_same": pa.array([sum(p["n_same"] for p in parts)],
                           type=pa.int64()),
        "n_cross": pa.array([sum(p["n_cross"] for p in parts)],
                            type=pa.int64()),
        "n_unreached": pa.array([sum(p["n_unreached"] for p in parts)],
                                type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 71 (round 5): K-source aggregate faces on the new chunked
# machinery + lag/entropy operator classes
# ---------------------------------------------------------------------------


def _hub_ecc_part(D):
    """Per-chunk (K,) partials: max finite distance and finite count."""
    fin = np.isfinite(D)
    mx = np.where(fin, D, -1.0).max(axis=1)
    return mx, fin.sum(axis=1).astype(np.int64)


def q_hub_ecc(sf_dir: str):
    """Hub ECCENTRICITY census (within BFS_ITERS hops, undirected): for
    each of the APSP_K top-degree hubs, the max hop distance to any
    reached vertex and the reached count (self included) — the
    radius/diameter feed. Refs-only: seeds via the distributed top-k,
    (K, n) distance state as chunk refs (`alg.kseed_distances_refs`),
    two (K,)-sized partials per chunk."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    S = np.sort(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), APSP_K))
    D_refs = alg.kseed_distances_refs(eng, S, iters=BFS_ITERS)
    mx_refs, ct_refs = eng.map_chunks_n(_hub_ecc_part, 2, D_refs)
    mx = np.max(ray.get(mx_refs), axis=0)
    ct = np.sum(ray.get(ct_refs), axis=0)
    la = np.asarray(ctx.gather_labels(S)).astype(str)
    return pa.table({
        "label": pa.array(la.tolist(), type=pa.string()),
        "ecc": pa.array(np.maximum(mx, 0).astype(np.int64)),
        "n_reached": pa.array(ct),
    })


def _hub_coreach_part(D):
    """Per-chunk (n_all, n_any, n_none) over the (K, chunk) state."""
    fin = np.isfinite(D)
    return np.array([int(fin.all(axis=0).sum()),
                     int(fin.any(axis=0).sum()),
                     int((~fin.any(axis=0)).sum())], dtype=np.int64)


def q_hub_coreach(sf_dir: str):
    """Hub CO-REACHABILITY census: how many vertices are reached
    (within BFS_ITERS hops, undirected) by ALL of the APSP_K top hubs,
    by at least one, and by none — the coverage face of the K-source
    machinery (one bounded row)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    S = np.sort(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), APSP_K))
    D_refs = alg.kseed_distances_refs(eng, S, iters=BFS_ITERS)
    parts = np.sum(ray.get(eng.map_chunks(_hub_coreach_part, D_refs)),
                   axis=0)
    return pa.table({
        "n_all": pa.array([int(parts[0])], type=pa.int64()),
        "n_any": pa.array([int(parts[1])], type=pa.int64()),
        "n_none": pa.array([int(parts[2])], type=pa.int64()),
    })


def q_source_lang_entropy(sf_dir: str):
    """Per-SOURCE language-mix Shannon entropy (nats, round 6) + doc
    count — the corpus-balance dashboard metric. One (source, lang)
    count shuffle with per-batch combiners; the entropy folds over the
    bounded (source, lang) aggregate."""
    import ray

    from ..core.shuffle import group_apply_tasks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["source", "lang"])

    def _cnt(t: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "lang": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "source" not in t.column_names:
            return empty
        key = np.char.add(np.char.add(
            np.asarray(t.column("source")).astype(str), "\x1f"),
            np.asarray(t.column("lang")).astype(str))
        uk, c = np.unique(key, return_counts=True)
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"source": pa.array(sp[:, 0].tolist(),
                                            type=pa.string()),
                         "lang": pa.array(sp[:, 2].tolist(),
                                          type=pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    pre = docs.map_batches(_cnt, batch_format="pyarrow",
                           zero_copy_batch=True)

    # merge duplicate (source, lang) rows from different batches
    def _m2(t: pa.Table) -> pa.Table:
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "lang": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "source" not in t.column_names:
            return empty
        key = np.char.add(np.char.add(
            np.asarray(t.column("source")).astype(str), "\x1f"),
            np.asarray(t.column("lang")).astype(str))
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        tot = ibincount(inv, c, minlength=len(uk))
        sp = np.char.partition(uk, "\x1f")
        return pa.table({"source": pa.array(sp[:, 0].tolist(),
                                            type=pa.string()),
                         "lang": pa.array(sp[:, 2].tolist(),
                                          type=pa.string()),
                         "c": pa.array(tot)})

    rows = group_apply_tasks(pre, ["source"], _m2).take_all()
    agg: dict[str, dict[str, int]] = {}
    for r in rows:
        agg.setdefault(r["source"], {})[r["lang"]] = \
            agg.get(r["source"], {}).get(r["lang"], 0) + r["c"]
    srcs = sorted(agg)
    ents, nds = [], []
    for s in srcs:
        c = np.array(sorted(agg[s].values()), dtype=np.float64)
        p = c / c.sum()
        ents.append(round(float(-(p * np.log(p)).sum()), 6))
        nds.append(int(c.sum()))
    return pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "entropy": pa.array(ents, type=pa.float64()),
        "n_docs": pa.array(nds, type=pa.int64()),
    })


def q_user_value_lag(sf_dir: str):
    """Lag-1 VALUE-delta census: per event type, the mean |value -
    previous value| over each (user, type)'s ts-ordered event stream
    (ties by event_id) + the pair count — the jitter/stability signal
    of the window-function class. One user shuffle; runs diffed
    vectorized per partition."""
    import ray

    from ..core.shuffle import group_apply_tasks

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "value", "event_id"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "s": pa.array([], type=pa.float64()),
                          "np_": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "user_id" not in t.column_names:
            return empty
        u = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type")).astype(str)
        ts = np.asarray(t.column("ts")).astype(
            "datetime64[us]").view(np.int64)
        v = np.asarray(t.column("value"), dtype=np.float64)
        ei = np.asarray(t.column("event_id"), dtype=np.int64)
        order = np.lexsort((ei, ts, et, u))
        u, et, v = u[order], et[order], v[order]
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        if not same.any():
            return empty
        dv = np.abs(v[1:] - v[:-1])[same]
        types = et[1:][same]
        uk, inv = np.unique(types, return_inverse=True)
        s = np.bincount(inv, weights=dv, minlength=len(uk))
        c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({"event_type": pa.array(uk.tolist(),
                                                type=pa.string()),
                         "s": pa.array(s), "np_": pa.array(c)})

    rows = group_apply_tasks(ev, ["user_id"], _k).take_all()
    agg: dict[str, list] = {}
    for r in rows:
        a = agg.setdefault(r["event_type"], [0.0, 0])
        a[0] += r["s"]
        a[1] += r["np_"]
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks, type=pa.string()),
        "mean_abs_dv": pa.array([round(agg[k][0] / agg[k][1], 6)
                                 for k in ks], type=pa.float64()),
        "n_pairs": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


def q_order_gap_hist(sf_dir: str):
    """Inter-order GAP histogram: days between each customer's
    consecutive orders (date order, ties by orderkey), counted per gap
    length — the repeat-purchase cadence curve. One custkey shuffle,
    vectorized run diffs, bounded histogram."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def _k(t: pa.Table) -> pa.Table:
        empty = pa.table({"gap_days": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        ok_ = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        d = np.asarray(t.column("o_orderdate")).astype(
            "datetime64[D]").view(np.int64)
        order = np.lexsort((ok_, d, ck))
        ck, d = ck[order], d[order]
        same = ck[1:] == ck[:-1]
        if not same.any():
            return empty
        gaps = (d[1:] - d[:-1])[same]
        uk, c = np.unique(gaps, return_counts=True)
        return pa.table({"gap_days": pa.array(uk.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    rows = group_apply_tasks(o, ["o_custkey"], _k).take_all()
    agg: dict[int, int] = {}
    for r in rows:
        agg[r["gap_days"]] = agg.get(r["gap_days"], 0) + r["n"]
    ks = sorted(agg)
    return pa.table({
        "gap_days": pa.array(ks, type=pa.int64()),
        "n": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# --- wave 72: iterative linear-algebra faces -------------------------------

EIG_ITERS = 8
SK_ITERS = 6
JAC_ITERS = 8
GCN_F = 4


def _w72_weights():
    """Deterministic small GCN weight matrices (SQL-replicable integer
    arithmetic): W1 (4x4), W2 (4x2)."""
    a4 = np.arange(GCN_F)[:, None]
    w1 = ((3 * a4 + 5 * np.arange(GCN_F)[None, :]) % 7 - 3) / 4.0
    w2 = ((2 * a4 + 3 * np.arange(2)[None, :]) % 5 - 2) / 4.0
    return w1, w2


def q_eigencentrality(sf_dir: str):
    """Eigenvector centrality: EIG_ITERS normalized power-iteration
    rounds on the structural undirected adjacency (see
    `alg.eigencentrality_refs`); score = x * sqrt(n) rounded 6 (the
    uniform start maps to score 1.0 everywhere)."""
    import math

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    x_refs, _ = alg.eigencentrality_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), EIG_ITERS)
    score = np.round(eng.unchunk(x_refs) * math.sqrt(ctx.n), 6)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "score": pa.array(score),
    })


def q_spectral_bound(sf_dir: str):
    """Rayleigh-quotient estimate of lambda_1 (the spectral norm of the
    structural undirected adjacency) after EIG_ITERS power-iteration
    rounds — one bounded row (see `alg.eigencentrality_refs`)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    _, lam = alg.eigencentrality_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), EIG_ITERS)
    return pa.table({"rayleigh": pa.array([round(lam, 6)])})


def q_sinkhorn_balance(sf_dir: str):
    """Sinkhorn-Knopp doubly-stochastic balancing after SK_ITERS
    alternating (r, c) rounds over the structural undirected adjacency
    (see `alg.sinkhorn_refs`); per-vertex scaling factors rounded 6,
    isolated vertices at 0."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    r_refs, c_refs = alg.sinkhorn_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), SK_ITERS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "r": pa.array(np.round(eng.unchunk(r_refs), 6)),
        "c": pa.array(np.round(eng.unchunk(c_refs), 6)),
    })


def _w72_b(ar):
    return 1.0 + (np.asarray(ar, dtype=np.int64) % 7).astype(np.float64)


def q_jacobi_laplacian(sf_dir: str):
    """Jacobi solve of the regularized Laplacian system (L + I) x = b,
    b = 1 + (arith % 7), after exactly JAC_ITERS rounds (see
    `alg.jacobi_laplacian_refs`); per-vertex x rounded 6."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    b_refs = eng.map_chunks(
        _w72_b, ctx.vdict.arith_slice_refs(eng.bounds))
    x_refs, _ = alg.jacobi_laplacian_refs(eng, b_refs, JAC_ITERS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "x": pa.array(np.round(eng.unchunk(x_refs), 6)),
    })


def q_jacobi_resid(sf_dir: str):
    """Convergence certificate of the JAC_ITERS-round Jacobi solve:
    ||(L + I) x - b||_inf rounded 6 — one bounded row."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    b_refs = eng.map_chunks(
        _w72_b, ctx.vdict.arith_slice_refs(eng.bounds))
    _, resid = alg.jacobi_laplacian_refs(eng, b_refs, JAC_ITERS)
    return pa.table({"resid": pa.array([round(resid, 6)])})


def q_gcn_prop(sf_dir: str):
    """Two-layer GCN-style propagation H = A_hat relu(A_hat X W1) W2
    over the Kipf-Welling normalized self-looped adjacency, X = one-hot
    (arith % GCN_F) features, deterministic weights (see
    `alg.gcn_prop_refs`); per-vertex output pair rounded 6."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    w1, w2 = _w72_weights()
    h_refs = alg.gcn_prop_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), w1, w2)
    import ray as _ray

    H = np.concatenate([np.asarray(c) for c in _ray.get(h_refs)], axis=1)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "y0": pa.array(np.round(H[0], 6)),
        "y1": pa.array(np.round(H[1], 6)),
    })


# --- wave 73: spectral filter, CG solve, LM quality scoring ----------------

CHEB_ORDER = 4
CG_ITERS = 5


def q_chebyshev_filter(sf_dir: str):
    """Chebyshev filter y = sum_j T_j(Lt) b / (j+1) of order CHEB_ORDER
    on the scaled Laplacian (lmax = 2(max_deg+1)), b = 1 + (arith % 7)
    (see `alg.chebyshev_filter_refs`); per-vertex y rounded 6."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    b_refs = eng.map_chunks(
        _w72_b, ctx.vdict.arith_slice_refs(eng.bounds))
    y_refs = alg.chebyshev_filter_refs(eng, b_refs, CHEB_ORDER)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "y": pa.array(np.round(eng.unchunk(y_refs), 6)),
    })


def q_conjgrad_fixed(sf_dir: str):
    """Conjugate-gradient solve of (L + I) x = b, b = 1 + (arith % 7),
    after exactly CG_ITERS guarded rounds (see `alg.conjgrad_refs`);
    per-vertex x rounded 6."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    b_refs = eng.map_chunks(
        _w72_b, ctx.vdict.arith_slice_refs(eng.bounds))
    x_refs, _ = alg.conjgrad_refs(eng, b_refs, CG_ITERS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "x": pa.array(np.round(eng.unchunk(x_refs), 6)),
    })


def q_cg_resid(sf_dir: str):
    """||r||_2 after the CG_ITERS-round conjugate-gradient solve — one
    bounded row (vs the Jacobi residual of `q_jacobi_resid`: same
    system, Krylov vs stationary convergence)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    b_refs = eng.map_chunks(
        _w72_b, ctx.vdict.arith_slice_refs(eng.bounds))
    _, resid = alg.conjgrad_refs(eng, b_refs, CG_ITERS)
    return pa.table({"resid": pa.array([round(resid, 6)])})


def q_lm_score(sf_dir: str):
    """Per-language mean unigram cross-entropy under the add-one
    smoothed corpus LM — the LM quality-scoring stage (see
    `text.lm_score`)."""
    import ray

    from ..functions import text as textf

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text", "lang"])
    return textf.lm_score(docs)


# --- wave 74: SALSA, lambda_2, LM outlier census ----------------------------

SALSA_ITERS = 4


def q_salsa_fixed(sf_dir: str):
    """SALSA authority scores after SALSA_ITERS alternating stochastic
    walk rounds on the structural directed graph (see `alg.salsa_refs`);
    per-vertex auth rounded 6 (vertices with no in-edges at 0)."""
    ctx = get_context(sf_dir)
    fwd = ctx.engine("dir_bool")
    rev = ctx.engine("rev_bool")
    a_refs = alg.salsa_refs(
        fwd, rev, ctx.vdict.arith_slice_refs(fwd.bounds), SALSA_ITERS)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "auth": pa.array(np.round(fwd.unchunk(a_refs), 6)),
    })


def q_lambda2(sf_dir: str):
    """(lambda_1, lambda_2) spectral estimates of the structural
    undirected adjacency: power iteration + Wielandt-deflated power
    iteration, EIG_ITERS rounds each (see `alg.lambda2_refs`) — one
    bounded row (the spectral-gap dashboard feed)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    b_refs = eng.map_chunks(_w72_b, ar)
    lam2, lam1 = alg.lambda2_refs(eng, ar, b_refs, EIG_ITERS)
    return pa.table({
        "lambda1": pa.array([round(lam1, 6)]),
        "lambda2": pa.array([round(lam2, 6)]),
    })


def q_lm_outliers(sf_dir: str):
    """Per-language count of LM-score outlier docs (cross-entropy above
    mean + 2 population sigma) — the statistical quality gate over the
    unigram LM scores (see `text.lm_outliers`)."""
    import ray

    from ..functions import text as textf

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text", "lang"])
    return textf.lm_outliers(docs)


# --- wave 75: subgraph centrality (truncated Estrada) -----------------------


def _w75_rowsum_p(b: pa.Table, squared: bool) -> pa.Table:
    """Per-batch exact int64 row-sum partial of S's values (or their
    squares) keyed by src."""
    empty = pa.table({"v": pa.array([], type=pa.int64()),
                      "s": pa.array([], type=pa.int64())})
    if b.num_rows == 0:
        return empty
    src = np.asarray(b.column("src"), dtype=np.int64)
    val = np.asarray(b.column("w")).astype(np.int64)
    if squared:
        val = val * val
    uk, inv = np.unique(src, return_inverse=True)
    out = np.zeros(len(uk), dtype=np.int64)
    np.add.at(out, inv, val)
    return pa.table({"v": pa.array(uk), "s": pa.array(out)})


def _w75_rowsum_m(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"v": pa.array([], type=pa.int64()),
                         "s": pa.array([], type=pa.int64())})
    uk, inv = np.unique(np.asarray(t.column("v"), dtype=np.int64),
                        return_inverse=True)
    out = np.zeros(len(uk), dtype=np.int64)
    np.add.at(out, inv, np.asarray(t.column("s"), dtype=np.int64))
    return pa.table({"v": pa.array(uk), "s": pa.array(out)})


def _estrada_parts(ctx):
    """(d2, d3, d4) exact int64 per-vertex closed-walk counts over the
    loop-free structural undirected graph: d2 = diag(A^2) = deg,
    d3 = diag(A^3) (2x wedge-closures at v), d4 = diag(A^4) = row
    sum-of-squares of S = A^2. ONE SpGEMM (`Mult_AnXBn_Synch` analog)
    + an EWiseMult coordinate mask (``SpParMat.cpp:2815``) + two exact
    int64 row reductions; the wedge-volume heuristic sizes the shuffle
    like `harmonic2_table`."""
    from ..core import spgemm as SG
    from ..core.shuffle import group_apply_tasks

    cached = getattr(ctx, "_estrada_memo", None)
    if cached is not None:
        return cached
    n = ctx.n
    und = ctx.graph("directed").union_max()
    d2 = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((d2.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    S = SG.spgemm_tasks(und.edges, und.edges, n, add="sum",
                        num_partitions=gp)

    def _gather(ds) -> np.ndarray:
        out = np.zeros(n, dtype=np.int64)
        for r in ds.take_all():
            out[r["v"]] = r["s"]
        return out

    d4 = _gather(group_apply_tasks(
        S.map_batches(partial(_w75_rowsum_p, squared=True),
                      batch_format="pyarrow", zero_copy_batch=True),
        ["v"], _w75_rowsum_m, num_partitions=gp))
    M = SG.coordinate_mask(S, und.edges, n, anti=False,
                           num_partitions=gp)
    d3 = _gather(group_apply_tasks(
        M.map_batches(partial(_w75_rowsum_p, squared=False),
                      batch_format="pyarrow", zero_copy_batch=True),
        ["v"], _w75_rowsum_m, num_partitions=gp))
    ctx._estrada_memo = (d2, d3, d4)  # contexts are process-cached; the
    # SpGEMM is the cost, the three int64 vectors are the memo
    return d2, d3, d4


def q_estrada_trunc(sf_dir: str):
    """Truncated subgraph (Estrada) centrality
    sc(v) = 1 + d2/2! + d3/3! + d4/4! from the exact int64 closed-walk
    diagonals (see `_estrada_parts`) — per-vertex, float arithmetic
    identical on both twins (same ints, same operation order)."""
    ctx = get_context(sf_dir)
    d2, d3, d4 = _estrada_parts(ctx)
    sc = 1.0 + d2 / 2.0 + d3 / 6.0 + d4 / 24.0
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "sc": pa.array(np.round(sc, 6)),
    })


def q_closed_walks234(sf_dir: str):
    """Exact closed-walk traces tr(A^2), tr(A^3), tr(A^4) of the
    structural undirected graph (int64; tr(A^2) = 2m, tr(A^3) = 6x
    triangles) — one bounded row from the `_estrada_parts` diagonals."""
    ctx = get_context(sf_dir)
    d2, d3, d4 = _estrada_parts(ctx)
    return pa.table({
        "w2": pa.array([int(d2.sum())], type=pa.int64()),
        "w3": pa.array([int(d3.sum())], type=pa.int64()),
        "w4": pa.array([int(d4.sum())], type=pa.int64()),
    })


# --- wave 76: convergence trace + LM length-quality correlation ------------


def q_power_trace(sf_dir: str):
    """Per-iteration Rayleigh-quotient convergence trace of the power
    iteration (EIG_ITERS rows; r_0 = mean degree, r_k -> lambda_1; see
    `alg.power_rayleigh_trace_refs`)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    tr = alg.power_rayleigh_trace_refs(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), EIG_ITERS)
    return pa.table({
        "iter": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        "rayleigh": pa.array([round(v, 6) for v in tr]),
    })


def q_lm_len_corr(sf_dir: str):
    """Per-language Pearson correlation between doc token count and LM
    cross-entropy (see `text.lm_len_corr`)."""
    import ray

    from ..functions import text as textf

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text", "lang"])
    return textf.lm_len_corr(docs)


# --- wave 77: PageRank convergence metrics ----------------------------------

PR_TRACE_ITERS = 8


def q_pagerank_trace(sf_dir: str):
    """Per-iteration PageRank convergence metrics over PR_TRACE_ITERS
    fixed rounds: the dangling mass entering each round and the L1
    update delta, both scaled by n (the per-checkpoint metrics the
    north-rule job logs; see `pagerank(collect_trace=True)`)."""
    from .pagerank import pagerank

    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    _, info = pagerank(eng, iters=PR_TRACE_ITERS, ckpt_dir=None,
                       collect_trace=True)
    tr = info["trace"]
    n = float(ctx.n)
    return pa.table({
        "iter": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        # round 3: values are O(1e3-1e5); 6 decimals sits at the float64
        # summation-noise boundary (one ULP flipped a digit at sf0.01)
        "dmass_n": pa.array([round(dm * n, 3) for dm, _ in tr]),
        "delta_n": pa.array([round(dl * n, 3) for _, dl in tr]),
    })


# --- wave 78: MCL chaos trace ------------------------------------------------

MCLT_ROUNDS = 2


def q_mcl_chaos_trace(sf_dir: str):
    """Per-round MCL chaos metric (max over columns of colmax - col
    sum-of-squares, ``MCL.cpp:406-420``) over exactly MCLT_ROUNDS
    expand/prune/select/inflate rounds — the HipMCL convergence log,
    and the MCL family's first value-exact oracle face (see
    `mcl(interpret=False)`)."""
    from .mcl import mcl

    ctx = get_context(sf_dir)
    _, info = mcl(ctx.graph("sym").edges, ctx.n,
                  max_iters=MCLT_ROUNDS, eps=-1.0, interpret=False)
    ch = info["chaos"]
    return pa.table({
        "round": pa.array(np.arange(1, len(ch) + 1, dtype=np.int64)),
        "chaos": pa.array([round(c, 6) for c in ch]),
    })


# --- wave 79: BFS direction-switch trace -------------------------------------


def q_bfs_dir_trace(sf_dir: str):
    """Per-level Beamer-rule evidence of the direction-optimizing BFS
    from m_0: (level, frontier size, frontier incident edges, remaining
    unexplored edges, bottomup flag) — all integers, the rule
    ``top_down = fsize*50 < n AND fedges*4 < m_rem`` replayed by the
    SQL twin (see `alg.bfs_parents(trace=...)`, ``DirOptBFS.cpp``)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_0")
    tr: list = []
    alg.bfs_parents(ctx.engine("sym"), root, max_iters=BFS_ITERS,
                    trace=tr)
    cols = list(zip(*tr)) if tr else [[], [], [], [], []]
    return pa.table({
        "level": pa.array(np.asarray(cols[0], dtype=np.int64)),
        "fsize": pa.array(np.asarray(cols[1], dtype=np.int64)),
        "fedges": pa.array(np.asarray(cols[2], dtype=np.int64)),
        "m_rem": pa.array(np.asarray(cols[3], dtype=np.int64)),
        "bottomup": pa.array(np.asarray(cols[4], dtype=np.int64)),
    })


# --- wave 80: SSSP relaxation + label-flip traces ----------------------------


def q_sssp_relax_trace(sf_dir: str):
    """Per-round improved-vertex counts of the Bellman-Ford relaxation
    from m_1 on the weighted sssp engine — one row per productive round
    (all integers; see `alg.min_plus_distances(trace=...)`)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_1")
    tr: list = []
    alg.min_plus_distances(ctx.engine("sssp"), root, iters=SSSP_ITERS,
                           trace=tr)
    return pa.table({
        "round": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        "n_improved": pa.array(np.asarray(tr, dtype=np.int64)),
    })


def q_labelprop_flip_trace(sf_dir: str):
    """Per-round label-flip counts of the fixed LP_ITERS synchronous
    label-propagation rounds (all integers; see
    `alg.label_propagation(trace=...)`)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    init_refs = eng.map_chunks(
        partial(alg.lp_mod_init_kernel, num_classes=LP_CLASSES),
        ctx.vdict.arith_slice_refs(eng.bounds))
    tr: list = []
    alg.label_propagation(eng, init_refs, LP_CLASSES, LP_ITERS, trace=tr)
    return pa.table({
        "round": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        "n_flips": pa.array(np.asarray(tr, dtype=np.int64)),
    })


# --- wave 81: widest/katz traces + LSH precision-recall audit ---------------


def q_widest_relax_trace(sf_dir: str):
    """Per-round improved-vertex counts of the max-min (widest path)
    relaxation from m_1 — the bottleneck-path convergence log (all
    integers; see `alg.widest_paths_fixed(trace=...)`)."""
    ctx = get_context(sf_dir)
    root = ctx.lookup_id("m_1")
    tr: list = []
    alg.widest_paths_fixed(ctx.engine("sssp"), root, WIDEST_ITERS,
                           inf=BNECK_INF, trace=tr)
    return pa.table({
        "round": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        "n_improved": pa.array(np.asarray(tr, dtype=np.int64)),
    })


def q_katz_growth_trace(sf_dir: str):
    """Per-iteration total Katz mass sum(x_k) over the truncated
    dyadic-exact iteration (order-free exact float64; see
    `alg.katz_fixed(trace=...)`)."""
    ctx = get_context(sf_dir)
    tr: list = []
    alg.katz_fixed(ctx.engine("dir_bool"), KATZ_ITERS, KATZ_ALPHA,
                   trace=tr)
    return pa.table({
        "iter": pa.array(np.arange(1, len(tr) + 1, dtype=np.int64)),
        "sum_x": pa.array(tr),
    })


def q_lsh_pr_audit(sf_dir: str):
    """Precision/recall of the MinHash-LSH candidate pairs against the
    exact shingle-Jaccard pairs at the same tau=0.5 — the quality audit
    every banded-LSH deployment logs before trusting the bucketer
    (rows-only: the minhash side is hash-defined; the pytest twin
    recomputes both sides brute-force). One bounded row of integer
    counts + the two ratios."""
    from ..functions import dedup as D

    lsh = D.minhash_lsh_pairs(_docs(sf_dir), tau=0.5).to_pandas()
    exact = D.jaccard_pairs(_docs(sf_dir), tau=0.5).to_pandas()

    def keyset(df):
        if not len(df):
            return set()
        a = df.iloc[:, 0].to_numpy()
        b = df.iloc[:, 1].to_numpy()
        lo = np.minimum(a, b).astype(np.int64)
        hi = np.maximum(a, b).astype(np.int64)
        return set((lo * np.int64(1) << np.int64(32) | hi).tolist())

    ls, ex = keyset(lsh), keyset(exact)
    tp = len(ls & ex)
    prec = tp / len(ls) if ls else 1.0
    rec = tp / len(ex) if ex else 1.0
    return pa.table({
        "n_lsh": pa.array([len(ls)], type=pa.int64()),
        "n_exact": pa.array([len(ex)], type=pa.int64()),
        "n_match": pa.array([tp], type=pa.int64()),
        "precision": pa.array([round(prec, 6)]),
        "recall": pa.array([round(rec, 6)]),
    })


# --- wave 82: sketch-accuracy audits -----------------------------------------


def q_hll_audit(sf_dir: str):
    """HyperLogLog accuracy audit: the register-table estimate vs the
    exact distinct-token count, plus the signed relative error — the
    sketch-quality gate a cardinality pipeline logs (see
    `text.hll_registers` / `text.hll_estimate`; both twins compute the
    identical estimator from the identical integer registers)."""
    import ray

    from ..functions import text as T

    regs = pa.concat_tables([
        r for r in ray.get(T.hll_registers(_docs(sf_dir)).to_arrow_refs())
        if r.num_rows
    ] or [pa.table({"b": pa.array([], type=pa.int64()),
                    "r": pa.array([], type=pa.int64())})])
    est = T.hll_estimate(regs)
    exact = int(T.vocab_topk(_docs(sf_dir), k=1 << 30).num_rows)
    rel = (est - exact) / exact if exact else 0.0
    return pa.table({
        "est": pa.array([round(est, 6)]),
        "exact": pa.array([exact], type=pa.int64()),
        "rel_err": pa.array([round(rel, 6)]),
    })


CM_AUDIT_K = 10


def q_cm_audit(sf_dir: str):
    """Count-Min overcount census for the CM_AUDIT_K most frequent
    tokens: exact count, sketch estimate (min over the D rows), and the
    non-negative overcount — all exact integers (see
    `text.countmin_sketch`)."""
    import ray

    from ..functions import text as T

    sk = pa.concat_tables([
        r for r in ray.get(T.countmin_sketch(_docs(sf_dir))
                           .to_arrow_refs()) if r.num_rows
    ])
    tab = np.zeros((T.CM_D, T.CM_W), dtype=np.int64)
    tab[np.asarray(sk.column("r"), dtype=np.int64),
        np.asarray(sk.column("b"), dtype=np.int64)] = np.asarray(
        sk.column("cnt"), dtype=np.int64)
    top = T.vocab_topk(_docs(sf_dir), k=CM_AUDIT_K)
    toks = np.asarray(top.column("tok")).astype(str)
    cnts = np.asarray(top.column("cnt"), dtype=np.int64)
    hu = np.array([T.md5_lower64(t) for t in toks], dtype=np.uint64)
    est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(T.CM_D):
        b = ((hu >> np.uint64(16 * r)) & np.uint64(T.CM_W - 1)).astype(
            np.int64)
        est = np.minimum(est, tab[r, b])
    return pa.table({
        "tok": pa.array(toks.tolist(), type=pa.string()),
        "exact": pa.array(cnts),
        "est": pa.array(est),
        "overcount": pa.array(est - cnts),
    })


# --- wave 83: 2D grid census (partition-layout evidence) ---------------------


def q_grid_census(sf_dir: str):
    """Per-block nonzero counts of the engine's 2D grid, read straight
    from the block MANIFEST (no recompute): (block_row, block_col, nnz)
    for every non-empty block — driver-checkable evidence that the
    resident layout implements exactly the declared owner rule
    ``min(i // (n // g), g - 1)`` (``SpParMat.cpp:5081``; the SQL twin
    replays the rule over the edge table)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    g = eng.g
    rows = sorted((b["bid"] // g, b["bid"] % g, b["nnz"])
                  for b in eng.manifest["blocks"] if b["nnz"])
    return pa.table({
        "br": pa.array([r[0] for r in rows], type=pa.int64()),
        "bc": pa.array([r[1] for r in rows], type=pa.int64()),
        "nnz": pa.array([r[2] for r in rows], type=pa.int64()),
    })


# --- wave 84: SpGEMM planning metrics ----------------------------------------


def q_spgemm_flops(sf_dir: str):
    """`EstimateFLOP` planning metrics for C = A*A on the structural
    undirected graph: exact multiply count (sum over k of
    nnz(A(:,k)) * nnz(A(k,:)) — `core.spgemm.estimate_flop`,
    ``ParFriends.h:356``), the output nonzero count, and the
    compression factor flops/nnz(C) the phased planner keys on — one
    bounded row (ratio computed from exact integers on both twins)."""
    from ..core import spgemm as SG

    ctx = get_context(sf_dir)
    und = ctx.graph("directed").union_max()
    fl = int(SG.estimate_flop(und.edges, und.edges, ctx.n))
    d2 = ctx.engine("sym").in_weights().astype(np.int64)
    wedges = float((d2.astype(np.float64) ** 2).sum())
    gp = int(max(8, min(64, np.ceil(wedges / 1.5e6))))
    nnz_c = SG.spgemm_tasks(und.edges, und.edges, ctx.n, add="max",
                            num_partitions=gp).count()
    return pa.table({
        "flops": pa.array([fl], type=pa.int64()),
        "nnz_c": pa.array([int(nnz_c)], type=pa.int64()),
        "compression": pa.array([round(fl / nnz_c, 6)]),
    })


# --- wave 85: MCL prune/select statistics ------------------------------------


def q_mcl_prune_stats(sf_dir: str):
    """First-round `MCLPruneRecoverySelect` log counts: expanded
    coordinates, survivors of the 1e-4 prune, survivors of the top-50
    select — all integers (see `mcl`'s sentinel channel; reference
    ``MCL.cpp`` prune logs). ONE round only: later rounds' support sets
    sit downstream of ULP-knife-edge rank-50 cuts, so their counts are
    implementation-sensitive (the chaos TRACE stays robust across
    rounds because it is a max of smooth quantities)."""
    from .mcl import mcl

    ctx = get_context(sf_dir)
    _, info = mcl(ctx.graph("sym").edges, ctx.n,
                  max_iters=1, eps=-1.0, interpret=False)
    st = info["prune_stats"]
    return pa.table({
        "round": pa.array(np.arange(1, len(st) + 1, dtype=np.int64)),
        "nnz_expanded": pa.array([int(a) for a, _, _ in st],
                                 type=pa.int64()),
        "nnz_pruned": pa.array([int(b) for _, b, _ in st],
                               type=pa.int64()),
        "nnz_selected": pa.array([int(c) for _, _, c in st],
                                 type=pa.int64()),
    })


# --- wave 86: spectral bisection, effective resistance, Zipf fit, -----------
# --- min-plus distance doubling ----------------------------------------------

EFFRES_HUBS = 4
EFFRES_ITERS = 12
ZIPF_K = 100
DOUBLING_K = 128
DOUBLING_ROUNDS = 3  # exact induced distances up to 2^3 = 8 hops


def _w86_side(v):
    """Bisection side indicator from the deflated vector: 1.0 where
    round(v, 9) >= 0 (the rounding is shared with the SQL twin so both
    sides take the same branch on near-zero entries)."""
    return (np.round(v, 9) >= 0.0).astype(np.float64)


def _w86_cut(x, y):
    # y = A x (x the 0/1 side vector): sum over u NOT in S of y_u =
    # |{(u, v) in und : v in S, u not in S}| = the undirected cut size
    return float(((1.0 - x) * y).sum())


def _w86_sum(d):
    return float(d.sum())


def q_fiedler_cut(sf_dir: str):
    """Spectral bisection quality: partition by the SIGN of the
    Wielandt-deflated power vector (`alg.fiedler_vector_refs`, EIG_ITERS
    rounds) and report (lambda2, side sizes, cut edges, conductance) —
    the one-row dashboard a spectral partitioner logs. The cut and the
    volumes are pure SpMV algebra over the side indicator (cut =
    (1-x)^T A x, vol = x . deg), refs-only end-to-end — no per-edge
    driver pass and no O(n) driver arrays (reference use case:
    CombBLAS-backed spectral partitioning; SpParMat Reduce +
    `BetwCent.cpp` batching)."""
    import math

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    b_refs = eng.map_chunks(_w72_b, ar)
    v, lam2, _ = alg.fiedler_vector_refs(eng, ar, b_refs, EIG_ITERS)
    x = eng.map_chunks(_w86_side, v)
    deg = eng.in_weights_refs()
    y = eng.spmv_refs(x, "plus_times")
    cut = math.fsum(eng.chunk_scalars(_w86_cut, x, y))
    vol_pos = math.fsum(eng.chunk_scalars(alg._w72_dot, x, deg))
    vol_all = math.fsum(eng.chunk_scalars(_w86_sum, deg))
    n_pos = math.fsum(eng.chunk_scalars(_w86_sum, x))
    vmin = min(vol_pos, vol_all - vol_pos)
    cond = cut / vmin if vmin > 0 else 0.0
    return pa.table({
        "lambda2": pa.array([round(lam2, 6)]),
        "n_pos": pa.array([int(n_pos)], type=pa.int64()),
        "n_neg": pa.array([int(ctx.n - n_pos)], type=pa.int64()),
        "cut_edges": pa.array([int(cut)], type=pa.int64()),
        "conductance": pa.array([round(cond, 6)]),
    })


def q_effres_hubs(sf_dir: str):
    """Effective-resistance proxy between the top-EFFRES_HUBS degree
    hubs (all pairs, rank order): r(s, t) = x_s - x_t where
    (L + I) x = e_s - e_t after exactly EFFRES_ITERS batched Jacobi
    rounds (`alg.jacobi_multi_refs` — all C(4,2) solves ride ONE fused
    SpMM per round). The regularized r is the spanning-edge-centrality
    proxy a graph-sparsification pipeline logs per hub pair; bounded
    (k) per-chunk row-dot partials, no O(n) driver arrays."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    top = alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), EFFRES_HUBS)
    k = len(top)
    pa_, pb_, ss, tt = [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            pa_.append(i + 1)
            pb_.append(j + 1)
            ss.append(top[i])
            tt.append(top[j])
    B, X = alg.jacobi_multi_refs(
        eng, np.array(ss), np.array(tt), EFFRES_ITERS)
    r = np.sum(eng.chunk_scalars(alg._jm_rowdot, B, X), axis=0)
    return pa.table({
        "pa": pa.array(pa_, type=pa.int64()),
        "pb": pa.array(pb_, type=pa.int64()),
        "r_eff": pa.array(np.round(r, 6)),
    })


def q_zipf_fit(sf_dir: str):
    """Zipf's-law fit over the global token frequency spectrum: OLS of
    ln(count) on ln(rank) for the top-ZIPF_K tokens (rank by count DESC,
    token ASC — the `vocab_topk` total order), reporting (n_tokens,
    slope, intercept, r2) — the corpus-health diagnostic a tokenizer
    pipeline logs (natural text ~ slope -1). Distributed spectrum via
    the vocab_topk combiner/shuffle; the fit itself is over the bounded
    top-k rows."""
    import ray

    from ..functions import text as textf

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    t = textf.vocab_topk(docs, k=ZIPF_K)
    cnt = np.asarray(t.column("cnt"), dtype=np.float64)
    r = np.arange(1, len(cnt) + 1, dtype=np.float64)
    x, y = np.log(r), np.log(cnt)
    xm, ym = x.mean(), y.mean()
    sxx = float(((x - xm) ** 2).sum())
    sxy = float(((x - xm) * (y - ym)).sum())
    syy = float(((y - ym) ** 2).sum())
    slope = sxy / sxx if sxx > 0 else 0.0
    intercept = ym - slope * xm
    r2 = (sxy * sxy) / (sxx * syy) if sxx > 0 and syy > 0 else 1.0
    return pa.table({
        "n_tokens": pa.array([len(cnt)], type=pa.int64()),
        "slope": pa.array([round(slope, 6)]),
        "intercept": pa.array([round(intercept, 6)]),
        "r2": pa.array([round(r2, 6)]),
    })


def q_minplus_doubling(sf_dir: str):
    """APSP by min-plus distance DOUBLING on the hub-induced subgraph:
    take the top-DOUBLING_K degree vertices, `SubsRef` the induced
    structural undirected subgraph (distributed filter over the edge
    dataset — `SpParMat.cpp:2030`), then D <- min(D, D (+) D) for
    DOUBLING_ROUNDS rounds (exact distances to 2^rounds hops — the
    min_plus-semiring SpGEMM squaring kernel on the BOUNDED k x k
    extract, k^3 driver flops like the kselect/k_center merges).
    Output: unordered-pair distance histogram + an `unreached` row
    (dist = -1) for pairs beyond 2^rounds hops within the subgraph."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    sel = np.sort(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), DOUBLING_K))
    sel_ref = ray.put(sel)

    def _induced(batch: pa.Table, *, _ref=sel_ref) -> pa.Table:
        s = _ref if isinstance(_ref, np.ndarray) else ray.get(_ref)
        src = np.asarray(batch.column("src"))
        dst = np.asarray(batch.column("dst"))
        si = np.minimum(np.searchsorted(s, src), len(s) - 1)
        sj = np.minimum(np.searchsorted(s, dst), len(s) - 1)
        keep = (s[si] == src) & (s[sj] == dst) & (src != dst)
        return pa.table({
            "si": pa.array(si[keep].astype(np.int64)),
            "sj": pa.array(sj[keep].astype(np.int64)),
        })

    pairs = ctx.graph("sym").edges.map_batches(
        _induced, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # bounded: <= k^2 coordinate rows
    k = len(sel)
    D = np.full((k, k), np.inf)
    np.fill_diagonal(D, 0.0)
    D[pairs.si.to_numpy(), pairs.sj.to_numpy()] = 1.0
    for _ in range(DOUBLING_ROUNDS):
        D = np.minimum(D, (D[:, :, None] + D[None, :, :]).min(axis=1))
    iu = np.triu_indices(k, 1)
    d = D[iu]
    fin = np.isfinite(d)
    dist, cnt = np.unique(d[fin].astype(np.int64), return_counts=True)
    rows_d = list(dist)
    rows_c = list(cnt)
    unreach = int((~fin).sum())
    if unreach > 0:
        rows_d.append(-1)
        rows_c.append(unreach)
    return pa.table({
        "dist": pa.array(np.array(rows_d, dtype=np.int64)),
        "pairs": pa.array(np.array(rows_c, dtype=np.int64)),
    })


# --- wave 87: Cheeger threshold sweep, SimRank hub pairs, ------------------
# --- weighted systematic sampling -------------------------------------------

CHEEGER_B = 64
SIMRANK_C = 0.8
SIMRANK_HUBS = 3
WSYS_K = 16
WSYS_BUCKETS = 32


def _w87_prefix_ind(v):
    """(B-1, chunk) prefix indicators of the deflated vector against the
    fixed threshold grid t_b = -1 + 2b/B (unit vector => v in [-1, 1];
    the grid is value-fixed so the SQL twin reproduces it exactly)."""
    vr = np.round(v, 9)
    t = -1.0 + 2.0 * np.arange(1, CHEEGER_B) / CHEEGER_B
    return (vr[None, :] <= t[:, None]).astype(np.float64)


def _w87_keep_y(Y, bounds):
    return Y


def _w87_sweep_part(X, Y, deg):
    """(3, B-1) bounded partial per chunk: prefix sizes, volumes, cuts."""
    nin = X.sum(axis=1)
    vol = (X * deg).sum(axis=1)
    cut = ((1.0 - X) * Y).sum(axis=1)
    return np.stack([nin, vol, cut])


def q_cheeger_sweep(sf_dir: str):
    """Cheeger-style threshold sweep over the deflated power vector:
    for each fixed threshold t_b = -1 + 2b/B the prefix set
    S_b = {u : round(v_u, 9) <= t_b}, reporting (b, thresh, n_in,
    cut_edges, conductance) for every PROPER cut — the sweep-cut curve
    a spectral partitioner scans for the Cheeger minimum. ALL B-1
    prefixes ride ONE fused tall-skinny SpMM (Y = A X over the (B-1, n)
    indicator state, `spmm_apply_refs`) + bounded (3, B-1) per-chunk
    partials; refs-only end-to-end."""
    import math

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    b_refs = eng.map_chunks(_w72_b, ar)
    v, _, _ = alg.fiedler_vector_refs(eng, ar, b_refs, EIG_ITERS)
    X = eng.map_chunks(_w87_prefix_ind, v)
    Y = eng.spmm_apply_refs(X, CHEEGER_B - 1, "plus_times",
                            _w87_keep_y, 1)[0]
    deg = eng.in_weights_refs()
    parts = np.sum(eng.chunk_scalars(_w87_sweep_part, X, Y, deg), axis=0)
    nin, vol, cut = parts[0], parts[1], parts[2]
    vol_all = math.fsum(eng.chunk_scalars(_w86_sum, deg))
    bs = np.arange(1, CHEEGER_B)
    keep = (nin > 0) & (nin < ctx.n)
    vmin = np.minimum(vol[keep], vol_all - vol[keep])
    cond = np.where(vmin > 0, cut[keep] / np.where(vmin > 0, vmin, 1.0),
                    0.0)
    return pa.table({
        "b": pa.array(bs[keep].astype(np.int64)),
        "thresh": pa.array(np.round(-1.0 + 2.0 * bs[keep] / CHEEGER_B,
                                    6)),
        "n_in": pa.array(nin[keep].astype(np.int64)),
        "cut_edges": pa.array(cut[keep].astype(np.int64)),
        "conductance": pa.array(np.round(cond, 6)),
    })


def _w87_unit(bounds, v):
    s, e = bounds
    x = np.zeros(e - s)
    if s <= v < e:
        x[v - s] = 1.0
    return x


def _w87_qvec(ia, d):
    out = np.zeros_like(ia)
    np.divide(ia, d, out=out, where=d > 0)
    return out


def _w87_invd_common(ia, ib, d):
    m = (ia > 0) & (ib > 0) & (d > 0)
    return float((1.0 / d[m]).sum()) if m.any() else 0.0


def q_simrank_pairs(sf_dir: str):
    """SimRank similarity (c = 0.8, 2 iterations from S_0 = I) between
    the top-SIMRANK_HUBS in-degree hubs, all rank pairs: S1 directly
    from common in-neighbors, S2 via the closed form

      S2(a,b) = c/(|Ia||Ib|) * (c * (A q_a . A q_b - corr) + |Ia inter Ib|)

    with q_x = indicator(I(x)) / indeg elementwise and corr the
    double-counted i = j diagonal — i.e. the whole second SimRank
    iteration for a pair collapses to FOUR forward SpMVs + bounded
    dots (no n x n similarity matrix anywhere). Reference semantics:
    semiring SpMV composition (`SpParMat` plus_times)."""
    import math

    ctx = get_context(sf_dir)
    # reverse structural engine: its spmv is y_i = sum_v E_orig(i -> v)
    # x_v (the in-neighbor gather) and its column sums are the original
    # in-degrees — every primitive below rides ONE engine
    eng = ctx.engine("rev_bool")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    d = eng.out_weights_refs()  # original in-degrees
    top = alg.top_by_degree(eng, ar, SIMRANK_HUBS, deg_refs=d)
    ind, q, aq, size = {}, {}, {}, {}
    for h in top:
        e_h = eng.map_chunks_i(partial(_w87_unit, v=int(h)))
        ia = eng.spmv_refs(e_h, "plus_times")  # in-nbr indicator of h
        ind[h] = ia
        size[h] = math.fsum(eng.chunk_scalars(_w86_sum, ia))
        q[h] = eng.map_chunks(_w87_qvec, ia, d)
        aq[h] = eng.spmv_refs(q[h], "plus_times")
    c = SIMRANK_C
    rows = {"pa": [], "pb": [], "s1": [], "s2": []}
    for i in range(len(top)):
        for j in range(i + 1, len(top)):
            a, b = top[i], top[j]
            na, nb = size[a], size[b]
            nab = math.fsum(eng.chunk_scalars(alg._w72_dot,
                                              ind[a], ind[b]))
            cross = math.fsum(eng.chunk_scalars(alg._w72_dot,
                                                aq[a], aq[b]))
            corr = math.fsum(eng.chunk_scalars(_w87_invd_common,
                                               ind[a], ind[b], d))
            s1 = c * nab / (na * nb) if na > 0 and nb > 0 else 0.0
            s2 = (c / (na * nb) * (c * (cross - corr) + nab)
                  if na > 0 and nb > 0 else 0.0)
            rows["pa"].append(i + 1)
            rows["pb"].append(j + 1)
            rows["s1"].append(round(s1, 6))
            rows["s2"].append(round(s2, 6))
    return pa.table({
        "pa": pa.array(rows["pa"], type=pa.int64()),
        "pb": pa.array(rows["pb"], type=pa.int64()),
        "s1": pa.array(rows["s1"]),
        "s2": pa.array(rows["s2"]),
    })


def q_weighted_systematic(sf_dir: str):
    """Weighted systematic sample of orders, probability proportional
    to total price: thresholds t_j = (2j+1) W / (2K) (exact int64
    cents) against the cumulative-cents sequence in o_orderkey order —
    heavy orders can absorb several picks. The cumulative sequence is
    a DISTRIBUTED SCAN: per-range cents sums -> bounded driver offset
    prefix -> per-range local cumsum + searchsorted picks (one
    warm-task shuffle; the driver sees only the P range sums and the
    K picks)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    o = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("o_orderkey"), dtype=np.int64)
        cents = np.floor(np.asarray(t.column("o_totalprice"),
                                    dtype=np.float64) * 100
                         + 0.5).astype(np.int64)
        return pa.table({"k": pa.array(k), "cents": pa.array(cents)})

    oc = o.map_batches(_cents, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    # pass 1: bounded per-batch partials -> (max key, total cents)

    def _mw(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        return pa.table({"mk": pa.array([int(k.max()) if len(k) else -1],
                                        type=pa.int64()),
                         "w": pa.array([int(cents.sum())],
                                       type=pa.int64())})

    mw = oc.map_batches(_mw, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    maxk = int(mw.mk.max())
    W = int(mw.w.sum())
    span = maxk // WSYS_BUCKETS + 1
    th = (2 * np.arange(WSYS_K, dtype=np.int64) + 1) * W // (2 * WSYS_K)

    # pass 2: per-bucket cents sums (bounded) -> offsets
    def _bsum(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        ub, inv = np.unique(k // span, return_inverse=True)
        return pa.table({"bucket": pa.array(ub),
                         "s": pa.array(ibincount(inv, cents,
                                                 minlength=len(ub)))})

    bs = oc.map_batches(_bsum, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    sums = np.zeros(WSYS_BUCKETS, dtype=np.int64)
    np.add.at(sums, bs.bucket.to_numpy(), bs.s.to_numpy())
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    def _bk(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        return t.append_column("bucket", pa.array(k // span))

    def _pick(t: pa.Table) -> pa.Table:
        empty = pa.table({"j": pa.array([], type=pa.int64()),
                          "o_orderkey": pa.array([], type=pa.int64()),
                          "cents": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        k = np.asarray(t.column("k"), dtype=np.int64)
        cents = np.asarray(t.column("cents"), dtype=np.int64)
        b = np.asarray(t.column("bucket"), dtype=np.int64)
        out_j, out_k, out_c = [], [], []
        for ub in np.unique(b):
            m = b == ub
            order = np.argsort(k[m], kind="stable")
            kk, cc = k[m][order], cents[m][order]
            cum = offsets[ub] + np.cumsum(cc)
            lo, hi = offsets[ub], offsets[ub] + cc.sum()
            js = np.nonzero((th >= lo) & (th < hi))[0]
            idx = np.searchsorted(cum, th[js], side="right")
            out_j.append(js.astype(np.int64))
            out_k.append(kk[idx])
            out_c.append(cc[idx])
        return pa.table({
            "j": pa.array(np.concatenate(out_j)),
            "o_orderkey": pa.array(np.concatenate(out_k)),
            "cents": pa.array(np.concatenate(out_c)),
        })

    withb = oc.map_batches(_bk, batch_format="pyarrow",
                           zero_copy_batch=True)
    return group_apply_tasks(withb, ["bucket"], _pick)


# --- wave 88: Hutchinson trace estimator, k-truss peel trace, ---------------
# --- EWMA daily anomaly flags -------------------------------------------------

HUTCH_P = 6
TRUSS_K = 4
TRUSS_ROUNDS = 3
EWMA_NUM = 1  # alpha = EWMA_NUM / EWMA_DEN = 0.25 (dyadic: exact in binary)
EWMA_DEN = 4
EWMA_FACTOR = 1.5


def _w88_probe(n, ar, bounds):
    """(HUTCH_P, chunk) Rademacher probe block: z_p[v] = 1 - 2*bit16 of
    a TWO-round Knuth/Lehmer multiplicative mix of (p*n + arith(v)).
    Two rounds matter: the low bit of key*odd is just parity(key)
    (constant across probes when n is even), and even bit 16 of one
    multiply is a Weyl sequence with visible structure — keyed on the
    permutation-stable ARITH label index (not the dense id), the same
    deterministic SQL-expressible generator as the percolation sampler."""
    key = (np.arange(1, HUTCH_P + 1, dtype=np.int64)[:, None] * np.int64(n)
           + np.asarray(ar, dtype=np.int64)[None, :])
    h1 = ((key % (1 << 20)) * np.int64(2654435761)
          + (key // (1 << 20)) * np.int64(40503)) % np.int64(1 << 32)
    h2 = ((h1 % (1 << 16)) * np.int64(48271)
          + h1 // (1 << 16)) % np.int64(1 << 32)
    return (1 - 2 * ((h2 >> 16) % 2)).astype(np.int64)


def q_hutchinson_trace(sf_dir: str):
    """Hutchinson stochastic trace estimator of tr(A^3) = 6 x triangles
    over the structural undirected graph: HUTCH_P deterministic
    Rademacher probes (Knuth-hash signs), est_p = z_p^T A^3 z_p via
    THREE chained exact-int64 batched SpMMs (`plus_times_i64` — path
    counting past the f64 2^53 ceiling, the reference's promoted 64-bit
    semiring types) riding the chunked refs form (BetwCent.cpp:179-187
    batched fringes); per-probe row-dot partials close the quadratic
    form. The trace-estimation primitive of spectral-density / Estrada
    pipelines at scales where diag(A^3) SpGEMM is unaffordable. Output:
    (probe, est, mean_est) with the running mean — integer-exact per
    probe on both twins, no O(n) driver arrays."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    z = eng.map_chunks_i(partial(_w88_probe, ctx.n), ar)
    y = z
    for _ in range(3):
        y = eng.spmm_refs(y, HUTCH_P, "plus_times_i64")
    ests = np.sum(eng.chunk_scalars(alg._jm_rowdot, z, y), axis=0)
    ests = ests.astype(np.int64)
    means = np.cumsum(ests) / np.arange(1, HUTCH_P + 1)
    return pa.table({
        "probe": pa.array(np.arange(1, HUTCH_P + 1), type=pa.int64()),
        "est": pa.array(ests, type=pa.int64()),
        "mean_est": pa.array(np.round(means, 6)),
    })


def _w88_keep(b: pa.Table) -> pa.Table:
    m = np.asarray(b.column("w"), dtype=np.int64) >= TRUSS_K - 2
    return pa.table({
        "src": pa.array(np.asarray(b.column("src"), dtype=np.int64)[m]),
        "dst": pa.array(np.asarray(b.column("dst"), dtype=np.int64)[m]),
        "w": pa.array(np.ones(int(m.sum()), dtype=np.float64)),
    })


def q_ktruss_peel(sf_dir: str):
    """TRUSS_K-truss peeling trace: per round, the per-edge triangle
    support of the CURRENT undirected edge set is ONE SpGEMM
    (`Mult_AnXBn_Synch` analog, warm-task shuffle plan) + an EWiseMult
    coordinate mask (``SpParMat.cpp:2815``) — support(u,v) = (A^2)_uv
    on edges — then edges with support < K-2 are peeled. The truss
    decomposition inner loop (cohesive-subgraph mining); each round's
    shuffle width follows the wedge-volume heuristic. Output one row
    per round: (round, n_edges, n_survive) in canonical-pair counts."""
    from ..core import spgemm as SG

    ctx = get_context(sf_dir)
    n = ctx.n
    E = ctx.graph("directed").union_max().edges.materialize()
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    rounds, before, after = [], [], []
    for r in range(1, TRUSS_ROUNDS + 1):
        m0 = E.count()
        if m0 == 0:
            # empty fixpoint: every later round is (0, 0) exactly —
            # skip the degenerate SpGEMM instead of shuffling nothing
            m1 = 0
        else:
            S = SG.spgemm_tasks(E, E, n, add="sum", num_partitions=gp)
            M = SG.coordinate_mask(S, E, n, num_partitions=gp)
            E = M.map_batches(_w88_keep, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
            m1 = E.count()
        rounds.append(r)
        before.append(m0 // 2)
        after.append(m1 // 2)
    return pa.table({
        "round": pa.array(rounds, type=pa.int64()),
        "n_edges": pa.array(before, type=pa.int64()),
        "n_survive": pa.array(after, type=pa.int64()),
    })


def q_ewma_daily(sf_dir: str):
    """EWMA anomaly flags over the daily event-count series: dense day
    axis from min to max epoch-day (zero-filled), s_1 = x_1,
    s_t = alpha*x_t + (1-alpha)*s_{t-1} with the DYADIC alpha = 1/4 (so
    every smoothed value is an exact binary float on both twins), and
    flag_t = x_t > 1.5 * s_{t-1} — the streaming burst detector a
    volume-monitoring pipeline runs per day. The day histogram is
    distributed (per-batch bincount partials, bounded rows to the
    driver); the recursion itself is over the bounded day axis. Output
    (day, cnt, ewma, flag)."""
    import ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _days(b: pa.Table) -> pa.Table:
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u), "c": pa.array(c)})

    agg: dict[int, int] = {}
    for r in ev.map_batches(_days, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        agg[r["day"]] = agg.get(r["day"], 0) + r["c"]
    lo, hi = min(agg), max(agg)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.array([agg.get(int(d), 0) for d in days], dtype=np.int64)
    a = EWMA_NUM / EWMA_DEN
    s = np.empty(len(days), dtype=np.float64)
    flag = np.zeros(len(days), dtype=bool)
    s[0] = float(x[0])
    for t in range(1, len(days)):
        flag[t] = x[t] > EWMA_FACTOR * s[t - 1]
        s[t] = a * x[t] + (1.0 - a) * s[t - 1]
    return pa.table({
        "day": pa.array(days),
        "cnt": pa.array(x),
        # micro-units fixed point: the dyadic alpha makes exact .5 ties
        # common, where round() half-even (numpy) vs half-away (DuckDB)
        # split — floor(x*1e6 + 0.5) is one deterministic rule both sides
        "ewma_u": pa.array(np.floor(s * 1e6 + 0.5).astype(np.int64)),
        "flag": pa.array(flag),
    })


# --- wave 89: web bow-tie census, 4-clique count, CUSUM drift flags ---------

CUSUM_H_MULT = 2


def _w89_bowtie_part(F, B):
    """Per-chunk 4-way bow-tie census over the (1, chunk) forward /
    backward hub-reach distance states: (core, in, out, other)."""
    f, b = np.isfinite(F[0]), np.isfinite(B[0])
    core = f & b
    return np.array([
        int(core.sum()),
        int((b & ~core).sum()),
        int((f & ~core).sum()),
        int((~f & ~b).sum()),
    ], dtype=np.int64)


def q_bowtie_census(sf_dir: str):
    """Web BOW-TIE decomposition relative to the SCC of the top-degree
    hub (Broder et al.'s CORE/IN/OUT census, pivoted like one FW-BW SCC
    round — the deterministic pivot makes it SQL-checkable where the
    full data-dependent SCC sweep is not): forward reach on the
    directed structural engine and backward reach on its transpose both
    run TO FIXPOINT (the min-plus kseed loop's exact early exit — no
    iteration bound), then CORE = fwd AND bwd (mutual reach with the
    hub = the hub's SCC), IN = bwd-only, OUT = fwd-only, OTHER =
    tendrils + disconnected. The census reduces bounded per-chunk
    counts; the driver never holds an O(n) array. Reference semantics:
    the FW-BW pivot round of the SCC machinery (min-label SpMV,
    ``CC.h:419-577``)."""
    import ray

    ctx = get_context(sf_dir)
    sym = ctx.engine("sym")
    hub = np.asarray(alg.top_by_degree(
        sym, ctx.vdict.arith_slice_refs(sym.bounds), 1), dtype=np.int64)
    F = alg.kseed_distances_refs(ctx.engine("dir_bool"), hub,
                                 iters=1 << 20)
    B = alg.kseed_distances_refs(ctx.engine("rev_bool"), hub,
                                 iters=1 << 20)
    parts = np.sum(ray.get(sym.map_chunks(_w89_bowtie_part, F, B)),
                   axis=0)
    names = ["n_core", "n_in", "n_out", "n_other"]
    return pa.table({nm: pa.array([int(v)], type=pa.int64())
                     for nm, v in zip(names, parts)})


def _w89_left(t: pa.Table) -> pa.Table:
    return pa.table({"a": t.column("a"), "m": t.column("m"),
                     "c1": t.column("c")})


def _w89_right(t: pa.Table) -> pa.Table:
    return pa.table({"a": t.column("a"), "m": t.column("m"),
                     "c2": t.column("c")})


def _w89_pairs(t: pa.Table) -> pa.Table:
    c1 = np.asarray(t.column("c1"), dtype=np.int64)
    c2 = np.asarray(t.column("c2"), dtype=np.int64)
    keep = c1 < c2
    return pa.table({"a": pa.array(c1[keep]), "c": pa.array(c2[keep])})


def q_k4_count(sf_dir: str):
    """4-clique (K4) census via the triangle-edge join: every triangle
    a < m < c is keyed by its LOWEST edge (a, m); two triangles sharing
    that edge give a candidate third-vertex pair (c1 < c2), and the
    candidate is a K4 iff (c1, c2) is itself an edge — so each K4
    w < x < y < z is counted exactly ONCE, via its two-smallest-vertex
    edge (w, x) (the other two triangle keys (w, y) / (x, y) hold one
    triangle each and emit nothing). Both the self-join and the closing
    adjacency semi join are co-partitioned warm tasks sized by the
    wedge volume — the masked-SpGEMM composition (`MaskedSpGEMM`
    analog) lifted one motif order above `q_triangle_count`. Output one
    row: (n_triangles, n_tri_pairs, n_k4)."""
    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    tri = _triangles_ids(ctx).materialize()
    n_tri = tri.count()
    deg = ctx.engine("sym").in_weights().astype(np.float64)
    gp = int(max(8, min(64, np.ceil(float((deg ** 2).sum()) / 1.5e6))))
    pairs = hash_join_tasks(
        tri.map_batches(_w89_left, batch_format="pyarrow"),
        tri.map_batches(_w89_right, batch_format="pyarrow"),
        on=["a", "m"], num_partitions=gp, post=_w89_pairs,
    ).materialize()
    n_pairs = pairs.count()
    g = ctx.graph("sym")
    adj = g.dedup_sum().cast_bool().edges.map_batches(
        _w89_orient_ac, batch_format="pyarrow")
    k4 = hash_join_tasks(pairs, adj, on=["a", "c"],
                         join_type="left semi", num_partitions=gp)
    return pa.table({
        "n_triangles": pa.array([int(n_tri)], type=pa.int64()),
        "n_tri_pairs": pa.array([int(n_pairs)], type=pa.int64()),
        "n_k4": pa.array([int(k4.count())], type=pa.int64()),
    })


def _w89_orient_ac(t: pa.Table) -> pa.Table:
    s = np.asarray(t.column("src"), dtype=np.int64)
    d = np.asarray(t.column("dst"), dtype=np.int64)
    keep = s < d
    return pa.table({"a": pa.array(s[keep]), "c": pa.array(d[keep])})


def q_cusum_flags(sf_dir: str):
    """One-sided Page CUSUM drift detector over the dense daily
    event-count axis, kept ALL-INTEGER (exact on both twins; the EWMA
    sibling covers the dyadic-float recursion): target k = floor(total
    / n_days), S_0 = max(0, x_0 - k), S_t = max(0, S_{t-1} + x_t - k),
    flag when S_t > h = CUSUM_H_MULT * k — the volume-monitor burst
    detector with drift normalization. The day histogram is distributed
    (per-batch bincount partials, bounded rows to the driver); the
    recursion folds over the bounded day axis. Output
    (day, cnt, cusum, flag)."""
    import ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _days(b: pa.Table) -> pa.Table:
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u), "c": pa.array(c)})

    agg: dict[int, int] = {}
    for r in ev.map_batches(_days, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        agg[r["day"]] = agg.get(r["day"], 0) + r["c"]
    lo, hi = min(agg), max(agg)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.array([agg.get(int(d), 0) for d in days], dtype=np.int64)
    k = int(x.sum()) // len(days)
    h = CUSUM_H_MULT * k
    s = np.empty(len(days), dtype=np.int64)
    s[0] = max(0, int(x[0]) - k)
    for t in range(1, len(days)):
        s[t] = max(0, int(s[t - 1]) + int(x[t]) - k)
    return pa.table({
        "day": pa.array(days),
        "cnt": pa.array(x),
        "cusum": pa.array(s),
        "flag": pa.array(s > h),
    })


# --- wave 90: Steiner 2-approx, mutual-NN pairs, snowball census ------------

STEINER_K = 4
SNOW_ROUNDS = 2
SNOW_FAN = 3


def q_steiner_approx(sf_dir: str):
    """Metric-closure Steiner tree 2-approximation over the STEINER_K
    top-degree hub terminals (Kou-Markowsky-Berman step 1-2): hub-to-hub
    hop distances within BFS_ITERS via the K-source min-plus SpMM
    (chunked refs, only the K seed COLUMNS gathered — bounded K x K
    driver state, `BetwCent.cpp:179-187` batched form), then Prim's MST
    over the K x K closure with the (dist, rank_a, rank_b) lexicographic
    tie-break — terminal RANKS (1-based position in the (deg DESC,
    arith ASC) hub order) are id-space invariant, so the same tie-break
    is expressible in SQL. Output one row per Prim step:
    (step, ta, tb, dist); unreachable-in-window terminals end the tree
    early on both twins."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    S = alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), STEINER_K)
    K = len(S)
    D_refs = alg.kseed_distances_refs(eng, S, iters=BFS_ITERS)
    pos_refs, sub_refs = eng.map_chunks_n(
        partial(_seed_cols, seeds=S), 2, D_refs, with_bounds=True)
    H = np.full((K, K), np.inf)
    for pos, sub in zip(ray.get(pos_refs), ray.get(sub_refs)):
        H[:, pos] = sub
    in_tree = [0]
    steps, tas, tbs, ds = [], [], [], []
    for step in range(1, K):
        best = None
        for a in in_tree:
            for b in range(K):
                if b in in_tree or not np.isfinite(H[a, b]):
                    continue
                cand = (float(H[a, b]), a + 1, b + 1)
                if best is None or cand < best:
                    best = cand
        if best is None:
            break  # remaining terminals unreachable within the window
        d, ta, tb = best
        in_tree.append(tb - 1)
        steps.append(step)
        tas.append(ta)
        tbs.append(tb)
        ds.append(int(d))
    return pa.table({
        "step": pa.array(steps, type=pa.int64()),
        "ta": pa.array(tas, type=pa.int64()),
        "tb": pa.array(tbs, type=pa.int64()),
        "dist": pa.array(ds, type=pa.int64()),
    })


def _w90_fwd(t: pa.Table) -> pa.Table:
    return pa.table({"a": t.column("query_id"), "b": t.column("neighbor_id")})


def _w90_rev(t: pa.Table) -> pa.Table:
    return pa.table({"a": t.column("neighbor_id"), "b": t.column("query_id")})


def q_mutual_nn(sf_dir: str):
    """Mutual nearest-neighbor pairs over the embedding table: each
    vector's cosine top-1 (ties by neighbor id — `knn_graph`'s exact 2D
    block-pair tiled plan, k=1), kept iff the relation is SYMMETRIC
    (a's NN is b AND b's NN is a) — the bitext-mining / cluster-seeding
    primitive (a stricter face of the kNN graph). The mutuality check
    is the kNN dataset inner-joined with its own reverse on BOTH id
    columns (co-partitioned warm tasks). Output (a, b) vec_id pairs,
    a < b."""
    import ray

    from ..core.shuffle import hash_join_tasks
    from ..functions.ann import knn_graph

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    nn = knn_graph(emb, k=1, method="exact").materialize()
    pairs = hash_join_tasks(
        nn.map_batches(_w90_fwd, batch_format="pyarrow"),
        nn.map_batches(_w90_rev, batch_format="pyarrow"),
        on=["a", "b"], num_partitions=8, post=_w90_ab,
    )
    return pairs


def _w90_ab(t: pa.Table) -> pa.Table:
    a = np.asarray(t.column("a"), dtype=np.int64)
    b = np.asarray(t.column("b"), dtype=np.int64)
    keep = a < b
    return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})


def q_snowball_census(sf_dir: str):
    """Deterministic snowball sample from the top-degree hub: each
    frontier vertex names its SNOW_FAN smallest-arith structural
    neighbors (the respondent-driven-sampling rule with the
    permutation-stable arith order standing in for 'first k contacts');
    newly named vertices join the sample and expand next round, for
    SNOW_ROUNDS rounds. The per-round candidate edges are a distributed
    Dataset filter against the broadcast (bounded) frontier; ranking
    folds over the frontier-degree-bounded candidate set. Output
    (label, round) for every sampled vertex."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    hub = int(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), 1)[0])
    be = ctx.graph("sym").dedup_sum().cast_bool().edges
    sampled = {hub: 0}
    frontier = [hub]
    for r in range(1, SNOW_ROUNDS + 1):
        fset = set(frontier)

        def _cand(t: pa.Table, *, _f=frozenset(fset)) -> pa.Table:
            s = np.asarray(t.column("src"), dtype=np.int64)
            d = np.asarray(t.column("dst"), dtype=np.int64)
            keep = np.isin(s, np.fromiter(_f, dtype=np.int64))
            return pa.table({"s": pa.array(s[keep]),
                             "d": pa.array(d[keep])})

        cand = be.map_batches(_cand, batch_format="pyarrow").to_pandas()
        if len(cand) == 0:
            break
        dst = cand["d"].to_numpy()
        ar = ctx.decoder().arith(dst)
        new = []
        for s in sorted(fset):
            m = cand["s"].to_numpy() == s
            picks = dst[m][np.argsort(ar[m], kind="stable")][:SNOW_FAN]
            for v in picks:
                if int(v) not in sampled:
                    sampled[int(v)] = r
                    new.append(int(v))
        if not new:
            break
        frontier = new
    ids = np.array(sorted(sampled), dtype=np.int64)
    return pa.table({
        "label": _label_col(ctx, ids),
        "round": pa.array([sampled[int(v)] for v in ids], type=pa.int64()),
    })


# --- wave 91: hub closed-walk returns, threshold cascade, Holt trend --------

WALK_T = 6
CASC_MOD = 17
CASC_THETA = 2
CASC_ROUNDS = 4
HOLT_A_NUM, HOLT_A_DEN = 1, 2  # alpha = 1/2  (dyadic: exact in binary)
HOLT_B_NUM, HOLT_B_DEN = 1, 4  # beta  = 1/4


def _w91_seed(bounds, hub):
    s, e = bounds
    x = np.zeros((1, e - s), dtype=np.int64)
    if s <= hub < e:
        x[0, hub - s] = 1
    return x


def q_hub_walk_returns(sf_dir: str):
    """Closed-walk return counts at the top-degree hub: c_t =
    (A^t)[hub, hub] for t = 1..WALK_T over the structural undirected
    graph, via repeated EXACT-int64 SpMV from e_hub riding chunked refs
    (`plus_times_i64` — path counting past the f64 2^53 ceiling, the
    reference's promoted 64-bit semiring types); only the hub's single
    entry is gathered back per step. The single-vertex face of the
    Estrada/closed-walk machinery: c_1 = 0 (loop-free), c_2 = deg(hub),
    c_3 = 2 x triangles at the hub. Output (t, walks)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    hub = int(alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), 1)[0])
    x = eng.map_chunks_n(partial(_w91_seed, hub=hub), 1,
                         with_bounds=True)[0]
    walks = []
    for _ in range(WALK_T):
        x = eng.spmm_refs(x, 1, "plus_times_i64")
        pos_refs, sub_refs = eng.map_chunks_n(
            partial(_seed_cols, seeds=np.array([hub])), 2, x,
            with_bounds=True)
        val = 0
        for pos, sub in zip(ray.get(pos_refs), ray.get(sub_refs)):
            if len(pos):
                val = int(sub[0, 0])
        walks.append(val)
    return pa.table({
        "t": pa.array(np.arange(1, WALK_T + 1), type=pa.int64()),
        "walks": pa.array(walks, type=pa.int64()),
    })


def _w91_casc_seed(ar):
    return (np.asarray(ar, dtype=np.int64)[None, :] % CASC_MOD == 0
            ).astype(np.int64)


def _w91_casc_step(a, y):
    return ((a[0] > 0) | (y[0] >= CASC_THETA)).astype(np.int64)[None, :]


def _w91_count(a):
    return np.array([int(a.sum())], dtype=np.int64)


def q_threshold_cascade(sf_dir: str):
    """Bootstrap-percolation / linear-threshold cascade: seeds are the
    vertices with arith %% CASC_MOD == 0; each round an inactive vertex
    activates when >= CASC_THETA of its structural neighbors are active
    (the deterministic-threshold influence-spread model), CASC_ROUNDS
    synchronous rounds. Per round: ONE exact-int64 indicator SpMV
    (active-neighbor counts) + an elementwise threshold OR — all state
    as chunked refs, per-round counts reduced from bounded per-chunk
    scalars. Output (round, n_active) including round 0 (the seeds)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    a = eng.map_chunks(_w91_casc_seed, ar)
    counts = [int(np.sum(eng.chunk_scalars(_w91_count, a)))]
    for _ in range(CASC_ROUNDS):
        y = eng.spmm_refs(a, 1, "plus_times_i64")
        a = eng.map_chunks(_w91_casc_step, a, y)
        counts.append(int(np.sum(eng.chunk_scalars(_w91_count, a))))
    return pa.table({
        "round": pa.array(np.arange(CASC_ROUNDS + 1), type=pa.int64()),
        "n_active": pa.array(counts, type=pa.int64()),
    })


def q_holt_trend(sf_dir: str):
    """Holt's linear (double exponential) smoothing over the dense
    daily event-count axis with DYADIC gains alpha = 1/2, beta = 1/4
    (every level/trend value is an exact binary float on both twins):
    l_0 = x_0, b_0 = x_1 - x_0, then l_t = alpha*x_t +
    (1-alpha)*(l_{t-1}+b_{t-1}), b_t = beta*(l_t-l_{t-1}) +
    (1-beta)*b_{t-1} — the trend-aware forecaster next to the EWMA /
    CUSUM siblings. Day histogram distributed; the two-state recursion
    folds over the bounded day axis. Output (day, cnt, level_u,
    trend_u) in micro-unit fixed point."""
    import ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _days(b: pa.Table) -> pa.Table:
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u), "c": pa.array(c)})

    agg: dict[int, int] = {}
    for r in ev.map_batches(_days, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        agg[r["day"]] = agg.get(r["day"], 0) + r["c"]
    lo, hi = min(agg), max(agg)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.array([agg.get(int(d), 0) for d in days], dtype=np.int64)
    a = HOLT_A_NUM / HOLT_A_DEN
    be = HOLT_B_NUM / HOLT_B_DEN
    lev = np.empty(len(days))
    tr = np.empty(len(days))
    lev[0] = float(x[0])
    tr[0] = float(x[1] - x[0]) if len(x) > 1 else 0.0
    for t in range(1, len(days)):
        lev[t] = a * x[t] + (1.0 - a) * (lev[t - 1] + tr[t - 1])
        tr[t] = be * (lev[t] - lev[t - 1]) + (1.0 - be) * tr[t - 1]
    return pa.table({
        "day": pa.array(days),
        "cnt": pa.array(x),
        "level_u": pa.array(np.floor(lev * 1e6 + 0.5).astype(np.int64)),
        "trend_u": pa.array(np.floor(tr * 1e6 + 0.5).astype(np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 92: BM25 retrieval scoring
# ---------------------------------------------------------------------------

BM25_K = 15  # result cut
BM25_QK = 3  # query = top-QK tokens by document frequency


def q_bm25_topk(sf_dir: str):
    """Top-15 documents by integer-rational BM25 (k1 = 1.2, b = 0.75 as
    exact fractions) against the corpus's own top-3 DF tokens — the
    classic retrieval ranking, float-free end to end (see
    `text.bm25_topk`; reference analog: semiring SpMV of the query
    indicator against the doc-term matrix, `SpParMat.h:67`)."""
    from ..functions import text as T

    return T.bm25_topk(_docs(sf_dir), k=BM25_K, qk=BM25_QK)


# ---------------------------------------------------------------------------
# wave 93: non-backtracking walk trace, diamond count, tailed triangles
# ---------------------------------------------------------------------------

NBT_T = 6  # non-backtracking walk horizon


def _w93_ones(bounds):
    s, e = bounds
    return np.ones((1, e - s), dtype=np.int64)


def _w93_sum(a):
    return np.array([int(a.sum())], dtype=np.int64)


def _w93_nbt2(ay, d):
    # p2 = A p1 - D p0  with p1 = deg, p0 = 1
    return ay[0:1] - d[0:1]


def _w93_nbt_step(ay, d, pprev):
    # pk = A p_{k-1} - (D - I) p_{k-2}   (k >= 3)
    out = ay[0:1] - (d[0:1] - 1) * pprev[0:1]
    if out.size and np.abs(out).max() >= 2 ** 61:
        raise OverflowError(
            "nbt_trace: walk counts hit the int64 tripwire (2^61)")
    return out


def q_nbt_trace(sf_dir: str):
    """Non-backtracking walk totals w_k = sum_v p_k(v) for k = 1..NBT_T,
    where p_k(v) counts length-k walks from v that never immediately
    reverse an edge — the Hashimoto/non-backtracking spectrum's moment
    sequence (the sparse-graph spectral-clustering operator), computed
    WITHOUT materializing the 2m x 2m edge adjacency via the classic
    vertex-space recurrence p_2 = A p_1 - D p_0, p_k = A p_{k-1} -
    (D - I) p_{k-2} over the structural undirected graph. One exact
    int64 SpMV (`plus_times_i64`) + one elementwise combine per k, all
    state chunked refs; per-k totals reduced from bounded per-chunk
    scalars, with a 2^61 overflow tripwire (the reference's promoted
    64-bit semiring discipline). w_1 = 2m, w_2 = sum_v d(d-1). Output
    (k, walks)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ones = eng.map_chunks_n(_w93_ones, 1, with_bounds=True)[0]
    deg = eng.spmm_refs(ones, 1, "plus_times_i64")  # p1 = A·1
    totals = [int(np.sum(eng.chunk_scalars(_w93_sum, deg)))]
    ay = eng.spmm_refs(deg, 1, "plus_times_i64")
    p_prev, p_cur = deg, eng.map_chunks(_w93_nbt2, ay, deg)
    totals.append(int(np.sum(eng.chunk_scalars(_w93_sum, p_cur))))
    for _ in range(NBT_T - 2):
        ay = eng.spmm_refs(p_cur, 1, "plus_times_i64")
        p_prev, p_cur = p_cur, eng.map_chunks(_w93_nbt_step, ay, deg,
                                              p_prev)
        totals.append(int(np.sum(eng.chunk_scalars(_w93_sum, p_cur))))
    return pa.table({
        "k": pa.array(np.arange(1, NBT_T + 1), type=pa.int64()),
        "walks": pa.array(totals, type=pa.int64()),
    })


def _w93_tri_edges(t: pa.Table) -> pa.Table:
    a = np.asarray(t.column("a"), dtype=np.int64)
    m = np.asarray(t.column("m"), dtype=np.int64)
    c = np.asarray(t.column("c"), dtype=np.int64)
    return pa.table({"u": pa.array(np.concatenate([a, a, m])),
                     "v": pa.array(np.concatenate([m, c, c]))})


def _w93_diamond_partial(t: pa.Table) -> pa.Table:
    """One (u, v)-hash partition: run-count the edge multiplicities
    (= per-edge triangle support) and fold C(s, 2) locally — only a
    1-row partial leaves the task."""
    u = np.asarray(t.column("u"), dtype=np.int64)
    v = np.asarray(t.column("v"), dtype=np.int64)
    if len(u) == 0:
        return pa.table({"n_edges": pa.array([0], type=pa.int64()),
                         "n_diamonds": pa.array([0], type=pa.int64()),
                         "max_sup": pa.array([0], type=pa.int64())})
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    new = np.empty(len(us), dtype=bool)
    new[0] = True
    new[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
    starts = np.nonzero(new)[0]
    s = np.diff(np.concatenate((starts, [len(us)]))).astype(np.int64)
    return pa.table({
        "n_edges": pa.array([len(starts)], type=pa.int64()),
        "n_diamonds": pa.array([int((s * (s - 1) // 2).sum())],
                               type=pa.int64()),
        "max_sup": pa.array([int(s.max())], type=pa.int64()),
    })


def q_diamond_count(sf_dir: str):
    """Diamond (K4-minus-an-edge) census: each diamond is a pair of
    triangles sharing its chord edge, so n_diamonds = sum over edges of
    C(support_e, 2) — the motif one prune short of `q_k4_count`'s
    clique, from the SAME triangle enumeration (`_triangles_ids`, the
    masked-SpGEMM two-join plan). Triangles flat-map to their 3 edges,
    one (u, v)-hash shuffle co-locates each edge's support, and only
    1-row partials reach the driver. Output one row: (n_triangles,
    n_sup_edges, n_diamonds, max_support)."""
    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    tri = _triangles_ids(ctx).materialize()
    n_tri = tri.count()
    te = tri.map_batches(_w93_tri_edges, batch_format="pyarrow")
    parts = group_apply_tasks(te, ["u", "v"],
                              _w93_diamond_partial).to_pandas()
    return pa.table({
        "n_triangles": pa.array([int(n_tri)], type=pa.int64()),
        "n_sup_edges": pa.array([int(parts.n_edges.sum())],
                                type=pa.int64()),
        "n_diamonds": pa.array([int(parts.n_diamonds.sum())],
                               type=pa.int64()),
        "max_support": pa.array([int(parts.max_sup.max())
                                 if len(parts) else 0], type=pa.int64()),
    })


def _w93_tri_verts(t: pa.Table) -> pa.Table:
    a = np.asarray(t.column("a"), dtype=np.int64)
    m = np.asarray(t.column("m"), dtype=np.int64)
    c = np.asarray(t.column("c"), dtype=np.int64)
    return pa.table({"v": pa.array(np.concatenate([a, m, c]))})


def _w93_vpartial(t: pa.Table) -> pa.Table:
    """Per-batch combiner: (v, c) partial counts — pre-aggregates before
    the v-hash shuffle so only distinct-vertex partials ship."""
    v = np.asarray(t.column("v"), dtype=np.int64)
    uk, inv = np.unique(v, return_inverse=True)
    return pa.table({"v": pa.array(uk),
                     "c": pa.array(np.bincount(
                         inv, minlength=len(uk)).astype(np.int64))})


def _w93_vmerge(name: str):
    """Partition kernel: sum the per-batch partials per vertex, output
    column named `name`."""

    def _f(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("v"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(v, return_inverse=True)
        return pa.table({"v": pa.array(uk),
                         name: pa.array(ibincount(inv, c,
                                                  minlength=len(uk)))})

    return _f


def _w93_tail_post(j: pa.Table) -> pa.Table:
    tv = np.asarray(j.column("t"), dtype=np.int64)
    dv = np.asarray(j.column("d"), dtype=np.int64)
    return pa.table({"n_tailed": pa.array([int((tv * (dv - 2)).sum())],
                                          type=pa.int64())})


def q_tailed_triangles(sf_dir: str):
    """Tailed-triangle (paw) census: n_tailed = sum_v t_v * (d_v - 2)
    where t_v = triangles through v — every (triangle, pendant edge at
    a corner) pair counted once; with `q_diamond_count` and
    `q_k4_count` this completes the connected 4-vertex motif spectrum
    the graphlet-kernel literature builds on. Per-vertex triangle
    counts from `_triangles_ids` (v-hash shuffle), structural degrees
    from the symmetric edge set (same shuffle key), one co-partitioned
    join with the sum fused into the join task — 1-row partials only.
    Output one row: (n_triangles, n_tailed)."""
    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    ctx = get_context(sf_dir)
    tri = _triangles_ids(ctx).materialize()
    n_tri = tri.count()
    tcnt = group_apply_tasks(
        tri.map_batches(_w93_tri_verts, batch_format="pyarrow")
           .map_batches(_w93_vpartial, batch_format="pyarrow"),
        ["v"], _w93_vmerge("t"))
    be = ctx.graph("sym").dedup_sum().cast_bool().edges
    degs = group_apply_tasks(
        be.map_batches(
            lambda t: pa.table({"v": t.column("src")}),
            batch_format="pyarrow")
          .map_batches(_w93_vpartial, batch_format="pyarrow"),
        ["v"], _w93_vmerge("d"))
    parts = hash_join_tasks(tcnt, degs, on="v",
                            post=_w93_tail_post).to_pandas()
    return pa.table({
        "n_triangles": pa.array([int(n_tri)], type=pa.int64()),
        "n_tailed": pa.array([int(parts.n_tailed.sum())],
                             type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 94: trend statistics on the daily event series
# (Mann-Kendall S, exact-fraction Theil-Sen slope, runs test)
# ---------------------------------------------------------------------------

TSEN_SCALE_DEN = 1  # slope kept as an exact reduced fraction, no scaling


def _w94_daily_axis(sf_dir: str):
    """Dense (days, counts) axis of the event stream: per-batch bincount
    partials (bounded rows to the driver), zero-filled min..max epoch-day
    — the shared distributed step of the daily trend statistics."""
    import ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def _days(b: pa.Table) -> pa.Table:
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(u), "c": pa.array(c)})

    agg: dict[int, int] = {}
    for r in ev.map_batches(_days, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        agg[r["day"]] = agg.get(r["day"], 0) + r["c"]
    lo, hi = min(agg), max(agg)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.array([agg.get(int(d), 0) for d in days], dtype=np.int64)
    return days, x


def q_mann_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test over the daily event counts:
    S = sum_{i<j} sign(x_j - x_i) plus the tie-corrected variance
    NUMERATOR var18 = n(n-1)(2n+5) - sum_ties t(t-1)(2t+5) (= 18*Var(S),
    kept integer so the twin hash is float-free) — the standard
    nonparametric trend gate a monitoring pipeline runs before alerting
    on a drift. Day histogram distributed; the O(T^2) pair fold runs on
    the bounded day axis. Output one row: (n_days, s_stat, var18)."""
    days, x = _w94_daily_axis(sf_dir)
    diff_sign = np.sign(x[None, :] - x[:, None])
    s = int(np.triu(diff_sign, 1).sum())
    n = len(x)
    _, tc = np.unique(x, return_counts=True)
    ties = int((tc * (tc - 1) * (2 * tc + 5)).sum())
    var18 = n * (n - 1) * (2 * n + 5) - ties
    return pa.table({
        "n_days": pa.array([n], type=pa.int64()),
        "s_stat": pa.array([s], type=pa.int64()),
        "var18": pa.array([var18], type=pa.int64()),
    })


def q_theil_sen(sf_dir: str):
    """Theil-Sen slope of the daily event counts: the MEDIAN of the
    C(T,2) pairwise slopes (x_j - x_i)/(j - i), kept as an EXACT reduced
    fraction (slope_num, slope_den) — the robust trend estimator
    (29%-breakdown) next to the least-squares `regr_stats`, float-free
    on both twins (even-count medians average the two middle fractions
    exactly). Output one row: (n_pairs, slope_num, slope_den)."""
    from fractions import Fraction
    from math import gcd

    days, x = _w94_daily_axis(sf_dir)
    t = len(x)
    slopes = [Fraction(int(x[j] - x[i]), j - i)
              for i in range(t) for j in range(i + 1, t)]
    slopes.sort()
    np_ = len(slopes)
    m1, m2 = slopes[(np_ - 1) // 2], slopes[np_ // 2]
    med = (m1 + m2) / 2
    num, den = med.numerator, med.denominator
    g = gcd(num, den) or 1
    return pa.table({
        "n_pairs": pa.array([np_], type=pa.int64()),
        "slope_num": pa.array([num // g], type=pa.int64()),
        "slope_den": pa.array([den // g], type=pa.int64()),
    })


def q_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test sufficient statistics over the daily
    event counts: dichotomize against the discrete median (days equal
    to the median are dropped, the classic convention), then count the
    maximal same-sign runs — randomness-of-sequence evidence for the
    day axis. Output one row: (n_plus, n_minus, n_runs, median_cnt)."""
    days, x = _w94_daily_axis(sf_dir)
    med = int(np.sort(x)[(len(x) - 1) // 2])  # quantile_disc 0.5
    keep = x != med
    sign = x[keep] > med
    n_plus = int(sign.sum())
    n_minus = int((~sign).sum())
    n_runs = int(1 + (sign[1:] != sign[:-1]).sum()) if len(sign) else 0
    return pa.table({
        "n_plus": pa.array([n_plus], type=pa.int64()),
        "n_minus": pa.array([n_minus], type=pa.int64()),
        "n_runs": pa.array([n_runs], type=pa.int64()),
        "median_cnt": pa.array([med], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 95: winnowing fingerprints, Misra-Gries heavy hitters,
# daily cross-correlation between event types
# ---------------------------------------------------------------------------

XCORR_L = 3  # max lag (days)


def q_winnow_stats(sf_dir: str):
    """Per-document winnowing (MOSS) fingerprint census: distinct
    window-min k-gram hashes per doc with an XOR identity — the
    plagiarism/near-dup fingerprint selection step (see
    `text.winnow_stats`; guarantees shared >= w+k-1-token substrings
    share a fingerprint). Pure per-batch map, no shuffle."""
    from ..functions import text as T

    return _docs(sf_dir).map_batches(T.winnow_stats,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


def q_heavy_hitters(sf_dir: str):
    """Exact corpus tokens with count > m/HH_K via the Misra-Gries
    mergeable-summary prefilter + broadcast exact recount (see
    `text.heavy_hitters`) — the scalable frequent-items plan: bounded
    <= k-row summaries per batch, never a full-vocabulary shuffle."""
    from ..functions import text as T

    return T.heavy_hitters(_docs(sf_dir))


def q_daily_xcorr(sf_dir: str):
    """Cross-correlation raw co-moments between the daily count series
    of the two busiest event types (ties by type asc): for each lag
    l = 0..XCORR_L, sxy = sum_t x_t * y_{t+l} and syx = sum_t y_t *
    x_{t+l} over the shared dense day axis — the lead/lag coupling
    evidence between event streams, integer-exact. Distributed step:
    per-batch (event_type, day) bincount partials; the lag fold runs on
    the bounded axis. Output (lag, n_terms, sxy, syx, tx, ty)."""
    import ray

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def _days(b: pa.Table) -> pa.Table:
        day = (np.asarray(b.column("ts")).astype("datetime64[us]")
               .astype(np.int64) // 86_400_000_000)
        et = np.asarray(b.column("event_type")).astype(str)
        ue, einv = np.unique(et, return_inverse=True)
        key = einv.astype(np.int64) * (1 << 32) + day  # epoch day < 2^32
        uk, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({
            "et": pa.array(ue[uk >> 32], type=pa.string()),
            "day": pa.array(uk & ((1 << 32) - 1)),
            "c": pa.array(c),
        })

    agg: dict[tuple, int] = {}
    for r in ev.map_batches(_days, batch_format="pyarrow",
                            zero_copy_batch=True).take_all():
        key = (r["et"], r["day"])
        agg[key] = agg.get(key, 0) + r["c"]
    totals: dict[str, int] = {}
    for (et, _d), c in agg.items():
        totals[et] = totals.get(et, 0) + c
    tx, ty = sorted(totals, key=lambda t: (-totals[t], t))[:2]
    lo = min(d for _e, d in agg)
    hi = max(d for _e, d in agg)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.array([agg.get((tx, int(d)), 0) for d in days], dtype=np.int64)
    y = np.array([agg.get((ty, int(d)), 0) for d in days], dtype=np.int64)
    lags = np.arange(XCORR_L + 1, dtype=np.int64)
    t = len(days)
    sxy = [int((x[: t - l] * y[l:]).sum()) for l in lags]
    syx = [int((y[: t - l] * x[l:]).sum()) for l in lags]
    return pa.table({
        "lag": pa.array(lags),
        "n_terms": pa.array(t - lags),
        "sxy": pa.array(np.array(sxy, dtype=np.int64)),
        "syx": pa.array(np.array(syx, dtype=np.int64)),
        "tx": pa.array([tx] * len(lags), type=pa.string()),
        "ty": pa.array([ty] * len(lags), type=pa.string()),
    })


# ---------------------------------------------------------------------------
# wave 96: SymSpell-2 fuzzy pairs, day-of-week seasonality,
# hub-removal robustness curve
# ---------------------------------------------------------------------------

ATK_H = 4       # hubs removed, one at a time
ATK_ITERS = 12  # synchronous min-label rounds (matches CC_ITERS)


def q_lev2_pairs(sf_dir: str):
    """All vocabulary pairs at levenshtein distance EXACTLY 2 over the
    documents + part-name vocabulary — depth-2 SymSpell blocking with
    an exact vectorized-DP verify (see `dedup.lev2_pairs`); the fuzzy
    sibling one edit wider than `q_edit1_pairs`."""
    import ray

    from ..functions.dedup import lev2_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                  columns=["p_name"])
    return lev2_pairs(
        docs.map_batches(_tok_vocab_fn("text"), batch_format="pyarrow",
                         zero_copy_batch=True),
        parts.map_batches(_tok_vocab_fn("p_name"),
                          batch_format="pyarrow", zero_copy_batch=True),
    )


def q_dow_seasonal(sf_dir: str):
    """Day-of-week seasonal profile of the daily event counts over the
    dense zero-filled axis (dow = (epoch_day + 4) % 7, Thursday-anchored
    pure integer arithmetic): per-dow sufficient statistics for the
    seasonal-decomposition step a volume forecaster subtracts before
    trend fitting. Output (dow, n_days, sum_cnt, min_cnt, max_cnt)."""
    days, x = _w94_daily_axis(sf_dir)
    dow = ((days + 4) % 7).astype(np.int64)
    uk = np.unique(dow)
    return pa.table({
        "dow": pa.array(uk),
        "n_days": pa.array(np.array(
            [int((dow == d).sum()) for d in uk], dtype=np.int64)),
        "sum_cnt": pa.array(np.array(
            [int(x[dow == d].sum()) for d in uk], dtype=np.int64)),
        "min_cnt": pa.array(np.array(
            [int(x[dow == d].min()) for d in uk], dtype=np.int64)),
        "max_cnt": pa.array(np.array(
            [int(x[dow == d].max()) for d in uk], dtype=np.int64)),
    })


def _atk_mask(bounds, rm):
    s, e = bounds
    m = np.zeros((1, e - s), dtype=np.float64)
    inr = rm[(rm >= s) & (rm < e)]
    m[0, inr - s] = 1.0
    return m


def _atk_seed(bounds):
    s, e = bounds
    return np.arange(s, e, dtype=np.float64)[None, :]


def _atk_x(l, m):
    return np.where(m[0:1] > 0, np.inf, l[0:1])


def _atk_upd(l, y, m):
    return np.where(m[0:1] > 0, np.inf, np.minimum(l[0:1], y[0:1]))


def _atk_census(l, m):
    keep = (m[0] == 0) & np.isfinite(l[0])
    uk, c = np.unique(l[0][keep].astype(np.int64), return_counts=True)
    return (uk, c.astype(np.int64))


def q_attack_curve(sf_dir: str):
    """Targeted-attack robustness curve: remove the top-ATK_H hubs
    (structural degree DESC, arith ASC) ONE at a time and report, after
    exactly ATK_ITERS synchronous min-label rounds on the surviving
    induced subgraph, the component census — n_components and the
    largest-component size (the percolation evidence behind "scale-free
    graphs are fragile to hub removal"). No engine rebuild per step:
    removal is an elementwise mask fused around the same resident-CSR
    min-label SpMV (removed vertices propagate +inf and ignore
    updates), labels stay chunked refs; the census merges bounded
    per-chunk (label, count) partials. Output (n_removed, n_kept,
    n_components, lcc_size)."""
    import ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    hubs = alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), ATK_H)
    rows = []
    for j in range(ATK_H + 1):
        rm = np.asarray(hubs[:j], dtype=np.int64)
        mask = eng.map_chunks_n(partial(_atk_mask, rm=rm), 1,
                                with_bounds=True)[0]
        lab = eng.map_chunks_n(_atk_seed, 1, with_bounds=True)[0]
        for _ in range(ATK_ITERS):
            x = eng.map_chunks(_atk_x, lab, mask)
            y = eng.spmm_refs(x, 1, "select2nd_min")
            lab = eng.map_chunks(_atk_upd, lab, y, mask)
        agg: dict[int, int] = {}
        for uk, c in eng.chunk_scalars(_atk_census, lab, mask):
            for kk, cc in zip(uk, c):
                agg[int(kk)] = agg.get(int(kk), 0) + int(cc)
        rows.append((j, ctx.n - j, len(agg),
                     max(agg.values()) if agg else 0))
    return pa.table({
        "n_removed": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_kept": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_components": pa.array([r[2] for r in rows], type=pa.int64()),
        "lcc_size": pa.array([r[3] for r in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 97: BPE tokenizer training + vocabulary coverage
# ---------------------------------------------------------------------------

VOCAB_COV_JS = (1, 2, 4, 8, 16, 32)


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer-training trace: the first BPE_ROUNDS merges over
    the whitespace-symbol corpus — per round the chosen pair (count
    DESC, pair ASC), its adjacent-position count, and the corpus symbol
    total after the merge (see `text.bpe_train`; the tokenizer-training
    step of an LLM data pipeline). Output (round, sym_a, sym_b,
    pair_count, syms_after)."""
    from ..functions import text as T

    merges, _ds = T.bpe_train(_docs(sf_dir))
    return merges


def q_bpe_doc_stats(sf_dir: str):
    """Per-document symbol counts before/after the BPE_ROUNDS trained
    merges — verifies the greedy left-to-right merge APPLICATION
    document by document (see `text.bpe_train`). Output (doc_id,
    n_before, n_after)."""
    from ..functions import text as T

    docs = _docs(sf_dir)
    before = docs.map_batches(T.token_stats, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    _merges, after_ds = T.bpe_train(docs)
    after = after_ds.map_batches(T.token_stats, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    bm = dict(zip(before.doc_id, before.n_tokens))
    return pa.table({
        "doc_id": pa.array(after.doc_id.to_numpy(), type=pa.int64()),
        "n_before": pa.array(np.array(
            [bm[d] for d in after.doc_id], dtype=np.int64)),
        "n_after": pa.array(after.n_tokens.to_numpy().astype(np.int64)),
    })


def q_vocab_coverage(sf_dir: str):
    """Zipf coverage curve of the token vocabulary: for each budget j in
    VOCAB_COV_JS, the number of corpus token occurrences covered by the
    top-j tokens (count DESC, token ASC) plus the corpus total — the
    "how big must the vocab be" sufficient statistics of tokenizer
    design. Per-batch count partials only; the rank fold is over the
    bounded vocabulary. Output (j, covered, total)."""
    from ..core.shuffle import group_apply_tasks
    from ..functions import text as T

    tf = _docs(sf_dir).map_batches(T._tf_local, batch_format="pyarrow",
                                   zero_copy_batch=True)

    def _vmerge(t: pa.Table) -> pa.Table:
        tok = np.asarray(t.column("tok")).astype(str)
        c = np.asarray(t.column("tf"), dtype=np.int64)
        uk, inv = np.unique(tok, return_inverse=True)
        return pa.table({"tok": pa.array(uk, type=pa.string()),
                         "c": pa.array(ibincount(inv, c,
                                                 minlength=len(uk)))})

    vc = group_apply_tasks(tf, ["tok"], _vmerge).to_pandas()
    tok = vc.tok.to_numpy().astype(str)
    c = vc.c.to_numpy().astype(np.int64)
    order = np.lexsort((tok, -c))
    cs = np.cumsum(c[order])
    total = int(c.sum())
    js = np.array(VOCAB_COV_JS, dtype=np.int64)
    cov = [int(cs[min(j, len(cs)) - 1]) if len(cs) else 0 for j in js]
    return pa.table({
        "j": pa.array(js),
        "covered": pa.array(np.array(cov, dtype=np.int64)),
        "total": pa.array(np.full(len(js), total, dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 98: shuffle-route balance audit, table profiling, 2-hop ball
# similarity of hubs
# ---------------------------------------------------------------------------

ROUTE_G = 32  # audited fan-out
PROFILE_TABLES = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
}


def q_route_balance(sf_dir: str):
    """Partition-balance audit of the engine's OWN shuffle router: the
    exact per-bucket row counts `_gen_route` produces for lineitem
    keyed on l_orderkey at fan-out ROUTE_G — runs the real
    `_col_hash`/`_mix64` double-splitmix64 path per batch (bincount
    partials only), and the DuckDB twin re-implements splitmix64
    bit-exactly (split 32-bit multiplies mod 2^64). The evidence that
    hash routing balances the wide steps. Output (bucket, rows)."""
    import ray

    from ..core.shuffle import _col_hash, _mix64

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])

    def _part(b: pa.Table) -> pa.Table:
        acc = np.zeros(b.num_rows, dtype=np.uint64)
        acc = _mix64(acc * np.uint64(11400714819323198485)
                     + _col_hash(b.column("l_orderkey"), b.num_rows))
        p = (acc >> np.uint64(33)).astype(np.int64) % ROUTE_G
        return pa.table({
            "bucket": pa.array(np.arange(ROUTE_G, dtype=np.int64)),
            "rows": pa.array(np.bincount(
                p, minlength=ROUTE_G).astype(np.int64)),
        })

    parts = ds.map_batches(_part, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    agg = parts.groupby("bucket", sort=True).rows.sum()
    return pa.table({
        "bucket": pa.array(agg.index.to_numpy().astype(np.int64)),
        "rows": pa.array(agg.to_numpy().astype(np.int64)),
    })


def q_table_profile(sf_dir: str):
    """Data-profiling census over the orders and customer tables: per
    column, row count, null count, and EXACT distinct count (per-batch
    unique partials, value-hash shuffle, per-partition distinct counts
    summed — never a full-column driver gather). The schema-drift /
    quality gate a pipeline runs before trusting an input drop. Output
    (tbl, col, n_rows, n_nulls, n_distinct)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    rows = []
    for tbl, cols in PROFILE_TABLES.items():
        ds = ray.data.read_parquet(f"{sf_dir}/{tbl}.parquet",
                                   columns=cols)
        n_rows = int(ds.count())
        for c in cols:
            def _uniq(b: pa.Table, *, _c=c) -> pa.Table:
                u = pc.unique(pc.drop_null(b.column(_c)))
                return pa.table({"v": u.cast(pa.string())})

            def _nulls(b: pa.Table, *, _c=c) -> pa.Table:
                return pa.table({"nn": pa.array(
                    [b.column(_c).null_count], type=pa.int64())})

            n_nulls = int(sum(
                r["nn"] for r in ds.map_batches(
                    _nulls, batch_format="pyarrow",
                    zero_copy_batch=True).take_all()))

            def _dcount(t: pa.Table) -> pa.Table:
                v = np.asarray(t.column("v")).astype(str)
                return pa.table({"d": pa.array(
                    [len(np.unique(v))], type=pa.int64())})

            nd = int(group_apply_tasks(
                ds.map_batches(_uniq, batch_format="pyarrow",
                               zero_copy_batch=True), ["v"],
                _dcount).to_pandas().d.sum())
            rows.append((tbl, c, n_rows, n_nulls, nd))
    return pa.table({
        "tbl": pa.array([r[0] for r in rows], type=pa.string()),
        "col": pa.array([r[1] for r in rows], type=pa.string()),
        "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
        "n_nulls": pa.array([r[3] for r in rows], type=pa.int64()),
        "n_distinct": pa.array([r[4] for r in rows], type=pa.int64()),
    })


def _b2_seed(bounds, seeds):
    s, e = bounds
    x = np.zeros((len(seeds), e - s), dtype=np.int64)
    for r, v in enumerate(seeds):
        if s <= v < e:
            x[r, v - s] = 1
    return x


def _b2_or(b, y):
    return ((b > 0) | (y > 0)).astype(np.int64)


def _b2_stats(b):
    sizes = b.sum(axis=1).astype(np.int64)
    inter = np.array([
        int(((b[0] > 0) & (b[1] > 0)).sum()),
        int(((b[0] > 0) & (b[2] > 0)).sum()),
        int(((b[1] > 0) & (b[2] > 0)).sum()),
    ], dtype=np.int64)
    return (sizes, inter)


def q_ball2_jaccard(sf_dir: str):
    """Jaccard sufficient statistics between the distance-<=2 BALLS of
    the top-3 hubs (degree DESC, arith ASC): ball sizes and pairwise
    intersections — neighborhood-similarity evidence one hop wider than
    `nbr_jaccard`, computed as TWO batched bool SpMM rounds from a
    (3, n) indicator (state chunked; one bounded stats sync). Output
    (la, lb, na, nb, inter) per hub pair, label identities."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    hubs = alg.top_by_degree(
        eng, ctx.vdict.arith_slice_refs(eng.bounds), 3)
    b = eng.map_chunks_n(partial(_b2_seed, seeds=list(hubs)), 1,
                         with_bounds=True)[0]
    for _ in range(2):
        y = eng.spmm_refs(b, 3, "plus_times_i64")
        b = eng.map_chunks(_b2_or, b, y)
    sizes = np.zeros(3, dtype=np.int64)
    inter = np.zeros(3, dtype=np.int64)
    for sz, it in eng.chunk_scalars(_b2_stats, b):
        sizes += sz
        inter += it
    labs = ctx.gather_labels(np.asarray(hubs, dtype=np.int64))
    pairs = [(0, 1, 0), (0, 2, 1), (1, 2, 2)]
    return pa.table({
        "la": pa.array([labs[a] for a, _b2, _i in pairs],
                       type=pa.string()),
        "lb": pa.array([labs[b2] for _a, b2, _i in pairs],
                       type=pa.string()),
        "na": pa.array([int(sizes[a]) for a, _b2, _i in pairs],
                       type=pa.int64()),
        "nb": pa.array([int(sizes[b2]) for _a, b2, _i in pairs],
                       type=pa.int64()),
        "inter": pa.array([int(inter[i]) for _a, _b2, i in pairs],
                          type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 99: degree Kendall tau-b, per-segment Gini, deseasonalized
# anomaly ranking
# ---------------------------------------------------------------------------

DESEASON_K = 5  # top deviation days reported


def _w99_joint(ind, outd):
    i = ind.astype(np.int64).ravel()
    o = outd.astype(np.int64).ravel()
    key = i * (1 << 32) + o
    uk, c = np.unique(key, return_counts=True)
    return (uk >> 32, uk & ((1 << 32) - 1), c.astype(np.int64))


def q_deg_kendall(sf_dir: str):
    """Kendall tau-b sufficient statistics between the structural
    in-degree and out-degree of every vertex: concordant / discordant
    pair counts plus the three tie classes (x-only, y-only, both) —
    the rank-correlation evidence for "do sources attract?" kept
    integer-exact. The O(n^2) pair fold collapses to O(cells^2) over
    the JOINT degree histogram (cells from per-chunk engine partials;
    nc + nd + tx + ty + txy == C(n,2) by construction). Output one row
    (n, nc, nd, tx_pairs, ty_pairs, txy_pairs)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("dir_bool")
    agg: dict[tuple, int] = {}
    for iv, ov, cv in eng.chunk_scalars(_w99_joint,
                                        eng.in_weights_refs(),
                                        eng.out_weights_refs()):
        for a, b, c in zip(iv, ov, cv):
            agg[(int(a), int(b))] = agg.get((int(a), int(b)), 0) + int(c)
    cells = np.array([(a, b, c) for (a, b), c in agg.items()],
                     dtype=np.int64)
    x, y, c = cells[:, 0], cells[:, 1], cells[:, 2]
    nc = nd = 0
    for i in range(len(cells)):
        gt = (x > x[i]) & (y > y[i])
        lt = (x > x[i]) & (y < y[i])
        nc += int(c[i]) * int(c[gt].sum())
        nd += int(c[i]) * int(c[lt].sum())
    txy = int((c * (c - 1) // 2).sum())
    xs = {}
    ys = {}
    for (a, b), cc in agg.items():
        xs[a] = xs.get(a, 0) + cc
        ys[b] = ys.get(b, 0) + cc
    tx = sum(v * (v - 1) // 2 for v in xs.values()) - txy
    ty = sum(v * (v - 1) // 2 for v in ys.values()) - txy
    n = int(c.sum())
    assert nc + nd + tx + ty + txy == n * (n - 1) // 2
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "nc": pa.array([nc], type=pa.int64()),
        "nd": pa.array([nd], type=pa.int64()),
        "tx_pairs": pa.array([tx], type=pa.int64()),
        "ty_pairs": pa.array([ty], type=pa.int64()),
        "txy_pairs": pa.array([txy], type=pa.int64()),
    })


def _w99_gini_kernel(t: pa.Table) -> pa.Table:
    """One segment-hash partition: per segment, the sorted-rank Gini
    numerator sum_i i * v_(i) (1-based, cents; ties by value then
    customer key) plus n and total — the exact-integer sufficient
    statistics of the Lorenz curve."""
    empty = pa.table({"seg": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64()),
                      "sum_cents": pa.array([], type=pa.int64()),
                      "rank_num": pa.array([], type=pa.int64())})
    if t.num_rows == 0:
        return empty
    seg = np.asarray(t.column("seg")).astype(str)
    v = np.asarray(t.column("cents"), dtype=np.int64)
    k = np.asarray(t.column("key"), dtype=np.int64)
    segs, ns, sums, rnums = [], [], [], []
    for s in np.unique(seg):
        m = seg == s
        vv, kk = v[m], k[m]
        order = np.lexsort((kk, vv))
        sv = vv[order]
        ranks = np.arange(1, len(sv) + 1, dtype=np.int64)
        segs.append(s)
        ns.append(len(sv))
        sums.append(int(sv.sum()))
        rnums.append(int((ranks * sv).sum()))
    return pa.table({
        "seg": pa.array(segs, type=pa.string()),
        "n": pa.array(np.array(ns, dtype=np.int64)),
        "sum_cents": pa.array(np.array(sums, dtype=np.int64)),
        "rank_num": pa.array(np.array(rnums, dtype=np.int64)),
    })


def q_segment_gini(sf_dir: str):
    """Per-market-segment Gini sufficient statistics over customer
    account balances: n, total cents, and the Lorenz rank numerator
    sum_i i * v_(i) (values sorted asc, ties by customer key) — Gini =
    (2*rank_num)/(n*total) - (n+1)/n recovered exactly from integers.
    One segment-hash shuffle; the per-segment sort is partition-local
    (a segment's rows co-locate). Output (seg, n, sum_cents,
    rank_num)."""
    import ray

    from ..core.shuffle import group_apply_tasks

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def _prep(b: pa.Table) -> pa.Table:
        bal = np.asarray(b.column("c_acctbal"), dtype=np.float64)
        return pa.table({
            "seg": b.column("c_mktsegment"),
            "key": b.column("c_custkey"),
            "cents": pa.array(np.floor(bal * 100 + 0.5).astype(np.int64)),
        })

    return group_apply_tasks(
        cust.map_batches(_prep, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["seg"], _w99_gini_kernel)


def q_deseason_top(sf_dir: str):
    """Top-DESEASON_K deseasonalized anomaly days: deviation numerator
    dev = cnt * n_days(dow) - sum_cnt(dow) (the day's count against its
    own day-of-week mean, kept integer by multiplying through the dow
    count), ranked by |dev| DESC then day ASC — the seasonal-adjusted
    burst detector composed from the `dow_seasonal` statistics. Output
    (day, cnt, dev_num, dow_days)."""
    days, x = _w94_daily_axis(sf_dir)
    dow = ((days + 4) % 7).astype(np.int64)
    nd = {int(d): int((dow == d).sum()) for d in np.unique(dow)}
    sd = {int(d): int(x[dow == d].sum()) for d in np.unique(dow)}
    ndv = np.array([nd[int(d)] for d in dow], dtype=np.int64)
    sdv = np.array([sd[int(d)] for d in dow], dtype=np.int64)
    dev = x * ndv - sdv
    order = np.lexsort((days, -np.abs(dev)))[:DESEASON_K]
    return pa.table({
        "day": pa.array(days[order]),
        "cnt": pa.array(x[order]),
        "dev_num": pa.array(dev[order]),
        "dow_days": pa.array(ndv[order]),
    })


# ---------------------------------------------------------------------------
# wave 100: analytics ON the north-rule outputs — PageRank vs degree
# rank distance, PageRank mass per component, PageRank Lorenz deciles
# ---------------------------------------------------------------------------


def _pr_score_u(ctx):
    """round6(score * n) * 1e6 as exact int64 — the integerized
    PageRank scores shared by the wave-100 compositions (identical to
    the driver-verified `pagerank` column up to the fixed 1e6 scale)."""
    from ..pipelines.pagerank import pagerank as _pr

    eng = ctx.engine("directed")
    r, _ = _pr(eng, iters=PR_ITERS)
    return np.round(np.round(r * ctx.n, 6) * 1_000_000).astype(np.int64)


def q_pr_deg_footrule(sf_dir: str):
    """Spearman footrule and d^2 between the PageRank ranking and the
    structural in-degree ranking (both DESC, ties by label ASC) — "how
    far does link analysis move you past raw citation count", kept
    integer-exact over the driver-verified rounded scores. Rank folds
    are O(n log n) on the result vector (at 10^9 vertices the same
    ranks come from the engine's distributed sort-rank used by
    `randperm_sorted`). Output one row (n, footrule, d2_sum)."""
    ctx = get_context(sf_dir)
    su = _pr_score_u(ctx)
    eng = ctx.engine("dir_bool")
    import ray

    ind = np.concatenate(ray.get(eng.in_weights_refs())).astype(np.int64)
    # label rank == dense id; ties by label ASC == by dense id ASC
    n = ctx.n
    ids = np.arange(n)
    r_pr = np.empty(n, dtype=np.int64)
    r_pr[np.lexsort((ids, -su))] = np.arange(1, n + 1)
    r_dg = np.empty(n, dtype=np.int64)
    r_dg[np.lexsort((ids, -ind))] = np.arange(1, n + 1)
    d = r_pr - r_dg
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "footrule": pa.array([int(np.abs(d).sum())], type=pa.int64()),
        "d2_sum": pa.array([int((d * d).sum())], type=pa.int64()),
    })


def q_pr_mass_by_comp(sf_dir: str):
    """PageRank mass per connected component: the two north-rule apps
    composed — component labels from CC_ITERS min-label rounds, mass =
    exact int64 sum of the integerized scores per component (where does
    the stationary mass live, fragment by fragment). Output
    (comp, n_vertices, mass_u)."""
    ctx = get_context(sf_dir)
    su = _pr_score_u(ctx)
    comp = alg.cc_fixed(ctx.engine("sym"), CC_ITERS)
    uk, inv = np.unique(comp, return_inverse=True)
    cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    mass = ibincount(inv, su, minlength=len(uk))
    return pa.table({
        "comp": _label_col(ctx, uk.astype(np.int64)),
        "n_vertices": pa.array(cnt),
        "mass_u": pa.array(mass),
    })


def q_pr_lorenz(sf_dir: str):
    """Lorenz concentration of PageRank mass: vertices sorted by
    integerized score ASC (ties by label ASC) into 10 rank deciles,
    per-decile count and exact mass — the inequality profile of link
    authority (the graph sibling of the spend Lorenz census). Output
    (decile, n, mass_u)."""
    ctx = get_context(sf_dir)
    su = _pr_score_u(ctx)
    n = ctx.n
    order = np.lexsort((np.arange(n), su))
    dec = (10 * np.arange(n, dtype=np.int64)) // n
    uk = np.unique(dec)
    mass_sorted = su[order]
    return pa.table({
        "decile": pa.array(uk),
        "n": pa.array(np.bincount(dec, minlength=10)[uk].astype(
            np.int64)),
        "mass_u": pa.array(np.array(
            [int(mass_sorted[dec == d2].sum()) for d2 in uk],
            dtype=np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 101: R-MAT generator audits (the Graph500 source gets a
# driver-gated oracle face)
# ---------------------------------------------------------------------------

RMAT_AUDIT_SCALE = 10
RMAT_AUDIT_EF = 8
RMAT_AUDIT_SEED = 1


def _rmat_ds():
    from ..sources.rmat import rmat_dataset

    return rmat_dataset(RMAT_AUDIT_SCALE, RMAT_AUDIT_EF,
                        seed=RMAT_AUDIT_SEED)


def q_rmat_census(sf_dir: str):
    """Structural census of the deterministic R-MAT generator output
    (scale 10, edgefactor 8, seed 1): raw edges, self-loops, distinct
    loopless pairs, touched vertices — the counter-hash generator
    (`sources/rmat.py`, `DistEdgeList.cpp:222`/`RefGen21.h` analog)
    audited against a BIT-EXACT splitmix64 SQL twin. Output one row
    (n_edges, n_loops, n_distinct, n_touched)."""
    from ..core.shuffle import group_apply_tasks

    ds = _rmat_ds().materialize()

    def _scal(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("src"), dtype=np.int64)
        v = np.asarray(b.column("dst"), dtype=np.int64)
        return pa.table({"ne": pa.array([len(u)], type=pa.int64()),
                         "nl": pa.array([int((u == v).sum())],
                                        type=pa.int64())})

    tot = ds.map_batches(_scal, batch_format="pyarrow").to_pandas()
    n_edges, n_loops = int(tot["ne"].sum()), int(tot["nl"].sum())

    def _keys(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("src"), dtype=np.int64)
        v = np.asarray(b.column("dst"), dtype=np.int64)
        keep = u != v
        return pa.table({"k": pa.array(np.unique(
            u[keep] * (1 << 32) + v[keep]))})

    def _dcount(t: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(t.column("k"), dtype=np.int64))
        verts = np.unique(np.concatenate((k >> 32,
                                          k & ((1 << 32) - 1))))
        dcol = np.zeros(len(verts), dtype=np.int64)
        if len(dcol):
            dcol[0] = len(k)
        return pa.table({"d": pa.array(dcol),
                         "vmin": pa.array(verts, type=pa.int64())})

    dp = group_apply_tasks(
        ds.map_batches(_keys, batch_format="pyarrow"), ["k"],
        _dcount).to_pandas()
    n_distinct = int(dp.d.sum())
    # touched vertices: union across partitions (vertex ids bounded by
    # 2^scale, the per-partition vertex lists are small)
    n_touched = len(np.unique(dp.vmin.to_numpy()))
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_loops": pa.array([n_loops], type=pa.int64()),
        "n_distinct": pa.array([n_distinct], type=pa.int64()),
        "n_touched": pa.array([n_touched], type=pa.int64()),
    })


def q_rmat_deg_hist(sf_dir: str):
    """Out-degree histogram of the R-MAT output over distinct loopless
    pairs — the power-law signature of the Graph500 generator, oracle
    bit-exact. Output (outdeg, n_vertices)."""
    from ..core.shuffle import group_apply_tasks

    ds = _rmat_ds()

    def _pairs(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("src"), dtype=np.int64)
        v = np.asarray(b.column("dst"), dtype=np.int64)
        keep = u != v
        k = np.unique(u[keep] * (1 << 32) + v[keep])
        return pa.table({"src": pa.array(k >> 32), "k": pa.array(k)})

    # distinct pairs co-partitioned by SRC so per-partition degree
    # counts are globally exact after the key dedup
    withsrc = ds.map_batches(_pairs, batch_format="pyarrow")

    def _deg2(t: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(t.column("k"), dtype=np.int64))
        uk, c = np.unique(k >> 32, return_counts=True)
        return pa.table({"src": pa.array(uk),
                         "d": pa.array(c.astype(np.int64))})

    degs = group_apply_tasks(withsrc, ["src"], _deg2).to_pandas()
    uk, cnt = np.unique(degs.d.to_numpy().astype(np.int64),
                        return_counts=True)
    return pa.table({
        "outdeg": pa.array(uk),
        "n_vertices": pa.array(cnt.astype(np.int64)),
    })


def q_rmat_quadrants(sf_dir: str):
    """Top-level quadrant counts of the raw R-MAT edges (MSBs of src
    and dst) — the initiator-matrix (0.57/0.19/0.19/0.05) evidence in
    one groupby. Output (qu, qv, n_edges)."""
    ds = _rmat_ds()
    sh = RMAT_AUDIT_SCALE - 1

    def _part(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("src"), dtype=np.int64) >> sh
        v = np.asarray(b.column("dst"), dtype=np.int64) >> sh
        key = u * 2 + v
        c = np.bincount(key, minlength=4).astype(np.int64)
        return pa.table({
            "qu": pa.array(np.array([0, 0, 1, 1], dtype=np.int64)),
            "qv": pa.array(np.array([0, 1, 0, 1], dtype=np.int64)),
            "n_edges": pa.array(c),
        })

    parts = ds.map_batches(_part, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["qu", "qv"], sort=True).n_edges.sum()
    return pa.table({
        "qu": pa.array([k[0] for k in agg.index], type=pa.int64()),
        "qv": pa.array([k[1] for k in agg.index], type=pa.int64()),
        "n_edges": pa.array(agg.to_numpy().astype(np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 102: checkpoint-resume, incremental block update, and MM-writer
# roundtrip — the durability paths get driver-gated faces
# ---------------------------------------------------------------------------

PR_RESUME_AT = 5  # snapshot boundary the resumed run must start from


def q_pagerank_resumed(sf_dir: str):
    """PageRank RESUMED FROM CHECKPOINT: run the first PR_RESUME_AT
    iterations with a snapshot at the boundary, then a second pagerank
    call restores that snapshot and finishes to PR_ITERS — the
    north-rule resumability requirement, driver-verified because the
    resumed result must hash-match the plain `pagerank` oracle exactly
    (same schema, same rounded scores). Raises if the resume did not
    actually engage."""
    import shutil

    from .context import CKPT_ROOT
    from .pagerank import pagerank as _pr

    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    ck = f"{CKPT_ROOT}/prresume_n{ctx.n}"
    shutil.rmtree(ck, ignore_errors=True)
    _r1, info1 = _pr(eng, iters=PR_RESUME_AT, tol=None, ckpt_dir=ck,
                     ckpt_every=PR_RESUME_AT)
    r, info = _pr(eng, iters=PR_ITERS, tol=None, ckpt_dir=ck,
                  ckpt_every=PR_RESUME_AT, resume=True)
    if info.get("resumed_at") != PR_RESUME_AT:
        raise RuntimeError(
            f"checkpoint resume did not engage: resumed_at="
            f"{info.get('resumed_at')}")
    score = np.round(r * ctx.n, 6)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "score": pa.array(score),
    })


def q_cc_incremental(sf_dir: str):
    """Connected components after an INCREMENTAL block update: a
    deterministic ~1% edge delta is withheld from the symmetric graph,
    blocks are built on the remainder, then `engine.update_blocks`
    merges the delta back — rebuilding ONLY the touched (br, bc) blocks
    (`Applications/Incremental` semantics, `SpParMat.cpp:741`) — and
    CC_ITERS min-label rounds run on the updated manifest. The end
    state must equal the full graph's CC, so the plain
    `connected_components` oracle gates the whole incremental path."""
    from ..core.engine import SpmvEngine, build_blocks, update_blocks
    from .context import CKPT_ROOT

    ctx = get_context(sf_dir)
    g = ctx.graph("sym")
    pred = lambda s, d, w: (s * 31 + d) % 101 == 0  # noqa: E731
    base = g.prune(pred)  # prune DROPS where pred: base = graph - delta
    delta = g.prune(lambda s, d, w: ~pred(s, d, w))
    ck = f"{CKPT_ROOT}/ccinc_n{ctx.n}"
    import shutil

    shutil.rmtree(ck, ignore_errors=True)
    man = build_blocks(base, ctx.engine("sym").g, ck)
    man2 = update_blocks(man, delta, ck)
    eng = SpmvEngine.from_manifest(man2)
    comp = alg.cc_fixed(eng, CC_ITERS)
    eng.shutdown()
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "comp": _label_col(ctx, comp),
    })


def q_mm_roundtrip(sf_dir: str):
    """Distributed matrix-market writer/reader roundtrip census: the
    edge table goes out through `write_matrix_market` (per-partition
    formatted shards + ordered concat, `ParallelWriteMM`
    `SpParMat.cpp:4133`), comes back through the byte-range parallel
    reader, and the census (nnz, integer weight total) must equal the
    source of truth — the IO path's driver-gated face. Output one row
    (nnz, w_sum)."""
    import os

    from ..sources.io import read_matrix_market, write_matrix_market
    from .context import CKPT_ROOT

    ctx = get_context(sf_dir)
    g = ctx.graph("directed").dedup_sum()
    path = f"{CKPT_ROOT}/mmrt_n{ctx.n}.mtx"
    os.makedirs(CKPT_ROOT, exist_ok=True)
    write_matrix_market(g, path)
    g2 = read_matrix_market(path)

    def _census(b: pa.Table) -> pa.Table:
        w = np.asarray(b.column("w"), dtype=np.float64)
        return pa.table({
            "nnz": pa.array([b.num_rows], type=pa.int64()),
            "w_sum": pa.array([int(np.round(w.sum()))], type=pa.int64()),
        })

    parts = g2.edges.map_batches(_census,
                                 batch_format="pyarrow").to_pandas()
    return pa.table({
        "nnz": pa.array([int(parts.nnz.sum())], type=pa.int64()),
        "w_sum": pa.array([int(parts.w_sum.sum())], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 103: salted-key skew mitigation gets driver-gated faces
# ---------------------------------------------------------------------------

SALT_S = 8    # sub-keys per hot key
SALT_TOPK = 10


def q_salted_degree_topk(sf_dir: str):
    """Top-SALT_TOPK structural in-degrees computed through the SALTED
    two-phase aggregation plan (the north rule's power-law skew
    mitigation): phase 1 counts per (dst, salt = mix64(src) % SALT_S)
    so a hub's rows split across SALT_S sub-partitions, phase 2 is the
    tiny unsalted combine over sub-totals — and the result must equal
    the plain degree top-k exactly (the oracle never sees the salt).
    Output (label, indeg), top-k by (indeg DESC, label ASC)."""
    from ..core.shuffle import _mix64, group_apply_tasks

    ctx = get_context(sf_dir)
    be = ctx.graph("directed").dedup_sum().cast_bool().edges

    def _phase1(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        salt = (_mix64(s.view(np.uint64)) % np.uint64(SALT_S)) \
            .astype(np.int64)
        key = d * SALT_S + salt
        uk, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({"dst": pa.array(uk // SALT_S),
                         "salt": pa.array(uk % SALT_S),
                         "c": pa.array(c)})

    def _sub(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("dst"), dtype=np.int64)
        s = np.asarray(t.column("salt"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        key = d * SALT_S + s
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({"dst": pa.array(uk // SALT_S),
                         "c": pa.array(ibincount(inv, c,
                                                 minlength=len(uk)))})

    def _tot(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("dst"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(d, return_inverse=True)
        tot = ibincount(inv, c, minlength=len(uk))
        # per-partition top-k candidates only
        top = np.lexsort((uk, -tot))[:SALT_TOPK]
        return pa.table({"dst": pa.array(uk[top]),
                         "indeg": pa.array(tot[top])})

    sub = group_apply_tasks(
        be.map_batches(_phase1, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["dst", "salt"], _sub)
    cands = group_apply_tasks(sub, ["dst"], _tot).to_pandas()
    order = np.lexsort((cands.dst.to_numpy(),
                        -cands.indeg.to_numpy()))[:SALT_TOPK]
    ids = cands.dst.to_numpy()[order].astype(np.int64)
    return pa.table({
        "label": _label_col(ctx, ids),
        "indeg": pa.array(cands.indeg.to_numpy()[order]
                          .astype(np.int64)),
    })


def q_salt_imbalance(sf_dir: str):
    """The skew evidence itself: group-size census of the structural
    in-degree aggregation WITHOUT salting (groups = dst) vs WITH
    salting (groups = (dst, mix64(src) % SALT_S)) — max group size
    drops by ~SALT_S on the hubs, n_groups grows by at most SALT_S x.
    Both sides integer-exact (the salt is the same splitmix64 the SQL
    twin re-implements). Output (variant, n_groups, max_group,
    sum_rows)."""
    from ..core.shuffle import _mix64, group_apply_tasks

    ctx = get_context(sf_dir)
    be = ctx.graph("directed").dedup_sum().cast_bool().edges

    def _keys(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        d = np.asarray(b.column("dst"), dtype=np.int64)
        salt = (_mix64(s.view(np.uint64)) % np.uint64(SALT_S)) \
            .astype(np.int64)
        key = d * SALT_S + salt
        uk, inv = np.unique(key, return_inverse=True)
        c = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table({"k": pa.array(uk), "c": pa.array(c)})

    def _groups(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        c = np.asarray(t.column("c"), dtype=np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        salted = ibincount(inv, c, minlength=len(uk))
        ud, dinv = np.unique(uk // SALT_S, return_inverse=True)
        plain = ibincount(dinv, salted, minlength=len(ud))
        return pa.table({
            "ns": pa.array([len(uk)], type=pa.int64()),
            "ms": pa.array([int(salted.max()) if len(salted) else 0],
                           type=pa.int64()),
            "np_": pa.array([len(ud)], type=pa.int64()),
            "mp": pa.array([int(plain.max()) if len(plain) else 0],
                           type=pa.int64()),
            "sr": pa.array([int(plain.sum())], type=pa.int64()),
        })

    # route by dst so BOTH group families are partition-local exact
    # (all salts of a dst share its partition)
    def _dstcol(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        return t.append_column("dst", pa.array(k // SALT_S))

    parts = group_apply_tasks(
        be.map_batches(_keys, batch_format="pyarrow",
                       zero_copy_batch=True)
          .map_batches(_dstcol, batch_format="pyarrow"),
        ["dst"], _groups).to_pandas()
    return pa.table({
        "variant": pa.array(["plain", "salted"], type=pa.string()),
        "n_groups": pa.array([int(parts.np_.sum()),
                              int(parts.ns.sum())], type=pa.int64()),
        "max_group": pa.array([int(parts.mp.max()),
                               int(parts.ms.max())], type=pa.int64()),
        "sum_rows": pa.array([int(parts.sr.sum())] * 2,
                             type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 104: Bellman-Ford face — K-hop cheapest paths under NEGATIVE
# integer edge weights (no non-negativity assumption anywhere)
# ---------------------------------------------------------------------------

BF_ROUNDS = 6
BF_INF = np.inf


def _w104_seed(bounds, hub):
    s, e = bounds
    x = np.full((1, e - s), BF_INF)
    if s <= hub < e:
        x[0, hub - s] = 0.0
    return x


def _w104_min(d, y):
    return np.minimum(d[0:1], y[0:1])


def _w104_census(d):
    v = d[0]
    reach = np.isfinite(v)
    return (int(reach.sum()),
            float(v[reach].min()) if reach.any() else 0.0,
            float(v[reach].sum()) if reach.any() else 0.0)


def q_khop_cheapest(sf_dir: str):
    """K-hop cheapest-path trace from the top hub under NEGATIVE
    integer edge weights w = ((src + 2*dst) % 7) - 3 (dense-id space,
    range [-3, 3]) — the Bellman-Ford relaxation run for exactly
    BF_ROUNDS synchronous rounds, where "distance" = cheapest total
    weight over <= k-hop walks (well-defined even with negative cycles,
    unlike a convergence claim). One `min_plus` SpMV + elementwise min
    per round over a PURPOSE-BUILT weighted engine (structural edges,
    remapped weights); every value is an integer carried exactly in
    float64. Output per round: (k, n_reached, min_dist, sum_dist)."""
    from ..core.engine import SpmvEngine
    from ..core.graph import Graph
    from .context import CKPT_ROOT

    ctx = get_context(sf_dir)
    be = ctx.graph("directed").dedup_sum().cast_bool().edges

    def _w(t: pa.Table) -> pa.Table:
        s = np.asarray(t.column("src"), dtype=np.int64)
        d = np.asarray(t.column("dst"), dtype=np.int64)
        return pa.table({
            "src": pa.array(s), "dst": pa.array(d),
            "w": pa.array(((s + 2 * d) % 7 - 3).astype(np.float64)),
        })

    eng = SpmvEngine.from_graph(
        Graph(n=ctx.n, edges=be.map_batches(_w, batch_format="pyarrow")),
        ctx.engine("directed").g, f"{CKPT_ROOT}/bf_n{ctx.n}")
    sym = ctx.engine("sym")
    hub = int(alg.top_by_degree(
        sym, ctx.vdict.arith_slice_refs(sym.bounds), 1)[0])
    d = eng.map_chunks_n(partial(_w104_seed, hub=hub), 1,
                         with_bounds=True)[0]
    rows = []
    for k in range(1, BF_ROUNDS + 1):
        y = eng.spmm_refs(d, 1, "min_plus")
        d = eng.map_chunks(_w104_min, d, y)
        nr, mn, sm = 0, np.inf, 0.0
        for cr, cm, cs in eng.chunk_scalars(_w104_census, d):
            nr += cr
            if cr:
                mn = min(mn, cm)
            sm += cs
        rows.append((k, nr, int(mn), int(round(sm))))
    eng.shutdown()
    return pa.table({
        "k": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_reached": pa.array([r[1] for r in rows], type=pa.int64()),
        "min_dist": pa.array([r[2] for r in rows], type=pa.int64()),
        "sum_dist": pa.array([r[3] for r in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 105: Louvain first sweep (modularity-gain argmax from
# singletons, integer-exact)
# ---------------------------------------------------------------------------


def q_louvain_pass(sf_dir: str):
    """ONE synchronous Louvain sweep from singleton communities over
    the weighted symmetric graph: vertex v joins the neighbor u
    maximizing the singleton-merge modularity gain, compared via the
    INTEGER score m2*w(v,u) - k_v*k_u (m2 = total weight = 2m; the
    standard gain w/m - k_v k_u / 2m^2 scaled by 2m^2 — no floats, no
    resolution ambiguity), if that score is positive; ties by neighbor
    label ASC; otherwise v stays singleton. The community-detection
    face beyond `label_propagation` (modularity-driven, not
    majority-driven). Plan: one dst-keyed degree join, one src-hash
    group with k_v = the group's own weight sum (the symmetric graph
    pays no second join). Output (label, comm) labels."""
    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    ctx = get_context(sf_dir)
    sym = ctx.graph("sym").dedup_sum().edges

    def _kpart(b: pa.Table) -> pa.Table:
        s = np.asarray(b.column("src"), dtype=np.int64)
        w = np.asarray(b.column("w"), dtype=np.float64)
        uk, inv = np.unique(s, return_inverse=True)
        return pa.table({"v": pa.array(uk),
                         "c": pa.array(ibincount(inv, w.astype(np.int64),
                                                 minlength=len(uk)))})

    ktab = group_apply_tasks(
        sym.map_batches(_kpart, batch_format="pyarrow",
                        zero_copy_batch=True), ["v"], _w93_vmerge("k"))
    m2 = int(sum(r["c"] for r in ktab.map_batches(
        lambda t: pa.table({"c": pa.array([int(np.asarray(
            t.column("k"), dtype=np.int64).sum())])}),
        batch_format="pyarrow").take_all()))

    def _pick(j: pa.Table, *, _m2=m2) -> pa.Table:
        """One src-hash partition (ALL of a vertex's rows co-locate, so
        k_v is the group's own weight sum): vectorized argmax per src
        by (score DESC, dst ASC) via a (src, -score, dst) lexsort +
        first-of-run."""
        empty = pa.table({"v": pa.array([], type=pa.int64()),
                          "comm": pa.array([], type=pa.int64())})
        if j.num_rows == 0:
            return empty
        s = np.asarray(j.column("src"), dtype=np.int64)
        d = np.asarray(j.column("dst"), dtype=np.int64)
        w = np.asarray(j.column("w"), dtype=np.float64).astype(np.int64)
        kd = np.asarray(j.column("k"), dtype=np.int64)
        uk, inv = np.unique(s, return_inverse=True)
        kv = ibincount(inv, w, minlength=len(uk))  # includes loops: none
        score = _m2 * w - kv[inv] * kd
        keep = d != s
        if not keep.any():
            return empty
        s, d, score = s[keep], d[keep], score[keep]
        o = np.lexsort((d, -score, s))
        so, do, sco = s[o], d[o], score[o]
        first = np.empty(len(so), dtype=bool)
        first[0] = True
        first[1:] = so[1:] != so[:-1]
        fv, fc, fs = so[first], do[first], sco[first]
        return pa.table({
            "v": pa.array(fv),
            "comm": pa.array(np.where(fs > 0, fc, fv)),
        })

    joined = hash_join_tasks(sym, ktab, on="dst", right_on="v")
    res = group_apply_tasks(joined, ["src"], _pick).to_pandas()
    comm = np.arange(ctx.n, dtype=np.int64)  # isolated = singleton
    comm[res.v.to_numpy().astype(np.int64)] = \
        res.comm.to_numpy().astype(np.int64)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "comm": _label_col(ctx, comm),
    })


# ---------------------------------------------------------------------------
# wave 106: densest-subgraph parallel peel (Charikar greedy, the
# synchronous MapReduce variant)
# ---------------------------------------------------------------------------

DS_ROUNDS = 8


def _w106_ones(bounds):
    s, e = bounds
    return np.ones((1, e - s), dtype=np.int64)


def _w106_counts(a, y):
    act = a[0] > 0
    return (int(act.sum()), int(y[0][act].sum()))


def _w106_peel(a, y, nv, ne2):
    act = a[0] > 0
    rm = act & (y[0] * nv <= ne2)
    return (act & ~rm).astype(np.int64)[None, :]


def q_densest_peel(sf_dir: str):
    """Densest-subgraph parallel peel trace (Charikar's greedy in the
    synchronous map-reduce form, Bahmani et al.): each round removes
    EVERY active vertex whose in-subgraph degree satisfies
    deg * |V| <= 2|E| (i.e. deg <= average degree — the integer
    cross-multiplied comparison, no density floats anywhere), for
    DS_ROUNDS rounds. The max of |E|/|V| along the trace 2-approximates
    the densest subgraph. One structural SpMV per round against the
    active-indicator mask (the attack_curve masking pattern); counts
    are bounded per-chunk partials. Output (round, n_v, n_e) for
    round = 0 (whole graph) .. DS_ROUNDS."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    a = eng.map_chunks_n(_w106_ones, 1, with_bounds=True)[0]
    rows = []
    for r in range(DS_ROUNDS + 1):
        y = eng.spmm_refs(a, 1, "plus_times_i64")
        nv, ne2 = 0, 0
        for cv, ce in eng.chunk_scalars(_w106_counts, a, y):
            nv += cv
            ne2 += ce
        rows.append((r, nv, ne2 // 2))
        if r < DS_ROUNDS:
            a = eng.map_chunks(partial(_w106_peel, nv=nv, ne2=ne2),
                               a, y)
    return pa.table({
        "round": pa.array([x[0] for x in rows], type=pa.int64()),
        "n_v": pa.array([x[1] for x in rows], type=pa.int64()),
        "n_e": pa.array([x[2] for x in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 107: collective-influence ranking (Morone-Makse CI_1)
# ---------------------------------------------------------------------------

CI_TOPK_K = 25


def _w107_x(d):
    return np.maximum(d.astype(np.int64) - 1, 0)


def _w107_cand(d, y, ar, bounds, k):
    """Per-chunk top-k CI candidates by (ci DESC, arith ASC)."""
    s, _e = bounds
    km1 = np.maximum(np.asarray(d).astype(np.int64) - 1, 0)
    ci = km1 * np.asarray(y, dtype=np.int64)
    arv = np.asarray(ar, dtype=np.int64)
    kk = min(k, len(ci))
    o = np.lexsort((arv, -ci))[:kk]
    return ((o + s).astype(np.int64), ci[o],
            np.asarray(d)[o].astype(np.int64), arv[o])


def q_ci_topk(sf_dir: str):
    """Collective-influence ranking CI_1 (Morone & Makse
    optimal-percolation score): ci(v) = (deg_v - 1) * sum_{u ~ v}
    (deg_u - 1) over the undirected structural graph — ONE exact-int64
    plus_times SpMV of the (deg - 1) vector against the symmetric
    engine, then per-chunk candidate top-k + an O(g*k) driver merge
    (the `top_by_degree` hub-seed pattern, ``BetwCent.cpp:179-187``).
    Output: the CI_TOPK_K rows (label, deg, ci) by (ci DESC, arith
    ASC). Reference semantics: `Reduce` row degree + semiring SpMV
    (``SpParMat.h:67-456`` plus_times)."""
    import ray as _ray

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    deg = eng.in_weights_refs()
    x = eng.map_chunks(_w107_x, deg)
    y = eng.spmv_refs(x, "plus_times_i64")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    i_r, c_r, d_r, a_r = eng.map_chunks_n(
        partial(_w107_cand, k=CI_TOPK_K), 4, deg, y, ar, with_bounds=True
    )
    ids = np.concatenate(_ray.get(i_r))
    ci = np.concatenate(_ray.get(c_r))
    dg = np.concatenate(_ray.get(d_r))
    arv = np.concatenate(_ray.get(a_r))
    o = np.lexsort((arv, -ci))[:CI_TOPK_K]
    return pa.table({
        "label": _label_col(ctx, ids[o]),
        "deg": pa.array(dg[o], type=pa.int64()),
        "ci": pa.array(ci[o], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 108: parallel greedy dominating set (synchronous local-maximum
# greedy, the Jones-Plassmann/Luby pattern applied to domination)
# ---------------------------------------------------------------------------

DOMSET_ROUNDS = 6
DOMSET_PRIO_B = 53


def _w108_white0(bounds):
    s, e = bounds
    return np.ones(e - s, dtype=np.int64)


def _w108_zeros(bounds):
    s, e = bounds
    return np.zeros(e - s, dtype=np.int64)


def _w108_score(white, inset, yw, prio, p):
    """score(v) = wv * p + prio(v) for eligible v (not in set, covers
    >= 1 white vertex in its CLOSED neighborhood), else 0. The affine
    composite is injective on eligibles (prio < p distinct), so local
    maxima are unique."""
    wv = white + yw
    elig = (inset == 0) & (wv > 0)
    return np.where(elig, wv * np.int64(p) + prio, np.int64(0))


def _w108_win(score, nbmax):
    return ((score > 0) & (score >= nbmax)).astype(np.int64)


def _w108_join(inset, win):
    return inset | win


def _w108_uncover(white, win, ywin):
    return white & np.int64(1 - ((win > 0) | (ywin > 0)))


def _w108_counts(inset, white):
    return (int(inset.sum()), int(white.sum()))


def q_domset_trace(sf_dir: str):
    """Synchronous parallel greedy dominating set (the distributed
    local-maximum greedy — Jones-Plassmann-style rounds applied to
    domination): per round every vertex scores wv * p + prio where wv
    is its CLOSED-neighborhood white count; vertices whose score beats
    every neighbor's join the set, and their closed neighborhoods turn
    dominated. Exactly DOMSET_ROUNDS rounds; all three SpMVs per round
    ride exact-int64 channels (plus_times_i64 white counts,
    select2nd_max_i64 score maxima). Output (round, n_set, n_white)
    for round = 0 .. DOMSET_ROUNDS. Reference semantics: the
    `FilteredMIS.cpp` select-winners/deactivate family over semiring
    SpMV (``Semirings.h`` catalog)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    p = lcg_modulus(ctx.n)
    prio = _lcg_prio_refs(eng, DOMSET_PRIO_B, p, dtype=np.int64)
    white = eng.map_chunks_i(_w108_white0)
    inset = eng.map_chunks_i(_w108_zeros)
    rows = []
    for r in range(DOMSET_ROUNDS + 1):
        ns, nw = 0, 0
        for cs, cw in eng.chunk_scalars(_w108_counts, inset, white):
            ns += cs
            nw += cw
        rows.append((r, ns, nw))
        if r == DOMSET_ROUNDS or nw == 0 and r > 0:
            # converged traces keep emitting the (stable) fixpoint rows
            # so the row count is deterministic
            continue
        yw = eng.spmv_refs(white, "plus_times_i64")
        score = eng.map_chunks(partial(_w108_score, p=p),
                               white, inset, yw, prio)
        nbmax = eng.spmv_refs(score, "select2nd_max_i64")
        win = eng.map_chunks(_w108_win, score, nbmax)
        inset = eng.map_chunks(_w108_join, inset, win)
        ywin = eng.spmv_refs(win, "plus_times_i64")
        white = eng.map_chunks(_w108_uncover, white, win, ywin)
    return pa.table({
        "round": pa.array([x[0] for x in rows], type=pa.int64()),
        "n_set": pa.array([x[1] for x in rows], type=pa.int64()),
        "n_white": pa.array([x[2] for x in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 109: ego-net scan statistic (Priebe's scan_1 anomaly score)
# ---------------------------------------------------------------------------

SCAN_TOPK_K = 25


def _w109_cand(batch: pa.Table, k: int) -> pa.Table:
    """Per-block scan-statistic candidate top-k by (scan DESC, v ASC)."""
    v = np.asarray(batch.column("v"), dtype=np.int64)
    deg = np.asarray(batch.column("deg"), dtype=np.int64)
    tri = np.asarray(batch.column("tri"), dtype=np.int64)
    scan = deg + tri
    kk = min(k, len(v))
    o = np.lexsort((v, -scan))[:kk]
    return pa.table({
        "v": pa.array(v[o]), "deg": pa.array(deg[o]),
        "tri": pa.array(tri[o]), "scan": pa.array(scan[o]),
    })


def q_scan_topk(sf_dir: str):
    """Ego-net scan statistic (Priebe's scan_1 anomaly score): scan(v)
    = |E(ego(v))| = deg(v) + tri(v), the edge count of the CLOSED
    1-ball — per-vertex triangle counts ride the distributed
    degree-ordered wedge plan (`alg.clustering_coefficients`,
    the reference's masked-SpGEMM per-vertex row sums,
    ``SpParMat.h:161`` + ``ParFriends.h:1447``) in its streaming
    Dataset form (materialize=False: per-vertex rows never land on the
    driver), then per-block candidate top-k + an O(g*k) driver merge.
    Output: the SCAN_TOPK_K rows (label, deg, tri, scan) by (scan
    DESC, dense id ASC)."""
    ctx = get_context(sf_dir)
    ds = alg.clustering_coefficients(ctx.graph("sym").edges, ctx.n,
                                     materialize=False)
    cand = ds.map_batches(partial(_w109_cand, k=SCAN_TOPK_K),
                          batch_format="pyarrow").to_pandas()
    v = cand.v.to_numpy(dtype=np.int64)
    scan = cand["scan"].to_numpy(dtype=np.int64)
    o = np.lexsort((v, -scan))[:SCAN_TOPK_K]
    return pa.table({
        "label": _label_col(ctx, v[o]),
        "deg": pa.array(cand.deg.to_numpy(dtype=np.int64)[o]),
        "tri": pa.array(cand.tri.to_numpy(dtype=np.int64)[o]),
        "scan": pa.array(scan[o]),
    })


# ---------------------------------------------------------------------------
# wave 110: coreness via iterated neighborhood H-index (Lu et al.: the
# h-operator fixpoint IS the k-core number)
# ---------------------------------------------------------------------------

HIDX_ROUNDS = 4


def _w110_deg(j: pa.Table) -> pa.Table:
    s = np.asarray(j.column("src"), dtype=np.int64)
    uk, cnt = np.unique(s, return_counts=True)
    return pa.table({"v": pa.array(uk), "c": pa.array(cnt.astype(np.int64))})


def _w110_hindex(j: pa.Table) -> pa.Table:
    """One src-hash partition (ALL of a vertex's adjacency co-locates):
    vectorized per-group H-index — sort (src, c DESC), 1-based in-group
    rank rn, H = max over the group of min(c, rn)."""
    if j.num_rows == 0:
        return pa.table({"v": pa.array([], type=pa.int64()),
                         "c": pa.array([], type=pa.int64())})
    s = np.asarray(j.column("src"), dtype=np.int64)
    c = np.asarray(j.column("c"), dtype=np.int64)
    o = np.lexsort((-c, s))
    so, co = s[o], c[o]
    starts = np.nonzero(np.r_[True, so[1:] != so[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(so)])
    rn = np.arange(len(so), dtype=np.int64) - np.repeat(starts, sizes) + 1
    h = np.maximum.reduceat(np.minimum(co, rn), starts)
    return pa.table({"v": pa.array(so[starts]), "c": pa.array(h)})


def q_hindex_coreness(sf_dir: str):
    """Coreness via the iterated neighborhood H-index operator (Lu,
    Zhou, Zhang, Stanley: c_0 = deg, c_{k+1}(v) = H-index of
    {c_k(u) : u ~ v}; the fixpoint is exactly the k-core number —
    here exactly HIDX_ROUNDS synchronous rounds, the oracle-replicable
    truncation). Per round: ONE dst-keyed join ships the current c to
    every adjacency row, ONE src-hash group computes the vectorized
    per-group H-index (sort + reduceat, no per-row Python). The
    multiset H-operator is NOT a semiring reduce, so this rides the
    warm-task join/group machinery instead of the SpMV engine — the
    composition face `kcore_fixed` (membership at one k) cannot cover.
    Output: (label, deg, core) for every vertex with deg >= 1."""
    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    ctx = get_context(sf_dir)
    sym = ctx.graph("sym").dedup_sum().edges
    ctab = group_apply_tasks(sym, ["src"], _w110_deg)
    deg = ctab.to_pandas()  # (v, c0) — this query's own O(n) output
    for _ in range(HIDX_ROUNDS):
        joined = hash_join_tasks(sym, ctab, on="dst", right_on="v")
        ctab = group_apply_tasks(joined, ["src"], _w110_hindex)
    core = ctab.to_pandas()
    dv = deg.v.to_numpy(dtype=np.int64)
    cv = core.v.to_numpy(dtype=np.int64)
    do, co = np.argsort(dv), np.argsort(cv)  # same deg>=1 vertex set
    return pa.table({
        "label": _label_col(ctx, dv[do]),
        "deg": pa.array(deg.c.to_numpy(dtype=np.int64)[do]),
        "core": pa.array(core.c.to_numpy(dtype=np.int64)[co]),
    })


# ---------------------------------------------------------------------------
# wave 111: per-component odd-cycle / bipartiteness census (CC labels +
# parity BFS from each component representative, all components in ONE
# BFS state vector)
# ---------------------------------------------------------------------------

ODDC_ROUNDS = 12
ODDC_TOPC = 10


def _w111_seed(lab, bounds):
    s, e = bounds
    return np.where(np.asarray(lab, dtype=np.int64)
                    == np.arange(s, e, dtype=np.int64), 0.0, np.inf)


def _w111_relax(d, y, bounds):
    return np.minimum(d, y)


def _w111_vtab(lab, d, bounds):
    s, e = bounds
    di = np.where(np.isinf(d), np.int64(-1), d).astype(np.int64)
    return pa.table({
        "v": pa.array(np.arange(s, e, dtype=np.int64)),
        "comp": pa.array(np.asarray(lab, dtype=np.int64)),
        "dv": pa.array(di),
    })


def _w111_half(b: pa.Table) -> pa.Table:
    s = np.asarray(b.column("src"), dtype=np.int64)
    d = np.asarray(b.column("dst"), dtype=np.int64)
    keep = s < d
    return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})


def _w111_ecensus(j: pa.Table) -> pa.Table:
    comp = np.asarray(j.column("comp"), dtype=np.int64)
    du = np.asarray(j.column("du"), dtype=np.int64)
    dv = np.asarray(j.column("dv"), dtype=np.int64)
    uk, inv = np.unique(comp, return_inverse=True)
    odd = ((du >= 0) & (dv >= 0) & (du == dv)).astype(np.int64)
    return pa.table({
        "comp": pa.array(uk),
        "n_edges": pa.array(np.bincount(inv, minlength=len(uk))
                            .astype(np.int64)),
        "odd_edges": pa.array(ibincount(inv, odd, minlength=len(uk))),
    })


def _w111_csize(j: pa.Table) -> pa.Table:
    comp = np.asarray(j.column("comp"), dtype=np.int64)
    uk, cnt = np.unique(comp, return_counts=True)
    return pa.table({"comp": pa.array(uk),
                     "size": pa.array(cnt.astype(np.int64))})


def _w111_cand(b: pa.Table, k: int) -> pa.Table:
    sz = np.asarray(b.column("size"), dtype=np.int64)
    comp = np.asarray(b.column("comp"), dtype=np.int64)
    kk = min(k, len(sz))
    o = np.lexsort((comp, -sz))[:kk]
    return b.take(pa.array(o))


def q_odd_cycle_census(sf_dir: str):
    """Per-component odd-cycle / bipartiteness census: CC min-labels
    (CC_ITERS synchronous rounds, the `cc_fixed` chain) pick one
    representative per component (label == own dense id); ONE min_plus
    BFS state vector runs ODDC_ROUNDS levels from ALL representatives
    simultaneously (components are disjoint, so the single vector IS
    the per-component BFS — no K-source matrix); an undirected edge
    with equal finite endpoint levels witnesses an odd closed walk, so
    a component is bipartite iff its odd_edges = 0 (exact once fully
    explored). Labels/distances stay chunked refs through every round;
    the census rides per-chunk Arrow tables -> warm-task joins -> a
    per-partition candidate top-k. Output: the ODDC_TOPC components by
    (size DESC, comp ASC): (comp, size, n_edges, odd_edges).
    Reference semantics: composed semiring SpMV fixpoints
    (``FastSV.h:335`` min-label + min-plus BFS levels)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    lab = eng.map_chunks_i(alg._iota)
    for _ in range(CC_ITERS):
        lab = eng.spmv_apply_refs(lab, "select2nd_min", alg._min2_b,
                                  1, lab)[0]
    d = eng.map_chunks_i(_w111_seed, lab)
    for _ in range(ODDC_ROUNDS):
        d = eng.spmv_apply_refs(d, "min_plus", _w111_relax, 1, d)[0]
    vt_refs = eng.map_chunks_i(_w111_vtab, lab, d)
    vtab = _ray.data.from_arrow_refs(vt_refs)

    half = ctx.graph("sym").dedup_sum().edges.map_batches(
        _w111_half, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["src", "dst"])

    def _post1(t: pa.Table) -> pa.Table:
        return pa.table({
            "dst": t.column("dst"), "comp": t.column("comp"),
            "du": t.column("dv"),
        })

    j1 = hash_join_tasks(half, vtab, on="src", right_on="v", post=_post1)
    j2 = hash_join_tasks(j1, vtab.select_columns(["v", "dv"]),
                         on="dst", right_on="v")
    ecen = group_apply_tasks(j2, ["comp"], _w111_ecensus)
    csize = group_apply_tasks(vtab.select_columns(["comp"]),
                              ["comp"], _w111_csize)

    def _post3(t: pa.Table) -> pa.Table:
        sz = np.asarray(t.column("size"), dtype=np.int64)
        ne = t.column("n_edges").to_numpy(zero_copy_only=False)
        oe = t.column("odd_edges").to_numpy(zero_copy_only=False)
        ne = np.where(np.isnan(ne.astype(np.float64)), 0, ne).astype(np.int64) \
            if ne.dtype.kind == "f" else np.nan_to_num(ne).astype(np.int64)
        oe = np.where(np.isnan(oe.astype(np.float64)), 0, oe).astype(np.int64) \
            if oe.dtype.kind == "f" else np.nan_to_num(oe).astype(np.int64)
        return pa.table({
            "comp": t.column("comp"), "size": pa.array(sz),
            "n_edges": pa.array(ne), "odd_edges": pa.array(oe),
        })

    merged = hash_join_tasks(csize, ecen, on="comp",
                             join_type="left outer", post=_post3)
    cand = merged.map_batches(partial(_w111_cand, k=ODDC_TOPC),
                              batch_format="pyarrow").to_pandas()
    sz = cand["size"].to_numpy(dtype=np.int64)
    comp = cand.comp.to_numpy(dtype=np.int64)
    o = np.lexsort((comp, -sz))[:ODDC_TOPC]
    return pa.table({
        "comp": _label_col(ctx, comp[o]),
        "size": pa.array(sz[o]),
        "n_edges": pa.array(cand.n_edges.to_numpy(dtype=np.int64)[o]),
        "odd_edges": pa.array(cand.odd_edges.to_numpy(dtype=np.int64)[o]),
    })


# ---------------------------------------------------------------------------
# wave 112: truncated hitting time to an absorbing seed set (value
# iteration on the random walk)
# ---------------------------------------------------------------------------

HIT_ROUNDS = 6
HIT_SEED_MOD = 97


def _w112_seed(ar):
    return (np.asarray(ar, dtype=np.int64) % HIT_SEED_MOD) == 0


def _w112_h0(bounds):
    s, e = bounds
    return np.zeros(e - s)


def _w112_step(seedc, deg, y, bounds):
    d = np.asarray(deg, dtype=np.float64)
    h = np.where(d > 0, 1.0 + y / np.where(d > 0, d, 1.0), 0.0)
    h[seedc] = 0.0
    return h


def q_hitting_time(sf_dir: str):
    """Expected hitting time to the absorbing seed set (arith id %
    HIT_SEED_MOD == 0), truncated at horizon HIT_ROUNDS — the
    finite-horizon value iteration h_{k+1}(v) = 1 + mean_{u~v} h_k(u)
    with h = 0 clamped on seeds (the random-walk absorbing-chain face
    of the PPR/walk family; one plus_times SpMV + fused clamp per
    round, seeds/degrees/state all chunked refs). Output (label, h)
    rounded to 6 decimals (both sides evaluate the identical
    expression; the sum order differs only at ~1e-16). Reference
    semantics: semiring SpMV power iteration (``SpParMat`` plus_times,
    the `BetwCent.cpp` batched-walk pattern)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    seed = eng.map_chunks(_w112_seed, ar)
    deg = eng.in_weights_refs()
    h = eng.map_chunks_i(_w112_h0)
    for _ in range(HIT_ROUNDS):
        h = eng.spmv_apply_refs(h, "plus_times", _w112_step, 1,
                                seed, deg)[0]
    hf = eng.unchunk(h)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "h": pa.array(np.round(hf, 6)),
    })


# ---------------------------------------------------------------------------
# wave 113: training-mix apportionment (temperature-scaled largest-
# remainder allocation, exact integer arithmetic)
# ---------------------------------------------------------------------------

ALLOC_BUDGET = 100000


def _w113_agg(src, lng, dc):
    key = np.char.add(np.char.add(src.astype(str), "\x1f"),
                      lng.astype(str))
    uk, inv = np.unique(key, return_inverse=True)
    tot = ibincount(inv, dc, minlength=len(uk))
    gidx, first = np.unique(inv, return_index=True)
    pos = np.empty(len(uk), dtype=np.int64)
    pos[gidx] = first
    return pa.table({
        "source": pa.array(src[pos]), "lang": pa.array(lng[pos]),
        "docs": pa.array(tot),
    })


def _w113_part(b: pa.Table) -> pa.Table:
    src = np.asarray(b.column("source")).astype(object)
    lng = np.asarray(b.column("lang")).astype(object)
    return _w113_agg(src, lng, np.ones(len(src), dtype=np.int64))


def _w113_merge(j: pa.Table) -> pa.Table:
    src = np.asarray(j.column("source")).astype(object)
    lng = np.asarray(j.column("lang")).astype(object)
    dc = np.asarray(j.column("docs"), dtype=np.int64)
    return _w113_agg(src, lng, dc)


def q_mix_allocation(sf_dir: str):
    """Training-corpus mixing plan: apportion an ALLOC_BUDGET-slot
    sampling budget over (source, lang) cells with temperature-0.5
    upweighting of small cells — weight = floor(sqrt(docs)) — via the
    LARGEST-REMAINDER (Hare) method in EXACT int64 arithmetic: floor
    share = (B*w) // W, then the B - sum(floor) leftover slots go to
    the largest integer remainders (B*w) % W, ties by (source, lang).
    No float ever enters the apportionment, so the plan is
    bit-reproducible across engines. The cell counts are the only
    distributed step (per-batch Arrow group-count partials + one
    warm-task keyed merge); the O(cells) plan itself is driver-side.
    Output (source, lang, docs, alloc) with sum(alloc) == B exactly."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks

    ds = _ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["source", "lang"])
    parts = ds.map_batches(_w113_part, batch_format="pyarrow",
                           zero_copy_batch=True)
    cells = group_apply_tasks(parts, ["source", "lang"],
                              _w113_merge).to_pandas()
    docs = cells.docs.to_numpy(dtype=np.int64)
    w = np.floor(np.sqrt(docs.astype(np.float64))).astype(np.int64)
    W = int(w.sum())
    B = ALLOC_BUDGET
    fl = (B * w) // W
    rem = (B * w) % W
    topup = B - int(fl.sum())
    order = np.lexsort((cells.lang.to_numpy().astype(str),
                        cells.source.to_numpy().astype(str), -rem))
    alloc = fl.copy()
    alloc[order[:topup]] += 1
    return pa.table({
        "source": pa.array(cells.source.to_numpy().astype(object)),
        "lang": pa.array(cells.lang.to_numpy().astype(object)),
        "docs": pa.array(docs),
        "alloc": pa.array(alloc),
    })


# ---------------------------------------------------------------------------
# wave 114: WebGraph-style adjacency gap-encoding cost model (does a
# degree-rank relabel shrink the graph?)
# ---------------------------------------------------------------------------


def _w114_bits(x: np.ndarray) -> np.ndarray:
    """bits(x) = floor(log2(x)) + 1 for x >= 1 (minimal binary length).
    floor(log2) is IEEE-safe on integers: the only inputs where log2
    lands within an ulp of an integer are exact powers of two, where
    log2 is exact."""
    return np.floor(np.log2(x.astype(np.float64))).astype(np.int64) + 1


def _w114_cost(j: pa.Table, col: str) -> pa.Table:
    """One src-hash partition: per-vertex sorted neighbor gaps, summed
    encoding bits (first neighbor costs bits(id+1), each further one
    bits(gap))."""
    s = np.asarray(j.column("src"), dtype=np.int64)
    d = np.asarray(j.column(col), dtype=np.int64)
    if len(s) == 0:
        return pa.table({"bits": pa.array([], type=pa.int64()),
                         "lists": pa.array([], type=pa.int64())})
    o = np.lexsort((d, s))
    so, do = s[o], d[o]
    firsts = np.r_[True, so[1:] != so[:-1]]
    gaps = np.where(firsts, do + 1, do - np.r_[np.int64(0), do[:-1]])
    bits = int(_w114_bits(gaps).sum())
    return pa.table({"bits": pa.array([bits], type=pa.int64()),
                     "lists": pa.array([int(firsts.sum())],
                                       type=pa.int64())})


def _w114_degrank(j: pa.Table, offsets: dict) -> pa.Table:
    """One degree-hash partition: all vertices of a degree co-locate;
    rank = global offset of the degree class + in-class id rank."""
    v = np.asarray(j.column("v"), dtype=np.int64)
    dg = np.asarray(j.column("deg"), dtype=np.int64)
    if len(v) == 0:
        return pa.table({"v": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    o = np.lexsort((v, dg))
    vo, dgo = v[o], dg[o]
    starts = np.nonzero(np.r_[True, dgo[1:] != dgo[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(vo)])
    within = np.arange(len(vo), dtype=np.int64) - np.repeat(starts, sizes)
    base = np.array([offsets[int(dgo[s])] for s in starts],
                    dtype=np.int64)
    return pa.table({"v": pa.array(vo),
                     "rank": pa.array(np.repeat(base, sizes) + within)})


def q_gap_encoding(sf_dir: str):
    """WebGraph-flavored adjacency-compression cost model (Boldi &
    Vigna gap encoding): every vertex's sorted neighbor list costs
    bits(first+1) + sum bits(consecutive gaps), bits(x) =
    floor(log2 x) + 1 — once under ORIGINAL dense ids and once under
    the DEGREE-RANK relabel (rank by deg DESC, id ASC: hubs get small
    ids, so hub-heavy lists shrink — the locality win the reference
    chases with `PermEdges`/RCM orderings, ``DistEdgeList.cpp:222``).
    Distributed: degree classes from one keyed reduce; in-class ranks
    by a degree-hash group (offsets = driver-side cumsum of the SMALL
    degree histogram); costs per src-hash partition. Output one row
    per ordering: (ordering, total_bits, n_lists)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks

    ctx = get_context(sf_dir)
    sym = ctx.graph("sym").dedup_sum().edges

    deg_tab = group_apply_tasks(sym, ["src"], _w110_deg)  # (v, c)

    # degree histogram -> rank offset per degree class (deg DESC)
    hist = {}
    for b in deg_tab.map_batches(
            lambda t: pa.table({
                "d": pa.array(np.unique(
                    np.asarray(t.column("c"), dtype=np.int64))),
                "n": pa.array(np.unique(
                    np.asarray(t.column("c"), dtype=np.int64),
                    return_counts=True)[1].astype(np.int64)),
            }), batch_format="pyarrow").take_all():
        hist[int(b["d"])] = hist.get(int(b["d"]), 0) + int(b["n"])
    offsets, acc = {}, 0
    for dcls in sorted(hist, reverse=True):
        offsets[dcls] = acc
        acc += hist[dcls]

    ranks = group_apply_tasks(
        deg_tab.map_batches(
            lambda t: pa.table({"v": t.column("v"),
                                "deg": t.column("c")}),
            batch_format="pyarrow"),
        ["deg"], partial(_w114_degrank, offsets=offsets))

    relab = hash_join_tasks(
        hash_join_tasks(sym.select_columns(["src", "dst"]), ranks,
                        on="src", right_on="v",
                        post=lambda t: pa.table({
                            "dst": t.column("dst"),
                            "src": t.column("rank")})),
        ranks, on="dst", right_on="v",
        post=lambda t: pa.table({"src": t.column("src"),
                                 "rdst": t.column("rank")}))

    rows = []
    for name, ds, col in (("orig", sym, "dst"), ("degrank", relab, "rdst")):
        parts = group_apply_tasks(
            ds, ["src"], partial(_w114_cost, col=col)).to_pandas()
        rows.append((name, int(parts.bits.sum()),
                     int(parts.lists.sum())))
    return pa.table({
        "ordering": pa.array([r[0] for r in rows]),
        "total_bits": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_lists": pa.array([r[2] for r in rows], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 115: cross-split near-duplicate leakage audit (eval
# contamination by the holdout's own near-dups)
# ---------------------------------------------------------------------------

_SPLIT_NAMES = ("train", "val", "test")


def _w115_census(b: pa.Table) -> pa.Table:
    from ..functions.text import md5_lower64

    a = np.asarray(b.column("a"), dtype=np.int64)
    bb = np.asarray(b.column("b"), dtype=np.int64)

    def _code(ids):
        h = np.fromiter((md5_lower64(str(int(i))) % 10 for i in ids),
                        dtype=np.int64, count=len(ids))
        return np.where(h < SPLIT_TRAIN, 0,
                        np.where(h < SPLIT_TRAIN + SPLIT_VAL, 1, 2))

    ca, cb = _code(a), _code(bb)
    lo, hi = np.minimum(ca, cb), np.maximum(ca, cb)
    key = lo * 3 + hi
    uk, inv = np.unique(key, return_inverse=True)
    return pa.table({
        "k": pa.array(uk),
        "n": pa.array(np.bincount(inv).astype(np.int64)),
    })


def q_split_leakage(sf_dir: str):
    """Cross-split near-duplicate LEAKAGE audit — the eval-contamination
    check an LLM data pipeline runs before training: verified Jaccard
    near-dup pairs (the `jaccard_pairs` capped posting-list plan, tau =
    0.5) bucketed by the md5 %% 10 train/val/test assignment of BOTH
    endpoints (`data_split` semantics — the split is derived from the
    pair ids directly, no join needed). Any train x val / train x test
    row is a leak: the holdout contains a near-copy of a training doc.
    Output (split_a, split_b, pairs) with split_a <= split_b in
    (train, val, test) order."""
    from ..functions import dedup as D

    pairs = D.jaccard_pairs(_docs(sf_dir), tau=0.5)
    parts = pairs.select_columns(["a", "b"]).map_batches(
        _w115_census, batch_format="pyarrow").to_pandas()
    tot = np.zeros(9, dtype=np.int64)
    for _, r in parts.iterrows():
        tot[int(r.k)] += int(r.n)
    ks = np.nonzero(tot)[0]
    return pa.table({
        "split_a": pa.array([_SPLIT_NAMES[k // 3] for k in ks]),
        "split_b": pa.array([_SPLIT_NAMES[k % 3] for k in ks]),
        "pairs": pa.array(tot[ks]),
    })


# ---------------------------------------------------------------------------
# wave 116: Andersen-Chung-Lang PPR push, synchronous rounds (the
# local-clustering primitive)
# ---------------------------------------------------------------------------

PUSH_ROUNDS = 5
PUSH_ALPHA = 0.25          # teleport (power of two: exact scaling)
PUSH_KEEP = 0.375          # (1 - alpha) / 2, the lazy-walk half
PUSH_EPS = 0.0009765625    # 2^-10 activation threshold


def _w116_r0(bounds, root):
    s, e = bounds
    r = np.zeros(e - s)
    if s <= root < e:
        r[root - s] = 1.0
    return r


def _w116_zero(bounds):
    s, e = bounds
    return np.zeros(e - s)


def _w116_x(r, deg, bounds):
    d = np.asarray(deg, dtype=np.float64)
    a = r > PUSH_EPS * d
    return np.where(a & (d > 0), PUSH_KEEP * r / np.where(d > 0, d, 1.0),
                    0.0)


def _w116_step(r, p, deg, y, bounds):
    d = np.asarray(deg, dtype=np.float64)
    a = (d > 0) & (r > PUSH_EPS * d)
    p2 = np.where(a, p + PUSH_ALPHA * r, p)
    r2 = np.where(a, PUSH_KEEP * r, r) + y
    return r2, p2


def q_ppr_push(sf_dir: str):
    """Andersen-Chung-Lang personalized-PageRank PUSH from root m_0,
    run as PUSH_ROUNDS SYNCHRONOUS push-all-active rounds (every
    vertex with residual r > eps*deg pushes at once — the distributed
    batch form of the sequential ACL queue): p += alpha*r on actives,
    each active keeps (1-alpha)/2 of r and spreads (1-alpha)/2 r/deg
    to every neighbor (one plus_times SpMV; mask/keep/teleport fused
    into the combine task). The mass invariant p + sum(r) = 1 holds
    every round. Output (label, p, r) over all vertices, rounded to 6
    decimals. Reference semantics: semiring SpMV over the lazy-walk
    matrix (`SpParMat` plus_times; the seeded-walk pattern of
    ``BetwCent.cpp:179``)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    root = ctx.lookup_id("m_0")
    deg = eng.in_weights_refs()
    r = eng.map_chunks_i(partial(_w116_r0, root=int(root)))
    p = eng.map_chunks_i(_w116_zero)
    for _ in range(PUSH_ROUNDS):
        x = eng.map_chunks_i(_w116_x, r, deg)
        r, p = eng.spmv_apply_refs(x, "plus_times", _w116_step, 2,
                                   r, p, deg)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "p": pa.array(np.round(eng.unchunk(p), 6)),
        "r": pa.array(np.round(eng.unchunk(r), 6)),
    })


# ---------------------------------------------------------------------------
# wave 117: edge betweenness (single-source Brandes, dependency
# accumulation on EDGES of the shortest-path DAG)
# ---------------------------------------------------------------------------

EB_ITERS = 8
EB_TOPK = 20


def _w117_coeff(depth, delta, sigma, bounds, level):
    at = depth == level
    return np.where(at, (1.0 + delta) / np.where(sigma == 0, 1.0, sigma),
                    0.0)


def _w117_back(depth, delta, sigma, y, bounds, level):
    prev = depth == (level - 1)
    return delta + np.where(prev, y * sigma, 0.0)


def _w117_vtab(depth, sigma, delta, bounds):
    s, e = bounds
    return pa.table({
        "v": pa.array(np.arange(s, e, dtype=np.int64)),
        "dist": pa.array(depth.astype(np.int64)),
        "sig": pa.array(sigma),
        "delta": pa.array(delta),
    })


def _w117_score(b: pa.Table, k: int) -> pa.Table:
    du = np.asarray(b.column("du"), dtype=np.int64)
    dv = np.asarray(b.column("dv"), dtype=np.int64)
    keep = (du >= 0) & (dv == du + 1)
    if not keep.any():
        return pa.table({c: pa.array([], type=pa.int64() if c in
                                     ("a", "b") else pa.float64())
                         for c in ("a", "b", "sc")})
    su = np.asarray(b.column("su"), dtype=np.float64)[keep]
    sv = np.asarray(b.column("sv"), dtype=np.float64)[keep]
    dl = np.asarray(b.column("deltav"), dtype=np.float64)[keep]
    a = np.asarray(b.column("src"), dtype=np.int64)[keep]
    bb = np.asarray(b.column("dst"), dtype=np.int64)[keep]
    sc = su / sv * (1.0 + dl)
    kk = min(k, len(sc))
    o = np.lexsort((bb, a, -sc))[:kk]
    return pa.table({"a": pa.array(a[o]), "b": pa.array(bb[o]),
                     "sc": pa.array(sc[o])})


def q_edge_betweenness(sf_dir: str):
    """Single-source EDGE betweenness (Brandes dependency accumulation
    credited to the shortest-path-DAG edges, Girvan-Newman's edge
    score): forward = the exact-int64 `bfs_sigma` chain from root m_0
    (EB_ITERS levels); backward = per-level coeff SpMV + fused
    accumulate (``BetwCent.cpp:188-209``, the K=1 row of the batched
    sweep); every DAG edge u->v (dist_v = dist_u + 1) scores
    sigma_u/sigma_v * (1 + delta_v). dist/sigma/delta stay chunked
    through both sweeps and ship to the scoring joins as per-chunk
    Arrow tables (no driver-side edge loop). Output: top EB_TOPK DAG
    edges (src_label, dst_label, score rounded 6) by (score DESC,
    dense src, dense dst)."""
    import ray as _ray

    from ..core.shuffle import hash_join_tasks

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym")
    root = ctx.lookup_id("m_0")
    dist, sigma = alg.bfs_sigma(eng, int(root), iters=EB_ITERS)
    depth = np.where(np.isinf(dist), np.int64(-1),
                     dist).astype(np.int64)
    dep = eng.chunk(depth)
    sig = eng.chunk(sigma.astype(np.float64))
    delta = eng.map_chunks_i(_w116_zero)
    for level in range(EB_ITERS, 0, -1):
        x = eng.map_chunks_i(partial(_w117_coeff, level=level),
                             dep, delta, sig)
        delta = eng.spmv_apply_refs(
            x, "plus_times", partial(_w117_back, level=level), 1,
            dep, delta, sig)[0]
    vt = _ray.data.from_arrow_refs(
        eng.map_chunks_i(_w117_vtab, dep, sig, delta))

    both = ctx.graph("sym").dedup_sum().edges.select_columns(
        ["src", "dst"])
    j1 = hash_join_tasks(
        both, vt.select_columns(["v", "dist", "sig"]),
        on="src", right_on="v",
        post=lambda t: pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "du": t.column("dist"), "su": t.column("sig")}))
    j2 = hash_join_tasks(
        j1, vt, on="dst", right_on="v",
        post=lambda t: pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "du": t.column("du"), "su": t.column("su"),
            "dv": t.column("dist"), "sv": t.column("sig"),
            "deltav": t.column("delta")}))
    cand = j2.map_batches(partial(_w117_score, k=EB_TOPK),
                          batch_format="pyarrow").to_pandas()
    a = cand.a.to_numpy(dtype=np.int64)
    b = cand.b.to_numpy(dtype=np.int64)
    sc = cand.sc.to_numpy(dtype=np.float64)
    o = np.lexsort((b, a, -sc))[:EB_TOPK]
    return pa.table({
        "src_label": _label_col(ctx, a[o]),
        "dst_label": _label_col(ctx, b[o]),
        "score": pa.array(np.round(sc[o], 6)),
    })


# ---------------------------------------------------------------------------
# wave 118: partition-pruned block-parquet scan (read ONLY the
# diagonal blocks of the 2D grid back from a partitioned sink)
# ---------------------------------------------------------------------------

BPS_G = 4


def _w118_part(b: pa.Table, n: int, g: int) -> pa.Table:
    from ..core.partition import owner

    s = np.asarray(b.column("src"), dtype=np.int64)
    d = np.asarray(b.column("dst"), dtype=np.int64)
    w = np.asarray(b.column("w"), dtype=np.float64)
    bid = owner(d, n, g) * g + owner(s, n, g)
    uk, inv = np.unique(bid, return_inverse=True)
    return pa.table({
        "bid": pa.array(uk),
        "nnz": pa.array(np.bincount(inv).astype(np.int64)),
        "wsum": pa.array(ibincount(inv, w.astype(np.int64),
                                   minlength=len(uk))),
    })


def q_block_prune_scan(sf_dir: str):
    """Partition-pruned 2D-block scan: the edge table is written ONCE
    as hive-partitioned parquet keyed by the CombBLAS 2D block id
    (`write_edges_parquet(partition_by_block=g)`, the
    `InducedSubgraphs2Procs` sink), then ONLY the g diagonal-block
    partitions are read back — `read_parquet` touches just those
    directories with `columns=[...]` pruned, the at-the-read pruning a
    100-TB pipeline relies on (no full-table scan anywhere). Each
    read batch re-derives its block id through the same `owner`
    arithmetic (``SpParMat.cpp:5081``) as an integrity check. Output
    (bid, nnz, wsum) for every NONEMPTY diagonal block."""
    import os
    import shutil

    import ray as _ray

    from ..sources import io as io_src

    ctx = get_context(sf_dir)
    path = os.path.join("/tmp", "cbray_scratch", f"bps_n{ctx.n}")
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    io_src.write_edges_parquet(ctx.graph("directed"), path,
                               partition_by_block=BPS_G)
    import glob

    sel = [b * BPS_G + b for b in range(BPS_G)]
    files = [f for b in sel for f in
             sorted(glob.glob(os.path.join(path, f"bid={b}", "*.parquet")))]
    ds = _ray.data.read_parquet(files, columns=["src", "dst", "w"])
    parts = ds.map_batches(
        partial(_w118_part, n=ctx.n, g=BPS_G),
        batch_format="pyarrow").to_pandas()
    tot_n: dict[int, int] = {}
    tot_w: dict[int, int] = {}
    for _, r in parts.iterrows():
        tot_n[int(r.bid)] = tot_n.get(int(r.bid), 0) + int(r.nnz)
        tot_w[int(r.bid)] = tot_w.get(int(r.bid), 0) + int(r.wsum)
    ks = sorted(tot_n)
    assert all(k in sel for k in ks)  # pruning really pruned
    return pa.table({
        "bid": pa.array(ks, type=pa.int64()),
        "nnz": pa.array([tot_n[k] for k in ks], type=pa.int64()),
        "wsum": pa.array([tot_w[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 119: ViT-style patch extraction census (4x4 non-overlapping
# patches over every image payload)
# ---------------------------------------------------------------------------

PATCH_P = 4


def q_patch_stats(sf_dir: str):
    """ViT-patchification plumbing audit: every image payload is cut
    into non-overlapping PATCH_P x PATCH_P patches (the make_blob
    dims are multiples of 4 by construction); each patch reduces to
    its integer mean (sum // P^2) and the means bucket into 16
    brightness bands (mean // 16). Decode + patchify run in a
    stateful actor pool (header struct compiled once per actor);
    only the 16-bin per-batch partials reach the driver. Output
    (bucket, n_patches). The patch-embedding precursor every
    vision-LM pipeline runs; integer-exact, SQL-regenerable."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="image")
    P = PATCH_P

    class _Patch:
        def __init__(self):
            import struct
            self.header = struct.Struct("<III")

        def __call__(self, batch: pa.Table) -> pa.Table:
            hist = np.zeros(16, dtype=np.int64)
            for payload in batch.column("payload").to_pylist():
                _k, w, h = self.header.unpack_from(payload, 0)
                pix = np.frombuffer(payload, dtype=np.uint8,
                                    offset=self.header.size
                                    ).astype(np.int64).reshape(h, w)
                sums = pix.reshape(h // P, P, w // P, P).sum(axis=(1, 3))
                buckets = (sums // (P * P)) // 16
                hist += np.bincount(buckets.ravel(), minlength=16)
            nz = np.nonzero(hist)[0]
            return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                             "n_patches": pa.array(hist[nz])})

    parts = blobs.map_batches(_Patch, batch_format="pyarrow",
                              batch_size=64, concurrency=2).take_all()
    agg: dict[int, int] = {}
    for r in parts:
        agg[int(r["bucket"])] = agg.get(int(r["bucket"]), 0) \
            + int(r["n_patches"])
    ks = sorted(agg)
    return pa.table({
        "bucket": pa.array(ks, type=pa.int64()),
        "n_patches": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 120: distributed PCA top principal component (one-pass moment
# accumulation + driver-side power iteration on the 64x64 covariance)
# ---------------------------------------------------------------------------

PCA_ITERS = 3
PCA_DIM = 64


def _w120_part(b: pa.Table) -> pa.Table:
    col = b.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mat = np.asarray(col.flatten(), dtype=np.float64
                     ).reshape(b.num_rows, -1)
    S = mat.T @ mat                     # (d, d) second moment
    m = mat.sum(axis=0)                 # (d,) first moment
    d = mat.shape[1]
    return pa.table({
        "idx": pa.array(np.arange(d * d + d + 1, dtype=np.int64)),
        "val": pa.array(np.concatenate([S.reshape(-1), m,
                                        [float(len(mat))]])),
    })


def q_pca_top(sf_dir: str):
    """Distributed PCA, top principal component of the embedding table:
    ONE streaming pass accumulates the (d x d) second moment, the mean
    vector and the count as bounded per-batch partials (the classic
    distributed-PCA moment sketch — d^2 floats per batch, never the
    data); the driver then runs PCA_ITERS power iterations with L2
    normalization on the 64 x 64 covariance C = S/N - mu mu^T from the
    fixed start v0 = 1/8. Output (dim, loading) rounded to 6 decimals
    (sign fixed by the deterministic start; the oracle evaluates the
    algebraically identical per-row iteration). The embedding-table
    twin of the reference's dense-matrix reductions
    (``DenseParMat.h``)."""
    import ray as _ray

    emb = _ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["embedding"])
    parts = emb.map_batches(_w120_part, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    d = PCA_DIM
    acc = np.zeros(d * d + d + 1)
    np.add.at(acc, parts.idx.to_numpy(dtype=np.int64),
              parts.val.to_numpy(dtype=np.float64))
    S = acc[: d * d].reshape(d, d)
    m = acc[d * d: d * d + d]
    N = acc[-1]
    mu = m / N
    C = S / N - np.outer(mu, mu)
    v = np.full(d, 0.125)
    for _ in range(PCA_ITERS):
        v = C @ v
        v = v / np.sqrt((v * v).sum())
    return pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64)),
        "loading": pa.array(np.round(v, 6)),
    })


# ---------------------------------------------------------------------------
# wave 121: structural twin-vertex census (identical open
# neighborhoods -> supernode candidates, the graph-summarization face)
# ---------------------------------------------------------------------------


def _w121_sig(j: pa.Table) -> pa.Table:
    """One src-hash partition: per-vertex digest of the SORTED neighbor
    list (md5-low-64 of the comma-joined ids — DuckDB
    `md5_number_lower` bit-exactly)."""
    from ..functions.text import md5_lower64

    s = np.asarray(j.column("src"), dtype=np.int64)
    d = np.asarray(j.column("dst"), dtype=np.int64)
    if len(s) == 0:
        return pa.table({"sig": pa.array([], type=pa.int64())})
    o = np.lexsort((d, s))
    so, do = s[o], d[o]
    starts = np.nonzero(np.r_[True, so[1:] != so[:-1]])[0]
    ends = np.r_[starts[1:], len(so)]
    sigs = np.fromiter(
        (md5_lower64(",".join(map(str, do[a:b]))) % (1 << 63)
         for a, b in zip(starts, ends)),
        dtype=np.int64, count=len(starts))
    return pa.table({"sig": pa.array(sigs)})


def _w121_cls(j: pa.Table) -> pa.Table:
    sg = np.asarray(j.column("sig"), dtype=np.int64)
    _uk, cnt = np.unique(sg, return_counts=True)
    us, n = np.unique(cnt, return_counts=True)
    return pa.table({"class_size": pa.array(us.astype(np.int64)),
                     "n_classes": pa.array(n.astype(np.int64))})


def q_twin_census(sf_dir: str):
    """Structural twin census — the graph-summarization signal: two
    vertices are (false) TWINS when their open neighborhoods are
    IDENTICAL, so a supernode can replace the whole class (WebGraph /
    modular-decomposition compression; the id-invariant census of
    class sizes). Per src-hash partition every vertex digests its
    sorted adjacency (md5-low-64, DuckDB-bit-exact), classes form by
    ONE digest-keyed group, and only the (class_size, n_classes)
    histogram reaches the driver. Output rows sorted by class_size;
    class_size = 1 means no twin."""
    from ..core.shuffle import group_apply_tasks

    ctx = get_context(sf_dir)
    sym = ctx.graph("sym").dedup_sum().edges
    sigs = group_apply_tasks(sym.select_columns(["src", "dst"]),
                             ["src"], _w121_sig)
    hist = group_apply_tasks(sigs, ["sig"], _w121_cls).to_pandas()
    agg: dict[int, int] = {}
    for _, r in hist.iterrows():
        agg[int(r.class_size)] = agg.get(int(r.class_size), 0) \
            + int(r.n_classes)
    ks = sorted(agg)
    return pa.table({
        "class_size": pa.array(ks, type=pa.int64()),
        "n_classes": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 122: k-anonymity risk census over quasi-identifiers (privacy
# audit with one generalization step)
# ---------------------------------------------------------------------------

KANON_KS = (2, 5, 10, 20)
KANON_WIDTHS = (256, 1024)


def _w122_part(b: pa.Table, width: int) -> pa.Table:
    src = np.asarray(b.column("source")).astype(object)
    lng = np.asarray(b.column("lang")).astype(object)
    nb = np.asarray(b.column("n_chars"), dtype=np.int64) // width
    key = np.char.add(np.char.add(
        np.char.add(src.astype(str), "\x1f"), lng.astype(str)),
        np.char.add("\x1f", nb.astype(str)))
    uk, inv = np.unique(key, return_inverse=True)
    return pa.table({
        "cell": pa.array(uk.astype(object)),
        "docs": pa.array(np.bincount(inv).astype(np.int64)),
    })


def _w122_merge(j: pa.Table) -> pa.Table:
    c = np.asarray(j.column("cell")).astype(object)
    d = np.asarray(j.column("docs"), dtype=np.int64)
    uk, inv = np.unique(c.astype(str), return_inverse=True)
    return pa.table({
        "cell": pa.array(uk.astype(object)),
        "docs": pa.array(ibincount(inv, d, minlength=len(uk))),
    })


def q_kanon_risk(sf_dir: str):
    """k-anonymity risk census — the privacy/governance audit of a
    training corpus: docs grouped by the quasi-identifier triple
    (source, lang, n_chars // width); a doc in a class smaller than k
    is re-identification-prone. Reported for k in KANON_KS at BOTH
    bucket widths (256 and the one-step generalization 1024 — the
    coarsening rescue). Distributed: per-batch cell partials + one
    keyed merge per width; the threshold census is a driver fold over
    the SMALL cell table. Output (width, k, n_cells_below,
    n_docs_below)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks

    rows = []
    for width in KANON_WIDTHS:
        ds = _ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["source", "lang", "n_chars"])
        cells = group_apply_tasks(
            ds.map_batches(partial(_w122_part, width=width),
                           batch_format="pyarrow", zero_copy_batch=True),
            ["cell"], _w122_merge).to_pandas()
        docs = cells.docs.to_numpy(dtype=np.int64)
        for k in KANON_KS:
            below = docs < k
            rows.append((width, k, int(below.sum()),
                         int(docs[below].sum())))
    return pa.table({
        "width": pa.array([r[0] for r in rows], type=pa.int64()),
        "k": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_cells_below": pa.array([r[2] for r in rows],
                                  type=pa.int64()),
        "n_docs_below": pa.array([r[3] for r in rows],
                                 type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 123: resident block-format census (does the DCSC-analog
# hypersparse layout engage on a fine grid?)
# ---------------------------------------------------------------------------

BFMT_G = 32


def q_block_format_census(sf_dir: str):
    """Engine-introspection audit: build the symmetric engine on a
    FINE BFMT_G x BFMT_G grid (small blocks -> power-law tails go
    hypersparse) and report, per resident layout, how many blocks and
    nonzeros chose it. The layout rule is the `_Block` conversion
    itself — a block stores the DCSC-analog compact form
    (``dcsc.h:46-136``) iff nr > HYPERSPARSE_RATIO * nnz — evaluated
    here from the build manifest's per-block nnz (no block is
    loaded), so the driver row proves the documented memory-scaling
    path actually engages. Output (fmt, n_blocks, nnz)."""
    from ..core.engine import _Block
    from ..core.partition import chunk_bounds

    ctx = get_context(sf_dir)
    eng = ctx.engine("sym", g=BFMT_G)
    bounds = chunk_bounds(ctx.n, BFMT_G)
    agg: dict[str, list[int]] = {}
    for b in eng.manifest["blocks"]:
        nr = bounds[int(b["br"])][1] - bounds[int(b["br"])][0]
        nnz = int(b["nnz"])
        fmt = ("hypersparse"
               if nnz and nr > _Block.HYPERSPARSE_RATIO * nnz
               else "csr")
        cur = agg.setdefault(fmt, [0, 0])
        cur[0] += 1
        cur[1] += nnz
    ks = sorted(agg)
    return pa.table({
        "fmt": pa.array(ks),
        "n_blocks": pa.array([agg[k][0] for k in ks], type=pa.int64()),
        "nnz": pa.array([agg[k][1] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 124: content-defined chunking census (Rabin-style polynomial
# window fingerprint, deterministic cutpoints)
# ---------------------------------------------------------------------------

CDC_W = 8
CDC_B = 131
CDC_MASK = 64


def _w124_part(b: pa.Table) -> pa.Table:
    """Per-batch CDC: windowed polynomial fingerprint h(i) =
    sum_{j<W} byte[i-j] * B^j (fits int64: 255 * B^(W-1) * W < 2^63);
    a position cuts when h % MASK == 0. Vectorized via a strided
    correlation — no per-char Python."""
    w = CDC_W
    pw = CDC_B ** np.arange(w, dtype=np.int64)
    counts = []
    for t in b.column("text").to_pylist():
        bt = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        if len(bt) < w:
            counts.append(1)
            continue
        win = np.lib.stride_tricks.sliding_window_view(bt, w)
        # h at position i (0-based end of window): reversed j order:
        # byte[i-j] * B^j  ==  win[:, ::-1] @ pw
        h = win[:, ::-1] @ pw
        counts.append(1 + int((h % CDC_MASK == 0).sum()))
    uk, cnt = np.unique(np.array(counts, dtype=np.int64),
                        return_counts=True)
    return pa.table({"n_chunks": pa.array(uk),
                     "n_docs": pa.array(cnt.astype(np.int64))})


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking census — the dedup-at-scale primitive
    (LBFS/rsync/CDC dedup family): every document is cut wherever the
    W-byte Rabin-style polynomial fingerprint hits 0 mod CDC_MASK,
    so chunk boundaries survive insertions/deletions (unlike
    fixed-size chunking, `chunk_dups`' sibling). Pure int64
    arithmetic (the window polynomial fits without modular
    reduction), vectorized as a strided matvec per batch; only the
    per-batch (n_chunks, n_docs) histogram partials reach the
    driver. Output: per-doc chunk-count histogram."""
    import ray as _ray

    ds = _ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["text"])
    parts = ds.map_batches(_w124_part, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    agg: dict[int, int] = {}
    for _, r in parts.iterrows():
        agg[int(r.n_chunks)] = agg.get(int(r.n_chunks), 0) \
            + int(r.n_docs)
    ks = sorted(agg)
    return pa.table({
        "n_chunks": pa.array(ks, type=pa.int64()),
        "n_docs": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 125: conversion attribution — last-touch vs first-touch credit
# per event type (the marketing-analytics window composition)
# ---------------------------------------------------------------------------


def _w125_credits(j: pa.Table) -> pa.Table:
    """One user-hash partition (every user's full history co-locates):
    sort (user, ts, event_id); segment = #purchases strictly before
    the row; each purchase credits the LAST and FIRST non-purchase
    touch of its own (user, segment) span. Vectorized run logic."""
    u = np.asarray(j.column("user_id"), dtype=np.int64)
    ts = np.asarray(j.column("ts")).astype("datetime64[us]").astype(
        np.int64)
    eid = np.asarray(j.column("event_id"), dtype=np.int64)
    et = np.asarray(j.column("event_type")).astype(object)
    o = np.lexsort((eid, ts, u))
    u, ts, eid, et = u[o], ts[o], eid[o], et[o]
    is_p = et == "purchase"
    # per-user purchases strictly before each row: global cumsum minus
    # its value at the user's first row (seg_global is nondecreasing,
    # so max-accumulate over the start-masked array propagates it)
    starts = np.r_[True, u[1:] != u[:-1]]
    seg = np.cumsum(is_p) - is_p
    seg = seg - np.maximum.accumulate(np.where(starts, seg, -(10**18)))
    key = u * (1 << 32) + seg  # segment key (seg < 2^32 by construction)
    last_c: dict[str, int] = {}
    first_c: dict[str, int] = {}
    tmask = ~is_p
    tk, tfirst = np.unique(key[tmask], return_index=True)
    # last touch index per group: reversed-unique trick
    rk = key[tmask][::-1]
    _, rlast = np.unique(rk, return_index=True)
    tlast = (len(rk) - 1) - rlast
    ttypes = et[tmask]
    t_first_type = dict(zip(tk.tolist(), ttypes[tfirst].tolist()))
    t_last_type = dict(zip(tk.tolist(), ttypes[tlast].tolist()))
    for k in key[is_p].tolist():
        lt = t_last_type.get(k)
        ft = t_first_type.get(k)
        if lt is not None:
            last_c[lt] = last_c.get(lt, 0) + 1
        if ft is not None:
            first_c[ft] = first_c.get(ft, 0) + 1
    types = sorted(set(last_c) | set(first_c))
    return pa.table({
        "event_type": pa.array(types),
        "last_touch": pa.array([last_c.get(t, 0) for t in types],
                               type=pa.int64()),
        "first_touch": pa.array([first_c.get(t, 0) for t in types],
                                type=pa.int64()),
    })


def q_attribution(sf_dir: str):
    """Multi-touch attribution comparison: every purchase credits (a)
    its LAST preceding non-purchase touch and (b) the FIRST touch
    since the user's previous purchase — the two classic attribution
    models, computed in ONE user-keyed shuffle pass (all of a user's
    events co-locate; per-partition run logic is vectorized numpy).
    Purchases with no touch in their span credit nobody. Output
    (event_type, last_touch, first_touch)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks

    ds = _ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    parts = group_apply_tasks(ds, ["user_id"],
                              _w125_credits).to_pandas()
    agg: dict[str, list[int]] = {}
    for _, r in parts.iterrows():
        cur = agg.setdefault(r.event_type, [0, 0])
        cur[0] += int(r.last_touch)
        cur[1] += int(r.first_touch)
    ks = sorted(agg)
    return pa.table({
        "event_type": pa.array(ks),
        "last_touch": pa.array([agg[k][0] for k in ks],
                               type=pa.int64()),
        "first_touch": pa.array([agg[k][1] for k in ks],
                                type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 126: masked SpMV with GraphBLAS write-mask semantics (replace
# vs accumulate)
# ---------------------------------------------------------------------------

MASK_MOD = 3
ACC_MOD = 7


def _w126_fuse(ar, y, bounds):
    a = np.asarray(ar, dtype=np.int64)
    m = (a % MASK_MOD) == 0
    y0 = (a % ACC_MOD).astype(np.float64)
    return np.where(m, y, 0.0), np.where(m, y0 + y, y0)


def q_masked_spmv(sf_dir: str):
    """Masked SpMV under BOTH GraphBLAS write-mask semantics
    (`GrB_REPLACE` vs accumulate — the reference expresses the same
    through `EWiseMult` fringe filtering, ``TopDownBFS.cpp:271``
    family): y = A x with x[v] = arith%11 + 1, mask m = (arith%3==0),
    initial output y0 = arith%7. REPLACE: out = y on m, 0 elsewhere;
    ACCUMULATE: out = y0 + y on m, y0 elsewhere. ONE plus_times SpMV;
    mask/accumulate fused into the combine task (the mask never
    leaves the chunk kernels). Output (label, y_replace, y_accum)
    over all vertices."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    ar = ctx.vdict.arith_slice_refs(eng.bounds)
    rep, acc = eng.spmv_apply_refs(_x_mod11_refs(ctx, eng),
                                   "plus_times", _w126_fuse, 2, ar)
    return pa.table({
        "label": _label_col(ctx, np.arange(ctx.n)),
        "y_replace": pa.array(eng.unchunk(rep)),
        "y_accum": pa.array(eng.unchunk(acc)),
    })


# ---------------------------------------------------------------------------
# wave 127: top-p mass data selection per language (keep the largest
# docs until half the char mass is covered — the curation-budget cut)
# ---------------------------------------------------------------------------

TOPP_NUM = 1
TOPP_DEN = 2  # keep until cumulative mass >= 1/2 of the lang total


def _w127_sel(j: pa.Table) -> pa.Table:
    """One lang-hash partition: sort (lang, n_chars DESC, doc_id ASC),
    per-lang prefix sums, kept = first row where DEN*cumsum >= NUM*total
    (integer cross-multiplied — no float mass)."""
    lg = np.asarray(j.column("lang")).astype(object)
    if len(lg) == 0:
        return pa.table({
            "lang": pa.array([], type=pa.string()),
            "n_docs": pa.array([], type=pa.int64()),
            "char_mass": pa.array([], type=pa.int64()),
            "kept": pa.array([], type=pa.int64()),
        })
    nc = np.asarray(j.column("n_chars"), dtype=np.int64)
    did = np.asarray(j.column("doc_id"), dtype=np.int64)
    o = np.lexsort((did, -nc, lg.astype(str)))
    lg, nc = lg[o], nc[o]
    starts = np.nonzero(np.r_[True, lg[1:] != lg[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(lg)])
    cs = np.cumsum(nc)
    base = np.repeat(np.r_[np.int64(0), cs[starts[1:] - 1]], sizes)
    within = cs - base                       # per-lang prefix mass
    tot = np.repeat(within[starts + sizes - 1], sizes)
    kept_mask = TOPP_DEN * (within - nc) < TOPP_NUM * tot  # rows BEFORE
    # the threshold crossing keep; the crossing row itself also keeps
    rows = []
    for s, z in zip(starts, sizes):
        km = kept_mask[s:s + z]
        kept = int(km.sum())
        rows.append((lg[s], int(z), int(tot[s]), kept))
    return pa.table({
        "lang": pa.array([r[0] for r in rows]),
        "n_docs": pa.array([r[1] for r in rows], type=pa.int64()),
        "char_mass": pa.array([r[2] for r in rows], type=pa.int64()),
        "kept": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def q_topp_selection(sf_dir: str):
    """Top-p mass selection — the curation-budget cut an LLM data
    pipeline applies per language: docs rank by (n_chars DESC, doc_id
    ASC) and the kept prefix is the smallest one covering >= NUM/DEN
    of the language's total char mass (integer cross-multiplied, no
    float thresholds). ONE lang-keyed shuffle; per-partition prefix
    sums are vectorized. Output (lang, n_docs, char_mass, kept)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks

    ds = _ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"])
    return group_apply_tasks(ds, ["lang"], _w127_sel).to_pandas()


# ---------------------------------------------------------------------------
# wave 128: repo boilerplate census (repeated-line detection over the
# raw corpus content — the dedup signal BELOW document granularity)
# ---------------------------------------------------------------------------


def _w128_lines(b: pa.Table) -> pa.Table:
    """Vectorized per-batch import-line extraction: Arrow split on
    newline, keep 'import ' lines, emit (repo, line) pairs."""
    import pyarrow.compute as pc

    parts = pc.split_pattern(b.column("content"), "\n")
    flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
        else parts
    lens = pc.list_value_length(flat).to_numpy(zero_copy_only=False)
    lines = flat.flatten()
    repo = np.repeat(np.asarray(b.column("repo")).astype(object),
                     lens.astype(np.int64))
    keep = pc.starts_with(lines, "import ").to_numpy(
        zero_copy_only=False).astype(bool)
    return pa.table({
        "repo": pa.array(repo[keep]),
        "line": pa.array(np.asarray(lines).astype(object)[keep]),
    })


def _w128_census(j: pa.Table) -> pa.Table:
    rp = np.asarray(j.column("repo")).astype(object)
    ln = np.asarray(j.column("line")).astype(object)
    if len(rp) == 0:
        return pa.table({
            "repo": pa.array([], type=pa.string()),
            "n_imports": pa.array([], type=pa.int64()),
            "distinct_imports": pa.array([], type=pa.int64()),
            "max_repeat": pa.array([], type=pa.int64()),
        })
    key = np.char.add(np.char.add(rp.astype(str), "\x1f"),
                      ln.astype(str))
    uk, inv, cnt = np.unique(key, return_inverse=True,
                             return_counts=True)
    urepo = np.array([k.split("\x1f", 1)[0] for k in uk], dtype=object)
    ur, rinv = np.unique(urepo.astype(str), return_inverse=True)
    tot = ibincount(rinv, cnt.astype(np.int64), minlength=len(ur))
    dst = np.bincount(rinv, minlength=len(ur)).astype(np.int64)
    mx = np.zeros(len(ur), dtype=np.int64)
    np.maximum.at(mx, rinv, cnt.astype(np.int64))
    return pa.table({
        "repo": pa.array(ur.astype(object)),
        "n_imports": pa.array(tot),
        "distinct_imports": pa.array(dst),
        "max_repeat": pa.array(mx),
    })


def q_repo_boilerplate(sf_dir: str):
    """Repo-level boilerplate census — the sub-document dedup signal
    (license headers / generated imports repeated across a repo's
    files): the RAW content column is split on newlines with Arrow
    kernels (no Python over chars), 'import' lines key a (repo, line)
    shuffle, and each repo reports total import lines, distinct
    import lines, and the multiplicity of its most-repeated line
    (max_repeat >> 1 = boilerplate). Output (repo, n_imports,
    distinct_imports, max_repeat); integer-exact."""
    from ..core.shuffle import group_apply_tasks

    n = corpus_src.n_files_for(sf_dir)
    corpus = corpus_src.corpus_dataset(n)
    pairs = corpus.map_batches(_w128_lines, batch_format="pyarrow",
                               zero_copy_batch=True)
    return group_apply_tasks(pairs, ["repo"], _w128_census).to_pandas()


# ---------------------------------------------------------------------------
# wave 129: dedup-discounted effective token budget per source (each
# doc counts 1/cluster-size of its mass)
# ---------------------------------------------------------------------------


def _w129_sizes(j: pa.Table) -> pa.Table:
    c = np.asarray(j.column("cluster"), dtype=np.int64)
    uk, cnt = np.unique(c, return_counts=True)
    return pa.table({"cluster": pa.array(uk),
                     "sz": pa.array(cnt.astype(np.int64))})


def _w129_part(b: pa.Table) -> pa.Table:
    src = np.asarray(b.column("source")).astype(object)
    nc = np.asarray(b.column("n_chars"), dtype=np.float64)
    szc = b.column("sz").to_numpy(zero_copy_only=False).astype(
        np.float64)
    sz = np.where(np.isnan(szc), 1.0, szc)
    uk, inv = np.unique(src.astype(str), return_inverse=True)
    raw = ibincount(inv, nc.astype(np.int64), minlength=len(uk))
    eff = np.bincount(inv, weights=nc / sz, minlength=len(uk))
    return pa.table({
        "source": pa.array(uk.astype(object)),
        "raw": pa.array(raw),
        "eff": pa.array(eff),
    })


def q_effective_tokens(sf_dir: str):
    """Dedup-discounted data budget — the planning number an LLM run
    actually trains on: every document contributes its char mass
    divided by its near-dup CLUSTER size (clusters = fixed-round
    min-label CC over the exact Jaccard pair graph, `dup_clusters`;
    docs in no pair count fully). Per source: raw vs effective mass —
    the gap IS the redundancy tax. One cluster-size group + two
    co-partitioned joins + per-batch source partials. Output
    (source, raw_chars, effective_chars rounded 6)."""
    import ray as _ray

    from ..core.shuffle import group_apply_tasks, hash_join_tasks
    from ..functions import dedup as D

    docs = _ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"])
    cl = D.dup_clusters(_docs(sf_dir), tau=0.5,
                        rounds=DUP_CLUSTER_ROUNDS)
    sizes = group_apply_tasks(cl, ["cluster"], _w129_sizes)
    cl2 = hash_join_tasks(cl, sizes, on="cluster")
    j = hash_join_tasks(docs, cl2.select_columns(["doc_id", "sz"]),
                        on="doc_id", join_type="left outer")
    parts = j.map_batches(_w129_part,
                          batch_format="pyarrow").to_pandas()
    agg: dict[str, list[float]] = {}
    for _, r in parts.iterrows():
        cur = agg.setdefault(r.source, [0, 0.0])
        cur[0] += int(r.raw)
        cur[1] += float(r.eff)
    ks = sorted(agg)
    return pa.table({
        "source": pa.array(ks),
        "raw_chars": pa.array([agg[k][0] for k in ks],
                              type=pa.int64()),
        "effective_chars": pa.array([round(agg[k][1], 6) for k in ks]),
    })


# ---------------------------------------------------------------------------
# wave 130: PageRank damping sensitivity (north-rule capstone — how
# stable is the ranking when the teleport knob moves?)
# ---------------------------------------------------------------------------

PRDS_D2 = 0.6
PRDS_TOPK = 20


def q_pr_damping_sensitivity(sf_dir: str):
    """Damping sensitivity of the north-rule ranking: PageRank at
    alpha = 0.85 and alpha = PRDS_D2 (same fixed PR_ITERS synchronous
    iterations, both refs-only through the resident engine), scores
    rounded to 6 decimals, ranks taken over the ROUNDED scores
    (deterministic cross-engine: rounding is the oracle-equality
    granularity) with arith-id tie-break. Output: the PRDS_TOPK rows
    of the alpha=0.85 ranking with both scores and both ranks — rank
    churn here = teleport-sensitive hubs."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    r85, _ = pagerank(eng, iters=PR_ITERS)
    r60, _ = pagerank(eng, damping=PRDS_D2, iters=PR_ITERS)
    s85 = np.round(r85 * ctx.n, 6)
    s60 = np.round(r60 * ctx.n, 6)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    o85 = np.lexsort((ar, -s85))
    o60 = np.lexsort((ar, -s60))
    rk85 = np.empty(ctx.n, dtype=np.int64)
    rk85[o85] = np.arange(1, ctx.n + 1)
    rk60 = np.empty(ctx.n, dtype=np.int64)
    rk60[o60] = np.arange(1, ctx.n + 1)
    top = o85[:PRDS_TOPK]
    return pa.table({
        "label": _label_col(ctx, top),
        "s085": pa.array(s85[top]),
        "s060": pa.array(s60[top]),
        "rank85": pa.array(rk85[top]),
        "rank60": pa.array(rk60[top]),
    })


# ---------------------------------------------------------------------------
# wave 131: JSONL interchange roundtrip census (the non-Arrow consumer
# contract, driver-gated)
# ---------------------------------------------------------------------------


def _w131_census(b: pa.Table) -> pa.Table:
    s = np.asarray(b.column("src"), dtype=np.int64)
    d = np.asarray(b.column("dst"), dtype=np.int64)
    w = np.asarray(b.column("w"), dtype=np.float64).astype(np.int64)
    return pa.table({
        "nnz": pa.array([len(s)], type=pa.int64()),
        "srcsum": pa.array([int(s.sum())], type=pa.int64()),
        "dstsum": pa.array([int(d.sum())], type=pa.int64()),
        "wsum": pa.array([int(w.sum())], type=pa.int64()),
    })


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL interchange roundtrip (the non-Arrow consumer contract,
    `write_edges_jsonl`/`read_edges_jsonl`): the edge table is written
    as block-sharded JSONL under /tmp, read back through
    `ray.data.read_json` (byte-range splittable, schema re-normalized
    to the engine contract), and censused — nnz and the exact id/w
    sums must survive the text round trip bit-for-bit. The oracle
    computes the same census from the relational edge derivation, so
    a lossy writer/reader would hash-mismatch. Output one row
    (nnz, srcsum, dstsum, wsum) in DENSE id space (the oracle
    re-derives dense ids as label ranks)."""
    import os
    import shutil

    from ..sources import io as io_src

    ctx = get_context(sf_dir)
    path = os.path.join("/tmp", "cbray_scratch", f"jsonl_n{ctx.n}")
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    io_src.write_edges_jsonl(ctx.graph("directed"), path)
    g2 = io_src.read_edges_jsonl(path, ctx.n)
    parts = g2.edges.map_batches(_w131_census,
                                 batch_format="pyarrow").to_pandas()
    return pa.table({
        "nnz": pa.array([int(parts.nnz.sum())], type=pa.int64()),
        "srcsum": pa.array([int(parts.srcsum.sum())], type=pa.int64()),
        "dstsum": pa.array([int(parts.dstsum.sum())], type=pa.int64()),
        "wsum": pa.array([int(parts.wsum.sum())], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 132: video shot-boundary census (per-frame-pair motion
# thresholding through the decode actor pool)
# ---------------------------------------------------------------------------

SHOT_T = 5000  # per-frame-pair absolute-diff sum above this = a cut


def q_shot_census(sf_dir: str):
    """Shot-boundary detection plumbing — the video curation stage
    that splits clips at scene cuts: every payload decodes in the
    actor pool, each adjacent frame PAIR scores its absolute pixel
    diff sum, pairs above SHOT_T are cuts, shots = cuts + 1 (the
    frame-sample sibling of `video_motion`, which only totals the
    motion). Only the (n_shots, n_videos) histogram partials reach
    the driver. Integer-exact, SQL-regenerable."""
    from ..functions import multimodal as M

    blobs = M.blob_dataset_from_docs(sf_dir, kind="video")

    class _Shots:
        def __init__(self):
            import struct
            self.header = struct.Struct("<III")

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts: dict[int, int] = {}
            for payload in batch.column("payload").to_pylist():
                _k, nf, fsz = self.header.unpack_from(payload, 0)
                fr = np.frombuffer(payload, dtype=np.uint8,
                                   offset=self.header.size
                                   ).astype(np.int64).reshape(nf, fsz)
                dv = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                shots = 1 + int((dv > SHOT_T).sum())
                counts[shots] = counts.get(shots, 0) + 1
            ks = sorted(counts)
            return pa.table({
                "n_shots": pa.array(ks, type=pa.int64()),
                "n_videos": pa.array([counts[k] for k in ks],
                                     type=pa.int64()),
            })

    parts = blobs.map_batches(_Shots, batch_format="pyarrow",
                              batch_size=64, concurrency=2).take_all()
    agg: dict[int, int] = {}
    for r in parts:
        agg[int(r["n_shots"])] = agg.get(int(r["n_shots"]), 0) \
            + int(r["n_videos"])
    ks = sorted(agg)
    return pa.table({
        "n_shots": pa.array(ks, type=pa.int64()),
        "n_videos": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 133: ANN recall audit (exact vs multi-probe LSH, both plans
# driver-gated already — this row gates their AGREEMENT)
# ---------------------------------------------------------------------------


def q_ann_recall_audit(sf_dir: str):
    """Recall@k audit of the approximate similarity-search plan: the
    exact brute-force top-k (`ann_bruteforce_topk`, the 2D-tiled
    baseline) and the multi-probe sign-LSH plan (`ann_lsh_topk`) run
    over the SAME 10 queries; per query, hits = |exact ∩ lsh| — the
    per-query recall numerator the ANN literature reports. Output the
    (hits, n_queries) histogram: any mass below k quantifies exactly
    what the sub-quadratic plan trades away. Both member plans are
    bit-exact-oracled on their own; this row gates their AGREEMENT."""
    import ray as _ray

    from ..functions import ann as A

    emb = _ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    qs = np.arange(10)
    ex = A.ann_bruteforce_topk(emb, qs, k=5).to_pandas()
    ls = A.ann_lsh_topk(emb, qs, k=5).to_pandas()
    ex_set = {(int(r.query_id), int(r.neighbor_id))
              for _, r in ex.iterrows()}
    hits_per_q: dict[int, int] = {int(q): 0 for q in qs}
    for _, r in ls.iterrows():
        if (int(r.query_id), int(r.neighbor_id)) in ex_set:
            hits_per_q[int(r.query_id)] += 1
    agg: dict[int, int] = {}
    for h in hits_per_q.values():
        agg[h] = agg.get(h, 0) + 1
    ks = sorted(agg)
    return pa.table({
        "hits": pa.array(ks, type=pa.int64()),
        "n_queries": pa.array([agg[k] for k in ks], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# wave 134: PageRank mass by repository (north-rule output joined to
# the corpus metadata axis)
# ---------------------------------------------------------------------------

PRREPO_TOPK = 10


def q_pr_mass_by_repo(sf_dir: str):
    """Where does the rank live? PageRank mass aggregated by the
    REPOSITORY each module belongs to (repo = arith % 100, the corpus
    layout): scores stay chunked refs out of the solver; the repo key
    derives per chunk from the dictionary arith slices, so the
    aggregation is a bounded (100-entry) per-chunk partial — no
    vertex-level shuffle at all. Output the PRREPO_TOPK repos by
    (mass DESC, repo ASC): (repo, n_modules, mass rounded 6)."""
    ctx = get_context(sf_dir)
    eng = ctx.engine("directed")
    r, _ = pagerank(eng, iters=PR_ITERS)
    # chunked aggregation: repo key from arith refs, mass partials
    ar_refs = ctx.vdict.arith_slice_refs(eng.bounds)
    # per-vertex scores rounded FIRST (the oracle-equality granularity,
    # same as the green `pagerank` row), then mass-summed
    rref = eng.chunk(np.round(r * ctx.n, 6))

    def _part(ar, rv):
        rep = np.asarray(ar, dtype=np.int64) % 100
        cnt = np.bincount(rep, minlength=100).astype(np.int64)
        mass = np.bincount(rep, weights=rv, minlength=100)
        return cnt, mass

    parts = eng.chunk_scalars(_part, ar_refs, rref)
    cnt = np.sum([p[0] for p in parts], axis=0)
    mass = np.sum([p[1] for p in parts], axis=0)
    o = np.lexsort((np.arange(100), -np.round(mass, 6)))[:PRREPO_TOPK]
    return pa.table({
        "repo": pa.array([f"repo_{i}" for i in o]),
        "n_modules": pa.array(cnt[o], type=pa.int64()),
        "mass": pa.array(np.round(mass[o], 6)),
    })


# ---------------------------------------------------------------------------
# wave 135: Watts-Strogatz small-world generator census (ring lattice
# + deterministic md5 rewiring — the second synthetic-graph source
# beside R-MAT)
# ---------------------------------------------------------------------------

WS_K = 2          # ring neighbors per side
WS_REWIRE_MOD = 10  # ~10% of lattice edges rewire


def _w135_edges(b: pa.Table) -> pa.Table:
    """Per-batch WS edge synthesis: for each vertex i and offset j in
    1..K, the lattice edge (i, (i+j) % n) rewires to a hash-derived
    target iff md5_lower64('ws:i:j') % MOD == 0 — bit-exact in SQL via
    md5_number_lower on the same string."""
    from ..functions.text import md5_lower64

    ids = np.asarray(b.column("id"), dtype=np.int64)
    n = int(b.column("n")[0].as_py())
    src_all, dst_all = [], []
    for j in range(1, WS_K + 1):
        h = np.fromiter((md5_lower64(f"ws:{int(i)}:{j}") for i in ids),
                        dtype=np.uint64, count=len(ids)).astype(object)
        lat = (ids + j) % n
        rew = np.array([int(x) % WS_REWIRE_MOD == 0 for x in h])
        tgt = np.array([int(x) // WS_REWIRE_MOD % n for x in h],
                       dtype=np.int64)
        tgt = np.where(tgt == ids, (tgt + 1) % n, tgt)
        dst = np.where(rew, tgt, lat)
        src_all.append(ids)
        dst_all.append(dst)
    return pa.table({
        "src": pa.array(np.concatenate(src_all)),
        "dst": pa.array(np.concatenate(dst_all)),
        "w": pa.array(np.ones(len(ids) * WS_K)),
    })


def q_ws_census(sf_dir: str):
    """Watts-Strogatz small-world generator (`GenGraph500Data`'s
    deterministic-synthesis contract applied to the OTHER classic
    model, ``DistEdgeList.cpp:222-280`` family): ring lattice of K=2
    neighbors per side over n = corpus-size vertices, each lattice
    edge rewired to an md5-derived target with probability 1/10 —
    every coin and target is md5-low-64 of 'ws:i:j', so DuckDB
    regenerates the graph bit-exactly. Census: the distinct-pair
    undirected degree histogram (the small-world signature: a sharp
    peak at 2K with a rewiring tail). Output (deg, n_vertices)."""
    import ray as _ray

    from ..core.graph import Graph
    from ..core.shuffle import group_apply_tasks

    n = corpus_src.n_files_for(sf_dir)
    base = _ray.data.range(n).map_batches(
        lambda t: pa.table({"id": t.column("id"),
                            "n": pa.array([n] * t.num_rows,
                                          type=pa.int64())}),
        batch_format="pyarrow")
    edges = base.map_batches(_w135_edges, batch_format="pyarrow")
    und = Graph(n=n, edges=edges).union_max().edges
    deg = group_apply_tasks(und, ["src"], _w110_deg).to_pandas()
    uk, cnt = np.unique(deg.c.to_numpy(dtype=np.int64),
                        return_counts=True)
    return pa.table({
        "deg": pa.array(uk, type=pa.int64()),
        "n_vertices": pa.array(cnt.astype(np.int64)),
    })


# ---------------------------------------------------------------------------
# wave 136: BFS level trace over the GENERATED Watts-Strogatz graph
# (engine-over-generator: the resident-block machinery runs on
# synthesized inputs, driver-gated)
# ---------------------------------------------------------------------------

WSB_ROUNDS = 8


def q_ws_bfs_trace(sf_dir: str):
    """Small-world reachability trace: the Watts-Strogatz graph from
    `ws_census` is built into a RESIDENT block engine (the same
    build_blocks -> CsrPoolActor path the corpus rides — proving the
    engine consumes generated sources end-to-end, the Graph500 BFS
    contract as a driver row), then WSB_ROUNDS min_plus BFS levels run
    from vertex 0. Output (round, n_reached): the rewired shortcuts
    make reach grow far faster than the 2K+1 lattice cone."""
    import os

    import ray as _ray

    from ..core.engine import SpmvEngine
    from ..core.graph import Graph
    from ..pipelines.context import CKPT_ROOT

    n = corpus_src.n_files_for(sf_dir)
    base = _ray.data.range(n).map_batches(
        lambda t: pa.table({"id": t.column("id"),
                            "n": pa.array([n] * t.num_rows,
                                          type=pa.int64())}),
        batch_format="pyarrow")
    g = Graph(n=n, edges=base.map_batches(
        _w135_edges, batch_format="pyarrow")).union_max()
    eng = SpmvEngine.from_graph(
        g, 4, os.path.join(CKPT_ROOT, f"n{n}", "ws_g4"),
        structural=True)
    d = eng.map_chunks_i(partial(_w111_seed_at, root=0))
    rows = []
    for r in range(WSB_ROUNDS + 1):
        reached = int(sum(eng.chunk_scalars(_w136_count, d)))
        rows.append((r, reached))
        if r < WSB_ROUNDS:
            d = eng.spmv_apply_refs(d, "min_plus", _w111_relax, 1, d)[0]
    eng.shutdown()
    return pa.table({
        "round": pa.array([x[0] for x in rows], type=pa.int64()),
        "n_reached": pa.array([x[1] for x in rows], type=pa.int64()),
    })


def _w111_seed_at(bounds, root):
    s, e = bounds
    d = np.full(e - s, np.inf)
    if s <= root < e:
        d[root - s] = 0.0
    return d


def _w136_count(d):
    return int(np.isfinite(d).sum())
