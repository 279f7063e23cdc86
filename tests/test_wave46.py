"""Brute twins for wave 46: class outliers, vertex net flow, DAG layer
histogram, linenumber audit, cross-repo cut."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_class_outliers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_class_outliers(SF).to_pandas().set_index("label")
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    lab = emb.label.to_numpy()
    for l in np.unique(lab):
        sub = mat[lab == l]
        cent = np.array([sub[:, d].sum() // len(sub)
                         for d in range(sub.shape[1])], dtype=np.int64)
        d2 = ((sub - cent) ** 2).sum(axis=1)
        s = d2.sum()
        out = (d2 * len(sub) > 2 * s).sum()
        assert got.loc[l, "n"] == len(sub)
        assert got.loc[l, "n_outliers"] == out


def test_vertex_netflow_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_vertex_netflow(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    outw = Counter()
    inw = Counter()
    for s, d, w in zip(e.src, e.dst, e.w):
        outw[s] += int(w)
        inw[d] += int(w)
    net = np.array([outw.get(v, 0) - inw.get(v, 0)
                    for v in range(ctx.n)], dtype=np.int64)
    assert got.n_sources[0] == int((net > 0).sum())
    assert got.n_sinks[0] == int((net < 0).sum())
    assert got.n_balanced[0] == int((net == 0).sum())
    assert got.max_net[0] == net.max()
    assert got.min_net[0] == net.min()


def test_dag_layer_hist_consistent(ray_session):
    from combblas_ray.pipelines import queries as q

    layers = q.q_dag_layers(SF).to_pandas()
    hist = q.q_dag_layer_hist(SF).to_pandas().set_index("layer")
    cnt = Counter(layers.layer)
    assert dict(zip(hist.index, hist.n_vertices)) == dict(cnt)


def test_linenumber_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_linenumber_audit(SF).to_pandas()
    li = _pq("lineitem")
    g = li.groupby("l_orderkey").l_linenumber.agg(["max", "size"])
    assert got.n_orders[0] == len(g)
    assert got.n_violations[0] == int((g["max"] != g["size"]).sum())


def test_repo_cross_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_repo_cross_topk(SF).to_pandas()
    ctx = get_context(SF)
    arith = np.asarray(ctx.arith)
    e = ctx.edges.to_pandas()
    cnt = Counter()
    for s, d in zip(e.src, e.dst):
        ra, rb = arith[s] % 100, arith[d] % 100
        if ra != rb:
            cnt[(ra, rb)] += 1
    total = sum(cnt.values())
    top = sorted(cnt, key=lambda k: (-cnt[k], k))[:q.XREPO_TOPK]
    assert list(zip(got.repo_a, got.repo_b, got.cnt)) == [
        (f"repo_{a}", f"repo_{b}", cnt[(a, b)]) for a, b in top]
    assert (got.total_cut == total).all()
