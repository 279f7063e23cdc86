"""Brute twins for wave 59: C(k) curve, decile-priority grid,
dup-cluster purity, core-periphery mixing, last-order status."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def _und(ctx):
    e = ctx.edges.to_pandas()
    nbrs: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(int(s), set()).add(int(d))
            nbrs.setdefault(int(d), set()).add(int(s))
    return nbrs


def test_cc_by_degree_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_cc_by_degree(SF).to_pandas().set_index("log2_deg")
    nbrs = _und(get_context(SF))
    agg: dict[int, list[int]] = {}
    for v, ns in nbrs.items():
        d = len(ns)
        if d < 2:
            continue
        tri = sum(len(ns & nbrs[u]) for u in ns) // 2
        b = int(np.floor(np.log2(d)))
        e = agg.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += tri
        e[2] += d * (d - 1) // 2
    assert len(got) == len(agg)
    for b, (n, t, w) in agg.items():
        row = got.loc[b]
        assert (row.n_vertices, row.sum_tri, row.sum_wedges) == (n, t, w)


def test_decile_priority_grid_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_decile_priority_grid(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    s = (o.groupby("o_custkey").cents.sum().reset_index()
          .sort_values(["cents", "o_custkey"]).reset_index(drop=True))
    n = len(s)
    s["dec"] = (np.arange(n) * q.LORENZ_BUCKETS // n)
    dmap = dict(zip(s.o_custkey, s.dec))
    want = Counter((dmap[ck], pr) for ck, pr in
                   zip(o.o_custkey, o.o_orderpriority))
    got_d = {(r.decile, r.o_orderpriority): r.n_orders
             for r in got.itertuples()}
    assert got_d == dict(want)


def test_dup_cluster_purity_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_dup_cluster_purity(SF).to_pandas()
    lab = q.q_dup_clusters(SF).to_pandas()
    lang = dict(zip(_pq("documents").doc_id, _pq("documents").lang))
    pure = mixed = 0
    for cl, g in lab.groupby("cluster"):
        ls = {lang[d] for d in g.doc_id}
        if len(ls) == 1:
            pure += 1
        else:
            mixed += 1
    assert (got.n_clusters[0], got.n_pure[0], got.n_mixed[0]) == (
        pure + mixed, pure, mixed)


def test_core_periphery_mix_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_core_periphery_mix(SF).to_pandas()
    ctx = get_context(SF)
    nbrs = _und(ctx)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in nbrs.items():
        deg[v] = len(ns)
    S = set(np.lexsort((ar, -deg))[:q.APSP_K].tolist())
    cc = cp = pp = 0
    for u, ns in nbrs.items():
        for v in ns:
            if u < v:
                k = (u in S) + (v in S)
                if k == 2:
                    cc += 1
                elif k == 1:
                    cp += 1
                else:
                    pp += 1
    assert (got.n_cc[0], got.n_cp[0], got.n_pp[0]) == (cc, cp, pp)


def test_last_order_status_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_last_order_status(SF).to_pandas()
    o = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                   "o_orderkey"])
    last = o.groupby("o_custkey").tail(1)
    want = last.o_orderstatus.value_counts().to_dict()
    assert dict(zip(got.o_orderstatus, got.n_customers)) == want
