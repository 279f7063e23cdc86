"""Brute twins for wave 40: LCC share, rank-cut top spenders,
neighborhood diversity, segment median, farthest pair."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_lcc_share_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_lcc_share(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    parent = list(range(ctx.n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(e.src, e.dst):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    sizes = Counter(find(v) for v in range(ctx.n))
    # 12 fixed rounds converge on this graph (cc_fixed is the green
    # driver query), so union-find sizes match
    assert got.n[0] == ctx.n
    assert got.lcc_size[0] == max(sizes.values())
    assert got.n_components[0] == len(sizes)


def test_top_spenders_ties_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_top_spenders_ties(SF).to_pandas()
    orders = _pq("orders")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    s = orders.groupby("o_custkey").cents.sum()
    ranked = s.sort_values(ascending=False)
    above = {v: int((ranked > v).sum()) for v in ranked.unique()}
    keep = {c: v for c, v in s.items() if above[v] + 1 <= q.RANK_CUT}
    want = sorted(((-v, c) for c, v in keep.items()))
    assert list(zip(got.o_custkey, got.cents)) == [
        (c, -nv) for nv, c in want]


def test_nbr_lang_div_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_nbr_lang_div(SF).to_pandas().set_index("n_langs")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    arith = np.asarray(ctx.arith)
    langs = {}
    for s, d in zip(e.src, e.dst):
        langs.setdefault(s, set()).add(arith[d] % 4)
    cnt = Counter(len(v) for v in langs.values())
    assert dict(zip(got.index, got.n_vertices)) == dict(cnt)


def test_segment_median_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_segment_median(SF).to_pandas().set_index("c_mktsegment")
    orders, cust = _pq("orders"), _pq("customer")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100.0).astype(
        np.int64)
    for seg, g in j.groupby("c_mktsegment"):
        v = np.sort(g.cents.to_numpy())
        assert got.loc[seg, "median_cents"] == v[(len(v) - 1) // 2]
        assert got.loc[seg, "n_orders"] == len(v)


def test_farthest_pair_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_farthest_pair(SF).to_pandas()
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.FP_N].sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    ids = emb.vec_id.to_numpy()
    d = Q @ Q.T
    best = None
    for a in range(len(Q)):
        for b in range(a + 1, len(Q)):
            cand = (d[a, b], ids[a], ids[b])
            if best is None or cand < best:
                best = cand
    assert (got["dot"][0], got["i"][0], got["j"][0]) == best
