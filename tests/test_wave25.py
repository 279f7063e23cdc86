"""Brute twins for wave 25: language mixing, monthly buckets, party
union, degree moments, per-language quality."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_lang_mixing_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_lang_mixing(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    arith = np.asarray(ctx.arith)
    cnt = Counter()
    for s, d in zip(e.src, e.dst):
        cnt[(q.LANG_NAMES[arith[s] % 4], q.LANG_NAMES[arith[d] % 4])] += 1
    assert {(a, b): c for a, b, c in
            zip(got.lang_src, got.lang_dst, got.cnt)} == dict(cnt)


def test_orders_monthly_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_orders_monthly(SF).to_pandas()
    orders = _pq("orders")
    cents = np.floor(orders.o_totalprice.to_numpy() * 100.0).astype(
        np.int64)
    df = pd.DataFrame({"y": orders.o_orderdate.dt.year,
                       "m": orders.o_orderdate.dt.month, "c": cents})
    want = df.groupby(["y", "m"], as_index=False).agg(
        n_orders=("c", "size"), total_cents=("c", "sum"))
    got = got.sort_values(["o_year", "o_month"]).reset_index(drop=True)
    want = want.sort_values(["y", "m"]).reset_index(drop=True)
    assert got.n_orders.tolist() == want.n_orders.tolist()
    assert got.total_cents.tolist() == want.total_cents.tolist()


def test_party_counts_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_party_counts(SF).to_pandas().set_index("n_name")
    cust, sup, nat = _pq("customer"), _pq("supplier"), _pq("nation")
    nm = dict(zip(nat.n_nationkey, nat.n_name))
    for nk, name in nm.items():
        c = cust[cust.c_nationkey == nk]
        s = sup[sup.s_nationkey == nk]
        assert got.loc[name, "n_customers"] == len(c)
        assert got.loc[name, "n_suppliers"] == len(s)
        assert got.loc[name, "cust_bal_cents"] == int(np.floor(
            c.c_acctbal.to_numpy() * 100.0).sum()) if len(c) else True
        assert got.loc[name, "supp_bal_cents"] == int(np.floor(
            s.s_acctbal.to_numpy() * 100.0).sum()) if len(s) else True


def test_degree_moments_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_degree_moments(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    nbrs = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    degs = np.array([len(v) for v in nbrs.values()], dtype=np.int64)
    assert got.n_vertices[0] == len(degs)
    assert got.deg_sum[0] == degs.sum()
    assert got.wedges[0] == (degs * (degs - 1) // 2).sum()
    assert got.claws[0] == (degs * (degs - 1) * (degs - 2) // 6).sum()


def test_quality_by_lang_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_quality_by_lang(SF).to_pandas().set_index("lang")
    docs = _pq("documents")
    for lang, g in docs.groupby("lang"):
        nt = nd = ch = 0
        for t in g.text:
            toks = t.split(" ")
            nt += len(toks)
            nd += len(set(toks))
            ch += sum(len(x) for x in toks)
        assert got.loc[lang, "n_docs"] == len(g)
        assert got.loc[lang, "sum_tokens"] == nt
        assert got.loc[lang, "sum_distinct"] == nd
        assert got.loc[lang, "sum_tok_chars"] == ch
