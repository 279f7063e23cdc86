"""Brute twins for wave 32: relational division, RANGE frame,
apportionment, mobility matrix, time heatmap."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_supplies_all_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = sorted(q.q_supplies_all(SF).to_pandas().l_suppkey)
    li, part = _pq("lineitem"), _pq("part")
    bp = set(part[part.p_brand == q.Q17_BRAND].p_partkey)
    bl = li[li.l_partkey.isin(bp)]
    pop = bl.groupby("l_partkey").size().reset_index(name="c")
    pop = pop.sort_values(["c", "l_partkey"],
                          ascending=[False, True]).head(q.DIV_TOPK)
    target = set(pop.l_partkey)
    have = li[li.l_partkey.isin(target)].groupby(
        "l_suppkey").l_partkey.nunique()
    want = sorted(have[have == len(target)].index)
    assert got == want


def test_range_frame_sum_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_range_frame_sum(SF).to_pandas().set_index("event_id")
    ev = _pq("events")
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["cents"] = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        us = g.us.to_numpy()
        c = g.cents.to_numpy()
        for i, eid in enumerate(g.event_id):
            inframe = (us >= us[i] - q.RANGE_WIN_US) & (us <= us[i])
            assert got.loc[eid, "range_cents"] == c[inframe].sum()


def test_mixture_alloc_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_mixture_alloc(SF).to_pandas().set_index("lang")
    docs = _pq("documents")
    mass = {}
    for lang, g in docs.groupby("lang"):
        mass[lang] = sum(len(t.split(" ")) for t in g.text)
    total = sum(mass.values())
    base = {l: q.MIX_TOTAL * m // total for l, m in mass.items()}
    rem = {l: q.MIX_TOTAL * m % total for l, m in mass.items()}
    left = q.MIX_TOTAL - sum(base.values())
    for l in sorted(mass, key=lambda x: (-rem[x], x))[:left]:
        base[l] += 1
    assert got.seats.sum() == q.MIX_TOTAL
    for l in mass:
        assert got.loc[l, "tokens"] == mass[l]
        assert got.loc[l, "seats"] == base[l]


def test_mobility_matrix_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_mobility_matrix(SF).to_pandas()
    orders = _pq("orders")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)

    def spend(y):
        m = orders[(orders.o_orderdate >= f"{y}-01-01")
                   & (orders.o_orderdate < f"{y + 1}-01-01")]
        return m.groupby("o_custkey").cents.sum()

    def quart(s):
        v = np.sort(s.to_numpy())
        n = len(v)
        ts = [v[max(1, -(-p * n // 100)) - 1] for p in (25, 50, 75)]
        return s.map(lambda x: 1 + sum(x > t for t in ts))

    sa, sb = spend(q.MOB_YEAR_A), spend(q.MOB_YEAR_B)
    qa, qb = quart(sa), quart(sb)
    both = sorted(set(sa.index) & set(sb.index))
    cnt = Counter((qa[c], qb[c]) for c in both)
    assert {(a, b): c for a, b, c in
            zip(got.q_a, got.q_b, got.cnt)} == dict(cnt)


def test_dow_hour_heat_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_dow_hour_heat(SF).to_pandas()
    ev = _pq("events")
    us = ev.ts.astype("datetime64[us]").astype("int64")
    dow = (us // 86_400_000_000 + 4) % 7
    hour = (us // 3_600_000_000) % 24
    cnt = Counter(zip(dow, hour))
    assert {(d, h): c for d, h, c in
            zip(got.dow, got.hour, got.cnt)} == dict(cnt)
