"""Brute twins for wave 33: spectral moment, idempotency dedup,
multiset intersect, continuous percentile, Pareto coverage."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_closed_walks4_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_closed_walks4(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    out = {}
    for s_, d_ in pairs:
        out.setdefault(s_, []).append(d_)
    two = Counter()
    for s_, d_ in pairs:
        for d2 in out.get(d_, ()):
            two[(s_, d2)] += 1
    want = sum(c * two.get((j, i), 0) for (i, j), c in two.items())
    assert got.closed_walks4[0] == want


def test_idem_dedup_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_idem_dedup(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    minute = (ev.ts.astype("datetime64[us]").astype("int64")
              // q.IDEM_BUCKET_US)
    df = pd.DataFrame({"t": ev.event_type, "u": ev.user_id, "m": minute})
    for et, g in df.groupby("t"):
        assert got.loc[et, "n_events"] == len(g)
        assert got.loc[et, "n_keys"] == len(set(zip(g.u, g.m)))


def test_token_intersect_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_token_intersect(SF).to_pandas()
    docs = _pq("documents")
    ca, cb = Counter(), Counter()
    for lang, text in zip(docs.lang, docs.text):
        if lang == q.TE_LANG_A:
            ca.update(text.split(" "))
        elif lang == q.TE_LANG_B:
            cb.update(text.split(" "))
    mass = sum(min(ca[t], cb[t]) for t in ca if t in cb)
    common = sum(1 for t in ca if t in cb)
    assert got.intersect_mass[0] == mass
    assert got.common_tokens[0] == common


def test_pctl_cont_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pctl_cont(SF).to_pandas().set_index("event_type")
    ev = _pq("events")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "c": cents})
    for et, g in df.groupby("t"):
        v = np.sort(g.c.to_numpy())
        n = len(v)
        pos = (n - 1) * q.PCTL_NUM
        k, rem = pos // q.PCTL_DEN, pos % q.PCTL_DEN
        lo = v[k]
        hi = v[min(k + 1, n - 1)] if rem else lo
        assert got.loc[et, "lo"] == lo
        assert got.loc[et, "hi"] == hi
        assert got.loc[et, "frac_num"] == rem
        # interpolated value equals numpy percentile (linear) exactly
        # when reconstructed from the rationals
        interp = lo + (hi - lo) * rem / q.PCTL_DEN
        assert np.isclose(interp, np.percentile(
            v, 100 * q.PCTL_NUM / q.PCTL_DEN))


def test_pareto80_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_pareto80(SF).to_pandas()
    orders = _pq("orders")
    orders["cents"] = np.floor(
        orders.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    s = np.sort(orders.groupby("o_custkey").cents.sum().to_numpy())[::-1]
    total = s.sum()
    cum = np.cumsum(s)
    n_top = int(np.argmax(100 * cum >= q.PARETO_PCT * total)) + 1
    assert got.n_top[0] == n_top
    assert got.covered_cents[0] == cum[n_top - 1]
    assert got.total_cents[0] == total
