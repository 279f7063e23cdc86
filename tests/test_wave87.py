"""Brute twins for wave 87: Cheeger threshold sweep, SimRank hub
pairs, weighted systematic sampling."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _deflated_vec, _und

SF = "/root/testdata/sf0.001"


def test_cheeger_sweep_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    src, dst = _und(ctx)
    v, _ = _deflated_vec(ctx, src, dst, q.EIG_ITERS)
    vr = np.round(v, 9)
    deg = np.bincount(src, minlength=ctx.n)
    vt = int(deg.sum())
    got = q.q_cheeger_sweep(SF).to_pandas().set_index("b")
    n_rows = 0
    for b in range(1, q.CHEEGER_B):
        t = -1.0 + 2.0 * b / q.CHEEGER_B
        side = vr <= t
        nin = int(side.sum())
        if nin == 0 or nin == ctx.n:
            assert b not in got.index
            continue
        n_rows += 1
        cut = int((side[src] & ~side[dst]).sum())
        vol = int(deg[side].sum())
        vmin = min(vol, vt - vol)
        row = got.loc[b]
        assert row.n_in == nin
        assert row.cut_edges == cut
        assert abs(row.conductance
                   - (cut / vmin if vmin > 0 else 0.0)) < 2e-6
    assert len(got) == n_rows
    # the sweep curve must contain a nontrivial minimum
    assert got.conductance.min() < 1.0


def test_simrank_pairs_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(s[keep] * ctx.n + d[keep])
    es, ed = key // ctx.n, key % ctx.n
    indeg = np.bincount(ed, minlength=ctx.n).astype(np.int64)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    top = np.lexsort((ar, -indeg))[:q.SIMRANK_HUBS]
    innb = {h: set(es[ed == h]) for h in top}
    c = q.SIMRANK_C

    def s1(i, j):
        if i == j:
            return 1.0
        di, dj = indeg[i], indeg[j]
        if di == 0 or dj == 0:
            return 0.0
        cn = len(set(es[ed == i]) & set(es[ed == j]))
        return c * cn / (di * dj)

    got = q.q_simrank_pairs(SF).to_pandas()
    for _, row in got.iterrows():
        a, b = top[int(row.pa) - 1], top[int(row.pb) - 1]
        ia, ib = innb[a], innb[b]
        assert abs(row.s1 - s1(a, b)) < 2e-6
        s2 = c / (len(ia) * len(ib)) * sum(
            s1(i, j) for i in ia for j in ib)
        assert abs(row.s2 - s2) < 2e-6
    # SimRank is bounded by c
    assert (got.s2 <= q.SIMRANK_C + 1e-9).all()


def test_weighted_systematic_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    o = o.sort_values("o_orderkey").reset_index(drop=True)
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype(
        np.int64)
    cum = np.cumsum(cents)
    W = int(cum[-1])
    th = (2 * np.arange(q.WSYS_K, dtype=np.int64) + 1) * W // (
        2 * q.WSYS_K)
    idx = np.searchsorted(cum, th, side="right")
    got = q.q_weighted_systematic(SF).to_pandas().sort_values(
        "j").reset_index(drop=True)
    assert len(got) == q.WSYS_K
    assert (got.j.to_numpy() == np.arange(q.WSYS_K)).all()
    assert (got.o_orderkey.to_numpy()
            == o.o_orderkey.to_numpy()[idx]).all()
    assert (got.cents.to_numpy() == cents[idx]).all()
    # heavier orders are picked at least proportionally often: the
    # sampled mean weight must exceed the population mean
    assert got.cents.mean() > cents.mean()
