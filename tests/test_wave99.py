"""Brute twins for wave 99: degree Kendall tau-b, segment Gini,
deseasonalized anomaly top-k."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave94 import _daily

SF = "/root/testdata/sf0.001"


def test_deg_kendall_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(s[keep] * ctx.n + d[keep])  # distinct directed
    s2, d2 = key // ctx.n, key % ctx.n
    x = np.bincount(d2, minlength=ctx.n)  # in-degree
    y = np.bincount(s2, minlength=ctx.n)  # out-degree
    n = ctx.n
    nc = nd = tx = ty = txy = 0
    # brute O(n^2) fold on the small fixture
    for i in range(n):
        xi, yi = x[i], y[i]
        gt = (x[i + 1:] > xi)
        lt = (x[i + 1:] < xi)
        eq = (x[i + 1:] == xi)
        ygt = (y[i + 1:] > yi)
        ylt = (y[i + 1:] < yi)
        yeq = (y[i + 1:] == yi)
        nc += int((gt & ygt).sum() + (lt & ylt).sum())
        nd += int((gt & ylt).sum() + (lt & ygt).sum())
        tx += int((eq & ~yeq).sum())
        ty += int((yeq & ~eq).sum())
        txy += int((eq & yeq).sum())
    got = q.q_deg_kendall(SF).to_pandas().iloc[0]
    assert (int(got.n), int(got.nc), int(got.nd), int(got.tx_pairs),
            int(got.ty_pairs), int(got.txy_pairs)) == \
        (n, nc, nd, tx, ty, txy)
    assert nc + nd + tx + ty + txy == n * (n - 1) // 2


def test_segment_gini_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    t = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    seg = np.asarray(t.column("c_mktsegment")).astype(str)
    key = np.asarray(t.column("c_custkey"), dtype=np.int64)
    cents = np.floor(np.asarray(t.column("c_acctbal"),
                                dtype=np.float64) * 100 + 0.5) \
        .astype(np.int64)
    got = q.q_segment_gini(SF).to_pandas().set_index("seg").sort_index()
    for sname in np.unique(seg):
        m = seg == sname
        order = np.lexsort((key[m], cents[m]))
        sv = cents[m][order]
        ranks = np.arange(1, len(sv) + 1, dtype=np.int64)
        row = got.loc[sname]
        assert (int(row.n), int(row.sum_cents), int(row.rank_num)) == \
            (len(sv), int(sv.sum()), int((ranks * sv).sum()))
        # Gini in [0, 1): 2*rank_num/(n*total) - (n+1)/n
        g = 2 * row.rank_num / (row.n * row.sum_cents) \
            - (row.n + 1) / row.n
        assert 0 <= g < 1


def test_deseason_top_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    x = _daily()
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).column("ts")
    day0 = int((np.asarray(ts).astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000).min())
    days = np.arange(day0, day0 + len(x), dtype=np.int64)
    dow = (days + 4) % 7
    dev = np.array([x[i] * (dow == dow[i]).sum() - x[dow == dow[i]].sum()
                    for i in range(len(x))], dtype=np.int64)
    order = np.lexsort((days, -np.abs(dev)))[:q.DESEASON_K]
    got = q.q_deseason_top(SF).to_pandas()
    assert got.day.tolist() == days[order].tolist()
    assert got.cnt.tolist() == x[order].tolist()
    assert got.dev_num.tolist() == dev[order].tolist()
    # per-dow deviations sum to zero by construction
    for d in np.unique(dow):
        assert int(dev[dow == d].sum()) == 0
