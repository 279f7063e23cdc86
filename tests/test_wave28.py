"""Brute twins for wave 28: Benford, edge multiplicity, full-outer
roles, embedding dim stats, qty-discount grid."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_benford_digits_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_benford_digits(SF).to_pandas().set_index("digit")
    ev = _pq("events")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(np.int64)
    cnt = Counter(str(c)[0] for c in cents if c > 0)
    assert dict(zip(got.index, got.cnt)) == dict(cnt)


def test_edge_multiplicity_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_edge_multiplicity(SF).to_pandas().set_index("w")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    cnt = Counter(int(w) for w in e.w)
    assert dict(zip(got.index, got.cnt)) == dict(cnt)


def test_nation_roles_outer_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nation_roles_outer(SF).to_pandas().set_index("n_nationkey")
    cust, sup = _pq("customer"), _pq("supplier")
    cc = cust.groupby("c_nationkey").size()
    sc = sup.groupby("s_nationkey").size()
    keys = sorted(set(cc.index) | set(sc.index))
    assert got.index.tolist() == keys
    for k in keys:
        assert got.loc[k, "n_cust"] == cc.get(k, 0)
        assert got.loc[k, "n_supp"] == sc.get(k, 0)
    # the outer join must actually exercise null sides at this sf
    assert (got.n_supp == 0).any()


def test_emb_dim_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_emb_dim_stats(SF).to_pandas().set_index("dim")
    emb = _pq("embeddings")
    mat = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                             * (1 << 20)).astype(np.int64)
                    for e in emb.embedding])
    for d in range(mat.shape[1]):
        assert got.loc[d, "n"] == len(mat)
        assert got.loc[d, "sum_q"] == mat[:, d].sum()
        assert got.loc[d, "sum_q2"] == (mat[:, d] ** 2).sum()


def test_qty_disc_grid_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_qty_disc_grid(SF).to_pandas()
    li = _pq("lineitem")
    qb = li.l_quantity.astype(np.int64) // 10
    dp = np.floor(li.l_discount.to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    cnt = Counter(zip(qb, dp))
    assert {(a, b): c for a, b, c in
            zip(got.qty_band, got.disc_pct, got.cnt)} == dict(cnt)
