"""Brute-force twins for the wave-7 operators: transpose, Galerkin
triple product, TPC-H Q4 EXISTS semi-join."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tests.conftest import brute_adjacency

SF = "/root/testdata/sf0.001"


def test_transpose_involution(ctx500):
    g = ctx500.graph("directed")
    a = g.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    tt = g.transpose().transpose().edges.to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, tt)
    t = g.transpose().edges.to_pandas()
    assert set(zip(t.dst, t.src, t.w)) == set(zip(a.src, a.dst, a.w))


def test_galerkin_vs_dense_triple_product(ctx500):
    from combblas_ray.pipelines import queries as q

    ctx = ctx500
    n, NC, WM = ctx.n, q.GALERKIN_NC, q.GALERKIN_WMOD
    # dense R A R^T in arithmetic-id space
    C = np.zeros((NC, NC))
    for j, srcs in brute_adjacency(n).items():  # j = dst (arith)
        for i, w in srcs.items():  # i = src (arith)
            C[i % NC, j % NC] += (1 + i % WM) * w * (1 + j % WM)
    out = q.galerkin_table(ctx).to_pandas()
    got = np.zeros((NC, NC))
    got[out.csrc, out.cdst] = out.w
    assert np.array_equal(got, C)
    assert (out.w > 0).all()  # dedup-sum emitted only nonzeros


def test_tpch_q4_vs_pandas_brute():
    from combblas_ray.pipelines import queries as q

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    mx = li.groupby("l_orderkey")["l_shipdate"].max()
    j = orders.join(mx, on="o_orderkey", how="inner")
    late = j[j.l_shipdate > j.o_orderdate
             + pd.Timedelta(days=q.TPCH_Q4_LATE_DAYS)]
    exp = late.groupby("o_orderpriority").size().to_dict()
    out = q.q_tpch_q4(SF).to_pandas()
    assert dict(zip(out.o_orderpriority, out.cnt)) == exp
