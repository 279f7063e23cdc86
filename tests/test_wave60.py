"""Brute twins for wave 60: BFS children histogram, length-frequency
grid, user type diversity, strong-tie triangles, nation top brand."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_bfs_children_hist_consistency(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_bfs_children_hist(SF).to_pandas()
    per = q.q_bfs_parents(SF).to_pandas()
    # children per parent over non-root rows of the oracle-green
    # parent query (the root parents itself)
    nonroot = per[per.label != per.parent_label]
    want = Counter(Counter(nonroot.parent_label).values())
    assert dict(zip(got.n_children, got.n_parents)) == dict(want)
    assert (got.n_children * got.n_parents).sum() == len(nonroot)


def test_len_freq_grid_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_len_freq_grid(SF).to_pandas()
    freq = Counter()
    for text in _pq("documents").text:
        freq.update(text.split(" "))
    cnt = Counter()
    for tok, f in freq.items():
        cnt[(len(tok), int(np.floor(np.log2(f))))] += 1
    got_d = {(r.tok_len, r.log2_freq): r.n_tokens
             for r in got.itertuples()}
    assert got_d == dict(cnt)


def test_user_type_div_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_user_type_div_hist(SF).to_pandas()
    ev = _pq("events")
    per = ev.groupby("user_id").event_type.nunique()
    want = Counter(per.to_numpy().tolist())
    assert dict(zip(got.n_types, got.n_users)) == dict(want)


def test_strong_triangles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_strong_triangles(SF).to_pandas().set_index("w_min")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    w2: dict[tuple, float] = {}
    for s, d, w in zip(e.src, e.dst, e.w):
        if s != d:
            k = (min(int(s), int(d)), max(int(s), int(d)))
            w2[k] = w2.get(k, 0.0) + float(w)

    def tri_count(pairs):
        nbrs: dict[int, set] = {}
        for a, b in pairs:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        t = 0
        for u in nbrs:
            for w in nbrs[u]:
                if w <= u:
                    continue
                t += len([v for v in nbrs[u] & nbrs[w] if v > w])
        return t

    assert got.loc[1].triangles == tri_count(list(w2))
    assert got.loc[2].triangles == tri_count(
        [k for k, v in w2.items() if v >= 2])
    assert got.loc[2].triangles <= got.loc[1].triangles


def test_nation_top_brand_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nation_top_brand(SF).to_pandas().set_index("nk")
    li = _pq("lineitem")
    o = _pq("orders")[["o_orderkey", "o_custkey"]]
    c = _pq("customer")[["c_custkey", "c_nationkey"]]
    p = _pq("part")[["p_partkey", "p_brand"]]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(p, left_on="l_partkey", right_on="p_partkey"))
    j["cents"] = np.floor(j.l_extendedprice * (1 - j.l_discount)
                          * 100).astype(np.int64)
    rev = j.groupby(["c_nationkey", "p_brand"]).cents.sum()
    for nk, g in rev.groupby(level=0):
        g = g.reset_index().sort_values(["cents", "p_brand"],
                                        ascending=[False, True])
        row = got.loc[nk]
        assert row.top_brand == g.p_brand.iloc[0]
        assert row.cents == g.cents.iloc[0]
