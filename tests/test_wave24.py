"""Brute twins for wave 24: interval coverage, forward as-of, reorder
gaps, vertex cover, greedy k-center."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_interval_coverage_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_interval_coverage(SF).to_pandas().set_index("user_id")
    ev = _pq("events")
    ts = ev.ts.astype("datetime64[us]").astype("int64")
    df = pd.DataFrame({"u": ev.user_id, "s": ts})
    for uid, g in df.groupby("u"):
        ivs = sorted((s, s + q.COV_WIN_US) for s in g.s)
        cov = 0
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                cov += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        cov += cur_e - cur_s
        assert got.loc[uid, "covered_us"] == cov


def test_first_response_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_first_response(SF).to_pandas().set_index("event_id")
    ev = _pq("events")
    ev = ev[ev.event_type.isin([q.FR_FROM, q.FR_TO])].sort_values(
        ["user_id", "ts", "event_id"])
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = list(zip(g.event_id,
                        g.ts.astype("datetime64[us]").astype("int64"),
                        g.event_type))
        for i, (eid, ts, et) in enumerate(rows):
            if et != q.FR_FROM:
                continue
            nxt = [t for _, t, e in rows[i + 1:] if e == q.FR_TO]
            if nxt:
                want[eid] = min(nxt) - ts
    assert dict(zip(got.index, got.wait_us)) == want


def test_order_gap_stats_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_order_gap_stats(SF).to_pandas().set_index("o_custkey")
    orders = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                        "o_orderkey"])
    for ck, g in orders.groupby("o_custkey"):
        d = g.o_orderdate.astype("datetime64[us]").astype(
            "int64").to_numpy()
        if len(d) < 2:
            assert ck not in got.index
            continue
        gaps = (d[1:] - d[:-1]) // 86_400_000_000
        assert got.loc[ck, "n_gaps"] == len(gaps)
        assert got.loc[ck, "sum_days"] == gaps.sum()
        assert got.loc[ck, "max_days"] == gaps.max()


def test_vertex_cover_is_cover_and_matches_matching(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    cover = set(q.q_vertex_cover(SF).to_pandas().label)
    match = q.q_matching_fixed(SF).to_pandas()
    want = set(match.label) | set(match.partner)
    assert cover == want
    # cover validity: every non-loop undirected edge touched
    ctx = get_context(SF)
    e = ctx.graph("sym").dedup_sum().edges.to_pandas()
    labels = np.asarray(ctx.labels)
    for s, d in zip(e.src, e.dst):
        if s != d:
            assert labels[s] in cover or labels[d] in cover


def test_k_center_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_k_center(SF).to_pandas()
    emb = _pq("embeddings").sort_values("vec_id")
    Q = np.stack([np.floor((np.asarray(e, dtype=np.float64) + 0.5)
                           * (1 << 20)).astype(np.int64)
                  for e in emb.embedding])
    ids = emb.vec_id.to_numpy()
    centers = [0]
    for _ in range(q.KC_K - 1):
        C = Q[np.isin(ids, centers)]
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        md = d2.min(axis=1)
        md[np.isin(ids, centers)] = -1
        best = np.lexsort((ids, -md))[0]
        centers.append(int(ids[best]))
    assert got.vec_id.tolist() == centers
