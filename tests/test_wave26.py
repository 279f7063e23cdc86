"""Brute twins for wave 26: continuation counts, butterflies, rolling
DAU, video motion, supplier HHI."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_continuation_counts_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_continuation_counts(SF).to_pandas().set_index("tok")
    docs = _pq("documents")
    lefts = {}
    for t in docs.text:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            lefts.setdefault(b, set()).add(a)
    want = {k: len(v) for k, v in lefts.items()}
    assert dict(zip(got.index, got.cont_cnt)) == want


def test_butterfly_count_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_butterfly_count(SF).to_pandas()
    ev = _pq("events")
    ut = ev[["user_id", "event_type"]].drop_duplicates()
    cnt = Counter()
    for _, g in ut.groupby("user_id"):
        ts = sorted(g.event_type)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                cnt[(ts[i], ts[j])] += 1
    want = sum(u * (u - 1) // 2 for u in cnt.values())
    assert got.butterflies[0] == want


def test_rolling_dau_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_rolling_dau(SF).to_pandas().set_index("day")
    ev = _pq("events")
    day = (ev.ts.astype("datetime64[us]").astype("int64")
           // 86_400_000_000)
    ud = set(zip(ev.user_id, day))
    per_day = {}
    for u, d in ud:
        for k in range(q.DAU_WIN):
            per_day.setdefault(d + k, set()).add(u)
    assert dict(zip(got.index, got.dau)) == {
        d: len(s) for d, s in per_day.items()}


def test_video_motion_vs_numpy(ray_session):
    from combblas_ray.functions import multimodal as M

    stage = M.VideoMotionStage()
    ids = [0, 3, 9, 42]
    t = pa.table({
        "item_id": pa.array(ids, type=pa.int64()),
        "payload": pa.array([M.make_video_blob(i) for i in ids],
                            type=pa.binary()),
    })
    out = stage(t).to_pandas().set_index("item_id")
    for i in ids:
        nf = 4 + (i % 5)
        f = ((np.arange(nf * 64) * (i + 3)) % 241).reshape(nf, 64)
        assert out.loc[i, "n_frames"] == nf
        assert out.loc[i, "motion"] == np.abs(np.diff(f, axis=0)).sum()


def test_supplier_hhi_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_supplier_hhi(SF).to_pandas().set_index("l_suppkey")
    li = _pq("lineitem")
    c = li.groupby(["l_suppkey", "l_partkey"]).size()
    for sk, g in c.groupby(level=0):
        assert got.loc[sk, "n_lines"] == g.sum()
        assert got.loc[sk, "n_parts"] == len(g)
        assert got.loc[sk, "sumsq"] == (g ** 2).sum()
