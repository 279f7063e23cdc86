"""Brute twins for wave 39: source vocab Jaccard, unpivot, modal
transition, iceberg cells, churn flags."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_source_vocab_jaccard_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_source_vocab_jaccard(SF).to_pandas()
    docs = _pq("documents")
    vocab = {}
    for src, g in docs.groupby("source"):
        v = set()
        for t in g.text:
            v.update(t.split(" "))
        vocab[src] = v
    srcs = sorted(vocab)
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            inter = len(vocab[srcs[i]] & vocab[srcs[j]])
            if inter:
                rows.append((srcs[i], srcs[j], inter))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    want = rows[:q.SVJ_TOPK]
    assert list(zip(got.sa, got.sb, got.inter)) == want
    for _, r in got.iterrows():
        assert r.na == len(vocab[r.sa])
        assert r.nb == len(vocab[r.sb])


def test_party_unpivot_consistent(ray_session):
    from combblas_ray.pipelines import queries as q

    wide = q.q_party_counts(SF).to_pandas().set_index("n_name")
    long = q.q_party_unpivot(SF).to_pandas()
    assert len(long) == 4 * len(wide)
    for _, r in long.iterrows():
        assert r.value == wide.loc[r.n_name, r.metric]


def test_modal_transition_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_modal_transition(SF).to_pandas().set_index("from_type")
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for uid, g in ev.groupby("user_id"):
        ts = g.event_type.tolist()
        for a, b in zip(ts, ts[1:]):
            cnt[(a, b)] += 1
    best = {}
    for (a, b), c in cnt.items():
        cur = best.get(a)
        if cur is None or (-c, b) < (-cur[1], cur[0]):
            best[a] = (b, c)
    for a, (b, c) in best.items():
        assert got.loc[a, "to_type"] == b
        assert got.loc[a, "cnt"] == c


def test_iceberg_cells_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_iceberg_cells(SF).to_pandas()
    ev = _pq("events")
    hour = (ev.ts.astype("datetime64[us]").astype("int64")
            // 3_600_000_000) % 24
    cnt = Counter(zip(ev.event_type, hour))
    want = {(t, h): c for (t, h), c in cnt.items() if c >= q.ICE_MIN}
    assert {(t, h): c for t, h, c in
            zip(got.event_type, got.hour, got.cnt)} == want


def test_churn_flags_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_churn_flags(SF).to_pandas()
    ev = _pq("events")
    us = ev.ts.astype("datetime64[us]").astype("int64")
    mx = pd.DataFrame({"u": ev.user_id, "t": us}).groupby("u").t.max()
    cutoff = mx.max() - q.CHURN_DAYS * 86_400_000_000
    assert got.n_users[0] == len(mx)
    assert got.n_churned[0] == int((mx < cutoff).sum())
    assert got.cutoff_us[0] == cutoff
