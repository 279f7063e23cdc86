"""Brute twins for wave 22: streaks, byte audit, directed 3-cycles,
repo stats, top-2 share."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_max_streak_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_max_streak(SF).to_pandas().set_index("user_id")
    ev = _pq("events")
    day = (ev.ts.astype("int64") // 10**6 // 86400).to_numpy()
    want = {}
    for uid, g in pd.DataFrame({"u": ev.user_id, "d": day}).groupby("u"):
        ds = sorted(set(g.d))
        best = run = 1
        for a, b in zip(ds, ds[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        want[uid] = best
    assert dict(zip(got.index, got.max_streak)) == want


def test_byte_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_byte_stats(SF).to_pandas().set_index("lang")
    docs = _pq("documents")
    for lang, g in docs.groupby("lang"):
        assert got.loc[lang, "n_docs"] == len(g)
        assert got.loc[lang, "n_chars"] == sum(len(t) for t in g.text)
        assert got.loc[lang, "n_bytes"] == sum(
            len(t.encode("utf-8")) for t in g.text)


def test_cycle3_directed_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_cycle3_directed(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.graph("directed").dedup_sum().edges.to_pandas()
    pairs = set(zip(e.src, e.dst))
    out = {}
    for s, d in pairs:
        out.setdefault(s, set()).add(d)
    walks = 0
    for s, d in pairs:
        for d2 in out.get(d, ()):
            if (d2, s) in pairs:
                walks += 1
    assert got.closed_walks3[0] == walks


def test_repo_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as C

    got = q.q_repo_stats(SF).to_pandas().set_index("repo")
    n = C.n_files_for(SF)
    df = C.corpus_batch(np.arange(n), n).to_pandas()
    for repo, g in df.groupby("repo"):
        assert got.loc[repo, "n_files"] == len(g)
        assert got.loc[repo, "n_langs"] == g.lang.nunique()
        assert got.loc[repo, "n_imports"] == sum(
            c.count("import m_") for c in g.content)


def test_top2_share_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_top2_share(SF).to_pandas()
    ev = _pq("events")
    ev["cents"] = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(
        np.int64)
    tu = ev.groupby(["event_type", "user_id"], as_index=False).cents.sum()
    for et, g in tu.groupby("event_type"):
        g = g.sort_values(["cents", "user_id"],
                          ascending=[False, True]).head(q.TOP2_K)
        sub = got[got.event_type == et].sort_values("rank")
        assert sub.user_id.tolist() == g.user_id.tolist()
        assert sub.user_cents.tolist() == g.cents.tolist()
        assert (sub.type_cents == tu[tu.event_type == et].cents.sum()).all()
