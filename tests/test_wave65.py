"""Brute twins for wave 65: Gram diagonal, language run stats, user
lifetime histogram."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_col_sumsq_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_col_sumsq(SF).to_pandas().set_index("label")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    agg: dict[int, int] = {}
    for d, w in zip(e.dst, e.w):
        agg[int(d)] = agg.get(int(d), 0) + int(w) * int(w)
    lab = ctx.gather_labels(np.array(sorted(agg), dtype=np.int64))
    for v, l_ in zip(sorted(agg), lab):
        assert int(got.loc[l_].sum_w2) == agg[v]
    assert len(got) == len(agg)


def test_lang_run_stats_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lang_run_stats(SF).to_pandas()
    docs = _pq("documents").sort_values("doc_id")
    ls = docs.lang.to_numpy()
    new = np.concatenate([[True], ls[1:] != ls[:-1]])
    starts = np.flatnonzero(new)
    lens = np.diff(np.concatenate([starts, [len(ls)]]))
    assert got.n_runs[0] == len(starts)
    assert got.max_run[0] == int(lens.max())
    assert got.n_switches[0] == len(starts) - 1


def test_lang_run_stats_boundary_exactness(ray_session):
    """Synthetic check of the bucket boundary chain: a run spanning
    three buckets must be reported at its full length."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.shuffle import group_apply_tasks  # noqa

    # emulate by calling the query kernel logic indirectly: build the
    # brute answer for a crafted stream and compare against the
    # same bucket-merge the query uses, reimplemented minimally here.
    # (The query itself is oracle-gated; this pins the spanning-run
    # arithmetic at a bucket size the sf corpus can't hit.)
    BKT = 4
    langs = ["a"] * 11 + ["b", "a", "a"]  # run of 11 spans 3 buckets
    parts = []
    for b in range(0, len(langs), BKT):
        ls = np.array(langs[b:b + BKT])
        new = np.concatenate([[True], ls[1:] != ls[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate([starts, [len(ls)]]))
        parts.append({"bkt": b // BKT, "first_lang": ls[0],
                      "last_lang": ls[-1], "head_len": int(lens[0]),
                      "tail_len": int(lens[-1]),
                      "runs": int(len(starts)),
                      "maxrun": int(lens.max())})
    runs = maxrun = 0
    carry = 0
    prev_last = None
    for p in parts:
        single = p["runs"] == 1
        if prev_last is not None and p["first_lang"] == prev_last:
            runs += p["runs"] - 1
            spanning = carry + p["head_len"]
            maxrun = max(maxrun, spanning)
            carry = (carry + p["tail_len"]) if single \
                else p["tail_len"]
        else:
            runs += p["runs"]
            carry = p["tail_len"]
        maxrun = max(maxrun, p["maxrun"], carry)
        prev_last = p["last_lang"]
    assert runs == 3 and maxrun == 11


def test_user_lifetime_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_user_lifetime_hist(SF).to_pandas()
    ev = _pq("events")
    t = ev.ts.astype("datetime64[us]").astype("int64")
    per = ev.assign(t=t).groupby("user_id").t.agg(["min", "max"])
    days = (per["max"] // 86_400_000_000
            - per["min"] // 86_400_000_000)
    want = Counter(days.to_numpy().tolist())
    assert dict(zip(got.days, got.n_users)) == dict(want)
