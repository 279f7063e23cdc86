"""Brute twins for wave 66: cross-source duplicate leakage, user trend
split, CC weight-threshold curve."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_cross_source_dups_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_cross_source_dups(SF).to_pandas()
    docs = _pq("documents")
    key = docs.text.map(lambda t: " ".join(sorted(set(t.split(" ")))))
    groups = spanning = span_docs = 0
    for k, g in docs.assign(key=key).groupby("key"):
        if len(g) < 2:
            continue
        groups += 1
        if g.source.nunique() > 1:
            spanning += 1
            span_docs += len(g)
    assert (got.n_groups[0], got.n_spanning[0],
            got.n_docs_spanning[0]) == (groups, spanning, span_docs)


def test_user_trend_split_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_user_trend_split(SF).to_pandas()
    ev = _pq("events").sort_values(["user_id", "ts", "event_id"])
    ev["c"] = np.floor(ev.value * 100 + 0.5).astype(np.int64)
    rising = falling = flat = 0
    for uid, g in ev.groupby("user_id"):
        v = g.c.to_numpy()
        n = len(v)
        if n < 2:
            continue
        h = n // 2
        a, b = int(v[:h].sum()), int(v[h:].sum())
        lhs, rhs = a * (n - h), b * h
        if rhs > lhs:
            rising += 1
        elif rhs < lhs:
            falling += 1
        else:
            flat += 1
    assert (got.n_rising[0], got.n_falling[0], got.n_flat[0]) == (
        rising, falling, flat)


def test_cc_threshold_curve_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_cc_threshold_curve(SF).to_pandas().set_index("w_min")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    w2: dict[tuple, float] = {}
    for s, d, w in zip(e.src, e.dst, e.w):
        if s != d:
            k = (min(int(s), int(d)), max(int(s), int(d)))
            w2[k] = w2.get(k, 0.0) + float(w)

    def n_components(pairs, n):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(v) for v in range(n)})

    assert got.loc[1].n_components == n_components(list(w2), ctx.n)
    assert got.loc[2].n_components == n_components(
        [k for k, v in w2.items() if v >= 2], ctx.n)
    assert got.loc[2].n_components >= got.loc[1].n_components
