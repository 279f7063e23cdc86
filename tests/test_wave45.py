"""Brute twins for wave 45: repo density, source modal language,
aspect histogram, token second moment, status-priority grid."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_repo_density_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_repo_density(SF).to_pandas().set_index("repo")
    ctx = get_context(SF)
    arith = np.asarray(ctx.arith)
    e = ctx.edges.to_pandas()
    files = Counter(arith % 100)
    internal = Counter()
    for s, d in zip(e.src, e.dst):
        if arith[s] % 100 == arith[d] % 100:
            internal[arith[s] % 100] += 1
    for r in files:
        assert got.loc[f"repo_{r}", "n_files"] == files[r]
        assert got.loc[f"repo_{r}", "internal_edges"] == \
            internal.get(r, 0)


def test_source_modal_lang_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_source_modal_lang(SF).to_pandas().set_index("source")
    docs = _pq("documents")
    for src, g in docs.groupby("source"):
        cnt = Counter(g.lang)
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got.loc[src, "modal_lang"] == best[0]
        assert got.loc[src, "modal_cnt"] == best[1]
        assert got.loc[src, "total"] == len(g)


def test_aspect_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_aspect_hist(SF).to_pandas()
    docs = _pq("documents")
    cnt = Counter((8 + (d % 5) * 4, 8 + (d % 3) * 4)
                  for d in docs.doc_id)
    assert {(w, h): c for w, h, c in
            zip(got.width, got.height, got.cnt)} == dict(cnt)


def test_token_f2_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_token_f2(SF).to_pandas()
    docs = _pq("documents")
    cnt = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    assert got.n_tokens[0] == sum(cnt.values())
    assert got.n_distinct[0] == len(cnt)
    assert got.sum_f2[0] == sum(v * v for v in cnt.values())


def test_status_priority_grid_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_status_priority_grid(SF).to_pandas()
    orders = _pq("orders")
    cnt = Counter(zip(orders.o_orderstatus, orders.o_orderpriority))
    assert {(s, p): c for s, p, c in
            zip(got.o_orderstatus, got.o_orderpriority,
                got.cnt)} == dict(cnt)
