"""Brute twins for waves 163-164: encoding planner + incremental
vocabulary merge."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_encoding_planner_vs_pandas(ray_session):
    from combblas_ray.pipelines import queries as q

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", *q.ENC_COLS],
    ).to_pandas().sort_values(["l_orderkey", "l_linenumber"])
    got = q.q_encoding_planner(SF).to_pandas()
    for _, r in got.iterrows():
        v = li[r.col].astype(str).to_numpy()
        runs = int(1 + np.count_nonzero(v[1:] != v[:-1]))
        assert (int(r.n_rows), int(r.n_runs), int(r.n_distinct)) == \
            (len(v), runs, len(set(v.tolist())))
    # low-cardinality flags RLE far better than the near-unique key
    flag = got[got.col == "l_returnflag"].iloc[0]
    assert int(flag.n_distinct) <= 3
    assert int(flag.n_runs) < int(flag.n_rows)


def test_vocab_incremental_equals_single_shot(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.functions.text import vocab_topk

    import ray

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    full = vocab_topk(docs, k=q.INC_VOCAB_K).to_pandas()
    inc = q.q_vocab_incremental(SF).to_pandas()
    assert full.reset_index(drop=True).equals(inc.reset_index(drop=True))
    # vocabulary smaller than K -> the whole vocab is returned
    assert 0 < len(inc) <= max(q.INC_VOCAB_K, len(full))
