"""Brute twin for wave 131: JSONL interchange roundtrip."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    exp = (len(e), int(e.src.sum()), int(e.dst.sum()),
           int(e.w.sum()))

    got = q.q_jsonl_roundtrip(SF).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (int(r.nnz), int(r.srcsum), int(r.dstsum),
            int(r.wsum)) == exp
