"""Brute twin for wave 149: histogram-equalization remap census —
regenerate every image arithmetically and equalize with Python ints."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_equalize_hist_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q

    doc_ids = pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    agg = {}
    for did in doc_ids:
        w = 8 + (did % 5) * 4
        h = 8 + (did % 3) * 4
        n = w * h
        pix = [(i * (did + 7)) % 251 for i in range(n)]
        sp = sorted(pix)
        for p in pix:
            # count of pixels <= p
            import bisect
            c = bisect.bisect_right(sp, p)
            eq = (255 * c) // n
            agg[eq] = agg.get(eq, 0) + 1

    got = q.q_equalize_hist(SF).to_pandas()
    assert {int(r.eq_pixel): int(r.cnt) for _, r in got.iterrows()} == agg
    # equalization pushes mass toward the top of the range: max bin 255
    assert int(got.eq_pixel.max()) == 255
    # every pixel of every image is accounted for
    assert int(got.cnt.sum()) == sum(
        (8 + (d % 5) * 4) * (8 + (d % 3) * 4) for d in doc_ids)
