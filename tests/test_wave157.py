"""Brute twin for wave 157: JL distortion audit with Python ints and
a distortion-ratio sanity window from the JL lemma."""

import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_jl_distortion_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    V = t.num_rows
    qv = {}
    for row in t.to_pylist():
        qv[row["vec_id"]] = [
            math.floor((float(np.float64(np.float32(x))) + 0.5) * (1 << 20))
            for x in row["embedding"]]

    S = [[1 if (d * 31 + k * 17) % 2 == 0 else -1
          for k in range(q.JL_K)] for d in range(q.JL_DIM)]

    def proj(v):
        return [sum(v[d] * S[d][k] for d in range(q.JL_DIM))
                for k in range(q.JL_K)]

    got = q.q_jl_distortion(SF).to_pandas().sort_values("pair")
    ratios = []
    for _, r in got.iterrows():
        p = int(r.pair)
        a, b = (p * 37 + 1) % V, (p * 61 + 7) % V
        do = sum((x - y) ** 2 for x, y in zip(qv[a], qv[b]))
        pa_, pb_ = proj(qv[a]), proj(qv[b])
        dp = sum((x - y) ** 2 for x, y in zip(pa_, pb_))
        assert (int(r.d_orig), int(r.d_proj)) == (do, dp)
        if do:
            # E[d_proj] = K * d_orig for sign projections
            ratios.append(dp / (q.JL_K * do))
    # JL concentration: the mean normalized ratio is near 1
    assert 0.5 < float(np.mean(ratios)) < 2.0
