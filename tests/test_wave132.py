"""Brute twin for wave 132: video shot-boundary census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_shot_census_vs_brute(ray_session):
    from combblas_ray.functions.multimodal import make_video_blob
    from combblas_ray.pipelines import queries as q

    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"]).doc_id.to_numpy()
    agg: dict[int, int] = {}
    for i in ids:
        blob = make_video_blob(int(i))
        nf = 4 + (int(i) % 5)
        fr = np.frombuffer(blob, dtype=np.uint8, offset=12
                           ).astype(np.int64).reshape(nf, 64)
        dv = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
        shots = 1 + int((dv > q.SHOT_T).sum())
        agg[shots] = agg.get(shots, 0) + 1

    got = q.q_shot_census(SF).to_pandas()
    assert {int(r.n_shots): int(r.n_videos)
            for _, r in got.iterrows()} == agg
    # every video appears exactly once, and shots never exceed frames
    assert int(got.n_videos.sum()) == len(ids)
    assert int(got.n_shots.max()) <= 8  # nf <= 8 -> at most 8 shots
