"""Brute twin for wave 119: ViT patchification census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_patch_stats_vs_brute(ray_session):
    from combblas_ray.functions.multimodal import make_blob
    from combblas_ray.pipelines import queries as q

    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"]).doc_id.to_numpy()
    P = q.PATCH_P
    hist = np.zeros(16, dtype=np.int64)
    for i in ids:
        blob = make_blob(int(i))
        w = 8 + (int(i) % 5) * 4
        h = 8 + (int(i) % 3) * 4
        pix = np.frombuffer(blob, dtype=np.uint8, offset=12
                            ).astype(np.int64).reshape(h, w)
        sums = pix.reshape(h // P, P, w // P, P).sum(axis=(1, 3))
        hist += np.bincount(((sums // (P * P)) // 16).ravel(),
                            minlength=16)

    got = q.q_patch_stats(SF).to_pandas()
    exp = {int(b): int(c) for b, c in enumerate(hist) if c}
    assert {int(r.bucket): int(r.n_patches)
            for _, r in got.iterrows()} == exp
    # every patch of every image is counted exactly once
    n_patches = sum((8 + (int(i) % 5) * 4) // P
                    * (8 + (int(i) % 3) * 4) // P for i in ids)
    assert int(got.n_patches.sum()) == n_patches
