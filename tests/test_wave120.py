"""Brute twin for wave 120: distributed PCA top component."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pca_top_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["embedding"])
    mat = np.stack([np.asarray(e, dtype=np.float64)
                    for e in emb.embedding])
    N = len(mat)
    mu = mat.sum(axis=0) / N
    C = (mat.T @ mat) / N - np.outer(mu, mu)
    v = np.full(q.PCA_DIM, 0.125)
    for _ in range(q.PCA_ITERS):
        v = C @ v
        v = v / np.sqrt((v * v).sum())

    got = q.q_pca_top(SF).to_pandas().sort_values("dim")
    assert len(got) == q.PCA_DIM
    assert np.allclose(got.loading.to_numpy(), np.round(v, 6),
                       atol=2e-6)
    # a unit vector (up to rounding), and the dominant direction is a
    # genuine eigen-direction: one more application barely rotates it
    assert abs((got.loading.to_numpy() ** 2).sum() - 1.0) < 1e-3
    w = C @ v
    w = w / np.sqrt((w * w).sum())
    assert abs(float(np.dot(w, v))) > 0.95
