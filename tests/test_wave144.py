"""Brute twin for wave 144: Morton Z-order cell census.

Independent path: decode each Z key back to (qx, qy) with a bit loop
and re-derive the cells from scratch with Python ints.
"""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _interleave(qx: int, qy: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((qx >> b) & 1) << (2 * b)
        z |= ((qy >> b) & 1) << (2 * b + 1)
    return z


def _deinterleave(z: int, bits: int):
    qx = qy = 0
    for b in range(bits):
        qx |= ((z >> (2 * b)) & 1) << b
        qy |= ((z >> (2 * b + 1)) & 1) << b
    return qx, qy


def test_morton_census_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    exp = {}
    for row in t.to_pylist():
        x0, x1 = row["embedding"][0], row["embedding"][1]
        qx = min(max(int(np.floor((np.float64(x0) + 1.0) * 128.0)), 0), 255)
        qy = min(max(int(np.floor((np.float64(x1) + 1.0) * 128.0)), 0), 255)
        z = _interleave(qx, qy, q.MORTON_BITS)
        cnt, labs = exp.get(z, (0, set()))
        labs.add(row["label"])
        exp[z] = (cnt + 1, labs)

    got = q.q_morton_census(SF).to_pandas()
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        cnt, labs = exp[int(r.cell)]
        assert (int(r.n_vecs), int(r.n_labels)) == (cnt, len(labs))
        # the roundtrip decode lands inside the grid
        qx, qy = _deinterleave(int(r.cell), q.MORTON_BITS)
        assert 0 <= qx < 256 and 0 <= qy < 256
        assert _interleave(qx, qy, q.MORTON_BITS) == int(r.cell)
    assert int(got.n_vecs.sum()) == t.num_rows
