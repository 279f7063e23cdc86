"""Brute twins for wave 82: the HLL and Count-Min accuracy audits,
re-derived with direct md5 hashing over the token multiset."""

import hashlib
import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _md5_low64(t: str) -> int:
    # DuckDB md5_number_lower = little-endian uint64 of the last 8 bytes
    return int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")


def _tokens():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    return Counter(tok for t in docs.text for tok in t.split(" "))


def test_hll_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    cnt = _tokens()
    m = 256
    tab = np.zeros(m, dtype=np.int64)
    for tok in cnt:
        h = _md5_low64(tok)
        b = h & 255
        rest = (h >> 8) & ((1 << 52) - 1)
        rho = ((rest & -rest).bit_length()) if rest else 53
        tab[b] = max(tab[b], rho)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -tab)))
    zeros = int((tab == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    got = q.q_hll_audit(SF).to_pandas().iloc[0]
    assert got.exact == len(cnt)
    assert abs(got.est - est) < 1e-5
    # the p=8 sketch should land within ~3 standard errors (1.04/16)
    assert abs(got.rel_err) < 0.20


def test_cm_audit_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    cnt = _tokens()
    d, w = 4, 512
    tab = np.zeros((d, w), dtype=np.int64)
    for tok, c in cnt.items():
        h = _md5_low64(tok)
        for r in range(d):
            tab[r, (h >> (16 * r)) & (w - 1)] += c
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:q.CM_AUDIT_K]
    got = q.q_cm_audit(SF).to_pandas().set_index("tok")
    assert len(got) == len(top)
    for tok, c in top:
        h = _md5_low64(tok)
        est = min(tab[r, (h >> (16 * r)) & (w - 1)] for r in range(d))
        row = got.loc[tok]
        assert row.exact == c
        assert row.est == est
        # Count-Min never undercounts
        assert row.overcount == est - c >= 0
