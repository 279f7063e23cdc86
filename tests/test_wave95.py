"""Brute twins for wave 95: winnowing fingerprints, Misra-Gries heavy
hitters, daily cross-correlation."""

import hashlib
import struct
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _md5_61(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0] \
        & ((1 << 61) - 1)


def test_winnow_stats_vs_brute(ray_session):
    from combblas_ray.functions import text as T
    from combblas_ray.pipelines import queries as q

    k, w = T.WINNOW_K, T.WINNOW_W
    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    got = (q.q_winnow_stats(SF).to_pandas()
           .set_index("doc_id").sort_index())
    for d, txt in zip(tab.column("doc_id").to_pylist(),
                      tab.column("text").to_pylist()):
        toks = str(txt).split(" ")
        hs = [_md5_61(" ".join(toks[i:i + k]))
              for i in range(len(toks) - k + 1)]
        if not hs:
            sel = set()
        elif len(hs) < w:
            sel = {min(hs)}
        else:
            sel = {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
        xor = 0
        for v in sel:
            xor ^= v
        row = got.loc[int(d)]
        assert int(row.n_kgrams) == max(len(toks) - k + 1, 0)
        assert int(row.n_fps) == len(sel)
        assert int(row.fp_xor) == xor
        # winnowing density: at most one fingerprint per window start
        assert len(sel) <= max(len(hs) - w + 1, 1)


def test_heavy_hitters_vs_brute(ray_session):
    from combblas_ray.functions import text as T
    from combblas_ray.pipelines import queries as q

    k = T.HH_K
    tab = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    cnt = Counter()
    for txt in tab.column("text").to_pylist():
        cnt.update(str(txt).split(" "))
    m = sum(cnt.values())
    exp = sorted((t, c) for t, c in cnt.items() if c * k > m)
    got = q.q_heavy_hitters(SF).to_pandas().sort_values("tok")
    assert [(t, int(c)) for t, c in zip(got.tok, got.cnt)] == exp
    # every heavy hitter exceeds the m/k threshold by construction
    assert all(c * k > m for c in got.cnt)


def test_mg_truncate_guarantee(ray_session):
    """Array-form Misra-Gries keeps every item with count > m/(k+1)."""
    from combblas_ray.functions.text import _mg_truncate

    rng = np.random.default_rng(7)
    toks = np.array([f"t{i}" for i in range(500)])
    cnt = rng.integers(1, 50, size=500).astype(np.int64)
    cnt[7] = 10_000  # one true heavy hitter
    k = 16
    t2, c2 = _mg_truncate(toks, cnt, k)
    assert len(t2) <= k
    m = int(cnt.sum())
    for t, c in zip(toks, cnt):
        if c * (k + 1) > m:
            assert t in t2
    # adjusted counts never exceed the true ones
    lut = dict(zip(toks, cnt))
    assert all(ca <= lut[t] for t, ca in zip(t2, c2))


def test_daily_xcorr_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    tab = pq.read_table(f"{SF}/events.parquet",
                        columns=["ts", "event_type"])
    day = (np.asarray(tab.column("ts")).astype("datetime64[us]")
           .astype(np.int64) // 86_400_000_000)
    et = np.asarray(tab.column("event_type")).astype(str)
    tot = Counter(et)
    tx, ty = sorted(tot, key=lambda t: (-tot[t], t))[:2]
    lo, hi = int(day.min()), int(day.max())
    t = hi - lo + 1
    x = np.bincount(day[et == tx] - lo, minlength=t).astype(np.int64)
    y = np.bincount(day[et == ty] - lo, minlength=t).astype(np.int64)
    got = q.q_daily_xcorr(SF).to_pandas().sort_values("lag")
    for _, r in got.iterrows():
        lg = int(r.lag)
        assert r.tx == tx and r.ty == ty
        assert int(r.n_terms) == t - lg
        assert int(r.sxy) == int((x[: t - lg] * y[lg:]).sum())
        assert int(r.syx) == int((y[: t - lg] * x[lg:]).sum())
    # lag 0 is symmetric by construction
    r0 = got[got.lag == 0].iloc[0]
    assert int(r0.sxy) == int(r0.syx)
