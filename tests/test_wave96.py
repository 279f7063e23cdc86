"""Brute twins for wave 96: SymSpell-2 pairs, dow seasonality,
hub-removal attack curve."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und
from tests.test_wave94 import _daily

SF = "/root/testdata/sf0.001"


def _brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _vocab():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    parts = pq.read_table(f"{SF}/part.parquet", columns=["p_name"])
    v = set()
    for t in docs.column("text").to_pylist():
        v.update(str(t).split(" "))
    for t in parts.column("p_name").to_pylist():
        v.update(str(t).split(" "))
    return sorted(v)


def test_lev_dist_batch_vs_scalar(ray_session):
    """The vectorized DP agrees with the scalar DP on adversarial
    shapes (empty-ish, equal, swaps, prefixes, long)."""
    from combblas_ray.functions.dedup import _lev_dist_batch

    pairs = [("a", "a"), ("a", "b"), ("ab", "ba"), ("abc", "cba"),
             ("kitten", "sitting"), ("x", "xyz"), ("abcd", "ab"),
             ("flaw", "lawn"), ("gumbo", "gambol"),
             ("aaaa", "aabaa"), ("abcdefgh", "abcdefgh"),
             ("zzz", "q"), ("prefix", "prefixxx")]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    got = _lev_dist_batch(a, b)
    exp = [_brute_lev(*p) for p in pairs]
    assert got.tolist() == exp
    # non-contiguous inputs (column slices) must work too
    m = np.stack([a, b], axis=1)
    got2 = _lev_dist_batch(m[:, 0], m[:, 1])
    assert got2.tolist() == exp


def test_lev2_pairs_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    v = _vocab()
    exp = sorted((a, b) for i, a in enumerate(v) for b in v[i + 1:]
                 if _brute_lev(a, b) == 2)
    got = q.q_lev2_pairs(SF).to_pandas().sort_values(["wa", "wb"])
    assert [(a, b) for a, b in zip(got.wa, got.wb)] == exp


def test_dow_seasonal_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    x = _daily()
    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).column("ts")
    day0 = int((np.asarray(ts).astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000).min())
    dow = (np.arange(day0, day0 + len(x)) + 4) % 7
    got = q.q_dow_seasonal(SF).to_pandas().set_index("dow").sort_index()
    for d in np.unique(dow):
        sel = x[dow == d]
        row = got.loc[int(d)]
        assert (int(row.n_days), int(row.sum_cnt), int(row.min_cnt),
                int(row.max_cnt)) == \
            (len(sel), int(sel.sum()), int(sel.min()), int(sel.max()))
    assert int(got.n_days.sum()) == len(x)


def test_attack_curve_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    deg = np.bincount(us, minlength=n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hubs = np.lexsort((ar, -deg))[:q.ATK_H]
    got = q.q_attack_curve(SF).to_pandas().sort_values("n_removed")
    for j in range(q.ATK_H + 1):
        rm = set(hubs[:j].tolist())
        lab = np.arange(n, dtype=np.int64)
        keepv = np.array([v not in rm for v in range(n)])
        ke = np.array([u not in rm and v not in rm
                       for u, v in zip(us, ud)])
        s2, d2 = us[ke], ud[ke]
        for _ in range(q.ATK_ITERS):
            y = np.full(n, np.iinfo(np.int64).max)
            np.minimum.at(y, d2, lab[s2])
            lab = np.minimum(lab, y)
        comp = lab[keepv]
        row = got.iloc[j]
        assert int(row.n_removed) == j
        assert int(row.n_kept) == n - j
        assert int(row.n_components) == len(np.unique(comp))
        assert int(row.lcc_size) == int(
            np.bincount(np.unique(comp, return_inverse=True)[1]).max())
    # removing hubs never grows the largest component
    assert got.lcc_size.is_monotonic_decreasing
