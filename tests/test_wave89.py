"""Brute twins for wave 89: bow-tie census, 4-clique count, CUSUM
drift flags."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _dir_edges(ctx):
    """Distinct loop-free directed (src, dst) id pairs."""
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    return s[keep], d[keep]


def _reach(n, src, dst, seed):
    """Boolean reach-to-fixpoint from seed along (src -> dst)."""
    vis = np.zeros(n, dtype=bool)
    vis[seed] = True
    frontier = np.array([seed], dtype=np.int64)
    while len(frontier):
        on = np.isin(src, frontier)
        nxt = np.unique(dst[on])
        nxt = nxt[~vis[nxt]]
        vis[nxt] = True
        frontier = nxt
    return vis


def test_bowtie_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    deg = np.bincount(np.concatenate([us, ud]), minlength=ctx.n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    hub = int(np.lexsort((ar, -deg))[0])
    s, d = _dir_edges(ctx)
    f = _reach(ctx.n, s, d, hub)
    b = _reach(ctx.n, d, s, hub)
    core = f & b
    got = q.q_bowtie_census(SF).to_pandas()
    assert int(got.n_core.iloc[0]) == int(core.sum())
    assert int(got.n_in.iloc[0]) == int((b & ~core).sum())
    assert int(got.n_out.iloc[0]) == int((f & ~core).sum())
    assert int(got.n_other.iloc[0]) == int((~f & ~b).sum())
    assert (int(got.n_core.iloc[0]) + int(got.n_in.iloc[0])
            + int(got.n_out.iloc[0]) + int(got.n_other.iloc[0])) == ctx.n
    # the pivot's SCC is nonempty (contains at least the hub)
    assert int(got.n_core.iloc[0]) >= 1


def test_k4_count_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    nbr = [set() for _ in range(n)]
    for a, b in zip(us, ud):
        nbr[a].add(b)
        nbr[b].add(a)
    n_tri = 0
    n_pairs = 0
    n_k4 = 0
    for a, b in zip(us, ud):
        if a >= b:
            continue
        cn = sorted(w for w in (nbr[a] & nbr[b]) if w > b)
        n_tri += len(cn)
        for i in range(len(cn)):
            for j in range(i + 1, len(cn)):
                n_pairs += 1
                if cn[j] in nbr[cn[i]]:
                    n_k4 += 1
    got = q.q_k4_count(SF).to_pandas()
    assert int(got.n_triangles.iloc[0]) == n_tri
    assert int(got.n_tri_pairs.iloc[0]) == n_pairs
    assert int(got.n_k4.iloc[0]) == n_k4


def test_cusum_flags_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    ts = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).column("ts")
    day = (np.asarray(ts).astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    lo, hi = int(day.min()), int(day.max())
    x = np.bincount(day - lo, minlength=hi - lo + 1).astype(np.int64)
    k = int(x.sum()) // len(x)
    h = q.CUSUM_H_MULT * k
    s = np.empty(len(x), dtype=np.int64)
    s[0] = max(0, int(x[0]) - k)
    for t in range(1, len(x)):
        s[t] = max(0, int(s[t - 1]) + int(x[t]) - k)
    got = q.q_cusum_flags(SF).to_pandas().sort_values("day")
    assert np.array_equal(got.day.to_numpy(), np.arange(lo, hi + 1))
    assert np.array_equal(got.cnt.to_numpy(), x)
    assert np.array_equal(got.cusum.to_numpy(), s)
    assert np.array_equal(got.flag.to_numpy(), s > h)
    # the detector must actually reset: some day sits at S = 0
    assert (s == 0).any()
