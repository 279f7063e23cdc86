"""Brute twins for wave 90: Steiner 2-approx, mutual-NN pairs,
snowball census."""

import numpy as np
import pyarrow.parquet as pq

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _hub_ranks(ctx, k):
    us, ud = _und(ctx)
    deg = np.bincount(np.concatenate([us, ud]), minlength=ctx.n)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    return np.lexsort((ar, -deg))[:k], us, ud


def test_steiner_approx_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    hubs, us, ud = _hub_ranks(ctx, q.STEINER_K)
    n = ctx.n
    nbr = [[] for _ in range(n)]
    for a, b in zip(us, ud):
        nbr[a].append(b)
        nbr[b].append(a)
    K = len(hubs)
    H = np.full((K, K), np.inf)
    for r, s in enumerate(hubs):
        dist = np.full(n, np.inf)
        dist[s] = 0
        frontier = [int(s)]
        for lvl in range(1, q.BFS_ITERS + 1):
            nxt = []
            for v in frontier:
                for w in nbr[v]:
                    if dist[w] == np.inf:
                        dist[w] = lvl
                        nxt.append(w)
            frontier = nxt
        H[r] = dist[hubs]
    in_tree = [0]
    exp = []
    for step in range(1, K):
        best = None
        for a in in_tree:
            for b in range(K):
                if b in in_tree or not np.isfinite(H[a, b]):
                    continue
                c = (float(H[a, b]), a + 1, b + 1)
                if best is None or c < best:
                    best = c
        assert best is not None
        exp.append((step, best[1], best[2], int(best[0])))
        in_tree.append(best[2] - 1)
    got = q.q_steiner_approx(SF).to_pandas().sort_values("step")
    assert [tuple(r) for r in got.to_numpy()] == exp
    # a tree over K terminals has exactly K-1 edges when all reachable
    assert len(exp) == K - 1


def test_mutual_nn_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t.column("embedding").to_pylist()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    order = np.argsort(ids, kind="stable")
    # ids are already 0..n-1 dense in the synthetic table
    assert np.array_equal(ids[order], np.arange(len(ids)))
    nn = np.lexsort((np.broadcast_to(np.arange(len(ids)), S.shape),
                     -S))[:, 0]
    mutual = {(int(a), int(nn[a])) for a in range(len(ids))
              if nn[nn[a]] == a and a < nn[a]}
    got = q.q_mutual_nn(SF).to_pandas()
    gp = {(int(r.a), int(r.b)) for r in got.itertuples()}
    assert gp == mutual
    assert len(gp) == len(got)


def test_snowball_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    hubs, us, ud = _hub_ranks(ctx, 1)
    hub = int(hubs[0])
    ar = np.asarray(ctx.arith, dtype=np.int64)
    nbr = [set() for _ in range(ctx.n)]
    for a, b in zip(us, ud):
        nbr[a].add(b)
        nbr[b].add(a)
    sampled = {hub: 0}
    frontier = [hub]
    for r in range(1, q.SNOW_ROUNDS + 1):
        new = []
        for v in sorted(frontier):
            picks = sorted(nbr[v], key=lambda w: ar[w])[:q.SNOW_FAN]
            for w in picks:
                if w not in sampled:
                    sampled[w] = r
                    new.append(w)
        if not new:
            break
        frontier = new
    got = q.q_snowball_census(SF).to_pandas()
    lab = {r.label: int(r.round) for r in got.itertuples()}
    exp = {f"m_{ar[v]}": rd for v, rd in sampled.items()}
    assert lab == exp
