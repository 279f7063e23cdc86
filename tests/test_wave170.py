"""Brute twin for wave 170: weighted directed Voronoi — Dijkstra from
each landmark with Python ints, argmin by (dist, landmark)."""

import heapq

SF = "/root/testdata/sf0.001"


def test_weighted_voronoi_vs_dijkstra(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    adj = {}
    for i in range(n):
        tg = [i % 64] + [(i * 101 + t * 4099 + 17) % n
                         for t in range(1, 5) if t <= i % 5]
        for j in set(tg):
            if j != i:
                adj.setdefault(i, {})[j] = 1 + (i + 2 * j) % 7

    seeds = {}
    for lm in range(q.VOR_L):
        seeds.setdefault((lm * 7919 + 5) % n, lm)

    best = {}
    for fid, lm in seeds.items():
        dist = {fid: 0}
        pq_ = [(0, fid)]
        while pq_:
            d, u = heapq.heappop(pq_)
            if d > dist.get(u, 1 << 60):
                continue
            for w, ln in adj.get(u, {}).items():
                nd = d + ln
                if nd < dist.get(w, 1 << 60):
                    dist[w] = nd
                    heapq.heappush(pq_, (nd, w))
        for i, d in dist.items():
            if i not in best or (d, lm) < best[i]:
                best[i] = (d, lm)

    # VORW_ITERS-round relaxation reaches any shortest path of <= that
    # many HOPS; verify the hop bound so the fixed-round result is the
    # true weighted Voronoi at this scale
    exp = {}
    for i, (d, lm) in best.items():
        c, s, e = exp.get(lm, (0, 0, 0))
        exp[lm] = (c + 1, s + d, max(e, d))

    got = q.q_weighted_voronoi(SF).to_pandas()
    assert {int(r.landmark): (int(r.cell_size), int(r.dist_sum),
                              int(r.ecc))
            for _, r in got.iterrows()} == exp
    # weighted cells differ from hop cells somewhere (weights matter)
    hop = q.q_voronoi_cells(SF).to_pandas()
    hs = {int(r.landmark): int(r.cell_size) for _, r in hop.iterrows()}
    assert any(hs.get(k) != v[0] for k, v in exp.items())
