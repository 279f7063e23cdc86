"""Brute twins for wave 58: 1-NN hubness, hub bisector, Lorenz
deciles, co-purchase degree histogram, comeback customers."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_nn_hubness_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_nn_hubness(SF).to_pandas()
    emb = _pq("embeddings")
    emb = emb[emb.vec_id < q.KNN1_N].sort_values("vec_id")
    M = np.floor((np.stack(emb.embedding.to_numpy()).astype(np.float64)
                  + 0.5) * (1 << 20)).astype(np.int64)
    d = M @ M.T
    np.fill_diagonal(d, np.iinfo(np.int64).min)
    best = np.argmax(d, axis=1)
    indeg = np.bincount(best, minlength=len(M))
    want = Counter(indeg.tolist())
    assert dict(zip(got.indeg, got.n_vectors)) == dict(want)
    assert (got.indeg * got.n_vectors).sum() == len(M)  # every NN edge


def test_hub_bisector_vs_brute(ray_session):
    from collections import deque

    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_hub_bisector(SF).to_pandas()
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    und: dict[int, set] = {}
    for s, d in zip(e.src, e.dst):
        if s != d:
            und.setdefault(int(s), set()).add(int(d))
            und.setdefault(int(d), set()).add(int(s))
    deg = np.zeros(ctx.n, dtype=np.int64)
    for v, ns in und.items():
        deg[v] = len(ns)
    a, b = np.lexsort((ar, -deg))[:2].tolist()

    def bfs(r):
        dist = {r: 0}
        dq = deque([r])
        while dq:
            u = dq.popleft()
            if dist[u] >= q.BFS_ITERS:
                continue
            for v in und.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    da, db = bfs(a), bfs(b)
    ca = cb = tie = oa = ob = nn = 0
    for v in range(ctx.n):
        xa, xb = da.get(v), db.get(v)
        if xa is None and xb is None:
            nn += 1
        elif xb is None:
            oa += 1
        elif xa is None:
            ob += 1
        elif xa < xb:
            ca += 1
        elif xb < xa:
            cb += 1
        else:
            tie += 1
    assert (got.n_closer_a[0], got.n_closer_b[0], got.n_tie[0],
            got.n_only_a[0], got.n_only_b[0],
            got.n_neither[0]) == (ca, cb, tie, oa, ob, nn)


def test_lorenz_deciles_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_lorenz_deciles(SF).to_pandas()
    o = _pq("orders")
    o["cents"] = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    s = (o.groupby("o_custkey").cents.sum().reset_index()
          .sort_values(["cents", "o_custkey"]))
    cents = s.cents.to_numpy()
    n = len(cents)
    dec = np.arange(n) * q.LORENZ_BUCKETS // n
    for d in range(q.LORENZ_BUCKETS):
        row = got[got.decile == d]
        assert int(row.n_customers.iloc[0]) == int((dec == d).sum())
        assert int(row.sum_cents.iloc[0]) == int(cents[dec == d].sum())
    # Lorenz monotonicity: later deciles hold at least as much spend
    sc = got.sort_values("decile").sum_cents.to_numpy()
    assert (np.diff(sc) >= 0).all()


def test_copurchase_degree_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_copurchase_degree_hist(SF).to_pandas()
    li = _pq("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    partners: dict[int, set] = {}
    for ok_, g in li.groupby("l_orderkey"):
        ps = sorted(set(g.l_partkey))
        for x in ps:
            partners.setdefault(x, set()).update(
                p for p in ps if p != x)
    want = Counter(len(v) for v in partners.values() if v)
    assert dict(zip(got.partners, got.n_parts)) == dict(want)


def test_comeback_customers_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_comeback_customers(SF).to_pandas()
    o = _pq("orders").sort_values(["o_custkey", "o_orderdate",
                                   "o_orderkey"])
    nc = ng = 0
    for ck, g in o.groupby("o_custkey"):
        d = g.o_orderdate.astype("datetime64[us]").astype(
            "int64").to_numpy()
        gaps = int(((np.diff(d) // 86_400_000_000)
                    >= q.COMEBACK_DAYS).sum())
        ng += gaps
        nc += int(gaps > 0)
    assert (got.n_comeback[0], got.n_gaps[0]) == (nc, ng)
