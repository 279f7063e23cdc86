"""Round-3 additions: clustering coefficients, k-core, HITS, vocabulary
top-k, benchmark decontamination — brute-force equivalence on the n=500
corpus graph / sf0.001 documents."""

import numpy as np
import pytest

import ray

from tests.conftest import brute_dense_matrix

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def doc_rows(docs):
    return docs.take_all()


@pytest.fixture(scope="module")
def und500(ctx500):
    """Brute undirected simple 0/1 adjacency in dense-id space."""
    A = brute_dense_matrix(ctx500)
    B = ((A + A.T) > 0).astype(np.int64)
    np.fill_diagonal(B, 0)
    return B


def test_clustering_coefficients_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    B = und500
    n = ctx500.n
    deg_b = B.sum(axis=1)
    tri_b = np.diag(B @ B @ B) // 2

    t = alg.clustering_coefficients(ctx500.graph("sym").edges, n,
                                    num_partitions=4)
    v = np.asarray(t.column("v"))
    deg = np.zeros(n, dtype=np.int64)
    tri = np.zeros(n, dtype=np.int64)
    deg[v] = np.asarray(t.column("deg"))
    tri[v] = np.asarray(t.column("tri"))
    assert np.array_equal(deg, deg_b)
    assert np.array_equal(tri, tri_b)
    # triple-counted total must agree with the scalar pipeline
    total = alg.triangle_count(ctx500.graph("sym").edges, n, method="join")
    assert tri.sum() == 3 * total


def test_clustering_coefficients_g1(ctx500, und500):
    """num_partitions=1 exercises every g==1 special case in the plan."""
    from combblas_ray.pipelines import algorithms as alg

    t = alg.clustering_coefficients(ctx500.graph("sym").edges, ctx500.n,
                                    num_partitions=1)
    tri = np.zeros(ctx500.n, dtype=np.int64)
    tri[np.asarray(t.column("v"))] = np.asarray(t.column("tri"))
    assert np.array_equal(tri, np.diag(und500 @ und500 @ und500) // 2)


def test_kcore_fixed_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    B = und500
    k, rounds = 3, 6
    act = np.ones(ctx500.n, dtype=bool)
    for _ in range(rounds):
        act = act & (B @ act.astype(np.int64) >= k)
    core = alg.kcore_fixed(ctx500.engine("sym"), k, rounds)
    assert np.array_equal(core.astype(bool), act)


def test_kcore_converges_to_true_core(ctx500, und500):
    """Enough rounds = the true k-core (peeling fixpoint)."""
    from combblas_ray.pipelines import algorithms as alg

    B = und500
    act = np.ones(ctx500.n, dtype=bool)
    it = 0
    while True:
        new = act & (B @ act.astype(np.int64) >= 2)
        it += 1
        if np.array_equal(new, act):
            break
        act = new
    core = alg.kcore_fixed(ctx500.engine("sym"), 2, it + 3)
    assert np.array_equal(core.astype(bool), act)


def test_hits_fixed_vs_brute(ctx500):
    from combblas_ray.pipelines import algorithms as alg

    A = brute_dense_matrix(ctx500)  # A[dst, src] weights
    M = (A > 0).astype(np.int64)  # structural
    h = np.ones(ctx500.n, dtype=np.int64)
    for _ in range(3):
        a = M @ h  # auth[dst] = sum over src
        h = M.T @ a  # hub[src] = sum over dst
    auth, hub = alg.hits_fixed(
        ctx500.engine("dir_bool"), ctx500.engine("rev_bool"), 3
    )
    assert np.array_equal(auth, a)
    assert np.array_equal(hub, h)


def test_vocab_topk_vs_brute(docs, doc_rows):
    from collections import Counter

    from combblas_ray.functions.text import vocab_topk

    c = Counter()
    for r in doc_rows:
        c.update(r["text"].split(" "))
    brute = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    t = vocab_topk(docs, k=10)
    got = list(zip(
        np.asarray(t.column("tok")).tolist(),
        np.asarray(t.column("cnt")).tolist(),
    ))
    assert got == brute


def test_decontaminate_vs_brute(docs, doc_rows):
    from combblas_ray.functions.dedup import decontaminate

    mod = 97
    sh = {}
    for r in doc_rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    bench = set()
    for d, s in sh.items():
        if d % mod == 0:
            bench |= s
    brute = {
        d: len(s & bench)
        for d, s in sh.items()
        if d % mod != 0 and s & bench
    }

    out = decontaminate(docs, bench_mod=mod).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contam"]))
    assert got == brute


def test_decontaminate_empty_bench(ray_session):
    """No benchmark docs at all -> empty output, schema intact."""
    import pyarrow as pa

    from combblas_ray.functions.dedup import decontaminate

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["a b c d", "b c d e", "x y z w"]),
    }))
    out = decontaminate(ds, bench_mod=97).to_pandas()
    # doc_id 0 absent -> benchmark set is empty -> nothing contaminated
    assert len(out) == 0


def test_ppr_fixed_vs_brute(ctx500):
    from combblas_ray.pipelines.pagerank import ppr_fixed

    A = brute_dense_matrix(ctx500)  # A[dst, src]
    n = ctx500.n
    d = 0.85
    mask = (np.asarray(ctx500.arith) % 101) == 0
    t = mask.astype(np.float64)
    t /= t.sum()
    outw = A.sum(axis=0)
    dang = outw == 0.0
    inv = np.where(dang, 0.0, 1.0 / np.where(dang, 1.0, outw))
    r = t.copy()
    for _ in range(10):
        x = r * inv
        dm = r[dang].sum()
        r = (1.0 - d) * t + d * (A @ x + dm * t)
    got = ppr_fixed(ctx500.engine("directed"), mask, iters=10)
    assert np.allclose(got, r, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # probability mass conserved


def test_ppr_empty_seed_raises(ctx500):
    from combblas_ray.pipelines.pagerank import ppr_fixed

    with pytest.raises(ValueError):
        ppr_fixed(ctx500.engine("directed"),
                  np.zeros(ctx500.n, dtype=bool), iters=1)


def _brute_containment(doc_rows, tau):
    from itertools import combinations

    sh = {}
    for r in doc_rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    want = {}
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if not inter:
            continue
        cont = inter / min(len(sh[a]), len(sh[b]))
        if cont >= tau:
            want[(a, b)] = round(cont, 6)
    return want


def test_containment_pairs_vs_brute(docs, doc_rows):
    from combblas_ray.functions.dedup import containment_pairs

    got = {
        (r["a"], r["b"]): r["cont"]
        for r in containment_pairs(docs, 0.6).take_all()
    }
    assert got == _brute_containment(doc_rows, 0.6)


def test_containment_fallback_when_df_cap_binds(docs, doc_rows,
                                                monkeypatch):
    """Forced df cap: containment must ride the string-verify fallback
    with the capped-candidate semantics, like jaccard."""
    import functools
    from collections import Counter
    from itertools import combinations

    from combblas_ray.functions import dedup as D

    CAP = 3
    monkeypatch.setattr(
        D, "_postings_pairs_counted",
        functools.partial(D._postings_pairs_counted, df_cap=CAP),
    )
    got = {
        (r["a"], r["b"]): r["cont"]
        for r in D.containment_pairs(docs, 0.6).take_all()
    }
    sh = {}
    for r in doc_rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    df = Counter(s for ss in sh.values() for s in ss)
    assert any(c > CAP for c in df.values())
    want = {}
    for a, b in combinations(sorted(sh), 2):
        shared = sh[a] & sh[b]
        if not any(df[s] <= CAP for s in shared):
            continue
        cont = len(shared) / min(len(sh[a]), len(sh[b]))
        if cont >= 0.6:
            want[(a, b)] = round(cont, 6)
    assert got == want


def _brute_ktruss(pairs: set, k: int, rounds: int) -> set:
    cur = set(pairs)
    for _ in range(rounds):
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        cur = {
            (a, b) for a, b in cur
            if len(adj[a] & adj[b]) >= k - 2
        }
    return cur


def _pairs_of(keys, n):
    return {(int(x // n), int(x % n)) for x in keys}


def test_ktruss_fixed_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    n = ctx500.n
    xs, ys = np.nonzero(np.triu(und500))
    pairs = set(zip(xs.tolist(), ys.tolist()))
    for k, rounds in ((3, 1), (3, 2), (4, 1), (4, 3)):
        got = _pairs_of(
            alg.ktruss_fixed(ctx500.graph("sym").edges, n, k, rounds,
                             num_partitions=4),
            n,
        )
        assert got == _brute_ktruss(pairs, k, rounds), (k, rounds)


def test_ktruss_multi_round_dynamics(ray_session):
    """Crafted graph where round count changes the answer: a 5-clique
    (4-truss core) plus a triangle chain whose shared edge only dies in
    round 2, after its outer support vanished in round 1."""
    import pyarrow as pa

    from combblas_ray.pipelines import algorithms as alg

    # clique on 0..4; chain: triangles (10,11,12) and (11,12,13) share
    # edge (11,12); triangle (5,6,7) isolated
    und = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    und += [(10, 11), (10, 12), (11, 12), (11, 13), (12, 13), (5, 6),
            (5, 7), (6, 7)]
    n = 14
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "w": pa.array([1.0] * len(src)),
    }))
    r1 = _pairs_of(alg.ktruss_fixed(ds, n, 4, 1, num_partitions=2), n)
    r2 = _pairs_of(alg.ktruss_fixed(ds, n, 4, 2, num_partitions=2), n)
    brute1 = _brute_ktruss(set(und), 4, 1)
    brute2 = _brute_ktruss(set(und), 4, 2)
    assert r1 == brute1 and r2 == brute2
    assert (11, 12) in r1 and (11, 12) not in r2  # dies only in round 2
    clique = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    assert r2 == clique


def test_sample_stratified_vs_brute(ray_session):
    from combblas_ray.functions.text import (
        SAMPLE_QUOTA, sample_stratified,
    )

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang"])
    rows = docs.take_all()
    want = {
        r["doc_id"]
        for r in rows
        if (r["doc_id"] * 48271 + 11) % 100
        < SAMPLE_QUOTA.get(r["lang"], 50)
    }
    out = sample_stratified(docs).to_pandas()
    assert set(out["doc_id"]) == want
    # determinism: re-run selects the identical rows (resumability)
    out2 = sample_stratified(docs).to_pandas()
    assert set(out2["doc_id"]) == want
    # the over-represented language is actually cut hardest
    frac = out.groupby("lang").size() / (
        __import__("pandas").Series([r["lang"] for r in rows])
        .value_counts()
    )
    assert frac["en"] < frac.drop("en").min()


def test_decontaminate_join_plan_agrees(docs):
    """broadcast_max=0 forces the distributed semi-join plan; it must
    emit exactly the broadcast plan's (doc_id, n_contam) rows."""
    from combblas_ray.functions.dedup import decontaminate

    a = decontaminate(docs, bench_mod=97).to_pandas()
    b = decontaminate(docs, bench_mod=97, broadcast_max=0).to_pandas()
    da = dict(zip(a["doc_id"], a["n_contam"]))
    db = dict(zip(b["doc_id"], b["n_contam"]))
    assert da == db and len(da) > 0


def test_scale_form_returns_datasets(ctx500, und500):
    """materialize=False keeps per-vertex / per-edge output distributed;
    rows must equal the materialized form."""
    from combblas_ray.pipelines import algorithms as alg

    edges = ctx500.graph("sym").edges
    n = ctx500.n
    ds = alg.clustering_coefficients(edges, n, num_partitions=3,
                                     materialize=False)
    df = ds.to_pandas().set_index("v").sort_index()
    t = alg.clustering_coefficients(edges, n, num_partitions=3)
    tt = t.to_pandas().set_index("v").sort_index()
    assert df.equals(tt)

    # ktruss scale form on a graph whose truss is non-empty (the n=500
    # corpus graph's 3-truss after 2 rounds is legitimately empty)
    import pyarrow as pa

    und = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    tiny = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "w": pa.array([1.0] * len(src)),
    }))
    kd = alg.ktruss_fixed(tiny, 5, 4, 2, num_partitions=2,
                          materialize=False).to_pandas()
    keys = alg.ktruss_fixed(tiny, 5, 4, 2, num_partitions=2)
    got = set(zip(kd["src"], kd["dst"]))
    want = {(int(x // 5), int(x % 5)) for x in keys}
    assert got == want and len(want) == 10  # the 5-clique survives


def test_sample_stratified_rejects_out_of_domain(ray_session):
    import pyarrow as pa

    from combblas_ray.functions.text import sample_stratified

    bad = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([-1, 5], type=pa.int64()),
        "lang": pa.array(["en", "de"]),
    }))
    with pytest.raises(Exception, match="domain"):
        sample_stratified(bad).take_all()


def test_redact_vs_brute(docs, doc_rows):
    import re

    from combblas_ray.functions.text import (
        REDACT_PATTERNS, REDACT_REPL, redact,
    )

    out = {r["doc_id"]: r
           for r in redact(docs, concurrency=1).take_all()}
    for r in doc_rows:
        s, n = r["text"], 0
        for p in REDACT_PATTERNS:
            n += len(re.findall(p, s))
            s = re.sub(p, REDACT_REPL, s)
        got = out[r["doc_id"]]
        assert got["clean"] == s and got["n_redact"] == n
    assert sum(v["n_redact"] for v in out.values()) > 0  # really fired


def test_redact_pii_classes(ray_session):
    """The SSN/email classes match and count sequentially."""
    import pyarrow as pa

    from combblas_ray.functions.text import redact

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["ssn 123-45-6789 mail a.b@c.d spark end"]),
    }))
    row = redact(ds, concurrency=1).take_all()[0]
    assert row["n_redact"] == 3
    assert row["clean"] == (
        "ssn [REDACTED] mail [REDACTED] [REDACTED] end"
    )


def test_events_quantiles_vs_brute(ray_session):
    from combblas_ray.pipelines.queries import q_events_quantiles

    out = q_events_quantiles(SF).to_pandas().set_index("event_type")
    rows = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).take_all()
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by.items():
        s = np.sort(np.array(vals))
        n = len(s)
        for col, q in (("q50", 0.5), ("q90", 0.9), ("q99", 0.99)):
            want = s[min(n - 1, int(np.ceil(q * n)) - 1)]
            assert out.loc[et, col] == want, (et, col)


def test_tpch_q3_vs_pandas_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.queries import (TPCH_Q3_DATE, TPCH_Q3_SEG,
                                                q_tpch_q3)

    out = q_tpch_q3(SF).to_pandas()
    cut = pd.Timestamp(*TPCH_Q3_DATE)
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    c = c[c.c_mktsegment == TPCH_Q3_SEG]
    o = o[o.o_orderdate < cut]
    li = li[li.l_shipdate > cut].copy()
    li["cents"] = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100
    ).astype(np.int64)
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey")
    g = (j.groupby("l_orderkey")
          .agg(rev_cents=("cents", "sum"), o_orderdate=("o_orderdate", "min"),
               o_orderpriority=("o_orderpriority", "min"))
          .reset_index()
          .sort_values(["rev_cents", "l_orderkey"], ascending=[False, True])
          .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["l_orderkey", "rev_cents", "o_orderdate", "o_orderpriority"]],
        g, check_dtype=False)


def test_group_topn_vs_pandas_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.queries import TOPN_PER_LANG, q_group_topn

    out = q_group_topn(SF).to_pandas().sort_values(
        ["lang", "rnk"]).reset_index(drop=True)
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    d = d.sort_values(["lang", "n_chars", "doc_id"],
                      ascending=[True, False, True])
    d["rnk"] = d.groupby("lang").cumcount() + 1
    want = d[d.rnk <= TOPN_PER_LANG].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "lang", "n_chars", "rnk"]],
        want[["doc_id", "lang", "n_chars", "rnk"]], check_dtype=False)


def test_degree_hist_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    # brute: out-degrees of the same sf0.001 corpus graph the query runs on
    rows = get_context(SF).edges.take_all()
    deg = {}
    for r in rows:
        deg[r["src"]] = deg.get(r["src"], 0) + 1
    want = {}
    for c in deg.values():
        b = int(np.floor(np.log2(c)))
        want[b] = want.get(b, 0) + 1
    t = q.q_degree_hist(SF).to_pandas()
    got = dict(zip(t.bucket, t.n_vertices))
    assert got == want


def _brute_jp(B, prio, rounds):
    """Synchronous Jones-Plassmann on a dense 0/1 adjacency."""
    n = B.shape[0]
    color = np.full(n, -1, dtype=np.int64)
    for _ in range(rounds):
        unc = color < 0
        if not unc.any():
            break
        win = np.zeros(n, dtype=bool)
        for v in np.nonzero(unc)[0]:
            nb = np.nonzero(B[v])[0]
            nbu = nb[unc[nb]]
            if len(nbu) == 0 or prio[v] < prio[nbu].min():
                win[v] = True
        for v in np.nonzero(win)[0]:
            used = set(color[u] for u in np.nonzero(B[v])[0] if color[u] >= 0)
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return color


def test_jp_coloring_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    n = ctx500.n
    prio = (np.arange(n, dtype=np.int64) * 48271 + 37) % 2147483647
    for rounds in (1, 3, 8):
        got = alg.jp_coloring(ctx500.engine("sym"), prio_full=prio,
                              max_rounds=rounds)
        want = _brute_jp(und500, prio, rounds)
        assert np.array_equal(got, want), rounds


def test_jp_coloring_proper(ctx500, und500):
    """Converged coloring is proper: no edge joins two equal colors."""
    from combblas_ray.pipelines import algorithms as alg

    color = alg.jp_coloring(ctx500.engine("sym"), seed=3)
    assert (color >= 0).all()
    src, dst = np.nonzero(und500)
    assert (color[src] != color[dst]).all()


def test_jp_mask_width_guard():
    from combblas_ray.pipelines.algorithms import _jp_x_mask

    with pytest.raises(NotImplementedError):
        _jp_x_mask(np.array([0, 5, 62], dtype=np.int64))


def test_bfs_sigma_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    B = und500
    n = ctx500.n
    root = 7
    # brute level-synchronous sigma
    dist = np.full(n, np.inf)
    sig = np.zeros(n, dtype=np.int64)
    dist[root], sig[root] = 0.0, 1
    for lvl in range(12):
        x = np.where(dist == lvl, sig, 0)
        y = B @ x
        new = np.isinf(dist) & (y > 0)
        dist[new] = lvl + 1
        sig[new] = y[new]
    d, s = alg.bfs_sigma(ctx500.engine("sym"), root, iters=12)
    assert np.array_equal(np.isfinite(d), np.isfinite(dist))
    assert np.array_equal(d[np.isfinite(d)], dist[np.isfinite(dist)])
    assert np.array_equal(s.astype(np.int64), sig)


def test_katz_fixed_vs_brute(ctx500):
    from combblas_ray.pipelines import algorithms as alg

    A = brute_dense_matrix(ctx500)  # A[dst, src]
    M = (A > 0).astype(np.float64)
    x = np.ones(ctx500.n)
    for _ in range(3):
        x = 1.0 + 0.125 * (M @ x)
    got = alg.katz_fixed(ctx500.engine("dir_bool"), 3, 0.125)
    assert np.array_equal(got, x)  # dyadic-exact: bit equality, no allclose


def test_katz_alpha_guard(ctx500):
    from combblas_ray.pipelines import algorithms as alg

    with pytest.raises(ValueError):
        alg.katz_fixed(ctx500.engine("dir_bool"), 1, alpha=0.1)


def test_dup_clusters_vs_brute(docs, doc_rows):
    """Fixed-round min-label over the brute pair graph; with enough
    rounds = true connected components of the near-dup graph."""
    from itertools import combinations

    from combblas_ray.functions.dedup import dup_clusters

    sh = {}
    for r in doc_rows:
        t = r["text"].split(" ")
        sh[r["doc_id"]] = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    adj = {}
    for a, b in combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    lbl = {v: v for v in adj}
    for _ in range(6):
        new = {v: min([lbl[v]] + [lbl[u] for u in adj[v]]) for v in adj}
        lbl = new

    out = dup_clusters(docs, tau=0.5, rounds=6).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster"]))
    assert got == lbl
    # 6 rounds converged on this corpus: labels are the component minimum
    stable = {v: min([lbl[v]] + [lbl[u] for u in adj[v]]) for v in adj}
    assert stable == lbl


def test_degree_corr_stats_vs_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.context import get_context
    from combblas_ray.pipelines.queries import q_degree_corr_stats

    e = get_context(SF).edges.to_pandas()
    du = e.groupby("src").size()
    dv = e.groupby("dst").size()
    edu = e.src.map(du).to_numpy(dtype=np.int64)
    edv = e.dst.map(dv).to_numpy(dtype=np.int64)
    out = q_degree_corr_stats(SF).to_pandas().iloc[0]
    assert out["m"] == len(e)
    assert out["sum_du"] == edu.sum()
    assert out["sum_dv"] == edv.sum()
    assert out["sum_dudv"] == (edu * edv).sum()
    assert out["sum_du2"] == (edu * edu).sum()
    assert out["sum_dv2"] == (edv * edv).sum()


def test_funnel_vs_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.queries import FUNNEL_STAGES, q_funnel

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    want = {}
    prev = None  # user -> first qualifying ts of previous stage
    for stage in FUNNEL_STAGES:
        sel = ev[ev.event_type == stage]
        if prev is not None:
            sel = sel[sel.user_id.isin(prev.index)]
            sel = sel[sel.ts.to_numpy()
                      > prev.loc[sel.user_id].to_numpy()]
        cur = sel.groupby("user_id").ts.min()
        want[stage] = len(cur)
        prev = cur
    out = q_funnel(SF).to_pandas()
    got = dict(zip(out.stage, out.n_users))
    assert got == want
    # funnel is monotone non-increasing
    vals = [got[s] for s in FUNNEL_STAGES]
    assert vals == sorted(vals, reverse=True)


def test_harmonic2_vs_brute(ctx500, und500):
    from combblas_ray.pipelines.queries import harmonic2_table

    out = harmonic2_table(ctx500)
    A = und500.astype(np.float64)
    bc1 = A.sum(axis=1).astype(np.int64)
    t2 = (A @ A) > 0
    np.fill_diagonal(t2, False)
    t2[A > 0] = False  # 2-hop-only
    bc2 = t2.sum(axis=1).astype(np.int64)
    # label order == dense-id order (labels lexicographically sorted)
    assert np.array_equal(np.asarray(out.column("c1")), bc1)
    assert np.array_equal(np.asarray(out.column("c2")), bc2)
    assert np.array_equal(np.asarray(out.column("harmonic")),
                          bc1 + 0.5 * bc2)


def test_link_predict_cn_vs_brute(ctx500, und500):
    from combblas_ray.pipelines.queries import (LP_CN_MIN, LP_CN_TOPK,
                                                link_predict_cn_table)

    A = und500.astype(np.float64)
    CN = (A @ A).astype(np.int64)
    np.fill_diagonal(CN, 0)
    lab = np.asarray(ctx500.labels)
    want = []
    iu, ju = np.triu_indices(ctx500.n, k=1)
    for i, j in zip(iu, ju):
        if und500[i, j] == 0 and CN[i, j] >= LP_CN_MIN:
            want.append((-CN[i, j], i, j))
    want = sorted(want)[:LP_CN_TOPK]
    want = [(lab[i], lab[j], -c) for c, i, j in want]

    out = link_predict_cn_table(ctx500)
    got = list(zip(np.asarray(out.column("a")).tolist(),
                   np.asarray(out.column("b")).tolist(),
                   np.asarray(out.column("cn")).tolist()))
    assert got == want


def test_countmin_sketch_vs_brute(docs, doc_rows):
    from collections import Counter

    from combblas_ray.functions.text import (CM_D, CM_W, countmin_estimate,
                                             countmin_sketch, md5_lower64)

    true = Counter()
    for r in doc_rows:
        true.update(r["text"].split(" "))

    import pyarrow as pa

    tab = pa.Table.from_pandas(countmin_sketch(docs).to_pandas())
    # brute sketch
    want = np.zeros((CM_D, CM_W), dtype=np.int64)
    for tok, c in true.items():
        h = md5_lower64(tok)
        for r in range(CM_D):
            want[r, (h >> (16 * r)) & (CM_W - 1)] += c
    got = np.zeros((CM_D, CM_W), dtype=np.int64)
    got[np.asarray(tab.column("r")), np.asarray(tab.column("b"))] = \
        np.asarray(tab.column("cnt"))
    assert np.array_equal(got, want)
    # estimator invariants: est >= true for every token; exact for most
    toks = list(true)[:200]
    est = countmin_estimate(tab, toks)
    tru = np.array([true[t] for t in toks])
    assert (est >= tru).all()
    assert (est <= tru + int(0.02 * sum(true.values()))).all()


def test_events_sliding_vs_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.queries import q_events_sliding

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    hour = ev.ts.dt.floor("h")
    frames = []
    for k in range(2):
        frames.append(pd.DataFrame({
            "win": hour - pd.Timedelta(hours=k),
            "event_type": ev.event_type, "value": ev.value}))
    allw = pd.concat(frames)
    want = (allw.groupby(["win", "event_type"])
            .agg(cnt=("value", "size"), sum_value=("value", "sum"))
            .reset_index())
    want["sum_value"] = want["sum_value"].round(6)
    out = q_events_sliding(SF).to_pandas()
    a = out.sort_values(["win", "event_type"]).reset_index(drop=True)
    b = want.sort_values(["win", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["win", "event_type", "cnt", "sum_value"]], b, check_dtype=False,
        atol=1e-9)
    # every event is in exactly 2 windows: total count doubles hourly's
    assert out.cnt.sum() == 2 * len(ev)


def test_msbfs_vs_brute(ctx500, und500):
    from combblas_ray.pipelines import algorithms as alg

    n = ctx500.n
    seeds = np.nonzero(np.asarray(ctx500.arith) % 11 == 0)[0]
    dist = np.full(n, np.inf)
    dist[seeds] = 0.0
    for _ in range(12):
        # relax: min over neighbors of d+1
        cand = np.full(n, np.inf)
        for v in range(n):
            nb = np.nonzero(und500[v])[0]
            if len(nb):
                cand[v] = dist[nb].min() + 1
        dist = np.minimum(dist, cand)
    got = alg.msbfs_distances(ctx500.engine("sym"), seeds, iters=12)
    assert np.array_equal(np.isfinite(got), np.isfinite(dist))
    f = np.isfinite(dist)
    assert np.array_equal(got[f], dist[f])


def test_events_outliers_vs_brute(ray_session):
    import pandas as pd

    from combblas_ray.pipelines.queries import q_events_outliers

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    want = {}
    for et, g in ev.groupby("event_type"):
        s = np.sort(g.value.to_numpy())
        p99 = s[min(len(s) - 1, int(np.ceil(0.99 * len(s))) - 1)]
        above = int((s > p99).sum())
        if above:
            want[et] = (p99, above)
    out = q_events_outliers(SF).to_pandas()
    got = {r.event_type: (r.p99, r.n_above) for r in out.itertuples()}
    assert got == want


def test_bigram_novelty_vs_brute(ray_session, docs, doc_rows):
    from combblas_ray.pipelines.queries import q_bigram_novelty

    from collections import Counter

    per_doc = {}
    df = Counter()
    for r in doc_rows:
        t = r["text"].split(" ")
        bgs = {f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)}
        per_doc[r["doc_id"]] = bgs
        df.update(bgs)
    want = {}
    for d, bgs in per_doc.items():
        u = sum(1 for b in bgs if df[b] == 1)
        if u:
            want[d] = u
    out = q_bigram_novelty(SF).to_pandas()
    got = dict(zip(out.doc_id, out.n_unique))
    assert got == want


def test_rand_reduce_functor(ray_session):
    """RandReduce (Operations.h:184-201) as the deterministic packed-key
    min: associative (any reduction tree agrees), seeded, decodable."""
    from combblas_ray.core.vecops import rand_reduce_decode, rand_reduce_key

    rng = np.random.RandomState(3)
    v = rng.randint(0, 1 << 20, size=1000).astype(np.int64)
    k = rand_reduce_key(v, seed=11)
    # brute pick = argmin of the packed key
    pick = int(rand_reduce_decode(np.array([k.min()])))
    assert pick in set(v.tolist())
    # associativity/order-independence: tree reduction over shuffled
    # chunkings picks the same representative
    for seed in (0, 1, 2):
        perm = np.random.RandomState(seed).permutation(len(v))
        parts = np.array_split(k[perm], 7)
        tree = min(p.min() for p in parts if len(p))
        assert int(rand_reduce_decode(np.array([tree]))) == pick
    # different seed -> (almost surely) different representative stream
    k2 = rand_reduce_key(v, seed=12)
    assert k2.tolist() != k.tolist()
    # width guard fails loudly
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        rand_reduce_key(np.array([1 << 31], dtype=np.int64))


def test_jp_coloring_multiword_past_62_colors(ray_session, tmp_path):
    """K_70 needs 70 colors — the multi-word bor_second SpMM mask must
    take over past 62 (round-3 'what's missing': the >62-color raise)
    and still produce a proper minimal greedy coloring."""
    import pyarrow as pa

    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines import algorithms as alg

    n = 70
    src, dst = np.nonzero(np.ones((n, n)) - np.eye(n))
    t = pa.table({"src": pa.array(src.astype(np.int64)),
                  "dst": pa.array(dst.astype(np.int64)),
                  "w": pa.array(np.ones(len(src)))})
    eng = SpmvEngine.from_graph(
        Graph(n=n, edges=ray.data.from_arrow(t)), 2,
        str(tmp_path / "k70"), structural=True)
    color = alg.jp_coloring(eng, seed=5)
    eng.shutdown()
    # complete graph: all colors distinct, exactly 0..69 under greedy JP
    assert sorted(color.tolist()) == list(range(n))


def test_ibincount_exact_past_2e53():
    """ibincount (round-3 advice): integer accumulation is exact where
    float64-weighted bincount rounds — group sums past 2^53 — and
    matches bincount exactly in-range (bool weights, minlength,
    negatives, empty)."""
    import numpy as np

    from combblas_ray.util import ibincount

    rng = np.random.default_rng(7)
    x = rng.integers(0, 40, 50_000)
    w = rng.integers(-10**6, 10**6, 50_000)
    ref = np.bincount(x, weights=w.astype(np.float64)).astype(np.int64)
    assert np.array_equal(ibincount(x, w), ref)  # in-range parity
    b = rng.random(500) < 0.5
    got = ibincount(np.zeros(4, np.int64), b[:4].astype(np.float64),
                    minlength=6)
    assert got.shape == (6,) and got[0] == int(b[:4].sum())
    assert ibincount(np.array([], np.int64), np.array([])).shape == (0,)
    # exactness: 2^62 + 3 survives; the float64 idiom would round it
    big = ibincount(np.zeros(2, np.int64),
                    np.array([2**62, 3], np.int64))
    assert int(big[0]) == 2**62 + 3
    lossy = np.bincount(np.zeros(2, np.int64),
                        weights=np.array([2.0**62, 3.0])).astype(np.int64)
    assert int(lossy[0]) != 2**62 + 3
