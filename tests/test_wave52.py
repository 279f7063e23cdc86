"""Brute twins for wave 52: weighted median, CC size histogram, audio
lag-1 autocorrelation, int64 polynomial SpMV, KMV distinct sketch."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _pq(name):
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_weighted_median_price_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    got = q.q_weighted_median_price(SF).to_pandas().set_index("p_brand")
    li = _pq("lineitem")[["l_partkey", "l_quantity"]]
    p = _pq("part")[["p_partkey", "p_brand", "p_retailprice"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["cents"] = np.floor(j.p_retailprice * 100 + 0.5).astype(np.int64)
    j["w"] = np.floor(j.l_quantity).astype(np.int64)
    for br, g in j.groupby("p_brand"):
        pw = g.groupby("cents").w.sum().sort_index()
        cw = pw.cumsum()
        tot = int(pw.sum())
        med = int(cw.index[np.searchsorted(2 * cw.to_numpy(), tot)])
        assert got.loc[br].wmedian_cents == med
        assert got.loc[br].total_qty == tot


def test_cc_size_hist_multi_component(tmp_path, ray_session):
    """The sf corpus graph is one component (the query returns one
    row); assert the histogram logic on a 3-component synthetic."""
    import ray

    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines import queries as q

    # components: {0..3} path, {4,5} pair, {6} isolated-with-loop-free
    src = np.array([0, 1, 2, 4], dtype=np.int64)
    dst = np.array([1, 2, 3, 5], dtype=np.int64)
    t = pa.table({"src": pa.array(np.concatenate([src, dst])),
                  "dst": pa.array(np.concatenate([dst, src])),
                  "w": pa.array(np.ones(8))})
    eng = SpmvEngine.from_graph(
        Graph(n=7, edges=ray.data.from_arrow(t)), 2,
        str(tmp_path / "cc7"), structural=True)
    comp = alg.cc_fixed(eng, 6)
    sizes = np.bincount(comp.astype(np.int64))
    sizes = sizes[sizes > 0]
    assert dict(Counter(sizes.tolist())) == {4: 1, 2: 1, 1: 1}
    eng.shutdown()
    got = q.q_cc_size_hist(SF).to_pandas()
    per = q.q_connected_components(SF).to_pandas()
    want = Counter(per.comp.value_counts().to_numpy().tolist())
    assert dict(zip(got["size"], got.n_components)) == dict(want)


def test_audio_lag_corr_vs_brute(ray_session):
    from combblas_ray.functions.multimodal import HEADER, make_audio_blob
    from combblas_ray.pipelines import queries as q

    got = q.q_audio_lag_corr(SF).to_pandas().set_index("item_id")
    for did in (0, 1, 2, 3, 17):
        blob = make_audio_blob(did)
        pcm = np.frombuffer(blob, dtype=np.int16,
                            offset=HEADER.size).astype(np.int64)
        assert got.loc[did].n_samples == len(pcm)
        assert got.loc[did].lag1 == int((pcm[:-1] * pcm[1:]).sum())


def test_poly_filter_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    got = q.q_poly_filter(SF).to_pandas().set_index("label")
    ctx = get_context(SF)
    e = ctx.edges.to_pandas()
    n = ctx.n
    A = np.zeros((n, n), dtype=np.int64)
    for s, d, w in zip(e.src, e.dst, e.w):
        A[int(d), int(s)] += int(w)
    ar = np.asarray(ctx.arith, dtype=np.int64)
    x = (ar % 11) + 1
    pvec = A @ (A @ x) + A @ x + x
    lab = ctx.gather_labels(np.arange(n))
    for i in (0, 1, 5, 100, n - 1):
        assert got.loc[lab[i]].p == pvec[i]


def test_kmv_distinct_vs_brute(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q

    got = q.q_kmv_distinct(SF).to_pandas().set_index("lang")
    docs = _pq("documents")
    vocab: dict[str, set] = {}
    for lang, text in zip(docs.lang, docs.text):
        t = text.split(" ")
        vocab.setdefault(lang, set()).update(
            a + " " + b for a, b in zip(t[:-1], t[1:]))
    hit_estimate_branch = False
    for lang, toks in vocab.items():
        hs = np.unique(np.array(
            [md5_lower64(s) & q.KMV_MASK for s in toks], dtype=np.int64))
        if len(hs) < q.KMV_K:
            est = len(hs)
        else:
            est = int((q.KMV_K - 1) * (1 << 40) // hs[q.KMV_K - 1])
            hit_estimate_branch = True
            # the sketch should be in the right ballpark (KMV error
            # ~1/sqrt(k) ~ 12.5%; allow 3 sigma)
            assert abs(est - len(toks)) < 0.4 * len(toks) + 10
        assert got.loc[lang].n_exact == len(toks)
        assert got.loc[lang].kmv_est == est
    assert hit_estimate_branch  # the >= k branch is actually exercised
