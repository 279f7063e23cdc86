"""Brute twin for wave 111: odd-cycle / bipartiteness census."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def test_odd_cycle_census_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    # fixed-round min-label CC
    lab = np.arange(n, dtype=np.int64)
    for _ in range(q.CC_ITERS):
        nb = np.full(n, np.iinfo(np.int64).max)
        np.minimum.at(nb, ud, lab[us])
        lab = np.minimum(lab, nb)
    # parity BFS from representatives (lab[v] == v), all at once
    d = np.where(lab == np.arange(n), 0, np.iinfo(np.int64).max // 2)
    for _ in range(q.ODDC_ROUNDS):
        relax = np.full(n, np.iinfo(np.int64).max // 2)
        np.minimum.at(relax, ud, d[us] + 1)
        d = np.minimum(d, relax)
    inf = np.iinfo(np.int64).max // 2
    # census over undirected pairs a < b
    keep = us < ud
    ea, eb = us[keep], ud[keep]
    odd = (d[ea] < inf) & (d[eb] < inf) & (d[ea] == d[eb])
    comps, sizes = np.unique(lab, return_counts=True)
    cidx = {c: i for i, c in enumerate(comps)}
    n_edges = np.zeros(len(comps), dtype=np.int64)
    odd_edges = np.zeros(len(comps), dtype=np.int64)
    for a, o in zip(ea, odd):
        i = cidx[lab[a]]
        n_edges[i] += 1
        odd_edges[i] += int(o)
    order = np.lexsort((comps, -sizes))[: q.ODDC_TOPC]

    got = q.q_odd_cycle_census(SF).to_pandas()
    ar = np.asarray(ctx.arith, dtype=np.int64)
    assert list(got.columns) == ["comp", "size", "n_edges", "odd_edges"]
    assert list(got.comp) == [f"m_{ar[comps[i]]}" for i in order]
    assert list(got["size"].astype(int)) == [int(sizes[i]) for i in order]
    assert list(got.n_edges.astype(int)) == [int(n_edges[i]) for i in order]
    assert list(got.odd_edges.astype(int)) == \
        [int(odd_edges[i]) for i in order]
    # witness sanity: an odd_edges == 0 component with all vertices
    # reached is 2-colorable by BFS parity (checked implicitly: every
    # edge crosses levels), and odd_edges never exceeds n_edges
    assert (got.odd_edges <= got.n_edges).all()


def test_odd_cycle_kernels_multi_component(ray_session, tmp_path):
    """Two disjoint cycles (C5 odd, C6 bipartite) through the SAME
    engine kernels: per-component parity census must flag exactly the
    odd cycle — the multi-component face the corpus graph (one giant
    component at both gate scales) cannot exercise."""
    import pyarrow as pa

    import ray
    from combblas_ray.core.engine import SpmvEngine
    from combblas_ray.core.graph import Graph
    from combblas_ray.pipelines import algorithms as alg
    from combblas_ray.pipelines import queries as q

    c5 = [(i, (i + 1) % 5) for i in range(5)]
    c6 = [(5 + i, 5 + (i + 1) % 6) for i in range(6)]
    und = c5 + c6
    src = np.array([a for a, b in und] + [b for a, b in und],
                   dtype=np.int64)
    dst = np.array([b for a, b in und] + [a for a, b in und],
                   dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "w": pa.array(np.ones(len(src)))}))
    g = Graph(n=11, edges=edges).dedup_sum()
    eng = SpmvEngine.from_graph(g, 2, str(tmp_path / "oc"),
                                structural=True)
    lab = eng.map_chunks_i(alg._iota)
    for _ in range(8):
        lab = eng.spmv_apply_refs(lab, "select2nd_min", alg._min2_b,
                                  1, lab)[0]
    d = eng.map_chunks_i(q._w111_seed, lab)
    for _ in range(8):
        d = eng.spmv_apply_refs(d, "min_plus", q._w111_relax, 1, d)[0]
    labf = eng.unchunk(lab).astype(np.int64)
    df = eng.unchunk(d)
    eng.shutdown()
    assert set(labf[:5]) == {0} and set(labf[5:]) == {5}
    assert np.isfinite(df).all()
    odd_by_comp = {0: 0, 5: 0}
    for a, b in und:
        if df[a] == df[b]:
            odd_by_comp[int(labf[a])] += 1
    assert odd_by_comp[0] == 1  # C5: exactly one same-level edge
    assert odd_by_comp[5] == 0  # C6: bipartite, BFS 2-colors it
