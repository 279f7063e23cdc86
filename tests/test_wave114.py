"""Brute twin for wave 114: gap-encoding cost model."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _bits(x):
    return int(x).bit_length()


def _cost(adj_pairs, n):
    by_u = {}
    for u, v in adj_pairs:
        by_u.setdefault(u, []).append(v)
    bits = 0
    for u, vs in by_u.items():
        vs = sorted(vs)
        bits += _bits(vs[0] + 1)
        for a, b in zip(vs, vs[1:]):
            bits += _bits(b - a)
    return bits, len(by_u)


def test_gap_encoding_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    n = ctx.n
    pairs = list(zip(us.tolist(), ud.tolist()))
    bo, lo = _cost(pairs, n)
    deg = np.bincount(us, minlength=n).astype(np.int64)
    have = np.nonzero(deg > 0)[0]
    order = have[np.lexsort((have, -deg[have]))]
    rank = np.full(n, -1, dtype=np.int64)
    rank[order] = np.arange(len(order))
    rpairs = [(int(rank[u]), int(rank[v])) for u, v in pairs]
    br, lr = _cost(rpairs, n)

    got = {r.ordering: (int(r.total_bits), int(r.n_lists))
           for _, r in q.q_gap_encoding(SF).to_pandas().iterrows()}
    assert got == {"orig": (bo, lo), "degrank": (br, lr)}
    # the degree-rank relabel must not lengthen lists, and on this
    # hub-heavy corpus it should strictly shrink the encoding
    assert got["degrank"][1] == got["orig"][1]
    assert got["degrank"][0] < got["orig"][0]
