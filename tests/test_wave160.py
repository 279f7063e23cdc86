"""Brute twin for wave 160: 2D-grid vertex replication factor."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_replication_factor_vs_sets(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import default_grid, get_context

    ctx = get_context(SF)
    n, g = ctx.n, default_grid()
    ls = max(n // g, 1)
    edges = ctx.edges.to_pandas()

    blocks = {}
    for s, d in zip(edges["src"].astype(int), edges["dst"].astype(int)):
        bid = min(d // ls, g - 1) * g + min(s // ls, g - 1)
        blocks.setdefault(s, set()).add(bid)
        blocks.setdefault(d, set()).add(bid)
    exp = {}
    for v, bs in blocks.items():
        exp[len(bs)] = exp.get(len(bs), 0) + 1

    got = q.q_replication_factor(SF).to_pandas()
    assert {int(r.replication): int(r.n_vertices)
            for _, r in got.iterrows()} == exp
    # replication is bounded by the 2g-1 cross of the 2D layout
    assert int(got.replication.max()) <= 2 * g - 1
    # only vertices with at least one edge are counted
    assert int(got.n_vertices.sum()) == len(blocks)
