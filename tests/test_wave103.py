"""Brute twins for wave 103: salted-key aggregation faces."""

import numpy as np

from tests.test_wave86 import _und  # noqa: F401 (fixture helpers dir)

SF = "/root/testdata/sf0.001"


def _struct_dir(ctx):
    e = ctx.edges.to_pandas()
    s = np.asarray(e.src, dtype=np.int64)
    d = np.asarray(e.dst, dtype=np.int64)
    keep = s != d
    key = np.unique(s[keep] * ctx.n + d[keep])
    return key // ctx.n, key % ctx.n


def test_salted_degree_topk_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    s2, d2 = _struct_dir(ctx)
    ind = np.bincount(d2, minlength=ctx.n)
    ids = np.arange(ctx.n)
    top = np.lexsort((ids, -ind))[:q.SALT_TOPK]
    exp_lab = ctx.gather_labels(top.astype(np.int64))
    got = q.q_salted_degree_topk(SF).to_pandas()
    assert got.label.tolist() == list(exp_lab)
    assert got.indeg.tolist() == ind[top].tolist()


def test_salt_imbalance_vs_brute(ray_session):
    from combblas_ray.core.shuffle import _mix64
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    s2, d2 = _struct_dir(ctx)
    salt = (_mix64(s2.view(np.uint64)) % np.uint64(q.SALT_S)) \
        .astype(np.int64)
    plain_k = np.unique(d2, return_counts=True)[1]
    salted_k = np.unique(d2 * q.SALT_S + salt, return_counts=True)[1]
    got = q.q_salt_imbalance(SF).to_pandas().set_index("variant")
    assert int(got.loc["plain"].n_groups) == len(plain_k)
    assert int(got.loc["plain"].max_group) == int(plain_k.max())
    assert int(got.loc["salted"].n_groups) == len(salted_k)
    assert int(got.loc["salted"].max_group) == int(salted_k.max())
    assert int(got.loc["plain"].sum_rows) == len(s2)
    # the mitigation property: salting strictly shrinks the hot group
    assert int(got.loc["salted"].max_group) \
        < int(got.loc["plain"].max_group)
    assert int(got.loc["salted"].n_groups) \
        <= q.SALT_S * int(got.loc["plain"].n_groups)
