"""Direct unit tests for the generic warm-task shuffle primitives
(`group_apply_tasks`, `hash_join_tasks`) that the dedup/ANN/relational/
SpGEMM families are built on."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


def _table_ds(tbl: pa.Table, blocks: int = 4):
    return ray.data.from_arrow(tbl).repartition(blocks)


def test_group_apply_tasks_string_keys_colocate(ray_session):
    from combblas_ray.core.shuffle import group_apply_tasks

    rng = np.random.RandomState(3)
    keys = np.array(["k%d" % i for i in rng.randint(0, 37, size=1000)])
    vals = rng.randint(0, 100, size=1000)
    ds = _table_ds(pa.table({"k": pa.array(keys), "v": pa.array(vals)}))

    def _sum(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.string()),
                             "s": pa.array([], type=pa.int64())})
        k = np.asarray(batch.column("k")).astype(object)
        v = np.asarray(batch.column("v"), dtype=np.int64)
        uk, inv = np.unique(k.astype(str), return_inverse=True)
        return pa.table({"k": pa.array(uk.tolist(), type=pa.string()),
                         "s": pa.array(np.bincount(inv, weights=v).astype(np.int64))})

    got = group_apply_tasks(ds, ["k"], _sum).to_pandas()
    # a key appearing in two output rows would mean its rows were split
    # across partitions — the primitive's core contract
    assert got["k"].is_unique
    want = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].sum()
    got = got.set_index("k")["s"].sort_index()
    assert (got == want.sort_index()).all()


def test_group_apply_tasks_multi_int_keys(ray_session):
    from combblas_ray.core.shuffle import group_apply_tasks

    rng = np.random.RandomState(5)
    a = rng.randint(0, 11, size=500)
    b = rng.randint(0, 7, size=500)
    ds = _table_ds(pa.table({"a": pa.array(a), "b": pa.array(b)}))

    def _cnt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"a": z, "b": z, "c": z})
        aa = np.asarray(batch.column("a"), dtype=np.int64)
        bb = np.asarray(batch.column("b"), dtype=np.int64)
        key = aa * 100 + bb
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"a": pa.array(uk // 100), "b": pa.array(uk % 100),
                         "c": pa.array(cnt.astype(np.int64))})

    got = group_apply_tasks(ds, ["a", "b"], _cnt).to_pandas()
    assert not got.duplicated(["a", "b"]).any()
    want = (pd.DataFrame({"a": a, "b": b}).groupby(["a", "b"])
            .size().rename("c").reset_index())
    m = got.sort_values(["a", "b"]).reset_index(drop=True)
    w = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(m, w, check_dtype=False)


@pytest.mark.parametrize("join_type", ["inner", "left outer", "full outer"])
def test_hash_join_tasks_matches_pandas(ray_session, join_type):
    from combblas_ray.core.shuffle import hash_join_tasks

    rng = np.random.RandomState(7)
    lk = rng.randint(0, 50, size=300)
    rk = rng.randint(25, 75, size=200)
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(300))})
    right = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(200))})
    got = hash_join_tasks(_table_ds(left), _table_ds(right, 3), on="k",
                          join_type=join_type).to_pandas()
    how = {"inner": "inner", "left outer": "left",
           "full outer": "outer"}[join_type]
    want = left.to_pandas().merge(right.to_pandas(), on="k", how=how)
    assert len(got) == len(want)
    gs = got.fillna(-1).sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    ws = want.fillna(-1).sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gs[["k", "lv", "rv"]].astype(np.int64),
                                  ws[["k", "lv", "rv"]].astype(np.int64))


def test_hash_join_tasks_right_on_and_post(ray_session):
    from combblas_ray.core.shuffle import hash_join_tasks

    left = pa.table({"dst": pa.array([1, 2, 3, 2]),
                     "w": pa.array([1.0, 2.0, 3.0, 4.0])})
    right = pa.table({"src": pa.array([2, 3, 9]),
                      "w2": pa.array([10.0, 20.0, 30.0])})

    def _post(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("w")) * np.asarray(t.column("w2"))
        return pa.table({"dst": t.column("dst"), "prod": pa.array(w)})

    got = hash_join_tasks(_table_ds(left, 2), _table_ds(right, 2),
                          on="dst", right_on="src", post=_post).to_pandas()
    want = {(2, 20.0), (2, 40.0), (3, 60.0)}
    assert set(zip(got["dst"], got["prod"])) == want


def test_tree_fanin_merge_and_join(ray_session, monkeypatch):
    """Force the _MERGE_FANIN pre-concat tree (normally only hit past 128
    input blocks) and assert results are unchanged."""
    import combblas_ray.core.shuffle as sh

    monkeypatch.setattr(sh, "_MERGE_FANIN", 2)
    rng = np.random.RandomState(11)
    k = rng.randint(0, 9, size=400)
    v = rng.randint(0, 50, size=400)
    ds = _table_ds(pa.table({"k": pa.array(k), "v": pa.array(v)}), blocks=8)

    def _sum(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], type=pa.int64())
            return pa.table({"k": z, "s": z})
        kk = np.asarray(batch.column("k"), dtype=np.int64)
        vv = np.asarray(batch.column("v"), dtype=np.int64)
        uk, inv = np.unique(kk, return_inverse=True)
        return pa.table({"k": pa.array(uk),
                         "s": pa.array(np.bincount(inv, weights=vv).astype(np.int64))})

    got = sh.group_apply_tasks(ds, ["k"], _sum, num_partitions=5).to_pandas()
    want = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].sum()
    assert (got.set_index("k")["s"].sort_index() == want.sort_index()).all()

    right = _table_ds(pa.table({"k": pa.array(np.arange(9)),
                                "r": pa.array(np.arange(9) * 10)}), blocks=6)
    j = sh.hash_join_tasks(ds, right, on="k", num_partitions=5).to_pandas()
    assert len(j) == 400
    assert (j["r"] == j["k"] * 10).all()

    # edge-table variants through their combining trees
    src = rng.randint(0, 20, size=300)
    dst = rng.randint(0, 20, size=300)
    w = rng.rand(300)
    eds = _table_ds(pa.table({"src": pa.array(src), "dst": pa.array(dst),
                              "w": pa.array(w)}), blocks=8)
    got2 = sh.dedup_sum_tasks(eds, 20, num_partitions=5).to_pandas()
    want2 = (pd.DataFrame({"src": src, "dst": dst, "w": w})
             .groupby(["src", "dst"])["w"].sum())
    m2 = got2.set_index(["src", "dst"])["w"].sort_index()
    assert np.allclose(m2.values, want2.sort_index().values)
    assert len(m2) == len(want2)


def test_dedup_sum_plans_agree(ray_session):
    """plan='tasks' (warm-task route) vs plan='shuffle' (Ray-Data-native
    keyed_reduce) — the independent-machinery A/B gate."""
    from combblas_ray.core.graph import Graph

    rng = np.random.RandomState(13)
    src = rng.randint(0, 30, size=500)
    dst = rng.randint(0, 30, size=500)
    w = rng.rand(500)
    eds = _table_ds(pa.table({"src": pa.array(src), "dst": pa.array(dst),
                              "w": pa.array(w)}), blocks=6)
    g = Graph(n=30, edges=eds, labels=None)
    a = (g.dedup_sum("tasks").edges.to_pandas()
         .set_index(["src", "dst"])["w"].sort_index())
    b = (g.dedup_sum("shuffle").edges.to_pandas()
         .set_index(["src", "dst"])["w"].sort_index())
    assert len(a) == len(b)
    assert np.allclose(a.values, b.values)


def test_rand_reduce_survives_empty_partitions(ray_session):
    """Graph.reduce(agg='rand') with more partitions than keys: merge fns
    run on EMPTY partitions (schema stability), which used to crash the
    'rand' branch of group_reduce_per_key."""
    from combblas_ray.core.graph import Graph
    from combblas_ray.core.shuffle import group_reduce_per_key

    uk, red = group_reduce_per_key(
        np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64), "rand")
    assert len(uk) == 0 and len(red) == 0
    eds = _table_ds(pa.table({"src": pa.array([0, 0, 1]),
                              "dst": pa.array([1, 1, 0]),
                              "w": pa.array([2.0, 3.0, 4.0])}), blocks=2)
    g = Graph(n=2, edges=eds, labels=None)
    out = g.reduce("row", "rand").to_pandas().set_index("v")["val"]
    assert set(out.index) == {0, 1}
    assert out[0] in (2.0, 3.0) and out[1] == 4.0


def test_hash_join_tasks_empty_side(ray_session):
    """Empty sides must carry their schema in at least one block (the
    map_batches contract every call site satisfies; Ray's repartition of
    a fully-empty dataset erases the schema entirely, so the test builds
    the empty side with from_arrow directly)."""
    from combblas_ray.core.shuffle import hash_join_tasks

    left = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                     "lv": pa.array([10, 20], type=pa.int64())})
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "rv": pa.array([], type=pa.int64())})
    inner = hash_join_tasks(_table_ds(left, 2), ray.data.from_arrow(empty),
                            on="k").to_pandas()
    assert len(inner) == 0
    louter = hash_join_tasks(_table_ds(left, 2), ray.data.from_arrow(empty),
                             on="k", join_type="left outer").to_pandas()
    assert sorted(louter["lv"]) == [10, 20]
    assert louter["rv"].isna().all()
