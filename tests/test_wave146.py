"""Brute twins for waves 146-147: Arrow IPC roundtrip + hash ring."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_ipc_roundtrip_preserves_rows(ray_session):
    """Shard-level roundtrip: every (src, dst, w) row survives the IPC
    writer/reader pair exactly (multiset equality, not just sums)."""
    import pandas as pd

    from combblas_ray.pipelines.context import get_context
    from combblas_ray.sources import io as io_src

    ctx = get_context(SF)
    path = "/tmp/cbray_scratch/ipc_test_w146"
    import shutil
    shutil.rmtree(path, ignore_errors=True)
    import os
    os.makedirs(path)
    io_src.write_edges_ipc(ctx.graph("directed"), path)
    g2 = io_src.read_edges_ipc(path, ctx.n)
    a = ctx.graph("directed").edges.to_pandas()
    b = g2.edges.to_pandas()
    key = ["src", "dst", "w"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
    )
    # shard layout contract: one .arrows file per upstream block
    assert len(os.listdir(path)) == len(g2.edges.to_arrow_refs())


def test_ring_balance_vs_python_ints(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    ring = sorted(
        ((w * 104729 + v * 7919 + 1) % q.RING_M, w, v)
        for w in range(q.RING_W) for v in range(q.RING_V)
    )
    exp = {}
    for i in range(n):
        ipos = (i * 2654435761) % q.RING_M
        for pos, w, v in ring:
            if pos >= ipos:
                break
        else:
            _, w, v = ring[0]
        exp[w] = exp.get(w, 0) + 1

    got = q.q_ring_balance(SF).to_pandas()
    assert {int(r.worker): int(r.n_items)
            for _, r in got.iterrows()} == exp
    assert int(got.n_items.sum()) == n
    # consistent hashing keeps arcs reasonably balanced
    assert int(got.n_items.max()) < 6 * n // q.RING_W
