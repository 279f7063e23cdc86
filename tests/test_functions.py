"""Training-data operators: dedup / text / ANN / multimodal / IO."""

import numpy as np
import pytest

import ray

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def doc_rows(docs):
    return docs.take_all()


def _brute_shingles(rows):
    out = {}
    for r in rows:
        t = r["text"].split(" ")
        out[r["doc_id"]] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    return out


def _brute_jaccard_pairs(rows, tau):
    import itertools

    sh = _brute_shingles(rows)
    pairs = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if not inter:
            continue
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= tau:
            pairs[(a, b)] = round(jac, 6)
    return pairs


def test_jaccard_pairs_match_brute(docs, doc_rows):
    from combblas_ray.functions.dedup import jaccard_pairs

    got = {
        (r["a"], r["b"]): r["jac"] for r in jaccard_pairs(docs, 0.5).take_all()
    }
    assert got == _brute_jaccard_pairs(doc_rows, 0.5)


def test_minhash_lsh_finds_same_pairs(docs, doc_rows):
    """On this corpus every true pair has jaccard ~1.0, so 16x4 banding
    must reach recall 1.0 (and exact verification kills false positives)."""
    from combblas_ray.functions.dedup import minhash_lsh_pairs

    got = {
        (r["a"], r["b"]): r["jac"]
        for r in minhash_lsh_pairs(docs, 0.5).take_all()
    }
    assert got == _brute_jaccard_pairs(doc_rows, 0.5)


def test_simhash_near_dups_have_close_hashes(docs, doc_rows):
    from combblas_ray.functions.dedup import simhash

    hs = {r["doc_id"]: r["simhash"] for r in simhash(docs).take_all()}
    true_pairs = _brute_jaccard_pairs(doc_rows, 0.9)
    assert true_pairs
    # near-dups must land far below the ~32-bit expectation of random pairs
    for (a, b) in true_pairs:
        ham = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16, (a, b, ham)


def test_exact_dedup_groups(docs, doc_rows):
    from combblas_ray.functions.dedup import exact_dedup

    got = {r["doc_id"]: r["canon_id"] for r in exact_dedup(docs).take_all()}
    keys = {}
    for r in doc_rows:
        k = " ".join(sorted(set(r["text"].split(" "))))
        keys.setdefault(k, []).append(r["doc_id"])
    for ids in keys.values():
        m = min(ids)
        for d in ids:
            assert got[d] == m
    assert len(got) == len(doc_rows)


def test_exact_dedup_digest_path_matches_string_path(docs):
    """digest=True (128-bit blake2b key pair, the scale path: ~100x fewer
    shuffle bytes) must produce exactly the exact-string-path groups."""
    from combblas_ray.functions.dedup import exact_dedup

    s = {r["doc_id"]: r["canon_id"] for r in exact_dedup(docs).take_all()}
    d = {r["doc_id"]: r["canon_id"]
         for r in exact_dedup(docs, digest=True).take_all()}
    assert s == d


def test_fingerprint_deterministic(docs):
    from combblas_ray.functions.text import fingerprint

    a = sorted(docs.map_batches(fingerprint, batch_format="pyarrow").take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(docs.map_batches(fingerprint, batch_format="pyarrow").take_all(),
               key=lambda r: r["doc_id"])
    assert a == b
    assert len({r["fingerprint"] for r in a}) > len(a) // 2


def test_ann_lsh_recall_vs_brute(ray_session):
    from combblas_ray.functions.ann import ann_bruteforce_topk, ann_lsh_topk

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    brute = ann_bruteforce_topk(emb, np.arange(10), k=5).to_pylist()
    lsh = ann_lsh_topk(emb, np.arange(10), k=5).to_pylist()
    bsets = {}
    for r in brute:
        bsets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    lsets = {}
    for r in lsh:
        lsets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(bsets[q] & lsets.get(q, set())) / len(bsets[q]) for q in bsets
    ]
    assert np.mean(recalls) >= 0.5, recalls


def test_knn_graph_tiled_equals_bruteforce(ray_session):
    """The 2D block-pair tiled kNN graph must reproduce the broadcast
    brute-force result EXACTLY (same sims, same (-sim, id) tie-break) for
    every vector, at several chunk counts."""
    from combblas_ray.functions.ann import ann_bruteforce_topk, knn_graph

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    n = int(emb.max("vec_id")) + 1
    brute = sorted(
        ann_bruteforce_topk(emb, np.arange(n), k=5).to_pylist(),
        key=lambda r: (r["query_id"], r["rnk"]),
    )
    for c in (1, 3, 7):
        tiled = sorted(
            knn_graph(emb, k=5, num_chunks=c).take_all(),
            key=lambda r: (r["query_id"], r["rnk"]),
        )
        assert tiled == brute, f"num_chunks={c}"


def test_knn_graph_lsh_recall(ray_session):
    """The sub-quadratic LSH-candidate kNN plan (the large-N default of
    knn_graph's cost switch) must achieve >= 0.95 edge recall vs the
    exact tiled plan, and its auto threshold must pick exact below
    KNN_EXACT_MAX."""
    from combblas_ray.functions.ann import (
        KNN_EXACT_MAX,
        knn_graph,
        knn_graph_lsh,
    )

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    n = int(emb.max("vec_id")) + 1
    assert n <= KNN_EXACT_MAX  # auto picks the exact plan at test scale
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_graph(emb, k=5, method="exact").take_all()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in knn_graph_lsh(emb, k=5).take_all()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"recall={recall:.3f}"
    # every emitted edge is well-formed: rnk within k, no self loops
    rows = knn_graph(emb, k=5, method="lsh").take_all()
    assert all(1 <= r["rnk"] <= 5 and r["query_id"] != r["neighbor_id"]
               for r in rows)


def test_multimodal_decode_pipeline(ray_session):
    from combblas_ray.functions.multimodal import (
        decode_image_real,
        decode_pipeline,
        make_blob,
        synth_blob_dataset,
    )

    ds = synth_blob_dataset(100)
    feats = {r["item_id"]: r for r in decode_pipeline(ds).take_all()}
    assert len(feats) == 100
    # recompute one row by hand
    import struct

    blob = make_blob(17)
    kind, w, h = struct.unpack_from("<III", blob, 0)
    pix = np.frombuffer(blob, dtype=np.uint8, offset=12)
    assert feats[17]["width"] == w and feats[17]["height"] == h
    assert feats[17]["mean_pixel"] == pytest.approx(float(pix.mean()))
    with pytest.raises(NotImplementedError):
        decode_image_real(b"")


def test_matrix_market_roundtrip(ctx500, tmp_path):
    from combblas_ray.sources.io import read_matrix_market, write_matrix_market

    g = ctx500.graph("directed")
    path = str(tmp_path / "g.mtx")
    write_matrix_market(g, path)
    g2 = read_matrix_market(path)
    assert g2.n == g.n
    a = sorted((r["src"], r["dst"], r["w"]) for r in g.edges.take_all())
    b = sorted((r["src"], r["dst"], r["w"]) for r in g2.edges.take_all())
    assert a == b


def test_mm_reader_merges_duplicates(ray_session, tmp_path):
    from combblas_ray.sources.io import read_matrix_market

    p = tmp_path / "dup.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 4\n"
        "1 2 1.5\n"
        "1 2 2.5\n"
        "3 1 1\n"
        "2 3 4\n"
    )
    g = read_matrix_market(str(p)).dedup_sum()
    rows = {(r["src"], r["dst"]): r["w"] for r in g.edges.take_all()}
    # file lists A(i,j) = edge j->i: (1,2,w) -> src=1,dst=0 zero-based
    assert rows[(1, 0)] == 4.0
    assert rows[(0, 2)] == 1.0
    assert rows[(2, 1)] == 4.0


def test_edges_parquet_partitioned_roundtrip(ctx500, tmp_path):
    from combblas_ray.sources.io import read_edges_parquet, write_edges_parquet

    g = ctx500.graph("directed")
    path = str(tmp_path / "edges_pq")
    write_edges_parquet(g, path, partition_by_block=2)
    g2 = read_edges_parquet(path, g.n)
    a = sorted((r["src"], r["dst"], r["w"]) for r in g.edges.take_all())
    b = sorted((r["src"], r["dst"], r["w"]) for r in g2.edges.take_all())
    assert a == b


def test_embed_dups_lsh_recall(ray_session):
    """Sign-LSH-bucketed embedding near-dup vs exact all-pairs: every LSH
    pair must be a true pair (exact verify), recall reasonable."""
    from combblas_ray.functions.ann import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    exact = {(r["a"], r["b"]) for r in embedding_dup_pairs(emb, 0.4).take_all()}
    lsh = {(r["a"], r["b"])
           for r in embedding_dup_pairs_lsh(emb, 0.4).take_all()}
    assert exact, "fixture must contain near-dup pairs"
    assert lsh <= exact  # no false positives (exact verify)
    assert len(lsh) / len(exact) >= 0.4, (len(lsh), len(exact))


def test_ann_ivf_recall_vs_brute(ray_session):
    from combblas_ray.functions.ann import ann_bruteforce_topk, ann_ivf_topk

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    brute = ann_bruteforce_topk(emb, np.arange(10), k=5).to_pylist()
    ivf = ann_ivf_topk(emb, np.arange(10), k=5).to_pylist()
    bsets, isets = {}, {}
    for r in brute:
        bsets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in ivf:
        isets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(bsets[q] & isets.get(q, set())) / len(bsets[q]) for q in bsets
    ]
    assert np.mean(recalls) >= 0.5, recalls


def test_multimodal_audio_pipeline(ray_session):
    from combblas_ray.functions.multimodal import (
        HEADER,
        audio_pipeline,
        make_audio_blob,
        synth_audio_dataset,
    )

    feats = {r["item_id"]: r
             for r in audio_pipeline(synth_audio_dataset(60)).take_all()}
    assert len(feats) == 60
    blob = make_audio_blob(11)
    _, sr, n = HEADER.unpack_from(blob, 0)
    pcm = np.frombuffer(blob, dtype=np.int16, offset=HEADER.size).astype(float)
    assert feats[11]["duration_sec"] == pytest.approx(n / sr, abs=1e-6)
    assert feats[11]["rms"] == pytest.approx(
        float(np.sqrt(np.mean(pcm * pcm))), abs=1e-4)


def test_multimodal_video_frame_sampling(ray_session):
    from combblas_ray.functions.multimodal import (
        HEADER,
        make_video_blob,
        synth_video_dataset,
        video_pipeline,
    )

    rows = video_pipeline(synth_video_dataset(30), stride=2).take_all()
    by_item = {}
    for r in rows:
        by_item.setdefault(r["item_id"], []).append(r["frame"])
    assert len(by_item) == 30
    blob = make_video_blob(7)
    _, nf, fsz = HEADER.unpack_from(blob, 0)
    assert sorted(by_item[7]) == list(range(0, nf, 2))
    frames = np.frombuffer(blob, dtype=np.uint8,
                           offset=HEADER.size).reshape(nf, fsz)
    got = {r["frame"]: r["mean_intensity"] for r in rows if r["item_id"] == 7}
    assert got[0] == pytest.approx(round(float(frames[0].mean()), 6))


def test_multimodal_resize_roundtrip(ray_session):
    """Resize is REAL compute (2x2 mean pooling on raw pixels): resized
    output must decode through the same DecodeStage with halved dims."""
    from combblas_ray.functions.multimodal import (
        decode_pipeline,
        make_blob,
        resize_pipeline,
        synth_blob_dataset,
        HEADER,
    )

    ds = synth_blob_dataset(40)
    # chained actor pools: keep total actors < session CPUs (4) or the
    # producer tasks starve
    small = resize_pipeline(ds, concurrency=1).materialize()
    feats = {r["item_id"]: r
             for r in decode_pipeline(small, concurrency=1).take_all()}
    _, w, h = HEADER.unpack_from(make_blob(13), 0)
    assert feats[13]["width"] == w // 2
    assert feats[13]["height"] == h // 2


def test_jaccard_fallback_when_df_cap_binds(docs, doc_rows, monkeypatch):
    """Force shingles over the DF cap: the count path must detect the
    sentinel and fall back to the exact string-verify join, with the
    capped-candidate semantics (pairs must share a <=cap-df shingle)."""
    import functools
    from collections import Counter
    from itertools import combinations

    from combblas_ray.functions import dedup as D

    CAP = 3
    orig = D._postings_pairs_counted
    monkeypatch.setattr(
        D, "_postings_pairs_counted",
        functools.partial(orig, df_cap=CAP),
    )
    got = {
        (r["a"], r["b"]): r["jac"]
        for r in D.jaccard_pairs(docs, 0.5).take_all()
    }
    sh = _brute_shingles(doc_rows)
    df = Counter(s for ss in sh.values() for s in ss)
    assert any(c > CAP for c in df.values())  # the fallback really fired
    want = {}
    for a, b in combinations(sorted(sh), 2):
        shared = sh[a] & sh[b]
        if not any(df[s] <= CAP for s in shared):
            continue
        inter = len(shared)
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= 0.5:
            want[(a, b)] = round(jac, 6)
    assert got == want


def test_multimodal_int_stats_stage(ray_session):
    """IntStatsStage (the oracle-checkable decode) matches per-blob
    numpy recomputation, including through the resize chain."""
    from combblas_ray.functions.multimodal import (
        HEADER,
        IntStatsStage,
        make_blob,
        resize_pipeline,
        synth_blob_dataset,
    )

    ds = synth_blob_dataset(60)
    got = {r["item_id"]: r for r in ds.map_batches(
        IntStatsStage, batch_format="pyarrow", batch_size=16,
        concurrency=2).take_all()}
    assert len(got) == 60
    for i in (0, 17, 59):
        blob = make_blob(i)
        _, w, h = HEADER.unpack_from(blob, 0)
        pix = np.frombuffer(blob, dtype=np.uint8, offset=12).astype(np.int64)
        r = got[i]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == int(pix.sum())
        assert r["px_min"] == int(pix.min())
        assert r["px_max"] == int(pix.max())

    # resize chain: pooled pixel = (2x2 block sum) // 4, exact.
    # concurrency=1 per pool: two chained 2-actor pools would reserve
    # all 4 fixture CPUs and starve the range->_gen task (deadlock).
    rs = {r["item_id"]: r for r in resize_pipeline(
        synth_blob_dataset(60), concurrency=1).map_batches(
        IntStatsStage, batch_format="pyarrow", batch_size=16,
        concurrency=1).take_all()}
    for i in (3, 41):
        blob = make_blob(i)
        _, w, h = HEADER.unpack_from(blob, 0)
        img = np.frombuffer(blob, dtype=np.uint8, offset=12
                            ).astype(np.int64).reshape(h, w)
        h2, w2 = h // 2 * 2, w // 2 * 2
        small = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2
                                      ).sum(axis=(1, 3)) // 4
        r = rs[i]
        assert (r["width"], r["height"]) == (w2 // 2, h2 // 2)
        assert r["px_sum"] == int(small.sum())
        assert r["px_min"] == int(small.min())
        assert r["px_max"] == int(small.max())


def test_multimodal_video_frame_sums(ray_session):
    from combblas_ray.functions.multimodal import (
        HEADER,
        VideoFrameSumStage,
        make_video_blob,
        synth_video_dataset,
    )

    rows = synth_video_dataset(40).map_batches(
        VideoFrameSumStage, batch_format="pyarrow", batch_size=16,
        concurrency=2, fn_constructor_kwargs={"stride": 2}).take_all()
    got = {(r["item_id"], r["frame"]): r["f_sum"] for r in rows}
    for i in (0, 13, 39):
        blob = make_video_blob(i)
        _, nf, fsz = HEADER.unpack_from(blob, 0)
        data = np.frombuffer(blob, dtype=np.uint8, offset=12
                             ).astype(np.int64).reshape(nf, fsz)
        for j in range(0, nf, 2):
            assert got[(i, j)] == int(data[j].sum())
        assert (i, 1) not in got  # stride skips odd frames
