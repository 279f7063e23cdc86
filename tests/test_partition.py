import numpy as np

from combblas_ray.core.partition import (
    block_id,
    chunk_bounds,
    local_size,
    owner,
    salt_keys,
)


def test_owner_covers_all_and_matches_bounds():
    for n in [1, 7, 64, 100, 1001]:
        for parts in [1, 2, 3, 7, 8]:
            idx = np.arange(n)
            own = owner(idx, n, parts)
            assert own.min() >= 0 and own.max() <= parts - 1
            bounds = chunk_bounds(n, parts)
            # bounds tile [0, n)
            assert bounds[0][0] == 0 and bounds[-1][1] == n
            for k, (s, e) in enumerate(bounds):
                if e > s:
                    assert (own[s:e] == k).all()


def test_owner_reference_arithmetic():
    # min(i // (n // parts), parts-1) — SpParMat.cpp:5081 semantics
    n, parts = 10, 4
    ls = local_size(n, parts)
    assert ls == 2
    assert owner(9, n, parts) == 3
    assert owner(7, n, parts) == 3  # clamped to last


def test_block_id_roundtrip():
    gc = 5
    assert block_id(2, 3, gc) == 13


def test_salt_deterministic_and_bounded():
    keys = np.array([7, 7, 7, 9, 9], dtype=np.int64)
    s1 = salt_keys(keys, 4)
    s2 = salt_keys(keys, 4)
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 4


def test_randperm_sorted_is_bijection_and_bucket_invariant(ray_session):
    """Sort-based RandPerm (FullyDistVec.cpp:784-922): result is a true
    permutation, equals the key-argsort rank, and is invariant to the
    bucket fan-out (partition-count independence of the distributed
    sample-sort rank)."""
    import numpy as np

    from combblas_ray.core.vecops import _rp_key, randperm

    n, seed = 777, 3
    key = _rp_key(np.arange(n), seed)
    assert len(np.unique(key)) == n  # LCG keys distinct => tie-free sort
    expect = np.empty(n, dtype=np.int64)
    expect[np.argsort(key, kind="stable")] = np.arange(n)
    for g in (1, 2, 5):
        df = randperm(n, seed=seed, num_buckets=g).to_pandas()
        p = np.empty(n, dtype=np.int64)
        p[df["v"].to_numpy()] = df["val"].to_numpy()
        assert sorted(p.tolist()) == list(range(n))
        assert (p == expect).all(), g
