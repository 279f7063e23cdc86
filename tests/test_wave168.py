"""Brute twin for wave 168: rack-aware replica spread census."""

SF = "/root/testdata/sf0.001"


def test_replica_spread_vs_python(ray_session):
    from combblas_ray.functions.text import md5_lower64
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    exp = {}
    at_risk = 0
    for i in range(n):
        racks = {(md5_lower64(f"rp:{i}:{j}") % q.RACK_W) % q.RACK_R
                 for j in range(q.RACK_K)}
        exp[len(racks)] = exp.get(len(racks), 0) + 1
        if len(racks) == 1:
            at_risk += 1

    got = q.q_replica_spread(SF).to_pandas()
    assert {int(r.n_racks): int(r.n_objects)
            for _, r in got.iterrows()} == exp
    assert int(got.n_objects.sum()) == n
    # with K=3 over R=4 racks, single-rack placements are the ~1/16
    # tail — present but rare (the audit's reason to exist)
    assert 0 < at_risk < n // 8
