"""Brute twin for wave 145: Gale-Shapley deferred acceptance.

Plain per-round Python simulation with dict state — plus a stability
check on the converged matching (no blocking pair within the bounded
lists among matched/held pairs).
"""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_stable_matching_vs_simulation(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.sources import corpus as corpus_src

    n = corpus_src.n_files_for(SF)
    nr = max(n // 3, 1)
    M = q.GS_RANK_M

    def rank(r, s):
        return (r * 7919 + s * 104729 + 11) % M

    ptr = np.zeros(n, dtype=int)
    held = np.full(n, -1)
    for _ in range(q.GS_R):
        rs = {}
        for s in range(n):
            if held[s] >= 0:
                r = held[s]
            elif ptr[s] < q.GS_C:
                r = (s * 101 + ptr[s] * 4099 + 17) % nr
            else:
                continue
            rs.setdefault(r, []).append(s)
        newheld = np.full(n, -1)
        newptr = ptr.copy()
        for r, ss in rs.items():
            w = min((rank(r, s), s) for s in ss)[1]
            for s in ss:
                if s == w:
                    newheld[s] = r
                else:
                    newptr[s] = ptr[s] + 1
        ptr, held = newptr, newheld

    key = np.where(held >= 0, ptr, -1)
    u, c = np.unique(key, return_counts=True)
    exp = dict(zip(u.tolist(), c.tolist()))

    got = q.q_stable_matching(SF).to_pandas()
    assert {int(r.rank_choice): int(r.cnt)
            for _, r in got.iterrows()} == exp
    # contention actually happened: matches beyond first choice exist
    assert any(k > 0 for k in exp)
    # deferred-acceptance invariant: each reviewer holds at most one
    rev = held[held >= 0]
    assert len(rev) == len(set(rev.tolist()))
    # stability within lists: no free-with-list-left suitor is preferred
    # by the reviewer he would propose to next over her current hold
    inc = {int(r): int(s) for s, r in enumerate(held) if r >= 0}
    for s in range(n):
        if held[s] < 0 and ptr[s] < q.GS_C:
            r = (s * 101 + ptr[s] * 4099 + 17) % nr
            if r in inc:
                assert (rank(r, inc[r]), inc[r]) < (rank(r, s), s)
