"""Brute twin for wave 108: parallel greedy dominating set."""

import numpy as np

from tests.test_wave86 import _und

SF = "/root/testdata/sf0.001"


def _brute_trace(n, us, ud, rounds, b, p):
    prio = (np.arange(n, dtype=np.int64) * 48271 + b) % p
    white = np.ones(n, dtype=bool)
    inset = np.zeros(n, dtype=bool)
    trace = []
    for r in range(rounds + 1):
        trace.append((r, int(inset.sum()), int(white.sum())))
        if r == rounds:
            break
        yw = np.bincount(us, weights=white[ud].astype(np.int64),
                         minlength=n).astype(np.int64)
        wv = white.astype(np.int64) + yw
        score = np.where(~inset & (wv > 0), wv * p + prio, 0)
        nbmax = np.full(n, np.iinfo(np.int64).min)
        np.maximum.at(nbmax, us, score[ud])
        win = (score > 0) & (score >= nbmax)
        inset |= win
        ywin = np.bincount(us, weights=win[ud].astype(np.int64),
                           minlength=n)
        white &= ~(win | (ywin > 0))
    return trace


def test_domset_trace_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    exp = _brute_trace(ctx.n, us, ud, q.DOMSET_ROUNDS, q.DOMSET_PRIO_B,
                       q.lcg_modulus(ctx.n))
    got = q.q_domset_trace(SF).to_pandas().sort_values("round")
    assert [(int(r["round"]), int(r.n_set), int(r.n_white))
            for _, r in got.iterrows()] == exp
    # greedy invariants: the set only grows, the white count only
    # shrinks, and by the last traced round the set is nonempty
    assert got.n_set.is_monotonic_increasing
    assert got.n_white.is_monotonic_decreasing
    assert int(got.n_set.iloc[-1]) > 0


def test_domset_final_set_dominates(ray_session):
    """If the trace converges (n_white = 0), the greedy set must
    dominate: every vertex is in the set or adjacent to it."""
    from combblas_ray.pipelines import queries as q
    from combblas_ray.pipelines.context import get_context

    ctx = get_context(SF)
    us, ud = _und(ctx)
    exp = _brute_trace(ctx.n, us, ud, q.DOMSET_ROUNDS, q.DOMSET_PRIO_B,
                       q.lcg_modulus(ctx.n))
    if exp[-1][2] != 0:
        return  # not converged within the fixed rounds at this sf
    # replay brute to get the actual set and check domination
    n = ctx.n
    p = q.lcg_modulus(n)
    prio = (np.arange(n, dtype=np.int64) * 48271 + q.DOMSET_PRIO_B) % p
    white = np.ones(n, dtype=bool)
    inset = np.zeros(n, dtype=bool)
    for _ in range(q.DOMSET_ROUNDS):
        yw = np.bincount(us, weights=white[ud].astype(np.int64),
                         minlength=n).astype(np.int64)
        wv = white.astype(np.int64) + yw
        score = np.where(~inset & (wv > 0), wv * p + prio, 0)
        nbmax = np.full(n, np.iinfo(np.int64).min)
        np.maximum.at(nbmax, us, score[ud])
        win = (score > 0) & (score >= nbmax)
        inset |= win
        ywin = np.bincount(us, weights=win[ud].astype(np.int64),
                           minlength=n)
        white &= ~(win | (ywin > 0))
    covered = inset.copy()
    covered[us[inset[ud]]] = True
    assert covered.all()
