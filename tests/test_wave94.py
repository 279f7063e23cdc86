"""Brute twins for wave 94: Mann-Kendall, Theil-Sen, runs test over
the daily event axis."""

from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _daily(sf=SF):
    ts = pq.read_table(f"{sf}/events.parquet", columns=["ts"]).column("ts")
    day = (np.asarray(ts).astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    lo = int(day.min())
    return np.bincount(day - lo,
                       minlength=int(day.max()) - lo + 1).astype(np.int64)


def test_mann_kendall_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    x = _daily()
    n = len(x)
    s = sum(int(np.sign(x[j] - x[i]))
            for i in range(n) for j in range(i + 1, n))
    _, tc = np.unique(x, return_counts=True)
    var18 = (n * (n - 1) * (2 * n + 5)
             - int((tc * (tc - 1) * (2 * tc + 5)).sum()))
    got = q.q_mann_kendall(SF).to_pandas().iloc[0]
    assert (int(got.n_days), int(got.s_stat), int(got.var18)) == \
        (n, s, var18)
    # |S| is bounded by the pair count; var18 >= 0 always
    assert abs(s) <= n * (n - 1) // 2 and var18 >= 0


def test_theil_sen_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    x = _daily()
    t = len(x)
    slopes = sorted(Fraction(int(x[j] - x[i]), j - i)
                    for i in range(t) for j in range(i + 1, t))
    med = (slopes[(len(slopes) - 1) // 2] + slopes[len(slopes) // 2]) / 2
    got = q.q_theil_sen(SF).to_pandas().iloc[0]
    assert int(got.n_pairs) == len(slopes)
    assert Fraction(int(got.slope_num), int(got.slope_den)) == med
    # reduced fraction with positive denominator
    from math import gcd
    assert int(got.slope_den) > 0
    assert gcd(abs(int(got.slope_num)), int(got.slope_den)) == 1
    assert slopes[0] <= med <= slopes[-1]


def test_runs_test_vs_brute(ray_session):
    from combblas_ray.pipelines import queries as q

    x = _daily()
    med = int(np.sort(x)[(len(x) - 1) // 2])
    sign = [v > med for v in x if v != med]
    n_runs = 1 + sum(a != b for a, b in zip(sign, sign[1:])) if sign else 0
    got = q.q_runs_test(SF).to_pandas().iloc[0]
    assert int(got.median_cnt) == med
    assert int(got.n_plus) == sum(sign)
    assert int(got.n_minus) == len(sign) - sum(sign)
    assert int(got.n_runs) == n_runs
    assert 1 <= n_runs <= len(sign)
