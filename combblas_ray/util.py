"""Small cross-cutting utilities."""

from __future__ import annotations

import numpy as np


def ibincount(x: np.ndarray, weights: np.ndarray,
              minlength: int = 0) -> np.ndarray:
    """Exact int64 grouped sum — the integer-accumulation twin of
    ``np.bincount(x, weights=w.astype(float64)).astype(int64)``.

    The float64-weighted idiom silently loses exactness once a GROUP SUM
    exceeds 2^53 (round-3 ADVICE); this scatter-adds into an int64
    accumulator, so the only remaining assumption is that each ELEMENT
    is exactly representable on entry (ints routed through float64 are
    exact below 2^53 per element — a far weaker bound). Bool weights
    count; negative weights are handled (unlike the hi/lo-split trick).
    """
    w = np.asarray(weights)
    # callers often pass w.astype(float64) verbatim; values are integral
    w = w.astype(np.int64) if w.dtype.kind != "i" else w
    n = max(int(minlength), int(x.max()) + 1 if len(x) else 0)
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, x, w)
    return out


def quiesce_data_stats() -> None:
    """Stop Ray Data's StatsManager background thread from making remote
    calls after ``ray.shutdown()``.

    A dataset whose execution is truncated (LimitOperator and friends)
    can leave an entry in ``_StatsManager._last_execution_stats``; the
    manager's daemon thread then keeps calling the stats actor every
    interval, and a call landing after ``ray.shutdown()`` is a C++-level
    fatal ("core worker has already been shutdown ... the process will
    exit"). Clearing the dicts makes the thread's next wake-up a no-op
    (it terminates after its inactivity limit). Call this right before
    any ``ray.shutdown()`` this repo owns (tests, bench, tools).
    Version-tolerant: failures are swallowed."""
    try:
        from ray.data._internal.stats import StatsManager

        StatsManager._last_execution_stats.clear()
        StatsManager._last_iteration_stats.clear()
        # ALSO drop the cached actor handle: with a cached handle +
        # matching cluster id the thread short-circuits straight to
        # handle.update_metrics.remote() (the fatal call). With the
        # cache nulled, the post-shutdown recreate path raises a normal
        # Python exception, which the update loop catches and exits on.
        StatsManager._stats_actor_handle = None
        StatsManager._stats_actor_cluster_id = None
    except Exception as e:  # pragma: no cover - Ray-version drift path
        # log once at debug so a Ray bump that renames these private
        # attributes (silently defeating the workaround) is noticed
        import logging

        logging.getLogger(__name__).debug(
            "quiesce_data_stats: private StatsManager access failed (%s); "
            "the post-shutdown stats-thread guard is inactive", e
        )
