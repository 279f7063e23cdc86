"""Small cross-cutting utilities."""

from __future__ import annotations


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
