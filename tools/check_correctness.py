"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB twin on
a given sf dir and compares row count, column names, and order-insensitive
values. Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    import ray

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if hasattr(result, "to_pandas"):  # ray Dataset
        return result.to_pandas()
    raise TypeError(type(result))


def compare(name: str, ray_df, ora_df) -> str:
    import pandas as pd

    ray_df = ray_df[sorted(ray_df.columns)]
    ora_df = ora_df[sorted(ora_df.columns)]
    if list(ray_df.columns) != list(ora_df.columns):
        return f"SCHEMA MISMATCH ray={list(ray_df.columns)} ora={list(ora_df.columns)}"
    if len(ray_df) != len(ora_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} ora={len(ora_df)}"
    a = ray_df.sort_values(list(ray_df.columns)).reset_index(drop=True)
    b = ora_df.sort_values(list(ora_df.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return "VALUE MISMATCH: " + str(e).split("\n")[0]
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"{name:28s} rows={len(ray_df)} (no oracle) ray={t1-t0:.2f}s")
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        t2 = time.perf_counter()
        verdict = compare(name, ray_df, ora_df)
        if verdict != "OK":
            failures += 1
        print(
            f"{name:28s} {verdict}  rows={len(ray_df)} ray={t1-t0:.2f}s ora={t2-t1:.2f}s"
        )
    print("FAILURES:", failures)
    from combblas_ray.util import quiesce_data_stats
    quiesce_data_stats()  # see util.py: stats-thread post-shutdown fatal
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
