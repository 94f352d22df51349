"""Per-query split of wall time into PLAN BUILD (driver-side py4j /
analysis) vs EXECUTION, for the bench set (r11: the q25→q04 profiling
method, made repeatable). Floor-dominated queries whose build share is
large are candidates for the ensure_views + single-spark.sql treatment
(plans/relational.q04_region_revenue) or selectExpr collapsing
(operators/similarity.cosine_topk).

Usage: PYTHONPATH=. [SPARK_GRAFT_BENCH_SET=extended] \
           python tools/profile_build.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from bench import BENCH_QUERIES

    from scraper_db_refine_merge_spark.plans.catalog import QUERIES
    from scraper_db_refine_merge_spark.session import get_spark
    from scraper_db_refine_merge_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("profile_build")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    print(f"{'query':36s} {'build_min':>9s} {'exec_min':>9s} {'build_share':>11s}")
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = min(builds), min(execs)
        print(f"{name:36s} {b:9.3f} {e:9.3f} {100 * b / (b + e):10.1f}%")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
