"""Dump the optimized/physical plan for any catalog query.

Usage:
    PYTHONPATH=. python tools/explain_query.py q04_region_revenue [sf_dir]
    PYTHONPATH=. python tools/explain_query.py --all [sf_dir]   # every lazy query

The formatted plan is the feedback loop for scale work: check PushedFilters
reach the scans, dimension joins broadcast, aggregations have partial
(map-side) phases, and nothing degrades to CartesianProduct /
BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import sys


def main() -> int:
    from scraper_db_refine_merge_spark.plans.catalog import QUERIES
    from scraper_db_refine_merge_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    all_mode = "--all" in sys.argv
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    spark = get_spark("explain")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")

    if all_mode:
        from tests.test_catalog_analyzes import EAGER

        names = sorted(set(QUERIES) - EAGER)
    else:
        if not args or args[0] not in QUERIES:
            print(f"unknown query; choose from: {', '.join(sorted(QUERIES))}")
            return 1
        names = [args[0]]

    for name in names:
        print(f"{'=' * 78}\n{name}\n{'=' * 78}")
        QUERIES[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
