"""Catalog-wide DRIVER-SIDE build census (VERDICT r11 item 7): for every
batch query in the catalog, time plan construction (the QUERIES[name] call
— py4j round trips + any embedded driver jobs) separately from execution,
and rank by build time. The analysis-blowup class (q53/q54, r11) shows up
here as a build far above the ~0.05-0.3 s py4j floor with no embedded job
to justify it; the fix is projection boundaries or expr-string conversion.

Usage: PYTHONPATH=. python tools/census_builds.py [sf_dir] [top_n]
One line per query, slowest builds first; pipe to a file for the round log.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from scraper_db_refine_merge_spark.plans.catalog import QUERIES
    from scraper_db_refine_merge_spark.session import get_spark
    from scraper_db_refine_merge_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("census_builds")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    rows = []
    for name, fn in QUERIES.items():
        if name.startswith("q57") or "stream" in name:
            continue  # streaming replays need the harness, not a build call
        try:
            fn(spark, sf_dir).count()  # warm: codegen, footer reads, caches
        except Exception as exc:  # noqa: BLE001
            rows.append((name, float("nan"), float("nan"), f"ERR {type(exc).__name__}"))
            continue
        builds, execs = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rows.append((name, min(builds), min(execs), ""))

    rows.sort(key=lambda r: -(r[1] if r[1] == r[1] else 0))
    print(f"{'query':40s} {'build_min':>9s} {'exec_min':>9s}  note")
    for name, b, e, note in rows[:top_n]:
        print(f"{name:40s} {b:9.3f} {e:9.3f}  {note}")
    total_b = sum(r[1] for r in rows if r[1] == r[1])
    print(f"-- {len(rows)} queries, total build {total_b:.1f}s; showing top {top_n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
