"""Headline benchmark: runs representative catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (count() materializes the full result)
after a warm-up of the session; per-query wall time is reported, total is the
headline value.
"""

from __future__ import annotations

import json
import os
import re
import time

from scraper_db_refine_merge_spark.plans.catalog import QUERIES
from scraper_db_refine_merge_spark.session import get_spark

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q04_region_revenue",
    "q08_latest_event_per_user",
    "q12_daily_event_counts",
    "q16_props_json_decode",
    "q21_text_search",
    "q22_doc_text_stats",
    "q23_exact_dedup",
    "q25_minhash_lsh_pairs",
    "q28_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("bench")
    # warm up the JVM / parquet footer caches with a trivial action
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
