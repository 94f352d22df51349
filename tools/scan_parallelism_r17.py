"""Round-17 scan-parallelism evidence (VERDICT r16 item 3).

Every sf parquet test file is a SINGLE row group, so scan stages are
hard-capped at 1 task and the driver's core-scaling block cannot
distinguish "serial plan" from "serial input". This tool answers that
directly: it writes a 16-file copy of the scan-bound tables (same rows,
same values — load_table-normalized, so events carry MICROS timestamps in
both layouts) and times the scan-bound headline queries against the
single-file and split-file layouts in one warm session, recording the
scan partition count each layout yields.

Run it at two core counts and compare:

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/scan_parallelism_r17.py
    SPARK_GRAFT_CPUS=8  PYTHONPATH=. python tools/scan_parallelism_r17.py

Expected shape (and what r17 measured — see SCAN_PARALLELISM_r17.json):
on the split layout the same query plans fan the scan stage out to 16
tasks and the per-row-heavy queries (JSON decode, regex search, text
stats) speed up with cores; on the single-file layout they are pinned at
one task regardless of cores. The degenerate-scan spread
(operators/dedup.spread_degenerate_scan) is also exercised: its gate
no-ops on the split layout (>= cores/4 partitions) — the repartition
only ever fires on degenerate inputs.

Usage: PYTHONPATH=. python tools/scan_parallelism_r17.py [out.json]
Appends one JSON object (keyed by cpu count) to the output file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scraper_db_refine_merge_spark.operators._cache import release_caches  # noqa: E402
from scraper_db_refine_merge_spark.session import get_spark  # noqa: E402
from scraper_db_refine_merge_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
SPLIT_FILES = 16
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    f"sf0.1_split{SPLIT_FILES}",
)
TABLES = [
    "lineitem", "orders", "customer", "nation", "region",
    "part", "supplier", "events", "documents", "embeddings",
]
# scan-bound headline queries (single narrow map / aggregation over one
# fact scan) + the shingle family whose spread gate must no-op on splits
QUERY_NAMES = [
    "q01_pricing_summary",
    "q04_region_revenue",
    "q12_daily_event_counts",
    "q16_props_json_decode",
    "q21_text_search",
    "q22_doc_text_stats",
    "q23_exact_dedup",
    "q24_ngram_jaccard_pairs",
]


def build_split_copy(spark) -> None:
    os.makedirs(SCRATCH, exist_ok=True)
    for t in TABLES:
        dest = os.path.join(SCRATCH, f"{t}.parquet")
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            continue
        df = load_table(spark, BASE, t)
        n = max(1, min(SPLIT_FILES, df.count()))
        df.repartition(n).write.mode("overwrite").parquet(dest)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCAN_PARALLELISM_r17.json"
    spark = get_spark("scan_parallelism_r17")
    cpus = spark.sparkContext.defaultParallelism
    spark.range(1).count()
    build_split_copy(spark)

    from scraper_db_refine_merge_spark.plans.catalog import QUERIES

    rec: dict = {"cpus": cpus, "split_files": SPLIT_FILES, "layouts": {}}
    for layout, sf_dir in (("single_file", BASE), ("split_16", SCRATCH)):
        for t in ("lineitem", "events", "documents"):
            load_table(spark, sf_dir, t).count()  # warm footers/cache
        scan_parts = {
            t: load_table(spark, sf_dir, t).rdd.getNumPartitions()
            for t in ("lineitem", "events", "documents")
        }
        timings = {}
        for name in QUERY_NAMES:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"{layout}:{name}")
            fn(spark, sf_dir).count()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            release_caches()
            spark.sparkContext.setJobDescription(None)
        rec["layouts"][layout] = {"scan_partitions": scan_parts, "queries": timings}

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[f"cpus_{cpus}"] = rec
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
