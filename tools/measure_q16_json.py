"""q16 JSON-decode marginal cost: is get_json_object the bottleneck, or is
the gap vs the DuckDB oracle parser-intrinsic? (VERDICT r14 item 7)

Method: replicate the sf0.1 events.props column 50× (5M rows), cache at 32
partitions so scan cost is constant and parallelism is full, then time the
same bucket-count aggregation under every JSON-extraction expression Spark
offers — get_json_object (JsonPath over Jackson), schema-pruned from_json
(single-field struct), and Spark 4's variant path (parse_json +
variant_get) — against a no-parse baseline (length()) that prices the
non-JSON part of the plan. DuckDB runs the identical query on the identical
replicated table.

Result (committed as Q16_JSON_r15.json): all Spark variants are equal
within noise (~1.3-1.4 s marginal for 5M rows); DuckDB does the same work
in ~0.04 s. The cost is parser-INTRINSIC — Spark's per-row Jackson/variant
parse vs DuckDB's vectorized yyjson — so no expression choice closes it,
and q16 keeps get_json_object (the clearest statement of S4's semantics).
The absolute marginal cost (~0.28 µs·core/row) is linear, shuffle-free map
work that parallelizes perfectly at cluster scale.

Usage: PYTHONPATH=. python tools/measure_q16_json.py [sf_dir] [> artifact]
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    e = load_table(spark, sf_dir, "events").select("props")
    big = e.crossJoin(spark.range(50)).select("props").repartition(32).persist()
    n_rows = big.count()

    def med(kexpr, n=5):
        ts = []
        for _ in range(n):
            t = time.time()
            big.groupBy((kexpr % 10).alias("kb")).agg(F.count("*")).collect()
            ts.append(time.time() - t)
        return round(statistics.median(ts), 3)

    out = {"metric": "q16_json_marginal", "rows": n_rows, "sf_dir": sf_dir}
    out["spark_baseline_no_parse"] = med(F.length("props").cast("long"))
    out["spark_get_json_object"] = med(F.get_json_object("props", "$.k").cast("long"))
    out["spark_from_json_pruned"] = med(F.from_json("props", "k LONG")["k"])
    try:
        out["spark_variant_get"] = med(
            F.expr("variant_get(parse_json(props), '$.k', 'long')")
        )
    except Exception:
        out["spark_variant_get"] = None

    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    con.execute(
        "CREATE TABLE e AS SELECT props FROM "
        f"(SELECT props FROM '{sf_dir}/events.parquet'), range(50)"
    )
    ts = []
    for _ in range(5):
        t = time.time()
        con.execute(
            "SELECT CAST(json_extract_string(props,'$.k') AS BIGINT)%10 AS kb,"
            " count(*) FROM e GROUP BY kb"
        ).fetchall()
        ts.append(time.time() - t)
    out["duckdb_json_extract"] = round(statistics.median(ts), 3)
    out["conclusion"] = (
        "all Spark extraction expressions equal within noise -> gap vs "
        "DuckDB is parser-intrinsic (Jackson/variant per-row vs vectorized "
        "yyjson); keep get_json_object, cost is linear shuffle-free map work"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
