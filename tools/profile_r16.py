"""Round-16 optimization profiling: per-stage sub-plan timings for the
expensive headline queries, measured with the noop sink (guide §1.4) in ONE
warm session so the numbers attribute marginal cost, not first-touch floors.

Usage: python tools/profile_r16.py [sf_dir]
Prints one JSON object: {probe_name: min_of_2_sec, ...}.

Methodology: every timed region is `df.write.format("noop")` (computes every
column of every row, no sink cost) except the `*_count` probes that
deliberately reproduce the bench's `.count()` action for comparability.
Each probe is warmed once, then min-of-2 like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scraper_db_refine_merge_spark.session import get_spark
from scraper_db_refine_merge_spark.sources.tables import load_table


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, out, runs=2):
    spark.sparkContext.setJobDescription(name)
    fn()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
    spark.sparkContext.setJobDescription(None)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("profile_r16")
    out: dict[str, float] = {}
    for t in ("lineitem", "orders", "customer", "nation", "region", "events",
              "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # ---- q55 sub-plans --------------------------------------------------
    from scraper_db_refine_merge_spark.operators import similarity as sim
    from scraper_db_refine_merge_spark.operators._cache import release_caches

    e = load_table(spark, sf_dir, "embeddings")
    dim = sim.detect_fixed_dim(e, "embedding")

    def q55_bucket_only():
        bt = sim._bucket_table_arrow(e, "vec_id", "embedding", 6, 4, dim, None)
        noop(bt)

    timed(spark, "q55_bucket_arrow_noop", q55_bucket_only, out)

    def q55_candidates():
        bt = sim._bucket_table_arrow(e, "vec_id", "embedding", 6, 4, dim, None)
        a, c = bt.alias("a"), bt.alias("c")
        cand = (
            a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vid") < F.col("c.vid")))
            .select(F.col("a.vid").alias("a_id"), F.col("c.vid").alias("b_id"))
            .distinct()
        )
        noop(cand)

    timed(spark, "q55_candidates_nopersist_noop", q55_candidates, out)

    def q55_full():
        release_caches()
        df = sim.cosine_near_dup_pairs(e, threshold=0.9, num_planes=6, num_tables=4)
        df.count()

    timed(spark, "q55_full_count_fresh_cache", q55_full, out)

    def q55_full_warmcache():
        df = sim.cosine_near_dup_pairs(e, threshold=0.9, num_planes=6, num_tables=4)
        df.count()

    timed(spark, "q55_full_count_warm_cache", q55_full_warmcache, out)

    # candidate-pair count for context (not timed)
    bt = sim._bucket_table_arrow(e, "vec_id", "embedding", 6, 4, dim, None)
    a, c = bt.alias("a"), bt.alias("c")
    out["q55_n_candidates"] = (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vid") < F.col("c.vid")))
        .select(F.col("a.vid").alias("a_id"), F.col("c.vid").alias("b_id"))
        .distinct()
        .count()
    )

    # ---- q04 sub-plans --------------------------------------------------
    from scraper_db_refine_merge_spark.sources.tables import ensure_views

    v = ensure_views(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region"))

    def q04_percust():
        df = spark.sql(
            """
            SELECT o.o_custkey,
                   SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5D)
                            * (100 - FLOOR(l.l_discount * 100 + 0.5D))
                            AS DECIMAL(38,0))) AS __rev_units,
                   COUNT(*) AS __n
            FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
            """.format(**v)
        )
        noop(df)

    timed(spark, "q04_percust_agg_noop", q04_percust, out)

    def q04_join_only():
        df = spark.sql(
            "SELECT l.l_extendedprice, l.l_discount, o.o_custkey "
            "FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey".format(**v)
        )
        noop(df)

    timed(spark, "q04_join_only_noop", q04_join_only, out)

    def q04_scan_arith():
        df = spark.sql(
            "SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5D)"
            " * (100 - FLOOR(l_discount * 100 + 0.5D)) AS DECIMAL(38,0)) AS u"
            " FROM {lineitem}".format(**v)
        )
        noop(df)

    timed(spark, "q04_scan_cents_arith_noop", q04_scan_arith, out)

    from scraper_db_refine_merge_spark.plans.catalog import QUERIES

    for name in ("q04_region_revenue", "q08_latest_event_per_user",
                 "q12_daily_event_counts", "q25_minhash_lsh_pairs",
                 "q28_cosine_topk", "q16_props_json_decode",
                 "q21_text_search", "q47_train_val_test_split"):
        def run(n=name):
            QUERIES[n](spark, sf_dir).count()

        timed(spark, f"{name}_count", run, out)

    # plan-construction-only cost (driver-side py4j + analysis, no action)
    for name in ("q04_region_revenue", "q08_latest_event_per_user",
                 "q25_minhash_lsh_pairs", "q28_cosine_topk", "q55_lsh_near_dup"):
        def build(n=name):
            df = QUERIES[n](spark, sf_dir)
            df.schema  # force analysis

        timed(spark, f"{name}_planbuild", build, out)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
