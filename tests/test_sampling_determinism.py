"""Hash-derived sampling must be invariant to partitioning and re-runs —
the property that makes dataset construction reproducible on any cluster
(rand(seed) is per-partition in Spark and breaks under repartition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.plans.sampling import hash_unit
from scraper_db_refine_merge_spark.sources.tables import load_table


def test_split_invariant_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.when(hash_unit(F.col("doc_id")) < 0.8, "train")
        .when(hash_unit(F.col("doc_id")) < 0.9, "val")
        .otherwise("test")
    )

    def assign(df):
        return {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}

    base = assign(d)
    assert assign(d.repartition(17, "lang")) == base
    assert assign(d.repartition(3)) == base
    assert assign(d.orderBy(F.col("n_chars").desc())) == base
    # split proportions are hash-uniform-ish
    from collections import Counter

    c = Counter(base.values())
    n = sum(c.values())
    assert 0.7 < c["train"] / n < 0.9
    assert c["train"] + c["val"] + c["test"] == n
