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


def test_source_mix_epoch_semantics(spark, sf_dir):
    from scraper_db_refine_merge_spark.plans.sampling import (
        _MIX_DEFAULT,
        _MIX_EPOCHS,
        q139_source_mix,
    )
    from scraper_db_refine_merge_spark.sources.tables import load_table

    out = q139_source_mix(spark, sf_dir).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(r["epoch"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    for d in docs:
        r = _MIX_EPOCHS.get(d["source"], _MIX_DEFAULT)
        floor_r, frac_r = int(r), r - int(r)
        epochs = sorted(per_doc.get((d["doc_id"], d["source"]), []))
        # copy count is floor(r) or floor(r)+1 (the md5-thinned extra epoch)
        assert len(epochs) in {floor_r, floor_r + 1}, (d["doc_id"], epochs)
        if frac_r == 0:
            assert len(epochs) == floor_r
        assert epochs == list(range(len(epochs)))  # contiguous 0..n-1

    # determinism: identical sample under repartition / re-run
    again = q139_source_mix(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
