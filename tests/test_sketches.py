"""KMV / HLL sketches: mergeability (the scale property), estimate
accuracy sanity, small-group exact fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.sketches import (
    HLL_M,
    hll_registers,
    hll_summary,
    kmv_sketch,
)


def _events(spark, n_users=400, n_rows=4000):
    return spark.range(n_rows).select(
        (F.col("id") % n_users).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )


def test_hll_registers_merge_by_max(spark):
    """Registers built on two halves, unioned and re-MAXed, must equal the
    registers built on the whole — element-wise MAX mergeability."""
    df = _events(spark)
    whole = hll_registers(df, ["event_type"], "user_id")
    h1 = hll_registers(df.filter(F.col("user_id") % 2 == 0), ["event_type"], "user_id")
    h2 = hll_registers(df.filter(F.col("user_id") % 2 == 1), ["event_type"], "user_id")
    merged = (
        h1.unionByName(h2)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


def test_hll_estimate_within_tolerance(spark):
    df = _events(spark, n_users=1000, n_rows=20000)
    regs = hll_registers(df, ["event_type"], "user_id")
    out = {r["event_type"]: r for r in hll_summary(regs, ["event_type"]).collect()}
    # event_type is id-parity and 1000 is even → each type sees exactly 500
    # distinct users; raw HLL with m=64 has ~13% stderr, allow 3 sigma
    for r in out.values():
        assert abs(r["raw_estimate"] - 500) / 500 < 0.4
        assert 0 <= r["n_zero_registers"] < HLL_M


def test_kmv_small_group_exact(spark):
    df = spark.createDataFrame([(i, "t") for i in range(10)], "user_id long, event_type string")
    row = kmv_sketch(df, ["event_type"], "user_id", k=32).collect()[0]
    assert row["kth_hash"] is None
    assert row["est_distinct"] == 10.0
    assert row["n_distinct_hashes"] == 10


def test_kmv_estimate_and_duplicates_collapse(spark):
    # duplicates must not change the sketch (set semantics)
    base = _events(spark, n_users=500, n_rows=500)
    dup = base.unionByName(base).unionByName(base)
    a = sorted(tuple(r) for r in kmv_sketch(base, ["event_type"], "user_id").collect())
    b = sorted(tuple(r) for r in kmv_sketch(dup, ["event_type"], "user_id").collect())
    assert a == b
    for r in a:
        est = r[-1]
        n_true = 250  # 500 users split across 2 event types by id parity
        assert abs(est - n_true) / n_true < 0.6  # k=32 → ~18% stderr, 3 sigma


def test_histogram_sketch_merges_by_sum(spark):
    from scraper_db_refine_merge_spark.operators.sketches import histogram_sketch

    df = _events(spark, n_users=300, n_rows=3000).withColumn(
        "value", (F.col("user_id") * 7 % 100).cast("double")
    )
    whole = histogram_sketch(df, ["event_type"], "value", 10.0)
    h1 = histogram_sketch(df.filter(F.col("user_id") < 150), ["event_type"], "value", 10.0)
    h2 = histogram_sketch(df.filter(F.col("user_id") >= 150), ["event_type"], "value", 10.0)
    merged = (
        h1.unionByName(h2).groupBy("event_type", "bin").agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_histogram_quantiles_near_exact(spark):
    from scraper_db_refine_merge_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.range(10000).select(
        F.lit("g").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    hist = histogram_sketch(df, ["g"], "v", 50.0)
    out = {r["q"]: r["est_value"] for r in histogram_quantiles(hist, ["g"], [0.5, 0.95], 50.0).collect()}
    # uniform 0..999 → p50 ≈ 500, p95 ≈ 950; in-bin interpolation keeps the
    # error well under one bin width
    assert abs(out[0.5] - 500) < 50
    assert abs(out[0.95] - 950) < 50


def test_weighted_sample_deterministic_and_biased(spark):
    from scraper_db_refine_merge_spark.plans.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(i, 5 if i < 100 else 1) for i in range(1000)], "doc_id long, weight long"
    )
    a = [r["doc_id"] for r in weighted_sample(docs, "doc_id", "weight", 100).collect()]
    b = [r["doc_id"] for r in weighted_sample(docs, "doc_id", "weight", 100).collect()]
    assert a == b  # deterministic incl. order
    # 100 heavy docs (w=5) among 900 light (w=1): heavies are ~5x likelier;
    # expected heavy share ≈ 100·5/(100·5+900·1) ≈ 36% of the top-100 —
    # require clearly above the unweighted 10% share
    heavy = sum(1 for d in a if d < 100)
    assert heavy > 20


def test_cms_registers_merge_by_sum(spark):
    """CMS cells built on two halves, unioned and re-SUMmed, must equal the
    cells built on the whole — element-wise SUM mergeability (the property
    that lets per-day/per-batch sketches combine without re-reading data)."""
    from scraper_db_refine_merge_spark.operators.sketches import cms_registers

    df = _events(spark)
    whole = cms_registers(df, [], "user_id")
    h1 = cms_registers(df.filter(F.col("user_id") % 2 == 0), [], "user_id")
    h2 = cms_registers(df.filter(F.col("user_id") % 2 == 1), [], "user_id")
    merged = (
        h1.unionByName(h2).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b


def test_cms_estimate_upper_bias_and_heavy_hitter(spark):
    """Point estimates are never below the true count (CMS error is one-
    sided), exact for a key far heavier than the collision noise floor."""
    from scraper_db_refine_merge_spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    # skewed stream: user 7 appears 2000 times, users 0..99 appear ~20 each
    heavy = spark.range(2000).select(F.lit(7).alias("user_id"))
    tail = spark.range(2000).select((F.col("id") % 100 + 100).alias("user_id"))
    df = heavy.unionByName(tail)
    regs = cms_registers(df, [], "user_id")
    keys = df.select("user_id").distinct()
    est = {r["user_id"]: r["est_count"] for r in cms_estimate(regs, keys, "user_id").collect()}
    true = {r["user_id"]: r["n"] for r in df.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert all(est[k] >= true[k] for k in true)  # one-sided error
    top = max(est, key=lambda k: (est[k], -k))
    assert top == 7


# ----------------------------------------------------------------------
# q-digest (mergeable rank-accurate quantile sketch)


def _qd_data(spark, n=3000, seed_mod=977):
    from pyspark.sql import functions as F

    # deterministic skewed-ish integer values in [0, 2^16)
    return spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        ((F.col("id") * F.col("id")) % seed_mod + (F.col("id") % 50) * 700).alias("v"),
    )


def _quants(sk, groups=("g",)):
    from scraper_db_refine_merge_spark.operators.sketches import qdigest_quantiles

    return {
        (r["g"], r["qpct"]): (r["est_scaled"], r["n_total"])
        for r in qdigest_quantiles(sk, list(groups), [25, 50, 95]).collect()
    }


def test_qdigest_partitioning_independent_and_counts_conserved(spark):
    """The sketch CONTENT must be identical bits no matter how the input
    was partitioned (integer-only, order-independent compression), and
    compression must conserve the total count per group."""
    from scraper_db_refine_merge_spark.operators.sketches import qdigest_sketch

    df = _qd_data(spark)
    s1 = qdigest_sketch(df.repartition(1), ["g"], "v")
    s13 = qdigest_sketch(df.repartition(13, "v"), ["g"], "v")
    rows1 = sorted(tuple(r) for r in s1.collect())
    rows13 = sorted(tuple(r) for r in s13.collect())
    assert rows1 == rows13
    totals = {r["g"]: r["t"] for r in s1.groupBy("g").agg(F.sum("cnt").alias("t")).collect()}
    exact = {r["g"]: r["t"] for r in df.groupBy("g").agg(F.count("*").alias("t")).collect()}
    assert totals == exact


def test_qdigest_size_bound_and_rank_error(spark):
    """Size stays O(k) per group, and every quantile estimate's TRUE rank
    is within L·⌈N/k⌉ of the target — the q-digest guarantee."""
    from scraper_db_refine_merge_spark.operators.sketches import (
        QD_K,
        QD_LEVELS,
        qdigest_sketch,
    )

    df = _qd_data(spark)
    sk = qdigest_sketch(df, ["g"], "v")
    sizes = {r["g"]: r["n"] for r in sk.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 * QD_K for n in sizes.values()), sizes

    vals = {g: sorted(r["v"] for r in df.filter(F.col("g") == g).collect()) for g in ("a", "b")}
    for (g, qpct), (est, n_total) in _quants(sk).items():
        assert n_total == len(vals[g])
        target = -(-qpct * n_total // 100)  # ceil
        true_rank = sum(1 for v in vals[g] if v <= est)
        max_err = QD_LEVELS * -(-n_total // QD_K)
        assert true_rank >= target, (g, qpct, est)  # upper-bound estimate
        assert true_rank - target <= max_err, (g, qpct, true_rank, target, max_err)


def test_qdigest_merge_equals_recompressed_union(spark):
    """Merge algebra: merging the sketches of two halves must summarize
    N_a+N_b observations exactly (counts conserved) and give quantile
    estimates within the same rank-error bound as the whole-data sketch."""
    from scraper_db_refine_merge_spark.operators.sketches import (
        QD_K,
        QD_LEVELS,
        qdigest_merge,
        qdigest_sketch,
    )

    df = _qd_data(spark)
    half_a = df.filter(F.col("v") % 2 == 0)
    half_b = df.filter(F.col("v") % 2 == 1)
    merged = qdigest_merge(
        qdigest_sketch(half_a, ["g"], "v"),
        qdigest_sketch(half_b, ["g"], "v"),
        ["g"],
    )
    whole_n = {r["g"]: r["t"] for r in df.groupBy("g").agg(F.count("*").alias("t")).collect()}
    merged_n = {r["g"]: r["t"] for r in merged.groupBy("g").agg(F.sum("cnt").alias("t")).collect()}
    assert merged_n == whole_n

    vals = {g: sorted(r["v"] for r in df.filter(F.col("g") == g).collect()) for g in ("a", "b")}
    for (g, qpct), (est, n_total) in _quants(merged).items():
        target = -(-qpct * n_total // 100)
        true_rank = sum(1 for v in vals[g] if v <= est)
        max_err = QD_LEVELS * -(-n_total // QD_K)
        assert true_rank >= target
        assert true_rank - target <= max_err


def test_qdigest_exact_when_uncompressed(spark):
    """With thr=1-ish data (every leaf count above threshold never merges
    only when > thr; here distinct values are few and counts large), the
    sketch keeps exact leaves and quantiles are the exact value bounds."""
    from pyspark.sql import functions as F2

    from scraper_db_refine_merge_spark.operators.sketches import qdigest_sketch

    df = spark.range(1000).select(
        F2.lit("x").alias("g"), (F2.col("id") % 4 * 100).alias("v")
    )  # 250 each of {0, 100, 200, 300}; thr = ceil(1000/256) = 4 << 250
    sk = qdigest_sketch(df, ["g"], "v")
    got = sorted((r["node"], r["cnt"]) for r in sk.collect())
    assert got == [(65536 + v, 250) for v in (0, 100, 200, 300)]
    q = _quants(sk)
    assert q[("x", 25)][0] == 0
    assert q[("x", 50)][0] == 100
    assert q[("x", 95)][0] == 300


def test_kmv_set_estimates_exact_when_small_and_sane_when_sketched(spark):
    from pyspark.sql import functions as F2

    from scraper_db_refine_merge_spark.operators.sketches import kmv_set_estimates

    # small: union (20 distinct) < k=32 → exact fallback
    a = spark.range(0, 15).select(F2.col("id").alias("v"))
    b = spark.range(10, 20).select(F2.col("id").alias("v"))
    r = kmv_set_estimates(a, b, "v", k=32).first()
    assert r["kth_hash"] is None
    assert r["est_union"] == 20.0
    assert r["rho"] == 5 and r["est_intersection"] == 5.0

    # sketched: 600 union / 200 intersection with k=64 — estimates within
    # a loose relative band (the KMV guarantee, not a tight constant)
    a = spark.range(0, 400).select(F2.col("id").alias("v"))
    b = spark.range(200, 600).select(F2.col("id").alias("v"))
    r = kmv_set_estimates(a, b, "v", k=64).first()
    assert abs(r["est_union"] - 600) / 600 < 0.5
    assert abs(r["est_intersection"] - 200) / 200 < 0.8
