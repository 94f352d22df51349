"""Product quantization: structural invariants + ADC recall sanity vs the
exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.pq import (
    PQ_K,
    PQ_M,
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)
from scraper_db_refine_merge_spark.sources.tables import load_table


def test_codebook_and_codes_shape(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(e, "vec_id", "embedding")
    rows = cb.collect()
    assert len(rows) == PQ_M * PQ_K
    assert all(len(r["cbv"]) == 8 for r in rows)
    codes = pq_encode(e, cb, "vec_id", "embedding")
    n_vec = e.count()
    assert codes.count() == n_vec * PQ_M
    rng = codes.agg(F.min("code"), F.max("code")).first()
    assert 0 <= rng[0] and rng[1] < PQ_K


def test_planted_near_copy_is_rank1(spark, sf_dir):
    """The guarantee PQ actually offers on distance-concentrated data: a
    planted near-copy of each query encodes to that query's own argmin
    codewords, so its ADC score is the sum of the per-subspace LUT MINIMA
    — no other candidate can score lower. Every planted copy must come
    back at rank 1. (The driver's synthetic embeddings are near-uniform:
    true-neighbor distances ~1.2-1.4 with a flat spectrum, so a recall@k
    assertion against exact L2 would test the DATA, not the operator.)"""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    planted = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0))
        ).alias("embedding"),
        "label",
    )
    corpus = e.unionByName(planted)
    top = pq_adc_topk(corpus, queries, "vec_id", "embedding", k_neighbors=1)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {q: q + 1_000_000 for q in range(5)}, got


def test_adc_self_exclusion_and_rank_shape(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    approx = pq_adc_topk(e, queries, "vec_id", "embedding", k_neighbors=5)
    rows = approx.collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ivf_pq_planted_near_copy_is_rank1(spark, sf_dir):
    """Residual-PQ analogue of the planted-copy guarantee: a near-copy of
    the query lands in the query's own nearest cell with a near-identical
    residual, encodes to the query-residual's argmin codewords, and scores
    the per-subspace LUT minima — rank 1 in every probed query."""
    from scraper_db_refine_merge_spark.operators.pq import ivf_pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    planted = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(0.0005)).otherwise(F.lit(0.0))
        ).alias("embedding"),
        "label",
    )
    corpus = e.unionByName(planted)
    top = ivf_pq_topk(corpus, queries, "vec_id", "embedding", "label", k_neighbors=1)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {q: q + 1_000_000 for q in range(5)}, got


def test_pq_code_table_partition_prunes_by_cell(spark, sf_dir, tmp_path):
    """The claimed production layout: the PQ code table written
    partitionBy(cell) gives PARTITION PRUNING for a probe's cell filter —
    an nprobe=2 probe reads 2/n_cells of the code table's files, which is
    the IVF selectivity the ivf_pq_topk docstring promises."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.operators.similarity import (
        ivf_assign,
        label_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(e, "embedding", "label")
    assigned = ivf_assign(e, cent, "vec_id", "embedding", "label")
    resid = assigned.join(
        F.broadcast(cent.withColumnRenamed("label", "cell")), "cell"
    ).select(
        "vec_id",
        "cell",
        F.zip_with("embedding", "centroid", lambda x, y: x.cast("double") - y).alias("rvec"),
    )
    cb = pq_codebook(resid, "vec_id", "rvec")
    codes = pq_encode(resid, cb, "vec_id", "rvec").join(resid.select("vec_id", "cell"), "vec_id")

    target = str(tmp_path / "pq_codes")
    codes.write.partitionBy("cell").parquet(target)

    n_cells = codes.select("cell").distinct().count()
    two = [r["cell"] for r in codes.select("cell").distinct().orderBy("cell").limit(2).collect()]
    probe = spark.read.parquet(target).filter(F.col("cell").isin(two))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "cell" in pf.split("PartitionFilters")[1][:200], pf
    touched = probe.select("cell").distinct().count()
    assert touched <= 2 < n_cells, (touched, n_cells)


def test_ivf_pq_topk_non_default_id_col(spark, sf_dir):
    """ADVICE r6: pq_encode normalizes the id to 'vec_id', so ivf_pq_topk
    must work (and give identical results) for any id_col name."""
    from scraper_db_refine_merge_spark.operators.pq import ivf_pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 3)
    want = sorted(
        map(tuple, ivf_pq_topk(e, queries, "vec_id", "embedding", "label", k_neighbors=3).collect())
    )
    e2 = e.withColumnRenamed("vec_id", "item_id")
    q2 = queries.withColumnRenamed("vec_id", "item_id")
    got = sorted(
        map(tuple, ivf_pq_topk(e2, q2, "item_id", "embedding", "label", k_neighbors=3).collect())
    )
    assert got == want


def test_trained_codebook_strictly_reduces_quantization_error(spark, sf_dir):
    """The property codebook training exists to buy (VERDICT r6 item 4):
    2 per-subspace Lloyd rounds must land STRICTLY below the md5-sampled
    baseline's total quantization error on the same corpus. (Lloyd
    guarantees non-increase per round; on any non-degenerate corpus the
    first reassignment strictly improves.)"""
    from scraper_db_refine_merge_spark.operators.pq import (
        pq_codebook_trained,
        pq_quantization_error,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = pq_codebook(e, "vec_id", "embedding")
    trained = pq_codebook_trained(e, "vec_id", "embedding", iters=2)
    e_base = pq_quantization_error(e, base, "vec_id", "embedding").first()["err_units"]
    e_trained = pq_quantization_error(e, trained, "vec_id", "embedding").first()["err_units"]
    assert e_trained < e_base, (e_trained, e_base)


def _residuals(spark, sf_dir):
    """(vec_id, cell, rvec): per-vector residual vs own-cell centroid —
    the exact frame ivf_pq_topk trains its codebook on."""
    from scraper_db_refine_merge_spark.operators.similarity import (
        ivf_assign,
        label_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(e, "embedding", "label")
    assigned = ivf_assign(e, cent, "vec_id", "embedding", "label")
    return assigned.join(
        F.broadcast(cent.withColumnRenamed("label", "cell")), "cell"
    ).select(
        "vec_id",
        "cell",
        F.zip_with("embedding", "centroid", lambda x, y: x.cast("double") - y).alias("rvec"),
    )


def test_trained_residual_codebook_strictly_reduces_quantization_error(spark, sf_dir):
    """VERDICT r9 item 4: training must pay on RESIDUALS specifically —
    2 Lloyd rounds over the residual frame ivf_pq_topk quantizes must land
    strictly below the md5-sampled residual codebook's total quantization
    error (mirrors the q133 full-vector assertion above)."""
    from scraper_db_refine_merge_spark.operators.pq import (
        pq_codebook_trained,
        pq_quantization_error,
    )

    resid = _residuals(spark, sf_dir)
    base = pq_codebook(resid, "vec_id", "rvec")
    trained = pq_codebook_trained(resid, "vec_id", "rvec", iters=2)
    e_base = pq_quantization_error(resid, base, "vec_id", "rvec").first()["err_units"]
    e_trained = pq_quantization_error(resid, trained, "vec_id", "rvec").first()["err_units"]
    assert e_trained < e_base, (e_trained, e_base)


def test_trained_ivf_pq_planted_near_copy_is_rank1(spark, sf_dir):
    """The residual planted-copy guarantee must survive codebook training:
    the near-copy's residual still encodes to the query-residual's argmin
    codewords under the trained residual codebook — rank 1 per query."""
    from scraper_db_refine_merge_spark.operators.pq import ivf_pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    planted = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(0.0005)).otherwise(F.lit(0.0))
        ).alias("embedding"),
        "label",
    )
    corpus = e.unionByName(planted)
    top = ivf_pq_topk(
        corpus, queries, "vec_id", "embedding", "label", k_neighbors=1, train_iters=2
    )
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {q: q + 1_000_000 for q in range(5)}, got


def test_trained_pq_planted_near_copy_is_rank1(spark, sf_dir):
    """The sampled-codebook planted-copy guarantee must survive training:
    a near-copy still encodes to its query's argmin codewords under the
    trained codebook, so it scores the per-subspace LUT minima — rank 1."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    planted = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0))
        ).alias("embedding"),
        "label",
    )
    corpus = e.unionByName(planted)
    top = pq_adc_topk(corpus, queries, "vec_id", "embedding", k_neighbors=1, train_iters=2)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {q: q + 1_000_000 for q in range(5)}, got


def test_encode_carry_matches_join_back(spark, sf_dir):
    """The r12 ``carry`` path (extra columns riding the encode kernel)
    must be row-identical to encoding and joining the carried column back
    on vec_id — the shape ivf_pq_topk replaced."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    cb = pq_codebook(e, "vec_id", "embedding")
    carried = pq_encode(e, cb, "vec_id", "embedding", carry=("label",))
    joined = pq_encode(e, cb, "vec_id", "embedding").join(
        e.select(F.col("vec_id"), "label"), "vec_id"
    )
    a = {tuple(r) for r in carried.select("vec_id", "s", "code", "label").collect()}
    b = {tuple(r) for r in joined.select("vec_id", "s", "code", "label").collect()}
    assert a == b and len(a) == e.count() * PQ_M


def test_encode_empty_codebook_is_empty_with_schema(spark, sf_dir):
    """Empty corpus -> empty codebook -> encode returns ZERO rows but the
    full (vec_id, s, code[, carry]) schema, matching the old empty-join
    shape (downstream joins/aggs stay well-typed)."""
    e = load_table(spark, sf_dir, "embeddings")
    empty = e.filter(F.lit(False))
    cb = pq_codebook(empty, "vec_id", "embedding")
    out = pq_encode(e, cb, "vec_id", "embedding", carry=("label",))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "s", "code", "label"]


def test_encode_degenerate_vectors_null_propagate_not_crash(spark, sf_dir):
    """ADVICE r12: the encode kernel used to crash the whole task on a
    NULL vector (list(None) → TypeError) and on ragged batches. Parity
    target is the pre-kernel expression plan: NULL/short subvector d2 was
    NULL → nulls-first window → code 0; longer vectors scored their first
    64 dims (slice semantics)."""
    e = load_table(spark, sf_dir, "embeddings").limit(30)
    cb = pq_codebook(e, "vec_id", "embedding")

    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dirty = base.unionByName(
        spark.createDataFrame(
            [
                (100001, None),  # NULL vector
                (100002, [float(i) for i in range(10)]),  # short (10 < 64)
            ],
            "vec_id long, v array<double>",
        )
    ).unionByName(
        # long (70 > 64): codes must equal the truncated-to-64 encoding
        base.limit(1).select(
            (F.col("vec_id") + 200000).alias("vec_id"),
            F.concat("v", F.array(*[F.lit(float(d)) for d in range(6)])).alias("v"),
        )
    )
    codes = {
        (r["vec_id"], r["s"]): r["code"]
        for r in pq_encode(dirty, cb, "vec_id", "v").collect()
    }
    # every input row encodes to exactly m rows
    assert len(codes) == (30 + 3) * PQ_M
    # NULL vector → code 0 in every subspace (nulls-first j=0 parity)
    assert all(codes[(100001, s)] == 0 for s in range(PQ_M))
    # short vector: s=0 covers dims 0-7 (present) → scored normally;
    # s=1 is partially null-padded, s>=2 fully → code 0
    assert all(codes[(100002, s)] == 0 for s in range(1, PQ_M))
    # long vector scores its first 64 dims → same codes as the original
    long_id = next(vid for vid, _s in codes if vid >= 200000)
    assert all(
        codes[(long_id, s)] == codes[(long_id - 200000, s)] for s in range(PQ_M)
    )


def test_quantization_error_skips_null_vectors(spark, sf_dir):
    """NULL/short vectors contribute NULL error units, skipped by the SUM
    (old expression-plan parity) — the total is unchanged."""
    from scraper_db_refine_merge_spark.operators.pq import pq_quantization_error

    e = load_table(spark, sf_dir, "embeddings").limit(30)
    cb = pq_codebook(e, "vec_id", "embedding")
    clean = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(100001, None), (100002, [1.0, 2.0])],
            "vec_id long, v array<double>",
        )
    )
    a = pq_quantization_error(clean, cb, "vec_id", "v").collect()[0]["err_units"]
    b = pq_quantization_error(dirty, cb, "vec_id", "v").collect()[0]["err_units"]
    assert a == b


def test_trained_codebook_rejects_null_vectors_loudly(spark, sf_dir):
    """Training has a strict precondition (ADVICE r12): a NULL or short
    vector fails with a clear message, not an opaque executor TypeError.
    The null row's id is chosen with the LARGEST md5 priority so the
    sampled codebook seeds stay clean and the failure comes from the
    training kernel itself."""
    import hashlib

    import pytest

    e = load_table(spark, sf_dir, "embeddings").limit(40)
    base = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    null_id = max(
        range(100000, 100100), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    dirty = base.unionByName(
        spark.createDataFrame([(null_id, None)], "vec_id long, v array<double>")
    )
    from scraper_db_refine_merge_spark.operators.pq import pq_codebook_trained

    with pytest.raises(Exception, match="non-null fixed-dim"):
        pq_codebook_trained(dirty, "vec_id", "v", iters=2).collect()
