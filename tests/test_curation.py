"""Corpus-curation operators: packing semantics, shard parallelism,
repetition filters, chunk dedup reassembly, redaction determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.packing import (
    pack_bins_summary,
    pack_contiguous,
)


def test_pack_contiguous_offsets_and_straddles(spark):
    docs = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 512), (5, 0)], "doc_id long, n_tok long"
    )
    rows = {r["doc_id"]: r for r in pack_contiguous(docs, "doc_id", "n_tok", ctx=512).collect()}
    assert 5 not in rows  # zero-token doc dropped
    assert (rows[1]["offset"], rows[1]["first_bin"], rows[1]["last_bin"]) == (0, 0, 0)
    # doc 2: offset 300, spans tokens 300..599 → bins 0 and 1
    assert (rows[2]["first_bin"], rows[2]["last_bin"], rows[2]["straddles"]) == (0, 1, True)
    assert (rows[3]["offset"], rows[3]["first_bin"]) == (600, 1)
    # doc 4: offset 700, 512 tokens → ends at 1211 → bins 1..2
    assert (rows[4]["first_bin"], rows[4]["last_bin"]) == (1, 2)


def test_pack_contiguous_sharded_equals_per_shard(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 5 + 1, f"s{i % 3}") for i in range(60)],
        "doc_id long, n_tok long, shard string",
    )
    sharded = pack_contiguous(docs, "doc_id", "n_tok", ctx=8, shard_col="shard")
    for s in ("s0", "s1", "s2"):
        alone = pack_contiguous(docs.filter(F.col("shard") == s), "doc_id", "n_tok", ctx=8)
        got = sorted(
            (r["doc_id"], r["offset"], r["first_bin"])
            for r in sharded.filter(F.col("shard") == s).collect()
        )
        want = sorted((r["doc_id"], r["offset"], r["first_bin"]) for r in alone.collect())
        assert got == want


def test_pack_bins_summary_totals(spark):
    docs = spark.createDataFrame([(i, 10) for i in range(1, 11)], "doc_id long, n_tok long")
    out = pack_bins_summary(pack_contiguous(docs, "doc_id", "n_tok", 32), "n_tok")
    rows = {r["bin"]: r for r in out.collect()}
    # 100 tokens, ctx 32 → docs start in bins 0..3; every 4th doc straddles
    assert sum(r["n_docs"] for r in rows.values()) == 10
    assert sum(r["n_tokens"] for r in rows.values()) == 100
    assert sum(r["n_straddling"] for r in rows.values()) == 3


def test_chunk_dedup_removes_common_chunks(spark, tmp_path, sf_dir):
    from scraper_db_refine_merge_spark.plans.curation import q70_chunk_dedup

    out = q70_chunk_dedup(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r["n_kept"] <= r["n_chunks"] for r in out)
    # the corpus has exact-duplicate docs (freq 3 > cap 2) → something removed
    assert any(r["n_kept"] < r["n_chunks"] for r in out)


def test_repetition_filters_flag_degenerate_doc(spark, sf_dir):
    from scraper_db_refine_merge_spark.plans.curation import q67_repetition_filters

    rows = q67_repetition_filters(spark, sf_dir).collect()
    assert all(0.0 <= r["dup_word_frac"] <= 1.0 for r in rows)
    assert all(0.0 <= r["top_bigram_frac"] <= 1.0 for r in rows)
    # bag-of-words docs over a ~30-word vocab necessarily repeat words
    assert max(r["dup_word_frac"] for r in rows) > 0.0
    assert all(r["keep"] == ((r["dup_word_frac"] <= 0.6) and (r["top_bigram_frac"] <= 0.2)) for r in rows)


def test_redaction_hash_stable_and_counts(spark, sf_dir):
    from scraper_db_refine_merge_spark.plans.curation import q69_pii_redaction

    a = {r["doc_id"]: r for r in q69_pii_redaction(spark, sf_dir).collect()}
    b = {r["doc_id"]: r for r in q69_pii_redaction(spark, sf_dir).collect()}
    assert a == b
    assert all(r["n_emails"] >= 1 and r["n_phones"] >= 1 for r in a.values())


def test_pack_first_fit_differential_and_dominates_next_fit(spark):
    """First-fit vs a plain-Python reference on a deterministic pseudo-
    random workload (exact bin assignments), plus the packing-theory
    invariants: no bin overflows (single-doc bins excepted), and first-fit
    never uses more bins than next-fit on the same stream."""
    from scraper_db_refine_merge_spark.operators.packing import pack_first_fit, pack_greedy

    ctx = 100
    # deterministic sizes incl. an over-ctx doc and awkward remainders
    sizes = [((i * 37) % 90) + 8 for i in range(200)]
    sizes[17] = 140  # over-ctx: own bin
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tok long"
    )

    got = {
        r["doc_id"]: r["bin"]
        for r in pack_first_fit(df, "doc_id", "n_tok", ctx).collect()
    }

    # plain-Python first-fit reference
    open_bins, expected, next_id = [], {}, 0
    for i, t in enumerate(sizes):
        placed = None
        for slot in open_bins:
            if slot[1] + t <= ctx:
                slot[1] += t
                placed = slot[0]
                break
        if placed is None:
            placed = next_id
            open_bins.append([next_id, t])
            next_id += 1
        expected[i] = placed
    assert got == expected

    # no overflow except single-doc over-ctx bins
    fill: dict = {}
    for i, b in got.items():
        fill.setdefault(b, []).append(sizes[i])
    for docs in fill.values():
        assert sum(docs) <= ctx or len(docs) == 1

    nf_bins = {
        r["bin"] for r in pack_greedy(df, "doc_id", "n_tok", ctx).collect()
    }
    assert len(set(got.values())) <= len(nf_bins)


def test_pack_first_fit_bounded_open_bins_and_shards(spark):
    """max_open_bins caps packer state (the streaming form): a closed bin
    never receives another doc, and sharded packing equals running the
    packer per shard independently."""
    from scraper_db_refine_merge_spark.operators.packing import pack_first_fit

    ctx = 50
    rows = [(i, ((i * 13) % 40) + 5, i % 3) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long, shard int")

    capped = pack_first_fit(df, "doc_id", "n_tok", ctx, max_open_bins=2)
    seen_after_close: dict = {}
    order = sorted(
        ((r["doc_id"], r["bin"]) for r in capped.collect()), key=lambda x: x[0]
    )
    # bins must be assigned in a pattern consistent with ≤2 open at a time:
    # once a bin with id b+2 exists, bin b can never appear again
    max_seen = -1
    closed = set()
    for _, b in order:
        assert b not in closed
        if b > max_seen:
            max_seen = b
            closed |= {x for x in range(max_seen - 1)}

    sharded = pack_first_fit(df, "doc_id", "n_tok", ctx, shard_col="shard")
    for s in range(3):
        sub = spark.createDataFrame(
            [r for r in rows if r[2] == s], "doc_id long, n_tok long, shard int"
        )
        solo = {
            r["doc_id"]: r["bin"]
            for r in pack_first_fit(sub, "doc_id", "n_tok", ctx).collect()
        }
        got = {
            r["doc_id"]: r["bin"]
            for r in sharded.filter(F.col("shard") == s).collect()
        }
        assert got == solo
