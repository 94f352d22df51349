"""Scale-smoke: replicate the sf0.1 corpus Nx (default 10x -> 50k docs /
50k vectors) and measure the near-dup / similarity operators' growth.

The point is the growth CURVE, not absolute numbers: candidate-restricted
operators (MinHash/LSH, bucketed cosine, SimHash banding) must grow
~linearly in corpus size; anything quadratic explodes at this step long
before it would melt a cluster. Replicated copies are exact duplicates
with new ids, so dup-group sizes also scale — the skew path gets exercised.

Usage: PYTHONPATH=. python tools/scale_smoke.py [factor]
Writes scratch parquet under .scratch/ (git-ignored) and prints one table.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scraper_db_refine_merge_spark.operators import dedup as dd  # noqa: E402
from scraper_db_refine_merge_spark.operators.graph import dup_clusters  # noqa: E402
from scraper_db_refine_merge_spark.plans.analytics import (  # noqa: E402
    funnel_steps,
    retention_cohorts,
)
from scraper_db_refine_merge_spark.operators.rollup import fold_rollup  # noqa: E402
from scraper_db_refine_merge_spark.operators.sketches import hll_registers  # noqa: E402
from scraper_db_refine_merge_spark.plans.curation import (  # noqa: E402
    chunk_dedup,
    repetition_stats,
)
from scraper_db_refine_merge_spark.operators.similarity import (  # noqa: E402
    cosine_near_dup_pairs,
    lsh_topk,
)
from scraper_db_refine_merge_spark.operators.temporal import asof_join, interval_join  # noqa: E402
from scraper_db_refine_merge_spark.session import get_spark  # noqa: E402
from scraper_db_refine_merge_spark.sources.tables import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def replicate(spark, table, id_col, factor):
    df = load_table(spark, BASE, table)
    n = df.count()
    out = None
    for i in range(factor):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(i * 10 * n))
        out = part if out is None else out.unionByName(part)
    path = os.path.join(SCRATCH, f"{table}_x{factor}.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path, n * factor


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label:42s} {dt:7.2f}s  rows={n}")
    return dt


# The r4 weak set (VERDICT items 1-2): queries whose plans once carried a
# forced broadcast of a corpus-growing relation. The smoke asserts the
# class of bug stays dead: NO broadcast hint anywhere in their analyzed
# plans (AQE alone decides, by runtime size).
HINT_FREE_QUERIES = [
    "q24_ngram_jaccard_pairs",
    "q25_minhash_lsh_pairs",
    "q55_lsh_near_dup",
    "q73_dup_clusters",
    "q85_funnel_steps",
    "q86_retention_cohorts",
    "q105_capped_jaccard_pairs",
]

# Star rollups whose plans may hint ONLY their constant-size dims (region:
# 5 rows, nation: 25 rows — fixed regardless of SF). The value is that
# exact budget; one hint more means an SF-growing relation (customer,
# supplier, part, orders) got a forced broadcast again (VERDICT r5 item 1).
HINT_BUDGET_QUERIES = {
    "q02_nation_revenue": 1,       # nation only
    "q04_region_revenue": 2,       # nation + region
    "q100_region_market_share": 2,  # nation + region
}


def assert_no_forced_broadcast(spark):
    from scraper_db_refine_merge_spark.plans.catalog import QUERIES

    bad = []
    for name in HINT_FREE_QUERIES:
        plan = QUERIES[name](spark, BASE)._jdf.queryExecution().analyzed().toString()
        if "strategy=broadcast" in plan:
            bad.append(name)
    for name, budget in HINT_BUDGET_QUERIES.items():
        plan = QUERIES[name](spark, BASE)._jdf.queryExecution().analyzed().toString()
        if plan.count("strategy=broadcast") > budget:
            bad.append(f"{name} (> {budget} constant-dim hints)")
    if bad:
        raise SystemExit(
            f"forced broadcast hint reintroduced in corpus-growing plans: {bad}"
        )
    print(
        f"broadcast-hint check: {len(HINT_FREE_QUERIES)} weak-set plans hint-free, "
        f"{len(HINT_BUDGET_QUERIES)} star plans within constant-dim hint budget\n"
    )


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-smoke")
    os.makedirs(SCRATCH, exist_ok=True)

    assert_no_forced_broadcast(spark)

    docs_path, n_docs = replicate(spark, "documents", "doc_id", factor)
    vecs_path, n_vecs = replicate(spark, "embeddings", "vec_id", factor)
    # events keep their user_ids on replication: per-user event density
    # grows with the corpus, so the keyed window/join paths see hot keys
    evts_path, n_evts = replicate(spark, "events", "event_id", factor)
    docs = spark.read.parquet(docs_path)
    vecs = spark.read.parquet(vecs_path)
    evts = spark.read.parquet(evts_path)
    print(f"\ncorpus: {n_docs} docs, {n_vecs} vectors, {n_evts} events (sf0.1 x{factor})\n")

    base_docs = load_table(spark, BASE, "documents")
    base_vecs = load_table(spark, BASE, "embeddings")
    base_evts = load_table(spark, BASE, "events")

    def _asof(e):
        p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
        c = e.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )
        return asof_join(p, c, "user_id", "ts", "click_ts", right_tiebreak="click_id")

    def _interval(e):
        s = e.filter(F.col("event_type") == "signup").select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        )
        c = e.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        return interval_join(c, s, "user_id", "ts", "start_ts", "end_ts", 3_600_000_000)

    def _sessionize(e):
        from scraper_db_refine_merge_spark.operators.skew import sessionize_two_phase

        return sessionize_two_phase(e, ["user_id"], "ts", gap_sec=1800, order_tiebreak=["event_id"])

    def _paths(e):
        from scraper_db_refine_merge_spark.operators.skew import session_paths_two_phase

        return session_paths_two_phase(
            e, ["user_id"], "ts", gap_sec=1800, val_col="event_type",
            order_tiebreak=["event_id"],
        )

    def _funnel2(e):
        from scraper_db_refine_merge_spark.operators.skew import funnel_two_phase

        return funnel_two_phase(
            e, ["user_id"], "ts", ["signup", "click", "purchase"],
            val_col="event_type", block_sec=86400, order_tiebreak=["event_id"],
        )

    def _pq(v):
        from scraper_db_refine_merge_spark.operators.pq import pq_adc_topk

        return pq_adc_topk(v, v.filter(F.col("vec_id") < 5), "vec_id", "embedding")

    def _cumsum(e):
        from scraper_db_refine_merge_spark.operators.ranking import global_cumsum

        spend = (
            e.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.sum(F.floor(F.col("value") * 100)).alias("cents"))
        )
        return global_cumsum(
            spend, [F.col("cents").desc(), F.col("user_id")], F.col("cents"), "cs"
        )

    def _shard_manifest(d):
        from scraper_db_refine_merge_spark.functions.text import token_count
        from scraper_db_refine_merge_spark.operators.ranking import with_global_ranks

        base = d.select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("pk"),
            token_count(F.col("text")).alias("n_tokens"),
        )
        r = with_global_ranks(
            base, [F.col("pk"), F.col("doc_id")], ["pk", "doc_id"],
            rank_col="idx", ntile=("shard", 16),
        )
        return r.groupBy("shard").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
        )

    def _contamination(d):
        from scraper_db_refine_merge_spark.plans.sampling import hash_unit

        sh = dd.word_shingles(d, "doc_id", "text", k=5).select(
            "doc", hash_unit(F.col("doc")).alias("unit"), F.md5(F.col("shingle")).alias("h")
        )
        train = sh.filter(F.col("unit") < 0.8).select("h").distinct().withColumn(
            "__m", F.lit(1)
        )
        ev = sh.filter(F.col("unit") >= 0.9).select(F.col("doc").alias("doc_id"), "h")
        return (
            ev.join(train, "h", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"), F.count("__m").alias("m"))
        )

    def _mmr(v):
        from scraper_db_refine_merge_spark.operators.similarity import mmr_rerank

        return mmr_rerank(v, v.filter(F.col("vec_id") < 3), k=8, n_candidates=20)

    def _substr_contam(d):
        from scraper_db_refine_merge_spark.operators.substr import substring_contamination
        from scraper_db_refine_merge_spark.plans.sampling import hash_unit

        u = hash_unit(F.col("doc_id"))
        return substring_contamination(
            d.filter(u < 0.8), d.filter(u >= 0.9), "doc_id", "text", 32, stride=4
        )

    def _suffix_groups(d):
        from scraper_db_refine_merge_spark.operators.substr import suffix_ngram_groups

        # direct_max=0 forces the LADDER regime: L=32 would otherwise take
        # the r11 direct short-circuit, and the scale question this entry
        # answers (per-round rank-refinement growth) is about the ladder.
        return suffix_ngram_groups(d, "doc_id", "text", 32, direct_max=0)

    def _suffix_groups_direct(d):
        from scraper_db_refine_merge_spark.operators.substr import suffix_ngram_groups

        # the PRODUCTION path at L=32 (r12, VERDICT r11 item 6): its
        # claimed scale shape — char_grams' single projection — is now a
        # measured row of its own instead of an inference from the
        # substring_contamination entry.
        return suffix_ngram_groups(d, "doc_id", "text", 32)

    def _bm25(d):
        from scraper_db_refine_merge_spark.plans.catalog import QUERIES  # noqa: F401
        from scraper_db_refine_merge_spark.plans.analytics import _BM25_TERMS

        toks = d.select(
            "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
        ).filter(F.length("tok") >= 3)
        qterm = F.col("tok").isin(*_BM25_TERMS)
        dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
        stats = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("dlsum"))
        tf = toks.filter(qterm).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
        return (
            tf.join(dl, "doc_id").crossJoin(F.broadcast(stats))
            .groupBy("doc_id").agg(F.count("*").alias("n_terms"))
            .orderBy(F.col("n_terms").desc(), "doc_id").limit(20)
        )

    def _semdedup(v):
        from scraper_db_refine_merge_spark.operators.similarity import semantic_dedup

        # k grows with the corpus (the SemDeDup contract) so per-cell pair
        # counts — the quadratic term — stay constant across the 10x step
        return semantic_dedup(v, k=max(8, v.count() // 250), iters=1, threshold=0.4)

    def _wsample(d):
        from scraper_db_refine_merge_spark.operators.weighted import (
            weighted_sample_with_replacement,
        )

        return weighted_sample_with_replacement(d, 50, "n_chars", ["doc_id"])

    def _wsample_wor(d):
        from scraper_db_refine_merge_spark.operators.weighted import (
            weighted_sample_without_replacement,
        )

        return weighted_sample_without_replacement(d, 50, "n_chars", ["doc_id"])

    def _ranked(e):
        from scraper_db_refine_merge_spark.operators.ranking import with_global_ranks

        spend = (
            e.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.sum(F.floor(F.col("value") * 100)).alias("cents"))
        )
        return with_global_ranks(
            spend, [F.col("cents").desc(), F.col("user_id")], ["cents", "user_id"],
            rank_col="rk", dense_rank_col="drk",
        )

    def _rollup(e, name):
        target = os.path.join(SCRATCH, name)
        shutil.rmtree(target, ignore_errors=True)
        return fold_rollup(
            spark, target, e, key_cols=["event_type", "user_id"], sum_cols=["value"]
        ).count()

    results = {}
    for label, small, big in [
        (
            "exact_dedup",
            lambda: dd.exact_dedup_groups(base_docs, "doc_id", "text").count(),
            lambda: dd.exact_dedup_groups(docs, "doc_id", "text").count(),
        ),
        (
            "minhash_lsh_pairs",
            lambda: dd.minhash_dedup_pairs(base_docs, "doc_id", "text", max_shingle_freq=1000).count(),
            lambda: dd.minhash_dedup_pairs(docs, "doc_id", "text", max_shingle_freq=1000).count(),
        ),
        (
            # r13 (VERDICT r12 item 4): capped candidate generation — a
            # replicated clique emits chain pairs, not its square; growth
            # must stay ~linear where the uncapped entry is output-driven
            "minhash_capped_pairs(m=3)",
            lambda: dd.minhash_dedup_pairs(
                base_docs, "doc_id", "text",
                max_shingle_freq=1000, max_band_successors=3,
            ).count(),
            lambda: dd.minhash_dedup_pairs(
                docs, "doc_id", "text",
                max_shingle_freq=1000, max_band_successors=3,
            ).count(),
        ),
        (
            "simhash_near_pairs(h<=3)",
            lambda: dd.simhash_near_pairs(base_docs, "doc_id", "text", max_hamming=3).count(),
            lambda: dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).count(),
        ),
        (
            "cosine_near_dup(lsh)",
            lambda: cosine_near_dup_pairs(base_vecs, threshold=0.4).count(),
            lambda: cosine_near_dup_pairs(vecs, threshold=0.4).count(),
        ),
        (
            "cosine_near_dup_capped(m=3)",
            lambda: cosine_near_dup_pairs(
                base_vecs, threshold=0.4, max_bucket_successors=3
            ).count(),
            lambda: cosine_near_dup_pairs(
                vecs, threshold=0.4, max_bucket_successors=3
            ).count(),
        ),
        (
            # r14 (VERDICT r13 item 1): corpus-adaptive width — at Nx the
            # policy picks MORE planes (2000 -> p=8, 20000 -> p=12), so
            # bucket occupancy stays ~constant and capped candidate growth
            # stays ~linear WITHOUT the static-width collider pile-up
            "cosine_near_dup_capped(auto)",
            lambda: cosine_near_dup_pairs(
                base_vecs, threshold=0.4, num_planes="auto",
                max_bucket_successors=3,
            ).count(),
            lambda: cosine_near_dup_pairs(
                vecs, threshold=0.4, num_planes="auto",
                max_bucket_successors=3,
            ).count(),
        ),
        (
            "lsh_topk(5 queries)",
            lambda: lsh_topk(base_vecs, base_vecs.filter(F.col("vec_id") < 5), k=5).count(),
            lambda: lsh_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=5).count(),
        ),
        (
            "asof_join(purchase<-click)",
            lambda: _asof(base_evts).count(),
            lambda: _asof(evts).count(),
        ),
        (
            "interval_join(signup+1h)",
            lambda: _interval(base_evts).count(),
            lambda: _interval(evts).count(),
        ),
        (
            "fold_rollup(type,user)",
            lambda: _rollup(base_evts, "rollup_1x"),
            lambda: _rollup(evts, f"rollup_{factor}x"),
        ),
        (
            "repetition_stats",
            lambda: repetition_stats(base_docs).count(),
            lambda: repetition_stats(docs).count(),
        ),
        (
            "chunk_dedup",
            lambda: chunk_dedup(base_docs).count(),
            lambda: chunk_dedup(docs).count(),
        ),
        (
            "hll_registers(events)",
            lambda: hll_registers(base_evts, ["event_type"], "user_id").count(),
            lambda: hll_registers(evts, ["event_type"], "user_id").count(),
        ),
        (
            # the corpus-scale EXACT jaccard path (q105): stop-shingle cap
            # bounds the pair join; replicated copies make every shingle
            # hit frequency ≥ factor, so the cap path is truly exercised
            "jaccard_pairs(capped)",
            lambda: dd.jaccard_pairs(base_docs, "doc_id", "text", max_shingle_freq=1000).count(),
            lambda: dd.jaccard_pairs(docs, "doc_id", "text", max_shingle_freq=1000).count(),
        ),
        (
            # q73's clustering stage over capped-jaccard pairs
            "dup_clusters(jaccard capped)",
            lambda: dup_clusters(
                dd.jaccard_pairs(base_docs, "doc_id", "text", max_shingle_freq=1000).select("a_id", "b_id")
            ).count(),
            lambda: dup_clusters(
                dd.jaccard_pairs(docs, "doc_id", "text", max_shingle_freq=1000).select("a_id", "b_id")
            ).count(),
        ),
        (
            # q85: per-user stage state grows with the corpus — must stay
            # linear now that AQE (not a forced hint) picks the join side
            "funnel_steps",
            lambda: funnel_steps(base_evts).count(),
            lambda: funnel_steps(evts).count(),
        ),
        (
            "retention_cohorts",
            lambda: retention_cohorts(base_evts).count(),
            lambda: retention_cohorts(evts).count(),
        ),
        (
            # q123's two-phase sessionization: replicated events keep their
            # user_ids, so per-user density grows with the corpus — the
            # time-block salt must keep growth ~linear
            "sessionize_two_phase",
            lambda: _sessionize(base_evts).count(),
            lambda: _sessionize(evts).count(),
        ),
        (
            # q09/q111's distributed ranking: global total order with no
            # single-task window — growth must track the sort, not stall
            # on one straggler task
            "global_ranks(spend)",
            lambda: _ranked(base_evts).count(),
            lambda: _ranked(evts).count(),
        ),
        (
            # q134's block-split ordered paths: per-user fragments must keep
            # growth linear even as replicated per-user density explodes
            "session_paths_two_phase",
            lambda: _paths(base_evts).count(),
            lambda: _paths(evts).count(),
        ),
        (
            # q135's associative funnel-transition composition, same property
            "funnel_two_phase",
            lambda: _funnel2(base_evts).count(),
            lambda: _funnel2(evts).count(),
        ),
        (
            # q127's ADC scan with the r7 two-phase top-k: corpus-linear
            # scoring, and no per-query single-task sort at the cut
            "pq_adc_topk(5 queries)",
            lambda: _pq(base_vecs).count(),
            lambda: _pq(vecs).count(),
        ),
        (
            # q140's distributed prefix sum: range partition + offsets —
            # growth must stay linear, never a single-task global window
            "global_cumsum(spend)",
            lambda: _cumsum(base_evts).count(),
            lambda: _cumsum(evts).count(),
        ),
        (
            # r15 weighted sampling: one prefix-sum + bucketed probe join —
            # cost is the prefix-sum's (~linear); output is k rows exactly
            "weighted_sample(k=50)",
            lambda: _wsample(base_docs).count(),
            lambda: _wsample(docs).count(),
        ),
        (
            # r16 WOR sampling: same prefix-sum + probe join, plus the
            # data-determined round loop — normally ONE round, so growth
            # must track the with-replacement form, not multiply it
            "weighted_sample_wor(k=50)",
            lambda: _wsample_wor(base_docs).count(),
            lambda: _wsample_wor(docs).count(),
        ),
        (
            # q138 SemDeDup: k scales with the corpus so the per-cell
            # quadratic stays bounded; output is per-vector (linear)
            "semantic_dedup(k~n/250)",
            lambda: _semdedup(base_vecs).count(),
            lambda: _semdedup(vecs).count(),
        ),
        (
            # q142's export manifest: the permutation+ntile is the
            # distributed ranking shape — growth must track the range
            # sort, never a single-task global window
            "shard_export_manifest",
            lambda: _shard_manifest(base_docs).count(),
            lambda: _shard_manifest(docs).count(),
        ),
        (
            # q143's decontamination join: right side is DISTINCT train
            # shingles, so hot stop-shingles can't explode the join —
            # growth must stay ~linear in corpus size
            "contamination_overlap",
            lambda: _contamination(base_docs).count(),
            lambda: _contamination(docs).count(),
        ),
        (
            # q144 MMR: candidate set is config-bounded (C=20) per query —
            # cost must track candidate GENERATION (corpus-linear scoring),
            # with the greedy fold flat
            "mmr_rerank(3 queries)",
            lambda: _mmr(base_vecs).count(),
            lambda: _mmr(vecs).count(),
        ),
        (
            # q145 BM25: token explode + token-keyed aggs — linear
            "bm25_term_aggs",
            lambda: _bm25(base_docs).count(),
            lambda: _bm25(docs).count(),
        ),
        (
            # q155's strided char-gram decontamination (the 100 TB config):
            # per-position rows are the modality's inherent cost — growth
            # must track positions (linear in corpus bytes), the DISTINCT
            # probe side bounding hot grams exactly like shingle q143
            "substring_contamination(stride4)",
            lambda: _substr_contam(base_docs).count(),
            lambda: _substr_contam(docs).count(),
        ),
        (
            # q153's prefix-doubling suffix ranks: O(log L) rounds of
            # fixed-width rank refinement — growth must track the range
            # sorts (linear-ish), never a per-round blowup. Replicated
            # copies multiply every gram group by the factor, so the
            # group-join output stays per-position (linear).
            "suffix_ngram_groups(L=32, ladder)",
            lambda: _suffix_groups(base_docs).count(),
            lambda: _suffix_groups(docs).count(),
        ),
        (
            # the DIRECT regime (default at L <= 64): one xxhash64-pair
            # projection per position, zero extra shuffles — growth must
            # be linear in corpus bytes, char_grams-class
            "suffix_ngram_groups(L=32, direct)",
            lambda: _suffix_groups_direct(base_docs).count(),
            lambda: _suffix_groups_direct(docs).count(),
        ),
        (
            # pair OUTPUT grows ~quadratically in the replication factor
            # (exact copies form ever-larger dup cliques); what must stay
            # tame is clustering them — CC rounds are O(log diameter)
            "dup_clusters(simhash h<=3)",
            lambda: dup_clusters(
                dd.simhash_near_pairs(base_docs, "doc_id", "text", max_hamming=3)
            ).count(),
            lambda: dup_clusters(
                dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)
            ).count(),
        ),
    ]:
        small()  # warm codegen
        t1 = timed(f"{label} @1x", small)
        tN = timed(f"{label} @{factor}x", big)
        results[label] = tN / max(t1, 1e-9)

    print("\ngrowth factors (time@Nx / time@1x; corpus grew {}x):".format(factor))
    for label, g in results.items():
        print(f"  {label:40s} {g:5.1f}x")
    print(
        "\nnote: replication makes every doc an exact {0}-clique, so the PAIR"
        "\nOUTPUT of the near-dup finders grows ~{0}^2/2 x by construction —"
        "\nfor those rows compare time growth against ~{1}x output growth,"
        "\nnot against the {0}x input growth.".format(factor, (factor * factor) // 2)
    )

    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
