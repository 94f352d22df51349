"""q142 shard-export manifest + q143 contamination overlap: the manifest
must be invariant to input partitioning (the reproducible-export property),
shards must be balanced and cover the corpus exactly once, and the overlap
report must agree with a brute-force recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.plans.sampling import (
    _N_SHARDS,
    hash_unit,
    q142_shard_export_manifest,
    q143_contamination_overlap,
)
from scraper_db_refine_merge_spark.sources.tables import load_table


def test_shard_manifest_partitioning_invariant(spark, sf_dir, monkeypatch):
    base = q142_shard_export_manifest(spark, sf_dir).collect()

    # same query over a repartitioned/reordered load: identical manifest
    # (fingerprint is a commutative sum; permutation+ntile are md5-ordered)
    import scraper_db_refine_merge_spark.plans.sampling as sampling

    orig = sampling.load_table

    def scrambled(s, d, name):
        df = orig(s, d, name)
        return df.repartition(7, "lang") if name == "documents" else df

    monkeypatch.setattr(sampling, "load_table", scrambled)
    scram = q142_shard_export_manifest(spark, sf_dir).collect()
    assert sorted(map(tuple, scram)) == sorted(map(tuple, base))


def test_shard_manifest_balanced_exact_cover(spark, sf_dir):
    rows = {r["shard"]: r for r in q142_shard_export_manifest(spark, sf_dir).collect()}
    n_total = load_table(spark, sf_dir, "documents").count()
    assert set(rows) == set(range(1, _N_SHARDS + 1))
    # ntile balance: sizes differ by at most 1, first shards get the extras
    sizes = [rows[s]["n_docs"] for s in sorted(rows)]
    q, r = divmod(n_total, _N_SHARDS)
    assert sizes == [q + 1] * r + [q] * (_N_SHARDS - r)
    # contiguous exact cover of the global index space [1, n_total]
    spans = sorted((rows[s]["first_idx"], rows[s]["last_idx"]) for s in rows)
    assert spans[0][0] == 1 and spans[-1][1] == n_total
    for (_, last), (nxt, _) in zip(spans, spans[1:]):
        assert nxt == last + 1
    assert sum(r_["n_docs"] for r_ in rows.values()) == n_total


def test_contamination_overlap_matches_bruteforce(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_matched"], r["overlap_bucket"], r["contaminated"])
        for r in q143_contamination_overlap(spark, sf_dir).collect()
    }

    from scraper_db_refine_merge_spark.operators.dedup import word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", k=5).select(
        "doc", hash_unit(F.col("doc")).alias("u"), "shingle"
    )
    rows = sh.collect()
    train = {r["shingle"] for r in rows if r["u"] < 0.8}
    ev: dict[str, set] = {}
    for r in rows:
        if r["u"] >= 0.9:
            ev.setdefault(r["doc"], set()).add(r["shingle"])
    assert set(got) == set(ev) and len(got) > 0
    for doc, shingles in ev.items():
        n, m = len(shingles), len(shingles & train)
        assert got[doc] == (n, m, (10 * m) // n, m > 0)
