"""Recall trend artifact (VERDICT r7/r9 item: recall floors): runs the ANN
quality evals — q146 (LSH recall@5 vs exact) and q148 (truncated-dim
recall@5 vs exact) — at sf0.001 / sf0.01 / sf0.1 and writes
RECALL_r{N}.json with per-query recall_bp plus min/mean per (query, sf).

Every pipeline under eval is fully deterministic (md5 hyperplanes,
5-dp-rounded cosine, id tie-breaks), so these numbers are exact constants
per SF: the committed artifact is a TREND LINE, and
tests/test_retrieval_quality.py pins floors — an LSH or codebook
regression that drops recall flips the suite red instead of sliding
silently.

TWO recall families, because the synthetic embeddings are near-uniform
(true-neighbor cosines ~0 with a flat spectrum — see
tests/test_pq.py::test_planted_near_copy_is_rank1's data note):

- ``natural``: q146/q148 as registered — recall of LSH / truncated-dim
  retrieval against exact top-5 on the raw tables. On uniform data this
  is ~0 BY CONSTRUCTION (there is no neighborhood structure to recover);
  it is recorded for the trend, not gated.
- ``planted``: each query gets 5 deterministic near-copies injected into
  the corpus (dim-0 bumped by (j+1)·1e-4), making exact top-5 = the
  planted set. Recall of the SAME retrieval pipelines on this corpus
  measures the OPERATOR (bucket collision of near-identical vectors,
  prefix-dominance under truncation) — this is the floor-gated number.

- ``clustered`` (r11, VERDICT r10 item 4): the planted eval saturates at
  10000 bp (all-or-nothing), and the natural eval sits at 0 — neither
  moves when LSH quality degrades PARTIALLY. This family interpolates:
  every vector is deterministically pulled halfway toward one of 8
  md5-derived cluster centroids (v' = (1-α)·v + α·c[vec_id mod 8],
  α = 0.5), giving the corpus real-but-imperfect neighborhood structure.
  Measured recall lands strictly inside (0, 10000) at every SF
  (sf0.001 ≈ 2800 bp mean, sf0.01 ≈ 6000, sf0.1 ≈ 8000), so a partial
  LSH regression (one lost plane, a biased bucket) MOVES the number —
  this is the band-gated sensitivity eval
  (tests/test_retrieval_quality.py::test_clustered_recall_band).

Usage: PYTHONPATH=. python tools/gen_recall.py <round>   # e.g. r10
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}
EVALS = ("q146_ann_recall_eval", "q148_truncated_dim_recall")


def planted_corpus(spark, sf_dir: str):
    """(corpus, queries): the sf embeddings plus 5 deterministic near-copies
    of each query (vec_id q + 1M·(j+1), dim-0 bumped by (j+1)·1e-4) — exact
    cosine top-5 per query is exactly the planted set, so recall of any
    approximate pipeline against it measures the operator, not the data."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 5)

    def bumped(b: float):
        return F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(b)).otherwise(F.lit(0.0)),
        )

    corpus = e
    for j in range(5):
        corpus = corpus.unionByName(
            qs.select(
                (F.col("vec_id") + 1_000_000 * (j + 1)).alias("vec_id"),
                bumped(0.0001 * (j + 1)).alias("embedding"),
                "label",
            )
        )
    return corpus, qs


#: Clustered-eval mixing weight: 0.5 puts recall mid-band at every SF
#: (see module docstring); raising it saturates toward 10000, lowering it
#: collapses toward the natural eval's 0.
CLUSTER_ALPHA = 0.5
N_CLUSTERS = 8


def clustered_corpus(e, alpha: float = CLUSTER_ALPHA, n_clusters: int = N_CLUSTERS):
    """Deterministic clustered VARIANT of an embeddings frame: each vector
    is mixed toward the centroid of cluster ``vec_id mod n_clusters``;
    centroid components are xxhash64-derived values in [-1, 1] (pure row
    expressions — no data-dependent state, no rand(), reproducible on any
    engine)."""
    cent = (
        "CAST(pmod(xxhash64(concat('clu', CAST(pmod(vec_id, {c}) AS STRING),"
        " ':', CAST(i AS STRING))), 2001) - 1000 AS DOUBLE)/1000.0"
    ).format(c=n_clusters)
    return e.selectExpr(
        "vec_id",
        "label",
        "transform(embedding, (x, i) -> CAST((1.0 - {a}) * x + {a} * ({cent})"
        " AS FLOAT)) AS embedding".format(a=alpha, cent=cent),
    )


def clustered_recall_bp(
    spark, sf_dir: str, alpha: float = CLUSTER_ALPHA
) -> dict[str, dict[int, int]]:
    """Per-query recall_bp of the LSH index and 16-dim truncated retrieval
    on the clustered corpus — the band-gated sensitivity numbers (the
    pipelines and eval arithmetic are exactly q146/q148's; only the corpus
    differs). ``alpha`` selects the rung: 0.5 is the original mid-band
    eval; 0.35 (r12, VERDICT r11 item 3) is the harder rung — weaker
    cluster signal, so recall sits lower and a partial regression has even
    more room to move the number."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )
    from scraper_db_refine_merge_spark.sources.tables import load_table

    corpus = clustered_corpus(load_table(spark, sf_dir, "embeddings"), alpha=alpha)
    qs = corpus.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(corpus, qs, k=5).collect()}

    def recall(approx_df) -> dict[int, int]:
        approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
        out = {}
        for q in range(5):
            ex = {n for (qq, n) in exact if qq == q}
            ov = len(ex & {n for (qq, n) in approx if qq == q})
            out[q] = (10000 * ov) // max(len(ex), 1)
        return out

    ct = corpus.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    qt = qs.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    return {
        "lsh": recall(lsh_topk(corpus, qs, k=5)),
        "trunc16": recall(cosine_topk(ct, qt, k=5)),
    }


def planted_recall_bp(spark, sf_dir: str) -> dict[str, dict[int, int]]:
    """Per-query recall_bp of the LSH index and 16-dim truncated retrieval
    on the planted corpus — the floor-gated operator-quality numbers."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )

    corpus, qs = planted_corpus(spark, sf_dir)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(corpus, qs, k=5).collect()}

    def recall(approx_df) -> dict[int, int]:
        approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
        out = {}
        for q in range(5):
            ex = {n for (qq, n) in exact if qq == q}
            ov = len(ex & {n for (qq, n) in approx if qq == q})
            out[q] = (10000 * ov) // max(len(ex), 1)
        return out

    ct = corpus.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    qt = qs.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    return {
        "lsh": recall(lsh_topk(corpus, qs, k=5)),
        "trunc16": recall(cosine_topk(ct, qt, k=5)),
    }


def capped_pair_recall_bp(
    spark,
    sf_dir: str,
    planes_list=(6, 8, 10),
    m: int = 3,
    threshold: float = 0.4,
) -> dict:
    """PAIR recall of the bucketed cosine near-dup emitter — uncapped vs
    the m-successor cap — against the exact brute-force pair set, swept
    over ``num_planes`` (r13, ROADMAP 13m(b)): the cap trades recall for
    bounded output, and more planes shrink buckets so fewer non-dup
    colliders interleave between true dups. The clustered corpus gives
    the eval real-but-imperfect near-dup structure (the same rationale as
    the clustered recall family).

    Reported per planes rung: PAIR recall (the cap intentionally emits
    ~c·m of a c-clique's c²/2 pairs, so this collapses on big cliques by
    DESIGN) and — the operative number — CLUSTER agreement: the fraction
    of paired docs whose connected-components cluster is identical under
    capped vs uncapped pairs. High cluster agreement with low pair recall
    is the cap working as specified."""
    from scraper_db_refine_merge_spark.operators.graph import dup_clusters
    from scraper_db_refine_merge_spark.operators.similarity import (
        brute_force_near_dup_pairs,
        cosine_near_dup_pairs,
    )
    from scraper_db_refine_merge_spark.sources.tables import load_table

    spark_sess = spark

    def _clusters(pair_set) -> dict:
        if not pair_set:
            return {}
        pdf = spark_sess.createDataFrame(
            sorted(pair_set), "a_id long, b_id long"
        )
        return {
            r["doc_id"]: r["cluster_id"] for r in dup_clusters(pdf).collect()
        }

    from scraper_db_refine_merge_spark.operators import _cache

    corpus = clustered_corpus(load_table(spark, sf_dir, "embeddings"))
    exact = {
        (r["a_id"], r["b_id"])
        for r in brute_force_near_dup_pairs(corpus, threshold=threshold).collect()
    }
    out: dict = {"m": m, "threshold": threshold, "exact_pairs": len(exact)}
    # r14 (VERDICT r13 item 1): the "auto" rung — num_planes resolved from
    # the corpus count by adaptive_num_planes, no manual tuning. The gate:
    # cluster agreement ≥ 9900 bp at every SF.
    for p in list(planes_list) + ["auto"]:
        unc = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs(
                corpus, threshold=threshold, num_planes=p
            ).collect()
        }
        cap = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs(
                corpus, threshold=threshold, num_planes=p, max_bucket_successors=m
            ).collect()
        }
        # ADVICE r13: each emitter persists its bucket/candidate tables —
        # six builds per SF would otherwise pin caches for the whole sweep
        # and executor memory grows monotonically across the recall run.
        _cache.release_caches()
        denom = max(len(exact), 1)
        cu, cc = _clusters(unc), _clusters(cap)
        docs = set(cu) | set(cc)
        agree = sum(1 for d in docs if cu.get(d) == cc.get(d))
        out[f"planes{p}"] = {
            "uncapped_pairs": len(unc),
            "capped_pairs": len(cap),
            "uncapped_recall_bp": 10000 * len(unc & exact) // denom,
            "capped_recall_bp": 10000 * len(cap & exact) // denom,
            "cluster_agreement_bp": 10000 * agree // max(len(docs), 1),
        }
        if p == "auto":
            from scraper_db_refine_merge_spark.operators.similarity import (
                adaptive_num_planes,
                corpus_count,
            )

            out["planesauto"]["resolved_planes"] = adaptive_num_planes(
                corpus_count(corpus)
            )
    # r14: tables sweep at auto width — the measurement num_tables
    # adaptivity would need (ROADMAP r14 candidate): OR-amplification is
    # the only recall lever once the width is occupancy-pinned, and its
    # cost is one more corpus bucket pass per table.
    for t in (2, 4, 8):
        if t == 4:
            # identical emitter to the planes loop's capped 'auto' rung
            # (default num_tables=4) — reuse instead of a third full
            # bucket-build + verify pipeline per SF
            out["tables4_auto"] = {
                "capped_pairs": out["planesauto"]["capped_pairs"],
                "capped_recall_bp": out["planesauto"]["capped_recall_bp"],
            }
            continue
        cap = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs(
                corpus, threshold=threshold, num_planes="auto", num_tables=t,
                max_bucket_successors=m,
            ).collect()
        }
        _cache.release_caches()
        denom = max(len(exact), 1)
        out[f"tables{t}_auto"] = {
            "capped_pairs": len(cap),
            "capped_recall_bp": 10000 * len(cap & exact) // denom,
        }
    # r15 (VERDICT r14 item 6): the EQUAL-COST policy rung. Pin the width
    # at the policy's first doubling (uncapped occupancy point + the
    # doubling constant — the bucket-miss regime) and spend the same budget
    # T·m = 24 two ways: the policy's allocation (more tables, base
    # successor depth) vs the fixed default's (4 tables, deeper
    # successors). The policy must win HERE — while at the occupancy point
    # itself it deliberately stays at the base (where the same budget is
    # measurably better spent on depth; see adaptive_num_tables).
    from scraper_db_refine_merge_spark.operators.similarity import (
        ADAPTIVE_TABLES_DOUBLING_PLANES,
        adaptive_num_planes,
        adaptive_num_tables,
        corpus_count,
    )

    n = corpus_count(corpus)
    p_pin = adaptive_num_planes(n, hi=1 << 30) + ADAPTIVE_TABLES_DOUBLING_PLANES
    t_policy = adaptive_num_tables(n, p_pin)
    budget = t_policy * m
    denom = max(len(exact), 1)
    rung: dict = {"pinned_planes": p_pin, "budget": budget}
    for label, tt, mm in (
        ("policy", t_policy, m),
        ("fixed", 4, budget // 4),
    ):
        cap = {
            (r["a_id"], r["b_id"])
            for r in cosine_near_dup_pairs(
                corpus, threshold=threshold, num_planes=p_pin, num_tables=tt,
                max_bucket_successors=mm,
            ).collect()
        }
        _cache.release_caches()
        rung[label] = {
            "num_tables": tt,
            "m": mm,
            "capped_pairs": len(cap),
            "capped_recall_bp": 10000 * len(cap & exact) // denom,
        }
    out["tables_policy_equal_cost"] = rung
    return out


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "rX"
    from scraper_db_refine_merge_spark.plans.catalog import QUERIES
    from scraper_db_refine_merge_spark.session import get_spark

    spark = get_spark("gen_recall")
    doc: dict = {"evals": {}, "planted": {}}
    for name in EVALS:
        doc["evals"][name] = {}
        for sf, sf_dir in SF_DIRS.items():
            rows = sorted(
                (r["query_id"], r["recall_bp"])
                for r in QUERIES[name](spark, sf_dir).collect()
            )
            bps = [bp for _, bp in rows]
            doc["evals"][name][sf] = {
                "per_query_bp": dict(rows),
                "min_bp": min(bps),
                "mean_bp": round(sum(bps) / len(bps), 1),
            }
            print(f"{name} {sf}: min {min(bps)} mean {doc['evals'][name][sf]['mean_bp']}")
    for sf, sf_dir in SF_DIRS.items():
        pr = planted_recall_bp(spark, sf_dir)
        doc["planted"][sf] = {
            k: {"per_query_bp": v, "min_bp": min(v.values())} for k, v in pr.items()
        }
        print(f"planted {sf}: " + " ".join(f"{k} min {min(v.values())}" for k, v in pr.items()))
    # Two rungs (r12, VERDICT r11 item 3): the original alpha=0.5 section
    # keeps its key for artifact continuity; "clustered_a35" is the harder
    # rung. Both families (LSH and trunc16) are floor-gated on both rungs
    # at sf0.001 in tests/test_retrieval_quality.py.
    for key, alpha in (("clustered", CLUSTER_ALPHA), ("clustered_a35", 0.35)):
        doc[key] = {"alpha": alpha, "n_clusters": N_CLUSTERS}
        for sf, sf_dir in SF_DIRS.items():
            cr = clustered_recall_bp(spark, sf_dir, alpha=alpha)
            doc[key][sf] = {
                k: {
                    "per_query_bp": v,
                    "min_bp": min(v.values()),
                    "mean_bp": round(sum(v.values()) / len(v), 1),
                }
                for k, v in cr.items()
            }
            print(
                f"{key} {sf}: "
                + " ".join(f"{k} mean {sum(v.values()) / len(v):.0f}" for k, v in cr.items())
            )
    # r13: the cap-vs-recall trade, measurable (ROADMAP 13m(b))
    doc["capped_pairs"] = {}
    for sf, sf_dir in SF_DIRS.items():
        cp = capped_pair_recall_bp(spark, sf_dir)
        doc["capped_pairs"][sf] = cp
        print(
            f"capped_pairs {sf}: exact {cp['exact_pairs']} "
            + " ".join(
                f"p{p}: unc {cp[f'planes{p}']['uncapped_recall_bp']}"
                f"/cap {cp[f'planes{p}']['capped_recall_bp']}"
                f"/agree {cp[f'planes{p}']['cluster_agreement_bp']}"
                for p in (6, 8, 10, "auto")
            )
        )
    out = os.path.join(ROOT, f"RECALL_{rnd}.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
