"""Semantic pins for the r7 retrieval/curation additions beyond their
oracle gates: the cluster-aware split must actually eliminate leakage, the
medoid must be the true argmin, and recall evals must be well-formed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.plans.sampling import q147_leakage_free_split
from scraper_db_refine_merge_spark.plans.vectors import (
    _KM_ITERS,
    _KM_K,
    q146_ann_recall_eval,
    q148_truncated_dim_recall,
    q150_cluster_medoids,
)


def test_cluster_split_has_zero_leaked_pairs(spark, sf_dir):
    rows = {r["strategy"]: r for r in q147_leakage_free_split(spark, sf_dir).collect()}
    assert set(rows) == {"doc_hash", "cluster_hash"}
    assert rows["cluster_hash"]["n_leaked_pairs"] == 0
    # both strategies partition the whole corpus
    n = sum(rows["doc_hash"][c] for c in ("n_train", "n_val", "n_test"))
    nc = sum(rows["cluster_hash"][c] for c in ("n_train", "n_val", "n_test"))
    assert n == nc > 0


def test_medoid_is_true_argmin(spark, sf_dir):
    from scraper_db_refine_merge_spark.operators.similarity import (
        _to_double,
        kmeans_cells,
    )
    from scraper_db_refine_merge_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    got = {r["cell"]: r for r in q150_cluster_medoids(spark, sf_dir).collect()}
    cells = (
        kmeans_cells(e, k=_KM_K, iters=_KM_ITERS)
        .select("vec_id", _to_double(F.col("embedding")).alias("v"), "cell")
        .collect()
    )
    import math
    from collections import defaultdict

    by_cell = defaultdict(list)
    for r in cells:
        # mirror the gated arithmetic (r12): components quantize to
        # floor(x·10⁴) integers FIRST, so pair distances are exact ints
        by_cell[r["cell"]].append(
            (r["vec_id"], [math.floor(x * 10000.0) for x in r["v"]])
        )
    assert set(got) == set(by_cell)
    for cell, members in by_cell.items():
        best = None
        for aid, av in members:
            # direct quadratic enumeration — the identity-free baseline
            # (q150's Spark side uses n·‖a‖² + S2 − 2·a·S1; exact-integer
            # agreement here re-proves the identity independently of the
            # DuckDB oracle)
            tot = 0
            for _, bv in members:
                tot += sum((x - y) * (x - y) for x, y in zip(av, bv))
            if best is None or (tot, aid) < best:
                best = (tot, aid)
        assert (got[cell]["sum_d2q"], got[cell]["medoid_id"]) == best
        assert got[cell]["n_vectors"] == len(members)


def test_recall_evals_well_formed(spark, sf_dir):
    for q in (q146_ann_recall_eval, q148_truncated_dim_recall):
        rows = q(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert r["n_exact"] == 5
            assert 0 <= r["n_overlap"] <= r["n_exact"]
            assert r["recall_bp"] == (10000 * r["n_overlap"]) // r["n_exact"]


# Calibrated from RECALL_r10.json: both pipelines recover the PLANTED
# neighbor set completely (10000 bp) at sf0.001/sf0.01/sf0.1. The floor is
# 8000 — one lost neighbor of five survives (data-regeneration headroom),
# but a real regression (mis-bucketing, broken slice/fold, wrong tie-break)
# lands at or near 0 and flips red. The natural-data recall of q146/q148
# stays UNGATED by design: the synthetic embeddings are near-uniform, so
# natural recall measures the data (~0), not the operator — see
# tools/gen_recall.py's module note and test_pq.py's planted rationale.
_PLANTED_FLOOR_BP = 8000


def test_planted_recall_floor(spark, sf_dir):
    """VERDICT r9 item 5: an LSH or truncation regression that halves
    recall must flip a test red. Floor-gated on the planted corpus where
    exact top-5 is the known planted set."""
    from tools.gen_recall import planted_recall_bp

    got = planted_recall_bp(spark, sf_dir)
    for pipeline in ("lsh", "trunc16"):
        per_q = got[pipeline]
        assert set(per_q) == set(range(5))
        assert min(per_q.values()) >= _PLANTED_FLOOR_BP, (pipeline, per_q)


# Calibrated from the clustered evals at sf0.001 (8 centroids), means
# measured r12: alpha=0.5 — LSH 2800 bp, trunc16 2400 bp; alpha=0.35 (the
# harder rung, weaker cluster signal) — LSH 1200 bp, trunc16 2400 bp.
# Deterministic pipelines make these exact constants per SF; each floor
# leaves two-neighbor headroom (800 bp of mean) below the measured value
# for data-regeneration drift. The CEILING (< 10000) is as load-bearing as
# the floor — it asserts the eval has not saturated, i.e. a partial
# regression still has room to move the number (the whole point of this
# family; the planted eval is the all-or-nothing gate).
_CLUSTERED_FLOORS_BP = {
    # (alpha, family) -> mean floor
    (0.5, "lsh"): 2000,
    (0.5, "trunc16"): 1600,
    (0.35, "lsh"): 400,
    (0.35, "trunc16"): 1600,
}


@pytest.mark.parametrize("alpha", [0.5, 0.35])
def test_clustered_recall_band(spark, sf_dir, alpha):
    """VERDICT r10 item 4 + r11 item 3: the natural eval has no
    sensitivity (uniform data, recall 0 by construction) and the planted
    eval saturates at 10000 — a PARTIAL regression was invisible to both.
    The clustered interpolation must land strictly inside (0, 10000) and
    above the calibrated floor, for BOTH ANN families (LSH bucketing and
    Matryoshka-style 16-dim truncation) at BOTH mixing rungs."""
    from tools.gen_recall import clustered_recall_bp

    got = clustered_recall_bp(spark, sf_dir, alpha=alpha)
    for family in ("lsh", "trunc16"):
        per_q = got[family]
        assert set(per_q) == set(range(5))
        mean_bp = sum(per_q.values()) / len(per_q)
        floor = _CLUSTERED_FLOORS_BP[(alpha, family)]
        assert floor <= mean_bp < 10000, (alpha, family, per_q)
