"""Connected components (operators/graph.py): correctness on known
topologies, convergence on chains (pointer-jumping), cluster rollup."""

from __future__ import annotations

import pytest

from scraper_db_refine_merge_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def _cc(spark, pairs, max_iter=25):
    edges = spark.createDataFrame(pairs, "a long, b long")
    got = connected_components(edges, "a", "b", max_iter=max_iter)
    return {r["node"]: r["component"] for r in got.collect()}


def test_two_components(spark):
    labels = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cc_reliable_checkpoint_path_when_dir_configured(spark, tmp_path):
    """r11: with a checkpoint dir configured (the production deployment
    contract), every CC round materializes via reliable checkpoint() —
    files land under the dir and results are unchanged. Mirrors
    test_ranking's reliable-path test; restore uses the same guarded
    reflection (no public unset API)."""
    import glob
    import os

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "suite default must be the local fallback"
    ckpt = str(tmp_path / "ckpt_cc")
    sc.setCheckpointDir(ckpt)
    try:
        labels = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
        written = [
            f for f in glob.glob(os.path.join(ckpt, "**"), recursive=True)
            if os.path.isfile(f)
        ]
        assert written, "reliable checkpoint path wrote nothing under the dir"
    finally:
        try:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        except Exception as exc:  # noqa: BLE001 — diagnose, then fail loudly
            pytest.fail(
                "could not restore the no-checkpoint-dir state via the JVM "
                f"setter checkpointDir_$eq ({exc!r}); see test_ranking's note."
            )
        assert sc.getCheckpointDir() is None


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path has diameter 63; pointer jumping must close it well
    # within 25 rounds (min-propagation alone would need 63)
    labels = _cc(spark, [(i, i + 1) for i in range(64)])
    assert set(labels.values()) == {0}
    assert len(labels) == 65


def test_clique_and_singleton_edge(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(100, 101)]
    labels = _cc(spark, pairs)
    assert all(labels[n] == 0 for n in range(5))
    assert labels[100] == labels[101] == 100


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "a long, b long")
    assert connected_components(edges, "a", "b").count() == 0


def test_max_iter_guard(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(64)], "a long, b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(edges, "a", "b", max_iter=1)


def test_dup_clusters_rollup(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
    assert rows[1]["cluster_size"] == 3
    assert rows[7]["cluster_size"] == 2


def test_pagerank_fixed_point_invariants(spark):
    """Exact-integer PageRank on a known graph: run-to-run determinism
    bit-for-bit, hubs outrank leaves, and total mass stays ≤ scale (div
    truncation only ever loses mass, never creates it)."""
    from scraper_db_refine_merge_spark.operators.graph import pagerank_fixed_point

    # star: hub 0 ↔ leaves 1..9, plus a 10↔11 pendant pair
    pairs = [(0, i) for i in range(1, 10)] + [(10, 11)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    r1 = {r["node"]: r["rank_scaled"] for r in pagerank_fixed_point(edges, iterations=3).collect()}
    r2 = {r["node"]: r["rank_scaled"] for r in pagerank_fixed_point(edges, iterations=3).collect()}
    assert r1 == r2  # bit-identical across runs
    assert r1[0] > r1[1]  # the hub dominates its leaves
    assert all(r1[1] == r1[i] for i in range(2, 10))  # symmetric leaves tie
    assert sum(r1.values()) <= 1_000_000_000_000


@pytest.mark.slow
def test_fold_components_equals_full_recompute(spark, tmp_path):
    """Incremental fold invariant: folding pair batches one at a time into
    the stored assignment gives exactly the from-scratch components over
    the concatenated pair history — including the hard case where a later
    batch MERGES two previously-separate clusters through a bridge edge."""
    from scraper_db_refine_merge_spark.operators.graph import (
        connected_components,
        fold_components,
    )

    batches = [
        [(1, 2), (2, 3), (10, 11)],          # two clusters: {1,2,3}, {10,11}
        [(20, 21), (21, 22)],                # a third cluster
        [(3, 10), (22, 23)],                 # bridge merges {1,2,3}+{10,11}
    ]
    target = str(tmp_path / "components")
    seen: list = []
    for batch in batches:
        seen += batch
        df = spark.createDataFrame(batch, "a_id long, b_id long")
        folded = fold_components(spark, target, df)
        full = connected_components(
            spark.createDataFrame(seen, "a_id long, b_id long"), "a_id", "b_id"
        )
        got = sorted(tuple(r) for r in folded.collect())
        want = sorted(tuple(r) for r in full.select("node", "component").collect())
        assert got == want, (batch, got, want)


def test_fold_components_preserves_singletons(spark, tmp_path):
    """A singleton component in the prior store (node == component, e.g.
    from a self-pair) must survive a refresh that folds unrelated pairs
    (ADVICE r4: the old node != component star filter silently dropped
    them)."""
    from scraper_db_refine_merge_spark.operators.graph import fold_components

    target = str(tmp_path / "components")
    # batch 1 includes a self-pair → node 99 is a singleton component
    b1 = spark.createDataFrame([(1, 2), (99, 99)], "a_id long, b_id long")
    folded = {r["node"]: r["component"] for r in fold_components(spark, target, b1).collect()}
    assert folded[99] == 99
    # batch 2 touches only other nodes — 99 must still be in the store
    b2 = spark.createDataFrame([(5, 6)], "a_id long, b_id long")
    folded = {r["node"]: r["component"] for r in fold_components(spark, target, b2).collect()}
    assert folded == {1: 1, 2: 1, 5: 5, 6: 5, 99: 99}


@pytest.mark.slow
def test_capped_pair_emitters_keep_cliques_connected(spark):
    """VERDICT r12 item 4: the output-capped candidate generators bound a
    dup-clique's pairs at c·m per band/bucket (not c²/2) while the
    successor CHAIN keeps the clique connected — on this collider-free
    fixture (every bucket is either all-dups or all-unrelated), capped
    clustering equals uncapped clustering; interleaved verification-
    failing colliders can split chains (the documented recall trade)."""
    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.operators import dedup as dd
    from scraper_db_refine_merge_spark.operators.graph import dup_clusters

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(8)]
        + [(100 + i, f"totally unrelated document number {i} with words "
                     f"alpha beta gamma delta epsilon zeta eta theta")
           for i in range(3)],
        "doc_id long, text string",
    )
    capped = dd.minhash_dedup_pairs(
        docs, "doc_id", "text", k=5, threshold=0.4, max_band_successors=2
    ).select("a_id", "b_id")
    full = dd.minhash_dedup_pairs(
        docs, "doc_id", "text", k=5, threshold=0.4
    ).select("a_id", "b_id")
    # the 8-clique: capped emits at most c·m·n_bands pairs, full emits c²/2
    assert capped.count() < full.count() == 28
    cc_capped = {
        (r["doc_id"], r["cluster_id"]) for r in dup_clusters(capped).collect()
    }
    cc_full = {
        (r["doc_id"], r["cluster_id"]) for r in dup_clusters(full).collect()
    }
    assert cc_capped == cc_full  # same clusters, fraction of the pairs


@pytest.mark.slow
def test_capped_emitter_output_bound_on_mega_clique(spark):
    """The cap's asymptotic contract, directly: a 300-doc exact-dup clique
    emits ≤ c·m·n_bands capped candidate pairs (chain neighborhoods) where
    the uncapped emitter's candidate set is the full c·(c-1)/2 closure —
    and the verified-pair clustering is identical. (The 10× scale smoke
    can't show this: replication only builds 10-cliques, where 45 vs ~25
    pairs per clique is noise.)"""
    from scraper_db_refine_merge_spark.operators import dedup as dd
    from scraper_db_refine_merge_spark.operators.graph import dup_clusters

    c, m = 300, 3
    text = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(i, text) for i in range(c)], "doc_id long, text string"
    )
    sh = dd.word_shingles(docs, "doc_id", "text", 5)
    sig = dd.minhash_signatures(sh)
    capped_cand = dd.lsh_candidate_pairs_capped(sig, max_successors=m).count()
    full_cand = dd.lsh_candidate_pairs(sig).count()
    n_bands = dd.MINHASH_NUM_HASHES // dd.MINHASH_BAND_SIZE
    assert full_cand == c * (c - 1) // 2  # 44850: the quadratic closure
    assert capped_cand <= c * m * n_bands  # ≤ 3600 — linear in c
    # chain-connectivity: identical one-cluster result either way
    capped = dd.minhash_dedup_pairs(
        docs, "doc_id", "text", k=5, threshold=0.4, max_band_successors=m
    ).select("a_id", "b_id")
    cl = dup_clusters(capped).select("cluster_id", "cluster_size").distinct().collect()
    assert [(r["cluster_id"], r["cluster_size"]) for r in cl] == [(0, c)]


def test_connected_components_max_iter_one_still_converges(spark):
    """r13 self-review: the round-1 convergence-count skip must not break
    the max_iter=1 contract — a graph that converges in one round returns
    its components instead of raising."""
    from scraper_db_refine_merge_spark.operators.graph import (
        connected_components,
    )

    pairs = spark.createDataFrame([(1, 1), (5, 5)], "a_id long, b_id long")
    got = sorted(
        map(tuple, connected_components(pairs, "a_id", "b_id", max_iter=1).collect())
    )
    assert got == [(1, 1), (5, 5)]
