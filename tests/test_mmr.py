"""mmr_rerank: diversification must actually reorder (a near-duplicate of
the top hit is deferred in favor of a diverse candidate), pos 1 is the
plain-relevance winner, and k > |candidates| degrades gracefully."""

from __future__ import annotations

from scraper_db_refine_merge_spark.operators.similarity import mmr_rerank


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_mmr_defers_near_duplicate(spark):
    # c2 = 2·c1 (cosine-identical direction, pairwise sim 1.0); c3 is as
    # relevant as c1 but diverse. Plain top-k: [1, 2, 3] (tie on rounded
    # rel, id asc). MMR step 2: score(c2) = .7·.98058 − .3·1.0 < score(c3)
    # = .7·.98058 − .3·.92308 → [1, 3, 2].
    corpus = _df(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.2, 0.0, 0.0]),
            (2, [2.0, 0.4, 0.0, 0.0]),
            (3, [1.0, -0.2, 0.0, 0.0]),
        ],
    )
    queries = corpus.filter("vec_id = 0")
    got = mmr_rerank(corpus, queries, k=3, n_candidates=3)
    rows = sorted(got.collect(), key=lambda r: r["pos"])
    assert [r["neighbor_id"] for r in rows] == [1, 3, 2]
    assert [r["pos"] for r in rows] == [1, 2, 3]
    # pos 1 is the plain-relevance argmax (tie → smallest id)
    assert rows[0]["relevance"] == max(r["relevance"] for r in rows)


def test_mmr_short_candidate_list(spark):
    corpus = _df(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.5, 0.5]),
            (2, [0.0, 1.0]),
        ],
    )
    got = mmr_rerank(corpus, corpus.filter("vec_id = 0"), k=8, n_candidates=20)
    rows = sorted(got.collect(), key=lambda r: r["pos"])
    # only 2 candidates exist: the fold stops, no NULL padding
    assert [r["pos"] for r in rows] == [1, 2]
    assert {r["neighbor_id"] for r in rows} == {1, 2}
    assert all(r["neighbor_id"] is not None for r in rows)
