"""Embedding similarity queries over the ``embeddings`` table.

Parity notes: dot products / norms accumulate in DOUBLE in array order on
both engines; similarities are rounded to 5 decimals before ranking so the
per-query ordering (sim desc, neighbor id asc) is a total order computed on
identical values. Centroids use exact DECIMAL sums (order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_topk, lsh_topk
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_SQL_DOT = (
    "list_sum(list_transform(range(1, len(qv) + 1), "
    "i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))"
)
_SQL_QNORM = (
    "sqrt(list_sum(list_transform(range(1, len(qv) + 1), "
    "i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))"
)
_SQL_CNORM = (
    "sqrt(list_sum(list_transform(range(1, len(cv) + 1), "
    "i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))"
)


# --------------------------------------------------------------------------
# q28 — brute-force cosine top-k: the ANN correctness baseline.
@_register(
    "q28_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               ROUND({_SQL_DOT} / ({_SQL_QNORM} * {_SQL_CNORM}), 5) AS cosine_sim
        FROM q, c
        WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rn AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def q28_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return cosine_topk(e, queries, k=5)


# --------------------------------------------------------------------------
# q29 — per-label centroids (exact decimal mean per dimension).
@_register(
    "q29_label_centroids",
    """
    SELECT label, pos,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*), 6) AS centroid_val
    FROM (
        SELECT label,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS val
        FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def q29_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(
                F.sum(F.col("val").cast("double").cast("decimal(18,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("centroid_val")
        )
    )


# --------------------------------------------------------------------------
# q30 — LSH-bucketed approximate top-k (the scale path; no SQL oracle —
# bucket signatures come from md5-derived hyperplanes, portable-SQL-hostile;
# correctness is unit-tested against the brute-force baseline instead).
@_register("q30_lsh_topk")
def q30_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return lsh_topk(e, queries, k=5)
