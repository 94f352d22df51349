"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the scale path is
random-hyperplane LSH bucketing so candidate generation is an equi-join on
bucket signature instead of a full cross product.

Everything is built-in higher-order functions (``zip_with`` + ``aggregate``)
— JVM-side, no Python in the hot path. Dot products accumulate in DOUBLE
left-to-right, which is deterministic and engine-reproducible.

LSH hyperplanes are *derived from md5*, not a driver-side RNG: plane p,
dimension d gets component md5(p:'':d) mapped to [-1, 1). This keeps the
index fully deterministic (same buckets on any cluster, any partitioning) and
lets an external oracle reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two equal-length arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_scale: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, keep k best per query.

    Per-query ordering is (rounded similarity desc, neighbor id asc) — a total
    order, so results are deterministic. At 100 TB the corpus side stays
    partitioned and never shuffles: the join is a broadcast nested loop and
    the only shuffle is the per-query top-k aggregation.
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_scale).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("__rn").alias("rank"))
    )


# ----------------------------------------------------------------------
# Deterministic random-hyperplane LSH


def _plane_component(plane: int, dim_col: Column) -> Column:
    """Pseudo-random plane component in [-1, 1) from md5(plane ':' dim)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{plane}:"), dim_col.cast("string"))), 1, 8), 16, 10)
    return (h.cast("double") / F.lit(float(2**32))) * 2.0 - 1.0


def hyperplane_bucket(vec_col: Column, num_planes: int = 8) -> Column:
    """LSH bucket signature: one sign bit per hyperplane, concatenated.

    sign_p = sign( Σ_d vec[d] * plane_p[d] ) computed with aggregate over
    posexploded-free expressions (zip_with against an index sequence).
    """
    dims = F.sequence(F.lit(0), F.size(vec_col) - 1)

    def _projector(p: int):
        return lambda x, d: x * _plane_component(p, d)

    bits = []
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(_to_double(vec_col), dims, _projector(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    round_scale: int = 5,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket.

    The corpus is bucketed once (reusable as a materialized index); lookup is
    an equi-join on the bucket signature — at scale this replaces the O(N)
    scan per query with a hash-partition-local probe.
    """
    from pyspark.sql import Window

    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_scale).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("__rn").alias("rank"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 6,
    round_scale: int = 5,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing + verify.

    Pairs landing in the same bucket are scored exactly; only pairs with
    cosine ≥ threshold survive. Bucket join keeps this linear-ish in corpus
    size (all-pairs only within buckets).
    """
    b = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vid") < F.col("c.vid")))
        .select(
            F.col("a.vid").alias("a_id"),
            F.col("c.vid").alias("b_id"),
            F.round(cosine(F.col("a.vec"), F.col("c.vec")), round_scale).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
