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
from scraper_db_refine_merge_spark.operators.similarity import (  # noqa: E402
    cosine_near_dup_pairs,
    lsh_topk,
)
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


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-smoke")
    os.makedirs(SCRATCH, exist_ok=True)

    docs_path, n_docs = replicate(spark, "documents", "doc_id", factor)
    vecs_path, n_vecs = replicate(spark, "embeddings", "vec_id", factor)
    docs = spark.read.parquet(docs_path)
    vecs = spark.read.parquet(vecs_path)
    print(f"\ncorpus: {n_docs} docs, {n_vecs} vectors (sf0.1 x{factor})\n")

    base_docs = load_table(spark, BASE, "documents")
    base_vecs = load_table(spark, BASE, "embeddings")

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
            "lsh_topk(5 queries)",
            lambda: lsh_topk(base_vecs, base_vecs.filter(F.col("vec_id") < 5), k=5).count(),
            lambda: lsh_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=5).count(),
        ),
    ]:
        small()  # warm codegen
        t1 = timed(f"{label} @1x", small)
        tN = timed(f"{label} @{factor}x", big)
        results[label] = tN / max(t1, 1e-9)

    print("\ngrowth factors (time@Nx / time@1x; corpus grew {}x):".format(factor))
    for label, g in results.items():
        print(f"  {label:40s} {g:5.1f}x")

    shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
