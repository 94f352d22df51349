"""Corpus n-gram language-model quality scoring (r6).

Pretraining pipelines (CCNet, Gopher/MassiveText, RefinedWeb) filter
documents by language-model fluency — a KenLM perplexity in the
published versions. This module is the Spark-native, ORACLE-EXACT form of
that modality: a bigram LM with add-one smoothing trained on the corpus
itself, scoring each document by its mean smoothed bigram probability.

Why mean probability instead of perplexity: perplexity needs ln(), and
ln() is not cross-engine bit-stable (the documented divergence that shaped
q87's N/df rarity weight — ROADMAP gotchas). The mean conditional
probability is a monotone-enough fluency signal for FILTERING (gibberish
and boilerplate sit at the extremes either way), while staying exact: each
bigram occurrence scores

    unit = floor( (c(w1,w2) + 1) * SCALE / (c(w1·) + V) )

— pure BIGINT arithmetic (``div``), order-independent, identical in Spark
and DuckDB — and a document's score is ``floor(sum(unit) / n_bigrams)``.
Since c(w1,w2) ≤ c(w1·), unit ≤ SCALE always fits a long; the
intermediate product stays under 2^63 while no single bigram type exceeds
~9.2e9 occurrences. Beyond that corpus size, lift the product into
DECIMAL(38,0)/HUGEINT on both engines — and note Spark's decimal division
rounds half-up at its result scale BEFORE floor(), so the decimal variant
must divide with enough extra scale digits to make that rounding
innocuous.

Scale shape: one token-pair explode (narrow map), two corpus count tables
built with map-side partial aggregation, equi-joins back on the bigram /
prefix keys. No hints: the count tables are vocabulary-sized and grow with
the corpus — AQE decides. Hot bigrams ("of the") concentrate COUNT rows
one per key, so the join's build side has no skew; the probe side's skew
is benign (no per-key state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

LM_SCALE = 1_000_000_000  # 1e9: unit = smoothed probability in nano-probs


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, w1, w2): every adjacent token pair, duplicates preserved
    (counts are LM statistics, not a set). Zero-shuffle narrow map."""
    tokenized = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    idx = F.when(F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"), F.element_at(toks, i + 2).alias("w2")
        ),
    )
    return tokenized.select("doc", F.explode(pairs).alias("p")).select(
        "doc", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, scale: int = LM_SCALE
) -> DataFrame:
    """(doc_id, n_bigrams, lm_score): mean add-one-smoothed bigram
    probability per document, in integer ``scale``-ths (nano-probabilities
    at the default) — the corpus-trained fluency score.

    V = distinct tokens in the corpus (the smoothing vocabulary).
    """
    bi = doc_bigrams(df, id_col, text_col)
    c12 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    toks = df.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w")
    )
    v = toks.agg(F.count_distinct("w").alias("v"))
    unit = F.expr(f"((c12 + 1) * {scale}L) div (c1 + v)")
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(v)  # 1-row corpus constant
        .select("doc", unit.alias("unit"))
    )
    return scored.groupBy(F.col("doc").alias("doc_id")).agg(
        F.count("*").alias("n_bigrams"),
        F.expr("sum(unit) div count(*)").cast("long").alias("lm_score"),
    )
