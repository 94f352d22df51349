"""Corpus-curation operators for LLM training data, under the oracle gate:
repetition-based quality filtering, PII redaction, sequence packing, and
chunk-level cross-corpus dedup.

These extend the reference's quality/refine layer (quality_scorer.py's
per-field heuristics) with the corpus-level filters a pretraining pipeline
runs at 100 TB. All four are native-expression / single-shuffle designs:

- q67 repetition filters: per-doc duplicate-word fraction, immediate-repeat
  count (native array exprs, zero shuffle) + top-bigram fraction (explode →
  partial-agg count, one shuffle on (doc_id, bigram)).
- q68 sequence packing: concat-and-chunk assignment via window cumsum
  (operators/packing.py; shard-parallel at scale).
- q69 PII redaction: regexp count + ordered redaction passes, md5-verified
  against the oracle's RE2 — patterns chosen to have identical semantics in
  Java regex and RE2.
- q70 chunk dedup: fixed 8-token segmentation, corpus-frequency filter,
  order-preserving reassembly (posexplode → count join → sorted re-agg) —
  the MassiveText "remove repeated passages" shape.

Oracle parity notes: tokenization = the same whitespace collapse both
sides; every ratio is integer/integer IEEE division, ROUND(x,4) as in q22;
all hashes md5; DuckDB sums cast to BIGINT (HUGEINT gotcha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import pack_bins_summary, pack_contiguous
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


# shared tokenization: collapse whitespace, lowercase, split on single space
def _toks(c) -> F.Column:
    return F.split(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")), " ")


_SQL_TOKS = "string_split(lower(regexp_replace(trim(text), '[\\s\\x0b]+', ' ', 'g')), ' ')"


# --------------------------------------------------------------------------
# q67 — Gopher-style repetition filters. dup_word_frac and immediate-repeat
# runs are per-row native array expressions (no shuffle); the top-bigram
# fraction explodes bigrams once and partial-aggregates, so the only
# shuffle carries (doc_id, bigram, partial_count).
@_register(
    "q67_repetition_filters",
    f"""
    WITH base AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    stats AS (
        SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
               ROUND(CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1), 4)
                   AS dup_word_frac,
               CAST(CASE WHEN len(t) >= 2
                    THEN len(list_filter(range(1, len(t)), i -> t[i] = t[i + 1]))
                    ELSE 0 END AS INT) AS n_immediate_repeats
        FROM base
    ),
    bi_idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM base WHERE len(t) >= 2),
    bi AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram FROM bi_idx),
    bic AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2),
    bstat AS (SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_bigram_frac
              FROM bic GROUP BY 1)
    SELECT s.doc_id, s.n_tokens, s.dup_word_frac, s.n_immediate_repeats,
           COALESCE(b.top_bigram_frac, 0.0) AS top_bigram_frac,
           (s.dup_word_frac <= 0.6 AND COALESCE(b.top_bigram_frac, 0.0) <= 0.2) AS keep
    FROM stats s LEFT JOIN bstat b USING (doc_id)
    """,
)
def q67_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc repetition quality stats over any (doc_id, text) DataFrame —
    the df-based operator behind q67 (scale-smoked in tools/scale_smoke)."""
    d = docs.select("doc_id", _toks(F.col("text")).alias("t"))
    n = F.size("t")
    stats = d.select(
        "doc_id",
        "t",
        n.alias("n_tokens"),
        F.round(
            (n - F.size(F.array_distinct("t"))).cast("double") / F.greatest(n, F.lit(1)), 4
        ).alias("dup_word_frac"),
        F.when(
            n >= 2,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.element_at(F.col("t"), i) == F.element_at(F.col("t"), i + 1),
                )
            ),
        )
        .otherwise(0)
        .cast("int")
        .alias("n_immediate_repeats"),
    )
    bigrams = stats.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
                ),
            )
        ).alias("bigram"),
    )
    bstat = (
        bigrams.groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.round(F.max("count").cast("double") / F.sum("count"), 4).alias("top_bigram_frac"))
    )
    return (
        stats.drop("t")
        .join(bstat, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_word_frac",
            "n_immediate_repeats",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            (
                (F.col("dup_word_frac") <= 0.6)
                & (F.coalesce("top_bigram_frac", F.lit(0.0)) <= 0.2)
            ).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# q68 — sequence packing (operators/packing.py): concat documents in doc_id
# order, chunk the token stream into ctx=512 windows, roll up per bin.
@_register(
    "q68_pack_sequences",
    f"""
    WITH tok AS (
        SELECT doc_id, len({_SQL_TOKS}) AS n_tok FROM documents
    ),
    w AS (
        SELECT doc_id, n_tok,
               COALESCE(CAST(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
        FROM tok WHERE n_tok > 0
    ),
    b AS (
        SELECT doc_id, n_tok, off // 512 AS first_bin,
               (off + n_tok - 1) // 512 AS last_bin
        FROM w
    )
    SELECT first_bin AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN last_bin > first_bin THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddling
    FROM b GROUP BY 1
    """,
)
def q68_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_toks(F.col("text"))).cast("long").alias("n_tok")
    )
    packed = pack_contiguous(d, "doc_id", "n_tok", ctx=512)
    return pack_bins_summary(packed, "n_tok").select(
        "bin", "n_docs", F.col("n_tokens").cast("long").alias("n_tokens"), "n_straddling"
    )


# --------------------------------------------------------------------------
# q69 — PII redaction. The synthetic corpus carries no real PII, so the
# query is an inject-then-redact harness (the standard way to validate a
# scrubber): deterministic emails/phones/reference numbers are synthesized
# from doc_id IDENTICALLY in both engines, then three ordered redaction
# passes run and md5 of the result verifies byte-exact agreement between
# Java regex and DuckDB's RE2 — patterns restricted to constructs with
# identical semantics in both (character classes, bounded/unbounded
# repetition, literal anchors; no backrefs, no lookaround).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4,}"
_DIGITS_RE = "[0-9]{4,}"


@_register(
    "q69_pii_redaction",
    f"""
    WITH b AS (
        SELECT doc_id,
               text || ' contact user.' || CAST(doc_id AS VARCHAR)
                    || '@example-mail.com tel 555-'
                    || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' ref ' || CAST(doc_id * 7919 AS VARCHAR)
                            ELSE '' END AS blob
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(blob, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(blob, '{_PHONE_RE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(blob, '{_DIGITS_RE}')) AS INT) AS n_digit_runs,
           md5(regexp_replace(regexp_replace(regexp_replace(blob,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
                   '{_DIGITS_RE}', '<DIGITS>', 'g')) AS redacted_hash
    FROM b
    """,
)
def q69_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    blob = F.concat(
        F.col("text"),
        F.lit(" contact user."),
        did.cast("string"),
        F.lit("@example-mail.com tel 555-"),
        F.lpad((did % 1000000).cast("string"), 6, "0"),
        F.when(
            did % 3 == 0, F.concat(F.lit(" ref "), (did * 7919).cast("string"))
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(blob, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _DIGITS_RE,
        "<DIGITS>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(blob, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(blob, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_count(blob, F.lit(_DIGITS_RE)).cast("int").alias("n_digit_runs"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
    )


# --------------------------------------------------------------------------
# q70 — chunk-level cross-corpus dedup (MassiveText "repeated passages"):
# segment every doc into fixed 8-token chunks, drop chunks whose corpus
# frequency exceeds 2, reassemble docs in order. posexplode → frequency
# join → ordered re-aggregation; the frequency table is keyed by chunk text
# (hash-partitioned, partial-agg), never all-pairs.
_CHUNK = 8
_FREQ_CAP = 2


@_register(
    "q70_chunk_dedup",
    f"""
    WITH base AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    ch0 AS (
        SELECT doc_id, t,
               unnest(range(0, CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS i
        FROM base
    ),
    ch AS (
        SELECT doc_id, i,
               array_to_string(t[i * {_CHUNK} + 1 : i * {_CHUNK} + {_CHUNK}], ' ') AS chunk
        FROM ch0
    ),
    f AS (SELECT chunk, COUNT(*) AS c FROM ch GROUP BY 1),
    kept AS (SELECT ch.doc_id, ch.i, ch.chunk FROM ch JOIN f USING (chunk) WHERE f.c <= {_FREQ_CAP}),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(chunk, ' ' ORDER BY i) AS new_text
        FROM kept GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(ceil(len(b.t) / {_CHUNK}.0) AS INT) AS n_chunks,
           CAST(COALESCE(a.n_kept, 0) AS INT) AS n_kept,
           md5(COALESCE(a.new_text, '')) AS new_hash
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def q70_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dedup(load_table(spark, sf_dir, "documents"))


def chunk_dedup(docs: DataFrame) -> DataFrame:
    """Chunk-level cross-corpus dedup over any (doc_id, text) DataFrame —
    the df-based operator behind q70 (scale-smoked in tools/scale_smoke)."""
    base = docs.select("doc_id", _toks(F.col("text")).alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(_CHUNK))).cast("int")
    chunks = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(F.col("t"), i * _CHUNK + 1, _CHUNK), " "),
            )
        ).alias("i", "chunk"),
    )
    freq = chunks.groupBy("chunk").count()
    kept = chunks.join(freq, "chunk").filter(F.col("count") <= _FREQ_CAP)
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "chunk"))), lambda x: x["chunk"]
            ),
            " ",
        ).alias("new_text"),
    )
    return (
        base.select("doc_id", n_chunks.alias("n_chunks"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.md5(F.coalesce("new_text", F.lit("")).cast("binary")).alias("new_hash"),
        )
    )


# --------------------------------------------------------------------------
# q81 — greedy NEXT-FIT packing (operators/packing.py pack_greedy): the
# sequential walk is applyInPandas per shard on the Spark side; the oracle
# SIMULATES the identical walk with a linear recursive CTE (one recursion
# step per document), proving an inherently non-SQL operator against SQL.
@_register(
    "q81_greedy_packing",
    f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tok FROM documents
    ),
    d AS (
        SELECT doc_id, n_tok, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
        FROM t WHERE n_tok > 0
    ),
    walk(rn, doc_id, n_tok, bin, used) AS (
        SELECT rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok FROM d WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.doc_id, d.n_tok,
               CASE WHEN w.used + d.n_tok <= 512 THEN w.bin ELSE w.bin + 1 END,
               CASE WHEN w.used + d.n_tok <= 512 THEN w.used + d.n_tok ELSE d.n_tok END
        FROM walk w JOIN d ON d.rn = w.rn + 1
    )
    SELECT doc_id, n_tok, bin FROM walk
    """,
)
def q81_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_toks(F.col("text"))).cast("long").alias("n_tok")
    )
    return pack_greedy(d, "doc_id", "n_tok", ctx=512)


# --------------------------------------------------------------------------
# q82 — Bloom-accelerated decontamination (operators/bloom.py
# pruned_left_anti): held-out set keys build a broadcast Bloom filter;
# corpus rows that provably aren't contaminated bypass the anti-join,
# bloom-positive rows are exactly verified — result identical to the
# plain anti-join the oracle states, at a fraction of the shuffle. The
# contamination set = documents whose md5(normalized text) collides with
# the q49 convention (doc_id % 100 == 7 stand-in eval set).
@_register(
    "q82_bloom_decontaminate",
    f"""
    WITH contam AS (
        SELECT md5(lower(regexp_replace(trim(text), '[\\s\\x0b]+', ' ', 'g'))) AS h
        FROM documents WHERE doc_id % 100 = 7
    ),
    corpus AS (
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '[\\s\\x0b]+', ' ', 'g'))) AS h
        FROM documents
    )
    SELECT c.doc_id FROM corpus c
    LEFT JOIN contam x ON c.h = x.h
    WHERE x.h IS NULL
    """,
)
def q82_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import pruned_left_anti

    d = load_table(spark, sf_dir, "documents")
    norm_hash = F.md5(
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).cast("binary")
    )
    corpus = d.select("doc_id", norm_hash.alias("h"))
    contam = d.filter(F.col("doc_id") % 100 == 7).select(norm_hash.alias("h"))
    return pruned_left_anti(corpus, contam, ["h"]).select("doc_id")


# --------------------------------------------------------------------------
# q126 — corpus bigram-LM fluency score (operators/lm.py): the CCNet /
# RefinedWeb "filter by language-model score" modality, exact instead of
# KenLM-float. Mean add-one-smoothed bigram probability per document in
# integer nano-probs: unit = (c(w1,w2)+1)·1e9 div (c(w1·)+V), score =
# sum(unit) div n — pure BIGINT arithmetic, so the per-document scores
# hash-match across engines (no ln(), the documented transcendental
# divergence). V = distinct corpus tokens.
@_register(
    "q126_bigram_lm_score",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    bi AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM toks)
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks)),
    scored AS (
        SELECT b.doc_id,
               ((c.c12 + 1) * 1000000000) // (u.c1 + v.v) AS unit
        FROM bi b JOIN c12 c USING (w1, w2) JOIN c1 u USING (w1) CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(unit) // COUNT(*) AS BIGINT) AS lm_score
    FROM scored GROUP BY doc_id
    """,
)
def q126_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(d, "doc_id", "text")


# --------------------------------------------------------------------------
# q128 — DSIR importance weights (operators/lm.py dsir_weights): hashed-
# unigram importance resampling scores against the source='src0' target
# domain — the data-selection modality (Xie et al. 2023) the sampling
# family (q47/q78/q115) composes with: weight here, hash-derived sample by
# weight there. Mean importance ratio in integer micro-units; the ratio is
# one fixed IEEE expression tree over exact integer counts, so scores
# hash-match across engines (no ln()).
@_register(
    "q128_dsir_weights",
    f"""
    WITH toks AS (
        SELECT doc_id, source = 'src0' AS is_target, unnest({_SQL_TOKS}) AS w
        FROM documents
    ),
    bt AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT % 1024 AS BIGINT) AS b
        FROM toks
    ),
    ct AS (SELECT b, COUNT(*) AS ct FROM bt WHERE is_target GROUP BY b),
    cr AS (SELECT b, COUNT(*) AS cr FROM bt GROUP BY b),
    tot AS (
        SELECT COUNT(*) AS r, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t
        FROM bt
    ),
    lut AS (
        SELECT cr.b,
               CAST(floor(
                   (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) * CAST(tot.r + 1024 AS DOUBLE))
                   / (CAST(cr.cr + 1 AS DOUBLE) * CAST(tot.t + 1024 AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT) AS unit
        FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(unit) // COUNT(*) AS BIGINT) AS dsir_weight
    FROM bt JOIN lut USING (b)
    GROUP BY doc_id
    """,
)
def q128_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import dsir_weights

    d = load_table(spark, sf_dir, "documents")
    return dsir_weights(d, "doc_id", "text", F.col("source") == "src0")


# --------------------------------------------------------------------------
# q129 — INCREMENTAL bigram-LM index (operators/lm.py fold_bigram_index):
# documents arrive in three batches (doc_id % 3) folded one at a time into
# a manifest-store index of mergeable LM statistics (bigram counts add,
# vocabulary unions); the whole corpus scored FROM THE INDEX must equal
# whole-corpus q126 — its oracle verbatim is the mergeability gate, the
# q113 invariant pattern applied to LM statistics.
@_register(
    "q129_incremental_lm_index",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
    bi AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1))) AS i FROM toks)
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v
          FROM (SELECT unnest(t) AS w FROM toks)),
    scored AS (
        SELECT b.doc_id,
               ((c.c12 + 1) * 1000000000) // (u.c1 + v.v) AS unit
        FROM bi b JOIN c12 c USING (w1, w2) JOIN c1 u USING (w1) CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(unit) // COUNT(*) AS BIGINT) AS lm_score
    FROM scored GROUP BY doc_id
    """,
)
def q129_incremental_lm_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.lm import fold_bigram_index, lm_scores_from_index

    from ..streaming.store import store_compact

    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="q129_lm_")
    for i in range(3):
        fold_bigram_index(spark, root, d.filter(F.col("doc_id") % 3 == i), "doc_id", "text")
    store_compact(spark, root)  # r14: gate scores from the compacted index
    return lm_scores_from_index(spark, root, d, "doc_id", "text")


# --------------------------------------------------------------------------
# q132 — importance-weighted SELECTION (q128 × the sampling family): the
# actual DSIR pipeline step — compute importance weights, keep documents
# strictly above the CORPUS-MEAN weight (exact integer cross-multiply
# `weight · n_docs > Σ weights` — SF-adaptive, no float division, no
# unpartitioned window; the two corpus scalars come from a 1-row
# aggregate), then hash-thin the survivors 50% with the engine's standard
# md5-derived (never rand()) decision so the draw is retry/partition-
# stable. Output is the kept set with weights and token counts — the
# downstream mixing manifest.
@_register(
    "q132_dsir_selection",
    f"""
    WITH toks AS (
        SELECT doc_id, source = 'src0' AS is_target, unnest({_SQL_TOKS}) AS w
        FROM documents
    ),
    bt AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT % 1024 AS BIGINT) AS b
        FROM toks
    ),
    ct AS (SELECT b, COUNT(*) AS ct FROM bt WHERE is_target GROUP BY b),
    cr AS (SELECT b, COUNT(*) AS cr FROM bt GROUP BY b),
    tot AS (
        SELECT COUNT(*) AS r, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t
        FROM bt
    ),
    lut AS (
        SELECT cr.b,
               CAST(floor(
                   (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) * CAST(tot.r + 1024 AS DOUBLE))
                   / (CAST(cr.cr + 1 AS DOUBLE) * CAST(tot.t + 1024 AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT) AS unit
        FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
    ),
    weights AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(unit) // COUNT(*) AS BIGINT) AS dsir_weight
        FROM bt JOIN lut USING (b)
        GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, dsir_weight
    FROM weights
    WHERE dsir_weight * (SELECT COUNT(*) FROM weights)
            > (SELECT SUM(dsir_weight) FROM weights)
      AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|dsir'), 1, 15))::UBIGINT % 2 = 0
    """,
)
def q132_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import dsir_weights

    d = load_table(spark, sf_dir, "documents")
    w = dsir_weights(d, "doc_id", "text", F.col("source") == "src0")
    corpus = w.agg(
        F.count("*").alias("__nd"), F.sum("dsir_weight").alias("__tw")
    )
    keep = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|dsir"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 0
    )
    return (
        w.crossJoin(F.broadcast(corpus))  # 1-row corpus constants
        .filter((F.col("dsir_weight") * F.col("__nd") > F.col("__tw")) & keep)
        .select("doc_id", "n_tokens", "dsir_weight")
    )


# --------------------------------------------------------------------------
# q136 — LM-index DRIFT REPORT over retained snapshots (operators/lm.py
# lm_index_drift): three document batches fold into the manifest-store LM
# index with keep_versions=3; the report diffs the index AS OF commit 2
# (batches 0,1) against commit 3 (all batches) through each snapshot's OWN
# manifest — q110's retention/time-travel story applied to mergeable LM
# statistics, without replaying a single document. The oracle derives the
# same four drift metrics (new/grown bigram types, added occurrences, new
# vocabulary) from the raw documents directly, so the gate proves that
# manifest-scoped part lists reconstruct each historical snapshot exactly
# (retention GC keeping every part a retained manifest references).
@_register(
    "q136_lm_index_drift",
    f"""
    WITH ta AS (SELECT {_SQL_TOKS} AS t FROM documents WHERE doc_id % 3 < 2),
    tb AS (SELECT {_SQL_TOKS} AS t FROM documents),
    bia AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(range(1, greatest(len(t), 1))) AS i FROM ta)
    ),
    bib AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(range(1, greatest(len(t), 1))) AS i FROM tb)
    ),
    ca AS (SELECT w1, w2, COUNT(*) AS ca FROM bia GROUP BY 1, 2),
    cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bib GROUP BY 1, 2),
    j AS (SELECT cb.w1, cb.w2, cb.cb, ca.ca FROM cb LEFT JOIN ca USING (w1, w2)),
    va AS (SELECT DISTINCT unnest(t) AS w FROM ta),
    vb AS (SELECT DISTINCT unnest(t) AS w FROM tb)
    SELECT 'bigram_types_new' AS metric,
           CAST(COUNT(*) FILTER (ca IS NULL) AS BIGINT) AS value FROM j
    UNION ALL
    SELECT 'bigram_types_grown',
           CAST(COUNT(*) FILTER (ca IS NOT NULL AND cb > ca) AS BIGINT) FROM j
    UNION ALL
    SELECT 'occurrences_added',
           CAST(SUM(cb - COALESCE(ca, 0)) AS BIGINT) FROM j
    UNION ALL
    SELECT 'vocab_new',
           CAST(COUNT(*) AS BIGINT) FROM vb WHERE w NOT IN (SELECT w FROM va)
    """,
)
def q136_lm_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.lm import fold_bigram_index, lm_index_drift

    d = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="q136_lm_")
    for i in range(3):
        fold_bigram_index(
            spark, root, d.filter(F.col("doc_id") % 3 == i), "doc_id", "text",
            keep_versions=3,
        )
    return lm_index_drift(spark, root, 2, 3)


# --------------------------------------------------------------------------
# q137 — DSIR × STRATIFIED selection (q128's weights → q115's per-stratum
# quotas): the step a real data-mixing pipeline runs. Importance
# RESAMPLING made exact-integer: accept doc iff
# ``md5_60bit(doc_id || '|rs') % 2·SCALE < dsir_weight`` — acceptance
# probability proportional to the weight (a neutral-importance doc at
# SCALE=1e6 keeps with p=0.5), hash-derived so the draw is retry- and
# partition-stable, never rand(). Survivors then fill a per-stratum quota
# (top-15 per lang by weight, doc-id tie-break) so one dominant language
# cannot crowd out the mixture — the per-stratum window ranks only
# accepted rows and emits a bounded sample per stratum. The oracle states
# the identical md5/integer math over q128's CTE chain verbatim.
@_register(
    "q137_dsir_stratified_selection",
    f"""
    WITH toks AS (
        SELECT doc_id, source = 'src0' AS is_target, unnest({_SQL_TOKS}) AS w
        FROM documents
    ),
    bt AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substr(md5(w), 1, 15))::UBIGINT % 1024 AS BIGINT) AS b
        FROM toks
    ),
    ct AS (SELECT b, COUNT(*) AS ct FROM bt WHERE is_target GROUP BY b),
    cr AS (SELECT b, COUNT(*) AS cr FROM bt GROUP BY b),
    tot AS (
        SELECT COUNT(*) AS r, SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t
        FROM bt
    ),
    lut AS (
        SELECT cr.b,
               CAST(floor(
                   (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) * CAST(tot.r + 1024 AS DOUBLE))
                   / (CAST(cr.cr + 1 AS DOUBLE) * CAST(tot.t + 1024 AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT) AS unit
        FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
    ),
    dsir AS (
        SELECT doc_id, COUNT(*) AS n_tokens,
               CAST(SUM(unit) // COUNT(*) AS BIGINT) AS dsir_weight
        FROM bt JOIN lut USING (b)
        GROUP BY doc_id
    ),
    accepted AS (
        SELECT d.doc_id, doc.lang, d.n_tokens, d.dsir_weight
        FROM dsir d JOIN documents doc USING (doc_id)
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|rs'), 1, 15))::UBIGINT
                   % 2000000 AS BIGINT) < d.dsir_weight
    )
    SELECT doc_id, lang, n_tokens, dsir_weight, rn AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY dsir_weight DESC, doc_id) AS rn
        FROM accepted
    ) WHERE rn <= 15
    """,
)
def q137_dsir_stratified_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.lm import dsir_weights

    d = load_table(spark, sf_dir, "documents")
    w = dsir_weights(d, "doc_id", "text", F.col("source") == "src0")
    j = w.join(d.select("doc_id", "lang"), "doc_id")
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|rs"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(2_000_000),
    )
    accepted = j.filter(u < F.col("dsir_weight"))
    win = Window.partitionBy("lang").orderBy(F.col("dsir_weight").desc(), "doc_id")
    return (
        accepted.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 15)
        .select("doc_id", "lang", "n_tokens", "dsir_weight", "rank")
    )


# --------------------------------------------------------------------------
# q140 — token-budget CURRICULUM SCHEDULE: order the corpus shortest-first
# (the classic length-curriculum), running-total the token costs, and cut
# the order into fixed token-budget macro-batches. The running total is the
# distributed prefix sum (operators/ranking.global_cumsum — range partition
# + local cumsum + offset add), NOT an unpartitioned SUM() OVER window: at
# 10^9 docs the single-task global window is the straggler/OOM class every
# r6/r7 ranking operator exists to kill. Token cost reuses q114's gated
# whitespace tokenizer pair. Reference analog: the batched processing
# order of database/data_migration.py's migration loop, lifted to a
# token-budget schedule.

_CUR_BUDGET = 4096


@_register(
    "q140_curriculum_schedule",
    rf"""
    WITH t AS (
        SELECT doc_id, n_chars,
               len(string_split_regex(lower(trim(text)), '[\s\x0b]+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY n_chars, doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST((cum_tokens - 1) // {_CUR_BUDGET} AS BIGINT) AS batch_idx
    FROM c
    """,
)
def q140_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.ranking import global_cumsum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count(F.col("text")).alias("n_tokens")
    )
    cum = global_cumsum(
        d, [F.col("n_chars"), F.col("doc_id")], F.col("n_tokens"), "cum_tokens"
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.expr(f"(cum_tokens - 1) div {_CUR_BUDGET}").cast("bigint").alias("batch_idx"),
    )
