"""Character-level (substring) dedup/decontamination queries (r8) — the
one dedup modality the word-shingle family (q23-q25, q42-q46, q49, q103,
q124, q143, q151) does not cover: exact shared CHARACTER spans, whatever
the tokenization (Lee et al. 2022's suffix-array dedup, re-expressed
Spark-first in operators/substr.py).

- q152: training-side decontamination report — per TRAIN doc, how many of
  its 32-char positions also occur verbatim anywhere in the EVAL split
  (the drop/redact candidates). Hashed char-gram equi-join: shuffle keys
  are 32-byte md5, the gram text never moves.
- q153: corpus duplication profile — per doc, how many of its 32-char
  positions occur ≥2 times ANYWHERE in the corpus, via substring group
  ids (direct single-pass at L ≤ 64; the prefix-doubling ladder with
  O(positions·log L) fixed-width shuffle bytes beyond — the 100-TB path
  either way). The oracle computes the same profile by direct substring
  extraction + self-join, so hash equality doubles as the correctness
  proof of the distributed group-id construction.
- q154: duplicated-span REDACTION — the act step: cut every repeated span
  except its globally-first occurrence; the gate hashes full cleaned text.
- q155: q152 with corpus-side stride 4 — the 100-TB row-count knob, gated
  (detects every shared span >= L+3; tightness pinned in pytest).
- q156: dyadic duplication-length profile (rungs 8/16/32/64 from ONE
  doubling run) + per-doc longest-repeated-substring bracket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.substr import substring_contamination, suffix_ngram_groups
from ..sources.tables import load_table
from .sampling import _SQL_HASH_UNIT, hash_unit

QUERIES: dict = {}
ORACLES: dict = {}

_L = 32


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# q152 — substring-level decontamination report. q143 answers "how many of
# an eval doc's word-5-shingles appear in train"; this is the stricter
# character-level form, reported from the TRAINING side (the docs a
# pipeline would drop or redact): per train doc, the count of 32-char
# positions whose exact substring occurs anywhere in the eval split.
# Scale shape: one DISTINCT over eval gram hashes (eval/benchmark side is
# small by nature), one left equi-join on the 32-byte hash (the distinct
# bounds a hot gram to one row per train occurrence — no pair explosion),
# one per-doc aggregation. Corpus-side stride (char_grams stride=k, exact
# for spans >= L+k-1) is the knob that divides corpus row count at 100 TB;
# the gate runs stride 1 so the oracle states positions exactly.
@_register(
    "q152_substring_decontamination",
    f"""
    WITH d AS (
        SELECT doc_id, text, {_SQL_HASH_UNIT} AS unit
        FROM documents WHERE length(text) >= {_L}
    ),
    pos AS (
        SELECT doc_id, unit, text,
               unnest(range(1, length(text) - {_L} + 2)) AS i
        FROM d
    ),
    g AS (SELECT doc_id, unit, md5(substr(text, i, {_L})) AS h FROM pos),
    bench AS (SELECT DISTINCT h FROM g WHERE unit >= 0.9),
    corpus AS (SELECT doc_id, h FROM g WHERE unit < 0.8)
    SELECT corpus.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_positions,
           CAST(COUNT(bench.h) AS BIGINT) AS n_matched,
           COUNT(bench.h) > 0 AS contaminated
    FROM corpus LEFT JOIN bench ON corpus.h = bench.h
    GROUP BY corpus.doc_id
    """,
)
def q152_substring_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = hash_unit(F.col("doc_id"))
    train = d.filter(u < 0.8)
    ev = d.filter(u >= 0.9)
    return substring_contamination(train, ev, "doc_id", "text", _L)


# --------------------------------------------------------------------------
# q153 — corpus duplication profile via substring GROUP IDS: per doc,
# (n_grams, n_repeated, max_occ) where n_repeated counts 32-char positions
# whose substring occurs >= 2 times anywhere in the corpus and max_occ is
# the doc's hottest span's occurrence count. At L=32 ≤ DIRECT_SEED_MAX,
# operators/substr.suffix_ngram_groups takes its direct regime (r11): one
# full-position enumeration + ONE hash-bucketed _dense_group_ids pass on
# the raw gram — the same O(positions) single-pass shape as the oracle —
# then two keyed aggregations on the (g1, g2) group key. The arbitrary-L
# prefix-doubling ladder (whose per-round machinery q156 exercises across
# four rungs) takes over beyond 64 chars, where gram width would dominate
# shuffle bytes. The oracle extracts substr(text, i, 32) directly and
# self-joins; value equality of the per-doc profiles proves the group-id
# construction at corpus scale.
@_register(
    "q153_repeated_substrings",
    f"""
    WITH pos AS (
        SELECT doc_id, text, unnest(range(1, length(text) - {_L} + 2)) AS i
        FROM documents WHERE length(text) >= {_L}
    ),
    g AS (SELECT doc_id, substr(text, i, {_L}) AS gram FROM pos),
    c AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
           CAST(MAX(c.n) AS BIGINT) AS max_occ
    FROM g JOIN c USING (gram)
    GROUP BY g.doc_id
    """,
)
def q153_repeated_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substr import repeated_span_profile

    d = load_table(spark, sf_dir, "documents")
    # r13 (VERDICT r12 item 3): the window-vs-groupBy skew ceiling that
    # lived here as a comment is now CODE — repeated_span_profile probes a
    # 1% position sample (memoized per corpus frame) and auto-switches
    # the per-group count from the window form (two shuffles, no join —
    # faster, but the hottest gram funnels through one task) to
    # groupBy+join-back (map-side combined, AQE skew-splittable) when one
    # gram holds >10% of sampled positions. Both regimes emit identical
    # rows, so this oracle is regime-independent.
    return repeated_span_profile(d, "doc_id", "text", _L).select(
        F.col("doc").alias("doc_id"), "n_grams", "n_repeated", "max_occ"
    )


# --------------------------------------------------------------------------
# q154 — duplicated-span REDACTION: the ACT step to q153's detect step —
# every 32-char span that occurs elsewhere in the corpus is cut from the
# text except its globally-first occurrence, overlapping/adjacent marks
# merged, one splice per doc (operators/substr.redact_repeated_spans; the
# one-pass semantics of Lee et al. 2022's dedup cut). The gate hashes the
# FULL cleaned text of every doc, so span arithmetic, island merging, and
# the splice HOF are all value-checked. The oracle reconstructs cleaned
# text per CHARACTER (string_agg of kept chars) — the Spark side never
# explodes per char; equality of the two constructions is the proof.
@_register(
    "q154_redact_repeated_spans",
    f"""
    WITH pos AS (
        SELECT doc_id, text, unnest(range(1, length(text) - {_L} + 2)) AS i
        FROM documents WHERE length(text) >= {_L}
    ),
    g AS (SELECT doc_id, i, md5(substr(text, i, {_L})) AS h FROM pos),
    marked AS (
        SELECT doc_id, i,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
        FROM g
    ),
    dup AS (SELECT doc_id, i FROM marked WHERE rn >= 2),
    isl0 AS (
        SELECT doc_id, i,
               CASE WHEN MAX(i + {_L} - 1) OVER (
                        PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR i > MAX(i + {_L} - 1) OVER (
                        PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                    THEN 1 ELSE 0 END AS ni
        FROM dup
    ),
    isl1 AS (
        SELECT doc_id, i,
               SUM(ni) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS UNBOUNDED PRECEDING) AS grp
        FROM isl0
    ),
    isl AS (
        SELECT doc_id, grp, MIN(i) AS s, MAX(i) + {_L} - 1 AS e
        FROM isl1 GROUP BY 1, 2
    ),
    ch AS (
        SELECT doc_id, p, substr(text, p, 1) AS c,
               EXISTS (SELECT 1 FROM isl s
                       WHERE s.doc_id = ch0.doc_id AND ch0.p BETWEEN s.s AND s.e)
                   AS rm
        FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p
              FROM documents) ch0
    ),
    cleaned AS (
        SELECT doc_id,
               COALESCE(string_agg(c, '' ORDER BY p) FILTER (WHERE NOT rm), '')
                   AS cleaned
        FROM ch GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(e - s + 1) AS BIGINT) AS n_removed
        FROM isl GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(st.n_spans, 0) AS n_spans,
           COALESCE(st.n_removed, 0) AS n_removed,
           COALESCE(c.cleaned, d.text) AS cleaned
    FROM documents d
    LEFT JOIN stats st ON st.doc_id = d.doc_id
    LEFT JOIN cleaned c ON c.doc_id = d.doc_id
    """,
)
def q154_redact_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substr import redact_repeated_spans

    d = load_table(spark, sf_dir, "documents")
    return redact_repeated_spans(d, "doc_id", "text", _L)


# --------------------------------------------------------------------------
# q155 — STRIDED substring decontamination: q152's exact join enumerates
# every corpus position; at 100 TB the corpus side runs with stride k
# (positions 1, 1+k, 1+2k, …), which divides corpus gram rows by k and
# still detects EVERY shared span of length >= L+k-1 (such a span must
# contain a full L-gram starting on a stride boundary; the probe side
# stays stride 1). This gate pins that configuration (k=4, effective
# threshold 35) — the oracle enumerates the same strided positions, so
# the stride arithmetic itself is value-checked, and the pytest suite
# separately proves the >= L+k-1 detection guarantee on adversarial
# alignments (tests/test_substr.py).
@_register(
    "q155_strided_decontamination",
    f"""
    WITH d AS (
        SELECT doc_id, text, {_SQL_HASH_UNIT} AS unit
        FROM documents WHERE length(text) >= {_L}
    ),
    cpos AS (
        SELECT doc_id, unit, text,
               unnest(range(1, length(text) - {_L} + 2, 4)) AS i
        FROM d
    ),
    bpos AS (
        SELECT doc_id, unit, text,
               unnest(range(1, length(text) - {_L} + 2)) AS i
        FROM d
    ),
    corpus AS (SELECT doc_id, md5(substr(text, i, {_L})) AS h FROM cpos
               WHERE unit < 0.8),
    bench AS (SELECT DISTINCT md5(substr(text, i, {_L})) AS h FROM bpos
              WHERE unit >= 0.9)
    SELECT corpus.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_positions,
           CAST(COUNT(bench.h) AS BIGINT) AS n_matched,
           COUNT(bench.h) > 0 AS contaminated
    FROM corpus LEFT JOIN bench ON corpus.h = bench.h
    GROUP BY corpus.doc_id
    """,
)
def q155_strided_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = hash_unit(F.col("doc_id"))
    train = d.filter(u < 0.8)
    ev = d.filter(u >= 0.9)
    return substring_contamination(train, ev, "doc_id", "text", _L, stride=4)


def _lrs_oracle() -> str:
    rungs = "".join(
        f"""
    g{h} AS (
        SELECT doc_id, substr(text, i, {h}) AS gram
        FROM (SELECT doc_id, text, unnest(range(1, length(text) - {h} + 2)) AS i
              FROM documents WHERE length(text) >= {h})
    ),
    c{h} AS (SELECT gram, COUNT(*) AS n FROM g{h} GROUP BY gram),
    r{h} AS (
        SELECT g.doc_id, CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS rep
        FROM g{h} g JOIN c{h} c USING (gram) GROUP BY g.doc_id
    ),"""
        for h in (8, 16, 32, 64)
    )
    return f"""
    WITH {rungs.rstrip(',')}
    SELECT d.doc_id,
           COALESCE(r8.rep, 0) AS rep8,
           COALESCE(r16.rep, 0) AS rep16,
           COALESCE(r32.rep, 0) AS rep32,
           COALESCE(r64.rep, 0) AS rep64,
           CAST(CASE WHEN COALESCE(r64.rep, 0) > 0 THEN 64
                     WHEN COALESCE(r32.rep, 0) > 0 THEN 32
                     WHEN COALESCE(r16.rep, 0) > 0 THEN 16
                     WHEN COALESCE(r8.rep, 0) > 0 THEN 8
                     ELSE 0 END AS INTEGER) AS lrs_bracket
    FROM documents d
    LEFT JOIN r8 ON r8.doc_id = d.doc_id
    LEFT JOIN r16 ON r16.doc_id = d.doc_id
    LEFT JOIN r32 ON r32.doc_id = d.doc_id
    LEFT JOIN r64 ON r64.doc_id = d.doc_id
    """


# --------------------------------------------------------------------------
# q156 — dyadic DUPLICATION-LENGTH PROFILE: per doc, how many positions
# start a duplicated span at each rung h ∈ {8, 16, 32, 64} and the
# longest-repeated-substring bracket (largest rung with any repeat) — the
# corpus statistic that tells a dedup pipeline WHERE to set L before
# committing to a redaction threshold. One prefix-doubling run yields all
# four rungs (operators/substr.suffix_rank_ladder: the snapshots are the
# doubling loop's own intermediates — the marginal rung is free, which is
# exactly what fixed-L gram hashing cannot offer). The oracle re-derives
# every rung with direct substring extraction + self-join.
@_register("q156_duplication_length_profile", _lrs_oracle())
def q156_duplication_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substr import suffix_rank_ladder

    d = load_table(spark, sf_dir, "documents")
    ladder = suffix_rank_ladder(d, "doc_id", "text", [8, 16, 32, 64])
    base = d.select("doc_id")
    for h, dfh in ladder.items():
        full = dfh.filter(F.col("pos") <= F.col("__len") - (h - 1))
        counts = full.groupBy("r").agg(F.count("*").alias("__n"))
        rep = (
            full.join(counts, "r")
            .filter(F.col("__n") > 1)
            .groupBy(F.col("doc").alias("doc_id"))
            .agg(F.count("*").alias(f"rep{h}"))
        )
        base = base.join(rep, "doc_id", "left")
    out = base.select(
        "doc_id",
        *[F.coalesce(f"rep{h}", F.lit(0)).cast("long").alias(f"rep{h}") for h in (8, 16, 32, 64)],
    )
    bracket = (
        F.when(F.col("rep64") > 0, 64)
        .when(F.col("rep32") > 0, 32)
        .when(F.col("rep16") > 0, 16)
        .when(F.col("rep8") > 0, 8)
        .otherwise(0)
        .cast("int")
    )
    return out.withColumn("lrs_bracket", bracket)


# --------------------------------------------------------------------------
# q157 — the CORPUS BUILD composed end-to-end: the query a training-data
# pipeline runs to produce a shard manifest from raw documents —
#   (1) quality gate (length >= 100 chars AND >= 20 whitespace tokens),
#   (2) exact dedup keep-smallest-id (q23's content hash),
#   (3) char-level benchmark decontamination DROP (q152's 32-gram join
#       against the eval split — contaminated docs removed, not reported),
#   (4) deterministic shard manifest (q142's md5-permutation + ntile, 8
#       shards, order-independent content fingerprint).
# Each stage is individually gated elsewhere; this gates their COMPOSITION
# (the q109 pattern, for the curation+decontamination+export half of the
# pipeline that q109's dedup half doesn't cover). Scale shape inherits
# from the pieces: hash groupBys with map-side combine, a DISTINCT-bounded
# gram join, and the distributed ranking ntile — no new shuffle classes.
@_register(
    "q157_corpus_build",
    rf"""
    WITH d AS (
        SELECT doc_id, text, {_SQL_HASH_UNIT} AS unit,
               len(string_split_regex(lower(trim(text)), '[\s\x0b]+')) AS n_tokens
        FROM documents
    ),
    cand AS (
        SELECT * FROM d
        WHERE unit < 0.8 AND length(text) >= 100 AND n_tokens >= 20
    ),
    hashes AS (
        SELECT doc_id, text, n_tokens,
               md5(lower(regexp_replace(trim(text), '[\s\x0b]+', ' ', 'g'))) AS ch
        FROM cand
    ),
    canon AS (SELECT ch, MIN(doc_id) AS canonical_id FROM hashes GROUP BY ch),
    deduped AS (
        SELECT h.doc_id, h.text, h.n_tokens
        FROM hashes h JOIN canon c ON h.ch = c.ch AND h.doc_id = c.canonical_id
    ),
    bench AS (
        SELECT DISTINCT md5(substr(text, i, {_L})) AS h
        FROM (SELECT text, unnest(range(1, length(text) - {_L} + 2)) AS i
              FROM d WHERE unit >= 0.9 AND length(text) >= {_L})
    ),
    contaminated AS (
        SELECT DISTINCT g.doc_id
        FROM (SELECT doc_id, md5(substr(text, i, {_L})) AS h
              FROM (SELECT doc_id, text, unnest(range(1, length(text) - {_L} + 2)) AS i
                    FROM deduped WHERE length(text) >= {_L})) g
        JOIN bench b ON g.h = b.h
    ),
    clean AS (
        SELECT doc_id, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS pk,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT AS fp_unit
        FROM deduped
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    o AS (
        SELECT doc_id, n_tokens, fp_unit,
               CAST(NTILE(8) OVER (ORDER BY pk, doc_id) AS INTEGER) AS shard
        FROM clean
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(fp_unit) % 2147483648 AS BIGINT) AS content_fp
    FROM o
    GROUP BY shard
    ORDER BY shard
    """,
)
def q157_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.dedup import normalized_text
    from ..operators.ranking import with_global_ranks

    d = load_table(spark, sf_dir, "documents")
    u = hash_unit(F.col("doc_id"))
    cand = (
        d.filter(u < 0.8)
        .withColumn("n_tokens", token_count(F.col("text")))
        .filter((F.length("text") >= 100) & (F.col("n_tokens") >= 20))
    )
    hashes = cand.withColumn("ch", F.md5(normalized_text(F.col("text"))))
    canon = hashes.groupBy("ch").agg(F.min("doc_id").alias("canonical_id"))
    deduped = hashes.join(
        canon,
        (hashes["ch"] == canon["ch"]) & (hashes["doc_id"] == canon["canonical_id"]),
    ).select(hashes["doc_id"], hashes["text"], hashes["n_tokens"])
    bench = d.filter(u >= 0.9)
    contaminated = (
        substring_contamination(deduped, bench, "doc_id", "text", _L)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    clean = deduped.join(contaminated, "doc_id", "anti").select(
        "doc_id",
        "n_tokens",
        F.md5(F.col("doc_id").cast("string")).alias("pk"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("fp_unit"),
    )
    r = with_global_ranks(
        clean, [F.col("pk"), F.col("doc_id")], ["pk", "doc_id"], ntile=("shard", 8)
    )
    return (
        r.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr(
                "CAST(pmod(SUM(CAST(fp_unit AS DECIMAL(38,0))), 2147483648) AS BIGINT)"
            ).alias("content_fp"),
        )
        .orderBy("shard")
    )
