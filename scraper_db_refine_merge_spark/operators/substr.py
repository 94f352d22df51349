"""Character-level (substring) deduplication / decontamination operators.

The shingle family (operators/dedup.py) matches documents on WORD n-grams;
benchmark decontamination in practice (the suffix-array method of Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better")
matches at the CHARACTER level: any two corpus positions whose next L
characters are identical are a duplicated span, whatever the tokenization.
This module gives that modality two Spark-native shapes:

- :func:`char_grams` — enumerate (doc, pos, md5(L-char gram)) rows with
  native exprs only (sequence → explode → substr → md5); the gram text
  never leaves the executor, the shuffle key is the 32-byte hash. With
  ``stride=k`` on the corpus side (probe side stays stride 1), an
  equi-join on the hash detects every shared span of length ≥ L+k-1
  exactly — the standard stride trick that divides corpus-side row count
  by k at a bounded loss of threshold resolution.

- :func:`suffix_ngram_groups` — the 100-TB path: suffix-array RANK
  construction by prefix doubling (Manber-Myers), distributed. Instead of
  materializing L bytes (or a 16-byte hash) per corpus position — an
  L-to-16× data blowup before the first shuffle — each position carries
  two fixed-width longs, and O(log L) rounds of (LEAD(r, h) over a
  per-doc window — positions are dense, so the row h ahead IS pos+h) +
  (distributed dense_rank via operators/ranking.with_global_ranks —
  range partition, never a single-task window) refine ranks until rank
  equality ⟺ L-prefix equality. Total shuffled bytes are
  O(positions · log L), independent of L's byte width, and the machinery
  extends to full suffix ordering (longest-repeated-substring, arbitrary-
  length repeats) that fixed-L hashing cannot express.

Rank-equality semantics (why no sentinel rows are needed): the h-rank of
a position is built from SAME-DOCUMENT lookups of (doc, pos+h); a lookup
past the document end contributes the constant -1, which no real rank
equals. Inductively, rank_h[i] == rank_h[j] ⟺ the two suffixes truncated
at their document ends agree on their first min(h, remaining) characters
AND hit their ends at the same relative offset (if within h). Hence for
positions with ≥ L real characters, final-key equality is EXACTLY "the two
L-char grams are identical", and any position sharing a full L-gram with a
full position is itself full — filtering to full positions first loses
nothing.

The reference's dedup surface is business-key canonicalization
(`database/fix_schema.py:78-156` indexes `deduplication.is_canonical`);
substring-level matching is the corpus-scale extension a training-data
pipeline needs on top.

All deterministic (md5-derived, no rand()); DuckDB oracles mirror the
gram extraction with substr()/md5() byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import with_global_ranks


def char_grams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    length: int,
    stride: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """One row per (full) character position: ``(doc, pos, h)``.

    ``pos`` is 1-based; only positions with a full ``length``-char gram are
    emitted. ``h`` is md5 of the gram (``hashed=False`` keeps the raw gram
    — tests only; production shuffles hashes). ``stride=k`` emits every
    k-th position: an equi-join of a stride-k side against a stride-1 side
    finds every shared span of length ≥ ``length``+k-1 (any such span
    contains a full gram starting on a stride-k boundary).
    """
    if length < 1:
        raise ValueError("length must be >= 1")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    gram = F.substr(F.col(text_col), F.col("pos"), F.lit(length))
    return (
        df.filter(F.length(text_col) >= length)  # sequence() needs stop >= start
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length(text_col) - F.lit(length - 1),
                    F.lit(stride),
                )
            ).alias("pos"),
            F.col(text_col),
        )
        .select("doc", "pos", (F.md5(gram) if hashed else gram).alias("h"))
    )


def substring_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    length: int,
    stride: int = 1,
) -> DataFrame:
    """Per ``corpus`` document, how much of it is covered by exact
    ``length``-char substrings that also occur anywhere in ``bench`` —
    the character-level decontamination report (Lee et al. 2022 §4 applied
    as benchmark decontamination).

    Returns ``(doc_id, n_positions, n_matched, contaminated)``. Scale
    shape: one DISTINCT over bench gram hashes (bench = test suites, small
    by nature — but the join is a plain equi-join either way, no broadcast
    forced), one left join on the 32-byte hash, one per-doc aggregation.
    ``stride`` applies to the CORPUS side (threshold becomes L+stride-1);
    the bench side always enumerates every position.
    """
    cg = char_grams(corpus, id_col, text_col, length, stride=stride)
    bg = (
        char_grams(bench, id_col, text_col, length)
        .select("h")
        .distinct()
        .withColumn("__m", F.lit(1))
    )
    return (
        cg.join(bg, "h", "left")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count("*").alias("n_positions"),
            F.count("__m").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") > 0)
    )


def suffix_ngram_groups(
    df: DataFrame, id_col: str, text_col: str, length: int
) -> DataFrame:
    """Group id per full character position such that two positions share
    a group ⟺ their next ``length`` characters are identical — computed by
    prefix-doubling suffix ranks, never materializing the grams.

    Returns ``(doc, pos, g1, g2)``; the group key is the PAIR (g1, g2)
    (the standard overlapped-rank trick: with h = 2^⌊log2 L⌋, the key
    (rank_h[i], rank_h[i+L-h]) covers [i, i+L) exactly, so no extra
    doubling round is spent when L is not a power of two; for L = h the
    second component is the same rank shifted by 0 and the pair is still
    exact).

    Each doubling round is one LEAD over the per-doc window plus one
    distributed dense_rank (range-partitioned; see with_global_ranks) —
    fixed-width rows throughout, O(log(L/h0)) rounds. Positions with fewer
    than ``length`` remaining characters are dropped from the OUTPUT (they
    have no full gram) but participate in rank construction, which is what
    makes in-document tail comparisons exact.

    HYBRID SEED: the initial rank is taken directly on the h0 = min(8,
    length)-char gram (substr caps at the doc end, so equal capped grams ⟺
    equal capped-h0 suffixes — the induction base holds unchanged). An
    8-char seed costs the same shuffle width as the two longs a doubling
    round carries, and replaces the 3 cheapest-but-not-free rounds
    (h = 1→2→4→8); doubling takes over where gram width would start to
    dominate shuffle bytes.
    """
    if length < 1:
        raise ValueError("length must be >= 1")
    # deepest ladder rung <= length (h0 = min(8, length) hybrid seed)
    h = min(8, length)
    while h * 2 <= length:
        h *= 2
    d = suffix_rank_ladder(df, id_col, text_col, [h])[h]

    if h == length:
        return d.filter(F.col("pos") <= F.col("__len") - (length - 1)).select(
            "doc", "pos", F.col("r").alias("g1"), F.col("r").alias("g2")
        )
    # overlap rank via LEAD (dense positions — see suffix_rank_ladder); a
    # full position always has a real rank at pos+off (off < h <= length)
    off = length - h
    w_doc = Window.partitionBy("doc").orderBy("pos")
    return (
        d.withColumn("g2", F.lead("r", off).over(w_doc))
        .filter(F.col("pos") <= F.col("__len") - (length - 1))
        .select("doc", "pos", F.col("r").alias("g1"), "g2")
    )


def redact_repeated_spans(
    df: DataFrame, id_col: str, text_col: str, length: int
) -> DataFrame:
    """Single-pass duplicated-span REDACTION (Lee et al. 2022 §4's cut
    step): every position whose ``length``-char gram occurs elsewhere in
    the corpus — except the gram's globally-first occurrence (min (doc,
    pos)) — is marked, marked spans [pos, pos+L) are merged (overlapping
    OR adjacent), and the merged spans are cut from the text in one splice.
    Marks are computed on the ORIGINAL text (no cascade: junctions created
    by cutting are not re-scanned — the standard one-pass semantics).

    Returns ``(doc_id, n_spans, n_removed, cleaned)`` for EVERY input doc
    (0/0/original for docs without duplicated spans).

    Scale shape: gram stats are one groupBy on the 32-byte hash with full
    map-side combine (a hot gram partial-aggregates; the stats row is one
    per hash, so the join back explodes nothing); island merging windows
    per DOCUMENT over duplicated positions only — bounded by the doc's own
    length, which any per-doc output is anyway; the splice is an aggregate
    HOF over the doc's merged spans (no per-character explosion — the
    oracle does that, this side never does).
    """

    cg = char_grams(df, id_col, text_col, length)
    stats = cg.groupBy("h").agg(
        F.count("*").alias("__n"),
        F.min(F.struct(F.col("doc"), F.col("pos"))).alias("__c0"),
    )
    dup = (
        cg.join(stats, "h")
        .filter(
            (F.col("__n") > 1)
            & ~(
                (F.col("doc") == F.col("__c0.doc"))
                & (F.col("pos") == F.col("__c0.pos"))
            )
        )
        .select("doc", "pos")
    )
    w = Window.partitionBy("doc").orderBy("pos")
    prev_end = F.max(F.col("pos") + (length - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_isl = F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0)
    islands = (
        dup.withColumn(
            "__g",
            F.sum(new_isl).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc", "__g")
        .agg(F.min("pos").alias("s"), (F.max("pos") + (length - 1)).alias("e"))
    )
    spans = islands.groupBy("doc").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans"),
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_removed"),
    )
    t = F.col(text_col)
    # dataframe-qualified join keys (ADVICE r8): a bare F.col(id_col) ==
    # F.col("doc") is ambiguous the moment the caller's frame itself
    # carries a 'doc' column (AnalysisException), and a caller whose
    # id_col IS 'doc' would make the predicate trivially self-referential.
    joined = df.join(spans, df[id_col] == spans["doc"], "left").drop(spans["doc"])
    splice = F.aggregate(
        F.coalesce(F.col("__spans"), F.array().cast("array<struct<s:int,e:int>>")),
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("acc")),
        lambda a, sp: F.struct(
            (sp["e"] + 1).alias("cur"),
            F.concat(a["acc"], F.substr(t, a["cur"], sp["s"] - a["cur"])).alias("acc"),
        ),
        lambda a: F.concat(a["acc"], F.substr(t, a["cur"], F.length(t) - a["cur"] + 1)),
    )
    return joined.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        splice.alias("cleaned"),
    )


def suffix_rank_ladder(
    df: DataFrame, id_col: str, text_col: str, lengths: list[int]
) -> dict[int, DataFrame]:
    """Rank snapshots at every requested dyadic prefix length, from ONE
    prefix-doubling run: ``{h: (doc, pos, __len, r)}`` where two positions
    share ``r`` at step h ⟺ their suffixes (truncated at the doc end)
    agree on their first min(h, remaining) chars and, if shorter than h,
    on their truncated length — so for positions with ≥ h real characters,
    equal rank ⟺ identical h-char gram (the suffix_ngram_groups
    semantics, observed at every rung instead of only the last).

    ``lengths`` must be increasing and each a power-of-two multiple of the
    seed h0 = min(8, lengths[0]) — i.e. exactly the ladder the doubling
    visits. The marginal cost of an extra rung over the deepest one is
    zero: the snapshots are the loop's own intermediates.
    """
    if not lengths or sorted(lengths) != list(lengths):
        raise ValueError("lengths must be non-empty and increasing")
    h0 = min(8, lengths[0])
    for L in lengths:
        q = L // h0
        if h0 * q != L or q & (q - 1):
            raise ValueError(f"length {L} is not h0*2^k for h0={h0}")
    chars = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.sequence(F.lit(1), F.length(text_col))).alias("pos"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).select(
        "doc",
        "pos",
        "__len",
        F.substr(F.col("__t"), F.col("pos"), F.lit(h0)).alias("__g0"),
    )
    d = with_global_ranks(
        chars, [F.col("__g0")], ["__g0"], dense_rank_col="r"
    ).select("doc", "pos", "__len", F.col("r").cast("long").alias("r"))
    out: dict[int, DataFrame] = {}
    h = h0
    if h in lengths:
        out[h] = d
    # rank[pos+h] is a LEAD, not a join: positions are DENSE per doc
    # (1..len), so the row h ahead in (doc, pos) order is exactly pos+h.
    # One per-doc window (bounded by the doc's own length — the same
    # inherent bound as any per-doc output) replaces a corpus-sized
    # self-equi-join per round; the -1 fill for leads past the doc end is
    # the sentinel the module docstring's induction relies on.
    w_doc = Window.partitionBy("doc").orderBy("pos")
    while h < max(lengths):
        paired = d.withColumn(
            "__r2", F.coalesce(F.lead("r", h).over(w_doc), F.lit(-1))
        )
        d = with_global_ranks(
            paired, [F.col("r"), F.col("__r2")], ["r", "__r2"], dense_rank_col="__nr"
        ).select("doc", "pos", "__len", F.col("__nr").cast("long").alias("r"))
        h *= 2
        if h in lengths:
            out[h] = d
    return out
