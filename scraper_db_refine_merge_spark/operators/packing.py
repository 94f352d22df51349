"""Sequence packing for LLM training-data construction.

Training pipelines concatenate tokenized documents in a deterministic order
and slice the stream into fixed context windows ("concat-and-chunk" — the
standard packing used for large-scale pretraining). The bin a document
lands in is a pure function of the cumulative token count before it, so
the whole operation is a window cumsum + integer division — no UDFs, no
driver state.

Scale: a single global ``Window.orderBy`` is one-partition-sequential —
correct but not parallel. Production packing shards first (a hash prefix,
a date, a source) and packs within shards: every shard's stream is
independent, so the window runs ``partitionBy(shard)`` and the cluster
packs all shards concurrently. ``pack_contiguous`` supports both; the
oracle-gated catalog query uses the unsharded form for cross-engine
determinism, tests cover shard-parallel equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_contiguous(
    df: DataFrame,
    order_col: str,
    token_col: str,
    ctx: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document its packing position in the concatenated token
    stream: ``offset`` (tokens before it), ``first_bin``/``last_bin`` (the
    ctx-sized windows its tokens span) and ``straddles``.

    Zero-token documents are dropped (they occupy no stream positions).
    ``order_col`` must be a total order within each shard for deterministic
    output.
    """
    w = Window.orderBy(order_col) if shard_col is None else Window.partitionBy(shard_col).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, -1)
    tok = F.col(token_col)
    out = (
        df.filter(tok > 0)
        .withColumn("offset", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"))
        .withColumn("first_bin", F.floor(F.col("offset") / ctx))
        .withColumn("last_bin", F.floor((F.col("offset") + tok - 1) / ctx))
        .withColumn("straddles", F.col("last_bin") > F.col("first_bin"))
    )
    return out


def pack_greedy(
    df: DataFrame,
    order_col: str,
    token_col: str,
    ctx: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Greedy NEXT-FIT packing: walk documents in order, close the current
    bin when the next document doesn't fit. Unlike concat-and-chunk, no
    document straddles bins (an over-ctx document still gets its own bin).

    The walk is inherently sequential — per-row state (current bin, tokens
    used) — so it runs as ``applyInPandas`` per shard: one Python pass per
    shard, shards packed in parallel across the cluster. With
    ``shard_col=None`` everything is ONE group (use only for oracle-sized
    determinism tests; production always shards).

    Returns (order_col, token_col[, shard_col], bin).
    """
    import pandas as pd

    cols = [order_col, token_col] + ([shard_col] if shard_col else [])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins = []
        cur, used = 0, 0
        first = True
        for t in pdf[token_col]:
            t = int(t)
            if first:
                cur, used, first = 0, t, False
            elif used + t <= ctx:
                used += t
            else:
                cur, used = cur + 1, t
            bins.append(cur)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    src = df.select(*cols).filter(F.col(token_col) > 0)
    gcol = shard_col
    if gcol is None:
        gcol = "__shard"
        src = src.withColumn(gcol, F.lit(0).cast("long"))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields)
    out = src.groupBy(gcol).applyInPandas(_pack, schema + ", bin long")
    return out.drop("__shard") if shard_col is None else out


def pack_first_fit(
    df: DataFrame,
    order_col: str,
    token_col: str,
    ctx: int,
    shard_col: str | None = None,
    max_open_bins: int | None = None,
) -> DataFrame:
    """Greedy FIRST-FIT packing: each document (in order) goes into the
    lowest-indexed OPEN bin with room; a new bin opens when none fits.
    Strictly better utilization than next-fit (``pack_greedy`` closes its
    single bin on the first miss; first-fit keeps bins open) — classic
    first-fit guarantees ≤ 1.7·OPT bins vs 2·OPT for next-fit.

    ``max_open_bins`` bounds the open list (oldest bin closes permanently
    when the list is full) — this is the streaming form production packers
    use so state stays O(max_open_bins) however long the shard is; None
    keeps every non-full bin open (exact first-fit).

    Same execution model as ``pack_greedy``: sequential per shard via one
    Arrow-batched ``applyInPandas`` pass, shards packed in parallel. An
    over-ctx document still gets its own bin.

    Returns (order_col, token_col[, shard_col], bin).
    """
    import pandas as pd

    cols = [order_col, token_col] + ([shard_col] if shard_col else [])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins: list[int] = []
        open_bins: list[list[int]] = []  # [bin_id, used], insertion order
        next_id = 0
        for t in pdf[token_col]:
            t = int(t)
            placed = None
            for slot in open_bins:
                if slot[1] + t <= ctx:
                    slot[1] += t
                    placed = slot[0]
                    break
            if placed is None:
                placed = next_id
                open_bins.append([next_id, t])
                next_id += 1
                if max_open_bins is not None and len(open_bins) > max_open_bins:
                    open_bins.pop(0)  # oldest closes permanently
            bins.append(placed)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    src = df.select(*cols).filter(F.col(token_col) > 0)
    gcol = shard_col
    if gcol is None:
        gcol = "__shard"
        src = src.withColumn(gcol, F.lit(0).cast("long"))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields)
    out = src.groupBy(gcol).applyInPandas(_pack, schema + ", bin long")
    return out.drop("__shard") if shard_col is None else out


def pack_bins_summary(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-bin rollup of a ``pack_contiguous`` result, grouped by the bin
    each document STARTS in: document count, tokens started, straddlers."""
    return packed.groupBy(F.col("first_bin").alias("bin")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.count(F.when(F.col("straddles"), 1)).alias("n_straddling"),
    )
