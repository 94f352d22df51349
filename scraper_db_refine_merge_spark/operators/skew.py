"""Skew mitigation operators.

AQE's skew-join splitting handles sort-merge joins at runtime (enabled in
session.py), but two shapes still need explicit salting at corpus scale:

- an equi-join against a side too big to broadcast where a handful of hot
  keys (the empty venue name, the "unknown" platform, a viral document
  fingerprint) concentrate in one task: ``salted_join`` spreads each hot
  key over ``n_salts`` tasks by replicating the build side;
- per-key windows over hot keys (millions of rows for one key make
  ``row_number`` a single-task sort): ``salted_latest_per_key`` runs the
  W3 latest-wins dedup in two phases — salt-local winners, then a final
  tiny reduction — so no task ever sorts a whole hot key;
- per-key ORDER-dependent windows where a hash salt would break the
  sequence (gap sessionization): ``sessionize_two_phase`` salts by TIME
  BLOCK — order survives within blocks, and boundary fix-up runs over
  block summaries whose per-key count is bounded by calendar time, not
  event density.

Both are deterministic: salt comes from a hash of stable columns, never
``rand()``, so retried tasks produce identical output (speculative
execution and stage retries would otherwise corrupt exactly-once sinks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: list[str], n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of stable columns."""
    return df.withColumn(col_name, F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(n_salts)))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side replicated.

    The skewed side gets a deterministic salt; the other side is exploded
    ×``n_salts`` so every (key, salt) bucket finds its match. Shuffle volume
    for the replicated side grows ×n_salts — use when that side is much
    smaller than the skewed side but too big (or too dynamic) to broadcast.

    Result equals ``skewed.join(other, on, how)`` row-for-row for
    ``inner``/``left``/``left_semi``/``left_anti`` ONLY: for right/full
    outer joins the replicated side's unmatched rows would surface once per
    salt (n_salts duplicates), so those modes are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — right/full "
            "outer would duplicate unmatched replicated-side rows n_salts times"
        )
    salt_from = salt_from or skewed.columns
    s = with_salt(skewed, salt_from, n_salts)
    r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(r, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase W3 latest-wins for hot keys.

    Phase 1 picks a winner per (key, salt) — hot keys split across up to
    ``n_salts`` tasks; phase 2 reduces the ≤ n_salts finalists per key.
    ``order_cols`` must form a total order (include a unique tie-break) for
    the result to equal the single-window ``latest_per_key``.
    """
    salted = with_salt(df, salt_from, n_salts)
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_cols)
    finalists = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        finalists.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__salt")
    )


def sessionize_two_phase(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_sec: int,
    block_sec: int | None = None,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Skew-hardened gap-sessionization: per-key ``(session_count,
    event_count)`` equal to the single-window form (q33) but with NO task
    ever holding one key's full history (VERDICT r5 item 4 — one bot user
    with 10^8 events turns ``Window.partitionBy(user)`` into a
    single-task straggler at scale).

    Phase 1 windows over ``(key, time-block)`` — ``block =
    floor(epoch/block_sec)`` is a deterministic time-range salt, so a hot
    key's events spread across as many tasks as it has active blocks —
    counting within-block session starts exactly as the naive lag-window
    does. Phase 2 fixes the block boundaries on block SUMMARIES (one row
    per non-empty (key, block)): a session continues across a boundary iff
    the first event of a block follows the last event of the key's
    previous non-empty block by ≤ gap; each such continuation was counted
    as a fresh start in phase 1, so it subtracts one. The phase-2 window
    per key is bounded by CALENDAR TIME (range/block_sec summaries),
    independent of event density — the property that kills the straggler.

    Exact for ANY block_sec > 0 (empty blocks are skipped by the lag over
    non-empty summaries; equal timestamps always share a block because the
    block is derived from ts). Default block_sec = gap_sec: finest
    granularity that still lets most sessions resolve in phase 1.
    ``order_tiebreak``: extra columns making the within-block order total
    (mirrors the naive window's ORDER BY ts, tiebreak...; the per-key
    counts are order-insensitive in ties, but a total order keeps retried
    tasks deterministic).

    Counting-only by design: per-event session IDS need a per-key prefix
    scan — use the q33 single-window form where keys are known to be
    bounded, or carry phase-1 local ids + phase-2 offsets if ids are
    needed at scale.
    """
    block_sec = block_sec or gap_sec
    tb = order_tiebreak or []
    ts_long = F.col(ts_col).cast("long")
    b = df.withColumn("__block", F.floor(ts_long / F.lit(block_sec)))
    w1 = Window.partitionBy(*key_cols, "__block").orderBy(ts_col, *tb)
    prev = F.lag(ts_col).over(w1)
    start = F.when(
        prev.isNull() | (ts_long - prev.cast("long") > gap_sec), 1
    ).otherwise(0)
    local = (
        b.withColumn("__start", start)
        .groupBy(*key_cols, "__block")
        .agg(
            F.sum("__start").alias("__n_local"),
            F.count("*").alias("__n_events"),
            F.min(ts_long).alias("__first_ts"),
            F.max(ts_long).alias("__last_ts"),
        )
    )
    w2 = Window.partitionBy(*key_cols).orderBy("__block")
    prev_last = F.lag("__last_ts").over(w2)
    cont = F.when(
        prev_last.isNotNull() & (F.col("__first_ts") - prev_last <= gap_sec), 1
    ).otherwise(0)
    return (
        local.withColumn("__cont", cont)
        .groupBy(*key_cols)
        .agg(
            (F.sum("__n_local") - F.sum("__cont")).cast("long").alias("session_count"),
            F.sum("__n_events").alias("event_count"),
        )
    )
