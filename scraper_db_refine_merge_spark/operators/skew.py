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
  tiny reduction — so no task ever sorts a whole hot key.

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
