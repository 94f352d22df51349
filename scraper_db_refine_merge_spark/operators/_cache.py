"""Cache lifecycle for operator-internal persisted indexes.

Several operators materialize a small intermediate index with ``persist()``
(the MinHash signature/candidate tables in ``operators/dedup.py``, the LSH
bucket table in ``operators/similarity.py``). Spark ties cached blocks to
the *plan*, so repeated calls with identical inputs reuse the same cache —
but a long-lived session that calls these operators over MANY different
inputs accumulates cached blocks in executor storage (ADVICE r4).

CALLERS OWN THE CACHE LIFECYCLE: every operator-internal persist goes
through :func:`persist_tracked`, and a long-lived session should call
:func:`release_caches` once the results of a pipeline run are fully
materialized (after the terminal action — unpersisting earlier would
re-trigger the work the cache exists to avoid, because the returned
DataFrames are lazy views over the cached tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """``df.persist()`` registered in the module-level cache registry."""
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked operator cache; returns how many were freed.

    Safe to call at any time — blocking=False, so in-flight jobs that still
    read a cached block simply recompute it.
    """
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n
