"""Skip/limit pagination (SURVEY P12/O5).

The reference paginates with Mongo's ``.skip(skip).limit(limit)``
(database/api_server.py:280). Spark has no native OFFSET on DataFrames, so a
page is a ``row_number`` window over the caller's total order.

Scale note: a global row_number over an unpartitioned window collapses to a
single task. For the page sizes the reference allows (limit ≤ 200,
api_server.py:254-258) we first ``limit(skip+limit)`` — Spark plans this as a
TakeOrderedAndProject (per-partition top-k + merge on the driver of at most
skip+limit rows), so no executor ever materializes the full sort. Deep
pagination at 100 TB should use keyset pagination instead (filter on the last
seen sort key) — provided via ``paginate_after``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def paginate(df: DataFrame, order_by: list[Column], skip: int, limit: int) -> DataFrame:
    """OFFSET/LIMIT page over a deterministic total order.

    ``order_by`` must be a total order (include a unique tie-break key) or
    page boundaries are nondeterministic.
    """
    if skip < 0 or limit <= 0:
        raise ValueError("skip must be >= 0 and limit > 0")
    top = df.orderBy(*order_by).limit(skip + limit)
    w = Window.orderBy(*order_by)
    return (
        top.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > skip) & (F.col("__rn") <= skip + limit))
        .drop("__rn")
    )


def paginate_after(df: DataFrame, sort_key: Column, last_seen, limit: int) -> DataFrame:
    """Keyset pagination: rows strictly after ``last_seen`` in sort order.

    O(limit) work per page at any depth — the scale-correct alternative to
    OFFSET for deep pages; the filter pushes down to the scan.
    """
    page = df.filter(sort_key > F.lit(last_seen)) if last_seen is not None else df
    return page.orderBy(sort_key.asc()).limit(limit)
