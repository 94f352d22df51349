"""Streaming HLL: a continuously-maintained distinct-count sketch.

Extends ST1/ST5 (streaming/pipeline.py) with the sketch family
(operators/sketches.py): each micro-batch builds registers for its rows
and MAX-merges them into the persistent register table. Because register
merge is idempotent AND commutative (element-wise MAX), the sink tolerates
at-least-once batch delivery with no transactional sink — replaying a
micro-batch cannot change the merged state (tested). This is the standard
trick that makes sketch maintenance trivially exactly-once-equivalent
where a count-based metrics sink (ST5) needs idempotent writes.

State size is O(groups × m) regardless of stream volume — the register
table is re-written per batch via staging + atomic directory swap (same
pattern as the MERGE fallback), which at 100 TB is a metadata-sized write,
not a data rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import HLL_M, hll_registers


def merge_register_tables(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Element-wise MAX merge of two HLL register tables."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def stream_hll_registers(
    spark: SparkSession,
    landing_dir: str,
    target_path: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    schema: str,
    m: int = HLL_M,
    max_files_per_trigger: int = 1,
):
    """Maintain an HLL register table over a JSON landing stream. Returns
    the StreamingQuery (availableNow trigger — drains what's there)."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        regs = hll_registers(batch_df, group_cols, value_col, m=m)
        if os.path.exists(target_path):
            regs = merge_register_tables(
                spark.read.parquet(target_path), regs, group_cols
            )
        staging = f"{target_path}.__staging__{uuid.uuid4().hex[:8]}"
        regs.write.mode("overwrite").parquet(staging)
        backup = f"{target_path}.__old__{uuid.uuid4().hex[:8]}"
        existed = os.path.exists(target_path)
        if existed:
            os.rename(target_path, backup)
        os.rename(staging, target_path)
        if existed:
            shutil.rmtree(backup, ignore_errors=True)

    return (
        raw.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
