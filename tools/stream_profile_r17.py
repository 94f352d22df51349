"""Round-17 streaming-replay profile (VERDICT r16 item 5): per-microbatch
timing breakdown for the two census-top replays q57 (foreachBatch MERGE
ingest) and q80 (stream-stream interval join), plus a same-session A/B of
the r17 stream_ingest stats fix (MergeStats were computed and DISCARDED
per batch when no metrics sink was configured).

Why the replays cannot use "fewer, larger microbatches" (guide §2.1): the
batch boundaries are what the queries VERIFY —
- q57's three batches land three sequential keyed MERGEs whose ORDER is
  the last-writer-wins proof; one batch would collapse them into a single
  within-batch dedup and stop exercising cross-batch upsert ordering.
- q80's (and q60's) watermark proofs depend on the watermark advancing
  BETWEEN batches: the late row in batch N is dropped because of the
  watermark computed after earlier batches — in one batch nothing is late.
So the honest optimization target is the per-batch machinery, and the
committed evidence is this breakdown.

Usage: PYTHONPATH=. python tools/stream_profile_r17.py [sf_dir]
Prints one JSON object with per-batch durationMs (from a
StreamingQueryListener) and min-of-N walls per arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from scraper_db_refine_merge_spark.session import get_spark  # noqa: E402


class _Collector(StreamingQueryListener):
    def __init__(self):
        self.batches: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        d = dict(p.durationMs or {})
        self.batches.append(
            {
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "triggerExecution_ms": d.get("triggerExecution"),
                "addBatch_ms": d.get("addBatch"),
                "getBatch_ms": d.get("getBatch"),
                "latestOffset_ms": d.get("latestOffset"),
                "queryPlanning_ms": d.get("queryPlanning"),
                "walCommit_ms": d.get("walCommit"),
                "commitOffsets_ms": d.get("commitOffsets"),
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(os.environ.get("SPARK_GRAFT_STREAM_PROFILE_RUNS", "3"))
    spark = get_spark("stream_profile_r17")
    spark.range(1).count()

    from scraper_db_refine_merge_spark.plans import streamq
    from scraper_db_refine_merge_spark.sources.tables import load_table
    from scraper_db_refine_merge_spark.streaming import pipeline as pl

    load_table(spark, sf_dir, "documents").count()
    collector = _Collector()
    spark.streams.addListener(collector)

    out: dict = {"sf_dir": sf_dir, "runs_per_arm": runs}

    # --- q57: A/B the stats fix (old behavior emulated by forcing
    # collect_stats=True through the pipeline's merge_upsert call).
    real_merge = pl.merge_upsert

    def merge_with_stats(*a, **k):
        k["collect_stats"] = True
        return real_merge(*a, **k)

    for arm, patch in (("q57_stats_discarded_old", merge_with_stats), ("q57_fixed", real_merge)):
        pl.merge_upsert = patch
        streamq.q57_stream_replay(spark, sf_dir).count()  # warm (codegen, json reader)
        walls = []
        for i in range(runs):
            collector.batches.clear()
            t0 = time.perf_counter()
            streamq.q57_stream_replay(spark, sf_dir).count()
            walls.append(round(time.perf_counter() - t0, 3))
            time.sleep(1)  # let the last progress event land
        out[arm] = {
            "walls": walls,
            "min": min(walls),
            "per_batch_last_run": list(collector.batches),
        }
    pl.merge_upsert = real_merge

    # --- q80: per-batch breakdown only (no machinery knob to cut; the
    # batch structure is the watermark proof).
    streamq.q80_stream_stream_join(spark, sf_dir).count()  # warm
    walls = []
    for i in range(runs):
        collector.batches.clear()
        t0 = time.perf_counter()
        streamq.q80_stream_stream_join(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
        time.sleep(1)
    out["q80"] = {
        "walls": walls,
        "min": min(walls),
        "per_batch_last_run": list(collector.batches),
    }

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
