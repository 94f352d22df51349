"""Adjudicate the q44 multimodal floor claim (VERDICT r11 item 2).

q44's bench ratio (~43x vs DuckDB at sf0.1, 0.47 s vs 0.011 s) was DECLINED
as a fixed Python-worker + Arrow-batch startup floor in r11, but without a
supporting measurement. This tool produces it: the q44 kernel (mapInPandas
feature extraction + rollup) runs over 1x/2x/4x/8x row-replicated inputs in
ONE session (python worker reuse confirmed from the session conf), warm,
min-of-3 per volume. A linear fit time = floor + slope * volume separates
the fixed per-job cost from the marginal per-row cost:

- floor >> slope * 1x  ->  the 43x IS startup floor; at any real volume the
  marginal throughput dominates and the ratio collapses (claim PROVEN);
- floor ~ slope * 1x   ->  the kernel itself is slow (claim REFUTED).

Usage: PYTHONPATH=. python tools/measure_q44_floor.py [sf_dir]
Prints one JSON line; paste the numbers into ROADMAP/PLANS notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from scraper_db_refine_merge_spark.multimodal.binary import extract_features
    from scraper_db_refine_merge_spark.plans.multimodalq import media_from_documents
    from scraper_db_refine_merge_spark.session import get_spark

    spark = get_spark("q44_floor")
    reuse = spark.conf.get("spark.python.worker.reuse", "true")

    def media_at(k: int):
        # k-fold row replication with distinct media ids: volume scales,
        # group count stays 3, so the aggregate output is constant-sized
        # and timing differences isolate the mapInPandas kernel.
        m = media_from_documents(spark, sf_dir)
        if k == 1:
            return m
        return m.withColumn("__rep", F.explode(F.sequence(F.lit(1), F.lit(k)))).withColumn(
            "media_id", F.concat_ws("_", "media_id", "__rep")
        ).drop("__rep")

    def run(k: int) -> float:
        feats = extract_features(media_at(k))
        q = feats.groupBy("media_type").agg(
            F.count("*").alias("n_items"),
            F.countDistinct("content_hash").alias("n_distinct_hashes"),
            F.sum("size_bytes").alias("total_bytes"),
        )
        q.count()  # warm (workers forked, Arrow inited, codegen JIT'd)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q.count()
            best = min(best, time.perf_counter() - t0)
        return best

    vols = [1, 2, 4, 8]
    times = {k: round(run(k), 4) for k in vols}

    # least-squares fit time = floor + slope * k
    n = len(vols)
    sx = sum(vols)
    sy = sum(times[k] for k in vols)
    sxx = sum(k * k for k in vols)
    sxy = sum(k * times[k] for k in vols)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    floor = (sy - slope * sx) / n

    n_rows = media_at(1).count()
    floor_share = floor / times[1] if times[1] else None
    out = {
        "metric": "q44_floor_fit",
        "sf_dir": sf_dir,
        "rows_at_1x": n_rows,
        "python_worker_reuse": reuse,
        "times_by_volume": times,
        "floor_sec": round(floor, 4),
        "marginal_sec_per_1x": round(slope, 4),
        "marginal_us_per_row": round(slope / n_rows * 1e6, 1),
        "floor_share_at_1x": round(floor_share, 3) if floor_share else None,
        # The r11 claim was "the bench-volume time is startup floor, and it
        # amortizes at scale": proven iff the fixed intercept dominates the
        # 1x time. Marginal µs/row is the scale-path throughput to judge
        # separately (it includes Arrow transfer + the replication explode,
        # an upper bound on the kernel itself).
        "verdict": (
            "floor-dominated at 1x (claim proven)"
            if floor_share and floor_share > 0.6
            else "marginal-dominated at 1x (claim refuted)"
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
