"""Adjudicate the q125 skew-guard residual (r16, VERDICT r15 item 2).

q125's floor-adjusted EXT ratio (~6.3x vs DuckDB at sf0.1, 0.349 s vs
0.027 s) is the largest unadjudicated residual. The hypothesis (the q44
pattern): the salted TWO-PHASE latest-per-key runs two window exchanges +
a salt projection where DuckDB runs one vectorized window over a corpus
that fits one core's cache — so the gap is a fixed multi-stage job floor,
not a marginal-cost defect. This tool measures it: the q125 kernel (skew-
injected events, hottest key = half the corpus) at 1x/2x/4x/8x replicated
volume, BOTH forms — salted_latest_per_key and the naive single-window
latest_per_key — warm, min-of-3 per point, one session. A linear fit
time = floor + slope * volume separates fixed from marginal cost:

- salted floor >> salted slope * 1x AND salted slope <~ naive slope
  -> the 6.3x IS the two-phase floor; at real volume the marginal cost
     dominates and the salted form's straggler immunity is free or better
     (claim PROVEN);
- salted slope >> naive slope -> the two-phase itself scales worse
  (claim REFUTED — the guard needs trimming).

Usage: PYTHONPATH=. python tools/measure_q125_floor.py [sf_dir]
Prints one JSON line; paste into ROADMAP / PLANS notes.
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

    from scraper_db_refine_merge_spark.operators.merge import latest_per_key
    from scraper_db_refine_merge_spark.operators.skew import salted_latest_per_key
    from scraper_db_refine_merge_spark.session import get_spark
    from scraper_db_refine_merge_spark.sources.tables import load_table

    spark = get_spark("q125_floor")

    def skewed_at(k: int):
        # k-fold replication with distinct event_ids: volume scales, the
        # skew SHAPE is preserved (every even id still maps to user 0, so
        # the hot key grows with the corpus — the straggler regime the
        # salted form exists for).
        e = load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "event_type", "ts"
        )
        if k > 1:
            n = e.count()
            e = e.withColumn(
                "__rep", F.explode(F.sequence(F.lit(1), F.lit(k)))
            ).withColumn(
                "event_id", F.col("event_id") + (F.col("__rep") - 1) * F.lit(10 * n)
            ).drop("__rep")
        skewed = e.withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(F.col("user_id")),
        )
        return skewed.localCheckpoint()  # timings exclude the build

    order = [F.col("ts").desc(), F.col("event_id").desc()]

    def run_salted(df) -> int:
        return salted_latest_per_key(
            df, ["user_id"], order, salt_from=["event_id"], n_salts=16
        ).count()

    def run_naive(df) -> int:
        return latest_per_key(df, ["user_id"], order).count()

    points: dict[str, dict[int, float]] = {"salted": {}, "naive": {}}
    for k in (1, 2, 4, 8):
        df = skewed_at(k)
        for label, fn in (("salted", run_salted), ("naive", run_naive)):
            fn(df)  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(df)
                best = min(best, time.perf_counter() - t0)
            points[label][k] = round(best, 4)
        df.unpersist()

    def fit(d: dict[int, float]) -> tuple[float, float]:
        ks = sorted(d)
        n = len(ks)
        mx = sum(ks) / n
        my = sum(d[k] for k in ks) / n
        slope = sum((k - mx) * (d[k] - my) for k in ks) / sum(
            (k - mx) ** 2 for k in ks
        )
        return my - slope * mx, slope

    s_floor, s_slope = fit(points["salted"])
    n_floor, n_slope = fit(points["naive"])
    out = {
        "metric": "q125_volume_scaling",
        "sf_dir": sf_dir,
        "salted_sec": points["salted"],
        "naive_sec": points["naive"],
        "salted_fit": {"floor": round(s_floor, 4), "slope": round(s_slope, 4)},
        "naive_fit": {"floor": round(n_floor, 4), "slope": round(n_slope, 4)},
        "salted_over_naive_at_8x": round(
            points["salted"][8] / points["naive"][8], 3
        ),
        "floor_dominates_1x": bool(s_floor > s_slope),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
