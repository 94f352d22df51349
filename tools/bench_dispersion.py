"""Bench dispersion runner (VERDICT r6 item 3): N independent bench.py
process runs → BENCH_LOCAL_r{N}.json with per-run totals, same-run
Spark/oracle ratios, and a per-query median table. The standing evidence
against host drift: the shared host's speed moves ±30% across a round
(the DuckDB oracle itself drifts), so same-run RATIOS — not absolutes —
are the metric, and one committed run is never the only datapoint.

Usage: PYTHONPATH=. python tools/bench_dispersion.py <round> [n_runs]
Appends runs to an intermediate JSONL so batches can be spread across the
round (run 3 in the morning, 3 at night — drift becomes visible instead
of invisible); the final JSON is rewritten after every batch.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once() -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py", "--no-throughput"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": ROOT},
        timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "rX"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    jsonl = os.path.join(ROOT, f".bench_runs_{rnd}.jsonl")
    final = os.path.join(ROOT, f"BENCH_LOCAL_{rnd}.json")

    for i in range(n):
        rec = run_once()
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(
            f"run {i + 1}/{n}: spark {rec['value']} oracle {rec.get('oracle_total')} "
            f"ratio {round(rec['value'] / rec['oracle_total'], 3) if rec.get('oracle_total') else '?'}",
            flush=True,
        )

    all_runs = [json.loads(l) for l in open(jsonl)]
    # Guard (ADVICE r7): a run recorded without oracle totals (oracle
    # skipped / crashed) must not crash the final rewrite after all the
    # bench time was spent — drop it from ratio stats and say so.
    runs = [r for r in all_runs if r.get("oracle_total")]
    n_dropped = len(all_runs) - len(runs)
    if not runs:
        print(f"no runs with oracle totals ({n_dropped} dropped); nothing to aggregate")
        return 1
    spark_totals = [r["value"] for r in runs]
    oracle_totals = [r["oracle_total"] for r in runs]
    ratios = [round(s / o, 3) for s, o in zip(spark_totals, oracle_totals)]
    names = list(runs[0]["queries"])
    per_query = {}
    for q in names:
        sv = sorted(r["queries"][q] for r in runs)
        ov = sorted(r["oracle_queries"][q] for r in runs)
        per_query[q] = {
            "min": sv[0],
            "median": round(statistics.median(sv), 3),
            "max": sv[-1],
            "oracle_min": ov[0],
            "oracle_median": round(statistics.median(ov), 3),
            "ratio_of_medians": round(
                statistics.median(sv) / max(statistics.median(ov), 1e-9), 2
            ),
        }
        # r14 (VERDICT r13 item 4): floor-adjusted ratio. The floor is the
        # same query's same-session wall time at the smallest SF (bench.py
        # SPARK_GRAFT_BENCH_FLOORS=1 — the measure_q44_floor volume-scaling
        # methodology): fixed job cost a 1000-executor run pays once, not
        # per-row. (spark_median − floor_median)/oracle_median exposes the
        # MARGINAL cost, so a real per-row regression can't hide under a
        # floor-dominated raw ratio (q43/q44/q47).
        fv = sorted(r["floor_queries"][q] for r in runs if q in r.get("floor_queries", {}))
        if fv:
            fm = statistics.median(fv)
            per_query[q]["floor_median"] = round(fm, 3)
            per_query[q]["floor_adjusted_ratio_of_medians"] = round(
                max(statistics.median(sv) - fm, 0.0)
                / max(statistics.median(ov), 1e-9),
                2,
            )
    doc = {
        "n_runs": len(runs),
        "sf": runs[0]["sf"],
        "methodology": (
            "bench.py serial min-of-2 per query per independent process run, "
            "runs spread across the round so host drift is visible; same-run "
            "Spark/DuckDB ratios are the metric (the oracle itself drifts "
            "with host load)."
        ),
        "spark_totals": spark_totals,
        "oracle_totals": oracle_totals,
        "per_run_ratio": ratios,
        "spark_total_median": round(statistics.median(spark_totals), 3),
        "oracle_total_median": round(statistics.median(oracle_totals), 3),
        "median_per_run_ratio": round(statistics.median(ratios), 3),
        "runs_dropped_no_oracle": n_dropped,
        "per_query": per_query,
    }
    adj = [
        v["floor_adjusted_ratio_of_medians"]
        for v in per_query.values()
        if "floor_adjusted_ratio_of_medians" in v
    ]
    if adj:
        doc["median_floor_adjusted_ratio"] = round(statistics.median(adj), 3)
        doc["median_ratio_of_medians_raw"] = round(
            statistics.median(v["ratio_of_medians"] for v in per_query.values()), 3
        )
    with open(final, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{final}: {len(runs)} runs, median ratio {doc['median_per_run_ratio']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
