"""Regenerate the per-round local oracle artifacts (VERDICT r5 item 7):

- LOCAL_ORACLE_r{N}.json      — FULL catalog vs DuckDB at sf0.01 (the
  driver's correctness SF), streaming replays included.
- LOCAL_ORACLE_SF01_r{N}.json — batch queries re-verified at sf0.1.
  Streaming replays and store-fold harnesses are excluded there (their
  inputs are harness-authored batches, not the sf tables) and covered by
  the third artifact instead:
- LOCAL_ORACLE_STREAM_SF01_r{N}.json — the streaming replay / store-fold
  family driven from the sf0.1 tables (VERDICT r9 item 7: the family was
  only ever verified at sf0.01). HARNESS_ID_CAP (plans/streamq.py) is a
  no-op at sf0.1 ids, so every replay ingests the full 10× batch volume —
  a real volume check on the foreachBatch MERGE / watermark / store-fold
  paths, still oracle-compared row-for-row.

Usage: PYTHONPATH=. python tools/gen_oracle_artifacts.py <round>   # e.g. 6
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import run  # noqa: E402

# harness-driven replays / store folds — identical at every SF by design
STREAMING_REPLAYS = {
    "q57_stream_replay", "q60_stream_windowed_counts", "q62_stream_dedup",
    "q63_incremental_rollup", "q65_stream_session_windows", "q77_stream_hll",
    "q80_stream_stream_join", "q88_stream_cms", "q91_stream_kmv",
    "q94_stream_histogram", "q101_stream_static_join", "q102_incremental_components",
    "q104_stream_scd2_enrich", "q108_stream_qdigest",
    "q110_component_store_time_travel", "q113_incremental_minhash_index",
    "q116_component_store_cdc",
}


def main() -> int:
    rnd = int(sys.argv[1])
    from scraper_db_refine_merge_spark.plans.catalog import QUERIES

    full = run("/root/testdata/sf0.01")
    with open(f"LOCAL_ORACLE_r{rnd:02d}.json", "w") as f:
        json.dump(full, f, indent=1, default=str)
    n_bad = sum(1 for r in full.values() if r.get("status") not in ("OK", "rows_only"))
    print(f"sf0.01 full: {len(full)} queries, {n_bad} failing")

    batch = [q for q in QUERIES if q not in STREAMING_REPLAYS]
    sf01 = run("/root/testdata/sf0.1", batch)
    with open(f"LOCAL_ORACLE_SF01_r{rnd:02d}.json", "w") as f:
        json.dump(sf01, f, indent=1, default=str)
    n_bad1 = sum(1 for r in sf01.values() if r.get("status") not in ("OK", "rows_only"))
    print(f"sf0.1 batch: {len(sf01)} queries, {n_bad1} failing")

    stream = run("/root/testdata/sf0.1", sorted(STREAMING_REPLAYS))
    with open(f"LOCAL_ORACLE_STREAM_SF01_r{rnd:02d}.json", "w") as f:
        json.dump(stream, f, indent=1, default=str)
    n_bad2 = sum(
        1 for r in stream.values() if r.get("status") not in ("OK", "rows_only")
    )
    print(f"sf0.1 streaming replays: {len(stream)} queries, {n_bad2} failing")
    return 1 if (n_bad or n_bad1 or n_bad2) else 0


if __name__ == "__main__":
    sys.exit(main())
