"""Recall trend artifact (VERDICT r7/r9 item: recall floors): runs the ANN
quality evals — q146 (LSH recall@5 vs exact) and q148 (truncated-dim
recall@5 vs exact) — at sf0.001 / sf0.01 / sf0.1 and writes
RECALL_r{N}.json with per-query recall_bp plus min/mean per (query, sf).

Every pipeline under eval is fully deterministic (md5 hyperplanes,
5-dp-rounded cosine, id tie-breaks), so these numbers are exact constants
per SF: the committed artifact is a TREND LINE, and
tests/test_retrieval_quality.py pins the sf0.001 floors — an LSH or
codebook regression that drops recall flips the suite red instead of
sliding silently.

Usage: PYTHONPATH=. python tools/gen_recall.py <round>   # e.g. r10
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
    "sf0.1": "/root/testdata/sf0.1",
}
EVALS = ("q146_ann_recall_eval", "q148_truncated_dim_recall")


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "rX"
    from scraper_db_refine_merge_spark.plans.catalog import QUERIES
    from scraper_db_refine_merge_spark.session import get_spark

    spark = get_spark("gen_recall")
    doc: dict = {"evals": {}}
    for name in EVALS:
        doc["evals"][name] = {}
        for sf, sf_dir in SF_DIRS.items():
            rows = sorted(
                (r["query_id"], r["recall_bp"])
                for r in QUERIES[name](spark, sf_dir).collect()
            )
            bps = [bp for _, bp in rows]
            doc["evals"][name][sf] = {
                "per_query_bp": dict(rows),
                "min_bp": min(bps),
                "mean_bp": round(sum(bps) / len(bps), 1),
            }
            print(f"{name} {sf}: min {min(bps)} mean {doc['evals'][name][sf]['mean_bp']}")
    out = os.path.join(ROOT, f"RECALL_{rnd}.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
