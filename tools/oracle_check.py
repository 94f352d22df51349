"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its DuckDB oracle on the same parquet
tables, normalizes both results (columns sorted by name, rows sorted, values
canonicalized), and reports row-count / schema / value equality per query.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def _canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].astype(object).where(pd.notnull(df[cols]), None)
    rows = [tuple(_canon_value(v) for v in row) for row in out.itertuples(index=False, name=None)]
    return sorted(rows)


def run(sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from scraper_db_refine_merge_spark.plans.catalog import ORACLES, QUERIES
    from scraper_db_refine_merge_spark.session import get_spark
    from scraper_db_refine_merge_spark.sources.tables import TABLE_NAMES

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        rec: dict = {"oracle": name in ORACLES}
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            rec["spark_cols"] = sorted(spdf.columns)
            # this session runs the whole catalog: release operator-internal
            # persisted indexes between queries (operators/_cache.py —
            # callers own the cache lifecycle)
            from scraper_db_refine_merge_spark.operators._cache import release_caches
            release_caches()
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"spark: {type(e).__name__}: {e}"
            results[name] = rec
            continue
        if name not in ORACLES:
            rec["status"] = "rows_only"
            results[name] = rec
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"duckdb: {type(e).__name__}: {e}"
            results[name] = rec
            continue
        rec["oracle_rows"] = len(odf)
        rec["oracle_cols"] = sorted(odf.columns)
        if rec["spark_cols"] != rec["oracle_cols"]:
            rec["status"] = "SCHEMA_MISMATCH"
        elif rec["spark_rows"] != rec["oracle_rows"]:
            rec["status"] = "ROWCOUNT_MISMATCH"
        else:
            s_rows, o_rows = canonize(spdf), canonize(odf)
            if s_rows == o_rows:
                rec["status"] = "OK"
            else:
                rec["status"] = "VALUE_MISMATCH"
                diffs = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ][:3]
                rec["diff_sample"] = diffs
        results[name] = rec
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    results = run(sf_dir, names)
    bad = 0
    for name, rec in sorted(results.items()):
        status = rec.get("status", "ERROR")
        line = f"{name:32s} {status:18s} rows={rec.get('spark_rows', '?')}"
        if "error" in rec:
            line += f"  {rec['error'][:220]}"
            bad += 1
        elif status not in ("OK", "rows_only"):
            bad += 1
            if "diff_sample" in rec:
                line += f"\n    spark : {rec['diff_sample'][0][0]}\n    oracle: {rec['diff_sample'][0][1]}"
        print(line)
    print(f"\n{len(results)} queries, {bad} failing")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
