"""Compaction and clustered-write layout operators.

Verifies the properties the operators promise: compaction preserves the
row multiset while collapsing file count; clustered writes produce
non-overlapping per-file key ranges (checked against real parquet footer
stats via pyarrow) that engines skip on.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from scraper_db_refine_merge_spark.operators.layout import (
    compact,
    table_file_stats,
    write_clustered,
)
from scraper_db_refine_merge_spark.sources.tables import load_table


@pytest.fixture()
def fragmented_table(spark, sf_dir, tmp_path):
    """documents written as many small files."""
    path = str(tmp_path / "frag")
    d = load_table(spark, sf_dir, "documents")
    d.repartition(17).write.parquet(path)
    return path, d


def _multiset(spark, path):
    return sorted(
        (r["doc_id"], r["n_chars"]) for r in spark.read.parquet(path).select("doc_id", "n_chars").collect()
    )


def test_compact_collapses_files_preserves_rows(spark, fragmented_table):
    path, d = fragmented_table
    before_rows = _multiset(spark, path)
    res = compact(spark, path, target_file_bytes=1 << 30)
    assert res["compacted"]
    assert res["before"]["n_files"] == 17
    assert res["after"]["n_files"] == 1
    assert res["after"]["total_bytes"] > 0
    assert _multiset(spark, path) == before_rows


def test_compact_noop_below_threshold(spark, sf_dir, tmp_path):
    path = str(tmp_path / "single")
    load_table(spark, sf_dir, "documents").coalesce(1).write.parquet(path)
    res = compact(spark, path, min_files_to_compact=2)
    assert not res["compacted"]
    assert res["after"] == res["before"]


def test_table_file_stats_empty_dir(tmp_path):
    stats = table_file_stats(str(tmp_path))
    assert stats["n_files"] == 0 and stats["total_bytes"] == 0


def test_write_clustered_disjoint_file_ranges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "clustered")
    d = load_table(spark, sf_dir, "documents")
    write_clustered(d, path, ["doc_id"], num_files=4)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "doc_id"
            )
            assert col.statistics is not None and col.statistics.has_min_max
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file key ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # round-trips the full table
    assert spark.read.parquet(path).count() == d.count()


def _file_spans(path, col):
    """(min, max) of `col` per parquet file, from footer stats."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            mins.append(c.statistics.min)
            maxs.append(c.statistics.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_write_zordered_multi_dim_locality(spark, tmp_path):
    """Z-ordered files have narrow spans in BOTH dimensions; a plain
    (a, b) sort gives narrow spans on `a` only — the trailing dimension
    stays near-global in every file."""
    from scraper_db_refine_merge_spark.operators.layout import write_zordered

    n, grid = 16384, 128
    df = spark.range(n).select(
        (F.col("id") % grid).alias("x"),
        (F.col("id") / grid).cast("long").alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    df.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y").write.parquet(spath)

    def med_span(path, col):
        spans = sorted(hi - lo for lo, hi in _file_spans(path, col))
        return spans[len(spans) // 2]

    # z-order: both dims localized (each file ≈ a 32x32 quadrant of the
    # 128x128 grid); lexicographic: x localized, y span stays ~global
    assert med_span(zpath, "x") <= grid // 2
    assert med_span(zpath, "y") <= grid // 2
    assert med_span(spath, "y") > grid // 2  # the 1D-sort failure mode
    # round-trip
    assert spark.read.parquet(zpath).count() == n


def test_zorder_file_skip_rate_trailing_dim_predicate(spark, tmp_path):
    """Quantified file-skip: for a predicate on the TRAILING cluster
    dimension only (y range, x unconstrained) — the query shape linear
    (x, y) sort cannot serve — count the files whose min/max stats
    intersect the predicate. Z-order must skip most files; the 1-D sort
    skips none. This is the measurement behind choosing Z-order for
    multi-dimension pruning at 100 TB: files touched IS the scan cost."""
    from scraper_db_refine_merge_spark.operators.layout import write_zordered

    n, grid, files = 16384, 128, 16
    df = spark.range(n).select(
        (F.col("id") % grid).alias("x"),
        (F.col("id") / grid).cast("long").alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], num_files=files)
    df.repartitionByRange(files, "x", "y").sortWithinPartitions("x", "y").write.parquet(spath)

    lo, hi = 0, grid // 8 - 1  # y in [0, 15]: 1/8 of the domain

    def files_touched(path):
        spans = _file_spans(path, "y")
        return sum(1 for mn, mx in spans if not (mx < lo or mn > hi)), len(spans)

    z_touched, z_total = files_touched(zpath)
    s_touched, s_total = files_touched(spath)
    # z-order: the 16 files tile a 4x4 quadrant grid; y∈[0,15] clips the
    # top row → ≤ 2/4 of files even with imperfect range boundaries
    assert z_touched <= z_total // 2, (z_touched, z_total)
    # 1-D sort: y is near-global in every file — nothing skips
    assert s_touched == s_total, (s_touched, s_total)
