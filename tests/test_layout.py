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
