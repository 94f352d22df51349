"""The Delta MERGE branch (operators/merge.py _merge_upsert_delta) driven
through a minimal in-memory double of the delta-spark API (VERDICT r5
item 6): the real package cannot run here — see the blocking-constraint
note at the top of operators/merge.py — but the branch's logic (within-
batch dedup before MERGE, the keyed merge condition, UpdateAll/InsertAll
wiring, operationMetrics-based stats) is fully exercised against upsert
semantics simulated the way Delta applies them. The double records every
call, so a drift in how the branch drives the API fails loudly here even
without delta-spark installed.
"""

from __future__ import annotations

import sys
import types

from pyspark.sql import functions as F


class _FakeMergeBuilder:
    def __init__(self, table, source_df, cond):
        self.table, self.source_df, self.cond = table, source_df, cond
        self.calls = []

    def whenMatchedUpdateAll(self):
        self.calls.append("whenMatchedUpdateAll")
        return self

    def whenNotMatchedInsertAll(self):
        self.calls.append("whenNotMatchedInsertAll")
        return self

    def execute(self):
        self.calls.append("execute")
        assert self.calls == ["whenMatchedUpdateAll", "whenNotMatchedInsertAll", "execute"]
        src = {tuple(r[k] for k in self.table.key_cols): r.asDict() for r in self.source_df.collect()}
        updated = inserted = 0
        for key, row in src.items():
            if key in self.table.rows:
                self.table.rows[key] = row
                updated += 1
            else:
                self.table.rows[key] = row
                inserted += 1
        self.table.last_metrics = {
            "numTargetRowsUpdated": str(updated),
            "numTargetRowsInserted": str(inserted),
        }
        self.table.merge_conditions.append(self.cond)


class _FakeDeltaTable:
    _stores: dict = {}

    def __init__(self, path, key_cols):
        self.path, self.key_cols = path, key_cols
        self.rows: dict = {}
        self.last_metrics: dict = {}
        self.merge_conditions: list = []
        self._alias = None
        self._spark = None

    # --- the surface _merge_upsert_delta drives -------------------------
    @classmethod
    def isDeltaTable(cls, spark, path):
        return path in cls._stores

    @classmethod
    def forPath(cls, spark, path):
        t = cls._stores[path]
        t._spark = spark
        return t

    def alias(self, a):
        self._alias = a
        return self

    def merge(self, source_df, cond):
        self._pending = _FakeMergeBuilder(self, source_df, cond)
        return self._pending

    def history(self, n):
        spark = self._spark
        return spark.createDataFrame([(self.last_metrics,)], "operationMetrics map<string,string>")

    def toDF(self):
        spark = self._spark
        return spark.createDataFrame(list(self.rows.keys()), "k long") if self.rows else spark.range(0)


def _install_fake_delta(monkeypatch, key_cols):
    tables_mod = types.ModuleType("delta.tables")

    class DeltaTable(_FakeDeltaTable):
        pass

    # "write.format('delta').save" path: intercept by pre-creating on save —
    # the fake DataFrameWriter hook below registers the initial table.
    tables_mod.DeltaTable = DeltaTable
    delta_mod = types.ModuleType("delta")
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    return DeltaTable


def test_delta_branch_create_then_merge(spark, monkeypatch):
    from scraper_db_refine_merge_spark.operators import merge as mg

    DeltaTable = _install_fake_delta(monkeypatch, ["k"])
    # the real availability check also wants the session extension, which a
    # running sandbox session cannot gain — the double stands in for both
    monkeypatch.setattr(mg, "delta_available", lambda s=None: True)

    # the initial-create write goes through df.write.format("delta") — stub
    # the save to register the table in the fake store instead of writing
    import pyspark.sql.readwriter as rw

    real_format = rw.DataFrameWriter.format
    created = {}

    def fake_format(self, fmt):
        if fmt == "delta":
            class _W:
                def __init__(self, df):
                    self.df = df

                def mode(self, m):
                    return self

                def save(self, path):
                    t = DeltaTable(path, ["k"])
                    t.rows = {(r["k"],): r.asDict() for r in self.df.collect()}
                    DeltaTable._stores[path] = t
                    created["path"] = path

            return _W(self._df)
        return real_format(self, fmt)

    monkeypatch.setattr(rw.DataFrameWriter, "format", fake_format)

    path = "/fake/delta/table"
    DeltaTable._stores.pop(path, None)

    # batch 1: within-batch dup (k=1 twice, ts picks the winner) + creates
    b1 = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "two")], "k long, ts long, v string"
    )
    stats = mg.merge_upsert(
        spark, path, b1, ["k"], [F.col("ts").desc()], backend="delta"
    )
    assert created["path"] == path
    assert stats.total_incoming == 3 and stats.within_batch_duplicates == 1
    assert stats.inserted == 2 and stats.updated == 0 and stats.target_rows_after == 2
    assert DeltaTable._stores[path].rows[(1,)]["v"] == "new"  # latest won

    # batch 2: one update, one insert — exercises the MERGE path
    b2 = spark.createDataFrame([(2, 9, "two2"), (3, 1, "three")], "k long, ts long, v string")
    stats = mg.merge_upsert(spark, path, b2, ["k"], [F.col("ts").desc()], backend="delta")
    t = DeltaTable._stores[path]
    assert t.merge_conditions == ["t.`k` = s.`k`"]
    assert stats.updated == 1 and stats.inserted == 1 and stats.within_batch_duplicates == 0
    assert stats.target_rows_after == 3
    assert t.rows[(2,)]["v"] == "two2"


def test_backend_delta_refuses_without_extension(spark):
    """backend='delta' must raise the documented error when delta-spark /
    the session extension is absent (the sandbox state)."""
    import pytest

    from scraper_db_refine_merge_spark.operators import merge as mg

    if mg.delta_available(spark):
        pytest.skip("delta actually installed here")
    with pytest.raises(RuntimeError, match="delta-spark"):
        mg.merge_upsert(
            spark, "/tmp/nope", spark.range(1).withColumnRenamed("id", "k"), ["k"], backend="delta"
        )
