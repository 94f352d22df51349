"""SQLite operational-store source (SURVEY S3/S4/S13).

The reference's bronze layer is a SQLite table ``scraped_events`` with a
JSON blob column (ventura_crawler.py:187-240), read by the ETL with
``SELECT ... WHERE success = 1 AND event_data IS NOT NULL``
(etl_sqlite_to_mongo.py:60-70) and per-row JSON decode (:81-86).

Two paths:
- ``read_sqlite_jdbc`` — the cluster path: Spark JDBC with pushed-down
  predicate and ``numPartitions`` splits. Requires a SQLite JDBC driver jar
  on the classpath (not shipped in this container — the call is gated).
- ``read_sqlite_local`` — driver-side sqlite3 → createDataFrame. Correct for
  an *operational* store (the reference's SQLite is a single-node scratch
  DB, inherently small); documented as NOT the 100 TB path.

Either way, ``decode_event_data`` applies the S4 JSON-in-column decode with
an explicit schema (from_json, PERMISSIVE semantics: unparseable → null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCRAPED_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("event_data", T.StringType()),
        T.StructField("extraction_method", T.StringType()),
        T.StructField("last_scraped_utc", T.StringType()),
        T.StructField("success", T.IntegerType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("response_time_ms", T.DoubleType()),
        T.StructField("status_code", T.IntegerType()),
    ]
)

# raw event_data blob shape (FIXTURES.md §3 adapter input)
EVENT_DATA_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("date_text", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("price_text", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField(
            "lineup",
            T.ArrayType(
                T.StructType(
                    [T.StructField("name", T.StringType()), T.StructField("role", T.StringType())]
                )
            ),
        ),
        T.StructField("genres", T.ArrayType(T.StringType())),
        T.StructField("description", T.StringType()),
    ]
)


def read_sqlite_jdbc(
    spark: SparkSession,
    db_path: str,
    table: str = "scraped_events",
    successful_only: bool = True,
    num_partitions: int = 8,
) -> DataFrame:
    """Cluster path: JDBC scan with predicate pushdown (S3).

    The WHERE clause ships to SQLite via the dbtable subquery; partitioned
    reads split on rowid ranges.
    """
    predicate = "WHERE success = 1 AND event_data IS NOT NULL" if successful_only else ""
    sub = f"(SELECT *, rowid AS __rid FROM {table} {predicate}) AS t"
    return (
        spark.read.format("jdbc")
        .option("url", f"jdbc:sqlite:{db_path}")
        .option("dbtable", sub)
        .option("partitionColumn", "__rid")
        .option("numPartitions", num_partitions)
        .option("lowerBound", 0)
        .option("upperBound", 1 << 31)
        .load()
        .drop("__rid")
    )


def read_sqlite_local(
    spark: SparkSession, db_path: str, table: str = "scraped_events", successful_only: bool = True
) -> DataFrame:
    """Driver-side path for the small operational DB (no JDBC jar needed)."""
    import sqlite3

    cols = [f.name for f in SCRAPED_EVENTS_SCHEMA.fields]
    where = "WHERE success = 1 AND event_data IS NOT NULL" if successful_only else ""
    with sqlite3.connect(db_path) as conn:
        rows = conn.execute(f"SELECT {', '.join(cols)} FROM {table} {where}").fetchall()
    return spark.createDataFrame(rows, SCRAPED_EVENTS_SCHEMA)


def decode_event_data(df: DataFrame, schema: T.StructType = EVENT_DATA_SCHEMA) -> DataFrame:
    """S4 — JSON-in-column decode (etl_sqlite_to_mongo.py:81-86): parse the
    blob into typed columns alongside the operational metadata."""
    return df.withColumn("event", F.from_json(F.col("event_data"), schema))


def sqlite_to_raw_rows(df: DataFrame) -> DataFrame:
    """Shape decoded bronze rows into the refine() input contract."""
    decoded = decode_event_data(df)
    e = F.col("event")
    return decoded.select(
        F.coalesce(e["title"], F.col("title")).alias("title"),
        F.col("url"),
        e["venue"].alias("venue"),
        e["date_text"].alias("date_text"),
        e["lineup"].alias("lineup"),
        e["price_text"].alias("price_text"),
        e["genres"].alias("genres"),
        e["description"].alias("description"),
    )
