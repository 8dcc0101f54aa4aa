"""Driver-provided parquet tables (TESTDATA.md).

`spark.read.parquet` gives the vectorized parquet scan; every query in
the engine is written so filters/projections reach the scan
(`PushedFilters` / `ReadSchema` in `.explain("formatted")`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: (session id, sf_dir, table) → analyzed DataFrame. Caches the *plan*
#: (file listing + schema inference done once per session), never data;
#: the driver's testdata tables are immutable, so this is safe.
_PLAN_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = _load_table(spark, sf_dir, name)
    _PLAN_CACHE[key] = df
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS,false) parquet, which Spark's
        # reader rejects; read the raw int64 ns and convert to a
        # microsecond timestamp (what DuckDB does implicitly).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            # integer DIV: float division loses sub-µs bits at 1e18 ns
            # and can round the timestamp up by 1 µs vs DuckDB's
            # truncation
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            from pyspark.sql import functions as F

            # fallback when inferTimestampNTZ=false (session.py) is
            # locked by the session owner: NTZ → LTZ in the UTC
            # session is a wall-clock no-op but restores the epoch
            # casts (cast to long / unix_timestamp) NTZ forbids
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
