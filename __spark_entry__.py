"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``remote_storage_adapter_spark.queries`` — the
operator registry with paired DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from remote_storage_adapter_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: matcher + time-range +
    dynamic-downsample quantile read (the reference's core read path,
    clickhouse/query.go:17)."""
    return Q.q_read_downsample_q75(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
