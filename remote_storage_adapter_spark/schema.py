"""Canonical schemas (SURVEY.md §1).

The storage schema mirrors the reference's ClickHouse table
(``clickhouse/sqlscripts/0001-create-table.sql:1-13``)::

    date Date | name String | tags Array(String) | val Float64
    | ts DateTime | updated DateTime

with one Spark-side addition: a ``labels map<string,string>`` companion
column so matchers compile to O(1) ``element_at`` lookups instead of
array scans (the array form is kept for wire-format parity).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Post-flatten ingest row (reference `model.Sample`, main.go:377-394):
#: one row per sample, labels include ``__name__``.
SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("val", T.DoubleType(), False),
    ]
)

#: Wire shape of a remote-write request before flattening
#: (prompb.WriteRequest; consumed at main.go:301-308).
WRITE_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField(
            "timeseries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "labels",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType(), False),
                                        T.StructField("value", T.StringType(), False),
                                    ]
                                )
                            ),
                            False,
                        ),
                        T.StructField(
                            "samples",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("value", T.DoubleType(), False),
                                        T.StructField("timestamp", T.LongType(), False),
                                    ]
                                )
                            ),
                            False,
                        ),
                    ]
                )
            ),
            False,
        )
    ]
)

#: Canonical at-rest table (ClickHouse DDL + labels companion).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("val", T.DoubleType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("updated", T.TimestampType(), False),
    ]
)

#: Flat read-path result (clickhouse/query.go:17 SELECT list).
READ_RESULT_COLUMNS = ["cnt", "t", "name", "tags", "value"]

#: Partition column of the at-rest table (clickhouse DDL partition key).
PARTITION_COLUMN = "date"

#: Sort-within-partition keys approximating the MergeTree primary key
#: ``(name, tags, ts)`` for parquet row-group min/max skipping.
SORT_COLUMNS = ["name", "ts"]
