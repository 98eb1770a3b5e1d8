"""Parquet table source for the driver's synthetic star schema.

Reads are plain `spark.read.parquet` so Catalyst predicate pushdown and
column pruning reach the scan (the reference hand-codes key-range pruning
into its LSM iterator — /root/reference/server/pebble/service.go:270-280;
here the same job is done by Parquet row-group stats + pushed filters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from streams_spark.schema import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, which Spark 4 rejects
        # outright (PARQUET_TYPE_ILLEGAL) unless the legacy conf maps it
        # to epoch-nanos long. The conf is runtime-settable SQL conf, so
        # set it here rather than at session build time — callers (the
        # test harness, external drivers) may hand us a bare session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # The data is micro-precision (verified: ns % 1000 == 0), so
        # integer-dividing to micros is lossless and matches DuckDB.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NOTE on partitioning: each testdata file is one unsplittable row
    # group, so scans are single-task at harness scale. A measured A/B of
    # an eager round-robin fan-out (repartition(cores) after read) made
    # the bench ~2x SLOWER overall: the shuffle of raw rows plus the loss
    # of partial-aggregation locality (32 partitions each holding agg
    # state for every key instead of one perfect-locality pass) outweigh
    # the extra scan parallelism at MB-scale inputs. On a real cluster the
    # many splittable files parallelize the scan without any of this.
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (name == table name).

    Routed through ``load_table`` so the `events` view carries the same
    converted micro-precision timestamp column as the DataFrame path —
    a raw view would silently expose `ts` as epoch-nanos BIGINT.
    """
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
