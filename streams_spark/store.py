"""Event-log storage layout: canonical write, read, and maintenance.

SURVEY.md §1.2's Spark mapping of the reference's dual-indexed LSM: one
Parquet table partitioned by `space`, sorted within files by
(`segment`, `sequence`) so Parquet row-group min/max stats prune both
query shapes (per-segment sequence scans and per-space time scans)
without a second physical copy of the data.

Maintenance: an append-heavy produce path (one file per micro-batch per
partition) accumulates small files — the classic streaming-sink problem
the reference never has (its LSM compacts internally). `compact()` is
the explicit analog of LSM compaction: rewrite each space partition into
few large sorted files. At 100 TB this runs per-partition (space) as an
independent job, so compaction parallelism == partition count and a
failed compaction affects one partition only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_event_log(df: DataFrame, log_dir: str, mode: str = "append") -> None:
    """Canonical layout: partitioned by space, files sorted by
    (segment, sequence) so row-group stats serve both sort orders."""
    # the sort leads with the partition column: the file writer requires
    # rows ordered by partition cols and would otherwise insert its own
    # (non-stable) sort, destroying the (segment, sequence) order
    (
        df.repartition("space")
        .sortWithinPartitions("space", "segment", "sequence")
        .write.mode(mode)
        .partitionBy("space")
        .parquet(log_dir)
    )


def read_event_log(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.parquet(log_dir)


def log_file_stats(spark: SparkSession, log_dir: str) -> dict[str, int]:
    """Files per space partition (the small-file pressure gauge)."""
    out: dict[str, int] = {}
    for entry in sorted(os.listdir(log_dir)):
        if entry.startswith("space="):
            space = entry.split("=", 1)[1]
            part_dir = os.path.join(log_dir, entry)
            out[space] = sum(
                1 for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
    return out


def compact(
    spark: SparkSession,
    log_dir: str,
    spaces: list[str] | None = None,
    files_per_space: int = 1,
) -> None:
    """Rewrite each space partition into `files_per_space` sorted files.

    Per-partition dynamic overwrite (`replaceWhere`-style via
    partitionOverwriteMode=dynamic) so untouched spaces keep their files;
    readers see the old files until the atomic directory swap. Sequence
    order within the new files is restored by sortWithinPartitions, so
    compaction preserves the layout contract of write_event_log.
    """
    df = read_event_log(spark, log_dir)
    if spaces is not None:
        df = df.where(F.col("space").isin(spaces))
    with _dynamic_overwrite(spark):
        (
            df.repartition(files_per_space, "space")
            .sortWithinPartitions("space", "segment", "sequence")
            .write.mode("overwrite")
            .partitionBy("space")
            .parquet(log_dir)
        )


class _dynamic_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.key = "spark.sql.sources.partitionOverwriteMode"

    def __enter__(self):
        self.prev = self.spark.conf.get(self.key, "static")
        self.spark.conf.set(self.key, "dynamic")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set(self.key, self.prev)
        return False


# ---------------------------------------------------------------------------
# Bucketed tables: shuffle-free co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted managed table. Two tables bucketed the
    same way join WITHOUT any exchange — the pre-shuffled layout is the
    Spark analog of co-locating related segments on one node, and the
    right call for repeatedly-joined 100 TB fact tables (pay the shuffle
    once at write time, never at read time)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
