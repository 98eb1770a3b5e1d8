"""Map the driver's `events` table onto the canonical event-log model.

The reference stores Entries under (space, segment, sequence) with a
server-assigned timestamp (/root/reference/server/messages.go:61-69).
The driver's `events` table has no space/segment, so we derive them
deterministically:

- space    = event_type                      (5 spaces)
- segment  = 'seg' || (user_id % 8)          (8 segments per space)
- sequence = row_number over (space, segment) ordered by (ts, event_id)
             -- gapless, starting at 1, like the reference's produce path
             (/root/reference/server/pebble/service.go:345-363)
- payload  = props (JSON string; the reference's payload is opaque bytes)

`EVENT_LOG_CTE` is the identical mapping as a DuckDB CTE so every verb
query has an ANSI-SQL oracle.

Scale note: the row_number window shuffles once on (space, segment) —
exactly the partitioning every downstream verb query wants, so at 100 TB
this materializes as one co-partitioned layout (write with
partitionBy('space') + sort within partitions) rather than a per-query
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_spark.sources.tables import load_table

NUM_SEGMENTS = 8

EVENT_LOG_CTE = """
WITH events_log AS (
  SELECT
    event_type AS space,
    'seg' || CAST(user_id % 8 AS VARCHAR) AS segment,
    ROW_NUMBER() OVER (
      PARTITION BY event_type, user_id % 8
      ORDER BY ts, event_id
    ) AS sequence,
    ts AS timestamp,
    event_id,
    user_id,
    value,
    props AS payload
  FROM events
)
"""


def event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("space", "segment").orderBy("ts", "event_id")
    return (
        ev.withColumn("space", F.col("event_type"))
        .withColumn(
            "segment",
            F.concat(F.lit("seg"), (F.col("user_id") % NUM_SEGMENTS).cast("string")),
        )
        .withColumn("sequence", F.row_number().over(w))
        .select(
            "space",
            "segment",
            "sequence",
            F.col("ts").alias("timestamp"),
            "event_id",
            "user_id",
            "value",
            F.col("props").alias("payload"),
        )
    )
