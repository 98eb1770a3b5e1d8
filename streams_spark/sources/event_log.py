"""Map the driver's `events` table onto the canonical event-log model.

The reference stores Entries under (space, segment, sequence) with a
server-assigned timestamp (/root/reference/server/messages.go:61-69).
The driver's `events` table has no space/segment, so we derive them
deterministically:

- space    = event_type                      (5 spaces)
- segment  = 'seg' || (user_id % 8)          (8 segments per space)
- sequence = row_number over (space, segment) ordered by
             (ts, event_id, value, props) -- gapless, starting at 1, like
             the reference's produce path
             (/root/reference/server/pebble/service.go:345-363); the
             trailing keys make the order total under corrupt re-ingest
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
      ORDER BY ts, event_id NULLS LAST, value NULLS LAST, props NULLS LAST
    ) AS sequence,
    ts AS timestamp,
    event_id,
    user_id,
    value,
    props AS payload
  FROM events
)
"""


def event_log(
    spark: SparkSession,
    sf_dir: str,
    spaces: list[str] | None = None,
    segments: list[str] | None = None,
    max_timestamp=None,
    with_metadata: bool = False,
    numbered: bool = True,
) -> DataFrame:
    """Canonical event log, with explicit predicate pushdown BELOW the
    sequence-assignment window (the analog of the reference turning
    predicates into LSM key bounds — /root/reference/server/pebble/
    service.go:270-280):

    - `spaces` / `segments` restrict the window's own partition keys, so
      numbering is unaffected; at 100 TB these are partition-pruned reads.
    - `max_timestamp` drops a SUFFIX of each segment's (ts, event_id)
      order; row_number counts only preceding rows, so surviving sequence
      values are identical — prefix-safe pushdown Catalyst can't infer.

    `with_metadata=True` additionally projects the canonical Entry fields
    the reference carries on every record (/root/reference/server/
    messages.go:61-69): `metadata map<string,string>` (the only
    user-queryable payload field, parsed from the props JSON) and the
    transaction identity `trx_id`/`trx_node`/`trx_number` (derived
    deterministically; the reference stamps these server-side at produce
    time — server/pebble/service.go:345-363). Off by default so the core
    verb schema stays the reference's wire Entry shape.

    Min-bounds (offsets, min_sequence, min_timestamp) would renumber and
    MUST stay residual filters above the window — callers pass only the
    safe bounds here and keep the rest in streams_spark.client.
    """
    ev = load_table(spark, sf_dir, "events")
    if spaces is not None:
        ev = ev.where(F.col("event_type").isin(list(spaces)))
    if segments is not None:
        segs = [int(s.removeprefix("seg")) for s in segments]
        ev = ev.where((F.col("user_id") % NUM_SEGMENTS).isin(segs))
    if max_timestamp is not None:
        ev = ev.where(F.col("ts") <= F.lit(max_timestamp))
    # value/props extend the order so it is TOTAL even when corrupt
    # re-ingest produces two events sharing (ts, event_id) but
    # disagreeing on payload — a partial order would pair sequences
    # with values nondeterministically per engine (fuzz finding r6);
    # for well-formed logs (unique event_id) the extra keys are inert
    # NULLS LAST explicitly: Spark's ascending default is nulls-first,
    # DuckDB's is nulls-last — the tie-break keys must agree on where a
    # NULL payload sorts or degenerate ties renumber differently
    # ts/event_id also pin NULLS LAST: Spark's ascending default is
    # nulls-first, DuckDB's is nulls-last, so a NULL ts or event_id
    # would renumber sequences differently per engine (ADVICE r6);
    # inert for well-formed logs where both are non-NULL
    w = Window.partitionBy("space", "segment").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("value").asc_nulls_last(),
        F.col("props").asc_nulls_last(),
    )
    cols = [
        F.col("space"),
        F.col("segment"),
        *([F.col("sequence")] if numbered else []),
        F.col("ts").alias("timestamp"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
        F.col("props").alias("payload"),
    ]
    if with_metadata:
        cols += [
            F.from_json(F.col("props"), "map<string,string>").alias("metadata"),
            F.md5(F.concat_ws(":", "event_type", "event_id")).alias("trx_id"),
            F.concat(F.lit("node"), (F.col("event_id") % 4).cast("string")).alias(
                "trx_node"
            ),
            F.col("event_id").alias("trx_number"),
        ]
    out = ev.withColumn("space", F.col("event_type")).withColumn(
        "segment",
        F.concat(F.lit("seg"), (F.col("user_id") % NUM_SEGMENTS).cast("string")),
    )
    if numbered:
        out = out.withColumn("sequence", F.row_number().over(w))
    return out.select(*cols)
