"""Registry entries for the reference verb surface (SURVEY.md §2.2-2.4).

Each query pairs the DataFrame implementation in `streams_spark.client`
with a DuckDB oracle over the identical event-log mapping (EVENT_LOG_CTE).
Bounds are fixed constants chosen inside the events table's Jan-2024 span
so the queries are deterministic at every scale factor.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streams_spark import client
from streams_spark.registry import register
from streams_spark.sources.event_log import EVENT_LOG_CTE, event_log

MIN_TS = dt.datetime(2024, 1, 8)
MAX_TS = dt.datetime(2024, 1, 22)
OFFSET_TS = dt.datetime(2024, 1, 15)


@register(
    "v_get_spaces",
    oracle=EVENT_LOG_CTE
    + "SELECT space FROM events_log GROUP BY space ORDER BY space",
)
def v_get_spaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.get_spaces(event_log(spark, sf_dir))


@register(
    "v_get_segments",
    oracle=EVENT_LOG_CTE
    + "SELECT segment FROM events_log WHERE space = 'click' "
    "GROUP BY segment ORDER BY segment",
)
def v_get_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.get_segments(event_log(spark, sf_dir, spaces=["click"]), "click")


@register(
    "v_peek_all",
    oracle=EVENT_LOG_CTE
    + """
-- TOTAL tie-break matching client._peek_key: a duplicated max sequence
-- (corrupt re-ingest, copies disagreeing on payload — seeded-fuzz
-- class) must pick the same winner as Spark's max_by; NULLs are
-- coalesced to type minima so row comparison never hits engine-specific
-- NULL ordering. The payload enters the order as the identical
-- 'v'+md5 digest Spark's key uses ('' for NULL, strictly below any
-- value) — hash order, not lexicographic, but the SAME deterministic
-- total order in both engines, at fixed width (r7)
SELECT space, segment, sequence, timestamp, event_id, user_id,
       value, payload
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY space, segment
    ORDER BY sequence DESC,
             coalesce(timestamp, TIMESTAMP '1970-01-01') DESC,
             coalesce(event_id, -4611686018427387904) DESC,
             coalesce(user_id, -4611686018427387904) DESC,
             coalesce(value, CAST('-infinity' AS DOUBLE)) DESC,
             CASE WHEN payload IS NULL THEN ''
                  ELSE 'v' || md5(payload) END DESC) AS rn
  FROM events_log
) WHERE rn = 1
""",
)
def v_peek_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused tail peek (r7): sequence numbering + top-1 collapse into
    one aggregate — client.peek_all_tail docstring has the plan
    argument; the oracle still derives the same rows through the full
    numbered CTE, proving the fusion is semantics-preserving."""
    return client.peek_all_tail(event_log(spark, sf_dir, numbered=False))


@register(
    "v_consume_segment",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment, sequence, timestamp, event_id, user_id, value, payload
FROM events_log
WHERE space = 'click' AND segment = 'seg3'
  AND sequence > 10 AND sequence <= 200
  AND timestamp > TIMESTAMP '2024-01-08 00:00:00'
  AND timestamp <= TIMESTAMP '2024-01-22 00:00:00'
""",
)
def v_consume_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.consume_segment(
        event_log(
            spark, sf_dir, spaces=["click"], segments=["seg3"], max_timestamp=MAX_TS
        ),
        "click",
        "seg3",
        min_sequence=10,
        max_sequence=200,
        min_timestamp=MIN_TS,
        max_timestamp=MAX_TS,
    )


@register(
    "v_consume_space",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment, sequence, timestamp, event_id, user_id, value, payload
FROM events_log
WHERE space = 'view'
  AND timestamp > TIMESTAMP '2024-01-08 00:00:00'
  AND timestamp <= TIMESTAMP '2024-01-22 00:00:00'
  AND (timestamp, segment, sequence) > (TIMESTAMP '2024-01-15 00:00:00', 'seg2', 5)
""",
)
def v_consume_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.consume_space(
        event_log(spark, sf_dir, spaces=["view"], max_timestamp=MAX_TS),
        "view",
        min_timestamp=MIN_TS,
        max_timestamp=MAX_TS,
        offset=(OFFSET_TS, "seg2", 5),
    )


@register(
    "v_consume_interleave",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment, sequence, timestamp, event_id, user_id, value, payload
FROM events_log
WHERE (
        (space = 'click' AND (timestamp, segment, sequence) >
            (TIMESTAMP '2024-01-15 00:00:00', 'seg0', 0))
     OR (space = 'purchase')
     OR (space = 'error')
  )
  AND timestamp <= TIMESTAMP '2024-01-22 00:00:00'
""",
)
def v_consume_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.consume(
        event_log(
            spark,
            sf_dir,
            spaces=["click", "purchase", "error"],
            max_timestamp=MAX_TS,
        ),
        offsets={
            "click": (OFFSET_TS, "seg0", 0),
            "purchase": None,
            "error": None,
        },
        max_timestamp=MAX_TS,
    )


@register(
    "v_space_offset",
    oracle=EVENT_LOG_CTE
    + """
, top AS (
  SELECT timestamp, segment, sequence
  FROM events_log WHERE space = 'signup'
  ORDER BY timestamp DESC, segment DESC, sequence DESC LIMIT 1
)
-- epoch zero-fill ONLY for the empty-space case: a winner row whose ts
-- is NULL (all-NULL-ts degenerate fixture, r9) reports its timestamp
-- AS IS, matching Spark's whole-struct coalesce which never rewrites
-- individual winner fields — the same pin the segment field got in r8
SELECT CASE WHEN EXISTS (SELECT 1 FROM top)
            THEN (SELECT timestamp FROM top)
            ELSE TIMESTAMP '1970-01-01 00:00:00' END AS offset_timestamp,
       -- zero-fill '' ONLY for the empty-space case: a winner row whose
       -- segment derivation is NULL (NULL user_id, r8 3%-NULL probe)
       -- reports its segment AS IS, matching Spark's whole-struct
       -- coalesce which never rewrites individual winner fields
       CASE WHEN EXISTS (SELECT 1 FROM top)
            THEN (SELECT segment FROM top) ELSE '' END AS offset_segment,
       coalesce((SELECT sequence FROM top), 0)   AS offset_sequence
""",
)
def v_space_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.get_space_offset(event_log(spark, sf_dir, spaces=["signup"]), "signup")


@register(
    "v_segment_offset",
    oracle=EVENT_LOG_CTE
    + "SELECT coalesce(max(sequence), 0) AS offset_sequence "
    "FROM events_log "
    "WHERE space = 'purchase' AND segment = 'seg5'",
)
def v_segment_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.get_segment_offset(
        event_log(spark, sf_dir, spaces=["purchase"], segments=["seg5"]),
        "purchase",
        "seg5",
    )


@register(
    "v_sequence_validate",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment,
       count(*) AS n_entries,
       max(sequence) AS max_sequence,
       CAST(sum(CASE WHEN sequence != coalesce(prev_seq, 0) + 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM (
  SELECT space, segment, sequence,
         lag(sequence) OVER (PARTITION BY space, segment ORDER BY sequence)
             AS prev_seq
  FROM events_log
)
GROUP BY space, segment
""",
)
def v_sequence_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client.sequence_violations(event_log(spark, sf_dir))


@register(
    "v_cluster_status",
    oracle="SELECT CAST(1 AS INTEGER) AS node_count",
)
def v_cluster_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GetClusterStatus analog (/root/reference/server/pebble/
    service.go:136-140): active node count. Exactly 1 in any local-mode
    session (single host = single-node deployment), hence the constant
    oracle; on a real cluster the same code reports the executor-host
    count."""
    return client.get_cluster_status(spark)


@register(
    "v_metadata_filter",
    oracle=EVENT_LOG_CTE
    + """
SELECT space,
       count(*) AS n_entries,
       CAST(min(try_cast(payload->>'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(try_cast(payload->>'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events_log
WHERE try_cast(payload->>'k' AS BIGINT) > 90
GROUP BY space
""",
)
def v_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query over the canonical Entry metadata map — the reference's only
    user-queryable payload field (`Metadata map[string]string`,
    /root/reference/server/messages.go:66). The event-log mapping parses
    the props JSON into a real MapType column (`with_metadata=True` in
    sources/event_log.py); filtering and extracting stay JVM-side
    (from_json + element access, no Python). try_cast, not cast: the
    reference's metadata values are free-form strings
    (map[string]string), so a non-numeric value must filter out as
    NULL, not abort the scan under ANSI mode (fuzz finding r6)."""
    log = event_log(spark, sf_dir, with_metadata=True)
    k = F.try_element_at(F.col("metadata"), F.lit("k")).try_cast("long")
    return (
        log.withColumn("k", k)
        .where(F.col("k") > 90)
        .groupBy("space")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "v_produce_status",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment,
       min(sequence) AS first_sequence,
       max(sequence) AS last_sequence,
       min(timestamp) AS first_timestamp,
       max(timestamp) AS last_timestamp,
       count(*) AS n_entries
FROM events_log
WHERE timestamp > TIMESTAMP '2024-01-15 00:00:00'
GROUP BY space, segment
""",
)
def v_produce_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SegmentStatus for a produce window: first/last sequence and
    timestamp per segment of the batch — the reference's produce result
    and notification payload (SegmentStatus —
    /root/reference/server/messages.go:38-45, notify at
    server/pebble/service.go:388-392). One partial-agg'd groupBy; the
    min-timestamp bound stays a residual filter above sequence
    assignment (it would renumber if pushed below)."""
    log = event_log(spark, sf_dir)
    return (
        log.where(F.col("timestamp") > F.lit(OFFSET_TS))
        .groupBy("space", "segment")
        .agg(
            F.min("sequence").alias("first_sequence"),
            F.max("sequence").alias("last_sequence"),
            F.min("timestamp").alias("first_timestamp"),
            F.max("timestamp").alias("last_timestamp"),
            F.count(F.lit(1)).alias("n_entries"),
        )
    )


@register(
    "v_latest_entity_state",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, user_id, sequence, timestamp, event_id, value, payload
FROM (
  SELECT space, user_id, sequence, timestamp, event_id, value, payload,
         -- sequence completes the tie-break: duplicated input events
         -- share (timestamp, event_id) but receive distinct log
         -- sequences, so the order must include it to stay total
         -- (fuzz finding r6)
         row_number() OVER (PARTITION BY space, user_id
                            ORDER BY timestamp DESC, event_id DESC,
                                     sequence DESC) AS rn
  FROM events_log
)
WHERE rn = 1
""",
)
def v_latest_entity_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourcing state reconstruction: the latest entry per
    (space, entity) — the read-model analog of the reference's LSM
    "newest record wins" compaction (Pebble keeps the highest sequence
    per key; SeekLT serves Peek from it —
    /root/reference/server/pebble/service.go:820-840). Where Peek is
    per-SEGMENT head, this is per-ENTITY (user) current state: fold the
    whole changelog down to one row per key.

    One window on a high-cardinality composite key (space, user_id) —
    a single well-spread shuffle; at 100 TB this is the standard
    changelog→snapshot materialization and partitions by the same key
    the snapshot table would be bucketed on. row_number (not max_by) so
    tie-break on (timestamp, event_id) is total and deterministic.
    """
    log = event_log(spark, sf_dir)
    # sequence completes the tie-break (see the oracle comment)
    w = (
        Window.partitionBy("space", "user_id")
        .orderBy(F.desc("timestamp"), F.desc("event_id"), F.desc("sequence"))
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "space", "user_id", "sequence", "timestamp", "event_id",
            "value", "payload",
        )
    )


@register(
    "v_watermark_lag",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment, head_timestamp, space_head_timestamp,
       CAST(date_diff('second', head_timestamp, space_head_timestamp)
            AS BIGINT) AS lag_seconds
FROM (
  SELECT space, segment, max(timestamp) AS head_timestamp,
         max(max(timestamp)) OVER (PARTITION BY space)
             AS space_head_timestamp
  FROM events_log
  GROUP BY space, segment
)
""",
)
def v_watermark_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment staleness: how far each segment's head timestamp lags
    behind its space's global head — the monitoring view a consumer of
    the reference derives from SegmentStatus.LastTimestamp
    (/root/reference/server/messages.go:38-45) to find stalled
    producers. One partial-agg'd groupBy collapses the log to ~40 rows;
    the window max runs on that aggregate, so the second pass is free at
    any scale."""
    log = event_log(spark, sf_dir)
    heads = log.groupBy("space", "segment").agg(
        F.max("timestamp").alias("head_timestamp")
    )
    w = Window.partitionBy("space")
    return heads.select(
        "space",
        "segment",
        "head_timestamp",
        F.max("head_timestamp").over(w).alias("space_head_timestamp"),
        (
            F.unix_seconds(F.max("head_timestamp").over(w))
            - F.unix_seconds(F.col("head_timestamp"))
        ).alias("lag_seconds"),
    )


@register(
    "v_chunked_produce",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment,
       CAST((sequence - 1) // 100 AS BIGINT) AS chunk_id,
       min(sequence) AS first_sequence,
       max(sequence) AS last_sequence,
       min(timestamp) AS first_timestamp,
       max(timestamp) AS last_timestamp,
       count(*) AS n_entries
FROM events_log
GROUP BY space, segment, chunk_id
""",
)
def v_chunked_produce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChunkByCount analog: the reference re-batches an unbounded record
    stream into fixed-size transactions and returns one SegmentStatus
    per chunk (enumerators.ChunkByCount at
    /root/reference/server/pebble/service.go:308 — 10,000 for Pebble,
    100 for Azure Tables at server/azure/service.go:27,258). Batch
    equivalent: chunk_id = (sequence-1) div 100 per segment (the Azure
    chunk unit), aggregated to the per-chunk SegmentStatus the produce
    stream would have emitted. One partial-agg'd groupBy; at scale
    chunking is the micro-batch/commit-unit sizing knob, not a shuffle.
    """
    log = event_log(spark, sf_dir)
    return (
        log.withColumn(
            "chunk_id", ((F.col("sequence") - 1) / 100).cast("long")
        )
        .groupBy("space", "segment", "chunk_id")
        .agg(
            F.min("sequence").alias("first_sequence"),
            F.max("sequence").alias("last_sequence"),
            F.min("timestamp").alias("first_timestamp"),
            F.max("timestamp").alias("last_timestamp"),
            F.count(F.lit(1)).alias("n_entries"),
        )
    )


@register(
    "v_segment_manifest",
    oracle=EVENT_LOG_CTE
    + """
SELECT space, segment,
       count(*) AS n_entries,
       -- encode(), not CAST(... AS BLOB): the blob cast interprets
       -- backslash escapes and hard-errors on payloads containing a
       -- literal backslash (e.g. json-escaped unicode) — fuzz finding r6
       CAST(sum(octet_length(encode(payload))) AS BIGINT)
           AS payload_bytes,
       min(sequence) AS first_sequence,
       max(sequence) AS last_sequence,
       min(timestamp) AS first_timestamp,
       max(timestamp) AS last_timestamp,
       count(DISTINCT user_id) AS n_producers
FROM events_log
GROUP BY space, segment
""",
)
def v_segment_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment storage manifest: entry count, payload bytes, sequence
    and timestamp bounds, distinct producers — the batch analog of the
    stats the reference's storage layer keeps per segment for pruning and
    compaction decisions (the dual-index layout at
    /root/reference/server/pebble/store.go keys everything by
    (space, segment); GetSegments at server/pebble/service.go:172-186
    exposes only the segment names — this is the introspection its
    operators read off the LSM itself).

    Scale: one partial-agg'd shuffle on (space, segment) — the layout key
    the store is already partitioned by, so on the bucketed storage
    layout (store.write_bucketed) this is exchange-free; the manifest is
    segment-count-sized and drives partition pruning + compaction
    planning (store.compact).
    """
    log = event_log(spark, sf_dir)
    return log.groupBy("space", "segment").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.octet_length("payload")).alias("payload_bytes"),
        F.min("sequence").alias("first_sequence"),
        F.max("sequence").alias("last_sequence"),
        F.min("timestamp").alias("first_timestamp"),
        F.max("timestamp").alias("last_timestamp"),
        F.countDistinct("user_id").alias("n_producers"),
    )


@register(
    "v_flagship_consume_enrich",
    oracle=EVENT_LOG_CTE
    + """
, consumed AS (
  SELECT * FROM events_log
  WHERE (
          (space = 'click' AND (timestamp, segment, sequence) >
              (TIMESTAMP '2024-01-15 00:00:00', 'seg0', 0))
       OR (space = 'purchase')
       OR (space = 'error')
    )
    AND timestamp <= TIMESTAMP '2024-01-22 00:00:00'
)
SELECT c.space, date_trunc('hour', c.timestamp) AS hour, cu.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(c.value), 2) AS total_value,
       max(c.sequence) AS max_sequence
FROM consumed c JOIN customer cu ON c.user_id % 1000 = cu.c_custkey
GROUP BY 1, 2, 3
""",
)
def v_flagship_consume_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver-smoke flagship (`__spark_entry__.entry`), registered
    so it is oracle-gated like everything else: the reference's
    signature multi-space time-interleaved Consume (§3.3) fused with
    what it cannot do — broadcast-enrich each consumed event with a
    dimension and roll revenue up per (space, hour, market segment) in
    the same declarative plan. One consume scan, one broadcast join,
    one partial-agg'd rollup shuffle."""
    from pyspark.sql import functions as F

    from streams_spark.sources.tables import load_table

    consumed = v_consume_interleave(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        consumed.join(
            F.broadcast(customer),
            consumed.user_id % 1000 == customer.c_custkey,
        )
        .groupBy(
            "space",
            F.date_trunc("hour", "timestamp").alias("hour"),
            "c_mktsegment",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("sequence").alias("max_sequence"),
        )
    )
