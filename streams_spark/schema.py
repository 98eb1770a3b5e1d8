"""Canonical schemas.

The event-log schema mirrors the reference Entry struct
(/root/reference/server/messages.go:61-69): Space/Segment names, a gapless
per-segment Sequence, a server-assigned ms Timestamp, transaction identity,
an opaque Payload and string-map Metadata. See SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql import types as T

EVENT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("space", T.StringType(), False),
        T.StructField("segment", T.StringType(), False),
        T.StructField("sequence", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("trx_id", T.StringType(), True),
        T.StructField("trx_node", T.StringType(), True),
        T.StructField("trx_number", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# Driver-provided tables at /root/testdata/sf*/ (TESTDATA.md).
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
