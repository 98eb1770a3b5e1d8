"""Interchange-format connectors (JSONL / CSV) for the canonical event log.

The reference speaks exactly one wire shape: a JSON envelope around a
snappy-compressed binary Entry (/root/reference/server/encoders.go:17-123,
/root/reference/server/messages.go:314-342). Parquet replaces the binary
codec (store.py); these connectors replace the JSON envelope — the
import/export surface for moving event logs in and out of other systems.

Design rules, applied at any scale:

- **Explicit schema on read, always.** Schema inference is a full extra
  pass over the data (100 TB read twice) and can silently change types
  between files; both readers bind EVENT_LOG_SCHEMA up front.
- **Deterministic codecs for non-native types.** JSON has no binary and
  CSV has neither binary nor maps, so payload travels as base64 and
  metadata (CSV only) as a JSON string — encoded/decoded explicitly with
  built-in functions rather than relying on datasource-specific coercion.
- **Same layout contract as the Parquet store.** Writes partition by
  `space`, so partition pruning works on the interchange copies too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streams_spark.schema import EVENT_LOG_SCHEMA

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # ISO-8601, micros, explicit zone


def _wire_schema(metadata_as_json: bool) -> T.StructType:
    """EVENT_LOG_SCHEMA with payload as base64 string (and, for CSV,
    metadata as a JSON string)."""
    fields = []
    for f in EVENT_LOG_SCHEMA.fields:
        if f.name == "payload":
            fields.append(T.StructField("payload_b64", T.StringType(), True))
        elif f.name == "metadata" and metadata_as_json:
            fields.append(T.StructField("metadata_json", T.StringType(), True))
        else:
            fields.append(f)
    return T.StructType(fields)


def _encode(df: DataFrame, metadata_as_json: bool) -> DataFrame:
    out = df.withColumn("payload_b64", F.base64("payload")).drop("payload")
    if metadata_as_json:
        out = out.withColumn("metadata_json", F.to_json("metadata")).drop(
            "metadata"
        )
    return out


def _decode(df: DataFrame, metadata_as_json: bool) -> DataFrame:
    out = df.withColumn("payload", F.unbase64("payload_b64")).drop("payload_b64")
    if metadata_as_json:
        out = out.withColumn(
            "metadata",
            F.from_json("metadata_json", "map<string,string>"),
        ).drop("metadata_json")
    # restore canonical column order
    return out.select(*[f.name for f in EVENT_LOG_SCHEMA.fields])


def write_event_log_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export the event log as space-partitioned JSON lines."""
    (
        _encode(df, metadata_as_json=False)
        .write.mode(mode)
        .partitionBy("space")
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_event_log_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return _decode(
        spark.read.schema(_wire_schema(metadata_as_json=False))
        .option("timestampFormat", _TS_FMT)
        .json(path),
        metadata_as_json=False,
    )


def write_event_log_csv(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export the event log as space-partitioned CSV with a header row.
    CSV carries neither maps nor binary, so metadata travels as a JSON
    string and payload as base64."""
    (
        # column order pinned to the read-side wire schema: the reader
        # maps by POSITION (enforceSchema), so relying on _encode's
        # append-order would silently shear columns if EVENT_LOG_SCHEMA
        # ever grows or reorders
        _encode(df, metadata_as_json=True)
        .select(*[f.name for f in _wire_schema(metadata_as_json=True).fields])
        .write.mode(mode)
        .partitionBy("space")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        # explicit NULL sentinel: with the default ("" for both), an
        # empty payload/string is indistinguishable from NULL on read
        # and came back as NULL (round-trip corruption). The writer
        # keeps its default emptyValue (QUOTED ""), which the reader's
        # emptyValue="" maps back to an empty string — an unquoted
        # empty field would be parsed as null regardless of options.
        .option("nullValue", "\\N")
        .csv(path)
    )


def read_event_log_csv(spark: SparkSession, path: str) -> DataFrame:
    return _decode(
        spark.read.schema(_wire_schema(metadata_as_json=True))
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path),
        metadata_as_json=True,
    )


def write_event_log_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export the event log as space-partitioned ORC.

    ORC is Spark-native and carries the FULL canonical schema — binary
    payload and map<string,string> metadata included — so no wire codec
    is needed; it is the zero-loss interchange format for systems in the
    Hive/Trino ecosystem (as Parquet is for ours). Same partition layout
    as the Parquet store, so partition pruning holds on exported copies.
    """
    df.write.mode(mode).partitionBy("space").orc(path)


def read_event_log_orc(spark: SparkSession, path: str) -> DataFrame:
    # explicit schema, same rule as the other readers: never infer on a
    # 100 TB read. ORC's native types round-trip binary + map exactly.
    return (
        spark.read.schema(EVENT_LOG_SCHEMA)
        .orc(path)
        .select(*[f.name for f in EVENT_LOG_SCHEMA.fields])
    )


def write_event_log_xml(df: DataFrame, path: str, mode: str = "error") -> None:
    """Export the event log as space-partitioned XML (Spark 4 native XML
    source; one <entry> element per record). XML carries neither maps
    nor binary, so the same wire codec as CSV applies: metadata as a
    JSON string, payload as base64."""
    (
        _encode(df, metadata_as_json=True)
        .write.mode(mode)
        .partitionBy("space")
        .format("xml")
        .option("rowTag", "entry")
        .option("timestampFormat", _TS_FMT)
        .save(path)
    )


def read_event_log_xml(spark: SparkSession, path: str) -> DataFrame:
    # explicit schema, like every reader here: inference on XML is a
    # full extra pass AND type-guesses stringly fields (a base64 payload
    # that happens to be digits becomes a number).
    return _decode(
        spark.read.schema(_wire_schema(metadata_as_json=True))
        .format("xml")
        .option("rowTag", "entry")
        .option("timestampFormat", _TS_FMT)
        .load(path),
        metadata_as_json=True,
    )



# ---------------------------------------------------------------------------
# Raw media ingestion: binaryFile directory scan -> canonical media table
# ---------------------------------------------------------------------------


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest a directory of raw media files into the canonical media
    shape (`operators/multimodal.py`): Spark's built-in `binaryFile`
    source yields (path, modificationTime, length, content); we derive
    doc_id (stable 64-bit hash of the FULL path — the key is
    path-scoped; re-ingesting from a moved directory yields new ids),
    doc_key (md5 of the path: the COLLISION-SAFE identity — at billions
    of files the 64-bit doc_id's birthday bound makes silent merges
    expected, so scale joins key on doc_key or meta.source), media_type
    (extension), and the typed metadata struct the decode operators
    expect.

    Scale: binaryFile is a real FileFormat — directory listing is
    distributed, each file is one task (files are unsplittable blobs),
    and `pathGlobFilter` prunes at listing time, before any read. For
    billions of small objects the production pattern is the same schema
    over an object-store manifest + grouped fetch inside mapInPandas;
    the downstream operators are source-agnostic either way.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = (
        F.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("doc_id"),
        F.md5(F.col("path")).alias("doc_key"),
        media_type.alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            F.col("length").cast("long").alias("declared_len"),
        ).alias("meta"),
    )
