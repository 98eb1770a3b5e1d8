"""Golden-count tests for the verb surface on the reference's own fixture.

Reproduces /root/reference/test/setup_data.go:92-112 (5 spaces x 5 segments
x 253 sequential records) and asserts the golden values of
/root/reference/test/streams_test.go: spaces list (:49-54), segments list
(:73-78), peek sequence == 253 (:98), segment count == 253 (:122), space
count == 1265 (:145), interleaved count == 6325 (:175).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from streams_spark import client

BASE_TS = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def fixture_log(spark):
    rows = []
    i = 0
    for sp in range(5):
        for seg in range(5):
            for seq in range(1, 254):
                rows.append(
                    (
                        f"space{sp}",
                        f"segment{seg}",
                        seq,
                        BASE_TS + dt.timedelta(milliseconds=i),
                        f"test data {seq}".encode(),
                    )
                )
                i += 1
    return spark.createDataFrame(
        rows, "space string, segment string, sequence long, timestamp timestamp, payload binary"
    )


def test_get_spaces(fixture_log):
    assert [r.space for r in client.get_spaces(fixture_log).collect()] == [
        f"space{i}" for i in range(5)
    ]


def test_get_segments(fixture_log):
    assert [
        r.segment for r in client.get_segments(fixture_log, "space0").collect()
    ] == [f"segment{i}" for i in range(5)]


def test_peek(fixture_log):
    row = client.peek(fixture_log, "space0", "segment0").collect()
    assert len(row) == 1 and row[0].sequence == 253
    assert bytes(row[0].payload) == b"test data 253"


def test_peek_empty_segment_returns_zero_value_entry(fixture_log):
    # Reference getLastEntry returns &Entry{} for a new/empty segment
    # (/root/reference/server/pebble/service.go:820-840): exactly one row,
    # sequence 0, null timestamp/payload (we keep the queried keys).
    rows = client.peek(fixture_log, "space0", "no_such_segment").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.space == "space0" and r.segment == "no_such_segment"
    assert r.sequence == 0
    assert r.timestamp is None and r.payload is None


def test_peek_strict_mode_matches_reference_zero_value(fixture_log):
    # strict=True pins the reference's &Entry{} EXACTLY
    # (/root/reference/server/pebble/service.go:832): empty-string keys
    # on an empty segment, untouched keys on a hit.
    r = client.peek(
        fixture_log, "space0", "no_such_segment", strict=True
    ).collect()[0]
    assert r.space == "" and r.segment == ""
    assert r.sequence == 0
    assert r.timestamp is None and r.payload is None
    hit = client.peek(fixture_log, "space0", "segment0", strict=True)
    row = hit.collect()[0]
    assert row.space == "space0" and row.segment == "segment0"
    assert row.sequence == 253


def test_peek_all(fixture_log):
    rows = client.peek_all(fixture_log).collect()
    assert len(rows) == 25
    assert all(r.sequence == 253 for r in rows)


def test_consume_segment_count(fixture_log):
    assert client.consume_segment(fixture_log, "space1", "segment2").count() == 253


def test_consume_segment_bounds_exclusive_inclusive(fixture_log):
    # (min, max] semantics: min_sequence=10 excludes 10, max_sequence=20 includes 20
    rows = client.consume_segment(
        fixture_log, "space0", "segment0", min_sequence=10, max_sequence=20
    ).collect()
    assert [r.sequence for r in rows] == list(range(11, 21))


def test_consume_space_count(fixture_log):
    assert client.consume_space(fixture_log, "space3").count() == 253 * 5


def test_consume_space_ordered_by_time(fixture_log):
    rows = client.consume_space(fixture_log, "space0").limit(10).collect()
    ts = [r.timestamp for r in rows]
    assert ts == sorted(ts)


def test_consume_interleave_count(fixture_log):
    offsets = {f"space{i}": None for i in range(5)}
    assert client.consume(fixture_log, offsets).count() == 253 * 25


def test_consume_offset_resume(fixture_log):
    # take the offset of the 100th entry of a space scan, resume after it,
    # and expect exactly the remaining entries — the reference's
    # ConsumerContext loop (consumer_context.go:57-94) in batch form
    first = client.consume_space(fixture_log, "space2").limit(100).collect()
    last = first[-1]
    resumed = client.consume_space(
        fixture_log, "space2", offset=(last.timestamp, last.segment, last.sequence)
    )
    assert resumed.count() == 253 * 5 - 100


def test_segment_offset(fixture_log):
    assert (
        client.get_segment_offset(fixture_log, "space4", "segment4").collect()[0][0]
        == 253
    )


def test_space_offset(fixture_log):
    row = client.get_space_offset(fixture_log, "space0").collect()[0]
    assert row.offset_sequence == 253


def test_sequence_violations_clean(fixture_log):
    rows = client.sequence_violations(fixture_log).collect()
    assert len(rows) == 25
    assert all(r.violations == 0 and r.max_sequence == 253 for r in rows)


def test_sequence_violations_detects_gap(spark, fixture_log):
    broken = fixture_log.where(
        ~(
            (F.col("space") == "space0")
            & (F.col("segment") == "segment0")
            & (F.col("sequence") == 100)
        )
    )
    rows = {
        (r.space, r.segment): r.violations
        for r in client.sequence_violations(broken).collect()
    }
    assert rows[("space0", "segment0")] == 1
    assert sum(rows.values()) == 1
