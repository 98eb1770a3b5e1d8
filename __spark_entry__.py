"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``streams_spark.registry`` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streams_spark.registry import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's signature operation (multi-space time-interleaved
    consume — SURVEY.md §3.3) fused with what it cannot do: enrich each
    consumed event with a dimension (customer segment) and aggregate
    revenue per (space, hour, market segment) — one declarative plan,
    pruned and broadcast by Catalyst.
    """
    from pyspark.sql import functions as F

    from streams_spark.sources.tables import load_table

    registry = load_all()
    consumed = registry["v_consume_interleave"].fn(spark, SF0001)
    customer = load_table(spark, SF0001, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        consumed.join(customer, consumed.user_id % 1000 == customer.c_custkey)
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
