"""Central query registry: name -> (spark_fn, oracle_sql).

`__spark_entry__.py` exposes this to the driver. Every operator claimed
done in SURVEY.md §2 registers here; oracle_sql=None means the driver
records a weaker rows-only check (reserved for genuinely
non-SQL-expressible ops such as hash-seeded LSH).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    import streams_spark.operators.verbs  # noqa: F401
    import streams_spark.operators.relational  # noqa: F401
    import streams_spark.operators.tpch_extra  # noqa: F401
    import streams_spark.operators.windowed  # noqa: F401
    import streams_spark.operators.dedup  # noqa: F401
    import streams_spark.operators.similarity  # noqa: F401
    import streams_spark.operators.text  # noqa: F401
    import streams_spark.operators.multimodal  # noqa: F401
    import streams_spark.operators.streaming_queries  # noqa: F401

    return REGISTRY
