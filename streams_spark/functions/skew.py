"""Skew-mitigation helpers: salted two-stage aggregation.

AQE (enabled in session.py) re-plans skewed JOINS at runtime, but a
skewed GROUP BY key still funnels every row of a hot key through one
reducer in the final aggregate. Salting splits each key into
`n_salts` sub-keys so the heavy partial aggregation spreads over the
cluster, then merges the partials in a second (tiny) aggregate.

Only algebraically decomposable aggregates can be salted this way:
  sum   -> sum of partial sums        count -> sum of partial counts
  min   -> min of partial mins        max   -> max of partial maxes
  avg   -> sum(partial sum)/sum(partial count)  (rewritten explicitly)
Spark's own partial aggregation does the same map-side — salting matters
when the MERGE side skews, i.e. one key's partials dominate a reducer:
with salt, the merge key space is |keys| x n_salts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STAGE1 = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c is None else F.count(c),
    "min": F.min,
    "max": F.max,
}
_STAGE2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}



def _contains_map(dt) -> bool:
    """True if `dt` is or nests a MapType anywhere (inside a struct
    field, array element, or map value) — Spark's hash functions reject
    MapType at ANY depth, not just the top level."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _row_salt(df: DataFrame, n_salts: int, id_col: str | None = None):
    """Deterministic per-row salt in [0, n_salts), so a recomputed task
    assigns identical salts (see salted_agg's docstring for why
    nondeterministic salts corrupt results under fetch-failure
    recovery).

    With `id_col` (a stable unique row id such as a log sequence or a
    doc_id): salt = xxhash64(id) — full-row duplicates then land on
    DIFFERENT salts, so the spread survives duplicate-dominated data.
    Without it: xxhash64 over every hashable column (map-bearing
    columns excluded recursively — Spark's hash rejects nested MapType
    too), and identical rows necessarily share a salt."""
    if id_col is not None:
        return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    cols = [
        F.col(f.name)
        for f in df.schema.fields
        if not _contains_map(f.dataType)
    ]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))

def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str | Column | None, str, str]],
    n_salts: int = 16,
    id_col: str | None = None,
) -> DataFrame:
    """Two-stage aggregation over `keys` with a random salt.

    aggs: [(column_or_name_or_None, fn, alias)] with fn in
    {'sum', 'count', 'min', 'max'}. Returns one row per key combination,
    identical to ``df.groupBy(keys).agg(...)``.

    The salt is DETERMINISTIC per row content (hash of every hashable
    column): a (spark_partition_id, monotonically_increasing_id)
    discriminator is not stable across task re-execution, and after a
    fetch failure Spark recomputes stage-1 map tasks — a row whose salt
    changed would be double-counted by a reducer that already finished
    and skipped by its new one (SQL-level nondeterministic expressions
    are NOT covered by the INDETERMINATE-stage rollback; only
    repartition() is). Full-row duplicates share a salt, which only
    skews the spread when the data is dominated by identical rows —
    pass `id_col` (a stable unique row id) to salt on the id instead
    and keep the spread on duplicate-heavy corpora.
    """
    salt = _row_salt(df, n_salts, id_col).alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _STAGE1[fn](col).alias(f"__p_{alias}")
            for col, fn, alias in aggs
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _STAGE2[fn](f"__p_{alias}").alias(alias)
            for _, fn, alias in aggs
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    id_col: str | None = None,
) -> DataFrame:
    """Equi-join with explicit salt replication for a hot join key.

    The big side gets a uniform per-row salt; the small side is
    replicated once per salt value, so the hot key's rows spread over
    `n_salts` reducers instead of one. Result-identical to
    ``big.join(small, key)`` (inner). Use when BOTH sides are too large
    to broadcast and one key dominates; AQE's skew-join split handles
    oversized partitions after the fact, salting prevents them by
    construction (and also spreads the build side, which AQE's split
    cannot). The replication multiplies the small side n_salts x — keep
    n_salts at the skew factor, not the cluster size. As with
    salted_agg, pass `id_col` when the big side carries a stable unique
    row id so full-row duplicates still spread.
    """
    salt = _row_salt(big, n_salts, id_col)
    bs = big.withColumn("__salt", salt)
    ss = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return bs.join(ss, [key, "__salt"]).drop("__salt")
