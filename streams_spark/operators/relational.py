"""Relational analytics surface (SURVEY.md §2.3 ABSENT rows + §7 M2).

The reference has no joins/aggregations/windows (its only aggregation is
the SeekLT top-1 peek — /root/reference/server/pebble/service.go:820-840);
this module provides the standard OLAP operator set on the driver's
TPC-H-ish tables, each paired with a DuckDB oracle.

Determinism rules used throughout (driver hashes values order-insensitively
but exactly): every double aggregate is rounded (2dp for money sums, 4dp
for averages/ratios) in BOTH engines; every top-k has a unique-key
tiebreak; DuckDB integer sums are cast to BIGINT to match Spark's LongType.

Scale notes: explicit broadcasts only on scale-invariant frames
(nation/region, 1-row aggregates); supplier/customer/part joins are left
to Parquet-stats + AQE, which broadcast them at harness scale and fall
back to shuffle joins when they outgrow the threshold; fact-fact joins
(orders⋈lineitem) shuffle on the join key, which AQE re-plans at runtime;
aggregations are partial (map-side combine) by construction in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streams_spark.functions.text_funcs import tokens as tokens_fn
from streams_spark.operators import finite_or_null
from streams_spark.registry import register
from streams_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q1: full-scan grouped aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                  AS sum_qty,
       round(sum(l_extendedprice), 2)                             AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                  AS sum_charge,
       floor(avg(l_quantity) * 10000 + 0.5) / 10000               AS avg_qty,
       floor(avg(l_extendedprice) * 10000 + 0.5) / 10000          AS avg_price,
       floor(avg(l_discount) * 10000 + 0.5) / 10000               AS avg_disc,
       count(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # floor rule, not round(): avg of small-denominator values
            # lands on exact 4dp midpoints where HALF_UP (Spark) and
            # HALF_EVEN (DuckDB) diverge — same fix as q2/w_gap_fill
            (F.floor(F.avg("l_quantity") * 10000 + F.lit(0.5)) / 10000).alias("avg_qty"),
            (F.floor(F.avg("l_extendedprice") * 10000 + F.lit(0.5)) / 10000).alias("avg_price"),
            (F.floor(F.avg("l_discount") * 10000 + F.lit(0.5)) / 10000).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: 3-way join + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

_Q3 = """
SELECT l_orderkey,
       -- exact integer 1e-4 accumulation, same rationale as q9: a
       -- double sum straddled a .005 midpoint differently per engine
       -- under seed-11 money jitter
       floor((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) + 50) / 100) / 100 AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # exact integer 1e-4 accumulation (q9's pattern): int64 addition
        # is order-free, so the 2-dp rounding cannot flip with the
        # partition/merge order of a double sum
        .agg(
            (
                F.floor(
                    (
                        F.sum(
                            F.round(
                                F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))
                                * 10000
                            ).cast("long")
                        )
                        + 50
                    )
                    / 100
                )
                / 100
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q5: 6-way join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # stats/AQE broadcast the dim sides at this SF; the fact-fact join
    # (lineitem ⋈ orders) shuffles on orderkey
    dim = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            dim,
            (li.l_suppkey == dim.s_suppkey)
            & (customer.c_nationkey == dim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q6: selective scan-aggregate (TPC-H Q6 shape)
# ---------------------------------------------------------------------------

_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q7: bi-nation volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

_Q7 = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_nation_volume", oracle=_Q7)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q9: profit by nation/year (TPC-H Q9 shape, adapted: no partsupp table)
# ---------------------------------------------------------------------------

_Q9 = """
SELECT n_name AS nation_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       floor((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) + 50) / 100) / 100 AS profit
FROM part, supplier, lineitem, orders, nation
WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY nation_name, o_year
"""


@register("q9_profit_by_nation_year", oracle=_Q9)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp). Profit is accumulated in
    EXACT integer 1e-4 units, not a double sum: l_extendedprice and
    l_discount are 2-dp, so each row's ext*(1-disc) lies on the 1e-4
    grid and both engines quantize it to the SAME int64 (the double
    product is identical bit-for-bit; round() just snaps the ~1e-9 fp
    residue back to the grid). Int64 addition is order-free, so the
    group sum cannot drift with partition/merge order — the double-sum
    formulation flipped a rounded cent on two (nation, year) groups
    under seed-6 money jitter (fuzz class: cross-engine fp summation
    trees straddling a .005 boundary). The final 2-dp rounding is pure
    integer arithmetic ((s+50)/100 then /100), so no tie can re-enter
    through the division; group sums stay < 2^53, exact under the
    double-typed floor()."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation_name"))
    q4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation_name", "o_year")
        .agg(
            (F.floor((F.sum(q4) + 50) / 100) / 100).alias("profit")
        )
    )


# ---------------------------------------------------------------------------
# q10: returned-item revenue, top 20 customers (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

_Q10 = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name, c_mktsegment
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# q13: outer join + count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_order_distribution", oracle=_Q13)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q14: conditional aggregation ratio (TPC-H Q14 shape)
# ---------------------------------------------------------------------------

_Q14 = """
SELECT round(
         100.0 * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
         / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0))
                / F.sum(disc_price),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q18: large-volume customers (TPC-H Q18 shape — having over grouped join)
# ---------------------------------------------------------------------------

_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 300
"""


@register("q18_large_volume_customer", oracle=_Q18)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 300)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("raw_qty", 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------

_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("q_rollup_revenue", oracle=_ROLLUP)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP with SQL-standard empty-input semantics: the ()
    grouping set is a global aggregate, so it emits its row (count 0,
    NULL sums) even over an empty table. Spark's Expand-based rollup
    emits nothing on empty input (no rows to expand — degenerate-fixture
    fuzz class), so a zero-valued () row is synthesized — but ONLY when
    the input is empty: for non-empty input Spark's own () row is kept,
    because re-deriving it from the subtotal tier changes the
    floating-point summation tree vs the oracle's whole-input sum and
    can flip a cent at a 2-dp rounding boundary (seeded-fuzz class).
    The rollup aggregate is localCheckpoint'd — it is k rows — so the
    () existence probe is a trivial job, not a second lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
        .localCheckpoint()
    )
    out = base.select("l_returnflag", "l_linestatus", "revenue", "n")
    if base.where(F.col("gid") == 3).limit(1).count() == 0:
        zero = spark.range(1).select(
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(None).cast("double").alias("revenue"),
            F.lit(0).cast("long").alias("n"),
        )
        out = out.unionByName(zero)
    return out


_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("q_cube_orders", oracle=_CUBE)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE with the same empty-input () row as
    q_rollup_revenue (see there): Spark's Expand emits no () row over an
    empty table where SQL-standard CUBE emits one, so a zero row is
    synthesized for empty input only — Spark's native () row is kept
    otherwise (re-derivation changes the fp summation tree and can flip
    a rounded cent)."""
    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
        .localCheckpoint()
    )
    out = base.select("o_orderstatus", "o_orderpriority", "total", "n")
    if base.where(F.col("gid") == 3).limit(1).count() == 0:
        zero = spark.range(1).select(
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("string").alias("o_orderpriority"),
            F.lit(None).cast("double").alias("total"),
            F.lit(0).cast("long").alias("n"),
        )
        out = out.unionByName(zero)
    return out


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------

_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_distinct_aggs", oracle=_DISTINCT)
def q_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("q_approx_count_distinct", oracle=None)  # HLL sketch — engine-specific
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — no oracle: sketch estimates
    are engine-specific. Rows-only check; the exact twin is q_distinct_aggs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated median)
# ---------------------------------------------------------------------------

_MEDIAN = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_percentiles", oracle=_MEDIAN)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


@register("q_approx_percentile", oracle=None)  # t-digest/GK sketches differ
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy 10000) — no
    oracle: quantile sketches are engine-specific (DuckDB uses t-digest).
    Rows-only check here; tests/ bounds it against the exact
    q_percentiles twin, and q_grid_percentile is the deterministic
    oracle-paired member of this family. The sketch is the 100 TB path: exact percentile
    materializes the full sorted group, GK merges bounded-size summaries
    map-side and ships one small state per group through the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("approx_percentile(l_quantity, 0.5, 10000)"), 4
        ).alias("median_qty"),
        F.round(
            F.expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 4
        ).alias("p90_price"),
    )


# The value-checked twin of q_approx_percentile (the q_kmv_distinct move
# applied to quantiles): a fixed-grid histogram sketch whose every
# intermediate is integer arithmetic, so DuckDB reproduces the ESTIMATE
# bit for bit. Rank test is cross-multiplied (cum * den >= num * n)
# instead of ceil(q * n): 0.9 parses as an IEEE double in Spark but a
# DECIMAL in DuckDB, and the two ceil()s disagree near exact multiples.
_GRID_PERCENTILE = """
WITH qh AS (
  SELECT l_returnflag, CAST(floor(l_quantity * 100) AS BIGINT) AS cell,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
), qc AS (
  SELECT l_returnflag, cell,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY cell) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM qh
), qm AS (
  SELECT l_returnflag, CAST(min(n) AS BIGINT) AS n_rows,
         min(cell) AS cell
  FROM qc WHERE cum * 2 >= n GROUP BY l_returnflag
), ph AS (
  SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS cell,
         count(*) AS c
  FROM lineitem GROUP BY 1, 2
), pc AS (
  SELECT l_returnflag, cell,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY cell) AS cum,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM ph
), pm AS (
  SELECT l_returnflag, min(cell) AS cell
  FROM pc WHERE cum * 10 >= n * 9 GROUP BY l_returnflag
)
SELECT qm.l_returnflag, qm.n_rows,
       CAST(qm.cell AS DOUBLE) / 100 AS grid_median_qty,
       CAST(pm.cell AS DOUBLE) AS grid_p90_price
FROM qm JOIN pm ON pm.l_returnflag = qm.l_returnflag
"""


GRID_QTY_SCALE = 100  # 0.01 cells for quantity
GRID_PRICE_SCALE = 1  # 1.0 cells for price


def _grid_quantile(
    df: DataFrame, key: str, value, scale: int, num: int, den: int
):
    """Smallest grid cell whose cumulative count covers rank num/den:
    histogram on floor(value * scale), per-key cumulative sum in cell
    order, integer cross-multiplied rank test. Returns
    (key, n_rows, cell)."""
    hist = df.groupBy(
        key, F.floor(value * scale).cast("long").alias("cell")
    ).agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        key,
        "cell",
        F.sum("c").over(Window.partitionBy(key).orderBy("cell")).alias("cum"),
        F.sum("c").over(Window.partitionBy(key)).alias("n"),
    )
    return (
        cum.where(F.col("cum") * den >= F.col("n") * num)
        .groupBy(key)
        .agg(F.min("n").alias("n_rows"), F.min("cell").alias("cell"))
    )


@register("q_grid_percentile", oracle=_GRID_PERCENTILE)
def q_grid_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grid-quantile sketch — the value-checked twin that
    upgrades the approximate-percentile family from rows-only to a full
    oracle row (exactly how q_kmv_distinct twins approx_count_distinct):
    quantize values to a fixed grid (0.01 for quantity, 1.0 for price),
    build a per-group cell histogram, and read the quantile as the
    smallest cell whose cumulative count covers the target rank. Error
    is bounded by the grid pitch a priori — unlike GK/t-digest, whose
    state is engine-private — and every intermediate is integer
    arithmetic, so the oracle checks the ESTIMATE value for value.

    At 100 TB: the histogram is mergeable (cell counts add) and builds
    with one partial-agg'd shuffle on (group, cell); sketch state is
    |occupied cells| per group, bounded by value-range/pitch regardless
    of row count. The rank scan is a per-group window over cells only.
    This is the classic fixed-bin "histogram quantile" (Prometheus-style)
    as opposed to q_percentiles' exact sort-based path."""
    li = load_table(spark, sf_dir, "lineitem")
    med = _grid_quantile(
        li, "l_returnflag", F.col("l_quantity"), GRID_QTY_SCALE, 1, 2
    )
    p90 = _grid_quantile(
        li, "l_returnflag", F.col("l_extendedprice"), GRID_PRICE_SCALE, 9, 10
    ).select("l_returnflag", F.col("cell").alias("pcell"))
    return med.join(p90, "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        (F.col("cell").cast("double") / GRID_QTY_SCALE).alias(
            "grid_median_qty"
        ),
        F.col("pcell").cast("double").alias("grid_p90_price"),
    )


# ---------------------------------------------------------------------------
# Unpivot (wide measures → long metric/value rows)
# ---------------------------------------------------------------------------

_UNPIVOT = """
WITH w AS (
  SELECT l_returnflag,
         round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_extendedprice * l_discount), 2) AS sum_disc_value
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w
UNION ALL
SELECT l_returnflag, 'sum_disc_value' AS metric, sum_disc_value AS value FROM w
"""


@register("q_unpivot", oracle=_UNPIVOT)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide per-flag measure columns into long
    (metric, value) rows — the inverse of q_pivot_linestatus, and the
    shape feature stores and metric sinks want. DataFrame.unpivot is a
    zero-shuffle Expand (each input row fans out to k metric rows
    map-side); the only exchange is the upstream aggregate's."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity").cast("double"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "sum_disc_value"
        ),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc_value"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

_SETOPS = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
"""


@register("q_setops", oracle=_SETOPS)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def keys(lo: str | None, hi: str | None) -> DataFrame:
        df = orders
        if lo:
            df = df.where(F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        if hi:
            df = df.where(F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        return df.select("o_custkey")

    # SQL set-op precedence: INTERSECT binds tighter than EXCEPT, and both
    # are DISTINCT ops — .intersect/.subtract have the same semantics.
    return (
        keys("1995-01-01", "1996-01-01")
        .intersect(keys("1996-01-01", "1997-01-01"))
        .subtract(keys("2000-01-01", None))
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------

_SEMI_ANTI = """
SELECT
  (SELECT count(*) FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)) AS n_big_spenders,
  (SELECT count(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
      AS n_never_ordered
"""


@register("q_semi_anti_join", oracle=_SEMI_ANTI)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join counts as ONE plan: each count is a single-row
    aggregate over its join, and the two single-row frames cross-join
    (both broadcast) — no driver-side actions or createDataFrame, so
    the whole thing is one job Catalyst can schedule."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    semi = (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_big_spenders"))
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_never_ordered"))
    )
    return semi.crossJoin(anti)


# ---------------------------------------------------------------------------
# Scalar function surface (string/date/math) — SURVEY §2.7
# ---------------------------------------------------------------------------

_SCALARS = """
SELECT p_partkey,
       upper(p_name)                                    AS name_upper,
       substr(p_name, 1, 5)                             AS name_prefix,
       CAST(length(p_name) AS INTEGER)                  AS name_len,
       p_brand || ':' || p_type                         AS brand_type,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1)     AS brand_num,
       replace(p_name, ' ', '_')                        AS name_snake,
       round(abs(p_retailprice - 1000.0), 2)            AS price_dev,
       round(sqrt(p_retailprice), 4)                    AS price_sqrt,
       round(ln(p_retailprice + 1), 4)                  AS price_ln,
       CAST(p_size % 7 AS INTEGER)                      AS size_mod
FROM part
WHERE p_size >= 10
"""


@register("q_scalar_functions", oracle=_SCALARS)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.where(F.col("p_size") >= 10).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dev"),
        F.round(F.sqrt("p_retailprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("price_ln"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


_DATES = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER)    AS o_year,
       CAST(month(o_orderdate) AS INTEGER)   AS o_month,
       CAST(day(o_orderdate) AS INTEGER)     AS o_day,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS o_dow,
       o_orderdate + INTERVAL 30 DAY          AS due_date,
       date_trunc('month', o_orderdate)       AS month_start,
       strftime(o_orderdate, '%Y-%m')         AS month_str
FROM orders
WHERE o_orderkey <= 1000
"""


@register("q_date_functions", oracle=_DATES)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → align with %w-style
    return orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        (F.dayofweek("o_orderdate") - 1).alias("o_dow"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation form so column names are controlled)
# ---------------------------------------------------------------------------

_PIVOT = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2)
           AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2)
           AS qty_filled,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_pivot_linestatus", oracle=_PIVOT)
def q_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_open"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)),
            2,
        ).alias("qty_filled"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# JSON / map / array function surface over the events payload — SURVEY §2.7
# (the reference's payload is opaque bytes; schema-on-read is the
# consumer's job — from_json is exactly that consumer-side typed view)
# ---------------------------------------------------------------------------

_JSON_PROPS = """
-- type-aware extraction, not CAST: Spark's from_json is PERMISSIVE and
-- type-strict — a 'k' that is a string ("7", " ") or a double (1.5)
-- becomes NULL for an INT field rather than coercing or erroring, so
-- the oracle must check the JSON type, not merely try_cast (a
-- try_cast would coerce "7" to 7 where Spark yields NULL) — fuzz
-- finding r6
WITH p AS (
  SELECT event_type,
         CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN CAST(props->>'$.k' AS INTEGER) END AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       floor(avg(k) * 10000 + 0.5) / 10000 AS avg_k,
       CAST(max(k) AS INTEGER) AS max_k,
       CAST(count(DISTINCT k % 10) AS BIGINT) AS n_k_buckets
FROM p
GROUP BY event_type
"""


@register("q_json_props", oracle=_JSON_PROPS)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON payload: from_json into a typed
    struct, then plain aggregation — all JVM-side (Jackson parse +
    codegen agg), no UDF. The map/array twin of the same surface is
    exercised via element_at on the parsed struct-as-map."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        (F.floor(F.avg("k") * 10000 + F.lit(0.5)) / 10000).alias("avg_k"),
        F.max("k").alias("max_k"),
        # k % 10 has a <=19-value domain (k%10 in [-9,9], +10 -> a
        # unique bit 1..19 per value), so ONE long bitmap per group
        # computes the distinct count inside the same aggregation —
        # countDistinct planned a second expand/exchange level (r7),
        # and collect_set kept a per-group set buffer (r8: bit_or is
        # pure codegen, measured 0.48 -> 0.42 s solo at sf0.1); bit_or
        # ignores NULL k like collect_set did, coalesce covers the
        # all-NULL group (nullmeas fixture)
        F.expr(
            "coalesce(bit_count(bit_or(shiftleft(1L,"
            " cast(k % 10 + 10 as int)))), 0)"
        ).cast("long").alias("n_k_buckets"),
    )


# ---------------------------------------------------------------------------
# Salted two-stage aggregation (skew mitigation) — proven equivalent to the
# plain groupBy by sharing its oracle shape
# ---------------------------------------------------------------------------

_SALTED = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_salted_agg", oracle=_SALTED)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q1 aggregate computed through salted_agg (functions/skew.py):
    each key splits into 16 salt sub-keys for the heavy partial stage,
    then a tiny merge aggregate — the standard fix when one GROUP BY key
    dominates (l_returnflag has 3 values over 600M rows at SF 100:
    without salt, 3 reducers do all the merge work). The oracle proves
    the rewrite is result-identical to the plain groupBy.

    Salt source: lineitem rows are unique (composite PK l_orderkey +
    l_linenumber), so the default full-row content hash spreads every
    row. On a duplicate-dominated corpus (raw logs, pre-dedup crawls)
    identical rows share a salt and the spread degrades — pass
    salted_agg(id_col=...) with a stable unique row id there."""
    from streams_spark.functions.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("l_quantity", "sum", "raw_sum_qty"),
            (None, "count", "n_rows"),
            ("l_extendedprice", "min", "raw_min_price"),
            ("l_extendedprice", "max", "raw_max_price"),
        ],
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        F.round("raw_sum_qty", 2).alias("sum_qty"),
        "n_rows",
        F.round("raw_min_price", 2).alias("min_price"),
        F.round("raw_max_price", 2).alias("max_price"),
    )


_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS total_price,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@register("q_grouping_sets", oracle=_GROUPING_SETS)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-hierarchical GROUPING SETS ((flag), (status)) — the shape
    rollup/cube can't express (rollup is the prefix chain, cube the
    power set). One pass, Expand + partial agg underneath."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.count(F.lit(1)).alias("n"),
    )


_ARRAY_MAP = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE doc_id < 100
)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       w[1] AS first_token,
       w[len(w)] AS last_token,
       array_to_string(list_sort(w[1:3]), ',') AS first3_sorted,
       CAST(len(list_filter(w, t -> length(t) > 4)) AS INTEGER) AS n_long,
       CAST(coalesce(list_contains(w, 'the'), false) AS BOOLEAN) AS has_the,
       array_to_string(list_reverse(w[1:2]), ',') AS rev2
FROM d
"""


@register("q_array_functions", oracle=_ARRAY_MAP)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (SURVEY §2.7: absent in the reference,
    Spark built-ins here): element access, slice, sort, filter,
    contains, reverse — all codegen'd, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    w = F.split("text", " ")
    # NULL text null-propagates: concat_ws would silently render a NULL
    # array as '' and array_contains as NULL-boolean (whose pandas repr
    # differs per engine) — wrap the former, coalesce the latter
    # (fuzz finding r6)
    nn = F.col("text").isNotNull()
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.element_at(w, 1).alias("first_token"),
        F.element_at(w, -1).alias("last_token"),
        F.when(
            nn, F.concat_ws(",", F.array_sort(F.slice(w, 1, 3)))
        ).alias("first3_sorted"),
        F.size(F.filter(w, lambda t: F.length(t) > 4)).alias("n_long"),
        F.coalesce(F.array_contains(w, "the"), F.lit(False)).alias("has_the"),
        F.when(nn, F.concat_ws(",", F.reverse(F.slice(w, 1, 2)))).alias(
            "rev2"
        ),
    )


_MAP_FUNCS = """
-- Spark's from_json to map<string,int> nullifies the WHOLE map when
-- any value fails the int parse (string-typed or float-typed values
-- included), so map_size must go NULL in exactly those rows — fuzz
-- finding r6
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k_val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_k,
       CAST(min(map_size) AS INTEGER) AS min_map_size,
       CAST(max(map_size) AS INTEGER) AS max_map_size
FROM (
  SELECT event_type,
         CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN CAST(props->>'$.k' AS INTEGER) END AS k_val,
         CASE WHEN props IS NULL THEN NULL
              WHEN json_extract(props, '$.k') IS NOT NULL
                   AND json_type(props, '$.k') NOT IN ('BIGINT', 'UBIGINT')
              THEN NULL
              ELSE len(json_keys(props)) END AS map_size
  FROM events
)
GROUP BY event_type
"""


@register("q_map_functions", oracle=_MAP_FUNCS)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface over the payload (the reference's metadata is
    map<string,string> — server/messages.go:66): parse JSON to a map,
    then element_at / map_keys / size — all JVM built-ins."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(
            "event_type",
            F.element_at(m, "k").alias("k_val"),
            F.size(F.map_keys(m)).alias("map_size"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k_val").isNotNull(), 1).otherwise(0)).alias(
                "n_with_k"
            ),
            F.min("map_size").alias("min_map_size"),
            F.max("map_size").alias("max_map_size"),
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregate surface (moments, correlation)
# ---------------------------------------------------------------------------

# DuckDB's skewness/kurtosis are SAMPLE-corrected; Spark's are POPULATION
# moments. The oracle therefore builds the population statistics from raw
# power sums (central moments via the binomial expansion) — exact double
# arithmetic on l_quantity/l_discount (small magnitudes, so the power
# sums stay far below 2^53 and both engines compute identical doubles).
_STATS_FUNCS = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         avg(l_quantity) AS mq,
         avg(l_quantity * l_quantity) AS mq2,
         avg(l_quantity * l_quantity * l_quantity) AS mq3,
         avg(l_quantity * l_quantity * l_quantity * l_quantity) AS mq4,
         corr(l_quantity, l_extendedprice) AS r,
         covar_samp(l_discount, l_extendedprice) AS cv,
         stddev_samp(l_quantity) AS sd
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round(r, 6) AS corr_qty_price,
       round(cv, 6) AS covar_disc_price,
       round(sd, 6) AS stddev_qty,
       round((mq3 - 3 * mq * mq2 + 2 * mq * mq * mq)
             / pow(mq2 - mq * mq, 1.5), 6) AS skew_qty,
       round((mq4 - 4 * mq * mq3 + 6 * mq * mq * mq2 - 3 * pow(mq, 4))
             / pow(mq2 - mq * mq, 2) - 3, 6) AS kurt_qty
FROM s
"""


@register("q_stats_functions", oracle=_STATS_FUNCS)
def q_stats_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: Pearson correlation, sample
    covariance/stddev, and population skewness / excess kurtosis per
    return flag — the moment sketches a data-quality profiler runs per
    column. All built-in JVM aggregates (one partial-agg'd shuffle of 3
    groups); the oracle reproduces Spark's population moment convention
    from raw power sums since DuckDB's skewness/kurtosis are
    sample-corrected.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_discount", "l_extendedprice"), 6).alias(
                "covar_disc_price"
            ),
            F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
            F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Window-frame surface: RANGE frames, ntile, percent_rank, cume_dist
# ---------------------------------------------------------------------------

# ntile needs a total order to be deterministic: (o_totalprice, o_orderkey)
# is unique. percent_rank/cume_dist depend only on the ordering VALUE, so
# ties are harmless; both round to 6dp.
_WINDOW_FRAMES = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2)
           AS trailing_7d_spend,
       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS INTEGER)
           AS price_quartile,
       round(percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice), 6) AS price_pct_rank,
       round(cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice), 6) AS price_cume_dist
FROM orders
"""


@register("q_window_frames", oracle=_WINDOW_FRAMES)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface the reference lacks entirely (§2.7 ABSENT):
    a time-RANGE frame (trailing-7-day spend per customer) plus the rank
    family (ntile / percent_rank / cume_dist) partitioned by priority.

    Spark's rangeBetween needs a numeric ordering column, so the time
    frame orders on epoch seconds with an inclusive [-7d, 0] range —
    identical inclusion semantics to the oracle's RANGE INTERVAL frame.
    Scale: every window is keyed (customer / priority), so WindowExec
    sorts within hash partitions — no single-partition global window. A
    truly global quantile assignment at 100 TB should instead broadcast
    approx-quantile cutpoints (see q_approx_percentile) rather than
    total-sort; the priority-partitioned ntile here is the honest keyed
    formulation.
    """
    o = load_table(spark, sf_dir, "orders")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    w_tile = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_val = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias(
            "trailing_7d_spend"
        ),
        F.ntile(4).over(w_tile).alias("price_quartile"),
        F.round(F.percent_rank().over(w_val), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w_val), 6).alias("price_cume_dist"),
    )


# ---------------------------------------------------------------------------
# Lateral explode (generator functions): per-position token frequency
# ---------------------------------------------------------------------------

# DuckDB zips multiple unnests in one SELECT positionally, giving
# (pos, token) pairs for the first-5-token slice — the lateral-view shape.
_LATERAL = """
WITH d AS (
  SELECT doc_id, (string_split(text, ' '))[1:5] AS w5 FROM documents
), ex AS (
  SELECT doc_id, unnest(range(len(w5))) AS pos, unnest(w5) AS token FROM d
), counted AS (
  SELECT CAST(pos AS INTEGER) AS pos, token, count(*) AS cnt FROM ex
  GROUP BY pos, token
)
SELECT pos, token, cnt, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT pos, token, cnt,
         row_number() OVER (PARTITION BY pos ORDER BY cnt DESC, token) AS rnk
  FROM counted
) WHERE rnk <= 3
"""


@register("q_lateral_explode", oracle=_LATERAL)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-function surface (LATERAL VIEW posexplode): top-3 tokens
    at each of the first 5 token positions across the corpus — the
    row-to-rows fan-out the reference's FlatMap enumerator provides
    (/root/reference/server/pebble/observer.go:303-312), here as a
    declarative posexplode the optimizer can prune through.

    Scale: the slice happens BEFORE the explode, so the fan-out is a
    bounded 5 rows/doc regardless of document length; one partial-agg'd
    shuffle on (pos, token), then the rank window runs over the
    position-sized aggregate (5 groups x vocab), not the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        F.posexplode(F.slice(tokens_fn("text"), 1, 5)).alias("pos", "token"),
    )
    counted = ex.groupBy("pos", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("pos").orderBy(F.desc("cnt"), "token")
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("pos", "token", "cnt", "rnk")
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS with a correlated aggregate subquery (decorrelated)
# ---------------------------------------------------------------------------

_CORR_EXISTS = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = c.c_custkey)
)
"""


@register("q_correlated_exists", oracle=_CORR_EXISTS)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS whose inner predicate itself contains a
    correlated aggregate subquery (customers with at least one order over
    2x their own average) — the doubly-nested shape optimizers must
    decorrelate. Expressed decorrelated by hand: the per-customer average
    is a window over the orders scan (one shuffle, no orders re-scan),
    the EXISTS collapses to a distinct-key semi join against customer.
    Scale: single shuffle of orders on o_custkey serves both the window
    and the semi-join build side; customer never shuffles (AQE broadcasts
    the distinct qualifying-key frame, which only shrinks).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    qualifying = (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > 2 * F.col("cust_avg"))
        .select("o_custkey")
        .distinct()
    )
    return c.join(
        qualifying, c.c_custkey == qualifying.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_SALTED_JOIN = """
SELECT s_nationkey,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


@register("q_salted_join", oracle=_SALTED_JOIN)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier nation computed through salted_join
    (functions/skew.py): the big side carries a uniform row salt, the
    small side is replicated per salt, so a hot l_suppkey spreads over
    n_salts reducers in a shuffle join. Companion to q_salted_agg —
    that one salts the GROUP BY merge, this one the join build/probe.
    The oracle proves the rewrite is result-identical to the plain
    equi-join. (At this SF supplier would broadcast and no salt is
    needed; the op exists to pin the rewrite's semantics, the docstring
    of salted_join states when to reach for it.) The projected big side
    here is (l_suppkey, l_extendedprice) — near-unique pairs, so the
    content-hash salt spreads; on duplicate-dominated data pass
    salted_join(id_col=...) with a unique row id.
    """
    from streams_spark.functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    ).select("l_suppkey", "s_nationkey")
    return (
        salted_join(li, su, "l_suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_FULL_OUTER = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_customers
  FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey AS nk, count(*) AS n_suppliers
  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@register("q_full_outer", oracle=_FULL_OUTER)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customer vs supplier census per nation via FULL
    OUTER join — the join type the rest of the suite doesn't exercise
    (inner/left/semi/anti/cross all appear elsewhere). The asymmetric
    balance filters make one-sided nations possible, so the coalesce
    null-handling is load-bearing, not decorative.

    Both inputs are post-aggregate (|nations| rows) so the outer join
    itself is trivial; the aggregates are partial-agg'd single
    shuffles with the balance filters pushed to the scans.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(supp, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


_OUTLIERS = """
WITH fe AS (
  -- finite-domain contract (r9 NaN/Inf class): one Inf reading makes
  -- DuckDB's STDDEV_SAMP raise out-of-range where Spark yields
  -- NaN/Inf — the ingest guard owns non-finite readings, the z-census
  -- scores the finite domain
  SELECT event_type, "value" FROM events WHERE isfinite("value")
), stats AS (
  SELECT event_type,
         avg("value") AS mu,
         stddev("value") AS sigma,
         count(*) AS n_events
  FROM fe GROUP BY event_type
)
SELECT e.event_type,
       CAST(any_value(n_events) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN abs(("value" - mu) / sigma) > 2.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs(("value" - mu) / sigma)), 4) AS max_abs_z
FROM fe e JOIN stats USING (event_type)
GROUP BY e.event_type
"""


@register("q_outliers", oracle=_OUTLIERS)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier census per event type: per-type mean/stddev
    (sample stddev, both engines' default) joined back onto the
    stream, values beyond 2.5 sigma counted. The anomaly-gate shape
    every metrics pipeline runs; same two-pass join-back pattern as
    t_unigram_lm.

    The stats table is O(types) and broadcast; the corpus sees one
    scan per pass (stats, then flag+count — both partial-agg'd on
    event_type). A one-pass variant via decomposable moments exists
    but the two-pass form keeps exact parity with the oracle's
    stddev semantics.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(finite_or_null(F.col("value")).isNotNull())
    )
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev("value").alias("sigma"),
        F.count(F.lit(1)).alias("n_events"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n_events").alias("n_events"),
            F.sum(F.when(z > 2.5, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


# ---------------------------------------------------------------------------
# MERGE / upsert (SCD Type-1 change-feed apply)
# ---------------------------------------------------------------------------

_MERGE_KEY_OFFSET = 1400  # shifts the change feed so it spans both
# existing custkeys (update branch) and beyond the dim (insert branch)

_MERGE = f"""
WITH changes AS (
  SELECT user_id + {_MERGE_KEY_OFFSET} AS custkey,
         round(sum("value"), 2) AS delta,
         count(*) AS n_events
  FROM events
  GROUP BY 1
)
SELECT coalesce(c.c_custkey, ch.custkey) AS custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN ch.custkey IS NULL THEN 'keep'
            ELSE 'update' END AS action,
       c.c_name AS name,
       round(c.c_acctbal, 2) AS old_acctbal,
       round(coalesce(c.c_acctbal, 0) + coalesce(ch.delta, 0), 2)
         AS new_acctbal,
       CAST(coalesce(ch.n_events, 0) AS BIGINT) AS n_change_events
FROM customer c
FULL OUTER JOIN changes ch ON c.c_custkey = ch.custkey
"""


@register("q_merge_upsert", oracle=_MERGE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD Type-1 upsert) as a full-outer join:
    a change feed aggregated from events is applied onto the customer
    dim — matched keys update the balance, unmatched feed keys insert,
    untouched dim rows pass through, each row tagged with its action.
    The engine analog of a warehouse CDC apply; the reference's closest
    relative is its idempotent re-produce of an existing sequence
    (server/pebble/service.go Produce upsert-by-sequence), generalized
    to keyed column merges. (The key offset is synthetic, chosen so the
    feed exercises all three branches.)

    The change feed aggregates BEFORE the join (events-sized shuffle →
    user-count-sized frame), so the merge join touches dim-sized + 
    feed-sized inputs only. At 100 TB the dim side is bucketed on the
    merge key (store.write_bucketed) making this exchange-free on the
    big side; the feed, being post-aggregate, broadcasts when small.
    """
    customer = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    changes = (
        ev.groupBy(
            (F.col("user_id") + F.lit(_MERGE_KEY_OFFSET)).alias("custkey")
        )
        .agg(
            F.round(F.sum("value"), 2).alias("delta"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    joined = customer.join(
        changes, customer.c_custkey == changes.custkey, "full_outer"
    )
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "keep")
        .otherwise("update")
    )
    return joined.select(
        F.coalesce("c_custkey", "custkey").alias("custkey"),
        action.alias("action"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("old_acctbal"),
        F.round(
            F.coalesce("c_acctbal", F.lit(0)) + F.coalesce("delta", F.lit(0)),
            2,
        ).alias("new_acctbal"),
        F.coalesce("n_events", F.lit(0)).alias("n_change_events"),
    )


# ---------------------------------------------------------------------------
# Mode + median aggregates (deterministic tie-break)
# ---------------------------------------------------------------------------

_MODE_MEDIAN = """
WITH base AS (
  SELECT n_name, o_orderpriority, o_totalprice
  FROM orders, customer, nation
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
), counts AS (
  SELECT n_name, o_orderpriority, count(*) AS cnt
  FROM base GROUP BY 1, 2
), modes AS (
  SELECT n_name, o_orderpriority AS mode_priority
  FROM (
    SELECT *, row_number() OVER (PARTITION BY n_name
                                 ORDER BY cnt DESC, o_orderpriority) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT b.n_name,
       any_value(m.mode_priority) AS mode_priority,
       round(median(o_totalprice), 4) AS median_price,
       count(*) AS n_orders
FROM base b JOIN modes m ON b.n_name = m.n_name
GROUP BY b.n_name
"""


@register("q_mode_median", oracle=_MODE_MEDIAN)
def q_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation modal order priority + exact interpolated median order
    price (§2.3 ABSENT row: the reference's only aggregations are
    min/max point lookups — service.go:409-447). Median rounds at 4dp,
    not 2: an even-count median is the midpoint of two 2dp prices, i.e.
    exactly 3 decimals, and a 2dp round of a trailing-5 value is
    engine-dependent (half-away vs HALF_UP) — 4dp is below the boundary.

    Mode is NOT Spark's `mode()` (tie order is engine-dependent): it is
    count + min-by-(−cnt, value), which fixes ties to the smallest
    priority string in both engines. Median is `F.median` — Spark and
    DuckDB both compute the interpolated continuous quantile.

    Scale: two shuffles on (nation, priority) then (nation) — both
    partial-agg'd, both over group-count-bounded frames; the modes frame
    is nation-sized and broadcast back onto the per-nation aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority", "o_totalprice")
    )
    counts = base.groupBy("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    modes = counts.groupBy("n_name").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg_cnt"),
                     F.col("o_orderpriority").alias("p"))
        ).alias("m")
    ).select("n_name", F.col("m.p").alias("mode_priority"))
    stats = base.groupBy("n_name").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return stats.join(F.broadcast(modes), "n_name").select(
        "n_name", "mode_priority", "median_price", "n_orders"
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg)
# ---------------------------------------------------------------------------

_STRING_AGG = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("q_string_agg", oracle=_STRING_AGG)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ANSI LISTAGG): comma-joined sorted
    nation names per region (§2.7 ABSENT row — the reference has no
    aggregate surface at all).

    Spark has no ordered string_agg; array_sort(collect_list()) +
    array_join is the engine-stable equivalent — the sort happens
    per-group AFTER collection, so the aggregation itself stays partial
    (map-side combinable) and the ordering is deterministic regardless of
    partitioning. Scale: group-bounded payloads only — a listagg whose
    groups can grow unboundedly (e.g. per-customer order lists at 100 TB)
    should instead persist the sorted array and explode on read.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (per-row dependent join)
# ---------------------------------------------------------------------------

_LATERAL_TOPK = """
SELECT c.c_custkey, l.o_orderkey, round(l.o_totalprice, 2) AS totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
WHERE c.c_custkey < 50
"""


@register("q_lateral_topk", oracle=_LATERAL_TOPK)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery with
    ORDER BY + LIMIT — the ANSI lateral-join surface (Spark 4 supports
    it natively; q_lateral_explode covers the generator form, this
    covers the dependent-subquery form).

    Catalyst decorrelates the lateral into the same window-rank plan
    w_topk_suppliers_per_nation hand-writes — registered to prove the
    SQL surface exists AND that the optimizer, not the author, does the
    decorrelation. The customer filter prunes the driving side before
    the join.
    """
    from streams_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK)


# ---------------------------------------------------------------------------
# VARIANT semi-structured payloads (Spark 4 open type)
# ---------------------------------------------------------------------------

_VARIANT_PAYLOAD = """
-- try_variant_get semantics by JSON type (probed on Spark 4): int
-- passes through, double truncates toward zero, string attempts a
-- numeric parse ("7" -> 7, " " -> NULL): mirrored per-type below
-- rather than one hard CAST, which aborts on the first non-numeric
-- string (fuzz finding r6)
SELECT event_type,
       count(*) AS n_high,
       floor(avg(k) * 10000 + 0.5) / 10000 AS avg_k,
       max(k) AS max_k
FROM (
  SELECT event_type,
         CASE json_type(props, '$.k')
              WHEN 'UBIGINT' THEN CAST(props->>'$.k' AS BIGINT)
              WHEN 'BIGINT' THEN CAST(props->>'$.k' AS BIGINT)
              WHEN 'DOUBLE' THEN
                  CAST(trunc(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT)
              WHEN 'VARCHAR' THEN try_cast(props->>'$.k' AS BIGINT)
              END AS k
  FROM events
)
WHERE k >= 50
GROUP BY event_type
"""


@register("q_variant_payload", oracle=_VARIANT_PAYLOAD)
def q_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON payload via Spark 4's VARIANT type:
    parse_json once, extract typed paths with variant_get, filter and
    aggregate — the open-payload analog of the reference's metadata map
    (server/messages.go:66), upgraded from per-query from_json
    (q_json_props) to the engine's binary semi-structured encoding.

    Scale: VARIANT parses each payload ONCE into a compact binary form;
    repeated path extraction is a cheap binary probe, not a re-parse —
    at 100 TB this is the difference between one JSON parse per query
    and one per ingest. Plan is scan -> filter -> partial agg, one
    shuffle on event_type.
    """
    ev = load_table(spark, sf_dir, "events")
    # try_variant_get: a non-numeric payload value filters out as NULL
    # instead of aborting the scan (fuzz finding r6)
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            (F.floor(F.avg("k") * 10000 + F.lit(0.5)) / 10000).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# SQL-defined scalar function (CREATE FUNCTION ... RETURN expr)
# ---------------------------------------------------------------------------

_SQL_UDF = """
SELECT l_returnflag,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS charged,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_sql_udf", oracle=_SQL_UDF)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDF (Spark 4 `CREATE FUNCTION ... RETURN <expr>`): the
    charge formula is defined once as a catalog function and reused —
    the engine-native answer to the reference's "UDF" row (§2.7: it has
    none; consumers inline Go). A SQL UDF body is INLINED by Catalyst at
    plan time, so unlike a Python UDF it costs nothing: same
    whole-stage-codegen plan as writing the expression inline, which is
    exactly what the oracle does.
    """
    from streams_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charge("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1 - d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(charge(l_extendedprice, l_discount, l_tax)), 2)
                   AS charged,
               count(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Collated (case-insensitive) grouping
# ---------------------------------------------------------------------------

_COLLATED_GROUP = """
SELECT lower(c_mktsegment) AS segment, count(*) AS n_customers
FROM (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS c_mktsegment
  FROM customer
)
GROUP BY lower(c_mktsegment)
"""


@register("q_collated_group", oracle=_COLLATED_GROUP)
def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive aggregation via a collated column (Spark 4
    `COLLATE UTF8_LCASE`): the grouping key carries the collation, so
    equality, hashing and the shuffle all respect it — no lower()
    normalization scattered through the query. The mixed-case input is
    synthesized (upper for even keys) so the collation provably merges
    groups; output is lowercased only for display/oracle parity.

    Scale note: collation-aware grouping hashes the collation key
    JVM-side — same single partial-agg'd shuffle as any groupBy, vs the
    lower()-everywhere alternative that must rewrite every predicate
    and loses index/stats alignment on real tables.
    """
    customer = load_table(spark, sf_dir, "customer")
    mixed = customer.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    collated = mixed.select(
        F.expr("seg COLLATE UTF8_LCASE").alias("seg_ci")
    )
    return (
        collated.groupBy("seg_ci")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.lower(F.col("seg_ci")).cast("string").alias("segment"),
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# Exact distinct via mergeable bitmap sketches
# ---------------------------------------------------------------------------

_BITMAP_DISTINCT = """
WITH base AS (
  SELECT r_name, n_name, o_custkey
  FROM orders, customer, nation, region
  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
    AND n_regionkey = r_regionkey
), nat AS (
  SELECT r_name, n_name, count(DISTINCT o_custkey) AS nation_distinct
  FROM base GROUP BY 1, 2
), reg AS (
  SELECT r_name, count(DISTINCT o_custkey) AS region_distinct
  FROM base GROUP BY 1
)
SELECT nat.r_name, nat.n_name,
       CAST(nation_distinct AS BIGINT) AS nation_distinct,
       CAST(region_distinct AS BIGINT) AS region_distinct
FROM nat JOIN reg ON nat.r_name = reg.r_name
"""


@register("q_bitmap_distinct", oracle=_BITMAP_DISTINCT)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct ordering-customers per nation AND per region from
    ONE pass of mergeable bitmap sketches (bitmap_construct_agg /
    bitmap_or_agg / bitmap_count): nation counts come from the bucket
    bitmaps, region counts from OR-merging the SAME bitmaps — no second
    scan, no re-shuffle of raw keys.

    This is the scale answer to multi-grain COUNT(DISTINCT): a plain
    distinct must re-shuffle the full key stream per grain (or expand
    with grouping sets), while bitmaps reduce each bucket to <= 4 KB,
    merge associatively across any rollup level, and stay exact —
    the approximate twin is q_approx_count_distinct's HLL.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("r_name", "n_name", "o_custkey")
    )
    buckets = base.groupBy(
        "r_name",
        "n_name",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bk"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        )
    )
    nat = buckets.groupBy("r_name", "n_name").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("nation_distinct")
    )
    reg = (
        buckets.groupBy("r_name", "bk")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("r_name")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("region_distinct"))
    )
    return nat.join(F.broadcast(reg), "r_name").select(
        "r_name", "n_name", "nation_distinct", "region_distinct"
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operator chains)
# ---------------------------------------------------------------------------

_PIPE_SYNTAX = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       floor(avg(o_totalprice) * 10000 + 0.5) / 10000 AS avg_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register("q_pipe_syntax", oracle=_PIPE_SYNTAX)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same logical query authored in Spark 4's SQL pipe syntax
    (`|>` operator chains, SQL:2023-adjacent): FROM flows through WHERE
    into AGGREGATE ... GROUP BY. Pipe syntax is pure surface — Catalyst
    produces the identical plan as the conventional form the oracle
    states, which is exactly what the oracle equivalence proves.
    """
    from streams_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total_price,
                     floor(avg(o_totalprice) * 10000 + 0.5) / 10000
                         AS avg_price
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, total_price, avg_price
        """
    )


# ---------------------------------------------------------------------------
# HLL sketch union (Spark 4 DataSketches surface) — mergeable cardinality
# ---------------------------------------------------------------------------


@register("q_hll_union", oracle=None)  # sketch estimates are engine-specific
def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-cardinality pipeline on Spark 4's DataSketches HLL
    surface: build one HLL sketch of active customers PER ORDER-PRIORITY
    (hll_sketch_agg), then merge the sketch COLUMN (hll_union_agg) into
    the global estimate — without rescanning the fact table. Rows-only
    by design (sketch binaries and estimates are engine-specific; DuckDB
    carries no compatible sketch); the tolerance test checks both levels
    against exact countDistinct, and the exact twin q_approx_count_distinct
    covers the same shape with HyperLogLog++.

    This IS the 100 TB distinct-count pattern: per-partition sketches are
    a few KB each, merge associatively on the driver-free reduce path,
    and downstream consumers union PRE-AGGREGATED sketches (e.g. daily
    sketches -> monthly actives) instead of re-reading the corpus.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    out = per_prio.select(
        "o_orderpriority",
        "n_orders",
        F.hll_sketch_estimate("sk").alias("est_customers"),
    )
    total = per_prio.agg(
        F.lit("ALL").alias("o_orderpriority"),
        F.sum("n_orders").alias("n_orders"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_customers"),
    )
    return out.unionByName(total)


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) via sorted prefix-min — not the quadratic join
# ---------------------------------------------------------------------------

_SKYLINE = """
SELECT p_partkey, p_retailprice,
       CAST(p_size AS INTEGER) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice < p.p_retailprice AND q.p_size < p.p_size
)
"""


@register("q_skyline", oracle=_SKYLINE)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier, both dimensions minimized, strict
    dominance): parts for which no other part is strictly cheaper AND
    strictly smaller. The oracle states the O(n^2) NOT-EXISTS
    definition; the Spark plan uses the sort-based identity instead — a
    part is dominated iff min(p_size) over all STRICTLY lower prices is
    below its own size — so the whole query is one per-price
    pre-aggregation plus a prefix-min over the distinct-price spine.

    Scale: the n^2 self-join never happens. One partial-agg'd shuffle
    collapses the corpus to the distinct-price spine (bounded by the
    price domain — cents within a fixed range — not by row count), a
    running min walks that spine, and the verdict broadcast-joins back
    onto the corpus map-side. If the spine itself ever outgrew one
    window partition, the two-level prefix-sum grouping used by
    p_pack_sequences applies verbatim."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("int").alias("p_size")
    )
    # distinct-price spine with the best (smallest) size at each price;
    # NULL prices never enter the spine — under the oracle's NOT-EXISTS
    # semantics a NULL dimension can neither dominate nor be dominated
    # (NULL < x is never true)
    spine = (
        part.where(F.col("p_retailprice").isNotNull())
        .groupBy("p_retailprice")
        .agg(F.min("p_size").alias("best_size"))
    )
    # min size over all strictly lower prices: running min shifted by one
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spine = spine.select(
        "p_retailprice", F.min("best_size").over(w).alias("lower_min")
    )
    # LEFT join, not inner: a NULL-price part has no spine row, its
    # lower_min stays NULL, and the isNull arm keeps it — always on the
    # frontier, in the same single scan (nullmeas-fixture fuzz class;
    # an inner equi-join silently drops NULL keys)
    return (
        part.join(F.broadcast(spine), "p_retailprice", "left")
        .where(
            F.col("lower_min").isNull()
            | (F.col("lower_min") >= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC-style delta between two as-of views)
# ---------------------------------------------------------------------------

SNAP_T1 = "1997-01-01"
SNAP_T2 = "1998-01-01"

_SNAPSHOT_DIFF = f"""
WITH snap1 AS (
  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total
  FROM orders WHERE o_orderdate < DATE '{SNAP_T1}' GROUP BY o_custkey
), snap2 AS (
  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total
  FROM orders WHERE o_orderdate < DATE '{SNAP_T2}' GROUP BY o_custkey
)
-- IS NOT DISTINCT FROM + n_orders-null insert test (r8 NULL-key fuzz):
-- the NULL-custkey group is ONE customer class; a plain USING join
-- drops its snap1 match (NULL <> NULL) and misclassifies it 'insert'
SELECT CASE WHEN s1.n_orders IS NULL THEN 'insert'
            WHEN s1.n_orders <> s2.n_orders THEN 'update'
            ELSE 'unchanged' END AS change,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(coalesce(s2.n_orders, 0) - coalesce(s1.n_orders, 0))
            AS BIGINT) AS order_delta,
       round(sum(coalesce(s2.total, 0) - coalesce(s1.total, 0)), 2)
         AS revenue_delta
FROM snap2 s2 LEFT JOIN snap1 s1
  ON s1.o_custkey IS NOT DISTINCT FROM s2.o_custkey
GROUP BY 1
"""


@register("q_snapshot_diff", oracle=_SNAPSHOT_DIFF)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot delta: per-customer order state as of
    {SNAP_T1} vs {SNAP_T2}, classified insert/update/unchanged with
    order and revenue deltas — the change-data-capture audit a
    warehouse runs between two as-of views of the same table (deletes
    impossible here: the log is append-only, like the reference's).

    Scale: ONE scan builds both snapshots — the T1 aggregate is a
    conditional re-aggregation of the T2 one (every T1 order is a T2
    order), so there is a single customer-keyed shuffle and no
    self-join of the fact table; the snapshot comparison happens
    inside the aggregate via sum(CASE date < T1). The oracle states
    the two-snapshot LEFT JOIN definition."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < SNAP_T2
    )
    in1 = F.col("o_orderdate") < SNAP_T1
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(in1.cast("long")).alias("n1"),
        F.count(F.lit(1)).alias("n2"),
        F.sum(F.when(in1, F.col("o_totalprice")).otherwise(0.0)).alias("t1"),
        F.sum("o_totalprice").alias("t2"),
    )
    change = (
        F.when(F.col("n1") == 0, "insert")
        .when(F.col("n1") != F.col("n2"), "update")
        .otherwise("unchanged")
    )
    return per_cust.groupBy(change.alias("change")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("n2") - F.col("n1")).alias("order_delta"),
        # coalesce each snapshot total to 0 BEFORE differencing, exactly
        # like the oracle's coalesce(s2.total, 0) - coalesce(s1.total, 0):
        # a customer whose every price is NULL has a NULL snapshot sum,
        # and NULL - NULL would poison the whole group's delta where the
        # oracle reports 0 (nullmeas-fixture fuzz class)
        F.round(
            F.sum(
                F.coalesce(F.col("t2"), F.lit(0.0))
                - F.coalesce(F.col("t1"), F.lit(0.0))
            ),
            2,
        ).alias("revenue_delta"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud / synthetic-data smell test)
# ---------------------------------------------------------------------------

_BENFORD = """
WITH digits AS (
  -- floor() explicitly: DuckDB's decimal->BIGINT cast rounds half-up,
  -- Spark's truncates
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INTEGER) AS d
  FROM orders WHERE o_totalprice >= 1
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM digits
)
SELECT d AS digit,
       CAST(count(*) AS BIGINT) AS n_values,
       floor(count(*) / tot.n * 10000 + 0.5) / 10000 AS observed,
       floor(log10(1.0 + 1.0 / d) * 10000 + 0.5) / 10000 AS benford,
       floor(abs(count(*) / tot.n - log10(1.0 + 1.0 / d)) * 10000 + 0.5)
         / 10000 AS abs_dev
FROM digits CROSS JOIN tot
GROUP BY d, tot.n
"""


@register("q_benford", oracle=_BENFORD)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed leading-
    digit frequencies against log10(1+1/d) — the classic fraud /
    synthetic-data smell test (TPC-H's uniform price generator fails
    it, which is exactly what the audit should report). First digit is
    taken from the integer part as a string, identically on both
    engines.

    Scale: map-side digit extraction, one partial-agg'd shuffle onto 9
    groups, single-row total broadcast — the same two-aggregate
    single-plan shape as q_semi_anti_join."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") >= 1
    )
    digits = orders.select(
        F.substring(
            F.col("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    tot = digits.agg(F.count(F.lit(1)).cast("double").alias("n"))

    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy("d", "n")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .select(
            F.col("d").alias("digit"),
            "n_values",
            r4(F.col("n_values") / F.col("n")).alias("observed"),
            r4(benford).alias("benford"),
            r4(F.abs(F.col("n_values") / F.col("n") - benford)).alias(
                "abs_dev"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (deterministic, mergeable, oracle-checkable)
# ---------------------------------------------------------------------------

KMV_K = 64

_KMV_DISTINCT = f"""
WITH hashed AS (
  -- o_custkey IS NOT NULL (r8 NULL-key fuzz): a NULL key hashes to a
  -- NULL h that Spark's ASC window ranks FIRST (stealing a sketch
  -- slot) and DuckDB ranks LAST; the pinned contract is that NULL
  -- keys never enter the sketch, matching count(DISTINCT)'s exclusion
  SELECT DISTINCT o_orderpriority,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM orders WHERE o_custkey IS NOT NULL
), ranked AS (
  SELECT o_orderpriority, h,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
  FROM hashed
), sk AS (
  SELECT o_orderpriority,
         count(*) AS n_in_sketch,
         max(h) AS hk
  FROM ranked WHERE rn <= {KMV_K}
  GROUP BY o_orderpriority
), exact AS (
  SELECT o_orderpriority,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT s.o_orderpriority,
       e.exact_distinct,
       CAST(CASE WHEN s.n_in_sketch < {KMV_K} THEN s.n_in_sketch
            ELSE CAST(floor(({KMV_K} - 1) * CAST(1152921504606846976 AS DOUBLE)
                      / s.hk + 0.5) AS BIGINT)
       END AS BIGINT) AS kmv_estimate
FROM sk s JOIN exact e USING (o_orderpriority)
"""


@register("q_kmv_distinct", oracle=_KMV_DISTINCT)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority via a KMV (k-minimum-
    values) sketch: keep the {KMV_K} smallest md5-derived 60-bit hash
    values per group; estimate = (k-1) / max-of-them (normalized). The
    DETERMINISTIC member of the approximate-distinct family — unlike
    approx_count_distinct's engine-private HLL, every intermediate here
    is portable integer/IEEE arithmetic, so the oracle checks the
    ESTIMATE itself, value for value (exact count carried alongside
    for the reader). Groups smaller than k return the exact count.

    At 100 TB: the sketch is mergeable — union two groups' k-minima
    and re-take the k smallest (the same merge HLL offers, with a
    ~1/sqrt(k) error) — and builds with one distinct-shuffle plus a
    k-bounded per-group window; the sketch state is k longs per group."""
    orders = load_table(spark, sf_dir, "orders")
    hashed = (
        orders.where(F.col("o_custkey").isNotNull())
        .select(
            "o_orderpriority",
            F.conv(
                F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
                16, 10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_in_sketch"), F.max("h").alias("hk"))
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    est = F.when(F.col("n_in_sketch") < KMV_K, F.col("n_in_sketch")).otherwise(
        F.floor(
            (KMV_K - 1)
            * F.lit(float(1 << 60))
            / F.col("hk")
            + F.lit(0.5)
        ).cast("long")
    )
    return sk.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "exact_distinct",
        est.cast("long").alias("kmv_estimate"),
    )


# KMV set operations: the q_kmv_distinct sketch extended to PAIRWISE
# intersection/union estimation (the theta-sketch set-op story). Every
# intermediate is md5-derived integer or IEEE-double arithmetic shared
# by both engines, so the oracle value-checks the ESTIMATES themselves.
_KMV_U = 1 << 60  # hash universe: 15 hex chars = 60 bits

_KMV_SETOPS = f"""
WITH d AS (
  -- o_custkey IS NOT NULL: see q_kmv_distinct's sketch-membership pin
  SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders
  WHERE o_custkey IS NOT NULL
), h AS (
  SELECT p, c,
         CAST(('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM d
), ranked AS (
  SELECT p, h, row_number() OVER (PARTITION BY p ORDER BY h) AS rn FROM h
), s AS (
  SELECT p, h FROM ranked WHERE rn <= {KMV_K}
), stat AS (
  SELECT p, count(*) AS n_in, max(h) AS hk FROM s GROUP BY p
), th AS (
  SELECT p, CASE WHEN n_in < {KMV_K} THEN CAST({_KMV_U} AS BIGINT)
                 ELSE hk END AS theta
  FROM stat
), cnt AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY p
), pairs AS (
  SELECT a.p AS prio_a, b.p AS prio_b
  FROM (SELECT DISTINCT p FROM d) a
  JOIN (SELECT DISTINCT p FROM d) b ON a.p < b.p
), ex AS (
  SELECT x.p AS prio_a, y.p AS prio_b, CAST(count(*) AS BIGINT) AS exact_inter
  FROM d x JOIN d y ON y.c = x.c AND x.p < y.p
  GROUP BY 1, 2
), com AS (
  SELECT sa.p AS prio_a, sb.p AS prio_b, count(*) AS cb
  FROM s sa
  JOIN s sb ON sb.h = sa.h AND sa.p < sb.p
  JOIN th ta ON ta.p = sa.p
  JOIN th tb ON tb.p = sb.p
  WHERE sa.h < least(ta.theta, tb.theta)
  GROUP BY 1, 2
), uh AS (
  SELECT pr.prio_a, pr.prio_b, s.h
  FROM pairs pr JOIN s ON s.p = pr.prio_a OR s.p = pr.prio_b
  GROUP BY 1, 2, s.h
), ur AS (
  SELECT prio_a, prio_b, h,
         row_number() OVER (PARTITION BY prio_a, prio_b ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY prio_a, prio_b) AS nu
  FROM uh
), uth AS (
  SELECT prio_a, prio_b,
         max(CASE WHEN rn <= {KMV_K} THEN h END) AS thu,
         min(nu) AS nu
  FROM ur GROUP BY 1, 2
)
SELECT pr.prio_a, pr.prio_b,
       ca.n AS exact_a, cb2.n AS exact_b,
       coalesce(ex.exact_inter, 0) AS exact_inter,
       ca.n + cb2.n - coalesce(ex.exact_inter, 0) AS exact_union,
       CAST(floor(coalesce(com.cb, 0) * CAST({_KMV_U} AS DOUBLE)
                  / least(ta.theta, tb.theta) + 0.5) AS BIGINT) AS kmv_inter,
       CAST(CASE WHEN u.nu < {KMV_K} THEN u.nu
            ELSE CAST(floor(({KMV_K} - 1) * CAST({_KMV_U} AS DOUBLE)
                      / u.thu + 0.5) AS BIGINT) END AS BIGINT) AS kmv_union
FROM pairs pr
JOIN cnt ca ON ca.p = pr.prio_a
JOIN cnt cb2 ON cb2.p = pr.prio_b
JOIN th ta ON ta.p = pr.prio_a
JOIN th tb ON tb.p = pr.prio_b
JOIN uth u ON u.prio_a = pr.prio_a AND u.prio_b = pr.prio_b
LEFT JOIN ex ON ex.prio_a = pr.prio_a AND ex.prio_b = pr.prio_b
LEFT JOIN com ON com.prio_a = pr.prio_a AND com.prio_b = pr.prio_b
"""


@register("q_kmv_setops", oracle=_KMV_SETOPS)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-set OVERLAP estimation from mergeable sketches —
    the theta-sketch set-operation story on the q_kmv_distinct KMV base:
    for every pair of order priorities, estimate |A∩B| and |A∪B| of
    distinct customers USING ONLY the two k-minimum-values sketches
    (k={KMV_K} 60-bit md5 hashes per group), with the exact answers
    carried alongside. Intersection: common sketch hashes below
    theta = min(theta_A, theta_B), scaled by U/theta; union: re-take the
    k smallest of the merged sketch (the KMV merge), (k-1)*U/theta_U.
    Saturation degrades gracefully — a group smaller than k has
    theta = U and its terms become exact.

    Why it matters at 100 TB: overlap questions ("how many users appear
    in BOTH segments?") are where sketches earn their keep — the exact
    answer needs a distinct-join across the full corpus per pair
    (quadratic in segments), while sketches answer ALL pairs from
    |segments| x k longs computed in one scan. The same merge serves
    cross-partition rollup: partial sketches combine associatively.

    Plan: one distinct-shuffle on (group, key) + one k-bounded window;
    everything pairwise happens on |groups| x k rows (tiny, broadcast).
    The exact twin costs one more distinct self-join — the thing the
    sketch exists to avoid, kept here as the verification baseline."""
    orders = load_table(spark, sf_dir, "orders")
    u_f = F.lit(float(_KMV_U))
    # materialize the distinct (group, key) set once: FIVE consumers
    # (hash/sketch, exact counts, group list, both sides of the exact
    # intersection join) would otherwise each re-scan and re-distinct
    # the fact table — this is the "distinct key table" a production
    # pipeline maintains anyway, |groups x keys| rows
    # c IS NOT NULL (r8 NULL-key fuzz): same sketch-membership contract
    # as q_kmv_distinct — NULL keys are not distinct customers, and a
    # NULL hash ranks FIRST in Spark's ASC window vs LAST in DuckDB's
    d = (
        orders.where(F.col("o_custkey").isNotNull())
        .select(
            F.col("o_orderpriority").alias("p"), F.col("o_custkey").alias("c")
        )
        .distinct()
        .localCheckpoint()
    )
    hashed = d.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("c").cast("string")), 1, 15), 16, 10)
        .cast("long"),
    )
    w = Window.partitionBy("p").orderBy("h")
    s = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .select("p", "h")
        .localCheckpoint()  # |groups| x k rows, reused by 3 consumers
    )
    stat = s.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_in"), F.max("h").alias("hk")
    )
    th = stat.select(
        "p",
        F.when(F.col("n_in") < KMV_K, F.lit(_KMV_U))
        .otherwise(F.col("hk"))
        .alias("theta"),
    )
    cnt = d.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    ps = d.select("p").distinct()
    pairs = (
        ps.alias("a")
        .join(ps.alias("b"), F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("prio_a"), F.col("b.p").alias("prio_b"))
    )
    ex = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("y.c") == F.col("x.c")) & (F.col("x.p") < F.col("y.p")),
        )
        .groupBy(
            F.col("x.p").alias("prio_a"), F.col("y.p").alias("prio_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    tha = th.select(F.col("p").alias("pa2"), F.col("theta").alias("theta_a"))
    thb = th.select(F.col("p").alias("pb2"), F.col("theta").alias("theta_b"))
    com = (
        s.alias("sa")
        .join(
            s.alias("sb"),
            (F.col("sb.h") == F.col("sa.h")) & (F.col("sa.p") < F.col("sb.p")),
        )
        .join(tha, F.col("sa.p") == F.col("pa2"))
        .join(thb, F.col("sb.p") == F.col("pb2"))
        .where(F.col("sa.h") < F.least("theta_a", "theta_b"))
        .groupBy(F.col("sa.p").alias("prio_a"), F.col("sb.p").alias("prio_b"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    uh = (
        pairs.join(
            s, (F.col("p") == F.col("prio_a")) | (F.col("p") == F.col("prio_b"))
        )
        .select("prio_a", "prio_b", "h")
        .distinct()
    )
    wu = Window.partitionBy("prio_a", "prio_b").orderBy("h")
    wc = Window.partitionBy("prio_a", "prio_b")
    ur = uh.withColumn("rn", F.row_number().over(wu)).withColumn(
        "nu", F.count(F.lit(1)).over(wc)
    )
    uth = ur.groupBy("prio_a", "prio_b").agg(
        F.max(F.when(F.col("rn") <= KMV_K, F.col("h"))).alias("thu"),
        F.min("nu").alias("nu"),
    )
    res = (
        pairs.join(
            cnt.select(F.col("p").alias("prio_a"), F.col("n").alias("exact_a")),
            "prio_a",
        )
        .join(
            cnt.select(F.col("p").alias("prio_b"), F.col("n").alias("exact_b")),
            "prio_b",
        )
        .join(tha.withColumnRenamed("pa2", "prio_a"), "prio_a")
        .join(thb.withColumnRenamed("pb2", "prio_b"), "prio_b")
        .join(uth, ["prio_a", "prio_b"])
        .join(ex, ["prio_a", "prio_b"], "left")
        .join(com, ["prio_a", "prio_b"], "left")
    )
    inter = F.coalesce(F.col("exact_inter"), F.lit(0))
    cb = F.coalesce(F.col("cb"), F.lit(0))
    theta = F.least("theta_a", "theta_b")
    return res.select(
        "prio_a",
        "prio_b",
        F.col("exact_a").cast("long").alias("exact_a"),
        F.col("exact_b").cast("long").alias("exact_b"),
        inter.cast("long").alias("exact_inter"),
        (F.col("exact_a") + F.col("exact_b") - inter)
        .cast("long")
        .alias("exact_union"),
        F.floor(cb * u_f / theta + F.lit(0.5)).cast("long").alias("kmv_inter"),
        F.when(F.col("nu") < KMV_K, F.col("nu"))
        .otherwise(
            F.floor(F.lit(KMV_K - 1) * u_f / F.col("thu") + F.lit(0.5))
        )
        .cast("long")
        .alias("kmv_union"),
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 table function) — word-run-length encoding
# ---------------------------------------------------------------------------

_UDTF_RUNS = """
-- partitioned by PHYSICAL ROW (doc_id, copy), not doc_id alone: the
-- UDTF expands each input row independently, so duplicate doc_id rows
-- must not merge into one token stream (fuzz finding r6)
WITH d0 AS (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY doc_id) AS copy
  FROM documents
), w AS (
  SELECT doc_id, copy, CAST(unnest(range(len(ss))) AS INTEGER) AS pos,
         unnest(ss) AS word
  FROM (SELECT doc_id, copy, string_split(text, ' ') AS ss FROM d0)
), m AS (
  SELECT doc_id, copy, pos, word,
         CASE WHEN lag(word) OVER (PARTITION BY doc_id, copy ORDER BY pos)
                   = word
              THEN 0 ELSE 1 END AS brk
  FROM w
)
SELECT doc_id, CAST(min(pos) AS INTEGER) AS start_pos, word,
       CAST(count(*) AS INTEGER) AS run_len
FROM (
  SELECT doc_id, copy, pos, word,
         sum(brk) OVER (PARTITION BY doc_id, copy ORDER BY pos) AS grp
  FROM m
) GROUP BY doc_id, copy, word, grp HAVING count(*) >= 2
"""


@register("q_python_udtf", oracle=_UDTF_RUNS)
def q_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal same-word runs per document via a Python UDTF (Spark 4
    user-defined TABLE function) applied as a correlated LATERAL join —
    the one-row-in/N-rows-out imperative expansion shape. The reference
    has no UDF surface at all (SURVEY §2.7: payloads are opaque, the
    enumerator library is fixed); this covers the table-function corner
    of the engine's required UDF family (scalar SQL UDF: q_sql_udf;
    vectorized UDAF: q_pandas_udaf; Arrow map/cogroup: multimodal/
    similarity ops).

    The run-length scan is genuinely imperative (while-loop over the
    token list) — the ORACLE must reconstruct it relationally with a
    gaps-and-islands window, which is exactly the rewrite a SQL engine
    forces and the UDTF avoids.

    Scale: UDTFs execute per-partition in the Python worker with no
    shuffle (map-side); the only data movement is the Arrow/pickle
    batch transfer, and the emitted frame is far smaller than the
    input (runs >= 2 only). At 100 TB the same plan holds: narrow
    map stage, predicate-prunable by doc partition."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_pos int, word string, run_len int")
    class WordRuns:
        def eval(self, text: str):
            if text is None:
                # NULL text expands to zero rows, matching the
                # relational oracle where split(NULL) never explodes
                # (fuzz finding r6)
                return
            words = text.split(" ")
            i = 0
            n = len(words)
            while i < n:
                j = i
                while j < n and words[j] == words[i]:
                    j += 1
                if j - i >= 2:
                    yield (i, words[i], j - i)
                i = j

    spark.udtf.register("word_runs", WordRuns)
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, r.start_pos, r.word, r.run_len
        FROM udtf_docs d, LATERAL word_runs(d.text) r
        """
    )


# ---------------------------------------------------------------------------
# Vectorized Python UDAF (grouped-agg pandas UDF) — trimmed mean
# ---------------------------------------------------------------------------

_TRIMMED_MEAN = """
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), r AS (
  SELECT flag, cents,
         row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY flag) AS n
  FROM c
)
SELECT flag,
       floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 100 + 0.5) / 100
           AS trimmed_mean_price,
       CAST(count(*) AS BIGINT) AS n_kept
FROM r
WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
  AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
GROUP BY flag
"""


@register("q_pandas_udaf", oracle=_TRIMMED_MEAN)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean price per return flag via a grouped-agg pandas
    UDF — the vectorized (Arrow-batched) custom-aggregate surface. A
    trimmed mean is NOT expressible with Spark's built-in aggregates
    (it needs a per-group sort + positional slice), which is precisely
    when a pandas UDAF is the right tool; the oracle reconstructs it
    with a row_number window, the relational rewrite.

    Exactness across engines: prices quantize to integer cents before
    sorting/summing (int64 accumulation is order-free and exact, the
    st_running_stats trick), the trim boundary is floor(n/10) in both
    formulations, and equal cents values are interchangeable under the
    slice, so sort-tie order cannot change the kept multiset. The final
    ratio rounds via the repo's cross-engine floor(x*100+0.5)/100 rule.

    Scale: grouped-agg pandas UDFs shuffle once on the group key and
    stream each group through the Python worker as Arrow batches — the
    same one-shuffle shape as a built-in agg with a vectorized combine;
    groups here are 3 flags, so the Python stage is 3 tiny calls. Skewed
    giant groups would need the salted two-stage variant (q_salted_agg)
    with a mergeable sketch (e.g. t-digest) instead of an exact trim."""
    # functionType passed explicitly: this module runs under
    # `from __future__ import annotations`, which stringifies type hints
    # and defeats pandas_udf's signature inference
    from pyspark.sql.functions import PandasUDFType

    @F.pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean_cents(v):
        cents = (
            (v * 100).round().astype("int64").sort_values(kind="mergesort")
        )
        k = len(cents) // 10
        kept = cents.iloc[k : len(cents) - k]
        return float(kept.sum()) / len(kept) / 100.0

    @F.pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def group_size(v):
        # Catalyst refuses to mix pandas and JVM aggregates in one
        # groupBy, so the count rides the same vectorized stage
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    # NULL measurements are excluded BEFORE the trim (the standard SQL
    # aggregate contract): NaN cents would crash the int64 quantization,
    # and a group whose every price is NULL has no trimmed mean — it
    # drops out on both engines (nullmeas-fixture fuzz class)
    agg = (
        li.where(F.col("l_extendedprice").isNotNull())
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            trimmed_mean_cents(F.col("l_extendedprice")).alias("raw_mean"),
            group_size(F.col("l_extendedprice")).alias("n"),
        )
    )
    return agg.select(
        "flag",
        (F.floor(F.col("raw_mean") * 100 + F.lit(0.5)) / 100).alias(
            "trimmed_mean_price"
        ),
        (F.col("n") - 2 * F.floor(F.col("n") / 10)).cast("long").alias(
            "n_kept"
        ),
    )


# ---------------------------------------------------------------------------
# Grouped-map applyInPandas — per-group rank normalization
# ---------------------------------------------------------------------------

_GROUPED_MAP = """
-- a NULL value has NO rank (pct_rank NULL), rather than DuckDB's
-- rank-the-nulls-last; non-null ranks and the n-1 denominator are
-- unchanged because nulls still count toward n on both sides
-- (fuzz finding r6)
-- NaN likewise has NO rank (r9 non-finite class): pandas rank() skips
-- NaN where DuckDB orders it last — the Spark side already emits NULL
-- via pd.isna, so the oracle mirrors it. +/-Inf rows keep their ranks:
-- both engines order them identically at the partition edges.
SELECT event_id, user_id, "value",
       CASE WHEN "value" IS NULL OR isnan("value") THEN NULL
            ELSE floor(percent_rank()
                       OVER (PARTITION BY user_id ORDER BY "value" NULLS LAST)
                  * 10000 + 0.5) / 10000
       END AS pct_rank
FROM events
"""


@register("q_grouped_map", oracle=_GROUPED_MAP)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user percent-rank normalization via grouped-map applyInPandas
    — the N-rows-in/N-rows-out pandas transform per group (the remaining
    corner of the pandas API family: scalar Arrow UDF q_arrow_udf,
    grouped agg q_pandas_udaf, cogroup d_embedding_cosine, mapInPandas
    multimodal, stateful st_running_stats). pandas rank(method='min')
    minus 1 over n-1 IS SQL percent_rank including tie semantics, so the
    oracle is the plain window formulation; the division is the same
    exact small-int ratio in both engines, floor-rounded by the repo
    rule.

    Scale: one shuffle on the group key; each group materializes in one
    pandas frame, so giant groups need the sketch/window rewrite (the
    oracle's form) — stated trade of the grouped-map API."""
    import pandas as pd  # noqa: F811 — worker-side import parity

    ev = load_table(spark, sf_dir, "events")

    def norm(pdf):
        n = len(pdf)
        if n > 1:
            pct = (pdf["value"].rank(method="min") - 1) / (n - 1)
        else:
            pct = pdf["value"] * 0.0
        import numpy as np

        # NULL value -> NULL rank (nullable Float64, so Arrow ships a
        # real NULL, not NaN) — see the oracle's CASE (fuzz finding r6)
        ranked = np.floor(pct * 10000 + 0.5) / 10000
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value": pdf["value"],
            }
        )
        out["pct_rank"] = pd.array(
            [None if pd.isna(v) else r for v, r in zip(pdf["value"], ranked)],
            dtype="Float64",
        )
        return out

    return (
        ev.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(
            norm,
            schema=(
                "event_id long, user_id long, value double, pct_rank double"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Arrow-optimized scalar Python UDF — Luhn check digit
# ---------------------------------------------------------------------------

_ARROW_UDF = """
WITH u AS (SELECT DISTINCT user_id FROM events),
d AS (SELECT user_id, reverse(CAST(user_id AS VARCHAR)) AS s FROM u)
SELECT user_id,
       CAST(list_sum(list_transform(range(1, length(s) + 1),
            i -> CASE WHEN (i - 1) % 2 = 0
                 THEN CASE WHEN CAST(substr(s, i, 1) AS INTEGER) * 2 > 9
                      THEN CAST(substr(s, i, 1) AS INTEGER) * 2 - 9
                      ELSE CAST(substr(s, i, 1) AS INTEGER) * 2 END
                 ELSE CAST(substr(s, i, 1) AS INTEGER) END)) % 10
            AS INTEGER) AS luhn_digit
FROM d
"""


@register("q_arrow_udf", oracle=_ARROW_UDF)
def q_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum digit per user id via an Arrow-optimized scalar
    Python UDF (`F.udf(useArrow=True)`, Spark 4's vectorized transport
    for row UDFs — ~2-5x over pickled row-at-a-time). The digit-walk is
    procedural; the oracle rebuilds it with a list comprehension over
    the reversed decimal string. Integer arithmetic end to end — exact
    on both engines.

    Scale: map-only over the distinct-key frame (aggregate first, UDF
    after — the cheap order); Arrow batching amortizes the Python
    round-trip. Still the slow path vs built-ins: kept off the hot
    queries by design, existing to pin the API surface."""

    @F.udf("int", useArrow=True)
    def luhn(uid):
        if uid is None:
            # NULL user_id -> NULL digit, matching the oracle's
            # NULL-propagating list_sum over reverse(CAST(NULL))
            # (null-key fuzz class r7)
            return None
        total = 0
        for i, c in enumerate(reversed(str(uid))):
            d = int(c)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10

    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id").distinct().select(
        "user_id", luhn(F.col("user_id")).alias("luhn_digit")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: stored partial-agg state + new-batch merge
# ---------------------------------------------------------------------------

_INCR_AGG = """
WITH c AS (
  SELECT event_type,
         CAST(floor(CASE WHEN isfinite("value") THEN "value" END
                    * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents,
       floor(CAST(sum(cents) AS DOUBLE) / count(*) / 100 * 10000 + 0.5)
           / 10000 AS mean_value
FROM c GROUP BY event_type
"""

_INCR_CUTOFF = "2024-01-15 00:00:00"


@register("q_incremental_agg", oracle=_INCR_AGG)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a per-type metrics rollup: the
    history BEFORE the cutoff is aggregated once into a stored state
    table (materialized to parquet here, a real table in production),
    and the new batch (ts >= cutoff) updates it by MERGING PARTIALS —
    counts and integer-cent sums add, min/min and max/max fold — without
    ever rescanning history. The oracle is the from-scratch aggregate
    over everything, so a green row proves state+delta == full recompute.
    All merge state is integers (the st_running_stats trick), so the
    two-step fold is bit-identical to the one-step one.

    This is the batch skeleton of what streaming foreachBatch rollups do
    every trigger (and of Delta/materialized-view incremental refresh);
    mergeable-state discipline is the same one q_hll_union /
    q_kmv_distinct / t_cms_heavy use for sketches.

    Scale: the delta scan is the only data-sized stage; state is
    |groups| rows. The merge is a groupBy over |groups|x2 rows — free.
    History cost is paid once, ever.

    NULL-time contract (r9): a row with NULL ts satisfies NEITHER side
    of the cutoff predicate (three-valued logic) and cannot be routed
    to state or delta — it is quarantined up front (the ingest-guard
    posture) and the oracle models the same exclusion."""
    # finite_or_null: an Inf reading would overflow the ANSI cents cast
    # and crash the whole refresh (r9 NaN/Inf class)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
    ).select(
        "ts",
        "event_type",
        F.floor(finite_or_null(F.col("value")) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    # one-time history fold, persisted as the state table under a
    # vintage-keyed cached path — so the history really IS aggregated
    # once per source vintage (repeat invocations reuse the parquet
    # state), matching the "history cost is paid once" claim instead of
    # refolding into a fresh leaked temp dir per call
    from streams_spark.sources.feed_cache import cached_feed as _cached_feed

    # cache key carries the cutoff + a state-schema version token so a
    # code change to either invalidates the persisted state instead of
    # serving stale cross-session parquet
    state_dir = _cached_feed(
        sf_dir,
        "incragg",
        f"state|v3-finite|{_INCR_CUTOFF}|event_type,n_events,sum_cents,min_cents,max_cents",
        lambda d: partial(ev.where(F.col("ts") < cutoff))
        .write.mode("overwrite")
        .parquet(d),
    )
    state = spark.read.parquet(state_dir)
    delta = partial(ev.where(F.col("ts") >= cutoff))
    merged = (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        "min_cents",
        "max_cents",
        (
            F.floor(
                F.col("sum_cents").cast("double")
                / F.col("n_events")
                / 100
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("mean_value"),
    )


# ---------------------------------------------------------------------------
# Table profiling: per-column null/distinct/min/max census in one scan
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
    "o_totalprice",
)

_TABLE_PROFILE = """
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CAST(o_orderdate AS VARCHAR) AS o_orderdate,
         CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
             AS o_totalprice
  FROM orders
)
SELECT 'o_orderkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM src
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM src
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
FROM src
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), min(o_orderpriority),
       max(o_orderpriority)
FROM src
UNION ALL
SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate), min(o_orderdate), max(o_orderdate)
FROM src
UNION ALL
SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       CAST(min(CAST(o_totalprice AS BIGINT)) AS VARCHAR),
       CAST(max(CAST(o_totalprice AS BIGINT)) AS VARCHAR)
FROM src
"""


@register("q_table_profile", oracle=_TABLE_PROFILE)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column census (rows, nulls, exact distinct, min,
    max per column) computed in ONE scan: all 6x4 aggregates live in a
    single groupBy-less agg, then pivot to one row per column — the
    oracle states the naive six-scan UNION ALL form a profiler must NOT
    execute. Min/max normalize to strings engine-neutrally (dates ISO,
    money as integer cents — raw double-to-string formatting diverges
    across engines).

    Scale: one pass over the table; the multiple exact distincts expand
    to one shuffle each (Spark's distinct-agg expand), which a
    production profiler trades to approx_count_distinct — the exact form
    is kept here because the oracle can then check every value."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("o_totalprice"),
    )
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = src.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


# ---------------------------------------------------------------------------
# Window navigation functions: nth_value, first/last IGNORE NULLS, defaults
# ---------------------------------------------------------------------------

_WINDOW_NAV = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CASE WHEN "value" >= 10 THEN round("value", 2) END AS v
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id, v,
       first_value(v IGNORE NULLS) OVER w AS first_big,
       last_value(v IGNORE NULLS) OVER w AS last_big_so_far,
       nth_value(v, 3) OVER w AS third_value,
       lag(v, 1, -1.0) OVER w AS prev_or_default,
       lead(v, 2) OVER w AS next_next
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("q_window_navigation", oracle=_WINDOW_NAV)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window NAVIGATION surface in one query: first_value/last_value
    with IGNORE NULLS (gap-jumping over a sparsified column), nth_value
    over a running frame, lag with an explicit default, and a 2-step
    lead beyond the frame (null at partition tail). The running ROWS
    frame makes last_value meaningful (current-row-so-far) and nth_value
    null until 3 non-... rows accumulate — the exact semantics both
    engines must agree on, which is the point of pinning them.

    Scale: one shuffle on the partition key; all five functions share
    the single sort and frame — Catalyst evaluates them in one Window
    operator, not five.

    NULL-time contract (r9): the navigation order key is ts — a row
    without one has no position to navigate from; excluded both sides.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("value") >= 10, F.round("value", 2)).alias("v"),
    )
    from pyspark.sql.window import Window as W

    wo = W.partitionBy("user_id").orderBy("ts", F.asc_nulls_last("event_id"))
    w = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    # lag/lead take no frame (they navigate the partition, not a frame)
    # — same semantics the SQL window gives them despite the shared
    # WINDOW clause; the framed spec feeds the value functions only
    return sparse.select(
        "event_id",
        "user_id",
        "v",
        F.first("v", ignorenulls=True).over(w).alias("first_big"),
        F.last("v", ignorenulls=True).over(w).alias("last_big_so_far"),
        F.nth_value("v", 3).over(w).alias("third_value"),
        F.lag("v", 1, -1.0).over(wo).alias("prev_or_default"),
        F.lead("v", 2).over(wo).alias("next_next"),
    )
