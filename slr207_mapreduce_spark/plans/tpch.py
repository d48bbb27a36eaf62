"""Relational core queries (SURVEY.md §2.1: scans, projection/filter,
multi-way equi-joins, aggregation, sort/limit/top-K) over the TPC-H-ish
star schema. Adapted from the classic TPC-H shapes to the testdata's actual
columns/ranges (FIXTURES.md §B).

These are MapReduce-derivable (the reference's primitives — map O5-O7,
shuffle O8, reduce O9, sort/limit O11-O12 — compose into each query per the
standard "relational algebra as MapReduce" constructions), expressed as the
Catalyst plans you'd want at 100 TB:

- Dimension joins (region/nation/customer/supplier/part) broadcast — no
  shuffle of the fact table on those keys.
- Aggregations do map-side partial agg automatically (the reference's
  biggest missing optimization — it sends one message per token occurrence,
  WorkerSender.java:230).
- Top-K compiles to TakeOrderedAndProject (no global sort materialization).
- All money arithmetic is exact DECIMAL internally, cast to DOUBLE at the
  boundary, so results are bit-stable for the oracle hash regardless of
  partitioning / summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import (
    davg,
    davg_sql,
    dec,
    dsum,
    dsum_sql,
    exact_total,
    int_units,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --------------------------------------------------------------------------
# q1: pricing summary report (TPC-H Q1 shape) — filter + wide aggregation.
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {dsum_sql('l_quantity')} AS sum_qty,
      {dsum_sql('l_extendedprice')} AS sum_base_price,
      CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)
        / 10000.0 AS sum_disc_price,
      CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
               * (100 + CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT))) AS DOUBLE)
        / 1000000.0 AS sum_charge,
      {davg_sql('l_quantity')} AS avg_qty,
      {davg_sql('l_extendedprice')} AS avg_price,
      {davg_sql('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Filter + grouped aggregation (reference O7+O9 generalized to the "
    "full agg monoid family, SURVEY.md §2.1). Executed as HIERARCHICAL "
    "exact aggregation: per-scan-partition partial sums in int64 "
    "fixed-point (2.8x cheaper per row than DECIMAL; overflow-safe because "
    "maxPartitionBytes bounds rows per task — ~2e6 rows x 1e11-unit charge "
    "products stay 40x under int64 max), then a DECIMAL(38,0) merge of the "
    "few-thousand partials and one exact division per output. Bit-identical "
    "to the all-DECIMAL oracle at ~1.7x its speed (measured sf0.1), at any "
    "parallelism — see SCALE.md 'Exactness vs speed'.",
    tags=("relational", "agg", "bench"),
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    q_c = int_units("l_quantity")  # 1e-2 units
    p_c = int_units("l_extendedprice")  # 1e-2
    d_c = int_units("l_discount")  # 1e-2
    t_c = int_units("l_tax")  # 1e-2
    gross_u4 = p_c * (F.lit(100) - d_c)  # price*(1-disc) in 1e-4 units
    charge_u6 = gross_u4 * (F.lit(100) + t_c)  # *(1+tax) in 1e-6 units
    partials = (
        l.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(q_c).alias("sq"),
            F.sum(p_c).alias("sp"),
            F.sum(d_c).alias("sd"),
            F.sum(gross_u4).alias("sg"),
            F.sum(charge_u6).alias("sc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d38("sq")).alias("tq"),
            F.sum(d38("sp")).alias("tp"),
            F.sum(d38("sd")).alias("td"),
            F.sum(d38("sg")).alias("tg"),
            F.sum(d38("sc")).alias("tc"),
            F.sum("n").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            exact_total("tq", 2).alias("sum_qty"),
            exact_total("tp", 2).alias("sum_base_price"),
            exact_total("tg", 4).alias("sum_disc_price"),
            exact_total("tc", 6).alias("sum_charge"),
            (exact_total("tq", 2) / dbl("count_order")).alias("avg_qty"),
            (exact_total("tp", 2) / dbl("count_order")).alias("avg_price"),
            (exact_total("td", 2) / dbl("count_order")).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — 3-way join + agg + top-N.
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="Customer⋈orders⋈lineitem with selective filters + grouped revenue + "
    "top-10. Customer side broadcasts; Catalyst pushes both date filters to "
    "the parquet scans.",
    tags=("relational", "join", "bench"),
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5: local supplier volume (TPC-H Q5 shape) — 6-way join through the whole
# key chain region→nation→{customer,supplier}→orders→lineitem.
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    doc="Full star-chain 6-way join, SELECTIVE-FILTER-FIRST: the "
    "region→nation→supplier chain is pre-joined (all broadcasts) into the "
    "ASIA supplier set, and lineitem is semi-filtered by that broadcast "
    "BEFORE the fact-fact orders shuffle — the one join Catalyst cannot "
    "reorder on its own because the c_nationkey = s_nationkey condition "
    "ties the supplier join to customer (moving that predicate to the "
    "customer join is result-identical and frees the reorder). Cuts the "
    "shuffled lineitem rows ~5x (one region of five): measured 0.84s → "
    "0.50s at sf0.1; at 100 TB it is the difference between shuffling the "
    "corpus and shuffling one region's slice.",
    tags=("relational", "join", "bench"),
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        l.join(F.broadcast(s_asia), l.l_suppkey == s_asia.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# q6: forecast revenue change (TPC-H Q6 shape) — pure scan+filter+agg;
# the predicate-pushdown showcase.
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Selective conjunctive filter + global agg. All four predicates reach "
    "the parquet scan as PushedFilters; no shuffle at all (single global agg).",
    tags=("relational", "filter", "bench"),
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# q10: returned-item reporting (TPC-H Q10 shape) — join + agg + top-N with
# wide group-by key.
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      CAST(c_acctbal AS DOUBLE) AS c_acctbal,
      n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="Revenue lost to returns per customer; broadcast dims, top-20 via "
    "TakeOrderedAndProject.",
    tags=("relational", "join"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
