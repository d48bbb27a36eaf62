"""Subquery / CTE / pivot coverage — the relational closure's glue shapes
(SURVEY.md §2.1): scalar subqueries, correlated predicates, derived-table
CTEs, pivot/unpivot. Catalyst de-correlates these into joins+aggs — i.e.
exactly the MapReduce compositions the reference's primitives derive
(SURVEY.md §2.1 table), which is why they belong to the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "subq_scalar_global_avg",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem
    WHERE l_quantity > 2 * (
      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      FROM lineitem
    )
    """,
    doc="Scalar subquery (TPC-H Q17 shape): lineitems above 2× the global "
    "mean quantity. The scalar aggregates once and broadcasts into the "
    "filter — no per-row recompute.",
    tags=("subquery",),
)
def subq_scalar_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
        FROM lineitem
        WHERE l_quantity > 2 * (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          FROM lineitem
        )
        """
    )


@register(
    "subq_correlated_avg_per_brand",
    oracle="""
    SELECT p_partkey, p_name, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p_retailprice > (
      SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    doc="Correlated scalar subquery (TPC-H Q2/Q17 family): parts priced "
    "above their brand's mean. Catalyst de-correlates to an aggregate + "
    "equi-join on the correlation key — the 2-round MapReduce construction.",
    tags=("subquery",),
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM part p
        WHERE p_retailprice > (
          SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


@register(
    "subq_cte_top_customers",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, total_spend, n_orders,
             ROW_NUMBER() OVER (ORDER BY total_spend DESC, o_custkey ASC) AS rk
      FROM spend
    )
    SELECT r.o_custkey, c.c_name, r.total_spend, r.n_orders, CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
    WHERE r.rk <= 15
    """,
    doc="Multi-stage CTE pipeline (TPC-H Q18 shape): aggregate → rank → "
    "join back to the dimension. Exercises reuse of a derived relation.",
    tags=("subquery", "cte"),
)
def subq_cte_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window

    spend = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
    ranked = spend.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 15)
    return ranked.join(c, ranked.o_custkey == c.c_custkey).select(
        "o_custkey", "c_name", "total_spend", "n_orders", F.col("rk").cast("long").alias("rk")
    )


@register(
    "subq_in_uncorrelated",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ) AND o_orderstatus = 'O'
    """,
    doc="Uncorrelated IN subquery → left-semi join after rewrite.",
    tags=("subquery",),
)
def subq_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    rich = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    return o.join(
        rich, o.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot (wide aggregation): total price per priority × status. "
    "Spark pivot with explicit value list = one pass, no per-value scans; "
    "oracle is the equivalent conditional aggregation.",
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, CAST(l_quantity AS DOUBLE) AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE) FROM lineitem WHERE l_orderkey < 100
    """,
    doc="Unpivot (melt): wide measures → (measure, val) long form.",
    tags=("pivot",),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        F.col("val").cast("double").alias("val"),
    )


@register(
    "subq_recursive_cte_day_spine",
    oracle="""
    WITH RECURSIVE days(day) AS (
      SELECT CAST('2024-01-01 00:00:00' AS TIMESTAMP)
      UNION ALL
      SELECT day + INTERVAL 1 DAY FROM days
      WHERE day < CAST('2024-01-30 00:00:00' AS TIMESTAMP)
    )
    SELECT day, COUNT(e.event_id) AS n_events
    FROM days LEFT JOIN (
      SELECT event_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS eday
      FROM events
    ) e ON e.eday = days.day
    GROUP BY day
    ORDER BY day
    """,
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4): a 30-day calendar "
    "spine generated by recursion, left-joined to per-day event counts so "
    "empty days surface as zero — the recursive complement of the "
    "sequence()-based spine in events_gap_filled_hours. Spark's recursion "
    "currently supports UNION ALL only (no UNION-distinct), so it fits "
    "ACYCLIC recursion like spines and hierarchies; cyclic closures "
    "(dedup_clusters) stay on the iterative min-label path. Depth is "
    "bounded (30 « the 100-step recursion limit) and the recursion "
    "produces one row per step — driver-side-loop-free.",
    tags=("subquery", "recursive", "events"),
)
def subq_recursive_cte_day_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE days(day) AS (
          SELECT CAST('2024-01-01 00:00:00' AS TIMESTAMP)
          UNION ALL
          SELECT day + INTERVAL 1 DAY FROM days
          WHERE day < CAST('2024-01-30 00:00:00' AS TIMESTAMP)
        )
        SELECT day, COUNT(e.event_id) AS n_events
        FROM days LEFT JOIN (
          SELECT event_id, date_trunc('day', ts) AS eday FROM events
        ) e ON e.eday = days.day
        GROUP BY day
        ORDER BY day
        """
    )


@register(
    "subq_lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name, top.s_name, top.s_acctbal
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2
    ) AS top
    ORDER BY n.n_name, top.s_acctbal DESC, top.s_name
    """,
    doc="LATERAL correlated subquery: per nation, its top-2 suppliers by "
    "account balance — the correlated-TVF join surface (Spark plans it as "
    "a LateralJoin/DomainJoin; semantically a per-row subquery the "
    "optimizer decorrelates into a ranked join, same result as the window "
    "formulation in window_rank_topn_per_group but expressed as the SQL "
    "LATERAL operator).",
    tags=("subquery", "lateral", "join"),
)
def subq_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT n.n_name, top.s_name, top.s_acctbal
        FROM nation n, LATERAL (
          SELECT s_name, s_acctbal
          FROM supplier
          WHERE s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name
          LIMIT 2
        ) AS top
        ORDER BY n.n_name, top.s_acctbal DESC, top.s_name
        """
    )
