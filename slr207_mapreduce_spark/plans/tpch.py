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
from slr207_mapreduce_spark.sources.tables import load_table, table_view


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# Build-latency note (r15, guide §1): these five builders are assembled as
# ONE spark.sql() text over cached temp views (sources/tables.table_view)
# instead of chained DataFrame ops — every DataFrame op is eagerly
# analyzed, and the chained forms paid 0.12-0.48 s of pure analyzer/py4j
# time per build at sf0.1 (measured; the bench times build+execute, and
# build was 30-50% of these queries' walls). The SQL texts reproduce the
# previous logical plans operator-for-operator — same filters, join order,
# broadcast hints, fixed-point arithmetic and aliases — so the physical
# plans and results are unchanged (oracle exact-value checked at sf0.01
# and sf0.1; plan shapes pinned by tests/test_plans.py).


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
    l = table_view(spark, "lineitem", sf_dir)
    # int_units(col): FLOOR(col*100 + 0.5D) — int64 fixed-point, same bits
    # as functions/portable.int_units (0.5D: double literal, matching the
    # DataFrame form's python-float lit; a bare 0.5 would be DECIMAL(1,1)).
    u = lambda c: f"FLOOR({c} * 100 + 0.5D)"  # noqa: E731
    gross_u4 = f"{u('l_extendedprice')} * (100 - {u('l_discount')})"
    charge_u6 = f"{gross_u4} * (100 + {u('l_tax')})"
    # exact_total(c, d): CAST(c AS DOUBLE) / 10^d as a double literal —
    # cast-the-integer-first (see functions/portable.exact_total).
    return spark.sql(f"""
        WITH part AS (
          SELECT l_returnflag, l_linestatus,
                 SUM({u('l_quantity')})      AS sq,
                 SUM({u('l_extendedprice')}) AS sp,
                 SUM({u('l_discount')})      AS sd,
                 SUM({gross_u4})             AS sg,
                 SUM({charge_u6})            AS sc,
                 COUNT(1)                    AS n
          FROM {l}
          WHERE l_shipdate <= TIMESTAMP'2000-09-02'
          GROUP BY l_returnflag, l_linestatus, spark_partition_id()
        ),
        tot AS (
          SELECT l_returnflag, l_linestatus,
                 SUM(CAST(sq AS DECIMAL(38,0))) AS tq,
                 SUM(CAST(sp AS DECIMAL(38,0))) AS tp,
                 SUM(CAST(sd AS DECIMAL(38,0))) AS td,
                 SUM(CAST(sg AS DECIMAL(38,0))) AS tg,
                 SUM(CAST(sc AS DECIMAL(38,0))) AS tc,
                 SUM(n) AS count_order
          FROM part GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               CAST(tq AS DOUBLE) / 100.0D     AS sum_qty,
               CAST(tp AS DOUBLE) / 100.0D     AS sum_base_price,
               CAST(tg AS DOUBLE) / 10000.0D   AS sum_disc_price,
               CAST(tc AS DOUBLE) / 1000000.0D AS sum_charge,
               (CAST(tq AS DOUBLE) / 100.0D) / CAST(count_order AS DOUBLE) AS avg_qty,
               (CAST(tp AS DOUBLE) / 100.0D) / CAST(count_order AS DOUBLE) AS avg_price,
               (CAST(td AS DOUBLE) / 100.0D) / CAST(count_order AS DOUBLE) AS avg_disc,
               count_order
        FROM tot
        ORDER BY l_returnflag, l_linestatus
    """)


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
    l = table_view(spark, "lineitem", sf_dir)
    o = table_view(spark, "orders", sf_dir)
    c = table_view(spark, "customer", sf_dir)
    return spark.sql(f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM {l}
        JOIN {o} ON l_orderkey = o_orderkey
        JOIN {c} ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP'1998-01-01'
          AND l_shipdate  > TIMESTAMP'1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """)


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
    l = table_view(spark, "lineitem", sf_dir)
    o = table_view(spark, "orders", sf_dir)
    c = table_view(spark, "customer", sf_dir)
    s = table_view(spark, "supplier", sf_dir)
    n = table_view(spark, "nation", sf_dir)
    r = table_view(spark, "region", sf_dir)
    # Same join tree and broadcast hints as the previous DataFrame form:
    # the ASIA supplier chain pre-joins (all broadcasts) and semi-filters
    # lineitem BEFORE the fact-fact orders join — see the register() doc.
    return spark.sql(f"""
        WITH s_asia AS (
          SELECT /*+ BROADCAST(n), BROADCAST(r) */ s_suppkey, s_nationkey, n_name
          FROM {s} JOIN {n} n ON s_nationkey = n_nationkey
                   JOIN {r} r ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        SELECT /*+ BROADCAST(s_asia) */ n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM {l}
        JOIN s_asia ON l_suppkey = s_suppkey
        JOIN {o} ON l_orderkey = o_orderkey
        JOIN {c} ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        WHERE o_orderdate >= TIMESTAMP'1996-01-01'
          AND o_orderdate <  TIMESTAMP'1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """)


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
    l = table_view(spark, "lineitem", sf_dir)
    # 0.05D/0.07D: double literals matching the DataFrame form's python
    # floats (a bare 0.05 would be a DECIMAL(3,2) literal and change the
    # pushed-filter type).
    return spark.sql(f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               COUNT(1) AS n_rows
        FROM {l}
        WHERE l_shipdate >= TIMESTAMP'1997-01-01'
          AND l_shipdate <  TIMESTAMP'1998-01-01'
          AND l_discount >= 0.05D AND l_discount <= 0.07D
          AND l_quantity < 24
    """)


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
    l = table_view(spark, "lineitem", sf_dir)
    o = table_view(spark, "orders", sf_dir)
    c = table_view(spark, "customer", sf_dir)
    n = table_view(spark, "nation", sf_dir)
    return spark.sql(f"""
        SELECT /*+ BROADCAST(n) */ c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               n_name
        FROM {l}
        JOIN {o} ON l_orderkey = o_orderkey
        JOIN {c} ON o_custkey = c_custkey
        JOIN {n} n ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP'1997-01-01'
          AND o_orderdate <  TIMESTAMP'1998-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """)
