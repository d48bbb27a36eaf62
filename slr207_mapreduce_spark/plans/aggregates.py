"""Aggregation operator coverage (SURVEY.md §2.1 "Aggregations" +
"Grouping sets / rollup / cube" rows).

MapReduce derivation: the reference's reduce (O9, ListenerReducer.java:
123-139) is per-key `+1`; swapping the monoid gives sum/min/max/avg;
count-distinct is a two-round MapReduce (dedup round, count round);
grouping sets = map emits one record per grouping set. In Spark all are
``groupBy().agg(...)`` / ``rollup`` / ``cube`` with automatic partial
aggregation (map-side combine the reference lacks).

Exactness contract: double aggregates go DECIMAL→DOUBLE (functions/portable
.py); derived int columns are cast to BIGINT on both sides so schemas agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import davg, davg_sql, dec, dsum, dsum_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "agg_basic_stats",
    oracle=f"""
    SELECT
      l_returnflag,
      COUNT(*) AS n_rows,
      {dsum_sql('l_quantity')} AS sum_qty,
      CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
      {davg_sql('l_extendedprice')} AS avg_price,
      CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
      CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="count/sum/min/max/avg over doubles and timestamps per group.",
    tags=("agg",),
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(DISTINCT o_orderstatus) AS n_statuses,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact count-distinct (two-phase: dedup shuffle then count — the "
    "classic two-round MapReduce; Spark plans expand+2-stage agg).",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketches differ across engines by design → rows-only
    doc="approx_count_distinct (HyperLogLog++). The scale path for distinct "
    "counting: one pass, fixed memory, no dedup shuffle. Engine sketches "
    "differ from DuckDB's, so no value oracle; tests bound relative error "
    "against the exact count instead (tests/test_aggregates.py).",
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers_approx")
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT l_partkey, {dsum_sql('l_quantity')} AS total_qty, COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 400
    """,
    doc="Post-aggregation filter (HAVING) — filter over the reduce output.",
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(
            F.sum(dec("l_quantity")).alias("q_dec"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .where(F.col("q_dec") > 400)
        .select(
            "l_partkey", F.col("q_dec").cast("double").alias("total_qty"), "n_lines"
        )
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(DISTINCT CAST(l_suppkey AS BIGINT))), ',') AS suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Array aggregation made deterministic: collect_set is unordered by "
    "construction, so every collected array is sort_array'd before leaving "
    "the operator — the only way array aggs can be reproducible under "
    "partitioning. Output arrays are serialized to ',' joined strings so "
    "every emitted cell is scalar (keeps order-insensitive hash comparators "
    "that sort raw cells happy).",
    tags=("agg", "array"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.sort_array(F.collect_set(F.col("l_suppkey").cast("long"))), ","
        ).alias("suppliers"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_sql('l_extendedprice')} AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy: (flag,status), (flag), () subtotals with NULL "
    "group markers — map emits one record per grouping set.",
    tags=("agg", "groupingsets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, {dsum_sql('o_totalprice')} AS sum_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all 2^k grouping sets.",
    tags=("agg", "groupingsets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum("o_totalprice").alias("sum_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS (disjoint single-column sets).",
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame API has no direct grouping-sets builder; SQL is the idiomatic
    # surface (same Catalyst Expand plan as rollup/cube).
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_hll_mergeable_sketches",
    oracle=None,  # Datasketches HLL binary sketches are engine-specific → rows-only
    doc="Mergeable-sketch aggregation: per-language HLL sketches of "
    "document sources, union-merged to a global estimate WITHOUT "
    "re-scanning the data. This is the re-aggregation property exact "
    "distinct counts lack: at 100 TB "
    "the per-partition/per-day sketches are built once and any rollup "
    "(week, global, per-lang) is a cheap union of sketch bytes, the "
    "cube/continuous-aggregate pattern. Estimates are exact here (HLL "
    "sparse mode below ~thousands of distincts); the test pins est == "
    "exact per group.",
    tags=("agg", "approx", "sketch"),
)
def agg_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.hll_sketch_agg("source").alias("sk"),
        F.countDistinct("source").cast("long").alias("exact_sources"),
    )
    est = per_lang.select(
        "lang",
        F.hll_sketch_estimate("sk").cast("long").alias("est_sources"),
        "exact_sources",
    )
    merged = per_lang.agg(
        F.lit("__all__").alias("lang"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_sources"),
        F.lit(None).cast("long").alias("exact_sources"),
    )
    return est.unionByName(merged).orderBy("lang")


@register(
    "agg_exact_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(l_quantity) AS DOUBLE) AS sx,
             CAST(SUM(l_quantity * l_quantity) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS syy,
             CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2)))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           sx / n AS mean_qty,
           sqrt((n * syy - sy * sy) / (n * (n - 1))) AS stddev_price,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM s
    ORDER BY l_returnflag
    """,
    doc="Exact-sum statistical moments: sample stddev and Pearson "
    "correlation derived from DECIMAL-exact Σx/Σx²/Σxy, with the algebra "
    "done in double on identical operands (each *, -, /, sqrt is one "
    "deterministic IEEE op). The builtin stddev/corr use Welford-style "
    "accumulation whose result depends on partition merge ORDER — fine "
    "statistically, but not reproducible run-to-run at cluster scale; "
    "this shape is. l_quantity is integral so its raw double sums are "
    "exact; prices go through DECIMAL(12,2); the squared/cross terms "
    "are exact DECIMAL products summed without rounding.",
    tags=("agg", "stats"),
)
def agg_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = dec("l_extendedprice")
    q = dec("l_quantity")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("sx"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        # FLOOR before the double cast: these two sums carry scale-4
        # unscaled values past 2^53, where DuckDB's decimal->double is a
        # TWO-step rounding (int128->double, then *1e-4) while Spark's
        # BigDecimal cast is correctly rounded — a 1-ulp cross-engine drift
        # (observed at sf0.001). Flooring to an exact integer first makes
        # the conversion single-rounded and identical in both engines; the
        # <=1-unit truncation is ~1e-13 relative, applied identically.
        F.floor(F.sum(p * p)).cast("double").alias("syy"),
        F.floor(F.sum(q * p)).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n_rows",
        (sx / n).alias("mean_qty"),
        F.sqrt((n * syy - sy * sy) / (n * (n - F.lit(1.0)))).alias("stddev_price"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY ALL
    """,
    doc="GROUP BY ALL (Spark 4 / modern-SQL sugar): every non-aggregate "
    "select-list column becomes a grouping key, so wide summary queries "
    "can't silently drop a key. Plans to the same partial+final "
    "HashAggregate as an explicit GROUP BY; DuckDB supports the identical "
    "syntax, so the oracle is textually the same query.",
    tags=("agg", "sql"),
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY ALL
        """
    )
