"""Relational closure widening, round 2 (SURVEY.md §2.1): bitwise/boolean
aggregates, ordered string aggregation, GROUPING flags, INTERSECT ALL,
width_bucket histograms, deterministic mode, exact linear regression, and
bitmap-index distinct counting.

All reference O9 (per-key accumulation) with richer monoids than `+1`
(ListenerReducer.java:123-139): bit/bool monoids, sorted-list concat,
bitmap OR. The bitmap distinct-count family is the classic scale trick —
COUNT(DISTINCT) without a per-group hash set: distinct keys become set bits
in fixed-width bucket bitmaps (commutative OR → full map-side combine),
then a popcount sum. On 100 TB this replaces a giant shuffle of raw keys
with 4 KB bitmap payloads per (group, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "agg_bitwise_bool",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_custkey) AS and_cust,
           bit_or(o_custkey) AS or_cust,
           bit_xor(o_custkey) AS xor_cust,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Bitwise (AND/OR/XOR) and boolean (EVERY/ANY/COUNT_IF) aggregate "
    "monoids — all commutative+associative, so Spark's partial/final split "
    "gives full map-side combine for free.",
    tags=("agg", "bitwise"),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_custkey").alias("and_cust"),
        F.bit_or("o_custkey").alias("or_cust"),
        F.bit_xor("o_custkey").alias("xor_cust"),
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@register(
    "agg_string_agg_ordered",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           string_agg(CAST(l_orderkey AS VARCHAR), ',' ORDER BY l_orderkey, l_linenumber)
             AS first_keys
    FROM lineitem
    WHERE l_orderkey < 40
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Ordered string aggregation (LISTAGG/string_agg WITHIN GROUP): "
    "collect_list is partition-order-nondeterministic, so the list is "
    "sorted on an explicit total order (orderkey, linenumber) before "
    "concat — duplicates retained, unlike agg_collect_sorted's set.",
    tags=("agg", "array"),
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 40)
    # Sort (orderkey, linenumber) pairs as structs, then project the string.
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("l_orderkey", "l_linenumber"))
                ),
                lambda s: s["l_orderkey"].cast("string"),
            ),
            ",",
        ).alias("first_keys")
    )


@register(
    "agg_grouping_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="GROUPING()/GROUPING_ID() markers distinguishing real NULL keys from "
    "subtotal rows in ROLLUP output — the only reliable way to consume "
    "grouping-set results.",
    tags=("agg", "groupingsets"),
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.grouping_id("l_returnflag", "l_linestatus").cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_width_bucket_histogram",
    oracle="""
    SELECT CAST(CASE
             WHEN o_totalprice < 0.0 THEN 0
             WHEN o_totalprice >= 600000.0 THEN 7
             ELSE CAST(floor(o_totalprice / (600000.0 / 6)) AS BIGINT) + 1
           END AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width histogram via width_bucket(x, 0, 600000, 6) — the "
    "single-pass distributed histogram (bucket id is a pure map-side "
    "expression; one small shuffle of bucket counts). Oracle reproduces "
    "width_bucket's floor((x-lo)/((hi-lo)/n))+1 arithmetic literally.",
    tags=("agg", "histogram"),
)
def agg_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(6))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    ranked AS (
      SELECT l_returnflag, l_linestatus, cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_linestatus ASC) AS rn
      FROM counts
    )
    SELECT l_returnflag, l_linestatus AS mode_status, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    doc="Deterministic MODE: built-in mode() leaves ties engine-defined, so "
    "the portable form is count-then-argmax with an explicit tie-break "
    "(count DESC, value ASC) — two shuffles, both on small group keys.",
    tags=("agg",),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_linestatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("cnt").alias("mode_count"),
        )
    )


@register(
    "agg_regression_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM s
    """,
    doc="Exact OLS regression (price ~ quantity) per group: built-in "
    "regr_slope accumulates doubles in partition order (nondeterministic "
    "under shuffle), so the moments Sx/Sy/Sxx/Sxy are summed as exact "
    "DECIMALs and the closed form evaluated once in IEEE double — "
    "bit-stable on any cluster size. Same pattern as agg_exact_moments.",
    tags=("agg", "stats"),
)
def agg_regression_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    l = _t(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    prod = lambda a, b: (a * b).cast(DecimalType(25, 4))  # noqa: E731
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(prod(q, q)).cast("double").alias("sxx"),
        F.sum(prod(q, p)).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct_parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bitmap-index distinct count: keys become set bits in fixed 32768-"
    "bit bucket bitmaps (bitmap_bit_position/bitmap_construct_agg), merged "
    "with commutative OR, popcounted and summed. Exact like "
    "COUNT(DISTINCT) but shuffles ~4 KB per (group,bucket) instead of "
    "every raw key — the scale path between exact distinct and HLL. "
    "Oracle: plain COUNT(DISTINCT).",
    tags=("agg", "distinct", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    per_bucket = l.groupBy(
        "l_returnflag",
        F.expr("bitmap_bucket_number(l_partkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").alias("bm")
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_parts")
    )


@register(
    "scalar_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 3 AS shl3,
           o_orderkey >> 2 AS shr2,
           ~o_orderkey AS inverted,
           CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
    FROM orders WHERE o_orderkey < 200
    """,
    doc="Scalar bitwise expressions (&, |, ^, shifts, ~, popcount) — pure "
    "codegen'd row expressions, zero shuffle.",
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(4096).alias("with_flag"),
        k.bitwiseXOR(21845).alias("xored"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bitwise_not(k).alias("inverted"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


@register(
    "scalar_try_functions",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / (o_orderkey % 3) AS try_div,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS priority_digit,
           TRY_CAST(o_orderdate AS VARCHAR) AS date_str
    FROM orders WHERE o_orderkey < 300
    """,
    doc="Error-safe TRY_ variants (NULL instead of runtime failure): "
    "try_divide on a 0 denominator, try_cast on non-numeric text — the "
    "fault-tolerance surface a 100 TB ingest needs (one malformed row "
    "must not kill a 1000-executor stage). DuckDB's /0 yields NULL "
    "natively; TRY_CAST matches try_cast.",
    tags=("scalar", "try"),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).alias(
            "try_div"
        ),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_cast"),
        F.expr(
            "try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)"
        ).alias("priority_digit"),
        F.expr("try_cast(o_orderdate AS STRING)").alias("date_str"),
    )
