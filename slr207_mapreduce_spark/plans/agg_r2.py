"""Aggregate surface widening, round 2 (SURVEY.md §2.1 — richer reduce
monoids over the reference's O9 per-key accumulation,
ListenerReducer.java:123-139):

- FILTER-clause conditional aggregation (one scan, many predicated sums —
  the map-side-combine-friendly replacement for N self-joined subqueries)
- min_by / max_by argmin-argmax with a composite (value, key) ordering so
  ties are impossible and results are engine-stable
- exact interpolated percentiles (percentile / median — single shuffle,
  sort inside the aggregate; the exact counterpart of the declared
  approx_percentile surface)
- multiple COUNT(DISTINCT) in one aggregation (Catalyst Expand: one scan
  fans out per distinct key set instead of N self-joins)
- exact skewness / kurtosis from DECIMAL power sums (Spark's builtin
  skewness()/kurtosis() fold doubles in partition order — order-dependent
  bits — so the checked form derives both from exact Σx, Σx², Σx³, Σx⁴
  via the closed-form central-moment identities, multiplication-only so
  both engines produce bit-identical IEEE results at any parallelism)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec, portable_hash64_lane_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_open,
           CAST(count(*) FILTER (WHERE o_totalprice > 150000.0) AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="FILTER (WHERE ...) conditional aggregation: one scan computes N "
    "predicated aggregates — at 100 TB this replaces N filtered self-"
    "aggregations (N scans) with one, and every branch still map-side "
    "combines. Double sums go through exact DECIMAL (SCALE.md).",
    tags=("agg",),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.count_if(fin).alias("n_finished"),
        F.sum(F.when(fin, dec("o_totalprice"))).cast("double").alias("rev_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", dec("o_totalprice")))
        .cast("double")
        .alias("rev_open"),
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
    )


@register(
    "agg_min_by_max_by",
    # Oracle avoids arg_min/arg_max tie ambiguity by construction: the
    # ordering struct ends in the unique key, so rn=1 is a total order.
    oracle="""
    WITH lo AS (
      SELECT o_orderstatus, o_orderkey,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
      FROM orders
    ),
    hi AS (
      SELECT o_orderstatus, o_orderkey,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT l.o_orderstatus,
           l.o_orderkey AS cheapest_order,
           h.o_orderkey AS priciest_order
    FROM lo l JOIN hi h ON l.o_orderstatus = h.o_orderstatus
    WHERE l.rn = 1 AND h.rn = 1
    """,
    doc="min_by / max_by argmin-argmax aggregates. The ordering key is the "
    "composite struct(price, orderkey) — a TOTAL order, so ties cannot "
    "occur and any engine returns the same row. Plain aggregation (full "
    "map-side combine), vs the oracle's window formulation which must "
    "materialize per-group sorts.",
    tags=("agg",),
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    order_struct = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", order_struct).alias("cheapest_order"),
        F.max_by("o_orderkey", order_struct).alias("priciest_order"),
    )


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.90) AS price_p90,
           median(l_quantity) AS med_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (percentile()/median()): sort-"
    "within-aggregate, one shuffle on the group key. Linear interpolation "
    "on the sorted values is position arithmetic — order-independent, so "
    "it hash-matches DuckDB's quantile_cont exactly. At 100 TB the "
    "declared approx_percentile (events_approx_percentiles) is the "
    "default; this is the exact verifier tier.",
    tags=("agg",),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.percentile("l_extendedprice", F.lit(0.90)).alias("price_p90"),
        F.median("l_quantity").alias("med_qty"),
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_ord,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Several COUNT(DISTINCT ...) over different keys in ONE aggregation. "
    "Catalyst plans this with Expand (each row fans out once per distinct "
    "key set, then a two-phase distinct+count) — one scan instead of three "
    "self-aggregated scans. The 100 TB trade: Expand multiplies shuffle "
    "rows by the number of distinct columns; beyond a few, rewrite to HLL "
    "sketches (agg_hll_mergeable_sketches) or bitmaps (agg_bitmap_distinct).",
    tags=("agg",),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
        F.count_distinct("l_orderkey").alias("n_ord"),
        F.count("*").alias("n_rows"),
    )


# Shared SQL text for the closed-form moment math. The arithmetic shape is
# IDENTICAL on both sides (left-associative +/-/*, sqrt only — no pow()):
# libm pow() is not correctly rounded and differs across implementations,
# but *, /, sqrt are IEEE-exact, so writing x*x*x instead of pow(x,3)
# makes the doubles bit-identical in Spark and DuckDB.
_MOMENT_MATH = """
    SELECT l_linestatus,
           n,
           m1,
           (s2 / n - m1 * m1) AS variance,
           (s3 / n - 3.0 * m1 * (s2 / n) + 2.0 * m1 * m1 * m1)
             / ((s2 / n - m1 * m1) * sqrt(s2 / n - m1 * m1)) AS skewness,
           (s4 / n - 4.0 * m1 * (s3 / n) + 6.0 * m1 * m1 * (s2 / n)
              - 3.0 * m1 * m1 * m1 * m1)
             / ((s2 / n - m1 * m1) * (s2 / n - m1 * m1)) - 3.0 AS kurtosis
    FROM sums
"""


@register(
    "agg_skew_kurt_exact",
    # DECIMAL(8,2) base, NOT 38,6: the power chain multiplies precisions
    # (Spark: p1+p2+1 per step), so an (8,2) operand keeps q^4 at (35,8) —
    # inside the 38-digit cap, hence EXACT. A wide base like (38,6) blows
    # past 38 digits at q*q and triggers precision-loss rounding that Spark
    # and DuckDB perform differently (≈1e-14 drift, caught at sf0.001).
    oracle=f"""
    WITH sums AS (
      SELECT l_linestatus,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS s4
      FROM lineitem
      GROUP BY l_linestatus
    )
    {_MOMENT_MATH}
    """,
    doc="Exact population skewness and excess kurtosis from DECIMAL power "
    "sums (Σx..Σx⁴ are exact 128-bit decimal — order-independent at any "
    "parallelism), then one closed-form double evaluation per group. "
    "Spark's builtin skewness()/kurtosis() accumulate doubles in partition "
    "order and drift in the last bits between runs; this form is "
    "bit-stable AND verifiable against a single-threaded oracle — the "
    "SCALE.md exactness-under-parallelism invariant applied to third and "
    "fourth moments. No pow(): libm pow is not correctly rounded; "
    "multiplication chains and sqrt are.",
    tags=("agg", "exact"),
)
def agg_skew_kurt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    q = dec("l_quantity", 8, 2)  # (8,2): keeps q^4 exact — see oracle note
    sums = li.groupBy("l_linestatus").agg(
        F.count("*").cast("double").alias("n"),
        (F.sum(q).cast("double") / F.count("*").cast("double")).alias("m1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    sums.createOrReplaceTempView("agg_skew_power_sums")
    return spark.sql(_MOMENT_MATH.replace("FROM sums", "FROM agg_skew_power_sums"))


@register(
    "agg_percentile_disc",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity ASC, l_orderkey ASC,
                                         l_linenumber ASC) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN l_quantity END) AS p25,
           MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN l_quantity END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT) THEN l_quantity END) AS p90
    FROM ranked
    GROUP BY l_returnflag
    """,
    doc="Exact DISCRETE percentiles (the value AT rank ceil(p*n), never "
    "interpolated — what percentile_disc computes): deterministic "
    "total order via (value, orderkey, linenumber) tie-break, rank "
    "filter, then a pivot-style conditional MAX. Complements "
    "agg_exact_percentiles (continuous/interpolated). Same formulation "
    "both engines, so the check is cross-engine exact even though "
    "quantity is a double. One window sort per group — at 100 TB swap "
    "in the two-pass count+rank-range plan or approx_percentile.",
    tags=("agg", "percentile"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.asc("l_quantity"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    wall = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )

    def at(p):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("l_quantity"),
            )
        )

    return ranked.groupBy("l_returnflag").agg(
        at(0.25).alias("p25"), at(0.50).alias("p50"), at(0.90).alias("p90")
    )


@register(
    "window_count_distinct_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(DISTINCT o_orderpriority) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_priorities_so_far
    FROM orders
    WHERE o_custkey % 20 = 0
    """,
    doc="COUNT(DISTINCT) OVER a running frame — Spark's window operator "
    "rejects DISTINCT aggregates, so the engine expresses it as "
    "size(collect_set() OVER frame): semantically identical (set "
    "cardinality per frame) and still a single window pass. The "
    "per-frame set is bounded by the distinct-value domain (5 "
    "priorities), so state stays O(domain), not O(frame) — the right "
    "mental model for running-distinct at 100 TB; for unbounded domains "
    "switch to the HLL sketch column (agg_hll_mergeable_sketches).",
    tags=("window", "distinct"),
)
def window_count_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 20 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("distinct_priorities_so_far"),
    )


# Count-Min geometry: width = ceil(e / eps) for eps = 1e-4, depth =
# ceil(ln(1/delta)) for delta = 0.01 — the same parameterization Spark's
# count_min_sketch(eps, confidence) uses.
CMS_WIDTH = 27183
CMS_DEPTH = 5


def _cms_buckets(key: str):
    """depth sort-independent (row, bucket) coordinates for a key: row d
    hashes with the md5-PORTABLE family (lane d%2 of digest pair d//2 —
    functions/portable.py), bucket = hash % width. The portable family
    (rather than xxhash64) makes the entire sketch table reproducible
    bit-for-bit in the DuckDB oracle; lane packing keeps it at
    ceil(depth/2) md5 evaluations per input row. The 60-bit lane value is
    non-negative, so plain % is already the positive modulus."""
    from slr207_mapreduce_spark.functions.portable import portable_hash64_lane

    key_str = F.col(key).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (portable_hash64_lane(key_str, d // 2, d % 2) % CMS_WIDTH).alias("b"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


def _cms_bucket_sql(key_expr: str, d: int) -> str:
    """DuckDB rendering of one `_cms_buckets` coordinate."""
    lane = portable_hash64_lane_sql(f"CAST({key_expr} AS VARCHAR)", d // 2, d % 2)
    return f"({lane}) % {CMS_WIDTH}"


def cms_table(df: DataFrame, key: str) -> DataFrame:
    """Count-Min sketch AS a DataFrame: the (d, b, cnt) count table.

    Each input row increments one bucket per hash row; the table is
    bounded by depth*width rows REGARDLESS of input size, and merging
    partial sketches is just union + re-sum of counts (counts are
    distributive) — no opaque binary, no driver round-trip, no private
    API. Estimation = min over the key's depth buckets (colliding keys
    only ever ADD counts, hence est >= true)."""
    return (
        df.select(F.explode(_cms_buckets(key)).alias("db"))
        .groupBy(F.col("db.d").alias("d"), F.col("db.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


_CMS_ORACLE = f"""
    WITH src AS (SELECT l_partkey FROM lineitem),
    coords AS (
      SELECT l_partkey, CAST(u.d AS INTEGER) AS d,
             CASE u.d
               {" ".join(f"WHEN {d} THEN {_cms_bucket_sql('l_partkey', d)}" for d in range(CMS_DEPTH))}
             END AS b
      FROM src, UNNEST(range(0, {CMS_DEPTH})) AS u(d)
    ),
    sketch AS (
      SELECT d, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM coords GROUP BY d, b
    ),
    top AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM src GROUP BY l_partkey
      ORDER BY true_cnt DESC, l_partkey ASC LIMIT 10
    ),
    probes AS (
      SELECT t.l_partkey, t.true_cnt, CAST(u.d AS INTEGER) AS d,
             CASE u.d
               {" ".join(f"WHEN {d} THEN {_cms_bucket_sql('t.l_partkey', d)}" for d in range(CMS_DEPTH))}
             END AS b
      FROM top t, UNNEST(range(0, {CMS_DEPTH})) AS u(d)
    )
    SELECT p.l_partkey, p.true_cnt,
           MIN(s.cnt) AS est_cnt,
           MIN(s.cnt) - p.true_cnt AS overshoot
    FROM probes p JOIN sketch s ON p.d = s.d AND p.b = s.b
    GROUP BY p.l_partkey, p.true_cnt
    """


@register(
    "agg_count_min_frequency",
    # Full oracle since round 4: the sketch's md5-portable hash family makes
    # the (d, b, cnt) table — and therefore the probe estimates —
    # bit-reproducible in DuckDB. CMS guarantees (est >= true, est <= true
    # + eps*N at confidence, partial-table merge == single-pass build) stay
    # pinned in tests/test_llm_ops.py::test_count_min_sketch_guarantees_and_merge.
    oracle=_CMS_ORACLE,
    doc="Frequency estimation with a Count-Min sketch built natively in "
    "DataFrame land: the sketch is a (depth, bucket, count) table "
    "(cms_table — bounded by depth*width rows regardless of input size, "
    "mergeable by union + re-sum), probed by joining the top-10 hot "
    "parts' bucket coordinates against it and taking min(count) per key. "
    "Output: true count vs estimate vs overshoot per probe key. One "
    "distributed plan end-to-end — no sketch binary through the driver, "
    "no private JVM handles; the probe join broadcasts the 50-row probe "
    "side. Exact probe-side counts exist only to exhibit the error "
    "envelope.",
    tags=("agg", "sketch"),
)
def agg_count_min_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey")
    sketch = cms_table(li, "l_partkey")
    top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("l_partkey"))
        .limit(10)
    )
    probes = top.select(
        "l_partkey", "true_cnt", F.explode(_cms_buckets("l_partkey")).alias("db")
    ).select("l_partkey", "true_cnt", F.col("db.d").alias("d"), F.col("db.b").alias("b"))
    return (
        sketch.join(F.broadcast(probes), ["d", "b"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "l_partkey",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overshoot"),
        )
    )
