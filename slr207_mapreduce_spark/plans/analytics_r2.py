"""Analytic widening, round 3 of the capability closure (SURVEY.md §2.1;
reference primitives: O8 shuffle WorkerSender.java:223-230, O9 reduce
ListenerReducer.java:123-139, O11 ordered scan
ValueThenKeyComparator.java:7-14).

- window_share_of_total: ratio-to-report (percent-of-total and
  percent-of-group via unpartitioned/partitioned window sums) — the BI
  staple. Share denominators come from exact DECIMAL window sums so the
  single division per row is bit-stable.
- stats_robust: robust statistics — median absolute deviation and a
  10-90% trimmed mean — exact, via interpolated percentiles + a
  conditional DECIMAL aggregate. The outlier-resistant profile a data
  pipeline uses when z-scores (events_zscore_outliers) are too fragile.
- join_not_in_null_aware: NOT IN (subquery) — planned as a NULL-AWARE
  anti join, a different physical operator from NOT EXISTS' plain anti
  join (one NULL in the subquery empties the result under three-valued
  logic; Spark's NullAwareAntiJoin exists precisely for that semantic).
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
    "window_share_of_total",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(o_totalprice AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER () AS DOUBLE) AS share_of_total,
           CAST(o_totalprice AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_orderstatus) AS DOUBLE) AS share_of_status
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    doc="Ratio-to-report: each order's share of the global and of its "
    "status-group revenue via unbounded window sums (exact DECIMAL "
    "denominators -> one IEEE division per row). The global window is a "
    "single-partition pass — fine here because the filtered input is "
    "bounded; at fact scale the global denominator should come from a "
    "scalar-subquery aggregate instead (one extra reduction, no "
    "single-partition window), same result by exactness.",
    tags=("window", "analytics"),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    w_all = Window.partitionBy()
    w_status = Window.partitionBy("o_orderstatus")
    price = F.col("o_totalprice").cast("double")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (price / F.sum(dec("o_totalprice")).over(w_all).cast("double")).alias(
            "share_of_total"
        ),
        (price / F.sum(dec("o_totalprice")).over(w_status).cast("double")).alias(
            "share_of_status"
        ),
    )


@register(
    "stats_robust",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty,
             quantile_cont(l_quantity, 0.1) AS p10,
             quantile_cont(l_quantity, 0.9) AS p90
      FROM lineitem GROUP BY l_returnflag
    ),
    mad AS (
      SELECT l.l_returnflag,
             quantile_cont(abs(l.l_quantity - m.med_qty), 0.5) AS mad_qty
      FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
      GROUP BY l.l_returnflag
    ),
    trimmed AS (
      SELECT l.l_returnflag,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS trimmed_mean
      FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
      WHERE l.l_quantity >= m.p10 AND l.l_quantity <= m.p90
      GROUP BY l.l_returnflag
    )
    SELECT m.l_returnflag, m.med_qty, d.mad_qty, t.trimmed_mean
    FROM med m
    JOIN mad d ON m.l_returnflag = d.l_returnflag
    JOIN trimmed t ON m.l_returnflag = t.l_returnflag
    """,
    doc="Robust statistics per group: median absolute deviation (median of "
    "|x - median|) and the 10-90% trimmed mean — exact interpolated "
    "percentiles (order-independent position arithmetic), a broadcast "
    "re-join of the per-group cutoffs, and a DECIMAL-exact conditional "
    "mean. Two passes over the fact by information flow (MAD needs the "
    "median first) — the outlier-resistant alternative to "
    "events_zscore_outliers when heavy tails poison mean/stddev.",
    tags=("agg", "stats"),
)
def stats_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.1)).alias("p10"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
    )
    # second (and last) fact pass: MAD and the trimmed mean fold into ONE
    # aggregation over the cutoff-joined scan — conditional sum/count
    # instead of a separate filtered pass, and med_qty rides along via
    # first() instead of a third join back to `med`. Two scans total,
    # the information-theoretic floor (MAD needs the median first).
    in_band = (F.col("l_quantity") >= F.col("p10")) & (
        F.col("l_quantity") <= F.col("p90")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("med_qty").alias("med_qty"),
            F.median(F.abs(F.col("l_quantity") - F.col("med_qty"))).alias("mad_qty"),
            (
                F.sum(F.when(in_band, dec("l_quantity"))).cast("double")
                / F.count(F.when(in_band, F.lit(1))).cast("double")
            ).alias("trimmed_mean"),
        )
    )


@register(
    "join_not_in_null_aware",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    doc="NOT IN (subquery): under three-valued logic one NULL in the "
    "subquery must empty the result, so Catalyst plans a NULL-AWARE anti "
    "join (BroadcastNestedLoopJoin/NullAwareAntiJoin when nullable) — a "
    "semantically different operator from NOT EXISTS' plain left-anti "
    "(join_left_anti). Here the subquery key is non-null so the result "
    "matches the anti join, but the declared surface is the NOT IN plan "
    "shape itself. At scale prefer NOT EXISTS unless NULL semantics are "
    "genuinely wanted — the null-aware variant cannot use a hash join on "
    "nullable keys.",
    tags=("join", "subquery"),
)
def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
        """
    )
