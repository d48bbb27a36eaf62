"""Event-analytics widening, round 2: time-range window frames, funnel
analysis, and gap-filling linear interpolation.

These extend plans/events.py (reference O9 with time-derived keys) with the
window/sequence machinery real clickstream pipelines run: a RANGE frame is
the declarative "last N seconds" state the reference's streaming reducer
(ListenerReducer.java:123-139) could only approximate with manual eviction.

Timestamp discipline (memory rule: events.ts is parquet TIMESTAMP(NANOS)):
every comparison here happens on integer epoch seconds/hours derived with
integer division — `unix_micros(ts) div 1000000` in Spark equals DuckDB's
`epoch_us(CAST(ts AS TIMESTAMP)) // 1000000` bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec, dsum_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


_EPOCH_S_SQL = "epoch_us(CAST(ts AS TIMESTAMP)) // 1000000"


def _epoch_s() -> F.Column:
    return F.expr("unix_micros(ts) div 1000000")


@register(
    "events_range_frame_1h",
    oracle=f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_last_hour
    FROM (SELECT *, {_EPOCH_S_SQL} AS es FROM events) e
    WINDOW w AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-RANGE window frame: per user, count and exact-decimal sum of "
    "activity in the trailing 1 hour — RANGE frames include all peers of "
    "the current ordering value, so the result is deterministic even with "
    "tied timestamps (unlike a ROWS frame). The declarative form of a "
    "sliding per-key state store; at scale one shuffle on user_id.",
    tags=("events", "window"),
)
def events_range_frame_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn("es", _epoch_s())
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_last_hour"),
    )


@register(
    "events_funnel_stages",
    oracle=f"""
    WITH ev AS (SELECT *, {_EPOCH_S_SQL} AS es FROM events),
    s1 AS (
      SELECT user_id, MIN(es) AS t1 FROM ev WHERE event_type = 'view'
      GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.es) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.es > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.es) AS t3
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.es > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_viewed,
           (SELECT COUNT(*) FROM s2) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM s3) AS n_purchased_after_click
    """,
    doc="Ordered funnel (view → click → purchase): each stage keeps users "
    "whose stage event STRICTLY follows their previous stage's first "
    "event. ONE scan + one per-user shuffle, AGGREGATION form (r16, guide "
    "§2.3): per user the partial aggregate carries min view-time plus the "
    "click/purchase time lists only, so non-funnel rows collapse map-side "
    "and the exchange never moves event_type strings or the full event "
    "stream (the previous window form shuffled every row, then sorted, "
    "then made three whole-partition window passes + a dedup). Stage "
    "times chain per user via array filters: t2 = min click strictly "
    "after t1, t3 = min purchase strictly after t2 — null-propagation "
    "identical to the window form (x > NULL filters to an empty array, "
    "array_min of empty = NULL).",
    tags=("events", "funnel"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("es", _epoch_s())
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("es"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("es"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("es"))
        ).alias("purchases"),
    )
    staged = per_user.select(
        "user_id",
        "t1",
        F.array_min(F.filter(F.col("clicks"), lambda x: x > F.col("t1"))).alias("t2"),
        "purchases",
    ).select(
        "user_id",
        "t1",
        "t2",
        F.array_min(F.filter(F.col("purchases"), lambda x: x > F.col("t2"))).alias(
            "t3"
        ),
    )
    return staged.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


@register(
    "events_linear_interpolate",
    oracle=f"""
    WITH sparse AS (
      SELECT ({_EPOCH_S_SQL}) // 3600 AS h, {dsum_sql('value')} AS y
      FROM events
      WHERE event_type = 'error' AND user_id % 7 = 0
      GROUP BY 1
    ),
    bounds AS (
      SELECT ({_EPOCH_S_SQL}) // 3600 AS h FROM events
    ),
    spine AS (
      SELECT unnest(range((SELECT MIN(h) FROM bounds),
                          (SELECT MAX(h) FROM bounds) + 1)) AS h
    ),
    joined AS (
      SELECT spine.h, sparse.y FROM spine LEFT JOIN sparse ON spine.h = sparse.h
    ),
    filled AS (
      SELECT h, y,
        last_value(y IGNORE NULLS) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS py,
        last_value(CASE WHEN y IS NOT NULL THEN h END IGNORE NULLS)
          OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        first_value(y IGNORE NULLS) OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ny,
        first_value(CASE WHEN y IS NOT NULL THEN h END IGNORE NULLS)
          OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM joined
    )
    SELECT h AS epoch_hour,
           CASE WHEN y IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
           CASE
             WHEN y IS NOT NULL THEN y
             WHEN py IS NULL THEN ny
             WHEN ny IS NULL THEN py
             ELSE py + (ny - py) * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
           END AS value_filled
    FROM filled
    """,
    doc="Gap-filled time series with LINEAR interpolation: sparse hourly "
    "sums joined to a dense hour spine; missing hours get "
    "prev + (next-prev)·frac via forward/backward IGNORE NULLS window "
    "fills (edges clamp to the nearest known value). The known values are "
    "exact decimal sums and the interpolation is one identical IEEE "
    "expression per row, so even the interpolated points are bit-stable. "
    "Spine generation is sequence()+explode — at 100 TB the spine stays "
    "tiny (one row per hour) and the join broadcasts.",
    tags=("events", "timeseries", "interpolation"),
)
def events_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # integer floor division straight from microseconds: exact, no float path
    h_expr = F.expr("unix_micros(ts) div 3600000000")
    sparse = (
        ev.where((F.col("event_type") == "error") & (F.col("user_id") % 7 == 0))
        .groupBy(h_expr.alias("h"))
        .agg(F.sum(dec("value")).cast("double").alias("y"))
    )
    bounds = ev.agg(
        F.min(h_expr).alias("h_min"), F.max(h_expr).alias("h_max")
    )
    spine = bounds.select(
        F.explode(F.sequence("h_min", "h_max")).alias("h")
    )
    joined = spine.join(sparse, "h", "left")
    fwd = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bwd = Window.orderBy("h").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    known_h = F.when(F.col("y").isNotNull(), F.col("h"))
    filled = joined.select(
        "h",
        "y",
        F.last("y", ignorenulls=True).over(fwd).alias("py"),
        F.last(known_h, ignorenulls=True).over(fwd).alias("ph"),
        F.first("y", ignorenulls=True).over(bwd).alias("ny"),
        F.first(known_h, ignorenulls=True).over(bwd).alias("nh"),
    )
    py, ny, ph, nh, y, h = (F.col(c) for c in ("py", "ny", "ph", "nh", "y", "h"))
    return filled.select(
        h.alias("epoch_hour"),
        F.when(y.isNotNull(), 0).otherwise(1).alias("interpolated"),
        F.when(y.isNotNull(), y)
        .when(py.isNull(), ny)
        .when(ny.isNull(), py)
        .otherwise(
            py + (ny - py) * ((h - ph).cast("double") / (nh - ph).cast("double"))
        )
        .alias("value_filled"),
    )
