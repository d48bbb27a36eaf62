"""Event-stream analytics in batch form (SURVEY.md §2.1 "Streaming" row's
batch-replay oracles; the live Structured Streaming counterparts are in
slr207_mapreduce_spark/streaming/ with rows-only checks).

Time-bucketed aggregation is MapReduce with a time-derived key (reference
O9 with key = window start). The batch versions here are the oracle targets
the streaming tests replay against (DuckDB has no streaming — SURVEY.md
§7.3(1)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec, dsum_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT
      CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS sum_value,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling 1-hour window aggregation (batch form of the streaming "
    "window(); window key = date_trunc of event time).",
    tags=("events", "window_agg"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH slides AS (
      SELECT e.*, s.offset_min
      FROM events e
      CROSS JOIN (VALUES (0), (30)) AS s(offset_min)
    )
    SELECT
      CAST(date_trunc('hour', ts - to_minutes(offset_min)) + to_minutes(offset_min) AS TIMESTAMP) AS window_start,
      COUNT(*) AS n_events,
      {dsum_sql('value')} AS sum_value
    FROM slides
    GROUP BY 1
    """,
    doc="Sliding window (1 h window, 30 min slide): each event maps to 2 "
    "windows — the explode-to-windows construction Structured Streaming "
    "uses internally.",
    tags=("events", "window_agg"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # window(ts, '1 hour', '30 minutes') assigns each row to the 2 windows
    # containing it; emit window.start to match the oracle's arithmetic.
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second',
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
                    ts) > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Sessionization with a 30-min inactivity gap via lag + running sum "
    "(batch form of session_window(); same session boundaries).",
    tags=("events", "session"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE spark.sql() text over the cached events view (r15 build-latency
    # pass, guide §1 — the chained form paid ~0.16 s of eager per-op
    # analysis at sf0.1; plan unchanged: one exchange, two fused window
    # passes, the final groupBy reuses the user_id partitioning).
    # unix_seconds truncates to the second — matches DuckDB
    # date_diff('second'), which counts second-boundary crossings.
    from slr207_mapreduce_spark.sources.tables import table_view

    v = table_view(spark, "events", sf_dir)
    return spark.sql(f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR (unix_seconds(ts) - unix_seconds(LAG(ts) OVER w)) > 1800
                      THEN 1 ELSE 0 END AS is_new
          FROM {v}
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sess AS (
          SELECT user_id, ts,
                 CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, COUNT(1) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sess GROUP BY user_id, session_id
    """)


@register(
    "events_time_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
    doc="Hypertable-style multi-granularity time rollup: (day, hour), "
    "(day), () subtotals in ONE pass via ROLLUP on truncated timestamps — "
    "the continuous-aggregate shape, instead of three scans.",
    tags=("events", "window_agg", "groupingsets"),
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.rollup(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )


@register(
    "events_gap_filled_hours",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*) AS n_events,
             {dsum_sql('value')} AS sum_value
      FROM events GROUP BY 1
    )
    SELECT s.hour, coalesce(a.n_events, 0) AS n_events,
           coalesce(a.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN agg a ON s.hour = a.hour
    """,
    doc="Gap-filled hourly series: every hour between the first and last "
    "present hour appears, empty hours as zero rows — the time-series "
    "densification pattern. ONE events scan (r16, guide §1.2): the "
    "calendar spine is derived from the hourly aggregate itself — each "
    "present hour emits itself plus zero rows for the gap up to the NEXT "
    "present hour (lead over the tiny hour-level frame), replacing the "
    "previous second full scan (bounds min/max) + left join. The global "
    "lead window runs on aggregated rows only (|hours| — a decade of "
    "hourly buckets is <100k rows, trivially single-partition).",
    tags=("events", "window_agg", "gapfill"),
)
def events_gap_filled_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy(F.date_trunc("hour", "ts").alias("present_hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )
    w = Window.orderBy("present_hour")
    return (
        agg.select(
            "present_hour",
            "n_events",
            "sum_value",
            F.lead("present_hour").over(w).alias("next_hour"),
        )
        .select(
            "present_hour",
            "n_events",
            "sum_value",
            F.explode(
                F.sequence(
                    F.col("present_hour"),
                    F.coalesce(
                        F.col("next_hour") - F.expr("INTERVAL 1 HOUR"),
                        F.col("present_hour"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour"),
        )
        .select(
            "hour",
            F.when(F.col("hour") == F.col("present_hour"), F.col("n_events"))
            .otherwise(F.lit(0))
            .alias("n_events"),
            F.when(F.col("hour") == F.col("present_hour"), F.col("sum_value"))
            .otherwise(F.lit(0.0))
            .alias("sum_value"),
        )
    )


@register(
    "events_approx_percentiles",
    oracle=None,  # t-digest/GK sketches are engine-specific by construction
    doc="approx_percentile over event values (p50/p90/p99) — the fixed-"
    "memory quantile path for fact-scale data (exact percentile needs a "
    "global sort). Engine sketches differ from DuckDB's → rows-only; "
    "tests/test_llm_ops.py bounds the error against exact quantiles. The "
    "sketch returns one array but the output unpacks it to scalar columns "
    "so every emitted cell stays hashable for the driver's comparator.",
    tags=("events", "approx"),
)
def events_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("p"))
        .select(
            "event_type",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p90"),
            F.col("p")[2].alias("p99"),
        )
    )


@register(
    "events_dedup_latest",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-latest dedup per (user, event_type) — batch form of streaming "
    "dropDuplicates with keep-last semantics (row_number over event time).",
    tags=("events", "dedup"),
)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed_after_signup,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
    doc="Ordered funnel (signup → view → purchase) via conditional min — "
    "one shuffle on user_id, no self-joins.",
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        t("signup").alias("t_signup"),
        t("view").alias("t_view"),
        t("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    viewed = signed & (F.col("t_view") > F.col("t_signup"))
    full = viewed & (F.col("t_purchase") > F.col("t_view"))
    as_int = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_int(signed).alias("n_signed_up"),
        as_int(viewed).alias("n_viewed_after_signup"),
        as_int(full).alias("n_full_funnel"),
    )


@register(
    "events_retention_cohort",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
      FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, day FROM e)
    SELECT cohort_day,
           CAST(date_diff('day', CAST(cohort_day AS DATE), CAST(day AS DATE)) AS BIGINT) AS day_offset,
           COUNT(*) AS n_active_users
    FROM active JOIN firsts USING (user_id)
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    doc="Cohort retention: users grouped by first-seen day, counted on "
    "each later active day as an offset from their cohort — the classic "
    "retention-triangle relation. Every shuffle keys on user_id (first-seen "
    "min, the active-day distinct) until the final small (cohort, offset) "
    "group; day-granularity truncation makes the ns-vs-µs timestamp "
    "difference moot on both engines.",
    tags=("events", "cohort"),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = e.distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )
