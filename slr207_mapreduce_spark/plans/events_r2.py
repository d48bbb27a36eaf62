"""Event-analytics widening, round 2 (SURVEY.md §2.1).

- events_session_window_batch: Spark's NATIVE session_window() operator
  (the streaming sessionizer run in batch mode) — complements
  events_sessionization, which builds the same sessions manually with
  lag + running-sum. Both exist on purpose: the manual form is the oracle
  shape, the native form is the one a streaming job reuses unchanged.
- events_transition_bigrams: per-user event-type transition counts
  (sequence mining's first rung) via lead() — generalizes the reference's
  token bigram counting to temporal sequences.
- events_zscore_outliers: per-user anomaly flags from exact-DECIMAL
  mean/std — the SCALE.md exactness invariant applied to a second-moment
  filter, so the flagged set is bit-stable at any parallelism.

All reference O8+O9 shapes (shuffle on user_id, per-key accumulate —
ListenerReducer.java:123-139) with event-time semantics layered on.
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
    "events_session_window_batch",
    # Native session_window semantics: a session is a half-open interval
    # [first_ts, last_ts + gap); an event at exactly prev + gap starts a NEW
    # session, so the island flag uses >= on exact timestamps (not a
    # truncated-seconds diff).
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM islands
    GROUP BY user_id, sid
    """,
    doc="Spark's native session_window() (30-min gap) run in BATCH: one "
    "shuffle on user_id, sessions merged inside the aggregate. window.end "
    "is last_event + gap (half-open), hence the oracle's >= island flag. "
    "The same five lines run under readStream with a watermark — that "
    "batch/stream symmetry is why the operator exists next to the manual "
    "lag+running-sum form (events_sessionization).",
    tags=("events", "session"),
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_transition_bigrams",
    oracle="""
    WITH nxt AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM nxt
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY n DESC, event_type ASC, next_type ASC
    LIMIT 15
    """,
    doc="Event-type transition matrix (Markov bigrams): per-user lead() "
    "over event time, then a global count of (type, next_type) pairs — "
    "top 15, count desc with full-key tie-break (reference O11 ordering "
    "discipline, ValueThenKeyComparator.java:7-14). One shuffle for the "
    "window + one partial-agg shuffle for the count; at 100 TB the window "
    "shuffle dominates and reuses the user_id partitioning any adjacent "
    "per-user op already established.",
    tags=("events", "window"),
)
def events_transition_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"), F.asc("next_type"))
        .limit(15)
    )


# Identical double-arithmetic shape on both sides: exact decimal sums ->
# one mean/variance evaluation -> |v - mean| > 2*sd flag. sqrt is
# IEEE-exact, so flags are bit-stable (SCALE.md exactness invariant).
_Z_STATS_SQL = """
      SELECT user_id,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events
      GROUP BY user_id
"""


@register(
    "events_zscore_outliers",
    oracle=f"""
    WITH stats AS (
    {_Z_STATS_SQL}
    )
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE
             abs(e.value - s.s1 / s.n) > 2.0 * sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n))
           ) AS BIGINT) AS n_outliers
    FROM events e JOIN stats s ON e.user_id = s.user_id
    GROUP BY e.user_id
    """,
    doc="Per-user z-score outlier counts (|v - mean| > 2sd, population sd). "
    "Mean/std come from exact DECIMAL Σv, Σv² — order-independent — then "
    "one IEEE expression evaluates the flag, so a 1000-executor run flags "
    "the identical rows as the single-threaded oracle. Two shuffles on "
    "user_id (stats + rejoin); AQE turns the stats side into a broadcast "
    "when the user dimension is small.",
    tags=("events", "exact"),
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    v = dec("value", 18, 2)
    stats = e.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    sd = F.sqrt(F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")))
    joined = e.join(stats, "user_id")
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.abs(F.col("value") - mean) > 2.0 * sd).alias("n_outliers"),
    )


@register(
    "events_promo_overlap_join",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('second',
                    LAG(ts) OVER w, ts) > 1800
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sess AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
             ts
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, sid,
             MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM sess GROUP BY user_id, sid
    ),
    promos AS (
      SELECT i AS promo_id,
             TIMESTAMP '2024-01-01' + INTERVAL (i * 5) DAY AS p_start,
             TIMESTAMP '2024-01-01' + INTERVAL (i * 5 + 2) DAY AS p_end
      FROM range(6) t(i)
    )
    SELECT p.promo_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users
    FROM promos p
    JOIN sessions s
      ON s.s_start <= p.p_end AND s.s_end >= p.p_start
    GROUP BY p.promo_id
    """,
    doc="Interval-overlap join: user sessions (30-min-gap islands, same "
    "boundaries as events_sessionization) overlap-joined against promo "
    "windows with the half-open interval test s_start<=p_end AND "
    "s_end>=p_start. The promo side is tiny → Spark plans a BROADCAST "
    "nested-loop, which IS the optimal physical strategy for "
    "small-interval-set x big-fact; for large x large the binning "
    "decomposition in operators/asof.py (bucket both sides by "
    "day, equi-join the bucket key, post-filter) bounds the blow-up to "
    "per-bin products, the same strategy Spark's range-join hints use.",
    tags=("events", "interval", "join"),
)
def events_promo_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    gap_s = F.unix_seconds(F.col("ts")) - F.unix_seconds(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        e.select(
            "user_id",
            "ts",
            F.sum(is_new).over(wsum).alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    promos = (
        spark.range(6)
        .select(
            F.col("id").alias("promo_id"),
            (F.lit("2024-01-01").cast("timestamp") + F.make_interval(days=F.col("id") * 5)).alias("p_start"),
            (F.lit("2024-01-01").cast("timestamp") + F.make_interval(days=F.col("id") * 5 + 2)).alias("p_end"),
        )
    )
    j = sessions.join(
        F.broadcast(promos),
        (F.col("s_start") <= F.col("p_end")) & (F.col("s_end") >= F.col("p_start")),
    )
    return j.groupBy("promo_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
