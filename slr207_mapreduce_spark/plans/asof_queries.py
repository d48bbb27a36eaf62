"""As-of join query (operators/asof.py). DuckDB's native ASOF JOIN is the
oracle — the engine-side implementation is the scalable union+carry-forward
composition (one shuffle, no range explosion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.asof import asof_join
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@register(
    "asof_purchase_last_view",
    oracle="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           v.event_id AS last_view_id,
           v.value AS last_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc="As-of join: each purchase + the user's latest view at/before it. "
    "Spark lacks the operator; composed as tag→union→window carry-forward "
    "(operators/asof.py) — one shuffle on the key, linear per key, vs the "
    "quadratic naive theta-join. Oracle is DuckDB's native ASOF JOIN.",
    tags=("asof", "join", "custom"),
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id", "value"],
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id_right").alias("last_view_id"),
        F.col("value_right").alias("last_view_value"),
    )


@register(
    "asof_next_purchase_after_view",
    oracle="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'view'
    )
    SELECT v.event_id AS view_id,
           v.user_id,
           v.ts AS view_ts,
           n.event_id AS next_purchase_id,
           n.ts AS next_purchase_ts
    FROM views v
    LEFT JOIN LATERAL (
      SELECT p.event_id, p.ts
      FROM purchases p
      WHERE p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.ts ASC, p.event_id ASC
      LIMIT 1
    ) n ON TRUE
    """,
    doc="FORWARD as-of join: each view + the user's EARLIEST purchase "
    "at/after it — the conversion-attribution direction DuckDB's native "
    "ASOF JOIN cannot express (backward-only), so the oracle is the "
    "correlated earliest-following LATERAL. Same union+window carry as "
    "the backward operator but traversed descending "
    "(operators/asof.py::asof_join_forward): one shuffle on the key, "
    "linear per key, simultaneous purchases tie-broken by event_id.",
    tags=("asof", "join", "custom"),
)
def asof_next_purchase_after_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.asof import asof_join_forward

    e = load_table(spark, "events", sf_dir)
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join_forward(
        views,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id", "ts"],
        tie_break="event_id",
    )
    return out.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id_right").alias("next_purchase_id"),
        F.col("ts_right").alias("next_purchase_ts"),
    )
