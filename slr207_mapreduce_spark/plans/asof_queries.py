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
