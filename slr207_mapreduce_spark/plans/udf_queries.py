"""UDF surface (SURVEY.md §2.1 "UDF / UDAF / UDTF" row): the four Python
extension points, each in its scale-appropriate form:

- row-at-a-time ``udf``        — the SLOW path; kept ONLY to host logic that
                                 can't vectorize (here: the reference's
                                 encode(), also shown as pure SQL for speed)
- vectorized ``pandas_udf``    — Arrow-batched scalar compute
- grouped-agg ``pandas_udf``   — Arrow-batched custom aggregation
- ``applyInPandas``            — grouped-map (per-group frame → frame)
- (``mapInPandas`` lives in operators/multimodal.py)

Every variant here is deterministic, so each is oracle-checked — the UDFs
compute values DuckDB can reproduce in SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from slr207_mapreduce_spark.parity.wordcount import py_encode
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


# --- row-at-a-time UDF hosting the reference's encode() --------------------

_encode_udf = F.udf(py_encode, StringType())

_ENCODE_SQL = (
    "array_to_string(list_transform(string_split(lower(word), ''), "
    "c -> CASE WHEN ascii(c) BETWEEN 96 AND 122 "
    "THEN lpad(CAST(ascii(c) - 96 AS VARCHAR), 2, '0') ELSE '' END), '')"
)


@register(
    "udf_encode_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT word, {_ENCODE_SQL} AS encoded
    FROM toks WHERE length(word) > 0
    """,
    doc="The reference's encode() (WorkerSender.java:129-148) hosted as a "
    "row-at-a-time Python UDF over the distinct corpus vocabulary — the "
    "slow-path surface, deliberately on a small (distinct-token) input; "
    "parity/wordcount.py holds the codegen-friendly column-expression form "
    "used in hot paths.",
    tags=("udf", "parity"),
)
def udf_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .distinct()
    )
    return toks.select("word", _encode_udf("word").alias("encoded"))


# --- vectorized scalar pandas_udf ------------------------------------------


@F.pandas_udf(DoubleType())
def _net_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    # pure f64 elementwise arithmetic → bit-identical to the SQL expression
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "udf_pandas_scalar_net_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_price
    FROM lineitem WHERE l_orderkey < 200
    """,
    doc="Vectorized scalar pandas_udf (Arrow-batched f64 arithmetic, "
    "~10-100× over row-at-a-time): net price per lineitem. Elementwise IEEE "
    "ops → oracle-exact.",
    tags=("udf", "pandas_udf"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir).where(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        _net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


# --- grouped-agg pandas_udf -------------------------------------------------


@F.pandas_udf(DoubleType())
def _value_range(v: pd.Series) -> float:
    # max - min: order-independent → deterministic across partitionings
    return float(v.max() - v.min())


@register(
    "udf_pandas_grouped_agg_range",
    oracle="""
    SELECT user_id, max(value) - min(value) AS value_range
    FROM events GROUP BY user_id
    """,
    doc="Grouped-aggregate pandas_udf: per-user value range (max-min — "
    "order-independent, hence oracle-exact; a sum here would not be).",
    tags=("udf", "pandas_udf"),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return e.groupBy("user_id").agg(_value_range("value").alias("value_range"))


# --- applyInPandas (grouped map) --------------------------------------------


def _gap_to_group_max(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["gap_to_max"] = pdf["value"].max() - pdf["value"]
    return out


@register(
    "udf_apply_in_pandas_gap",
    oracle="""
    SELECT user_id, event_id, value,
           max(value) OVER (PARTITION BY user_id) - value AS gap_to_max
    FROM events
    """,
    doc="applyInPandas grouped-map: per-user frame in, frame out (gap to "
    "the user's max value). The custom-operator escape hatch when window "
    "functions can't express the per-group logic; here it CAN be a window, "
    "which is exactly what the oracle uses.",
    tags=("udf", "pandas_udf"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(
        _gap_to_group_max,
        schema="user_id long, event_id long, value double, gap_to_max double",
    )
