"""Scalar-function and table-valued-function widening, round 2
(SURVEY.md §2.1 "String/date/math/array/map/JSON scalar functions" and
"UDF/UDAF/UDTF" rows): URL parsing, str_to_map, stack()/inline() TVFs, and
the datetime-arithmetic surface.

All generalize reference O5-O6 (per-record map, WorkerSender.java:216,
129-148) — pure row expressions, no shuffle; the TVFs are the declarative
generator form of O5's one-to-many flatMap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


# Synthetic URL built from document columns (testdata has no URL column);
# both sides construct the identical string before parsing.
_URL_SQL = (
    "'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)"
    " || '?lang=' || lang || '&v=2#sec'"
)


def _url_col() -> F.Column:
    return F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2#sec"),
    )


@register(
    "scalar_url_parse",
    oracle=f"""
    SELECT doc_id,
           regexp_extract({_URL_SQL}, '^([a-z]+)://', 1) AS proto,
           regexp_extract({_URL_SQL}, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract({_URL_SQL}, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract({_URL_SQL}, '[?&]lang=([^&#]*)', 1) AS lang_param,
           regexp_extract({_URL_SQL}, '#(.*)$', 1) AS fragment
    FROM documents WHERE doc_id < 100
    """,
    doc="URL decomposition (protocol/host/path/query-param/fragment) via "
    "parse_url — the canonical first step of web-corpus pipelines (domain "
    "extraction feeds per-domain caps and dedup keys). Oracle rebuilds "
    "each component with regexp_extract.",
    tags=("scalar", "string", "url"),
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    u = _url_col()
    return d.select(
        "doc_id",
        F.lower(F.parse_url(u, F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(u, F.lit("REF")).alias("fragment"),
    )


@register(
    "scalar_str_to_map",
    oracle="""
    SELECT doc_id,
           regexp_extract('lang:' || lang || ',src:' || source ||
                          ',len:' || CAST(n_chars AS VARCHAR),
                          'lang:([^,]*)', 1) AS m_lang,
           regexp_extract('lang:' || lang || ',src:' || source ||
                          ',len:' || CAST(n_chars AS VARCHAR),
                          'src:([^,]*)', 1) AS m_src,
           CAST(regexp_extract('lang:' || lang || ',src:' || source ||
                          ',len:' || CAST(n_chars AS VARCHAR),
                          'len:([^,]*)', 1) AS BIGINT) AS m_len
    FROM documents WHERE doc_id < 100
    """,
    doc="str_to_map: parse 'k:v,k:v' metadata strings (sidecar headers, "
    "HTTP-style attributes) into a MAP and extract typed values — the "
    "lightweight alternative to JSON for flat key-value payloads.",
    tags=("scalar", "map", "string"),
)
def scalar_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    kv = F.concat(
        F.lit("lang:"),
        F.col("lang"),
        F.lit(",src:"),
        F.col("source"),
        F.lit(",len:"),
        F.col("n_chars").cast("string"),
    )
    m = F.str_to_map(kv, F.lit(","), F.lit(":"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.element_at(m, "src").alias("m_src"),
        F.element_at(m, "len").cast("long").alias("m_len"),
    )


@register(
    "udtf_stack_measures",
    oracle="""
    SELECT o_orderkey, 'total_price' AS measure, o_totalprice AS val
    FROM orders WHERE o_orderkey < 100
    UNION ALL
    SELECT o_orderkey, 'cust_key' AS measure, CAST(o_custkey AS DOUBLE) AS val
    FROM orders WHERE o_orderkey < 100
    """,
    doc="stack(n, ...) generator — the SQL-native wide-to-long TVF "
    "(n output rows per input row from column literals); complements the "
    "unpivot operator with an expression-level form. Oracle: UNION ALL.",
    tags=("udtf", "generator"),
)
def udtf_stack_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    o.createOrReplaceTempView("_stack_orders")
    return spark.sql(
        """
        SELECT o_orderkey, measure, val FROM _stack_orders
        LATERAL VIEW stack(2,
          'total_price', o_totalprice,
          'cust_key', CAST(o_custkey AS DOUBLE)) AS measure, val
        """
    )


@register(
    "udtf_inline_structs",
    oracle="""
    SELECT doc_id, 'head' AS part, left(text, 12) AS snippet
    FROM documents WHERE doc_id < 50
    UNION ALL
    SELECT doc_id, 'tail' AS part, right(text, 12) AS snippet
    FROM documents WHERE doc_id < 50
    """,
    doc="inline(array<struct>) generator: explode an array of structs into "
    "columns in one step — the idiomatic way to emit multiple typed "
    "records per row (here head/tail snippets per document).",
    tags=("udtf", "generator"),
)
def udtf_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.inline(
            F.array(
                F.struct(
                    F.lit("head").alias("part"),
                    F.substring(t, 1, 12).alias("snippet"),
                ),
                F.struct(
                    F.lit("tail").alias("part"),
                    t.substr(F.length(t) - 11, F.lit(12)).alias("snippet"),
                ),
            )
        ),
    )


@register(
    "scalar_datetime_extra",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS INTEGER) AS days_since_2024,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sunday0
    FROM orders WHERE o_orderkey < 200
    """,
    doc="Datetime arithmetic surface: last_day / week truncation / "
    "add_months / day difference / quarter / day-of-week. Engine traps "
    "normalized explicitly: Spark dayofweek is 1-based Sunday vs DuckDB "
    "0-based, and datediff counts boundary crossings on DATEs in both "
    "(no timestamp truncation divergence possible).",
    tags=("scalar", "datetime"),
)
def scalar_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_trunc("week", d).alias("week_start"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3m"),
        F.datediff(d, F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_2024"),
        F.quarter(d).cast("int").alias("qtr"),
        (F.dayofweek(d) - 1).cast("int").alias("dow_sunday0"),
    )
