"""Scalar function surface (SURVEY.md §2.1 "String/date/math/array/map/JSON
scalar functions" row) — per-record map, the reference's O5/O6 generalized.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs in any hot path. Each query pairs
Spark expressions with the DuckDB spelling that yields bit-identical
results (engine-portable subset only: no libm-divergent fns like exp/ln in
checked outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name) AS name_upper,
      lower(c_mktsegment) AS seg_lower,
      length(c_name) AS name_len,
      substring(c_name, 1, 8) AS name_prefix,
      concat(c_name, '#', c_mktsegment) AS name_seg,
      replace(c_name, 'Customer', 'Cust') AS name_short,
      CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
      trim('  ' || c_mktsegment || ' ') AS seg_trim,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
      CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
    doc="upper/lower/length/substring/concat/replace/instr/trim/lpad/LIKE.",
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).cast("int").alias("has_one"),
    )


@register(
    "scalar_regexp_split",
    oracle="""
    SELECT
      p_partkey,
      regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
      regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
      CAST(regexp_matches(p_name, 'part_1[0-9]') AS BOOLEAN) AS name_matches,
      string_split(p_type, ' ')[1] AS type_first_token,
      CAST(len(string_split(p_name, '_')) AS INTEGER) AS name_parts
    FROM part
    """,
    doc="regexp_extract / regexp_replace / rlike / split+index — the "
    "tokenizer family (reference O5) as general scalar ops.",
    tags=("scalar", "string", "regex"),
)
def scalar_regexp_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("devoweled"),
        F.col("p_name").rlike("part_1[0-9]").alias("name_matches"),
        F.split("p_type", " ").getItem(0).alias("type_first_token"),
        F.size(F.split("p_name", "_")).cast("int").alias("name_parts"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      CAST(day(o_orderdate) AS INTEGER) AS order_day,
      CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
      date_trunc('month', o_orderdate) AS month_start,
      o_orderdate + INTERVAL 90 DAY AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
      CAST(dayofweek(o_orderdate) AS INTEGER) AS order_dow,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    WHERE o_orderkey < 100
    """,
    doc="year/month/day/quarter/date_trunc/interval-add/datediff/dayofweek/"
    "format — timestamp[ms] semantics pinned to UTC.",
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("long").alias("days_since_epoch_start"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 → align to DuckDB.
        (F.dayofweek("o_orderdate") - F.lit(1)).cast("int").alias("order_dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT
      l_orderkey, l_linenumber,
      abs(l_extendedprice - 50000.0) AS price_dev,
      CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      sqrt(l_quantity) AS qty_sqrt,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
      greatest(l_discount, l_tax) AS max_rate,
      least(l_discount, l_tax) AS min_rate,
      CAST(sign(l_extendedprice - 50000.0) AS DOUBLE) AS dev_sign
    FROM lineitem
    WHERE l_orderkey < 50
    """,
    doc="abs/floor/ceil/sqrt/mod/greatest/least/sign (IEEE-exact subset — "
    "sqrt is correctly-rounded per IEEE-754 so engines agree bitwise).",
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 50)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("price_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 50000.0).cast("double").alias("dev_sign"),
    )


@register(
    "scalar_conditional_null",
    oracle="""
    SELECT
      c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'debt'
           WHEN c_acctbal < 5000 THEN 'low'
           ELSE 'high' END AS bal_band,
      coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
      CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null,
      ifnull(NULL, c_custkey) AS key_or_default
    FROM customer
    """,
    doc="CASE WHEN / coalesce / nullif / IS NULL / ifnull — NULL algebra.",
    tags=("scalar", "conditional"),
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.ifnull(F.lit(None).cast("long"), F.col("c_custkey")).alias("key_or_default"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k') AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
    FROM events
    WHERE event_id < 200
    """,
    doc="JSON extraction from the events.props column (get_json_object — "
    "reference O5 generalized to semi-structured records).",
    tags=("scalar", "json", "events"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.isnull(F.get_json_object("props", "$.missing")).alias("missing_is_null"),
    )


@register(
    "scalar_higher_order_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           array_to_string(list_transform(embedding, x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT)), ',') AS sign_mask,
           CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding, x -> CAST(x AS DOUBLE))),
                (acc, x) -> acc + x) AS DOUBLE) AS comp_sum,
           CAST(list_zip(embedding[1:2], embedding[3:4])[1][1] AS DOUBLE) AS zip_head
    FROM embeddings WHERE vec_id < 50
    """,
    doc="Higher-order array functions — filter / transform / aggregate "
    "(sequential fold, engine-stable) / zip_with — lambda expressions "
    "evaluated JVM-side inside codegen, the array-processing workhorses "
    "for nested (multimodal) columns.",
    tags=("scalar", "array", "higher_order"),
)
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.array_join(
            F.transform(emb, lambda x: F.when(x > 0, 1).otherwise(0).cast("long")),
            ",",
        ).alias("sign_mask"),
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).cast("double").alias("comp_sum"),
        F.zip_with(
            F.slice(emb, 1, 2), F.slice(emb, 3, 2), lambda a, b: a
        ).getItem(0).cast("double").alias("zip_head"),
    )


@register(
    "scalar_map_type",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS mkeys,
           array_to_string(map_values(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',') AS mvals,
           (MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}['type'])[1] AS type_via_map
    FROM events WHERE event_id < 100
    """,
    doc="Map-type construction and access (create_map/map_keys/map_values/"
    "element_at) — maps compared via their key/value arrays since insertion "
    "order is part of both engines' map layout here.",
    tags=("scalar", "map"),
)
def scalar_map_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.element_at(m, "type").alias("type_via_map"),
    )


@register(
    "scalar_array_map_funcs",
    oracle="""
    SELECT
      vec_id,
      CAST(len(embedding) AS INTEGER) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_component,
      CAST(list_max(embedding) AS DOUBLE) AS max_component,
      CAST(list_contains([CAST(label AS BIGINT), 0], 0) AS BOOLEAN) AS label_or_zero_has_zero,
      array_to_string(list_sort([CAST(label AS BIGINT), CAST(vec_id % 3 AS BIGINT)]), ',') AS sorted_pair
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="Array ops over the embedding column: size/element_at/array_max/"
    "array_contains/sort_array — nested-type handling (multimodal columns "
    "are arrays/structs end-to-end).",
    tags=("scalar", "array"),
)
def scalar_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_contains(
            F.array(F.col("label").cast("long"), F.lit(0).cast("long")), F.lit(0)
        ).alias("label_or_zero_has_zero"),
        F.array_join(
            F.sort_array(
                F.array(
                    F.col("label").cast("long"), (F.col("vec_id") % 3).cast("long")
                )
            ),
            ",",
        ).alias("sorted_pair"),
    )


@register(
    "scalar_variant_type",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.nope') IS NULL AS BOOLEAN) AS missing_is_null
    FROM events WHERE event_id < 150
    """,
    doc="VARIANT semi-structured type (new in Spark 4): parse_json into a "
    "binary variant column, then typed try_variant_get extraction — the "
    "open-schema ingestion path that beats string-JSON re-parsing per "
    "access (the variant is decoded once, fields are read positionally). "
    "Oracle reads the same fields via DuckDB's JSON functions; outputs are "
    "typed identically on both sides.",
    tags=("scalar", "json", "variant", "events"),
)
def scalar_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 150)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "long").alias("k_long"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.isnull(F.try_variant_get(v, "$.nope", "string")).alias("missing_is_null"),
    )
