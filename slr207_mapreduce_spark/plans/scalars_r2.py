"""Scalar + join surface widening, round 2 (SURVEY.md §2.1, per-record map
generalizations of reference O5-O7, WorkerSender.java:216-230).

- scalar_format_printf: printf-style formatting. Integer/string/hex
  specifiers only — %f is deliberately excluded because Java's
  String.format rounds HALF_UP while C printf rounds half-even, so float
  formatting is not engine-portable at the last digit.
- scalar_sequence_arrays: sequence generation + array slicing/reversal/
  folding. Integer arithmetic only → exact everywhere. Arrays are
  serialized with array_join (driver comparator needs scalar cells,
  ADVICE r01). Portability trap pinned here: DuckDB array_to_string on an
  EMPTY list returns NULL where Spark array_join returns '' — the oracle
  COALESCEs to ''.
- join_existence_flag: EXISTS-as-a-column (left join against a distinct
  key set + null test) — the flag form of the semi join, kept alongside
  join_left_semi because real pipelines need the row PLUS the boolean,
  not the filtered subset.
- asof_tolerance_30m: as-of join with a match-window tolerance — the
  sensor-fusion variant: a preceding view older than 30 min is no match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.asof import asof_join
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "scalar_format_printf",
    oracle="""
    SELECT s_suppkey,
           printf('SUP-%06d', s_suppkey) AS padded_id,
           printf('%s/%d', s_name, s_nationkey) AS name_nation,
           printf('%x', s_suppkey) AS hex_key,
           lpad(CAST(s_nationkey AS VARCHAR), 4, '0') AS lpad_nation,
           rpad(CAST(s_suppkey AS VARCHAR), 8, '.') AS rpad_key,
           repeat('*', s_nationkey % 5) AS stars
    FROM supplier
    """,
    doc="printf-style formatting (format_string ≙ DuckDB printf: %d/%s/%x "
    "and zero-padding agree between Java's Formatter and C printf; %f does "
    "NOT — HALF_UP vs half-even — and is excluded by design), plus "
    "lpad/rpad/repeat. Pure projection: runs at scan speed inside "
    "whole-stage codegen, zero shuffle.",
    tags=("scalar",),
)
def scalar_format_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("SUP-%06d", "s_suppkey").alias("padded_id"),
        F.format_string("%s/%d", "s_name", "s_nationkey").alias("name_nation"),
        F.format_string("%x", "s_suppkey").alias("hex_key"),
        F.lpad(F.col("s_nationkey").cast("string"), 4, "0").alias("lpad_nation"),
        F.rpad(F.col("s_suppkey").cast("string"), 8, ".").alias("rpad_key"),
        F.repeat(F.lit("*"), (F.col("s_nationkey") % 5).cast("int")).alias("stars"),
    )


@register(
    "scalar_sequence_arrays",
    # DuckDB range(1, n+1) == Spark sequence(1, n) (inclusive upper bound).
    oracle="""
    SELECT l_orderkey, l_linenumber,
           array_to_string(range(1, l_linenumber + 1), ',') AS seq_str,
           CAST(list_sum(range(1, l_linenumber + 1)) AS BIGINT) AS seq_sum,
           array_to_string(list_reverse(range(1, l_linenumber + 1)), ',') AS rev_str,
           COALESCE(array_to_string(list_slice(range(1, l_linenumber + 1), 2, 3), ','),
                    '') AS mid_str,
           CAST(len(range(1, l_linenumber + 1)) AS INTEGER) AS seq_len
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
    doc="Array generation and manipulation: sequence / reverse / slice / "
    "fold-sum / size, integer-exact, serialized to scalars for the hash "
    "gate. All JVM-side catalyst array expressions — no Python, no "
    "shuffle; generalizes the reference's per-record map (O5) to nested "
    "values.",
    tags=("scalar", "array"),
)
def scalar_sequence_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(seq, ",").alias("seq_str"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("seq_sum"),
        F.array_join(F.reverse(seq), ",").alias("rev_str"),
        F.array_join(F.slice(seq, 2, 2), ",").alias("mid_str"),
        F.size(seq).alias("seq_len"),
    )


@register(
    "join_existence_flag",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           (u.o_custkey IS NOT NULL) AS has_urgent
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT') u
      ON c.c_custkey = u.o_custkey
    """,
    doc="Existence flag (EXISTS as a projected boolean): left join against "
    "the DISTINCT urgent-customer key set, flag = match non-null. The "
    "distinct pre-aggregation keeps the join 1:1 (no row multiplication), "
    "and at TPC-H ratios the key set broadcasts — the fact side never "
    "shuffles. Complements join_left_semi/join_left_anti, which FILTER "
    "rather than flag.",
    tags=("join",),
)
def join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return c.join(
        F.broadcast(urgent), c.c_custkey == urgent.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.col("o_custkey").isNotNull().alias("has_urgent"),
    )


@register(
    "asof_tolerance_30m",
    oracle="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           CASE WHEN v.ts >= p.ts - INTERVAL 30 MINUTE THEN v.event_id END AS view_id_30m
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc="As-of join with tolerance: latest view at/before each purchase, "
    "but only if within 30 minutes — staler matches become NULL. Same "
    "union+carry-forward plan as asof_purchase_last_view (one shuffle, "
    "linear per key) with the tolerance applied as a post-predicate: "
    "equivalent to a windowed as-of because the carried row is by "
    "construction the NEAREST preceding one. Oracle = DuckDB native ASOF "
    "plus the same predicate.",
    tags=("asof", "join", "custom"),
)
def asof_tolerance_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = e.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join(
        purchases,
        views,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id", "ts"],
    )
    in_window = F.col("ts_right") >= F.col("ts") - F.expr("INTERVAL 30 MINUTES")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("event_id_right")).alias("view_id_30m"),
    )


@register(
    "scalar_array_set_ops",
    # Spark's array_intersect/union/except dedup but keep encounter order —
    # sort before serializing so the contract is order-free on both sides.
    # DuckDB lacks list_union/list_except, so the oracle derives them from
    # filter/contains/concat/distinct — independent construction.
    oracle="""
    WITH arrs AS (
      SELECT l_orderkey, l_linenumber,
             range(1, l_linenumber + 1) AS a,
             range(greatest(l_linenumber - 1, 1), l_linenumber + 3) AS b
      FROM lineitem WHERE l_orderkey % 150 = 0
    )
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ',') AS inter_str,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_str,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_str,
           len(list_filter(a, x -> list_contains(b, x))) > 0 AS overlaps
    FROM arrs
    """,
    doc="Array set algebra: array_intersect / array_union / array_except / "
    "arrays_overlap on two derived integer sequences — deduping set "
    "semantics, sorted before serialization so the check is order-free. "
    "JVM-side codegen'd expressions at scan speed; the set-valued column "
    "toolkit for multimodal/tag columns.",
    tags=("scalar", "array"),
)
def scalar_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 150 == 0)
    a = F.sequence(F.lit(1), F.col("l_linenumber"))
    b = F.sequence(
        F.greatest(F.col("l_linenumber") - 1, F.lit(1)), F.col("l_linenumber") + 2
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("inter_str"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_str"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("except_str"),
        F.arrays_overlap(a, b).alias("overlaps"),
    )


@register(
    "scalar_hash_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           md5(CAST(c_custkey AS VARCHAR)) AS key_md5
    FROM customer
    """,
    doc="Cryptographic digest functions over the customer dimension: md5 "
    "and sha2-256 — the content-address / cache-key primitives every "
    "dedup and fingerprinting pipeline leans on (exact dedup and the "
    "hash splitters here already use md5 internally; this query pins the "
    "digests themselves against an independent implementation). Spark's "
    "crc32/xxhash64/sha1 have no DuckDB counterpart and are pinned to "
    "reference vectors in tests/test_portable_properties.py instead.",
    tags=("scalar", "hash"),
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.col("c_custkey").cast("string")).alias("key_md5"),
    )


@register(
    "scalar_xml_extract",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS xk,
           o_orderpriority AS xp,
           CAST(o_totalprice AS VARCHAR) AS xt
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    doc="XML parsing (xpath_* family): rows are serialized to XML "
    "in-query, then field values are recovered with xpath_long / "
    "xpath_string — the oracle is the round-trip identity, so Spark's "
    "XML path evaluation is checked against ground truth rather than "
    "another XML engine (DuckDB has none). The xpath functions are "
    "codegen'd JVM expressions — the scan stays whole-stage, no UDF.",
    tags=("scalar", "xml"),
)
def scalar_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).where(F.col("o_orderkey") % 10 == 0)
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"),
        F.col("o_orderpriority"),
        F.lit("</p><t>"),
        F.col("o_totalprice").cast("string"),
        F.lit("</t></o>"),
    )
    return o.select(
        "o_orderkey",
        F.xpath_long(xml, F.lit("o/k")).alias("xk"),
        F.xpath_string(xml, F.lit("o/p")).alias("xp"),
        F.xpath_string(xml, F.lit("o/t")).alias("xt"),
    )


@register(
    "scalar_geo_haversine",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 17000) / 100.0 - 85.0 AS lat,
             ((c_custkey * 7) % 36000) / 100.0 - 180.0 AS lon
      FROM customer
    )
    SELECT c_custkey, lat, lon,
           CAST(FLOOR(
             2.0 * 6371.0 * ASIN(SQRT(
               POWER(SIN(RADIANS(lat - 48.8566) / 2), 2)
               + COS(RADIANS(lat)) * COS(RADIANS(48.8566))
                 * POWER(SIN(RADIANS(lon - 2.3522) / 2), 2)
             )) / 500.0) AS BIGINT) AS dist_band_500km
    FROM pts
    """,
    doc="Geospatial scalar math: haversine great-circle distance from a "
    "deterministic synthetic (lat, lon) per customer to a fixed anchor, "
    "bucketed into 500 km bands. All trig stays in codegen'd JVM "
    "expressions; banding makes the cross-engine comparison robust to "
    "sub-ulp libm differences (band width 5e2 km vs ~1e-10 km drift). "
    "The geo-bucketing primitive behind region sharding / distance-bounded "
    "candidate generation in entity-resolution joins.",
    tags=("scalar", "geo"),
)
def scalar_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    lat = (F.col("c_custkey") % 17000) / 100.0 - 85.0
    lon = ((F.col("c_custkey") * 7) % 36000) / 100.0 - 180.0
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    a = (
        F.pow(F.sin(F.radians(F.col("lat") - 48.8566) / 2), 2)
        + F.cos(F.radians("lat"))
        * F.cos(F.radians(F.lit(48.8566)))
        * F.pow(F.sin(F.radians(F.col("lon") - 2.3522) / 2), 2)
    )
    dist = 2.0 * 6371.0 * F.asin(F.sqrt(a))
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor(dist / 500.0).cast("long").alias("dist_band_500km"),
    )
