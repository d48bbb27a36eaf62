"""Set operators (SURVEY.md §2.1 "Set ops" row): union all / union distinct /
intersect / except / distinct.

MapReduce derivation: map tags each record with its source relation, shuffle
on the whole row (reference O8 with the full record as key), reduce keeps
rows per the op's membership rule (reference O9). Spark: built-in operators;
distinct-flavored ones are one hash aggregation on the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


def _building(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def _big_spenders(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )


_SQL_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SQL_SPENDERS = "SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000"


@register(
    "setop_union_all",
    oracle=f"SELECT c_custkey FROM ({_SQL_BUILDING} UNION ALL {_SQL_SPENDERS})",
    doc="UNION ALL (bag union — no shuffle at all, pure concatenation).",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).unionAll(_big_spenders(spark, sf_dir))


@register(
    "setop_union_distinct",
    oracle=f"{_SQL_BUILDING} UNION {_SQL_SPENDERS}",
    doc="UNION DISTINCT (set union — one row-hash aggregation).",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).union(_big_spenders(spark, sf_dir)).distinct()


@register(
    "setop_intersect",
    oracle=f"{_SQL_BUILDING} INTERSECT {_SQL_SPENDERS}",
    doc="INTERSECT (distinct semantics): BUILDING customers who spent big.",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).intersect(_big_spenders(spark, sf_dir))


@register(
    "setop_except",
    oracle=f"{_SQL_BUILDING} EXCEPT {_SQL_SPENDERS}",
    doc="EXCEPT (distinct semantics): BUILDING customers who never spent big.",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (exceptAll would keep surplus multiplicity)
    return _building(spark, sf_dir).subtract(_big_spenders(spark, sf_dir))


@register(
    "setop_except_all",
    oracle=f"{_SQL_BUILDING} EXCEPT ALL {_SQL_SPENDERS}",
    doc="EXCEPT ALL (bag difference — multiplicity-aware).",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).exceptAll(_big_spenders(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle=f"{_SQL_BUILDING} INTERSECT ALL {_SQL_SPENDERS}",
    doc="INTERSECT ALL (bag intersection — multiplicity-aware).",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).intersectAll(_big_spenders(spark, sf_dir))


@register(
    "setop_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT on a projection (whole-row dedup — reference O8+O9 with "
    "the row as the key).",
    tags=("setop",),
)
def setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "setop_union_by_name",
    oracle=f"""
    SELECT c_custkey, 'building' AS src, CAST(NULL AS BIGINT) AS okey
    FROM ({_SQL_BUILDING})
    UNION ALL
    SELECT o_custkey AS c_custkey, 'big_order' AS src, o_orderkey AS okey
    FROM orders WHERE o_totalprice > 250000
    """,
    doc="unionByName with allowMissingColumns: schemas align by COLUMN NAME "
    "not position (the right side lists columns in a different order; the "
    "left side lacks okey entirely and gets it null-filled), vs positional "
    "UNION ALL which would silently mis-zip. Oracle spells out the aligned "
    "projection.",
    tags=("setop", "union"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    left = _building(spark, sf_dir).select(
        "c_custkey",
        F.lit("building").alias("src"),
    )
    right = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 250000)
        .select(
            F.lit("big_order").alias("src"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("c_custkey"),
        )
    )
    return left.unionByName(right, allowMissingColumns=True)
