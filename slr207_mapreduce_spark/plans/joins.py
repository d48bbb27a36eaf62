"""Join operator coverage (SURVEY.md §2.1 "Equi-join" row).

MapReduce derivation: map tags records by source relation, shuffle on the
join key (reference O8), reduce merges the per-key groups (reference O9) —
the classic repartition join. In Spark each variant below is a declarative
``df.join(...)``; Catalyst picks broadcast-hash / shuffled-hash / sort-merge
(AQE can demote to broadcast at runtime), which is exactly what we want at
100 TB: the dimension sides here are broadcast so the fact table is never
shuffled for the join itself.

Covers: inner, left outer, right outer, full outer, left semi, left anti,
cross, and a non-equi (range) join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, n_name
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
    """,
    doc="Inner equi-join chain orders→customer→nation (broadcast dims).",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "o_totalprice", "c_name", "n_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'P'
    """,
    doc="Left outer join with a join-side predicate (NULL-extends customers "
    "with no pending orders).",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "P"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_right_outer",
    oracle="""
    SELECT s_suppkey, s_name, l_orderkey, l_linenumber
    FROM lineitem
    RIGHT JOIN supplier ON l_suppkey = s_suppkey AND l_returnflag = 'R'
    """,
    doc="Right outer join (suppliers kept even with no returned lineitems).",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return l.join(
        s, (l.l_suppkey == s.s_suppkey) & (l.l_returnflag == "R"), "right"
    ).select("s_suppkey", "s_name", "l_orderkey", "l_linenumber")


@register(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
         big_ord  AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
                      FROM orders GROUP BY o_custkey HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 400000)
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal, o_custkey, spend
    FROM big_cust FULL JOIN big_ord ON c_custkey = o_custkey
    """,
    doc="Full outer join of two derived relations (rich customers vs big "
    "spenders) — NULL-extends both sides.",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("spend_dec"))
        .where(F.col("spend_dec") > 400000)
        .select("o_custkey", F.col("spend_dec").cast("double").alias("spend"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_custkey", "spend"
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
    """,
    doc="Left semi join (EXISTS): parts that ever shipped in bulk. Semi join "
    "needs only key presence — no row multiplication, minimal shuffle.",
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_retailprice"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    doc="Left anti join (NOT EXISTS): customers with no open orders.",
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, s_name
    FROM region CROSS JOIN supplier
    """,
    doc="Cross join of two tiny relations (5×10) — BroadcastNestedLoopJoin; "
    "bounded sides only, never fact×fact.",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "supplier").select("s_name")
    return r.crossJoin(s)


@register(
    "join_salted",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
    doc="Skew-salted equi-join (operators/skew.py): the left side carries a "
    "deterministic hash salt, the right side is replicated per salt, and "
    "the join key becomes (key, salt) — one hot key spreads over N tasks. "
    "Result is IDENTICAL to the plain join, which is exactly what the "
    "oracle checks.",
    tags=("join", "skew"),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.skew import salted_join

    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("k"), "o_orderkey")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    return salted_join(o, c, "k", num_salts=8).select("o_orderkey", "c_name")


@register(
    "join_range_nonequi",
    oracle="""
    SELECT o_orderkey, o_totalprice, tier
    FROM orders
    JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('high', 300000.0, 1000000000.0))
         AS tiers(tier, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    WHERE o_orderstatus = 'F'
    """,
    doc="Non-equi (range/theta) join: banding a fact column against a tiny "
    "broadcast bounds table — BroadcastNestedLoopJoin, the scalable shape "
    "for banding joins.",
    tags=("join", "nonequi"),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    tiers = o.sparkSession.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000000.0)],
        ["tier", "lo", "hi"],
    )
    return (
        o.join(
            F.broadcast(tiers),
            (o.o_totalprice >= tiers.lo) & (o.o_totalprice < tiers.hi),
        )
        .select("o_orderkey", "o_totalprice", "tier")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT c_custkey, NULLIF(c_nationkey % 7, 3) AS jkey FROM customer
    ),
    r AS (
      SELECT DISTINCT NULLIF(n_nationkey % 7, 3) AS jkey, n_nationkey % 7 AS bucket
      FROM nation
    )
    SELECT r.bucket, CAST(l.jkey IS NULL AS BOOLEAN) AS key_is_null,
           COUNT(*) AS n_customers
    FROM l JOIN r ON l.jkey IS NOT DISTINCT FROM r.jkey
    GROUP BY r.bucket, key_is_null
    ORDER BY r.bucket
    """,
    doc="Null-safe equality join (Spark `<=>` ⟺ SQL IS NOT DISTINCT FROM): "
    "NULL keys MATCH each other instead of silently dropping — the "
    "semantics plain equi-joins get wrong when the join key is derived "
    "and nullable (here NULLIF carves a NULL bucket out of the key "
    "space). Spark still plans this as a hash join (null-safe equality "
    "is a valid hash key), so the scale profile equals the plain "
    "equi-join's.",
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 7, F.lit(3)).alias("jkey")
    )
    r = (
        _t(spark, sf_dir, "nation")
        .select(
            F.nullif(F.col("n_nationkey") % 7, F.lit(3)).alias("rkey"),
            (F.col("n_nationkey") % 7).alias("bucket"),
        )
        .distinct()
    )
    return (
        c.join(F.broadcast(r), F.col("jkey").eqNullSafe(F.col("rkey")))
        .groupBy("bucket", F.isnull("jkey").alias("key_is_null"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("bucket")
    )
