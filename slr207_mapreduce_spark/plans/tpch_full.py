"""The remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q13, Q17, Q18, Q20,
Q21), completing the 22-query suite started in tpch.py / tpch_extra.py.

The testdata schema is a trimmed TPC-H (no partsupp, no
commit/receipt dates, no comment columns), so the queries that depend on
those columns are *adapted*: each keeps the original's plan shape — the
decorrelation pattern, join graph, and aggregation structure the optimizer
has to handle — with a predicate rewritten onto available columns. The
adaptation is noted per query.

Numeric portability follows functions/portable.py: money sums go through
DECIMAL(12,2), quantity aggregates are exact because l_quantity is integral
(1..50, verified in testdata), and every scalar threshold is derived from an
exact sum before the single final cast to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import dec
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


_DISTINCT_PART_SUPP = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_DISTINCT_PART_SUPP})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, ps, nation, region
    WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT max(s2.s_acctbal)
        FROM supplier s2, ps ps2, nation n2, region r2
        WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    doc="TPC-H Q2 shape: correlated argmax subquery — for each qualifying "
    "part, the best European supplier of it. Adapted: no partsupp table, so "
    "the part↔supplier relation is the distinct (l_partkey, l_suppkey) "
    "pairs observed in lineitem, and 'best' is max s_acctbal instead of min "
    "ps_supplycost (a raw column, so the equality-with-aggregate compare is "
    "exact). Decorrelated into a per-part max + join-back, which at scale "
    "beats a window over the fact join (the groupBy reduces before the "
    "join).",
    tags=("relational", "subquery", "join"),
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    euro_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey).join(
        euro_supp, ps.l_suppkey == F.col("s_suppkey")
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp_key")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        offers.join(
            best,
            (offers.p_partkey == F.col("bp_key"))
            & (offers.s_acctbal == F.col("best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
              / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — an 8-way join (two roles "
    "for nation) feeding a conditional-numerator share per year. Both sums "
    "stay DECIMAL until the final division. All five dims broadcast; the "
    "only shuffles are the two fact-fact joins and the final year group.",
    tags=("relational", "join", "agg"),
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    volume = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(24,4)"
    )
    nation_share = F.when(
        F.col("supp_nation") == "NATION_3", F.col("volume")
    ).otherwise(F.lit(0).cast("decimal(24,4)"))
    return (
        l.join(F.broadcast(part), l.l_partkey == part.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(nation_share).cast("double") / F.sum("volume").cast("double")
            ).cast("double").alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, o_year,
           CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4))
             - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,4)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: product-type profit by nation and year. Adapted: "
    "no partsupp, so line cost is p_retailprice * l_quantity instead of "
    "ps_supplycost * l_quantity — same expression tree (revenue minus a "
    "part-attributed cost), fully DECIMAL until the final cast.",
    tags=("relational", "join", "agg"),
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    revenue = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(24,4)"
    )
    cost = (dec("p_retailprice") * F.col("l_quantity").cast("decimal(12,2)")).cast(
        "decimal(24,4)"
    )
    return (
        l.join(F.broadcast(part), l.l_partkey == part.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            (revenue - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_part_value",
    oracle="""
    SELECT l_partkey AS part_key,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_5', 'NATION_8')
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 1.5
             / CAST(COUNT(DISTINCT l_partkey) AS DOUBLE)
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_5', 'NATION_8'))
    ORDER BY value DESC, part_key
    """,
    doc="TPC-H Q11 shape: per-part value for a nation group's suppliers, "
    "kept only when above a threshold derived from the group's total — "
    "HAVING against a global scalar subquery. Adapted: value is summed "
    "lineitem revenue instead of partsupp stock value, and the threshold "
    "is 1.5x the mean per-part value (the original's fixed 0.0001 fraction "
    "is scale-DEPENDENT: it empties as part count grows). Both the group "
    "sums and the scalar total are exact DECIMAL sums; the scalar does its "
    "two double ops once, so the compare is deterministic double vs "
    "double.",
    tags=("relational", "subquery", "agg"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_5", "NATION_8")
    )
    nat_lines = l.join(
        F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
        l.l_suppkey == F.col("s_suppkey"),
    )
    per_part = nat_lines.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("value")
    )
    threshold = nat_lines.agg(
        (
            F.sum(dec("l_extendedprice")).cast("double")
            * F.lit(1.5)
            / F.countDistinct("l_partkey").cast("double")
        ).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold), F.col("value") > F.col("thr"))
        .select("part_key", "value")
        .orderBy(F.desc("value"), "part_key")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: two-level aggregation over an outer join — "
    "orders-per-customer histogram where customers with zero qualifying "
    "orders must survive (COUNT of a nullable key, not COUNT(*)). Adapted: "
    "the o_comment NOT LIKE filter becomes an o_orderpriority filter (no "
    "comment column). The join-condition filter (not a WHERE) is the point: "
    "it must not turn the outer join inner.",
    tags=("relational", "join", "agg"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 10
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: rows below a correlated per-part average — "
    "decorrelated into a per-part avg + join-back filter. Adapted filter: "
    "p_brand + p_size (no container column). The threshold compare is "
    "exact: l_quantity is integral so its double sum (and hence avg) is "
    "exact, and 0.2*avg is one deterministic double op on both engines.",
    tags=("relational", "subquery", "agg"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    l = _t(spark, sf_dir, "lineitem")
    li = l.join(F.broadcast(part), l.l_partkey == part.p_partkey)
    avg_qty = li.groupBy(F.col("l_partkey").alias("aq_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(
            F.broadcast(avg_qty),
            (li.l_partkey == F.col("aq_key"))
            & (li.l_quantity < F.col("qty_thr")),
        )
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: large-volume customers — IN over a grouped HAVING "
    "subquery (orders whose total quantity exceeds a threshold), re-joined "
    "to customer/orders and re-aggregated, top-100. The IN becomes a "
    "left-semi join against the filtered aggregate; o_orderkey in the sort "
    "makes the limit deterministic. sum(l_quantity) is exact (integral "
    "doubles).",
    tags=("relational", "subquery", "join", "topk"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        l.join(big, l.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q20_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_7', 'NATION_12', 'NATION_21')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape: nested IN chain — suppliers (in a nation set) who "
    "moved a meaningful volume of the target parts in a year. Adapted: the "
    "partsupp availqty threshold becomes a shipped-quantity HAVING over "
    "lineitem; 'forest%' part-name prefix becomes 'small%'. Both INs become "
    "left-semi joins; the part filter is broadcast into the lineitem scan.",
    tags=("relational", "subquery", "join"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_7", "NATION_12", "NATION_21")
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        l.join(
            F.broadcast(part.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late supplier on a "
    "multi-supplier order — correlated EXISTS + NOT EXISTS over the same "
    "fact. Adapted: 'late' is l_shipdate > o_orderdate + 60 days (no "
    "commit/receipt dates). Decorrelated set-style: the NOT EXISTS becomes "
    "'the order's distinct late-supplier count is 1' (the outer row is "
    "itself late, so it is that one), and the EXISTS becomes a semi-join "
    "against orders with ≥2 distinct suppliers. Every shuffle keys on "
    "l_orderkey, so AQE can reuse the exchange.",
    tags=("relational", "subquery", "join", "topk"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5")
    )
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = l.join(o, l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late_supp_cnt = (
        late.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy(F.col("l_orderkey").alias("lc_key"))
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    multi_supp = (
        l.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy(F.col("l_orderkey").alias("ms_key"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .where(F.col("n_supp") >= 2)
        .select("ms_key")
    )
    return (
        late.join(
            late_supp_cnt,
            (late.l_orderkey == F.col("lc_key")) & (F.col("n_late") == 1),
        )
        .join(multi_supp, late.l_orderkey == F.col("ms_key"), "left_semi")
        .join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
            late.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
