"""Duplicate-cluster query: connected components over the MinHash-LSH
candidate pairs (operators/graph.py). The oracle reproduces the transitive
closure with a DuckDB recursive CTE — an iterative Spark algorithm that is
still exactly checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates, minhash_lsh_sql
from slr207_mapreduce_spark.operators.graph import connected_components, pagerank_fp_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({minhash_lsh_sql(6, 2, 3)})
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, reach.r
      FROM reach JOIN edges e ON e.src = reach.node
    )
    SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
    """,
    doc="Duplicate clusters: connected components (iterative min-label "
    "propagation, O(diameter) joins, lineage checkpointed per round) over "
    "the MinHash-LSH candidate pairs — near-dup PAIRS become duplicate "
    "GROUPS only after transitive closure. Oracle: recursive-CTE closure.",
    tags=("dedup", "graph", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    pairs = minhash_lsh_candidates(d, num_hashes=6, band_size=2, shingle_n=3)
    return connected_components(pairs, src="doc_a", dst="doc_b")


_CS_EDGES_SQL = """
      SELECT o_custkey AS src, 1000000 + l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      UNION ALL
      SELECT 1000000 + l_suppkey, o_custkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


@register(
    "graph_pagerank",
    oracle=pagerank_fp_sql(_CS_EDGES_SQL, iters=5),
    doc="Fixed-point PageRank (5 synchronous rounds, damping 0.85) over the "
    "symmetrized customer-supplier trade graph (suppliers offset by 1e6 to "
    "disjoint the id spaces). ALL arithmetic is integer floor-division in "
    "1e12 fixed-point units — Spark `div`, DuckDB `//` — so a "
    "1000-executor run produces the oracle's exact bits (float PageRank "
    "drifts in the contribution sums). Per round: one shuffle of "
    "edge-contributions (integer partial sums combine map-side) + a left "
    "join back to the node set; lineage checkpointed per round like "
    "connected_components. Dangling mass: none (symmetric edges).",
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.operators.graph import pagerank_fp

    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    pairs = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("cust"),
        (F.lit(1000000) + F.col("l_suppkey")).alias("supp"),
    )
    edges = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    return pagerank_fp(edges, iters=5)
