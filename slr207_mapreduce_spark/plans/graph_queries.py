"""Duplicate-cluster query: connected components over the MinHash-LSH
candidate pairs (operators/graph.py). The oracle reproduces the transitive
closure with a DuckDB recursive CTE — an iterative Spark algorithm that is
still exactly checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates, minhash_lsh_sql
from slr207_mapreduce_spark.operators.graph import connected_components
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
