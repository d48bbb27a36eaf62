"""Round-13 analytics: SemDeDup recall audit + materialized cross-modal
closure (VERDICT r12 items 4 and 8).

dedup_semantic_semdedup's docstring names its trade — recall ACROSS cell
boundaries is sacrificed for bounded per-cell work — but nothing measured
it. ``semdedup_recall_report`` quantifies the trade the way
knn_recall_report did for the ANN family: the exact global cosine
near-dup pair set (all-pairs, the audit-tier reference) split into pairs
SemDeDup can see (both endpoints in one k-means cell) vs pairs it
structurally cannot, per threshold.

``pipeline_crossmodal_dedup_materialized`` is the write-then-close form of
the crossmodal closure: a real 100 TB curation run materializes the three
modality edge sets once (partitioned by modality through the sink surface)
and runs the closure over the stored union, instead of recomputing MinHash
+ image decode + cosine bucketing from raw on every run. Output pinned
bit-identical to pipeline_crossmodal_dedup.

Reference parity note: the reference engine (SLR207 MapReduce,
SimpleClient.java/WorkerSender.java — a 1.3k-line Java word count) has no
dedup surface; this is part of the LLM-data-pipeline extension the brief
mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.sources.staging import (
    staged_write as staged_write_ctx,
)

# Importing analytics_r6 executes its registrations, so this module can
# compose the crossmodal closure's oracle SQL verbatim from the registry.
from slr207_mapreduce_spark.plans.analytics_r6 import _SEMDEDUP_TAU
from slr207_mapreduce_spark.plans.base import REGISTRY, register
from slr207_mapreduce_spark.sources.tables import load_table

# The exact-reference thresholds the report audits. _SEMDEDUP_TAU is the
# registered operator's threshold (the row that answers "what does the
# shipped config miss"); 0.2 is dedup_semantic_clusters' global threshold
# (the loose-dup regime); 0.6 the tight-dup regime. The exact pair set is
# computed ONCE at min(taus) and re-thresholded per row.
_RECALL_TAUS: tuple[float, ...] = (0.2, _SEMDEDUP_TAU, 0.6)


def _semdedup_recall_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import (
        cosine_pairs_exact_sql,
        ivf_train_sql_ctes,
    )

    ctes = ",\n    ".join(ivf_train_sql_ctes())
    tau_list = ", ".join(str(t) for t in _RECALL_TAUS)
    return f"""
    WITH {ctes},
    cells AS (SELECT vec_id, cidx FROM assign2 WHERE rn = 1),
    pairs AS ({cosine_pairs_exact_sql(min(_RECALL_TAUS))}),
    cpairs AS (
      SELECT p.cos_sim, (ca.cidx = cb.cidx) AS same_cell
      FROM pairs p
      JOIN cells ca ON ca.vec_id = p.id_a
      JOIN cells cb ON cb.vec_id = p.id_b
    ),
    taus AS (SELECT CAST(unnest([{tau_list}]) AS DOUBLE) AS tau)
    SELECT t.tau,
           CAST(SUM(CASE WHEN c.cos_sim >= t.tau THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_pairs,
           CAST(SUM(CASE WHEN c.cos_sim >= t.tau AND c.same_cell
                         THEN 1 ELSE 0 END) AS BIGINT) AS within_cell_pairs,
           CAST(SUM(CASE WHEN c.cos_sim >= t.tau AND NOT c.same_cell
                         THEN 1 ELSE 0 END) AS BIGINT) AS cross_cell_pairs,
           CASE WHEN SUM(CASE WHEN c.cos_sim >= t.tau THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN c.cos_sim >= t.tau AND c.same_cell
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / SUM(CASE WHEN c.cos_sim >= t.tau THEN 1 ELSE 0 END)
           END AS recall
    FROM taus t CROSS JOIN cpairs c
    GROUP BY t.tau
    """


@register(
    "semdedup_recall_report",
    oracle=_semdedup_recall_oracle(),
    doc="SemDeDup cross-cell recall audit (the knn_recall_report pattern "
    "applied to semantic dedup): the EXACT global cosine near-dup pair "
    "set — all (a < b) pairs, computed by one Arrow-batched broadcast "
    "kernel, never a cartesian — split into pairs whose endpoints share "
    "a trained k-means cell (SemDeDup sees these) vs pairs crossing a "
    "cell boundary (SemDeDup structurally cannot), at the loose / "
    f"shipped (tau={_SEMDEDUP_TAU}) / tight thresholds. recall = "
    "within_cell / exact is the measured value of the documented trade: "
    "pair work falls from O(N^2) to sum-of-cell-squares, recall falls "
    "by exactly the cross-cell fraction this report pins. The recall "
    "join/agg is exact, so the whole report is driver-hash-checkable "
    "even though the cells come from the trained quantizer (whose "
    "training the oracle replays end-to-end).",
    tags=("dedup", "similarity", "audit"),
)
def semdedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import (
        cosine_pairs_exact,
        ivf_assign_cells,
        ivf_train_centroids,
    )

    e = load_table(spark, "embeddings", sf_dir)
    cidx, cint = ivf_train_centroids(e)
    cells = ivf_assign_cells(e, cidx, cint)
    pairs = cosine_pairs_exact(e, threshold=min(_RECALL_TAUS))
    # cells is one row per corpus vector — bounded by the SAME 65,536-row
    # audit contract cosine_pairs_exact just enforced, so broadcast-sized.
    ca = cells.select(F.col("vec_id").alias("id_a"), F.col("cidx").alias("cidx_a"))
    cb = cells.select(F.col("vec_id").alias("id_b"), F.col("cidx").alias("cidx_b"))
    cpairs = (
        pairs.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            "cos_sim", (F.col("cidx_a") == F.col("cidx_b")).alias("same_cell")
        )
    )
    tagged = cpairs.select(
        F.explode(F.array(*[F.lit(float(t)) for t in _RECALL_TAUS])).alias("tau"),
        "cos_sim",
        "same_cell",
    )
    hit = F.col("cos_sim") >= F.col("tau")
    exact = F.sum(F.when(hit, 1).otherwise(0))
    within = F.sum(F.when(hit & F.col("same_cell"), 1).otherwise(0))
    cross = F.sum(F.when(hit & ~F.col("same_cell"), 1).otherwise(0))
    return (
        tagged.groupBy("tau")
        .agg(
            exact.cast("long").alias("exact_pairs"),
            within.cast("long").alias("within_cell_pairs"),
            cross.cast("long").alias("cross_cell_pairs"),
        )
        .select(
            "tau",
            "exact_pairs",
            "within_cell_pairs",
            "cross_cell_pairs",
            F.when(
                F.col("exact_pairs") > 0,
                F.col("within_cell_pairs").cast("double") / F.col("exact_pairs"),
            ).alias("recall"),
        )
    )


def _crossmodal_edges_path(sf_dir: str) -> str:
    """Staging location for the materialized edge sets — deterministic
    per (checkout, SF), NOT per process (r13 ADVICE item 1: the old
    pid-keyed /tmp path leaked one abandoned store per run). Concurrent
    builders serialize through the staging module's locked atomic swap;
    see slr207_mapreduce_spark/sources/staging.py."""
    from slr207_mapreduce_spark.sources.staging import staging_path

    return staging_path("crossmodal_edges", sf_dir)


@register(
    "pipeline_crossmodal_dedup_materialized",
    # The materialization is semantically the identity — the oracle IS the
    # query-from-raw closure's oracle, which makes "write-then-close equals
    # close-from-raw" a driver-checked hash equality, not just a test.
    oracle=REGISTRY["pipeline_crossmodal_dedup"].oracle,
    doc="The write-then-close form of the crossmodal closure — how a real "
    "100 TB curation run uses it: the three modality edge sets are "
    "materialized ONCE through the sink surface (one parquet write of "
    "the union, partitionBy(modality), overwrite-idempotent), and the "
    "min-label closure reads the stored union instead of re-running "
    "MinHash + image decode + cosine bucketing from raw. A consumer "
    "wanting one modality's edges gets PartitionFilters pruning from "
    "the layout for free. Output is bit-identical to "
    "pipeline_crossmodal_dedup (same oracle SQL — the driver hash "
    "checks the equality; tests pin it directly too), so the only "
    "difference is WHERE the edge computation's cost is paid: once at "
    "write time, not per closure run.",
    tags=("pipeline", "dedup", "multimodal", "graph", "iterative", "sink"),
)
def pipeline_crossmodal_dedup_materialized(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from slr207_mapreduce_spark.operators.graph import connected_components
    from slr207_mapreduce_spark.plans.analytics_r6 import crossmodal_edge_sets
    from slr207_mapreduce_spark.plans.base import plan_only_mode

    if plan_only_mode():
        # r14 VERDICT item 7: enumerators must not pay the staging write
        # — the from-raw closure is the semantic identity (shared oracle)
        return REGISTRY["pipeline_crossmodal_dedup"].build(spark, sf_dir)
    # NOTE: building this query RUNS the staging write (the operator's
    # whole point is write-once semantics) — the returned plan is the
    # closure over the stored union, so plan-only consumers see the
    # staged-parquet scan; the three modality generators' plans are
    # audited under their own registered queries.
    sets = crossmodal_edge_sets(spark, sf_dir)
    staged = None
    for modality, df in sets.items():
        tagged = df.select(
            "doc_a", "doc_b", F.lit(modality).alias("modality")
        )
        staged = tagged if staged is None else staged.unionByName(tagged)
    path = _crossmodal_edges_path(sf_dir)
    # ONE write job over the union, laid out by modality: a downstream
    # consumer that wants only text edges gets PartitionFilters pruning
    # for free, and the closure (or any re-run) reads the stored union
    # instead of re-running MinHash + image decode + cosine bucketing.
    # The write lands via the staging module's locked atomic swap, so
    # concurrent builders for the same sf_dir serialize (r13 ADVICE).
    with staged_write_ctx(path) as stage:
        staged.write.mode("overwrite").partitionBy("modality").parquet(stage)
    edges = spark.read.parquet(path).select("doc_a", "doc_b")
    return connected_components(edges, src="doc_a", dst="doc_b")


def _knn_graph_dedup_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import knn_graph_ivf_sql

    # knn_graph_ivf_sql is a complete SELECT; wrap it as a CTE and close
    # over the tau-filtered edges with the crossmodal recursive pattern.
    graph_sql = knn_graph_ivf_sql(k=5, nprobe="auto")
    return f"""
    WITH RECURSIVE graph AS ({graph_sql}),
    pairs AS (
      SELECT query_id AS a, neighbor_id AS b FROM graph
      WHERE cos_sim >= {_SEMDEDUP_TAU}
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b, a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, reach.r
      FROM reach JOIN edges e ON e.src = reach.node
    ),
    labels AS (SELECT node, MIN(r) AS root FROM reach GROUP BY node)
    SELECT emb.vec_id,
           CAST(COALESCE(l.root, emb.vec_id) AS BIGINT) AS cluster_id,
           (l.root IS NULL OR l.root = emb.vec_id) AS kept
    FROM embeddings emb LEFT JOIN labels l ON l.node = emb.vec_id
    """


@register(
    "dedup_semantic_knn_graph",
    oracle=_knn_graph_dedup_oracle(),
    doc="Graph-based semantic dedup — the modern complement to SemDeDup, "
    "built on the corpus-wide kNN graph: keep only edges at cosine >= "
    f"{_SEMDEDUP_TAU} (the shared semantic-dedup threshold), run ONE "
    "checkpointed min-label closure over them, keep each cluster's "
    "min-id document. Where SemDeDup structurally cannot see a pair "
    "crossing a k-means cell boundary (semdedup_recall_report measured "
    "the miss rate), the graph's nprobe-cell routing recovers most "
    "cross-cell near-dup pairs at bounded cost — candidate volume is "
    "nprobe*N*(N/cells), never N^2, and the closure is O(diameter) "
    "rounds over a sparse (<= N*k) edge set. Every stage — quantizer "
    "training, per-row probe ranking, the routed graph, the tau filter, "
    "the recursive closure, the keep verdicts — replays in the oracle.",
    tags=("dedup", "similarity", "graph", "pipeline", "iterative"),
)
def dedup_semantic_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.graph import connected_components
    from slr207_mapreduce_spark.operators.similarity import knn_graph_ivf

    e = load_table(spark, "embeddings", sf_dir)
    g = knn_graph_ivf(e, k=5, nprobe="auto")
    edges = g.where(F.col("cos_sim") >= F.lit(_SEMDEDUP_TAU)).select(
        "query_id", "neighbor_id"
    )
    cc = connected_components(edges, src="query_id", dst="neighbor_id")
    return (
        e.select("vec_id")
        .join(cc.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id"))
            .cast("long")
            .alias("cluster_id"),
            (
                F.col("cluster_id").isNull()
                | (F.col("cluster_id") == F.col("vec_id"))
            ).alias("kept"),
        )
    )
