"""Round-14 analytics: graph-dedup over-merge control, the
build-once/query-many composed index, and incremental semantic dedup
(VERDICT r13 items 2, 5 and 6).

Reference parity note: the reference engine (SLR207 MapReduce,
SimpleClient.java/WorkerSender.java — a 1.3k-line Java word count) has no
dedup or similarity surface; these are part of the LLM-data-pipeline
extension the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.plans.analytics_r6 import _SEMDEDUP_TAU
from slr207_mapreduce_spark.plans.base import REGISTRY, register

# Importing similarity_queries executes its registrations, so this module
# can share knn_ivf_pq's oracle and query-set constants verbatim.
from slr207_mapreduce_spark.plans.similarity_queries import _N_QUERIES, KNN_K
from slr207_mapreduce_spark.sources.tables import load_table


# The over-merge control's two-tier edge rule (every alternative below
# was measured against ground truth — the sf1 tier's known replica
# families and the clustered fixture's known mixture components;
# SCALE.md round-14):
#
# - An UNAMBIGUOUS edge (cos >= _TAU_STRONG, the tight-dup regime of
#   analytics_r7's _RECALL_TAUS) stands alone. On the clustered fixture
#   within-component similarity (~0.85) clears it, so exact recovery is
#   preserved; on sf1 the replica families sit at cos≈0.6 by
#   construction and merge through it.
# - A BORDERLINE edge (cos in [tau, _TAU_STRONG)) survives only if it is
#   RECIPROCAL-BEST: rank 1 in both directions. Each node has exactly
#   one rank-1 out-edge, so the surviving borderline edges form a
#   MATCHING — borderline similarity can merge at most PAIRS, and
#   over-merge structurally cannot percolate through it; any long-range
#   merge needs a path of unambiguous edges.
#
# Why not the textbook alternatives: plain mutual-kNN (reciprocal
# top-k at any rank) FRAGMENTS clustered corpora (measured: 456
# components vs 16 true on emb_clustered_n2000_k16 — fringe nodes whose
# in-cluster edges are all asymmetric) AND still collapses sf1
# (17,633-member giant: reciprocal ambient ~0.5-cosine edges chain);
# widening reciprocity to top-20 helps neither fully (60 components vs
# 16 true; sf1 still giant).
_TAU_STRONG = 0.6


def _knn_graph_dedup_mutual_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import knn_graph_ivf_sql

    graph_sql = knn_graph_ivf_sql(k=5, nprobe="auto")
    return f"""
    WITH RECURSIVE graph AS ({graph_sql}),
    tau_edges AS (
      SELECT query_id AS a, neighbor_id AS b, cos_sim, rank FROM graph
      WHERE cos_sim >= {_SEMDEDUP_TAU}
    ),
    pairs AS (
      -- two-tier over-merge control: unambiguous edges stand alone;
      -- borderline edges must be reciprocal-BEST (rank 1 both ways —
      -- a matching, so borderline merges cannot chain)
      SELECT t1.a, t1.b FROM tau_edges t1
      WHERE t1.cos_sim >= {_TAU_STRONG}
         OR (t1.rank = 1 AND EXISTS (SELECT 1 FROM tau_edges t2
                    WHERE t2.a = t1.b AND t2.b = t1.a AND t2.rank = 1))
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
    "dedup_semantic_knn_graph_mutual",
    oracle=_knn_graph_dedup_mutual_oracle(),
    doc="dedup_semantic_knn_graph with the over-merge control (r13 "
    "VERDICT item 2), a two-tier edge rule measured against ground "
    f"truth: an unambiguous edge (cos >= {_TAU_STRONG}, the tight-dup "
    "regime) stands alone, while a borderline edge (cos in [tau, "
    f"{_TAU_STRONG})) survives only if RECIPROCAL-BEST — rank 1 in both "
    "directions, one left-semi self-join over the <= N*k edge set. "
    "Surviving borderline edges form a MATCHING (each node has one "
    "rank-1 out-edge), so over-merge structurally cannot percolate "
    "through borderline similarity — the guarantee plain closures lack. "
    "Measured on sf1 (20k vectors, known 10-replica families at "
    "cos~0.6): the plain closure collapses to ONE ~20,000-member "
    "component; this rule yields ~2,026 components, largest 18, ~98% "
    "of them family-pure — while the clustered fixture's exact "
    "component recovery is preserved (pinned by test; within-cluster "
    "similarity clears the unambiguous tier). Pure mutual-kNN fails "
    "both ways (fragments clustered corpora, still chains sf1 through "
    "reciprocal ambient edges) — SCALE.md round-14. Fully "
    "oracle-replayable.",
    tags=("dedup", "similarity", "graph", "pipeline", "iterative"),
)
def dedup_semantic_knn_graph_mutual(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from slr207_mapreduce_spark.operators.graph import connected_components
    from slr207_mapreduce_spark.operators.similarity import knn_graph_ivf

    e = load_table(spark, "embeddings", sf_dir)
    g = knn_graph_ivf(e, k=5, nprobe="auto")
    tau_edges = g.where(F.col("cos_sim") >= F.lit(_SEMDEDUP_TAU)).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )
    best = tau_edges.where(F.col("rank") == 1)
    rev_best = best.select(
        F.col("neighbor_id").alias("query_id"),
        F.col("query_id").alias("neighbor_id"),
    )
    reciprocal_best = (
        best.join(rev_best, ["query_id", "neighbor_id"], "left_semi")
        .select("query_id", "neighbor_id")
    )
    strong = tau_edges.where(
        F.col("cos_sim") >= F.lit(_TAU_STRONG)
    ).select("query_id", "neighbor_id")
    kept_edges = reciprocal_best.unionByName(strong).distinct()
    cc = connected_components(kept_edges, src="query_id", dst="neighbor_id")
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


@register(
    "knn_ivf_pq_materialized",
    # The materialization is semantically the identity — the oracle IS
    # knn_ivf_pq's oracle, so "build-the-store-then-query equals
    # query-from-raw" is a driver-checked hash equality (the
    # crossmodal_materialized pattern, analytics_r7).
    oracle=REGISTRY["knn_ivf_pq"].oracle,
    doc="The build-once/query-many form of the composed IVF-PQ index "
    "(r13 VERDICT item 5 — the r13 decade row showed the index wall is "
    "BUILD-dominated, so the split is now a first-class surface): ONE "
    "corpus pass trains the coarse quantizer, assigns cells, PQ-encodes "
    "every valid vector, and writes (vec_id, codes) partitionBy(cidx) "
    "through the sink surface; the query stage reads ONLY its routed "
    "cells back (PartitionFilters on the partition column — pinned by "
    "test), ADC-scores the STORED codes against per-query LUTs, and "
    "exact-re-ranks the shortlist. Output bit-identical to knn_ivf_pq "
    "from raw (same oracle SQL — the driver hash-checks the equality; "
    "a test pins it directly too). At 100 TB the build runs once and "
    "every query batch pays nprobe/k of the CODES (m bytes per vector), "
    "never the full-width corpus.",
    tags=("similarity", "pipeline", "sink"),
)
def q_knn_ivf_pq_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import (
        knn_ivf_pq_build_index,
        knn_ivf_pq_query_index,
    )
    from slr207_mapreduce_spark.plans.base import plan_only_mode
    from slr207_mapreduce_spark.sources.staging import staging_path

    if plan_only_mode():
        # r14 VERDICT item 7: registry enumerators (plan audit, sweep)
        # must not pay the staging write — return the from-raw twin
        # plan, which shares this query's oracle because materialization
        # is semantically the identity.
        return REGISTRY["knn_ivf_pq"].build(spark, sf_dir)
    e = load_table(spark, "embeddings", sf_dir)
    path = staging_path("ivfpq_index", sf_dir)
    # NOTE: building this query RUNS the index build + staging write (the
    # operator's point is write-once semantics) — the returned plan is
    # the query stage over the stored cells+codes; see the staging module
    # for the swap/lock discipline (r13 ADVICE item 1).
    state = knn_ivf_pq_build_index(
        e, path, n_centroids="auto", m=8, sub_dim=8, ksub=16
    )
    return knn_ivf_pq_query_index(
        e,
        e.where(F.col("vec_id") < _N_QUERIES),
        path,
        state,
        k=KNN_K,
        nprobe="auto",
        m=8,
        sub_dim=8,
        rerank="auto",
    )


# Incremental semantic dedup split: vec_id % 10 == 7 plays the arriving
# batch (~10% of the corpus), the rest the accumulated store. The store
# predicate scopes quantizer training and the inverted lists; the batch
# routes against the TRAINED cells without retraining.
_SEM_NEW_PRED = "({col} % 10) = 7"
_SEM_STORE_PRED = "(vec_id % 10) <> 7"


def _incremental_semantic_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import (
        COSINE_SQL,
        IVF_CENT_DBL_SQL,
        auto_ivf_nprobe_sql,
        ivf_train_sql_ctes,
    )

    iters = 2
    np_sql = auto_ivf_nprobe_sql(_SEM_STORE_PRED)
    cos_v = COSINE_SQL.format(a="v.e", b=IVF_CENT_DBL_SQL)
    cos = COSINE_SQL.format(a="q.embedding", b="c.embedding")
    ctes = ivf_train_sql_ctes(corpus_pred=_SEM_STORE_PRED, iters=iters)
    ctes.append(
        f"cells AS (SELECT vec_id AS store_id, cidx FROM assign{iters} WHERE rn = 1)"
    )
    ctes.append(
        f"""probe_rank AS (
      SELECT v.vec_id AS query_id, c.cidx,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {cos_v} DESC, c.cidx ASC) AS rn
      FROM vall v CROSS JOIN cent{iters} c
      WHERE ({_SEM_NEW_PRED.format(col='v.vec_id')})
    )"""
    )
    ctes.append(
        f"probes AS (SELECT query_id, cidx FROM probe_rank WHERE rn <= ({np_sql}))"
    )
    ctes.append(
        f"""pairs AS (
      SELECT p.query_id AS vec_id, cells.store_id, {cos} AS cos_sim
      FROM probes p
      JOIN cells ON p.cidx = cells.cidx
      JOIN embeddings q ON q.vec_id = p.query_id
      JOIN embeddings c ON c.vec_id = cells.store_id
    )"""
    )
    ctes.append(
        f"""best AS (
      SELECT vec_id, store_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, store_id ASC) AS rn
      FROM pairs WHERE cos_sim >= {_SEMDEDUP_TAU}
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT v.vec_id,
           (b.store_id IS NULL) AS kept,
           CAST(b.store_id AS BIGINT) AS best_match,
           b.cos_sim AS best_cos
    FROM (SELECT vec_id FROM vall
          WHERE ({_SEM_NEW_PRED.format(col='vec_id')})) v
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.vec_id = v.vec_id
    """


@register(
    "pipeline_incremental_semantic_dedup",
    oracle=_incremental_semantic_oracle(),
    doc="Incremental SEMANTIC dedup (r13 VERDICT item 6 — the embedding "
    "analogue of pipeline_incremental_dedup): the vec_id%10==7 batch "
    "plays a day's arriving embeddings, the rest the accumulated store. "
    "The coarse quantizer is trained on the STORE ONLY (no retraining "
    "at ingest — the auto cell/nprobe dials count the store, and the "
    "oracle's training CTEs are store-scoped via corpus_pred); arriving "
    "rows route to their nprobe trained cells in a stateless "
    "Arrow-batched pass and compare ONLY against the routed inverted "
    f"lists; a row with any routed cosine >= {_SEMDEDUP_TAU} is dropped "
    "(kept=false) with its best match and similarity reported. The "
    "routing/compare operator is streaming_semantic_gate_candidates — "
    "the SAME plan runs unchanged on a readStream (stateless "
    "projection + broadcast equi-join, append-legal; stream==batch "
    "parity pinned in tests/test_streaming.py). At 100 TB the store's "
    "lists are partitionBy(cell) parquet and a day's batch touches "
    "only its routed cells.",
    tags=("pipeline", "dedup", "similarity", "incremental", "streaming"),
)
def pipeline_incremental_semantic_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from slr207_mapreduce_spark.streaming.ops import (
        streaming_semantic_gate_candidates,
    )

    return _incremental_semantic_verdicts(
        spark, sf_dir, streaming_semantic_gate_candidates
    )


def _incremental_semantic_verdicts(
    spark: SparkSession, sf_dir: str, gate
) -> DataFrame:
    """Shared verdict assembly for the two gate forms: best routed match
    per arriving row (cos DESC, store_id ASC), kept = no match ≥ tau."""
    from pyspark.sql import Window

    from slr207_mapreduce_spark.operators.similarity import norm_f64

    e = load_table(spark, "embeddings", sf_dir)
    new = e.where(F.expr(_SEM_NEW_PRED.format(col="vec_id")))
    store = e.where(F.expr(_SEM_STORE_PRED))
    pairs = gate(new, store, tau=_SEMDEDUP_TAU, nprobe="auto")
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("store_id")
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "store_id", "cos_sim")
    )
    nrm = norm_f64(F.col("embedding").cast("array<double>"))
    newv = new.where((nrm > 0) & (nrm < F.lit(float("inf")))).select("vec_id")
    return newv.join(best, "vec_id", "left").select(
        "vec_id",
        F.col("store_id").isNull().alias("kept"),
        F.col("store_id").cast("long").alias("best_match"),
        F.col("cos_sim").alias("best_cos"),
    )


@register(
    "pipeline_incremental_semantic_dedup_distributed",
    # Semantically the identity vs the broadcast form — the oracle IS
    # pipeline_incremental_semantic_dedup's oracle, so "distributed gate
    # equals broadcast gate" is a driver-checked hash equality (the
    # knn_ivf_pq_materialized pattern).
    oracle=_incremental_semantic_oracle(),
    doc="The beyond-broadcast form of incremental semantic dedup (r14 "
    "VERDICT item 1 — the round's one `weak`): the SAME verdicts as "
    "pipeline_incremental_semantic_dedup, computed by "
    "semantic_gate_candidates_distributed — the store's inverted lists "
    "stay a DISTRIBUTED DataFrame (optionally a partitionBy(cidx) "
    "layout read with PartitionFilters), arriving rows emit nprobe "
    "(cell, row) probe pairs in one stateless Arrow pass with the "
    "broadcast gate's exact centroid ranking, and probes meet members "
    "in ONE per-cell applyInPandas kernel (the knn_graph_ivf "
    "composition) — so NO store-size bound exists anywhere in the "
    "plan. Cosines are bit-identical to the broadcast gate (same "
    "sequential-in-j fold; pinned by test), and the driver hash-checks "
    "the equality against the shared oracle. "
    "streaming_semantic_gate_candidates auto-branches here when a "
    "batch input's store exceeds its 2^20-row broadcast bound; a "
    "streaming source runs this under foreachBatch with the quantizer "
    "trained once (tested e2e). Measured at a 1.25M-row store "
    "(SCALE.md round-15) where the broadcast form's bound rejects.",
    tags=("pipeline", "dedup", "similarity", "incremental", "streaming"),
)
def pipeline_incremental_semantic_dedup_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from slr207_mapreduce_spark.streaming.ops import (
        semantic_gate_candidates_distributed,
    )

    return _incremental_semantic_verdicts(
        spark, sf_dir, semantic_gate_candidates_distributed
    )


def _semdedup_merged_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import (
        COSINE_SQL,
        ivf_train_sql_ctes,
        merged_cells_sql_ctes,
    )

    ctes = ",\n    ".join(
        ivf_train_sql_ctes() + merged_cells_sql_ctes(merge_tau=_TAU_STRONG)
    )
    cos = COSINE_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
    WITH RECURSIVE {ctes},
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM mcells a JOIN mcells b
        ON a.mcidx = b.mcidx AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE {cos} >= {_SEMDEDUP_TAU}
    )
    SELECT c.vec_id, c.mcidx AS cidx,
           (d.vec_id IS NULL) AS kept
    FROM mcells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
    """


@register(
    "dedup_semantic_semdedup_merged",
    oracle=_semdedup_merged_oracle(),
    doc="SemDeDup with the self-dialing over-segmentation fix (r13 "
    "VERDICT item 7): after training, cells whose centroid cosine "
    f"reaches {_TAU_STRONG} are UNIONED (min-label closure over the "
    "<= k^2 centroid pairs — centroid state, not corpus state) and the "
    "within-cell pair stage runs over the MERGED cells. The dial needs "
    "no knowledge of the true cluster count: k-means at k = isqrt(N) "
    "on a corpus with fewer true components SPLITS them, and split "
    "cells' centroids are nearly parallel (measured >= 0.9 on the "
    "clustered fixtures) while distinct-content centroids stay <= 0.45 "
    "on every shell/near-noise tier — so near-noise corpora merge "
    "NOTHING (output identical to dedup_semantic_semdedup, pinned by "
    "test) and over-segmented corpora recover the cross-cell pairs the "
    "r13 recall audit showed plain SemDeDup structurally misses "
    "(clustered n=2000: recall 0.50 -> >= 0.9 at auto dials, pinned by "
    "test). Pair work stays sum-of-merged-cell-squares; training, the "
    "merge closure, assignment, and the verdicts all replay in the "
    "oracle.",
    tags=("dedup", "similarity", "pipeline"),
)
def dedup_semantic_semdedup_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_train_centroids,
        merge_trained_cells,
        semdedup_cell_dropped_kernel,
    )

    e = load_table(spark, "embeddings", sf_dir)
    cidx, cint = ivf_train_centroids(e)
    mcidx = merge_trained_cells(cidx, cint, merge_tau=_TAU_STRONG)
    # assignment still ranks the ORIGINAL centroids in original cidx
    # order (the merge changes pair scoping, not the quantizer — ties
    # break on the original id exactly like the oracle's assign CTE);
    # passing the merged labels as the kernel's output ids applies the
    # cidx -> mcidx map in the same pass
    cells = ivf_assign_cells(e, mcidx, cint, carry_vec=True)
    dropped = (
        cells.select("cidx", "vec_id", "v")
        .groupBy("cidx")
        .applyInPandas(
            semdedup_cell_dropped_kernel(_SEMDEDUP_TAU), schema="vec_id long"
        )
        .withColumn("is_dropped", F.lit(True))
    )
    return cells.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cidx",
        F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
    )


# Hybrid-retrieval configuration: the BM25 lexical ranking (text_bm25's
# fixed query {join, hash, scan}) fused with the vector ranking of query
# embedding vec_id=0 via reciprocal rank fusion, each modality
# contributing its top-_RRF_DEPTH ranks, RRF constant 60 (Cormack et
# al.'s standard), final cut top-_RRF_TOPK. Contributions are exact
# integers (1e9 // (60 + rank)), so the fusion is engine-exact.
_RRF_K0 = 60
_RRF_DEPTH = 20
_RRF_TOPK = 10


def _hybrid_rrf_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import knn_bruteforce_sql
    from slr207_mapreduce_spark.plans.base import REGISTRY as _REG

    bm25_sql = _REG["text_bm25"].oracle
    knn_sql = knn_bruteforce_sql(k=_RRF_DEPTH, query_pred="{col} = 0")
    return f"""
    WITH bm AS ({bm25_sql}),
    trank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25_e9 DESC, doc_id ASC) AS r
      FROM bm
    ),
    knn AS ({knn_sql}),
    contrib AS (
      SELECT doc_id, 1000000000 // ({_RRF_K0} + r) AS c,
             r AS text_rank, CAST(NULL AS BIGINT) AS vec_rank
      FROM trank WHERE r <= {_RRF_DEPTH}
      UNION ALL
      SELECT neighbor_id AS doc_id, 1000000000 // ({_RRF_K0} + rank) AS c,
             CAST(NULL AS BIGINT) AS text_rank, rank AS vec_rank
      FROM knn
    ),
    fused AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS rrf_e9,
             CAST(MAX(text_rank) AS BIGINT) AS text_rank,
             CAST(MAX(vec_rank) AS BIGINT) AS vec_rank
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, rrf_e9, text_rank, vec_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_e9 DESC, doc_id ASC) AS fr
      FROM fused
    ) WHERE fr <= {_RRF_TOPK}
    """


@register(
    "retrieval_hybrid_rrf",
    oracle=_hybrid_rrf_oracle(),
    doc="Hybrid retrieval via reciprocal rank fusion (Cormack et al. "
    "2009) — the standard modern curation/retrieval shape, composed "
    "from two already-oracled families: the BM25 lexical ranking "
    "(text_bm25's log-free fixed-point scorer, query {join, hash, "
    f"scan}}) and the exact vector ranking of query embedding 0, each "
    f"contributing its top-{_RRF_DEPTH} ranks; a doc's fused score is "
    f"the integer sum of 1e9 // ({_RRF_K0} + rank) over the modalities "
    "that ranked it (missing modality contributes nothing), final cut "
    f"top-{_RRF_TOPK} by (score, id). No join anywhere: the two rank "
    "lists UNION and fold in one tiny groupBy — at 100 TB each "
    "modality's ranking is the bounded-output retrieval its own "
    "operator already scales (BM25 = two corpus scans; kNN = the ANN "
    "tiers), and the fusion only ever touches 2x depth rows. "
    "Documents and embeddings link by id (doc_id == vec_id).",
    tags=("text", "similarity", "ranking", "pipeline"),
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from slr207_mapreduce_spark.operators.similarity import knn_bruteforce
    from slr207_mapreduce_spark.plans.base import REGISTRY as _REG

    bm = _REG["text_bm25"].build(spark, sf_dir)
    # top-DEPTH first (TakeOrderedAndProject — the scalable global
    # top-k), THEN rank: the unpartitioned window only ever sees
    # _RRF_DEPTH rows, never the corpus-sized BM25 output
    wt = Window.orderBy(F.desc("bm25_e9"), F.asc("doc_id"))
    trank = (
        bm.orderBy(F.desc("bm25_e9"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .withColumn("r", F.row_number().over(wt))
        .select(
            "doc_id",
            F.expr(f"1000000000 div ({_RRF_K0} + r)").alias("c"),
            F.col("r").cast("long").alias("text_rank"),
            F.lit(None).cast("long").alias("vec_rank"),
        )
    )
    e = load_table(spark, "embeddings", sf_dir)
    knn = knn_bruteforce(e, e.where(F.col("vec_id") == 0), k=_RRF_DEPTH)
    vrank = knn.select(
        F.col("neighbor_id").alias("doc_id"),
        F.expr(f"1000000000 div ({_RRF_K0} + rank)").alias("c"),
        F.lit(None).cast("long").alias("text_rank"),
        F.col("rank").cast("long").alias("vec_rank"),
    )
    fused = (
        trank.unionByName(vrank)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("rrf_e9"),
            F.max("text_rank").cast("long").alias("text_rank"),
            F.max("vec_rank").cast("long").alias("vec_rank"),
        )
    )
    wf = Window.orderBy(F.desc("rrf_e9"), F.asc("doc_id"))
    return (
        fused.withColumn("fr", F.row_number().over(wf))
        .where(F.col("fr") <= _RRF_TOPK)
        .select("doc_id", "rrf_e9", "text_rank", "vec_rank")
    )


# Batch hybrid retrieval: _RRF_NQ queries at once (r14 VERDICT item 3).
# Query q's LEXICAL terms are derived from the documents table itself —
# the top-3 tf-idf keywords of document q under text_keyword_tfidf_topk's
# exact integer formulation — and its VECTOR leg is embedding q against
# the materialized IVF-PQ store (build-once/query-many), so the whole
# thing is the production retrieval shape: one warm index, a batch of
# queries, per-query fusion.
_RRF_NQ = 5


def _hybrid_rrf_batch_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import knn_ivf_pq_sql

    knn_sql = knn_ivf_pq_sql(
        k=_RRF_DEPTH, nprobe="auto", m=8, sub_dim=8, ksub=16, rerank="auto",
        query_pred=f"{{col}} < {_RRF_NQ}",
    )
    return f"""
    WITH knn AS ({knn_sql}),
    btoks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> length(t) > 0)) AS term
      FROM documents
    ),
    tf_all AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM btoks GROUP BY doc_id, term
    ),
    df_all AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf_all GROUP BY term
    ),
    ndocs AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    kw AS (
      SELECT tf_all.doc_id AS query_id, tf_all.term,
             ROW_NUMBER() OVER (PARTITION BY tf_all.doc_id
               ORDER BY tf_all.tf * CAST(FLOOR(1000000000.0 * ndocs.n_docs / df_all.df) AS BIGINT) DESC,
                        tf_all.term ASC) AS r
      FROM tf_all JOIN df_all USING (term) CROSS JOIN ndocs
      WHERE tf_all.doc_id < {_RRF_NQ}
    ),
    qterms AS (SELECT query_id, term FROM kw WHERE r <= 3),
    bdl AS (
      SELECT doc_id, CAST(SUM(tf) AS DOUBLE) AS dl
      FROM tf_all GROUP BY doc_id
    ),
    bstats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(18,1))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM bdl
    ),
    btf AS (
      SELECT doc_id, term, CAST(tf AS DOUBLE) AS tf FROM tf_all
      WHERE term IN (SELECT term FROM qterms)
    ),
    bdf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM btf GROUP BY term),
    bscored AS (
      SELECT btf.doc_id, btf.term,
             CAST(floor((((bstats.n_docs - bdf.df + 0.5) / (bdf.df + 0.5) + 1.0)
               * (btf.tf * (1.5 + 1.0))
               / (btf.tf + 1.5 * (1.0 - 0.75 + 0.75 * bdl.dl / bstats.avgdl))) * 1e9) AS BIGINT) AS e9
      FROM btf
      JOIN bdf ON btf.term = bdf.term
      JOIN bdl ON btf.doc_id = bdl.doc_id
      CROSS JOIN bstats
    ),
    perq AS (
      SELECT q.query_id, s.doc_id, CAST(SUM(s.e9) AS BIGINT) AS bm25_e9
      FROM bscored s JOIN qterms q ON s.term = q.term
      GROUP BY q.query_id, s.doc_id
    ),
    trank AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY bm25_e9 DESC, doc_id ASC) AS r
      FROM perq
    ),
    contrib AS (
      SELECT query_id, doc_id, 1000000000 // ({_RRF_K0} + r) AS c,
             r AS text_rank, CAST(NULL AS BIGINT) AS vec_rank
      FROM trank WHERE r <= {_RRF_DEPTH}
      UNION ALL
      SELECT query_id, neighbor_id AS doc_id,
             1000000000 // ({_RRF_K0} + rank) AS c,
             CAST(NULL AS BIGINT) AS text_rank, rank AS vec_rank
      FROM knn
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(c) AS BIGINT) AS rrf_e9,
             CAST(MAX(text_rank) AS BIGINT) AS text_rank,
             CAST(MAX(vec_rank) AS BIGINT) AS vec_rank
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_e9, text_rank, vec_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id ASC) AS fr
      FROM fused
    ) WHERE fr <= {_RRF_TOPK}
    """


@register(
    "retrieval_hybrid_rrf_batch",
    oracle=_hybrid_rrf_batch_oracle(),
    doc="ANN-backed BATCH hybrid retrieval (r14 VERDICT item 3): "
    f"{_RRF_NQ} queries fused per-query in one plan. Each query's "
    "lexical terms are DERIVED FROM THE DATA — the top-3 tf-idf "
    "keywords of its own document under text_keyword_tfidf_topk's "
    "integer-exact formulation — then scored with text_bm25's log-free "
    "fixed-point BM25 generalized to a (query_id, term) relation (one "
    "shared tokenize+tf subplan feeds keyword derivation, dl, and tf — "
    "ws-regex tokens throughout so ReuseExchange collapses the corpus "
    "scans). The vector leg is the MATERIALIZED IVF-PQ store "
    f"(build-once/query-many): all {_RRF_NQ} embeddings probe the warm "
    f"index in one knn_ivf_pq_query_index call at k={_RRF_DEPTH}. "
    "Fusion stays integer-exact (1e9 // (60 + rank) summed as BIGINTs) "
    "and every window is partitioned by query_id — bounded per-query "
    "state, no corpus-sized unpartitioned window. At 100 TB this is "
    "the retrieval loop's steady state: the index builds once, every "
    "query batch pays nprobe/k of 8-byte codes plus two bounded rank "
    "lists per query.",
    tags=("text", "similarity", "ranking", "pipeline", "sink"),
)
def retrieval_hybrid_rrf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from slr207_mapreduce_spark.functions.portable import dec
    from slr207_mapreduce_spark.operators.similarity import (
        knn_ivf_pq,
        knn_ivf_pq_build_index,
        knn_ivf_pq_query_index,
    )
    from slr207_mapreduce_spark.operators.text import tokens_ws
    from slr207_mapreduce_spark.plans.base import plan_only_mode
    from slr207_mapreduce_spark.sources.staging import staging_path

    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(tokens_ws("text")).alias("term"))

    # STAGE 1 (eager, bounded — the knn family's collected-query-side
    # pattern): derive each query's top-3 tf-idf keywords under
    # text_keyword_tfidf_topk's exact integer scoring. The result is
    # ≤ _RRF_NQ·3 rows by construction; collecting it here lets STAGE 2
    # run text_bm25's fused ONE-scan shape over literal terms instead of
    # re-deriving the (query_id, term) relation in four plan subtrees
    # (audited: 13 document scans the lazy form paid, 1 after this).
    tf_all = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_all = tf_all.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    ndocs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    tf_q = tf_all.where(F.col("doc_id") < _RRF_NQ)
    kw = (
        df_all.join(F.broadcast(tf_q), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col("doc_id").alias("query_id"),
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.lit(1000000000.0) * F.col("n_docs") / F.col("df")
                ).cast("long")
            ).alias("score_e9"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("score_e9"), F.asc("term")
    )
    qterm_rows = sorted(
        (
            (r["query_id"], r["term"])
            for r in kw.withColumn("r", F.row_number().over(wk))
            .where(F.col("r") <= 3)
            .select("query_id", "term")
            .collect()
        )
    )
    terms = sorted({t for _, t in qterm_rows})

    # STAGE 2: text_bm25's fused scorer over the literal term set — ONE
    # tokenize+agg pass folds dl and every term's tf; one global pass
    # folds corpus stats and per-term df into a 1-row broadcast
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, F.lit(1)))
            .cast("double")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    bstats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(dec("dl", 18, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, F.lit(1)))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"), F.col(f"tf_{i}").alias("tf")
                    )
                    for i, t in enumerate(terms)
                ]
            )
        ),
    ).where(F.col("tf") > 0)
    df_of_term = F.create_map(
        *[
            x
            for i, t in enumerate(terms)
            for x in (F.lit(t), F.col(f"df_{i}"))
        ]
    )[F.col("term")]
    k1, b = F.lit(1.5), F.lit(0.75)
    s = (
        ((F.col("n_docs") - df_of_term + 0.5) / (df_of_term + 0.5) + 1.0)
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    bscored = (
        tf.crossJoin(F.broadcast(bstats))
        .select("doc_id", "term", F.floor(s * 1e9).cast("long").alias("e9"))
    )
    qmap = F.create_map(
        *[
            x
            for t in terms
            for x in (
                F.lit(t),
                F.array(
                    *[F.lit(q) for q, tt in qterm_rows if tt == t]
                ),
            )
        ]
    )[F.col("term")]
    perq = (
        bscored.select(
            F.explode(qmap).alias("query_id"), "doc_id", "e9"
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("e9").cast("long").alias("bm25_e9"))
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("bm25_e9"), F.asc("doc_id")
    )
    trank = (
        perq.withColumn("r", F.row_number().over(wt))
        .where(F.col("r") <= _RRF_DEPTH)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"1000000000 div ({_RRF_K0} + r)").alias("c"),
            F.col("r").cast("long").alias("text_rank"),
            F.lit(None).cast("long").alias("vec_rank"),
        )
    )

    # vector leg: the batch of query embeddings against the warm store
    e = load_table(spark, "embeddings", sf_dir)
    q = e.where(F.col("vec_id") < _RRF_NQ)
    if plan_only_mode():
        # enumerators pay no staging write — the from-raw composed index
        # is bit-identical to query-from-store (the materialized pattern)
        knn = knn_ivf_pq(
            e, q, k=_RRF_DEPTH, nprobe="auto", m=8, sub_dim=8, ksub=16,
            rerank="auto",
        )
    else:
        path = staging_path("ivfpq_index", sf_dir)
        state = knn_ivf_pq_build_index(
            e, path, n_centroids="auto", m=8, sub_dim=8, ksub=16
        )
        knn = knn_ivf_pq_query_index(
            e, q, path, state, k=_RRF_DEPTH, nprobe="auto", m=8, sub_dim=8,
            rerank="auto",
        )
    vrank = knn.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.expr(f"1000000000 div ({_RRF_K0} + rank)").alias("c"),
        F.lit(None).cast("long").alias("text_rank"),
        F.col("rank").cast("long").alias("vec_rank"),
    )
    fused = (
        trank.unionByName(vrank)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("c").cast("long").alias("rrf_e9"),
            F.max("text_rank").cast("long").alias("text_rank"),
            F.max("vec_rank").cast("long").alias("vec_rank"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_e9"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fr", F.row_number().over(wf))
        .where(F.col("fr") <= _RRF_TOPK)
        .select("query_id", "doc_id", "rrf_e9", "text_rank", "vec_rank")
    )
