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
    from slr207_mapreduce_spark.sources.staging import staging_path

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
