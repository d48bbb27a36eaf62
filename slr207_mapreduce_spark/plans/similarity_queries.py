"""Similarity-search queries over the embeddings table (north-star family;
operators in slr207_mapreduce_spark/operators/similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.similarity import (
    knn_pq_adc,
    knn_pq_adc_sql,
    knn_ivf_pq,
    knn_ivf_pq_sql,
    knn_graph_ivf,
    knn_graph_ivf_sql,
    cosine_neardup_pairs,
    cosine_neardup_sql,
    knn_bruteforce,
    knn_bruteforce_sql,
    knn_ivf,
    knn_ivf_sql,
    knn_lsh_bucketed,
    knn_lsh_bucketed_sql,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

_N_QUERIES = 10  # query set: vec_id < 10 (broadcast side)
KNN_K = 5  # top-k shared by the bruteforce-referenced tiers
# knn_quantized_int8's registered configuration (query/corpus split + k) —
# exported so plans/recall_report.py derives its denominators from here
# instead of duplicating literals (r10 ADVICE).
INT8_NQ = 5
INT8_K = 3


@register(
    "knn_bruteforce",
    oracle=knn_bruteforce_sql(k=KNN_K, query_pred=f"{{col}} < {_N_QUERIES}"),
    doc="Exact brute-force cosine top-5 for 10 query vectors: broadcast "
    "queries, one corpus scan, per-query top-k reduce. O(Q·N·d) — the ANN "
    "verifier / small-Q baseline.",
    tags=("similarity", "bench"),
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_bruteforce(e, e.where(F.col("vec_id") < _N_QUERIES), k=KNN_K)


@register(
    "knn_lsh_bucketed",
    oracle=knn_lsh_bucketed_sql(
        k=KNN_K, bits=6, tables="auto", probe_radius=1,
        query_pred=f"{{col}} < {_N_QUERIES}",
    ),
    doc="ANN top-5 via MULTI-PROBE multi-table sign-bit LSH (6 bits/table, "
    "OR-of-ANDs; each query also probes its Hamming-1 neighbor buckets — "
    "a deterministic XOR bit-flip expansion, Lv et al. VLDB'07): "
    "candidates meet through an equi-join on (table, bucket) — the scale "
    "path (shuffle ∝ bucket sizes, not N×Q). Multi-probe moved the recall "
    "budget from the CORPUS side (each table costs a full bucket-"
    "projection pass) to the |Q|-sized probe side: the table dial is 6 at "
    "the 500-vector anchor, +2 per doubling, capped 16 (r11 VERDICT item "
    "3 — the single-probe dial needed 28 tables at sf1, 12 of them "
    "duplicate dimension subsets at 4 bits). The oracle computes the same "
    "budget from COUNT(*) and unrolls the same probe masks. Recall "
    "audited by knn_recall_report: 0.88/0.96/1.00 at sf0.01/sf0.1/sf1 vs "
    "the single-probe dial's 0.80/0.88/0.98.",
    tags=("similarity",),
)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_lsh_bucketed(
        e, e.where(F.col("vec_id") < _N_QUERIES), k=KNN_K, bits=6,
        tables="auto", probe_radius=1,
    )


@register(
    "knn_ivf",
    oracle=knn_ivf_sql(
        k=KNN_K, nprobe="auto", n_centroids="auto",
        query_pred=f"{{col}} < {_N_QUERIES}",
    ),
    doc="ANN top-5 via IVF with a TRAINED bounded-k coarse quantizer: "
    "deterministic fixed-point Lloyd's k-means (seeded md5 init, 2 "
    "argmin-join + grid-snapped-mean rounds; k = min(256, max(4, "
    "isqrt(N))) — O(sqrt N) cells with a hard 256 ceiling, r11 VERDICT "
    "item 2), nearest-centroid inverted lists, auto-scaled cell probe "
    "(6 cells at the 500-vector anchor, +5 per corpus doubling — "
    "operators/similarity.py:auto_ivf_nprobe), exact cosine re-rank "
    "inside the probed cells. The oracle replays the ENTIRE training in "
    "SQL (init, every iteration's integer sums and truncating division, "
    "the keep rules), so quantizer drift is a driver hash mismatch. The "
    "FAISS-IVF shape on DataFrames: centroids broadcast (assignment is "
    "a shuffle-free map), lists bucket by cell id for partition-pruned "
    "probes at scale. Recall audited by knn_recall_report.",
    tags=("similarity",),
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_ivf(
        e, e.where(F.col("vec_id") < _N_QUERIES), k=KNN_K, nprobe="auto",
        n_centroids="auto",
    )


@register(
    "embedding_neardup_pairs",
    oracle=cosine_neardup_sql(threshold=0.2, bits=8),
    doc="Embedding-cosine near-dup pairs (cos ≥ 0.2) restricted to shared "
    "sign-bit buckets — the embedding-space analogue of MinHash LSH.",
    tags=("similarity", "dedup"),
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return cosine_neardup_pairs(e, threshold=0.2, bits=8)


@register(
    "embedding_normalize_quantize",
    oracle="""
    WITH norms AS (
      SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings WHERE vec_id < 200
    )
    SELECT vec_id, label,
           nrm AS l2_norm,
           CAST(floor(e[1] / nrm * 127) AS BIGINT) AS q0,
           CAST(floor(e[2] / nrm * 127) AS BIGINT) AS q1,
           array_to_string(list_transform(e, x -> CAST(floor(x / nrm * 127) AS BIGINT)), ',') AS quantized
    FROM norms
    """,
    doc="Vector preprocessing for multimodal/embedding pipelines: L2 "
    "normalization + int8-range quantization (floor(x/‖x‖·127)) — floor on "
    "deterministic IEEE products keeps the int codes engine-exact; output "
    "is the compressed representation an ANN index would store.",
    tags=("similarity", "multimodal"),
)
def q_embedding_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import norm_f64

    e = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 200)
    nrm = norm_f64(F.col("embedding"))
    qz = lambda x: F.floor(x / F.col("l2_norm") * 127).cast("long")  # noqa: E731
    return (
        e.select("vec_id", "label", F.col("embedding"), nrm.alias("l2_norm"))
        .select(
            "vec_id",
            "label",
            "l2_norm",
            qz(F.element_at("embedding", 1).cast("double")).alias("q0"),
            qz(F.element_at("embedding", 2).cast("double")).alias("q1"),
            F.array_join(
                F.transform(F.col("embedding"), lambda x: qz(x.cast("double"))), ","
            ).alias("quantized"),
        )
    )


@register(
    "embedding_centroid_by_label",
    oracle="""
    WITH comp AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT label, CAST(dim AS BIGINT) AS dim,
           CAST(SUM(CAST(floor(x * 1e12) AS BIGINT)) AS BIGINT) AS sum_component_e12,
           COUNT(*) AS n_vectors
    FROM comp GROUP BY label, dim
    """,
    doc="Per-label component sums (centroid numerators): posexplode over the "
    "vector column, fixed-point 1e-12 quantization (IEEE multiply + floor "
    "are bit-deterministic in every engine; float→DECIMAL casts are NOT — "
    "Spark and DuckDB round the 12th digit differently), exact integer sum "
    "— the aggregation shape of a k-means/IVF training step.",
    tags=("similarity", "agg"),
)
def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    comp = e.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).cast("long").alias("dim"),  # 1-based like ORDINALITY
        F.col("x").cast("double").alias("x"),
    )
    return comp.groupBy("label", "dim").agg(
        F.sum(F.floor(F.col("x") * F.lit(1e12)).cast("long"))
        .cast("long")
        .alias("sum_component_e12"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


_Q_CODES_SQL = """
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
             x -> CAST(floor(x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                       CAST(embedding AS DOUBLE[]))) * 127)
                       AS BIGINT)) AS codes
    FROM embeddings
"""


@register(
    "knn_quantized_int8",
    oracle=f"""
    WITH codes AS ({_Q_CODES_SQL}),
    q AS (SELECT vec_id AS query_id, codes AS qc FROM codes WHERE vec_id < {INT8_NQ}),
    c AS (SELECT vec_id AS neighbor_id, codes AS cc FROM codes WHERE vec_id >= {INT8_NQ}),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(list_dot_product(CAST(qc AS DOUBLE[]), CAST(cc AS DOUBLE[])) AS BIGINT) AS iscore
      FROM q CROSS JOIN c
    ),
    ranked AS (
      SELECT query_id, neighbor_id, iscore,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY iscore DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, iscore, rank FROM ranked WHERE rank <= {INT8_K}
    """,
    doc="Quantized (int8-code) top-k search: vectors L2-normalized and "
    "floor-quantized to [-127,127] integer codes (the compressed form an "
    "ANN index stores — 4x smaller than f32, SIMD-friendly integer dot "
    "products), then exact integer top-3 per query with deterministic "
    "tie-break. Integer scores are engine-exact by construction — the "
    "memory-bandwidth scale path when 100 TB of embeddings won't fit as "
    "f32. Queries broadcast; corpus scanned once, no corpus shuffle.",
    tags=("similarity", "quantization"),
)
def q_knn_quantized_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The pair scoring is one Arrow-batched mapInPandas pass emitting each
    # batch's LOCAL top-3 per query (r7 — the previous broadcast crossJoin
    # evaluated the integer-dot fold INTERPRETED over all N×|Q| pairs: an
    # 8.5 s single stage at sf1, and the rank exchange carried every
    # scored pair). Quantization mirrors the exact expression order
    # (x / nrm * 127, nrm = sequential-fold self-dot) so codes are
    # bit-identical to the oracle's; the dot is int64 — order-free.
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)

    def _codes(mat: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(mat.shape[0])
        for j in range(mat.shape[1]):
            acc += mat[:, j] * mat[:, j]
        nrm = np.sqrt(acc)
        return np.floor(mat / nrm[:, None] * 127).astype(np.int64)

    qrows = (
        e.where(F.col("vec_id") < INT8_NQ)
        .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
        .collect()
    )
    qids = np.asarray([r.vec_id for r in qrows], dtype=np.int64)
    qcodes = (
        _codes(np.asarray([r.v for r in qrows], dtype=np.float64))
        if qrows
        else np.zeros((0, 0), dtype=np.int64)
    )
    nq = len(qids)

    def score(batches):
        for pdf in batches:
            if nq == 0 or len(pdf) == 0:
                continue
            nid = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            ccodes = _codes(np.vstack(pdf["cvec"].to_numpy()).astype(np.float64))
            iscore = ccodes @ qcodes.T  # exact int64
            out_q, out_n, out_s = [], [], []
            for i in range(nq):
                top = np.lexsort((nid, -iscore[:, i]))[:INT8_K]
                out_q.extend([qids[i]] * len(top))
                out_n.extend(nid[top])
                out_s.extend(iscore[top, i])
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(out_q, dtype=np.int64),
                    "neighbor_id": np.asarray(out_n, dtype=np.int64),
                    "iscore": np.asarray(out_s, dtype=np.int64),
                }
            )

    local = (
        e.where(F.col("vec_id") >= INT8_NQ)
        .selectExpr("vec_id AS neighbor_id", "CAST(embedding AS array<double>) AS cvec")
        .mapInPandas(score, schema="query_id long, neighbor_id long, iscore long")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("iscore"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= INT8_K)
        .select("query_id", "neighbor_id", "iscore", "rank")
    )

@register(
    "knn_pq_adc",
    oracle=knn_pq_adc_sql(
        k=KNN_K, m=8, sub_dim=8, ksub=16, rerank="auto",
        query_pred=f"{{col}} < {_N_QUERIES}",
    ),
    doc="ANN top-5 via product quantization + asymmetric distance (the "
    "FAISS-PQ shape): seeded per-subspace codebooks (8 subspaces x 16 "
    "centroids), corpus encoded to 8 codes by an argmin AGGREGATION "
    "(map-side combined — no window over the corpus), query LUT broadcast, "
    "ADC distance = integer sum of LUT hits (fixed-point nano-units -> "
    "order-independent), exact cosine re-rank of an auto-scaled shortlist "
    "(20 at the 500-vector anchor, +65 per corpus doubling — "
    "operators/similarity.py:auto_pq_rerank; the oracle computes the same "
    "budget from COUNT(*)). 64 f32 dims -> 8 bytes is the 32x compression "
    "that keeps a 100 TB corpus' index in memory. Recall audited by "
    "knn_recall_report.",
    tags=("similarity",),
)
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_pq_adc(
        e, e.where(F.col("vec_id") < _N_QUERIES), k=KNN_K, m=8, sub_dim=8,
        ksub=16, rerank="auto",
    )


@register(
    "knn_ivf_pq",
    oracle=knn_ivf_pq_sql(
        k=KNN_K, nprobe="auto", m=8, sub_dim=8, ksub=16, rerank="auto",
        query_pred=f"{{col}} < {_N_QUERIES}",
    ),
    doc="IVF-PQ composed ANN top-5 — the standard billion-scale index "
    "shape (FAISS IndexIVFPQ), new in r13: the trained fixed-point coarse "
    "quantizer ROUTES each query to its auto-dialed nprobe cells, PQ-ADC "
    "integer LUT sums score ONLY the routed lists, and an exact cosine "
    "re-rank of the auto-scaled shortlist yields the top-k. The "
    "composition is what neither parent has alone: knn_ivf bounds the "
    "candidate set (nprobe/k of the corpus) but scores full-width "
    "vectors; knn_pq_adc bounds bytes-per-score (64 f32 dims -> 8 codes) "
    "but scans everything. One Arrow-batched corpus pass builds cells + "
    "codes with the routing mask applied in-batch; the oracle replays "
    "the ENTIRE index — quantizer training, probe ranking, codes, LUTs, "
    "routed ADC, re-rank. With nprobe >= n_centroids the output is "
    "bit-identical to knn_pq_adc (routing only prunes; pinned by test). "
    "Recall audited by knn_recall_report.",
    tags=("similarity",),
)
def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_ivf_pq(
        e, e.where(F.col("vec_id") < _N_QUERIES), k=KNN_K, nprobe="auto",
        m=8, sub_dim=8, ksub=16, rerank="auto",
    )


@register(
    "knn_graph_ivf",
    oracle=knn_graph_ivf_sql(k=KNN_K, nprobe="auto"),
    doc="Corpus-wide kNN GRAPH (new, r13): the IVF-routed top-5 neighbors "
    "of EVERY vector, with no driver-side query collect — the operator a "
    "100 TB curation run needs for kNN-graph dedup, clustering, and "
    "connectivity, where all rows are queries. Routing is itself an "
    "Arrow-batched corpus pass (each row ranks the broadcast <= 256 "
    "trained centroids with the oracle's exact tie-break and emits its "
    "nprobe probe pairs); probes meet the inverted lists in ONE per-cell "
    "applyInPandas kernel (members x probing queries, sequential-in-j "
    "cosine, local top-k — exact over the routed candidates because "
    "every neighbor lives in exactly one cell); a global window reduces "
    "per-cell winners. The probe shuffle moves nprobe corpus copies — "
    "the IVF-graph's inherent cost, paid instead of the N^2 a "
    "bruteforce graph would need. Invalid vectors appear on neither "
    "side (exclusion contract). The oracle replays training, every "
    "row's probe ranking, candidates, and the exact re-rank.",
    tags=("similarity", "graph", "pipeline"),
)
def q_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    return knn_graph_ivf(e, k=KNN_K, nprobe="auto")
