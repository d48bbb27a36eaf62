"""Round-12 analytics: cross-modal dedup closure (r11 VERDICT item 4).

The three modalities' near-duplicate detectors each close into clusters
separately — dedup_clusters (MinHash-LSH text edges),
multimodal_phash_clusters (dHash image edges), dedup_semantic_clusters
(embedding-cosine edges) — and each of their docs has said a "real
multimodal curation run unions all three edge sets before one closure".
This module registers that run: the union-then-close query whose clusters
merge documents connected through ANY modality (two docs with unrelated
text but near-identical images dedup together, and transitivity hops
across modalities).

Key space: documents are keyed by ``doc_id``; ``embeddings.vec_id`` is the
id of the document each vector embeds (the id spaces coincide — vec_id
0..N_emb-1 is a prefix of doc_id 0..N_doc-1 at every SF, i.e. the first
N_emb documents carry embeddings), so all three edge sets speak doc_id and
the union needs no id translation.

Scale shape: each edge generator is its own audited banded/bucketed join
(never all-pairs); the union adds no shuffle of its own (it concatenates
partitions); the single closure is the same checkpointed O(diameter)
min-label propagation the per-modality cluster queries run — one closure
over the union instead of three separate ones, which is strictly cheaper
AND correct (per-modality closures cannot merge a text-dup of an
image-dup).

Reference parity note: the reference engine (SLR207 MapReduce,
SimpleClient.java/WorkerSender.java — a 1.3k-line Java word count) has no
dedup surface; this is part of the LLM-data-pipeline extension the brief
mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_lsh_sql,
)
from slr207_mapreduce_spark.operators.graph import connected_components
from slr207_mapreduce_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_neardup_sql,
)
from slr207_mapreduce_spark.plans.analytics_r5 import (
    _phash_oracle,
    multimodal_phash_neardup,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


def crossmodal_edge_sets(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The three modality near-dup edge generators at the registered
    configs, each (doc_a, doc_b) — shared by the query-from-raw closure
    below and the write-then-close pipeline variant
    (plans/analytics_r7.py:pipeline_crossmodal_dedup_materialized)."""
    d = load_table(spark, "documents", sf_dir)
    e = load_table(spark, "embeddings", sf_dir)
    return {
        "text": minhash_lsh_candidates(
            d, num_hashes=6, band_size=2, shingle_n=3
        ).select("doc_a", "doc_b"),
        "image": multimodal_phash_neardup(spark, sf_dir).select("doc_a", "doc_b"),
        "embedding": cosine_neardup_pairs(e, threshold=0.2, bits=8).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        ),
    }


@register(
    "pipeline_crossmodal_dedup",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({minhash_lsh_sql(6, 2, 3)})
      UNION
      SELECT doc_a, doc_b FROM ({_phash_oracle()})
      UNION
      SELECT id_a AS doc_a, id_b AS doc_b
      FROM ({cosine_neardup_sql(threshold=0.2, bits=8)})
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
    doc="Cross-modal duplicate clusters — the real multimodal curation "
    "run: union the text (MinHash-LSH), image (dHash bit-sampling LSH), "
    "and embedding (cosine sign-bit buckets) near-dup edge sets on their "
    "shared doc_id key, then ONE transitive closure (checkpointed "
    "min-label propagation, O(diameter) rounds). Clusters merge docs "
    "connected through ANY modality, including transitive hops ACROSS "
    "modalities — three separate per-modality closures cannot produce "
    "this (they miss the text-dup-of-an-image-dup merge). Each edge "
    "generator is the already-audited banded join of its per-modality "
    "query; the union adds no shuffle. Oracle: recursive-CTE closure "
    "over the UNION of the three already-oracled pair SQLs.",
    tags=("pipeline", "dedup", "multimodal", "graph", "iterative"),
)
def pipeline_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sets = crossmodal_edge_sets(spark, sf_dir)
    edges = sets["text"].unionByName(sets["image"]).unionByName(sets["embedding"])
    return connected_components(edges, src="doc_a", dst="doc_b")


# --------------------------------------------------------------------------
# Trained k-means as a first-class training op + SemDeDup (r12)
# --------------------------------------------------------------------------
#
# knn_ivf's r12 quantizer proved that fixed-point Lloyd's k-means is
# exactly DuckDB-replayable. These two queries promote that machinery
# from an index-internal detail to the training-data-pipeline surface:
# the k-means fit itself (the centroid table a 100 TB pipeline trains
# once and caches), and SemDeDup (Abbas et al., 2023, arXiv:2303.09540)
# — semantic dedup that only compares embeddings WITHIN a k-means cell,
# turning the O(N^2) global pair problem into sum-of-cell-squares.

# Within-cell cosine at/above which the larger id drops. 0.4 measured:
# 21/500 docs drop at sf0.01, 148/2000 at sf0.1 — a live minority, the
# dedup-rate regime (0.2 dropped 75%: within-cell pairs are similarity-
# BIASED because k-means co-located them, so the global near-dup
# threshold is too loose here).
_SEMDEDUP_TAU = 0.4


def _kmeans_train_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import ivf_train_sql_ctes

    ctes = ",\n    ".join(ivf_train_sql_ctes())
    return f"""
    WITH {ctes},
    cells AS (SELECT vec_id, cidx FROM assign2 WHERE rn = 1),
    sizes AS (SELECT cidx, COUNT(*) AS n FROM cells GROUP BY cidx),
    comps_out AS (
      SELECT cidx, unnest(range(1, len(ci) + 1)) AS dim,
             unnest(ci) AS component_e6
      FROM cent2
    )
    SELECT co.cidx, CAST(co.dim AS BIGINT) AS dim,
           CAST(co.component_e6 AS BIGINT) AS component_e6,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS cell_size
    FROM comps_out co LEFT JOIN sizes s ON s.cidx = co.cidx
    """


@register(
    "embedding_kmeans_train",
    oracle=_kmeans_train_oracle(),
    doc="The trained coarse quantizer as a first-class training op: "
    "fixed-point Lloyd's k-means over the embeddings (seeded md5 init, "
    "2 argmin + grid-snapped-mean rounds, k = min(256, max(4, "
    "isqrt(N)))), emitting every centroid component on the exact 1e-6 "
    "integer grid plus each cell's final population. The ENTIRE fit is "
    "replayed by the oracle — init ranking, every iteration's integer "
    "sums and truncating divisions, the empty/all-zero keep rules — so "
    "this is a hash-checkable distributed k-means, the centroid table a "
    "100 TB pipeline trains once and broadcasts everywhere "
    "(operators/similarity.py:ivf_train_centroids; training iterates over "
    "a bounded seeded sample collected once — cost independent of corpus "
    "size — and only the final cell assignment touches the full corpus, "
    "as one Arrow-batched shuffle-free pass).",
    tags=("similarity", "agg", "pipeline"),
)
def embedding_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_train_centroids,
    )

    e = load_table(spark, "embeddings", sf_dir)
    cidx, cint = ivf_train_centroids(e)
    rows = [
        (int(c), d + 1, int(cint[i, d]))
        for i, c in enumerate(cidx)
        for d in range(cint.shape[1])
    ]
    cent_df = spark.createDataFrame(rows, "cidx long, dim long, component_e6 long")

    sizes = (
        ivf_assign_cells(e, cidx, cint)
        .groupBy("cidx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cent_df.join(F.broadcast(sizes), "cidx", "left")
        .select(
            "cidx",
            "dim",
            "component_e6",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("cell_size"),
        )
    )


def _semdedup_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import (
        COSINE_SQL,
        ivf_train_sql_ctes,
    )

    ctes = ",\n    ".join(ivf_train_sql_ctes())
    cos = COSINE_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
    WITH {ctes},
    cells AS (SELECT vec_id, cidx FROM assign2 WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM cells a JOIN cells b
        ON a.cidx = b.cidx AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE {cos} >= {_SEMDEDUP_TAU}
    )
    SELECT c.vec_id, c.cidx,
           (d.vec_id IS NULL) AS kept
    FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
    """


@register(
    "dedup_semantic_semdedup",
    oracle=_semdedup_oracle(),
    doc="SemDeDup (Abbas et al. 2023): semantic dedup that clusters the "
    "embeddings with the trained fixed-point k-means and compares "
    f"cosine ONLY within each cell — a doc drops iff a smaller-id "
    f"in-cell neighbor sits at cosine >= {_SEMDEDUP_TAU} (deterministic "
    "min-id keep rule, no transitive closure needed). The cell scoping "
    "is the scale story: pair volume falls from O(N^2) to "
    "sum-of-cell-squares, and with k = isqrt(N) cells the expected cell "
    "is sqrt(N) docs, so pair work is ~N^1.5 with uniform cells — on "
    "clustered real corpora far less, because the near-dups this op "
    "exists to find are exactly what k-means co-locates. Training, "
    "assignment, AND the keep verdicts replay in the oracle. "
    "Complements dedup_semantic_clusters (global sign-bit-bucket pairs "
    "+ closure): SemDeDup trades recall ACROSS cell boundaries for "
    "bounded per-cell work at 100 TB. The trade is MEASURED by "
    "semdedup_recall_report (r13): at the shipped tau, recall vs the "
    "exact global pair set is 0.37/0.18/0.14 at sf0.01/0.1/1 on the "
    "shell-distributed near-noise fixture (cells are arbitrary there) "
    "and 0.82/0.50 on the clustered mixture fixture at n=500/2000 — "
    "where the n=2000 drop is pure over-segmentation: k = isqrt(N) "
    "cells split the 16 true components (44 cells -> recall 0.50 at "
    "purity 1.00; retraining with n_centroids=16 restores 0.94). On a "
    "real corpus, set n_centroids near the expected cluster count; the "
    "isqrt default is the work-bound-first choice.",
    tags=("dedup", "similarity", "pipeline"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_train_centroids,
        semdedup_cell_dropped_kernel,
    )

    e = load_table(spark, "embeddings", sf_dir)
    cidx, cint = ivf_train_centroids(e)
    # carry_vec: the shared assignment kernel carries the double-cast
    # vector through, so the within-cell pair stage needs no re-join back
    # to the table — 3 embeddings scans total (cells x2: dropped leg +
    # verdict leg), within the sweep's default budget. At 100 TB the
    # cells frame is what you'd materialize bucketed by cidx anyway.
    cells = ivf_assign_cells(e, cidx, cint, carry_vec=True)
    # Within-cell verdicts as ONE numpy kernel per cell — the shared
    # semdedup_cell_dropped_kernel (r13: the interpreted per-pair fold
    # was 50.5 s at sf1; the Arrow kernel 3.3 s; r14 review: one
    # definition shared with the merged variant so the bit-exactness-
    # critical kernel cannot drift between copies).
    dropped = (
        cells.select("cidx", "vec_id", "v")
        .groupBy("cidx")
        .applyInPandas(
            semdedup_cell_dropped_kernel(_SEMDEDUP_TAU), schema="vec_id long"
        )
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        cells.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cidx",
            F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
        )
    )


# --------------------------------------------------------------------------
# Count-min epsilon-delta certification (r11 VERDICT item 7)
# --------------------------------------------------------------------------
#
# text_countmin_heavy_hitters pins ONE geometry (depth 3 x width 1024);
# the sketch CONTRACT — per key, Pr[overcount > k*N/width] <= k^-depth
# for any k > 1 (per row the expected collision mass is <= N/width, so
# Markov gives Pr[row overcount > k*N/width] <= 1/k; the depth rows use
# independent seeds, so the MIN violates only when every row does) — is
# worth a bound_held row PER geometry so a future hash-family change
# cannot silently degrade it. k = 2 keeps every comparison integer-exact
# (violation iff overcount*width > 2*N — no floats anywhere near the
# hash family), giving delta = 2^-depth; the depth-2 geometry is chosen
# BECAUSE it realizes violations on this corpus (measured 5 of 31 keys
# vs the 7 the bound allows, at sf0.01 AND sf0.1) — a certificate whose
# violation counter is live, not vacuously zero.
_CMB_GEOMETRIES: tuple[tuple[int, int], ...] = ((2, 64), (3, 64), (3, 256), (3, 1024))
_CMB_K = 2


def _cmb_oracle() -> str:
    from slr207_mapreduce_spark.functions.portable import (
        COUNTMIN_SEED0,
        countmin_hash_sql,
    )

    rows = []
    for depth, width in _CMB_GEOMETRIES:
        build = countmin_hash_sql("term", "h.i", width, COUNTMIN_SEED0)
        probe = countmin_hash_sql("t.term", "h.i", width, COUNTMIN_SEED0)
        rows.append(f"""
    SELECT 'countmin:d{depth}w{width}' AS estimator,
           CAST(SUM(CASE WHEN (est - cnt) * {width} > {_CMB_K} * (SELECT n FROM tot)
                         THEN 1 ELSE 0 END) AS DOUBLE) AS exact_value,
           CAST(1.0 AS DOUBLE) / {_CMB_K ** depth} AS bound,
           SUM(CASE WHEN (est - cnt) * {width} > {_CMB_K} * (SELECT n FROM tot)
                    THEN 1 ELSE 0 END) * {_CMB_K ** depth}
             <= (SELECT keys FROM tot) AS bound_held
    FROM (
      SELECT t.term, t.cnt, MIN(c.c) AS est
      FROM counts t, (SELECT UNNEST(range({depth})) AS i) h,
           (SELECT h.i AS h, {build} AS b, SUM(cnt) AS c
            FROM counts, (SELECT UNNEST(range({depth})) AS i) h
            GROUP BY 1, 2) c
      WHERE c.h = h.i AND c.b = {probe}
      GROUP BY t.term, t.cnt
    )""")
        # noqa: E501
    union = "\n    UNION ALL".join(rows)
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
      SELECT term, COUNT(*) AS cnt FROM toks WHERE length(term) > 0 GROUP BY term
    ),
    tot AS (SELECT SUM(cnt) AS n, COUNT(*) AS keys FROM counts)
    {union}
    """


@register(
    "estimator_countmin_bounds",
    oracle=_cmb_oracle(),
    doc="Count-min epsilon-delta certification at FOUR geometries (depths "
    "2-3 x widths 64/256/1024) over the document term counts: every "
    "distinct term is probed back through each sketch and the row "
    "reports how many violated the Markov bound overcount <= 2*N/width, "
    "with bound_held asserting the violating fraction <= 2^-depth. The "
    "depth-2 row realizes violations on this corpus (5 of 31 keys vs "
    "the 7 allowed) so the counter is live, not vacuously zero. All "
    "comparisons are integer (overcount*width vs 2*N), so the whole "
    "certificate — sketch, probes, violations — is exact on both "
    "engines; a hash-family or seed change that degrades the sketch "
    "becomes a driver hash mismatch, the estimator_error_report pattern "
    "applied to the one estimator whose internals ARE reproducible.",
    tags=("audit", "approx", "text", "sketch"),
)
def estimator_countmin_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.functions.portable import (
        COUNTMIN_SEED0,
        countmin_hash_rows,
    )

    d = load_table(spark, "documents", sf_dir)
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("keys")
    )

    out = None
    for depth, width in _CMB_GEOMETRIES:
        hash_rows = countmin_hash_rows(
            F.col("term"), depth=depth, width=width, seed0=COUNTMIN_SEED0
        )
        cm = (
            counts.select(F.explode(hash_rows).alias("hb"), "cnt")
            .groupBy(F.col("hb.h").alias("h"), F.col("hb.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
        )
        est = (
            counts.select("term", "cnt", F.explode(hash_rows).alias("hb"))
            .join(
                F.broadcast(cm),
                (F.col("hb.h") == F.col("h")) & (F.col("hb.b") == F.col("b")),
            )
            .groupBy("term", "cnt")
            .agg(F.min("c").alias("est"))
        )
        viol = (F.col("est") - F.col("cnt")) * F.lit(width) > F.lit(_CMB_K) * F.col("n")
        row = (
            est.crossJoin(F.broadcast(tot))
            .agg(
                F.sum(F.when(viol, 1).otherwise(0)).alias("violations"),
                F.first("keys").alias("keys"),
            )
            .select(
                F.lit(f"countmin:d{depth}w{width}").alias("estimator"),
                F.col("violations").cast("double").alias("exact_value"),
                (F.lit(1.0) / F.lit(_CMB_K ** depth)).alias("bound"),
                (F.col("violations") * F.lit(_CMB_K ** depth) <= F.col("keys")).alias(
                    "bound_held"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
