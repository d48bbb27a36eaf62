"""Training-data pipeline widening, round 4.

- pipeline_incremental_dedup: the incremental-ingest shape every production
  corpus build runs daily — a NEW batch of documents deduplicated against
  the EXISTING corpus (not against itself): drop exact copies (content-hash
  anti-join), then drop near-duplicates (MinHash-LSH candidates that CROSS
  the batch/corpus boundary at est_jaccard >= 0.5). Reference lineage: the
  same O5 fan-out + O8 hash-partition + O9 reduce as wordcount, applied as
  set difference.

  Scale design: the new batch is orders of magnitude smaller than the
  corpus, so its signature/band table broadcasts; the corpus side is
  bucket-keyed by (band, bkey) — on a real lake the corpus band table is
  precomputed once and stored bucketed (sources/sinks.py bucketBy), so a
  daily ingest touches only matching buckets and the corpus is NEVER
  re-shuffled per batch. Here both sides derive from one documents table
  (source = 'src0' plays the new batch) so the demonstration stays
  self-contained and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.dedup import minhash_lsh_candidates, minhash_lsh_sql
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

_NEW_SOURCE = "src0"
_NEAR_DUP_EST = 0.5


@register(
    "pipeline_incremental_dedup",
    oracle=f"""
    WITH pairs AS ({minhash_lsh_sql(num_hashes=6, band_size=2, shingle_n=3)}),
    meta AS (SELECT doc_id, source, md5(text) AS fingerprint FROM documents),
    newb AS (SELECT * FROM meta WHERE source = '{_NEW_SOURCE}'),
    corpus AS (SELECT * FROM meta WHERE source <> '{_NEW_SOURCE}'),
    exact_dup AS (
      SELECT DISTINCT n.doc_id FROM newb n JOIN corpus c USING (fingerprint)
    ),
    cross_near AS (
      SELECT DISTINCT n.doc_id
      FROM pairs p
      JOIN newb n ON n.doc_id IN (p.doc_a, p.doc_b)
      JOIN corpus c ON c.doc_id IN (p.doc_a, p.doc_b)
      WHERE p.est_jaccard >= {_NEAR_DUP_EST}
    )
    SELECT doc_id, fingerprint FROM newb
    WHERE doc_id NOT IN (SELECT doc_id FROM exact_dup)
      AND doc_id NOT IN (SELECT doc_id FROM cross_near)
    """,
    doc="Incremental ingest dedup: the 'src0' batch deduplicated against "
    "the rest of the corpus — exact copies out via content-hash LEFT ANTI "
    "join, near-duplicates out via MinHash-LSH candidates that cross the "
    "batch/corpus boundary (est_jaccard >= 0.5). Batch-internal duplicates "
    "are deliberately KEPT (in-batch dedup is dedup_exact/dedup_minhash_lsh;"
    " this operator is the corpus-membership gate). At scale the batch side "
    "broadcasts and the corpus band table is precomputed + bucket-stored, "
    "so daily ingest never reshuffles the corpus.",
    tags=("pipeline", "dedup", "incremental"),
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    meta = d.select("doc_id", "source", F.md5("text").alias("fingerprint"))
    newb = meta.where(F.col("source") == _NEW_SOURCE)
    corpus = meta.where(F.col("source") != _NEW_SOURCE)

    # exact tier: content-hash anti-join (batch side is the small side)
    survivors = newb.join(
        corpus.select("fingerprint").distinct(), "fingerprint", "left_anti"
    )

    # near tier: LSH candidates crossing the batch/corpus boundary. The
    # pair list is computed once over the union (single corpus scan); the
    # boundary test is two broadcast EQUI-joins tagging each endpoint with
    # batch membership (an OR-of-equalities join would plan as a
    # BroadcastNestedLoop over every pair — O(pairs x batch), wrong at
    # scale). A pair crosses iff exactly one endpoint is in the batch; the
    # in-batch endpoint is the near-dup to drop.
    pairs = minhash_lsh_candidates(d, num_hashes=6, band_size=2, shingle_n=3).where(
        F.col("est_jaccard") >= _NEAR_DUP_EST
    )
    na = newb.select(F.col("doc_id").alias("a_nid"))
    nb = newb.select(F.col("doc_id").alias("b_nid"))
    tagged = pairs.join(
        F.broadcast(na), F.col("doc_a") == F.col("a_nid"), "left"
    ).join(F.broadcast(nb), F.col("doc_b") == F.col("b_nid"), "left")
    a_in, b_in = F.col("a_nid").isNotNull(), F.col("b_nid").isNotNull()
    near_new = (
        tagged.where(a_in != b_in)
        .select(F.when(a_in, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_id"))
        .distinct()
    )

    return survivors.join(near_new, "doc_id", "left_anti").select(
        "doc_id", "fingerprint"
    )
