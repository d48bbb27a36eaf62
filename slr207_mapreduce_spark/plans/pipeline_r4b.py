"""Training-data pipeline widening, round 4 batch 2.

Four operators a production corpus build runs that were not yet first-class
here, each a MapReduce composition of the reference's primitives (tokenize
O5 / hash-partition O8 / reduce O9, WorkerSender.java:216,223-230,
ListenerReducer.java:123-139) re-expressed as DataFrame plans:

- pipeline_bloom_membership: a Bloom filter over corpus content hashes,
  built as a 4096-bit / 3-hash packed-word DataFrame (bit_or aggregation),
  probed by a new-batch side. THE approximate-membership gate for
  incremental ingest: at 100 TB the exact fingerprint anti-join of
  pipeline_incremental_dedup shuffles the batch against a multi-billion-row
  fingerprint table every day, while a Bloom filter of the corpus is a few
  GB of packed words that BROADCASTS — probe is shuffle-free, and only the
  maybe-present minority pays the exact join. The md5 hash family
  (functions/portable.py) makes the filter bit-reproducible in DuckDB, so
  even the false positives are oracle-checked.

- dedup_cdc_chunks: content-defined chunking (Rabin-style, the
  LBFS/storage-dedup construction): a chunk boundary falls after every
  token whose hash ≡ 0 (mod 8) — boundaries depend only on LOCAL content,
  so insertions shift chunk frames without re-aligning the whole document
  (the fixed-window weakness of dedup_substring_spans). Duplicated chunks
  across the corpus surface as repeated chunk hashes.

- text_lm_score: corpus-bigram language-model scoring (the CCNet-style
  quality gate): every doc scored by the mean conditional probability
  P(w2|w1) of its bigrams under the corpus LM, in e9 fixed-point integer
  arithmetic (floor((1e9·c(w1,w2)) / c(w1·))) — no log/float, so the score
  is bit-identical across engines and at any parallelism.

- pipeline_dedup_report: the per-source accounting every dedup run ships
  with — docs total/exact-dup/near-dup/kept and chars removed, composing
  the exact-fingerprint tier with the MinHash-LSH near tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import (
    portable_hash64_lane,
    portable_hash64_lane_sql,
    portable_hash64_sql,
)
from slr207_mapreduce_spark.operators.dedup import (
    cdc_chunk_table,
    minhash_lsh_candidates,
    minhash_lsh_sql,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

_NEW_SOURCE = "src0"

# --------------------------------------------------------------------------
# Bloom-filter membership gate
# --------------------------------------------------------------------------

_BLOOM_BITS = 4096  # m: demonstration size; the construction is m-agnostic
_BLOOM_K = 3  # hash functions: lanes (pair 90, lane 0/1) and (pair 91, lane 0)
_BLOOM_LANES = [(90, 0), (90, 1), (91, 0)]


@register(
    "pipeline_bloom_membership",
    oracle=f"""
    WITH meta AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
    corpus_bits AS (
      SELECT DISTINCT idx // 32 AS word_idx,
             CAST(1 AS BIGINT) << (idx % 32) AS mask
      FROM (
        {" UNION ALL ".join(
            f"SELECT ({portable_hash64_lane_sql('fp', p, l)}) % {_BLOOM_BITS} AS idx "
            f"FROM meta WHERE source <> '{_NEW_SOURCE}'"
            for p, l in _BLOOM_LANES
        )}
      )
    ),
    bloom AS (
      SELECT word_idx, bit_or(mask) AS bits FROM corpus_bits GROUP BY word_idx
    ),
    probe AS (
      SELECT doc_id, fp,
             unnest([{", ".join(
                f"({portable_hash64_lane_sql('fp', p, l)}) % {_BLOOM_BITS}"
                for p, l in _BLOOM_LANES
             )}]) AS idx
      FROM meta WHERE source = '{_NEW_SOURCE}'
    ),
    probed AS (
      SELECT p.doc_id, p.fp,
             CASE WHEN b.bits IS NOT NULL
                   AND (b.bits >> (p.idx % 32)) & 1 = 1 THEN 1 ELSE 0 END AS hit
      FROM probe p LEFT JOIN bloom b ON b.word_idx = p.idx // 32
    ),
    verdict AS (
      SELECT doc_id, fp, SUM(hit) = {_BLOOM_K} AS bloom_maybe
      FROM probed GROUP BY doc_id, fp
    )
    SELECT v.doc_id, v.bloom_maybe,
           EXISTS (SELECT 1 FROM meta c
                   WHERE c.source <> '{_NEW_SOURCE}' AND c.fp = v.fp)
             AS is_exact_dup
    FROM verdict v
    """,
    doc="Bloom-filter corpus-membership gate: a 4096-bit, 3-hash Bloom "
    "filter over corpus content fingerprints, stored as packed 32-bit words "
    "built with a bit_or aggregation; the 'src0' batch probes it. Output "
    "carries the exact-membership verdict alongside, so the filter's "
    "zero-false-negative guarantee and its (deterministic, md5-family) "
    "false positives are both oracle-checked. At scale the filter "
    "broadcasts and the probe is shuffle-free; only bloom_maybe rows pay "
    "the exact fingerprint join.",
    tags=("pipeline", "dedup", "bloom", "incremental"),
)
def pipeline_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    corpus = meta.where(F.col("source") != _NEW_SOURCE)
    batch = meta.where(F.col("source") == _NEW_SOURCE)

    def bit_indices(side: DataFrame) -> DataFrame:
        idxs = F.array(
            *[
                portable_hash64_lane(F.col("fp"), p, l) % _BLOOM_BITS
                for p, l in _BLOOM_LANES
            ]
        )
        return side.select("doc_id", "fp", F.explode(idxs).alias("idx"))

    # Build: one narrow shuffle on word_idx (<=128 groups at m=4096; at a
    # real m the word table is still tiny next to the corpus). Words pack
    # 32 bits each so the shift never touches the int64 sign bit.
    bloom = (
        bit_indices(corpus)
        .select(
            F.shiftright("idx", 5).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )

    # Probe: broadcast the packed words; a doc is maybe-present iff all K
    # probed bits are set. No corpus-side shuffle at all.
    probed = (
        bit_indices(batch)
        .join(F.broadcast(bloom), F.shiftright("idx", 5) == F.col("word_idx"), "left")
        .select(
            "doc_id",
            "fp",
            F.when(
                F.col("bits").isNotNull()
                & (F.expr("shiftright(bits, CAST(idx % 32 AS INT)) & 1") == 1),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "fp")
        .agg((F.sum("hit") == _BLOOM_K).alias("bloom_maybe"))
    )

    exact = corpus.select("fp").distinct().withColumn("__in_corpus", F.lit(1))
    return (
        probed.join(F.broadcast(exact), "fp", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            F.col("__in_corpus").isNotNull().alias("is_exact_dup"),
        )
    )


# --------------------------------------------------------------------------
# Content-defined chunking dedup
# --------------------------------------------------------------------------

_CDC_SEED = 77  # hash-family seed for the boundary test
_CDC_MOD = 8  # boundary after tokens whose hash % 8 == 0 -> ~8-token chunks


@register(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, u.pos AS pos, u.tok AS tok
      FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' '),
                                     (t, i) -> {{'pos': i, 'tok': t}})) AS u
        FROM documents
      )
    ),
    flagged AS (
      SELECT doc_id, pos, tok,
             CASE WHEN ({portable_hash64_sql('tok', _CDC_SEED)}) % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS bflag
      FROM tk
    ),
    framed AS (
      SELECT doc_id, pos, tok,
             COALESCE(SUM(bflag) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      FROM framed GROUP BY doc_id, chunk_id
    )
    SELECT chunk_hash,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM chunks
    GROUP BY chunk_hash
    HAVING COUNT(*) > 1
    """,
    doc="Content-defined chunking (Rabin/LBFS-style storage dedup): chunk "
    "boundaries fall after tokens whose portable hash % 8 == 0 — local "
    "content decides the frame, so an insertion shifts boundaries instead "
    "of re-aligning every downstream window (the fixed-window weakness of "
    "dedup_substring_spans). Emits chunk hashes duplicated across the "
    "corpus with occurrence/doc counts. Plan: doc-keyed window for the "
    "boundary prefix-sum, then chunk assembly and a hash-keyed count — "
    "only (hash, count) rows cross the final shuffle.",
    tags=("dedup", "cdc", "chunking"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    chunks = cdc_chunk_table(docs, seed=_CDC_SEED, mod=_CDC_MOD)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_occurrences") > 1)
    )


# --------------------------------------------------------------------------
# Corpus-bigram LM document scoring
# --------------------------------------------------------------------------


@register(
    "text_lm_score",
    oracle="""
    WITH tk AS (
      SELECT doc_id, u.pos AS pos, u.tok AS tok
      FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' '),
                                     (t, i) -> {'pos': i, 'tok': t})) AS u
        FROM documents
      )
    ),
    bg AS (
      SELECT doc_id, tok AS w1,
             LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tk
    ),
    doc_bigrams AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM doc_bigrams GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY w1),
    scored AS (
      SELECT d.doc_id,
             (1000000000 * c2.n2) // c1.n1 AS p_e9
      FROM doc_bigrams d
      JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
      JOIN c1 ON c1.w1 = d.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(p_e9) AS BIGINT) // COUNT(*) AS lm_score_e9
    FROM scored GROUP BY doc_id
    """,
    doc="Corpus-bigram LM quality score (CCNet-shape gate): each doc's mean "
    "conditional bigram probability P(w2|w1) under the corpus LM, in e9 "
    "fixed-point — floor((1e9*c(w1,w2)) DIV c(w1,*)) per bigram, integer "
    "mean per doc. No float, no log: bit-identical across engines and at "
    "any parallelism. Plan: one doc-keyed window builds bigrams once; "
    "counts re-aggregate from the bigram table (c1 derives from c2 — no "
    "second corpus pass); scoring joins are term-keyed.",
    tags=("text", "lm", "quality"),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.skew import parallelize_narrow_scan

    # Tokenization (posexplode of up-to-100k-token docs) is scan-stage
    # work; hash-partitioning by doc_id first makes it full-width AND the
    # bigram window reuses the exchange (no second shuffle on doc_id).
    docs = parallelize_narrow_scan(
        load_table(spark, "documents", sf_dir), by="doc_id"
    )
    tk = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tk.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .where(F.col("w2").isNotNull())
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select("doc_id", F.expr("(1000000000L * n2) DIV n1").alias("p_e9"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("SUM(p_e9) DIV COUNT(1)").alias("lm_score_e9"),
    )


# --------------------------------------------------------------------------
# Per-source dedup accounting report
# --------------------------------------------------------------------------

_NEAR_EST = 0.5


@register(
    "pipeline_dedup_report",
    oracle=f"""
    WITH pairs AS ({minhash_lsh_sql(num_hashes=6, band_size=2, shingle_n=3)}),
    meta AS (
      SELECT doc_id, source, n_chars, md5(text) AS fp FROM documents
    ),
    canon AS (SELECT fp, MIN(doc_id) AS keeper FROM meta GROUP BY fp),
    near_docs AS (
      SELECT DISTINCT doc_b AS doc_id FROM pairs WHERE est_jaccard >= {_NEAR_EST}
    ),
    classified AS (
      SELECT m.doc_id, m.source, m.n_chars,
             CASE WHEN m.doc_id <> c.keeper THEN 'exact_dup'
                  WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'kept' END AS verdict
      FROM meta m
      JOIN canon c ON c.fp = m.fp
      LEFT JOIN near_docs nd ON nd.doc_id = m.doc_id
    )
    SELECT source,
           COUNT(*) AS docs_total,
           COUNT(*) FILTER (verdict = 'exact_dup') AS docs_exact_dup,
           COUNT(*) FILTER (verdict = 'near_dup') AS docs_near_dup,
           COUNT(*) FILTER (verdict = 'kept') AS docs_kept,
           COALESCE(CAST(SUM(n_chars) FILTER (verdict <> 'kept') AS BIGINT), 0)
             AS chars_removed
    FROM classified GROUP BY source
    """,
    doc="The accounting table every dedup run ships with: per source, docs "
    "total / removed by the exact-fingerprint tier (non-canonical members "
    "of each content-hash group, keeper = min doc_id) / removed by the "
    "MinHash-LSH near tier (docs appearing as the higher id of a pair at "
    "est_jaccard >= 0.5, exact tier takes precedence) / kept, plus chars "
    "removed. Composes dedup_exact + dedup_minhash_lsh into the "
    "user-facing report; only (fp|pair, id) rows ever shuffle.",
    tags=("pipeline", "dedup", "report"),
)
def pipeline_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    meta = d.select("doc_id", "source", "n_chars", F.md5("text").alias("fp"))
    canon = meta.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    near = (
        minhash_lsh_candidates(d, num_hashes=6, band_size=2, shingle_n=3)
        .where(F.col("est_jaccard") >= _NEAR_EST)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__near", F.lit(1))
    )
    classified = (
        meta.join(canon, "fp")
        .join(near, "doc_id", "left")
        .select(
            "source",
            "n_chars",
            F.when(F.col("doc_id") != F.col("keeper"), "exact_dup")
            .when(F.col("__near").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("verdict"),
        )
    )
    v = F.col("verdict")
    return classified.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.count(F.when(v == "exact_dup", 1)).alias("docs_exact_dup"),
        F.count(F.when(v == "near_dup", 1)).alias("docs_near_dup"),
        F.count(F.when(v == "kept", 1)).alias("docs_kept"),
        F.coalesce(
            F.sum(F.when(v != "kept", F.col("n_chars"))), F.lit(0)
        ).alias("chars_removed"),
    )
