"""Training-data-pipeline queries over the documents table — the corpus
curation ops a 100 TB pre-training pipeline runs between raw crawl and
tokenizer: per-domain caps, deterministic train/val/test splits, sampling
(exact-N stratified and stateless fractional), mixture re-weighting,
PII-style redaction, benchmark decontamination, and quantile-based quality
filtering.

These generalize the reference's map-side filter/encode stages
(WorkerSender.java:129-148,221 — select/drop per record) to the policies
real corpus builders need. Everything is deterministic (portable md5 hash,
no rand()) so the DuckDB oracle hash-matches bitwise.

Scale notes (per query, see also SCALE.md):
- hash-based ops (split / fractional sample / mixture) are stateless row
  maps — no shuffle, perfectly parallel, the 100 TB path.
- window-based ops (domain cap, stratified sample) shuffle once on the
  stratum key; rank-limit pushes through AQE. Skewed strata (one giant
  domain) are the known hazard — the cap itself bounds the output, and a
  two-pass count+filter rewrite handles pathological skew.
- decontamination is a shingle explode + semi join; the benchmark side is
  tiny (broadcast), so the big side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from slr207_mapreduce_spark.functions.portable import (
    portable_hash64,
    portable_hash64_sql,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

# Deterministic per-doc bucket in [0, 100): the one hash every split /
# sample / mixture policy below keys on. Seed 42 picks the hash family.
_BUCKET = 100


def _doc_bucket() -> F.Column:
    return portable_hash64(F.col("doc_id").cast("string"), seed=42) % _BUCKET


def _doc_bucket_sql() -> str:
    return f"{portable_hash64_sql('CAST(doc_id AS VARCHAR)', seed=42)} % {_BUCKET}"


@register(
    "pipeline_domain_cap",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(rn AS BIGINT) AS rank_in_source
    FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 5
    ORDER BY source, rank_in_source
    """,
    doc="Per-domain cap: keep at most 5 documents per source, preferring "
    "longer ones (n_chars DESC, doc_id tie-break → total order). The "
    "anti-overrepresentation op every crawl pipeline applies per domain. "
    "One shuffle on source; the rank filter cuts inside the window stage "
    "so only 5 rows per domain survive to the sort.",
    tags=("pipeline", "window"),
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).cast("long").alias("rank_in_source"),
        )
        .where(F.col("rank_in_source") <= 5)
        .orderBy("source", "rank_in_source")
    )


@register(
    "pipeline_train_split",
    oracle=f"""
    SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM (SELECT doc_id, lang, n_chars, ({_doc_bucket_sql()}) % 10 AS b FROM documents)
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic train/val/test split by content-stable hash "
    "(md5(doc_id) mod 10 → 80/10/10) with per-split accounting. Stateless "
    "row map + one tiny aggregation — the split assignment itself never "
    "shuffles, so it composes with any downstream op at 100 TB.",
    tags=("pipeline", "hash"),
)
def pipeline_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    b = (_doc_bucket() % 10).alias("b")
    split = (
        F.when(F.col("b") < 8, "train").when(F.col("b") == 8, "val").otherwise("test")
    )
    return (
        d.select("lang", "n_chars", b)
        .select(split.alias("split"), "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("split")
    )


@register(
    "pipeline_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_doc_bucket_sql()}, doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 5
    ORDER BY lang, sample_rank
    """,
    doc="Exact-N stratified sample: 5 documents per language, chosen by "
    "deterministic hash order (pseudo-random but reproducible; doc_id "
    "tie-break). The eval-set builder shape. One shuffle on the stratum "
    "key; for the scale path (fractions of huge strata) see "
    "pipeline_fractional_sample, which needs no window at all.",
    tags=("pipeline", "window"),
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(_doc_bucket().asc(), F.asc("doc_id"))
    return (
        d.select(
            "doc_id", "lang", F.row_number().over(w).cast("long").alias("sample_rank")
        )
        .where(F.col("sample_rank") <= 5)
        .orderBy("lang", "sample_rank")
    )


@register(
    "pipeline_fractional_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (SELECT doc_id, lang, source, {_doc_bucket_sql()} AS b FROM documents)
    WHERE b < 10
    ORDER BY doc_id
    """,
    doc="Stateless 10% Bernoulli-style sample: keep rows whose stable hash "
    "bucket < 10. No shuffle, no state, no rand() — the same rows are "
    "kept on every run and on any cluster size, which is what makes "
    "pipeline reruns and incremental backfills reproducible at 100 TB.",
    tags=("pipeline", "hash"),
)
def pipeline_fractional_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return (
        d.select("doc_id", "lang", "source", _doc_bucket().alias("b"))
        .where(F.col("b") < 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# Mixture policy: language → keep-percentage. Down-weights the dominant
# language and keeps the tail — the corpus re-balancing op.
_MIXTURE = {"en": 50, "de": 90, "es": 90, "fr": 90, "zh": 90}
_MIXTURE_DEFAULT = 100


@register(
    "pipeline_mixture_reweight",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM (
      SELECT lang, n_chars, {_doc_bucket_sql()} AS b,
             CASE {" ".join(f"WHEN lang = '{lg}' THEN {pct}" for lg, pct in sorted(_MIXTURE.items()))}
                  ELSE {_MIXTURE_DEFAULT} END AS keep_pct
      FROM documents
    )
    WHERE b < keep_pct
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Dataset-mixture re-weighting: per-language keep fractions "
    "(en 50%, others 90%) applied via the stable hash bucket — "
    "deterministic subsampling to a target mixture, then per-language "
    "accounting. Same stateless-map scale profile as the fractional "
    "sample; the policy table is a literal CASE, so no join at all.",
    tags=("pipeline", "hash"),
)
def pipeline_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    keep = F.lit(_MIXTURE_DEFAULT)
    for lg, pct in sorted(_MIXTURE.items(), reverse=True):
        keep = F.when(F.col("lang") == lg, pct).otherwise(keep)
    return (
        d.select("lang", "n_chars", _doc_bucket().alias("b"), keep.alias("keep_pct"))
        .where(F.col("b") < F.col("keep_pct"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


_REDACT_PATTERN = r"\b(customer|key|value)\b"


@register(
    "pipeline_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(text, '{_REDACT_PATTERN}', '<X>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS BIGINT) AS n_redactions
    FROM documents
    ORDER BY doc_id
    """,
    doc="Regex scrubbing (the PII-redaction shape: emails/phones/IDs in "
    "production, a fixed term set on this vocabulary): global "
    "regexp_replace plus a redaction count per document. Pure row map, "
    "JVM-side regex — no shuffle. DuckDB needs the explicit 'g' flag to "
    "match Spark's replace-all default.",
    tags=("pipeline", "text"),
)
def pipeline_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    # F.lit pattern, not F.expr SQL: the SQL parser would eat the \b.
    pat = F.lit(_REDACT_PATTERN)
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), pat, F.lit("<X>")).alias("redacted"),
        F.size(F.regexp_extract_all("text", pat, 0)).cast("long").alias("n_redactions"),
    ).orderBy("doc_id")


@register(
    "pipeline_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
               AS shingle
      FROM toks
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0),
    dirty AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.shingle = b.shingle
      WHERE s.doc_id % 37 <> 0
    )
    SELECT d.doc_id, d.lang, (dirty.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN dirty ON d.doc_id = dirty.doc_id
    WHERE d.doc_id % 37 <> 0
    ORDER BY d.doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing any "
    "word 5-gram with the held-out benchmark set (here: doc_id % 37 = 0 "
    "stands in for the eval corpus). Shingle explode → distinct benchmark "
    "shingle set → semi join. The benchmark side is small by construction "
    "(evals are MBs, corpora are TBs) so it broadcasts and the corpus "
    "side's explode never shuffles; the final distinct is on doc_id only.",
    tags=("pipeline", "ngram", "join"),
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    five_gram = (
        "CASE WHEN size(t) < 5 THEN array() "
        "ELSE transform(sequence(1, size(t) - 4), "
        "i -> concat_ws(' ', t[i-1], t[i], t[i+1], t[i+2], t[i+3])) END"
    )
    sh = d.select("doc_id", F.split("text", " ").alias("t")).select(
        "doc_id", F.explode(F.expr(five_gram)).alias("shingle")
    )
    bench = (
        sh.where(F.col("doc_id") % 37 == 0).select("shingle").distinct()
    )
    dirty = (
        sh.where(F.col("doc_id") % 37 != 0)
        .join(F.broadcast(bench), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_dirty", F.lit(True))
    )
    return (
        d.where(F.col("doc_id") % 37 != 0)
        .join(dirty, "doc_id", "left_outer")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("is_dirty"), F.lit(False)).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_quality_quantile",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(n_chars AS DOUBLE) >= (
      SELECT quantile_cont(n_chars, 0.5) FROM documents)
    ORDER BY doc_id
    """,
    doc="Quantile-gated quality filter: keep documents at or above the "
    "corpus median length — the 'drop the bottom half by quality score' "
    "op. The median is exact (interpolated midpoint of two integers is an "
    "exact IEEE double, so Spark percentile == DuckDB quantile_cont "
    "bitwise). Scalar subquery broadcasts; at 100 TB swap the exact "
    "percentile for approx_percentile with a pinned accuracy and the "
    "plan is otherwise unchanged.",
    tags=("pipeline", "subquery"),
)
def pipeline_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    med = d.agg(F.expr("percentile(n_chars, 0.5)").alias("med"))
    return (
        d.join(F.broadcast(med), F.col("n_chars").cast("double") >= F.col("med"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "pipeline_fuzzy_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    doc="Fuzzy string matching (record linkage / near-dup entity names): "
    "distinct part names self-joined within edit distance ≤ 3, blocked on "
    "the first character so candidate pairs meet via an equi-join on the "
    "block key instead of an all-pairs cross product. The blocking-key "
    "pattern is the scale lever: swap the first-char block for length "
    "bands or q-gram buckets to trade recall vs candidate count; "
    "levenshtein itself is a JVM-side builtin on both engines.",
    tags=("pipeline", "text", "join"),
)
def pipeline_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 1).alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 1).alias("blk"),
    )
    return (
        a.join(b, ["blk"])
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 3)
        .orderBy("name_a", "name_b")
    )
