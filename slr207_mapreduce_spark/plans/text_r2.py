"""Corpus-level text profiling, round 2.

text_profile_by_source fuses the per-document heuristics (token counts,
length, digit ratio — the text_quality/text_token_count family) into ONE
scan + ONE aggregation keyed by (source, lang): the corpus-triage report a
training-data pipeline runs before any filtering decision. At 100 TB this
is the cheapest possible shape — every per-doc feature is a catalyst
column expression computed inside the scan stage (no Python, no
pre-shuffle), and the aggregate is partial→final over a tiny key domain,
so the shuffle carries one row per (source, lang) per task.

Counting integers (token counts, char counts) makes every SUM exact; the
two ratio outputs are single IEEE divisions of exact operands — the
SCALE.md exactness-under-parallelism invariant without DECIMAL anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.text import tokens_ws
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@register(
    "text_profile_by_source",
    oracle=r"""
    WITH feats AS (
      SELECT source, lang,
             len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS n_tokens,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
      FROM documents
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens,
           CAST(SUM(n_digits) AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE) AS digit_ratio,
           CAST(count(*) FILTER (WHERE n_tokens < 10) AS BIGINT) AS n_short,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM feats
    GROUP BY source, lang
    """,
    doc="Corpus triage profile per (source, lang): doc/token/char totals, "
    "short-doc counts, digit ratio — the text_quality feature set fused "
    "into one scan + one tiny-key aggregation. Integer sums are exact; "
    "ratios are one IEEE division each, so the report is bit-stable at "
    "any parallelism. The token-budget planning query for a 100 TB "
    "pre-training corpus.",
    tags=("text", "pipeline"),
)
def text_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    feats = d.select(
        "source",
        "lang",
        F.size(tokens_ws("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("n_digits"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        feats.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_digits").alias("_digits"),
            F.count_if(F.col("n_tokens") < 10).alias("n_short"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_tokens",
            "total_chars",
            (dbl("total_tokens") / dbl("n_docs")).alias("avg_tokens"),
            (dbl("_digits") / dbl("total_chars")).alias("digit_ratio"),
            "n_short",
            "min_tokens",
            "max_tokens",
        )
    )


@register(
    "text_bpe_pair_counts",
    oracle=r"""
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS w
      FROM documents
    ),
    freqs AS (
      SELECT w, COUNT(*) AS f FROM words WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(w)), i -> w[i] || w[i+1])) AS pair, f
      FROM freqs
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair ASC
    LIMIT 20
    """,
    doc="BPE tokenizer training, merge step 1: adjacent-character pair "
    "counts weighted by word frequency — argmax(pair) is the first BPE "
    "merge. EXACTLY the reference's word count (O5 tokenize -> O9 count, "
    "WorkerSender.java:216 / ListenerReducer.java:123-139) composed with "
    "a second explode+reduce over the DISTINCT-word table: the heavy "
    "corpus pass collapses to unique words first (Zipf: ~sqrt-ish "
    "compression), so the per-character explosion runs on the vocabulary, "
    "not the corpus — at 100 TB that ordering is the difference between "
    "exploding 1e12 tokens and 1e7 vocabulary entries. Top-20 via "
    "TakeOrderedAndProject with the O11 ordering discipline.",
    tags=("text", "pipeline"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    words = d.select(F.explode(tokens_ws("text")).alias("w")).where(F.length("w") >= 2)
    freqs = words.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    # substr with a COLUMN start index needs the expr form (F.substring
    # only accepts int positions).
    pairs = freqs.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> concat(substr(w, i, 1), substr(w, i + 1, 1)))")
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@register(
    "text_inverted_index",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS term
      FROM documents WHERE doc_id < 120
    ),
    postings AS (
      SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS posting_list,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM postings
    GROUP BY term
    HAVING COUNT(*) >= 3
    """,
    doc="Inverted index build: (term, doc, tf) postings from one "
    "explode+count (the reference's word count keyed by (term, doc) — "
    "O5+O9), then per-term document-frequency and a SORTED posting list "
    "(serialized; sort makes the aggregation order-independent). The "
    "foundation of text retrieval; at 100 TB the posting lists are "
    "written bucketed by term so lookups partition-prune. df >= 3 keeps "
    "the checked output compact.",
    tags=("text",),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 120)
    toks = d.select("doc_id", F.explode(tokens_ws("text")).alias("term"))
    postings = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "posting_list"
            ),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("df") >= 3)
    )


@register(
    "text_doc_similarity_sparse",
    # Pairwise doc similarity THROUGH the inverted index: docs meet only on
    # shared terms, so the join is Σ_term df(term)^2 pairs, never N^2.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS term
      FROM documents WHERE doc_id < 120
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot_tf,
           CAST(COUNT(*) AS BIGINT) AS shared_terms
    FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    ORDER BY dot_tf DESC, doc_a ASC, doc_b ASC
    LIMIT 25
    """,
    doc="Sparse document similarity via the inverted index: tf vectors "
    "meet through a self-join ON TERM (the classic MapReduce pairwise-"
    "similarity construction — cost Σ df² over terms, never N² over "
    "docs), integer tf dot products (exact, map-side combinable), top-25 "
    "pairs. The lexical counterpart of the dense-embedding ANN family; "
    "at 100 TB the high-df stopword terms dominate Σ df² and get pruned "
    "first (df-cap), exactly like dropping degenerate LSH buckets.",
    tags=("text", "similarity"),
)
def text_doc_similarity_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 120)
    toks = d.select("doc_id", F.explode(tokens_ws("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    a = tf.select(
        F.col("doc_id").alias("doc_a"), F.col("term"), F.col("tf").alias("tf_a")
    )
    b = tf.select(
        F.col("doc_id").alias("doc_b"),
        F.col("term").alias("term_b"),
        F.col("tf").alias("tf_b"),
    )
    return (
        a.join(b, (F.col("term") == F.col("term_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot_tf"),
            F.count(F.lit(1)).alias("shared_terms"),
        )
        .orderBy(F.desc("dot_tf"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(25)
    )


@register(
    "text_keyword_tfidf_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                        t -> length(t) > 0)) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * CAST(FLOOR(1000000000.0 * n.n_docs / df.df) AS BIGINT)
               AS score_e9,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * CAST(FLOOR(1000000000.0 * n.n_docs / df.df) AS BIGINT) DESC,
                                         tf.term ASC) AS rank
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score_e9, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
    doc="Keyword extraction: top-3 terms per document by tf-idf with a "
    "log-free fixed-point idf surrogate floor(1e9*N/df) — monotone in "
    "true idf, integer-exact across engines (same stance as text_bm25). "
    "Plan: tf agg -> df agg on the tf relation (no second corpus scan) "
    "-> idf map joined back on term -> per-doc top-3 window. The df "
    "side is tiny after aggregation and broadcasts; the only big "
    "shuffles are the two aggs. This is the per-doc keyword/tag stage "
    "of a corpus indexing pipeline.",
    tags=("text", "tfidf"),
)
def text_keyword_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(tokens_ws("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    idf = df.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(F.lit(1000000000.0) * F.col("n_docs") / F.col("df"))
        .cast("long")
        .alias("idf_e9"),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.col("idf_e9")).alias("score_e9"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e9"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "score_e9", "rank")
    )


@register(
    "text_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         t -> length(t) > 0) AS ws
      FROM documents
    ),
    bigrams AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2
      FROM toks, UNNEST(range(1, len(ws))) AS t(i)
    ),
    pair_c AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
      FROM bigrams GROUP BY w1, w2
    ),
    uni_c AS (
      SELECT w1, CAST(SUM(c_pair) AS BIGINT) AS c_w1 FROM pair_c GROUP BY w1
    )
    SELECT p.w1, p.w2, p.c_pair, u.c_w1,
           CAST(FLOOR(1000000000.0 * p.c_pair / u.c_w1) AS BIGINT) AS prob_e9
    FROM pair_c p JOIN uni_c u USING (w1)
    ORDER BY p.c_pair DESC, p.w1 ASC, p.w2 ASC
    LIMIT 50
    """,
    doc="Count-based bigram language model estimation: in-document "
    "adjacent-token pairs (never across doc boundaries), conditional "
    "probability P(w2|w1) = c(w1,w2)/c(w1) in 1e9 fixed point — the "
    "n-gram statistics stage of LM data work (KenLM-style counting). "
    "The unigram denominators come from re-aggregating the pair counts "
    "(no second corpus pass), and at corpus scale both aggs partial-"
    "combine map-side; top-50 is TakeOrderedAndProject. Same zip-"
    "the-array-with-its-tail formulation both engines.",
    tags=("text", "ngram"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    ws = tokens_ws("text")
    pairs = d.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_c = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_pair")
    )
    uni_c = pair_c.groupBy("w1").agg(F.sum("c_pair").cast("long").alias("c_w1"))
    return (
        pair_c.join(uni_c, "w1")
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_w1",
            F.floor(F.lit(1000000000.0) * F.col("c_pair") / F.col("c_w1"))
            .cast("long")
            .alias("prob_e9"),
        )
        .orderBy(F.desc("c_pair"), F.asc("w1"), F.asc("w2"))
        .limit(50)
    )
