"""Text-analysis queries over the documents table (north-star family;
operators in slr207_mapreduce_spark/operators/text.py): language ID,
quality scoring, token counting, fingerprinting, tf/df term stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.text import (
    BPE_ISH_REGEX,
    LANGS,
    lang_hit_count,
    lang_hit_count_sql,
    predicted_lang,
    predicted_lang_sql,
    rolling_fingerprint,
    rolling_fingerprint_sql,
    tokens_ws,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang,
           {", ".join(f"{lang_hit_count_sql('text', lg)} AS {lg}_hits" for lg in LANGS)},
           {predicted_lang_sql({lg: lang_hit_count_sql('text', lg) for lg in LANGS})} AS predicted_lang
    FROM documents
    """,
    doc="Stopword-hit language ID: per-language hit counts + deterministic "
    "argmax (ties → lexicographically smallest code). Pure column "
    "expressions — one scan, no shuffle.",
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    hits = {lg: lang_hit_count("text", lg) for lg in LANGS}
    cols = [F.col("doc_id"), F.col("lang")]
    cols += [hits[lg].alias(f"{lg}_hits") for lg in LANGS]
    cols.append(predicted_lang(hits).alias("predicted_lang"))
    return d.select(*cols)


@register(
    "text_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars_actual,
             len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS n_tokens,
             length(regexp_replace(text, '[^!.,;:?]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
             len(list_filter(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0),
                 t -> list_contains(['the','and','of','to','in','a','is'], t))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars_actual AS BIGINT) AS n_chars_actual,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars_actual AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
           CAST(n_punct AS DOUBLE) / CAST(n_chars_actual AS DOUBLE) AS punct_ratio,
           CAST(n_digits AS DOUBLE) / CAST(n_chars_actual AS DOUBLE) AS digit_ratio,
           CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
           CASE WHEN n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.01
                THEN 'good' WHEN n_tokens >= 10 THEN 'fair' ELSE 'poor' END AS quality_band
    FROM t
    """,
    doc="Heuristic quality scoring: length, punct/digit/stopword ratios and "
    "a banded verdict — the pre-training corpus filter shape.",
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    stop = F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "in", "a", "is")])
    t = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(tokens_ws("text")).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace("text", "[^!.,;:?]", "")).cast("long").alias("n_punct"),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long").alias("n_digits"),
        F.size(
            F.filter(tokens_ws("text"), lambda tok: F.array_contains(stop, tok))
        ).cast("long").alias("n_stop"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    stop_ratio = dbl("n_stop") / dbl("n_tokens")
    return t.select(
        "doc_id",
        "n_chars_actual",
        "n_tokens",
        (dbl("n_chars_actual") / dbl("n_tokens")).alias("chars_per_token"),
        (dbl("n_punct") / dbl("n_chars_actual")).alias("punct_ratio"),
        (dbl("n_digits") / dbl("n_chars_actual")).alias("digit_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.when((F.col("n_tokens") >= 20) & (stop_ratio > 0.01), "good")
        .when(F.col("n_tokens") >= 10, "fair")
        .otherwise("poor")
        .alias("quality_band"),
    )


@register(
    "text_token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS BIGINT) AS bpe_ish_tokens,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="Token counting two ways: whitespace tokens and a BPE-ish "
    "pre-tokenizer regex (word pieces | numbers | single symbols) — the "
    "token-budget estimator for training-data pipelines.",
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.size(tokens_ws("text")).cast("long").alias("ws_tokens"),
        # F.lit pattern, not an F.expr SQL string: the SQL parser would eat
        # the backslash in \s and silently change the character class.
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_REGEX), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("long").alias("n_bytes"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS content_md5,
           {rolling_fingerprint_sql('text')} AS rolling_hash
    FROM documents
    """,
    doc="Document fingerprinting: content md5 + order-sensitive polynomial "
    "rolling hash over tokens (acc = (acc*131 + h) mod 2^31-1) — the "
    "incremental-dedup key family.",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        rolling_fingerprint("text").alias("rolling_hash"),
    )


@register(
    "text_bigram_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
             i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bigrams WHERE length(bigram) > 1
    GROUP BY bigram
    ORDER BY cnt DESC, bigram ASC
    LIMIT 100
    """,
    doc="Top-100 word bigrams across the corpus — the reference's word "
    "count (O5-O12) generalized to n-grams; same explode→count→top-K "
    "plan, n-gram construction via a transform over the token array.",
    tags=("text", "ngram"),
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    bigram = (
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), i -> concat_ws(' ', t[i-1], t[i])) END"
    )
    return (
        d.select(F.split("text", " ").alias("t"))
        .select(F.explode(F.expr(bigram)).alias("bigram"))
        .where(F.length("bigram") > 1)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(100)
    )


@register(
    "text_term_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE length(term) > 0 GROUP BY doc_id, term)
    SELECT term,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           COUNT(*) AS df,
           CAST(MAX(tf) AS BIGINT) AS max_tf_in_doc
    FROM tf
    GROUP BY term
    """,
    doc="Corpus term statistics (tf / df / max-tf) — the integer core of "
    "tf-idf, kept log-free so the oracle matches exactly; the idf weighting "
    "itself is a trivial map over these outputs. Two aggregations, no join: "
    "tf rows are unique per (doc, term) by construction, so df is simply "
    "the per-term row count of the tf relation (the earlier distinct+join "
    "formulation paid two extra shuffles for nothing).",
    tags=("text",),
)
def text_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE spark.sql() text over the cached documents view (r15
    # build-latency pass, guide §1); same two-aggregation, no-join plan.
    from slr207_mapreduce_spark.sources.tables import table_view

    v = table_view(spark, "documents", sf_dir)
    return spark.sql(f"""
        WITH tf AS (
          SELECT doc_id, term, COUNT(1) AS tf
          FROM (SELECT doc_id, explode(split(text, ' ')) AS term FROM {v})
          WHERE length(term) > 0
          GROUP BY doc_id, term
        )
        SELECT term,
               CAST(SUM(tf) AS BIGINT) AS total_tf,
               COUNT(1) AS df,
               CAST(MAX(tf) AS BIGINT) AS max_tf_in_doc
        FROM tf GROUP BY term
    """)


@register(
    "text_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
      FROM toks WHERE length(term) > 0 GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(18,1))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * (1.5 + 1.0))
               / (tf.tf + 1.5 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(SUM(CAST(floor(s * 1e9) AS BIGINT)) AS BIGINT) AS bm25_e9
    FROM scored
    GROUP BY doc_id
    """,
    doc="BM25 relevance scoring (k1=1.5, b=0.75) for the query "
    "{join, hash, scan}: per-term tf saturation x length normalization "
    "(dl/avgdl, avgdl from an exact decimal sum) x idf. The idf uses the "
    "log-FREE monotone surrogate (N-df+0.5)/(df+0.5)+1 — the operand of "
    "BM25's ln — because ln() itself differs by 1 ulp between JVM and "
    "libm (measured: 40/500 operands), which would break bit-exactness; "
    "per-term ordering is identical. Scores are fixed-point e9 summed as "
    "integers, so the output is engine-exact. Shape: one tokenize+agg "
    "pass folds dl AND every query term's tf; a second global pass folds "
    "corpus stats AND per-term df into a 1-row broadcast — two corpus "
    "scans total, the floor without materializing the per-doc frame "
    "(was four: dl/tf/stats each re-tokenized).",
    tags=("text", "ranking"),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.functions.portable import dec

    QUERY_TERMS = ("join", "hash", "scan")
    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).where(
        F.length("term") > 0
    )
    # ONE tokenize + aggregate pass computes the doc length AND each query
    # term's tf (conditional counts). Every downstream consumer (corpus
    # stats, df, scoring) derives from this identical pre-shuffle subplan,
    # so the planner's ReuseExchange collapses them to a single corpus
    # scan — the naive dl/tf/stats branches each re-tokenized the corpus
    # (audited: 4 document scans, now 1).
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl"),
        *[
            F.count(F.when(F.col("term") == t, F.lit(1)))
            .cast("double")
            .alias(f"tf_{t}")
            for t in QUERY_TERMS
        ],
    )
    # global pass (scan 2 of 2): corpus stats AND each term's document
    # frequency fold into one 1-row broadcastable summary
    summary = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(dec("dl", 18, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, F.lit(1)))
            .cast("double")
            .alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"), F.col(f"tf_{t}").alias("tf")
                    )
                    for t in QUERY_TERMS
                ]
            )
        ),
    ).where(F.col("tf") > 0)
    df_of_term = F.create_map(
        *[x for t in QUERY_TERMS for x in (F.lit(t), F.col(f"df_{t}"))]
    )[F.col("term")]
    k1, b = F.lit(1.5), F.lit(0.75)
    s = (
        ((F.col("n_docs") - df_of_term + 0.5) / (df_of_term + 0.5) + 1.0)
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        tf.crossJoin(F.broadcast(summary))
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(F.sum(F.floor(F.col("s") * 1e9).cast("long")).cast("long").alias("bm25_e9"))
    )
