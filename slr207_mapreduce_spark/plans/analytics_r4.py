"""Analysis widening, round 4 batch 3 — verification and scoring operators
for the LLM-data-pipeline families.

- dedup_minhash_estimator_error: the verification tier COMPOSED — every
  MinHash-LSH candidate pair re-scored with its exact shingle Jaccard, so
  the estimator's error is itself a queryable table (the "verify before
  you delete" step of a production dedup, and the quality audit for the
  6-hash signature).

- text_trigram_novelty: per-doc novelty = fraction of the doc's distinct
  trigrams found nowhere else in the corpus — the inverse of the
  decontamination/memorization overlap check, useful for mixture curation
  (high-novelty docs carry information the corpus lacks).

- embedding_outlier_by_label: per-label centroid distance outliers — the
  embedding-space mislabel/noise screen. Centroids from exact fixed-point
  component sums (e12), distances as exact e12 integers, so verdicts are
  bit-stable at any parallelism.

- text_bpe_apply: greedy left-to-right application of a FIXED ordered BPE
  merge list to every word (chars → merged subword units), counting units
  before/after. The apply side of BPE tokenization (text_bpe_pair_counts
  is the training side's first step). Pure string algebra — token
  sequences are encoded as 2-space-separated char strings so non-
  overlapping `replace(' x  y ', ' xy ')` IS the greedy merge — identical
  semantics in Spark and DuckDB.

Reference lineage: all four are map (O5/O6 projections) + hash-shuffle
(O8) + reduce (O9) compositions, per SURVEY.md §2.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.dedup import (
    doc_shingles,
    minhash_lsh_candidates,
    minhash_lsh_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
    shingle_tokens_cte_sql,
    shingles_sql,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# MinHash estimator error (LSH candidates × exact Jaccard)
# --------------------------------------------------------------------------


@register(
    "dedup_minhash_estimator_error",
    oracle=f"""
    WITH cand AS ({minhash_lsh_sql(num_hashes=6, band_size=2, shingle_n=3)}),
    exact AS ({ngram_jaccard_sql(threshold=0.0, shingle_n=3)})
    SELECT c.doc_a, c.doc_b, c.est_jaccard,
           COALESCE(e.jaccard, 0.0) AS exact_jaccard,
           ABS(c.est_jaccard - COALESCE(e.jaccard, 0.0)) AS abs_err
    FROM cand c
    LEFT JOIN exact e ON e.doc_a = c.doc_a AND e.doc_b = c.doc_b
    """,
    doc="The dedup verification tier as one query: every MinHash-LSH "
    "candidate pair joined with its exact shingle-set Jaccard (computed "
    "only for pairs that share a shingle; COALESCE 0 covers a pure hash "
    "collision). abs_err audits the 6-hash estimator before any doc is "
    "dropped. Cost: exact verification touches candidate pairs only — "
    "never the corpus cross join. Both scores are single IEEE divisions "
    "of exact integers, so the error column is bit-portable.",
    tags=("dedup", "minhash", "verification"),
)
def dedup_minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    cand = minhash_lsh_candidates(d, num_hashes=6, band_size=2, shingle_n=3)
    exact = ngram_jaccard_pairs(d, threshold=0.0, shingle_n=3).withColumnRenamed(
        "jaccard", "__exact"
    )
    return (
        cand.join(exact, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            F.coalesce(F.col("__exact"), F.lit(0.0)).alias("exact_jaccard"),
            F.abs(
                F.col("est_jaccard") - F.coalesce(F.col("__exact"), F.lit(0.0))
            ).alias("abs_err"),
        )
    )


# --------------------------------------------------------------------------
# Trigram novelty
# --------------------------------------------------------------------------


@register(
    "text_trigram_novelty",
    oracle=f"""
    WITH __tk AS ({shingle_tokens_cte_sql()}),
    sh AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql('__t', 3)}) AS s
      FROM __tk
    ),
    df AS (SELECT s, COUNT(*) AS n_docs FROM sh GROUP BY s)
    SELECT sh.doc_id,
           COUNT(*) AS n_trigrams,
           CAST(COALESCE(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_novel,
           CAST((1000000000 * COALESCE(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END), 0))
                // COUNT(*) AS BIGINT) AS novelty_e9
    FROM sh JOIN df ON df.s = sh.s
    GROUP BY sh.doc_id
    """,
    doc="Per-doc novelty: the fraction of a doc's distinct trigrams that "
    "appear in NO other document, in e9 fixed point. The inverse of the "
    "decontamination overlap check — high-novelty docs carry content the "
    "rest of the corpus lacks (mixture-curation signal). Plan: one "
    "(doc, shingle) table feeds both the document-frequency aggregate and "
    "the per-doc re-join — term-keyed shuffles only, Σ df work, never N².",
    tags=("text", "novelty", "quality"),
)
def text_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    sh = doc_shingles(d, n=3, distinct=True)
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    novel = F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
    return (
        sh.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.coalesce(novel, F.lit(0)).alias("n_novel"),
            F.expr(
                "(1000000000L * COALESCE(SUM(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END), 0))"
                " DIV COUNT(1)"
            ).alias("novelty_e9"),
        )
    )


# --------------------------------------------------------------------------
# Embedding centroid-distance outliers
# --------------------------------------------------------------------------


@register(
    "embedding_outlier_by_label",
    oracle="""
    WITH comp AS (
      SELECT vec_id, label,
             unnest(range(1, len(embedding) + 1)) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim,
             CAST(SUM(CAST(floor(x * 1e12) AS BIGINT)) AS BIGINT) AS s_e12,
             COUNT(*) AS n
      FROM comp GROUP BY label, dim
    ),
    dev AS (
      SELECT c.vec_id, c.label,
             CAST(floor(
               (c.x - CAST(t.s_e12 AS DOUBLE) / (CAST(t.n AS DOUBLE) * 1e12))
               * (c.x - CAST(t.s_e12 AS DOUBLE) / (CAST(t.n AS DOUBLE) * 1e12))
               * 1e12) AS BIGINT) AS d2_e12
      FROM comp c JOIN cent t ON t.label = c.label AND t.dim = c.dim
    ),
    dist AS (
      SELECT vec_id, label, CAST(SUM(d2_e12) AS BIGINT) AS dist2_e12
      FROM dev GROUP BY vec_id, label
    ),
    ranked AS (
      SELECT label, vec_id, dist2_e12,
             CAST(ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY dist2_e12 DESC, vec_id ASC)
                  AS BIGINT) AS rank
      FROM dist
    )
    SELECT label, vec_id, dist2_e12, rank FROM ranked WHERE rank <= 3
    """,
    doc="Embedding-space noise screen: top-3 vectors farthest from their "
    "label centroid. Centroid components are exact e12 fixed-point sums "
    "(the k-means-step aggregation of embedding_centroid_by_label); each "
    "squared deviation is floored to e12 before summing, so distances are "
    "exact integers — bit-stable verdicts at any parallelism. Plan: one "
    "(label, dim) aggregate, a broadcast-sized centroid join back, a "
    "per-vector integer sum, then a per-label top-3 window.",
    tags=("similarity", "outlier", "quality"),
)
def embedding_outlier_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "embeddings", sf_dir)
    comp = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "x0")
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.col("x0").cast("double").alias("x"),
    )
    cent = comp.groupBy("label", "dim").agg(
        F.sum(F.floor(F.col("x") * F.lit(1e12)).cast("long")).cast("long").alias("s_e12"),
        F.count(F.lit(1)).alias("n"),
    )
    c = F.col("x") - F.col("s_e12").cast("double") / (
        F.col("n").cast("double") * F.lit(1e12)
    )
    dev = comp.join(F.broadcast(cent), ["label", "dim"]).select(
        "vec_id", "label", F.floor(c * c * F.lit(1e12)).cast("long").alias("d2_e12")
    )
    dist = dev.groupBy("vec_id", "label").agg(
        F.sum("d2_e12").cast("long").alias("dist2_e12")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist2_e12").desc(), F.col("vec_id").asc()
    )
    return (
        dist.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("label", "vec_id", "dist2_e12", "rank")
    )


# --------------------------------------------------------------------------
# Salted two-phase aggregation (skewed group keys)
# --------------------------------------------------------------------------


@register(
    "agg_salted_skewed_groups",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="Two-phase SALTED aggregation for pathologically skewed group keys "
    "(the aggregation twin of join_salted): phase 1 groups by "
    "(event_type, event_id % 16) so one hot key spreads over 16 reducers; "
    "phase 2 re-aggregates the 16 partials per key. COUNT and DECIMAL SUM "
    "are associative, so the result is bit-identical to the direct "
    "groupBy — the oracle IS the unsalted query (salting must be "
    "result-invariant). Note Spark's own partial aggregation already "
    "handles MOST skew (map-side combine bounds reducer input by "
    "#partitions x #keys); explicit salting is the escape hatch when "
    "per-partition cardinality explodes that bound or AQE skew handling "
    "is unavailable mid-pipeline.",
    tags=("agg", "skew"),
)
def agg_salted_skewed_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    partial = (
        e.selectExpr(
            "event_type",
            "pmod(event_id, 16) AS __salt",
            "CAST(value AS DECIMAL(14,2)) AS v",
        )
        .groupBy("event_type", "__salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("pv"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Generator completeness: explode_outer (null row for empty arrays)
# --------------------------------------------------------------------------


@register(
    "scalar_explode_outer",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN len(arr) = 0 THEN [CAST(NULL AS VARCHAR)]
                  ELSE arr END) AS long_tok
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> length(t) >= 8) AS arr
      FROM documents
    )
    """,
    doc="explode_outer: documents keep a row (NULL token) even when the "
    "generator input is empty — the outer-generator semantics a plain "
    "explode silently drops (here ~most docs have no 8+-char token, so "
    "inner explode would lose them). DuckDB oracle models the outer "
    "behavior as a [NULL] fallback list.",
    tags=("scalar", "generator"),
)
def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.selectExpr(
        "doc_id", "filter(split(text, ' '), t -> length(t) >= 8) AS arr"
    ).select("doc_id", F.explode_outer("arr").alias("long_tok"))


# --------------------------------------------------------------------------
# Portable HyperLogLog (md5 hash family, integer-arithmetic estimate)
# --------------------------------------------------------------------------

_HLL_M = 256  # 2^8 buckets: first 2 hex digits of the digest
_HLL_ALPHA_E6 = 718271  # alpha_256 = 0.7213/(1 + 1.079/256), e6 fixed point
_HLL_K = _HLL_M * _HLL_M * (1 << 30)  # m^2 * 2^30 (exact int, 2^46)


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, r) HLL registers over ``col``: bucket = first 8 digest
    bits, r = max over rows of the 1-based first-set-bit position of the
    next 60 bits (0-valued lanes count as 61). max() is idempotent and
    commutative, so registers build in one partial+final aggregation and
    MERGE by max — the sketch's defining property (pinned in tests)."""
    return (
        df.selectExpr(f"md5(concat('hll|', CAST({col} AS STRING))) AS h")
        .selectExpr(
            "CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) AS bucket",
            "CAST(conv(substring(h, 3, 15), 16, 10) AS BIGINT) AS x",
        )
        .selectExpr(
            "bucket",
            "CASE WHEN x = 0 THEN 61 ELSE 61 - length(bin(x)) END AS rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


@register(
    "agg_hll_portable",
    oracle=f"""
    WITH h AS (
      SELECT md5('hll|' || CAST(o_custkey AS VARCHAR)) AS h FROM orders
    ),
    lanes AS (
      SELECT CAST(('0x' || substring(h, 1, 2)) AS BIGINT) AS bucket,
             CAST(('0x' || substring(h, 3, 15)) AS BIGINT) AS x
      FROM h
    ),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN x = 0 THEN 61 ELSE 61 - length(bin(x)) END) AS r
      FROM lanes GROUP BY bucket
    ),
    s AS (
      SELECT CAST(SUM((CAST(1073741824 AS BIGINT) >> r)) AS BIGINT)
               + ({_HLL_M} - COUNT(*)) * 1073741824 AS s_e30,
             {_HLL_M} - COUNT(*) AS zero_buckets
      FROM regs
    )
    SELECT (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_exact,
           ({_HLL_ALPHA_E6} * ({_HLL_K} // greatest(s_e30, 1))) // 1000000
             AS hll_raw_est,
           zero_buckets
    FROM s
    """,
    doc="HyperLogLog with a PORTABLE construction — the answer to 'sketches "
    "are engine-specific': md5-derived buckets/lanes and an all-integer "
    "raw estimate (alpha in e6 fixed point, 2^-r terms as 2^30 >> r, floor "
    "divisions), so the sketch AND its estimate are bit-reproducible in "
    "DuckDB and hash-checked — unlike approx_count_distinct, whose "
    "internal HLL++ differs by engine (that query stays rows-only by "
    "nature). Registers build in one partial+final max aggregation and "
    "merge by max (mergeability pinned in tests); estimate quality "
    "~1.04/sqrt(256) as standard. Output: exact count alongside the "
    "estimate and the zero-register count (the linear-counting trigger).",
    tags=("agg", "sketch", "approx"),
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    regs = hll_registers(o, "o_custkey")
    summary = regs.agg(
        F.expr(
            f"CAST(SUM(shiftright(CAST(1073741824 AS BIGINT), CAST(r AS INT))) AS BIGINT)"
            f" + ({_HLL_M} - COUNT(1)) * 1073741824"
        ).alias("s_e30"),
        F.expr(f"{_HLL_M} - COUNT(1)").alias("zero_buckets"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return exact.crossJoin(summary).selectExpr(
        "n_exact",
        f"({_HLL_ALPHA_E6} * ({_HLL_K} DIV greatest(s_e30, 1L))) DIV 1000000"
        " AS hll_raw_est",
        "zero_buckets",
    )


# --------------------------------------------------------------------------
# Cross-domain quality normalization
# --------------------------------------------------------------------------


@register(
    "pipeline_quality_percentile_by_source",
    oracle="""
    SELECT doc_id, source, n_chars,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS pct,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) >= 0.1
             AS keep
    FROM documents
    """,
    doc="Cross-domain quality normalization: each doc's quality percentile "
    "WITHIN its source (percent_rank over a deterministic (score, doc_id) "
    "order), plus the keep flag dropping each source's bottom decile. "
    "Thresholding per-domain percentiles instead of raw scores is the "
    "standard guard against a single high-scoring domain crowding out the "
    "mixture. One shuffle on the source key; at 100 TB sources are "
    "high-cardinality enough to spread, and a skewed mega-source switches "
    "to the two-pass approx-quantile cutoff (pipeline_quality_quantile).",
    tags=("pipeline", "quality", "window"),
)
def pipeline_quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    pct = F.percent_rank().over(w)
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        pct.alias("pct"),
        (pct >= 0.1).alias("keep"),
    )


# --------------------------------------------------------------------------
# BPE merge application
# --------------------------------------------------------------------------

# Fixed, ordered merge table (the apply-side contract: merges learned by a
# prior training run are applied greedily left-to-right, in rank order).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("t", "a"),
    ("a", "l"),
    ("s", "c"),
)


def _merged_expr_spark(tok: str) -> str:
    """Spark SQL: word -> ' c  h  a  r ' 2-space-separated char string,
    then the ordered merges as non-overlapping replaces."""
    s = f"concat(' ', rtrim(regexp_replace({tok}, '(.)', '$1  ')), ' ')"
    for x, y in BPE_MERGES:
        s = f"replace({s}, ' {x}  {y} ', ' {x}{y} ')"
    return s


def _merged_expr_duck(tok: str) -> str:
    s = f"concat(' ', rtrim(regexp_replace({tok}, '(.)', '\\1  ', 'g')), ' ')"
    for x, y in BPE_MERGES:
        s = f"replace({s}, ' {x}  {y} ', ' {x}{y} ')"
    return s


_TRAIN_ROUNDS = 5


def _bpe_train_oracle(rounds: int = _TRAIN_ROUNDS) -> str:
    """Unrolled DuckDB oracle for the iterative BPE trainer: each round is
    a CTE trio (adjacent-pair counts over the current segmentation → argmax
    best pair → merged segmentation), chained ``rounds`` times — the same
    unrolled-iteration oracle technique as graph_pagerank."""
    ctes = [
        # distinct-word table with frequencies, char-split segmentation
        """w AS (
      SELECT tok AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) > 0 GROUP BY tok
    )""",
        """seg0 AS (
      SELECT word, freq,
             concat(' ', rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')), ' ')
               AS enc
      FROM w
    )""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""u{r} AS (
      SELECT freq, string_split(trim(enc), '  ') AS u FROM seg{r}
    )"""
        )
        ctes.append(
            f"""pc{r} AS (
      SELECT p.l AS l, p.r AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, greatest(len(u), 1)),
                                     i -> {{'l': u[i], 'r': u[i + 1]}})) AS p
        FROM u{r}
      ) GROUP BY p.l, p.r
    )"""
        )
        ctes.append(
            f"""best{r} AS (
      SELECT l, r, cnt FROM pc{r} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    )"""
        )
        ctes.append(
            f"""seg{r + 1} AS (
      SELECT word, freq,
             replace(enc,
                     ' ' || (SELECT l FROM best{r}) || '  ' ||
                       (SELECT r FROM best{r}) || ' ',
                     ' ' || (SELECT l FROM best{r}) ||
                       (SELECT r FROM best{r}) || ' ') AS enc
      FROM seg{r}
    )"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, l AS merge_left, r AS merge_right,"
        f" cnt AS pair_count FROM best{r}"
        for r in range(rounds)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + union


@register(
    "text_bpe_train_merges",
    oracle=_bpe_train_oracle(),
    doc="BPE tokenizer TRAINING: 5 merge rounds over the frequency-weighted "
    "distinct-word table. Each round counts adjacent unit pairs of the "
    "current segmentation (one groupBy over the Zipf-compressed "
    "vocabulary, NOT the token stream), picks the argmax pair with a "
    "deterministic (count desc, pair asc) tie-break — a 1-row collect, the "
    "only driver traffic per round — and applies the merge as the "
    "non-overlapping-replace string algebra of text_bpe_apply. The oracle "
    "unrolls all 5 rounds as CTE trios (the graph_pagerank technique), so "
    "the data-dependent iteration is still hash-checked end to end.",
    tags=("text", "bpe", "iterative"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = (
        d.selectExpr("explode(split(text, ' ')) AS word")
        .where("length(word) > 0")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = w.selectExpr(
        "word",
        "freq",
        "concat(' ', rtrim(regexp_replace(word, '(.)', '$1  ')), ' ') AS enc",
    )
    # index list via filter (never `sequence(1, size-1)`: Spark's sequence
    # runs DESCENDING when start > stop, fabricating a [1,0] pair for
    # single-unit words — same hazard class as shingles())
    pair_expr = (
        "transform(filter(sequence(1, size(u)), i -> i < size(u)), "
        "i -> struct(element_at(u, i) AS l, element_at(u, i + 1) AS r))"
    )
    merges = []
    for r in range(_TRAIN_ROUNDS):
        pc = (
            seg.selectExpr("freq", "split(trim(enc), '  ') AS u")
            .selectExpr("freq", f"explode({pair_expr}) AS p")
            .selectExpr("freq", "p.l AS l", "p.r AS r")
            .groupBy("l", "r")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        best = pc.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).first()
        if best is None:  # vocabulary fully merged before the round budget
            break
        merges.append((r + 1, best["l"], best["r"], best["cnt"]))
        pat, rep = f" {best['l']}  {best['r']} ", f" {best['l']}{best['r']} "
        seg = seg.selectExpr(
            "word",
            "freq",
            # literals are sanitized by construction (units are substrings
            # of corpus words, split on whitespace — no quotes to escape)
            f"replace(enc, '{pat}', '{rep}') AS enc",
        )
    return spark.createDataFrame(
        merges, "merge_rank int, merge_left string, merge_right string, pair_count bigint"
    )


@register(
    "text_bpe_apply",
    oracle=f"""
    SELECT doc_id,
           len(words) AS n_words,
           COALESCE(CAST(list_sum(list_transform(words, t -> length(t))) AS BIGINT), 0)
             AS n_char_units,
           COALESCE(CAST(list_sum(list_transform(words,
             t -> len(string_split(trim({_merged_expr_duck('t')}), '  '))))
             AS BIGINT), 0) AS n_bpe_units
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> length(t) > 0) AS words
      FROM documents
    )
    """,
    doc="BPE tokenizer APPLICATION: a fixed ordered merge list applied "
    "greedily left-to-right to every word, counting subword units before "
    "(chars) and after. Token sequences are encoded as 2-space-separated "
    "strings so plain non-overlapping replace(' x  y ', ' xy ') IS the "
    "greedy merge (each match donates one boundary space to its neighbor) "
    "— string algebra with identical semantics in both engines, no UDF. "
    "Complements text_bpe_pair_counts (the training side). Zero shuffles: "
    "a pure scan-stage projection.",
    tags=("text", "bpe", "tokenize"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.skew import parallelize_narrow_scan

    # The merge cascade is CPU-bound per ROW (a replace() chain over every
    # word), so a small corpus arriving as 1-2 splits would run it 1-2
    # wide; the rebalance is a no-op whenever the scan is already wide.
    d = parallelize_narrow_scan(load_table(spark, "documents", sf_dir))
    return d.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> length(t) > 0)").alias("words"),
    ).select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(words, 0L, (acc, t) -> acc + length(t))"
        ).alias("n_char_units"),
        F.expr(
            "aggregate(words, 0L, (acc, t) -> acc + "
            f"size(split(trim({_merged_expr_spark('t')}), '  ')))"
        ).alias("n_bpe_units"),
    )
