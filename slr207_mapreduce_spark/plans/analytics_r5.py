"""Round-11b additions: operators a training-data pipeline still lacked,
each fully DuckDB-oracled (sf0.01 / sf0.1 / sf1 evidence in SCALE.md).

- ``text_countmin_heavy_hitters`` — a REAL mergeable frequency sketch
  (count-min) built with the portable md5 hash family, so the sketch
  counters, the estimates, and the realized error are all hash-checked
  against an oracle that rebuilds the same sketch in SQL. The counters
  are plain SUMs, so Spark's partial aggregation IS the sketch merge —
  the map-side combine builds per-partition sketches and the reduce
  merges them, which is exactly how the sketch deploys on a cluster.
- ``events_countmin_trending_daily`` — the windowed variant (per-day
  trending/bot detection); the identical transform runs under
  Structured Streaming as a plain watermarked windowed aggregation
  (streaming/ops.py:streaming_countmin_counters), stream==batch parity
  pinned in tests/test_streaming.py.
- ``pipeline_pps_systematic_sample`` — weighted (probability-
  proportional-to-size) sampling with ZERO floating point: systematic
  sampling along the exact cumulative-weight line, anchored at step/2.
  Uses the distributed exclusive prefix sum (operators/ids.py), so no
  global window; the float-free formulation is what keeps a weighted
  sampler hash-checkable across engines (u^(1/w) keys are libm-order
  dependent; integer division is not).
- ``pipeline_temperature_mixture_sqrt`` — alpha=0.5 temperature mixture
  sampling with exact integer-sqrt quotas (IEEE sqrt is correctly
  rounded, so one integer repair step makes the quota exact — the one
  temperature a cross-engine hash check can pin).
- ``multimodal_phash_neardup`` — image NEAR-duplicate detection over
  real decoded bytes: P6 decode -> integer-luma 8x8 grid -> 56-bit
  dHash -> bit-sampling LSH bands (reusing dedup.simhash_band_pairs;
  complete recall for hamming <= 6 by pigeonhole over 7 bands). The
  multimodal counterpart of the text family's simhash near-dup.
- ``text_phrase_search`` — exact phrase search through a positional
  inverted index; only the phrase terms' posting lists ever shuffle.
- ``knn_filtered_bruteforce`` — filtered vector search: the metadata
  predicate composes BEFORE candidate generation (exact top-k under the
  filter, never post-filtering's under-filled k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.functions.portable import (
    COUNTMIN_EVENTS_DEPTH,
    COUNTMIN_EVENTS_WIDTH,
    COUNTMIN_SEED0,
    countmin_hash_rows,
    countmin_hash_sql,
    portable_hash64,
    portable_hash64_sql,
)
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

# Count-min geometry: depth 3 x width 1024 (seeds 100..102 of the portable
# md5 family). At sf0.1 (~6e5 token occurrences) the expected per-row
# overcount is N/w ~ 600 — small against the top-20 heavy hitters, large
# enough that the report's realized-error column is a real measurement.
_CM_DEPTH = 3
_CM_WIDTH = 1024
_CM_SEED0 = COUNTMIN_SEED0
_CM_TOPK = 20


def _cm_oracle() -> str:
    probe = countmin_hash_sql("t.term", "h.i", _CM_WIDTH, _CM_SEED0)
    build = countmin_hash_sql("term", "h.i", _CM_WIDTH, _CM_SEED0)
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS term FROM documents
    ),
    counts AS (
      SELECT term, COUNT(*) AS cnt FROM toks WHERE length(term) > 0 GROUP BY term
    ),
    cm AS (
      SELECT h.i AS h, {build} AS b, SUM(cnt) AS c
      FROM counts, (SELECT UNNEST(range({_CM_DEPTH})) AS i) h
      GROUP BY 1, 2
    ),
    top AS (
      SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT {_CM_TOPK}
    )
    SELECT t.term,
           CAST(t.cnt AS BIGINT) AS exact_tf,
           CAST(MIN(c.c) AS BIGINT) AS est_tf,
           CAST(MIN(c.c) - t.cnt AS BIGINT) AS overcount
    FROM top t, (SELECT UNNEST(range({_CM_DEPTH})) AS i) h, cm c
    WHERE c.h = h.i AND c.b = {probe}
    GROUP BY t.term, t.cnt
    """


@register(
    "text_countmin_heavy_hitters",
    oracle=_cm_oracle(),
    doc="Count-min sketch heavy hitters: per-term exact counts feed a "
    f"depth-{_CM_DEPTH} x width-{_CM_WIDTH} counter array keyed by the "
    "portable md5 hash family (adding exact per-term counts into buckets "
    "is identical to streaming per-occurrence updates — the counters are "
    "additive), then the top-20 exact terms are probed back through the "
    "sketch: est = min over rows of the bucket sum. The counters are "
    "plain SUMs, so partial aggregation IS the distributed sketch merge "
    "and the whole structure is mergeable across partitions, days, or "
    "corpora. est >= exact always (CM never undercounts); the overcount "
    "column is the realized error, which the oracle — rebuilding the "
    "identical sketch in SQL — checks exactly, the same "
    "exact-report-over-approximate-inputs trick as estimator_error_report.",
    tags=("text", "sketch"),
)
def text_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hash_rows = countmin_hash_rows(
        F.col("term"), depth=_CM_DEPTH, width=_CM_WIDTH, seed0=_CM_SEED0
    )
    cm = (
        counts.select(F.explode(hash_rows).alias("hb"), "cnt")
        .groupBy(F.col("hb.h").alias("h"), F.col("hb.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(_CM_TOPK)
    probed = top.select("term", "cnt", F.explode(hash_rows).alias("hb")).join(
        F.broadcast(cm),
        (F.col("hb.h") == F.col("h")) & (F.col("hb.b") == F.col("b")),
    )
    return probed.groupBy("term", "cnt").agg(F.min("c").alias("est")).select(
        "term",
        F.col("cnt").cast("long").alias("exact_tf"),
        F.col("est").cast("long").alias("est_tf"),
        (F.col("est") - F.col("cnt")).cast("long").alias("overcount"),
    )


_PPS_K = 50


@register(
    "pipeline_pps_systematic_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS wt,
             CAST(COALESCE(SUM(n_chars) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS before
      FROM documents
    ),
    t AS (
      SELECT GREATEST(CAST(SUM(n_chars) AS BIGINT) // {_PPS_K}, 1) AS step
      FROM documents
    ),
    hits AS (
      SELECT doc_id, lang, wt,
             ((before + wt - 1 + step - step // 2) // step)
               - ((before + step - 1 - step // 2) // step) AS n_hits
      FROM w, t
    )
    SELECT doc_id, lang, wt, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits WHERE n_hits >= 1
    """,
    doc="Weighted (PPS) sampling with zero floating point: lay every "
    "document's weight (n_chars) along the exact cumulative line in "
    f"doc_id order, then take one unit at step/2 + m*step for step = "
    f"total_weight // {_PPS_K} — classic systematic "
    "probability-proportional-to-size sampling with a deterministic "
    "anchor. n_hits is how many sample points land inside the doc's "
    "weight interval (a doc heavier than the step is drawn multiple "
    "times, as PPS requires). The cumulative line comes from the "
    "distributed two-pass exclusive prefix sum (operators/ids.py) — no "
    "single-task global window — and the driver only ever sees "
    "O(partitions) partial sums. The float-free formulation is the "
    "point: Efraimidis-Spirakis u^(1/w) keys rank by libm pow, which no "
    "cross-engine hash check can pin; integer division is exact "
    "everywhere, so a weighted sampler becomes hash-checkable.",
    tags=("pipeline", "sampling"),
)
def pipeline_pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.ids import with_running_total

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("wt")
    )
    lined = with_running_total(d, order_by=["doc_id"], value_col="wt", out_col="before")
    step = d.agg(
        F.expr(f"greatest(sum(wt) DIV {_PPS_K}, 1L)").alias("step")
    )
    return (
        lined.crossJoin(F.broadcast(step))
        .withColumn(
            "n_hits",
            F.expr(
                "(before + wt - 1 + step - step DIV 2) DIV step"
                " - (before + step - 1 - step DIV 2) DIV step"
            ).cast("long"),
        )
        .where(F.col("n_hits") >= 1)
        .select("doc_id", "lang", "wt", "n_hits")
    )


_PHASH_MAX_HAMMING = 6


def _phash_oracle() -> str:
    # Replays the fixture pixels (operators/multimodal.py:synth_phash_blobs),
    # the integer nearest 8x8 resample, the luma dHash, and the banded join.
    return f"""
    WITH params AS (
      SELECT doc_id,
             (doc_id - doc_id % 4) % 65521 AS bb,
             doc_id % 4 AS v
      FROM documents
    ),
    grid AS (
      SELECT p.doc_id, p.bb, p.v, ti.i2, tj.j2,
             ((ti.i2 * 12) // 8) AS yi, ((tj.j2 * 16) // 8) AS xi,
             ((ti.i2 * 12) // 8) * 16 + ((tj.j2 * 16) // 8) AS cell
      FROM params p,
           (SELECT UNNEST(range(8)) AS i2) ti,
           (SELECT UNNEST(range(8)) AS j2) tj
    ),
    px AS (
      SELECT doc_id, i2, j2,
             CASE WHEN v > 0 AND yi = 0 AND xi = v * 3 - 2
                  THEN ((bb * 131 + cell * 151 + 11) * (bb * 313 + cell * 211 + 29)
                        % 65521 % 256 + 128) % 256
                  ELSE (bb * 131 + cell * 151 + 11) * (bb * 313 + cell * 211 + 29)
                       % 65521 % 256 END AS r,
             CASE WHEN v > 0 AND yi = 1 AND xi = v * 3 - 1
                  THEN ((bb * 173 + cell * 59 + 47) * (bb * 419 + cell * 101 + 7)
                        % 65521 % 256 + 128) % 256
                  ELSE (bb * 173 + cell * 59 + 47) * (bb * 419 + cell * 101 + 7)
                       % 65521 % 256 END AS g,
             (bb * 233 + cell * 241 + 91) * (bb * 523 + cell * 37 + 3)
             % 65521 % 256 AS b
      FROM grid
    ),
    hashes AS (
      SELECT a.doc_id,
             CAST(SUM(CASE WHEN 299 * a.r + 587 * a.g + 114 * a.b
                                < 299 * c.r + 587 * c.g + 114 * c.b
                           THEN 1::BIGINT << (a.i2 * 7 + a.j2) ELSE 0 END)
                  AS BIGINT) AS dhash
      FROM px a
      JOIN px c ON c.doc_id = a.doc_id AND c.i2 = a.i2 AND c.j2 = a.j2 + 1
      WHERE a.j2 < 7
      GROUP BY a.doc_id
    ),
    bands AS (
      SELECT doc_id, dhash, tb.b AS band, (dhash >> (8 * tb.b)) & 255 AS val
      FROM hashes, (SELECT UNNEST(range(7)) AS b) tb
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.dhash AS ha, y.dhash AS hb
      FROM bands x
      JOIN bands y ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {_PHASH_MAX_HAMMING}
    """


@register(
    "multimodal_phash_neardup",
    oracle=_phash_oracle(),
    doc="Image NEAR-duplicate detection over real decoded bytes — the "
    "multimodal counterpart of dedup_simhash_pairs: decode each P6 "
    "payload, nearest-sample an 8x8 integer-luma grid, take the 56-bit "
    "dHash (brighter-than-right-neighbor bits), and pair via "
    "bit-sampling LSH (7 bands x 8 bits, equi-join on band value, exact "
    "Hamming verify) — complete recall for hamming <= "
    f"{_PHASH_MAX_HAMMING} by pigeonhole, never an all-pairs product. "
    "Every stage is integer arithmetic, so the oracle replays the DECODED "
    "PIXELS, the resample indexing, the hash bits, and the banded join in "
    "SQL — the hash values themselves are checked, not just pair counts. "
    "Fixture: groups of 4 docs share a base image; variants flip two "
    "source pixels (+128), landing same-base pairs at hamming <= 4 while "
    "cross-base hashes decorrelate via multiplicative base-cell mixing. "
    "At production scale the banding widens with the corpus exactly as "
    "dedup_simhash_pairs documents (wider bands -> finer buckets).",
    tags=("multimodal", "dedup"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.dedup import simhash_band_pairs
    from slr207_mapreduce_spark.operators.multimodal import (
        dhash56_features,
        synth_phash_blobs,
    )

    d = load_table(spark, "documents", sf_dir)
    hashes = dhash56_features(synth_phash_blobs(d)).withColumnRenamed(
        "dhash", "simhash"
    )
    return simhash_band_pairs(
        hashes, max_hamming=_PHASH_MAX_HAMMING, bits=56, bands=7
    )


# Events count-min: depth 3 x width 64 per day (per-day user cardinality
# ~150 at sf0.01, so width 64 guarantees visible collisions — a real
# estimator, not an identity map), same portable seed family.
_ECM_DEPTH = COUNTMIN_EVENTS_DEPTH
_ECM_WIDTH = COUNTMIN_EVENTS_WIDTH
_ECM_TOPK = 5


def _ecm_oracle() -> str:
    build = countmin_hash_sql("uid", "h.i", _ECM_WIDTH, _CM_SEED0)
    probe = countmin_hash_sql("t.uid", "h.i", _ECM_WIDTH, _CM_SEED0)
    return f"""
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(user_id AS VARCHAR) AS uid
      FROM events
    ),
    counts AS (SELECT day, uid, COUNT(*) AS cnt FROM ev GROUP BY day, uid),
    cm AS (
      SELECT day, h.i AS h, {build} AS b, SUM(cnt) AS c
      FROM counts, (SELECT UNNEST(range({_ECM_DEPTH})) AS i) h
      GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT day, uid, cnt FROM (
        SELECT day, uid, cnt,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY cnt DESC, uid) AS rn
        FROM counts
      ) WHERE rn <= {_ECM_TOPK}
    )
    SELECT t.day, CAST(t.uid AS BIGINT) AS user_id,
           CAST(t.cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.c) AS BIGINT) AS est_cnt,
           CAST(MIN(c.c) - t.cnt AS BIGINT) AS overcount
    FROM top t, (SELECT UNNEST(range({_ECM_DEPTH})) AS i) h, cm c
    WHERE c.day = t.day AND c.h = h.i AND c.b = {probe}
    GROUP BY t.day, t.uid, t.cnt
    """


@register(
    "events_countmin_trending_daily",
    oracle=_ecm_oracle(),
    doc="Windowed heavy hitters over the event stream — trending-entity / "
    f"bot detection: a per-day depth-{_ECM_DEPTH} x width-{_ECM_WIDTH} "
    "count-min sketch over user_id, probed with each day's top-5 exact "
    "users. The sketch being PURE additive SUMs keyed by (day, row, "
    "bucket) is the point: the identical transform runs under Structured "
    "Streaming as a watermarked windowed aggregation with NO custom "
    "state (tests/test_streaming.py pins stream==batch counters), "
    "because sketch merge == partial aggregation. The oracle rebuilds "
    "the per-day sketches in SQL, hash-checking estimates and realized "
    "overcounts exactly.",
    tags=("events", "sketch", "streaming-analogue"),
)
def events_countmin_trending_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        F.date_trunc("day", "ts").alias("day"),
        F.col("user_id").cast("string").alias("uid"),
    )
    counts = ev.groupBy("day", "uid").agg(F.count(F.lit(1)).alias("cnt"))
    hash_rows = countmin_hash_rows(
        F.col("uid"), depth=_ECM_DEPTH, width=_ECM_WIDTH, seed0=_CM_SEED0
    )
    cm = (
        counts.select("day", F.explode(hash_rows).alias("hb"), "cnt")
        .groupBy("day", F.col("hb.h").alias("h"), F.col("hb.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), F.asc("uid"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _ECM_TOPK)
        .drop("rn")
    )
    probed = top.select("day", "uid", "cnt", F.explode(hash_rows).alias("hb")).join(
        F.broadcast(cm).withColumnRenamed("day", "cm_day"),
        (F.col("day") == F.col("cm_day"))
        & (F.col("hb.h") == F.col("h"))
        & (F.col("hb.b") == F.col("b")),
    )
    return probed.groupBy("day", "uid", "cnt").agg(F.min("c").alias("est")).select(
        "day",
        F.col("uid").cast("long").alias("user_id"),
        F.col("cnt").cast("long").alias("exact_cnt"),
        F.col("est").cast("long").alias("est_cnt"),
        (F.col("est") - F.col("cnt")).cast("long").alias("overcount"),
    )


_PHRASE = ("part", "filter", "scan")


@register(
    "text_phrase_search",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
    toks AS (
      SELECT doc_id, CAST(tp.p AS BIGINT) AS pos,
             parts[CAST(tp.p AS BIGINT) + 1] AS term
      FROM d, LATERAL (SELECT UNNEST(range(len(parts))) AS p) tp
    )
    SELECT a.doc_id,
           COUNT(*) AS n_matches,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM toks a
    JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
               AND b.term = '{_PHRASE[1]}'
    JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
               AND c.term = '{_PHRASE[2]}'
    WHERE a.term = '{_PHRASE[0]}'
    GROUP BY a.doc_id
    """,
    doc="Exact phrase search through a POSITIONAL inverted index — the "
    "search-engine op the text family lacked: posting lists (term, doc, "
    f"position) are filtered to the phrase terms {' '.join(_PHRASE)!r} "
    "BEFORE any join (predicate pushdown to the scan), then adjacency "
    "is an equi-join on (doc_id, pos+offset) — so only the three terms' "
    "posting lists ever shuffle, never the corpus, and a selective "
    "phrase touches a vanishing fraction of a 100 TB index. Emits "
    "per-doc match count and first occurrence. The oracle rebuilds the "
    "positional postings in SQL (lateral range over the split array — "
    "1-based list indexing) and replays the same adjacency joins.",
    tags=("text", "search"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    a = toks.where(F.col("term") == _PHRASE[0]).select(
        "doc_id", F.col("pos").cast("long").alias("p0")
    )
    b = toks.where(F.col("term") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").cast("long").alias("p1")
    )
    c = toks.where(F.col("term") == _PHRASE[2]).select(
        F.col("doc_id").alias("doc_c"), F.col("pos").cast("long").alias("p2")
    )
    return (
        a.join(b, (F.col("doc_b") == F.col("doc_id")) & (F.col("p1") == F.col("p0") + 1))
        .join(c, (F.col("doc_c") == F.col("doc_id")) & (F.col("p2") == F.col("p0") + 2))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("p0").alias("first_pos"),
        )
    )


def _fknn_oracle() -> str:
    from slr207_mapreduce_spark.operators.similarity import knn_bruteforce_sql
    from slr207_mapreduce_spark.plans.similarity_queries import KNN_K, _N_QUERIES

    return knn_bruteforce_sql(
        k=KNN_K,
        query_pred=f"{{col}} < {_N_QUERIES}",
        corpus_pred=f"c.label = {_FKNN_LABEL}",
    )


_FKNN_LABEL = 3  # most common label at sf0.01 (59 of 500 vectors)


@register(
    "knn_filtered_bruteforce",
    oracle=_fknn_oracle(),
    doc="FILTERED vector search — the canonical hard case in production "
    "ANN systems: exact cosine top-5 among corpus vectors satisfying a "
    f"metadata predicate (label = {_FKNN_LABEL}). The filter composes "
    "BEFORE candidate generation (pre-filtering, pushed into the corpus "
    "scan), so every query gets a full, exact top-k under the predicate "
    "— not post-filtering, which silently under-fills k when the "
    "predicate is selective. Same one-scan local-top-k kernel as "
    "knn_bruteforce (shuffle O(|Q|·k) per batch, never O(N·|Q|)); at "
    "production scale the same composition applies in front of the "
    "IVF/LSH tiers by filtering their candidate sets.",
    tags=("similarity",),
)
def knn_filtered_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.similarity import knn_bruteforce
    from slr207_mapreduce_spark.plans.similarity_queries import KNN_K, _N_QUERIES

    e = load_table(spark, "embeddings", sf_dir)
    return knn_bruteforce(
        e.where(F.col("label") == _FKNN_LABEL),
        e.where(F.col("vec_id") < _N_QUERIES),
        k=KNN_K,
    )


_TEMP_S = 4  # k_lang = isqrt(S * n_lang): alpha=0.5 temperature, x2 scale


@register(
    "pipeline_temperature_mixture_sqrt",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
    ),
    k AS (
      SELECT lang, n_l,
             -- exact integer sqrt: IEEE sqrt is correctly rounded, so the
             -- float floor is off by at most 1; one CASE step repairs it
             CASE WHEN r0 * r0 > {_TEMP_S} * n_l THEN r0 - 1
                  WHEN (r0 + 1) * (r0 + 1) <= {_TEMP_S} * n_l THEN r0 + 1
                  ELSE r0 END AS k_l
      FROM (SELECT lang, n_l,
                   CAST(FLOOR(SQRT(CAST({_TEMP_S} * n_l AS DOUBLE))) AS BIGINT) AS r0
            FROM counts)
    ),
    ranked AS (
      SELECT d.doc_id, d.lang,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY {portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed=77)}, d.doc_id) AS rn
      FROM documents d
    )
    SELECT r.doc_id, r.lang, CAST(k.n_l AS BIGINT) AS lang_docs,
           CAST(k.k_l AS BIGINT) AS lang_quota
    FROM ranked r JOIN k ON k.lang = r.lang
    WHERE r.rn <= k.k_l
    """,
    doc="Temperature-based multilingual mixture sampling at alpha = 0.5 — "
    "the standard flattening for low-resource languages (sample share "
    "proportional to n^alpha instead of n): per-language quota k_lang = "
    f"isqrt({_TEMP_S}·n_lang), drawn in deterministic hash order. The "
    "alpha=0.5 case is the ONE temperature exactly computable across "
    "engines: IEEE-754 sqrt is correctly rounded everywhere (unlike pow, "
    "whose libm drift no hash check can pin — same reasoning as the PPS "
    "sampler), and a one-step integer repair of floor(sqrt(x)) makes the "
    "quota exactly isqrt, verified by integer multiplication alone. One "
    "shuffle on lang; quotas broadcast.",
    tags=("pipeline", "sampling"),
)
def pipeline_temperature_mixture_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    r0 = F.floor(F.sqrt((F.lit(_TEMP_S) * F.col("n_l")).cast("double"))).cast("long")
    k = counts.select(
        "lang",
        "n_l",
        F.when(r0 * r0 > _TEMP_S * F.col("n_l"), r0 - 1)
        .when((r0 + 1) * (r0 + 1) <= _TEMP_S * F.col("n_l"), r0 + 1)
        .otherwise(r0)
        .alias("k_l"),
    )
    w = Window.partitionBy("lang").orderBy(
        portable_hash64(F.col("doc_id").cast("string"), seed=77).asc(),
        F.asc("doc_id"),
    )
    ranked = d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
    return (
        ranked.join(F.broadcast(k), "lang")
        .where(F.col("rn") <= F.col("k_l"))
        .select(
            "doc_id",
            "lang",
            F.col("n_l").cast("long").alias("lang_docs"),
            F.col("k_l").cast("long").alias("lang_quota"),
        )
    )


@register(
    "multimodal_phash_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_phash_oracle()})
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
    doc="Image duplicate CLUSTERS: the dHash near-dup pairs transitively "
    "closed into components by min-label propagation (O(diameter) "
    "rounds, lineage checkpointed) — the pairs -> clusters -> keep-rule "
    "closure the text (dedup_clusters) and embedding "
    "(dedup_semantic_clusters) modalities already have, completed for "
    "the image modality. A real multimodal curation run unions all three "
    "edge sets before one closure. Oracle: recursive-CTE transitive "
    "closure over the identical banded-pair SQL.",
    tags=("multimodal", "dedup", "graph", "iterative"),
)
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.operators.graph import connected_components

    pairs = multimodal_phash_neardup(spark, sf_dir)
    return connected_components(pairs, src="doc_a", dst="doc_b")
