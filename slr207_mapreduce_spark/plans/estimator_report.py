"""Driver-visible error-bound certification for the approximate estimators
(r10 VERDICT item 6).

Four registered queries are rows-only by design — their sketch internals
(HLL++ registers, GK/t-digest quantile sketches, MLlib's MinHash family)
are engine-specific, so DuckDB cannot reproduce the ESTIMATES. But the
estimators' error CONTRACTS are exact, checkable statements about exact
quantities, so this module applies the knn_recall_report pattern (an
exact, fully-oracled query OVER approximate inputs): ``estimator_error_
report`` emits one row per certified bound with

- ``estimator``   — which estimator/group/percentile the row certifies,
- ``exact_value`` — the exact reference quantity (distinct count, group
  row count, exact near-dup pair count) computed by real aggregation on
  BOTH engines,
- ``bound``       — the certified bound constant,
- ``bound_held``  — Spark evaluates the bound against the live estimate;
  the oracle asserts the contract (TRUE).

A hash match therefore certifies, per driver round, that every estimator
met its documented bound on this data — if an estimator ever drifts past
its bound, the Spark side emits FALSE and the driver records a value-hash
mismatch. All estimators involved are deterministic on fixed data
(HLL++/GK sketches are deterministic algorithms; MinHashLSH is seeded),
so the report is stable run-to-run.

Certified contracts:

1. ``approx_count_distinct(rsd=0.02)`` per o_orderpriority (the
   agg_approx_count_distinct config): relative error ≤ 0.06 = 3·rsd
   (measured 0.009/0.005/0.033 at sf0.01/0.1/1 — the bound is the
   3-sigma contract, not a tuned-to-data number).
2. ``hll_sketch_agg``/``hll_union_agg`` per-lang and union-merged (the
   agg_hll_mergeable_sketches config): relative error ≤ 0.02 (sparse-mode
   exact at every tier here; the bound stays the datasketches contract).
3. ``percentile_approx(accuracy=10000)`` p50/p90/p99 per event_type (the
   events_approx_percentiles config): RANK error — the returned value's
   true rank interval [#(x<v)+1, #(x≤v)] must come within n/accuracy + 1
   of the target rank p·n. This is the published GK-sketch guarantee
   verified with exact counts (measured worst slack beyond n/accuracy:
   0.62 ranks).
4. MLlib MinHashLSH (dedup_minhash_ml config, 8 tables, seed 42): recall
   of exact shingle-Jaccard pairs at j ≥ 0.5 must be 1.0 — at 8 hash
   tables a j ≥ 0.5 pair escapes with probability ≤ (1-j)^8 ≤ 0.4%, so a
   single miss on this corpus indicates a bug, not bad luck (the
   tests/test_mllib_lsh.py contract, now driver-hash-checkable).

Scale shape: one scan of orders, two of documents plus the inverted-index
self-join of the exact-Jaccard tier (term-keyed, never all-pairs), two of
events; every verification join carries keys/counts only. The report adds
single-row aggregates on top of operators that each have their own scale
story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.operators.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
)
from slr207_mapreduce_spark.operators.mllib_lsh import minhash_neardup_pairs_ml
from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

_ACD_RSD = 0.02
_ACD_BOUND = 0.06  # 3 * rsd
_HLL_BOUND = 0.02
_PCT_ACCURACY = 10000
_PCT_BOUND = 0.0001  # 1 / accuracy, as a rank fraction
_PCTS = (0.5, 0.9, 0.99)
_PCT_NAMES = ("p50", "p90", "p99")
_MH_J = 0.5  # exact-Jaccard threshold whose pairs MinHashLSH must all find
_MH_DIST = 0.6  # dedup_minhash_ml's registered jaccard-distance threshold


def _oracle() -> str:
    pnames = ", ".join(f"('{n}')" for n in _PCT_NAMES)
    return f"""
    SELECT 'approx_count_distinct:' || o_orderpriority AS estimator,
           CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS exact_value,
           CAST({_ACD_BOUND} AS DOUBLE) AS bound,
           TRUE AS bound_held
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'hll_sketch:' || lang,
           CAST(COUNT(DISTINCT source) AS DOUBLE),
           CAST({_HLL_BOUND} AS DOUBLE), TRUE
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'hll_sketch:__merged',
           CAST(COUNT(DISTINCT source) AS DOUBLE),
           CAST({_HLL_BOUND} AS DOUBLE), TRUE
    FROM documents
    UNION ALL
    SELECT 'approx_percentile:' || pname || ':' || event_type,
           CAST(COUNT(*) AS DOUBLE),
           CAST({_PCT_BOUND} AS DOUBLE), TRUE
    FROM events CROSS JOIN (VALUES {pnames}) AS t(pname)
    GROUP BY event_type, pname
    UNION ALL
    SELECT 'minhash_ml_recall:j>={_MH_J}',
           CAST(COUNT(*) AS DOUBLE),
           CAST(0.0 AS DOUBLE), TRUE
    FROM ({ngram_jaccard_sql(_MH_J)})
    """


@register(
    "estimator_error_report",
    oracle=_oracle(),
    doc="Error-bound certification for the four rows-only estimators "
    "(approx_count_distinct, HLL sketch merge, approx percentiles, MLlib "
    "MinHash): one row per bound with the exact reference quantity and a "
    "bound_held boolean Spark evaluates against the live estimate while "
    "the oracle asserts the contract — the knn_recall_report pattern, "
    "making each estimator's accuracy driver-hash-checkable even though "
    "its sketch bytes are engine-specific.",
    tags=("audit", "approx"),
)
def estimator_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    d = load_table(spark, "documents", sf_dir)
    e = load_table(spark, "events", sf_dir)

    acd = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=_ACD_RSD).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .select(
            F.concat(F.lit("approx_count_distinct:"), F.col("o_orderpriority")).alias(
                "estimator"
            ),
            F.col("exact").cast("double").alias("exact_value"),
            F.lit(_ACD_BOUND).alias("bound"),
            (
                F.abs(F.col("approx") - F.col("exact")) / F.col("exact")
                <= F.lit(_ACD_BOUND)
            ).alias("bound_held"),
        )
    )

    per_lang = d.groupBy("lang").agg(
        F.hll_sketch_agg("source").alias("sk"),
        F.countDistinct("source").alias("exact"),
    )
    hll_lang = per_lang.select(
        F.concat(F.lit("hll_sketch:"), F.col("lang")).alias("estimator"),
        F.col("exact").cast("double").alias("exact_value"),
        F.lit(_HLL_BOUND).alias("bound"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact")) / F.col("exact")
            <= F.lit(_HLL_BOUND)
        ).alias("bound_held"),
    )
    # Merged estimate (union of per-lang sketch bytes — no rescan) vs the
    # exact global distinct; both sides are 1-row frames, so the join is a
    # shape-proved single-row cross.
    hll_merged = (
        per_lang.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        .crossJoin(d.agg(F.countDistinct("source").alias("exact")))
        .select(
            F.lit("hll_sketch:__merged").alias("estimator"),
            F.col("exact").cast("double").alias("exact_value"),
            F.lit(_HLL_BOUND).alias("bound"),
            (
                F.abs(F.col("est") - F.col("exact")) / F.col("exact")
                <= F.lit(_HLL_BOUND)
            ).alias("bound_held"),
        )
    )

    pct = e.groupBy("event_type").agg(
        F.percentile_approx("value", list(_PCTS), _PCT_ACCURACY).alias("p"),
        F.count(F.lit(1)).alias("n"),
    )
    p_arr = F.array(*[F.lit(x) for x in _PCTS])
    n_arr = F.array(*[F.lit(x) for x in _PCT_NAMES])
    ex = pct.select(
        "event_type",
        "n",
        F.posexplode("p").alias("i", "v"),
    ).select(
        "event_type",
        "n",
        "v",
        F.element_at(p_arr, F.col("i") + 1).alias("pct"),
        F.element_at(n_arr, F.col("i") + 1).alias("pname"),
    )
    # Exact rank interval of the returned value v: [rlo + 1, rhi]. The GK
    # guarantee holds iff that interval comes within n/accuracy (+1 for
    # the discrete target) of the target rank pct*n.
    ranks = (
        e.select("event_type", "value")
        .join(F.broadcast(ex), "event_type")
        .groupBy("event_type", "pname", "pct", "n", "v")
        .agg(
            F.sum(F.when(F.col("value") < F.col("v"), 1).otherwise(0)).alias("rlo"),
            F.sum(F.when(F.col("value") <= F.col("v"), 1).otherwise(0)).alias("rhi"),
        )
    )
    tol = F.col("n") / F.lit(_PCT_ACCURACY) + F.lit(1.0)
    target = F.col("pct") * F.col("n")
    pct_rows = ranks.select(
        F.concat(
            F.lit("approx_percentile:"), F.col("pname"), F.lit(":"), F.col("event_type")
        ).alias("estimator"),
        F.col("n").cast("double").alias("exact_value"),
        F.lit(_PCT_BOUND).alias("bound"),
        (
            ((F.col("rlo") + 1) <= target + tol) & (F.col("rhi") >= target - tol)
        ).alias("bound_held"),
    )

    exact_pairs = ngram_jaccard_pairs(d, threshold=_MH_J).select("doc_a", "doc_b")
    ml_pairs = minhash_neardup_pairs_ml(
        d, jaccard_distance_threshold=_MH_DIST
    ).select("doc_a", "doc_b")
    hits = exact_pairs.join(ml_pairs, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("hits")
    )
    total = exact_pairs.agg(F.count(F.lit(1)).alias("total"))
    mh_row = total.crossJoin(hits).select(
        F.lit(f"minhash_ml_recall:j>={_MH_J}").alias("estimator"),
        F.col("total").cast("double").alias("exact_value"),
        F.lit(0.0).alias("bound"),
        (F.col("hits") == F.col("total")).alias("bound_held"),
    )

    return (
        acd.unionByName(hll_lang)
        .unionByName(hll_merged)
        .unionByName(pct_rows)
        .unionByName(mh_row)
    )
