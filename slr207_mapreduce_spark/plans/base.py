"""Query registry plumbing.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL a DuckDB oracle can run over the same parquet tables (driver
contract, __spark_entry__.py). Specs whose semantics are not SQL-expressible
(streaming state, iterative algorithms) set ``oracle=None`` and get a
rows-only check.

Column-name contract: the driver sorts columns by NAME before value-hashing,
so the Spark builder and the oracle SQL must alias every computed column
identically — enforced by tests/test_oracle.py which runs both sides and
compares values exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL over views region..embeddings, or None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a Spark builder under ``name`` with its oracle."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


# The driver's correctness comparator samples the FIRST 50 entries of
# queries() each round.  Rotation history: r01-r03 one fixed slice,
# r04/r05 a second slice, r06 rotated 45 never-adjudicated names, r07 the
# agg/events/udf/warehouse rotation, r08 the adjudication endgame (each
# 50/50 green; cumulative 230/251 after r08 per VERDICT r08).
#
# Round 14 (this list): the fifth FRESHNESS rotation. Policy, pinned by
# tests/test_oracle.py::test_driver_sample_rotation: the 45 non-sentinel
# slots are EXACTLY the 45 stalest registry names under the deterministic
# order (last-adjudicated round, name) with never-adjudicated names
# treated as round 0 — so min(last-adjudicated round) over the registry
# rises every round and staleness can never silently accumulate again.
# For r14 (computed by tools/rotation.py over CORRECTNESS_r01..r13) that
# is any never-adjudicated r14 additions first (stalest by definition),
# then the r07/r08 remainder — the events batch analogues, pipeline
# quarantine/curation names, scalar variants, text analysis block,
# subquery CTEs — with the head of the r09 block filling the last slots.
#
# WINDOW_ROUND declares which round this window serves; the rotation test
# computes the expected window from artifacts of rounds < WINDOW_ROUND, so
# the driver landing CORRECTNESS_r{WINDOW_ROUND}.json after the final
# commit does not redden a finished tree (r10 VERDICT item 1).
WINDOW_ROUND: int = 14
#
# Registry-growth policy (r07 VERDICT item 5): any query registered after
# the r07 snapshot (tests/data/registry_r07.txt) must appear in
# DRIVER_SAMPLE_FIRST for the round it lands in, or be listed here with a
# reason — tests/test_oracle.py::test_registry_growth_joins_driver_window
# enforces it.  Keep this empty unless a new query genuinely must wait a
# round (e.g. the window is already full of higher-priority backlog).
DEFERRED_NEW_NAMES: tuple[str, ...] = ()

# Every name in the r14 window carries a DuckDB oracle — the rotation
# test pins this empty (dedup_minhash_ml, the registry's rows-only
# MinHashLSH entry, was pushed past the window tail by this round's new
# fully-oracled names).
ROWS_ONLY_WINDOW_NAMES: tuple[str, ...] = ()

DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r13)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # --- new this round (never adjudicated; stalest by definition),
    # then the stalest remainder: the r07/r08 adjudication block
    # (events_*, pipeline quarantine, scalar_*, text_* block, subq CTEs)
    # and the head of the r09 block, in (round, name) order ---
    "dedup_semantic_knn_graph_mutual",
    "dedup_semantic_semdedup_merged",
    "knn_ivf_pq_materialized",
    "pipeline_incremental_semantic_dedup",
    "retrieval_hybrid_rrf",
    "unpivot_lineitem_measures",
    "dedup_cdc_chunks",
    "dedup_minhash_estimator_error",
    "dedup_substring_span_positions",
    "embedding_outlier_by_label",
    "embedding_random_projection",
    "events_funnel_stages",
    "events_gap_filled_hours",
    "events_linear_interpolate",
    "events_promo_overlap_join",
    "events_range_frame_1h",
    "events_sliding_window",
    "events_time_rollup",
    "events_transition_bigrams",
    "events_zscore_outliers",
    "join_existence_flag",
    "join_not_in_null_aware",
    "pipeline_assign_ids",
    "pipeline_bloom_membership",
    "pipeline_csv_ingest_quarantine",
    "pipeline_global_shuffle",
    "scalar_array_set_ops",
    "scalar_format_printf",
    "scalar_geo_haversine",
    "scalar_hash_funcs",
    "scalar_map_higher_order",
    "scalar_sequence_arrays",
    "scalar_str_to_map",
    "subq_cte_top_customers",
    "subq_in_uncorrelated",
    "subq_recursive_cte_day_spine",
    "text_bigram_counts",
    "text_bpe_pair_counts",
    "text_fingerprint",
    "text_keyword_tfidf_topk",
    "text_lm_score",
    "text_oov_rate",
    "text_profile_by_source",
    "text_token_count",
    "text_unicode_nfc",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every plan module (side-effect: registration) and return the
    full registry, reordered so the driver's 50-entry sample window covers
    :data:`DRIVER_SAMPLE_FIRST` before the registration-order remainder."""
    # Imports are deferred so plan modules can use the registry decorator
    # without circular imports.
    from slr207_mapreduce_spark.plans import (  # noqa: F401
        parity_queries,
        tpch,
        joins,
        aggregates,
        windows,
        setops,
        scalars,
        events,
        text_analysis,
        dedup_queries,
        similarity_queries,
        multimodal_queries,
        subqueries,
        pipeline_queries,
        tpch_extra,
        tpch_full,
        udf_queries,
        udtf_queries,
        asof_queries,
        graph_queries,
        relational_extra,
        scalars_extra,
        events_extra,
        agg_r2,
        events_r2,
        scalars_r2,
        text_r2,
        pipeline_r2,
        warehouse_r2,
        analytics_r2,
        pipeline_r3,
        pipeline_r4,
        pipeline_r4b,
        analytics_r4,
        analytics_r4c,
        analytics_r4d,
        recall_report,
        estimator_report,
        analytics_r5,
        analytics_r6,
        analytics_r7,
        analytics_r8,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_SAMPLE_FIRST:
        ordered[name] = REGISTRY[name]  # KeyError = stale rotation list
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
