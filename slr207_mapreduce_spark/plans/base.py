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
# Round 13 (this list): the fourth FRESHNESS rotation. Policy, pinned by
# tests/test_oracle.py::test_driver_sample_rotation: the 45 non-sentinel
# slots are EXACTLY the 45 stalest registry names under the deterministic
# order (last-adjudicated round, name) with never-adjudicated names
# treated as round 0 — so min(last-adjudicated round) over the registry
# rises every round and staleness can never silently accumulate again.
# For r13 (computed by tools/rotation.py over CORRECTNESS_r01..r12) that
# is any never-adjudicated r13 additions first (stalest by definition),
# then the r07 adjudication block — the setop-era agg_* names, asof_*,
# the events batch analogues, pipeline curation names, scalar/math
# variants, pivot/scd2/unpivot, udf_map_in_arrow and the udtf pair —
# with the head of the r08 block filling the remaining slots.
#
# WINDOW_ROUND declares which round this window serves; the rotation test
# computes the expected window from artifacts of rounds < WINDOW_ROUND, so
# the driver landing CORRECTNESS_r{WINDOW_ROUND}.json after the final
# commit does not redden a finished tree (r10 VERDICT item 1).
WINDOW_ROUND: int = 13
#
# Registry-growth policy (r07 VERDICT item 5): any query registered after
# the r07 snapshot (tests/data/registry_r07.txt) must appear in
# DRIVER_SAMPLE_FIRST for the round it lands in, or be listed here with a
# reason — tests/test_oracle.py::test_registry_growth_joins_driver_window
# enforces it.  Keep this empty unless a new query genuinely must wait a
# round (e.g. the window is already full of higher-priority backlog).
DEFERRED_NEW_NAMES: tuple[str, ...] = ()

# Every name in the r13 window carries a DuckDB oracle — the rotation
# test pins this empty.
ROWS_ONLY_WINDOW_NAMES: tuple[str, ...] = ()

DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r12)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # --- new this round (never adjudicated; stalest by definition) ---
    "dedup_semantic_knn_graph",
    "knn_graph_ivf",
    "knn_ivf_pq",
    "pipeline_crossmodal_dedup_materialized",
    "semdedup_recall_report",
    # --- the 40 remaining stalest: the r07 adjudication block (setop-era
    # agg_*, asof_*, events_*, pipeline_*, scalar_*, udf/udtf, pivot,
    # scd2, text_bpe) then the r08 head, in (round, name) order ---
    "agg_bitwise_bool",
    "agg_count_min_frequency",
    "agg_exact_percentiles",
    "agg_filter_clause",
    "agg_grouping_flags",
    "agg_histogram_equiwidth",
    "agg_hll_portable",
    "agg_min_by_max_by",
    "agg_mode_deterministic",
    "agg_mode_exact",
    "agg_multi_distinct",
    "agg_percentile_disc",
    "agg_regression_exact",
    "agg_salted_skewed_groups",
    "agg_skew_kurt_exact",
    "agg_string_agg_ordered",
    "agg_width_bucket_histogram",
    "asof_next_purchase_after_view",
    "asof_tolerance_30m",
    "dedup_simhash_pairs",
    "dedup_streaming_gate_batch",
    "dedup_substring_spans",
    "events_dedup_latest",
    "events_funnel",
    "events_retention_cohort",
    "events_session_window_batch",
    "events_sessionization_capped_segmented",
    "events_tumbling_window",
    "pipeline_curation_end_to_end",
    "pipeline_incremental_dedup",
    "pipeline_json_ingest_quarantine",
    "pivot_status_by_priority",
    "scalar_array_map_funcs",
    "scalar_conditional_null",
    "scalar_math_funcs",
    "scd2_user_status_history",
    "text_bpe_apply",
    "udf_map_in_arrow",
    "udtf_inline_structs",
    "udtf_stack_measures",
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
    )

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_SAMPLE_FIRST:
        ordered[name] = REGISTRY[name]  # KeyError = stale rotation list
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
