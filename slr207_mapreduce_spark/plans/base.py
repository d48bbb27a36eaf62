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
# Round 12 (this list): the third FRESHNESS rotation. Policy, pinned by
# tests/test_oracle.py::test_driver_sample_rotation: the 45 non-sentinel
# slots are EXACTLY the 45 stalest registry names under the deterministic
# order (last-adjudicated round, name) with never-adjudicated names
# treated as round 0 — so min(last-adjudicated round) over the registry
# rises every round and staleness can never silently accumulate again.
# For r12 (computed by tools/rotation.py over CORRECTNESS_r01..r11) that
# is the never-adjudicated r12 additions first (stalest by definition),
# then the displaced r05 tail (udf_pandas_scalar_net_price,
# udtf_positioned_words, wordcount_sequential_oracle) and the r06 block —
# graph_* trio, events_sessionization_capped /
# events_overlap_join_bucketed, agg_histogram_equidepth, the q4-q22
# TPC-H names, scalar_*, stats_*, window frame names — in tie-break
# order, filling the remaining slots from the r07 block.
#
# WINDOW_ROUND declares which round this window serves; the rotation test
# computes the expected window from artifacts of rounds < WINDOW_ROUND, so
# the driver landing CORRECTNESS_r{WINDOW_ROUND}.json after the final
# commit does not redden a finished tree (r10 VERDICT item 1).
WINDOW_ROUND: int = 12
#
# Registry-growth policy (r07 VERDICT item 5): any query registered after
# the r07 snapshot (tests/data/registry_r07.txt) must appear in
# DRIVER_SAMPLE_FIRST for the round it lands in, or be listed here with a
# reason — tests/test_oracle.py::test_registry_growth_joins_driver_window
# enforces it.  Keep this empty unless a new query genuinely must wait a
# round (e.g. the window is already full of higher-priority backlog).
DEFERRED_NEW_NAMES: tuple[str, ...] = ()

# Every name in the r12 window carries a DuckDB oracle — the rotation
# test pins this empty.
ROWS_ONLY_WINDOW_NAMES: tuple[str, ...] = ()

DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r11)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # --- new this round (never adjudicated; stalest by definition) ---
    "dedup_semantic_semdedup",
    "embedding_kmeans_train",
    "estimator_countmin_bounds",
    "pipeline_crossmodal_dedup",
    # --- the r05 tail displaced by the r11 additions ---
    "udf_pandas_scalar_net_price",
    "udtf_positioned_words",
    "wordcount_sequential_oracle",
    # --- the r06 block, in (round, name) tie-break order ---
    "agg_histogram_equidepth",
    "events_overlap_join_bucketed",
    "events_sessionization_capped",
    "graph_bfs_distances",
    "graph_degree_hubs",
    "graph_triangle_count",
    "multimodal_blob_dedup",
    "multimodal_cross_modal_join",
    "pipeline_integrity_audit",
    "q11_important_part_value",
    "q12_priority_by_linestatus",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_potential_promotion",
    "q22_global_sales_opportunity",
    "q4_order_priority_exists",
    "q7_volume_shipping",
    "scalar_datetime_extra",
    "scalar_higher_order_funcs",
    "scalar_json_funcs",
    "scalar_map_type",
    "scalar_try_functions",
    "scalar_url_parse",
    "scalar_variant_type",
    "scalar_xml_extract",
    "stat_crosstab",
    "stats_column_profile",
    "stats_profile_drift",
    "stats_robust",
    "warehouse_snapshot_diff",
    "window_count_distinct_frame",
    "window_numeric_range_frame",
    "window_share_of_total",
    # --- the head of the r07 block fills the remaining slot ---
    "agg_bitmap_distinct",
    # (the r12 additions displaced agg_bitwise_bool through
    # agg_filter_clause; they and the rest of the r07 block lead the
    # r13 backlog)
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
    )

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_SAMPLE_FIRST:
        ordered[name] = REGISTRY[name]  # KeyError = stale rotation list
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
