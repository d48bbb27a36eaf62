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
# queries() each round.  Rounds 1-3 sampled the identical registration-order
# slice; round 4 rotated to the dedup/knn/pipeline/text/hard-TPCH families
# (driver-green in r04 AND r05).  Round 6 rotates again: 5 sentinels with a
# multi-round green history anchor continuity, and the remaining 45 slots
# surface names with ZERO driver adjudication across r01-r05 — multimodal_*
# (the component promoted to done with no driver evidence), graph_*,
# stats_*, window_*, scalar_*, the remaining TPC-H queries, and the
# scale-risk operators the round-5 verdict called out (sessionization_capped,
# overlap_join_bucketed, knn_jl_rerank/quantized_int8, histogram_equidepth).
# Every name listed here has an oracle (hash verdicts, not `no_oracle`
# rows).  tests/test_oracle.py::test_driver_sample_rotation pins this
# contract.
#
# ROUND-7 ROTATION PLAN (do this next round): assuming r06 adjudicates
# this window, 103 oracled names remain with no driver evidence — fill
# the next 45 slots from (priority order): the remaining agg_* block
# (~18), the scalar_* block (~16), the full events_* block (~13),
# pipeline_* (~16, incl. curation_end_to_end / incremental_dedup /
# ingest quarantines), text_* (~13, incl. the BPE family),
# dedup_substring_* / simhash_pairs / streaming_gate_batch,
# events_sessionization_capped_segmented, udf_map_in_arrow / udtf_*,
# asof_* / cdc / scd2 / pivot / unpivot / warehouse_incremental.
# Compute the exact list with:
#   seen = union of CORRECTNESS_r0*.json keys; remaining = registry - seen
# and update test_driver_sample_rotation's prior-rounds tuple to r01-r06.
DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r05)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # multimodal (never driver-adjudicated; real codecs)
    "multimodal_wav_roundtrip",
    "multimodal_ppm_resize_roundtrip",
    "multimodal_png_roundtrip",
    "multimodal_video_frame_sample_roundtrip",
    "multimodal_cross_modal_join",
    "multimodal_blob_dedup",
    "multimodal_features",
    "multimodal_resize",
    # graph
    "graph_triangle_count",
    "graph_bfs_distances",
    "graph_degree_hubs",
    # data QA / stats
    "stats_column_profile",
    "stats_profile_drift",
    "stats_robust",
    "stat_crosstab",
    "pipeline_integrity_audit",
    # scale-risk operators from the r5 verdict
    "events_overlap_join_bucketed",
    "events_sessionization_capped",
    "agg_histogram_equidepth",
    "knn_jl_rerank",
    "knn_quantized_int8",
    # window frames
    "window_count_distinct_frame",
    "window_numeric_range_frame",
    "window_share_of_total",
    # scalar blocks
    "scalar_json_funcs",
    "scalar_higher_order_funcs",
    "scalar_map_type",
    "scalar_url_parse",
    "scalar_variant_type",
    "scalar_xml_extract",
    "scalar_datetime_extra",
    "scalar_try_functions",
    # remaining TPC-H (q4/q7/q11-q17/q19/q20/q22)
    "q4_order_priority_exists",
    "q7_volume_shipping",
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
    # warehouse
    "warehouse_snapshot_diff",
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
    )

    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_SAMPLE_FIRST:
        ordered[name] = REGISTRY[name]  # KeyError = stale rotation list
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
