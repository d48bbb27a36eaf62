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

# Plan-only enumeration mode (r14 VERDICT item 7, carried from r13
# finding 3): the *_materialized queries RUN their staging write at
# plan-BUILD time — write-once semantics is their whole point — which
# made every registry enumerator (tools/plan_audit.py, test_plan_sweep,
# bench warm-up sweeps) pay store builds it never queries. Under
# :func:`plan_only`, those builders return their from-raw twin plan
# instead (semantically the identity — the materialized queries share
# their twin's oracle SQL precisely because the store changes WHERE
# cost is paid, not WHAT is computed) and touch no store. The twin is
# chosen over plan-over-store-if-present because it is DETERMINISTIC:
# a fresh clone has no .sfgen stores, so an environment-dependent
# branch would make plan fingerprints differ between checkouts.
_PLAN_ONLY: list[bool] = [False]


def plan_only_mode() -> bool:
    """True inside a :func:`plan_only` block — materializing builders
    must return their from-raw twin plan and perform no store writes."""
    return _PLAN_ONLY[-1]


class plan_only:
    """Context manager: enumerate registry plans without side effects."""

    def __enter__(self):
        _PLAN_ONLY.append(True)
        return self

    def __exit__(self, *exc):
        _PLAN_ONLY.pop()
        return False


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
# Round 15 (this list): the sixth FRESHNESS rotation. Policy, pinned by
# tests/test_oracle.py::test_driver_sample_rotation: the 45 non-sentinel
# slots are EXACTLY the 45 stalest registry names under the deterministic
# order (last-adjudicated round, name) with never-adjudicated names
# treated as round 0 — so min(last-adjudicated round) over the registry
# rises every round and staleness can never silently accumulate again.
# For r15 (computed by tools/rotation.py over CORRECTNESS_r01..r14) that
# is the never-adjudicated r15 additions first (stalest by definition),
# then the r08/r09 remainder — the multimodal decode block, the kNN
# search tiers, pipeline curation/sampling names, the q3/q5/q18 TPC-H
# trio, scalar variants, and the text LM block, in (round, name) order.
#
# WINDOW_ROUND declares which round this window serves; the rotation test
# computes the expected window from artifacts of rounds < WINDOW_ROUND, so
# the driver landing CORRECTNESS_r{WINDOW_ROUND}.json after the final
# commit does not redden a finished tree (r10 VERDICT item 1).
WINDOW_ROUND: int = 15
#
# Registry-growth policy (r07 VERDICT item 5): any query registered after
# the r07 snapshot (tests/data/registry_r07.txt) must appear in
# DRIVER_SAMPLE_FIRST for the round it lands in, or be listed here with a
# reason — tests/test_oracle.py::test_registry_growth_joins_driver_window
# enforces it.  Keep this empty unless a new query genuinely must wait a
# round (e.g. the window is already full of higher-priority backlog).
DEFERRED_NEW_NAMES: tuple[str, ...] = ()

# The r15 window reaches the r08/r09 adjudication remainder, which holds
# the registry's two rows-only approx estimators (their error bounds are
# separately hash-certified by estimator_error_report /
# dedup_minhash_estimator_error, both fully oracled) — the rotation test
# pins exactly these two.
ROWS_ONLY_WINDOW_NAMES: tuple[str, ...] = (
    "dedup_minhash_ml",
    "events_approx_percentiles",
)

DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r14)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # --- new this round (never adjudicated; stalest by definition),
    # then the stalest remainder: the tail of the r08 block and the r09
    # adjudication block (kNN search tiers, multimodal decode round
    # trips, pipeline curation/sampling, q3/q5/q18, scalar variants,
    # text LM block), in (round, name) order ---
    "pipeline_incremental_semantic_dedup_distributed",
    "retrieval_hybrid_rrf_batch",
    "udf_pandas_grouped_agg_range",
    "cdc_latest_state",
    "dedup_clusters",
    "dedup_minhash_ml",
    "dedup_semantic_clusters",
    "events_approx_percentiles",
    "graph_pagerank",
    "knn_bruteforce",
    "knn_ivf",
    "knn_jl_rerank",
    "knn_quantized_int8",
    "multimodal_gif_roundtrip",
    "multimodal_image_features",
    "multimodal_image_thumbnail",
    "multimodal_jpeg_color_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_mjpeg_avi_roundtrip",
    "multimodal_mulaw_roundtrip",
    "multimodal_png_roundtrip",
    "multimodal_ppm_resize_roundtrip",
    "multimodal_video_frame_index",
    "multimodal_video_frame_sample_roundtrip",
    "multimodal_wav_roundtrip",
    "pipeline_dataset_card",
    "pipeline_dedup_report",
    "pipeline_fractional_sample",
    "pipeline_fuzzy_name_pairs",
    "pipeline_phonetic_blocking",
    "pipeline_quality_percentile_by_source",
    "pipeline_redact",
    "pipeline_sample_exact_k",
    "pipeline_schema_evolution_union",
    "pipeline_weighted_sample",
    "q18_large_volume_customers",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scalar_binary_encodings",
    "scalar_bitwise_ops",
    "scalar_explode_outer",
    "scalar_lateral_column_alias",
    "scalar_to_json",
    "scalar_zorder_key",
    "text_bigram_lm",
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
