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
# Round 9 (this list) CLOSES the adjudication tail per VERDICT r08 item 1:
# every name with zero driver evidence across r01-r08 is in the window —
# the 18 oracled tail names (pipeline_* sampling/redact/fuzzy/phonetic/
# dataset-card block, text_bigram_lm / trigram_novelty / bpe_train_merges,
# scalar_bitwise_ops / lateral_column_alias / to_json / explode_outer /
# zorder_key / binary_encodings), the 2 rows-only estimators
# (events_approx_percentiles, dedup_minhash_ml — the driver's weaker
# rows-only check still counts as adjudication), the 3 r08 additions
# deferred via DEFERRED_NEW_NAMES (mu-law, MJPEG/AVI, schema-evolution
# union; MJPEG pre-flighted at 6.1 s vanilla sf0.01), and the 3 round-9
# rebased multimodal queries that replace the retired md5 `_stub` trio
# (VERDICT r08 item 5: image_features / image_thumbnail /
# video_frame_index, now on real PPM/RAWV decode paths).  The remaining
# slots are high-value re-runs: the 5 multi-round sentinels, the full
# real-codec family, the iterative graph/CC queries, the big TPC-H joins,
# the (re-planned this round) knn family, and the warehouse/CDC pair.
# After this window adjudicates, cumulative = 251/251 — every registered
# query driver-adjudicated.
# tests/test_oracle.py::test_driver_sample_rotation pins this contract
# (window ⊇ registry − union(CORRECTNESS_r01..r08)).
#
# Registry-growth policy (r07 VERDICT item 5): any query registered after
# the r07 snapshot (tests/data/registry_r07.txt) must appear in
# DRIVER_SAMPLE_FIRST for the round it lands in, or be listed here with a
# reason — tests/test_oracle.py::test_registry_growth_joins_driver_window
# enforces it.  Keep this empty unless a new query genuinely must wait a
# round (e.g. the window is already full of higher-priority backlog).
DEFERRED_NEW_NAMES: tuple[str, ...] = ()

# The two rows-only estimators below (events_approx_percentiles,
# dedup_minhash_ml) are the ONLY window entries without an oracle — the
# rotation test allowlists exactly these two.
ROWS_ONLY_WINDOW_NAMES: tuple[str, ...] = (
    "events_approx_percentiles",
    "dedup_minhash_ml",
)

DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (driver-green in r01-r08)
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
    # --- the 23-name adjudication tail (never driver-seen in r01-r08) ---
    # rows-only estimators
    "events_approx_percentiles",
    "dedup_minhash_ml",
    # r08 DEFERRED_NEW_NAMES
    "multimodal_mulaw_roundtrip",
    "multimodal_mjpeg_avi_roundtrip",
    "pipeline_schema_evolution_union",
    # pipeline tail
    "pipeline_dedup_report",
    "pipeline_sample_exact_k",
    "pipeline_weighted_sample",
    "pipeline_fractional_sample",
    "pipeline_redact",
    "pipeline_fuzzy_name_pairs",
    "pipeline_phonetic_blocking",
    "pipeline_dataset_card",
    "pipeline_quality_percentile_by_source",
    # text tail
    "text_bigram_lm",
    "text_trigram_novelty",
    "text_bpe_train_merges",
    # scalar tail
    "scalar_bitwise_ops",
    "scalar_lateral_column_alias",
    "scalar_to_json",
    "scalar_explode_outer",
    "scalar_zorder_key",
    "scalar_binary_encodings",
    # --- round-9 rebased multimodal queries (replace the md5 stub trio) ---
    "multimodal_image_features",
    "multimodal_image_thumbnail",
    "multimodal_video_frame_index",
    # --- high-value re-runs: real-codec family ---
    "multimodal_png_roundtrip",
    "multimodal_gif_roundtrip",
    "multimodal_jpeg_roundtrip",
    "multimodal_jpeg_color_roundtrip",
    "multimodal_wav_roundtrip",
    "multimodal_ppm_resize_roundtrip",
    "multimodal_video_frame_sample_roundtrip",
    # iterative graph/CC
    "dedup_clusters",
    "dedup_semantic_clusters",
    "graph_pagerank",
    # big TPC-H joins
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    # knn family (re-planned in round 9: BNLJ delisting + zero-norm guard)
    "knn_bruteforce",
    "knn_ivf",
    "knn_jl_rerank",
    "knn_quantized_int8",
    # warehouse/CDC pair
    "cdc_latest_state",
    "warehouse_incremental_agg_merge",
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
