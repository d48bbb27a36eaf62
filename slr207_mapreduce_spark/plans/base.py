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
# slice (wordcount/tpch/join/agg/window/setop/scalar), leaving 152 registered
# queries adjudicated only by the local replica gate.  Round 4 rotates the
# sample: 5 sentinels with a three-round green history anchor continuity, and
# the remaining 45 slots surface the highest-risk never-sampled families
# (dedup_*, knn_*/embedding_*, pipeline_*, text_*, hard TPC-H, udf_*/udtf_*,
# subq_*, events_*, graph_*, asof_*).  Every name listed here has an oracle
# (no rows-only specs — the sample should produce hash verdicts, not
# `no_oracle` rows).  tests/test_oracle.py::test_driver_sample_rotation pins
# this contract.
DRIVER_SAMPLE_FIRST: tuple[str, ...] = (
    # sentinels (green in CORRECTNESS_r01-r03)
    "wordcount_topk",
    "wordcount_sequential_oracle",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_cluster_keep_canonical",
    "dedup_semantic_clusters",
    # similarity / ANN
    "knn_bruteforce",
    "knn_lsh_bucketed",
    "knn_ivf",
    "knn_pq_adc",
    "embedding_neardup_pairs",
    "embedding_normalize_quantize",
    "embedding_centroid_by_label",
    # curation pipeline
    "pipeline_domain_cap",
    "pipeline_train_split",
    "pipeline_stratified_sample",
    "pipeline_mixture_reweight",
    "pipeline_decontaminate",
    "pipeline_quality_quantile",
    "pipeline_repetition_filter",
    "pipeline_chunk_documents",
    "pipeline_pack_sequences",
    # text analysis
    "text_langid",
    "text_quality",
    "text_term_stats",
    "text_bm25",
    "text_inverted_index",
    "text_doc_similarity_sparse",
    # hard TPC-H
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    # UDF surfaces
    "udf_encode_tokens",
    "udf_pandas_scalar_net_price",
    "udf_apply_in_pandas_gap",
    "udtf_positioned_words",
    # subqueries
    "subq_scalar_global_avg",
    "subq_correlated_avg_per_brand",
    "subq_lateral_topk_per_nation",
    # events / graph / asof
    "events_sessionization",
    "graph_pagerank",
    "asof_purchase_last_view",
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
