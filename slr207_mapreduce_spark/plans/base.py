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


def all_queries() -> dict[str, QuerySpec]:
    """Import every plan module (side-effect: registration) and return the
    full registry."""
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
    )

    return dict(REGISTRY)
