"""The declared query set: every operator capability from SURVEY.md §2 as a
(name, Spark builder, DuckDB oracle SQL) triple, collected in a registry."""

from slr207_mapreduce_spark.plans.base import QuerySpec, REGISTRY, register, all_queries  # noqa: F401
