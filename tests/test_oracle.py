"""The local replica of the driver's t2 gate: every registered query with an
oracle must EXACTLY match DuckDB on sf0.01 (row count, column names, values).
Strictly stronger than the driver's value-hash."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT


def _specs():
    from slr207_mapreduce_spark.plans.base import all_queries

    return all_queries()


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        metafunc.parametrize("qname", sorted(_specs()))


def test_query_matches_oracle(spark, duck, qname):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check import compare

    spec = _specs()[qname]
    spark_pdf = spec.build(spark, SF_CORRECT).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck.execute(spec.oracle).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{qname}: {problems[:5]}"
