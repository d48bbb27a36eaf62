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


def _prior_adjudicated(
    rounds=("r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08")
):
    import json
    import os

    repo = os.path.join(os.path.dirname(__file__), "..")
    prior = set()
    for rnd in rounds:
        path = os.path.join(repo, f"CORRECTNESS_{rnd}.json")
        if os.path.exists(path):
            with open(path) as f:
                prior |= set(json.load(f))
    return prior


def test_driver_sample_rotation():
    """Round-9 contract (the tail-closure round): the driver adjudicates
    the FIRST 50 registry entries.  Pin that the rotation list is exactly
    the first-50 window, that every entry except the two documented
    rows-only estimators has an oracle, and — the round-8 verdict's #1
    item — that EVERY name never adjudicated in r01-r08 sits inside the
    window, so the round closes cumulative adjudication at 251/251."""
    from slr207_mapreduce_spark.plans.base import (
        DRIVER_SAMPLE_FIRST,
        ROWS_ONLY_WINDOW_NAMES,
    )

    specs = _specs()
    first50 = list(specs)[:50]
    assert list(DRIVER_SAMPLE_FIRST) == first50
    no_oracle = {n for n in first50 if specs[n].oracle is None}
    assert no_oracle == set(ROWS_ONLY_WINDOW_NAMES)

    prior = _prior_adjudicated()
    if prior:
        never_seen = set(specs) - prior
        outside = never_seen - set(first50)
        assert not outside, (
            f"r09 must close the adjudication tail; missing from the "
            f"driver window: {sorted(outside)}"
        )


def test_registry_growth_joins_driver_window():
    """Registry-growth policy (r07 VERDICT item 5): a query added after the
    r07 registry snapshot must either sit in the current round's
    DRIVER_SAMPLE_FIRST window or carry an explicit deferral in
    base.DEFERRED_NEW_NAMES — new code must not silently join the
    never-adjudicated backlog."""
    import os

    from slr207_mapreduce_spark.plans.base import (
        DEFERRED_NEW_NAMES,
        DRIVER_SAMPLE_FIRST,
    )

    snap_path = os.path.join(os.path.dirname(__file__), "data", "registry_r07.txt")
    with open(snap_path) as f:
        snapshot = {line.strip() for line in f if line.strip()}
    specs = _specs()
    new_names = set(specs) - snapshot
    uncovered = new_names - set(DRIVER_SAMPLE_FIRST) - set(DEFERRED_NEW_NAMES)
    assert not uncovered, (
        f"names added after the r07 snapshot must enter DRIVER_SAMPLE_FIRST "
        f"or DEFERRED_NEW_NAMES: {sorted(uncovered)}"
    )
    # deferrals must be real registry names (no stale entries)
    assert set(DEFERRED_NEW_NAMES) <= set(specs)


def test_bench_queries_are_registered_and_oracled():
    """Every headline bench query must exist in the registry and carry a
    full DuckDB oracle — the bench set is the most-audited surface."""
    import bench

    from slr207_mapreduce_spark.plans.base import all_queries

    specs = all_queries()
    for name in bench.BENCH_QUERIES:
        assert name in specs, name
        assert specs[name].oracle is not None, name
