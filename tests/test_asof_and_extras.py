"""Edge-case tests: as-of join, per-partition top-K containment, approx
percentile error bounds."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    from slr207_mapreduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # before any right row
            (1, _ts("2024-01-01T12:00:00"), "p2"),  # exactly at right row (inclusive)
            (1, _ts("2024-01-01T13:00:00"), "p3"),  # after both right rows
            (2, _ts("2024-01-01T12:00:00"), "p4"),  # key with no right rows
        ],
        ["k", "t", "pid"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), "v1"),
            (1, _ts("2024-01-01T12:00:00"), "v2"),
        ],
        ["k", "t", "vid"],
    )
    out = {
        r["pid"]: r["vid_right"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="t", right_payload=["vid"]
        ).collect()
    }
    assert out == {"p1": None, "p2": "v2", "p3": "v2", "p4": None}


def test_per_partition_topk_contains_global_topk(spark):
    """Union of per-partition counts re-aggregated must reproduce the global
    top-K (the property that made the reference's dead global merge
    recoverable from per-worker state)."""
    from slr207_mapreduce_spark.parity.wordcount import (
        word_count_topk,
        word_count_topk_per_partition,
    )
    from slr207_mapreduce_spark.sources.tables import load_table

    docs = (
        load_table(spark, "documents", SF_SMOKE)
        .select(F.col("text").alias("value"))
        .repartition(8)
    )
    per_part = word_count_topk_per_partition(docs, k=10**9)  # no truncation
    merged = (
        per_part.groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )
    global_topk = word_count_topk(docs, k=20)
    assert [tuple(r) for r in merged.collect()] == [
        tuple(r) for r in global_topk.collect()
    ]
    # sanity: the per-partition frame really is partition-scoped
    assert per_part.select("partition_id").distinct().count() > 1


def test_approx_percentile_error_bounded(spark):
    from slr207_mapreduce_spark.plans.base import all_queries
    from slr207_mapreduce_spark.sources.tables import load_table

    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in all_queries()["events_approx_percentiles"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    e = load_table(spark, "events", SF_SMOKE)
    values = {}
    for r in e.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    # approx result must fall inside the p±0.03 rank window of the exact
    # sorted values (sketch guarantee is rank-error, not value-error — in a
    # sparse tail neighboring ranks can be far apart in value).
    for et, approx in got.items():
        xs = sorted(values[et])
        n = len(xs)
        for p, a in zip((0.5, 0.9, 0.99), approx):
            lo = xs[max(0, int((p - 0.03) * n) - 1)]
            hi = xs[min(n - 1, int((p + 0.03) * n))]
            assert lo <= a <= hi, (et, p, a, lo, hi)


def test_hll_mergeable_sketches_exact_at_low_cardinality(spark):
    """The rows-only sketch query: per-group HLL estimates must equal the
    exact distinct counts at this cardinality (HLL sparse mode), and the
    union-merged global estimate must equal the true global distinct —
    the re-aggregation property that makes sketches the 100 TB rollup
    path."""
    from slr207_mapreduce_spark.plans.base import all_queries

    from tests.conftest import SF_CORRECT

    rows = (
        all_queries()["agg_hll_mergeable_sketches"]
        .build(spark, SF_CORRECT)
        .collect()
    )
    by_lang = {r["lang"]: r for r in rows}
    d = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    truth_all = d.select("source").distinct().count()
    assert by_lang["__all__"]["est_sources"] == truth_all
    for lang, r in by_lang.items():
        if lang == "__all__":
            continue
        assert r["est_sources"] == r["exact_sources"], lang


def test_interval_overlap_bucketed_hand_cases(spark):
    """Bucketed overlap join: exactly one output row per overlapping pair,
    including pairs whose overlap spans many buckets; touching endpoints
    (closed intervals) match; disjoint pairs don't."""
    import datetime as dt

    from slr207_mapreduce_spark.operators.interval import (
        interval_overlap_join_bucketed,
    )

    T = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, T("2024-01-01 00:00:00"), T("2024-01-10 00:00:00")),  # 10 buckets
            (2, T("2024-01-03 12:00:00"), T("2024-01-03 13:00:00")),
            (3, T("2024-02-01 00:00:00"), T("2024-02-01 01:00:00")),
        ],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            (10, T("2024-01-02 00:00:00"), T("2024-01-08 00:00:00")),  # overlaps 1
            (11, T("2024-01-03 13:00:00"), T("2024-01-04 00:00:00")),  # touches 2
            (12, T("2024-03-01 00:00:00"), T("2024-03-02 00:00:00")),  # disjoint
        ],
        ["rid", "rs", "re"],
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join_bucketed(
            left, right, "ls", "le", "rs", "re", bucket_seconds=86400
        ).collect()
    )
    # (1,10): overlap spans 7 buckets -> must appear exactly once
    # (2,10): contained; (2,11): endpoints touch (closed intervals)
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11)]


def test_interval_overlap_bucketed_plan_is_equi_join(spark):
    """The large x large overlap strategy must plan as a hash/sort-merge
    equi-join on the bucket id — never BroadcastNestedLoopJoin or a
    cartesian product."""
    from slr207_mapreduce_spark.plans.base import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["events_overlap_join_bucketed"].build(spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_forward_hand_cases(spark):
    """Forward as-of: inclusive at equal timestamps, earliest-following
    wins, tie-break by payload id, NULL when nothing follows."""
    import datetime as dt

    from slr207_mapreduce_spark.operators.asof import asof_join_forward

    T = lambda s: dt.datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 100),
            (1, T("2024-01-01 12:00:00"), 101),
            (2, T("2024-01-01 09:00:00"), 200),
        ],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 7),   # equal ts -> inclusive match
            (1, T("2024-01-01 10:00:00"), 5),   # simultaneous: smaller id wins
            (1, T("2024-01-01 11:00:00"), 9),
        ],
        ["k", "ts", "rid"],
    )
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join_forward(
            left, right, key="k", left_time="ts", right_time="ts",
            right_payload=["rid"], tie_break="rid",
        ).collect()
    }
    assert got == {100: 5, 101: None, 200: None}
