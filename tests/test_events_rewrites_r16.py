"""Edge-semantics pins for the r16 events rewrites (OPTIMIZATION_r16.md):

- events_funnel_stages: window-chained stage minimums -> single-exchange
  aggregation form (collect_list + array filters). The strict-ordering and
  null-propagation corners (stage event missing, tie timestamps, stage
  event BEFORE its predecessor) must match the registered DuckDB oracle
  exactly on a corpus built to hit each corner.
- events_gap_filled_hours: bounds-scan + spine left-join -> single-scan
  lead-derived spine. Gap runs, adjacent hours, and the single-hour corpus
  must reproduce the oracle's generate_series spine exactly.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

from slr207_mapreduce_spark.plans.base import all_queries


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# (event_id, ts, user_id, event_type, value, props)
_FUNNEL_ROWS = [
    # u1: clean view -> click -> purchase (counts in all three stages)
    (1, _ts("2024-01-01T10:00:00"), 1, "view", 1.0, "{}"),
    (2, _ts("2024-01-01T10:05:00"), 1, "click", 1.0, "{}"),
    (3, _ts("2024-01-01T10:10:00"), 1, "purchase", 1.0, "{}"),
    # u2: click strictly BEFORE the first view -> s2 must not count it;
    # the later purchase follows the click but t2 is NULL -> s3 no.
    (4, _ts("2024-01-01T11:00:00"), 2, "click", 1.0, "{}"),
    (5, _ts("2024-01-01T11:30:00"), 2, "view", 1.0, "{}"),
    (6, _ts("2024-01-01T12:00:00"), 2, "purchase", 1.0, "{}"),
    # u3: click at EXACTLY the view timestamp (strict > fails), second
    # click later (counts); purchase exactly at that second click's ts
    # (strict > fails for s3).
    (7, _ts("2024-01-01T09:00:00"), 3, "view", 1.0, "{}"),
    (8, _ts("2024-01-01T09:00:00"), 3, "click", 1.0, "{}"),
    (9, _ts("2024-01-01T09:30:00"), 3, "click", 1.0, "{}"),
    (10, _ts("2024-01-01T09:30:00"), 3, "purchase", 1.0, "{}"),
    # u4: purchases and clicks only, no view anywhere -> no stage counts.
    (11, _ts("2024-01-01T08:00:00"), 4, "click", 1.0, "{}"),
    (12, _ts("2024-01-01T08:30:00"), 4, "purchase", 1.0, "{}"),
    # u5: view only.
    (13, _ts("2024-01-01T07:00:00"), 5, "view", 1.0, "{}"),
    # u6: multiple views; click after the SECOND view only — t1 is the
    # FIRST view, so the click still qualifies (> first view).
    (14, _ts("2024-01-01T06:00:00"), 6, "view", 1.0, "{}"),
    (15, _ts("2024-01-01T06:30:00"), 6, "view", 1.0, "{}"),
    (16, _ts("2024-01-01T06:45:00"), 6, "click", 1.0, "{}"),
    # noise types must be ignored entirely
    (17, _ts("2024-01-01T05:00:00"), 1, "error", 9.0, "{}"),
    (18, _ts("2024-01-01T05:01:00"), 2, "signup", 9.0, "{}"),
]

# Hours 10:00 (2 events), 13:00 (1 event) with a 2-hour gap; one event at
# 13:59:59 stays in hour 13.
_GAP_ROWS = [
    (1, _ts("2024-03-01T10:05:00"), 1, "view", 1.5, "{}"),
    (2, _ts("2024-03-01T10:55:00"), 2, "click", 2.25, "{}"),
    (3, _ts("2024-03-01T13:00:00"), 3, "view", 4.0, "{}"),
    (4, _ts("2024-03-01T13:59:59"), 4, "view", 8.0, "{}"),
]


def _write_events(spark, tmp_path, rows, name):
    path = os.path.join(str(tmp_path), name)
    os.makedirs(path, exist_ok=True)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    return path


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'events.parquet', '*.parquet')}')"
    )
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_funnel_stages_edge_corpus_matches_oracle(spark, tmp_path):
    spec = all_queries()["events_funnel_stages"]
    sf_dir = _write_events(spark, tmp_path, _FUNNEL_ROWS, "funnel")
    got = spec.build(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    # hand-derived: viewed = {1,2,3,5,6}; clicked-after-view = {1,3,6}
    # (u2's click precedes their first view); purchased-after-click = {1}
    # (u3's purchase ties its click's ts — strict > fails).
    assert (row["n_viewed"], row["n_clicked_after_view"], row["n_purchased_after_click"]) == (5, 3, 1)
    (orc,) = _oracle(sf_dir, spec.oracle)
    assert tuple(orc) == (5, 3, 1)


def test_gap_filled_hours_edge_corpus_matches_oracle(spark, tmp_path):
    spec = all_queries()["events_gap_filled_hours"]
    sf_dir = _write_events(spark, tmp_path, _GAP_ROWS, "gap")
    got = sorted(
        (r["hour"], r["n_events"], r["sum_value"])
        for r in spec.build(spark, sf_dir).collect()
    )
    expect = [
        (_ts("2024-03-01T10:00:00"), 2, 3.75),
        (_ts("2024-03-01T11:00:00"), 0, 0.0),
        (_ts("2024-03-01T12:00:00"), 0, 0.0),
        (_ts("2024-03-01T13:00:00"), 2, 12.0),
    ]
    assert got == expect
    orc = sorted(_oracle(sf_dir, spec.oracle))
    assert [tuple(r) for r in orc] == expect


def test_gap_filled_hours_single_hour(spark, tmp_path):
    spec = all_queries()["events_gap_filled_hours"]
    sf_dir = _write_events(spark, tmp_path, _GAP_ROWS[:1], "gap1")
    got = [
        (r["hour"], r["n_events"], r["sum_value"])
        for r in spec.build(spark, sf_dir).collect()
    ]
    assert got == [(_ts("2024-03-01T10:00:00"), 1, 1.5)]
