"""Fault-tolerance evidence in the suite (r10, VERDICT r09 item 3).

The reference engine has NO failure story (SURVEY.md §4.1: its retry
counter at WorkerSender.java:194 is decremented but never consulted, and a
lost worker hangs the job); this engine's claim is Spark lineage retry +
streaming checkpoint recovery. tools/chaos_check.py proves both by
actually injecting failures; it needs its own `local[8,3]` master
(spark.task.maxFailures=3 — the suite session runs plain local[N] where
any task failure is fatal), so it runs as a subprocess here.
"""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow  # >30 s scale/e2e leg (r15 VERDICT item 2)
def test_chaos_check_green():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "chaos_check.py")],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    a = out["leg_a_task_retry"]
    # chaos must actually have fired — a zero-injection pass is vacuous
    assert a["injected_failures"] > 0
    assert all(q["oracle_match"] for q in a["queries"].values())
    b = out["leg_b_stream_recovery"]
    assert b["first_run_crashed"] and b["resumed_run_completed"]
    assert b["mismatch_rows"] == 0 and b["sink_rows"] > 0
