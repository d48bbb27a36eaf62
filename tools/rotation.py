"""Print the next round's DRIVER_SAMPLE_FIRST under the freshness policy.

The policy (pinned by tests/test_oracle.py::test_driver_sample_rotation):
the driver's 50-query window = the 5 standing sentinels + the 45 stalest
registry names under the deterministic order (last-adjudicated round,
name), never-adjudicated names sorting first as round 0. This helper
recomputes that list from the CORRECTNESS_r*.json artifacts so the next
round's rotation is a paste, not an audit.

Usage: python tools/rotation.py        # prints the suggested tuple body
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SENTINELS = (
    "wordcount_topk",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "join_salted",
    "events_sessionization",
)


def last_adjudicated() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rnd)
    return last


def main() -> int:
    from slr207_mapreduce_spark.plans.base import (
        REWRITTEN_PRIORITY_NAMES,
        all_queries,
    )

    specs = all_queries()
    last = last_adjudicated()
    # r16 policy extension: the rewritten-priority tier (implementation
    # changed after last adjudication) goes right after the sentinels;
    # staleness fills the remainder. NOTE: at each round start, drain
    # REWRITTEN_PRIORITY_NAMES of names the newest artifact adjudicated.
    prio = [n for n in REWRITTEN_PRIORITY_NAMES if n in specs]
    rest = sorted(
        (n for n in specs if n not in SENTINELS and n not in prio),
        key=lambda n: (last.get(n, 0), n),
    )
    window = list(SENTINELS) + prio + rest[: 45 - len(prio)]
    no_oracle = [n for n in window if specs[n].oracle is None]
    max_round = max(last.values(), default=0)
    print(f"# suggested WINDOW_ROUND: {max_round + 1}")
    print("# suggested DRIVER_SAMPLE_FIRST (sentinels + 45 stalest):")
    for n in window:
        print(f'    "{n}",  # last r{last.get(n, 0):02d}')
    print(f"# ROWS_ONLY_WINDOW_NAMES must be: {tuple(no_oracle)!r}")
    staleness = [last.get(n, 0) for n in specs]
    print(
        f"# registry min/median last-adjudicated: {min(staleness)}/"
        f"{sorted(staleness)[len(staleness) // 2]}; window covers every "
        f"name at round {min(staleness)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
