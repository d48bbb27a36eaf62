"""As-of join — a custom operator Spark lacks natively (SURVEY.md §2.1
"custom operators" note; DuckDB ships it as ASOF JOIN, which is the oracle).

Semantics: for each left row (key, t), attach the right row with the same
key and the greatest right-time ≤ t (the "latest state as of t").

Scalable construction (composition of built-ins — no Pandas UDF needed):
tag both sides, UNION, window over (key) ordered by (time, side-priority),
carry the last seen right-payload forward with ``last(..., ignorenulls)``,
keep left rows. One shuffle on the key, one in-partition sort — same cost
as a sort-merge join, with NO range-explosion (a naive t_right ≤ t_left
theta-join is quadratic per key; the carry-forward is linear).

The window orders right rows BEFORE left rows at equal timestamps
(side_priority 0 < 1), giving the standard inclusive (≤) as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tie_break: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + latest right payload at/before its
    time. Right-side NULL payloads when no prior right row exists.

    ``tie_break``: optional right-side column ordering simultaneous right
    rows (latest wins); defaults to right_time only. Right payload columns
    come out as ``<name><suffix>`` so they never collide with left columns.
    """
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    rt = right.select(
        F.col(key),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != key],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).select(*l_cols, "__t", "__side", *[f"__r_{c}" for c in right_payload])

    order = [F.asc("__t"), F.asc("__side")]
    if tie_break:
        order.append(F.asc_nulls_first(f"__r_{tie_break}"))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    carried = unioned.select(
        *l_cols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tie_break: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """FORWARD as-of join: every left row + EARLIEST right payload at/after
    its time (the "next event following" direction — next purchase after a
    view, next maintenance after a failure). DuckDB's ASOF JOIN is
    backward-only, so the oracle for this one is the classic correlated
    MIN-timestamp construction.

    Same union+window shape as :func:`asof_join`, traversed DESCENDING:
    scanning times high→low, the last right row seen at any left row is
    the one with the SMALLEST right-time ≥ the left time. Right rows sort
    before left rows at equal timestamps, giving inclusive (≥) semantics.
    One shuffle on the key, one in-partition sort — linear, no
    range-explosion.
    """
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    rt = right.select(
        F.col(key),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != key],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).select(*l_cols, "__t", "__side", *[f"__r_{c}" for c in right_payload])

    order = [F.desc("__t"), F.asc("__side")]
    if tie_break:
        # among simultaneous right rows the EARLIEST by tie_break wins:
        # descending traversal keeps the LAST seen, so sort tie_break desc
        order.append(F.desc_nulls_first(f"__r_{tie_break}"))
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    carried = unioned.select(
        *l_cols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")
