"""Stable sequential-ID assignment without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset onto ONE task — the classic driver-shaped bottleneck that
cannot work at 100 TB. This operator produces the identical dense rank
0..N-1 with the two-pass zipWithIndex technique the RDD API uses,
expressed on DataFrames:

1. range-repartition + sort-within-partitions by the (total) ordering key
   — a distributed sort, every task bounded;
2. count rows per partition (small job over partition ids);
3. cumulative-sum those counts on the driver (one row per partition) into
   per-partition offsets;
4. mapInPandas adds offset + within-partition ordinal, streaming Arrow
   batches with a running counter — no per-partition materialization.

The assigned id equals the global rank in the total order REGARDLESS of
where range-partition boundaries land, because offsets are computed from
actual partition sizes — which is what makes the result deterministic and
oracle-checkable while remaining fully parallel.

CRITICAL: the sorted layout is frozen with an eager ``localCheckpoint``
before the sizes pass. ``repartitionByRange`` derives its boundaries from
a RANDOM sample whose seed is NOT stable across jobs, so without the
freeze the sizes job and the id-assignment job can see DIFFERENT
partition layouts — offsets then disagree with actual partition contents
and ids silently collide. Small inputs mask the bug (the boundary sample
covers every row, making boundaries deterministic), which is exactly why
it survives tiny-SF gates and detonates at scale: observed at 60 k rows
as 57 345 distinct ids out of 60 000. The checkpoint pins the result
frame's blocks for the session; long-lived callers can free them after
their terminal action via ``operators.graph.release_result``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_by: list,
    id_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0..N-1 ids in the total order of ``order_by`` (must be a
    unique key for the ids to be deterministic). Entries may be column
    names (ascending) or Column sort expressions (e.g. ``F.desc(...)``)."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    cols = [F.asc(c) if isinstance(c, str) else c for c in order_by]
    # eager checkpoint FREEZES the range-partitioned layout (module
    # docstring: boundary sampling is not job-stable) so the sizes pass
    # and the id pass read the same physical partitions
    sorted_df = (
        df.repartitionByRange(int(n), *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["cnt"]  # Row.__pid would trip Row's dunder guard
        for r in sorted_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    out_schema = sorted_df.drop("__pid").schema.add(id_col, "long", False)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns="__pid")
            pdf[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return sorted_df.mapInPandas(add_ids, schema=out_schema)


def with_running_total(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "running_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` in the total order of
    ``order_by`` — ``SUM() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    minus the current row, without the single-task global window: the same
    two-pass shape as :func:`assign_sequential_ids` with per-partition
    SUMS (not counts) prefix-summed on the driver."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    cols = [F.asc(c) for c in order_by]
    # same layout-freeze as assign_sequential_ids (see module docstring)
    sorted_df = (
        df.repartitionByRange(int(n), *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["__pid"]: r["s"]
        for r in sorted_df.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    out_schema = sorted_df.drop("__pid").schema.add(out_col, "long", False)

    def add_prefix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns="__pid")
            csum = pdf[value_col].cumsum()
            pdf[out_col] = base + seen + csum - pdf[value_col]
            seen += int(csum.iloc[-1])
            yield pdf

    return sorted_df.mapInPandas(add_prefix, schema=out_schema)
