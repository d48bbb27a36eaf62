"""Property tests: the engine-portability contracts that the whole oracle
gate rests on, checked across all three backends (Python / Spark / DuckDB)
over generated inputs."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from slr207_mapreduce_spark.functions.portable import (
    portable_hash64_sql,
)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8", exclude_characters="'\x00"), max_size=40), st.integers(0, 7))
def test_portable_hash_python_vs_duckdb(s, seed):
    want = int(hashlib.md5(f"s{seed}|{s}".encode()).hexdigest()[:15], 16)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {portable_hash64_sql('x', seed=seed)} FROM (SELECT ? AS x)", [s]
    ).fetchone()[0]
    assert got == want


def test_portable_hash_spark_matches_python(spark):
    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.functions.portable import portable_hash64

    samples = ["", "a", "hello world", "été°", "x" * 100, "word'quote"]
    df = spark.createDataFrame([(s,) for s in samples], ["x"])
    for seed in (0, 3):
        got = {
            r["x"]: r["h"]
            for r in df.select("x", portable_hash64(F.col("x"), seed=seed).alias("h")).collect()
        }
        for s in samples:
            want = int(hashlib.md5(f"s{seed}|{s}".encode()).hexdigest()[:15], 16)
            assert got[s] == want, (s, seed)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-99999, max_value=99999, places=2, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_sum_contract_duckdb_vs_python(xs):
    """dsum's SQL rendering must equal the exact rational sum -> float64."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in xs])
    got = con.execute(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) FROM t"
    ).fetchone()[0]
    want = float(sum(xs))  # exact Decimal sum, then one conversion
    assert got == want


def test_decimal_sum_spark_partition_invariance(spark):
    """The decimal sum must be identical under different partitionings —
    the property plain double sums do NOT have."""
    import random

    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.functions.portable import dsum

    rng = random.Random(7)
    rows = [(round(rng.uniform(-1000, 1000), 2),) for _ in range(5000)]
    results = set()
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(rows, ["v"]).repartition(nparts)
        results.add(df.agg(dsum("v").alias("s")).collect()[0]["s"])
    assert len(results) == 1, f"partitioning changed the sum: {results}"
