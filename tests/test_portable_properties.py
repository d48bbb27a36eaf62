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


def test_digest_functions_reference_vectors(spark):
    """Pin Spark's crc32 / xxhash64 / sha1 / md5 / sha2-256 to published
    reference vectors (no DuckDB counterpart for the first three — this is
    their exactness gate; scalar_hash_funcs oracles md5/sha256)."""
    row = spark.sql(
        "SELECT crc32('spark') AS c, xxhash64('spark') AS x, sha1('abc') AS s1, "
        "md5('abc') AS m, sha2('abc', 256) AS s2"
    ).collect()[0]
    assert row.c == 2635321133  # zlib.crc32(b'spark')
    assert row.s1 == "a9993e364706816aba3e25717850c26c9cd0d89d"  # FIPS-180 vector
    assert row.m == "900150983cd24fb0d6963f7d28e17f72"  # RFC 1321 vector
    assert (
        row.s2 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    # xxhash64 with Spark's fixed seed 42 — self-consistency across literals
    assert row.x == spark.sql("SELECT xxhash64('spark') AS x").collect()[0].x


def test_query_results_invariant_under_parallelism(spark):
    """The exactness contract, end-to-end: representative queries from the
    fixed-point, iterative, hash, sampling, and hierarchical-agg families
    must produce IDENTICAL rows under different shuffle-partition counts
    (3 vs 17). This is the property that lets a 1000-executor run match
    the oracle bit-for-bit — float folds, nondeterministic layouts, or
    driver-loop leaks would all break it."""
    from slr207_mapreduce_spark.plans.base import all_queries
    from tests.conftest import SF_SMOKE

    names = [
        "q1_pricing_summary",       # hierarchical int64-partial + DECIMAL merge
        "dedup_minhash_lsh",        # hash banding
        "graph_pagerank",           # iterative integer fixed point
        "graph_bfs_distances",      # iterative frontier propagation
        "agg_histogram_equidepth",  # distributed ntile over frozen layout
        "pipeline_weighted_sample", # priority top-k
    ]
    specs = all_queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for name in names:
                rows = specs[name].build(spark, SF_SMOKE).collect()
                key = sorted(tuple(r) for r in rows)
                results.setdefault(name, []).append(key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name, (a, b) in results.items():
        assert a == b, f"{name}: results differ across parallelism"


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 13),
    st.integers(1, 13),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(h, w, seed):
    """encode_png → decode_png is identity for ANY 8-bit RGB image —
    arbitrary dimensions (every filter-type phase 0-4 as h varies) and
    arbitrary pixel content from a seeded generator."""
    import numpy as np

    from slr207_mapreduce_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype="uint8")
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 13),
    st.integers(1, 13),
    st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_property(h, w, seed):
    """encode_gif → decode_gif reproduces pal[idx] for ANY 8-bit index
    image — arbitrary dimensions and arbitrary seeded content, exercising
    LZW dictionary growth across code widths."""
    import numpy as np

    from slr207_mapreduce_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
        gif_palette,
    )

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, size=(h, w), dtype="uint8")
    pal = gif_palette()
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx.astype("int64")])


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_gif_roundtrip_large_image_width_growth(seed):
    """r07 ADVICE: a 13x13 image (169 px) can never push the LZW table past
    512 entries, so the 10-12-bit code widths and the 4096-entry CLEAR
    reset went untested. A 96x96 random-index image (9216 px of
    near-incompressible 256-symbol content) adds a table entry every ~1-2
    pixels, so the dictionary provably crosses widths 9->10->11->12 AND
    hits the 4096-entry cap mid-stream, forcing the CLEAR-reset path in
    both encoder and decoder: if either side mishandled a width bump or
    the reset, their tables would desynchronize and the pixel-exact
    round-trip below could not pass."""
    import numpy as np

    from slr207_mapreduce_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
        gif_palette,
    )

    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, size=(96, 96), dtype="uint8")
    pal = gif_palette()
    payload = encode_gif(idx, pal)
    assert np.array_equal(decode_gif(payload), pal[idx.astype("int64")])
    # Random 256-symbol content compresses poorly: new table entry per
    # ~1-2 pixels, so 9216 px >> 4096 - 258 entries guarantees >=1 mid-
    # stream dictionary reset. If the encoder stopped growing widths or
    # never reset, the decoder's table would desynchronize and the
    # round-trip above would already have failed — this is a belt-and-
    # suspenders structural check that the cap path actually ran.
    assert len(payload) > 4096  # enough codes to have crossed all widths
