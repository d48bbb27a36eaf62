"""Bit-exactness pins for the r16 Arrow MinHash signature kernel.

The kernel (operators/dedup.minhash_signatures_docs + functions/md5np)
is a MEASURED PROTOTYPE — it lost the interleaved A/B to the JVM
expression pipeline at bench scales and is not the wired path (see
OPTIMIZATION_r16.md) — but it stays pinned bit-identical to
minhash_signatures over doc_shingles so a long-document-heavy
deployment can adopt it without re-deriving the exactness proof: same
shingle multiset, same md5 bits, same lane extraction, same mins, on
every corpus shape the pipeline handles, including the edge classes:
empty/NULL text, docs with fewer tokens than the shingle width,
repeated spaces (empty tokens), leading/trailing spaces, multi-byte
UTF-8, and tokens long enough to push a shingle past one MD5 block.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from slr207_mapreduce_spark.functions.md5np import (
    _SMALL_MAX_BLOCKS,
    md5_lanes_spans,
)

EDGE_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, ""),  # empty -> no signature row
    (2, "one two"),  # < shingle_n tokens -> no row
    (3, "a  b   c d"),  # repeated spaces = empty tokens
    (4, None),  # NULL text -> no row
    (5, " leading and trailing "),
    (6, "héllo wörld ünïcode € tokens here"),
    (7, ("x" * 300) + " " + ("y" * 200) + " z tail more tokens"),  # multi-block
    (8, "the quick brown fox jumps over the lazy dog"),  # duplicate content
    (9, "   "),  # only spaces: 4 empty tokens -> 2 shingles of spaces
    (10, "exactly three tokens"),
]


def test_md5_lanes_spans_matches_hashlib():
    rng = random.Random(11)
    text = (
        " ".join("w%d" % rng.randrange(500) for _ in range(3000))
        + " "
        + "L" * 700
        + " tail"
    ).encode()
    data = np.frombuffer(text, dtype=np.uint8)
    starts, ends = [], []
    for _ in range(2000):
        a = rng.randrange(len(data) - 1)
        b = min(len(data), a + rng.choice([0, 1, 5, 20, 52, 53, 54, 120, 400, 800]))
        starts.append(a)
        ends.append(b)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    for prefix in (b"s0|", b"s12|", b""):
        l0, l1 = md5_lanes_spans(data, starts, ends, prefix)
        for i in range(len(starts)):
            hx = hashlib.md5(prefix + data[starts[i] : ends[i]].tobytes()).hexdigest()
            assert int(hx[0:15], 16) == l0[i]
            assert int(hx[16:31], 16) == l1[i]


def test_md5_lanes_spans_chunking_is_transparent(monkeypatch):
    """Tiny chunk caps must not change a single bit (the greedy slicer and
    the small/large split are pure memory bounds)."""
    import slr207_mapreduce_spark.functions.md5np as md5np

    rng = random.Random(5)
    payload = bytes(rng.randrange(256) for _ in range(5000))
    data = np.frombuffer(payload, dtype=np.uint8)
    starts = np.asarray([rng.randrange(4000) for _ in range(300)], dtype=np.int64)
    ends = starts + np.asarray(
        [rng.choice([3, 40, 60, 300, 900]) for _ in range(300)], dtype=np.int64
    )
    ref = md5_lanes_spans(data, starts, ends, b"s1|")
    monkeypatch.setattr(md5np, "_CHUNK_PAD_BYTES", 256)
    got = md5np.md5_lanes_spans(data, starts, ends, b"s1|")
    assert np.array_equal(ref[0], got[0]) and np.array_equal(ref[1], got[1])
    assert _SMALL_MAX_BLOCKS >= 1


@pytest.mark.parametrize("shingle_n", [3, 2, 5])
def test_fused_signatures_match_expression_pipeline(spark, shingle_n):
    from slr207_mapreduce_spark.operators.dedup import (
        doc_shingles,
        minhash_signatures,
        minhash_signatures_docs,
    )

    df = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    classic = (
        minhash_signatures(
            doc_shingles(df, "doc_id", shingle_n, distinct=False), 6
        )
        .orderBy("doc_id")
        .collect()
    )
    fused = (
        minhash_signatures_docs(df, 6, shingle_n=shingle_n).orderBy("doc_id").collect()
    )
    assert [tuple(r) for r in classic] == [tuple(r) for r in fused]


def test_fused_signatures_match_on_sf_corpus(spark):
    from slr207_mapreduce_spark.operators.dedup import (
        doc_shingles,
        minhash_signatures,
        minhash_signatures_docs,
    )
    from slr207_mapreduce_spark.sources.tables import load_table

    d = load_table(spark, "documents", "/root/testdata/sf0.01")
    classic = (
        minhash_signatures(doc_shingles(d, "doc_id", 3, distinct=False), 6)
        .orderBy("doc_id")
        .collect()
    )
    fused = minhash_signatures_docs(d, 6).orderBy("doc_id").collect()
    assert [tuple(r) for r in classic] == [tuple(r) for r in fused]


def test_fused_kernel_slice_boundaries_are_transparent(spark, monkeypatch):
    """Force the kernel's doc-granular slicing (budget below every doc's
    shingle count) — output must not change."""
    import slr207_mapreduce_spark.operators.dedup as dedup

    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}w{j}" for j in range(20))) for i in range(50)],
        "doc_id long, text string",
    )
    ref = [tuple(r) for r in dedup.minhash_signatures_docs(df, 6).orderBy("doc_id").collect()]
    monkeypatch.setattr(dedup, "_MINHASH_SLICE_SHINGLES", 7)
    got = [tuple(r) for r in dedup.minhash_signatures_docs(df, 6).orderBy("doc_id").collect()]
    assert ref == got


