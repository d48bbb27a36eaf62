"""Parity against the reference's OWN text fixtures (read-only at
/root/reference): our engine over little_splits/ / medium_splits/ /
splits/ must agree with the pure-Python port of the distributed-path
semantics on the same bytes (SURVEY.md §5.2(c))."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference"

FIXTURES = ["little_splits", "medium_splits", "splits"]


@pytest.mark.parametrize("fixture", FIXTURES)
def test_reference_corpus_parity(spark, fixture):
    d = os.path.join(REF, fixture)
    if not os.path.isdir(d):
        pytest.skip(f"{d} not present")
    from slr207_mapreduce_spark.parity.wordcount import py_word_count, word_count_topk
    from slr207_mapreduce_spark.sources.tables import read_text_corpus

    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".txt")
    )
    if not files:
        pytest.skip("no .txt fixtures")
    lines: list[str] = []
    for f in files:
        with open(f, encoding="utf-8") as fh:
            lines.extend(fh.read().splitlines())
    want = py_word_count(lines, k=20)
    df = read_text_corpus(spark, d)
    got = [(r["word"], r["cnt"]) for r in word_count_topk(df, k=20).collect()]
    assert got == want, f"{fixture}: top-20 mismatch"


def test_reference_medium_splits_exercises_accent_drop(spark):
    """The French lorem fixtures contain accented tokens — confirm the
    encode-drop filter actually fires on the reference's own data."""
    d = os.path.join(REF, "medium_splits")
    if not os.path.isdir(d):
        pytest.skip("medium_splits not present")
    from pyspark.sql import functions as F

    from slr207_mapreduce_spark.parity.wordcount import keep_token, tokenize
    from slr207_mapreduce_spark.sources.tables import read_text_corpus

    toks = (
        read_text_corpus(spark, d)
        .select(F.explode(tokenize(F.col("value"))).alias("word"))
        .where(F.length("word") > 0)
    )
    dropped = toks.where(~keep_token(F.col("word"))).count()
    kept = toks.where(keep_token(F.col("word"))).count()
    assert kept > 0
    # medium_splits contains accent-only/digit-only tokens ('à', '45',
    # '1960', ...) — the drop filter must actually fire on them
    assert dropped > 0, "encode-drop filter dropped nothing on French lorem"
