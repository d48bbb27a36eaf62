"""Property tests for the round-4 batch-2 operators (plans/pipeline_r4b.py):
the intrinsic guarantees the DuckDB oracle equality cannot express —
Bloom's zero-false-negative contract, CDC chunking's reconstruction and
shift-tolerance, LM-score bounds, report conservation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def qs():
    from slr207_mapreduce_spark.plans.base import all_queries

    return all_queries()


# -- Bloom membership gate -------------------------------------------------


def test_bloom_never_false_negative(spark, qs):
    rows = qs["pipeline_bloom_membership"].build(spark, SF_CORRECT).collect()
    assert rows, "probe batch must be non-empty"
    for r in rows:
        if r["is_exact_dup"]:
            assert r["bloom_maybe"], f"false negative on doc {r['doc_id']}"


def test_bloom_probe_covers_whole_batch(spark, qs):
    import duckdb

    out = qs["pipeline_bloom_membership"].build(spark, SF_CORRECT)
    n_batch = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{os.path.join(SF_CORRECT, 'documents.parquet')}')"
        " WHERE source = 'src0'"
    ).fetchone()[0]
    assert out.count() == n_batch


# -- Content-defined chunking ----------------------------------------------


def _docs_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cdc_chunks_reconstruct_original(spark):
    from slr207_mapreduce_spark.operators.dedup import cdc_chunk_table

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        3: "single",
    }
    docs = _docs_frame(spark, list(map(tuple, ((k, v) for k, v in texts.items()))))
    chunks = cdc_chunk_table(docs).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for doc_id, text in texts.items():
        parts = [t for _, t in sorted(by_doc[doc_id])]
        assert " ".join(parts) == text, f"doc {doc_id} does not reconstruct"


def test_cdc_chunks_survive_prefix_insertion(spark):
    """The CDC selling point: prepending tokens must NOT re-frame the rest
    of the document — chunks after the first content boundary are identical
    (fixed-offset windows lose every downstream window instead)."""
    import random

    from slr207_mapreduce_spark.operators.dedup import cdc_chunk_table

    rng = random.Random(42)
    base = " ".join(f"w{rng.randrange(500)}" for _ in range(400))
    shifted = "zzz1 zzz2 zzz3 " + base
    docs = _docs_frame(spark, [(1, base), (2, shifted)])
    rows = cdc_chunk_table(docs).collect()
    hashes = {1: set(), 2: set()}
    for r in rows:
        hashes[r["doc_id"]].add(r["chunk_hash"])
    common = hashes[1] & hashes[2]
    # only the first frame (and the last, if the prefix merged into it) can
    # differ; with ~400/8 = 50 chunks, the overwhelming majority must agree
    assert len(common) >= 0.8 * len(hashes[1]), (
        f"only {len(common)}/{len(hashes[1])} chunks survived a prefix edit"
    )


def test_cdc_chunk_lengths_follow_boundary_density(spark):
    """Expected chunk length is CDC_MOD tokens; sanity-pin the geometry so
    a hash-family edit cannot silently degenerate to per-token chunks."""
    import random

    from slr207_mapreduce_spark.operators.dedup import CDC_MOD, cdc_chunk_table

    rng = random.Random(7)
    text = " ".join(f"w{rng.randrange(10_000)}" for _ in range(4_000))
    docs = _docs_frame(spark, [(1, text)])
    n_chunks = cdc_chunk_table(docs).count()
    mean_len = 4_000 / n_chunks
    assert CDC_MOD / 2 <= mean_len <= CDC_MOD * 2


# -- LM scoring ------------------------------------------------------------


def test_lm_score_bounds_and_coverage(spark, qs):
    import duckdb

    out = qs["text_lm_score"].build(spark, SF_CORRECT)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r["lm_score_e9"] <= 1_000_000_000
        assert r["n_bigrams"] >= 1
    n_scorable = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{os.path.join(SF_CORRECT, 'documents.parquet')}')"
        " WHERE len(string_split(text, ' ')) >= 2"
    ).fetchone()[0]
    assert len(rows) == n_scorable


def test_lm_score_perfect_on_deterministic_corpus(spark):
    """A corpus where every w1 has exactly one continuation must score
    1e9 for every doc — the fixed-point arithmetic's exactness check."""
    from slr207_mapreduce_spark.plans.base import all_queries

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    docs = ["a b c d", "a b c", "b c d"]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                    "lang": pa.array(["en"] * len(docs), pa.string()),
                    "source": pa.array(["src0"] * len(docs), pa.string()),
                    "n_chars": pa.array([len(t) for t in docs], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        rows = all_queries()["text_lm_score"].build(spark, d).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["lm_score_e9"] == 1_000_000_000


# -- Dedup report ----------------------------------------------------------


def test_dedup_report_conserves_counts(spark, qs):
    import duckdb

    rows = qs["pipeline_dedup_report"].build(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert (
            r["docs_exact_dup"] + r["docs_near_dup"] + r["docs_kept"]
            == r["docs_total"]
        )
    total = sum(r["docs_total"] for r in rows)
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{os.path.join(SF_CORRECT, 'documents.parquet')}')"
    ).fetchone()[0]
    assert total == n_docs
