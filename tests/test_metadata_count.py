"""r16: parquet-footer row counts for unmodified load_table handles.

The auto-dial sites (LSH table budget, IVF dials, PQ rerank, JL
shortlist) need only an integer row count; for a raw table handle that
integer must equal ``count()`` exactly (parquet footers are
authoritative), and anything derived must fall back to the Spark job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_metadata_count_matches_spark_count(spark):
    from slr207_mapreduce_spark.sources.tables import load_table, metadata_row_count

    for name in ("embeddings", "documents", "events"):
        df = load_table(spark, name, SF)
        n_meta = metadata_row_count(df)
        assert n_meta is not None, name
        assert n_meta == df.count(), name


def test_metadata_count_refuses_derived_frames(spark):
    from slr207_mapreduce_spark.sources.tables import load_table, metadata_row_count

    df = load_table(spark, "embeddings", SF)
    assert metadata_row_count(df.where(F.col("vec_id") < 5)) is None
    assert metadata_row_count(df.select("vec_id")) is None
    assert metadata_row_count(df.limit(3)) is None


def test_dial_count_falls_back_for_filtered_input(spark):
    from slr207_mapreduce_spark.operators.similarity import _dial_count
    from slr207_mapreduce_spark.sources.tables import load_table

    df = load_table(spark, "embeddings", SF)
    filtered = df.where(F.col("vec_id") % 2 == 0)
    assert _dial_count(df) == df.count()
    assert _dial_count(filtered) == filtered.count()


def test_lsh_auto_dial_unchanged_by_metadata_count(spark):
    """The dial INTEGER (hence the plan and the oracle's COUNT(*) mirror)
    must be identical whichever way the count is obtained."""
    from slr207_mapreduce_spark.operators.similarity import (
        auto_lsh_tables_multiprobe,
        _dial_count,
    )
    from slr207_mapreduce_spark.sources.tables import load_table

    e = load_table(spark, "embeddings", SF)
    assert auto_lsh_tables_multiprobe(_dial_count(e)) == auto_lsh_tables_multiprobe(
        e.count()
    )
