"""slr207_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo remy-tang/SLR207-mapreduce (an educational Java MapReduce
implementing distributed word count; see SURVEY.md), re-expressed
Spark-first: the reference's map/shuffle/reduce/sort/limit pipeline and
its natural relational closure (scans, joins, aggregations, windows, set
ops, streaming) are declared via the DataFrame/SQL API and optimized by
Catalyst, plus the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) required at 100 TB scale.

Layout:
  session.py   — SparkSession factory with scale-minded config hygiene
  sources/     — table/corpus readers and sinks (parquet/csv/json/text)
  parity/      — reference-exact word-count semantics (SURVEY.md §1.3)
  functions/   — portable (Spark<->DuckDB) expression helpers
  operators/   — dedup / similarity / text-analysis / multimodal ops
  plans/       — the declared query set (Spark builder + DuckDB oracle)
  streaming/   — Structured Streaming operators (windows, dedup, state)
"""

__version__ = "0.1.0"

from slr207_mapreduce_spark.session import get_session  # noqa: F401
