"""Sources & sinks (reference O1/O13 generalized — SURVEY.md §2).

The reference reads one UTF-8 text file line-by-line and prints to stdout
(/root/reference/SimpleClient.java:116-143, WorkerSender.java:290-296).
Spark gives every format for free; this module is the thin registration
layer: the canonical testdata tables, line-oriented corpora, and writers.
"""

from slr207_mapreduce_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_text_corpus,
)
from slr207_mapreduce_spark.sources.sinks import write_table  # noqa: F401
