"""Expression helpers shared across operators."""

from slr207_mapreduce_spark.functions.portable import (  # noqa: F401
    dec,
    dsum,
    davg,
    portable_hash64,
    portable_hash64_sql,
)
