"""Analysis widening, round 4 batch 4 — data-layout analytics.

- agg_histogram_equiwidth: equi-width histogram over a measure column with
  EXACT integer bucket assignment (fixed-point cents, double-division floor
  that is provably exact for the operand range) — the profiling primitive
  behind range-partition planning and data-quality dashboards.

- scalar_zorder_key: Morton (Z-order) key — bit-interleave of two bounded
  dimension keys. Sorting/range-partitioning a 100 TB table by this key
  co-locates rows that are close in BOTH dimensions, so min/max row-group
  stats prune scans filtered on EITHER column (the technique behind
  Delta/Iceberg OPTIMIZE ZORDER). The interleave is pure integer bit
  algebra with identical `>>`/`<<`/`&`/`%` syntax in Spark SQL and DuckDB,
  so the oracle shares the generated expression text verbatim.

Reference lineage: both are O6-style projections + O8/O9 hash reduce
compositions (SURVEY.md §2.1); the reference has no layout optimizer, so
these extend the §2.1 closure the way the brief's 100 TB goal demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table

# --- shared expression text (valid in BOTH Spark SQL and DuckDB) ---------

# exact cents: l_extendedprice carries <=2 decimals; floor(x*100 + 0.5) is
# the portable fixed-point bridge (functions/portable.py::int_units).
_CENTS = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"

_N_BUCKETS = 12
_WIDTH_CENTS = 1000000  # 10,000.00 per bucket

# FLOOR(cents / width) via double division is exact here: cents <= ~1.1e7
# has quotient resolution 1/width = 1e-6 units, many orders of magnitude
# above double ulp at that magnitude, and integer quotients <= 2^53 are
# exactly representable — so the correctly-rounded division can never cross
# an integer boundary. (Avoids the engine-specific `div` vs `//` split.)
_BUCKET = (
    f"CAST(LEAST(FLOOR({_CENTS} / {_WIDTH_CENTS}.0), {_N_BUCKETS - 1}) AS INT)"
)


def zorder_expr(a: str, b: str, bits: int = 10) -> str:
    """Morton interleave of the low ``bits`` bits of ``a`` (even lanes) and
    ``b`` (odd lanes) as one shared SQL text: Spark SQL and DuckDB parse
    `>> << & %` identically, and the summed terms occupy disjoint bits so
    ``+`` is ``|``."""
    terms = [
        f"((({a} >> {i}) & 1) << {2 * i}) + ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_ZKEY = zorder_expr("(l_partkey % 1024)", "(l_suppkey % 1024)", bits=10)


@register(
    "agg_histogram_equiwidth",
    oracle=f"""
    SELECT {_BUCKET} AS bucket,
           CAST({_BUCKET} AS BIGINT) * {_WIDTH_CENTS // 100} AS lo_dollars,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents
    FROM lineitem
    GROUP BY 1
    """,
    doc="Equi-width histogram of l_extendedprice (12 buckets of $10k, top "
    "bucket clamps the tail): one map-side-combinable groupBy on a "
    "computed integer bucket — a single shuffle of at most 12 rows per "
    "map partition regardless of input size, the profiling shape used to "
    "plan range partitioning. Bucket math is exact integer fixed-point "
    "(see module docstring for the division-exactness argument), so cnt "
    "AND sum are bit-strict.",
    tags=("agg", "histogram", "profiling"),
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select(F.expr(_BUCKET).alias("bucket"), F.expr(_CENTS).alias("cents"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("long") * (_WIDTH_CENTS // 100)).alias("lo_dollars"),
            "cnt",
            "sum_cents",
        )
    )


@register(
    "scalar_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {_ZKEY} AS zkey,
           CAST(({_ZKEY} >> 14) AS BIGINT) AS ztile
    FROM lineitem
    """,
    doc="Z-order (Morton) clustering key over (l_partkey, l_suppkey): "
    "interleaving the low 10 bits of each key gives a 20-bit curve "
    "position whose prefix (`ztile`, top 6 bits) is the coarse tile — "
    "`repartitionByRange(ztile, zkey)` + sorted parquet writes produce "
    "files whose min/max stats are tight in BOTH dimensions, so a "
    "predicate on either column prunes row groups at scan time. The "
    "interleave is one shared `>>`/`<<`/`&` expression text parsed "
    "identically by Spark SQL and DuckDB — a pure projection, zero "
    "shuffle.",
    tags=("scalar", "layout", "zorder"),
)
def scalar_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(_ZKEY).alias("zkey"),
        F.expr(f"CAST(({_ZKEY} >> 14) AS BIGINT)").alias("ztile"),
    )


@register(
    "pipeline_sample_exact_k",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             CAST(('0x' || substring(md5('s42|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM documents
    )
    ORDER BY h, doc_id
    LIMIT 100
    """,
    doc="Exact-k uniform sample (k=100): the k smallest portable-hash "
    "values over the corpus — the distributed equivalent of reservoir "
    "sampling, but deterministic and rerun-stable. Physically a "
    "TakeOrderedAndProject: each task keeps its local top-k heap and the "
    "driver merges k-sized lists, so there is NO global sort and NO "
    "shuffle of the corpus — the only safe exact-k shape at 100 TB "
    "(tests/test_layout_runtime.py pins the plan). Hash order ≡ uniform "
    "order; the fixed seed makes the sample a reproducible artifact.",
    tags=("pipeline", "sampling", "topk"),
)
def pipeline_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from slr207_mapreduce_spark.functions.portable import portable_hash64

    d = load_table(spark, "documents", sf_dir)
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            portable_hash64(F.col("doc_id").cast("string"), seed=42).alias("h"),
        )
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "lang", "source")
    )
