"""Python UDTF surface (SURVEY.md §2.1 "UDF / UDAF / UDTF" row — the UDTF
leg, Spark ≥3.5 table-function API): arbitrary row → rows expansion, the
generalized form of the reference's tokenizer flatMap (O5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from slr207_mapreduce_spark.plans.base import register
from slr207_mapreduce_spark.sources.tables import load_table


@udtf(returnType="word: string, pos: bigint")
class PositionedWords:
    """Tokenize with positions — a UDTF (one input row → N output rows)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            if w:
                yield (w, i)


@register(
    "udtf_positioned_words",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             unnest(range(0, len(string_split(text, ' ')))) AS pos
      FROM documents
    )
    SELECT doc_id, word, CAST(pos AS BIGINT) AS pos
    FROM toks WHERE length(word) > 0
    """,
    doc="Python UDTF (lateral table function): positional tokenization of "
    "documents — the reference's flatMap tokenizer (WorkerSender.java:216) "
    "as a user-defined table function. Slow path by design; the codegen "
    "form lives in parity/wordcount.py.",
    tags=("udf", "udtf"),
)
def udtf_positioned_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    d.createOrReplaceTempView("documents")
    spark.udtf.register("positioned_words", PositionedWords)
    return spark.sql(
        """
        SELECT d.doc_id, f.word, f.pos
        FROM documents d, LATERAL positioned_words(d.text) f
        """
    )
