"""Reference-parity semantics (SURVEY.md §1.3): the exact tokenizer,
encode-drop filter, and ordering of remy-tang/SLR207-mapreduce."""

from slr207_mapreduce_spark.parity.wordcount import (  # noqa: F401
    TOKEN_DELIMITERS,
    ORACLE_DELIMITERS,
    encode_keeps,
    tokenize,
    keep_token,
    word_count,
    word_count_topk,
    py_encode,
    py_word_count,
)
