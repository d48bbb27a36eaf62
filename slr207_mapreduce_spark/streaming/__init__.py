"""Structured Streaming operators (SURVEY.md §2.1 "Streaming" row).

The reference's end-of-input barrier protocol (SplitCount + the
"$FINISHED_SPLITS$" peer broadcast, /root/reference/ListenerReducer.java:
166-181,273-284) is a hand-rolled epoch marker; Structured Streaming's
watermark/epoch machinery is its principled replacement. Batch-replay
oracles for these live in plans/events.py (DuckDB has no streaming).
"""

from slr207_mapreduce_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    tumbling_window_counts,
    sliding_window_sums,
    session_windows,
    streaming_dedup,
    stream_stream_view_purchase_join,
    run_to_memory,
)
from slr207_mapreduce_spark.streaming.stateful import running_user_totals  # noqa: F401
