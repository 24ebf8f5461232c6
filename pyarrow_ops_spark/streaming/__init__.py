from pyarrow_ops_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    sessionize_batch,
    stream_tumbling_counts,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "stream_tumbling_counts",
]
