from pyarrow_ops_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    sessionize_batch,
    stream_tumbling_counts,
)
from pyarrow_ops_spark.streaming.sinks import (
    foreach_batch_sink,
    run_available_now,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "sessionize_batch",
    "stream_tumbling_counts",
    "foreach_batch_sink",
    "run_available_now",
]
