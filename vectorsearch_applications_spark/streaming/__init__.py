from .events import (
    tumbling_counts_batch,
    streaming_tumbling_counts,
    stream_static_search_join,
)

__all__ = [
    "tumbling_counts_batch",
    "streaming_tumbling_counts",
    "stream_static_search_join",
]
