from .concurrency import stream_running_concurrency
from .dedup import (
    stream_minhash_screen,
    stream_semantic_screen,
    stream_simhash_screen,
)
from .fenced import fenced_fold_stream
from .hygiene import stream_decontaminate_audit
from .scd2 import stream_scd2_collection
from .sketches import (
    stream_cms_collection,
    stream_fm_collection,
    stream_histogram_collection,
)
from .events import (
    tumbling_counts_batch,
    streaming_tumbling_counts,
    stream_static_search_join,
)

__all__ = [
    "tumbling_counts_batch",
    "streaming_tumbling_counts",
    "stream_static_search_join",
    "stream_running_concurrency",
    "fenced_fold_stream",
    "stream_scd2_collection",
    "stream_cms_collection",
    "stream_fm_collection",
    "stream_histogram_collection",
    "stream_decontaminate_audit",
    "stream_minhash_screen",
    "stream_simhash_screen",
    "stream_semantic_screen",
]
