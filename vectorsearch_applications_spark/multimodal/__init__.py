from .binary import (
    binary_metadata,
    decode_image_batches,
    frame_sample_plan,
    resize_media_batches,
)

__all__ = [
    "binary_metadata",
    "decode_image_batches",
    "frame_sample_plan",
    "resize_media_batches",
]
