"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual decode (PIL/ffmpeg/etc.)
is STUBBED behind import-tries because the media libraries are not in this
container. A deployment swaps ``_decode_stub`` for a real decoder without
touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, width int, "
    "height int, duration_ms bigint"
)


def binary_metadata(
    df: DataFrame, binary_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-side only:
    (media_id, n_bytes, sha256, magic_hex). The cheap pre-filter that runs
    before any Python decode at 100 TB (corrupt/dup detection by hash)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.length(F.col(binary_col)).alias("n_bytes"),
        F.sha2(F.col(binary_col), 256).alias("sha256"),
        F.hex(F.substring(F.col(binary_col), 1, 4)).alias("magic_hex"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-dimensions from the bytes.
    Replace with PIL/libav in deployment."""
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n // 64) % 64, "ok": True}


def decode_image_batches(use_real_decoder: bool = False):
    """mapInPandas function: (media_id, payload) → (media_id, width, height,
    ok). Arrow-batched; the per-executor decoder is resolved once per task.

    Output schema: ``media_id bigint, width int, height int, ok boolean``.
    """
    import pandas as pd

    if use_real_decoder:
        try:
            from PIL import Image  # type: ignore  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires pillow; run with use_real_decoder=False "
                "for the deterministic stub"
            ) from e
        raise NotImplementedError("real decoder wiring is deployment-specific")

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "ok": [m["ok"] for m in metas],
                }
            )

    return decode


def byte_histogram_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "media_id",
    normalize: bool = True,
) -> DataFrame:
    """REAL feature extraction over opaque media bytes (no decode needed):
    (media_id, byte_hist array<double>[256], byte_entropy double).

    The 256-bin byte-value histogram + Shannon entropy are the standard
    cheap media features (corruption screening, container clustering,
    compressed-vs-raw detection, near-dup blocking) that run before any
    expensive decode. Arrow-batched mapInPandas with one numpy
    ``bincount`` per row — no per-byte Python. Scale shape: narrow map-side
    pass, output 256 doubles/row regardless of payload size, so the
    downstream (e.g. embedding-cosine near-dup over byte_hist) sees fixed
    row width.
    """
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hists, ents = [], []
            for p in pdf[binary_col]:
                buf = np.frombuffer(bytes(p), dtype=np.uint8)
                counts = np.bincount(buf, minlength=256).astype(np.float64)
                total = counts.sum()
                probs = counts / total if total else counts
                nz = probs[probs > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()) if total else 0.0)
                hists.append((probs if normalize else counts).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "byte_hist": hists,
                    "byte_entropy": ents,
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        extract,
        schema="media_id bigint, byte_hist array<double>, byte_entropy double",
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Expand each video row into one row per sampled frame timestamp —
    the 1→N UDTF shape (explode of a JVM-side sequence; the actual frame
    grab is the decode UDF's job downstream)."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms)
            )
        ),
    )


def resize_media_batches(
    target_bytes: int = 1024,
    use_real_resizer: bool = False,
):
    """mapInPandas function: (media_id, payload) → (media_id, orig_bytes,
    out_bytes, payload) — the binary-IN/binary-OUT batch shape (decode
    only reads bytes; resize must also WRITE a binary column through
    Arrow, the part deployments get wrong first).

    The deterministic stand-in is a stride decimation: keep every k-th
    byte with k = ⌈n/target⌉ — a real byte transform with the exact
    schema, batching, and size-bound contract a PIL/libav resize has
    (output ≤ target_bytes, deterministic for a given input), minus the
    pixel math this container cannot host. Gated exactly like
    decode_image_batches.

    Output schema: ``media_id bigint, orig_bytes bigint, out_bytes
    bigint, payload binary``.
    """
    import pandas as pd

    if use_real_resizer:
        try:
            from PIL import Image  # type: ignore  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image resize requires pillow; run with "
                "use_real_resizer=False for the deterministic stub"
            ) from e
        raise NotImplementedError("real resizer wiring is deployment-specific")

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            outs, orig_ns, out_ns = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                n = len(b)
                k = max(1, -(-n // target_bytes))  # ceil, ≥1
                out = b[::k]
                outs.append(out)
                orig_ns.append(n)
                out_ns.append(len(out))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_bytes": orig_ns,
                    "out_bytes": out_ns,
                    "payload": outs,
                }
            )

    return resize
