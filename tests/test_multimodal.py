"""Multimodal binary-column plumbing: schema, Arrow batch shape, UDF
signatures are real; the decode itself is the documented deterministic stub."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.multimodal.binary import (
    binary_metadata,
    decode_image_batches,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        (1, bytearray(b"\x89PNG\r\nfakebytes" * 10), "image", 0, 0, 0),
        (2, bytearray(b"RIFFfakewav" * 40), "audio", 0, 0, 5000),
        (3, bytearray(b"\x00\x00\x01\xbafakempeg" * 99), "video", 0, 0, 3500),
    ]
    return spark.createDataFrame(
        rows,
        "media_id bigint, payload binary, media_type string, width int, "
        "height int, duration_ms bigint",
    )


def test_binary_metadata(spark):
    meta = {r["media_id"]: r for r in binary_metadata(_media(spark)).collect()}
    assert meta[1]["n_bytes"] == 150  # 15-byte pattern × 10
    assert meta[1]["magic_hex"] == "89504E47"  # PNG magic
    assert len(meta[2]["sha256"]) == 64
    assert meta[2]["sha256"] != meta[3]["sha256"]


def test_decode_stub_batches(spark):
    out = (
        _media(spark)
        .select("media_id", "payload")
        .mapInPandas(
            decode_image_batches(),
            schema="media_id bigint, width int, height int, ok boolean",
        )
        .collect()
    )
    assert len(out) == 3
    assert all(r["ok"] and r["width"] >= 16 and r["height"] >= 16 for r in out)
    # deterministic: same bytes → same fake dimensions
    again = (
        _media(spark)
        .select("media_id", "payload")
        .mapInPandas(
            decode_image_batches(),
            schema="media_id bigint, width int, height int, ok boolean",
        )
        .collect()
    )
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_ms=1000).collect()
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(per[2]) == [0, 1000, 2000, 3000, 4000]
    assert sorted(per[3]) == [0, 1000, 2000, 3000]
    assert sorted(per[1]) == [0]  # zero duration → single frame at 0


def test_byte_histogram_features_exact(spark):
    """Known payloads → exact histogram/entropy: 4 equal byte values give
    probability 0.25 each and entropy 2.0 bits; a uniform run of one value
    gives entropy 0."""
    from vectorsearch_applications_spark.multimodal.binary import (
        byte_histogram_features,
    )

    rows = [
        (1, bytes([0, 1, 2, 3])),
        (2, bytes([7] * 10)),
        (3, b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in byte_histogram_features(df).collect()
    }
    assert out[1]["byte_entropy"] == 2.0
    assert out[1]["byte_hist"][0] == 0.25 and out[1]["byte_hist"][4] == 0.0
    assert out[2]["byte_entropy"] == 0.0 and out[2]["byte_hist"][7] == 1.0
    assert out[3]["byte_entropy"] == 0.0 and sum(out[3]["byte_hist"]) == 0.0
    assert all(len(r["byte_hist"]) == 256 for r in out.values())


def test_resize_stub_batches_binary_in_binary_out(spark):
    from vectorsearch_applications_spark.multimodal.binary import (
        resize_media_batches,
    )

    out = {
        r["media_id"]: r
        for r in _media(spark)
        .select("media_id", "payload")
        .mapInPandas(
            resize_media_batches(target_bytes=64),
            schema="media_id bigint, orig_bytes bigint, out_bytes bigint, "
            "payload binary",
        )
        .collect()
    }
    src = {r["media_id"]: bytes(r["payload"]) for r in _media(spark).collect()}
    for mid, r in out.items():
        b = src[mid]
        k = max(1, -(-len(b) // 64))
        assert r["orig_bytes"] == len(b)
        assert bytes(r["payload"]) == b[::k]  # deterministic decimation
        assert r["out_bytes"] <= 64  # the size contract a real resize has
    # a second run is byte-identical (retry-stable)
    again = {
        r["media_id"]: bytes(r["payload"])
        for r in _media(spark)
        .select("media_id", "payload")
        .mapInPandas(
            resize_media_batches(target_bytes=64),
            schema="media_id bigint, orig_bytes bigint, out_bytes bigint, "
            "payload binary",
        )
        .collect()
    }
    assert again == {m: bytes(r["payload"]) for m, r in out.items()}


def test_resize_real_path_gated(spark):
    import pytest as _pytest

    from vectorsearch_applications_spark.multimodal.binary import (
        resize_media_batches,
    )

    with _pytest.raises(NotImplementedError):
        resize_media_batches(use_real_resizer=True)
