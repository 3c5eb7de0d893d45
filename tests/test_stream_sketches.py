"""stream==batch for the fenced sketch folds (streaming/sketches.py):
merging per-micro-batch sketches must equal the one-shot batch build —
the mergeability property itself — and replays must be no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.sketches import (
    cms_counts,
    cms_estimate,
    fm_distinct_sketch,
)
from vectorsearch_applications_spark.streaming.sketches import (
    stream_cms_collection,
    stream_fm_collection,
)

TERMS = (
    [("spark",)] * 7 + [("join",)] * 4 + [("agg",)] * 2 + [("rare",)]
)


def _src(spark, tmp_path, rows, schema, n_files):
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    per = (len(rows) + n_files - 1) // n_files
    for k in range(n_files):
        rows_k = [r for i, r in enumerate(rows) if i // per == k]
        if rows_k:
            spark.createDataFrame(rows_k, schema).coalesce(1).write.parquet(
                f"{src}/b{k}"
            )
    return df, src


def test_stream_cms_equals_batch_build_and_fences_replays(spark, tmp_path):
    df, src = _src(spark, tmp_path, TERMS, "term string", 3)

    def run(ck):
        q = stream_cms_collection(
            spark,
            spark.readStream.schema("term string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src),
            str(tmp_path),
            "cms",
            str(tmp_path / ck),
            d=3,
            w=64,
        )
        assert q.awaitTermination(180)

    run("ck1")
    got = {
        (r["j"], r["bucket"]): r["count"]
        for r in spark.read.parquet(str(tmp_path / "cms")).collect()
    }
    want = {
        (r["j"], r["bucket"]): r["count"]
        for r in cms_counts(df, "term", d=3, w=64).collect()
    }
    assert got == want

    # estimates off the streamed table match estimates off the batch table
    qterms = spark.createDataFrame([("spark",), ("join",)], "term string")
    est = {
        r["term"]: r["cms_estimate"]
        for r in cms_estimate(
            spark.read.parquet(str(tmp_path / "cms")), qterms, d=3, w=64
        ).collect()
    }
    assert est["spark"] >= 7 and est["join"] >= 4  # CMS never undercounts

    # fresh-checkpoint full replay (at-least-once) must not double cells
    run("ck2")
    again = {
        (r["j"], r["bucket"]): r["count"]
        for r in spark.read.parquet(str(tmp_path / "cms")).collect()
    }
    assert again == want


def test_stream_fm_equals_batch_sketch(spark, tmp_path):
    rows = [("g1", f"u{i}") for i in range(40)] + [
        ("g2", f"u{i}") for i in range(5)
    ]
    df, src = _src(spark, tmp_path, rows, "grp string, v string", 2)

    q = stream_fm_collection(
        spark,
        spark.readStream.schema("grp string, v string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        str(tmp_path),
        "fm",
        str(tmp_path / "ck"),
        group_col="grp",
        value_col="v",
        n_buckets=8,
    )
    assert q.awaitTermination(180)

    streamed = (
        spark.read.parquet(str(tmp_path / "fm"))
        .groupBy("grp")
        .agg(F.max("r_bucket").cast("bigint").alias("fm_r_max"))
    )
    got = {r["grp"]: r["fm_r_max"] for r in streamed.collect()}
    want = {
        r["grp"]: r["fm_r_max"]
        for r in fm_distinct_sketch(df, "grp", "v", n_buckets=8).collect()
    }
    assert got == want


def test_stream_histogram_equals_batch_bins(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [(float(rng.randint(0, 999)),) for _ in range(300)]
    df, src = _src(spark, tmp_path, rows, "v double", 3)

    from vectorsearch_applications_spark.streaming.sketches import (
        stream_histogram_collection,
    )

    q = stream_histogram_collection(
        spark,
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        str(tmp_path),
        "hist",
        str(tmp_path / "ck"),
        value_col="v",
        bin_width=100,
    )
    assert q.awaitTermination(180)

    got = {
        r["bin"]: r["c"]
        for r in spark.read.parquet(str(tmp_path / "hist")).collect()
    }
    want = {
        r["bin"]: r["c"]
        for r in df.select(
            F.floor(F.col("v") / 100).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    }
    assert got == want and sum(got.values()) == 300


def test_stream_hll_equals_batch_registers(spark, tmp_path):
    from vectorsearch_applications_spark.operators.sketches import (
        hll_registers,
    )
    from vectorsearch_applications_spark.streaming.sketches import (
        stream_hll_collection,
    )

    rows = [("g1", f"u{i}") for i in range(60)] + [
        ("g2", f"u{i}") for i in range(9)
    ]
    df, src = _src(spark, tmp_path, rows, "grp string, v string", 3)

    q = stream_hll_collection(
        spark,
        spark.readStream.schema("grp string, v string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        str(tmp_path),
        "hll",
        str(tmp_path / "ck_hll"),
        group_col="grp",
        value_col="v",
        b=4,
    )
    assert q.awaitTermination(180)

    got = {
        (r["grp"], r["register_id"]): r["rho_max"]
        for r in spark.read.parquet(str(tmp_path / "hll")).collect()
    }
    want = {
        (r["grp"], r["register_id"]): r["rho_max"]
        for r in hll_registers(df, "grp", "v", b=4).collect()
    }
    assert got == want


def test_stream_bloom_equals_batch_build(spark, tmp_path):
    from vectorsearch_applications_spark.operators.bloom import bloom_build
    from vectorsearch_applications_spark.streaming.sketches import (
        stream_bloom_collection,
    )

    rows = [(i * 3,) for i in range(120)]
    df, src = _src(spark, tmp_path, rows, "k long", 3)

    q = stream_bloom_collection(
        spark,
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        str(tmp_path),
        "bloom",
        str(tmp_path / "ck_bloom"),
        key_col="k",
    )
    assert q.awaitTermination(180)

    got = {
        r["word_id"]: r["bits"]
        for r in spark.read.parquet(str(tmp_path / "bloom")).collect()
    }
    want = {
        r["word_id"]: r["bits"] for r in bloom_build(df, "k").collect()
    }
    assert got == want
