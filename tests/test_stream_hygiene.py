"""stream==batch equivalence for ingest-time decontamination
(streaming/hygiene.py): the streamed verdicts over file-arriving docs
must equal the batch decontaminate_audit over the same corpus."""

from __future__ import annotations

from vectorsearch_applications_spark.operators.textstats import (
    decontaminate_audit,
)
from vectorsearch_applications_spark.streaming.hygiene import (
    stream_decontaminate_audit,
)

_BENCH = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
DOCS_SCHEMA = "doc_id long, text string"


def test_stream_decontaminate_equals_batch(spark, tmp_path):
    toks = _BENCH.split()
    rows = [
        (1, "intro words " + " ".join(toks[2:15]) + " tail"),  # planted
        (2, "clean document with plain filler words only here"),
        (3, " ".join(toks[0:12]) + " zz below the thirteen gram bar"),
        (4, "short"),
    ]
    bench = spark.createDataFrame([(0, _BENCH)], DOCS_SCHEMA)
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)

    want = sorted(tuple(r) for r in decontaminate_audit(docs, bench).collect())

    src = str(tmp_path / "docs")
    # two arrival batches
    spark.createDataFrame(rows[:2], DOCS_SCHEMA).write.parquet(src + "/b1")
    spark.createDataFrame(rows[2:], DOCS_SCHEMA).write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = stream_decontaminate_audit(stream, bench)
    q = (
        out.writeStream.format("memory")
        .queryName("decon_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM decon_stream").collect()
    )
    assert got == want
    assert dict((r[0], r[2]) for r in got) == {1: 0, 2: 1, 3: 1, 4: 1}
