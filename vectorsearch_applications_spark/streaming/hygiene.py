"""Ingest-time corpus hygiene — streaming benchmark decontamination.

New documents should be screened at ingest, not re-screened in bulk
later: the 13-gram contamination verdict (operators/textstats.py
decontaminate_audit) is a STATELESS projection once the benchmark gram
set is broadcast, so it composes directly onto a readStream source as a
stream-static cross join of one broadcast array row — no watermark, no
state store, append-mode output. The cheapest possible streaming
operator shape: every micro-batch pays one scan of its own rows.

At 100 TB/day ingest this is the same plan as batch (the benchmark
array is resolved once per micro-batch on the driver and broadcast);
stream==batch equivalence is pinned by tests/test_stream_hygiene.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_decontaminate_audit(
    docs_stream: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Attach the per-doc contamination verdict to a document stream.

    ``docs_stream`` is a streaming DataFrame; ``benchmark`` is a STATIC
    frame (eval suites change by release, not by micro-batch — re-plan
    the query to pick up a new suite). Returns a streaming DataFrame
    with (doc_id, n_contaminated_grams, keep); write with append mode.
    """
    from ..operators.textstats import decontaminate_audit

    return decontaminate_audit(
        docs_stream,
        benchmark,
        n=n,
        id_col=id_col,
        text_col=text_col,
        bench_text_col=bench_text_col,
    )
