"""Ordered-window operators (SURVEY.md §2.6).

W1 — expanded-content sliding window: the reference's
``create_expanded_content`` (``notebooks/7-ExpandedContent-Week3.ipynb``
cell 8) walks each episode's chunks in order and concatenates each chunk
with its ±w neighbors (``start=max(0, i−w)``, ``end=i+w+1``) into
``expanded_content``, then point-updates every object in Weaviate (cell 22).

Spark-first: one window frame spec — no per-row updates, no driver loop;
at 100 TB this is a single partition-local pass per video (no shuffle beyond
the partitionBy hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expanded_content(
    chunks: DataFrame,
    partition_col: str = "video_id",
    order_col: str = "chunk_index",
    text_col: str = "content",
    window_size: int = 1,
    out_col: str = "expanded_content",
) -> DataFrame:
    """Append ``out_col`` = space-joined ±window_size neighbor texts.

    ``collect_list`` over a rows-between frame preserves frame order, so the
    concatenation matches the reference's list-slice join exactly.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.asc(order_col))
        .rowsBetween(-window_size, window_size)
    )
    return chunks.withColumn(
        out_col, F.concat_ws(" ", F.collect_list(F.col(text_col)).over(w))
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: lag + cumsum(gap > threshold) — the batch
    analog of streaming ``session_window`` (SURVEY §2.11). Adds
    ``session_id`` (0-based per user).

    Gap boundary verified against Spark's own ``session_window``
    (tests/test_streaming.py:test_sessionize_matches_session_window): an
    event arriving at *exactly* ``gap`` seconds after its predecessor
    MERGES into the session (session_window extends the window end to
    event+gap and merges on end >= next start), so the split condition is
    strictly ``gap > gap_seconds``.

    Timestamps are floored to whole epoch seconds and ordered with a
    tiebreak column so results are engine-portable bit-for-bit.
    """
    from ..functions.time import epoch_seconds

    df = events.withColumn("_es", epoch_seconds(events, ts_col))
    w = Window.partitionBy(user_col).orderBy(F.asc("_es"), F.asc(tiebreak_col))
    gap = F.col("_es") - F.lag("_es").over(w)
    new_session = F.when(gap > gap_seconds, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_es")
