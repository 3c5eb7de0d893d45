"""Unit tests for functions/markup.py strip_markup (driver parity is
covered by test_oracle_parity on html_markup_strip)."""

from __future__ import annotations

import pyspark.sql.functions as F

from vectorsearch_applications_spark.functions.markup import strip_markup


def _strip(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "raw string")
    return df.select(strip_markup(F.col("raw")).alias("c")).collect()[0]["c"]


def test_script_and_style_content_removed_entirely(spark):
    assert (
        _strip(spark, "a<script>alert('x')</script>b<style>p em</style>c")
        == "a b c"
    )


def test_multiline_script_block_removed(spark):
    assert _strip(spark, "a<script>\nline1\nline2\n</script>b") == "a b"


def test_tags_become_word_boundaries(spark):
    assert _strip(spark, "a<br>b<p class='x'>c</p>") == "a b c"


def test_entities_decode_after_tag_removal(spark):
    # escaped markup must decode to literal text, not get stripped
    assert _strip(spark, "x &lt;b&gt; y") == "x <b> y"
    assert _strip(spark, "A &amp; B") == "A & B"
    # double-escaped ampersand decodes exactly one level
    assert _strip(spark, "&amp;lt;") == "&lt;"


def test_comments_and_whitespace_collapse(spark):
    assert _strip(spark, "  a  <!-- hidden\ntext -->   b  ") == "a b"
