"""Distributed BPE tokenizer training — merge learning over the corpus.

Byte-pair encoding training (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016 — public) is the tokenizer
side of a training-data platform. The textbook scale property: after ONE
corpus pass aggregates word frequencies, every merge iteration runs on
the WORD-FREQUENCY table — vocabulary-sized, orders of magnitude smaller
than the corpus. A 100 TB corpus is touched exactly once.

Per iteration:
  1. adjacent symbol pairs, weighted by word count, one map-side-combined
     aggregation (OVERLAPPING pair positions, the standard BPE count);
  2. the argmax pair — ties broken (count DESC, left ASC, right ASC) so
     the learned merge sequence is total-order deterministic;
  3. greedy left-to-right rewrite of every word's symbol sequence —
     a Catalyst ``aggregate`` fold with the merge pair as LITERALS (the
     pair is one driver-side row per iteration — the same O(1) driver
     decision every BPE trainer makes).

The fold's accumulator is the space-joined symbol string (cross-engine
trick: DuckDB's list_reduce constrains the accumulator to the element
type, and VARCHAR is both). Greedy semantics: a symbol just created by a
merge never re-merges within the same iteration — the ``endswith``
full-token check is false the moment the tail symbol becomes the merged
pair (see test_bpe_merge_greedy_on_runs).

Rows never contain spaces inside symbols (tokenize() guarantees \\W-free
tokens), so the space-joined form is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the one corpus pass. Symbols start as characters."""
    from ..functions.text import tokenize

    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted overlapping adjacent-pair counts over the symbol arrays."""
    toks = F.split(F.col("syms"), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.get(toks, i).alias("l"), F.get(toks, i + 1).alias("r")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.l", "p.r")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def _merge_fold(l: str, r: str):
    """Greedy left-to-right merge of adjacent (l, r) as a string fold.

    acc holds the rewritten prefix ('s1 s2 ...'); per symbol x:
    if (acc == l or acc endswith ' '+l) and x == r -> replace the tail
    symbol l with l+r, else append ' '+x. Both conditions check FULL
    symbols (the space prefix / whole-string equality), so a tail like
    'xa' never fires for l='a', and a freshly merged 'lr' tail no longer
    equals l — exactly greedy non-reentrant semantics."""
    lit_l, lit_r = F.lit(l), F.lit(r)

    def step(acc, x):
        mergeable = (
            (acc == lit_l) | acc.endswith(F.concat(F.lit(" "), lit_l))
        ) & (x == lit_r)
        merged = F.concat(
            F.substring(acc, 1, F.length(acc) - F.length(lit_l)),
            lit_l,
            lit_r,
        )
        return F.when(mergeable, merged).otherwise(
            F.concat(acc, F.lit(" "), x)
        )

    return step


def apply_merge(words: DataFrame, l: str, r: str) -> DataFrame:
    """Rewrite every symbol string under one learned merge."""
    toks = F.split(F.col("syms"), " ")
    folded = F.aggregate(
        F.slice(toks, 2, F.size(toks) - 1),
        F.get(toks, 0),
        _merge_fold(l, r),
    )
    return words.select(folded.alias("syms"), "cnt")


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns (merge_rank,
    left, right, pair_count) — the merge table a tokenizer ships."""
    words = word_frequency_table(docs, text_col).select(
        F.concat_ws(" ", F.split("word", "")).alias("syms"), "cnt"
    )
    words = words.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merges.append((i + 1, l, r, c))
        words = apply_merge(words, l, r).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )
