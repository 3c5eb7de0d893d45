"""Property-based invariants (hypothesis) for the custom operators —
randomized corpora checked against pure-Python reference implementations."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from vectorsearch_applications_spark.operators.chunking import chunk_tokens
from vectorsearch_applications_spark.operators.dedup import simhash_fingerprints
from vectorsearch_applications_spark.operators.hybrid import minmax_normalize

WORDS = ["spark", "join", "agg", "x1", "batch", "the", "merge", "key", "row"]

texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=40).map(" ".join),
    min_size=1,
    max_size=12,
)

SETTINGS = settings(max_examples=5, deadline=None)


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"\W+", s.lower()) if t]


@SETTINGS
@given(texts, st.integers(1, 8), st.integers(0, 3))
def test_chunking_partitions_tokens(spark, corpus, size, overlap):
    if overlap >= size:
        overlap = size - 1
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    rows = chunk_tokens(df, chunk_size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = size - overlap
    for i, text in enumerate(corpus):
        toks = _tok(text)
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_index"])
        if not toks:
            assert got == []
            continue
        # chunk_index contiguous from 0
        assert [r["chunk_index"] for r in got] == list(range(len(got)))
        # every chunk reproduces the token window; all ≤ size tokens
        for j, r in enumerate(got):
            window = toks[j * stride : j * stride + size]
            assert r["chunk_text"].split(" ") == window
            assert r["n_chunk_tokens"] == len(window) <= size
        # with overlap=0 chunks exactly partition the token list
        if overlap == 0:
            flat = [t for r in got for t in r["chunk_text"].split(" ")]
            assert flat == toks
        # every token is covered by at least one chunk
        covered = len(got[-1]["chunk_text"].split(" ")) + (len(got) - 1) * stride
        assert covered >= len(toks)


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.floats(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_minmax_bounds_and_order(spark, rows):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g long, v double"
    )
    out = minmax_normalize(df, "v", ["g"]).collect()
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["g"], []).append((r["v"], r["norm"]))
    for g, pairs in by_group.items():
        for v, n in pairs:
            assert -1e-12 <= n <= 1.0 + 1e-12
        # monotone: larger value → larger-or-equal norm
        pairs.sort()
        norms = [n for _, n in pairs]
        assert all(a <= b + 1e-12 for a, b in zip(norms, norms[1:]))


@SETTINGS
@given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=30))
def test_simhash_order_invariant(spark, tokens):
    """SimHash is a bag-of-words fingerprint: permuting tokens must not
    change it; changing the multiset must be able to."""
    a = " ".join(tokens)
    b = " ".join(reversed(tokens))
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    assert fp[1] == fp[2]
    assert 0 <= fp[1] < 2**32


@SETTINGS
@given(texts, st.integers(1, 5))
def test_ngrams_match_python_model(spark, corpus, n):
    """textstats.ngrams / dedup.shingles == the naive sliding window (both
    let-bind their token array — the rewrite must not change semantics)."""
    from pyspark.sql import functions as F

    from vectorsearch_applications_spark.operators.dedup import shingles
    from vectorsearch_applications_spark.operators.textstats import ngrams
    from vectorsearch_applications_spark.functions.text import tokenize

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        ngrams(tokenize("text"), n).alias("g"),
        shingles("text", n).alias("s"),
    ).collect()
    for r in rows:
        toks = _tok(corpus[r["doc_id"]])
        expect = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        assert r["g"] == expect
        assert r["s"] == expect


messy_texts = st.lists(
    st.text(
        alphabet="abz019 '!.,é\t\n-",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@SETTINGS
@given(messy_texts)
def test_bpe_tokenize_matches_python_re(spark, corpus):
    """Spark regexp_extract_all (Java regex) == Python re.findall — both
    leftmost-first — over punctuation / contractions / digits / unicode."""
    import re as _re

    from vectorsearch_applications_spark.functions.text import (
        BPE_PATTERN,
        bpe_tokenize,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    rows = df.select("doc_id", bpe_tokenize("text").alias("t")).collect()
    for r in rows:
        expect = _re.findall(BPE_PATTERN, corpus[r["doc_id"]].lower())
        assert r["t"] == expect


@SETTINGS
@given(
    st.lists(
        st.text(alphabet="theingscoundr .,!X", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_langid_scores_match_python_model(spark, corpus):
    """Spark replace-length trigram counting == Python str.count (both are
    left-to-right non-overlapping) on adversarial near-gram text."""
    from vectorsearch_applications_spark.operators.textstats import (
        LANG_PROFILES,
        langid_ngram,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in langid_ngram(df).collect()}
    for i, text in enumerate(corpus):
        t = " " + re.sub(r"[^a-z ]", " ", text.lower()) + " "
        for lang, grams in LANG_PROFILES.items():
            expected = sum(w * t.count(g) for g, w in grams.items())
            assert rows[i][f"score_{lang}"] == expected, (text, lang)


@SETTINGS
@given(st.integers(0, 10_000), st.floats(0.0, 1.0))
def test_stratified_sample_matches_python_md5_model(spark, base, frac):
    import hashlib

    from vectorsearch_applications_spark.operators.sampling import (
        stratified_sample,
    )

    ids = list(range(base, base + 50))
    df = spark.createDataFrame([(i, "en") for i in ids], "doc_id long, lang string")
    got = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": frac}).select("doc_id").collect()
    }
    thresh = round(frac * 10_000)
    expected = {
        i
        for i in ids
        if int(hashlib.md5(f"{i}#sample".encode()).hexdigest()[:8], 16) % 10_000
        < thresh
    }
    assert got == expected


@SETTINGS
@given(
    st.lists(st.integers(0, 500_000), min_size=1, max_size=40, unique=True),
    st.lists(
        st.tuples(st.integers(0, 500_000), st.integers(0, 200_000)),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([1, 7, 100, 86_400, 1_000_000]),
)
def test_interval_join_matches_python_model(spark, ts_list, iv_specs, width):
    """Bucketed rewrite == brute-force containment for arbitrary interval
    layouts (empty, sub-bucket, boundary-straddling, nested, huge-width)."""
    from vectorsearch_applications_spark.operators.rangejoin import interval_join

    facts = spark.createDataFrame(
        list(enumerate(ts_list)), "fact_id long, es long"
    )
    intervals = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(iv_specs)],
        "window_id long, w_start long, w_end long",
    )
    got = {
        (r["fact_id"], r["window_id"])
        for r in interval_join(
            facts, intervals, "es", "w_start", "w_end", width
        ).collect()
    }
    want = {
        (fi, wi)
        for fi, t in enumerate(ts_list)
        for wi, (s, ln) in enumerate(iv_specs)
        if s <= t < s + ln
    }
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 400_000), st.integers(1, 150_000)),
        min_size=1,
        max_size=10,
    ),
    st.lists(
        st.tuples(st.integers(0, 400_000), st.integers(1, 150_000)),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([1, 7, 100, 86_400, 1_000_000]),
)
def test_interval_overlap_join_matches_python_model(
    spark, l_specs, r_specs, width
):
    """Bucketed overlap rewrite == brute-force pair enumeration, exactly
    once per pair (the first-overlap-bucket residual must dedup pairs
    sharing several buckets)."""
    from vectorsearch_applications_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(l_specs)],
        "l_id long, l_start long, l_end long",
    )
    right = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(r_specs)],
        "r_id long, r_start long, r_end long",
    )
    rows = [
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end", width
        ).collect()
    ]
    want = {
        (li, ri)
        for li, (ls, ll) in enumerate(l_specs)
        for ri, (rs, rl) in enumerate(r_specs)
        if ls < rs + rl and rs < ls + ll
    }
    assert len(rows) == len(set(rows)), "pair emitted more than once"
    assert set(rows) == want


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    """Hash-min fixpoint == classic union-find on random small graphs
    (self-loops, duplicates, arbitrary topology)."""
    from vectorsearch_applications_spark.operators.graph import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = set()
    for a, b in edge_list:
        if a != b:
            union(a, b)
            verts |= {a, b}
    want = {v: find(v) for v in verts}
    # path-compress to the true min representative
    want = {v: find(v) for v in verts}

    e = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(e).collect()
    }
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(5, 60),
)
def test_funnel_matches_python_model(spark, types, times, window):
    """Window-algebra funnel == brute-force chain search per user."""
    from vectorsearch_applications_spark.operators.funnel import funnel_counts

    n = min(len(types), len(times))
    rows = [(1, types[i], times[i]) for i in range(n)]
    e = spark.createDataFrame(rows, "user_id long, event_type string, es long")
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel_counts(e, ["view", "click", "purchase"], window).collect()
    }

    evs = rows
    s1 = any(t == "view" for _, t, _ in evs)
    s2 = any(
        tc == "click" and any(tv == "view" and ev < ec for _, tv, ev in evs)
        for _, tc, ec in evs
    )
    s3 = any(
        tp == "purchase"
        and any(
            tc == "click"
            and ec < ep
            and any(
                tv == "view" and ev < ec and ep - ev <= window
                for _, tv, ev in evs
            )
            for _, tc, ec in evs
        )
        for _, tp, ep in evs
    )
    want = {"view": int(s1), "click": int(s2), "purchase": int(s3)}
    assert got == want


@SETTINGS
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=20),
    st.integers(5, 50),
)
def test_pack_sequences_matches_python_model(spark, tok_counts, budget):
    """Sharded concat-and-chunk == python cumulative model (single shard)."""
    from vectorsearch_applications_spark.operators.topk import pack_sequences

    rows = [(i, t) for i, t in enumerate(tok_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["bin_id"]: (r["n_docs"], r["bin_tokens"])
        for r in pack_sequences(docs, budget=budget, n_shards=1).collect()
    }

    cum = 0
    starts: dict[int, int] = {}
    for _, t in rows:
        b = cum // budget
        starts[b] = starts.get(b, 0) + 1
        cum += t
    want = {
        b: (n, min(budget, cum - b * budget)) for b, n in starts.items()
    }
    assert got == want


# --- round 4: MMR greedy selection vs a pure-Python model ------------------

# Dyadic component values make every dot product exact in IEEE double, so
# the numpy implementation and the Python model agree bitwise and the
# property is deterministic (no float-tie ambiguity).
_dyadic = st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0])
_vecs = st.lists(
    st.tuples(
        st.lists(_dyadic, min_size=3, max_size=3),
        st.sampled_from([0.0, 0.125, 0.25, 0.5, 0.75, 1.0]),
    ),
    min_size=1,
    max_size=8,
)


def _mmr_model(cands, k, lam):
    """cands: list of (vid, vec, rel). Greedy argmax, id tie-break."""
    selected, out = [], []
    remaining = sorted(cands, key=lambda c: c[0])
    for _ in range(min(k, len(remaining))):
        best = None
        for vid, vec, rel in remaining:
            if any(vid == s[0] for s in selected):
                continue
            if not selected:
                score = rel
            else:
                score = lam * rel - (1 - lam) * max(
                    sum(a * b for a, b in zip(vec, s[1])) for s in selected
                )
            if best is None or score > best[1]:
                best = ((vid, vec, rel), score)
        selected.append(best[0])
        out.append((best[0][0], score_round(best[1])))
    return out


def score_round(x):
    return round(x, 9)


@SETTINGS
@given(_vecs, st.integers(1, 4), st.sampled_from([0.25, 0.5, 0.75]))
def test_mmr_matches_python_model(spark, vecs, k, lam):
    from pyspark.sql import functions as F

    from vectorsearch_applications_spark.operators.mmr import mmr_diversify

    cands = [(i, list(v), rel) for i, (v, rel) in enumerate(vecs)]
    df = spark.createDataFrame(
        cands, "vec_id long, embedding array<double>, relevance double"
    ).withColumn("query_id", F.lit(0))
    got = [
        (r["vec_id"], score_round(r["mmr_score"]))
        for r in mmr_diversify(df, rel_col="relevance", k=k, lam=lam)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == _mmr_model(cands, k, lam)


@SETTINGS
@given(
    st.lists(
        st.lists(st.integers(0, 20), min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=3,
    ),
    st.integers(1, 90),
)
def test_rrf_matches_python_model(spark, lists, k):
    """RRF re-ranking equals the brute-force model on doc sets; scores
    compared with tolerance (3+-list sums are order-dependent in the last
    ulp), ranks compared exactly with the doc-id tie-break."""
    from vectorsearch_applications_spark.operators.hybrid import rrf_fuse

    dfs = [
        spark.createDataFrame(
            [(0, d, i + 1) for i, d in enumerate(docs)],
            "query_id long, doc_id long, rank int",
        )
        for docs in lists
    ]
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for docs in lists:
        for i, d in enumerate(docs):
            scores[d] = scores.get(d, 0.0) + 1.0 / (k + i + 1)
            counts[d] = counts.get(d, 0) + 1
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = (
        rrf_fuse(dfs, k=k, limit=10)
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r in got:
        assert abs(r["score"] - scores[r["doc_id"]]) < 1e-12
        assert r["n_lists"] == counts[r["doc_id"]]


@SETTINGS
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=60),
    st.integers(1, 4),
)
def test_fm_sketch_matches_python_model(spark, values, n_buckets_pow):
    """FM rho/bucket/estimate vs a pure-Python md5 model — the sketch is
    deterministic, so the match is exact, not statistical."""
    import hashlib

    from vectorsearch_applications_spark.operators.sketches import (
        fm_distinct_sketch,
    )

    n_buckets = 2 ** n_buckets_pow
    df = spark.createDataFrame(
        [("g", v) for v in values], "grp string, v long"
    )
    got = fm_distinct_sketch(df, "grp", "v", n_buckets=n_buckets).collect()
    assert len(got) == 1
    r = got[0]

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def rho(h):
        if h == 0:
            return 32
        n = 0
        while h % 2 == 0:
            h //= 2
            n += 1
        return n

    per_bucket: dict[int, int] = {}
    for v in set(values):
        h = h32(str(v))
        b = h % n_buckets
        per_bucket[b] = max(per_bucket.get(b, -1), rho(h // n_buckets))
    want_r = max(per_bucket.values())
    assert r["exact_distinct"] == len(set(values))
    assert r["fm_r_max"] == want_r
    assert r["fm_estimate_pow2"] == 2 ** want_r


@SETTINGS
@given(st.lists(st.sampled_from(WORDS), min_size=1, max_size=80))
def test_cms_matches_python_model(spark, tokens):
    import hashlib
    from collections import Counter

    from vectorsearch_applications_spark.operators.sketches import (
        cms_counts,
        cms_estimate,
    )

    d, w = 3, 64
    tf = Counter(tokens)
    df = spark.createDataFrame(list(tf.items()), "term string, n long")
    sketch = cms_counts(df, "term", d=d, w=w, weight_col="n")
    est = cms_estimate(
        sketch, df.select("term"), term_col="term", d=d, w=w
    ).collect()

    def bucket(j, t):
        return int(hashlib.md5(f"{j}#{t}".encode()).hexdigest()[:8], 16) % w

    cells: dict[tuple[int, int], int] = {}
    for t, n in tf.items():
        for j in range(d):
            key = (j, bucket(j, t))
            cells[key] = cells.get(key, 0) + n
    want = {
        t: min(cells[(j, bucket(j, t))] for j in range(d)) for t in tf
    }
    got = {r["term"]: r["cms_estimate"] for r in est}
    assert got == want


# --- round-5 late operators: prefix-filtered Jaccard, sweep-line
# concurrency, SCD2 intervals ---

from vectorsearch_applications_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
)
from vectorsearch_applications_spark.operators.timeseries import (  # noqa: E402
    peak_concurrency,
    scd2_intervals,
)


@SETTINGS
@given(texts, st.sampled_from([(3, 10), (1, 2), (4, 5)]))
def test_prefix_filter_always_equals_exact_join(spark, corpus, t):
    num, den = t
    # sparse ids on purpose: 7i+3 never dense, never zero-based
    df = spark.createDataFrame(
        [(7 * i + 3, s) for i, s in enumerate(corpus)],
        "doc_id long, text string",
    )
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(df, threshold=num / den).collect()
    }
    pruned = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_prefix_pairs(
            df, threshold_num=num, threshold_den=den
        ).collect()
    }
    assert pruned == exact


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 10)),
    min_size=1,
    max_size=20,
)


@SETTINGS
@given(intervals_strategy)
def test_peak_concurrency_matches_brute_force(spark, iv):
    rows = [("k", s, s + w) for s, w in iv]
    df = spark.createDataFrame(rows, "k string, t0 long, t1 long")
    (got,) = peak_concurrency(df, key_col="k").collect()
    # brute force: concurrency at every instant (end-exclusive)
    instants = range(0, max(s + w for s, w in iv) + 1)
    conc = {
        t: sum(1 for s, w in iv if s <= t < s + w) for t in instants
    }
    peak = max(conc.values())
    first = min(t for t, c in conc.items() if c == peak)
    assert got["peak_concurrent"] == peak
    assert got["peak_at"] == first


events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),          # user
        st.sampled_from("abc"),     # state
        st.integers(0, 20),         # time (collisions likely)
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(events_strategy)
def test_scd2_partitions_each_users_timeline(spark, ev):
    rows = [
        (u, s, t, i) for i, (u, s, t) in enumerate(ev)
    ]  # event_id = input order, the tie-break
    df = spark.createDataFrame(
        rows, "user_id long, state string, us long, event_id long"
    )
    out = scd2_intervals(df).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, runs in by_user.items():
        runs.sort(key=lambda r: r["run_seq"])
        # run_seq contiguous from 1; intervals chain exactly; counts add up
        assert [r["run_seq"] for r in runs] == list(range(1, len(runs) + 1))
        for a, b in zip(runs, runs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]  # runs are maximal
        assert runs[-1]["valid_to"] is None
        assert sum(r["n_events"] for r in runs) == sum(
            1 for (uu, _, _) in ev if uu == u
        )
        # reference: replay the user's events in (us, event_id) order
        ordered = sorted(
            [(t, i, s) for i, (uu, s, t) in enumerate(ev) if uu == u]
        )
        collapsed = []
        for _, _, s in ordered:
            if not collapsed or collapsed[-1] != s:
                collapsed.append(s)
        assert [r["state"] for r in runs] == collapsed


from vectorsearch_applications_spark.operators.timeseries import (  # noqa: E402
    scd2_apply_increment,
)


@SETTINGS
@given(events_strategy, st.integers(0, 20))
def test_scd2_increment_equals_rebuild_at_any_split(spark, ev, split):
    rows = [(u, s, t, i) for i, (u, s, t) in enumerate(ev)]
    df = spark.createDataFrame(
        rows, "user_id long, state string, us long, event_id long"
    )
    b1, b2 = df.filter(df.us < split), df.filter(df.us >= split)
    dim = scd2_apply_increment(scd2_intervals(df.limit(0)), b1)
    dim = scd2_apply_increment(dim, b2)
    key = lambda r: (r["user_id"], r["run_seq"])  # noqa: E731
    assert sorted(dim.collect(), key=key) == sorted(
        scd2_intervals(df).collect(), key=key
    )


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 60_000_000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_matches_python_md5_model(spark, rows):
    """sample_weighted_orders' integer inclusion rule == the pure-Python
    md5 model: keep iff hash32(key)·w_max < w·2^32."""
    import hashlib

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k long, w long")
    wmax = max(w for _, w in rows)
    h32 = F.conv(
        F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    got = {
        r["k"]
        for r in df.crossJoin(
            F.broadcast(df.agg(F.max("w").alias("wmax")))
        )
        .filter(h32 * F.col("wmax") < F.col("w") * F.lit(4294967296))
        .collect()
    }
    expected = {
        k
        for k, w in rows
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) * wmax
        < w * 2**32
    }
    assert got == expected


@SETTINGS
@given(
    st.lists(st.integers(0, 1000), min_size=2, max_size=40),
)
def test_zscore_integer_rule_matches_float_zscore(spark, counts):
    """The cross-multiplied BIGINT inequality (x·k−Σx)² > 4(k·Σx²−(Σx)²)
    is exactly |x−μ| > 2σ (population σ) — verified against the float
    form computed in Python with exact integer inputs."""
    import math

    k = len(counts)
    sm = sum(counts)
    ssq = sum(c * c for c in counts)
    mu = sm / k
    sigma = math.sqrt(max(ssq / k - mu * mu, 0.0))
    for x in counts:
        integer_rule = (x * k - sm) ** 2 > 4 * (k * ssq - sm * sm)
        # compare to the float z-score away from the boundary (exactly ON
        # the boundary the float form is rounding noise — the integer
        # rule is the ground truth there)
        if abs((x - mu) ** 2 - 4 * sigma * sigma) > 1e-6:
            assert integer_rule == (abs(x - mu) > 2 * sigma)


@SETTINGS
@given(
    st.lists(st.integers(0, 100_000), min_size=1, max_size=60),
    st.sampled_from([25, 50, 75, 90]),
)
def test_binned_quantile_brackets_exact_quantile(spark, values, q_pct):
    """histogram_quantiles_binned's rule (first bin with cum·100 ≥ q·N)
    returns the bin CONTAINING the exact order-statistic quantile — the
    sketch's bracketing guarantee, checked against sorted ground truth."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    width = 100
    df = spark.createDataFrame([(v,) for v in values], "v long")
    h = (
        df.select((F.col("v") / width).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    n = len(values)
    est_bin = (
        h.filter(F.col("cum") * 100 >= q_pct * n)
        .agg(F.min("bin").alias("b"))
        .collect()[0]["b"]
    )
    # exact order statistic at the same rank definition: ⌈q·N/100⌉-th
    rank = -(-q_pct * n // 100)
    exact = sorted(values)[rank - 1]
    assert est_bin == exact // width  # the bin that holds the true value


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
def test_two_hop_reach_matches_brute_force(spark, pairs):
    from pyspark.sql import functions as F

    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    if not edges:
        return
    e = spark.createDataFrame(sorted(edges), "u long, v long")
    s = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .distinct()
    )
    s1 = s.select(F.col("src").alias("node"), F.col("dst").alias("mid"))
    s2 = s.select(F.col("src").alias("mid"), F.col("dst").alias("nb2"))
    two = (
        s1.join(s2, "mid")
        .filter(F.col("nb2") != F.col("node"))
        .select("node", "nb2")
        .distinct()
        .join(
            s.select(F.col("src").alias("node"), F.col("dst").alias("nb2")),
            ["node", "nb2"],
            "left_anti",
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_2hop"))
    )
    got = {r["node"]: r["n_2hop"] for r in two.collect()}
    # brute force
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbrs in adj.items():
        reach2 = set()
        for m in nbrs:
            reach2 |= adj[m]
        reach2 -= {node}
        reach2 -= nbrs
        expect = len(reach2)
        assert got.get(node, 0) == expect


@SETTINGS
@given(
    st.lists(
        st.tuples(st.sampled_from("ABC"), st.sampled_from("pqrs")),
        min_size=1,
        max_size=40,
    )
)
def test_group_mode_matches_counter(spark, rows):
    from collections import Counter

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "g string, v string")
    cnt = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    got = {
        r["g"]: (r["v"], r["n"])
        for r in cnt.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.desc("n"), F.asc("v"))
            ),
        )
        .filter(F.col("rk") == 1)
        .collect()
    }
    by_g: dict[str, Counter] = {}
    for g, v in rows:
        by_g.setdefault(g, Counter())[v] += 1
    for g, c in by_g.items():
        # tie-break: max count, then lexicographically smallest value
        top_n = max(c.values())
        expect_v = min(v for v, n in c.items() if n == top_n)
        assert got[g] == (expect_v, top_n)


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(WORDS), min_size=0, max_size=40
            ).map(" ".join),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_minhash_band_projection_equals_batch_build(spark, corpus):
    # r8: the zero-shuffle per-row projection and the explode+distinct+
    # agg batch build must emit the identical band table on ANY corpus,
    # including docs below the shingle bar, duplicate texts, and NULL
    # text (r9 advice fix: size(NULL) is NULL, so a bare size==0 guard
    # fell to the otherwise branch and keyed every null-text doc md5(''))
    from vectorsearch_applications_spark.operators.dedup import (
        minhash_bands,
        minhash_bands_projection,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    batch = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in minhash_bands(df, num_hashes=8, band_size=2).collect()
    }
    proj = {
        (r["doc_id"], r["band"], r["band_key"])
        for r in minhash_bands_projection(
            df, num_hashes=8, band_size=2
        ).collect()
    }
    assert proj == batch


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(WORDS), min_size=0, max_size=40
            ).map(" ".join),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_simhash_projection_equals_batch_build(spark, corpus):
    # r9: the zero-shuffle per-row fingerprint fold and the explode+
    # vocab+groupBy batch shape must agree on ANY corpus, including
    # duplicate texts, token-less docs, and NULL text (both drop them)
    from vectorsearch_applications_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_fingerprints_projection,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    batch = {tuple(r) for r in simhash_fingerprints(df).collect()}
    proj = {
        tuple(r) for r in simhash_fingerprints_projection(df).collect()
    }
    assert proj == batch


@SETTINGS
@given(texts, st.integers(0, 6), st.integers(2, 5))
def test_bpe_encode_lossless_and_checkpoint_invariant(spark, corpus, n_merges, ck):
    # lossless-encode + checkpoint-interval invariance on random corpora:
    # merges regroup symbols, never rewrite them, at ANY fold truncation
    from pyspark.sql import functions as F

    from vectorsearch_applications_spark.operators.bpe import (
        encode_vocab,
        learn_bpe_merges,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in learn_bpe_merges(spark, df, n_merges=n_merges)
        .orderBy("merge_rank")
        .collect()
    ]
    vocab = df.select(
        F.explode(F.split(F.lower("text"), r"\W+")).alias("word")
    ).filter(F.col("word") != "").distinct()
    enc = sorted(encode_vocab(vocab, merges, checkpoint_every=ck).collect())
    ref = sorted(encode_vocab(vocab, merges, checkpoint_every=0).collect())
    assert enc == ref
    assert all(r["syms"].replace(" ", "") == r["word"] for r in enc)


@SETTINGS
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=25).map(
            " ".join
        ),
        min_size=2,
        max_size=10,
    ),
    st.integers(1, 3),
)
def test_two_stage_late_interaction_subset_of_dense(spark, corpus, nq):
    # r9: on ANY corpus, every two-stage hit must carry the dense form's
    # exact score for that (query, doc) pair, and the candidate bound
    # must hold (hits ⊆ BM25 top-N)
    from vectorsearch_applications_spark.operators.bm25 import (
        bm25_cache_clear,
        bm25_search,
    )
    from vectorsearch_applications_spark.operators.late_interaction import (
        late_interaction_search,
        late_interaction_two_stage,
    )

    bm25_cache_clear()
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(i, corpus[i]) for i in range(min(nq, len(corpus)))],
        "query_id long, query string",
    )
    n = 3
    two = late_interaction_two_stage(
        docs, queries, k=2, n_candidates=n, dim=8
    ).collect()
    dense = {
        (r["query_id"], r["doc_id"]): round(r["score"], 4)
        for r in late_interaction_search(
            docs, queries, k=1000, dim=8
        ).collect()
    }
    cands = {
        (r["query_id"], r["doc_id"])
        for r in bm25_search(docs, queries, limit=n).collect()
    }
    for r in two:
        key = (r["query_id"], r["doc_id"])
        assert key in cands
        assert round(r["score"], 4) == dense[key]


@SETTINGS
@given(
    st.lists(
        st.lists(
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=18,
    ),
    st.integers(2, 3),
)
def test_semantic_screen_matches_python_model(spark, vecs, n_cents):
    """semantic_screen_batch == a pure-Python SemDeDup screen on random
    small vector sets: same frozen-codebook argmin (left-to-right 1-dot
    fold, ties to the lower centroid id), same same-cluster pair rule
    (dot >= threshold, >=1 batch side, a < b orientation). The finite
    value grid makes every float comparison exact in both engines."""
    from pyspark.sql import functions as F

    from vectorsearch_applications_spark.operators.ann import (
        assign_nearest_centroid,
    )
    from vectorsearch_applications_spark.operators.dedup import (
        semantic_screen_batch,
    )

    threshold = 0.5
    cents = list(enumerate(vecs[:n_cents]))

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def assign(v):
        return min(cents, key=lambda c: (1.0 - dot(v, c[1]), c[0]))[0]

    rows = [(i, v, assign(v)) for i, v in enumerate(vecs)]
    standing = [r for r in rows if r[0] % 2 == 0]
    batch = [r for r in rows if r[0] % 2 != 0]
    want = set()
    for bi, bv, bc in batch:
        for oi, ov, oc in standing + batch:
            if oi == bi or oc != bc:
                continue
            if dot(bv, ov) >= threshold:
                want.add((min(bi, oi), max(bi, oi)))

    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<double>"
    )
    cdf = spark.createDataFrame(
        [(c, v) for c, v in cents], "centroid_id int, centroid array<double>"
    )
    asg = assign_nearest_centroid(df, cdf, keep_vec=True)
    got_df = semantic_screen_batch(
        asg.filter(F.col("vec_id") % 2 == 0),
        asg.filter(F.col("vec_id") % 2 != 0),
        threshold=threshold,
    )
    got = {(r["vec_a"], r["vec_b"]) for r in got_df.collect()}
    assert got == want
    # the Spark assignment itself matches the Python argmin model
    got_asg = {
        (r["vec_id"], r["centroid_id"]) for r in asg.collect()
    }
    assert got_asg == {(i, c) for i, _, c in rows}


def test_simhash_fingerprints_sql_construction_bitwise_equal(spark):
    """r12 §12 recipe: simhash_fingerprints' bit-sum aggregates and
    fingerprint chain now parse JVM-side as SQL; they must match the
    retired DataFrame-API form (rebuilt inline here) bitwise — same
    shiftright/&1 bit test, same tf/-tf branches, same left-assoc
    CAST-to-bigint add chain."""
    from pyspark.sql import functions as F

    from vectorsearch_applications_spark.functions.text import (
        stable_hash64,
        tokenize,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "unicode λ text ümlaut ß and MORE tokens 42"),
            (4, ""),
            (5, None),
            (6, "a b c a b a"),
        ],
        "doc_id long, text string",
    )
    bits = 32
    toks = df.select(F.col("doc_id"), tokenize("text").alias("t"))
    exploded = toks.select("doc_id", F.explode("t").alias("term"))
    vocab = exploded.select("term").distinct().select(
        "term", stable_hash64(F.col("term")).alias("h")
    )
    tf = (
        exploded.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(vocab, "term")
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"_s{j}")
        for j in range(bits)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for j in range(bits):
        bitval = F.when(
            F.col(f"_s{j}") > 0, F.lit(2**j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = bitval if fingerprint is None else fingerprint + bitval
    old = sums.select("doc_id", fingerprint.alias("simhash")).collect()
    new = simhash_fingerprints(df).collect()
    assert sorted(map(repr, new)) == sorted(map(repr, old))
