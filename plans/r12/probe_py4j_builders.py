#!/usr/bin/env python
"""Count py4j round trips for individual OPERATOR BUILDERS (not whole
queries) — the drill-down companion of probe_py4j_count.py, used to
decide which builder inside a chatty query is worth the §12 SQL-template
conversion. Ad-hoc, delete-safe.
"""

from __future__ import annotations

import sys

HERE = "/root/repo"
sys.path.insert(0, HERE)

import py4j.clientserver as cs  # noqa: E402

COUNTER = {"n": 0}
_orig = cs.ClientServerConnection.send_command


def _patched(self, *a, **k):
    COUNTER["n"] += 1
    return _orig(self, *a, **k)


cs.ClientServerConnection.send_command = _patched

from pyspark.sql import functions as F  # noqa: E402

from vectorsearch_applications_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="py4j_builders_r12")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def count(label, fn):
    fn()  # warmup (lazy imports / memos)
    COUNTER["n"] = 0
    fn()
    print(f"{COUNTER['n']:7d}  {label}")


from vectorsearch_applications_spark.operators import dedup as dd  # noqa: E402
from vectorsearch_applications_spark.operators import lsh as lsh  # noqa: E402

planes = lsh.lsh_planes()

count("shingles (expr only)", lambda: dd.shingles("text", 3))
count("minhash_signatures_wide", lambda: dd.minhash_signatures_wide(docs))
count("minhash_bands_from_wide",
      lambda: dd.minhash_bands_from_wide(dd.minhash_signatures_wide(docs)))
count("minhash_bands", lambda: dd.minhash_bands(docs))
count("minhash_bands_projection", lambda: dd.minhash_bands_projection(docs))
count("minhash_lsh_pairs (no ckpt job counted)",
      lambda: dd.minhash_lsh_pairs(docs))
count("simhash_fingerprints", lambda: dd.simhash_fingerprints(docs))
count("simhash_fingerprints_projection",
      lambda: dd.simhash_fingerprints_projection(docs))
count("simhash_bands", lambda: dd.simhash_bands(docs))
count("simhash_neardup_pairs", lambda: dd.simhash_neardup_pairs(docs))
count("lsh_bucket_table", lambda: lsh.lsh_bucket_table(emb, planes))
count("lsh_search", lambda: lsh.lsh_search(
    emb, emb.limit(2).select(F.col("vec_id").alias("query_id"),
                             F.col("embedding").alias("query_vec")), planes))
count("ngram_jaccard_pairs", lambda: dd.ngram_jaccard_pairs(docs.limit(50)))

from vectorsearch_applications_spark.operators import textstats as ts  # noqa: E402

for name in ["bigram_lm_scores", "ngrams"]:
    if hasattr(ts, name):
        f = getattr(ts, name)
        if name == "ngrams":
            count("textstats.ngrams expr", lambda: f("text", 2))
        else:
            count(f"textstats.{name}", lambda: f(docs))
