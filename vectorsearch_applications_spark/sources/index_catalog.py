"""Catalog/introspection for the persisted index families — the
operational companion to the build/append/delete/compact lifecycle.

``index_inventory`` answers the maintenance questions the lifecycle
docs keep deferring to "the compaction cadence": which indexes exist
next to a collection root, how big is each, and how much tombstone
debt has accumulated since the last compaction (the live view pays one
broadcast anti-join per read until then — sources/tombstones.py).

Reference analog: the collection introspection surface
(src/database/weaviate_interface_v4.py show_all_collections /
show_collection_config) — the reference's server exposes its schema
and shard stats; this is that surface for this engine's on-disk index
tables.

Driver-side by design: the inventory reads directory names plus
per-table counts — bounded metadata, not data — so it is NOT a
registered query (nothing here is an oracle-checkable relation over
the test tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# family suffix -> (main table directory, id column)
FAMILIES = {
    "bm25": ("postings", "doc_id"),
    "ivf": ("assignments", "vec_id"),
    "pq": ("codes", "vec_id"),
    "lsh": ("buckets", "vec_id"),
    "minhash": ("bands", "doc_id"),
    "simhash": ("bands", "doc_id"),
    "semantic": ("assignments", "vec_id"),
}


def index_inventory(spark, root: str) -> DataFrame:
    """One row per persisted index under ``root``:
    (collection, family, path, rows, live_rows, tombstoned_ids,
    n_files, needs_compaction).

    ``rows`` counts physical rows in the family's main table,
    ``live_rows`` the tombstone-filtered view, ``tombstoned_ids`` the
    distinct deleted-id backlog, ``n_files`` the parquet file count
    (every append lands a new file batch, so this is the SMALL-FILE
    debt axis — compaction rewrites fix both); ``needs_compaction`` is
    simply tombstoned_ids > 0 — the signal to schedule
    ``<family>_index_compact`` before read-side anti-join debt (or an
    inline compact_if_reviving on a re-ingest) grows. Counting jobs run
    per index — this is a maintenance sweep, not a hot-path call.
    """
    from .tombstones import apply_tombstones, load_tombstones

    rows = []
    for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if "__" not in entry:
            continue
        collection, family = entry.rsplit("__", 1)
        if family not in FAMILIES:
            continue
        table_name, id_col = FAMILIES[family]
        base = os.path.join(root, entry)
        path = os.path.join(base, table_name)
        if not os.path.isdir(path):
            continue
        table = spark.read.parquet(path)
        n = table.count()
        n_files = sum(
            1
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
        tombs = load_tombstones(spark, base, id_col)
        n_tombs = tombs.count() if tombs is not None else 0
        live = (
            apply_tombstones(spark, base, table, id_col).count()
            if n_tombs
            else n
        )
        rows.append(
            (collection, family, base, n, live, n_tombs, n_files, n_tombs > 0)
        )
    return spark.createDataFrame(
        rows,
        "collection string, family string, path string, rows long, "
        "live_rows long, tombstoned_ids long, n_files long, "
        "needs_compaction boolean",
    )
