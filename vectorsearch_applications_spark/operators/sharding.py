"""Rendezvous (highest-random-weight) shard routing — stateless data
layout for a sharded serving tier.

The reference runs one Weaviate instance; a 100 TB corpus is served by a
fleet, and SOMETHING must decide which shard owns each document. Plain
``hash(id) % S`` reshuffles nearly everything when S changes; rendezvous
hashing (Thaler & Ravishankar, IEEE ToN '98 — public; the scheme behind
consistent routing in many production stores) moves only ~1/(S+1) of the
keys when a shard is added: each key independently scores every shard
with h(key, shard) and routes to the argmax, so removing a shard only
re-homes the keys that shard owned.

Determinism: scores use the repo-standard md5-hex-prefix→BIGINT hash
(engine-portable), so assignments are bitwise reproducible and
SQL-oracle-checkable. Plan: pure projection — the per-key argmax over S
scored structs runs inside whole-stage codegen with ZERO shuffle; the
corpus is never moved to decide where it should live.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _h32


def _score(key: Column, shard: Column) -> Column:
    """h32("<shard>#<key>") — the per-(key, shard) rendezvous weight."""
    return _h32(F.concat(shard.cast("string"), F.lit("#"), key))


def rendezvous_assign(
    rows: DataFrame,
    id_col: str,
    n_shards: int,
    out_col: str = "shard",
) -> DataFrame:
    """Append ``out_col``: the highest-random-weight shard in
    [0, n_shards). Ties (astronomically rare 32-bit hash collisions)
    break toward the LOWER shard id so the choice stays deterministic:
    argmax via array_max over (score, -shard) struct pairs."""
    key = F.col(id_col).cast("string")
    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: F.struct(
                _score(key, s).alias("w"), (-s).alias("neg_shard")
            ),
        )
    )
    return rows.withColumn(
        out_col, (-best["neg_shard"]).cast("bigint")
    )


def rebalance_moves(
    rows: DataFrame,
    id_col: str,
    n_shards_before: int,
    n_shards_after: int,
) -> DataFrame:
    """(id, shard_before, shard_after, moved) for a fleet resize — the
    audit that quantifies rendezvous' minimal-disruption property
    (~|delta|/S of keys move, vs ~all for mod-hashing). Still a pure
    projection."""
    a = rendezvous_assign(rows, id_col, n_shards_before, "shard_before")
    b = rendezvous_assign(a, id_col, n_shards_after, "shard_after")
    return b.withColumn(
        "moved",
        (F.col("shard_before") != F.col("shard_after")).cast("bigint"),
    )
