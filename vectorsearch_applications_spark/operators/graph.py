"""Connected components over an edge list — the clustering step that turns
near-duplicate *pairs* (MinHash-LSH / SimHash band joins) into canonical
*cluster ids*, so a curation pipeline can keep one representative per
duplicate group (reference behavior: the course pipeline dedups chunk
lists Python-side, e.g. /root/reference/src/preprocessor.py keeps first
occurrence; at 100 TB the duplicate relation is a graph and needs a
distributed component labeling, not an in-memory set).

Algorithm: iterated *hash-min* label propagation (the MapReduce-classic
baseline, cf. Rastogi et al., "Finding Connected Components in Map-Reduce
in Logarithmic Rounds", ICDE'13 — our variant is their HASH-MIN):

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one shuffle (groupBy id, min). Round
count equals the component *diameter*, which for near-dup graphs is small
(LSH buckets produce near-cliques), so this beats the O(log^2 n)
large-star/small-star dance in practice while staying fully declarative.
Scale properties per round: the message relation is |E|·2 + |V| rows of
two BIGINTs, shuffled on id — no driver state, no collect. Lineage is
truncated with localCheckpoint every round so the plan does not grow
exponentially across iterations; convergence is detected with a count of
changed labels (one extra action per round, unavoidable for any iterative
fixpoint on Spark).

localCheckpoint trades fault-tolerance for speed: blocks live on executor
storage, so losing an executor mid-computation fails the job (acceptable —
the fixpoint is deterministic and idempotent, a retry recomputes the same
labels). A deployment with strict SLAs swaps in reliable ``checkpoint()``
against the cluster checkpoint dir; the algorithm is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Label each vertex of the undirected graph ``edges`` with the minimum
    vertex id reachable from it.

    Returns (id, component) — ``component`` is the min id of the vertex's
    connected component, a deterministic canonical representative. Only
    vertices that appear in at least one edge are returned (isolated
    vertices are the caller's no-op case).
    """
    # Symmetrize once; self-loops are harmless but dropped to shrink E.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )
    e = e.localCheckpoint(eager=True)

    labels = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # One round of hash-min: each endpoint offers its label to the
        # other; a vertex keeps the min of its own and all offers.
        offers = (
            e.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "component")
            .union(
                e.join(labels.withColumnRenamed("id", "dst"), "dst").select(
                    F.col("src").alias("id"), "component"
                )
            )
            .union(labels)
        )
        new_labels = offers.groupBy("id").agg(
            F.min("component").alias("component")
        ).localCheckpoint(eager=True)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def keep_canonical(
    items: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curation keep-list: drop every clustered item except its component's
    canonical (min-id) representative; items in no cluster are kept.

    One broadcast-able anti-join when the duplicate set is small relative
    to the corpus (the common case); Spark will shuffle-hash it otherwise.
    """
    drop = components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return items.join(drop, id_col, "left_anti")
