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
    fixed_rounds: int | None = None,
) -> DataFrame:
    """Label each vertex of the undirected graph ``edges`` with the minimum
    vertex id reachable from it.

    Returns (id, component) — ``component`` is the min id of the vertex's
    connected component, a deterministic canonical representative. Only
    vertices that appear in at least one edge are returned (isolated
    vertices are the caller's no-op case).

    ``fixed_rounds``: run exactly that many hash-min rounds and SKIP the
    per-round changed-label count — each convergence check is a full
    Spark action (a join + count job), which dominates wall-clock when
    rounds are cheap. For LSH near-dup graphs the components are
    near-cliques of diameter ≤ 2, so ``fixed_rounds=2`` (or 3 for
    insurance) is exact while running 1 action instead of
    2·rounds. Labels are correct iff fixed_rounds ≥ component diameter;
    the default (None) keeps the detect-fixpoint behavior for graphs of
    unknown shape.
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

    rounds = fixed_rounds if fixed_rounds is not None else max_iterations
    for _ in range(rounds):
        # One round of hash-min: each endpoint offers its label to the
        # other; a vertex keeps the min of its own and all offers. The
        # labels branch of the union is tagged so the round's OLD label
        # rides the same aggregation (labels has exactly one row per id,
        # and every id in offers appears in labels, so min-over-one-value
        # reproduces it exactly) — the convergence check then becomes a
        # filter+count over the just-checkpointed frame instead of a
        # join of two checkpointed frames (one fewer join + exchange on
        # the serialized per-round driver timeline; labels themselves
        # are byte-identical, the old column is control flow only).
        offers = (
            e.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "component")
            .union(
                e.join(labels.withColumnRenamed("id", "dst"), "dst").select(
                    F.col("src").alias("id"), "component"
                )
            )
        )
        if fixed_rounds is not None:
            new_all = (
                offers.union(labels)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
                .localCheckpoint(eager=True)
            )
            labels = new_all
            continue
        ctype = labels.schema["component"].dataType.simpleString()
        new_all = (
            offers.select(
                "id", "component", F.lit(None).cast(ctype).alias("_old")
            )
            .union(
                labels.select("id", "component", F.col("component").alias("_old"))
            )
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("_old").alias("_old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_all.filter(
            F.col("component") != F.col("_old")
        ).count()
        labels = new_all.select("id", "component")
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


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer micro-units — the graph
    centrality pass over entity graphs a curation pipeline derives (here:
    who supplies whom; for web corpora: the host link graph used for
    quality priors à la Common Crawl harmonic/PageRank centrality).

    Semantics (deterministic in any engine, no floats anywhere):
      rank_0(v)   = 1_000_000
      contrib(u→v) = rank_i(u) DIV out_degree(u)
      rank_{i+1}(v) = 150_000 + (850 * Σ contrib(in-edges)) DIV 1000

    i.e. damping 0.85 with floor rounding at each step; dangling-node mass
    leaks (documented classic simplification) — ranks remain a centrality
    ORDER, absolute mass is not conserved. Integer sums are order-free, so
    results are bitwise reproducible under any partitioning.

    Plan per iteration: ranks ⋈ edges on src (the edge relation is the big
    side — shuffle keyed src), re-aggregate on dst (second keyed shuffle),
    left-join onto the node set. At 100 TB — where |V| exceeds the
    broadcast threshold — pre-partition edges by src once by compiling
    the invariant checkpoints with AQE off so LogicalRDD advertises the
    hash partitioning and the per-iteration src join becomes
    Exchange-free; under AQE the checkpoint captures UnknownPartitioning
    and the same repartition is pure extra shuffle, measured +28% at
    bench scale (OPTIMIZATION_r11.md §5). Lineage is cut per round with
    localCheckpoint like connected_components.
    """
    # materialize the loop-invariant relations once: without the
    # checkpoint, every iteration's plan re-derives edges (the upstream
    # join + distinct) and out-degrees from scratch — 3 iterations cost
    # 3× the edge build (measured 10.2 s → ~4 s at sf0.1).
    #
    # TWO invariant checkpoints, not three (r12): the bare edge relation
    # is no longer checkpointed — e_deg's plan references it twice (join
    # probe side + the out-degree aggregate), but both subtrees are
    # canonically identical up to the distinct, so its exchange is
    # computed once and reused (ReusedExchange); a third |E|-row cache
    # write+read on the serialized driver timeline bought nothing.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # the loop invariants are NOT pre-partitioned on the join keys
    # (r11 probe): under AQE, Dataset.localCheckpoint captures
    # UnknownPartitioning(0) — AdaptiveSparkPlanExec cannot promise an
    # output partitioning at checkpoint-capture time — so a repartition
    # before the checkpoint never removes a downstream exchange; it only
    # adds one to the invariant build (the r11-build session's −5% A/B
    # "win" for it was noise). The AQE-off compile that DOES advertise
    # hashpartitioning measured +28% and was rejected: with no exchange
    # above the big side, AQE loses its stage boundary and cannot
    # runtime-convert the per-iteration SMJ to broadcast, which at
    # bench scale (|V| broadcastable) dominates. The static
    # co-partitioned shape only wins when |V| exceeds the broadcast
    # threshold — at that scale flip it via an AQE-off plan compile of
    # the invariants (OPTIMIZATION_r11.md §5).
    # out-degree is loop-invariant — attach it to the edge relation ONCE
    # so each iteration is a single join + aggregation instead of
    # rejoining degrees every round (the e⋈outd join repeated per
    # iteration was pure waste: same inputs, same output, n_iter times).
    # groupBy+join, not a src-partitioned window: a celebrity source's
    # edges would all land in one window task, the exact skew shape this
    # module bans elsewhere.
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    e_deg = e.join(outd, "src").localCheckpoint(eager=False)
    # the node set derives from the CHECKPOINTED e_deg (same rows as
    # deriving from e — the inner degree join keeps every edge), so it
    # reads the cached invariant instead of re-running the edge build
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV odeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("incoming"))
        )
        # NO per-iteration rank checkpoint: with the loop invariants
        # checkpointed the rank lineage stays shallow (one join + one agg
        # per round), and under AQE a localCheckpoint eagerly executes
        # its subtree at plan-build time — three of them cost a full
        # extra second at sf0.1 (4.4 s → 3.3 s measured). For iteration
        # counts beyond ~10, reinstate a checkpoint every k rounds.
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(150_000)
                + F.expr("(850 * coalesce(incoming, 0)) DIV 1000")
            )
            .cast("long")
            .alias("rank"),
        )
    return ranks.select("node", F.col("rank").cast("bigint").alias("rank"))


def triangle_count_oriented(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count via DEGREE ORIENTATION — the celebrity-proof
    plan (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW '11 — public). The naive two-join enumeration's
    fan-out at a shared node b is deg(b)²: one celebrity node in a
    100 TB graph melts its reducer. Orienting every edge from the
    lower-(degree, id) endpoint to the higher one bounds each node's
    OUT-degree by O(√m), so wedge generation — the only quadratic step —
    is O(m^1.5) total with no hot key.

    Plan: canonicalize u<v + distinct → degree table (one agg) → orient
    (two broadcastable-or-shuffled joins against the degree table) →
    wedges = self-join of oriented edges on the source (bounded fan-out)
    → close each wedge against the CANONICAL edge set with one equi-join
    on (min, max) of the wedge tips. Each triangle is counted exactly
    once: at its minimum-rank vertex.

    Returns a 1-row frame (n_triangles BIGINT).
    """
    # the canonical edge set feeds FOUR consumers (degree union ×2,
    # orient join, wedge closing) and the oriented list two (both wedge
    # sides) — checkpoint both so the upstream edge build runs once
    # (before-plan: 44 parquet scans / 90 exchanges at sf0.1; same-JVM
    # interleaved A/B: 1.244 → 0.961 s median, −23%, identical results)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .union(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        e.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    # orient low rank -> high rank; rank = (degree, id) lexicographic
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = withdeg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint(eager=False)
    w1 = o.select(F.col("a"), F.col("b").alias("b1"))
    w2 = o.select(F.col("a"), F.col("b").alias("b2"))
    wedges = (
        w1.join(w2, "a")
        .filter(F.col("b1") < F.col("b2"))
        .select(
            F.col("b1").alias("u"), F.col("b2").alias("v")
        )
    )
    closed = wedges.join(e, ["u", "v"])
    return closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
