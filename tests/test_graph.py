"""Connected components (operators/graph.py): hash-min fixpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_applications_spark.operators.graph import (
    connected_components,
    keep_canonical,
)


def _cc_dict(edges_df):
    return {
        r["id"]: r["component"]
        for r in connected_components(edges_df, "src", "dst").collect()
    }


def test_chain_collapses_to_min(spark):
    # Path graph 1-2-3-4-5: diameter 4 — exercises multiple hash-min rounds.
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    assert _cc_dict(e) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_multiple_components_and_noise_edges(spark):
    # Two components; duplicate edges, reversed orientation, and self-loops
    # must not change the labeling.
    e = spark.createDataFrame(
        [(10, 20), (20, 10), (20, 30), (7, 8), (8, 8), (8, 7), (7, 7)],
        "src long, dst long",
    )
    assert _cc_dict(e) == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_star_converges_in_one_round(spark):
    e = spark.createDataFrame(
        [(100, i) for i in range(101, 108)], "src long, dst long"
    )
    got = _cc_dict(e)
    assert set(got.values()) == {100} and len(got) == 8


def test_keep_canonical_drops_non_representatives(spark):
    items = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(1, 7)], "doc_id long, text string"
    )
    e = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    cc = connected_components(e)
    kept = {r["doc_id"] for r in keep_canonical(items, cc).collect()}
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; 4 unclustered -> kept
    assert kept == {1, 4, 5}


def test_no_driver_collect_in_labels(spark):
    # The result is a DataFrame (distributed), not a driver-side structure.
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = connected_components(e)
    assert out.columns == ["id", "component"]
    assert out.filter(F.col("component") > F.col("id")).count() == 0


# ---------------------------------------------------------------------------
# pagerank_int
# ---------------------------------------------------------------------------

from vectorsearch_applications_spark.operators.graph import pagerank_int


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _model_pagerank(edges, iterations=3):
    """Python mirror of the integer semantics."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += rank[s] // out[s]
        rank = {n: 150_000 + (850 * incoming[n]) // 1000 for n in nodes}
    return rank


def test_pagerank_matches_python_model_and_orders_hub_first(spark):
    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"),  # everyone points at hub
        ("hub", "a"), ("c", "b"),
    ]
    got = {r["node"]: r["rank"] for r in pagerank_int(_edges(spark, edges)).collect()}
    assert got == _model_pagerank(edges)
    assert got["hub"] == max(got.values())


def test_pagerank_duplicate_edges_collapse(spark):
    # the same edge listed twice must not double its contribution
    once = {r["node"]: r["rank"]
            for r in pagerank_int(_edges(spark, [("a", "b")])).collect()}
    twice = {r["node"]: r["rank"]
             for r in pagerank_int(_edges(spark, [("a", "b"), ("a", "b")])).collect()}
    assert once == twice


def test_fixed_rounds_exact_on_bounded_diameter_and_fewer_actions(spark):
    # VERDICT r4 #8: fixed_rounds=k skips the per-round convergence count.
    # A path graph a-b-c-d has diameter 3; LSH near-clique graphs have
    # diameter <= 2 — here we use a union of two triangles (diameter 2).
    from vectorsearch_applications_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )

    sc = spark.sparkContext
    sc.setJobGroup("cc_fixed", "fixed rounds")
    fixed = sorted(
        map(tuple, connected_components(edges, fixed_rounds=2).collect())
    )
    sc.setJobGroup("cc_fixpoint", "fixpoint detect")
    fp = sorted(map(tuple, connected_components(edges).collect()))
    sc.setJobGroup("cc_done", "")

    assert fixed == fp
    assert fixed == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)]

    st = sc.statusTracker()
    n_fixed = len(st.getJobIdsForGroup("cc_fixed"))
    n_fp = len(st.getJobIdsForGroup("cc_fixpoint"))
    # the fixpoint run needs its convergence-count actions; the fixed-
    # rounds run must launch strictly fewer jobs
    assert n_fixed < n_fp, (n_fixed, n_fp)


def test_oriented_triangle_count_equals_naive(spark):
    # degree-oriented enumeration (graph.py triangle_count_oriented) must
    # agree with the naive canonical two-join count — including on a
    # "celebrity" star+clique graph where naive fan-out concentrates
    from vectorsearch_applications_spark.operators.graph import (
        triangle_count_oriented,
    )

    # graph: K4 on {1,2,3,4} (4 triangles) + star center 100 with leaves
    # 10..30 (no triangles) + one closed leaf pair (1 triangle)
    edges = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges += [(100, leaf) for leaf in range(10, 31)]
    edges += [(10, 11)]  # closes triangle (100, 10, 11)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_count_oriented(df).collect()[0]["n_triangles"]
    assert got == 5

    # reversed/duplicated edges don't change the count
    df2 = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    assert triangle_count_oriented(df2).collect()[0]["n_triangles"] == 5
