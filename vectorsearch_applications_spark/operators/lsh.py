"""Random-hyperplane LSH (SimHash for vectors) — the second ANN family.

IVF (operators/ann.py) partitions the corpus by nearest centroid; hyperplane
LSH (Charikar, STOC '02 — public) partitions it by the sign pattern of P
fixed random projections: ``bit_p = [ <h_p, v> >= 0 ]``, bucket = the P-bit
code. Collision probability is ``1 - theta/pi`` per plane, so vectors in
the same bucket are cosine-close with high probability. Query-time work is
one *equi-join on the bucket id* — the cheapest possible candidate
generation at 100 TB (co-partitioned hash join, no centroid distance pass,
no crossjoin), followed by exact cosine scoring of the candidates only.

Determinism / oracle parity: the hyperplanes are ±1 sign vectors drawn from
a fixed LCG, embedded as literals in both the Spark plan and the DuckDB
oracle. ±1 coefficients make each projection a signed *sequential* sum of
the vector's own components (``F.aggregate`` fold == ``list_dot_product``),
so the bucket codes are bitwise identical across engines — the bucketing
is exact, only the neighbor set is approximate.

Everything here is pure Catalyst (higher-order functions inside codegen);
no UDF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_distance


def lsh_planes(n_planes: int = 4, dim: int = 64, seed: int = 0x5EED1234) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix from a 64-bit LCG (Knuth MMIX
    constants — public). Same function feeds the Spark plan and the SQL
    oracle, so both engines bucket identically."""
    x = seed & 0xFFFFFFFFFFFFFFFF
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row: list[float] = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (x >> 63) else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """P-bit bucket code of a vector column: bit p set iff the sequential
    signed sum ``sum_d planes[p][d] * v_d`` is >= 0. JVM-side fold, exact
    parity with the oracle's list_dot_product."""
    dv = F.transform(vec_col, lambda x: x.cast("double"))
    code = F.lit(0).cast("bigint")
    for p, row in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in row])
        proj = F.aggregate(
            F.zip_with(lit_plane, dv, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    return code


def lsh_search(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Bucketed approximate cosine top-k: bucket both sides with the same
    planes, equi-join on the bucket id, exact-score candidates, rank.

    At scale the corpus side's bucket column is computed once at index
    build and persisted (bucket-partitioned parquet, like ivf_save_index);
    the join is then a co-partitioned hash join touching ~n/2^P of the
    corpus per query bucket.
    """
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_q"),
        lsh_bucket(F.col(query_vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "distance", cosine_distance(F.col("_v"), F.col("_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "distance")
    )


def lsh_planes_sql_values(planes: list[list[float]]) -> str:
    """``(pid, pv)`` VALUES rows for the DuckDB oracle, e.g.
    ``(0, [1.0,-1.0,...]::DOUBLE[]), (1, [...])``."""
    rows = []
    for p, row in enumerate(planes):
        arr = ",".join("1.0" if v > 0 else "-1.0" for v in row)
        rows.append(f"({p}, [{arr}]::DOUBLE[])")
    return ", ".join(rows)


__all__ = ["lsh_planes", "lsh_bucket", "lsh_search", "lsh_planes_sql_values"]
