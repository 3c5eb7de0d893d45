"""Int8 embedding quantization — the 4× memory/IO lever for vector search.

At 100 TB an `array<float>` embedding column dominates scan and shuffle
cost for every similarity-search operator. Symmetric per-vector int8
quantization (scale = max|x|/127, code = round(x/scale)) cuts the column
4×, and is the standard first step before IVF/PQ-style indexes.

Determinism/parity design:
- codes use floor(x/s + 0.5), not round(): round() is HALF_UP in Spark
  and half-even in DuckDB, so a code landing exactly on .5 would diverge;
  floor of the identical double never does.
- the dot product is computed in INTEGER arithmetic (Σ code_q·code_d,
  |Σ| ≤ 127²·dim) and only then multiplied by the two scales in a fixed
  association ``(scale_d · scale_q) · Σ``. Integer sums are
  order-independent, so — unlike a float dot — the quantized score is
  bitwise identical across engines and partitionings by construction.
- zero vectors get scale 0 and all-zero codes (no division).

All pure Catalyst (nested higher-order lambdas; the scale is let-bound so
array_max runs once per vector, not once per element).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, scale DOUBLE, codes array<int>) — symmetric per-vector int8
    range, materialized as int for exact downstream arithmetic."""
    absmax = F.array_max(
        F.transform(F.col(emb_col), lambda x: F.abs(x.cast("double")))
    )
    scale = absmax / F.lit(127.0)
    packed = F.transform(
        F.array(scale),
        lambda s: F.struct(
            s.alias("scale"),
            F.transform(
                F.col(emb_col),
                lambda x: F.floor(
                    F.when(s == 0, F.lit(0.0)).otherwise(
                        x.cast("double") / s
                    )
                    + F.lit(0.5)
                ).cast("int"),
            ).alias("codes"),
        ),
    )[0]
    return df.select(
        F.col(id_col),
        packed["scale"].alias("scale"),
        packed["codes"].alias("codes"),
    )


def quantized_dot(
    d_codes: Column, q_codes: Column, d_scale: Column, q_scale: Column
) -> Column:
    """(scale_d · scale_q) · Σ code_d·code_q — integer-exact inner sum."""
    intdot = F.aggregate(
        F.zip_with(d_codes, q_codes, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (d_scale * q_scale) * intdot.cast("double")
