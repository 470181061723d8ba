"""Embedding-column utilities for ANN pipelines at scale (not in the
reference): L2 normalization and symmetric int8 quantization — the
standard memory levers before a 100 TB corpus's vectors fit an index
(float32 -> int8 is a 4x cut; cosine over normalized vectors is a
plain dot product).

All pure higher-order array expressions over ``array<float>`` columns
(`transform` / `aggregate`), arithmetic in DOUBLE on both engines so
the DuckDB oracles match bit-for-bit; quantization rounds via
``floor(x/scale + 0.5)`` — identical semantics in Spark and DuckDB
(plain ``round`` differs: HALF_UP vs banker's).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm(vec: Column) -> Column:
    """``sqrt(sum(x^2))`` of an array column, in double."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def normalize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Adds ``out_col`` (default ``<vec_col>_unit``): the vector
    scaled to unit L2 norm (zero vectors pass through unchanged).
    Map-only projection."""
    out_col = out_col or f"{vec_col}_unit"
    v = F.col(vec_col)
    n = l2_norm(v)
    unit = F.when(
        n == 0, F.transform(v, lambda x: x.cast("double"))
    ).otherwise(F.transform(v, lambda x: x.cast("double") / n))
    return df.withColumn(out_col, unit)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``code = floor(x/scale + 0.5)`` clamped to [-127, 127] (zero
    vectors get scale 0 and all-zero codes).  Map-only projection;
    reconstruction error is bounded by ``scale/2`` per component."""
    v = F.col(vec_col)
    mx = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    scale = mx / F.lit(127.0)
    code = lambda x: F.greatest(  # noqa: E731
        F.lit(-127),
        F.least(
            F.lit(127),
            F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        ),
    )
    codes = F.when(
        mx == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, code))
    return df.withColumn(scale_col, scale).withColumn(codes_col, codes)


def dequantize_embeddings(
    df: DataFrame,
    codes_col: str = "codes",
    scale_col: str = "scale",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """``code * scale`` back to a double vector."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(codes_col), lambda c: c.cast("double") * F.col(scale_col)
        ),
    )
