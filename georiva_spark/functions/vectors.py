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

def projection_signs(in_dim: int, out_dim: int,
                     seed: str = "rp") -> list[list[float]]:
    """Deterministic ±1 sign matrix for sparse random projection
    (Achlioptas 2003, JCSS 66(4) §2 — the database-friendly variant of
    Johnson-Lindenstrauss): sign(i,j) from the first hex digit of
    md5('{seed}:{i}:{j}'), so an external SQL engine derives the SAME
    matrix independently (DuckDB: CAST('0x'||substring(md5(s),1,1) AS
    BIGINT) % 2 — the portable_hash64 idiom)."""
    import hashlib
    return [[1.0 if int(hashlib.md5(f"{seed}:{i}:{j}".encode())
                        .hexdigest()[0], 16) % 2 == 0 else -1.0
             for i in range(in_dim)]
            for j in range(out_dim)]


def random_projection(vec: Column, in_dim: int, out_dim: int,
                      seed: str = "rp") -> Column:
    """JL random projection of an embedding column → array<double> of
    ``out_dim`` components: p[j] = Σᵢ x[i]·sign(i,j) / √out_dim. The
    embedding dimension-reduction op a 100-TB dedup/ANN pre-pass wants
    (shrink 64-dim to 8-dim before bucketing): distances are preserved
    within (1±ε) w.h.p. per JL, and the matrix is hash-derived so no
    model state ships at all. Pure sequential-fold HOFs — JVM-side,
    zero shuffle, and the fold order matches a SQL engine's ordered
    SUM for bit-comparable replay. The out_dim·in_dim sign literals
    render as ONE parsed SQL string (fastexpr, r13) instead of
    per-literal py4j calls."""
    import math

    from georiva_spark.functions import fastexpr
    signs = projection_signs(in_dim, out_dim, seed)
    scale = 1.0 / math.sqrt(float(out_dim))
    vec_sql = _column_sql(vec)
    if vec_sql is not None:
        return F.expr("array(" + ", ".join(
            f"({fastexpr.dot_sql(vec_sql, signs[j])})"
            f" * {fastexpr.dlit(scale)}"
            for j in range(out_dim)) + ")")
    # compound / dataframe-bound / Connect Columns: the parsed-string
    # fast path only speaks plain attribute names — keep the original
    # Column-API construction (identical tree, slower to build) so
    # the signature's "any Column" contract still holds (r14, the
    # r13 advisor's item)
    cols = []
    for j in range(out_dim):
        dot = F.aggregate(
            F.zip_with(vec,
                       F.array(*[F.lit(s) for s in signs[j]]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)
        cols.append(dot * F.lit(scale))
    return F.array(*cols)


def _column_sql(vec: Column) -> str | None:
    """SQL rendering of ``vec`` when it is a PLAIN attribute reference
    (the only shape whose ``toString`` round-trips through the parser
    unchanged) — None otherwise. A dataframe-bound column prints
    ``name#14``, an aliased/compound Column prints an expression tree,
    and Spark Connect has no ``_jc``; all of those must take the
    Column-API path."""
    try:
        s = vec._jc.toString()
    except Exception:  # noqa: BLE001 — Connect / foreign Column
        return None
    if s.isidentifier():
        return f"`{s}`"
    return None
