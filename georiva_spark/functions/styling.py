"""Styling: value → color-ramp interpolation (reference:
core/models/variable.py:318-337 palette interpolation + scale_type ramps;
titiler renders the result — here the mapping itself is a column
expression, exported per pixel for any tile/texture sink).

A palette is ordered stops [(value, (r, g, b, a)), …]; colors interpolate
linearly between stops, clamp outside. Generated as chained CASE
expressions — pure JVM, codegen-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

Stop = tuple[float, tuple[int, int, int, int]]


def _channel(value: Column, stops: list[Stop], ch: int) -> Column:
    expr = F.lit(float(stops[0][1][ch]))          # below first stop: clamp
    for (v0, c0), (v1, c1) in zip(stops, stops[1:]):
        frac = (value - F.lit(v0)) / F.lit(v1 - v0)
        interp = F.lit(float(c0[ch])) + frac * F.lit(float(c1[ch] - c0[ch]))
        expr = F.when((value >= v0) & (value < v1), interp).otherwise(expr)
    last_v, last_c = stops[-1]
    expr = F.when(value >= last_v, F.lit(float(last_c[ch]))).otherwise(expr)
    return F.round(expr).cast("int")


def palette_color(value: Column, stops: list[Stop]) -> Column:
    """RGBA struct for a value under the palette; null value → null color
    (nodata renders transparent downstream)."""
    if len(stops) < 2:
        raise ValueError("palette needs at least two stops")
    if sorted(s[0] for s in stops) != [s[0] for s in stops]:
        raise ValueError("palette stops must be ascending by value")
    rgba = F.struct(*[_channel(value, stops, ch).alias(name)
                      for ch, name in enumerate("rgba")])
    return F.when(value.isNull(), F.lit(None)).otherwise(rgba)


def scale_transform(value: Column, scale_type: str, vmin: float,
                    vmax: float) -> Column:
    """Normalize a value to [0,1] under the variable's declared scale_type
    (linear | log | sqrt | diverging, core/models/variable.py scale_type)
    before palette lookup."""
    span = vmax - vmin
    if scale_type == "linear":
        t = (value - vmin) / span
    elif scale_type == "sqrt":
        t = F.sqrt(F.greatest(value - vmin, F.lit(0.0)) / span)
    elif scale_type == "log":
        t = F.log1p(F.greatest(value - vmin, F.lit(0.0))) / F.log1p(F.lit(span))
    elif scale_type == "diverging":
        mid = (vmin + vmax) / 2.0
        t = (value - mid) / (span / 2.0) * 0.5 + 0.5
    else:
        raise ValueError(f"unknown scale_type {scale_type!r}")
    return F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
