"""Scalar column functions (SURVEY.md §2.8).

All JVM-side Column expressions — no Python UDFs — so they stay inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def safe_divide(num: Column, den: Column) -> Column:
    """num/den with ÷0 and null-den → null, never inf/NaN.

    Mirrors geoprocessing/algebra.py:16-30 (safe_divide).
    """
    return F.when(den.isNull() | (den == 0) | num.isNull(), F.lit(None)) \
            .otherwise(num / den)


def vector_magnitude(u: Column, v: Column) -> Column:
    """sqrt(u²+v²) — wind speed from components.

    Mirrors ingestion/extractor.py:203-219 (hypot).
    """
    return F.hypot(u, v)


def vector_direction(u: Column, v: Column) -> Column:
    """Meteorological from-direction in degrees [0, 360).

    mod(degrees(atan2(u, v)) + 180, 360) — mirrors
    ingestion/extractor.py:220-237; golden: u=0,v=-1 → 0°; u=-1,v=0 → 90°.
    """
    return F.pmod(F.degrees(F.atan2(u, v)) + F.lit(180.0), F.lit(360.0))


def unit_conversion_expr(value: Column, factor: float = 1.0,
                         offset: float = 0.0) -> Column:
    """Linear unit conversion ``value*factor + offset``.

    The driver computes (factor, offset) from pint at plan-build time
    (reference applies pint per-array at ingestion/utils.py:11-16; offset
    units like K→°C blocked its lazy path — trivial as a column expr here).
    """
    return value * F.lit(factor) + F.lit(offset)


def rescale_255(value: Column, vmin: float, vmax: float) -> Column:
    """Clamp-rescale value → [0, 255] for tile/texture export.

    Mirrors titiler-app/app/dependencies.py:203-215.
    """
    scaled = (value - F.lit(vmin)) / F.lit(vmax - vmin) * F.lit(255.0)
    return F.least(F.greatest(scaled, F.lit(0.0)), F.lit(255.0))


def normalize_lon(lon: Column) -> Column:
    """Normalize 0–360 longitudes to ±180 (ingestion/utils.py:33-56)."""
    return F.when(lon > 180.0, lon - 360.0).otherwise(lon)
