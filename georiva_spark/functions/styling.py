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
        if v1 == v0:      # hard edge (stepped snapshots duplicate values)
            continue
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


# ---------------------------------------------------------------------------
# Value-free color ramps (core/models/visualization.py:56-158; ADR 0022)
# ---------------------------------------------------------------------------

RGBA = tuple[int, int, int, int]


def spread_positions(positions: list) -> list[float]:
    """0-1 positions for a ramp's stops — one reading shared by previews
    and snapshot generation, so what a preview shows is what an
    application materializes (visualization.py:56-76). ``None`` entries
    spread evenly; positions are forced non-decreasing left to right
    (CSS silently clamps out-of-order gradient stops — a preview that
    let that happen would misrepresent the ramp)."""
    if len(positions) == 1:
        return [0.0]
    last = len(positions) - 1
    out = [p if p is not None else i / last
           for i, p in enumerate(positions)]
    floor = 0.0
    for i, p in enumerate(out):
        floor = out[i] = max(floor, p)
    return out


def sample_ramp(colors: list[RGBA], positions: list[float],
                t: float) -> RGBA:
    """The ramp's color at fraction ``t``, interpolating linearly between
    neighbouring stops; clamps outside the positioned span
    (visualization.py:101-115)."""
    if t <= positions[0]:
        return tuple(colors[0])
    if t >= positions[-1]:
        return tuple(colors[-1])
    for (p0, c0), (p1, c1) in zip(zip(positions, colors),
                                  zip(positions[1:], colors[1:])):
        if p0 <= t < p1:
            if p1 == p0:
                continue
            f = (t - p0) / (p1 - p0)
            return tuple(round(a + f * (b - a)) for a, b in zip(c0, c1))
    return tuple(colors[-1])


def generate_stops(colors: list[RGBA], positions: list,
                   value_min: float, value_max: float, *,
                   ramp_type: str = "sequential",
                   mode: str = "continuous",
                   steps: int = None) -> list[Stop]:
    """Apply a value-free ramp over a variable's range — the
    snapshot-generation seam (visualization.py:118-158). Returns concrete
    ``[(value, rgba), ...]`` stops for :func:`palette_color`.

    Continuous mode stretches the ramp's colors over the range, one stop
    per color at its (evenly spread or declared) position. Stepped mode
    cuts the range into ``steps`` equal classes with flat color — sampled
    along the ramp, or cycled verbatim for a qualitative ramp, whose
    colors are categories that must never blend — expressing each class
    as two stops sharing its boundaries so the edges stay hard through
    any linear interpolation downstream."""
    if not colors:
        return []
    pos = spread_positions(list(positions))
    val_range = value_max - value_min
    if mode == "stepped":
        count = max(int(steps or 0), 1)
        if ramp_type == "qualitative":
            class_colors = [colors[i % len(colors)] for i in range(count)]
        else:
            class_colors = [
                sample_ramp(colors, pos,
                            i / (count - 1) if count > 1 else 0.5)
                for i in range(count)]
        stops: list[Stop] = []
        for i, color in enumerate(class_colors):
            stops.append((value_min + i * val_range / count, tuple(color)))
            stops.append((value_min + (i + 1) * val_range / count,
                          tuple(color)))
        return stops
    return [(value_min + p * val_range, tuple(c))
            for c, p in zip(colors, pos)]
