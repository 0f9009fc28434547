"""Unit conversion registry (reference: core/unit_utils.py:19-116 — pint
with UDUNITS preprocessing and meteorological contexts).

The reference converts arrays eagerly with pint at ingest
(ingestion/utils.py:11-16); offset units (K→°C) broke its lazy path. Here
conversion is *planned* on the driver — a (factor, offset) pair looked up /
composed at plan-build time — and executed as one column expression, so
offset units cost nothing (SURVEY §2.4 A10).

Dependency-free: a small linear-unit table covering the reference's
meteorological surface (temperature, precipitation incl. the mm ↔ kg/m²
context, wind speed, pressure, geopotential) with dimensional-consistency
checks. Unknown units raise — same failure contract as pint's
UndefinedUnitError.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column

from georiva_spark.functions.scalars import unit_conversion_expr


@dataclass(frozen=True)
class UnitDef:
    dimension: str
    factor: float      # to the dimension's base unit
    offset: float = 0.0  # additive, applied before factor when converting


# base units: K, mm (precip depth ≡ kg/m² at water density), m/s, Pa, m2/s2, m
UNITS: dict[str, UnitDef] = {
    # temperature (base K)
    "K": UnitDef("temperature", 1.0),
    "kelvin": UnitDef("temperature", 1.0),
    "degC": UnitDef("temperature", 1.0, 273.15),
    "celsius": UnitDef("temperature", 1.0, 273.15),
    "degF": UnitDef("temperature", 5.0 / 9.0, 459.67),  # K = (F+459.67)·5/9
    # precipitation (base mm of water; met. context mm ≡ kg/m²,
    # core/unit_utils.py precipitation context)
    "mm": UnitDef("precipitation", 1.0),
    "kg m-2": UnitDef("precipitation", 1.0),
    "kg/m^2": UnitDef("precipitation", 1.0),
    "m": UnitDef("precipitation", 1000.0),
    "cm": UnitDef("precipitation", 10.0),
    "in": UnitDef("precipitation", 25.4),
    # speed (base m/s)
    "m/s": UnitDef("speed", 1.0),
    "m s-1": UnitDef("speed", 1.0),
    "km/h": UnitDef("speed", 1.0 / 3.6),
    "kt": UnitDef("speed", 0.514444),
    "knot": UnitDef("speed", 0.514444),
    # pressure (base Pa)
    "Pa": UnitDef("pressure", 1.0),
    "hPa": UnitDef("pressure", 100.0),
    "mbar": UnitDef("pressure", 100.0),
    "kPa": UnitDef("pressure", 1000.0),
    # geopotential (base m²/s²; context gpm = value / g,
    # core/unit_utils.py geopotential context)
    "m2 s-2": UnitDef("geopotential", 1.0),
    "m**2/s**2": UnitDef("geopotential", 1.0),
    "gpm": UnitDef("geopotential", 9.80665),
}


class UndefinedUnitError(KeyError):
    pass


class IncompatibleUnitsError(ValueError):
    pass


def conversion(source_unit: str, target_unit: str) -> tuple[float, float]:
    """(factor, offset) with value_target = value_source * factor + offset."""
    try:
        s = UNITS[source_unit]
    except KeyError:
        raise UndefinedUnitError(source_unit) from None
    try:
        t = UNITS[target_unit]
    except KeyError:
        raise UndefinedUnitError(target_unit) from None
    if s.dimension != t.dimension:
        raise IncompatibleUnitsError(
            f"cannot convert {source_unit!r} ({s.dimension}) → "
            f"{target_unit!r} ({t.dimension})")
    # source → base: x*sf + so*sf? Base value = (x + s.offset) * s.factor
    # Base → target: y = base / t.factor - t.offset
    factor = s.factor / t.factor
    offset = s.offset * s.factor / t.factor - t.offset
    return factor, offset


def convert(value: Column, source_unit: str, target_unit: str) -> Column:
    """Column expression converting value between units (A10)."""
    factor, offset = conversion(source_unit, target_unit)
    return unit_conversion_expr(value, factor, offset)
