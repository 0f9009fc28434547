"""Non-Gregorian climate calendars (reference: geoprocessing/calendar.py —
xarray convert_calendar over 360-day / noleap CMIP6 axes; SURVEY §7 hard
part 2).

Spark timestamps are proleptic Gregorian, so exotic-calendar time axes are
carried as integer (cal_year, cal_month, cal_day) columns plus helpers:

- season/month/year extraction works directly on the integer columns (the
  reference's calendar-safe season filter reads months from the time
  coordinate, temporal.py:27-49 — same here, no Gregorian detour).
- ``align_to_gregorian`` maps exotic dates onto real timestamps for
  cross-calendar joins, reproducing xarray's ``align_on="date"`` (same
  (month, day) where it exists; Feb-29 etc. dropped or filled) and
  ``align_on="year"`` (dayofyear-proportional mapping for 360-day) modes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CALENDARS = ("standard", "noleap", "360_day")

_DAYS_IN_MONTH_NOLEAP = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def days_in_month(calendar: str, month: Column) -> Column:
    if calendar == "360_day":
        return F.lit(30)
    if calendar == "noleap":
        return F.element_at(
            F.array(*[F.lit(d) for d in _DAYS_IN_MONTH_NOLEAP]), month)
    raise ValueError(f"unsupported calendar {calendar!r}")


def day_of_year(calendar: str, month: Column, day: Column) -> Column:
    """1-based ordinal day within the exotic calendar year."""
    if calendar == "360_day":
        return (month - 1) * 30 + day
    if calendar == "noleap":
        cum = [0]
        for d in _DAYS_IN_MONTH_NOLEAP[:-1]:
            cum.append(cum[-1] + d)
        return F.element_at(F.array(*[F.lit(c) for c in cum]), month) + day
    raise ValueError(f"unsupported calendar {calendar!r}")


def season_filter_cal(df: DataFrame, season: str,
                      month_col: str = "cal_month") -> DataFrame:
    """Calendar-safe season selection on integer month columns — the exact
    analog of P7 for exotic calendars."""
    from georiva_spark.operators.filters import SEASON_MONTHS
    months = SEASON_MONTHS[season]
    if season == "annual":
        return df
    return df.where(F.col(month_col).isin(*months))


def align_to_gregorian(df: DataFrame, calendar: str,
                       align_on: str = "date",
                       year_col: str = "cal_year",
                       month_col: str = "cal_month",
                       day_col: str = "cal_day") -> DataFrame:
    """Attach a Gregorian ``time`` column mapped from exotic calendar
    columns (convert_calendar analog).

    align_on="date": keep (year, month, day) where the Gregorian calendar
    has that date; impossible dates (360-day months 30+ beyond real month
    length) are dropped — mirrors missing=None.
    align_on="year": proportional dayofyear mapping (the xarray 360-day
    recommendation), never drops rows.
    """
    y, m, d = F.col(year_col), F.col(month_col), F.col(day_col)
    if align_on == "date":
        ts = F.try_to_timestamp(
            F.concat_ws("-", y.cast("string"),
                        F.lpad(m.cast("string"), 2, "0"),
                        F.lpad(d.cast("string"), 2, "0")))
        return (df.withColumn("time", ts).where(F.col("time").isNotNull()))
    if align_on == "year":
        doy = day_of_year(calendar, m, d)
        year_len = F.lit(360 if calendar == "360_day" else 365)
        greg_len = F.when(
            (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)), 366).otherwise(365)
        # midpoint-proportional mapping: monotone, day 1 → Jan 1 and the
        # last exotic day → Dec 31 in every year length
        greg_doy = (F.floor((doy.cast("double") - 0.5) / year_len * greg_len)
                    .cast("int") + 1)
        jan1 = F.make_date(y, F.lit(1), F.lit(1))
        return df.withColumn(
            "time", F.date_add(jan1, greg_doy - 1).cast("timestamp"))
    raise ValueError(f"unsupported align_on {align_on!r}")
