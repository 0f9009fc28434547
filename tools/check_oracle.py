"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

r5: the comparison is DTYPE-STRICT. The driver fetches both sides into
pandas and hashes typed values, so an oracle that leaks an uncast DuckDB
HUGEINT (pandas float64) against a Spark BIGINT (pandas int64) is
driver-red even when 6-dp-rounded values agree — exactly the class that
cost bpe_train (r3+r4) and zarr_v3_fill (r4). We therefore fetch both
sides via pandas (duckdb .fetchdf(), Spark .toPandas()) and compare each
column's pandas dtype KIND (int/uint vs float vs bool vs datetime vs
object) before comparing values; kind mismatch is a FAIL even if every
rounded value matches.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from georiva_spark.queries import ORACLES, QUERIES  # noqa: E402
from georiva_spark.schemas import TPCH_TABLES  # noqa: E402
from georiva_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# pandas dtype.kind -> comparison class. i/u collapse (int64 vs uint64 both
# hash as python ints); f stands alone (the HUGEINT trap); M covers every
# datetime64 resolution (ns vs us is a fetch-layer artifact, values are
# compared after isoformat normalization).
_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "M": "datetime", "m": "timedelta", "O": "object"}


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        # DATE fetches as datetime.date on one side and midnight
        # datetime64 on the other depending on the fetch layer; the
        # driver hashes them equal (anti_join green r1), so collapse
        # midnight timestamps to the date form.
        s = v.isoformat()[:26]
        if s.endswith("T00:00:00"):
            s = s[:-9]
        return s
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar / array
        return _norm(v.tolist())
    return v


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def _dtype_classes(df):
    import datetime as _dt
    out = {}
    for c in sorted(df.columns):
        k = df[c].dtype.kind
        cls = _KIND_CLASS.get(k, k)
        if cls == "object":
            # Spark DateType fetches as object-of-datetime.date while
            # DuckDB DATE fetches as datetime64 — the driver hashes
            # these equal (anti_join green since r1), so class them
            # together; every other object stays 'object'.
            nn = df[c].dropna()
            if len(nn) and isinstance(nn.iloc[0], (_dt.date, _dt.datetime)):
                cls = "datetime"
        out[c] = cls
    return out


def main(names):
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    failures = []
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(QUERIES)}")
        return 1
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle ({len(spdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if sorted(spdf.columns) != sorted(dpdf.columns):
            print(f"FAIL {name}: columns spark={sorted(spdf.columns)} "
                  f"duck={sorted(dpdf.columns)}")
            ok = False
        elif len(spdf) != len(dpdf):
            print(f"FAIL {name}: rowcount spark={len(spdf)} "
                  f"duck={len(dpdf)}")
            ok = False
        else:
            sk, dk = _dtype_classes(spdf), _dtype_classes(dpdf)
            bad = {c: (sk[c], dk[c]) for c in sk if sk[c] != dk[c]}
            if bad:
                print(f"FAIL {name}: dtype-kind mismatch "
                      f"(spark, duck): {bad}")
                ok = False
            else:
                sc, dc = _canon(spdf), _canon(dpdf)
                if sc != dc:
                    diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                    print(f"FAIL {name}: value mismatch, first diffs: "
                          f"{diffs}")
                    ok = False
        if ok:
            print(f"OK   {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)
    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    names = sys.argv[1:] or list(QUERIES)
    raise SystemExit(main(names))
