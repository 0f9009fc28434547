"""Dependency-free NetCDF *classic* codec (CDF-1/CDF-2, stdlib struct +
numpy).

The reference reads NetCDF via xarray/h5netcdf (formats/netcdf.py) —
neither is in this container, but the classic format is a simple
big-endian binary layout, so the decoder here covers the classic subset:
dimensions (including one record dimension), attributes, all six
nc_types, fixed and record variables, CF conventions the reference
plugin honors (_FillValue → NaN, scale_factor/add_offset, "<unit> since
<epoch>" time axes, ascending/descending latitude orientation,
netcdf.py:141-147,184). NetCDF-4 (HDF5 magic) still requires the real
library and stays gated at the plugin layer.
"""

from __future__ import annotations

import datetime as dt
import re
import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = range(1, 7)
_DTYPES = {NC_BYTE: ">i1", NC_CHAR: "S1", NC_SHORT: ">i2", NC_INT: ">i4",
           NC_FLOAT: ">f4", NC_DOUBLE: ">f8"}
_SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4,
          NC_DOUBLE: 8}

_TIME_UNITS = {"second": 1.0, "minute": 60.0, "hour": 3600.0,
               "day": 86400.0}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos:self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4   # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, n: int):
        size = _SIZES[nc_type] * n
        raw = self.buf[self.pos:self.pos + size]
        self.pos += (size + 3) // 4 * 4
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=_DTYPES[nc_type], count=n)


def _att_list(r: _Reader) -> dict:
    tag, count = r.u32(), r.u32()
    atts = {}
    for _ in range(count):
        name = r.name()
        t = r.u32()
        n = r.u32()
        v = r.values(t, n)
        if not isinstance(v, str):
            v = v[0] if n == 1 else np.asarray(v)
        atts[name] = v
    return atts


def decode_netcdf(content: bytes) -> dict:
    """Parse classic NetCDF → {"dims": [(name, size)], "numrecs": int,
    "variables": {name: {"dims": [names], "atts": {...},
    "data": ndarray (native byte order, raw — no CF post-processing)}}}.
    """
    if content[:3] != b"CDF" or content[3] not in (1, 2):
        raise ValueError("not a classic NetCDF payload")
    version = content[3]
    r = _Reader(content)
    r.pos = 4
    numrecs = r.u32()

    tag, ndims = r.u32(), r.u32()
    dims = [(r.name(), r.u32()) for _ in range(ndims)]
    _att_list(r)                      # global attributes (unused here)

    tag, nvars = r.u32(), r.u32()
    headers = []
    for _ in range(nvars):
        name = r.name()
        nd = r.u32()
        dimids = [r.u32() for _ in range(nd)]
        atts = _att_list(r)
        t = r.u32()
        vsize = r.u32()
        begin = r.u64() if version == 2 else r.u32()
        headers.append((name, dimids, atts, t, vsize, begin))

    rec_vars = [h for h in headers if h[1] and dims[h[1][0]][1] == 0]
    rec_stride = sum(h[4] for h in rec_vars)
    variables: dict = {}
    for name, dimids, atts, t, vsize, begin in headers:
        shape = [dims[d][1] for d in dimids]
        is_rec = bool(dimids) and dims[dimids[0]][1] == 0
        if is_rec:
            shape[0] = numrecs
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if len(
                shape) > 1 else 1
            chunks = []
            for rec in range(numrecs):
                off = begin + rec * rec_stride
                chunks.append(np.frombuffer(content, dtype=_DTYPES[t],
                                            count=per_rec, offset=off))
            data = (np.concatenate(chunks) if chunks
                    else np.empty(0, _DTYPES[t]))
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(content, dtype=_DTYPES[t], count=n,
                                 offset=begin)
        arr = data.astype(np.dtype(_DTYPES[t]).newbyteorder("="))
        variables[name] = {
            "dims": [dims[d][0] for d in dimids],
            "atts": atts,
            "data": arr.reshape(shape) if shape else arr[0],
        }
    return {"dims": dims, "numrecs": numrecs, "variables": variables}


def cf_decode_values(var: dict) -> np.ndarray:
    """CF post-processing the reference applies on materialization
    (netcdf.py:184 fill replacement + packed-data scaling): _FillValue /
    missing_value → NaN, then scale_factor·x + add_offset, in float64."""
    a = np.asarray(var["data"], dtype=np.float64)
    atts = var["atts"]
    for key in ("_FillValue", "missing_value"):
        if key in atts:
            a = np.where(a == float(atts[key]), np.nan, a)
    scale = float(atts.get("scale_factor", 1.0))
    offset = float(atts.get("add_offset", 0.0))
    if scale != 1.0 or offset != 0.0:
        a = a * scale + offset
    return a


def cf_decode_times(var: dict) -> list[dt.datetime]:
    """CF "<unit> since <epoch>" numeric time axis → naive UTC datetimes."""
    units = str(var["atts"].get("units", "seconds since 1970-01-01"))
    m = re.match(r"\s*(\w+?)s?\s+since\s+(.+)", units)
    if not m:
        raise ValueError(f"unsupported time units {units!r}")
    unit, epoch_s = m.group(1).lower(), m.group(2).strip()
    if unit not in _TIME_UNITS:
        raise ValueError(f"unsupported time unit {unit!r}")
    epoch_s = epoch_s.replace("T", " ").replace("Z", "")
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            epoch = dt.datetime.strptime(epoch_s, fmt)
            break
        except ValueError:
            continue
    else:
        raise ValueError(f"unsupported epoch {epoch_s!r}")
    vals = np.asarray(var["data"], dtype=np.float64).ravel()
    return [epoch + dt.timedelta(seconds=float(v) * _TIME_UNITS[unit])
            for v in vals]


# ---------------------------------------------------------------------------
# Writer (classic CDF-1) — for fixtures/round-trips and grid export
# ---------------------------------------------------------------------------

def _pad(b: bytes) -> bytes:
    return b + b"\0" * (-len(b) % 4)


def _w_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + _pad(b)


def _w_atts(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", 0x0C, len(atts))
    for k, v in atts.items():
        out += _w_name(k)
        if isinstance(v, str):
            b = v.encode("utf-8")
            out += struct.pack(">II", NC_CHAR, len(b)) + _pad(b)
        else:
            a = np.asarray(v)
            t = {np.dtype("f4"): NC_FLOAT, np.dtype("f8"): NC_DOUBLE,
                 np.dtype("i2"): NC_SHORT, np.dtype("i4"): NC_INT,
                 np.dtype("i1"): NC_BYTE}[a.dtype]
            be = a.astype(np.dtype(_DTYPES[t]))
            out += struct.pack(">II", t, a.size) + _pad(be.tobytes())
    return out


def encode_netcdf(variables: dict, dims: list[tuple[str, int]],
                  var_dims: dict, atts: dict | None = None) -> bytes:
    """Encode a classic CDF-1 file. ``variables`` maps name → ndarray
    (float32/float64/int32/int16), ``var_dims`` maps name → tuple of dim
    names, ``atts`` maps name → attribute dict. All dims fixed-size."""
    atts = atts or {}
    dim_idx = {name: i for i, (name, _) in enumerate(dims)}
    _NC = {np.dtype("f4"): NC_FLOAT, np.dtype("f8"): NC_DOUBLE,
           np.dtype("i4"): NC_INT, np.dtype("i2"): NC_SHORT}

    header = b"CDF\x01" + struct.pack(">I", 0)       # numrecs = 0
    header += struct.pack(">II", 0x0A, len(dims))
    for name, size in dims:
        header += _w_name(name) + struct.pack(">I", size)
    header += struct.pack(">II", 0, 0)               # no global atts

    var_entries = []
    for name, arr in variables.items():
        a = np.asarray(arr)
        t = _NC[a.dtype.newbyteorder("=")]
        vsize = (a.size * _SIZES[t] + 3) // 4 * 4
        var_entries.append((name, a, t, vsize))

    def var_header(begin_by_name):
        out = struct.pack(">II", 0x0B, len(var_entries))
        for name, a, t, vsize in var_entries:
            out += _w_name(name)
            dnames = var_dims[name]
            out += struct.pack(">I", len(dnames))
            for d in dnames:
                out += struct.pack(">I", dim_idx[d])
            out += _w_atts(atts.get(name, {}))
            out += struct.pack(">III", t, vsize, begin_by_name[name])
        return out

    # two passes: size the header with dummy offsets, then place data
    dummy = {name: 0 for name, *_ in var_entries}
    hlen = len(header) + len(var_header(dummy))
    begins, pos = {}, hlen
    for name, a, t, vsize in var_entries:
        begins[name] = pos
        pos += vsize
    out = header + var_header(begins)
    for name, a, t, vsize in var_entries:
        out += _pad(a.astype(np.dtype(_DTYPES[t])).tobytes())
    return out


def encode_grid_netcdf(var_arrays: dict, times: list[dt.datetime],
                       lat: np.ndarray, lon: np.ndarray,
                       fill_value: float | None = None) -> bytes:
    """Convenience: (T,H,W) float arrays + coordinate axes → classic
    NetCDF with CF time units and optional _FillValue."""
    t_dim, h, w = len(times), len(lat), len(lon)
    epoch = dt.datetime(1970, 1, 1)
    tvals = np.array([(t - epoch).total_seconds() for t in times],
                     dtype=np.float64)
    dims = [("time", t_dim), ("lat", h), ("lon", w)]
    variables = {"time": tvals, "lat": np.asarray(lat, np.float64),
                 "lon": np.asarray(lon, np.float64)}
    var_dims = {"time": ("time",), "lat": ("lat",), "lon": ("lon",)}
    atts = {"time": {"units": "seconds since 1970-01-01"},
            "lat": {"units": "degrees_north"},
            "lon": {"units": "degrees_east"}}
    for name, arr in var_arrays.items():
        a = np.asarray(arr, dtype=np.float32)
        variables[name] = a
        var_dims[name] = ("time", "lat", "lon")
        atts[name] = ({"_FillValue": np.float32(fill_value)}
                      if fill_value is not None else {})
    return encode_netcdf(variables, dims, var_dims, atts)
