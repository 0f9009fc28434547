"""Dependency-free NetCDF-4 (HDF5) codec (stdlib struct/zlib + numpy).

The reference reads NetCDF-4 via h5netcdf (formats/netcdf.py:33-104) —
not in this container. The subset libhdf5 actually emits for netCDF-4
files with default settings is bounded and documented, so this module
implements it natively, the same spirit as the GRIB2/TIFF/PNG codecs:

reader (`decode_hdf5` / `decode_netcdf4`):
- superblock v0 (libhdf5 default) and v2/v3 (libver='latest')
- version-1 object headers incl. continuation blocks AND version-2
  ('OHDR', 'OCHK' continuations; checksums skipped like fletcher32)
- symbol-table groups (v1 B-tree + local heap) AND new-style groups:
  compact link messages OR dense storage (fractal heap root-direct /
  one-level-indirect blocks + v2 B-tree link-name records — libhdf5's
  layout past 8 links; filtered heaps, nested indirect blocks and
  deeper B-trees gate by name)
- dataspace v1/v2; datatypes: fixed-point, IEEE float (LE), string,
  object reference, vlen
- layout v3 contiguous and chunked (v1 B-tree chunk index, any depth)
- filter pipeline v1/v2: deflate (1), shuffle (2), fletcher32 (3,
  checksum stripped), szip (4 — CCSDS 121.0 via aec_codec.py, the
  H5Z 4-byte-size-prefix chunk layout, LSB/MSB sample orders)
- attributes (v1 and v3), including the netCDF-4 ``DIMENSION_LIST``
  vlen of object references resolved through global heap collections —
  this is how variables are bound to their dimension-scale datasets
- CF semantics reuse the classic codec (cf_decode_values/_times)

writer (`encode_hdf5` / `encode_grid_netcdf4`):
- the canonical layout above: superblock v0, one root symbol-table
  group, contiguous coordinate datasets, the data variable chunked one
  chunk per leading index with deflate (or szip), DIMENSION_SCALE/
  DIMENSION_LIST conventions. Purpose: round-trip tests and oracle fixtures (the same
  role encode_grid_netcdf plays for classic files) — but the reader is
  written against the HDF5 spec, not against this writer.

Anything outside the subset raises NotImplementedError naming the
feature (BE numerics, filtered/nested fractal heaps, deep v2 B-trees).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

# message type ids
MSG_DATASPACE = 0x0001
MSG_DATATYPE = 0x0003
MSG_FILL = 0x0005
MSG_LINK = 0x0006
MSG_LAYOUT = 0x0008
MSG_FILTERS = 0x000B
MSG_ATTR = 0x000C
MSG_CONT = 0x0010
MSG_SYMTAB = 0x0011


def _u(buf, off, n):
    return int.from_bytes(buf[off:off + n], "little")


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def _superblock(buf: bytes):
    """→ ("v0", btree_addr, heap_addr) or ("v2", root_header_addr)."""
    if buf[:8] != _SIG:
        raise ValueError("not an HDF5 file")
    ver = buf[8]
    if ver == 0:
        if buf[13] != 8 or buf[14] != 8:
            raise NotImplementedError("non-8-byte offsets/lengths")
        # root group symbol table entry at offset 24+32 = 56
        ent = 56
        header_addr = _u(buf, ent + 8, 8)
        cache = _u(buf, ent + 16, 4)
        if cache == 1:
            btree = _u(buf, ent + 24, 8)
            heap = _u(buf, ent + 32, 8)
            return ("group", btree, heap, header_addr)
        return ("header", header_addr)
    if ver in (2, 3):
        if buf[9] != 8 or buf[10] != 8:
            raise NotImplementedError("non-8-byte offsets/lengths")
        root = _u(buf, 12 + 8 * 3, 8)
        return ("header", root)
    raise NotImplementedError(f"superblock version {ver}")


def _messages_v2(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    """Parse a version-2 ('OHDR') object header (+ 'OCHK' continuation
    blocks) → [(type, body)]. Trailing 4-byte checksums are skipped,
    not verified (same policy as the fletcher32 filter)."""
    if buf[addr:addr + 4] != b"OHDR" or buf[addr + 4] != 2:
        raise ValueError(f"bad v2 object header @{addr}")
    flags = buf[addr + 5]
    pos = addr + 6
    if flags & 0x20:
        pos += 16                        # access/mod/change/birth times
    if flags & 0x10:
        pos += 4                         # max compact / min dense
    size_bytes = 1 << (flags & 0x03)
    chunk0 = _u(buf, pos, size_bytes)
    pos += size_bytes
    tracked = bool(flags & 0x04)

    out: list[tuple[int, bytes]] = []
    conts: list[tuple[int, int]] = [(pos, chunk0)]
    ci = 0
    while ci < len(conts):
        p, length = conts[ci]
        end = p + length
        while p + 4 <= end:
            mtype = buf[p]
            msize = _u(buf, p + 1, 2)
            p += 4 + (2 if tracked else 0)
            if p + msize > end:
                break                    # trailing gap/checksum, not a msg
            body = buf[p:p + msize]
            p += msize
            if mtype == MSG_CONT:
                caddr, clen = _u(body, 0, 8), _u(body, 8, 8)
                if buf[caddr:caddr + 4] != b"OCHK":
                    raise ValueError("bad OCHK continuation")
                # signature(4) ... payload ... checksum(4)
                conts.append((caddr + 4, clen - 8))
            elif mtype != 0:
                out.append((mtype, body))
        ci += 1
    return out


def _messages_any(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    if buf[addr:addr + 4] == b"OHDR":
        return _messages_v2(buf, addr)
    return _messages_v1(buf, addr)


def _messages_v1(buf: bytes, addr: int) -> list[tuple[int, bytes]]:
    """Parse a version-1 object header (+ continuations) → [(type, body)]."""
    if buf[addr] != 1:
        if buf[addr:addr + 4] == b"OHDR":
            return _messages_v2(buf, addr)
        raise ValueError(f"bad object header version {buf[addr]} @{addr}")
    nmsg = _u(buf, addr + 2, 2)
    blocks = [(addr + 16, _u(buf, addr + 8, 4))]
    out = []
    bi = 0
    while bi < len(blocks) and len(out) < nmsg:
        pos, remaining = blocks[bi]
        end = pos + remaining
        while pos + 8 <= end and len(out) < nmsg:
            mtype = _u(buf, pos, 2)
            msize = _u(buf, pos + 2, 2)
            body = buf[pos + 8:pos + 8 + msize]
            pos += 8 + msize
            if mtype == MSG_CONT:
                blocks.append((_u(body, 0, 8), _u(body, 8, 8)))
            elif mtype != 0:            # NIL
                out.append((mtype, body))
        bi += 1
    return out


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    rank = body[1]
    if ver == 1:
        off = 8
    elif ver == 2:
        off = 4
    else:
        raise NotImplementedError(f"dataspace version {ver}")
    return [_u(body, off + 8 * i, 8) for i in range(rank)]


def _parse_datatype(body: bytes, off: int = 0) -> tuple[dict, int]:
    """→ (descriptor, bytes consumed). Descriptor keys: class, size,
    dtype (numpy, for fixed/float), base (for vlen)."""
    cv = body[off]
    cls, ver = cv & 0x0F, cv >> 4
    bits = body[off + 1:off + 4]
    size = _u(body, off + 4, 4)
    pos = off + 8
    if cls == 0:                         # fixed-point
        bo = ">" if bits[0] & 0x01 else "<"   # r5: BE legacy archives
        signed = bool(bits[0] & 0x08)
        pos += 4                         # bit offset + precision
        dt = np.dtype(f"{bo}{'i' if signed else 'u'}{size}")
        return {"class": cls, "size": size, "dtype": dt}, pos - off
    if cls == 1:                         # IEEE float
        # float byte order rides bits 0 and 6: 00 LE, 01 BE, 11 VAX
        if bits[0] & 0x40:
            raise NotImplementedError("VAX-order floats")
        bo = ">" if bits[0] & 0x01 else "<"   # r5: BE legacy archives
        pos += 12                        # offset/precision/exp/man/bias
        return {"class": cls, "size": size,
                "dtype": np.dtype(f"{bo}f{size}")}, pos - off
    if cls == 3:                         # string
        return {"class": cls, "size": size}, pos - off
    if cls == 7:                         # reference
        return {"class": cls, "size": size}, pos - off
    if cls == 9:                         # vlen
        base, used = _parse_datatype(body, pos)
        return {"class": cls, "size": size, "base": base}, \
            (pos + used) - off
    raise NotImplementedError(f"datatype class {cls} (version {ver})")


def _gheap_object(buf: bytes, coll_addr: int, idx: int) -> bytes:
    """Fetch object ``idx`` from the global heap collection."""
    if buf[coll_addr:coll_addr + 4] != b"GCOL":
        raise ValueError("bad global heap signature")
    size = _u(buf, coll_addr + 8, 8)
    pos = coll_addr + 16
    end = coll_addr + size
    while pos + 16 <= end:
        oidx = _u(buf, pos, 2)
        osize = _u(buf, pos + 8, 8)
        data = buf[pos + 16:pos + 16 + osize]
        if oidx == idx:
            return data
        if oidx == 0:
            break
        pos += 16 + (osize + 7) // 8 * 8
    raise ValueError(f"global heap object {idx} not found")


def _attr_value(buf: bytes, dt: dict, ds_dims: list[int], raw: bytes):
    n = 1
    for d in ds_dims:
        n *= d
    if dt["class"] == 3:
        return raw.split(b"\0")[0].decode("utf-8", "replace")
    if dt["class"] in (0, 1):
        a = np.frombuffer(raw, dtype=dt["dtype"], count=n)
        return a[0] if not ds_dims else np.asarray(a).reshape(ds_dims)
    if dt["class"] == 7:                 # object reference(s) = addresses
        refs = [_u(raw, 8 * i, 8) for i in range(n)]
        return refs[0] if not ds_dims else refs
    if dt["class"] == 9:                 # vlen — resolve via global heap
        out = []
        for i in range(n):
            ln = _u(raw, 16 * i, 4)
            coll = _u(raw, 16 * i + 4, 8)
            idx = _u(raw, 16 * i + 12, 4)
            data = _gheap_object(buf, coll, idx)
            base = dt["base"]
            if base["class"] == 7:
                out.append([_u(data, 8 * j, 8) for j in range(ln)])
            elif base["class"] in (0, 1):
                out.append(np.frombuffer(data, dtype=base["dtype"],
                                         count=ln))
            else:
                out.append(data)
        return out if ds_dims else out[0]
    raise NotImplementedError(f"attribute datatype class {dt['class']}")


def _parse_attr(buf: bytes, body: bytes):
    ver = body[0]
    if ver not in (1, 3):
        raise NotImplementedError(f"attribute message version {ver}")
    name_sz = _u(body, 2, 2)
    dt_sz = _u(body, 4, 2)
    ds_sz = _u(body, 6, 2)
    pos = 8 + (1 if ver == 3 else 0)     # v3 adds a name-charset byte
    name = body[pos:pos + name_sz].split(b"\0")[0].decode("utf-8")
    # v1 pads name/datatype/dataspace to 8 bytes; v3 does not
    pad = (lambda n: (n + 7) // 8 * 8) if ver == 1 else (lambda n: n)
    pos += pad(name_sz)
    dt, _ = _parse_datatype(body, pos)
    pos += pad(dt_sz)
    ds_dims = _parse_dataspace(body[pos:pos + ds_sz])
    pos += pad(ds_sz)
    return name, _attr_value(buf, dt, ds_dims, body[pos:])


def _parse_link(body: bytes) -> tuple[str, int] | None:
    """Link message (0x0006) → (name, object header address) for hard
    links; soft/external links → None."""
    if body[0] != 1:
        raise NotImplementedError(f"link message version {body[0]}")
    flags = body[1]
    pos = 2
    ltype = 0
    if flags & 0x08:
        ltype = body[pos]
        pos += 1
    if flags & 0x04:
        pos += 8                          # creation order
    if flags & 0x10:
        pos += 1                          # charset
    lsz = 1 << (flags & 0x03)
    nlen = _u(body, pos, lsz)
    pos += lsz
    name = body[pos:pos + nlen].decode("utf-8")
    pos += nlen
    if ltype != 0:
        return None                       # soft/external link
    return name, _u(body, pos, 8)


def _fractal_heap_blocks(buf: bytes, frhp_addr: int):
    """Parse a fractal heap (FRHP) header + root block into
    (block_map, offset_size, length_size): block_map is a list of
    (heap_offset, file_addr, size) for every DIRECT block, so a managed
    heap ID's offset can be resolved to a file position. Supported
    layout: root direct block, or one root indirect block (FHIB) whose
    children are all direct — the shape libhdf5 emits for link storage
    up to tens of thousands of links. Filtered heaps and nested
    indirect blocks raise by name."""
    if buf[frhp_addr:frhp_addr + 4] != b"FRHP":
        raise ValueError(f"bad fractal heap @{frhp_addr}")
    p = frhp_addr + 5
    heap_id_len = _u(buf, p, 2)
    filt_len = _u(buf, p + 2, 2)
    if filt_len:
        raise NotImplementedError("filtered fractal heap")
    flags = buf[p + 4]
    p += 5 + 4                           # max managed obj size
    p += 8 * 12                          # ids/addrs/space statistics
    width = _u(buf, p, 2)
    start_size = _u(buf, p + 2, 8)
    max_direct = _u(buf, p + 10, 8)
    max_heap_bits = _u(buf, p + 18, 2)
    p += 20
    p += 2                               # starting rows in root indirect
    root_addr = _u(buf, p, 8)
    cur_rows = _u(buf, p + 8, 2)
    off_size = (max_heap_bits + 7) // 8
    len_size = heap_id_len - 1 - off_size

    def _check_dblk(addr: int) -> None:
        if buf[addr:addr + 4] != b"FHDB":
            raise ValueError(f"bad fractal heap direct block @{addr}")

    blocks = []
    if cur_rows == 0:                    # root IS a direct block
        _check_dblk(root_addr)
        blocks.append((0, root_addr, start_size))
    else:
        if buf[root_addr:root_addr + 4] != b"FHIB":
            raise ValueError(f"bad fractal heap indirect @{root_addr}")
        q = root_addr + 4 + 1 + 8 + off_size
        heap_off = 0
        max_direct_rows = (max_direct // start_size).bit_length() + 1
        for row in range(cur_rows):
            size = start_size if row < 2 else start_size << (row - 1)
            if row >= max_direct_rows:
                raise NotImplementedError(
                    "nested indirect fractal heap blocks")
            for _ in range(width):
                caddr = _u(buf, q, 8)
                q += 8
                if caddr != UNDEF:
                    _check_dblk(caddr)
                    blocks.append((heap_off, caddr, size))
                heap_off += size
    return blocks, off_size, len_size


def _heap_object(buf, blocks, heap_off: int, length: int) -> bytes:
    for boff, baddr, bsize in blocks:
        if boff <= heap_off < boff + bsize:
            # heap offsets COVER the block header bytes
            return buf[baddr + (heap_off - boff):
                       baddr + (heap_off - boff) + length]
    raise ValueError(f"heap offset {heap_off} outside all direct blocks")


def _v2_btree_records(buf: bytes, bthd_addr: int):
    """v2 B-tree (BTHD) → raw record list. Depth-0 (root leaf) only —
    the shape link-name indexes take until ~node_size/record_size
    links; deeper trees raise by name."""
    if buf[bthd_addr:bthd_addr + 4] != b"BTHD":
        raise ValueError(f"bad v2 btree @{bthd_addr}")
    p = bthd_addr + 4 + 1 + 1
    p += 4                               # node size
    rec_size = _u(buf, p, 2)
    depth = _u(buf, p + 2, 2)
    p += 4 + 2                           # split/merge percent
    root_addr = _u(buf, p, 8)
    root_nrec = _u(buf, p + 8, 2)
    if depth != 0:
        raise NotImplementedError("v2 B-tree deeper than a root leaf")
    if buf[root_addr:root_addr + 4] != b"BTLF":
        raise ValueError(f"bad v2 btree leaf @{root_addr}")
    q = root_addr + 4 + 1 + 1
    return [buf[q + i * rec_size:q + (i + 1) * rec_size]
            for i in range(root_nrec)]


def _dense_links(buf: bytes, frhp_addr: int, bthd_addr: int) -> dict:
    """Dense link storage: resolve every type-5 (link name) v2-B-tree
    record's managed heap ID into the fractal heap, decode the stored
    Link message body. Record layout: 4-byte name hash + heap ID
    (flag byte, offset, length); the hash is an index key we don't
    need — records are scanned, not looked up."""
    blocks, off_size, len_size = _fractal_heap_blocks(buf, frhp_addr)
    entries = {}
    for rec in _v2_btree_records(buf, bthd_addr):
        hid = rec[4:]
        if (hid[0] >> 4) & 0x03 != 0:
            raise NotImplementedError("huge/tiny fractal heap object")
        off = _u(hid, 1, off_size)
        length = _u(hid, 1 + off_size, len_size)
        body = _heap_object(buf, blocks, off, length)
        link = _parse_link(body)
        if link is not None:
            entries[link[0]] = link[1]
    return entries


def _walk_chunk_btree(buf: bytes, addr: int, ndims: int,
                      out: list) -> None:
    """Collect (offsets, size, filter_mask, address) from a v1 chunk
    B-tree of any depth."""
    if addr == UNDEF:
        return
    if buf[addr:addr + 4] != b"TREE":
        raise ValueError("bad chunk B-tree signature")
    level = buf[addr + 5]
    nent = _u(buf, addr + 6, 2)
    key_sz = 8 + 8 * ndims
    pos = addr + 24
    for _ in range(nent):
        size = _u(buf, pos, 4)
        fmask = _u(buf, pos + 4, 4)
        offs = [_u(buf, pos + 8 + 8 * i, 8) for i in range(ndims)]
        child = _u(buf, pos + key_sz, 8)
        if level == 0:
            out.append((offs[:-1], size, fmask, child))
        else:
            _walk_chunk_btree(buf, child, ndims, out)
        pos += key_sz + 8


def _defilter(data: bytes, filters: list[tuple[int, int, list[int]]],
              fmask: int) -> bytes:
    """Undo the filter pipeline in reverse order (deflate/shuffle/
    fletcher32/szip)."""
    for i in range(len(filters) - 1, -1, -1):
        fid, _flags, client = filters[i]
        if fmask & (1 << i):
            continue
        if fid == 1:
            data = zlib.decompress(data)
        elif fid == 2:
            sz = client[0] if client else 4
            n = len(data) // sz
            data = (np.frombuffer(data, np.uint8)
                    .reshape(sz, n).T.reshape(-1).tobytes())
        elif fid == 3:
            data = data[:-4]             # checksum verified elsewhere
        elif fid == 4:
            data = _unszip(data, client)
        else:
            raise NotImplementedError(f"HDF5 filter id {fid}")
    return data


def _unszip(data: bytes, client: list[int]) -> bytes:
    """HDF5 szip filter (id 4) — szip IS CCSDS 121.0 entropy coding
    (libsz is a thin wrapper over libaec), so the chunk decodes through
    the same dependency-free coder GRIB2 template 5.42 uses
    (aec_codec.py). Client data per H5Zszip set_local:
    [options_mask, bits_per_pixel, pixels_per_block,
    pixels_per_scanline]; the chunk payload carries the uncompressed
    byte count as a 4-byte little-endian prefix (H5Z__filter_szip),
    then the raw AEC stream. Options mask (szlib.h): 0x04 EC, 0x08
    LSB / 0x10 MSB (the SAMPLE byte order in the uncompressed buffer —
    HDF5 sets it from the datatype's endianness; the AEC bitstream is
    MSB-first either way), 0x20 NN (= unit-delay preprocessing),
    0x80 raw."""
    from georiva_spark.sources.aec_codec import aec_decode
    opts, bpp, ppb, pps = (list(client) + [0, 0, 0, 0])[:4]
    if bpp not in (8, 16, 32):
        raise NotImplementedError(f"szip bits_per_pixel {bpp}")
    width = bpp // 8
    order = ">" if opts & 0x10 and not opts & 0x08 else "<"
    orig = int.from_bytes(data[:4], "little")
    n = orig // width
    # libsz/libaec: rsi = CEILING(pixels_per_scanline / pixels_per_block)
    # — floor would make every block a reference block when the scanline
    # is not a block multiple and desynchronize the stream
    rsi = max(1, -(-(pps or ppb) // max(1, ppb)))
    x = aec_decode(data[4:], n, bpp, block_size=ppb or 32, rsi=rsi,
                   preprocess=bool(opts & 0x20))
    return x.astype(f"{order}u{width}").tobytes()[:orig]


def _read_dataset(buf: bytes, addr: int) -> dict:
    msgs = _messages_any(buf, addr)
    shape: list[int] = []
    dt: dict | None = None
    atts: dict = {}
    layout = None
    filters: list[tuple[int, int, list[int]]] = []
    for mtype, body in msgs:
        if mtype == MSG_DATASPACE:
            shape = _parse_dataspace(body)
        elif mtype == MSG_DATATYPE:
            dt, _ = _parse_datatype(body)
        elif mtype == MSG_LAYOUT:
            layout = body
        elif mtype == MSG_FILTERS:
            fver = body[0]
            if fver not in (1, 2):
                raise NotImplementedError(
                    f"filter pipeline version {fver}")
            nf = body[1]
            pos = 8 if fver == 1 else 2
            for _ in range(nf):
                fid = _u(body, pos, 2)
                pos += 2
                nlen = 0
                if fver == 1 or fid >= 256:
                    nlen = _u(body, pos, 2)
                    pos += 2
                flags = _u(body, pos, 2)
                ncv = _u(body, pos + 2, 2)
                pos += 4
                pos += (nlen + 7) // 8 * 8 if fver == 1 else nlen
                client = [_u(body, pos + 4 * i, 4) for i in range(ncv)]
                pos += 4 * ncv
                if fver == 1 and ncv % 2:
                    pos += 4
                filters.append((fid, flags, client))
        elif mtype == MSG_ATTR:
            k, v = _parse_attr(buf, body)
            atts[k] = v
    if dt is None or layout is None:
        raise ValueError("dataset missing datatype/layout message")
    if dt["class"] not in (0, 1):
        raise NotImplementedError(
            f"dataset datatype class {dt['class']}")
    dtype = dt["dtype"]
    n = 1
    for d in shape:
        n *= d

    if layout[0] != 3:
        raise NotImplementedError(f"data layout version {layout[0]}")
    lclass = layout[1]
    if lclass == 1:                      # contiguous
        daddr = _u(layout, 2, 8)
        dsize = _u(layout, 10, 8)
        if daddr == UNDEF:
            data = np.zeros(n, dtype=dtype)
        else:
            data = np.frombuffer(buf, dtype=dtype, count=n, offset=daddr)
            _ = dsize
    elif lclass == 2:                    # chunked, b-tree v1 index
        ndims = layout[2]                # rank + 1 (element size dim)
        btree = _u(layout, 3, 8)
        chunk_dims = [_u(layout, 11 + 4 * i, 4) for i in range(ndims - 1)]
        chunks: list = []
        _walk_chunk_btree(buf, btree, ndims, chunks)
        arr = np.zeros(shape, dtype=dtype)
        for offs, csize, fmask, caddr in chunks:
            raw = _defilter(buf[caddr:caddr + csize], filters, fmask)
            ch = np.frombuffer(raw, dtype=dtype).reshape(chunk_dims)
            sl = tuple(slice(o, min(o + c, s))
                       for o, c, s in zip(offs, chunk_dims, shape))
            ch_sl = tuple(slice(0, s.stop - s.start) for s in sl)
            arr[sl] = ch[ch_sl]
        data = arr.reshape(-1)
    else:
        raise NotImplementedError(f"data layout class {lclass}")
    return {"shape": shape, "data": np.asarray(data).reshape(shape),
            "atts": atts, "addr": addr}


def _read_group(buf: bytes, btree_addr: int, heap_addr: int) -> dict:
    """Symbol-table group → {name: object header address}."""
    if buf[heap_addr:heap_addr + 4] != b"HEAP":
        raise ValueError("bad local heap signature")
    heap_data = _u(buf, heap_addr + 24, 8)

    def heap_name(off: int) -> str:
        end = buf.index(b"\0", heap_data + off)
        return buf[heap_data + off:end].decode("utf-8")

    out: dict[str, int] = {}

    def walk(addr: int) -> None:
        if buf[addr:addr + 4] == b"TREE":
            level = buf[addr + 5]
            nent = _u(buf, addr + 6, 2)
            pos = addr + 24
            for _ in range(nent):
                child = _u(buf, pos + 8, 8)
                walk(child)
                pos += 16
            _ = level
        elif buf[addr:addr + 4] == b"SNOD":
            nsym = _u(buf, addr + 6, 2)
            pos = addr + 8
            for _ in range(nsym):
                name_off = _u(buf, pos, 8)
                header = _u(buf, pos + 8, 8)
                out[heap_name(name_off)] = header
                pos += 40
        else:
            raise ValueError(f"unexpected group node @{addr}")

    walk(btree_addr)
    return out


def decode_hdf5(buf: bytes) -> dict:
    """→ {name: {"shape", "data", "atts", "addr"}} for every dataset in
    the root group (netCDF-4 keeps everything at the root unless groups
    are requested — grouped files raise on the v2-header path)."""
    sb = _superblock(buf)
    if sb[0] == "group":
        entries = _read_group(buf, sb[1], sb[2])
    else:
        msgs = _messages_any(buf, sb[1])
        st = [b for t, b in msgs if t == MSG_SYMTAB]
        if st:
            entries = _read_group(buf, _u(st[0], 0, 8), _u(st[0], 8, 8))
        else:
            # new-style group: compact link messages in the header, or
            # dense storage (fractal heap + v2 B-tree name index) past
            # libhdf5's 8-link compact threshold
            entries = {}
            for t, b in msgs:
                if t == 0x0002 and len(b) >= 2:     # Link Info
                    off = 2 + (8 if b[1] & 0x01 else 0)
                    frhp = _u(b, off, 8)
                    if frhp != UNDEF:
                        entries.update(
                            _dense_links(buf, frhp, _u(b, off + 8, 8)))
            for t, b in msgs:
                if t == MSG_LINK:
                    link = _parse_link(b)
                    if link is not None:
                        entries[link[0]] = link[1]
            if not entries and not msgs:
                raise NotImplementedError("unreadable root group")
    return {name: _read_dataset(buf, addr)
            for name, addr in sorted(entries.items())}


def decode_netcdf4(buf: bytes) -> dict:
    """NetCDF-4 → the SAME contract as netcdf_codec.decode_netcdf:
    {"dims": [(name, size)], "numrecs": 0, "variables": {name:
    {"dims": [names], "atts", "data"}}} so the plugin layer and CF
    helpers are shared between classic and HDF5 containers.

    Dimension binding: netCDF-4 marks each dimension as a dataset with
    CLASS="DIMENSION_SCALE" and binds variables through the
    DIMENSION_LIST attribute (vlen of object references). Falls back to
    coordinate-name/shape matching when DIMENSION_LIST is absent."""
    dsets = decode_hdf5(buf)
    addr_to_name = {d["addr"]: n for n, d in dsets.items()}
    dim_names = [n for n, d in dsets.items()
                 if d["atts"].get("CLASS") == "DIMENSION_SCALE"]
    dims = [(n, dsets[n]["shape"][0] if dsets[n]["shape"] else 1)
            for n in dim_names]
    dim_by_size: dict[int, str] = {}
    for n, s in dims:
        dim_by_size.setdefault(s, n)

    variables = {}
    for name, d in dsets.items():
        atts = {k: v for k, v in d["atts"].items()
                if k not in ("CLASS", "NAME", "DIMENSION_LIST",
                             "REFERENCE_LIST", "_Netcdf4Dimid",
                             "_Netcdf4Coordinates")}
        if name in dim_names:
            vdims = [name]
        elif "DIMENSION_LIST" in d["atts"]:
            refs = d["atts"]["DIMENSION_LIST"]
            if not isinstance(refs, list):
                refs = [refs]
            vdims = [addr_to_name[r[0] if isinstance(r, list) else r]
                     for r in refs]
        else:
            vdims = [dim_by_size.get(s, f"phony_dim_{i}")
                     for i, s in enumerate(d["shape"])]
        variables[name] = {"dims": vdims, "atts": atts, "data": d["data"]}
    return {"dims": dims, "numrecs": 0, "variables": variables}


# ---------------------------------------------------------------------------
# Writer — canonical netCDF-4 subset
# ---------------------------------------------------------------------------

_DT_F32 = (b"\x11\x20\x1f\x00" + struct.pack("<I", 4)
           + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127))
_DT_F64 = (b"\x11\x20\x3f\x00" + struct.pack("<I", 8)
           + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023))
_DT_I32 = b"\x10\x08\x00\x00" + struct.pack("<I", 4) + struct.pack("<HH", 0, 32)
_DT_I64 = b"\x10\x08\x00\x00" + struct.pack("<I", 8) + struct.pack("<HH", 0, 64)
_DT_REF = b"\x17\x00\x00\x00" + struct.pack("<I", 8)

# big-endian variants (bit 0 of the class bit field = byte order) for
# round-tripping legacy s390x/POWER-written archives through the writer
_DT_F32BE = (b"\x11\x21\x1f\x00" + struct.pack("<I", 4)
             + struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127))
_DT_F64BE = (b"\x11\x21\x3f\x00" + struct.pack("<I", 8)
             + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023))
_DT_I32BE = (b"\x10\x09\x00\x00" + struct.pack("<I", 4)
             + struct.pack("<HH", 0, 32))
_DT_I64BE = (b"\x10\x09\x00\x00" + struct.pack("<I", 8)
             + struct.pack("<HH", 0, 64))

_NP_DT = {np.dtype("<f4"): _DT_F32, np.dtype("<f8"): _DT_F64,
          np.dtype("<i4"): _DT_I32, np.dtype("<i8"): _DT_I64,
          np.dtype(">f4"): _DT_F32BE, np.dtype(">f8"): _DT_F64BE,
          np.dtype(">i4"): _DT_I32BE, np.dtype(">i8"): _DT_I64BE}


def _dt_string(n: int) -> bytes:
    return b"\x13\x00\x00\x00" + struct.pack("<I", max(1, n))


def _dt_vlen_ref() -> bytes:
    return b"\x19\x00\x00\x00" + struct.pack("<I", 16) + _DT_REF


def _ds_simple(shape) -> bytes:
    body = struct.pack("<BBBx4x", 1, len(shape), 0)
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _pad8(b: bytes) -> bytes:
    return b + b"\0" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBxxx", mtype, len(body), 0) + body


def _attr_msg(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nm = name.encode("utf-8") + b"\0"
    body = struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
    body += _pad8(nm) + _pad8(dt) + _pad8(ds) + data
    return _msg(MSG_ATTR, body)


def _str_attr(name: str, value: str) -> bytes:
    v = value.encode("utf-8") + b"\0"
    return _attr_msg(name, _dt_string(len(v)), _ds_simple(()), v)


def _num_attr(name: str, value) -> bytes:
    a = np.atleast_1d(np.asarray(value))
    if a.dtype not in _NP_DT:
        a = a.astype("<f8")
    dt = _NP_DT[a.dtype.newbyteorder("<")]
    ds = _ds_simple(()) if np.isscalar(value) or a.size == 1 \
        else _ds_simple(a.shape)
    return _attr_msg(name, dt, ds, a.astype(a.dtype.newbyteorder("<"))
                     .tobytes())


def _header_v1(messages: list[bytes]) -> bytes:
    body = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


def encode_hdf5(variables: dict, dims: list[tuple[str, int]],
                var_dims: dict, atts: dict | None = None,
                chunk_deflate: bool = True,
                chunk_filter: str = "deflate") -> bytes:
    """Encode a netCDF-4 file (same signature as encode_netcdf).
    1-D variables whose name matches a dim are DIMENSION_SCALEs written
    contiguous; multi-dim variables are chunked one-chunk-per-leading-
    index with deflate (the layout libhdf5 produces for typical CF
    grids) — or szip (CCSDS 121.0 via aec_codec, H5Z client-data
    layout) with ``chunk_filter='szip'`` — and carry DIMENSION_LIST
    references."""
    atts = atts or {}
    if chunk_filter not in ("deflate", "szip"):
        raise ValueError(f"chunk_filter {chunk_filter!r}")
    _SZ_OPTS, _SZ_PPB = 0x08 | 0x20 | 0x80, 32   # LSB + NN + raw

    def _szip_pack(raw: bytes, itemsize: int) -> bytes:
        from georiva_spark.sources.aec_codec import aec_encode
        bpp = itemsize * 8
        x = np.frombuffer(raw, f"<u{itemsize}").astype(np.int64)
        enc = aec_encode(x, bpp, block_size=_SZ_PPB,
                         rsi=_SZ_PPS // _SZ_PPB)
        return len(raw).to_bytes(4, "little") + enc

    _SZ_PPS = _SZ_PPB * 128
    dim_sizes = dict(dims)
    names = list(variables)
    out = bytearray()

    def alloc(n: int) -> int:
        off = len(out)
        out.extend(b"\0" * n)
        return off

    alloc(96)                            # superblock v0

    # --- local heap with all names -------------------------------------
    heap_data = bytearray(b"\0" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        nm = n.encode("utf-8") + b"\0"
        heap_data += nm + b"\0" * (-len(nm) % 8)
    heap_data_addr = alloc(len(heap_data))
    out[heap_data_addr:heap_data_addr + len(heap_data)] = heap_data
    heap_hdr = alloc(32)
    out[heap_hdr:heap_hdr + 32] = (
        b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data),
                              len(heap_data), heap_data_addr))

    def _wire(a: np.ndarray) -> np.ndarray:
        """Storage representation: an explicitly big-endian dtype with
        a BE datatype message is preserved (legacy-archive round-trip
        fixtures) unless the szip filter is active — H5Z szip packs
        LSB-first samples, so BE coerces to LE there; everything else
        normalizes to little-endian."""
        if a.dtype in _NP_DT and not (chunk_deflate
                                      and chunk_filter == "szip"):
            return a
        return a.astype(a.dtype.newbyteorder("<"))

    # --- data blocks ----------------------------------------------------
    data_addr: dict[str, int] = {}
    chunk_info: dict[str, list] = {}     # name → [(offs, size, addr)]
    for n in names:
        a = _wire(np.asarray(variables[n]))
        if a.ndim <= 1 or not chunk_deflate:
            data_addr[n] = alloc(a.nbytes)
            out[data_addr[n]:data_addr[n] + a.nbytes] = a.tobytes()
        else:
            infos = []
            for i in range(a.shape[0]):
                comp = (_szip_pack(a[i].tobytes(), a.dtype.itemsize)
                        if chunk_filter == "szip"
                        else zlib.compress(a[i].tobytes(), 6))
                caddr = alloc(len(comp))
                out[caddr:caddr + len(comp)] = comp
                infos.append(((i,) + (0,) * (a.ndim - 1) + (0,),
                              len(comp), caddr))
            chunk_info[n] = infos

    # --- chunk b-trees (single leaf) ------------------------------------
    btree_addr: dict[str, int] = {}
    for n, infos in chunk_info.items():
        a = np.asarray(variables[n])
        ndims = a.ndim + 1
        key_sz = 8 + 8 * ndims
        node_sz = 24 + len(infos) * (key_sz + 8) + key_sz
        addr = alloc(node_sz)
        node = bytearray(b"TREE" + struct.pack("<BBHQQ", 1, 0, len(infos),
                                               UNDEF, UNDEF))
        for offs, csize, caddr in infos:
            node += struct.pack("<II", csize, 0)
            node += b"".join(struct.pack("<Q", o) for o in offs)
            node += struct.pack("<Q", caddr)
        # final key = one past the last chunk
        a0 = np.asarray(variables[n])
        node += struct.pack("<II", 0, 0)
        node += struct.pack("<Q", a0.shape[0])
        node += b"".join(struct.pack("<Q", 0) for _ in range(ndims - 1))
        out[addr:addr + len(node)] = node
        btree_addr[n] = addr

    # --- global heap for DIMENSION_LIST object references ---------------
    # one object per (variable, dim slot); data = 8-byte header address
    gh_objects: list[tuple[str, int]] = []   # (var, dim slot)
    for n in names:
        a = np.asarray(variables[n])
        if n not in dim_sizes and a.ndim >= 1 and n in var_dims:
            for k in range(len(var_dims[n])):
                gh_objects.append((n, k))
    gh_addr = None
    if gh_objects:
        gh_size = 16 + len(gh_objects) * 24 + 16
        gh_size = (gh_size + 7) // 8 * 8
        gh_addr = alloc(gh_size)

    # --- object headers (sizes must be computed before placement) -------
    def dataset_msgs(n: str, header_addrs: dict[str, int] | None) -> list:
        a = np.asarray(variables[n])
        dt = _NP_DT[_wire(a).dtype]
        msgs = [_msg(MSG_DATASPACE, _ds_simple(a.shape)),
                _msg(MSG_DATATYPE, dt),
                _msg(MSG_FILL, struct.pack("<BBBB", 2, 2, 0, 0))]
        if n in chunk_info:
            ndims = a.ndim + 1
            lay = struct.pack("<BBB", 3, 2, ndims)
            lay += struct.pack("<Q", btree_addr[n])
            for c in (1,) + a.shape[1:]:
                lay += struct.pack("<I", c)
            lay += struct.pack("<I", a.dtype.itemsize)
            msgs.append(_msg(MSG_LAYOUT, lay))
            filt = struct.pack("<BB2x4x", 1, 1)
            if chunk_filter == "szip":
                filt += struct.pack("<HHHH", 4, 0, 0, 4)   # szip, 4 vals
                filt += struct.pack("<IIII", _SZ_OPTS,
                                    a.dtype.itemsize * 8, _SZ_PPB,
                                    _SZ_PPS)
            else:
                filt += struct.pack("<HHHH", 1, 0, 0, 1)   # deflate
                filt += struct.pack("<I", 6) + b"\0\0\0\0"  # odd pad
            msgs.append(_msg(MSG_FILTERS, filt))
        else:
            lay = struct.pack("<BB", 3, 1)
            lay += struct.pack("<QQ", data_addr[n], a.nbytes)
            msgs.append(_msg(MSG_LAYOUT, lay))
        if n in dim_sizes:
            msgs.append(_str_attr("CLASS", "DIMENSION_SCALE"))
            msgs.append(_str_attr("NAME", n))
        elif n in var_dims and gh_addr is not None:
            rank = len(var_dims[n])
            data = b""
            for k in range(rank):
                idx = gh_objects.index((n, k)) + 1
                data += struct.pack("<IQI", 1, gh_addr, idx)
            msgs.append(_attr_msg("DIMENSION_LIST", _dt_vlen_ref(),
                                  _ds_simple((rank,)), data))
        for k, v in atts.get(n, {}).items():
            msgs.append(_str_attr(k, v) if isinstance(v, str)
                        else _num_attr(k, v))
        return msgs

    sizes = {n: 16 + sum(len(m) for m in dataset_msgs(n, None))
             for n in names}
    header_addr = {}
    for n in names:
        header_addr[n] = alloc(sizes[n])
    # root group pieces
    nsyms = len(names)
    snod_addr = alloc(8 + 40 * nsyms)
    gbt_addr = alloc(24 + 16 + 8)        # 1 key/child pair + final key
    root_hdr = alloc(16 + len(_msg(MSG_SYMTAB,
                                   struct.pack("<QQ", gbt_addr,
                                               heap_hdr))))

    # fill global heap (needs header addresses)
    if gh_addr is not None:
        gh = bytearray(b"GCOL" + struct.pack("<B3xQ", 1, gh_size))
        for i, (n, k) in enumerate(gh_objects):
            dim_name = var_dims[n][k]
            gh += struct.pack("<HH4xQ", i + 1, 1, 8)
            gh += struct.pack("<Q", header_addr[dim_name])
        gh += b"\0" * (gh_size - len(gh))
        out[gh_addr:gh_addr + gh_size] = gh

    # write dataset headers
    for n in names:
        hdr = _header_v1(dataset_msgs(n, header_addr))
        assert len(hdr) == sizes[n]
        out[header_addr[n]:header_addr[n] + len(hdr)] = hdr

    # SNOD (entries sorted by name — v1 group b-tree invariant)
    snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, nsyms))
    for n in sorted(names):
        snod += struct.pack("<QQI4x16x", name_off[n], header_addr[n], 0)
    out[snod_addr:snod_addr + len(snod)] = snod

    # group b-tree: one leaf pointing at the SNOD
    gbt = bytearray(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1,
                                          UNDEF, UNDEF))
    gbt += struct.pack("<Q", 0)                       # key 0 (−inf name)
    gbt += struct.pack("<Q", snod_addr)
    gbt += struct.pack("<Q", name_off[sorted(names)[-1]])
    out[gbt_addr:gbt_addr + len(gbt)] = gbt

    # root object header
    hdr = _header_v1([_msg(MSG_SYMTAB,
                           struct.pack("<QQ", gbt_addr, heap_hdr))])
    out[root_hdr:root_hdr + len(hdr)] = hdr

    # superblock v0
    sb = bytearray(_SIG)
    sb += struct.pack("<BBBxBBBxHHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, len(out), UNDEF)
    sb += struct.pack("<QQI4xQQ", 0, root_hdr, 1, gbt_addr, heap_hdr)
    out[0:96] = sb
    return bytes(out)


def encode_grid_netcdf4(var_arrays: dict, times, lat, lon,
                        fill_value: float | None = None) -> bytes:
    """(T,H,W) float arrays + axes → netCDF-4, mirroring
    encode_grid_netcdf for the classic container."""
    import datetime as dt
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
    return encode_hdf5(variables, dims, var_dims, atts)
