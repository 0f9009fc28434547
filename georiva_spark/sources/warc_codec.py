"""Dependency-free WARC/WET reader — the Common Crawl container, the
de-facto input format of a 100-TB LLM training-data pipeline (WET
"conversion" records carry extracted text; WARC "response" records
carry raw HTTP). The reference has no web-crawl surface at all
(formats/ is GRIB/NetCDF/GeoTIFF); this is north-star scope, same
class as the MJPEG/AVI path.

Format (ISO 28500): records framed as

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

Crawl archives ship gzip'd with ONE GZIP MEMBER PER RECORD so readers
can split mid-file; Python's gzip handles concatenated members
transparently, so `warc_records` accepts both plain and .gz payloads.

Scale shape: the unit of parallelism is the FILE (binaryFile listing →
mapInPandas decode per executor, like the GRIB/TIFF scans); record
parsing is a single linear pass; HTTP header stripping for response
records is a single find. A 100-TB crawl is ~100k WET files — the
listing parallelizes and the decode is embarrassingly parallel.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("path string, record_id string, warc_type string, "
               "target_uri string, warc_date string, "
               "content_type string, n_bytes long, text string")


def warc_encode(records: list[dict], gz: bool = False) -> bytes:
    """Fixture writer: each dict needs warc_type / payload (bytes or
    str) and optional target_uri / record_id / date / content_type.
    ``gz=True`` writes one gzip member per record (the crawl layout)."""
    out = []
    for i, r in enumerate(records):
        payload = r["payload"]
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        hdr = [b"WARC/1.0"]
        hdr.append(b"WARC-Type: " + r["warc_type"].encode())
        hdr.append(b"WARC-Record-ID: "
                   + r.get("record_id", f"<urn:uuid:{i}>").encode())
        if "target_uri" in r:
            hdr.append(b"WARC-Target-URI: " + r["target_uri"].encode())
        hdr.append(b"WARC-Date: "
                   + r.get("date", "2020-01-01T00:00:00Z").encode())
        if "content_type" in r:
            hdr.append(b"Content-Type: " + r["content_type"].encode())
        hdr.append(b"Content-Length: " + str(len(payload)).encode())
        rec = b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gz:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


def warc_records(content: bytes) -> Iterator[dict]:
    """Parse one WARC/WET payload (plain or gzip'd) → dicts with the
    WARC headers + payload bytes. Linear pass, tolerant of the
    trailing \\r\\n\\r\\n record separator."""
    if content[:2] == b"\x1f\x8b":
        # NOT gzip.decompress: on a crawl shard with one gzip member
        # per record it re-slices the remaining buffer per member
        # (unused_data) — quadratic over 60k+ members. The streaming
        # GzipFile reader walks concatenated members linearly.
        content = gzip.GzipFile(fileobj=io.BytesIO(content)).read()
    pos, n = 0, len(content)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and content[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not content.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: expected record header at {pos}")
        hdr_end = content.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC: unterminated record header")
        headers = {}
        for line in content[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode(
                "utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC: record without Content-Length")
        body_start = hdr_end + 4
        payload = content[body_start:body_start + length]
        if len(payload) < length:
            raise ValueError(
                f"WARC: truncated record — Content-Length {length} but "
                f"only {len(payload)} bytes remain")
        yield {"headers": headers, "payload": payload}
        pos = body_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response head from a WARC 'response' payload."""
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4:] if sep >= 0 else payload


def warc_parse(files: DataFrame,
               types: tuple[str, ...] = ("conversion", "response")
               ) -> DataFrame:
    """Parse a (path, content) DataFrame of WARC/WET archive bytes →
    one row per text-bearing record (the transform half of
    :func:`warc_scan`, shared with the STREAMING ingestion loop —
    batch and stream must demux identically). 'conversion' (WET)
    payloads are the text; 'response' payloads drop the HTTP head
    first; other record types are skipped. Arrow-batched per-file
    decode; no driver-side loop."""
    import pandas as pd

    tset = set(types)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in warc_records(bytes(content)):
                    h = rec["headers"]
                    wt = h.get("warc-type", "")
                    if wt not in tset:
                        continue
                    body = (_http_body(rec["payload"])
                            if wt == "response" else rec["payload"])
                    rows.append((p, h.get("warc-record-id", ""), wt,
                                 h.get("warc-target-uri", ""),
                                 h.get("warc-date", ""),
                                 h.get("content-type", ""),
                                 len(body),
                                 body.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=[
                "path", "record_id", "warc_type", "target_uri",
                "warc_date", "content_type", "n_bytes", "text"])

    return (files.select("path", "content")
            .mapInPandas(gen, schema=WARC_SCHEMA))


def warc_scan(spark: SparkSession, path: str,
              types: tuple[str, ...] = ("conversion", "response")
              ) -> DataFrame:
    """Scan WARC/WET files under ``path`` → one row per text-bearing
    record: (path, record_id, warc_type, target_uri, warc_date,
    content_type, n_bytes, text). binaryFile listing →
    :func:`warc_parse`."""
    return warc_parse(spark.read.format("binaryFile").load(path),
                      types=types)
