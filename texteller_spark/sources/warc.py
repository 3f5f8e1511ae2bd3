"""WARC source: Common-Crawl's native container format → the authoritative
pages table shape.

The production input table ``(url, warc_ts, html, text, lang)`` is
materialized FROM WARC archives; this source closes that loop in-engine. A
WARC file is a sequence of records — ``WARC/1.0`` header block (CRLF
lines), blank line, ``Content-Length`` payload bytes, blank separator — and
Common Crawl compresses each record as its OWN gzip member so readers can
split without decompressing the whole file (the format detail this parser
relies on: ``zlib.decompressobj`` + ``unused_data`` walks member
boundaries). ``response`` records carry an HTTP response; the html payload
follows the HTTP header block.

Spark shape: ``binaryFile`` scan (one row per shard; Common-Crawl shards
are ~1 GB, the natural distribution unit — file-granular parallelism, no
shuffle) → ``mapInPandas`` record parser → pages rows. Malformed records
degrade row-wise, never task-wise (truncated tails and corrupt members are
skipped — real crawl archives contain both).

The writer exists for tests and corpus prep (seeded synthetic corpus →
valid WARC bytes → round-trip byte-identity, pinned in
``tests/test_warc.py``); it is NOT a general-purpose WARC library.

Reference analog: the raw-file image scan + robust multi-format decode
(``/root/reference/src/models/det_model/preprocess.py:6-23``,
``ocr_model/utils/helpers.py:6-26``) — here the "image file" is a crawl
shard and the "formats" are gzip-member framing + HTTP envelope.
"""

from __future__ import annotations

import datetime
import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schema import PAGES_SCHEMA

__all__ = ["build_warc", "parse_warc", "read_pages_warc"]

_CRLF = b"\r\n"


def build_warc(
    rows: list[tuple[str, datetime.datetime, bytes]], gzip_members: bool = True
) -> bytes:
    """Serialize (url, warc_ts, html) rows as WARC response records; each
    record its own gzip member when ``gzip_members`` (the Common-Crawl
    storage form)."""
    out = io.BytesIO()
    for url, ts, html in rows:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html" + _CRLF
            + _CRLF
            + html
        )
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + _CRLF
            + b"Content-Length: " + str(len(http)).encode() + _CRLF
            + _CRLF
        )
        record = header + http + _CRLF + _CRLF
        out.write(gzip.compress(record, 1) if gzip_members else record)
    return out.getvalue()


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Walk per-record gzip members; a corrupt member ends the walk for this
    shard (row-wise degradation — prior members already yielded). The
    buffer is walked through a memoryview — a Common-Crawl shard holds
    ~10^5 members, and slicing bytes per member would copy the remaining
    buffer each time (quadratic in shard size)."""
    mv = memoryview(data)
    n = len(data)
    chunk_size = 1 << 20
    pos = 0
    while pos < n and bytes(mv[pos : pos + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = []
        p = pos
        try:
            # feed ≤1 MiB chunks until the member ends: unused_data then
            # holds only the tail of the LAST chunk (O(chunk), not
            # O(remaining shard) per member)
            while not d.eof and p < n:
                piece = mv[p : p + chunk_size]
                out.append(d.decompress(piece))
                p += len(piece)
        except zlib.error:
            return
        if not d.eof:
            return  # truncated final member
        yield b"".join(out)
        pos = p - len(d.unused_data)


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (gzip-member or plain concatenation) → list of
    ``{url, warc_ts, html}`` for response records. Total: malformed records
    are skipped, never raised."""
    if data[:2] == b"\x1f\x8b":
        stream = b"".join(_gzip_members(data))
    else:
        stream = data
    rows: list[dict] = []
    pos = 0
    n = len(stream)
    while pos < n:
        start = stream.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = stream.find(_CRLF + _CRLF, start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in stream[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        payload = stream[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response" or len(payload) < length:
            continue  # skip non-response and truncated-tail records
        url = headers.get("warc-target-uri")
        if not url:
            continue
        try:
            ts = datetime.datetime.strptime(
                headers.get("warc-date", ""), "%Y-%m-%dT%H:%M:%SZ"
            )
        except ValueError:
            ts = None
        http_end = payload.find(_CRLF + _CRLF)
        html = payload[http_end + 4 :] if http_end >= 0 else payload
        rows.append({"url": url, "warc_ts": ts, "html": html})
    return rows


def read_pages_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan ``*.warc`` / ``*.warc.gz`` shards into the authoritative pages
    shape. One task per shard (binaryFile split = whole file); ``text`` and
    ``lang`` are unknown at scan time (null) — exactly what
    ``extract_pages`` consumes."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                for r in parse_warc(bytes(content)):
                    out.append(
                        {
                            "url": r["url"],
                            "warc_ts": r["warc_ts"],
                            "html": r["html"],
                            "text": None,
                            "lang": None,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.select("content").mapInPandas(run, schema=PAGES_SCHEMA)
