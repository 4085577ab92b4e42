"""WARC source: Common Crawl's native archive format -> pages table.

The graft's input_hint is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html binary, text, lang)`` — but a real CC pipeline
starts one step earlier, at ``.warc``/``.warc.gz`` segment files (ISO
28500; Common Crawl ships each record as its own gzip member). This
module provides that step with stdlib-only parsing (``zlib``), as the
reference's raw-content source analog (reference: dirTree/raw content
ingestion, /root/reference/src/index.ts:100-118 — here the "directory"
is a segment archive and each response record is a file).

Scale posture: segments arrive as one binary blob per row (e.g.
``spark.read.format("binaryFile")`` over a segment listing, ~1 GiB per
CC segment), and ``pages_from_warc`` fans records out via
``mapInPandas`` — one Arrow batch in, many page rows out, no driver
involvement and no full-segment materialization on the driver. At
10^12 documents the segment listing partitions the work; record
parsing is a pure per-partition CPU transform that scales with
executors. HTTP bodies stay ``binary`` (no charset decode — that is
the downstream ``extract_html`` stage's job), matching the input
hint's ``html:binary`` column exactly.
"""

from __future__ import annotations

import datetime as _dt
import io
import zlib
from typing import Iterable, Iterator

CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"

# pages schema minus `text`/`lang` (both NULL until extraction/langid)
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _gunzip_members(raw: bytes) -> bytes:
    """Decompress multi-member gzip (CC style: one member per record)."""
    out = []
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.append(d.decompress(raw[pos:]))
        except zlib.error:  # corrupt member: stop, keep what we have
            break
        consumed = len(raw) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailing bytes: stop, keep what we have
            break
        pos += consumed
    return b"".join(out)


def parse_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` per WARC record from a segment blob.

    Pure-python, allocation-light: operates on one segment's bytes.
    Gzipped segments (magic sniffed) are decompressed first. Header names
    are lower-cased; the block is the exact Content-Length slice.
    Malformed trailing garbage ends iteration rather than raising — a
    100-TB crawl always contains truncated segments, and losing the tail
    record beats failing the partition.
    """
    if raw[:2] == _GZ_MAGIC:
        raw = _gunzip_members(raw)
    buf = io.BytesIO(raw)
    while True:
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            return  # lost sync: stop parsing this segment
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (CRLF, b"\n", b""):
                break
            k, _, v = h.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return
        block = buf.read(length)
        if len(block) < length:
            return  # truncated segment tail
        yield headers, block


def _http_body(block: bytes) -> bytes:
    """Split an HTTP response block into its body (after the header CRLF
    CRLF); a block without an HTTP status line is returned whole."""
    if not block.startswith(b"HTTP/"):
        return block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return b""
    return block[sep + 4:]


def _parse_warc_date(s: str) -> _dt.datetime | None:
    # WARC-Date is W3C ISO-8601 Zulu. WARC 1.0 mandates second precision;
    # WARC 1.1 allows fractional seconds (ADVICE r03: those silently read
    # as NULL before). Values are UTC by spec — returned naive, so the
    # session timezone MUST be pinned to UTC wherever these rows are
    # turned into Spark timestamps (cli.py pins it; see test_warc_tz).
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return _dt.datetime.strptime(s, fmt)
        except (ValueError, TypeError):
            continue
    return None


def pages_rows_from_segment(raw: bytes) -> Iterator[tuple]:
    """(url, warc_ts, html, None, None) per response record in a segment."""
    for headers, block in parse_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue  # warcinfo / request / metadata records carry no page
        url = headers.get("warc-target-uri")
        if not url:
            continue
        yield (
            url,
            _parse_warc_date(headers.get("warc-date", "")),
            _http_body(block),
            None,
            None,
        )


def pages_from_warc(spark, segments, data_col: str = "data"):
    """Segments DataFrame (one WARC blob per row in ``data_col``) ->
    pages DataFrame. mapInPandas: each Arrow batch of segments expands to
    its page rows executor-side."""
    import pandas as pd

    def expand(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                r for blob in pdf[data_col]
                if blob is not None
                for r in pages_rows_from_segment(bytes(blob))
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return segments.mapInPandas(expand, schema=WARC_PAGES_SCHEMA)


def warc_segments_from_pages(
    pages, gzip_members: bool = True, data_col: str = "data"
):
    """Sink direction: pages DataFrame -> one WARC segment blob per Arrow
    batch (CC-style gzip members by default). The inverse of
    ``pages_from_warc``; round-trip is byte-exact on the html column
    (driver query ``warc_roundtrip`` pins the parse side, tests pin the
    full cycle). Partitioning controls segment count: ``repartition(n)``
    upstream yields ~n segments — at crawl scale, size partitions to the
    ~1 GiB segment convention."""
    import pandas as pd

    def pack(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            # NULL handling (ADVICE r03): mapInPandas delivers NULL
            # timestamps as pandas NaT — which is NOT None, so an
            # `is not None` fallback never fired and strftime crashed the
            # partition. pd.isna is the correct NULL test for every arrow
            # scalar. NULL-url rows are dropped: WARC-Target-URI is
            # mandatory on response records, and the source side never
            # emits such rows (it skips records without a target URI).
            rows = [
                (
                    r.url,
                    _dt.datetime(1970, 1, 1) if pd.isna(r.warc_ts)
                    else r.warc_ts.to_pydatetime()
                    if hasattr(r.warc_ts, "to_pydatetime") else r.warc_ts,
                    b"" if r.html is None else bytes(r.html),
                )
                for r in pdf.itertuples()
                if r.url is not None and not pd.isna(r.url)
            ]
            if not rows:
                continue
            yield pd.DataFrame(
                {data_col: [build_warc_segment(rows, gzip_members)]}
            )

    return pages.select("url", "warc_ts", "html").mapInPandas(
        pack, schema=f"{data_col} binary"
    )


def build_warc_segment(
    pages: list[tuple[str, _dt.datetime, bytes]], gzip_members: bool = False
) -> bytes:
    """Deterministic WARC writer (the parse twin): one response record per
    (url, ts, body). Used by tests and the roundtrip oracle; also the
    shape a re-crawl export sink would emit."""
    out = []
    for url, ts, body in pages:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8") + CRLF +
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF +
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + CRLF + CRLF +
            http + CRLF + CRLF
        )
        if gzip_members:
            co = zlib.compressobj(wbits=zlib.MAX_WBITS | 16)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)
