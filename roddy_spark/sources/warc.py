"""WARC (ISO 28500 / WARC-1.1) source: the web-archive container format
CommonCrawl and every serious crawler emit. The reference crawler
(coghost/roddy) scrapes live sites only; a training-data pipeline at
100 TB starts from WARC archives instead, so this module provides the
ingestion path: a pure-Python streaming record parser, a deterministic
writer (for fixtures and for archiving fetched pages), and a Spark
reader.

Scale shape: CommonCrawl WARCs are ~1 GB files of per-record gzip
members — NOT splittable mid-file — so the unit of parallelism is the
FILE, exactly what ``spark.read.format("binaryFile")`` + ``mapInPandas``
gives: one task per archive, records stream out of the parser without
materializing more than one record's bytes at a time beyond the file
buffer, and the payload bytes cross into Python exactly once (they are
already there — binaryFile hands Python the raw file). Nothing
record-sized is ever shuffled; downstream operators (main_text, dedup,
quality) run on the parsed columns. At 10^5 archives the scan
parallelizes trivially across executors; set
``spark.sql.files.maxPartitionBytes`` high enough that binaryFile never
tries to coalesce two archives into one task.

Record framing (public spec): a version line ``WARC/1.0`` or
``WARC/1.1``, CRLF header lines ``Name: value`` until a blank line,
``Content-Length`` octets of block, then CRLF CRLF. ``response`` /
``request`` records with ``Content-Type: application/http`` carry an
HTTP message as block; its status line + headers are split from the
payload at the first blank line.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

_CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


# ---------------------------------------------------------------------------
# writer (deterministic — fixture generation and page archiving)
# ---------------------------------------------------------------------------

def _det_record_id(url: str, seq: int) -> str:
    h = hashlib.md5(f"{url}#{seq}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def build_http_response(body: bytes, status: int = 200,
                        content_type: str = "text/html") -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              500: "Internal Server Error"}.get(status, "Status")
    return (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def build_record(warc_type: str, url: str, block: bytes,
                 date: str = "2026-01-01T00:00:00Z", seq: int = 0,
                 content_type: str = "application/http; msgtype=response",
                 extra_headers: dict[str, str] | None = None) -> bytes:
    """One WARC record, byte-deterministic (record id derives from
    (url, seq), never from a clock or RNG)."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", _det_record_id(url, seq)),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", content_type),
        ("Content-Length", str(len(block))),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = b"WARC/1.1\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers) + _CRLF
    return head + block + _CRLF + _CRLF


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records into one archive. ``gzip_per_record=True``
    emits one gzip member per record (the CommonCrawl layout: members
    concatenate into a valid multi-member gzip stream, and a reader can
    seek to any member independently)."""
    if not gzip_per_record:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        # mtime pinned for byte-determinism
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> tuple[bytes, str | None]:
    """Decompress a (possibly multi-member) gzip stream. Returns the
    bytes of every member that decoded plus an error message if a
    member was corrupt/truncated — the good prefix still parses."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error as e:
            return b"".join(out), f"gzip member decode failed: {e}"
        if not d.eof:
            return b"".join(out), "truncated gzip member"
        data = d.unused_data
    return b"".join(out), None


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per record: {offset, warc_type, url, warc_date,
    warc_headers, http_status, content_type, payload, error}. Gzip input
    (single- or multi-member) is detected by magic. A malformed record
    yields a row with ``error`` set and parsing resynchronizes at the
    next version line, so one corrupt record never loses the archive; a
    corrupt gzip member yields the decodable prefix plus one error row."""
    gzip_err = None
    if data[:2] == b"\x1f\x8b":
        data, gzip_err = _gunzip_members(data)
    yield from _parse_plain(data)
    if gzip_err is not None:
        yield _err(len(data), gzip_err)


def _parse_plain(data: bytes) -> Iterator[dict]:
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            yield _err(pos, "truncated version line")
            return
        version = data[pos:eol]
        if version not in _VERSIONS:
            yield _err(pos, f"bad version line {version[:20]!r}")
            nxt = _resync(data, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", eol)
        if hdr_end < 0:
            yield _err(pos, "unterminated header block")
            return
        headers: dict[str, str] = {}
        ok = True
        for line in data[eol + 2:hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b":")
            if not sep:
                yield _err(pos, f"malformed header line {line[:40]!r}")
                ok = False
                break
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1"))
        if not ok:
            nxt = _resync(data, hdr_end)
            if nxt < 0:
                return
            pos = nxt
            continue
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            yield _err(pos, "missing/invalid Content-Length")
            nxt = _resync(data, hdr_end)
            if nxt < 0:
                return
            pos = nxt
            continue
        block_start = hdr_end + 4
        block = data[block_start:block_start + clen]
        if len(block) < clen:
            yield _err(pos, "truncated block")
            return
        rec = {
            "offset": pos,
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date", ""),
            "warc_headers": headers,
            "http_status": None,
            "content_type": headers.get("content-type", ""),
            "payload": block,
            "error": None,
        }
        ctype = rec["content_type"].lower()
        if ctype.startswith("application/http"):
            status, http_ctype, payload = _split_http(block)
            rec["http_status"] = status
            if http_ctype is not None:
                rec["content_type"] = http_ctype
            rec["payload"] = payload
        yield rec
        pos = block_start + clen


def _err(offset: int, msg: str) -> dict:
    return {"offset": offset, "warc_type": None, "url": None,
            "warc_date": None, "warc_headers": {}, "http_status": None,
            "content_type": None, "payload": None, "error": msg}


def _resync(data: bytes, pos: int) -> int:
    cands = [i for i in (data.find(b"\r\nWARC/1.0\r\n", pos),
                         data.find(b"\r\nWARC/1.1\r\n", pos)) if i >= 0]
    return min(cands) + 2 if cands else -1


def _split_http(block: bytes):
    """(status, content_type, body) from an HTTP message block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head = block[:sep].split(b"\r\n")
    status = None
    parts = head[0].split(b" ", 2) if head else []
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    ctype = None
    for line in head[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, block[sep + 4:]


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

WARC_READ_SCHEMA = ("warc_file string, record_no int, offset long, "
                    "warc_type string, url string, warc_date string, "
                    "http_status int, content_type string, "
                    "payload binary, error string")


def read_warc(spark, path: str, types: tuple[str, ...] | None = None):
    """DataFrame over WARC archive(s): one row per record. ``types``
    restricts to given WARC-Types (e.g. ('response',)) inside the
    parser, before anything crosses back to the JVM. One task per
    archive file — the only parallelism gzip WARCs admit — so throughput
    scales with the file count, the normal CommonCrawl shape."""
    import pandas as pd

    bf = spark.read.format("binaryFile").load(path)

    def gen(batches):
        cols = ["warc_file", "record_no", "offset", "warc_type", "url",
                "warc_date", "http_status", "content_type", "payload",
                "error"]
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for i, rec in enumerate(parse_warc(bytes(content))):
                    if (types and rec["error"] is None
                            and rec["warc_type"] not in types):
                        continue
                    rows.append({
                        "warc_file": fpath, "record_no": i,
                        "offset": rec["offset"],
                        "warc_type": rec["warc_type"],
                        "url": rec["url"],
                        "warc_date": rec["warc_date"],
                        "http_status": rec["http_status"],
                        "content_type": rec["content_type"],
                        "payload": rec["payload"],
                        "error": rec["error"],
                    })
                yield pd.DataFrame(rows, columns=cols)

    return bf.select("path", "content").mapInPandas(gen, WARC_READ_SCHEMA)


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records — the CommonCrawl .warc.wet shape)
# ---------------------------------------------------------------------------

def build_conversion_record(url: str, text: str, seq: int = 0,
                            date: str = "2026-01-01T00:00:00Z") -> bytes:
    """One WET ``conversion`` record: plain extracted text as block."""
    return build_record("conversion", url, text.encode("utf-8"),
                        date=date, seq=seq, content_type="text/plain")


def write_wet(df, out_dir: str, url_col: str = "url",
              text_col: str = "text") -> None:
    """Write (url, text) rows as gzip WET archives, ONE FILE PER
    PARTITION — the CommonCrawl layout, and the only write shape a
    non-splittable format admits. Each executor streams its partition
    through one file handle, one gzip member per record: constant
    memory regardless of partition size. ``out_dir`` must be a
    filesystem every executor mounts (local dir in local mode, shared
    FS on a cluster)."""
    import gzip as _gz
    import os

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)

    def _write(rows):
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        f = None
        for i, row in enumerate(rows):
            if f is None:
                f = open(path, "wb")
            rec = build_conversion_record(row[url_col],
                                          row[text_col] or "", seq=i)
            with _gz.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                gz.write(rec)
        if f is not None:
            f.close()

    df.select(url_col, text_col).foreachPartition(_write)


def read_wet(spark, path: str):
    """DataFrame over WET archives: the ``conversion`` records, with the
    payload decoded to a ``text`` column."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, types=("conversion",))
    return recs.select(
        "warc_file", "record_no", "url",
        F.col("payload").cast("string").alias("text"), "error")
