"""WARC (Web ARChive, ISO 28500) ingestion — the format web-scale
training corpora actually arrive in (Common Crawl publishes WARC).

Not in the reference (SURVEY.md §2.11 extension surface): a 100 TB
text-corpus pipeline's FIRST operator is "turn crawl archives into a
documents table", and that is a record-framed container parse, not a
line format Spark reads natively. Scope (documented, raised on
violation):

- WARC/1.0 and WARC/1.1 records: named headers, ``Content-Length``
  framing, ``\\r\\n\\r\\n`` terminators;
- both physical layouts Common Crawl ships: PLAIN concatenated records
  and PER-RECORD GZIP MEMBERS (the spec's recommended compression —
  each record its own gzip stream, so a member is independently
  seekable; a whole-file gzip also decodes, it is simply one member);
- ``response`` records carry an HTTP/1.x message: status line + headers
  are parsed off the payload (Content-Length framing only — chunked
  transfer-encoding inside an archived response is out of scope and
  yields the RAW http body bytes with ``http_status`` still parsed);
- other record types (request, warcinfo, metadata, resource, revisit)
  pass through with their payload and empty HTTP fields.

Execution shape: the Spark surface (:func:`read_warc`) is a
``mapInPandas`` fan-out over ``binaryFile`` rows — one archive decoded
at a time per batch, typed output, zero shuffle; the only Python in the
plan is the container parse itself, exactly like the image/audio/video
codecs in ``sources/codecs.py``. At 100 TB the parallelism unit is the
archive file (Common Crawl segments are ~1 GB), which is what
``binaryFile`` partitions by.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

_CRLF = b"\r\n"


def warc_encode(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Fixture generator: serialize records as a spec-conformant WARC.

    Each record dict: ``type`` (e.g. ``"response"``), ``uri``, ``date``
    (ISO-8601 string), ``payload`` (bytes), optional ``record_id`` and
    ``extra_headers`` (dict). ``gzip_members=True`` emits one gzip
    member per record (the Common Crawl layout). Deterministic given
    its inputs — record ids default to a counter, and gzip members are
    written with mtime=0 so identical inputs give identical bytes."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        head = bytearray()
        head += b"WARC/1.0" + _CRLF
        head += b"WARC-Type: " + rec["type"].encode() + _CRLF
        head += (
            b"WARC-Record-ID: <urn:uuid:"
            + rec.get("record_id", f"fixture-{i:08d}").encode()
            + b">" + _CRLF
        )
        head += b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode() + _CRLF
        if rec.get("uri"):
            head += b"WARC-Target-URI: " + rec["uri"].encode() + _CRLF
        for k, v in (rec.get("extra_headers") or {}).items():
            head += k.encode() + b": " + str(v).encode() + _CRLF
        head += b"Content-Length: " + str(len(payload)).encode() + _CRLF
        head += _CRLF
        body = bytes(head) + payload + _CRLF + _CRLF
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(body)
            out += buf.getvalue()
        else:
            out += body
    return bytes(out)


def http_response(
    body: bytes,
    *,
    status: int = 200,
    content_type: str = "text/html",
    extra_headers: dict | None = None,
) -> bytes:
    """An HTTP/1.1 response message for a fixture ``response`` record."""
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    )
    for k, v in (extra_headers or {}).items():
        head += f"{k}: {v}\r\n"
    return head.encode() + _CRLF + body


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decode concatenated gzip members one at a time (zlib exposes
    ``unused_data`` after each member — no dependence on member sizes)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member at byte {pos}: {exc}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at byte {pos} consumed no input")
        pos += consumed


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) off an archived HTTP/1.x message —
    headers are latin-1 per RFC 9112; an unparseable message returns
    ``(None, None, payload)`` rather than raising (crawl archives carry
    plenty of protocol garbage; the record itself is still valid)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5].startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].decode("latin-1", errors="replace").split("\r\n")
    try:
        status = int(head[0].split(None, 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[sep + 4 :]


def warc_parse(data: bytes) -> list[dict]:
    """Parse WARC bytes (plain or gzip-membered) into record dicts:
    ``type``, ``uri``, ``date``, ``record_id``, ``content_length``
    (declared payload length), and for ``response`` records the parsed
    ``http_status`` / ``http_content_type`` / ``body`` (other types
    carry their raw payload as ``body`` with the HTTP fields None).
    Raises on non-WARC input and on framing violations — a truncated
    archive must fail loudly, not yield half a corpus silently."""
    if data[:2] == b"\x1f\x8b":
        chunks = b"".join(_split_gzip_members(data))
    else:
        chunks = data
    if not chunks.startswith(b"WARC/"):
        raise ValueError("not a WARC (missing WARC/ version line)")
    records: list[dict] = []
    pos = 0
    n = len(chunks)
    while pos < n:
        if chunks[pos:].strip(b"\r\n") == b"":
            break  # trailing record separators
        if not chunks[pos : pos + 5] == b"WARC/":
            raise ValueError(f"bad record framing at byte {pos}")
        hdr_end = chunks.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(f"truncated record header at byte {pos}")
        headers: dict[str, str] = {}
        lines = chunks[pos:hdr_end].decode("utf-8", errors="replace").split("\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"record at byte {pos} carries no valid Content-Length"
            ) from None
        body_at = hdr_end + 4
        if body_at + length > n:
            raise ValueError(
                f"record at byte {pos} declares {length} payload bytes "
                f"but only {n - body_at} remain (truncated archive)"
            )
        payload = chunks[body_at : body_at + length]
        rtype = headers.get("warc-type", "")
        status = ctype = None
        body = payload
        if rtype == "response":
            status, ctype, body = _parse_http(payload)
        records.append(
            {
                "type": rtype,
                "uri": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
                "content_length": length,
                "http_status": status,
                "http_content_type": ctype,
                "body": body,
            }
        )
        pos = body_at + length
        # two CRLFs terminate a record (spec §4); tolerate exactly them
        while chunks[pos : pos + 2] == _CRLF:
            pos += 2
    return records


#: output schema of :func:`read_warc`
WARC_SCHEMA = (
    "path string, record_type string, uri string, date string, "
    "record_id string, content_length bigint, http_status int, "
    "http_content_type string, body binary"
)


def read_warc(df, *, path_col: str = "path", content_col: str = "content"):
    """Spark surface: a ``binaryFile``-shaped DataFrame (``path``,
    ``content``) → one typed row per WARC record. ``mapInPandas``
    fan-out, one archive decoded at a time per batch, zero shuffle —
    the archive FILE is the parallelism unit, exactly how Common Crawl
    segments shard a crawl."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                for r in warc_parse(bytes(blob)):
                    rows.append(
                        (
                            path, r["type"], r["uri"], r["date"],
                            r["record_id"], r["content_length"],
                            r["http_status"], r["http_content_type"],
                            r["body"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_type", "uri", "date", "record_id",
                    "content_length", "http_status", "http_content_type",
                    "body",
                ],
            )

    return df.mapInPandas(parse, schema=WARC_SCHEMA)
