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
  are parsed off the payload; ``Transfer-Encoding: chunked`` payloads
  (non-Common-Crawl archives — CC re-frames to Content-Length) are
  de-chunked, and a malformed chunk stream degrades to the RAW http
  body bytes with ``http_status`` still parsed (crawl archives carry
  protocol garbage; the record itself is still valid);
- other record types (request, warcinfo, metadata, resource, revisit)
  pass through with their payload and empty HTTP fields.

Execution shape: the Spark surface (:func:`read_warc`) is a
``mapInPandas`` fan-out over ``binaryFile`` rows — one archive decoded
at a time per batch, typed output, zero shuffle; the only Python in the
plan is the container parse itself, exactly like the image/audio/video
codecs in ``sources/codecs.py``. At 100 TB the parallelism unit is the
archive file (Common Crawl segments are ~1 GB), which is what
``binaryFile`` partitions by.

Cost shape (a ~1 GB segment has tens of thousands of records, so
per-record asymptotics matter): gzip members decode from a
``memoryview`` in bounded feed chunks (never ``data[pos:]`` — that
slice copies the remaining buffer per member, O(n·records) total
memcpy), records frame incrementally out of a reusable buffer whose
consumed prefix is discarded once per member, and :func:`read_warc`
yields rows in bounded batches as records stream out of the parse —
peak task memory is the compressed blob plus ONE record, not
compressed + fully-decompressed + a Python list of every record.
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


#: bounded feed size for incremental gzip decode: caps the copy zlib's
#: ``unused_data`` makes at a member boundary (the whole point of not
#: handing the decompressor ``data[pos:]``)
_GZ_FEED = 1 << 20


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decode concatenated gzip members one at a time, O(total bytes):
    the compressed buffer is wrapped in a ``memoryview`` and fed to each
    member's decompressor in :data:`_GZ_FEED`-bounded chunks, so the
    per-member copy is the member's own output plus at most one feed
    chunk of ``unused_data`` — never the remaining archive (a ~1 GB
    Common Crawl segment has tens of thousands of members; slicing
    ``data[pos:]`` per member is terabytes of memcpy)."""
    mv = memoryview(data)
    n = len(mv)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        fed = pos
        while not d.eof:
            if fed >= n:
                raise ValueError(f"truncated gzip member at byte {pos}")
            piece = mv[fed : fed + _GZ_FEED]
            try:
                out.append(d.decompress(piece))
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt gzip member at byte {pos}: {exc}"
                ) from exc
            fed += len(piece)
        consumed = fed - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at byte {pos} consumed no input")
        pos += consumed
        yield b"".join(out)


def _dechunk(body: bytes) -> bytes | None:
    """Decode a ``Transfer-Encoding: chunked`` payload (RFC 9112 §7.1):
    hex-size line (chunk extensions after ``;`` ignored) → data →
    CRLF, terminated by a zero-size chunk (trailer section ignored).
    Returns ``None`` on any framing violation — the caller degrades to
    the raw bytes rather than dropping the record."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are metadata, not body
        if pos + size + 2 > n or body[pos + size : pos + size + 2] != _CRLF:
            return None
        out += body[pos : pos + size]
        pos += size + 2


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) off an archived HTTP/1.x message —
    headers are latin-1 per RFC 9112; an unparseable message returns
    ``(None, None, payload)`` rather than raising (crawl archives carry
    plenty of protocol garbage; the record itself is still valid).
    ``Transfer-Encoding: chunked`` bodies are de-chunked; a malformed
    chunk stream degrades to the raw body bytes, same policy."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5].startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].decode("latin-1", errors="replace").split("\r\n")
    try:
        status = int(head[0].split(None, 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    chunked = False
    for line in head[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "content-type" and ctype is None:
            ctype = v.strip()
        elif key == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
    body = payload[sep + 4 :]
    if chunked:
        decoded = _dechunk(body)
        if decoded is not None:
            body = decoded
    return status, ctype, body


def _record_from(headers: dict[str, str], payload: bytes, length: int) -> dict:
    rtype = headers.get("warc-type", "")
    status = ctype = None
    body = payload
    if rtype == "response":
        status, ctype, body = _parse_http(payload)
    return {
        "type": rtype,
        "uri": headers.get("warc-target-uri"),
        "date": headers.get("warc-date"),
        "record_id": headers.get("warc-record-id"),
        "content_length": length,
        "http_status": status,
        "http_content_type": ctype,
        "body": body,
    }


def _frame_records(chunks: Iterator[bytes]) -> Iterator[dict]:
    """Incrementally frame WARC records out of a chunk iterator (one
    chunk per gzip member, or the whole plain archive). A record parses
    as soon as its header + declared payload are buffered; the consumed
    prefix is discarded once per chunk, so total work is O(bytes), not
    O(bytes x records). Raises on non-WARC input and framing violations
    — a truncated archive must fail loudly, not yield half a corpus
    silently."""
    buf = bytearray()
    off = 0
    any_record = False

    def _avail(final: bool) -> Iterator[dict]:
        nonlocal off, any_record
        while True:
            # two CRLFs terminate a record (spec §4); tolerate exactly
            # them between records and as archive trailers — but leading
            # separator bytes before the FIRST record are not a WARC
            if any_record:
                while buf[off : off + 2] == _CRLF:
                    off += 2
            avail = len(buf) - off
            if avail == 0:
                return
            if avail < 5:
                if final:
                    raise ValueError(
                        f"bad record framing at byte {off} (trailing garbage)"
                    )
                return  # a partial version line may complete next chunk
            if bytes(buf[off : off + 5]) != b"WARC/":
                if not any_record:
                    raise ValueError("not a WARC (missing WARC/ version line)")
                raise ValueError(f"bad record framing at byte {off}")
            hdr_end = buf.find(b"\r\n\r\n", off)
            if hdr_end < 0:
                if final:
                    raise ValueError(f"truncated record header at byte {off}")
                return
            headers: dict[str, str] = {}
            lines = bytes(buf[off:hdr_end]).decode(
                "utf-8", errors="replace"
            ).split("\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    f"record at byte {off} carries no valid Content-Length"
                ) from None
            body_at = hdr_end + 4
            if body_at + length > len(buf):
                if final:
                    raise ValueError(
                        f"record at byte {off} declares {length} payload "
                        f"bytes but only {len(buf) - body_at} remain "
                        "(truncated archive)"
                    )
                return
            payload = bytes(buf[body_at : body_at + length])
            yield _record_from(headers, payload, length)
            any_record = True
            off = body_at + length

    for chunk in chunks:
        buf += chunk
        yield from _avail(False)
        if off:
            del buf[:off]
            off = 0
    yield from _avail(True)
    if not any_record:
        raise ValueError("not a WARC (missing WARC/ version line)")


def warc_parse_iter(data: bytes) -> Iterator[dict]:
    """Parse WARC bytes (plain or gzip-membered) into record dicts,
    INCREMENTALLY: ``type``, ``uri``, ``date``, ``record_id``,
    ``content_length`` (declared payload length), and for ``response``
    records the parsed ``http_status`` / ``http_content_type`` /
    ``body`` (other types carry their raw payload as ``body`` with the
    HTTP fields None). Records stream out as they frame — in the
    Common Crawl per-record-gzip layout each member is one record, so
    peak memory is one record, never the decompressed archive. Raises
    on non-WARC input and on framing violations."""
    if data[:2] == b"\x1f\x8b":
        return _frame_records(_split_gzip_members(data))
    return _frame_records(iter((data,)))


def warc_parse(data: bytes) -> list[dict]:
    """:func:`warc_parse_iter`, materialized — the convenience face for
    fixtures and tests; the Spark path (:func:`read_warc`) consumes the
    iterator directly so large archives never sit in a Python list."""
    return list(warc_parse_iter(data))


#: output schema of :func:`read_warc`
WARC_SCHEMA = (
    "path string, record_type string, uri string, date string, "
    "record_id string, content_length bigint, http_status int, "
    "http_content_type string, body binary"
)


#: rows per Arrow batch out of :func:`read_warc` — bounds task memory to
#: the compressed blob plus this many parsed records, instead of every
#: record of the archive in one Python list
_READ_WARC_BATCH_ROWS = 1024

_WARC_COLUMNS = [
    "path", "record_type", "uri", "date", "record_id",
    "content_length", "http_status", "http_content_type", "body",
]


def read_warc(df, *, path_col: str = "path", content_col: str = "content"):
    """Spark surface: a ``binaryFile``-shaped DataFrame (``path``,
    ``content``) → one typed row per WARC record. ``mapInPandas``
    fan-out, one archive decoded at a time per batch, zero shuffle —
    the archive FILE is the parallelism unit, exactly how Common Crawl
    segments shard a crawl. Records stream out of
    :func:`warc_parse_iter` and flush every
    :data:`_READ_WARC_BATCH_ROWS` rows, so a ~1 GB segment's records
    never all sit in task memory at once."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        rows: list[tuple] = []
        for pdf in batches:
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                for r in warc_parse_iter(bytes(blob)):
                    rows.append(
                        (
                            path, r["type"], r["uri"], r["date"],
                            r["record_id"], r["content_length"],
                            r["http_status"], r["http_content_type"],
                            r["body"],
                        )
                    )
                    if len(rows) >= _READ_WARC_BATCH_ROWS:
                        yield pd.DataFrame(rows, columns=_WARC_COLUMNS)
                        rows = []
        # always emit one (possibly empty) frame so an empty partition
        # still carries the schema
        yield pd.DataFrame(rows, columns=_WARC_COLUMNS)

    return df.mapInPandas(parse, schema=WARC_SCHEMA)
