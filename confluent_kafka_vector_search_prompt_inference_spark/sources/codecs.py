"""Stdlib-only media codecs: PNG (zlib + NumPy unfiltering) and WAV PCM.

The container ships no Pillow/librosa, but PNG's format is just zlib
over per-scanline delta filters, and WAV PCM is a RIFF header over raw
int16 — both decodable with the standard library. These codecs back the
REAL multimodal decode path (``sources/multimodal.py``): bytes → pixel
array → features, end-to-end, no fakes.

Scope (documented, checked, raised on violation):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced. All five scanline filters (None/Sub/Up/
  Average/Paeth) decode; the encoder can emit any of them (used by
  tests to exercise every unfilter path).
- WAV: PCM 16-bit, any channel count / sample rate.

Performance shape: decode cost is per-blob Python+NumPy inside an
``mapInPandas`` batch — the codec boundary is the only Python in the
pipeline, identical to how a Pillow-backed decode would sit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, *, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode an ``(H, W)`` or ``(H, W, C)`` uint8 array as a PNG.

    ``filter_type`` applies one scanline filter uniformly (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — byte-identical output for identical
    pixels, and a handle for tests to exercise every decoder path."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError(f"png_encode expects uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError(f"png_encode expects (H, W[, C]) array, got shape {a.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    if filter_type not in range(5):
        raise ValueError(f"unknown filter type {filter_type}")

    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int32)
    for y in range(h):
        line = a[y].astype(np.int32)  # (w, c)
        left = np.zeros_like(line)
        left[1:] = line[:-1]
        upleft = np.zeros_like(line)
        upleft[1:] = prev[:-1]
        if filter_type == 0:
            out = line
        elif filter_type == 1:
            out = line - left
        elif filter_type == 2:
            out = line - prev
        elif filter_type == 3:
            out = line - (left + prev) // 2
        else:  # Paeth
            out = line - _paeth(left, prev, upleft)
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    p = left + up - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to an ``(H, W, C)`` uint8 array (C per color type)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type} (palette PNGs not supported)")
    if interlace != 0:
        raise ValueError("interlaced PNGs not supported")
    c = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, w, c), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorized over the scanline
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth have an in-scanline dependency on the
            # pixel c bytes to the left → sequential in x, vectorized
            # across channels.
            cur = np.empty(stride, dtype=np.int32)
            for x in range(0, stride, c):
                left = cur[x - c : x] if x >= c else np.zeros(c, dtype=np.int32)
                up = prev[x : x + c]
                upleft = prev[x - c : x] if x >= c else np.zeros(c, dtype=np.int32)
                seg = line[x : x + c]
                if ftype == 1:
                    cur[x : x + c] = (seg + left) % 256
                elif ftype == 3:
                    cur[x : x + c] = (seg + (left + up) // 2) % 256
                else:
                    cur[x : x + c] = (seg + _paeth(left, up, upleft)) % 256
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8).reshape(w, c)
        prev = cur
    return out


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an ``(H, W[, C])`` array — pure
    integer index math, deterministic on every platform."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return a[ys][:, xs]


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an ``(n,)`` or ``(n, channels)`` int16 array as PCM WAV."""
    import io
    import wave

    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"wav_encode expects int16 samples, got {a.dtype}")
    nch = 1 if a.ndim == 1 else a.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes → ``((n, channels) int16 array, sample_rate)``."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {f.getsampwidth() * 8}-bit")
        nch = f.getnchannels()
        frames = f.readframes(f.getnframes())
        rate = f.getframerate()
    a = np.frombuffer(frames, dtype=np.int16).reshape(-1, nch)
    return a, rate
