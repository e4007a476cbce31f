"""Pure-stdlib media codecs: PNG (zlib + struct, RFC 2083) and WAV (wave).

The container has no PIL/librosa/av, but PNG is just zlib-compressed
filtered scanlines and WAV is a stdlib module — so the multimodal
``use_real_codecs`` path can be REAL for these two formats instead of a
library gate (video stays gated: there is no stdlib video codec).

Correctness-first decoders: small hot loops run per pixel in Python where
the PNG filter recurrences are sequential (Sub/Paeth depend on the previous
pixel). Fine for the Arrow-batched island at test scale; swap the inner
loop for PIL when available — the chunk parsing and API stay identical.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3|4) uint8 array -> PNG bytes (8-bit,
    filter 0 scanlines, single IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Supports 8-bit depth,
    color types 0/2/4/6, no interlacing; all five scanline filters; CRC
    verified per chunk."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f, line = row[0], bytearray(row[1:])
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out.reshape(h, w, ch)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave module)."""
    s = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 (n,) or (n, channels), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        arr = np.frombuffer(f.readframes(n), dtype=np.int16)
    return (arr.reshape(-1, ch) if ch > 1 else arr), rate
