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


# ---------------------------------------------------------------------------
# GIF (87a/89a): pure-stdlib LZW — the third real codec next to PNG/WAV,
# and the only stdlib-expressible MULTI-FRAME format (animation = repeated
# image descriptors), so the frame-sampling contract can be real too.
# ---------------------------------------------------------------------------

_GIF_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF spec)


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable-width codes (LSB-first bit packing),
    clear/EOI codes, table reset at the 12-bit ceiling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    s = b""
    for byte in data:
        t = s + bytes([byte])
        if t in table:
            s = t
            continue
        emit(table[s], width)
        if next_code < _GIF_MAX_CODE:
            table[t] = next_code
            next_code += 1
            # The decoder adds NO entry for the first code after a clear, so
            # its table trails this counter by one — bump the code width one
            # entry later than next_code == 2^width to stay in lockstep.
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: reset both sides
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([byte])
    if s:
        emit(table[s], width)
    emit(eoi, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_encode`; also accepts deferred-clear streams
    (codes after a full table without a reset)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    cur = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # missing EOI: tolerate truncation at end
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << width) - 1)
        cur >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < _GIF_MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_GIF_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


def encode_gif(frames: np.ndarray | list[np.ndarray]) -> bytes:
    """(h, w) uint8 grayscale frame — or a list/stack of same-shape frames
    (animation) — -> GIF89a bytes: one 256-entry grayscale global color
    table, one LZW-compressed image block per frame, no interlace."""
    fs = [np.asarray(f, dtype=np.uint8) for f in (
        frames if isinstance(frames, (list, tuple)) else [frames]
    )]
    if not fs or any(f.ndim != 2 for f in fs):
        raise ValueError("encode_gif expects one or more (h, w) uint8 frames")
    h, w = fs[0].shape
    if any(f.shape != (h, w) for f in fs):
        raise ValueError("all GIF frames must share one shape")
    out = bytearray(b"GIF89a")
    # logical screen: global color table flag, 8-bit color res, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _GIF_GRAY_PALETTE
    for f in fs:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
        out.append(8)  # LZW minimum code size
        comp = _lzw_encode(f.tobytes(), 8)
        for i in range(0, len(comp), 255):
            block = comp[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif_frames(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 array (n_frames, h, w, 3). Full-frame images on
    the logical screen (no partial-frame composition), global and per-image
    local color tables, interlace supported; extensions skipped."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        global_pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("partial-frame GIF composition not supported")
        min_code = data[pos]
        pos += 1
        comp = bytearray()
        while data[pos]:
            n = data[pos]
            comp += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(_lzw_decode(bytes(comp), min_code), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows written in 4 passes
            order = [*range(0, h, 8), *range(4, h, 8), *range(2, h, 4), *range(1, h, 2)]
            de = np.empty_like(idx)
            de[order] = idx[: len(order)]
            idx = de
        frames.append(pal[idx])
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return np.stack(frames)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first frame as uint8 (h, w, 3)."""
    return decode_gif_frames(data)[0]
