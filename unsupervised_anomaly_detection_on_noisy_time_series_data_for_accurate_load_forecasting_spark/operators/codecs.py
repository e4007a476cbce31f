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


# ---------------------------------------------------------------------------
# AVI / Microsoft RLE8 (BI_RLE8) — the pure-stdlib VIDEO codec.
#
# The reference's video frame decode (src/… multimodal contract mirrored by
# operators/multimodal.frame_sample) needs a real container + compressed
# frame path without av/ffmpeg. AVI is RIFF chunk structure (struct), and
# MS-RLE8 is a real video compression codec (the 'mrle' handler Windows
# shipped for decades): per-row run-length coding over 8-bit palette
# indices with escape codes — encoded runs, word-aligned absolute
# (literal) mode, end-of-line, end-of-bitmap, and cursor deltas — stored
# BOTTOM-UP like any DIB. Same trick as the GIF LZW codec: the container
# walk and the bit-level codec are both real, so an encode→decode round
# trip puts genuine codec algebra on trial.
# ---------------------------------------------------------------------------


def _rle8_encode_row(row: bytes) -> bytearray:
    """One scanline -> MS-RLE8 opcodes: encoded runs (count, index) for
    repeats, absolute mode (00, count, bytes, pad-to-word) for literal
    stretches ≥ 3 — the same mode split real encoders make, so decode
    exercises both paths."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j < n and j - i < 255 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out += bytes((run, row[i]))
            i = j
            continue
        k = i
        while k < n and k - i < 255:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        lit = k - i
        if lit >= 3:
            out += bytes((0, lit)) + row[i:k]
            if lit % 2:
                out.append(0)  # absolute mode is word-aligned
        else:
            for b in row[i:k]:
                out += bytes((1, b))
        i = k
    return out


def _rle8_encode_frame(idx: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices -> RLE8 stream, rows bottom-up, EOL
    after each row, EOB terminating the bitmap."""
    h, _w = idx.shape
    out = bytearray()
    for y in range(h - 1, -1, -1):
        out += _rle8_encode_row(idx[y].tobytes())
        out += b"\x00\x00"  # end of line
    out[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
    return bytes(out)


def _rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """MS-RLE8 stream -> (h, w) uint8 indices. Handles encoded runs,
    absolute mode (with word padding), EOL, EOB, and delta skips; rows are
    bottom-up in the stream."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts from the BOTTOM row
    i, n = 0, len(data)
    while i + 1 < n or (i < n and False):
        if i + 1 >= n:
            break
        b0, b1 = data[i], data[i + 1]
        i += 2
        if b0 > 0:  # encoded run
            if y >= h or x + b0 > w:
                raise ValueError("RLE8 run overflows the bitmap")
            out[h - 1 - y, x : x + b0] = b1
            x += b0
        elif b1 == 0:  # end of line
            x, y = 0, y + 1
        elif b1 == 1:  # end of bitmap
            return out
        elif b1 == 2:  # delta: skip right/up
            if i + 1 >= n:
                raise ValueError("truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: b1 literal indices, word-aligned
            cnt = b1
            if y >= h or x + cnt > w or i + cnt > n:
                raise ValueError("RLE8 absolute run overflows")
            out[h - 1 - y, x : x + cnt] = np.frombuffer(
                data[i : i + cnt], dtype=np.uint8
            )
            x += cnt
            i += cnt + (cnt % 2)
    raise ValueError("RLE8 stream ended without end-of-bitmap")


def _ck(tag: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + body + even padding."""
    return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def encode_avi_rle8(frames: np.ndarray | list[np.ndarray], fps: int = 10) -> bytes:
    """(h, w) uint8 grayscale frame(s) -> AVI bytes: RIFF('AVI ') with a
    real hdrl (avih + strl/strh 'mrle' + strf BITMAPINFOHEADER + 256-entry
    grayscale palette), a movi LIST of '00dc' RLE8-compressed frame chunks,
    and an idx1 keyframe index."""
    fs = np.asarray(frames, dtype=np.uint8)
    if fs.ndim == 2:
        fs = fs[None]
    if fs.ndim != 3:
        raise ValueError("encode_avi_rle8 expects (h, w) or (n, h, w) uint8")
    n, h, w = fs.shape
    comp = [_rle8_encode_frame(f) for f in fs]
    bufsz = max(len(c) for c in comp)

    bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, bufsz, 0, 0, 256, 0)
    pal = b"".join(bytes((v, v, v, 0)) for v in range(256))  # BGR0 grayscale
    strf = _ck(b"strf", bih + pal)
    strh = _ck(
        b"strh",
        b"vids"
        + b"mrle"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, bufsz, 10000, 0)
        + struct.pack("<4H", 0, 0, w, h),
    )
    strl = _ck(b"LIST", b"strl" + strh + strf)
    avih = _ck(
        b"avih",
        struct.pack(
            "<IIIIIIIIIIIIII",
            1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
            bufsz * fps,  # dwMaxBytesPerSec
            0,  # dwPaddingGranularity
            0x10,  # AVIF_HASINDEX
            n, 0, 1, bufsz, w, h, 0, 0, 0, 0,
        ),
    )
    hdrl = _ck(b"LIST", b"hdrl" + avih + strl)

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for c in comp:
        # idx1 offsets point at the ckid, relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, len(movi_body), len(c))
        movi_body += _ck(b"00dc", c)
    movi = _ck(b"LIST", bytes(movi_body))
    idx1 = _ck(b"idx1", bytes(idx))
    return _ck(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _riff_children(buf: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_end) over a RIFF chunk sequence."""
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("RIFF chunk overruns its parent")
        yield tag, body, body + size
        pos = body + size + (size % 2)


def decode_avi_frames(data: bytes) -> np.ndarray:
    """AVI bytes -> uint8 (n_frames, h, w, 3): walks the RIFF tree, reads
    BITMAPINFOHEADER + palette from strf, and decodes every video frame
    chunk in the movi LIST. Supports BI_RLE8 ('mrle') and uncompressed
    8-bit BI_RGB (padded bottom-up rows; negative biHeight = top-down)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    w = h = None
    compression = None
    pal = None
    top_down = False
    chunks: list[bytes] = []

    def _parse_strl(buf, pos, end):
        nonlocal w, h, compression, pal, top_down
        for tag, b, e in _riff_children(buf, pos, end):
            if tag == b"strf" and compression is None:
                (_bisz, bw, bh, _pl, bitcnt, comp_, _szi, _xp, _yp, used, _imp) = (
                    struct.unpack("<IiiHHIIiiII", buf[b : b + 40])
                )
                if bitcnt != 8:
                    raise ValueError(f"unsupported AVI bit depth {bitcnt}")
                w, h, compression = bw, abs(bh), comp_
                top_down = bh < 0
                n_pal = used or 256
                raw = buf[b + 40 : b + 40 + 4 * n_pal]
                p = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)
                pal = p[:, [2, 1, 0]].copy()  # BGR0 -> RGB

    for tag, b, e in _riff_children(data, 12, len(data)):
        if tag == b"LIST":
            four = data[b : b + 4]
            if four == b"hdrl":
                for t2, b2, e2 in _riff_children(data, b + 4, e):
                    if t2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        _parse_strl(data, b2 + 4, e2)
            elif four == b"movi":
                for t2, b2, e2 in _riff_children(data, b + 4, e):
                    if t2[2:4] in (b"dc", b"db"):
                        chunks.append(data[b2:e2])
    if w is None or pal is None:
        raise ValueError("AVI has no 8-bit video stream header")
    if not chunks:
        raise ValueError("AVI contains no video frames")
    frames = []
    for c in chunks:
        if compression == 1:  # BI_RLE8
            idx = _rle8_decode(c, w, h)
        elif compression == 0:  # BI_RGB, 8-bit, rows padded to 4 bytes
            stride = (w + 3) & ~3
            if len(c) < stride * h:
                raise ValueError("uncompressed AVI frame truncated")
            rows = np.frombuffer(c[: stride * h], dtype=np.uint8).reshape(h, stride)
            idx = rows[:, :w] if top_down else rows[::-1, :w]
        else:
            raise ValueError(f"unsupported AVI compression {compression}")
        if compression == 1 and top_down:
            idx = idx[::-1]
        frames.append(pal[idx])
    return np.stack(frames)
