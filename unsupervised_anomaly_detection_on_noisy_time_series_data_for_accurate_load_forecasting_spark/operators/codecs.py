"""Pure-stdlib media codecs: PNG (zlib + struct, RFC 2083), WAV (wave),
GIF (LZW), AVI/MS-RLE8 (RIFF), and baseline JPEG (ITU-T T.81 huffman+DCT).

The container has no PIL/librosa/av, but each of these formats decomposes
into stdlib + numpy primitives — so the multimodal ``use_real_codecs``
path can be REAL for all of them instead of a library gate (general video
stays gated: there is no stdlib inter-frame video codec).

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


# --------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81), pure stdlib + numpy.
#
# The most common crawl image format. Encoder: grayscale or RGB (YCbCr,
# 4:4:4 or 4:2:0 chroma subsampling), Annex-K quantization/Huffman tables
# with libjpeg-style quality scaling. Decoder: baseline DHT/DQT/SOF0/SOS
# with arbitrary per-component sampling factors (box upsampling), DRI/RSTn
# restart markers, byte-unstuffing. DCT/IDCT are 8x8 matrix products
# applied to ALL blocks of a component at once (numpy einsum) — the only
# per-symbol Python loop is the Huffman coder, which is bounded by the
# entropy stream length.
#
# Exactness property used by the driver-verified oracle query: an image
# that is CONSTANT within each 8x8 block with even sample values round-
# trips bit-exactly at quality 90 (all AC coefficients quantize to zero;
# the DC path is exact integer arithmetic), so a no-codec mirror can
# rebuild the decoded pixels. Lossy behavior on general images is pytest-
# covered via PSNR bounds.
# --------------------------------------------------------------------------

_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_JPEG_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_JPEG_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_JPEG_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _jpeg_dct_matrix() -> np.ndarray:
    """8x8 orthonormal DCT-II matrix D: coefficients = D @ block @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2.0 / 8.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d


_JPEG_DCT = _jpeg_dct_matrix()


def _jpeg_quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → Annex-K tables as-is."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), codes assigned per T.81 C.2 (increasing
    length, increasing value)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


def _jpeg_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n_blocks, 8, 8) in
    raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _jpeg_cat(v: int) -> int:
    """DC/AC magnitude category (bit length of |v|)."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _jpeg_encode_plane(
    bw: _BitWriter,
    coefs: np.ndarray,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    """Entropy-code one component's quantized zigzag coefficients
    (n_blocks, 64); returns the updated DC predictor."""
    for blk in coefs:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _jpeg_cat(diff)
        code, ln = dc_tab[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            s = _jpeg_cat(v)
            code, ln = ac_tab[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            bw.put(code, ln)
    return pred


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes.
    Color uses YCbCr; ``subsample=True`` emits 4:2:0 (box-averaged chroma),
    else 4:4:4."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    qlum = _jpeg_quality_scale(_JPEG_Q_LUM, quality)
    qchrom = _jpeg_quality_scale(_JPEG_Q_CHROM, quality)

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # per-component sampled planes padded to MCU-aligned multiples of 8
    comp_coefs = []
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            py = -(-h // fy) * fy
            px = -(-w // fx) * fx
            pp = np.pad(p, ((0, py - h), (0, px - w)), mode="edge")
            p = pp.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        ph = mcuy * 8 * sv
        pw = mcux * 8 * sh
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        blocks = _jpeg_blocks(p - 128.0)
        co = np.einsum("ij,njk,lk->nil", _JPEG_DCT, blocks, _JPEG_DCT)
        q = (qlum if qsel[ci] == 0 else qchrom).reshape(8, 8)
        zz = np.round(co / q).astype(np.int64).reshape(-1, 64)[:, _JPEG_ZIGZAG]
        # re-order raster blocks into MCU-interleaved order for this comp
        bh, bwid = p.shape[0] // 8, p.shape[1] // 8
        order = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sv):
                    for bx in range(sh):
                        order.append((my * sv + by) * bwid + (mx * sh + bx))
        comp_coefs.append(zz[np.array(order)])

    dc_lum = _huff_encode_table(*_JPEG_HUFF_DC_LUM)
    ac_lum = _huff_encode_table(*_JPEG_HUFF_AC_LUM)
    dc_chrom = _huff_encode_table(*_JPEG_HUFF_DC_CHROM)
    ac_chrom = _huff_encode_table(*_JPEG_HUFF_AC_CHROM)

    bw = _BitWriter()
    preds = [0] * len(planes)
    blocks_per_mcu = [s[0] * s[1] for s in samp]
    pos = [0] * len(planes)
    for _ in range(mcux * mcuy):
        for ci in range(len(planes)):
            n = blocks_per_mcu[ci]
            seg = comp_coefs[ci][pos[ci] : pos[ci] + n]
            pos[ci] += n
            preds[ci] = _jpeg_encode_plane(
                bw,
                seg,
                dc_lum if qsel[ci] == 0 else dc_chrom,
                ac_lum if qsel[ci] == 0 else ac_chrom,
                preds[ci],
            )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum[_JPEG_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qchrom[_JPEG_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += struct.pack(">BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci])
    out += seg(0xFFC0, sof)

    def dht(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _JPEG_HUFF_DC_LUM) + dht(1, 0, _JPEG_HUFF_AC_LUM)
    if not gray:
        out += dht(0, 1, _JPEG_HUFF_DC_CHROM) + dht(1, 1, _JPEG_HUFF_AC_CHROM)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 0 if qsel[ci] == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Bit-serial reader over the entropy-coded segment with FF00
    unstuffing; RSTn markers are surfaced via ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                raise _JpegMarker(nxt)
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos = p + 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def align_restart(self) -> None:
        """Consume padding bits and the RSTn marker at a restart boundary."""
        self._acc = 0
        self._n = 0
        d = self.data
        p = self.pos
        while d[p] != 0xFF or d[p + 1] == 0x00:
            p += 1
        if not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError(f"expected RSTn at restart boundary, got FF{d[p+1]:02X}")
        self.pos = p + 2


class _JpegMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _jpeg_receive_extend(br: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = br.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array (h, w, 1) grayscale or (h, w, 3)
    RGB. Supports SOF0 with arbitrary sampling factors (box upsampling of
    subsampled chroma), multiple DQT/DHT tables, DRI/RSTn restart markers.
    Progressive (SOF2) and arithmetic coding raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                zz = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZIGZAG] = zz
                qtabs[tid] = nat
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                htabs[(cls, tid)] = _huff_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported JPEG frame type FF{marker:02X} (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos = pos  # entropy data follows
            break
        # APPn/COM/etc: skipped
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for sc in scan_comps:
        c = by_id[sc["cs"]]
        order.append(
            {
                "c": c,
                "dc": htabs[(0, sc["td"])],
                "ac": htabs[(1, sc["ta"])],
                "coefs": np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64),
            }
        )

    br = _BitReader(data, pos)
    preds = [0] * len(order)
    n_mcu = mcux * mcuy
    mi = 0
    try:
        while mi < n_mcu:
            if restart_interval and mi and mi % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(order)
            my, mx = divmod(mi, mcux)
            for oi, o in enumerate(order):
                c = o["c"]
                bwid = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = o["coefs"][(my * c["v"] + by) * bwid + mx * c["h"] + bx]
                        s = _jpeg_decode_huff(br, o["dc"])
                        preds[oi] += _jpeg_receive_extend(br, s)
                        blk[0] = preds[oi]
                        k = 1
                        while k <= 63:
                            rs = _jpeg_decode_huff(br, o["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG scan: AC run past coefficient 63"
                                )
                            blk[_JPEG_ZIGZAG[k]] = _jpeg_receive_extend(br, s)
                            k += 1
            mi += 1
    except _JpegMarker as m:
        if not (m.marker == 0xD9 and mi >= n_mcu):
            raise ValueError(f"JPEG scan truncated at MCU {mi}/{n_mcu}") from None
    except IndexError:
        # _BitReader ran off the end of a truncated entropy stream — the
        # documented contract is ValueError for any corrupt input
        raise ValueError(f"truncated JPEG scan at MCU {mi}/{n_mcu}") from None

    planes = []
    for o in order:
        c = o["c"]
        q = qtabs[c["tq"]]
        co = (o["coefs"] * q).astype(np.float64).reshape(-1, 8, 8)
        px = np.einsum("ji,njk,kl->nil", _JPEG_DCT, co, _JPEG_DCT) + 128.0
        bh, bwid = mcuy * c["v"], mcux * c["h"]
        plane = (
            px.reshape(bh, bwid, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bwid * 8)
        )
        if (c["h"], c["v"]) != (hmax, vmax):
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
    raise ValueError(f"unsupported JPEG component count {len(planes)}")
