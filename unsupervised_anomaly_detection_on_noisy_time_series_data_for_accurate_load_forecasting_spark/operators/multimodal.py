"""Multimodal column plumbing: opaque binary payloads with typed metadata,
decode / feature-extract / resize / frame-sample as Arrow-batched
mapInPandas islands.

No third-party codec libraries exist in this environment, but three formats
need none: PNG is zlib + chunked structs, WAV is a stdlib module, and GIF
is a self-contained LZW — so ``use_real_codecs=True`` REALLY decodes those
via operators/codecs.py (feature extraction and 2-D resize on true pixels /
samples, and REAL multi-frame sampling for animated GIF). Video has no
stdlib codec; its frame decode raises with the av/ffmpeg plug point. Default remains the deterministic fake decode
(seeded from the payload bytes) with the identical Spark plumbing: binary
column + metadata struct schema, Arrow batch shape, partition-preserving
mapInPandas, fixed feature dimension — the oracle-checkable registry path.

At 100 TB the pattern is: payloads stay in parquet binary columns (or
pointers to object storage), metadata is columnar for pruning, and the
decode UDF is the only Python island — everything before/after is
Catalyst-planned.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the UTF-8 bytes stand
    in for an encoded payload; metadata derives deterministically from it."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.length("text") % 640 + 1).cast("int").alias("width"),
            (F.length("text") % 480 + 1).cast("int").alias("height"),
            (F.length("text") % 16 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in decode: sha256(payload) → unit feature vector."""
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.iinfo(np.uint32).max
    return v


def _real_decode(payload: bytes, mime: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real stdlib decode for the supported formats (operators/codecs.py):
    PNG → per-channel mean/std pooled + shape; WAV → amplitude/energy stats.
    Video (and other mimes) raise — there is no stdlib video codec; that
    plug point stays gated on av/ffmpeg."""
    from . import codecs as CX

    if mime in ("image/png", "image/gif", "image/jpeg"):
        if mime == "image/png":
            raw = CX.decode_png(payload)
        elif mime == "image/jpeg":
            raw = CX.decode_jpeg(payload)
        else:
            raw = CX.decode_gif(payload)
        img = raw.astype(np.float64) / 255.0
        h, w, ch = img.shape
        means = np.pad(img.mean(axis=(0, 1)), (0, 3 - ch if ch < 3 else 0), mode="edge")[:3]
        stds = np.pad(img.std(axis=(0, 1)), (0, 3 - ch if ch < 3 else 0), mode="edge")[:3]
        return np.concatenate([means, stds, [h / 1000.0, w / 1000.0]])[:dim]
    if mime == "audio/wav":
        samples, rate = CX.decode_wav(payload)
        s = samples.astype(np.float64).ravel() / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8))))) if len(s) > 1 else 0.0
        return np.array(
            [
                s.mean(),
                s.std(),
                float(np.sqrt(np.mean(s * s))),
                zc,
                s.min(),
                s.max(),
                len(s) / float(rate),
                rate / 48000.0,
            ]
        )[:dim]
    raise NotImplementedError(
        f"no stdlib codec for mime {mime!r} (video frame decode requires av/ffmpeg)"
    )


def extract_features(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode + feature-extract island. Output:
    (media_id, n_bytes, feature ARRAY<DOUBLE>[FEATURE_DIM]).

    ``use_real_codecs=True`` decodes PNG and WAV payloads for real via the
    pure-stdlib codecs (operators/codecs.py) and raises only for formats
    with no stdlib codec (video). Default: deterministic fake decode with
    the identical Spark plumbing."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if use_real_codecs:
                feats = [
                    _real_decode(bytes(p), m).tolist()
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            else:
                feats = [_fake_decode(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    cols = ["media_id", "payload"] + (
        [F.col("meta.mime").alias("mime")] if use_real_codecs else []
    )
    return media.select(*cols).mapInPandas(gen, schema=schema)


def resize(media: DataFrame, out_w: int = 32, out_h: int = 32, use_real_codecs: bool = False) -> DataFrame:
    """Resize contract: payload → fixed (out_h × out_w) grid, returned as a
    flattened ARRAY<DOUBLE> plus updated metadata. Stub decoder maps payload
    bytes onto a deterministic grid; a real codec slots into the same
    mapInPandas signature and batch shape. ``use_real_codecs=True`` decodes
    PNG payloads (pure-stdlib, operators/codecs.py), nearest-neighbor
    resamples the true 2-D pixel grid, and returns channel-mean grayscale;
    non-image mimes raise."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.DoubleType())),
        ]
    )
    n_px = out_w * out_h

    def _grid_real(payload: bytes, mime: str) -> list[float]:
        from . import codecs as CX

        if mime == "image/png":
            img = CX.decode_png(payload)
        elif mime == "image/jpeg":
            img = CX.decode_jpeg(payload)
        elif mime == "image/gif":
            img = CX.decode_gif(payload)
        else:
            raise NotImplementedError(f"no stdlib image codec for mime {mime!r}")
        img = img.astype(np.float64) / 255.0
        h, w = img.shape[:2]
        ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        return img[np.ix_(ys, xs)].mean(axis=2).ravel().tolist()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip over raw columns, not iterrows (iterrows builds a Series per
        # row — ~50× slower than direct column iteration for byte payloads)
        for pdf in batches:
            if pdf.empty:
                continue
            pixels = []
            if use_real_codecs:
                for payload, mime in zip(pdf["payload"], pdf["mime"]):
                    pixels.append(_grid_real(bytes(payload), mime))
            else:
                for payload in pdf["payload"]:
                    payload = bytes(payload) or b"\0"
                    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64) / 255.0
                    # nearest-neighbor 'resample' of the byte stream onto the grid
                    idx = np.linspace(0, len(arr) - 1, n_px).astype(int)
                    pixels.append(arr[idx].tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.full(len(pdf), out_w, dtype="int32"),
                    "height": np.full(len(pdf), out_h, dtype="int32"),
                    "pixels": pixels,
                }
            )

    cols = ["media_id", "payload"] + (
        [F.col("meta.mime").alias("mime")] if use_real_codecs else []
    )
    return media.select(*cols).mapInPandas(gen, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 4, use_real_codecs: bool = False) -> DataFrame:
    """Frame sampling for multi-frame payloads: emit every n-th frame's
    feature as one row (the media → frames row explosion is the contract).

    ``use_real_codecs=True`` REALLY decodes the two multi-frame formats
    with pure-stdlib codecs (operators/codecs.py): animated GIF (LZW) and
    AVI video (RIFF container + MS-RLE8 'mrle' frames) — and emits
    per-frame grayscale statistics; other mimes raise (general video needs
    av/ffmpeg). Default: byte-stride stub frames with the identical Spark
    plumbing."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def _real_frame_rows(mid: int, payload: bytes, mime: str) -> list[tuple]:
        from . import codecs as CX

        if mime == "image/gif":
            raw = CX.decode_gif_frames(payload)
        elif mime == "video/x-msvideo":
            raw = CX.decode_avi_frames(payload)
        else:
            raise NotImplementedError(
                f"no stdlib multi-frame codec for mime {mime!r} (general video requires av/ffmpeg)"
            )
        frames = raw.astype(np.float64) / 255.0
        n, h, w, _ = frames.shape
        rows = []
        for fi in range(0, n, every_n):
            g = frames[fi].mean(axis=2)  # grayscale plane
            rows.append(
                (
                    mid,
                    fi,
                    [
                        float(g.mean()),
                        float(g.std()),
                        float(g.min()),
                        float(g.max()),
                        h / 1000.0,
                        w / 1000.0,
                        fi / 1000.0,
                        n / 1000.0,
                    ],
                )
            )
        return rows

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: list[tuple] = []
            # column zip, not iterrows — the per-frame codec call is the only
            # unavoidable per-payload Python here (it IS the decode kernel)
            if use_real_codecs:
                for mid, payload, mime in zip(
                    pdf["media_id"].to_numpy(), pdf["payload"], pdf["mime"]
                ):
                    out.extend(_real_frame_rows(int(mid), bytes(payload), mime))
            else:
                for mid, payload, n_frames in zip(
                    pdf["media_id"].to_numpy(), pdf["payload"], pdf["n_frames"].to_numpy()
                ):
                    payload = bytes(payload)
                    for fi in range(0, int(n_frames), every_n):
                        chunk = payload[fi::n_frames] or b"\0"
                        out.append((mid, fi, _fake_decode(chunk).tolist()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "feature"])

    extra = (
        [F.col("meta.mime").alias("mime")]
        if use_real_codecs
        else [F.col("meta.n_frames").alias("n_frames")]
    )
    flat = media.select("media_id", "payload", *extra)
    return flat.mapInPandas(gen, schema=schema)


def ahash_bands(img: "np.ndarray") -> tuple[int, int, int, int]:
    """8×8 average-hash of an (h, w, 3) uint8 image as FOUR 16-bit band
    ints — the perceptual near-dup fingerprint, banded so every engine
    (Spark, DuckDB, numpy mirror) manipulates small non-negative integers
    and never a sign-ambiguous 64-bit value.

    Spec (integer-exact end to end): per-pixel gray = r+g+b (0..765);
    sample an 8×8 grid at nearest-index rows/cols (linspace indices —
    the stub resampler's convention); bit j (row-major) = 1 iff
    64·g_j > Σ g (the strict average test without division); band k =
    Σ_{j=0..15} bit[16k+j] << (15−j).
    """
    g = img.astype(np.int64).sum(axis=2)
    h, w = g.shape
    ri = np.linspace(0, h - 1, 8).astype(int)
    ci = np.linspace(0, w - 1, 8).astype(int)
    s = g[np.ix_(ri, ci)].ravel()
    total = int(s.sum())
    bits = (64 * s > total).astype(int)
    bands = []
    for k in range(4):
        v = 0
        for j in range(16):
            v = (v << 1) | int(bits[16 * k + j])
        bands.append(v)
    return tuple(bands)


def phash_bands(img: "np.ndarray") -> tuple[int, int, int, int]:
    """64-bit DCT perceptual hash (pHash) of a grayscale/luma image as FOUR
    16-bit band ints — the frequency-domain sibling of :func:`ahash_bands`
    (aHash fingerprints brightness layout; pHash fingerprints low-frequency
    structure, so it survives contrast shifts aHash misses).

    Spec (deterministic given identical pixels): luma = channel 0 for 3-D
    input (the JPEG decoder's (h, w, 1) grayscale), the array itself for
    2-D; sample a 32×32 grid at nearest-index rows/cols (the ahash_bands
    linspace convention); block-average each 4×4 cell to an 8×8 matrix
    (integer-sum / 16 — exact in doubles); apply the 8×8 orthonormal DCT-II
    from the JPEG codec (operators/codecs.py `_JPEG_DCT` — the round trip's
    own basis); bit j (row-major) = 1 iff coeff_j > median, where the
    median is the 32nd-smallest of the 63 AC coefficients (odd count — an
    exact element, never an average of two floats). Floats appear only
    inside this one shared kernel, so the engine island and the oracle
    mirror emit bit-identical bands."""
    from .codecs import _JPEG_DCT

    g = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
    h, w = g.shape
    ri = np.linspace(0, h - 1, 32).astype(int)
    ci = np.linspace(0, w - 1, 32).astype(int)
    s = g[np.ix_(ri, ci)]
    blocks = s.reshape(8, 4, 8, 4).sum(axis=(1, 3)) / 16.0
    coeffs = (_JPEG_DCT @ blocks @ _JPEG_DCT.T).ravel()
    med = float(np.sort(coeffs[1:])[31])
    bits = (coeffs > med).astype(int)
    bands = []
    for k in range(4):
        v = 0
        for j in range(16):
            v = (v << 1) | int(bits[16 * k + j])
        bands.append(v)
    return tuple(bands)


def phash_coarse_band(img: "np.ndarray") -> int:
    """Coarse-scale companion of :func:`phash_bands`: ONE 16-bit band from
    a 16×16 luma sample block-averaged to 4×4 and transformed with the 4×4
    orthonormal DCT-II (same construction as the JPEG codec's 8×8 basis).
    Bit j (row-major over all 16 coefficients, DC included) = 1 iff
    coeff_j > median of the 15 AC coefficients (odd count — an exact
    element). The coarse grid sees only global structure, so two crops or
    re-encodes whose fine 32×32 hashes disagree in every band can still
    collide here — the extra recall channel of the multi-resolution
    near-dup query. Floats stay inside this one shared kernel (both the
    island and the oracle mirror call it), so the emitted band is an
    exact integer everywhere."""
    k = np.arange(4)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 8) * np.sqrt(2.0 / 4.0)
    d[0, :] = np.sqrt(1.0 / 4.0)
    g = (img if img.ndim == 2 else img[:, :, 0]).astype(np.float64)
    h, w = g.shape
    ri = np.linspace(0, h - 1, 16).astype(int)
    ci = np.linspace(0, w - 1, 16).astype(int)
    s = g[np.ix_(ri, ci)]
    blocks = s.reshape(4, 4, 4, 4).sum(axis=(1, 3)) / 16.0
    coeffs = (d @ blocks @ d.T).ravel()
    med = float(np.sort(coeffs[1:])[7])
    bits = (coeffs > med).astype(int)
    v = 0
    for j in range(16):
        v = (v << 1) | int(bits[j])
    return v


SILENCE_THRESHOLD = 8192  # |int16 sample| below this counts as silence
SILENCE_MIN_RUN = 4


def silence_runs(samples: "np.ndarray") -> tuple[int, int, int]:
    """Silence-run segmentation of an int16 sample vector — the audio
    pre-filter a speech corpus runs before transcription (trim/split on
    silence): returns (n_runs, longest_run, n_silent) counting only runs
    of at least SILENCE_MIN_RUN consecutive samples with
    |x| < SILENCE_THRESHOLD. Pure integer comparisons — bit-identical in
    the island and the mirror."""
    sil = np.abs(samples.astype(np.int64)) < SILENCE_THRESHOLD
    n_runs = longest = 0
    n_silent = int(sil.sum())
    run = 0
    for flag in sil:
        if flag:
            run += 1
        else:
            if run >= SILENCE_MIN_RUN:
                n_runs += 1
                longest = max(longest, run)
            run = 0
    if run >= SILENCE_MIN_RUN:
        n_runs += 1
        longest = max(longest, run)
    return n_runs, longest, n_silent


SCENE_CUT_THRESHOLD = 0.08


def scene_cuts(media: DataFrame, threshold: float = SCENE_CUT_THRESHOLD) -> DataFrame:
    """Shot-boundary (scene-cut) detection for multi-frame payloads — the
    video-pipeline primitive behind clip segmentation and frame-dedup in a
    crawl: REALLY decode every frame with the stdlib codecs (animated GIF
    LZW / AVI MS-RLE8), take the mean absolute gray-plane difference
    between consecutive frames, and flag a cut where the jump exceeds
    ``threshold``. One Arrow island row per consecutive frame PAIR —
    payloads never leave the executor, frames never materialize as Spark
    rows, and per-media work is O(n_frames · h · w), embarrassingly
    media-parallel (reference contract: the frame-walk shape of
    frame_sample above)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_diff", T.DoubleType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        from . import codecs as CX

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                mime = meta["mime"]
                if mime == "image/gif":
                    raw = CX.decode_gif_frames(bytes(payload))
                elif mime == "video/x-msvideo":
                    raw = CX.decode_avi_frames(bytes(payload))
                else:
                    raise NotImplementedError(
                        f"no stdlib multi-frame codec for mime {mime!r}"
                    )
                g = (raw.astype(np.float64) / 255.0).mean(axis=3)  # (n, h, w)
                d = np.abs(np.diff(g, axis=0)).mean(axis=(1, 2))
                rows += [
                    (int(mid), int(fi), float(dv), bool(dv > threshold))
                    for fi, dv in enumerate(d, start=1)
                ]
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_diff", "is_cut"])

    return media.mapInPandas(gen, schema=schema)


def motion_energy(media: DataFrame) -> DataFrame:
    """Per-clip motion-energy profile through the REAL multi-frame codecs —
    the ranking signal a video curation pipeline sorts on (static slates
    and freeze-frames score ~0, hard cuts and busy motion score high),
    complementary to :func:`scene_cuts` which only emits the boundary
    booleans. Per consecutive frame pair the energy is the mean SQUARED
    gray-plane difference (diff² weights large jumps quadratically — the
    standard motion-energy kernel, vs scene_cuts' |diff| mean), reduced
    inside the island to ONE row per media: pair count, total energy, and
    the argmax pair (ties to the earliest index, so the peak is
    deterministic). Payloads never leave the executor; per-media work is
    O(n_frames · h · w); output is O(1) per media."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_pairs", T.IntegerType()),
            T.StructField("total_energy", T.DoubleType()),
            T.StructField("peak_idx", T.IntegerType()),
            T.StructField("peak_energy", T.DoubleType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        from . import codecs as CX

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                mime = meta["mime"]
                if mime == "image/gif":
                    raw = CX.decode_gif_frames(bytes(payload))
                elif mime == "video/x-msvideo":
                    raw = CX.decode_avi_frames(bytes(payload))
                else:
                    raise NotImplementedError(
                        f"no stdlib multi-frame codec for mime {mime!r}"
                    )
                g = (raw.astype(np.float64) / 255.0).mean(axis=3)  # (n, h, w)
                d = np.diff(g, axis=0)
                e = (d * d).mean(axis=(1, 2))  # per-pair mean squared diff
                peak = int(np.argmax(e)) if len(e) else 0  # first max wins
                rows.append(
                    (
                        int(mid),
                        int(len(e)),
                        float(e.sum()),
                        int(peak + 1) if len(e) else 0,
                        float(e[peak]) if len(e) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_pairs", "total_energy", "peak_idx", "peak_energy"],
            )

    return media.mapInPandas(gen, schema=schema)


BAND_FREQS_HZ = (500.0, 1000.0, 2000.0)


def band_energies(samples: "np.ndarray", rate: int = 8000) -> list[float]:
    """Single-bin DFT (Goertzel-equivalent) band energies of an int16
    sample vector at the fixed :data:`BAND_FREQS_HZ` probe frequencies —
    the cheap spectral fingerprint an audio-curation pass uses to separate
    speech-band content from hum/noise. Per frequency:
    ``(Σ s·cos(2πfn/r))² + (Σ s·sin(2πfn/r))²`` normalized by n², with s
    scaled to [-1, 1). Deterministic across island and mirror: the trig
    vectors come from the same numpy/libm on identical (n, rate) inputs,
    ``np.sum`` is shape-deterministic pairwise summation, and the result
    is quantized to the 1e-9 lattice before leaving the function."""
    import math

    s = samples.astype(np.float64) / 32768.0
    n = len(s)
    t = np.arange(n, dtype=np.float64)
    out = []
    for f in BAND_FREQS_HZ:
        w = 2.0 * math.pi * f / float(rate)
        c = float(np.sum(s * np.cos(w * t)))
        d = float(np.sum(s * np.sin(w * t)))
        e = (c * c + d * d) / (float(n) * float(n))
        out.append(math.floor(e * 1e9 + 0.5) / 1e9)
    return out
