"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

ALL THREE modalities now decode for REAL, stdlib-only, for their standard
uncompressed container formats:

* image — PNG (zlib inflate + numpy scanline unfiltering, all five filter
  types) and binary PPM/PGM;
* audio — WAV/RIFF PCM (8/16-bit, any channel count / sample rate);
* video — YUV4MPEG2 (`y4m`, the raw-video interchange format emitted and
  consumed by ffmpeg/x264/mpv: plain-text stream header + `FRAME` markers +
  raw planes; C420/C444/Cmono colorspaces).

Compressed codecs (JPEG, opus/mp3, av1/h264 …) need entropy/transform
coders this container doesn't ship — those payloads raise ValueError
loudly (surfaced per-row as `decode_error` by the DataFrame-level
extractors, never silently faked).

Pattern: media rows are (id, media_type, payload binary, meta struct);
feature extraction is mapInPandas over batches of binary payloads —
the Arrow transfer ships bytes zero-copy, and each batch is processed as one
numpy block.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_entropy double, feature array<float>"
)


def synth_image(media_id: int) -> tuple[bytes, int, int, int]:
    """One deterministic REAL PNG per id: smooth-gradient-plus-noise pixels
    (so every PNG filter type both exercises and compresses), dimensions,
    channel count and filter type varying with the id.  Returns
    (png_bytes, width, height, channels)."""
    i = int(media_id)
    rng = np.random.default_rng(42 + i)
    w, h = 16 + i % 49, 16 + (i * 7) % 49
    ch = (1, 2, 3, 4)[i % 4]
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 3 + yy * 5 + i) % 256).astype(np.uint8)
    arr = np.repeat(grad[:, :, None], ch, axis=2)
    arr += rng.integers(0, 32, arr.shape, dtype=np.uint8)
    return encode_png(arr, filter_type=i % 5), w, h, ch


def synth_media(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table with REAL payloads in every modality:
    images are genuine PNGs (synth_image), audio rows genuine WAV/PCM
    (synth_audio), video rows genuine y4m clips (synth_video) — each
    round-trips its decoder.  Every 11th audio/video row instead carries a
    compressed-codec payload (seeded opaque bytes tagged opus/av1) so the
    decode_error path is exercised by construction, the way a real web
    corpus mixes containers."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            types_ = np.array(["image", "audio", "video"])[ids % 3]
            rows = []
            for i, t in zip(ids, types_):
                i, t = int(i), str(t)
                if t == "image":
                    payload, w, h, _ch = synth_image(i)
                    meta = {"width": w, "height": h, "duration_ms": None, "codec": "png"}
                elif i % 11 == 0:  # opaque compressed-codec rows
                    rng = np.random.default_rng(42 + i)
                    size = 256 + i % 1024
                    payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": 1000 + i % 60000,
                        "codec": {"audio": "opus", "video": "av1"}[t],
                    }
                elif t == "audio":
                    payload, _rate, dur = synth_audio(i)
                    meta = {"width": None, "height": None, "duration_ms": dur,
                            "codec": "pcm_s16le"}
                else:
                    payload, w, h, _nf, dur = synth_video(i)
                    meta = {"width": w, "height": h, "duration_ms": dur, "codec": "y4m"}
                rows.append(
                    {"media_id": i, "media_type": t, "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


# --- real image codec (stdlib zlib + numpy; no PIL/libvips needed) -----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit, non-palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """PNG filter-4 predictor, vectorized (PNG spec §9.4)."""
    p = left.astype(np.int32) + up.astype(np.int32) - ul.astype(np.int32)
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    return np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)).astype(np.uint8)


def _png_chunks(payload: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(payload: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit gray / gray+alpha / RGB / RGBA,
    non-interlaced — zlib inflate + per-scanline unfiltering of all five
    filter types.  Returns (H, W, channels) uint8.  Raises ValueError on
    palette/16-bit/interlaced images (out of scope for a training-data
    feature pass; re-encode upstream)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = idat = None
    idat_parts = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat_parts.append(data)
    if ihdr is None or not idat_parts:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype_ not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={ctype_}, "
            f"interlace={interlace}): only 8-bit gray/GA/RGB/RGBA, non-interlaced"
        )
    ch = _PNG_CHANNELS[ctype_]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat_parts)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError(f"PNG data length {len(raw)} != expected {h * (stride + 1)}")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype, line = int(raw[r, 0]), raw[r, 1:]
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # up — whole-row vector add
            cur = line + prev  # uint8 wraparound == mod-256 per spec
        elif ftype in (1, 3, 4):
            # sub/average/paeth need the reconstructed LEFT pixel → sequential
            # in x, but vectorized across the pixel's channels per step (W
            # iterations of bpp-wide slices, not W*bpp scalar ops)
            cur = np.zeros(stride, dtype=np.uint8)
            zero = np.zeros(ch, dtype=np.uint8)
            for x in range(0, stride, ch):
                left = cur[x - ch : x] if x else zero
                if ftype == 1:
                    cur[x : x + ch] = line[x : x + ch] + left
                elif ftype == 3:
                    avg = (left.astype(np.uint16) + prev[x : x + ch]) // 2
                    cur[x : x + ch] = line[x : x + ch] + avg.astype(np.uint8)
                else:
                    ul = prev[x - ch : x] if x else zero
                    cur[x : x + ch] = line[x : x + ch] + _paeth(left, prev[x : x + ch], ul)
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {r}")
        out[r] = cur
        prev = cur
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Minimal PNG encoder (8-bit gray/GA/RGB/RGBA, one filter type for the
    whole image) — enough to synthesize REAL image payloads for the media
    generator and to round-trip-test the decoder against every filter type."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    flat = arr.reshape(h, w * ch).astype(np.int16)
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    ul = np.zeros_like(flat)
    ul[1:, ch:] = flat[:-1, :-ch]
    if filter_type == 0:
        filtered = flat
    elif filter_type == 1:
        filtered = flat - left
    elif filter_type == 2:
        filtered = flat - up
    elif filter_type == 3:
        filtered = flat - (left + up) // 2
    else:
        filtered = flat - _paeth(
            left.astype(np.uint8), up.astype(np.uint8), ul.astype(np.uint8)
        )
    scanlines = np.concatenate(
        [np.full((h, 1), filter_type, dtype=np.uint8), (filtered % 256).astype(np.uint8)],
        axis=1,
    )

    def chunk(ctag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctag
            + data
            + struct.pack(">I", zlib.crc32(ctag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(scanlines.tobytes(), level)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM (P6, RGB) / PGM (P5, gray) binary decoder → (H, W, ch) uint8."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PPM/PGM (magic {magic!r})")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # tokens, then ONE whitespace byte, then raster
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * ch, offset=pos)
    return raster.reshape(h, w, ch).copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, channels) uint8 array.

    REAL decode, stdlib-only: PNG (8-bit gray/GA/RGB/RGBA, all five scanline
    filters, via zlib + numpy unfiltering) and binary PPM/PGM.  Other
    formats (JPEG needs a DCT codec this container doesn't ship) raise
    ValueError — loudly, so callers can't silently depend on a fake."""
    if payload is None or len(payload) < 8:
        raise ValueError("empty/truncated image payload")
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_ppm(payload)
    raise ValueError(
        f"unrecognized image format (leading bytes {payload[:4]!r}); "
        "supported here: PNG, PPM/PGM"
    )


# --- real audio codec (WAV/RIFF PCM; stdlib struct + numpy) ------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal WAV writer: PCM 16-bit little-endian, (n,) or (n, channels)
    int16 samples — enough to synthesize REAL audio payloads and round-trip
    the decoder."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Minimal WAV/RIFF reader: PCM (format tag 1) 8-bit unsigned or 16-bit
    signed, any channel count/rate.  Walks the chunk list (so extra chunks
    like LIST/fact are skipped, as the RIFF spec requires), returns
    ((n_samples, channels) int16 array, sample_rate).  8-bit input is
    upscaled to int16 so callers see ONE sample dtype.  Raises ValueError on
    non-PCM (compressed) WAV or a malformed chunk list."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        ctag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if ctag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _byte_rate, _align, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format_tag={tag}, bits={bits}): PCM 8/16-bit only")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:  # 8-bit WAV is unsigned, biased at 128
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8
    n = len(samples) // ch
    return samples[: n * ch].reshape(n, ch), rate


def synth_audio(media_id: int) -> tuple[bytes, int, int]:
    """One deterministic REAL WAV per id: a seeded sine + noise mix with
    rate/channels/length varying by id.  Returns (wav_bytes, sample_rate,
    duration_ms)."""
    i = int(media_id)
    rng = np.random.default_rng(42 + i)
    rate = (8000, 16000, 22050, 44100)[i % 4]
    ch = 1 + i % 2
    n = rate // 10 + (i * 131) % rate  # 0.1 – 1.1 s
    t = np.arange(n) / rate
    freq = 110.0 * (1 + i % 16)
    wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n)
    samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
    samples = np.repeat(samples[:, None], ch, axis=1)
    if ch == 2:  # decorrelate the channels so stereo stats are non-trivial
        samples[:, 1] = np.roll(samples[:, 1], rate // 100)
    return encode_wav(samples, rate), rate, int(round(n * 1000 / rate))


# --- real video codec (YUV4MPEG2 / y4m; stdlib + numpy) ----------------------

_Y4M_SIG = b"YUV4MPEG2 "
#: colorspace → (chroma plane count, chroma subsample divisor w, h)
_Y4M_CS = {"420": (2, 2, 2), "420jpeg": (2, 2, 2), "420mpeg2": (2, 2, 2),
           "444": (2, 1, 1), "mono": (0, 1, 1)}


def encode_y4m(
    frames_y: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "420",
    chroma: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Minimal YUV4MPEG2 writer: (n_frames, H, W) uint8 luma (+ optional
    chroma planes; default = neutral 128 for 420/444, omitted for mono)."""
    frames_y = np.ascontiguousarray(frames_y, dtype=np.uint8)
    nf, h, w = frames_y.shape
    nplanes, dw, dh = _Y4M_CS[colorspace]
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n".encode()
    parts = [header]
    for f in range(nf):
        parts.append(b"FRAME\n")
        parts.append(frames_y[f].tobytes())
        if nplanes:
            if chroma is not None:
                u, v = chroma
                parts.append(np.ascontiguousarray(u[f], dtype=np.uint8).tobytes())
                parts.append(np.ascontiguousarray(v[f], dtype=np.uint8).tobytes())
            else:
                parts.append(bytes([128]) * ((w // dw) * (h // dh)) * 2)
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int], str]:
    """Minimal YUV4MPEG2 reader: parses the stream header (W/H/F/C tags),
    walks FRAME markers (per-frame parameters after `FRAME` are allowed and
    skipped, per spec), and returns (luma frames (n, H, W) uint8,
    (fps_num, fps_den), colorspace).  Chroma planes are validated for length
    and skipped — training-data frame features run on luma.  Raises
    ValueError on truncated frames or unsupported colorspaces."""
    if payload[: len(_Y4M_SIG)] != _Y4M_SIG:
        raise ValueError("not a YUV4MPEG2 payload (bad signature)")
    eol = payload.index(b"\n")
    w = h = None
    fps, cs = (25, 1), "420"
    for tok in payload[len(_Y4M_SIG) : eol].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == b"C":
            cs = val
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if cs not in _Y4M_CS:
        raise ValueError(f"unsupported y4m colorspace C{cs} (supported: {sorted(_Y4M_CS)})")
    nplanes, dw, dh = _Y4M_CS[cs]
    luma_len = w * h
    frame_len = luma_len + nplanes * (w // dw) * (h // dh)
    frames, pos = [], eol + 1
    while pos < len(payload):
        marker_end = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = marker_end + 1
        if pos + frame_len > len(payload):
            raise ValueError(f"truncated y4m frame {len(frames)}")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=luma_len, offset=pos).reshape(h, w)
        )
        pos += frame_len
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps, cs


def synth_video(media_id: int) -> tuple[bytes, int, int, int, int]:
    """One deterministic REAL y4m clip per id: a moving gradient block so
    per-frame luma stats differ frame to frame.  Returns
    (y4m_bytes, width, height, n_frames, duration_ms)."""
    i = int(media_id)
    w, h = 16 + (i * 3) % 33, 16 + (i * 5) % 33
    nf = 3 + i % 6
    fps = (25, 1)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [((xx * 2 + yy * 3 + i + 11 * f) % 256).astype(np.uint8) for f in range(nf)]
    )
    cs = ("420", "444", "mono")[i % 3]
    return (
        encode_y4m(frames, fps, cs),
        w, h, nf,
        int(round(nf * 1000 * fps[1] / fps[0])),
    )


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """TEST FIXTURE — deterministic byte-fold 'decode' used by
    extract_features for the codec-agnostic feature column (it treats every
    payload as opaque bytes, so it applies uniformly to compressed codecs
    too).  For real decoding use :func:`decode_image` / :func:`decode_wav` /
    :func:`decode_y4m`."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(a)) % dim
    if pad:
        a = np.pad(a, (0, pad))
    return (a.reshape(-1, dim).mean(axis=0) / 255.0).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, compute byte-level
    stats (real) + the fake decode vector (stub).  The batch shape, schema,
    and partition behavior are exactly what a real decoder would use.

    Fully vectorized per batch (no per-row Python): payloads concatenate into
    ONE uint8 buffer with offsets; per-row 256-bin histograms (entropy) come
    from a single fused-key bincount, and the per-row fold features (fake
    decode) from one pad-scatter + ``np.add.reduceat`` pass — the same
    offsets-and-reduce shape simhash_udf uses.  Measured 5.05× faster than
    the previous iterrows loop at 5k rows/batch (steady-state best-of-6,
    values identical; see BENCH.md §4).  Empty/NULL payloads yield entropy 0
    and a zero feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            n = len(pdf)
            lens = np.fromiter(
                (len(p) if p is not None else 0 for p in payloads), dtype=np.int64, count=n
            )
            flat = np.frombuffer(b"".join(p or b"" for p in payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n), lens)

            # entropy: per-row 256-bin histograms via ONE fused-key bincount
            # (row*256 + byte) — much faster than np.add.at scatter
            counts = np.bincount(row_idx * 256 + flat, minlength=n * 256).reshape(n, 256)
            p = counts / np.maximum(lens, 1)[:, None]
            ent = -np.where(p > 0, p * np.log2(p, where=p > 0), 0.0).sum(axis=1)
            ent[lens == 0] = 0.0

            # fake decode ≡ pad-to-dim, reshape(-1, dim), column mean — done as
            # ONE scatter into a zero-padded buffer + np.add.reduceat over the
            # (total_blocks, dim) view; empty rows keep one zero block so the
            # reduceat boundaries stay strictly increasing (→ zero vector)
            blocks = np.maximum((lens + dim - 1) // dim, 1)
            padded = blocks * dim
            pad_before = np.concatenate([[0], np.cumsum(padded - lens)[:-1]])
            dest = np.arange(len(flat), dtype=np.int64) + np.repeat(pad_before, lens)
            # float64 accumulation like fake_decode — float32 sums lose
            # integer exactness past 2^24 (≈1 MB payload columns), which
            # would break value-equality with the per-row reference
            buf = np.zeros(int(padded.sum()), np.float64)
            buf[dest] = flat
            bounds = np.concatenate([[0], np.cumsum(blocks)[:-1]])
            feat = (
                np.add.reduceat(buf.reshape(-1, dim), bounds, axis=0)
                / blocks[:, None]
                / 255.0
            ).astype(np.float32)

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lens,
                    "byte_entropy": np.round(ent, 6),
                    "feature": list(feat),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "px_mean double, px_std double, decode_error string"
)


def decode_images(df: DataFrame) -> DataFrame:
    """REAL distributed image decode: mapInPandas over image rows, decoding
    each PNG/PPM payload (stdlib zlib + numpy unfiltering) into pixels and
    emitting true dimensions + pixel statistics.  Undecodable payloads
    surface in `decode_error` instead of poisoning the batch (the standard
    web-corpus reality: some fraction of stored images is corrupt).

    Decode is genuinely per-row Python (entropy coding is sequential), but
    batches arrive via Arrow and each image unfilters as numpy row
    operations, so the loop is per-IMAGE, not per-pixel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "width", "height", "channels", "px_mean", "px_std",
                    "decode_error")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    arr = decode_image(payload)
                    out["width"].append(arr.shape[1])
                    out["height"].append(arr.shape[0])
                    out["channels"].append(arr.shape[2])
                    px = arr.astype(np.float64)
                    out["px_mean"].append(round(float(px.mean()), 6))
                    out["px_std"].append(round(float(px.std()), 6))
                    out["decode_error"].append(None)
                except (ValueError, zlib.error) as e:
                    for k in ("width", "height", "channels", "px_mean", "px_std"):
                        out[k].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.filter(F.col("media_type") == "image").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_samples long, "
    "duration_ms int, rms double, peak double, zero_cross_rate double, "
    "decode_error string"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL distributed audio decode: mapInPandas over audio rows, decoding
    each WAV/PCM payload into samples and emitting true rate/duration plus
    waveform statistics (RMS, peak, zero-crossing rate — the standard cheap
    speech/noise discriminators).  Compressed codecs (opus/mp3) surface in
    `decode_error` rather than failing the task, like decode_images.

    Per-payload decode is one np.frombuffer + reshape — the loop is
    per-CLIP; all sample math is vectorized numpy on the int16 block."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("sample_rate", "channels", "n_samples", "duration_ms",
                    "rms", "peak", "zero_cross_rate")
            out = {k: [] for k in ("media_id", *cols, "decode_error")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    samples, rate = decode_wav(payload)
                    n, ch = samples.shape
                    x = samples.astype(np.float64) / 32768.0
                    mono = x.mean(axis=1)
                    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
                    out["sample_rate"].append(rate)
                    out["channels"].append(ch)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(int(round(n * 1000 / rate)))
                    out["rms"].append(round(float(np.sqrt((x**2).mean())) if n else 0.0, 6))
                    out["peak"].append(round(float(np.abs(x).max()) if n else 0.0, 6))
                    out["zero_cross_rate"].append(round(zc, 6))
                    out["decode_error"].append(None)
                except (ValueError, struct.error) as e:
                    for k in cols:
                        out[k].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.filter(F.col("media_type") == "audio").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, "
    "luma_mean double, luma_std double, decode_error string"
)


def decode_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL distributed video frame sampling + decode: mapInPandas over
    video rows, decoding y4m payloads and emitting every ``every_n``-th
    frame's luma statistics.  One output row per SAMPLED FRAME (a genuine
    distributed expansion — a 1h clip fans out to thousands of rows inside
    the executor, never through the driver).  Compressed codecs (av1/h264)
    surface as one decode_error row per clip."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("frame_idx", "width", "height", "luma_mean", "luma_std")
            out = {k: [] for k in ("media_id", *cols, "decode_error")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames, _fps, _cs = decode_y4m(payload)
                    sampled = frames[::every_n]
                    fl = sampled.reshape(len(sampled), -1).astype(np.float64)
                    means, stds = fl.mean(axis=1), fl.std(axis=1)
                    for j in range(len(sampled)):
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(j * every_n)
                        out["width"].append(frames.shape[2])
                        out["height"].append(frames.shape[1])
                        out["luma_mean"].append(round(float(means[j]), 6))
                        out["luma_std"].append(round(float(stds[j]), 6))
                        out["decode_error"].append(None)
                except ValueError as e:
                    out["media_id"].append(int(mid))
                    for k in cols:
                        out[k].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_FEATURE_SCHEMA)


def resize_image(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (floor index mapping,
    ``src = (dst * in) // out``) — the exact-arithmetic resize every
    training pipeline's thumbnail step needs reproducible across workers;
    no interpolation, so output pixels are a pure SUBSET of input pixels."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target size must be >= 1x1, got {out_w}x{out_h}")
    h, w = arr.shape[:2]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[rows][:, cols]


RESIZED_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "payload binary, decode_error string"
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL distributed image resize: mapInPandas over image rows — decode
    each PNG/PPM payload (stdlib zlib + numpy), nearest-neighbor resample to
    ``out_w × out_h`` (:func:`resize_image` — exact integer index mapping, so
    the result is bit-reproducible on any worker), re-encode as PNG, and
    emit the new payload with its true dimensions.  Undecodable payloads
    surface in ``decode_error`` like decode_images.  The resample itself is
    one numpy fancy-index per image (per-IMAGE loop, per-pixel vectorized);
    output PNGs use filter 0 so encode is a single zlib pass."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target size must be >= 1x1, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("width", "height", "channels", "payload")
            out = {k: [] for k in ("media_id", *cols, "decode_error")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    arr = resize_image(decode_image(payload), out_w, out_h)
                    out["width"].append(arr.shape[1])
                    out["height"].append(arr.shape[0])
                    out["channels"].append(arr.shape[2])
                    out["payload"].append(encode_png(arr))
                    out["decode_error"].append(None)
                except (ValueError, zlib.error) as e:
                    for k in cols:
                        out[k].append(None)
                    out["decode_error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-level frame-sampling plumbing: expands each video row into
    frame timestamps from `meta.duration_ms` alone — works for ANY codec
    (including the compressed ones decode_frames can't open) because it
    never touches the payload."""
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ms", "meta")
    )
