"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata structs.

Real codecs, pure numpy/stdlib (the container has no PIL/cv2/librosa):

- **BMP** — uncompressed BITMAPINFOHEADER, 24-bit BGR and 8-bit gray;
- **PPM/PGM** — binary P6 (RGB) and P5 (gray), maxval ≤ 255;
- **PNG** — 8-bit non-interlaced grayscale (color type 0) and RGB (2):
  stdlib ``zlib`` inflate + full scanline filter reconstruction
  (None/Sub/Up/Average/Paeth);
- **JPEG** — baseline sequential DCT (``llmops/jpeg.py``): Huffman
  entropy decode, dequantize + IDCT, any chroma sampling, restart
  markers; plus an Annex-K-table encoder for fixtures;
- **WAV** — RIFF PCM, 8/16/32-bit integer samples.

These are parseable with ``struct``/``zlib``/``np.frombuffer`` — so
decode → filter → embed → ANN runs end-to-end on real bytes. Formats
still needing codecs the stdlib lacks (MP3/video, arithmetic/12-bit
JPEG, PNG variants outside the supported subset) raise
``NotImplementedError`` from the sniff: faking them would hide the
dependency. A deterministic ``FAKE`` header format remains for plumbing
tests: ``b"FAKE" + mode(1B) + width(4B LE) + height(4B LE) + payload``.

Scale notes: binary payloads ride the normal columnar path (parquet binary
+ Arrow); keep per-file row groups small enough that a batch of payloads
fits executor memory (``spark.sql.files.maxPartitionBytes``, and
``maxRecordsPerBatch`` for Arrow). Feature extraction is mapInPandas —
one pass, no shuffle; downstream joins use the extracted metadata, never
the blob.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mode string, payload_bytes long"
)


def make_fake_image(width: int, height: int, mode: int = 1, payload: bytes = b"") -> bytes:
    return b"FAKE" + struct.pack("<BII", mode, width, height) + payload


# -- pure-numpy image codecs -----------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) gray or (h, w, 3) RGB uint8 array as an
    uncompressed BMP (BITMAPINFOHEADER; 8-bit indexed with a gray palette
    or 24-bit BGR, rows bottom-up and 4-byte padded) — fixture generator
    for the decoder and for synthetic multimodal corpora."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    stride = (w * (1 if gray else 3) + 3) & ~3
    palette = bytes(bytearray(v for g in range(256) for v in (g, g, g, 0))) if gray else b""
    raster = bytearray()
    for row in px[::-1]:  # bottom-up
        line = row.tobytes() if gray else row[:, ::-1].tobytes()  # RGB → BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40 + len(palette)
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8 if gray else 24, 0, len(raster), 2835, 2835,
            256 if gray else 0, 0,
        )
    )
    return header + palette + bytes(raster)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → binary P6; (h, w) gray uint8 → binary P5."""
    px = np.asarray(pixels, dtype=np.uint8)
    magic = b"P5" if px.ndim == 2 else b"P6"
    h, w = px.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


def _decode_bmp(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    file_off = struct.unpack("<I", buf[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", buf[14:26])
    bpp = struct.unpack("<H", buf[28:30])[0]
    compression = struct.unpack("<I", buf[30:34])[0]
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"BMP variant not supported (header={hdr_size}, "
            f"compression={compression}, bpp={bpp}): only uncompressed "
            "8-bit gray / 24-bit BGR BITMAPINFOHEADER decodes"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * bpp // 8 + 3) & ~3
    raster = np.frombuffer(buf, np.uint8, count=stride * h, offset=file_off)
    rows = raster.reshape(h, stride)
    if bpp == 8:
        # 8-bit BMP pixels are PALETTE INDICES, not intensities: apply
        # the color table (at 14+hdr_size, BGRA entries). A gray-ramp
        # palette yields mode 'L'; any other palette decodes to its true
        # RGB colors — returning raw indices would silently corrupt any
        # indexed-color or inverted-gray image
        clr_used = struct.unpack("<I", buf[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = (
            np.frombuffer(buf, np.uint8, count=clr_used * 4, offset=pal_off)
            .reshape(clr_used, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        )
        idx = rows[:, :w]
        if idx.max(initial=0) >= clr_used:
            raise ValueError("BMP pixel index outside its color table")
        if bool(np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2])):
            px = pal[idx, 0]
            mode = "L"
        else:
            px = pal[idx]
            mode = "RGB"
    else:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        mode = "RGB"
    return w, h, mode, (px[::-1] if bottom_up else px).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray, row_filters: list[int] | None = None) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as an 8-bit
    non-interlaced PNG. ``row_filters`` optionally names the scanline
    filter (0-4) applied per row (cycled) — the fixture knob that makes
    the decoder's Sub/Up/Average/Paeth reconstruction paths testable
    without an external writer. Default: filter 0 everywhere."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    flat = px.reshape(h, -1).astype(np.int32)
    bpp = 1 if gray else 3
    stride = flat.shape[1]
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = row_filters[y % len(row_filters)] if row_filters else 0
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prev
        elif f == 3:
            out = cur - ((left + prev) >> 1)
        else:  # 4: Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = cur - pred
        raw += bytes([f]) + (out & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _decode_png(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    """8-bit non-interlaced gray/RGB PNG: walk the chunk stream, inflate
    the concatenated IDATs (stdlib zlib), reconstruct scanline filters
    (None/Sub vectorized where possible; Average/Paeth have a sequential
    left-dependency, resolved per-pixel in the row loop)."""
    import zlib

    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", buf[pos + 8 : pos + 8 + 13])
        elif typ == b"IDAT":
            idat += buf[pos + 8 : pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("malformed PNG: no IHDR chunk")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in (0, 2):
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}): only 8-bit non-interlaced gray/RGB decodes"
        )
    bpp = 1 if ctype == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    lines = np.frombuffer(raw, np.uint8, count=(stride + 1) * h).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    zeros = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1] if y else zeros
        if f == 0:
            rec = cur
        elif f == 2:
            rec = (cur + prev) & 0xFF
        elif f == 1:
            rec = cur
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:
            rec = cur
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = rec
    px = out.astype(np.uint8)
    if ctype == 0:
        return w, h, "L", px.reshape(h, w)
    return w, h, "RGB", px.reshape(h, w, 3)


def _decode_ppm(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    # header: magic, then 3 ASCII ints (w, h, maxval), '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM/PGM not supported")
    if buf[:2] == b"P5":
        px = np.frombuffer(buf, np.uint8, count=w * h, offset=pos).reshape(h, w)
        return w, h, "L", px.copy()
    px = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)
    return w, h, "RGB", px.copy()


def decode_image(buf: bytes) -> tuple[int, int, str, np.ndarray | None]:
    """Sniff the format and decode: ``(width, height, mode, pixels)``.
    Pixels are a (h, w) or (h, w, 3) uint8 array for the raster formats,
    None for the FAKE plumbing format. Unsupported (compressed) formats
    raise NotImplementedError — decoding them honestly needs a codec
    library this container doesn't have."""
    buf = bytes(buf)
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:2] in (b"P5", b"P6"):
        return _decode_ppm(buf)
    if buf[:8] == _PNG_SIG:
        return _decode_png(buf)
    if buf[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(buf)
    if buf[:4] == b"FAKE":
        mode, w, h = struct.unpack("<BII", buf[4:13])
        return w, h, {1: "L", 3: "RGB"}.get(mode, f"M{mode}"), None
    raise NotImplementedError(
        "unsupported image format; supported: BMP (8/24-bit uncompressed), "
        "PPM/PGM binary, PNG (8-bit non-interlaced gray/RGB), JPEG "
        "(baseline sequential + progressive — arithmetic/12-bit refuse "
        "honestly), FAKE"
    )


def probe_image(buf: bytes) -> tuple[int, int, str]:
    """HEADER-ONLY (width, height, mode): no raster decode, no inflate,
    no entropy decoding — the cheap sniff a resolution/mode pre-filter
    over a large corpus needs. Falls back to the full decoder only for
    formats without a parseable header."""
    buf = bytes(buf)
    if buf[:2] == b"BM":
        hdr_size, w, h = struct.unpack("<Iii", buf[14:26])
        bpp = struct.unpack("<H", buf[28:30])[0]
        if bpp == 24:
            return w, abs(h), "RGB"
        if bpp == 8:
            clr_used = struct.unpack("<I", buf[46:50])[0] or 256
            pal = np.frombuffer(
                buf, np.uint8, count=clr_used * 4, offset=14 + hdr_size
            ).reshape(clr_used, 4)
            gray = bool(
                np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2])
            )
            return w, abs(h), "L" if gray else "RGB"
    elif buf[:2] in (b"P5", b"P6"):
        toks = buf[2:200].split()
        return int(toks[0]), int(toks[1]), "L" if buf[:2] == b"P5" else "RGB"
    elif buf[:8] == _PNG_SIG:
        w, h = struct.unpack(">II", buf[16:24])
        color_type = buf[25]
        return w, h, {0: "L", 2: "RGB"}.get(color_type, f"CT{color_type}")
    elif buf[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                break
            while buf[pos + 1] == 0xFF:
                pos += 1
            marker = buf[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9 or marker == 0xDA:
                break
            (seglen,) = struct.unpack(">H", buf[pos : pos + 2])
            if marker in (0xC0, 0xC1, 0xC2):  # SOF: dims live here
                _, h, w, nc = struct.unpack(">BHHB", buf[pos + 2 : pos + 8])
                return w, h, "L" if nc == 1 else "RGB"
            pos += seglen
    elif buf[:4] == b"FAKE":
        mode, w, h = struct.unpack("<BII", buf[4:13])
        return w, h, {1: "L", 3: "RGB"}.get(mode, f"M{mode}")
    w, h, mode, _ = decode_image(buf)  # fallback: full decode
    return w, h, mode


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image metadata from payloads (mapInPandas, Arrow batches) via the
    HEADER-ONLY probe — a metadata/resolution pass over a corpus must
    not pay pixel decodes (PNG inflate, JPEG Huffman) for fields the
    headers already carry."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf[payload_col]):
                w, h, mode = probe_image(bytes(buf))
                rows.append((int(mid), w, h, mode, len(buf)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mode", "payload_bytes"]
            )

    return df.select("media_id", payload_col).mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample to (out_h, out_w) float64 gray: mean over the
    source pixels each output cell covers (exact bincount formulation, no
    interpolation libraries needed). RGB input is first luma-averaged."""
    if px.ndim == 3:
        px = px @ np.array([0.299, 0.587, 0.114])
    h, w = px.shape
    row_bin = np.minimum((np.arange(h) * out_h) // max(h, 1), out_h - 1)
    col_bin = np.minimum((np.arange(w) * out_w) // max(w, 1), out_w - 1)
    cell = row_bin[:, None] * out_w + col_bin[None, :]
    sums = np.bincount(cell.ravel(), weights=px.astype(np.float64).ravel(),
                       minlength=out_h * out_w)
    counts = np.bincount(cell.ravel(), minlength=out_h * out_w)
    return (sums / np.maximum(counts, 1)).reshape(out_h, out_w)


def filter_by_min_resolution(features: DataFrame, min_w: int, min_h: int) -> DataFrame:
    return features.filter((F.col("width") >= min_w) & (F.col("height") >= min_h))


def sample_frames(df: DataFrame, every_n: int, frame_col: str = "frame_idx") -> DataFrame:
    """Keep every n-th frame of a video frame table (modulo on the frame
    index — no shuffle, pure filter)."""
    return df.filter((F.col(frame_col) % every_n) == 0)


def extract_embeddings(
    df: DataFrame, payload_col: str = "payload", dim: int = 64
) -> DataFrame:
    """Media → embedding column, the bridge from multimodal payloads to
    the similarity/ANN layer (``llmops.similarity``): output is
    ``(media_id, embedding array<float>)``, the exact input shape of
    ``cosine_topk`` / ``ivf_topk`` / ``cosine_threshold_pairs_blocked``.

    For decodable raster formats (BMP/PPM/PGM) the embedding is computed
    from the PIXELS: a block-mean downsample to √dim × √dim gray,
    mean-centered and L2-normalized — a real (if simple) perceptual
    feature, so re-encodings of the same image land near each other in
    cosine space regardless of container format. For the FAKE plumbing
    format (no pixels) it falls back to a deterministic digest-seeded
    pseudo-embedding — same payload, same vector, so plumbing tests stay
    reproducible. A learned model drops in by replacing the per-batch
    loop with a forward pass (signature and partitioning unchanged)."""
    import hashlib

    side = int(round(dim ** 0.5))
    if side * side != dim:
        raise ValueError(f"dim must be a perfect square for the pixel path, got {dim}")
    out_schema = "media_id long, embedding array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for buf in pdf[payload_col]:
                buf = bytes(buf)
                _, _, _, px = decode_image(buf)
                if px is not None:
                    v = block_mean_resize(px, side, side).ravel()
                    v = v - v.mean()
                    n = np.linalg.norm(v)
                    # flat (constant-color) images have no structure to
                    # embed; give them a deterministic unit vector
                    v = v / n if n > 0 else _digest_vec(buf, dim)
                else:
                    v = _digest_vec(buf, dim)
                vecs.append(v.astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "embedding": vecs}
            )

    def _digest_vec(buf: bytes, d: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(buf).digest()[:8], "little")
        v = np.random.default_rng(seed).standard_normal(d)
        return v / np.linalg.norm(v)

    return df.select("media_id", payload_col).mapInPandas(fn, out_schema)


# -- WAV (RIFF PCM) --------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id long, channels int, sample_rate int, bits int, "
    "n_samples long, duration_s double, rms double"
)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 → RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2")
    channels = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[dict, np.ndarray]:
    """RIFF PCM → (meta dict, float64 samples in [-1, 1], shape
    (n, channels)). Integer PCM widths 8/16/32 decode; compressed audio
    raises NotImplementedError."""
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("unsupported audio format: only RIFF/WAVE PCM decodes")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16, 32):
        raise NotImplementedError(
            f"WAV codec {audio_fmt}/{bits}-bit not supported: integer PCM only"
        )
    dt = {8: np.uint8, 16: "<i2", 32: "<i4"}[bits]
    raw = np.frombuffer(data, dt)
    raw = raw[: (len(raw) // channels) * channels].reshape(-1, channels)
    if bits == 8:  # 8-bit WAV is unsigned
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        samples = raw.astype(np.float64) / float(2 ** (bits - 1))
    meta = {"channels": channels, "sample_rate": rate, "bits": bits,
            "n_samples": raw.shape[0]}
    return meta, samples


def decode_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAV payloads → typed audio features (mapInPandas, Arrow batches):
    header fields plus duration and RMS level — the filter columns of an
    audio-corpus quality pass (drop silence, clip lengths, resample
    plans) without ever shipping the blob downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf[payload_col]):
                meta, samples = decode_wav(bytes(buf))
                rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
                rows.append(
                    (
                        int(mid),
                        meta["channels"],
                        meta["sample_rate"],
                        meta["bits"],
                        meta["n_samples"],
                        meta["n_samples"] / meta["sample_rate"],
                        rms,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channels", "sample_rate", "bits",
                    "n_samples", "duration_s", "rms",
                ],
            )

    return df.select("media_id", payload_col).mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def chunk_audio(
    df: DataFrame, chunk_bytes: int, payload_col: str = "payload"
) -> DataFrame:
    """Split audio payloads into fixed-size chunk rows —
    ``(media_id, chunk_idx, chunk)`` with ``chunk = payload[idx·size :
    (idx+1)·size]`` — entirely JVM-side: offsets from ``sequence``,
    slices via binary ``substr``; no Python touches the blob.

    This is the standard pre-processing shape for long-audio models
    (fixed-window encoders): downstream per-chunk feature extraction
    parallelizes over rows, and ``concat(chunks ORDER BY chunk_idx)``
    reassembles the original exactly (tested)."""
    n_chunks = F.ceil(F.length(F.col(payload_col)) / F.lit(chunk_bytes)).cast("int")
    # guard n_chunks == 0 (empty payload): sequence(0, -1) is DESCENDING
    # in Spark, which would fabricate two bogus chunk rows
    idx = F.explode(
        F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
            F.array().cast("array<int>")
        )
    ).alias("chunk_idx")
    out = df.select("media_id", payload_col, idx)
    chunk = F.expr(f"substring({payload_col}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})")
    return out.select("media_id", "chunk_idx", chunk.alias("chunk"))
