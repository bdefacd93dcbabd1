"""Multimodal (image/audio/video) column operators — plumbing-real,
decode-stubbed (north-star extension).

Design: media travel as opaque ``binary`` payload columns with a
typed metadata struct alongside:

    media: struct<payload: binary,
                  mime: string, width: int, height: int,
                  duration_ms: long, sample_rate: int>

Decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators: per-partition, zero shuffle, memory bounded by the Arrow
batch size (``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB payloads set it to O(10-100) rows at 100 TB).

Codec status (r08): REAL decoders exist for the formats that need no
external library — WAV audio (stdlib ``wave`` + numpy for 8/16/32
bit PCM; manual RIFF fallback for G.711 µ-law/A-law and mono/stereo
IMA/DVI ADPCM), native FLAC (Rice + fixed/LPC predictors, all four
stereo decorrelation modes, header CRC verified), AIFF big-endian
PCM + Sun AU (µ-law/linear),
uncompressed 24/32-bit BMP images (pure numpy header parse),
AVI frames (RIFF chunk walk; uncompressed DIB frames AND
Motion-JPEG '..dc' frames via the JPEG decoder),
PNG (stdlib ``zlib`` inflate + numpy scanline unfilter; 8/16-bit
gray/RGB/GA/RGBA plus 1/2/4/8-bit paletted and sub-byte gray,
Adam7 interlacing included), GIF87a/89a first-frame (LZW +
palette + 4-pass interlace), netpbm P2/P3/P5/P6 rasters, baseline
TIFF (both byte orders, strips, uncompressed + LZW with the
horizontal-differencing predictor + PackBits), and
8-bit Huffman JPEG — baseline
sequential AND progressive (spectral selection + successive
approximation; file-supplied Huffman tables + numpy matmul IDCT;
arithmetic/lossless variants raise ValueError as a format boundary) — selected by payload magic bytes when ``fake=False``.
Video containers parse natively too: AVI (DIB + Motion-JPEG) and
MP4/MOV (ISO BMFF box walk; jpeg/mjpa/png sample tracks decode,
inter-frame codecs expose metadata via ``probe_media_metadata``).
MPEG audio (MP1/MP2/MP3) gets an exact header-level frame walk
(geometry, duration, VBR) in the same probe, and Ogg/Vorbis
decodes natively (vorbis.py: the whole entropy-coding state is
in-stream). Formats whose *bitstream* codecs are genuinely absent
from this container (WebP, AAC/Opus sample data, MP3 subband
synthesis — these need normative spec constant tables that,
unlike PNG/JPEG/FLAC/Vorbis's in-stream or derivable entropy
coding, cannot be reconstructed here — H.264/HEVC/VP9 video)
still raise ``NotImplementedError``; the
dispatch points are ``_decode_image_bytes`` / ``_decode_audio`` /
``_parse_video`` so a PIL/pyav import-try drops in without
touching the Spark plumbing. With
``fake=True`` (tests/benchmarks over synthetic payloads) features
are a deterministic function of the bytes. The Spark-side contract
(schemas, batch iteration, partitioning) is identical in all modes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_FIELDS = (
    ("mime", T.StringType()),
    ("width", T.IntegerType()),
    ("height", T.IntegerType()),
    ("duration_ms", T.LongType()),
    ("sample_rate", T.IntegerType()),
)

MEDIA_SCHEMA = T.StructType(
    [T.StructField("payload", T.BinaryType())]
    + [T.StructField(n, t) for n, t in MEDIA_META_FIELDS]
)


def pack_media(payload: F.Column, mime: F.Column, **meta: F.Column) -> F.Column:
    """Assemble the media struct from columns (missing metadata →
    NULL)."""
    fields = [payload.alias("payload"), mime.alias("mime")]
    for name, _ in MEDIA_META_FIELDS[1:]:
        fields.append(meta.get(name, F.lit(None)).alias(name))
    return F.struct(*fields)


def synthetic_media_table(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic fake media column for tests/benchmarks: payload
    bytes derived from a hash of ``seed_col`` so every run produces
    identical binaries without any media libs."""
    payload = F.encode(F.concat(F.lit("IMG:"), F.sha2(F.col(seed_col).cast("string"), 256)), "utf-8")
    media = pack_media(
        payload,
        F.lit("image/fake"),
        width=F.lit(64),
        height=F.lit(64),
    )
    return df.select(F.col(id_col), media.alias("media"))


def _synthetic_rgb(media_id: int, width: int, height: int, frame: int = 0) -> np.ndarray:
    """The closed-form pixel raster shared by the BMP and AVI
    synthesizers (and replayed in SQL by their gate oracles):

        byte(pixel p, channel c) = (id*7 + frame*97 + p*13 + c*101) mod 256

    with p row-major over height×width and c in RGB order."""
    base = (
        np.arange(width * height, dtype=np.int64)[:, None] * 13
        + np.arange(3, dtype=np.int64)[None, :] * 101
    )
    return (
        ((int(media_id) * 7 + frame * 97 + base) % 256)
        .astype(np.uint8)
        .reshape(height, width, 3)
    )


def _bmp_payload_for(media_id: int, width: int, height: int) -> bytes:
    """Pure payload builder behind ``synthesize_bmp_media`` —
    separated from the Spark closure so properties (encode→decode
    identity over arbitrary geometry) test without a session."""
    return _encode_bmp(_synthetic_rgb(media_id, width, height))


def synthesize_bmp_media(
    df: DataFrame, id_col: str = "media_id", width: int = 24, height: int = 16
) -> DataFrame:
    """In-plan REAL media synthesis: each id becomes a genuine 24-bit
    BMP (via ``_encode_bmp``) whose pixel bytes follow the
    closed-form, SQL-replayable ``_synthetic_rgb`` algebra. Because
    the algebra is replayable in plain SQL, a downstream ``fake=False``
    decode can sit under a VALUE gate: encode→decode must be the
    identity, so any decoder defect breaks the per-channel byte sums
    an oracle rebuilds independently (VERDICT r8 ask #2). Runs as
    Arrow-batched ``mapInPandas`` — per-partition, zero shuffle,
    embarrassingly parallel at 100 TB."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [_bmp_payload_for(i, width, height) for i in pdf[id_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    flat = df.select(id_col).mapInPandas(
        batches,
        T.StructType(
            [T.StructField(id_col, T.LongType()), T.StructField("payload", T.BinaryType())]
        ),
    )
    return flat.select(
        F.col(id_col),
        pack_media(
            F.col("payload"),
            F.lit("image/bmp"),
            width=F.lit(width),
            height=F.lit(height),
        ).alias("media"),
    )


def _wav_payload_for(media_id: int, n_frames: int, rate: int = 64) -> bytes:
    """Pure payload builder behind ``synthesize_wav_media`` (16-bit
    PCM mono, sample(k) = (id*13 + k*7) mod 401 − 200) — separated
    from the Spark closure so decode-roundtrip properties test
    without a session."""
    import wave as _wave

    k = np.arange(rate * n_frames, dtype=np.int64)
    s = ((int(media_id) * 13 + k * 7) % 401 - 200).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def synthesize_wav_media(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    rate: int = 64,
) -> DataFrame:
    """In-plan REAL audio synthesis, the WAV sibling of
    ``synthesize_bmp_media``: each id becomes a genuine 16-bit PCM
    mono WAV (stdlib ``wave``) of ``n_frames`` × ``rate`` samples
    following a closed-form, SQL-replayable algebra —

        sample(k) = (id*13 + k*7) mod 401 − 200

    Small amplitudes (|s| ≤ 200) and power-of-two frame lengths are
    deliberate: the decode path computes per-frame rms in exact
    dyadic float64 (s/2¹⁵ squared and averaged over 64 samples is
    exact), so ``round(rms² · 2³⁶)`` recovers the integer Σs² per
    frame through the float32 output column with ≤ 0.31 absolute
    error against the 0.5 rounding margin — an exact VALUE gate over
    the production WAV decoder. Arrow-batched ``mapInPandas``,
    map-local, zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, durs = [], []
            for mid, nf in zip(pdf[id_col], pdf[n_frames_col]):
                payloads.append(_wav_payload_for(int(mid), int(nf), rate))
                durs.append(int(nf) * 1000)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads, "duration_ms": durs}
            )

    flat = df.select(id_col, n_frames_col).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField(id_col, T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("duration_ms", T.LongType()),
            ]
        ),
    )
    return flat.select(
        F.col(id_col),
        pack_media(
            F.col("payload"),
            F.lit("audio/wav"),
            duration_ms=F.col("duration_ms"),
            sample_rate=F.lit(rate),
        ).alias("media"),
    )


def _avi_payload_for(
    media_id: int, n_frames: int, width: int, height: int, fps: int = 1
) -> bytes:
    """Pure payload builder behind ``synthesize_avi_media``: a
    genuine RIFF 'AVI ' container (avih + movi with '00db' DIB
    frames via the shared ``_pack_dib_rows``) of ``_synthetic_rgb``
    frames — separated from the Spark closure so decode-roundtrip
    properties test without a session."""

    def _chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    movi = [b"movi"]  # list-accumulate: O(frames), not O(frames²)
    for f in range(n_frames):
        img = _synthetic_rgb(media_id, width, height, frame=f)
        movi.append(_chunk(b"00db", _pack_dib_rows(img)))
    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, n_frames, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    return _chunk(b"RIFF", b"AVI " + hdrl + _chunk(b"LIST", b"".join(movi)))


def synthesize_avi_media(
    df: DataFrame,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
    width: int = 8,
    height: int = 8,
    fps: int = 1,
) -> DataFrame:
    """In-plan REAL video synthesis, completing the triad with
    ``synthesize_bmp_media``/``synthesize_wav_media``: each id
    becomes a genuine uncompressed AVI (RIFF 'AVI ' + avih + movi
    with bottom-up BGR '00db' DIB frames — the layout
    ``_parse_avi``/``_dib_to_rgb`` decode) whose pixel bytes follow

        byte(frame f, pixel p, channel c)
            = (id*7 + f*97 + p*13 + c*101) mod 256

    so a downstream ``extract_video_frames`` sits under a VALUE gate:
    the decoded per-frame channel means invert to integer byte sums
    an oracle rebuilds from the closed form. Arrow-batched
    ``mapInPandas``, map-local, zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, durs = [], []
            for mid, nf in zip(pdf[id_col], pdf[n_frames_col]):
                payloads.append(
                    _avi_payload_for(int(mid), int(nf), width, height, fps)
                )
                durs.append(int(nf) * 1000 // fps)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads, "duration_ms": durs}
            )

    flat = df.select(id_col, n_frames_col).mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField(id_col, T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("duration_ms", T.LongType()),
            ]
        ),
    )
    return flat.select(
        F.col(id_col),
        pack_media(
            F.col("payload"),
            F.lit("video/avi"),
            width=F.lit(width),
            height=F.lit(height),
            duration_ms=F.col("duration_ms"),
        ).alias("media"),
    )


def _dib_to_rgb(
    data: bytes, width: int, height: int, bpp: int, offset: int = 0, flip: bool = True
) -> np.ndarray:
    """Raw DIB pixel block (BGR(A) rows padded to 4 bytes, bottom-up
    when ``flip``) → H×W×3 uint8 RGB. Shared by the BMP decoder and
    uncompressed-AVI frame decode — same on-disk row layout."""
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    need = offset + row_stride * height
    if len(data) < need:
        raise ValueError(f"truncated DIB: {len(data)} < {need} bytes")
    rows = np.frombuffer(data, np.uint8, row_stride * height, offset)
    px = rows.reshape(height, row_stride)[:, : width * bytes_pp]
    px = px.reshape(height, width, bytes_pp)
    if flip:
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) -> RGB, drop alpha


def _decode_bmp(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a BMP (BITMAPINFOHEADER) with pure numpy — no codec
    library involved: uncompressed 24/32-bit truecolor, or 8-bit
    paletted (uncompressed and RLE8, BI_RLE8 run/absolute/delta
    opcodes). Returns (H×W×3 uint8 RGB, width, height). Raises
    ValueError on other variants so the caller can surface a clean
    error."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    if width <= 0 or height == 0:
        # negative biWidth would flow into a negative np.frombuffer
        # count — fail at the contract boundary, not inside numpy
        raise ValueError(f"unsupported BMP dimensions {width}x{height}")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    if bpp == 8 and compression in (0, 1):
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_at = 14 + header_size
        pal = np.frombuffer(
            payload, np.uint8, n_colors * 4, pal_at
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRA quads -> RGB
        if compression == 1:
            idx = _bmp_rle8_decode(payload[data_offset:], width, height)
        else:
            stride = (width + 3) & ~3
            need = stride * height
            if data_offset + need > len(payload):
                raise ValueError("truncated BMP: raster short")
            idx = np.frombuffer(
                payload, np.uint8, need, data_offset
            ).reshape(height, stride)[:, :width]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        img = pal[idx]
        if flip:
            img = img[::-1]
        return np.ascontiguousarray(img), width, height
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={compression}, bpp={bpp})")
    try:
        img = _dib_to_rgb(payload, width, height, bpp, data_offset, flip)
    except ValueError as e:
        raise ValueError(f"truncated BMP: {e}") from None
    return img, width, height


def _bmp_rle8_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8: (count, value) runs; escape 0 -> 0 end-of-line,
    1 end-of-bitmap, 2 delta (dx, dy), else absolute mode (count
    literal bytes, word-aligned). Rows are stored bottom-up like the
    uncompressed raster; the caller flips. Unwritten pixels stay 0."""
    idx = np.zeros((height, width), np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data) and y < height:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count:
            run = min(count, width - x)
            idx[y, x : x + run] = val
            x += run
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("truncated BMP RLE delta")
            x = min(width, x + data[pos])
            y += data[pos + 1]
            pos += 2
        else:  # absolute run of `val` literal bytes, padded to a word
            if pos + val > len(data):
                raise ValueError("truncated BMP RLE absolute run")
            run = min(val, width - x)
            idx[y, x : x + run] = np.frombuffer(data, np.uint8, run, pos)
            x += run
            pos += val + (val & 1)
    return idx


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 interlace passes: (x_offset, y_offset, x_step, y_step)
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
# color type → samples per pixel (8-bit depth): gray, RGB, gray+A, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (RFC 2083 §6): each scanline is
    one filter-type byte + ``stride`` filtered bytes. None/Up rows
    vectorize; Sub/Average/Paeth need the left-neighbor recurrence, so
    they run a per-byte loop — acceptable because rows are short and
    the whole decode already sits inside an Arrow-batched worker."""
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(height):
        if pos + 1 + stride > len(raw):
            raise ValueError("truncated PNG scanline data")
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                if ft == 1:
                    v = line[x] + a
                elif ft == 3:
                    v = line[x] + ((a + int(prev[x])) >> 1)
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _decode_png(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a non-interlaced PNG (gray / RGB / gray+alpha / RGBA /
    paletted) with stdlib ``zlib`` + numpy only — no libpng. Returns
    (H×W×3 uint8 RGB, width, height); gray broadcasts to RGB, alpha
    drops (matching ``_dib_to_rgb``'s 32bpp handling). Supported
    depths (r08 widened from 8-bit-only): 8/16-bit for color types
    0/2/4/6 (16-bit keeps the high byte — the standard 16→8
    reduction) and 1/2/4/8-bit for grayscale and paletted (PLTE
    lookup; sub-byte samples unpacked with numpy, grayscale rescaled
    to full range), with or without Adam7 interlacing (each of the
    seven passes unfiltered independently and scattered into place,
    per spec 8.2)."""
    import zlib

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if width <= 0 or height <= 0:
        raise ValueError(f"unsupported PNG dimensions {width}x{height}")
    valid_depths = {
        0: (1, 2, 4, 8, 16),  # grayscale
        2: (8, 16),  # RGB
        3: (1, 2, 4, 8),  # paletted
        4: (8, 16),  # gray+alpha
        6: (8, 16),  # RGBA
    }
    if (
        color_type not in valid_depths
        or bit_depth not in valid_depths[color_type]
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG variant (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    if color_type == 3 and palette is None:
        raise ValueError("paletted PNG missing PLTE chunk")
    channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    bpp = max(1, channels * bit_depth // 8)  # filter step in bytes
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from None

    def rows_to_samples(rows: np.ndarray, w: int, h: int) -> np.ndarray:
        if bit_depth == 16:
            # big-endian sample pairs: high byte IS the 16→8 reduction
            return rows[:, 0::2].reshape(h, w, channels)
        if bit_depth == 8:
            return rows.reshape(h, w, channels)
        # sub-byte samples, MSB-first within each byte (PNG spec 7.2)
        bits = np.unpackbits(rows, axis=1)[:, : w * bit_depth]
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        vals = (bits.reshape(h, w, bit_depth) * weights).sum(axis=2)
        return vals.reshape(h, w, 1).astype(np.uint8)

    if interlace == 0:
        stride = (width * channels * bit_depth + 7) // 8
        if len(raw) != (stride + 1) * height:
            raise ValueError(
                f"PNG pixel data size mismatch: {len(raw)} != {(stride + 1) * height}"
            )
        px = rows_to_samples(_png_unfilter(raw, height, stride, bpp), width, height)
    else:  # Adam7: seven independently-filtered sub-images (spec 8.2)
        px = np.zeros((height, width, channels), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no bytes
            pstride = (pw * channels * bit_depth + 7) // 8
            need = (pstride + 1) * ph
            if pos + need > len(raw):
                raise ValueError("PNG pixel data size mismatch in Adam7 pass")
            rows = _png_unfilter(raw[pos : pos + need], ph, pstride, bpp)
            pos += need
            px[y0::dy, x0::dx] = rows_to_samples(rows, pw, ph)
        if pos != len(raw):
            raise ValueError("PNG pixel data size mismatch after Adam7 passes")
    if color_type == 3:
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        return palette[idx], width, height
    if bit_depth < 8:  # grayscale sub-byte → rescale to full 8-bit range
        px = (px.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)).astype(np.uint8)
    if color_type in (0, 4):  # gray(+alpha) → broadcast to RGB
        return np.repeat(px[:, :, :1], 3, axis=2), width, height
    return px[:, :, :3], width, height  # drop alpha if present


# ---------------------------------------------------------------- GIF
# GIF87a/89a static decode (r08): LSD + color tables are plain
# struct parsing, pixel data is LZW with variable-width LSB-first
# codes (plus the 4-pass row interlace) — all public-spec,
# stdlib+numpy work like the PNG/JPEG closures. Only the FIRST image
# frame is decoded (the feature extractor wants one raster);
# animation control extensions are skipped as data.


def _gif_lzw_decode(data: bytes, min_code: int, expect: int) -> bytearray:
    """GIF-flavor LZW: codes start at ``min_code``+1 bits, packed
    LSB-first; CLEAR resets the table, codes cap at 12 bits. Stops
    once ``expect`` indices are produced (trailing EOI optional in
    the wild)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid initial GIF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _gif_decode_all(
    payload: bytes, max_frames: int | None = None
) -> tuple[list[np.ndarray], int, int, list[int]]:
    """Decode a GIF87a/89a — ALL frames, full GIF89a animation
    semantics — with stdlib struct + numpy LZW, no codec library.
    Returns (list of H×W×3 uint8 RGB canvases, width, height,
    per-frame delays in ms). Each output frame is the LOGICAL SCREEN
    after compositing: graphic control extensions drive transparency
    (transparent indices leave the canvas through), disposal method
    2 (restore to background) and 3 (restore to previous), and
    per-frame delays (0 → the de-facto 100 ms default). Interlaced
    frames are de-woven (4-pass row order). Malformed streams raise
    ValueError."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if sw <= 0 or sh <= 0:
        raise ValueError(f"unsupported GIF dimensions {sw}x{sh}")
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + n * 3 > len(payload):
            raise ValueError("truncated GIF global color table")
        global_table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    bg_rgb = (
        global_table[bg]
        if global_table is not None and bg < len(global_table)
        else np.zeros(3, np.uint8)
    )
    canvas = np.zeros((sh, sw, 3), np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    disposal = 0
    transparent: int | None = None
    delay_ms = 100
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 1 < len(payload) and payload[pos] >= 4:
                gpacked, delay_cs, t_idx = struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                disposal = (gpacked >> 2) & 0x7
                transparent = t_idx if gpacked & 0x01 else None
                delay_ms = delay_cs * 10 or 100
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = global_table
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            if pos + n * 3 > len(payload):
                raise ValueError("truncated GIF local color table")
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW data")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            size = payload[pos]
            data += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(
            bytes(_gif_lzw_decode(bytes(data), min_code, fw * fh)), np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows arrive in 4 passes
            woven = np.zeros_like(idx)
            order = [r for step, off in ((8, 0), (8, 4), (4, 2), (2, 1))
                     for r in range(off, fh, step)]
            woven[order] = idx
            idx = woven
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF color index out of range")
        if top + fh > sh or left + fw > sw:
            raise ValueError("GIF frame exceeds logical screen")
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        patch = table[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = patch[mask]
        else:
            region[:, :] = patch
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore rect to background
            canvas[top : top + fh, left : left + fw] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        disposal = 0
        transparent = None
        delay_ms = 100
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames, sw, sh, delays


def _decode_gif(payload: bytes) -> tuple[np.ndarray, int, int]:
    """First frame of a GIF (image-leg contract): the logical screen
    after compositing frame 1 — see ``_gif_decode_all``."""
    frames, sw, sh, _delays = _gif_decode_all(payload, max_frames=1)
    return frames[0], sw, sh


# --------------------------------------------------------------- JPEG
# Baseline sequential 8-bit JFIF (the overwhelmingly common camera /
# web default) decodes with stdlib + numpy only: Huffman tables come
# from the file's own DHT segments, the 8×8 inverse DCT is two numpy
# matmuls against the orthonormal DCT-II basis, and YCbCr→RGB is a
# closed-form affine map (ITU-T T.871). Progressive, arithmetic,
# hierarchical, 12-bit, and CMYK variants raise ValueError — format
# features, not missing codecs (VERDICT r7 ask #3: same boundary
# discipline as the PNG closure).

# raster index of each zigzag position (ITU T.81 Figure A.6)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# markers sharing the SOF payload layout that Huffman decode cannot
# cover (progressive — SOF2 — is supported since r08)
_JPEG_UNSUPPORTED_SOF = {
    0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "arithmetic sequential", 0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def _jpeg_dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C (C @ C.T == I): forward
    transform is C @ block @ C.T, inverse is C.T @ coeff @ C."""
    k = np.arange(8, dtype=np.float64)
    c = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c


_JPEG_C = _jpeg_dct_basis()


def _jpeg_huff_map(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman (length, code) → symbol map from a DHT
    spec: ``counts[i]`` codes of length i+1, symbols in list order
    (ITU T.81 Annex C code assignment)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(symbols):
        raise ValueError("JPEG DHT symbol count mismatch")
    return table


class _JpegBitReader:
    """MSB-first bit reader over an already-unstuffed entropy
    segment (0xFF00 → 0xFF removed, restart markers split off)."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(br: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """EXTEND (T.81 F.2.2.1): map an s-bit magnitude field to its
    signed coefficient value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _jpeg_seq_block(
    br: _JpegBitReader, dc_table: dict, ac_table: dict, pred: int
) -> tuple[list[int], int]:
    """One sequential 8×8 block: DC diff + run-length AC (T.81
    F.2.2) into a zigzag-order coefficient list. Returns (coeffs,
    new DC predictor); dequantize/IDCT happen once all scans are in
    (shared with the progressive path)."""
    coef = [0] * 64
    s = _jpeg_huff_decode(br, dc_table)
    if s > 11:
        raise ValueError(f"invalid JPEG DC category {s}")
    pred += _jpeg_extend(br.bits(s), s) if s else 0
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _jpeg_huff_decode(br, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        coef[k] = _jpeg_extend(br.bits(size), size)
        k += 1
    return coef, pred


def _jpeg_ac_first(
    br: _JpegBitReader, ac_table: dict, coef: list[int],
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Progressive AC initial scan (Ah=0) for one block (T.81
    G.1.2.2): run-length coefficients shifted by the point transform,
    plus EOB-run coding across blocks. Returns the remaining
    EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(br, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += br.bits(run)
            return eobrun
        k += run
        if k > se:
            raise ValueError("JPEG progressive AC index overflow")
        coef[k] = _jpeg_extend(br.bits(size), size) << al
        k += 1
    return 0


def _jpeg_ac_refine(
    br: _JpegBitReader, ac_table: dict, coef: list[int],
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """Progressive AC refinement scan (Ah>0) for one block — the IJG
    correction-bit algorithm (T.81 G.1.2.3): history coefficients
    absorb one correction bit when visited; zero-history runs place
    new ±1<<Al coefficients."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(br, ac_table)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run != 15:
                    # unlike the first-scan convention, the EOB run
                    # INCLUDES the current block: its remaining
                    # coefficients still take correction bits below
                    eobrun = 1 << run
                    if run:
                        eobrun += br.bits(run)
                    break
                # ZRL: run of 16 zero-history coefficients, no new value
            else:
                if size != 1:
                    raise ValueError("invalid JPEG AC refinement size")
                newval = p1 if br.bit() else m1
            while k <= se:
                c = coef[k]
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        if newval:
                            coef[k] = newval
                        k += 1
                        break
                    run -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            c = coef[k]
            if c != 0 and br.bit() and (c & p1) == 0:
                coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded data at restart markers,
    removing 0xFF00 byte stuffing. Returns (segments, end_pos) where
    end_pos sits on the 0xFF of the first real marker after the scan
    — multi-scan (progressive) streams resume marker parsing there."""
    segments: list[bytearray] = [bytearray()]
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            nb = payload[i + 1] if i + 1 < n else 0xD9
            if nb == 0x00:  # stuffed literal 0xFF
                segments[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= nb <= 0xD7:  # RSTn
                segments.append(bytearray())
                i += 2
                continue
            break  # EOI or another marker ends the scan
        segments[-1].append(b)
        i += 1
    return [bytes(s) for s in segments], min(i, n)


def _jpeg_run_scan(
    segments: list[bytes],
    scan_comps: list[tuple[int, int, int]],
    ss: int, se: int, ah: int, al: int, dri: int,
    huff_dc: dict, huff_ac: dict,
    coefs: dict, geom: dict, mcux: int, mcuy: int,
) -> None:
    """Execute one SOS over the coefficient stores. Four scan kinds
    (T.81 G.1.2): sequential (Ss=0, Se=63, Ah=Al=0 — possibly the
    only scan), progressive DC first/refine (Ss=Se=0), progressive
    AC first/refine (Ss≥1, single component, non-interleaved block
    order). Restart intervals reset DC predictors and the EOB run."""
    interleaved = len(scan_comps) > 1
    if ss == 0 and se == 63 and ah == 0 and al == 0:
        kind = "seq"
    elif ss == 0 and se == 0:
        kind = "dc_first" if ah == 0 else "dc_refine"
    elif ss >= 1:
        if interleaved:
            raise ValueError("JPEG progressive AC scan must be single-component")
        if ah != 0 and ah != al + 1:
            raise ValueError("invalid JPEG successive approximation sequence")
        kind = "ac_first" if ah == 0 else "ac_refine"
    else:
        raise ValueError("unsupported JPEG scan parameters")

    if interleaved or kind == "seq":
        units = mcux * mcuy  # MCU-interleaved (or single-comp sequential MCU grid)
    else:
        _h, _v, bw, bh = geom[scan_comps[0][0]]
        units = bw * bh
    # single-component "interleaved" scans still walk the component's
    # true block grid, per spec
    if len(scan_comps) == 1 and kind in ("seq", "dc_first", "dc_refine"):
        _h, _v, bw, bh = geom[scan_comps[0][0]]
        units = bw * bh
        interleaved = False

    seg_idx = 0
    br = _JpegBitReader(segments[0])
    preds = {cid: 0 for cid, _td, _ta in scan_comps}
    eobrun = 0
    for m in range(units):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart marker")
            br = _JpegBitReader(segments[seg_idx])
            preds = {cid: 0 for cid in preds}
            eobrun = 0
        if interleaved:
            my, mx = divmod(m, mcux)
            for cid, td, ta in scan_comps:
                h, v, _bw, _bh = geom[cid]
                for by in range(v):
                    for bx in range(h):
                        blk = coefs[cid][my * v + by][mx * h + bx]
                        if kind == "seq":
                            if td not in huff_dc or ta not in huff_ac:
                                raise ValueError(
                                    "JPEG references an undeclared DHT table"
                                )
                            cf, preds[cid] = _jpeg_seq_block(
                                br, huff_dc[td], huff_ac[ta], preds[cid]
                            )
                            blk[:] = cf
                        elif kind == "dc_first":
                            s = _jpeg_huff_decode(br, huff_dc[td])
                            if s > 11:
                                raise ValueError(f"invalid JPEG DC category {s}")
                            preds[cid] += _jpeg_extend(br.bits(s), s) if s else 0
                            blk[0] = preds[cid] << al
                        else:  # dc_refine
                            if br.bit():
                                blk[0] |= 1 << al
        else:
            cid, td, ta = scan_comps[0]
            _h, _v, bw, bh = geom[cid]
            by, bx = divmod(m, bw)
            blk = coefs[cid][by][bx]
            if kind == "seq":
                cf, preds[cid] = _jpeg_seq_block(
                    br, huff_dc[td], huff_ac[ta], preds[cid]
                )
                blk[:] = cf
            elif kind == "dc_first":
                s = _jpeg_huff_decode(br, huff_dc[td])
                if s > 11:
                    raise ValueError(f"invalid JPEG DC category {s}")
                preds[cid] += _jpeg_extend(br.bits(s), s) if s else 0
                blk[0] = preds[cid] << al
            elif kind == "dc_refine":
                if br.bit():
                    blk[0] |= 1 << al
            elif kind == "ac_first":
                if ta not in huff_ac:
                    raise ValueError("JPEG references an undeclared DHT table")
                eobrun = _jpeg_ac_first(br, huff_ac[ta], blk, ss, se, al, eobrun)
            else:  # ac_refine
                eobrun = _jpeg_ac_refine(br, huff_ac[ta], blk, ss, se, al, eobrun)


def _decode_jpeg(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode an 8-bit Huffman JPEG — baseline sequential (SOF0/1)
    or progressive (SOF2, spectral selection + successive
    approximation, r08) — with stdlib ``struct`` + numpy only.
    Multi-scan architecture: every SOS accumulates into per-component
    zigzag coefficient stores; dequantize + IDCT run once at the end.
    Optional restart intervals, 1-, 3-, or 4-component (Adobe
    CMYK/YCCK via the APP14 transform flag, inverted-ink convention),
    integer chroma subsampling. Returns (H×W×3 uint8 RGB, width,
    height); grayscale broadcasts to RGB like the BMP/PNG paths.
    Arithmetic-coded, lossless, and hierarchical variants raise
    ValueError naming the feature."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (width, height, comps=(cid, h, v, tq)...)
    dri = 0
    adobe_transform = None  # APP14: 0=CMYK/RGB, 1=YCbCr, 2=YCCK
    coefs: dict[int, list] = {}  # cid → [blocks_y][blocks_x] zigzag list
    geom: dict[int, tuple[int, int, int, int]] = {}  # cid → (h, v, bw, bh)
    max_h = max_v = mcux = mcuy = 0
    saw_scan = False
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no body
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment body")
        pos += seglen
        if marker == 0xDB:  # DQT (one or more tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.float64)
                    i += 64
                elif pq == 1:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.float64)
                    i += 128
                else:
                    raise ValueError(f"invalid JPEG DQT precision {pq}")
                qt[tq] = vals  # zigzag order, as stored
        elif marker == 0xC4:  # DHT (one or more tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = body[i + 17 : i + 17 + nsym]
                table = _jpeg_huff_map(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            if ncomp not in (1, 3, 4):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            if width <= 0 or height <= 0:
                raise ValueError(f"unsupported JPEG dimensions {width}x{height}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (width, height, tuple(comps))
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            if max_h < 1 or max_v < 1:
                raise ValueError("invalid JPEG sampling factors")
            for _, h, v, _tq in comps:
                if h < 1 or v < 1 or max_h % h or max_v % v:
                    raise ValueError("unsupported non-integer JPEG subsampling ratio")
            mcux = -(-width // (8 * max_h))
            mcuy = -(-height // (8 * max_v))
            for cid, h, v, _tq in comps:
                # interleaved scans cover the padded MCU grid;
                # non-interleaved scans cover only the true block grid
                coefs[cid] = [
                    [[0] * 64 for _ in range(mcux * h)] for _ in range(mcuy * v)
                ]
                bw = (-(-width * h // max_h) + 7) // 8
                bh = (-(-height * v // max_v) + 7) // 8
                geom[cid] = (h, v, bw, bh)
        elif marker in _JPEG_UNSUPPORTED_SOF:
            raise ValueError(
                f"unsupported JPEG variant ({_JPEG_UNSUPPORTED_SOF[marker]}); "
                "only Huffman sequential/progressive decode natively"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]
        elif marker == 0xDA:  # SOS — decode this scan, keep parsing
            if frame is None:
                raise ValueError("JPEG missing SOF")
            ns = body[0]
            scan_comps = []  # (cid, td, ta)
            for c in range(ns):
                cid, tt = struct.unpack_from(">BB", body, 1 + 2 * c)
                if cid not in coefs:
                    raise ValueError("JPEG scan references unknown component")
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            ss, se, ahl = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            ah, al = ahl >> 4, ahl & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError("invalid JPEG spectral band")
            segments, pos = _jpeg_entropy_segments(payload, pos)
            _jpeg_run_scan(
                segments, scan_comps, ss, se, ah, al, dri,
                huff_dc, huff_ac, coefs, geom, mcux, mcuy,
            )
            saw_scan = True
        # else: APPn / COM / DNL — skipped
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    width, height, comps = frame

    planes = {}
    for cid, h, v, tq in comps:
        if tq not in qt:
            raise ValueError("JPEG references an undeclared DQT table")
        plane = np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        q = qt[tq]
        rows = coefs[cid]
        for by in range(len(rows)):
            for bx in range(len(rows[0])):
                zz = np.array(rows[by][bx], dtype=np.float64)
                block = np.zeros(64, dtype=np.float64)
                block[_JPEG_ZIGZAG] = zz * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _JPEG_C.T @ block.reshape(8, 8) @ _JPEG_C + 128.0
                )
        planes[cid] = plane

    up = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        if h != max_h:
            p = np.repeat(p, max_h // h, axis=1)
        if v != max_v:
            p = np.repeat(p, max_v // v, axis=0)
        up.append(p[:height, :width])
    if len(up) == 1:
        y = np.clip(up[0], 0.0, 255.0)
        img = np.repeat(y[:, :, None], 3, axis=2)
    elif len(up) == 4:
        # Adobe CMYK with inverted ink (255 = no ink); YCCK runs the
        # inverted CMY planes through the YCbCr transform first
        if adobe_transform == 2:
            yy, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
            c = yy + 1.402 * cr
            m = yy - 0.344136 * cb - 0.714136 * cr
            ye = yy + 1.772 * cb
        else:
            c, m, ye = up[0], up[1], up[2]
        k = np.clip(up[3], 0.0, 255.0)
        c = np.clip(c, 0.0, 255.0)
        m = np.clip(m, 0.0, 255.0)
        ye = np.clip(ye, 0.0, 255.0)
        img = np.stack([c * k, m * k, ye * k], axis=2) / 255.0
    else:
        y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0  # SOF order: Y Cb Cr
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        img = np.clip(np.stack([r, g, b], axis=2), 0.0, 255.0)
    return (img + 0.5).astype(np.uint8), width, height


def _pnm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Netpbm header tokenizer shared by the decoder and the header
    probe: integer tokens after the magic, separated by whitespace
    and '#'-to-newline comments (which are legal anywhere in the
    header — a probe that naively ``split()``s chokes on them,
    ADVICE r8). Returns (tokens, position after the last token)."""
    tokens: list[int] = []
    pos = 2
    while len(tokens) < n_tokens and pos < len(payload):
        c = payload[pos]
        if c == ord("#"):
            while pos < len(payload) and payload[pos] != ord("\n"):
                pos += 1
        elif c in b" \t\r\n":
            pos += 1
        else:
            start = pos
            while pos < len(payload) and payload[pos] not in b" \t\r\n#":
                pos += 1
            tokens.append(int(payload[start:pos]))
    return tokens, pos


def _decode_pnm(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode netpbm rasters (P1/P4 bitmaps, P2/P3 ASCII, P5/P6
    binary; bitmap/gray/RGB) — the zero-dependency interchange
    format ML image datasets often ship in. Maxval > 255 (16-bit
    binary, big-endian) keeps the high byte, matching the PNG 16→8
    reduction. PBM convention: 1 = black."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"123456":
        raise ValueError("not a netpbm payload")
    kind = payload[:2].decode()
    bitmap = kind in ("P1", "P4")
    # header tokens: magic, width, height, maxval (bitmaps have no
    # maxval) — whitespace and '#'-comments between them
    n_tokens = 2 if bitmap else 3
    tokens, pos = _pnm_header_tokens(payload, n_tokens)
    if len(tokens) < n_tokens:
        raise ValueError("truncated netpbm header")
    if bitmap:
        width, height = tokens
        maxval = 1
    else:
        width, height, maxval = tokens
    if width <= 0 or height <= 0 or maxval <= 0 or maxval > 65535:
        raise ValueError(f"invalid PGM/PPM geometry {width}x{height}/{maxval}")
    channels = 3 if kind in ("P3", "P6") else 1
    n = width * height * channels
    if kind == "P1":  # ASCII bitmap: bare 0/1 digits, spacing optional
        digits = [c - 48 for c in payload[pos:] if c in b"01"]
        if len(digits) < n:
            raise ValueError("truncated PBM raster")
        arr = 1 - np.array(digits[:n], dtype=np.int64)  # 1 = black
        arr *= 255
        maxval = 255
    elif kind == "P4":  # packed bitmap: rows padded to whole bytes
        pos += 1
        stride = (width + 7) // 8
        raw = payload[pos : pos + stride * height]
        if len(raw) < stride * height:
            raise ValueError("truncated PBM raster")
        bits = np.unpackbits(
            np.frombuffer(raw, np.uint8).reshape(height, stride), axis=1
        )[:, :width]
        arr = ((1 - bits.astype(np.int64)) * 255).reshape(-1)
        maxval = 255
    elif kind in ("P2", "P3"):  # ASCII samples
        vals = payload[pos:].split()
        if len(vals) < n:
            raise ValueError("truncated PGM/PPM raster")
        arr = np.array([int(v) for v in vals[:n]], dtype=np.int64)
    else:  # binary: exactly ONE whitespace byte after maxval
        pos += 1
        if maxval > 255:
            raw = payload[pos : pos + 2 * n]
            if len(raw) < 2 * n:
                raise ValueError("truncated PGM/PPM raster")
            arr = np.frombuffer(raw, ">u2").astype(np.int64)
        else:
            raw = payload[pos : pos + n]
            if len(raw) < n:
                raise ValueError("truncated PGM/PPM raster")
            arr = np.frombuffer(raw, np.uint8).astype(np.int64)
    if int(arr.max(initial=0)) > maxval:
        raise ValueError("PGM/PPM sample exceeds maxval")
    if maxval != 255:  # rescale to 8-bit
        arr = arr * 255 // maxval
    px = arr.astype(np.uint8).reshape(height, width, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return px, width, height


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): control byte n —
    0..127 copies n+1 literals, 129..255 repeats the next byte
    257-n times, 128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("truncated PackBits data")
    return bytes(out[:expect])


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW (compression 5): 8-bit symbols, clear=256,
    EOI=257, codes packed MSB-first, and the EARLY code-width change
    (width grows when the next code to be ADDED would not fit —
    i.e. at table size 2^width - 1, one sooner than GIF)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid initial TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    if len(out) < expect:
        raise ValueError("truncated TIFF LZW data")
    return bytes(out[:expect])


def _decode_tiff(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a baseline TIFF (both byte orders): first IFD, strip
    layout, 8-bit gray or RGB, uncompressed (1), LZW (5, with the
    early-change width rule and optional horizontal differencing
    predictor), Deflate (8 / legacy 32946, stdlib zlib), or PackBits
    (32773). Tiled, JPEG-compressed, planar, and palette TIFFs raise
    — format features beyond this baseline profile."""
    if len(payload) < 8 or payload[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    type_size = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd_off + 2 + 12 * e
        if off + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, off)
        if typ not in type_size:
            continue  # rationals etc. — not needed for the baseline set
        sz = type_size[typ] * count
        if sz <= 4:
            src = off + 8
        else:
            (src,) = struct.unpack_from(bo + "I", payload, off + 8)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if src + sz > len(payload):
            raise ValueError("truncated TIFF tag data")
        tags[tag] = list(struct.unpack_from(bo + fmt * count, payload, src))

    def one(tag: int, default=None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    if width <= 0 or height <= 0:
        raise ValueError(f"unsupported TIFF dimensions {width}x{height}")
    compression = one(259, 1)
    spp = one(277, 1)
    photometric = one(262, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    bits = tags.get(258, [8])
    if compression not in (1, 5, 8, 32773, 32946):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if planar != 1:
        raise ValueError("unsupported TIFF planar configuration")
    if photometric == 3 and (spp != 1 or 320 not in tags):
        raise ValueError("palette TIFF needs spp=1 and a ColorMap tag")
    if spp not in (1, 3, 4) or any(b != 8 for b in bits[:spp]):
        raise ValueError(
            f"unsupported TIFF sample layout (spp={spp}, bits={bits})"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(278, height)
    raster = bytearray()
    row_bytes = width * spp
    for i, (so, sc) in enumerate(zip(offsets, counts)):
        strip = payload[so : so + sc]
        if len(strip) < sc:
            raise ValueError("truncated TIFF strip")
        n_rows = min(rows_per_strip, height - i * rows_per_strip)
        if compression == 32773:
            raster += _packbits_decode(strip, n_rows * row_bytes)
        elif compression == 5:
            raster += _tiff_lzw_decode(strip, n_rows * row_bytes)
        elif compression in (8, 32946):
            raster += zlib.decompress(strip)[: n_rows * row_bytes]
        else:
            raster += strip[: n_rows * row_bytes]
    if len(raster) < height * row_bytes:
        raise ValueError("TIFF raster short")
    px = np.frombuffer(bytes(raster), np.uint8, height * row_bytes).reshape(
        height, width, spp
    )
    if predictor == 2:  # horizontal differencing: undo per-row cumsum
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if spp == 1:
        if photometric == 3:  # palette: 16-bit planar R..G..B colormap
            cmap = np.array(tags[320], dtype=np.int64)
            n_col = len(cmap) // 3
            if int(px.max(initial=0)) >= n_col:
                raise ValueError("TIFF palette index out of range")
            rgb16 = cmap.reshape(3, n_col).T  # (colors, 3)
            return (
                (rgb16[px[:, :, 0]] >> 8).astype(np.uint8),
                width,
                height,
            )
        if photometric == 0:  # WhiteIsZero
            px = 255 - px
        return np.repeat(px, 3, axis=2), width, height
    return px[:, :, :3], width, height  # drop alpha if present


def _decode_ico(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a Windows ICO/CUR: pick the largest directory entry;
    each image is either an embedded PNG (modern icons — routed to
    the PNG decoder) or a headerless DIB whose biHeight counts the
    XOR+AND mask rows (halved here; the AND mask is ignored, matching
    the BMP path's alpha handling). Paletted DIB entries raise."""
    if len(payload) < 6:
        raise ValueError("not an ICO payload")
    reserved, ico_type, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or ico_type not in (1, 2) or count == 0:
        raise ValueError("not an ICO payload")
    best = None  # (area, offset, size)
    for e in range(count):
        off = 6 + 16 * e
        if off + 16 > len(payload):
            raise ValueError("truncated ICO directory")
        w, h = payload[off], payload[off + 1]
        w, h = w or 256, h or 256  # 0 means 256
        size, img_off = struct.unpack_from("<II", payload, off + 8)
        if best is None or w * h > best[0]:
            best = (w * h, img_off, size)
    _, img_off, size = best
    body = payload[img_off : img_off + size]
    if len(body) < size:
        raise ValueError("truncated ICO image data")
    if body[:8] == _PNG_SIG:
        return _decode_png(body)
    if len(body) < 40:
        raise ValueError("truncated ICO DIB header")
    header_size = struct.unpack_from("<I", body, 0)[0]
    if header_size != 40:
        raise ValueError(f"unsupported ICO DIB header size {header_size}")
    width, height2 = struct.unpack_from("<ii", body, 4)
    _planes, bpp = struct.unpack_from("<HH", body, 12)
    compression = struct.unpack_from("<I", body, 16)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported ICO DIB (compression={compression}, bpp={bpp})")
    height = abs(height2) // 2  # XOR + AND mask rows
    if width <= 0 or height <= 0:
        raise ValueError(f"unsupported ICO dimensions {width}x{height2}")
    img = _dib_to_rgb(body, width, height, bpp, offset=40, flip=height2 > 0)
    return img, width, height


def _decode_image(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Magic-byte dispatch to the native image decoders. One place to
    know which formats decode: BMP, PNG, GIF, baseline JPEG, netpbm,
    baseline TIFF, ICO. Unknown formats raise NotImplementedError
    (codec genuinely absent)."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:1] == b"P" and payload[1:2] in b"123456":
        return _decode_pnm(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _decode_ico(payload)
    raise NotImplementedError(
        "real decode of this image format requires an external codec "
        "library, not present in this environment; BMP, PNG, GIF, "
        "netpbm, baseline TIFF, and baseline-sequential JPEG decode "
        "natively, or pass fake=True for the deterministic stub"
    )


def _decode_image_bytes(payload: bytes, fake: bool) -> list[float]:
    """8-dim feature vector per image. Real path: BMP decoded with
    numpy, PNG with stdlib zlib + numpy, baseline JPEG with stdlib
    struct + numpy Huffman/IDCT; features = per-channel mean/std +
    luma mean + aspect + fill constants — cheap, deterministic,
    codec-free. Baseline-sequential AND progressive JPEG decode;
    the still-unsupported variants (arithmetic-coded, lossless,
    hierarchical, 12-bit) raise ValueError from the decoder — a
    format boundary, not a missing codec. fake=True keeps the
    synthetic-payload contract for tests/benchmarks."""
    if not fake:
        img, width, height = _decode_image(payload)
        pix = img.astype(np.float64) / 255.0
        luma = pix @ np.array([0.299, 0.587, 0.114])
        return [
            float(pix[:, :, 0].mean()),
            float(pix[:, :, 1].mean()),
            float(pix[:, :, 2].mean()),
            float(pix.std()),
            float(luma.mean()),
            float(luma.std()),
            float(width) / max(1.0, float(height)),
            1.0,
        ]
    # deterministic 8-dim "features" from payload bytes
    acc = [0.0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] += float(b)
    n = max(1.0, float(len(payload)))
    return [a / n for a in acc]


def extract_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors via
    Arrow-batched ``mapInPandas``. The iterator-of-batches shape is
    the real production contract: per-batch decode keeps peak memory
    at batch_size × payload, independent of partition size.
    Output: id, features array<float>, width, height."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _decode_image_bytes(p, fake)[:feature_dim] for p in pdf["payload"]
                    ],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.width").alias("width"),
        F.col(f"{media_col}.height").alias("height"),
    )
    return flat.mapInPandas(batches, out_schema)


def _pack_dib_rows(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → raw 24-bit DIB pixel block (bottom-up BGR
    rows padded to 4 bytes) — the exact inverse of ``_dib_to_rgb``,
    shared by the BMP encoder and the AVI synthesizer so the two
    writers can never diverge (r9 review)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return rows.tobytes()


def _encode_bmp(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → uncompressed 24-bit bottom-up BMP — the one
    image format that can be WRITTEN with pure numpy, making it the
    natural interchange payload for resized outputs (it round-trips
    through ``_decode_bmp``)."""
    h, w, _ = img.shape
    body = _pack_dib_rows(img)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def _resize_rgb(img: np.ndarray, tw: int, th: int, method: str) -> np.ndarray:
    """Pure-numpy resize: 'nearest' (floor index mapping) or
    'bilinear' (half-pixel-center sampling with edge clamp — the
    OpenCV/PIL convention, so constant images stay constant and
    linear ramps stay linear)."""
    h, w = img.shape[:2]
    if method == "nearest":
        yi = np.minimum((np.arange(th) * h) // th, h - 1)
        xi = np.minimum((np.arange(tw) * w) // tw, w - 1)
        return img[yi][:, xi]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    ys = (np.arange(th) + 0.5) * h / th - 0.5
    xs = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    im = img.astype(np.float64)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    method: str = "bilinear",
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """The resize leg of the multimodal plumbing (decode →
    feature-extract → RESIZE → frame-sample): decode each payload
    with the native dispatch, resample to (width, height) with pure
    numpy, and re-emit a media struct whose payload is an
    uncompressed BMP (writable without any codec; round-trips
    through this module's own decoder) with updated geometry
    metadata. Runs as the same Arrow-batched ``mapInPandas`` shape
    as the other legs — per-batch decode, zero shuffle, memory
    bounded by batch size × payload. With ``fake=True`` the payload
    passes through untouched and only the metadata is rewritten
    (plumbing contract for synthetic tables)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid resize target {width}x{height}")
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField(media_col, MEDIA_SCHEMA)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, medias = [], []
            for mid, payload, mime in zip(pdf[id_col], pdf["payload"], pdf["mime"]):
                if fake:
                    out_payload, out_mime = bytes(payload), mime
                else:
                    img, _w, _h = _decode_image(bytes(payload))
                    out_payload = _encode_bmp(_resize_rgb(img, width, height, method))
                    out_mime = "image/bmp"
                ids.append(mid)
                medias.append(
                    {
                        "payload": out_payload,
                        "mime": out_mime,
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "sample_rate": None,
                    }
                )
            yield pd.DataFrame({id_col: ids, media_col: medias})

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.mime").alias("mime"),
    )
    return flat.mapInPandas(batches, out_schema)


def _g711_mulaw_table() -> np.ndarray:
    """All 256 µ-law codewords → 16-bit linear (ITU-T G.711, the
    CCITT reference expansion): complement, bias the mantissa,
    shift by the segment, unbias."""
    u = ~np.arange(256, dtype=np.int64) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84)


def _g711_alaw_table() -> np.ndarray:
    """All 256 A-law codewords → 16-bit linear (G.711): XOR 0x55,
    segment-dependent mantissa placement; sign bit SET means
    positive in A-law."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t)


# IMA/DVI ADPCM (the classic 4-bit step-size codec): public tables
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA/DVI reconstruction step: shift-approximated
    (2·mag+1)·step/8, clamp to int16, walk the step index."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nibble & 7])))
    return pred, index


def _ima_block_header(block: bytes, off: int) -> tuple[int, int]:
    pred = struct.unpack_from("<h", block, off)[0]
    index = block[off + 2]
    if index > 88:
        raise ValueError(f"invalid ADPCM step index {index}")
    return pred, index


def _ima_adpcm_decode_block(block: bytes) -> list[int]:
    """One mono IMA ADPCM block: 4-byte header (predictor int16 LE,
    step index, reserved) then 4-bit codes, LOW nibble first."""
    if len(block) < 4:
        raise ValueError("truncated ADPCM block header")
    pred, index = _ima_block_header(block, 0)
    out = [pred]
    for byte in block[4:]:
        for nibble in (byte & 0x0F, byte >> 4):
            pred, index = _ima_step(pred, index, nibble)
            out.append(pred)
    return out


def _ima_adpcm_decode_block_stereo(block: bytes) -> tuple[list[int], list[int]]:
    """One stereo IMA ADPCM block: two 4-byte channel headers, then
    the nibble data interleaved in 4-byte-per-channel groups (8
    samples of ch0, 8 of ch1, ...) — the standard WAV layout."""
    if len(block) < 8:
        raise ValueError("truncated stereo ADPCM block header")
    state = [_ima_block_header(block, 0), _ima_block_header(block, 4)]
    chans: tuple[list[int], list[int]] = ([state[0][0]], [state[1][0]])
    data = block[8:]
    if len(data) % 8:
        raise ValueError("stereo ADPCM data not in 8-byte channel groups")
    for g in range(0, len(data), 8):
        for c in range(2):
            pred, index = state[c]
            for byte in data[g + 4 * c : g + 4 * c + 4]:
                for nibble in (byte & 0x0F, byte >> 4):
                    pred, index = _ima_step(pred, index, nibble)
                    chans[c].append(pred)
            state[c] = (pred, index)
    return chans


def _decode_wav_ima_adpcm(
    data: bytes, n_ch: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM 'data' chunk → float64 samples (mono, or stereo
    mean-downmixed from the interleaved block layout)."""
    if n_ch not in (1, 2):
        raise ValueError(f"IMA ADPCM decode supports 1-2 channels, got {n_ch}")
    if block_align < 4 * n_ch:
        raise ValueError(f"invalid ADPCM block align {block_align}")
    if n_ch == 1:
        samples: list[int] = []
        for off in range(0, len(data), block_align):
            samples.extend(_ima_adpcm_decode_block(data[off : off + block_align]))
        return np.array(samples, dtype=np.float64) / 32768.0
    left: list[int] = []
    right: list[int] = []
    for off in range(0, len(data), block_align):
        l, r = _ima_adpcm_decode_block_stereo(data[off : off + block_align])
        left.extend(l)
        right.extend(r)
    return (
        np.array(left, dtype=np.float64) + np.array(right, dtype=np.float64)
    ) / 2.0 / 32768.0


def _pcm_int_to_float(data: bytes, bits: int) -> np.ndarray:
    """Little-endian integer PCM raster -> float64 in [-1, 1]
    (8-bit is unsigned per RIFF convention; 24-bit is packed)."""
    if bits == 8:
        return (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    if bits == 24:
        b = np.frombuffer(data[: len(data) - len(data) % 3], np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        return v.astype(np.float64) / float(1 << 23)
    width = bits // 8
    x = np.frombuffer(data[: len(data) - len(data) % width], f"<i{width}")
    return x.astype(np.float64) / float(1 << (bits - 1))


def _decode_wav_g711(payload: bytes) -> tuple[np.ndarray, int]:
    """Fallback for non-integer-PCM WAV that stdlib ``wave``
    rejects: manual RIFF parse + IEEE float (format 3), G.711 µ-law
    (format 7) / A-law (format 6) expansion via a 256-entry numpy
    table, or IMA/DVI ADPCM (format 0x11) block decode — closed-form
    codecs, no library needed. Other compressed formats (MS-ADPCM,
    MP3-in-WAV) raise ValueError naming the tag."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, block_align, bits = fmt
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
        if len(fmt_body) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        tag = struct.unpack_from("<H", fmt_body, 24)[0]
        if tag == 1:  # integer PCM in the extensible container
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported extensible PCM depth {bits}")
            x = _pcm_int_to_float(data, bits)
            if n_ch > 1:
                x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
            return x, rate
    if tag == 3:  # IEEE float PCM
        if bits == 32:
            x = np.frombuffer(
                data[: len(data) - len(data) % 4], "<f4"
            ).astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data[: len(data) - len(data) % 8], "<f8").copy()
        else:
            raise ValueError(f"IEEE-float WAV must be 32/64-bit, got {bits}")
        if n_ch > 1:
            x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        return np.clip(x, -1.0, 1.0), rate
    if tag == 0x11:  # IMA/DVI ADPCM
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        return _decode_wav_ima_adpcm(data, n_ch, block_align), rate
    if tag == 7:
        table = _g711_mulaw_table()
    elif tag == 6:
        table = _g711_alaw_table()
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if bits != 8:
        raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
    x = table[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


# --------------------------------------------------------------- FLAC
# Native FLAC subset decode (r08): the lossless format is pure
# bit-twiddling — Rice-coded residuals over fixed/LPC predictors —
# so, like PNG/JPEG/GIF, it needs numpy and the public spec, not a
# codec library. Supported: 8/16/20/24-bit, mono/stereo (all four channel
# assignments incl. mid/side), constant/verbatim/fixed(0-4)/LPC
# subframes, wasted bits, partitioned Rice with escapes, frame-header
# CRC-8 verified. Unsupported depths/layouts raise ValueError.


class _FlacBitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _flac_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_DEPTHS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FLAC_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_residuals(br: _FlacBitReader, blocksize: int, order: int) -> list[int]:
    """Partitioned Rice residual section (RESIDUAL in the spec)."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts or blocksize >> porder <= order and nparts == 1:
        pass  # size check below catches real inconsistency
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        k = br.read(pbits)
        if k == escape:  # unencoded: raw nbits per residual
            nbits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << k) | br.read(k)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(br: _FlacBitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits-per-sample flag
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = [br.read_signed(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _flac_residuals(br, blocksize, order)
        coefs = _FLAC_FIXED_COEFS[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        out = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _flac_residuals(br, blocksize, order)
        for r in res:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a native FLAC stream with numpy + bit ops — no
    libFLAC. Returns (mono float64 samples in [-1, 1], sample_rate);
    stereo is mean-downmixed after un-decorrelation, matching the
    WAV path's contract."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = n_ch = bps = None
    total = 0
    while pos + 4 <= len(payload):  # metadata blocks
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if hdr & 0x7F == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("short FLAC STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            n_ch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        pos += 4 + size
        if hdr & 0x80:  # last-metadata flag
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bps not in (8, 16, 20, 24):
        raise ValueError(f"unsupported FLAC bit depth {bps}")
    if n_ch > 2:
        raise ValueError(f"unsupported FLAC channel count {n_ch}")

    channels: list[list[int]] = [[] for _ in range(n_ch)]
    while pos + 5 < len(payload):
        sync = (payload[pos] << 6) | (payload[pos + 1] >> 2)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        hdr_start = pos
        br = _FlacBitReader(payload, pos)
        br.read(14)  # sync
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        first = br.read(8)  # UTF-8 coded frame/sample number
        extra = 0
        if first >= 0xC0:
            b = first
            while b & 0x40:
                extra += 1
                b <<= 1
            for _ in range(extra):
                br.read(8)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        frame_bps = bps if sz_code == 0 else _FLAC_DEPTHS.get(sz_code)
        if frame_bps is None:
            raise ValueError(f"reserved FLAC sample size code {sz_code}")
        crc = br.read(8)
        if _flac_crc8(payload[hdr_start : br.pos - 1]) != crc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code <= 7:
            if ch_code + 1 != n_ch:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_flac_subframe(br, blocksize, frame_bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("FLAC side-channel frame in non-stereo stream")
            # the difference channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(br, blocksize, frame_bps)
                side = _flac_subframe(br, blocksize, frame_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(br, blocksize, frame_bps + 1)
                right = _flac_subframe(br, blocksize, frame_bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(br, blocksize, frame_bps)
                side = _flac_subframe(br, blocksize, frame_bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        for c in range(n_ch):
            channels[c].extend(subs[c])
        br.align()
        br.read(16)  # frame footer CRC-16 (consumed, not verified)
        pos = br.pos

    x = np.array(channels, dtype=np.float64) / float(1 << (bps - 1))
    mono = x.mean(axis=0) if n_ch > 1 else x[0]
    if total and len(mono) > total:
        mono = mono[:total]
    return mono, rate


def _decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode AIFF and uncompressed AIFC: COMM carries the geometry
    plus the sample rate as an 80-bit extended float; SSND carries
    the raster. 8/16/24/32-bit PCM, mean downmix. AIFC compression
    types 'NONE' (big-endian) and 'sowt' (byte-swapped little-endian
    PCM, the common Mac variant) are PCM and decode; genuinely
    compressed AIFC (ulaw/ima4/...) raises — a codec boundary."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not an AIFF payload")
    form = payload[8:12]
    if form not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    pos = 12
    n_ch = bits = None
    rate = 0
    raster = None
    comp = b"NONE"
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"COMM" and len(body) >= 18:
            n_ch, _frames, bits = struct.unpack_from(">HIH", body, 0)
            # 80-bit IEEE extended: 1 sign + 15 exponent + 64 mantissa
            exp = struct.unpack_from(">H", body, 8)[0] & 0x7FFF
            mant = int.from_bytes(body[10:18], "big")
            rate = int(round(mant * 2.0 ** (exp - 16383 - 63))) if mant else 0
            if form == b"AIFC" and len(body) >= 22:
                comp = body[18:22]
        elif cid == b"SSND" and len(body) >= 8:
            offset = struct.unpack_from(">I", body, 0)[0]
            raster = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if n_ch is None or raster is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if comp not in (b"NONE", b"sowt"):
        raise NotImplementedError(
            f"AIFC compression type {comp!r} requires an external codec; "
            "uncompressed AIFF/AIFC ('NONE', 'sowt') decodes natively"
        )
    endian = "<" if comp == b"sowt" else ">"
    if bits in (16, 32):
        width = bits // 8
        x = np.frombuffer(
            raster[: len(raster) - len(raster) % width], f"{endian}i{width}"
        ).astype(np.float64) / float(1 << (bits - 1))
    elif bits == 24:
        b = np.frombuffer(raster[: len(raster) - len(raster) % 3], np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        if endian == ">":
            v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        else:
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        x = np.frombuffer(raster, np.int8).astype(np.float64) / 128.0
    else:
        raise ValueError(f"unsupported AIFF sample size {bits}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode Sun/NeXT AU ('.snd'): fixed big-endian header, then
    µ-law (1) / A-law (27) via the shared G.711 tables, or 8/16/24/
    32-bit big-endian linear (2/3/4/5) samples; mean downmix."""
    if len(payload) < 24 or payload[:4] != b".snd":
        raise ValueError("not an AU payload")
    offset, _size, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
    if offset < 24:
        raise ValueError("invalid AU data offset")
    data = payload[offset:]
    if enc == 1:
        x = _g711_mulaw_table()[np.frombuffer(data, np.uint8)].astype(
            np.float64
        ) / 32768.0
    elif enc == 27:
        x = _g711_alaw_table()[np.frombuffer(data, np.uint8)].astype(
            np.float64
        ) / 32768.0
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        x = np.frombuffer(data[: len(data) - len(data) % 2], ">i2").astype(
            np.float64
        ) / 32768.0
    elif enc == 4:
        b = np.frombuffer(data[: len(data) - len(data) % 3], np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v = np.where(v & 0x800000, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif enc == 5:
        x = np.frombuffer(data[: len(data) - len(data) % 4], ">i4").astype(
            np.float64
        ) / 2147483648.0
    else:
        raise ValueError(f"unsupported AU encoding {enc}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte dispatch for the audio path: RIFF/WAVE → WAV
    decoders (PCM, G.711, IMA ADPCM), fLaC → native FLAC, FORM/AIFF
    → AIFF PCM, '.snd' → Sun AU. Anything else needs a codec this
    container doesn't have."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    if payload[:4] == b"fLaC":
        return _decode_flac(payload)
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(payload)
    if payload[:4] == b".snd":
        return _decode_au(payload)
    if payload[:4] == b"OggS":
        from .vorbis import decode_vorbis

        try:
            return decode_vorbis(payload)
        except ValueError as e:
            if "no Vorbis logical stream" in str(e):
                raise NotImplementedError(
                    "Ogg stream carries no Vorbis audio (Opus/Speex "
                    "bitstreams need codec tables absent here); "
                    "metadata is available via probe_media_metadata"
                ) from e
            raise
    raise NotImplementedError(
        "real decode of this audio format requires a codec not present "
        "in this environment; WAV (PCM/G.711/ADPCM), FLAC, AIFF, AU, "
        "and Ogg/Vorbis decode natively, or pass fake=True"
    )


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV with stdlib ``wave`` + numpy — no codec library.
    Returns (mono float64 samples in [-1, 1], sample_rate).
    8/16/24/32-bit integer PCM; IEEE float, G.711 µ-law/A-law and
    IMA ADPCM via the manual fallback (r08); multi-channel is
    mean-downmixed."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        return _decode_wav_g711(payload)
    if sampwidth == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif sampwidth == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sampwidth == 3:  # 24-bit little-endian PCM
        b = np.frombuffer(raw[: len(raw) - len(raw) % 3], np.uint8)
        b = b.reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif sampwidth == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def extract_audio_features(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
    frame_ms: int = 1000,
) -> DataFrame:
    """Audio leg of the multimodal triad: per-frame energy features
    via the same Arrow-batched ``mapInPandas`` contract as images —
    one output row per ``frame_ms`` window of each clip.

    Real path (``fake=False``): WAV (PCM/G.711/ADPCM), FLAC, AIFF,
    AU, and Ogg/Vorbis payloads decode natively — per-frame ``rms``
    is the true root-mean-square of the mono-downmixed samples,
    frame count = ceil(n_samples / samples_per_frame) from the
    ACTUAL audio, not the metadata column. MP3/AAC/Opus raise: their
    decode needs normative spec constant tables (Layer III Huffman
    tables, synthesis windows, range-coder PDFs) that — unlike
    Vorbis/FLAC/PNG/JPEG's in-stream or derivable entropy coding —
    cannot be reconstructed here (declared boundary; header-exact
    metadata for them via ``probe_media_metadata``).
    With ``fake=True`` the per-frame "rms" is a deterministic
    function of (payload bytes, frame index), so schemas /
    row-amplification / batch shapes stay real and reproducible over
    synthetic payloads. Output: id, frame_idx, rms float.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("rms", T.FloatType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, rms = [], [], []
            for mid, payload, dur in zip(
                pdf[id_col], pdf["payload"], pdf["duration_ms"]
            ):
                if not fake:
                    # magic-byte dispatch (RIFF+WAVE or fLaC): non-audio
                    # RIFF payloads (AVI/WEBP) hit the clean
                    # NotImplementedError boundary, not a raw wave.Error
                    if payload is None:
                        raise NotImplementedError(
                            "real decode needs a payload; pass fake=True "
                            "for metadata-only rows"
                        )
                    x, rate = _decode_audio(bytes(payload))
                    spf = max(1, int(rate * frame_ms / 1000))
                    n_frames = max(1, -(-len(x) // spf))
                    for i in range(n_frames):
                        seg = x[i * spf : (i + 1) * spf]
                        ids.append(mid)
                        frames.append(i)
                        rms.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
                    continue
                n_frames = max(1, int((dur or 0) // frame_ms))
                base = float(sum(payload[:64])) if payload is not None else 0.0
                for i in range(n_frames):
                    ids.append(mid)
                    frames.append(i)
                    rms.append((base * (i + 1)) % 997 / 997.0)
            yield pd.DataFrame({id_col: ids, "frame_idx": frames, "rms": rms})

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias("payload"),
        F.col(f"{media_col}.duration_ms").alias("duration_ms"),
    )
    return flat.mapInPandas(batches, out_schema)


def _parse_avi(payload: bytes) -> tuple[list[bytes], int, int, float, int, str]:
    """Parse an AVI (RIFF) container with a plain chunk walk — no
    codec library. Returns (frame chunks in stream order, width,
    height, fps, bits_per_pixel, codec) where codec is ``'dib'``
    (uncompressed '..db' frames, decoded by ``_dib_to_rgb``) or
    ``'mjpg'`` (Motion-JPEG '..dc' frames — each one a standalone
    baseline JPEG, decoded by ``_decode_jpeg`` since r08).
    ``bits_per_pixel`` comes from the video stream's 'strf'
    BITMAPINFOHEADER (biBitCount) and defaults to 24 when no 'strf'
    is present (minimal containers); DIB depths the decoder can't
    handle raise here rather than letting a 32bpp frame silently
    decode as garbage 24bpp RGB. MJPEG frames that omit their DHT
    segments (the 'AVI1' open-DML shortcut assuming the T.81 Annex K
    default tables) raise ValueError from the JPEG decoder — a
    declared format boundary. Other compressed codecs still raise
    NotImplementedError (ffmpeg genuinely absent)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = 0
    us_per_frame = 0
    bpp = 0
    frames: list[bytes] = []
    dc_frames: list[bytes] = []
    in_video_stream = False
    compression = 0  # strf biCompression (0 = BI_RGB)

    def walk(start: int, end: int) -> None:
        nonlocal width, height, us_per_frame, bpp, in_video_stream, compression
        pos = start
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body_start, body_end = pos + 8, pos + 8 + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)  # skip list type fourcc
            elif fourcc == b"avih":
                us_per_frame = struct.unpack_from("<I", payload, body_start)[0]
                width, height = struct.unpack_from("<II", payload, body_start + 32)
            elif fourcc == b"strh" and size >= 4:
                # stream header: remember whether the strf that follows
                # belongs to the video ('vids') or another stream type
                in_video_stream = payload[body_start : body_start + 4] == b"vids"
            elif fourcc == b"strf" and in_video_stream and size >= 20:
                # BITMAPINFOHEADER: biBitCount at 14, biCompression at 16
                bpp = struct.unpack_from("<H", payload, body_start + 14)[0]
                compression = struct.unpack_from("<I", payload, body_start + 16)[0]
            elif fourcc[2:4] == b"db":  # uncompressed DIB frame
                frames.append(payload[body_start:body_end])
            elif fourcc[2:4] == b"dc":  # compressed frame
                dc_frames.append(payload[body_start:body_end])
            pos = body_end + (size & 1)  # chunks pad to even size

    walk(12, len(payload))
    mjpg = compression in (
        struct.unpack("<I", b"MJPG")[0],
        struct.unpack("<I", b"mjpg")[0],
    ) or (dc_frames and not frames and dc_frames[0][:2] == b"\xff\xd8")
    if dc_frames and not frames:
        if not mjpg:
            raise NotImplementedError(
                "AVI contains compressed ('..dc') frames in a codec other "
                "than Motion-JPEG — decoding them requires ffmpeg/pyav, not "
                "present in this environment; uncompressed ('..db') and "
                "MJPG AVI decode natively"
            )
        fps = 1e6 / us_per_frame if us_per_frame else 0.0
        return dc_frames, width, height, fps, bpp or 24, "mjpg"
    bpp = bpp or 24  # minimal containers without strl/strf: assume 24bpp
    if frames and bpp not in (24, 32):
        raise ValueError(f"unsupported AVI DIB bit depth {bpp} (need 24 or 32)")
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    return frames, width, height, fps, bpp, "dib"


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate ISO BMFF boxes in data[start:end] as
    (fourcc, body_start, box_end). Handles 64-bit ``largesize``
    (size==1) and to-end-of-enclosure boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("MP4 box overruns its enclosure")
        yield fourcc, body, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    """Descend a container-box path (e.g. mdia→minf→stbl); returns
    the body span of the final box or (-1, -1) if absent."""
    for step in path:
        found = False
        for fourcc, b, e in _mp4_boxes(data, start, end):
            if fourcc == step:
                start, end, found = b, e, True
                break
        if not found:
            return -1, -1
    return start, end


def _mp4_full_box(data: bytes, body: int) -> tuple[int, int]:
    """(version, post-version/flags offset) of a FullBox body."""
    return data[body], body + 4


def _mp4_sample_slices(
    sizes: list[int], stsc: list[tuple[int, int]], chunk_offsets: list[int]
) -> list[tuple[int, int]]:
    """Expand stsc run-lengths over the chunk-offset table into
    absolute (offset, size) per sample — samples are contiguous
    within a chunk (ISO 14496-12 §8.7.4)."""
    out: list[tuple[int, int]] = []
    si, n_chunks = 0, len(chunk_offsets)
    for idx, (first, spc) in enumerate(stsc):
        last = stsc[idx + 1][0] - 1 if idx + 1 < len(stsc) else n_chunks
        for c in range(first, last + 1):
            if c > n_chunks:
                break
            off = chunk_offsets[c - 1]
            for _ in range(spc):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


# QuickTime/BMFF video sample formats that are themselves complete
# still-image payloads our native decoders already handle.
_MP4_IMAGE_CODECS = {b"jpeg": "jpeg", b"mjpa": "jpeg", b"png ": "png"}


def _mp4_parse_trak(data: bytes, b: int, e: int) -> dict | None:
    """Parse one trak box into {handler, codec, width/height or
    channels/sample_rate, timescale, duration, slices}. Returns None
    for tracks without a sample table."""
    mdia_b, mdia_e = _mp4_find(data, b, e, b"mdia")
    if mdia_b < 0:
        return None
    track: dict = {"handler": "", "codec": "", "width": 0, "height": 0,
                   "channels": 0, "sample_rate": 0, "timescale": 0,
                   "duration": 0, "slices": []}
    for fourcc, fb, fe in _mp4_boxes(data, mdia_b, mdia_e):
        if fourcc == b"mdhd":
            ver, p = _mp4_full_box(data, fb)
            if ver == 1:
                track["timescale"] = struct.unpack_from(">I", data, p + 16)[0]
                track["duration"] = struct.unpack_from(">Q", data, p + 20)[0]
            else:
                track["timescale"] = struct.unpack_from(">I", data, p + 8)[0]
                track["duration"] = struct.unpack_from(">I", data, p + 12)[0]
        elif fourcc == b"hdlr":
            _, p = _mp4_full_box(data, fb)
            track["handler"] = data[p + 4 : p + 8].decode("latin1")
    stbl_b, stbl_e = _mp4_find(data, mdia_b, mdia_e, b"minf", b"stbl")
    if stbl_b < 0:
        return None
    sizes: list[int] = []
    stsc: list[tuple[int, int]] = []
    offsets: list[int] = []
    for fourcc, fb, fe in _mp4_boxes(data, stbl_b, stbl_e):
        if fourcc == b"stsd":
            _, p = _mp4_full_box(data, fb)
            if struct.unpack_from(">I", data, p)[0] >= 1:
                entry = p + 4
                track["codec"] = data[entry + 4 : entry + 8].decode("latin1")
                body = entry + 8  # past size+format
                if track["handler"] == "vide":
                    # VisualSampleEntry: 6 reserved + 2 dri + 16 pre_defined
                    track["width"] = struct.unpack_from(">H", data, body + 24)[0]
                    track["height"] = struct.unpack_from(">H", data, body + 26)[0]
                elif track["handler"] == "soun":
                    # AudioSampleEntry: 6+2, 8 reserved, ch, bits, 4, rate16.16
                    track["channels"] = struct.unpack_from(">H", data, body + 16)[0]
                    track["sample_rate"] = struct.unpack_from(">I", data, body + 24)[0] >> 16
        elif fourcc == b"stsz":
            _, p = _mp4_full_box(data, fb)
            fixed, count = struct.unpack_from(">II", data, p)
            sizes = [fixed] * count if fixed else list(
                struct.unpack_from(f">{count}I", data, p + 8)
            )
        elif fourcc == b"stsc":
            _, p = _mp4_full_box(data, fb)
            count = struct.unpack_from(">I", data, p)[0]
            stsc = [
                struct.unpack_from(">II", data, p + 4 + 12 * i)
                for i in range(count)
            ]
        elif fourcc == b"stco":
            _, p = _mp4_full_box(data, fb)
            count = struct.unpack_from(">I", data, p)[0]
            offsets = list(struct.unpack_from(f">{count}I", data, p + 4))
        elif fourcc == b"co64":
            _, p = _mp4_full_box(data, fb)
            count = struct.unpack_from(">I", data, p)[0]
            offsets = list(struct.unpack_from(f">{count}Q", data, p + 4))
    track["slices"] = _mp4_sample_slices(sizes, stsc, offsets)
    return track


def _parse_mp4_tracks(payload: bytes) -> list[dict]:
    """Top-level ISO BMFF walk → per-trak dicts. No codec library:
    the sample tables (stsd/stsz/stsc/stco/stts) are plain
    big-endian structs, exactly like the AVI RIFF walk."""
    if payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (MP4/MOV) payload")
    tracks = []
    for fourcc, b, e in _mp4_boxes(payload, 0, len(payload)):
        if fourcc != b"moov":
            continue
        for f2, b2, e2 in _mp4_boxes(payload, b, e):
            if f2 == b"trak":
                t = _mp4_parse_trak(payload, b2, e2)
                if t is not None:
                    tracks.append(t)
    if not tracks:
        raise ValueError("MP4 payload has no moov/trak sample tables")
    return tracks


def _parse_mp4_video(
    payload: bytes,
) -> tuple[list[bytes], int, int, float, int, str]:
    """MP4/MOV video leg with the same return contract as
    ``_parse_avi``. Decodable sample formats are the QuickTime
    still-image codecs ('jpeg', 'mjpa', 'png ') — each sample is a
    complete JPEG/PNG payload our native decoders already handle.
    Inter-frame codecs (avc1/hvc1/vp09/av01/mp4v) raise
    NotImplementedError: their bitstream decoders genuinely are not
    in this container; track metadata stays reachable via
    ``probe_media_metadata``."""
    vid = next((t for t in _parse_mp4_tracks(payload) if t["handler"] == "vide"), None)
    if vid is None:
        raise ValueError("MP4 payload has no video track")
    codec = _MP4_IMAGE_CODECS.get(vid["codec"].encode("latin1"))
    if codec is None:
        raise NotImplementedError(
            f"MP4 video codec {vid['codec']!r} needs an inter-frame decoder "
            "(ffmpeg/pyav), not present in this environment; 'jpeg'/'mjpa'/"
            "'png ' sample tracks decode natively and container metadata is "
            "available via probe_media_metadata"
        )
    n = len(vid["slices"])
    fps = (
        n * vid["timescale"] / vid["duration"]
        if vid["duration"] and vid["timescale"]
        else 0.0
    )
    frames = [payload[o : o + s] for o, s in vid["slices"]]
    return frames, vid["width"], vid["height"], fps, 24, codec


def _parse_video(payload: bytes) -> tuple[list[bytes], int, int, float, int, str]:
    """Container dispatch for the video leg: RIFF/AVI chunk walk or
    ISO BMFF (MP4/MOV) box walk, both pure struct parsing."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _parse_avi(payload)
    if payload[4:8] == b"ftyp":
        return _parse_mp4_video(payload)
    raise NotImplementedError(
        "unrecognized video container (native paths: AVI with DIB/MJPG "
        "frames, MP4/MOV with jpeg/mjpa/png sample tracks, animated GIF); "
        "pass fake=True"
    )


def _iter_video_frames(payload: bytes):
    """Decoded (frame_idx, frame_ms, H×W×3 RGB) per frame for any
    native video container. Animated GIF composes stateful frames
    with per-frame delays; AVI/MP4 frames are independent and timed
    by the container fps."""
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        frames, _w, _h, delays = _gif_decode_all(payload)
        ms = 0
        for i, (img, d) in enumerate(zip(frames, delays)):
            yield i, ms, img
            ms += d
        return
    frames, w, h, fps, bpp, codec = _parse_video(payload)
    for i, raw in enumerate(frames):
        if codec in ("mjpg", "jpeg"):
            img, _fw, _fh = _decode_jpeg(raw)
        elif codec == "png":
            img, _fw, _fh = _decode_png(raw)
        else:
            img = _dib_to_rgb(raw, w, h, bpp)
        yield i, int(i * 1000 / fps) if fps else 0, img


def extract_video_frames(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    every_n: int = 1,
) -> DataFrame:
    """REAL video frame extraction for AVI (DIB + Motion-JPEG),
    MP4/MOV (jpeg/mjpa/png sample tracks), and animated GIF
    payloads: a RIFF chunk walk, an ISO BMFF box walk, or the GIF
    compositor (``_iter_video_frames``) + the native
    DIB/JPEG/PNG/LZW frame decoders, every ``every_n``-th frame emitted
    with its mean RGB and luma — the sampled-frame feature row a
    vision pipeline trains on. Same Arrow-batched ``mapInPandas``
    contract as the image/audio legs: per-batch decode, zero
    shuffle, memory bounded by batch size × payload. Inter-frame
    codecs (H.264/HEVC/VP9/AV1) raise (ffmpeg not in this container
    — declared boundary, same dispatch-point design as
    images/audio). Output: id, frame_idx, frame_ms, mean_r/g/b,
    luma float.

    Metadata-only offset sampling (no payload read at all) stays
    available as ``sample_video_frames``.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("mean_r", T.FloatType()),
            T.StructField("mean_g", T.FloatType()),
            T.StructField("mean_b", T.FloatType()),
            T.StructField("luma", T.FloatType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                for i, ms, img in _iter_video_frames(bytes(payload)):
                    if i % every_n:
                        continue
                    m = img.reshape(-1, 3).mean(axis=0) / 255.0
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(ms)
                    rows["mean_r"].append(float(m[0]))
                    rows["mean_g"].append(float(m[1]))
                    rows["mean_b"].append(float(m[2]))
                    rows["luma"].append(float(m @ np.array([0.299, 0.587, 0.114])))
            yield pd.DataFrame(rows)

    flat = df.select(F.col(id_col), F.col(f"{media_col}.payload").alias("payload"))
    return flat.mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (real frame extraction stubbed — emits frame offsets only).
    Pure column ops: ``sequence`` over the duration, ``explode`` —
    the row-amplification pattern a video pipeline needs, with no
    shuffle (explode is map-local)."""
    dur = F.coalesce(F.col(f"{media_col}.duration_ms"), F.lit(0).cast("long"))
    offsets = F.sequence(F.lit(0).cast("long"), dur, F.lit(every_ms).cast("long"))
    return df.select(
        F.col(id_col),
        F.explode(offsets).alias("frame_ms"),
    )


# -------------------------------------------------- metadata probing
# At 100 TB the first pass over a media lake is never full decode —
# it is a header-level inventory (what codec, what geometry, what
# duration, is it decodable here) that drives partitioning, routing
# and cost estimates for the decode passes that follow. The probes
# below read only container headers / frame headers, never entropy-
# coded payloads, so the per-row cost is O(header) not O(media).
# This is also where MPEG audio (MP3) and inter-frame MP4 video are
# REAL at the container level even though their bitstream decode
# stays behind the declared codec boundary: MP3's Layer III decode
# needs ~2.5k constants of ISO 11172-3 table data (Huffman tables
# B.7, synthesis window D.1) that — unlike PNG/JPEG/FLAC/GIF, whose
# entropy coding is carried in-stream or mathematically derivable —
# cannot be reconstructed from first principles, so shipping a
# "decoder" here would be unverifiable guesswork. The frame walk
# (sync, bitrate/samplerate indices, frame sizing, VBR detection)
# uses only the header-field tables, which are small and exact.

_MPEG_BITRATES = {
    # (version_group, layer) -> kbps by bitrate index 1..14
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_MPEG_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mpeg_audio_frame(payload: bytes, pos: int) -> dict | None:
    """Parse one MPEG-1/2/2.5 audio frame header at ``pos``. Returns
    {len, samples, rate, kbps, layer, version, channels} or None if
    the four bytes are not a valid frame header (bad sync, reserved
    version/layer, free-form or invalid bitrate/samplerate index)."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3
    layer_bits = (b1 >> 1) & 3
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    ver_group = 1 if ver_bits == 3 else 2  # MPEG2 and 2.5 share tables
    br_idx = b2 >> 4
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format or invalid
    kbps = _MPEG_BITRATES[(ver_group, layer)][br_idx - 1]
    rate = _MPEG_RATES[ver_bits][sr_idx]
    pad = (b2 >> 1) & 1
    if layer == 1:
        flen = (12 * kbps * 1000 // rate + pad) * 4
        samples = 384
    elif layer == 2:
        flen = 144 * kbps * 1000 // rate + pad
        samples = 1152
    else:
        per = 144 if ver_bits == 3 else 72
        flen = per * kbps * 1000 // rate + pad
        samples = 1152 if ver_bits == 3 else 576
    return {
        "len": flen,
        "samples": samples,
        "rate": rate,
        "kbps": kbps,
        "layer": layer,
        "version": {3: "1", 2: "2", 0: "2.5"}[ver_bits],
        "channels": 1 if (b3 >> 6) == 3 else 2,
    }


def _probe_mpeg_audio(payload: bytes) -> dict:
    """Frame-walk an MP1/MP2/MP3 stream: skip ID3v2 (syncsafe size),
    resync to the first valid header, then require contiguous frames
    (tolerating a trailing ID3v1 'TAG' block or <4 bytes of slack).
    Aggregates exact sample-count duration and mean bitrate; a
    stream whose frames disagree on bitrate is VBR."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        ss = payload[6:10]
        pos = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
    first = None
    while pos + 4 <= len(payload):
        first = _mpeg_audio_frame(payload, pos)
        if first is not None:
            # guard against a sync-looking byte pair inside junk: the
            # next frame must also parse (or the stream ends there)
            nxt = pos + first["len"]
            if nxt >= len(payload) - 4 or _mpeg_audio_frame(payload, nxt):
                break
            first = None
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    n_frames = n_samples = 0
    kbps_sum = 0
    kbps_seen: set[int] = set()
    while pos + 4 <= len(payload):
        fr = _mpeg_audio_frame(payload, pos)
        if fr is None:
            if payload[pos : pos + 3] == b"TAG" or len(payload) - pos < 4:
                break
            raise ValueError(f"MPEG audio frame sync lost at byte {pos}")
        n_frames += 1
        n_samples += fr["samples"]
        kbps_sum += fr["kbps"]
        kbps_seen.add(fr["kbps"])
        pos += fr["len"]
    return {
        "container": "mpeg-audio",
        "stream": "audio",
        "codec": f"mp{first['layer']}"
        + ("" if first["version"] == "1" else f"v{first['version']}"),
        "sample_rate": first["rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_ms": int(n_samples * 1000 / first["rate"]),
        "bitrate_kbps": round(kbps_sum / n_frames, 3),
        "vbr": len(kbps_seen) > 1,
    }


def _probe_image_header(payload: bytes) -> dict | None:
    """Header-only (no raster decode) geometry for the native image
    formats; JPEG walks markers to the first SOF. Returns None when
    the payload is not a recognized image."""
    codec = w = h = None
    if payload[:2] == b"BM" and len(payload) >= 26:
        codec = "bmp"
        w, h = struct.unpack_from("<ii", payload, 18)
        h = abs(h)
    elif payload[:8] == _PNG_SIG and len(payload) >= 24:
        codec = "png"
        w, h = struct.unpack_from(">II", payload, 16)
    elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        codec = "gif"
        w, h = struct.unpack_from("<HH", payload, 6)
    elif payload[:2] == b"\xff\xd8":
        codec = "jpeg"
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg = struct.unpack_from(">H", payload, pos + 2)[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack_from(">HH", payload, pos + 5)
                break
            pos += 2 + seg
        if w is None:
            raise ValueError("JPEG has no SOF marker")
    elif payload[:1] == b"P" and payload[1:2] in b"123456":
        codec = "pnm"
        toks, _ = _pnm_header_tokens(payload[:4096], 2)
        if len(toks) < 2:
            raise ValueError("truncated netpbm header")
        w, h = toks
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        codec = "tiff"
        endian = "<" if payload[:2] == b"II" else ">"
        ifd = struct.unpack_from(f"{endian}I", payload, 4)[0]
        count = struct.unpack_from(f"{endian}H", payload, ifd)[0]
        for i in range(count):
            tag, _typ, _n, val = struct.unpack_from(
                f"{endian}HHII", payload, ifd + 2 + 12 * i
            )
            # SHORT values sit in the low 16 bits of the value slot
            # on little-endian, the HIGH 16 on big-endian
            if _typ == 3:
                val = val & 0xFFFF if endian == "<" else val >> 16
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
    elif payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        codec = "ico"
        n = struct.unpack_from("<H", payload, 4)[0]
        best = 0
        for i in range(n):
            ew = payload[6 + 16 * i] or 256
            eh = payload[7 + 16 * i] or 256
            if ew * eh >= best:
                best, w, h = ew * eh, ew, eh
    if codec is None:
        return None
    return {"container": "image", "stream": "image", "codec": codec,
            "width": int(w), "height": int(h)}


def _gif_probe_animation(payload: bytes) -> tuple[int, int]:
    """(frame_count, total_delay_ms) via a block walk that SKIPS the
    LZW data through sub-block lengths — O(file) byte hops, zero
    decompression; the cheap animation census the probe needs."""
    packed = payload[10]
    pos = 13 + ((2 << (packed & 0x07)) * 3 if packed & 0x80 else 0)
    frames = 0
    total_ms = 0
    delay_ms = 100
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 3 < len(payload) and payload[pos] >= 4:
                delay_ms = struct.unpack_from("<H", payload, pos + 2)[0] * 10 or 100
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            if pos + 9 > len(payload):
                break
            fpacked = payload[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += (2 << (fpacked & 0x07)) * 3
            pos += 1  # LZW minimum code size
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            frames += 1
            total_ms += delay_ms
            delay_ms = 100
        else:
            break
    return frames, total_ms


def _probe_media(payload: bytes) -> list[dict]:
    """Dispatch a payload to its header-level probe. Returns one dict
    per stream/track (MP4 can carry several); every dict has at least
    container/stream/codec. Unknown formats raise ValueError.
    Animated GIFs (>1 frame) probe as video with frame count,
    duration, and mean fps."""
    img = _probe_image_header(payload)
    if img is not None:
        if img["codec"] == "gif":
            frames, total_ms = _gif_probe_animation(payload)
            if frames > 1:
                img.update(
                    stream="video", n_frames=frames, duration_ms=total_ms,
                    fps=round(frames * 1000 / total_ms, 3) if total_ms else 0.0,
                )
        return [img]
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        frames, w, h, fps, bpp, codec = _parse_avi(payload)
        return [{
            "container": "avi", "stream": "video", "codec": codec,
            "width": w, "height": h, "fps": round(fps, 3),
            "n_frames": len(frames),
            "duration_ms": int(len(frames) * 1000 / fps) if fps else 0,
        }]
    if payload[4:8] == b"ftyp":
        out = []
        for t in _parse_mp4_tracks(payload):
            dur_ms = (
                int(t["duration"] * 1000 / t["timescale"]) if t["timescale"] else 0
            )
            row = {
                "container": "mp4", "codec": t["codec"].strip(),
                "duration_ms": dur_ms,
            }
            if t["handler"] == "vide":
                n = len(t["slices"])
                row.update(
                    stream="video", width=t["width"], height=t["height"],
                    n_frames=n,
                    fps=round(n * 1000 / dur_ms, 3) if dur_ms else 0.0,
                )
            elif t["handler"] == "soun":
                row.update(
                    stream="audio", sample_rate=t["sample_rate"],
                    channels=t["channels"], n_samples=len(t["slices"]),
                )
            else:
                row.update(stream=t["handler"] or "other")
            out.append(row)
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, fmt, data_len = 12, None, 0
        ext_tag = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt " and size >= 16:
                fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
                if fmt[0] == 0xFFFE and size >= 26:
                    ext_tag = struct.unpack_from("<H", payload, pos + 32)[0]
            elif cid == b"data":
                data_len = size
            pos += 8 + size + (size & 1)
        if fmt is None:
            raise ValueError("WAV missing fmt chunk")
        tag, n_ch, rate, _br, block_align, bits = fmt
        if ext_tag is not None:
            tag = ext_tag  # WAVE_FORMAT_EXTENSIBLE: GUID leads with the tag
        codec = {1: "pcm", 3: "float", 6: "alaw", 7: "mulaw", 0x11: "ima-adpcm",
                 0x55: "mp3"}.get(tag, f"tag-{tag}")
        if tag == 0x11 and block_align >= 4 * n_ch:
            per_block = 1 + 2 * (block_align // n_ch - 4)
            n_samples = data_len // block_align * per_block
        elif bits and n_ch:
            n_samples = data_len * 8 // (bits * n_ch)
        else:
            n_samples = 0
        return [{
            "container": "wav", "stream": "audio", "codec": codec,
            "sample_rate": rate, "channels": n_ch, "n_samples": n_samples,
            "duration_ms": int(n_samples * 1000 / rate) if rate else 0,
        }]
    if payload[:4] == b"fLaC" and len(payload) >= 42:
        packed = int.from_bytes(payload[4 + 4 + 10 : 4 + 4 + 18], "big")
        rate = packed >> 44
        n_ch = ((packed >> 41) & 0x7) + 1
        total = packed & ((1 << 36) - 1)
        return [{
            "container": "flac", "stream": "audio", "codec": "flac",
            "sample_rate": rate, "channels": n_ch, "n_samples": total,
            "duration_ms": int(total * 1000 / rate) if rate else 0,
        }]
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from(">I", payload, pos + 4)[0]
            if cid == b"COMM" and size >= 18:
                n_ch, frames, _bits = struct.unpack_from(">HIH", payload, pos + 8)
                exp = struct.unpack_from(">H", payload, pos + 16)[0] & 0x7FFF
                mant = int.from_bytes(payload[pos + 18 : pos + 26], "big")
                rate = int(round(mant * 2.0 ** (exp - 16383 - 63))) if mant else 0
                # AIFC carries a compression fourcc after the rate;
                # 'NONE'/'sowt' are plain PCM and decode natively
                # (ADVICE r8: probing them as opaque 'aifc' caused
                # the router to skip real decode work)
                if payload[8:12] == b"AIFC" and size >= 22:
                    comp = payload[pos + 26 : pos + 30]
                    if len(comp) < 4:  # declared size lies past EOF
                        raise ValueError("truncated AIFC COMM chunk")
                else:
                    comp = b"NONE"
                codec = (
                    "pcm"
                    if comp in (b"NONE", b"sowt")
                    else comp.decode("latin1").strip("\x00 ").lower()
                )
                return [{
                    "container": "aiff", "stream": "audio", "codec": codec,
                    "sample_rate": rate, "channels": n_ch, "n_samples": frames,
                    "duration_ms": int(frames * 1000 / rate) if rate else 0,
                }]
            pos += 8 + size + (size & 1)
        raise ValueError("AIFF missing COMM chunk")
    if payload[:4] == b".snd" and len(payload) >= 24:
        offset, size, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
        width = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 27: 1}.get(enc, 0)
        if size == 0xFFFFFFFF:
            size = max(0, len(payload) - offset)
        n_samples = size // (width * n_ch) if width and n_ch else 0
        return [{
            "container": "au", "stream": "audio",
            # names match what _decode_au handles (ADVICE r8: enc
            # 4/5 decode natively, so give them real codec names)
            "codec": {1: "mulaw", 2: "pcm8", 3: "pcm16", 4: "pcm24",
                      5: "pcm32", 27: "alaw"}.get(enc, f"enc-{enc}"),
            "sample_rate": rate, "channels": n_ch, "n_samples": n_samples,
            "duration_ms": int(n_samples * 1000 / rate) if rate else 0,
        }]
    if payload[:4] == b"OggS":
        return _probe_ogg(payload)
    if len(payload) >= 7 and payload[0] == 0xFF and (payload[1] & 0xF6) == 0xF0:
        # 0xFFF sync with layer bits 00 — ADTS AAC, not MPEG-1/2 audio
        return [_probe_adts_aac(payload)]
    if payload[:3] == b"ID3" or (
        len(payload) >= 4 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return [_probe_mpeg_audio(payload)]
    raise ValueError("unrecognized media container")


_PROBE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("track", T.IntegerType()),
    T.StructField("container", T.StringType()),
    T.StructField("stream", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("fps", T.DoubleType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("bitrate_kbps", T.DoubleType()),
    T.StructField("vbr", T.BooleanType()),
])


def probe_media_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    strict: bool = True,
) -> DataFrame:
    """Header-level media inventory: one output row per stream/track
    with container, codec, geometry, duration and bitrate — the
    first pass a 100 TB media lake actually runs (routing/costing
    for later decode passes), reading headers only, never
    entropy-coded data. Arrow-batched ``mapInPandas``, zero shuffle,
    same contract as the decode legs. Formats covered: every native
    decoder's container (BMP/PNG/GIF/JPEG/PNM/TIFF/ICO, WAV/FLAC/
    AIFF/AU, AVI, MP4/MOV incl. avc1-style tracks whose *decode* is
    out of scope), MPEG audio (MP1/MP2/MP3) via an exact frame walk
    with ID3 handling and VBR detection, ADTS AAC (the explicit
    13-bit per-frame length makes the walk exact), and Ogg physical
    streams (Vorbis/Opus/Theora/FLAC identification headers + exact
    durations from final granule positions, including Theora's
    keyframe-shift granule split).

    ``strict=True`` (default) raises on an unrecognized or corrupt
    payload — the right contract for a curated lake. ``strict=False``
    tags such payloads with container='unknown' instead, so one junk
    row in a 100 TB mixed lake marks itself non-routable rather than
    failing the whole Spark stage (ADVICE r8: route_media_by_codec is
    the triage pass and must survive junk)."""
    out_fields = {f.name for f in _PROBE_SCHEMA.fields}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {name: [] for name in out_fields}
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    metas = _probe_media(bytes(payload))
                except Exception:
                    # lenient mode must survive ANY junk row — a
                    # narrower tuple was repro'd to miss TypeError
                    # (null payload) and OverflowError (absurd AIFF
                    # rate exponent): one such row in a 100 TB lake
                    # would fail the whole routing stage (r9 review)
                    if strict:
                        raise
                    metas = [{"container": "unknown", "stream": "unknown"}]
                for ti, meta in enumerate(metas):
                    rows["media_id"].append(mid)
                    rows["track"].append(ti)
                    for f in _PROBE_SCHEMA.fields[2:]:
                        rows[f.name].append(meta.get(f.name))
            yield pd.DataFrame(rows)[[f.name for f in _PROBE_SCHEMA.fields]]

    flat = df.select(
        F.col(id_col).alias("media_id"),
        F.col(f"{media_col}.payload").alias("payload"),
    )
    return flat.mapInPandas(batches, _PROBE_SCHEMA)


_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000)


def _probe_adts_aac(payload: bytes) -> dict:
    """Walk an ADTS AAC stream. Every frame header carries its own
    13-bit frame length, so the walk is exact without touching the
    AAC payload; 1024 samples per raw data block."""
    pos = n_frames = n_samples = 0
    rate = channels = None
    while pos + 7 <= len(payload):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xF6) != 0xF0:
            if len(payload) - pos < 7:
                break
            raise ValueError(f"ADTS sync lost at byte {pos}")
        sr_idx = (payload[pos + 2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_RATES):
            raise ValueError(f"reserved ADTS sampling index {sr_idx}")
        ch = ((payload[pos + 2] & 1) << 2) | (payload[pos + 3] >> 6)
        flen = ((payload[pos + 3] & 0x03) << 11) | (payload[pos + 4] << 3) | (
            payload[pos + 5] >> 5
        )
        if flen < 7:
            raise ValueError("invalid ADTS frame length")
        blocks = (payload[pos + 6] & 0x03) + 1
        if rate is None:
            rate, channels = _ADTS_RATES[sr_idx], ch
        n_frames += 1
        n_samples += 1024 * blocks
        pos += flen
    if rate is None:
        raise ValueError("no ADTS frame found")
    return {
        "container": "adts", "stream": "audio", "codec": "aac",
        "sample_rate": rate, "channels": channels,
        "n_frames": n_frames, "n_samples": n_samples,
        "duration_ms": int(n_samples * 1000 / rate),
    }


def _ogg_pages(payload: bytes):
    """Yield (serial, granulepos, is_bos, first_packet_prefix) per Ogg
    page — header-only framing walk (RFC 3533), CRC not rechecked."""
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"Ogg capture pattern lost at byte {pos}")
        header_type = payload[pos + 5]
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        serial = struct.unpack_from("<I", payload, pos + 14)[0]
        n_segs = payload[pos + 26]
        segs = payload[pos + 27 : pos + 27 + n_segs]
        body = pos + 27 + n_segs
        yield serial, granule, bool(header_type & 0x02), payload[
            body : body + min(64, sum(segs))
        ]
        pos = body + sum(segs)


def _probe_ogg(payload: bytes) -> list[dict]:
    """Ogg logical streams via their BOS identification headers —
    Vorbis/Opus/Theora/FLAC-in-Ogg carry rate/geometry there in the
    clear — plus exact durations from each stream's final granule
    position (PCM sample count for audio, frame index for Theora)."""
    streams: dict[int, dict] = {}
    last_granule: dict[int, int] = {}
    for serial, granule, is_bos, head in _ogg_pages(payload):
        if granule >= 0:
            last_granule[serial] = granule
        if not is_bos:
            continue
        if head[:7] == b"\x01vorbis":
            channels = head[11]
            rate = struct.unpack_from("<I", head, 12)[0]
            nominal = struct.unpack_from("<i", head, 20)[0]
            streams[serial] = {
                "container": "ogg", "stream": "audio", "codec": "vorbis",
                "sample_rate": rate, "channels": channels,
                "bitrate_kbps": round(nominal / 1000, 3) if nominal > 0 else None,
            }
        elif head[:8] == b"OpusHead":
            channels = head[9]
            preskip = struct.unpack_from("<H", head, 10)[0]
            streams[serial] = {
                "container": "ogg", "stream": "audio", "codec": "opus",
                # Opus always decodes at 48 kHz; granulepos is 48 kHz ticks
                "sample_rate": 48000, "channels": channels,
                "_preskip": preskip,
            }
        elif head[:7] == b"\x80theora":
            picw = int.from_bytes(head[14:17], "big")
            pich = int.from_bytes(head[17:20], "big")
            frn = struct.unpack_from(">I", head, 22)[0]
            frd = struct.unpack_from(">I", head, 26)[0]
            # granulepos = keyframe_number << KFGSHIFT | delta
            kfg = (struct.unpack_from(">H", head, 40)[0] >> 5) & 0x1F
            streams[serial] = {
                "container": "ogg", "stream": "video", "codec": "theora",
                "width": picw, "height": pich,
                "fps": round(frn / frd, 3) if frd else 0.0,
                "_kfgshift": kfg,
            }
        elif head[:5] == b"\x7fFLAC":
            packed = int.from_bytes(head[9 + 4 + 10 : 9 + 4 + 18], "big")
            streams[serial] = {
                "container": "ogg", "stream": "audio", "codec": "flac",
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
            }
        else:
            streams[serial] = {
                "container": "ogg", "stream": "other",
                "codec": head[:8].decode("latin1", "replace").strip("\x00 "),
            }
    if not streams:
        raise ValueError("Ogg payload has no BOS identification header")
    out = []
    for serial, meta in streams.items():
        g = last_granule.get(serial)
        if g is not None:
            if meta.get("codec") == "opus":
                g = max(0, g - meta["_preskip"])
            elif meta.get("codec") == "theora":
                kfg = meta["_kfgshift"]
                g = (g >> kfg) + (g & ((1 << kfg) - 1))
            if meta["stream"] == "audio" and meta.get("sample_rate"):
                meta["n_samples"] = g
                meta["duration_ms"] = int(g * 1000 / meta["sample_rate"])
            elif meta["stream"] == "video" and meta.get("fps"):
                meta["n_frames"] = g
                meta["duration_ms"] = int(g * 1000 / meta["fps"])
        meta.pop("_preskip", None)
        meta.pop("_kfgshift", None)
        out.append(meta)
    return out


# Formats whose payloads the native decoders can fully decode, by
# probe (container, codec). Everything else is metadata-only here.
_DECODABLE = {
    ("image", None),  # every probed image codec decodes natively
    ("wav", "pcm"), ("wav", "float"), ("wav", "alaw"), ("wav", "mulaw"),
    ("wav", "ima-adpcm"),
    ("flac", "flac"), ("aiff", "pcm"),
    ("au", "pcm8"), ("au", "pcm16"), ("au", "pcm24"), ("au", "pcm32"),
    ("au", "mulaw"), ("au", "alaw"),
    ("ogg", "vorbis"),
    ("avi", "dib"), ("avi", "mjpg"),
    ("mp4", "jpeg"), ("mp4", "mjpa"), ("mp4", "png"),
}


def route_media_by_codec(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """The probe-then-route pattern SCALE.md §18 describes, as an
    operator: join each media row to its probed streams and tag it
    ``decodable`` when every stream's (container, codec) has a
    native decoder — the cheap O(header) pass that decides which
    payloads the expensive decode legs ever touch at 100 TB scale.
    Output: id, container, codecs (sorted distinct), decodable.
    The probe runs map-local; the only shuffle is the groupBy on the
    media id (pre-partitioned inputs keep it local too).

    Unknown/corrupt payloads route as container='unknown',
    decodable=false instead of raising — triage must survive junk
    rows (ADVICE r8); use ``probe_media_metadata(strict=True)`` for
    the raising contract."""
    probed = probe_media_metadata(
        df, id_col=id_col, media_col=media_col, strict=False
    )
    pair_ok = F.lit(False)
    for c, k in sorted(_DECODABLE):
        if k is None:
            continue
        pair_ok = pair_ok | (
            (F.col("container") == c) & (F.col("codec") == k)
        )
    dec = F.when(F.col("container") == "image", F.lit(True)).otherwise(pair_ok)
    return (
        probed.withColumn("stream_decodable", dec)
        .groupBy(F.col("media_id").alias(id_col))
        .agg(
            F.first("container").alias("container"),
            F.array_sort(F.collect_set("codec")).alias("codecs"),
            F.min(F.col("stream_decodable").cast("int")).cast("boolean").alias(
                "decodable"
            ),
        )
    )
