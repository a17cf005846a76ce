"""Real decode kernels for the multimodal stages — pure numpy/stdlib.

The container has no PIL/libvips/ffmpeg; every format below is decoded
for real with nothing but numpy and the standard library (GIF/WEBP/MP4
and progressive JPEG stay injectable):

- **PPM / PGM (Netpbm P6/P5)** — binary RGB / grayscale raster
  (https://netpbm.sourceforge.net/doc/ppm.html).
- **BMP (Windows BITMAPINFOHEADER, 24-bit uncompressed)** — the only
  BMP layout a data pipeline should ever synthesize itself.
- **PNG (non-interlaced, 8-bit)** — stdlib ``zlib`` inflate + numpy
  per-scanline unfiltering (all five filter types of the PNG spec,
  https://www.w3.org/TR/png-3/#9Filters); gray / RGB / palette /
  alpha color types.
- **JPEG (baseline sequential DCT, ITU-T T.81)** — full marker parse,
  canonical Huffman decode, restart intervals, batched IDCT, chroma
  upsampling, JFIF YCbCr→RGB, plus a 4:4:4 / 4:2:0 encoder with the
  Annex K example tables (see the JPEG section at the end of this
  file).
- **WAV (RIFF PCM)** — via the stdlib ``wave`` module + numpy.
- **YUV4MPEG2 (.y4m)** — ffmpeg's uncompressed video interchange
  format: a text header then ``FRAME\\n`` + planar YUV per frame;
  frame sampling is header arithmetic + buffer slicing.

These plug into the stages in ``stages/multimodal.py``
(``BlobFeatureStage(decode=decode_image)``,
``ResizeStage(resize=resize_image)``,
``FrameSampleStage(extract_frames=extract_frames_y4m)``) and replace
the round-2 NotImplementedError placeholders for the formats above.

Reference parity note: the reference crawler has no image/audio path —
these stages are the training-data-pipeline extension the task brief
asks for; formats and layouts follow only the public specs cited above.
"""

from __future__ import annotations

import io
import re
import wave

import numpy as np

# ---------------------------------------------------------------- PPM/PGM

_PNM_HEADER_RE = re.compile(
    rb"^(P[56])[ \t\r\n]+(?:#[^\n]*\n[ \t\r\n]*)*"
    rb"(\d+)[ \t\r\n]+(\d+)[ \t\r\n]+(\d+)[ \t\r\n]"
)


def decode_pnm(payload: bytes) -> dict:
    """Decode a binary PPM (P6, RGB) or PGM (P5, gray) image.

    Returns ``{"width", "height", "channels", "mean_value"}`` with
    ``mean_value`` the mean sample value scaled to [0, 1]."""
    m = _PNM_HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a binary PPM/PGM (P6/P5) payload")
    magic, w, h, maxval = (
        m.group(1),
        int(m.group(2)),
        int(m.group(3)),
        int(m.group(4)),
    )
    channels = 3 if magic == b"P6" else 1
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"bad PNM maxval {maxval}")
    dtype = np.uint8 if maxval < 256 else ">u2"
    body = payload[m.end() :]
    n = w * h * channels
    px = np.frombuffer(body, dtype=dtype, count=n)
    if px.size < n:
        raise ValueError("truncated PNM body")
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "mean_value": float(px.astype(np.float64).mean() / maxval),
    }


def pnm_pixels(payload: bytes) -> np.ndarray:
    """(H, W, C) uint8 array of a binary P6/P5 payload (maxval<256)."""
    m = _PNM_HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a binary PPM/PGM (P6/P5) payload")
    magic, w, h, maxval = (
        m.group(1),
        int(m.group(2)),
        int(m.group(3)),
        int(m.group(4)),
    )
    if maxval >= 256:
        raise ValueError("16-bit PNM resize unsupported")
    c = 3 if magic == b"P6" else 1
    n = w * h * c
    px = np.frombuffer(payload[m.end() :], dtype=np.uint8, count=n)
    if px.size < n:
        raise ValueError("truncated PNM body")
    return px.reshape(h, w, c)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3|1) uint8 -> binary P6/P5 payload."""
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


# -------------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER).

    Rows are bottom-up, 4-byte aligned; mean is over BGR samples."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BMP core-header variant unsupported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    height = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * stride, offset=data_off
    ).reshape(height, stride)
    px = rows[:, : w * 3]
    return {
        "width": w,
        "height": height,
        "channels": 3,
        "mean_value": float(px.astype(np.float64).mean() / 255.0),
    }


# -------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) chunks; stops at IEND.  CRCs are not
    verified — this is a decode kernel, not a validator."""
    pos = len(_PNG_SIG)
    n = len(payload)
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        if ctype == b"IEND":
            return
        pos += 12 + length  # length + type + data + crc
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters.  ``raw`` is the inflated byte stream
    ((1 + stride) bytes per row); returns (h, stride) uint8.

    None/Up are whole-row vectorized; Sub is a per-lane cumsum; Average
    and Paeth walk pixels within the row (previous-pixel dependency) —
    rare in synthesized data, required for spec completeness."""
    rows = raw.reshape(h, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        row = data[y]
        if f == 0:  # None
            cur = row
        elif f == 1:  # Sub: out[i] = row[i] + out[i-bpp]
            cur = row.copy()
            lanes = cur.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                cur = (np.cumsum(lanes, axis=0) % 256).ravel()
            else:  # defensive; stride is always a multiple of bpp
                for i in range(bpp, stride):
                    cur[i] = (cur[i] + cur[i - bpp]) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (a + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def png_pixels(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (H, W, C) uint8.

    Supports color types 0 (gray), 2 (RGB), 3 (palette -> RGB),
    4 (gray+alpha), 6 (RGBA).  Interlaced (Adam7) and sub-8-bit depths
    raise — synthesize those via an image library outside the engine."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    w = h = None
    color_type = bit_depth = None
    palette = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth = data[8]
            color_type = data[9]
            if data[10] != 0 or data[11] != 0:
                raise ValueError("bad PNG compression/filter method")
            if data[12] != 0:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8:
        raise ValueError(f"only 8-bit PNG supported (got {bit_depth})")
    spp = _PNG_SAMPLES.get(color_type)
    if spp is None:
        raise ValueError(f"bad PNG color type {color_type}")
    stride = w * spp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG inflated size mismatch")
    px = _png_unfilter(raw, h, stride, spp).reshape(h, w, spp)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def decode_png(payload: bytes) -> dict:
    """PNG -> the BlobFeatureStage metadata contract."""
    px = png_pixels(payload)
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": px.shape[2],
        "mean_value": float(px.astype(np.float64).mean() / 255.0),
    }


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, 1|2|3|4) uint8 -> non-interlaced 8-bit PNG (filter 0 rows;
    test/synthesis helper)."""
    import zlib

    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            len(data).to_bytes(4, "big")
            + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------- images

_UNSUPPORTED_MAGICS = {
    b"GI": "GIF",
    b"RI": "RIFF (WEBP/AVI)",
}


def bmp_pixels(payload: bytes) -> np.ndarray:
    """(H, W, 3) RGB uint8 of an uncompressed 24-bit BMP (rows are
    stored bottom-up BGR; both are undone here)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    height = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * stride, offset=data_off
    ).reshape(height, stride)[:, : w * 3].reshape(height, w, 3)
    if h > 0:  # bottom-up storage
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def image_pixels(payload: bytes) -> np.ndarray:
    """(H, W, C) uint8 for any decodable still image
    (PNM/BMP/PNG/baseline JPEG) — the pixel-level sniffing twin of
    ``decode_image``."""
    p = payload or b""
    if p[:2] in (b"P6", b"P5"):
        return pnm_pixels(p)
    if p[:2] == b"BM":
        return bmp_pixels(p)
    if p.startswith(_PNG_SIG):
        return png_pixels(p)
    if p[:2] == b"\xff\xd8":
        return jpeg_pixels(p)
    raise ValueError("unsupported image format for pixel decode")


def decode_image(payload: bytes) -> dict:
    """Sniff + decode PPM/PGM/BMP/PNG/baseline JPEG; raise for formats
    needing an external codec (GIF/WEBP, progressive JPEG).

    The stage contract (``BlobFeatureStage``) consumes
    ``width/height/mean_value``; ``channels`` rides along."""
    p = payload or b""
    if p[:2] in (b"P6", b"P5"):
        return decode_pnm(p)
    if p[:2] == b"BM":
        return decode_bmp(p)
    if p.startswith(_PNG_SIG):
        return decode_png(p)
    if p[:2] == b"\xff\xd8":
        return decode_jpeg(p)
    name = _UNSUPPORTED_MAGICS.get(p[:2], "unknown")
    raise ValueError(
        f"unsupported image format ({name}): PPM/PGM/BMP/PNG/JPEG "
        "decode without an image library; inject decode= for others"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize of any decodable still image
    (PNM/BMP/PNG in, P6/P5 out — the stage contract normalizes the
    output container to Netpbm).

    Nearest-neighbor with pixel-center sampling (the classic
    ``floor((i + 0.5) * src / dst)`` grid) — fully vectorized."""
    src = image_pixels(payload)
    if src.shape[2] in (2, 4):  # strip alpha for the P6/P5 container
        src = src[:, :, : src.shape[2] - 1]
    sh, sw = src.shape[:2]
    ys = np.minimum(
        ((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1
    )
    xs = np.minimum(
        ((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1
    )
    return encode_ppm(np.ascontiguousarray(src[ys][:, xs]))


# -------------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF PCM WAV via stdlib ``wave``: rate, channels,
    sample count, duration, and integer RMS over int16 samples."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        nch = f.getnchannels()
        width = f.getsampwidth()
        nframes = f.getnframes()
        raw = f.readframes(nframes)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 1:  # 8-bit WAV is unsigned, offset-128
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_samples": nframes,
        "duration_ms": nframes * 1000 // rate if rate else 0,
        "rms": rms,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """int16 samples -> RIFF PCM WAV bytes (test/synthesis helper)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


# -------------------------------------------------------------------- Y4M

_Y4M_MAGIC = b"YUV4MPEG2"
_Y4M_SUBSAMPLE_DENOM = {
    b"420": 4,  # chroma planes are W/2 x H/2 -> frame = Y * 3/2
    b"420jpeg": 4,
    b"420paldv": 4,
    b"422": 2,
    b"444": 1,
}


def _y4m_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """-> (width, height, frame_bytes, fps_num/den as ms-per-frame*1e3
    pair folded, header_end)."""
    end = payload.find(b"\n")
    if not payload.startswith(_Y4M_MAGIC) or end < 0:
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fn, fd = 30, 1
    colorspace = b"420"
    for tok in payload[len(_Y4M_MAGIC) : end].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fn, fd = int(num), int(den)
        elif tag == b"C":
            colorspace = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    denom = _Y4M_SUBSAMPLE_DENOM.get(colorspace)
    if denom is None:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    y = w * h
    frame_bytes = y + 2 * (y // denom)
    return w, h, frame_bytes, fn, fd, end + 1


def y4m_info(payload: bytes) -> dict:
    """Header + frame-count metadata without touching pixel data
    beyond arithmetic (the scale path: count = buffer length / stride)."""
    w, h, fb, fn, fd, off = _y4m_header(payload)
    stride = len(b"FRAME\n") + fb
    n_frames = max(0, (len(payload) - off)) // stride
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "fps_num": fn,
        "fps_den": fd,
        "frame_bytes": fb,
    }


def extract_frames_y4m(payload: bytes, num_frames: int):
    """Real frame sampler: evenly sample ``num_frames`` frames from a
    YUV4MPEG2 stream; each emitted frame is re-wrapped as a standalone
    single-frame .y4m (self-describing for a downstream vision stage).
    Returns ``[(ts_ms, frame_bytes), ...]`` — the ``FrameSampleStage``
    ``extract_frames=`` contract."""
    w, h, fb, fn, fd, off = _y4m_header(payload)
    marker = b"FRAME\n"
    stride = len(marker) + fb
    total = (len(payload) - off) // stride
    if total <= 0:
        return []
    idxs = np.minimum(
        (np.arange(num_frames) * total) // num_frames, total - 1
    )
    hdr = payload[:off]
    out = []
    for i in idxs:
        start = off + int(i) * stride
        if payload[start : start + len(marker)] != marker:
            raise ValueError(f"Y4M frame marker missing at frame {i}")
        body = payload[start : start + stride]
        ts_ms = int(i) * 1000 * fd // fn
        out.append((ts_ms, hdr + body))
    return out


def encode_y4m(
    frames: np.ndarray, fps: int = 30, colorspace: str = "C420"
) -> bytes:
    """(N, H, W) uint8 luma frames -> 4:2:0 Y4M bytes with flat-gray
    chroma (test/synthesis helper)."""
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 {colorspace}\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [hdr]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
        parts.append(chroma)
        parts.append(chroma)
    return b"".join(parts)


# ---------------------------------------------------------- perceptual hash
_PHASH_N = 32  # downsample edge
_PHASH_SCALE = 1 << 15  # fixed-point DCT coefficient scale


def dct_matrix_fixed(n: int = _PHASH_N) -> np.ndarray:
    """DCT-II basis quantized to 1/2^15 fixed point (int64).

    Integer matmuls make the whole pHash pipeline exact int arithmetic:
    bit-identical on every worker, platform and BLAS — a float DCT's
    last-ulp variation could flip a sign bit right at the median split.
    """
    u = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    c = np.cos((2 * x + 1) * u * np.pi / (2 * n))
    return np.round(c * _PHASH_SCALE).astype(np.int64)


def phash64(pixels: np.ndarray, dct: np.ndarray | None = None) -> int:
    """64-bit perceptual hash of an (H, W, C) uint8 image.

    Classic pHash shape: integer luma -> nearest-neighbor 32x32 ->
    fixed-point 2D DCT -> 8x8 low-frequency block -> bit = coefficient
    strictly above the block median.  All-integer, so deterministic.
    """
    if dct is None:
        dct = dct_matrix_fixed()
    n = dct.shape[0]
    px = pixels.astype(np.int64)
    if px.ndim == 3 and px.shape[2] == 3:
        g = (
            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
        ) // 1000
    else:
        g = px.reshape(px.shape[0], px.shape[1], -1)[:, :, 0]
    h, w = g.shape
    yi = (np.arange(n) * h) // n
    xi = (np.arange(n) * w) // n
    small = g[yi][:, xi]
    t = dct @ small @ dct.T  # |t| <= 32 * 2^15 * 255 * 32 * 2^15 ~ 2^48
    low = t[:8, :8].ravel()
    med = np.median(low)
    bits = low > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


# ---------------------------------------------------------- audio fingerprint
def audio_fingerprint64(payload: bytes) -> int:
    """64-bit energy-delta fingerprint of a PCM WAV payload.

    Haitsma-Kalker-style sign fingerprint reduced to the time domain:
    split samples into 65 equal windows, integer energy per window
    (sum of |sample|, int64), bit i = energy[i+1] > energy[i].
    All-integer -> bit-identical everywhere; invariant to constant
    amplitude scaling (both sides of every comparison scale together)
    and robust to small local edits (one window flips <= 2 bits).
    """
    with wave.open(io.BytesIO(payload), "rb") as f:
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.abs(np.frombuffer(raw, dtype="<i2").astype(np.int64))
    elif width == 1:
        x = np.abs(
            np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        )
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    n = x.size
    if n < 65:
        x = np.pad(x, (0, 65 - n))
        n = 65
    edges = (np.arange(66) * n) // 65
    csum = np.concatenate(([0], np.cumsum(x)))
    e = csum[edges[1:]] - csum[edges[:-1]]
    bits = e[1:] > e[:-1]
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


# ------------------------------------------------------------------- JPEG
#
# Baseline sequential DCT JPEG (ITU-T T.81 | ISO/IEC 10918-1), pure
# numpy + stdlib: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI markers,
# canonical Huffman decode, byte-unstuffing, restart intervals,
# per-component dequantize + batched float IDCT, nearest-neighbor
# chroma upsampling (4:4:4 / 4:2:2 / 4:2:0 or any (h,v) <= 2), JFIF
# YCbCr -> RGB.  Progressive (SOF2) and arithmetic coding are out of
# scope and raise.  The encoder writes baseline 4:4:4 with the Annex K
# example quantization + Huffman tables, so decode(encode(x)) round-
# trips within quantization error with no external codec anywhere.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K.1 example quantization tables (luma, chroma)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct8() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis (float64)."""
    n = 8
    k = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos((2 * x + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


class _HuffDecoder:
    """Canonical Huffman decode tables (T.81 F.2.2.3 DECODE): per code
    length, (mincode, maxcode, valptr) arrays."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list, values: list):
        self.values = values
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for l in range(1, 17):
            n = bits[l - 1]
            if n:
                self.valptr[l] = k
                self.mincode[l] = code
                code += n
                k += n
                self.maxcode[l] = code - 1
            else:
                self.maxcode[l] = -1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            # past the end: T.81 allows padding with 1-bits
            self.pos = p + 1
            return 1
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(r: _BitReader, t: _HuffDecoder) -> int:
    code = r.bit()
    l = 1
    while code > t.maxcode[l]:
        code = (code << 1) | r.bit()
        l += 1
        if l > 16:
            raise ValueError("corrupt JPEG: huffman code over 16 bits")
    return t.values[t.valptr[l] + code - t.mincode[l]]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit magnitude to signed."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _unstuff(ecs: bytes) -> list:
    """Split an entropy-coded stream on RSTn markers and undo 0xFF00
    byte stuffing; returns the list of unstuffed segments."""
    segs = []
    cur = bytearray()
    i = 0
    n = len(ecs)
    while i < n:
        b = ecs[i]
        if b == 0xFF and i + 1 < n:
            m = ecs[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs


def jpeg_pixels(payload: bytes) -> np.ndarray:
    """(H, W, 3) RGB (or (H, W, 1) grayscale) uint8 of a BASELINE
    sequential JPEG.  Raises on progressive/arithmetic streams."""
    p = payload
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    scan = None
    ecs = None
    while i < len(p):
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(p[i + 2 : i + 4], "big")
        seg = p[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[j + 1 : j + 65], dtype=np.uint8
                    ).astype(np.int64)
                    j += 65
                else:  # 16-bit table
                    tbl = np.frombuffer(
                        seg[j + 1 : j + 129], dtype=">u2"
                    ).astype(np.int64)
                    j += 129
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline(+ext seq)
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append(
                    {
                        "id": cid,
                        "h": hv >> 4,
                        "v": hv & 15,
                        "tq": seg[8 + c * 3],
                    }
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) supported"
            )
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                values = list(seg[j + 17 : j + 17 + nv])
                dec = _HuffDecoder(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tt = seg[2 + c * 2]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 15})
            ecs = p[i + 2 + seglen :]
            break
        i += 2 + seglen
    if frame is None or scan is None or ecs is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")

    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for s, c in zip(scan, order):
        c["td"], c["ta"] = s["td"], s["ta"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    segs = _unstuff(ecs)
    blocks: dict = {c["id"]: [] for c in comps}
    pred: dict = {c["id"]: 0 for c in comps}
    n_mcus = mcus_x * mcus_y
    mcu_idx = 0
    seg_i = 0
    r = _BitReader(segs[0])
    per_seg = restart_interval if restart_interval else n_mcus
    while mcu_idx < n_mcus:
        if mcu_idx and restart_interval and mcu_idx % per_seg == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("corrupt JPEG: missing restart segment")
            r = _BitReader(segs[seg_i])
            for c in comps:
                pred[c["id"]] = 0
        for c in order:
            for _ in range(c["h"] * c["v"]):
                coef = np.zeros(64, np.int64)
                t_dc = huff_dc[c["td"]]
                t_ac = huff_ac[c["ta"]]
                size = _huff_decode(r, t_dc)
                diff = _extend(r.bits(size), size)
                pred[c["id"]] += diff
                coef[0] = pred[c["id"]]
                k = 1
                while k < 64:
                    rs = _huff_decode(r, t_ac)
                    rr, size = rs >> 4, rs & 15
                    if size == 0:
                        if rr == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rr
                    if k > 63:
                        raise ValueError("corrupt JPEG: AC index > 63")
                    coef[k] = _extend(r.bits(size), size)
                    k += 1
                blocks[c["id"]].append(coef)
        mcu_idx += 1

    d8 = _dct8()
    planes = []
    for c in comps:
        bl = np.asarray(blocks[c["id"]], dtype=np.float64)
        q = qt[c["tq"]]
        deq = bl * q.astype(np.float64)[None, :]
        sq = np.zeros_like(deq)
        sq[:, _ZIGZAG] = deq  # un-zigzag
        sq = sq.reshape(-1, 8, 8)
        # batched 2D IDCT: X = C^T S C
        spatial = np.einsum("ij,njk,kl->nil", d8.T, sq, d8)
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(
            np.uint8
        )
        # blocks arrive in MCU raster order, c.h x c.v per MCU
        ch, cv = c["h"], c["v"]
        pw, ph = mcus_x * ch * 8, mcus_y * cv * 8
        plane = np.empty((ph, pw), np.uint8)
        bi = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(cv):
                    for bx in range(ch):
                        plane[
                            (my * cv + by) * 8 : (my * cv + by) * 8 + 8,
                            (mx * ch + bx) * 8 : (mx * ch + bx) * 8 + 8,
                        ] = spatial[bi]
                        bi += 1
        # upsample to full-resolution grid, crop to (h, w)
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """Stage-contract dict for a baseline JPEG (see ``decode_image``);
    ``mean_value`` scaled to [0, 1] like the other still decoders."""
    px = jpeg_pixels(payload)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "channels": int(px.shape[2]),
        "mean_value": float(px.astype(np.float64).mean() / 255.0),
    }


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for b in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> b) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | (
                (1 << (8 - self.nacc)) - 1
            )  # pad with 1-bits
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


def _huff_encode_table(bits: list, values: list) -> dict:
    """symbol -> (code, length) canonical assignment."""
    out = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            out[values[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a quantization table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((tbl * s + 50) // 100, 1, 255)


def _size_of(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder (Annex K example tables, IJG quality
    scaling) at 4:4:4 or 4:2:0 chroma subsampling, optionally with DRI
    restart markers every ``restart_interval`` MCUs.  Accepts
    (H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if nc == 3:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            # 2x2 mean chroma downsample (pad odd dims by edge first)
            ch2, cw2 = -(-h // 2) * 2, -(-w // 2) * 2
            for ci in (1, 2):
                p = np.pad(
                    planes[ci],
                    ((0, ch2 - h), (0, cw2 - w)),
                    mode="edge",
                )
                planes[ci] = p.reshape(
                    ch2 // 2, 2, cw2 // 2, 2
                ).mean(axis=(1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        qtabs = [0, 1, 1]
        htabs = [0, 1, 1]
    elif nc == 1:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qtabs = [0]
        htabs = [0]
    else:
        raise ValueError("encode_jpeg wants 1 or 3 channels")

    q0 = _quality_scale(_QUANT_LUMA, quality)
    q1 = _quality_scale(_QUANT_CHROMA, quality)
    qts = [q0, q1]
    d8 = _dct8()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    enc_dc = [
        _huff_encode_table(*_HUFF_DC_LUMA),
        _huff_encode_table(*_HUFF_DC_CHROMA),
    ]
    enc_ac = [
        _huff_encode_table(*_HUFF_AC_LUMA),
        _huff_encode_table(*_HUFF_AC_CHROMA),
    ]

    coefs = []  # per component: (nby, nbx, 64) zigzagged quantized
    for ci, plane in enumerate(planes):
        chs, cvs = samp[ci]
        tph, tpw = mcus_y * cvs * 8, mcus_x * chs * 8
        pad = np.pad(
            plane,
            ((0, tph - plane.shape[0]), (0, tpw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        bl = (
            pad.reshape(tph // 8, 8, tpw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        f = np.einsum("ij,njk,kl->nil", d8, bl, d8.T)
        q = qts[qtabs[ci]].astype(np.float64).reshape(8, 8)
        zz = np.round(f / q[None]).astype(np.int64).reshape(-1, 64)[
            :, _ZIGZAG
        ].reshape(tph // 8, tpw // 8, 64)
        coefs.append(zz)

    def emit_block(zz: np.ndarray, ci: int) -> None:
        dct_dc = enc_dc[htabs[ci]]
        dct_ac = enc_ac[htabs[ci]]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size = _size_of(diff)
        code, ln = dct_dc[size]
        wtr.write(code, ln)
        if size:
            wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if zz.any() else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    code, ln = dct_ac[0x00]  # EOB
                    wtr.write(code, ln)
                    break
                run += 1
                continue
            while run > 15:
                code, ln = dct_ac[0xF0]  # ZRL
                wtr.write(code, ln)
                run -= 16
            size = _size_of(v)
            code, ln = dct_ac[(run << 4) | size]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0

    wtr = _BitWriter()
    pred = [0] * len(planes)
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                for ci in range(len(planes)):
                    pred[ci] = 0
            for ci in range(len(planes)):
                chs, cvs = samp[ci]
                for by in range(cvs):
                    for bx in range(chs):
                        emit_block(
                            coefs[ci][my * cvs + by, mx * chs + bx],
                            ci,
                        )
            mcu_i += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(q0[_ZIGZAG].astype(np.uint8)))
    if nc == 3:
        out += seg(
            0xDB, bytes([0x01]) + bytes(q1[_ZIGZAG].astype(np.uint8))
        )
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(nc)
    for ci in range(nc):
        sof += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], qtabs[ci]]
        )
    out += seg(0xC0, bytes(sof))
    for tc, tabs in ((0, (_HUFF_DC_LUMA, _HUFF_DC_CHROMA)),
                     (1, (_HUFF_AC_LUMA, _HUFF_AC_CHROMA))):
        for th in range(2 if nc == 3 else 1):
            bits, values = tabs[th]
            out += seg(
                0xC4,
                bytes([(tc << 4) | th])
                + bytes(bits)
                + bytes(values),
            )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (htabs[ci] << 4) | htabs[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
