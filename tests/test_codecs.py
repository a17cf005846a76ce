"""Real decode kernels (functions/codecs.py): PPM/PGM/BMP, WAV, Y4M."""

import numpy as np
import pyarrow as pa
import pytest

from cex_crawler_ray.functions import codecs
from cex_crawler_ray.stages.multimodal import (
    AudioFeatureStage,
    BlobFeatureStage,
    FrameSampleStage,
    ResizeStage,
    real_decode_image,
    real_extract_frames,
    real_resize_image,
)


def _ppm(w, h, value):
    px = np.full((h, w, 3), value, dtype=np.uint8)
    return codecs.encode_ppm(px)


def _bmp24(w, h, value):
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = value
    body = rows.tobytes()
    off = 54
    hdr = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + body


# ------------------------------------------------------------------ images


def test_ppm_roundtrip_decode():
    meta = codecs.decode_image(_ppm(10, 6, 51))
    assert (meta["width"], meta["height"], meta["channels"]) == (10, 6, 3)
    assert meta["mean_value"] == pytest.approx(51 / 255)


def test_pgm_decode():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    meta = codecs.decode_image(codecs.encode_ppm(px))
    assert (meta["width"], meta["height"], meta["channels"]) == (4, 4, 1)
    assert meta["mean_value"] == pytest.approx(7.5 / 255)


def test_ppm_comment_header():
    payload = b"P6\n# a comment\n3 2\n255\n" + bytes(3 * 2 * 3)
    meta = codecs.decode_pnm(payload)
    assert (meta["width"], meta["height"]) == (3, 2)


def test_bmp_decode_row_padding():
    # w=3 -> 9 data bytes padded to 12 per row; padding must not skew mean
    meta = codecs.decode_image(_bmp24(3, 2, 100))
    assert (meta["width"], meta["height"]) == (3, 2)
    assert meta["mean_value"] == pytest.approx(100 / 255)


def test_decode_image_rejects_compressed():
    # JPEG now decodes for real — a garbage body must still raise
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError, match="GIF"):
        codecs.decode_image(b"GIF89a....")
    with pytest.raises(ValueError):
        real_decode_image(b"\x89PNG\r\n")


def test_resize_nearest_downsample():
    # 4x4 quadrant image -> 2x2 picks one pixel per quadrant
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2, 2:] = 50
    px[2:, :2] = 100
    px[2:, 2:] = 150
    out = codecs.pnm_pixels(real_resize_image(codecs.encode_ppm(px), 2, 2))
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == 0 and out[0, 1, 0] == 50
    assert out[1, 0, 0] == 100 and out[1, 1, 0] == 150


def test_resize_upsample_dims():
    out = codecs.pnm_pixels(codecs.resize_image(_ppm(2, 2, 7), 5, 3))
    assert out.shape == (3, 5, 3)
    assert (out == 7).all()


# ------------------------------------------------------------------- audio


def test_wav_decode_constant_amplitude():
    wav = codecs.encode_wav(
        np.full(400, -300, dtype=np.int16), sample_rate=8000
    )
    meta = codecs.decode_wav(wav)
    assert meta["sample_rate"] == 8000
    assert meta["n_channels"] == 1
    assert meta["n_samples"] == 400
    assert meta["duration_ms"] == 50
    assert meta["rms"] == 300.0


def test_wav_decode_empty():
    meta = codecs.decode_wav(codecs.encode_wav(np.zeros(0, np.int16)))
    assert meta["n_samples"] == 0 and meta["rms"] == 0.0


# ------------------------------------------------------------------- video


def _y4m(n_frames, w=8, h=8):
    frames = np.stack(
        [np.full((h, w), i * 10, dtype=np.uint8) for i in range(n_frames)]
    )
    return codecs.encode_y4m(frames, fps=30)


def test_y4m_info_and_sampling():
    payload = _y4m(6)
    info = codecs.y4m_info(payload)
    assert info["n_frames"] == 6
    assert (info["width"], info["height"]) == (8, 8)
    frames = real_extract_frames(payload, 4)
    assert len(frames) == 4
    # even sampling: source frames 0,1,3,4 at 30 fps
    assert [ts for ts, _ in frames] == [0, 33, 100, 133]
    # each emitted frame is itself a decodable single-frame y4m
    for k, (_, fb) in enumerate(frames):
        sub = codecs.y4m_info(fb)
        assert sub["n_frames"] == 1
        src = [0, 1, 3, 4][k]
        y = np.frombuffer(
            fb[fb.index(b"FRAME\n") + 6 :][:64], dtype=np.uint8
        )
        assert (y == src * 10).all()


def test_y4m_more_samples_than_frames():
    frames = codecs.extract_frames_y4m(_y4m(2), 4)
    assert [ts for ts, _ in frames] == [0, 0, 33, 33]


def test_y4m_rejects_other_payloads():
    with pytest.raises(ValueError):
        codecs.extract_frames_y4m(b"\x00\x00\x00 ftypisom", 4)


# ------------------------------------------- stages with real kernels


def _blob_table(payloads):
    return pa.table(
        {
            "doc_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def test_blob_feature_stage_real_decode():
    stage = BlobFeatureStage(decode=codecs.decode_image)
    out = stage(_blob_table([_ppm(5, 4, 20), _bmp24(3, 2, 200)]))
    assert out["width"].to_pylist() == [5, 3]
    assert out["height"].to_pylist() == [4, 2]
    assert out["mean_value"].to_pylist() == pytest.approx(
        [20 / 255, 200 / 255]
    )


def test_resize_stage_real_kernel():
    stage = ResizeStage(width=3, height=3, resize=codecs.resize_image)
    out = stage(_blob_table([_ppm(6, 6, 9)]))
    px = codecs.pnm_pixels(out["resized"][0].as_py())
    assert px.shape == (3, 3, 3) and (px == 9).all()


def test_frame_sample_stage_real_y4m():
    stage = FrameSampleStage(
        num_frames=3, extract_frames=codecs.extract_frames_y4m
    )
    out = stage(_blob_table([_y4m(6), _y4m(3)]))
    assert out.num_rows == 6
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 0, 1, 2]
    assert out["frame_ts_ms"].to_pylist() == [0, 66, 133, 0, 33, 66]


def test_audio_feature_stage_real_wav():
    stage = AudioFeatureStage()
    wavs = [
        codecs.encode_wav(np.full(160, 25, np.int16), 16000),
        codecs.encode_wav(np.zeros(80, np.int16), 8000),
    ]
    out = stage(_blob_table(wavs))
    assert out["sample_rate"].to_pylist() == [16000, 8000]
    assert out["duration_ms"].to_pylist() == [10, 10]
    assert out["rms"].to_pylist() == [25.0, 0.0]


# ------------------------------------------------------------------- PNG


def _rand_px(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def test_png_roundtrip_rgb():
    px = _rand_px(13, 7, 3)
    assert (codecs.png_pixels(codecs.encode_png(px)) == px).all()


def test_png_roundtrip_gray_and_alpha():
    for c in (1, 2, 4):
        px = _rand_px(5, 9, c, seed=c)
        out = codecs.png_pixels(codecs.encode_png(px))
        assert out.shape == (5, 9, c) and (out == px).all()


def test_png_decode_image_contract():
    px = np.full((4, 6, 3), 100, dtype=np.uint8)
    meta = codecs.decode_image(codecs.encode_png(px))
    assert meta["width"] == 6 and meta["height"] == 4
    assert meta["channels"] == 3
    assert abs(meta["mean_value"] - 100 / 255) < 1e-12


def _png_with_filters(px, filters):
    """Encode (H, W, C) with a given per-row filter list — exercises the
    decoder against spec-filtered streams (the encoder itself always
    writes filter 0)."""
    import zlib

    h, w, c = px.shape
    p = px.astype(np.int64)
    rows = []
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        cur = p[y].ravel()
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - np.concatenate([np.zeros(c, np.int64), cur[:-c]])) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = cur.copy()
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0
                enc[i] = (cur[i] - (a + prev[i]) // 2) % 256
        elif f == 4:
            enc = cur.copy()
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                q = a + b - cc
                qa, qb, qc = abs(q - a), abs(q - b), abs(q - cc)
                pred = a if (qa <= qb and qa <= qc) else (b if qb <= qc else cc)
                enc[i] = (cur[i] - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, {1: 0, 3: 2}[c], 0, 0, 0])
    )
    idat = zlib.compress(b"".join(rows))

    def chunk(t, d):
        body = t + d
        return len(d).to_bytes(4, "big") + body + (zlib.crc32(body)).to_bytes(4, "big")

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def test_png_all_filter_types():
    px = _rand_px(10, 6, 3, seed=42)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        out = codecs.png_pixels(_png_with_filters(px, filters))
        assert (out == px).all(), f"filters {filters}"


def test_png_palette():
    import zlib

    pal = _rand_px(1, 256, 3, seed=3).reshape(256, 3)
    idx = _rand_px(4, 5, 1, seed=4)
    ihdr = (5).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    rows = b"".join(b"\x00" + bytes(idx[y].ravel()) for y in range(4))

    def chunk(t, d):
        body = t + d
        return len(d).to_bytes(4, "big") + body + (zlib.crc32(body)).to_bytes(4, "big")

    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b"")
    )
    out = codecs.png_pixels(payload)
    assert out.shape == (4, 5, 3)
    assert (out == pal[idx[:, :, 0]]).all()


def test_png_multi_idat():
    # IDAT zlib stream split across two chunks must reassemble
    import zlib

    px = _rand_px(6, 6, 3, seed=7)
    full = codecs.encode_png(px)
    # re-split: decode chunks, split IDAT payload in half
    chunks = list(codecs._png_chunks(full))
    idat = next(d for t, d in chunks if t == b"IDAT")

    def chunk(t, d):
        body = t + d
        return len(d).to_bytes(4, "big") + body + (zlib.crc32(body)).to_bytes(4, "big")

    ihdr = next(d for t, d in chunks if t == b"IHDR")
    half = len(idat) // 2
    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat[:half]) + chunk(b"IDAT", idat[half:])
        + chunk(b"IEND", b"")
    )
    assert (codecs.png_pixels(payload) == px).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        codecs.png_pixels(b"\x89PNG\r\n\x1a\njunk")
    # 16-bit depth
    import zlib

    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])

    def chunk(t, d):
        body = t + d
        return len(d).to_bytes(4, "big") + body + (zlib.crc32(body)).to_bytes(4, "big")

    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        codecs.png_pixels(payload)


def test_phash_png_equals_ppm():
    px = _rand_px(32, 32, 3, seed=11)
    h_ppm = codecs.phash64(codecs.pnm_pixels(codecs.encode_ppm(px)))
    h_png = codecs.phash64(codecs.png_pixels(codecs.encode_png(px)))
    assert h_ppm == h_png


def test_resize_png_input():
    px = np.full((8, 8, 3), 33, dtype=np.uint8)
    out = codecs.pnm_pixels(codecs.resize_image(codecs.encode_png(px), 4, 4))
    assert out.shape == (4, 4, 3) and (out == 33).all()


def test_bmp_pixels_orientation():
    # 2x2 BMP: distinct corner colors, bottom-up storage, BGR order
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]], np.uint8
    )
    h, w = 2, 2
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        r = b"".join(bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0]]) for x in range(w))
        rows += r + b"\x00" * (stride - w * 3)
    hdr = (
        b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    out = codecs.bmp_pixels(hdr + rows)
    assert (out == px).all()


def test_phash_stage_sniffs_png():
    from cex_crawler_ray.stages.multimodal import PhashStage

    px = _rand_px(32, 32, 3, seed=19)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [codecs.encode_ppm(px), codecs.encode_png(px)], pa.binary()
            ),
        }
    )
    out = PhashStage()(t)
    hashes = out["phash"].to_pylist()
    assert hashes[0] == hashes[1]


# ------------------------------------------------------------------- JPEG


def _gradient_px(h, w, c=3):
    yy, xx = np.mgrid[0:h, 0:w]
    if c == 1:
        return (((yy * 3 + xx * 2) // 4) % 256).astype(np.uint8)[
            :, :, None
        ]
    return np.stack(
        [
            ((yy * 3 + 10) // 2) % 256,
            ((xx * 2 + 100) // 2) % 256,
            (((xx + yy) * 2) // 2) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_constant_q100_roundtrips_exactly():
    for v in (0, 17, 128, 200, 255):
        px = np.full((19, 21), v, dtype=np.uint8)
        dec = codecs.jpeg_pixels(codecs.encode_jpeg(px, quality=100))
        assert dec.shape == (19, 21, 1)
        assert (dec == v).all()
        rgb = np.full((19, 21, 3), v, dtype=np.uint8)
        dec = codecs.jpeg_pixels(
            codecs.encode_jpeg(rgb, quality=100, subsampling="420")
        )
        assert dec.shape == (19, 21, 3)
        assert (dec == v).all()


def test_jpeg_smooth_gradient_near_lossless():
    px = _gradient_px(41, 53)
    for sub in ("444", "420"):
        dec = codecs.jpeg_pixels(
            codecs.encode_jpeg(px, quality=95, subsampling=sub)
        )
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.max() <= 6, (sub, err.max())


def test_jpeg_restart_intervals():
    px = _gradient_px(48, 64)
    plain = codecs.jpeg_pixels(codecs.encode_jpeg(px, quality=95))
    with_rst = codecs.jpeg_pixels(
        codecs.encode_jpeg(px, quality=95, restart_interval=3)
    )
    assert (plain == with_rst).all()
    # 420 with restarts too
    r420 = codecs.jpeg_pixels(
        codecs.encode_jpeg(
            px, quality=95, subsampling="420", restart_interval=2
        )
    )
    assert r420.shape == px.shape


def test_jpeg_decode_image_contract():
    px = np.full((16, 24, 3), 99, dtype=np.uint8)
    meta = codecs.decode_image(codecs.encode_jpeg(px, quality=100))
    assert meta["width"] == 24 and meta["height"] == 16
    assert meta["channels"] == 3
    assert abs(meta["mean_value"] - 99 / 255.0) < 1e-12


def test_jpeg_rejects_progressive():
    # splice a progressive SOF2 marker into an otherwise valid stream
    enc = bytearray(
        codecs.encode_jpeg(np.zeros((8, 8), np.uint8), quality=90)
    )
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        codecs.jpeg_pixels(bytes(enc))


def test_phash_jpeg_identical_on_structured_images():
    # images whose DCT coefficients sit away from the median survive a
    # q100 roundtrip with an IDENTICAL pHash (smooth gradients are the
    # known-pathological case: many near-median coefficients, so a +-2
    # pixel wobble flips bits — by design of median-split hashing)
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    blocks = np.kron(
        rng.integers(0, 2, (4, 4)), np.ones((8, 8))
    ) * 255
    blocks = np.stack([blocks] * 3, axis=-1).astype(np.uint8)
    for px in (noise, blocks):
        h_raw = codecs.phash64(px)
        h_jpg = codecs.phash64(
            codecs.jpeg_pixels(codecs.encode_jpeg(px, quality=100))
        )
        assert h_raw == h_jpg


def test_phash_stage_on_jpeg_payloads(ray_session):
    from cex_crawler_ray.stages.multimodal import PhashStage

    px_a = _gradient_px(32, 32)
    px_b = 255 - px_a
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [
                    codecs.encode_jpeg(px_a, quality=100),
                    codecs.encode_jpeg(px_b, quality=100),
                ],
                pa.binary(),
            ),
        }
    )
    import ray

    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            PhashStage(),
            concurrency=1,
            batch_size=2,
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 2
    # inverted image flips most DCT signs: hashes must differ
    assert out["phash"].iloc[0] != out["phash"].iloc[1]
