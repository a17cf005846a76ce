"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata, processed by actor-pool ``map_batches`` stages.  Decode is
REAL for the uncompressed public formats — PPM/PGM/BMP images, RIFF
PCM WAV audio, YUV4MPEG2 video (pure numpy/stdlib kernels in
``functions/codecs.py``); compressed formats (JPEG/PNG/MP4) need
libraries not in this container, so each stage keeps an injectable
kernel (``decode=`` / ``resize=`` / ``extract_frames=``) plus a
deterministic fake for plumbing tests.

Batch-size note: binary payloads dominate block size; callers should
pass small ``batch_size`` (e.g. 64) so batch x concurrency fits the
worker heap, and keep ``target_max_block_size`` moderate.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def real_decode_image(payload: bytes):
    """Real decoder for the library-free public formats (PPM/PGM/BMP
    in pure numpy, PNG via stdlib zlib + numpy unfiltering, baseline
    sequential JPEG via the from-scratch T.81 decoder —
    ``functions/codecs.py``).  GIF/WEBP and progressive JPEG still
    need an image library not present in this container —
    ``decode_image`` raises ValueError for those; inject a decode=
    callable into BlobFeatureStage to handle them."""
    from ..functions.codecs import decode_image

    return decode_image(payload)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for decode: derives pseudo width/height
    and a channel mean from the payload bytes."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_value": round(sum(h[2:10]) / 8 / 255.0, 6),
    }


class BlobFeatureStage:
    """Actor-pool stage: (id, payload binary) -> typed blob metadata.

    ``__init__`` once per actor (where a real model/codec would load);
    ``__call__`` per batch.  Use as::

        ds.map_batches(BlobFeatureStage, fn_constructor_kwargs=...,
                       batch_size=64, concurrency=(1, 8),
                       batch_format="pyarrow")
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", decode=None):
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode if decode is not None else _fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        payloads = batch[self.payload_col].to_pylist()
        n_bytes, sha, widths, heights, means = [], [], [], [], []
        for p in payloads:
            p = p or b""
            n_bytes.append(len(p))
            sha.append(hashlib.sha256(p).hexdigest())
            meta = self.decode(p)
            widths.append(meta["width"])
            heights.append(meta["height"])
            means.append(meta["mean_value"])
        return pa.table(
            {
                self.id_col: ids,
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "sha256": pa.array(sha, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_value": pa.array(means, pa.float64()),
            }
        )


def real_extract_frames(payload: bytes, num_frames: int):
    """Real frame sampler for YUV4MPEG2 (.y4m) uncompressed video —
    header arithmetic + buffer slicing, no codec library
    (``functions/codecs.py``).  Compressed containers (MP4/WebM) still
    need ffmpeg/pyav — ``extract_frames_y4m`` raises ValueError for
    those; inject extract_frames= into FrameSampleStage to handle
    them."""
    from ..functions.codecs import extract_frames_y4m

    return extract_frames_y4m(payload, num_frames)


def _fake_extract_frames(payload: bytes, num_frames: int):
    """Deterministic stand-in: evenly slice the payload into
    pseudo-frames with synthetic timestamps (30 fps-equivalent)."""
    p = payload or b"\x00"
    out = []
    step = max(1, len(p) // num_frames)
    for i in range(num_frames):
        chunk = p[i * step : (i + 1) * step] or p[-step:]
        out.append((int(i * 1000 / 30), chunk))
    return out


class FrameSampleStage:
    """Actor-pool flat-expand stage: one video blob row -> N frame rows.

    Output layout (the real contract a downstream vision model stage
    consumes): ``(id, frame_idx: int32, frame_ts_ms: int64,
    frame: binary, frame_sha256: string)``.  The sampler is injectable
    (``extract_frames=``); the deterministic fake keeps the plumbing —
    explode cardinality, schema, batch sizing — fully testable without
    codec libraries.  Use small ``batch_size`` (frames multiply payload
    bytes per block)."""

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        num_frames: int = 4,
        extract_frames=None,
    ):
        self.payload_col = payload_col
        self.id_col = id_col
        self.num_frames = num_frames
        self.extract = (
            extract_frames
            if extract_frames is not None
            else _fake_extract_frames
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_in = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        ids, idxs, tss, frames, shas = [], [], [], [], []
        for i, p in zip(ids_in, payloads):
            for j, (ts, chunk) in enumerate(
                self.extract(p, self.num_frames)
            ):
                ids.append(i)
                idxs.append(j)
                tss.append(ts)
                frames.append(chunk)
                shas.append(hashlib.sha256(chunk).hexdigest())
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_ts_ms": pa.array(tss, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
                "frame_sha256": pa.array(shas, pa.string()),
            }
        )


def real_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for PPM/PGM payloads (pure numpy,
    ``functions/codecs.py``); raises ValueError for compressed formats
    — inject a resize= callable into ResizeStage for those."""
    from ..functions.codecs import resize_image

    return resize_image(payload, width, height)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: a content-derived thumbnail payload
    whose bytes are a blake2b stream seeded by (payload, dims)."""
    seed = hashlib.blake2b(
        (payload or b"") + f":{width}x{height}".encode(), digest_size=32
    ).digest()
    reps = (width * height * 3 // 32 // 64) + 1  # tiny stand-in body
    return (seed * reps)[:64]


class ResizeStage:
    """Actor-pool stage: (id, image blob) -> resized blob + target dims.

    Output: ``(id, resized: binary, width: int32, height: int32,
    resized_sha256: string)``.  Kernel injectable via ``resize=``."""

    def __init__(
        self,
        width: int = 224,
        height: int = 224,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        resize=None,
    ):
        self.width = width
        self.height = height
        self.payload_col = payload_col
        self.id_col = id_col
        self.resize = resize if resize is not None else _fake_resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        out = [
            self.resize(p or b"", self.width, self.height)
            for p in payloads
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "resized": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(out), pa.int32()),
                "height": pa.array([self.height] * len(out), pa.int32()),
                "resized_sha256": pa.array(
                    [hashlib.sha256(b).hexdigest() for b in out],
                    pa.string(),
                ),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: (id, WAV blob) -> audio features.

    Output: ``(id, sample_rate: int32, n_channels: int32,
    n_samples: int64, duration_ms: int64, rms: float64)``.  The decode
    kernel defaults to the REAL stdlib/numpy WAV decoder
    (``functions/codecs.decode_wav``); inject ``decode=`` for
    compressed audio (mp3/flac need libraries absent here)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", decode=None):
        from ..functions.codecs import decode_wav

        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode if decode is not None else decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self.decode(p or b"")
            for p in batch[self.payload_col].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "sample_rate": pa.array(
                    [m["sample_rate"] for m in metas], pa.int32()
                ),
                "n_channels": pa.array(
                    [m["n_channels"] for m in metas], pa.int32()
                ),
                "n_samples": pa.array(
                    [m["n_samples"] for m in metas], pa.int64()
                ),
                "duration_ms": pa.array(
                    [m["duration_ms"] for m in metas], pa.int64()
                ),
                "rms": pa.array([m["rms"] for m in metas], pa.float64()),
            }
        )


def blob_meta_basic(batch: pa.Table, payload_col="payload", id_col="doc_id") -> pa.Table:
    """Decode-free metadata (size + sha256) — SQL-checkable subset."""
    payloads = batch[payload_col].to_pylist()
    return pa.table(
        {
            id_col: batch[id_col],
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "sha256": pa.array(
                [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                pa.string(),
            ),
        }
    )


class PhashStage:
    """Actor-pool stage: (id, image payload) -> 64-bit perceptual hash.

    The fixed-point DCT basis is built ONCE per actor in ``__init__``
    (the codec-load analog); ``__call__`` hashes a batch.  Default
    pixel source sniffs PNM/BMP/PNG/baseline-JPEG
    (``codecs.image_pixels``); inject ``pixels_fn`` for formats
    needing an external codec (GIF/WEBP, progressive JPEG).
    """

    def __init__(
        self,
        payload_col: str = "payload",
        id_col: str = "doc_id",
        pixels_fn=None,
    ):
        from ..functions.codecs import dct_matrix_fixed, image_pixels

        self.payload_col = payload_col
        self.id_col = id_col
        self.pixels = pixels_fn if pixels_fn is not None else image_pixels
        self.dct = dct_matrix_fixed()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import phash64

        hashes = [
            phash64(self.pixels(p), self.dct)
            for p in batch[self.payload_col].to_pylist()
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col]
                .combine_chunks()
                .cast(pa.int64()),
                "phash": pa.array(hashes, pa.uint64()),
            }
        )


def image_phash_pairs(
    ds: "ray.data.Dataset",
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    pixels_fn=None,
    concurrency=(1, 8),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Near-duplicate image pairs by perceptual hash: decode ->
    all-integer pHash per image (actor pool) -> banded hamming pairing
    (shared `hamming_band_pairs` machinery with simhash text dedup).

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming <=
    ``max_hamming``.  The image payloads never shuffle — only (id,
    64-bit sig) rows leave the hashing stage.
    """
    from .dedup import hamming_band_pairs

    sigs = ds.map_batches(
        PhashStage,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "id_col": id_col,
            "pixels_fn": pixels_fn,
        },
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return hamming_band_pairs(
        sigs, id_col=id_col, sig_col="phash", max_hamming=max_hamming
    )


class AudioFingerprintStage:
    """Actor-pool stage: (id, WAV payload) -> 64-bit energy-delta
    fingerprint (`codecs.audio_fingerprint64`).  Stateless beyond the
    codec import, but kept an actor class so a real acoustic model
    slots into ``__init__`` unchanged."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id", fp_fn=None):
        from ..functions.codecs import audio_fingerprint64

        self.payload_col = payload_col
        self.id_col = id_col
        self.fp = fp_fn if fp_fn is not None else audio_fingerprint64

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fp(p) for p in batch[self.payload_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col]
                .combine_chunks()
                .cast(pa.int64()),
                "afp": pa.array(fps, pa.uint64()),
            }
        )


def audio_fp_pairs(
    ds: "ray.data.Dataset",
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    fp_fn=None,
    concurrency=(1, 8),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Near-duplicate audio pairs: WAV decode -> all-integer
    energy-delta fingerprint (actor pool) -> the same banded hamming
    pairing as simhash/pHash.  Payloads never shuffle."""
    from .dedup import hamming_band_pairs

    sigs = ds.map_batches(
        AudioFingerprintStage,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "id_col": id_col,
            "fp_fn": fp_fn,
        },
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    return hamming_band_pairs(
        sigs, id_col=id_col, sig_col="afp", max_hamming=max_hamming
    )
