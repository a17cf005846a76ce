"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata, processed by actor-pool ``map_batches`` stages.  The decode
libraries are not in this container, so the decode kernel is STUBBED
(deterministic fake behind ``decode=`` or a clear NotImplementedError);
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested.

Batch-size note: binary payloads dominate block size; callers should
pass small ``batch_size`` (e.g. 64) so batch x concurrency fits the
worker heap, and keep ``target_max_block_size`` moderate.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def real_decode_image(payload: bytes):
    """Placeholder for a real decoder (PIL/libvips — not installed)."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; inject a decode= callable into BlobFeatureStage"
    )


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
