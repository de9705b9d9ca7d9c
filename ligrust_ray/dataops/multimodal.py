"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages with small batches (large
payloads: batch_size × concurrency must fit the worker heap).

The image/audio codecs are NOT in this container, so the decode kernel is a
clearly marked stub: ``DecodeStage(real=True)`` raises NotImplementedError
at the exact point where e.g. ``PIL.Image.open(io.BytesIO(payload))`` would
run; the default deterministic fake derives pseudo-dimensions and a feature
vector from the payload bytes so the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),     # "image" | "audio" | "video"
    ("meta", pa.string()),           # JSON sidecar (e.g. codec, source url)
])


def docs_as_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Adapter for tests: treat document text bytes as opaque payloads."""

    def conv(t: pa.Table) -> pa.Table:
        payloads = [x.encode("utf-8") for x in t.column("text").to_pylist()]
        n = t.num_rows
        return pa.table({
            "media_id": t.column("doc_id"),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image"] * n, type=pa.string()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        })

    return docs.map_batches(conv, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode/feature-extract kernel.

    __init__ = the once-per-actor model/codec setup point (this is where a
    real deployment loads libjpeg/ffmpeg/an encoder ONCE, not per batch).
    """

    def __init__(self, feature_dim: int = 16, real: bool = False):
        self.feature_dim = feature_dim
        self.real = real

    def _decode_fake(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        h = hashlib.blake2b(payload, digest_size=8 + self.feature_dim).digest()
        w = 64 + h[0]
        ht = 64 + h[1]
        feat = (np.frombuffer(h[8:], dtype=np.uint8).astype(np.float32)
                / 255.0)
        return w, ht, feat

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real media decode: plug PIL/ffmpeg here (not in container)")
        ws, hs, feats = [], [], []
        for payload in t.column("payload").to_pylist():
            w, h, f = self._decode_fake(payload)
            ws.append(w)
            hs.append(h)
            feats.append(f)
        fmat = np.stack(feats) if feats else np.zeros((0, self.feature_dim),
                                                      dtype=np.float32)
        return pa.table({
            "media_id": t.column("media_id"),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(fmat.ravel(), type=pa.float32()), self.feature_dim),
        })


def decode_features(media: ray.data.Dataset, feature_dim: int = 16,
                    concurrency=(1, 4), batch_size: int = 64
                    ) -> ray.data.Dataset:
    """The pipeline: small batches (payloads are large), actor pool sized
    separately from the reader so neither starves."""
    return media.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(feature_dim=feature_dim))
