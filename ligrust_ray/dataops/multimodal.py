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
        # pseudo-dims from the first two md5 digest bytes — replicable in
        # the DuckDB oracle as md5_number_upper(text) & 255 etc. (the
        # upper-u64 is the little-endian view of digest[0:8])
        d = hashlib.md5(payload).digest()
        w = 64 + d[0]
        ht = 64 + d[1]
        h = hashlib.blake2b(payload, digest_size=self.feature_dim).digest()
        feat = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
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


class ResizeStage:
    """Actor-pool resize kernel: payload -> payload at (target_w, target_h).

    The fake path derives the "resized" payload deterministically from the
    input bytes + target dims; ``real=True`` raises at the exact point a
    deployment would call ``PIL.Image.resize`` / ``cv2.resize``.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 real: bool = False):
        self.tw = target_w
        self.th = target_h
        self.real = real

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real resize: plug PIL/cv2 here (not in container)")
        out = []
        for payload in t.column("payload").to_pylist():
            h = hashlib.blake2b(payload, digest_size=32,
                                person=b"resize").digest()
            out.append(h + self.tw.to_bytes(4, "big")
                       + self.th.to_bytes(4, "big"))
        n = t.num_rows
        return pa.table({
            "media_id": t.column("media_id"),
            "payload": pa.array(out, type=pa.binary()),
            "width": pa.array([self.tw] * n, type=pa.int64()),
            "height": pa.array([self.th] * n, type=pa.int64()),
        })


class FrameSampleStage:
    """Actor-pool frame sampler: one video payload -> ``n_frames`` frame
    rows (media_id, frame_idx, frame payload) — the row-expanding
    (flat_map-shaped) stage of a video pipeline. Deterministic fake
    frames; ``real=True`` raises where ffmpeg/pyav seek+decode would run."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        self.real = real

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real frame sampling: plug ffmpeg/pyav here (not in container)")
        ids, idxs, frames = [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            for i in range(self.n_frames):
                ids.append(mid)
                idxs.append(i)
                frames.append(hashlib.blake2b(
                    payload + i.to_bytes(4, "big"), digest_size=32,
                    person=b"frame").digest())
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int64()),
            "frame": pa.array(frames, type=pa.binary()),
        })


def resize_media(media: ray.data.Dataset, target_w: int = 224,
                 target_h: int = 224, concurrency=(1, 4),
                 batch_size: int = 64) -> ray.data.Dataset:
    return media.map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h))


def sample_frames(media: ray.data.Dataset, n_frames: int = 4,
                  concurrency=(1, 4), batch_size: int = 32
                  ) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(n_frames=n_frames))
