"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages with small batches (large
payloads: batch_size × concurrency must fit the worker heap).

``real=True`` stages run GENUINE payload->pixels/samples decoding for the
formats a pure-stdlib/NumPy parser can handle — PPM/PGM (P6/P5), BMP
(24-bit uncompressed BI_RGB) and WAV (PCM 8/16-bit) — so the media path is
real end-to-end for those. Compressed codecs (JPEG/PNG/MP3/H.264) are NOT
in this container; for payloads sniffing to none of the supported magics,
``real=True`` still raises NotImplementedError at the exact point where
``PIL.Image.open`` / ffmpeg would run. The default deterministic fake
derives pseudo-dimensions and a feature vector from the payload bytes so
plumbing tests need no synthetic pixel data.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data


# --------------------------------------------------------------- codecs
# Pure-stdlib/NumPy encoders+decoders for the uncompressed formats. Each
# decoder returns (height, width, channels, pixel ndarray) for images or
# (n_channels, int16 sample ndarray [n, ch]) for audio.

def sniff_codec(payload: bytes) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | 'wav' | None by magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse P5/P6 header -> (w, h, maxval, pixel_data_offset). Handles
    '#' comments and arbitrary whitespace per the netpbm spec."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    return tokens[0], tokens[1], tokens[2], pos + 1  # single ws after maxval


def decode_pnm(payload: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8; P5 -> (h, w, 1) uint8."""
    kind = payload[:2]
    if kind not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    ch = 3 if kind == b"P6" else 1
    w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * ch,
                         offset=off).reshape(h, w, ch)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BI_RGB BMP
    (bottom-up rows, 4-byte padded, BGR byte order)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    raw = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw),
                      2835, 2835, 0, 0)
    return header + dib + raw


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BI_RGB BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, off) = struct.unpack_from("<2sIHHI", payload, 0)
    (size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 (n,) or (n, ch) -> PCM-16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM 8/16-bit WAV -> (sample_rate, int16 (n, ch)) via a RIFF
    chunk walk (chunks padded to even sizes per spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    rate = ch = bits = None
    data = None
    while pos + 8 <= n:
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos)
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"only PCM WAV supported (fmt={audio_fmt})")
        elif cid == b"data":
            data = payload[pos:pos + sz]
        pos += sz + (sz & 1)
    if data is None or ch is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif bits == 8:
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
               - 128) * 256
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported")
    return rate, arr.reshape(-1, ch)


def _resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    return img[yi][:, xi]


def _grid_features(gray: np.ndarray, dim: int) -> np.ndarray:
    """Mean of `dim` contiguous chunks of the flattened grayscale/sample
    array, scaled to [0, 1] — a real (if simple) pooled feature vector."""
    flat = gray.astype(np.float64).ravel()
    if not flat.size:
        return np.zeros(dim, dtype=np.float32)
    bounds = (np.arange(dim + 1) * flat.size) // dim
    sums = np.add.reduceat(flat, bounds[:-1].clip(max=flat.size - 1))
    cnt = np.maximum(np.diff(bounds), 1)
    return (sums / cnt / 255.0).astype(np.float32)


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


def docs_as_real_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Synthesize REAL decodable payloads deterministically from doc_id —
    codec round-robins doc_id % 3 over P6 PPM / 24-bit BMP / PCM-16 WAV
    with dims derived from closed-form doc_id arithmetic, so a DuckDB
    oracle states the expected (width, height) while the engine must
    genuinely parse headers and pixel/sample data to recover them."""

    def conv(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        payloads, kinds = [], []
        for mid in ids.tolist():
            w = 8 + mid % 17
            h = 8 + mid % 13
            if mid % 3 == 2:
                n = 256 + mid % 199
                tone = (np.sin(np.arange(n) * (0.01 + (mid % 7) * 0.05))
                        * 12000).astype(np.int16)
                payloads.append(encode_wav(tone))
                kinds.append("audio")
                continue
            px = ((np.arange(h * w * 3, dtype=np.int64) * 31 + mid * 7)
                  % 256).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_ppm(px) if mid % 3 == 0
                            else encode_bmp(px))
            kinds.append("image")
        return pa.table({
            "media_id": pa.array(ids.astype(np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(kinds, type=pa.string()),
            "meta": pa.array(["{}"] * len(payloads), type=pa.string()),
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

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        codec = sniff_codec(payload)
        if codec in ("ppm", "pgm"):
            img = decode_pnm(payload)
            gray = img.mean(axis=2) if img.shape[2] == 3 else img[:, :, 0]
            return img.shape[1], img.shape[0], \
                _grid_features(gray, self.feature_dim)
        if codec == "bmp":
            img = decode_bmp(payload)
            return img.shape[1], img.shape[0], \
                _grid_features(img.mean(axis=2), self.feature_dim)
        if codec == "wav":
            _rate, samples = decode_wav(payload)
            # width = frame count, height = channel count; features are
            # pooled |amplitude| rescaled into the same [0, 1] range
            feat = _grid_features(
                np.abs(samples.astype(np.float64)) * (255.0 / 32768.0),
                self.feature_dim)
            return samples.shape[0], samples.shape[1], feat
        raise NotImplementedError(
            "real media decode: compressed codec — plug PIL/ffmpeg here "
            "(not in container)")

    def __call__(self, t: pa.Table) -> pa.Table:
        decode = self._decode_real if self.real else self._decode_fake
        ws, hs, feats = [], [], []
        for payload in t.column("payload").to_pylist():
            w, h, f = decode(payload)
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
                    concurrency=(1, 4), batch_size: int = 64,
                    real: bool = False) -> ray.data.Dataset:
    """The pipeline: small batches (payloads are large), actor pool sized
    separately from the reader so neither starves."""
    return media.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(feature_dim=feature_dim, real=real))


class ResizeStage:
    """Actor-pool resize kernel: payload -> payload at (target_w, target_h).

    The fake path derives the "resized" payload deterministically from the
    input bytes + target dims; ``real=True`` decodes PNM/BMP, resizes
    nearest-neighbor in NumPy and re-encodes as P6 — compressed codecs
    still raise at the exact point ``PIL.Image.resize`` would run.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 real: bool = False):
        self.tw = target_w
        self.th = target_h
        self.real = real

    def _resize_real(self, payload: bytes) -> bytes:
        codec = sniff_codec(payload)
        if codec in ("ppm", "pgm"):
            img = decode_pnm(payload)
        elif codec == "bmp":
            img = decode_bmp(payload)
        else:
            raise NotImplementedError(
                "real resize: compressed codec — plug PIL/cv2 here "
                "(not in container)")
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        return encode_ppm(_resize_nearest(img, self.tw, self.th))

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for payload in t.column("payload").to_pylist():
            if self.real:
                out.append(self._resize_real(payload))
                continue
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
    frames; ``real=True`` handles two genuine uncompressed containers —
    a WAV is split into n_frames contiguous PCM windows (each re-wrapped
    as a valid WAV), and a concatenated-P6 stream ("motion PPM", the
    uncompressed video analog) has n_frames images sampled evenly —
    compressed video still raises where ffmpeg/pyav seek+decode would
    run."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        self.real = real

    def _frames_real(self, payload: bytes) -> list[bytes]:
        codec = sniff_codec(payload)
        if codec == "wav":
            rate, samples = decode_wav(payload)
            n, k = samples.shape[0], self.n_frames
            bounds = (np.arange(k + 1) * n) // k
            return [encode_wav(samples[bounds[i]:bounds[i + 1]], rate)
                    for i in range(k)]
        if codec == "ppm":
            # walk the concatenated-P6 stream
            imgs, pos = [], 0
            while pos < len(payload) and payload[pos:pos + 2] == b"P6":
                chunk = payload[pos:]
                w, h, _mx, off = _pnm_header(chunk)
                end = off + h * w * 3
                imgs.append(chunk[:end])
                pos += end
            if not imgs:
                raise ValueError("empty P6 stream")
            k = min(self.n_frames, len(imgs))
            pick = (np.arange(k) * len(imgs)) // k
            return [imgs[i] for i in pick]
        raise NotImplementedError(
            "real frame sampling: compressed video — plug ffmpeg/pyav "
            "here (not in container)")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            if self.real:
                for i, fr in enumerate(self._frames_real(payload)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
                continue
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
                 batch_size: int = 64, real: bool = False
                 ) -> ray.data.Dataset:
    return media.map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h,
                                   real=real))


def sample_frames(media: ray.data.Dataset, n_frames: int = 4,
                  concurrency=(1, 4), batch_size: int = 32,
                  real: bool = False) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(n_frames=n_frames, real=real))
