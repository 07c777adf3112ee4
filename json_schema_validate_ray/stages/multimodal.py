"""Multimodal-column stages: opaque ``binary`` payloads with typed metadata.

The container has no image/audio codecs, so the DECODE kernels are stubbed
behind ``DecodeUnavailable`` / a deterministic fake (clearly marked).  The
Ray-side plumbing — schema, batch sizing, actor-pool signature, output
layout — is real and tested: swapping the stub body for PIL/torchaudio is a
one-function change.

Batch-size guidance: binary payloads make rows wide; callers should pass a
small ``batch_size`` (e.g. 64-512) and let block size, not row count, bound
memory (prompt: "large binary payloads need small batches")."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),          # opaque encoded bytes
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("width", pa.int32()),             # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decoder hook when codecs are absent."""


def _decode_image_real(payload: bytes) -> np.ndarray:
    # STUB: a real deployment imports PIL here (unavailable in this container)
    raise DecodeUnavailable("image codecs not available in this environment")


def _fake_decode(payload: bytes, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic fake decode: bytes -> pseudo-pixels seeded from a
    content digest.  Keeps every downstream shape/contract real."""
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: decode (stub) -> fixed-size feature vector + payload
    stats.  ``__init__`` is where a real model would load ONCE per actor."""

    def __init__(self, payload_column: str = "payload", use_fake_decode: bool = True,
                 feature_dim: int = 16):
        self.payload_column = payload_column
        self.use_fake_decode = use_fake_decode
        self.feature_dim = feature_dim
        # model-load placeholder: a real stage loads weights here, once
        self._decode = _fake_decode if use_fake_decode else _decode_image_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        n_bytes, feats = [], []
        for p in payloads:
            p = p or b""
            n_bytes.append(len(p))
            px = self._decode(p)
            flat = px.reshape(-1).astype(np.float32)
            # fixed-dim pooled feature: mean over equal chunks
            chunks = np.array_split(flat, self.feature_dim)
            feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
        return (batch
                .append_column("payload_bytes", pa.array(n_bytes, type=pa.int64()))
                .append_column("features",
                               pa.array(feats, type=pa.list_(pa.float32()))))


class MediaResizer:
    """Actor-pool stage: decode (stub) -> nearest-neighbor resize to
    ``(target_h, target_w)`` -> raw-pixel payload + updated metadata.  The
    resize math (vectorized numpy index sampling) is real; only the decode
    behind it is the environment-forced stub."""

    def __init__(self, payload_column: str = "payload",
                 target_h: int = 16, target_w: int = 16,
                 use_fake_decode: bool = True):
        self.payload_column = payload_column
        self.target_h = target_h
        self.target_w = target_w
        self._decode = _fake_decode if use_fake_decode else _decode_image_real
        # precomputed once per actor for the stub's fixed 8x8 decode shape;
        # recomputed per image when shapes vary
        self._cache: dict = {}

    def _resize(self, px: np.ndarray) -> np.ndarray:
        h, w = px.shape[:2]
        key = (h, w)
        idx = self._cache.get(key)
        if idx is None:
            rows = (np.arange(self.target_h) * h // self.target_h)
            cols = (np.arange(self.target_w) * w // self.target_w)
            idx = (rows[:, None], cols[None, :])
            self._cache[key] = idx
        return px[idx[0], idx[1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        out = [self._resize(self._decode(p or b"")).tobytes() for p in payloads]
        n = len(out)
        return (batch
                .drop_columns([c for c in ("width", "height")
                               if c in batch.column_names])
                .append_column("payload_resized", pa.array(out, type=pa.binary()))
                .append_column("width", pa.array([self.target_w] * n, type=pa.int32()))
                .append_column("height", pa.array([self.target_h] * n, type=pa.int32())))


class FrameSampler:
    """Actor-pool stage for "video": samples ``n_frames`` deterministic fake
    frames per payload and emits one row per (media_id, frame_idx) —
    the flat_map-shaped explode layout a real frame sampler uses."""

    def __init__(self, payload_column: str = "payload", n_frames: int = 4):
        self.payload_column = payload_column
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch[self.payload_column].to_pylist()
        out_ids, out_idx, out_frames = [], [], []
        for mid, p in zip(ids, payloads):
            for fi in range(self.n_frames):
                frame = _fake_decode((p or b"") + fi.to_bytes(4, "little"))
                out_ids.append(mid)
                out_idx.append(fi)
                out_frames.append(frame.tobytes())
        return pa.table({
            "media_id": pa.array(out_ids, type=pa.string()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frames, type=pa.binary()),
        })


def synth_media_batch(batch: pa.Table, text_column: str = "text",
                      id_column: str = "doc_id") -> pa.Table:
    """Deterministic media table derived from a text table: payload = the
    UTF-8 bytes (opaque binary stand-in), metadata from content length."""
    ids = [str(x) for x in batch[id_column].to_pylist()]
    texts = batch[text_column].to_pylist()
    payloads = [(t or "").encode("utf-8") for t in texts]
    n = len(ids)
    return pa.table({
        "media_id": pa.array(ids, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(["image"] * n, type=pa.string()),
        "width": pa.array([(len(p) % 64) + 1 for p in payloads], type=pa.int32()),
        "height": pa.array([(len(p) % 48) + 1 for p in payloads], type=pa.int32()),
        "duration_ms": pa.array([None] * n, type=pa.int32()),
    })
