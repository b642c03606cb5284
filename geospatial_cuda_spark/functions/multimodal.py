"""Audio/video payload kernels — the multimodal twins of images.py.

Model (per the training-data-pipeline brief): media ride as opaque ``binary``
columns with typed metadata; decode / frame-sample / feature-extract run as
Arrow-batched kernels over ``mapInPandas``. The container ships no media
libraries, so the two self-contained formats are:

- video ``rawv``: concatenated raw RGB frames, ``n_frames · w · h · 3`` bytes
  (frame 0 first); real codecs (h264/vp9/...) are stubbed behind
  ``NotImplementedError`` — the Spark-side plumbing (schema, batching, UDF
  signatures, explode shape) is format-agnostic and fully real.
- audio ``pcm16``: mono signed 16-bit little-endian samples; real codecs
  (mp3/opus/...) stubbed the same way.

Everything is numpy over whole Arrow batches; the only per-row Python is the
unavoidable loop over variable-length payloads, operating on ndarray views.
"""

from __future__ import annotations

import numpy as np

from ..util import hash2


# ------------------------------ video ------------------------------------


def gen_video(i: int, w: int, h: int, n_frames: int) -> bytes:
    """Deterministic raw video for row i: frame f pixel block = hash(i, f·2^20+idx//16)."""
    n = n_frames * w * h * 3
    idx = np.arange(n, dtype=np.uint64)
    frame = idx // np.uint64(w * h * 3)
    within = (idx % np.uint64(w * h * 3)) // np.uint64(16)
    key = frame * np.uint64(1 << 20) + within
    return (hash2(np.full(n, i, dtype=np.uint64), key) & np.uint64(0xFF)).astype(np.uint8).tobytes()


def decode_video(buf: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """-> (n_frames, h, w, 3) uint8."""
    if fmt != "rawv":
        raise NotImplementedError(
            f"video codec {fmt!r} requires a media library not present in this "
            "container; plumbing (schema/batching/sampling) is format-agnostic"
        )
    return np.frombuffer(buf, dtype=np.uint8).reshape(n_frames, h, w, 3)


def sample_frame_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic uniform frame sampling: k indices, endpoints included
    when k > 1 (the standard training-data frame-sampling rule)."""
    k = min(k, n_frames)
    if k <= 1:
        return np.array([n_frames // 2], dtype=np.int64)
    return np.round(np.linspace(0, n_frames - 1, k)).astype(np.int64)


def frame_sample(buf: bytes, w: int, h: int, n_frames: int, fmt: str, k: int):
    """[(frame_index, frame_bytes)] for k uniformly sampled frames."""
    vid = decode_video(buf, w, h, n_frames, fmt)
    return [(int(f), vid[f].tobytes()) for f in sample_frame_indices(n_frames, k)]


# ------------------------------ audio ------------------------------------


def gen_audio(i: int, n_samples: int) -> bytes:
    """Deterministic pcm16 for row i (hash-noise, full int16 range)."""
    idx = np.arange(n_samples, dtype=np.uint64)
    vals = hash2(np.full(n_samples, i, dtype=np.uint64), idx) & np.uint64(0xFFFF)
    return (vals.astype(np.int64) - 32768).astype("<i2").tobytes()


def decode_audio(buf: bytes, fmt: str) -> np.ndarray:
    """-> float64 samples in [-1, 1)."""
    if fmt != "pcm16":
        raise NotImplementedError(
            f"audio codec {fmt!r} requires a media library not present in this "
            "container; plumbing (schema/batching/windowing) is format-agnostic"
        )
    return np.frombuffer(buf, dtype="<i2").astype(np.float64) / 32768.0


def audio_rms_windows(samples: np.ndarray, window: int) -> np.ndarray:
    """Per-window root-mean-square energy (the feature-extract step); the
    trailing partial window is dropped (fixed feature width)."""
    n = (samples.shape[0] // window) * window
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    sq = (samples[:n] ** 2).reshape(-1, window)
    return np.sqrt(sq.mean(axis=1))


def audio_energy_windows(samples: np.ndarray, window: int) -> np.ndarray:
    """Per-window INTEGER energy Σ sᵢ² over the raw int16 samples (recovered
    exactly from the decoded floats — s/32768 is a power-of-two scale, so
    rint(s·32768) is lossless). The integer twin of ``audio_rms_windows``
    (rms = sqrt(energy/window)/32768): emitted by the contract query so the
    DuckDB oracle re-derives the features as pure splitmix64 integer
    arithmetic with no float rounding at the engine boundary. Max value
    window·32768² = 2³⁸ per window — int64-safe."""
    ints = np.rint(samples * 32768.0).astype(np.int64)
    n = (ints.shape[0] // window) * window
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    return (ints[:n] ** 2).reshape(-1, window).sum(axis=1)
