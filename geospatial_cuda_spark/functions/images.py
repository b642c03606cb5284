"""Image payload kernels: deterministic synth pixels, raw/RLE codecs, PSNR.

The container has no image libraries, so the two shipped formats are
self-contained: ``raw`` (interleaved RGB, lossless) and ``rle`` (channel
values quantized to even — the "lossy" path, PSNR ≈ 54 dB ≥ the 40 dB gate —
then run-length encoded). Real JPEG/PNG decode is stubbed behind
``NotImplementedError`` with the Spark-side plumbing (schema, batching,
mapInPandas signatures) fully real — swap the codec, keep the plan.

Everything here is numpy over whole Arrow batches; no per-row Python in any
hot path beyond the unavoidable per-image variable-length encode loop, which
operates on numpy run arrays, not pixels.
"""

from __future__ import annotations

import numpy as np

from ..util import hash2

BLOCK = 16  # pixels per deterministic color block (keeps RLE compressible)


def gen_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel buffer for image i: value = hash(i, idx//BLOCK)."""
    n = w * h * 3
    idx = np.arange(n, dtype=np.uint64) // np.uint64(BLOCK)
    return (hash2(np.full(n, i, dtype=np.uint64), idx) & np.uint64(0xFF)).astype(np.uint8)


def rle_encode(pixels: np.ndarray) -> bytes:
    """Quantize to even values (lossy step), then (run_len, value) byte pairs."""
    q = (pixels & np.uint8(0xFE)).astype(np.uint8)
    if q.size == 0:
        return b""
    change = np.flatnonzero(np.diff(q)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [q.size]))
    lens = ends - starts
    vals = q[starts]
    # split runs longer than 255
    reps = (lens + 254) // 255
    out_vals = np.repeat(vals, reps)
    out_lens = np.empty(out_vals.shape[0], dtype=np.int64)
    pos = 0
    for ln, rep in zip(lens, reps):
        full, last = divmod(int(ln), 255)
        seg = [255] * full + ([last] if last else [])
        out_lens[pos : pos + len(seg)] = seg
        pos += len(seg)
    pairs = np.empty(out_vals.shape[0] * 2, dtype=np.uint8)
    pairs[0::2] = out_lens.astype(np.uint8)
    pairs[1::2] = out_vals
    return pairs.tobytes()


def rle_decode(buf: bytes) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    return np.repeat(arr[1::2], arr[0::2].astype(np.int64))


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.astype(np.uint8).tobytes()
    if fmt == "rle":
        return rle_encode(pixels)
    raise NotImplementedError(
        f"codec {fmt!r} requires an image library not present in this container; "
        "plumbing (schema/batching) is format-agnostic"
    )


def decode_image(buf: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """-> (h, w, 3) uint8."""
    if fmt == "raw":
        px = np.frombuffer(buf, dtype=np.uint8)
    elif fmt == "rle":
        px = rle_decode(buf)
    else:
        raise NotImplementedError(f"codec {fmt!r} not available in this container")
    return px.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (the real feature-extract path)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]
