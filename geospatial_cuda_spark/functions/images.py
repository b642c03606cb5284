"""Image payload kernels: deterministic synth pixels, raw/RLE codecs, PSNR.

The container has no image libraries, so the two shipped formats are
self-contained: ``raw`` (interleaved RGB, lossless) and ``rle`` (channel
values quantized to even — the "lossy" path, PSNR ≈ 54 dB ≥ the 40 dB gate —
then run-length encoded). Real JPEG/PNG decode is stubbed behind
``NotImplementedError`` with the Spark-side plumbing (schema, batching,
mapInPandas signatures) fully real — swap the codec, keep the plan.

Everything here is numpy over whole Arrow batches; no per-row Python in any
hot path. The ``*_batch`` variants vectorize gen/encode/decode/resize across
a SAME-SHAPE group of images in one numpy pass (callers group each Arrow
batch by (w, h, fmt)); the residual per-image step is the bytes handoff.
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


def gen_pixels_batch(keys: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n, w·h·3) uint8 for a SAME-SHAPE group of images, vectorized via
    BROADCASTING (keys (m,1) × block-index (1,n_px) — no materialized
    repeat/tile uint64 inputs) and chunked so the uint64 intermediates stay
    ≲ 128 MB per worker regardless of Arrow batch size (a 10k-row batch of
    32×32 images would otherwise stage ~GB of transients)."""
    n_px = w * h * 3
    keys = np.asarray(keys, dtype=np.uint64)
    idx = (np.arange(n_px, dtype=np.uint64) // np.uint64(BLOCK))[None, :]
    out = np.empty((keys.shape[0], n_px), dtype=np.uint8)
    step = max(1, 8_000_000 // max(n_px, 1))  # ≤ 8M u64 elems per chunk temp
    for s0 in range(0, keys.shape[0], step):
        kk = keys[s0 : s0 + step, None]
        out[s0 : s0 + step] = hash2(kk, idx) & np.uint64(0xFF)
    return out


def rle_encode_batch(pixmat: np.ndarray) -> list[bytes]:
    """RLE-encode a same-shape group (n, n_px) in one vectorized pass: runs
    are found over the flattened matrix with forced breaks at image
    boundaries, split at 255, then the interleaved (len, val) byte stream is
    sliced per image. Byte-identical to ``rle_encode`` row by row."""
    n, npx = pixmat.shape
    if npx == 0:
        return [b""] * n
    q = (pixmat & np.uint8(0xFE)).astype(np.uint8).ravel()
    bounds = np.arange(1, n, dtype=np.int64) * npx  # runs never cross images
    change = np.flatnonzero(np.diff(q)) + 1
    starts = np.unique(np.concatenate(([0], change, bounds)))
    ends = np.concatenate((starts[1:], [q.size]))
    lens = ends - starts
    vals = q[starts]
    reps = (lens + 254) // 255
    out_vals = np.repeat(vals, reps)
    out_lens = np.full(out_vals.shape[0], 255, dtype=np.int64)
    last_idx = np.cumsum(reps) - 1
    out_lens[last_idx] = lens - 255 * (reps - 1)  # == 255 when len % 255 == 0
    pairs = np.empty(out_vals.shape[0] * 2, dtype=np.uint8)
    pairs[0::2] = out_lens.astype(np.uint8)
    pairs[1::2] = out_vals
    # pairs per image → byte offsets per image
    img_of_run = starts // npx
    pairs_per_img = np.bincount(img_of_run, weights=reps, minlength=n).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(pairs_per_img * 2)))
    buf = pairs.tobytes()
    return [buf[offs[i] : offs[i + 1]] for i in range(n)]


def encode_images_batch(pixmat: np.ndarray, fmt: str) -> list[bytes]:
    """Encode a same-shape group (n, n_px) — numpy work once per group; the
    residual per-image step is the bytes handoff only."""
    if fmt == "raw":
        npx = pixmat.shape[1]
        buf = pixmat.astype(np.uint8).tobytes()
        return [buf[i * npx : (i + 1) * npx] for i in range(pixmat.shape[0])]
    if fmt == "rle":
        return rle_encode_batch(pixmat)
    raise NotImplementedError(
        f"codec {fmt!r} requires an image library not present in this container; "
        "plumbing (schema/batching) is format-agnostic"
    )


def decode_images_batch(bufs, w: int, h: int, fmt: str) -> np.ndarray:
    """-> (n, h, w, 3) uint8 for a same-shape group, one vectorized pass
    (each image decodes to exactly w·h·3 pixels, so the concatenated decode
    reshapes cleanly)."""
    if fmt == "raw":
        px = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    elif fmt == "rle":
        arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        px = np.repeat(arr[1::2], arr[0::2].astype(np.int64))
    else:
        raise NotImplementedError(f"codec {fmt!r} not available in this container")
    return px.reshape(len(bufs), h, w, 3)


def resize_nearest_batch(imgs: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of a same-shape group (n, h, w, 3) in one
    fancy-index pass -> (n, out_h, out_w, 3)."""
    h, w = imgs.shape[1:3]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return imgs[:, ys][:, :, xs]


def phash64_batch(px8: np.ndarray) -> np.ndarray:
    """64-bit perceptual hash of a same-shape group ALREADY resized to 8×8:
    (n, 8, 8, 3) uint8 → (n,) int64. Bit i (row-major pixel order) is set iff
    pixel i's RGB sum exceeds the image's mean RGB sum, compared in integers
    (``64·s_i > Σs``) so the DuckDB oracle replays it exactly — the classic
    average-hash variant of pHash, codec- and resize-invariant enough that a
    lossy re-encode lands within a few bits of its source."""
    n = px8.shape[0]
    s = px8.reshape(n, 64, 3).sum(axis=2, dtype=np.int64)  # (n, 64)
    bits = (64 * s) > s.sum(axis=1, keepdims=True)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64).view(np.int64)


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
