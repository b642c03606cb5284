"""Deterministic hashing / RNG primitives shared by datagen, kernels, oracle.

Everything is seeded and pure — no wall clock, no unseeded RNG — so fixtures
and benchmarks are reproducible bit-for-bit across runs and parallelism
levels.
"""

from __future__ import annotations

import numpy as np

_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. uint64 -> uint64, wrapping arithmetic."""
    z = np.asarray(z).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SM64_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM64_M1
        z = (z ^ (z >> np.uint64(27))) * _SM64_M2
        z = z ^ (z >> np.uint64(31))
    return z


def splitmix64_scalar(i: int) -> int:
    return int(splitmix64(np.array([i], dtype=np.uint64))[0])


def hash2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of two uint64 streams."""
    a = np.asarray(a).astype(np.uint64)
    b = np.asarray(b).astype(np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(a ^ (splitmix64(b) + _SM64_GAMMA))


def geotag_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive the deterministic geotag from an image perceptual hash.

    ``x = (phash >>u 20) % 1e6``, ``y = phash(unsigned) % 1e6`` — reproduces the
    reference's uniform integer point cloud (generate_points.py:7-8) as a pure
    function of the row, so the point semantics of every reference operator
    apply to image rows with no stored coordinates.
    """
    u = np.asarray(phash).astype(np.int64).view(np.uint64)
    x = ((u >> np.uint64(20)) % np.uint64(1_000_000)).astype(np.float32)
    y = (u % np.uint64(1_000_000)).astype(np.float32)
    return x, y


GEOTAG_X_SQL = "CAST((CAST(phash AS {ubig}) >> 20) % 1000000 AS DOUBLE)"
GEOTAG_Y_SQL = "CAST(CAST(phash AS {ubig}) % 1000000 AS DOUBLE)"
