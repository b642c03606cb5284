"""Audio/video multimodal kernels: deterministic payloads, decode roundtrip,
uniform frame sampling, windowed-RMS features, and stubbed real codecs
(NotImplementedError with real Spark plumbing) per the training-data brief."""

from __future__ import annotations

import numpy as np
import pytest

from geospatial_cuda_spark.functions import multimodal as M


def test_video_roundtrip_and_determinism():
    buf = M.gen_video(7, 8, 6, 5)
    assert len(buf) == 5 * 8 * 6 * 3
    vid = M.decode_video(buf, 8, 6, 5, "rawv")
    assert vid.shape == (5, 6, 8, 3)
    assert M.gen_video(7, 8, 6, 5) == buf          # deterministic
    assert M.gen_video(8, 8, 6, 5) != buf          # key-sensitive
    # frames differ from each other (the frame index feeds the hash)
    assert not np.array_equal(vid[0], vid[1])


def test_frame_sampling_uniform_endpoints():
    assert M.sample_frame_indices(9, 3).tolist() == [0, 4, 8]
    assert M.sample_frame_indices(5, 3).tolist() == [0, 2, 4]
    assert M.sample_frame_indices(2, 5).tolist() == [0, 1]   # k clamped
    assert M.sample_frame_indices(7, 1).tolist() == [3]      # middle frame
    buf = M.gen_video(3, 4, 4, 9)
    out = M.frame_sample(buf, 4, 4, 9, "rawv", 3)
    assert [f for f, _ in out] == [0, 4, 8]
    vid = M.decode_video(buf, 4, 4, 9, "rawv")
    for f, fb in out:
        assert fb == vid[f].tobytes()


def test_audio_roundtrip_rms():
    buf = M.gen_audio(11, 1000)
    assert len(buf) == 2000
    s = M.decode_audio(buf, "pcm16")
    assert s.shape == (1000,) and np.abs(s).max() < 1.0
    rms = M.audio_rms_windows(s, 256)
    assert rms.shape == (3,)  # trailing partial window dropped
    # window 0 against the naive definition
    assert rms[0] == pytest.approx(np.sqrt((s[:256] ** 2).mean()))
    assert M.audio_rms_windows(np.zeros(10), 256).shape == (0,)


def test_audio_energy_windows_integer_twin():
    """audio_energy_windows is the exact integer twin of audio_rms_windows:
    rms = sqrt(energy/window)/32768, and the energies equal the naive int16
    Σ s² per window (the quantity the DuckDB oracle re-derives)."""
    buf = M.gen_audio(11, 1000)
    s = M.decode_audio(buf, "pcm16")
    en = M.audio_energy_windows(s, 256)
    ints = np.frombuffer(buf, dtype="<i2").astype(np.int64)
    assert en.dtype == np.int64 and en.shape == (3,)
    for w in range(3):
        assert en[w] == (ints[w * 256:(w + 1) * 256] ** 2).sum()
    rms = M.audio_rms_windows(s, 256)
    np.testing.assert_allclose(
        rms, np.sqrt(en / 256.0) / 32768.0, rtol=0, atol=1e-15
    )
    assert M.audio_energy_windows(np.zeros(10), 256).shape == (0,)


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_video(b"", 1, 1, 1, "h264")
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"", "opus")


def test_hash2_sql_twin_bit_exact():
    """The DuckDB rendering of hash2/splitmix64 (the image_features oracle's
    core) must be bit-exact vs the numpy kernels for edge-case inputs."""
    import duckdb

    from geospatial_cuda_spark.util import hash2, hash2_sql_ctes

    pairs = [(0, 0), (1, 7), (17, 123), (500, 99_999), (2**63, 2**64 - 1),
             (12345678901, 987654321)]  # unique b values (the dict key below)
    values = ", ".join(f"(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT))" for a, b in pairs)
    sql = f"""
WITH pairs AS (SELECT a, b FROM (VALUES {values}) t(a, b)),
{hash2_sql_ctes('h', 'pairs', ['b'], 'a', 'b', 'v')}
SELECT b, v FROM ho5
"""
    got = {int(b): int(v) for b, v in duckdb.sql(sql).fetchall()}
    for a, b in pairs:
        want = int(hash2(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0])
        assert got[b] == want, (a, b)
