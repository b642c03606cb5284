"""Image codecs, datagen integrity, tile assignment + slicing invariants:
conservation through shuffles, caption equality, PSNR ≥ 40 dB for the lossy
path, exact pixel reassembly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_cuda_spark.datagen import images_table, with_geotag
from geospatial_cuda_spark.functions import images as I
from geospatial_cuda_spark.functions.geo import tile_xy_np
from geospatial_cuda_spark.operators import tiles as T
from geospatial_cuda_spark.util import geotag_from_phash, splitmix64


def test_rle_roundtrip_and_psnr():
    for i in (0, 4, 17):
        px = I.gen_pixels(i, 24, 16)
        assert np.array_equal(I.rle_decode(I.rle_encode(px)), px & 0xFE)
        assert I.psnr(px, I.rle_decode(I.rle_encode(px))) >= 40.0


def test_unknown_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        I.decode_image(b"", 1, 1, "jpeg")


def test_batch_codecs_match_per_image_paths():
    """Group-vectorized gen/encode/decode/resize (VERDICT r3 item 6) must be
    byte-identical to the per-image functions — including 255+ runs, run
    breaks at image boundaries, and trailing zero bytes in raw payloads."""
    keys = np.array([0, 4, 17, 255, 1023], dtype=np.uint64)
    for w, h in ((16, 24), (3, 5)):
        batch = I.gen_pixels_batch(keys, w, h)
        for j, k in enumerate(keys):
            assert np.array_equal(batch[j], I.gen_pixels(int(k), w, h))
        for fmt in ("raw", "rle"):
            enc = I.encode_images_batch(batch, fmt)
            for j, k in enumerate(keys):
                assert enc[j] == I.encode_image(batch[j], fmt), (fmt, int(k))
            dec = I.decode_images_batch(enc, w, h, fmt)
            for j in range(len(keys)):
                assert np.array_equal(dec[j], I.decode_image(enc[j], w, h, fmt))
        rs = I.resize_nearest_batch(I.decode_images_batch(
            I.encode_images_batch(batch, "raw"), w, h, "raw"), 8, 8)
        for j in range(len(keys)):
            assert np.array_equal(
                rs[j], I.resize_nearest(batch[j].reshape(h, w, 3), 8, 8)
            )
    # constant image: runs far beyond 255 split identically; trailing zero
    # bytes survive the object-array handoff (S-dtype would strip them)
    const = np.zeros((3, 16 * 24 * 3), dtype=np.uint8)
    for j, e in enumerate(I.encode_images_batch(const, "rle")):
        assert e == I.rle_encode(const[j])
    assert all(
        r.endswith(b"\x00") and len(r) == 16 * 24 * 3
        for r in I.encode_images_batch(const, "raw")
    )


@pytest.fixture(scope="module")
def images(spark):
    return with_geotag(images_table(spark, 300, 8)).persist()


def test_images_deterministic_and_geotag_consistent(images):
    pdf = images.orderBy("image_id").limit(50).toPandas()
    # Spark-side geotag (built-in unsigned-mod arithmetic) == numpy derivation
    x_np, y_np = geotag_from_phash(pdf["phash"].to_numpy())
    assert np.array_equal(pdf["x"].to_numpy(), x_np)
    assert np.array_equal(pdf["y"].to_numpy(), y_np)
    # phash is splitmix64(i)
    assert pdf["phash"][3] == np.int64(splitmix64(np.array([3], np.uint64))[0])
    # decoded pixels match the generator (raw exact, rle quantized)
    r = pdf.iloc[0]
    px = I.gen_pixels(0, int(r.w), int(r.h))
    dec = I.decode_image(r["bytes"], int(r.w), int(r.h), r.fmt).ravel()
    assert I.psnr(px, dec) >= 40.0


def test_tile_assignment_matches_numpy(images):
    for zoom in (2, 4):
        pdf = T.assign_tiles(images, zoom).select("x", "y", "tile_x", "tile_y").toPandas()
        tx, ty = tile_xy_np(pdf["x"].to_numpy(), pdf["y"].to_numpy(), zoom)
        assert np.array_equal(pdf["tile_x"].to_numpy(), tx)
        assert np.array_equal(pdf["tile_y"].to_numpy(), ty)


@pytest.mark.parametrize("zoom", [2, 4, 14])
def test_tile_slices_reassemble(images, zoom):
    """At zoom 14 (tile 61 units wide < image size) images straddle tiles —
    slices must reassemble to the decoded original exactly; captions ride
    along unharmed; PSNR gate holds vs pre-encode pixels."""
    slices = T.slice_tiles(images, zoom).persist()
    pdf = slices.toPandas()
    src = images.select("image_id", "bytes", "w", "h", "fmt", "caption").toPandas()
    assert set(pdf.image_id) == set(src.image_id)  # conservation
    for _, r in src.iterrows():
        mine = pdf[pdf.image_id == r.image_id]
        assert (mine.caption == r.caption).all()
        dec = I.decode_image(r["bytes"], int(r.w), int(r.h), r.fmt)
        re = T.reassemble(mine, int(r.w), int(r.h), r.fmt)
        assert np.array_equal(re, dec), r.image_id
    # per-image slice count is 1..4 at coarse zooms, bounded by straddle count
    per = pdf.groupby("image_id").size()
    if zoom <= 4:
        assert per.max() <= 4
    slices.unpersist()


def test_lossy_psnr_gate_end_to_end(images):
    pdf = T.slice_tiles(images.where(F.col("fmt") == "rle"), 4).toPandas()
    src = images.where(F.col("fmt") == "rle").toPandas()
    for _, r in src.head(10).iterrows():
        raw = I.gen_pixels(int(r.image_id[3:]), int(r.w), int(r.h)).reshape(int(r.h), int(r.w), 3)
        re = T.reassemble(pdf[pdf.image_id == r.image_id], int(r.w), int(r.h), "rle")
        assert I.psnr(raw, re) >= 40.0


def test_tile_pyramid_invariants(spark, images):
    """Pyramid rollup: each level equals DIRECT assignment at that zoom (the
    shift-parent identity holds for the flipped y), parents sum their 4
    children exactly, and the apex carries the full row count."""
    base = (
        T.assign_tiles(images, 6)
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    pyr = T.tile_pyramid(base, zoom=6, to_zoom=0).persist()
    total = images.count()
    # apex == total rows
    apex = pyr.where(F.col("zoom") == 0).collect()
    assert len(apex) == 1 and apex[0]["n_points"] == total
    # every level == direct assignment at that zoom
    for z in (0, 3, 5):
        direct = sorted(
            tuple(r)
            for r in T.assign_tiles(images, z)
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .collect()
        )
        got = sorted(
            tuple(r)
            for r in pyr.where(F.col("zoom") == z)
            .select("tile_x", "tile_y", "n_points")
            .collect()
        )
        assert got == direct, z
    # parent = sum of children, level by level
    kids = (
        pyr.where(F.col("zoom") > 0)
        .groupBy(
            (F.col("zoom") - 1).alias("zoom"),
            F.shiftright("tile_x", 1).alias("tile_x"),
            F.shiftright("tile_y", 1).alias("tile_y"),
        )
        .agg(F.sum("n_points").alias("n_points"))
    )
    mismatch = kids.join(
        pyr.withColumnRenamed("n_points", "np"), on=["zoom", "tile_x", "tile_y"]
    ).where(F.col("n_points") != F.col("np"))
    assert mismatch.count() == 0
    pyr.unpersist()


def test_phash64_and_hamming_pairs_sign_bit(spark):
    """phash64_batch matches a per-image naive re-derivation (including the
    integer tie rule 64*s > tot), and hamming_pairs bands correctly when bit
    63 is set (hash negative as a signed long) — the unsigned-shift edge."""
    import numpy as np

    from geospatial_cuda_spark.functions.images import (
        gen_pixels_batch,
        phash64_batch,
        resize_nearest_batch,
    )
    from geospatial_cuda_spark.operators.dedup import hamming_pairs

    keys = np.arange(10, dtype=np.uint64)
    pix = gen_pixels_batch(keys, 16, 16).reshape(10, 16, 16, 3)
    small = resize_nearest_batch(pix, 8, 8)
    got = phash64_batch(small)
    for i in range(10):
        s = small[i].reshape(64, 3).sum(axis=1).astype(np.int64)
        bits = (64 * s) > s.sum()
        want = sum(int(b) << p for p, b in enumerate(bits))
        assert int(got[i]) == np.int64(np.uint64(want) if want < 2**63 else want - 2**64)
    # sign-bit edge: two hashes with bit 63 set, hamming 1 apart, plus an
    # unrelated hash — only the close pair must surface through banding
    h_hi = np.uint64(1) << np.uint64(63)
    a = int(np.uint64(h_hi | np.uint64(0x0F)).astype(np.int64))
    b = int(np.uint64(h_hi | np.uint64(0x0E)).astype(np.int64))
    c = int(np.uint64(0x123456789ABCDEF).astype(np.int64))
    df = spark.createDataFrame([("a", a), ("b", b), ("c", c)], "doc_id string, h long")
    pairs = {
        (r["a"], r["b"], r["hamming"])
        for r in hamming_pairs(df, "h", "doc_id", bits=64, bands=8, max_hamming=4).collect()
    }
    assert pairs == {("a", "b", 1)}
    assert a < 0 and b < 0  # the edge actually exercised
