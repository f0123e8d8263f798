"""Codec round-trip + PSNR invariant tests (BASELINE.json:15 requires
decoded-pixel allclose for lossless and PSNR >= 40 dB for lossy)."""

import numpy as np
import pytest

from pbf2json_spark.functions import imagecodec as ic


@pytest.mark.parametrize("w,h", [(16, 16), (32, 16), (64, 64), (20, 12)])
def test_raw_roundtrip(w, h):
    px = ic.gen_pixels(7, w, h)
    assert np.array_equal(ic.decode_image(ic.encode_image(px, "raw")), px)


@pytest.mark.parametrize("w,h", [(16, 16), (32, 64), (20, 12)])
def test_rle_roundtrip(w, h):
    px = ic.gen_pixels(11, w, h)
    assert np.array_equal(ic.decode_image(ic.encode_image(px, "rle")), px)


def test_rle_long_runs():
    px = np.full((16, 16, 3), 200, dtype=np.uint8)  # run length > 255
    assert np.array_equal(ic.decode_image(ic.encode_image(px, "rle")), px)


@pytest.mark.parametrize("w,h", [(16, 16), (32, 32), (64, 32), (20, 12)])
def test_qdct_psnr_at_least_40db(w, h):
    px = ic.gen_pixels(13, w, h)
    dec = ic.decode_image(ic.encode_image(px, "qdct"))
    assert dec.shape == px.shape
    assert ic.psnr(px, dec) >= 40.0


def test_psnr_identity_inf():
    px = ic.gen_pixels(1, 16, 16)
    assert ic.psnr(px, px) == float("inf")


def test_phash_deterministic_and_robust():
    px = ic.gen_pixels(21, 64, 64)
    h1 = ic.phash64(px)
    assert isinstance(h1, int)
    assert h1 == ic.phash64(px.copy())
    # perceptual: qdct (lossy but PSNR>=40) must keep hamming distance small
    dec = ic.decode_image(ic.encode_image(px, "qdct"))
    h2 = ic.phash64(dec)
    hamming = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    assert hamming <= 4
    # and a very different image should be far
    other = ic.gen_pixels(9999, 64, 64)
    h3 = ic.phash64(other)
    assert bin((h1 ^ h3) & (2**64 - 1)).count("1") > 10


def test_geotag_pure_function_of_phash():
    ph = np.array([1, 2, 3, -9223372036854775808, 9223372036854775807])
    lat1, lon1 = ic.geotag_from_phash(ph)
    lat2, lon2 = ic.geotag_from_phash(ph.copy())
    assert np.array_equal(lat1, lat2) and np.array_equal(lon1, lon2)
    assert np.all(lat1 >= -90) and np.all(lat1 <= 90)
    assert np.all(lon1 >= -180) and np.all(lon1 < 180)


def test_geotag_zipfian_hotspots():
    ph = np.arange(20000, dtype=np.int64) * 2654435761
    lat, lon = ic.geotag_from_phash(ph)
    # ~80% of points within jitter distance of one of the 5 hotspots
    near = np.zeros(len(ph), dtype=bool)
    for hla, hlo in ic.HOTSPOTS:
        near |= (np.abs(lat - hla) <= ic.HOTSPOT_JITTER_DEG + 1e-9) & \
                (np.abs(lon - hlo) <= ic.HOTSPOT_JITTER_DEG + 1e-9)
    frac = near.mean()
    assert 0.75 < frac < 0.85


def test_phash_oracle_fixture_pins_operator(spark):
    """The committed q_phash_near_dup oracle fixture (tests/fixtures/
    phash_1000.parquet) must match (a) a fresh run of the Spark-free
    twin (synth.gen_phash_pdf) and (b) the Spark decode->phash path
    (multimodal.phash_images over images + planted perturbed copies) —
    fixture drift, twin drift, and operator drift all fail here."""
    import os

    import pandas as pd

    from pbf2json_spark.operators.multimodal import phash_images
    from pbf2json_spark.sources import synth

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "phash_1000.parquet")
    fix = pd.read_parquet(fix_path).sort_values("image_id") \
            .reset_index(drop=True)

    twin = synth.gen_phash_pdf(1000).sort_values("image_id") \
                .reset_index(drop=True)
    assert fix["image_id"].tolist() == twin["image_id"].tolist()
    assert fix["phash"].tolist() == twin["phash"].tolist(), "twin drifted"

    import __spark_entry__ as e
    imgs = synth.images_df(spark, 1000, partitions=8)
    base = imgs.unionByName(e._perturbed_images(imgs))
    got = phash_images(base).toPandas().sort_values("image_id") \
                            .reset_index(drop=True)
    assert got["image_id"].tolist() == fix["image_id"].tolist()
    assert got["phash"].tolist() == fix["phash"].tolist(), \
        "operator drifted"
    # non-vacuity: the qdct decode path must actually change hashes vs
    # the stored pre-encode phash column for some rows
    stored = imgs.select("image_id", "phash").toPandas() \
                 .sort_values("image_id").reset_index(drop=True)
    base_rows = got[~got["image_id"].str.startswith("dup")] \
        .reset_index(drop=True)
    assert (base_rows["phash"].to_numpy()
            != stored["phash"].to_numpy()).any()


def test_phash64_engine_independent_goldens():
    """phash64 pinned against literals derived OUTSIDE imagecodec
    (VERDICT r5 wrong #3: the oracle fixture shared the engine's numpy
    kernels, so the hash math itself had no independent anchor).

    The literals were produced by a from-scratch twin: explicit-loop
    grayscale mean, LCM-upsample + block-mean resize written as nested
    python loops, and a DIRECT O(n^4) orthonormal DCT-II via math.cos
    sums (no _dct_mat, no matmul), then bit i = f[i] > median(f).
    Anchor images are textured and asymmetric ON PURPOSE: degenerate
    inputs (constant, pure gradient, symmetric checkerboard) put 50+
    DCT coefficients within float-noise of the median, where the bit
    pattern is decided by summation order, not the algorithm — the
    two chosen patterns have min |f - median| of 0.37 and 1.66, ~12
    orders of magnitude above double-precision noise.  The black image
    is exactly analytic: every product is 0.0, median 0, no bit set."""
    import numpy as np

    black = np.zeros((16, 16, 3), dtype=np.uint8)
    assert ic.phash64(black) == 0

    y, x = np.mgrid[0:40, 0:48]
    pattern = np.stack([(3 * x + 5 * y) % 256, (7 * x + y) % 256,
                        (x * x // 16 + 2 * y) % 256], axis=2) \
        .astype(np.uint8)
    assert ic.phash64(pattern) == -7678959913871709103

    y, x = np.mgrid[0:24, 0:56]
    waves = np.stack([(x * y) % 251, (x * 13 + y * 29) % 256,
                      (x + 3 * y) % 199], axis=2).astype(np.uint8)
    assert ic.phash64(waves) == -2703612752882239487


def test_block_means_batch_bit_identical_to_per_image():
    """The r7 batched decode kernel (block_means_batch) must produce
    BIT-identical block values/centers to the per-image
    decode_image -> block_means -> block_centers sequence: the tile
    oracle fixture rounds avg_intensity to 6 digits, which only
    tolerates aggregation-order noise, not per-block value drift."""
    import numpy as np

    rng = np.random.default_rng(42)
    blobs, lats, lons = [], [], []
    # mixed formats and dims, including non-multiple-of-8 and h < grid
    cases = [("raw", 16, 16), ("rle", 32, 16), ("qdct", 24, 40),
             ("raw", 64, 64), ("qdct", 64, 128), ("rle", 64, 64),
             ("qdct", 64, 64), ("raw", 24, 40), ("qdct", 16, 16)]
    for s, (fmt, w, h) in enumerate(cases * 3):
        px = ic.gen_pixels(s, w, h)
        blobs.append(ic.encode_image(px, fmt))
        lats.append(float(rng.uniform(-60, 60)))
        lons.append(float(rng.uniform(-170, 170)))
    lats = np.array(lats)
    lons = np.array(lons)
    data = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    for grid in (4, 3):
        vals, blas, blos = ic.block_means_batch(
            data, offsets, lats, lons, grid)
        for i, b in enumerate(blobs):
            v_ref, bh, bw = ic.block_means(ic.decode_image(b), grid)
            la_ref, lo_ref = ic.block_centers(
                lats[i], lons[i], bh, bw, grid)
            assert np.array_equal(vals[i], v_ref.astype(np.float64))
            assert np.array_equal(blas[i], la_ref)
            assert np.array_equal(blos[i], lo_ref)


def test_block_means_batch_rejects_unknown_magic():
    import numpy as np
    import pytest

    bad = b"XXXX" + bytes(8)
    data = np.frombuffer(bad, dtype=np.uint8)
    with pytest.raises(ValueError, match="magic"):
        ic.block_means_batch(data, np.array([0, len(bad)]),
                             np.zeros(1), np.zeros(1), 4)
