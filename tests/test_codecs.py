import numpy as np
import pytest

from customer_er_spark import codecs
from customer_er_spark.phash import hamming64, phash64


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("fmt", ["raw", "png"])
@pytest.mark.parametrize("shape", [(32, 32), (17, 23), (16, 16, 3)])
def test_lossless_roundtrip(rng, fmt, shape):
    img = rng.integers(0, 256, shape).astype(np.uint8)
    if fmt == "png" and len(shape) == 3:
        pass  # rgb supported
    out = codecs.decode(codecs.encode(img, fmt), fmt)
    ref = img if img.ndim == 2 else img
    np.testing.assert_array_equal(out, ref)


def test_qpng_psnr_above_40(rng):
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    out = codecs.decode(codecs.encode(img, "qpng"), "qpng")
    assert codecs.psnr(img, out) >= 40.0


def test_png_decode_handles_filtered_input():
    # zlib stream with per-row filter types 0..4 written by us must round-trip
    img = (np.arange(25 * 25) % 251).reshape(25, 25).astype(np.uint8)
    data = codecs.png_encode(img)
    np.testing.assert_array_equal(codecs.png_decode(data), img)


def test_psnr_identity_inf(rng):
    img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    assert codecs.psnr(img, img) == float("inf")


def test_phash_stability_and_sensitivity(rng):
    from customer_er_spark.datagen import _make_image, _noisy_image

    img = _make_image(rng, 32, 32)
    ph = phash64(img)
    assert ph == phash64(img.copy())  # deterministic
    noisy = _noisy_image(rng, img)
    assert hamming64(ph, phash64(noisy)) <= 6  # near-dup stays close
    other = _make_image(rng, 32, 32)
    assert hamming64(ph, phash64(other)) > 10  # distinct images far apart


def test_phash_batch_matches_scalar(rng):
    from customer_er_spark.phash import phash64_batch, resize_area, to_gray

    imgs = [rng.integers(0, 256, (32, 32)).astype(np.uint8) for _ in range(5)]
    batch = np.stack([resize_area(to_gray(i)) for i in imgs])
    got = phash64_batch(batch)
    want = [phash64(i) for i in imgs]
    assert list(got) == want
