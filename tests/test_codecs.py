"""Per-row image payload invariants (BASELINE.json input_hint): lossless
round-trip exactness, lossy PSNR ≥ 40 dB, phash determinism."""

import numpy as np
import pytest

from cosmospark import codecs


@pytest.fixture
def img():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)  # non-multiple-of-8 dims


class TestCodecs:
    def test_raw_roundtrip_exact(self, img):
        blob = codecs.encode(img, "raw")
        back = codecs.decode(blob)
        assert (back == img).all()

    def test_lossy_psnr_over_40(self, img):
        blob = codecs.encode(img, "lossy")
        back = codecs.decode(blob)
        assert back.shape == img.shape
        assert codecs.psnr(img, back) >= 40.0

    def test_lossy_on_smooth_image(self):
        x = np.linspace(0, 255, 64)
        smooth = np.broadcast_to(x[None, :, None], (64, 64, 3)).astype(np.uint8)
        back = codecs.decode(codecs.encode(smooth, "lossy"))
        assert codecs.psnr(smooth, back) >= 45.0

    def test_deterministic(self, img):
        assert codecs.encode(img, "lossy") == codecs.encode(img, "lossy")

    def test_unknown_magic_raises(self):
        with pytest.raises(ValueError):
            codecs.decode(b"XXXX\x00\x00\x00\x00")


class TestPhash:
    def test_self_similarity(self, img):
        h1 = codecs.phash64(img)
        # small perturbation → small hamming distance
        noisy = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        h2 = codecs.phash64(noisy)
        assert codecs.hamming64(h1, h2) <= 8

    def test_different_images_differ(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        assert codecs.hamming64(codecs.phash64(a), codecs.phash64(b)) > 8

    def test_fits_int64(self, img):
        h = codecs.phash64(img)
        assert -(1 << 63) <= h < (1 << 63)
