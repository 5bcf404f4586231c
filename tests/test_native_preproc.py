"""Tests for the native C++ preprocessing library (built on the fly)."""

import numpy as np
import pytest

from diffusion_models_tpu.utils import native_preproc


pytestmark = pytest.mark.skipif(
    not native_preproc.available(), reason="native toolchain unavailable"
)


def test_square_resize_matches_pil():
    from PIL import Image

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)
    out = native_preproc.preprocess_batch([img], target=16)[0]

    pil = Image.fromarray(img).resize((16, 16), Image.BILINEAR)
    expect = np.asarray(pil, np.float32) / 255.0
    # bilinear implementations differ by <1 LSB at edges
    assert np.mean(np.abs(out - expect)) < 0.01
    assert out.shape == (16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_nonsquare_short_side_crop():
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (20, 60, 3), dtype=np.uint8)
    out = native_preproc.preprocess_batch([img], target=16)
    assert out.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(out))


def test_flip():
    rs = np.random.RandomState(2)
    # already target-sized: resize is identity, flip should mirror exactly
    img = rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    plain = native_preproc.preprocess_batch([img], target=16, flips=[False])[0]
    flipped = native_preproc.preprocess_batch([img], target=16, flips=[True])[0]
    np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-6)


def test_mixed_sizes_batch_threads():
    rs = np.random.RandomState(3)
    imgs = [
        rs.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for h, w in [(32, 32), (48, 24), (24, 48), (17, 19)] * 4
    ]
    out = native_preproc.preprocess_batch(imgs, target=16, num_threads=4)
    assert out.shape == (16, 16, 16, 3)
    assert np.all(np.isfinite(out))


def test_identity_on_exact_size():
    rs = np.random.RandomState(4)
    img = rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    out = native_preproc.preprocess_batch([img], target=16)[0]
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)
