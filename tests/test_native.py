"""Native C++ area-downsample kernel (the LLFF minify path's engine)."""

import numpy as np
import pytest

native = pytest.importorskip("nerf_tpu.native.resize")


def _build_ok():
    try:
        native._load()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _build_ok(), reason="no C++ toolchain")


def test_u8_exact_block_mean():
    img = np.random.default_rng(0).integers(0, 255, (64, 48, 3), dtype=np.uint8)
    out = native.area_downsample(img, 8)
    ref = img.astype(np.float32).reshape(8, 8, 6, 8, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_f32_exact_block_mean():
    img = np.random.default_rng(1).random((32, 32, 4), dtype=np.float32)
    out = native.area_downsample(img, 4)
    ref = img.reshape(8, 4, 8, 4, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_non_divisible_truncates():
    img = np.zeros((37, 23, 3), np.uint8)
    out = native.area_downsample(img, 8)
    assert out.shape == (4, 2, 3)


def test_grayscale_2d():
    img = np.random.default_rng(2).integers(0, 255, (16, 16), dtype=np.uint8)
    out = native.area_downsample(img, 2)
    assert out.shape == (8, 8)


def test_llff_loader_uses_native():
    from nerf_tpu.data import llff

    img = np.random.default_rng(3).integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = llff.area_downsample(img, 2)
    ref = img.astype(np.float32).reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4)
