"""Ray-generation and NDC parity vs the reference (run_nerf_helpers.py:153-192)."""

import numpy as np
import torch

from nerf_tpu.geom.rays import get_rays, get_rays_np, ndc_rays


def _intrinsics(H, W, focal):
    return np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], dtype=np.float32
    )


def _random_c2w(seed):
    rng = np.random.default_rng(seed)
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    c2w = np.concatenate([q, rng.standard_normal((3, 1))], -1).astype(np.float32)
    return c2w


def test_get_rays_parity(ref_helpers):
    H, W, focal = 24, 32, 30.0
    K = _intrinsics(H, W, focal)
    c2w = _random_c2w(0)
    ro_ref, rd_ref = ref_helpers.get_rays(H, W, torch.from_numpy(K), torch.from_numpy(c2w))
    ro, rd = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_ref.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(), rtol=1e-5, atol=1e-5)


def test_get_rays_np_matches_jnp():
    H, W, focal = 16, 20, 25.0
    K = _intrinsics(H, W, focal)
    c2w = _random_c2w(1)
    ro_np, rd_np = get_rays_np(H, W, K, c2w)
    ro, rd = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_np, rtol=1e-5, atol=1e-6)


def test_ndc_rays_parity(ref_helpers):
    H, W, focal = 24, 32, 30.0
    K = _intrinsics(H, W, focal)
    # forward-facing pose: identity-ish rotation, camera looking down -z
    c2w = np.array(
        [[1, 0, 0, 0.1], [0, 1, 0, -0.2], [0, 0, 1, 0.5]], dtype=np.float32
    )
    ro, rd = get_rays_np(H, W, K, c2w)
    ro_t, rd_t = torch.from_numpy(ro.copy()), torch.from_numpy(rd.copy())
    ro_ref, rd_ref = ref_helpers.ndc_rays(H, W, focal, 1.0, ro_t, rd_t)
    ro_j, rd_j = ndc_rays(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(ro_j), ro_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd_j), rd_ref.numpy(), rtol=1e-5, atol=1e-5)
