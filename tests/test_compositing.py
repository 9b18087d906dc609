"""Compositor parity vs the reference raw2outputs (run_nerf.py:262-305),
forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nerf_tpu.ops.compositing import raw2outputs, raw2outputs_planes


def _random_inputs(seed, n_rays=32, n_samples=64):
    rng = np.random.default_rng(seed)
    raw = rng.standard_normal((n_rays, n_samples, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(2.0, 6.0, (n_rays, n_samples)).astype(np.float32), -1)
    rays_d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    return raw, z_vals, rays_d


def test_forward_parity(ref_run_nerf):
    raw, z_vals, rays_d = _random_inputs(0)
    ref_rgb, ref_disp, ref_acc, ref_w, ref_depth = ref_run_nerf.raw2outputs(
        torch.from_numpy(raw), torch.from_numpy(z_vals), torch.from_numpy(rays_d)
    )
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.disp), ref_disp.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.acc), ref_acc.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), ref_w.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth.numpy(), rtol=1e-5, atol=1e-5)


def test_forward_parity_white_bkgd(ref_run_nerf):
    raw, z_vals, rays_d = _random_inputs(1)
    ref_rgb, *_ = ref_run_nerf.raw2outputs(
        torch.from_numpy(raw),
        torch.from_numpy(z_vals),
        torch.from_numpy(rays_d),
        white_bkgd=True,
    )
    out = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb.numpy(), rtol=1e-5, atol=1e-6)


def test_forward_parity_noise_hook(ref_run_nerf):
    """raw_noise_std>0 with the reference pytest hook: noise = seed-0 rand * std."""
    raw, z_vals, rays_d = _random_inputs(2, n_rays=8, n_samples=16)
    std = 1.0
    ref_rgb, *_ = ref_run_nerf.raw2outputs(
        torch.from_numpy(raw),
        torch.from_numpy(z_vals),
        torch.from_numpy(rays_d),
        raw_noise_std=std,
        pytest=True,
    )
    np.random.seed(0)
    noise = (np.random.rand(8, 16) * std).astype(np.float32)
    out = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), noise=jnp.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb.numpy(), rtol=1e-5, atol=1e-6)


def test_gradient_parity(ref_run_nerf):
    """d mean(rgb_map^2) / d raw matches torch autograd."""
    raw, z_vals, rays_d = _random_inputs(3, n_rays=16, n_samples=32)
    raw_t = torch.from_numpy(raw).requires_grad_(True)
    ref_rgb, *_ = ref_run_nerf.raw2outputs(
        raw_t, torch.from_numpy(z_vals), torch.from_numpy(rays_d)
    )
    ref_rgb.pow(2).mean().backward()
    ref_grad = raw_t.grad.numpy()

    g = jax.grad(
        lambda r: jnp.mean(
            raw2outputs(r, jnp.asarray(z_vals), jnp.asarray(rays_d)).rgb ** 2
        )
    )(jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(g), ref_grad, rtol=1e-4, atol=1e-6)


def test_opaque_ray_terminates():
    """A very dense sample should absorb everything behind it."""
    n = 16
    raw = np.zeros((1, n, 4), np.float32)
    raw[0, 4, 3] = 1e4  # huge sigma at sample 4
    raw[0, :, :3] = 5.0  # rgb -> sigmoid ~ 0.993
    z_vals = np.linspace(2.0, 6.0, n, dtype=np.float32)[None]
    rays_d = np.array([[0.0, 0.0, -1.0]], np.float32)
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    w = np.asarray(out.weights)[0]
    assert w[4] > 0.99
    assert np.all(w[5:] < 1e-6)
    assert abs(float(out.depth[0]) - z_vals[0, 4]) < 1e-3


def _rand_planes(seed, R=32, S=48):
    rng = np.random.default_rng(seed)
    raw4 = jnp.asarray(rng.standard_normal((4, R, S)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(2, 6, (R, S)).astype(np.float32)), -1)
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((R, S)).astype(np.float32) * 0.4)
    return raw4, z, rd, noise


def test_planes_matches_raw2outputs():
    """raw2outputs_planes (exact mode) == raw2outputs on the transposed raw
    at f32 roundoff (the per-channel sums reduce in a different order)."""
    raw4, z, rd, noise = _rand_planes(0)
    a = raw2outputs_planes(raw4, z, rd, white_bkgd=True, noise=noise)
    b = raw2outputs(jnp.moveaxis(raw4, 0, -1), z, rd, white_bkgd=True,
                    noise=noise)
    for k in ("rgb", "disp", "acc", "weights", "depth"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, k)), np.asarray(getattr(b, k)),
            rtol=1e-5, atol=1e-6,
        )


def test_planes_matmul_scan_close():
    """The shift-free MXU scan (exp(log @ tril), bf16-path only) perturbs
    weights at ~1e-4 absolute — far below bf16 quantization — and its
    gradient matches the exact cumprod formulation to the same order."""
    raw4, z, rd, noise = _rand_planes(1)

    def run(ms):
        def loss(r4):
            o = raw2outputs_planes(r4, z, rd, white_bkgd=True, noise=noise,
                                   matmul_scan=ms)
            return o.rgb.sum() + o.acc.sum() + o.disp.sum(), o
        (l, o), g = jax.value_and_grad(loss, has_aux=True)(raw4)
        return o, g

    o1, g1 = run(False)
    o2, g2 = run(True)
    for k in ("rgb", "disp", "acc", "weights", "depth"):
        np.testing.assert_allclose(
            np.asarray(getattr(o1, k)), np.asarray(getattr(o2, k)),
            rtol=2e-3, atol=1e-3,
        )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=1e-3)


def test_opaque_ray_planes_no_nan():
    """alpha == 1 rays must stay finite in BOTH scan modes (regression: XLA
    reassociated (1 - alpha) + 1e-10 to (1 + 1e-10) - alpha, zeroing the
    floor and sending log(0) = -inf through the matmul scan on TPU)."""
    n = 16
    raw4 = np.zeros((4, 1, n), np.float32)
    raw4[3, 0, 4] = 1e4
    raw4[:3] = 5.0
    z = jnp.asarray(np.linspace(2.0, 6.0, n, dtype=np.float32)[None])
    rd = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    for ms in (False, True):
        o = raw2outputs_planes(jnp.asarray(raw4), z, rd, matmul_scan=ms)
        for k in ("rgb", "acc", "weights", "depth"):
            assert bool(jnp.all(jnp.isfinite(getattr(o, k)))), (ms, k)
        w = np.asarray(o.weights)[0]
        assert w[4] > 0.99 and np.all(w[5:] < 1e-6)
