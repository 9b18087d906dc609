"""Sampling parity: stratified z_vals (run_nerf.py:357-379) and sample_pdf
(run_nerf_helpers.py:196-239), using the reference's pytest determinism hooks
(np.random.seed(0) streams) to compare stochastic paths exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nerf_tpu.ops.sampling import sample_pdf, stratified_z_vals


def _ref_stratified(near, far, n_samples, lindisp, perturb, t_rand=None):
    """Numpy transliteration of the documented stratified sampler semantics."""
    near = near.reshape(-1, 1)
    far = far.reshape(-1, 1)
    t = np.linspace(0.0, 1.0, n_samples, dtype=np.float32)
    if not lindisp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    z = np.broadcast_to(z, (near.shape[0], n_samples)).copy()
    if perturb:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = np.concatenate([mids, z[..., -1:]], -1)
        lower = np.concatenate([z[..., :1], mids], -1)
        z = lower + (upper - lower) * t_rand
    return z


def test_stratified_deterministic():
    near = np.full((8,), 2.0, np.float32)
    far = np.full((8,), 6.0, np.float32)
    for lindisp in (False, True):
        ref = _ref_stratified(near, far, 64, lindisp, False)
        ours = np.asarray(
            stratified_z_vals(jnp.asarray(near), jnp.asarray(far), 64, lindisp=lindisp)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_stratified_perturbed_with_injected_rand():
    rng = np.random.default_rng(0)
    near = rng.uniform(1.0, 2.0, (16,)).astype(np.float32)
    far = near + rng.uniform(1.0, 4.0, (16,)).astype(np.float32)
    t_rand = rng.random((16, 32), dtype=np.float32)
    ref = _ref_stratified(near, far, 32, False, True, t_rand)
    ours = np.asarray(
        stratified_z_vals(
            jnp.asarray(near),
            jnp.asarray(far),
            32,
            perturb=True,
            t_rand=jnp.asarray(t_rand),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_stratified_key_jitter_in_bounds():
    z = stratified_z_vals(
        jnp.full((128,), 2.0),
        jnp.full((128,), 6.0),
        64,
        perturb=True,
        key=jax.random.key(0),
    )
    assert float(jnp.min(z)) >= 2.0
    assert float(jnp.max(z)) <= 6.0
    assert bool(jnp.all(jnp.diff(z, axis=-1) > 0))


def _ref_sample_pdf(ref_helpers, bins, weights, n, det):
    # pytest=True makes the reference draw u from np.random.seed(0) streams
    out = ref_helpers.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), n, det=det, pytest=True
    )
    return out.numpy()


def _pytest_u(shape, det):
    np.random.seed(0)
    if det:
        u = np.linspace(0.0, 1.0, shape[-1])
        return np.broadcast_to(u, shape).astype(np.float32)
    return np.random.rand(*shape).astype(np.float32)


def test_sample_pdf_det_parity(ref_helpers):
    rng = np.random.default_rng(1)
    bins = np.sort(rng.uniform(2.0, 6.0, (32, 63)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (32, 62)).astype(np.float32)
    ref = _ref_sample_pdf(ref_helpers, bins, weights, 128, det=True)
    u = _pytest_u((32, 128), det=True)
    ours = np.asarray(
        sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128, u=jnp.asarray(u))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_sample_pdf_stochastic_parity(ref_helpers):
    rng = np.random.default_rng(2)
    bins = np.sort(rng.uniform(0.0, 1.0, (16, 63)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (16, 62)).astype(np.float32)
    # some near-zero weight rows to exercise the denom guard
    weights[3] = 0.0
    weights[7, :30] = 0.0
    ref = _ref_sample_pdf(ref_helpers, bins, weights, 64, det=False)
    u = _pytest_u((16, 64), det=False)
    ours = np.asarray(
        sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 64, u=jnp.asarray(u))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_sample_pdf_key_within_bins():
    key = jax.random.key(3)
    bins = jnp.sort(jax.random.uniform(key, (8, 31), minval=1.0, maxval=5.0), -1)
    weights = jax.random.uniform(jax.random.key(4), (8, 30))
    s = sample_pdf(bins, weights, 16, key=jax.random.key(5))
    assert float(jnp.min(s)) >= float(jnp.min(bins))
    assert float(jnp.max(s)) <= float(jnp.max(bins))
