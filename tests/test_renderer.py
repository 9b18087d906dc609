"""Full-pipeline parity: our render_rays vs the reference render_rays
(run_nerf.py:308-418) — forward (deterministic and stochastic-with-injected-
streams) and pixel-gradients. This is the BASELINE.json allclose gate in
miniature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings, render_rays
from tests.ref_utils import transplant_nerf_weights

N_RAYS, N_SAMPLES, N_IMPORTANCE = 32, 32, 48


def _make_models(ref_helpers, n_importance, seed=0):
    torch.manual_seed(seed)
    kw = dict(D=8, W=64, input_ch=63, input_ch_views=27, output_ch=5 if n_importance else 4,
              skips=[4], use_viewdirs=True)
    ref_coarse = ref_helpers.NeRF(**kw)
    params_c, cfg_c = transplant_nerf_weights(ref_coarse)
    ref_fine = None
    params = {"coarse": params_c}
    fine_cfg = None
    if n_importance:
        ref_fine = ref_helpers.NeRF(**kw)
        params["fine"], fine_cfg = transplant_nerf_weights(ref_fine)
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=cfg_c, fine=fine_cfg,
    )
    return ref_coarse, ref_fine, params, model


def _make_rays(seed, n=N_RAYS):
    rng = np.random.default_rng(seed)
    rays_o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    rays_d = rng.standard_normal((n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_d *= rng.uniform(0.8, 1.2, (n, 1)).astype(np.float32)  # non-unit
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0, np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    ray_batch = np.concatenate([rays_o, rays_d, near, far, viewdirs], -1)
    return rays_o, rays_d, viewdirs, near, far, ray_batch


def _ref_query_fn(ref_helpers, ref_run_nerf):
    embed_fn, _ = ref_helpers.get_embedder(10)
    embeddirs_fn, _ = ref_helpers.get_embedder(4)
    return lambda inputs, viewdirs, fn: ref_run_nerf.run_network(
        inputs, viewdirs, fn, embed_fn, embeddirs_fn, netchunk=65536
    )


def _run_ref(ref_helpers, ref_run_nerf, ray_batch, ref_coarse, ref_fine,
             n_importance, perturb=0.0, raw_noise_std=0.0, pytest_mode=False):
    return ref_run_nerf.render_rays(
        torch.from_numpy(ray_batch),
        network_fn=ref_coarse,
        network_query_fn=_ref_query_fn(ref_helpers, ref_run_nerf),
        N_samples=N_SAMPLES,
        retraw=True,
        perturb=perturb,
        N_importance=n_importance,
        network_fine=ref_fine,
        raw_noise_std=raw_noise_std,
        pytest=pytest_mode,
    )


def _pytest_stream(shape):
    np.random.seed(0)
    return np.random.rand(*shape).astype(np.float32)


@pytest.mark.parametrize("n_importance", [0, N_IMPORTANCE])
def test_render_rays_deterministic_parity(ref_helpers, ref_run_nerf, n_importance):
    ref_coarse, ref_fine, params, model = _make_models(ref_helpers, n_importance)
    rays_o, rays_d, viewdirs, near, far, ray_batch = _make_rays(0)
    with torch.no_grad():
        ref = _run_ref(ref_helpers, ref_run_nerf, ray_batch, ref_coarse, ref_fine,
                       n_importance)
    rs = RenderSettings(
        n_samples=N_SAMPLES, n_importance=n_importance, perturb=False, retraw=True
    )
    out = render_rays(
        params, model, rs,
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(viewdirs),
        jnp.asarray(near[:, 0]), jnp.asarray(far[:, 0]),
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb_map"]), ref["rgb_map"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), ref["acc_map"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["raw"]), ref["raw"].numpy(), rtol=1e-4, atol=1e-4
    )
    if n_importance:
        np.testing.assert_allclose(
            np.asarray(out["rgb0"]), ref["rgb0"].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["z_std"]), ref["z_std"].numpy(), rtol=1e-4, atol=1e-5
        )


def test_render_rays_stochastic_parity_injected_streams(ref_helpers, ref_run_nerf):
    """perturb=1 + raw_noise_std=1 with the reference's seed-0 numpy streams
    injected through overrides (SURVEY.md §4 mechanism)."""
    n_imp = N_IMPORTANCE
    ref_coarse, ref_fine, params, model = _make_models(ref_helpers, n_imp, seed=1)
    rays_o, rays_d, viewdirs, near, far, ray_batch = _make_rays(1)
    std = 1.0
    with torch.no_grad():
        ref = _run_ref(ref_helpers, ref_run_nerf, ray_batch, ref_coarse, ref_fine,
                       n_imp, perturb=1.0, raw_noise_std=std, pytest_mode=True)
    overrides = {
        "t_rand": jnp.asarray(_pytest_stream((N_RAYS, N_SAMPLES))),
        "noise0": jnp.asarray(_pytest_stream((N_RAYS, N_SAMPLES)) * std),
        "u": jnp.asarray(_pytest_stream((N_RAYS, n_imp))),
        "noise1": jnp.asarray(_pytest_stream((N_RAYS, N_SAMPLES + n_imp)) * std),
    }
    rs = RenderSettings(
        n_samples=N_SAMPLES, n_importance=n_imp, perturb=True,
        raw_noise_std=std, retraw=True,
    )
    out = render_rays(
        params, model, rs,
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(viewdirs),
        jnp.asarray(near[:, 0]), jnp.asarray(far[:, 0]),
        overrides=overrides,
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb_map"]), ref["rgb_map"].numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["rgb0"]), ref["rgb0"].numpy(), rtol=1e-4, atol=2e-5
    )


def test_pixel_gradient_parity(ref_helpers, ref_run_nerf):
    """d(mse(fine)+mse(coarse))/d(params) matches reference autograd — the
    gradient gate from BASELINE.json."""
    n_imp = N_IMPORTANCE
    ref_coarse, ref_fine, params, model = _make_models(ref_helpers, n_imp, seed=2)
    rays_o, rays_d, viewdirs, near, far, ray_batch = _make_rays(2)
    target = np.random.default_rng(3).uniform(0, 1, (N_RAYS, 3)).astype(np.float32)

    ref = _run_ref(ref_helpers, ref_run_nerf, ray_batch, ref_coarse, ref_fine, n_imp)
    loss_ref = ((ref["rgb_map"] - torch.from_numpy(target)) ** 2).mean() + (
        (ref["rgb0"] - torch.from_numpy(target)) ** 2
    ).mean()
    loss_ref.backward()

    rs = RenderSettings(n_samples=N_SAMPLES, n_importance=n_imp, perturb=False)

    def loss_fn(p):
        out = render_rays(
            p, model, rs,
            jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(viewdirs),
            jnp.asarray(near[:, 0]), jnp.asarray(far[:, 0]),
        )
        t = jnp.asarray(target)
        return jnp.mean((out["rgb_map"] - t) ** 2) + jnp.mean((out["rgb0"] - t) ** 2)

    grads = jax.grad(loss_fn)(jax.tree.map(jnp.asarray, params))

    pairs = [
        (grads["coarse"]["trunk"][0]["w"], ref_coarse.pts_linears[0].weight.grad.numpy().T),
        (grads["coarse"]["rgb"]["w"], ref_coarse.rgb_linear.weight.grad.numpy().T),
        (grads["coarse"]["alpha"]["b"], ref_coarse.alpha_linear.bias.grad.numpy()),
        (grads["fine"]["trunk"][7]["w"], ref_fine.pts_linears[7].weight.grad.numpy().T),
        (grads["fine"]["views"]["w"], ref_fine.views_linears[0].weight.grad.numpy().T),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=1e-6)
