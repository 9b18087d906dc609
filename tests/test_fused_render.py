"""Fused render kernel (MLP + compositing in one Pallas pass) vs jnp path.

Interpret mode on CPU; the same code jits on TPU. The jnp renderer is the
parity reference (itself pinned against the live torch reference in
test_renderer.py), so agreement here chains to the reference.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings, render_rays


def _model(fused_render: bool):
    mcfg = MLPConfig(depth=8, width=128, input_ch=63, input_ch_views=27, skips=(4,))
    return NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg, compute_dtype="float32",
        fused=fused_render, fused_render=fused_render,
    )


def _rays(n=24, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 0.1)
    rays_d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((n,), 2.0, jnp.float32)
    far = jnp.full((n,), 6.0, jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return rays_o, rays_d, viewdirs, near, far, target


@pytest.mark.parametrize("white_bkgd", [False, True])
@pytest.mark.parametrize("noise_std", [0.0, 0.5])
def test_forward_matches_jnp(white_bkgd, noise_std):
    m_f = _model(True)
    m_j = _model(False)
    params = init_model_params(jax.random.key(0), m_f)
    rs = RenderSettings(
        n_samples=16, n_importance=16, perturb=True, use_viewdirs=True,
        white_bkgd=white_bkgd, raw_noise_std=noise_std,
    )
    ro, rd, vd, near, far, _ = _rays()
    key = jax.random.key(3)
    out_f = render_rays(params, m_f, rs, ro, rd, vd, near, far, key=key)
    out_j = render_rays(params, m_j, rs, ro, rd, vd, near, far, key=key)
    for k in ("rgb_map", "acc_map", "rgb0", "acc0", "z_std"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_j[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )
    # disp can divide by tiny acc; compare where it is finite in both
    df, dj = np.asarray(out_f["disp_map"]), np.asarray(out_j["disp_map"])
    mask = np.isfinite(df) & np.isfinite(dj)
    np.testing.assert_allclose(df[mask], dj[mask], rtol=2e-5, atol=2e-6)


def test_param_grads_match_jnp():
    m_f = _model(True)
    m_j = _model(False)
    params = init_model_params(jax.random.key(1), m_f)
    rs = RenderSettings(
        n_samples=16, n_importance=16, perturb=True, use_viewdirs=True,
        white_bkgd=True, raw_noise_std=0.3,
    )
    ro, rd, vd, near, far, target = _rays(seed=5)
    key = jax.random.key(7)

    def loss(p, model):
        out = render_rays(p, model, rs, ro, rd, vd, near, far, key=key)
        l = jnp.mean((out["rgb_map"] - target) ** 2)
        return l + jnp.mean((out["rgb0"] - target) ** 2)

    lf, gf = jax.value_and_grad(loss)(params, m_f)
    lj, gj = jax.value_and_grad(loss)(params, m_j)
    np.testing.assert_allclose(float(lf), float(lj), rtol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_j = dict(jax.tree_util.tree_leaves_with_path(gj))
    for path, a in flat_f:
        b = flat_j[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_eval_mode_no_noise_deterministic():
    m_f = _model(True)
    params = init_model_params(jax.random.key(2), m_f)
    rs = RenderSettings(
        n_samples=8, n_importance=8, perturb=False, use_viewdirs=True,
        white_bkgd=True, raw_noise_std=0.0,
    ).eval_mode()
    ro, rd, vd, near, far, _ = _rays(n=16, seed=9)
    o1 = render_rays(params, m_f, rs, ro, rd, vd, near, far)
    o2 = render_rays(params, m_f, rs, ro, rd, vd, near, far)
    np.testing.assert_array_equal(np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]))


def test_retraw_falls_back_and_agrees():
    """retraw forces the split path even with fused_render on; outputs agree."""
    m_f = _model(True)
    params = init_model_params(jax.random.key(4), m_f)
    rs = RenderSettings(
        n_samples=8, n_importance=0, perturb=False, use_viewdirs=True,
        retraw=True,
    )
    ro, rd, vd, near, far, _ = _rays(n=16, seed=11)
    out = render_rays(params, m_f, rs, ro, rd, vd, near, far)
    assert "raw" in out and out["raw"].shape == (16, 8, 4)


def test_fused_render_under_sharded_step():
    """The fused render custom_vjp through the shard_map DP train step."""
    from nerf_tpu.parallel.mesh import make_mesh, make_sharded_train_step, shard_batch
    from nerf_tpu.train.step import init_train_state, make_train_step

    model = _model(True)
    rs = RenderSettings(
        n_samples=8, n_importance=8, perturb=True, use_viewdirs=True,
        white_bkgd=True, raw_noise_std=0.3,
    )
    params = init_model_params(jax.random.key(0), model)
    lr = 5e-4
    state1 = init_train_state(params, lr, 250)
    state2 = init_train_state(params, lr, 250)
    ro, rd, _, near, far, target = _rays(n=64, seed=13)
    batch = (ro, rd, near, far, target)
    key = jax.random.key(3)

    single = make_train_step(model, rs, lr, 250, donate=False)
    s1, aux1 = single(state1, *batch, key)

    mesh = make_mesh(n_data=8)
    sharded = make_sharded_train_step(mesh, model, rs, lr, 250, donate=False)(state2)
    s2, aux2 = sharded(state2, *shard_batch(mesh, *batch), key)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=2e-5)
    n_diff = n_total = 0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=1e-4, atol=1e-6)
        assert np.abs(a - b)[~close].max(initial=0.0) < 2.1 * lr
        n_diff += (~close).sum(); n_total += a.size
    assert n_diff / n_total < 0.05
