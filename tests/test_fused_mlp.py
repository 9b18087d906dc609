"""Fused Pallas posenc+MLP kernel vs the jnp reference path.

Runs in interpreter mode on CPU (tests/conftest.py forces cpu); on real TPU
the same assertions run compiled (see bench / TPU smoke drives).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models.embedding import PosEncConfig, posenc
from nerf_tpu.models.nerf_mlp import MLPConfig, apply_mlp, init_params
from nerf_tpu.ops import fused_mlp

PE_P = PosEncConfig(10)
PE_V = PosEncConfig(4)


def _setup(seed=0):
    cfg = MLPConfig(input_ch=63, input_ch_views=27)
    params = init_params(jax.random.key(seed), cfg)
    return cfg, params


def _jnp_raw(params, cfg, pts, dirs):
    R, S, _ = pts.shape
    x_emb = posenc(pts.reshape(-1, 3), PE_P)
    v_emb = posenc(
        jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3), PE_V
    )
    return apply_mlp(params, cfg, x_emb, v_emb).reshape(R, S, 4)


def _inputs(seed, R=4, S=96):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-2, 2, (R, S, 3)).astype(np.float32))
    dirs = rng.standard_normal((R, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return pts, jnp.asarray(dirs)


def test_supports():
    cfg, _ = _setup()
    assert fused_mlp.supports(cfg, PE_P, PE_V)
    assert not fused_mlp.supports(
        MLPConfig(use_viewdirs=False), PE_P, PE_V
    )
    assert not fused_mlp.supports(MLPConfig(depth=4), PE_P, PE_V)


def test_forward_matches_jnp_f32():
    cfg, params = _setup()
    pts, dirs = _inputs(0)
    ref = _jnp_raw(params, cfg, pts, dirs)
    out = fused_mlp.fused_query(params, cfg, PE_P, PE_V, pts, dirs,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_padding_edge():
    """N not a multiple of the tile: padding must not corrupt results."""
    cfg, params = _setup(1)
    pts, dirs = _inputs(1, R=3, S=77)  # 231 points
    ref = _jnp_raw(params, cfg, pts, dirs)
    out = fused_mlp.fused_query(params, cfg, PE_P, PE_V, pts, dirs,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_grads_match_jnp_f32():
    cfg, params = _setup(2)
    pts, dirs = _inputs(2, R=2, S=64)
    target = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (2, 64, 4)).astype(np.float32)
    )

    def loss_fused(p):
        out = fused_mlp.fused_query(p, cfg, PE_P, PE_V, pts, dirs,
                                    compute_dtype=jnp.float32)
        return jnp.mean((out - target) ** 2)

    def loss_jnp(p):
        return jnp.mean((_jnp_raw(p, cfg, pts, dirs) - target) ** 2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_jnp)(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_input_grads_match_jnp_f32():
    """dx (through posenc) and dv (through the view head) match autodiff."""
    cfg, params = _setup(3)
    pts, dirs = _inputs(4, R=2, S=32)

    def f_fused(p_, d_):
        return jnp.sum(
            fused_mlp.fused_query(params, cfg, PE_P, PE_V, p_, d_,
                                  compute_dtype=jnp.float32) ** 2
        )

    def f_jnp(p_, d_):
        return jnp.sum(_jnp_raw(params, cfg, p_, d_) ** 2)

    gx_f, gd_f = jax.grad(f_fused, argnums=(0, 1))(pts, dirs)
    gx_r, gd_r = jax.grad(f_jnp, argnums=(0, 1))(pts, dirs)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd_f), np.asarray(gd_r), rtol=1e-4, atol=1e-4)


import pytest


def test_no_input_grads_param_grads_identical():
    """input_grads=False must change NOTHING about parameter gradients —
    it only skips the dx/dv branch (which returns zeros instead)."""
    cfg, params = _setup(6)
    pts, dirs = _inputs(8, R=2, S=64)
    target = jnp.asarray(
        np.random.default_rng(9).uniform(-1, 1, (2, 64, 4)).astype(np.float32)
    )

    def loss(p, ig):
        out = fused_mlp.fused_query(p, cfg, PE_P, PE_V, pts, dirs,
                                    compute_dtype=jnp.float32, input_grads=ig)
        return jnp.mean((out - target) ** 2)

    g_with = jax.grad(lambda p: loss(p, True))(params)
    g_without = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_with), jax.tree.leaves(g_without)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the input cotangents really are hard zeros
    gx, gd = jax.grad(
        lambda p_, d_: jnp.sum(
            fused_mlp.fused_query(params, cfg, PE_P, PE_V, p_, d_,
                                  compute_dtype=jnp.float32,
                                  input_grads=False) ** 2
        ),
        argnums=(0, 1),
    )(pts, dirs)
    assert not np.asarray(gx).any() and not np.asarray(gd).any()


@pytest.mark.parametrize("trig_mode", ["poly", "recurrence", "selector"])
def test_bf16_grads_close_to_jnp(trig_mode, monkeypatch):
    """Backward parity for the PRODUCTION (bf16) mode, in BOTH trig modes.

    "recurrence" exercises the double-angle chain (the f32 branch always
    takes the exact selector path, so f32 grad tests never touch it);
    "selector" exercises bf16 with per-frequency trig. Also covers the fused
    Wout head backward under bf16 rounding. Tolerance is relative L2 per
    leaf: bf16 matmuls with f32 accumulation land well under 5%.
    """
    monkeypatch.setattr(fused_mlp, "TRIG_MODE", trig_mode)
    cfg, params = _setup(5)
    pts, dirs = _inputs(6, R=2, S=64)
    target = jnp.asarray(
        np.random.default_rng(7).uniform(-1, 1, (2, 64, 4)).astype(np.float32)
    )

    def loss_fused(p):
        out = fused_mlp.fused_query(p, cfg, PE_P, PE_V, pts, dirs,
                                    compute_dtype=jnp.bfloat16)
        return jnp.mean((out - target) ** 2)

    def loss_jnp(p):
        return jnp.mean((_jnp_raw(p, cfg, pts, dirs) - target) ** 2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_jnp)(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    rel_l2 = float(jnp.linalg.norm(flat_f - flat_r) / jnp.linalg.norm(flat_r))
    assert rel_l2 < 0.05, f"bf16 fused grad rel-L2 error {rel_l2:.4f}"
    # and per-leaf: no single tensor silently wrong while the norm hides it
    # (absolute floor: leaves with ~0 reference norm only need to stay small
    # relative to the global gradient scale)
    floor = 1e-3 * float(jnp.linalg.norm(flat_r))
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        na, nb = jnp.linalg.norm(a - b), jnp.linalg.norm(b)
        assert float(na) <= 0.08 * float(nb) + floor, (a.shape, float(na), float(nb))


def test_bf16_forward_close_to_f32():
    cfg, params = _setup(4)
    pts, dirs = _inputs(5)
    f32 = fused_mlp.fused_query(params, cfg, PE_P, PE_V, pts, dirs,
                                compute_dtype=jnp.float32)
    bf16 = fused_mlp.fused_query(params, cfg, PE_P, PE_V, pts, dirs,
                                 compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(f32 - bf16))) < 0.25


def test_raygen_matches_pts_path():
    """fused_query_rays ~= fused_query(o + d*z): the in-kernel raygen madd
    (ops/fused_mlp.py _embed_pts_rays) is the same f32 computation, but
    the compiler may fuse o + d*z into an fma on one side only; a 1-ulp
    difference in x becomes ~x*2^9*eps ~ 2e-4 phase at the top posenc
    frequency, so parity is allclose, not bitwise."""
    cfg, params = _setup(6)
    rng = np.random.default_rng(6)
    R, S = 13, 16  # R not a multiple of 8: exercises ray padding
    ro = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32) * 0.1)
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(rng.uniform(2, 6, (R, S)).astype(np.float32)), -1)
    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    for dt, atol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
        ref = fused_mlp.fused_query(params, cfg, PE_P, PE_V, pts, vd,
                                    compute_dtype=dt, input_grads=False)
        out = fused_mlp.fused_query_rays(params, cfg, PE_P, PE_V,
                                         ro, rd, vd, z, compute_dtype=dt)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=atol)


def test_raygen_planes_matches_rays_path_with_grads():
    """planes-IO mode vs per-point raygen mode: identical in-kernel math —
    the [4, R, S] output is exactly the transposed [R, S, 4] raw, and the
    backward (cotangent planes -> in-kernel merge) produces bit-identical
    param grads."""
    cfg, params = _setup(7)
    rng = np.random.default_rng(7)
    R, S = 8, 24
    ro = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32) * 0.1)
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(rng.uniform(2, 6, (R, S)).astype(np.float32)), -1)

    raw4 = fused_mlp.fused_query_rays_planes(params, cfg, PE_P, PE_V,
                                             ro, rd, vd, z,
                                             compute_dtype=jnp.float32)
    ref = fused_mlp.fused_query_rays(params, cfg, PE_P, PE_V, ro, rd, vd, z,
                                     compute_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(raw4, 0, -1)), np.asarray(ref)
    )

    tgt = jnp.asarray(rng.uniform(0, 1, (4, R, S)).astype(np.float32))

    def loss_planes(p):
        r = fused_mlp.fused_query_rays_planes(p, cfg, PE_P, PE_V, ro, rd, vd,
                                              z, compute_dtype=jnp.float32)
        return jnp.mean((r - tgt) ** 2)

    def loss_rays(p):
        r = fused_mlp.fused_query_rays(p, cfg, PE_P, PE_V, ro, rd, vd, z,
                                       compute_dtype=jnp.float32)
        return jnp.mean((r - jnp.moveaxis(tgt, 0, -1)) ** 2)

    g_a = jax.grad(loss_planes)(params)
    g_b = jax.grad(loss_rays)(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
