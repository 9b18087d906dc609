"""Mesh data-parallel training on the 8-device virtual CPU mesh:
the sharded step must (a) run, (b) produce bitwise/near-identical results to
the single-chip step, since DP-psum of per-shard mean-grads equals the global
mean when shards are equal-sized."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import init_train_state, make_train_step


def _setup(n_importance=16, width=32):
    mcfg = MLPConfig(depth=4, width=width, input_ch=63, input_ch_views=27, skips=(2,))
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg if n_importance else None,
    )
    rs = RenderSettings(n_samples=16, n_importance=n_importance, perturb=False)
    params = init_model_params(jax.random.key(0), model)
    return model, rs, params


def _batch(n=256, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 0.1)
    rays_d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    near = jnp.full((n,), 2.0)
    far = jnp.full((n,), 6.0)
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    return rays_o, rays_d, near, far, target


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_chip_stochastic():
    """Sharded DP training equals single-chip training on the same batch —
    WITH stochastic rendering on (jitter + sigma noise + importance u draws):
    the sharded step pre-draws all randomness globally (train/step.py
    draw_overrides), so the streams are identical by construction.

    Bitwise equality is impossible (pmean of shard means reorders the FP
    reduction vs a global mean, and Adam turns last-bit grad differences on
    near-zero grads into ±lr sign flips), so the assertions are: scalar
    metrics tight over a multi-step trajectory, params overwhelmingly equal
    with stragglers bounded by the Adam per-step update size.
    """
    import dataclasses

    model, rs, params = _setup()
    rs = dataclasses.replace(rs, perturb=True, raw_noise_std=0.7)
    lr = 5e-4
    state1 = init_train_state(params, lr, 250)
    state2 = init_train_state(params, lr, 250)
    batch = _batch()
    key = jax.random.key(7)

    single = make_train_step(model, rs, lr, 250, donate=False)
    mesh = make_mesh(n_data=8)
    sharded = make_sharded_train_step(mesh, model, rs, lr, 250, donate=False)(state2)
    sbatch = shard_batch(mesh, *batch)

    losses1, losses2, psnrs1, psnrs2 = [], [], [], []
    for step in range(4):
        state1, aux1 = single(state1, *batch, key)
        state2, aux2 = sharded(state2, *sbatch, key)
        losses1.append(float(aux1["loss"])); losses2.append(float(aux2["loss"]))
        psnrs1.append(float(aux1["psnr"])); psnrs2.append(float(aux2["psnr"]))
        if step == 0:
            # param check after ONE step (sign flips compound over steps but
            # stay trajectory-neutral, as the loss assertions below prove)
            n_diff = n_total = 0
            for a, b in zip(
                jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
            ):
                a, b = np.asarray(a), np.asarray(b)
                close = np.isclose(a, b, rtol=1e-4, atol=1e-6)
                # stragglers: Adam sign flips, bounded by ~2*lr
                assert np.abs(a - b)[~close].max(initial=0.0) < 2.1 * lr
                n_diff += (~close).sum(); n_total += a.size
            assert n_diff / n_total < 0.05, f"{n_diff}/{n_total} params differ"

    np.testing.assert_allclose(losses1, losses2, rtol=2e-5)
    np.testing.assert_allclose(psnrs1, psnrs2, rtol=2e-5)


def test_dp_tp_mesh_compiles_and_runs():
    """2D mesh (data=4, model=2): params TP-sharded on the hidden dim."""
    model, rs, params = _setup(width=64)
    state = init_train_state(params, 5e-4, 250)
    mesh = make_mesh(n_data=4, n_model=2)
    compile_step = make_sharded_train_step(
        mesh, model, rs, 5e-4, 250, donate=False, shard_model_axis=True
    )
    step = compile_step(state)
    batch = shard_batch(mesh, *_batch())
    s, aux = step(state, *batch, jax.random.key(0))
    assert np.isfinite(float(aux["loss"]))
    s, aux = step(s, *batch, jax.random.key(1))
    assert np.isfinite(float(aux["loss"]))


def test_fused_kernel_under_sharded_step():
    """The Pallas fused-MLP custom_vjp runs through the sharded train step
    (shard_map over 'data'): per-shard pallas_call + pmean grads. Interpret
    mode on CPU; the identical code path jits on TPU. Results must match the
    fused single-chip step."""
    import dataclasses

    mcfg = MLPConfig(depth=8, width=128, input_ch=63, input_ch_views=27, skips=(4,))
    model = NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4),
        coarse=mcfg, fine=mcfg, compute_dtype="float32", fused=True,
    )
    rs = RenderSettings(n_samples=8, n_importance=8, perturb=True, raw_noise_std=0.3)
    params = init_model_params(jax.random.key(0), model)
    lr = 5e-4
    state1 = init_train_state(params, lr, 250)
    state2 = init_train_state(params, lr, 250)
    batch = _batch(n=64)
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


def test_batch_sharding_layout():
    mesh = make_mesh(n_data=8)
    x = shard_batch(mesh, jnp.zeros((64, 3)))
    assert x.sharding == batch_sharding(mesh)


def test_full_train_loop_on_mesh_matches_single_device(tmp_path):
    """The PRODUCT path: train() with cfg.data_axis=8 runs the whole driver
    (sampler -> sharded step -> logging -> checkpoint) on the virtual mesh and
    its loss trajectory matches the single-device run (same seeds, same
    batches, pre-drawn global randomness)."""
    from nerf_tpu.config import NeRFConfig
    from nerf_tpu.train.loop import train
    from tests.synthetic_scene import make_scene

    scene = make_scene(H=16, W=16)
    base = dict(
        basedir=str(tmp_path), dataset_type="blender", N_rand=64,
        N_samples=16, N_importance=8, netdepth=2, netwidth=32,
        netdepth_fine=2, netwidth_fine=32, use_viewdirs=True, white_bkgd=True,
        perturb=1.0, raw_noise_std=0.5, n_iters=40, i_print=10, i_weights=40,
        i_testset=0, i_video=0, i_img=0, chunk=512, compute_dtype="float32",
        fused_kernels=False, no_ndc=True,
    )
    r1 = train(NeRFConfig(expname="single", data_axis=1, **base), scene=scene)
    r8 = train(NeRFConfig(expname="mesh8", data_axis=8, **base), scene=scene)

    l1 = np.asarray([h[1] for h in r1.history])
    l8 = np.asarray([h[1] for h in r8.history])
    np.testing.assert_allclose(l1, l8, rtol=1e-3)
    assert l8[-1] < l8[0]  # it actually trains
    # checkpoint written from the sharded state restores
    import os

    ckpts = os.listdir(os.path.join(str(tmp_path), "mesh8"))
    assert any(c.startswith("ckpt_") for c in ckpts), ckpts


def test_dp_mesh_shape_invariant():
    """data_axis=2 and data_axis=8 produce the same trajectory: the claim
    that justifies the pre-drawn-override design (train/step.py
    draw_overrides — randomness drawn GLOBALLY outside shard_map, so results
    do not depend on how the batch is split across devices). Tolerances
    match test_dp_matches_single_chip_stochastic: the pmean reduction order
    differs between mesh shapes, so equality is near- not bitwise."""
    import dataclasses

    model, rs, params = _setup()
    rs = dataclasses.replace(rs, perturb=True, raw_noise_std=0.7)
    lr = 5e-4
    batch = _batch()
    key = jax.random.key(7)

    losses, psnrs = {}, {}
    for n_data in (2, 8):
        state = init_train_state(params, lr, 250)
        mesh = make_mesh(n_data=n_data)
        step = make_sharded_train_step(mesh, model, rs, lr, 250, donate=False)(
            state
        )
        sbatch = shard_batch(mesh, *batch)
        ls, ps = [], []
        for _ in range(4):
            state, aux = step(state, *sbatch, key)
            ls.append(float(aux["loss"]))
            ps.append(float(aux["psnr"]))
        losses[n_data], psnrs[n_data] = ls, ps

    np.testing.assert_allclose(losses[2], losses[8], rtol=2e-5)
    np.testing.assert_allclose(psnrs[2], psnrs[8], rtol=2e-5)


def test_sharded_frame_renderer_matches_single_device():
    """make_frame_renderer(mesh=...) shards the frame's H*W ray axis over
    'data' (VERDICT r3 #5; ref render_path is single-device,
    run_nerf.py:137-175). In eval mode (deterministic) the sharded frame
    must equal the single-device frame to fp-reduction noise."""
    from nerf_tpu.render.renderer import make_frame_renderer

    model, rs, params = _setup()
    rs_eval = rs.eval_mode()
    H = W = 16
    focal = 0.8 * W
    K = np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32
    )
    c2w = jnp.asarray(
        np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]], np.float32
        )
    )

    single = make_frame_renderer(model, rs_eval, H, W, K, 2.0, 6.0, chunk=64)
    mesh = make_mesh(n_data=8)
    sharded = make_frame_renderer(
        model, rs_eval, H, W, K, 2.0, 6.0, chunk=64, mesh=mesh
    )

    out_s = single(params, c2w)
    out_m = sharded(params, c2w)
    assert out_m["rgb_map"].shape == (H, W, 3)
    for k in ("rgb_map", "disp_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_m[k]), rtol=1e-5, atol=1e-6
        )
