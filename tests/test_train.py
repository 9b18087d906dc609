"""End-to-end training: loss decreases / PSNR rises on a synthetic scene;
samplers behave per the reference policies; checkpoint resume round-trips."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.config import NeRFConfig
from nerf_tpu.data.rays_dataset import BatchedRaySampler, ImageRaySampler
from nerf_tpu.models.factory import init_model_params, make_model
from nerf_tpu.render.renderer import render_image
from nerf_tpu.train.loop import render_settings_from_config, train
from nerf_tpu.train.step import init_train_state, make_train_step
from nerf_tpu.utils import checkpoint as ckpt_lib
from tests.synthetic_scene import make_scene


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        expname="t",
        basedir=str(tmp_path),
        dataset_type="blender",
        N_rand=256,
        N_samples=32,
        N_importance=16,
        netdepth=4,
        netwidth=64,
        netdepth_fine=4,
        netwidth_fine=64,
        use_viewdirs=True,
        white_bkgd=True,
        no_batching=False,
        n_iters=150,
        i_print=50,
        i_weights=0,
        i_testset=0,
        i_video=0,
        chunk=2048,
        precrop_iters=0,
        compute_dtype="float32",
        fused_kernels=False,
        no_ndc=True,
        # 4-wide mesh, not the full 8: an 8-participant collective uses the
        # CPU client's ENTIRE 8-thread Eigen pool, and late in the suite
        # that exact-fit rendezvous deadlocks inside XLA (observed: 7/8
        # arrivals, 0% CPU, reproducible at this test only after ~100 prior
        # tests). 4 participants leave pool slack. Full-8 driver coverage
        # lives in test_parallel.py::test_full_train_loop_on_mesh_*.
        data_axis=4,
    )
    base.update(kw)
    return NeRFConfig(**base)


def test_training_fits_synthetic_scene(tmp_path):
    # Convergence-rate note: on this tiny scene/net the reference itself spans
    # a wide loss range across init seeds (verified side-by-side: our step
    # tracks the reference loss to <1% on identical init+batches), so assert
    # robust monotone progress rather than an absolute PSNR.
    scene = make_scene(H=24, W=24)
    cfg = _tiny_cfg(tmp_path, n_iters=400, i_print=100)
    result = train(cfg, scene=scene)
    steps, losses, psnrs = zip(*result.history)
    assert losses[-1] < losses[0] * 0.7, f"no convergence: {losses}"
    # per-batch PSNR is noisy at this scale; require best-seen progress
    assert max(psnrs[1:]) > psnrs[0] + 0.5, f"no PSNR progress: {psnrs}"


def test_training_no_batching_precrop(tmp_path):
    scene = make_scene(H=24, W=24)
    cfg = _tiny_cfg(
        tmp_path, no_batching=True, precrop_iters=60, precrop_frac=0.5, n_iters=120
    )
    result = train(cfg, scene=scene)
    _, losses, psnrs = zip(*result.history)
    assert np.isfinite(losses).all()
    assert psnrs[-1] > psnrs[0]


def test_eval_render_improves(tmp_path):
    """After training, a held-out view renders closer to GT than at init."""
    scene = make_scene(H=24, W=24)
    cfg = _tiny_cfg(tmp_path, n_iters=500)
    model = make_model(cfg)
    rs = render_settings_from_config(cfg).eval_mode()
    pose = jnp.asarray(scene.poses[scene.i_test[0]])
    gt = scene.images[scene.i_test[0]]

    params0 = init_model_params(jax.random.key(cfg.seed), model)
    out0 = render_image(
        params0, model, rs, scene.H, scene.W, jnp.asarray(scene.K), pose,
        scene.near, scene.far, chunk=2048,
    )
    mse0 = float(np.mean((np.asarray(out0["rgb_map"]) - gt) ** 2))

    result = train(cfg, scene=scene)
    out1 = render_image(
        result.state.params, model, rs, scene.H, scene.W, jnp.asarray(scene.K),
        pose, scene.near, scene.far, chunk=2048,
    )
    mse1 = float(np.mean((np.asarray(out1["rgb_map"]) - gt) ** 2))
    assert mse1 < mse0 * 0.8, (mse0, mse1)


def test_checkpoint_save_resume(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model = make_model(cfg)
    params = init_model_params(jax.random.key(0), model)
    state = init_train_state(params, cfg.lrate, cfg.lrate_decay, start_step=1234)
    path = ckpt_lib.save_checkpoint(cfg.basedir, cfg.expname, state)
    assert os.path.isdir(path)

    template = init_train_state(params, cfg.lrate, cfg.lrate_decay)
    restored = ckpt_lib.maybe_resume(cfg.basedir, cfg.expname, template)
    assert int(restored.step) == 1234
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no_reload keeps the template (ref --no_reload)
    fresh = ckpt_lib.maybe_resume(cfg.basedir, cfg.expname, template, no_reload=True)
    assert int(fresh.step) == 0


def test_batched_sampler_epoch_coverage():
    """Policy (a): one epoch visits every ray exactly once (shuffled window)."""
    scene = make_scene(n_train=2, n_test=1, H=8, W=8)
    sampler = BatchedRaySampler(scene, n_rand=32, key=jax.random.key(0))
    n_total = 2 * 8 * 8
    seen = []
    for _ in range(n_total // 32):
        ro, rd, rgb = sampler.next_batch()
        assert ro.shape == (32, 3)
        seen.append(np.asarray(rgb))
    seen = np.concatenate(seen, 0)
    # all rays visited once: multiset of rgb rows matches the buffer's
    buf = np.asarray(sampler.buffer)[:, 2]
    assert seen.shape == buf.shape
    np.testing.assert_allclose(
        np.sort(seen.sum(-1)), np.sort(buf.sum(-1)), rtol=1e-6
    )


def test_batched_sampler_consumes_remainder():
    """Epoch remainder is not dropped: when n_rand does not divide the buffer,
    the window wraps across the epoch boundary (the reference instead emits
    one short batch, run_nerf.py:715-726 — same full coverage, static shape
    here)."""
    scene = make_scene(n_train=2, n_test=1, H=8, W=8)
    n_total = 2 * 8 * 8  # 128
    n_rand = 48  # 128 = 2*48 + 32 -> remainder 32 must still be consumed
    sampler = BatchedRaySampler(scene, n_rand=n_rand, key=jax.random.key(0))
    epoch1 = np.concatenate(
        [np.asarray(sampler.next_batch()[2]) for _ in range(3)], 0
    )  # 144 rays = full epoch 1 (128) + first 16 of epoch 2
    buf = np.asarray(sampler.buffer)[:, 2]
    keys = np.round(epoch1.sum(-1), 6)
    buf_keys = np.round(buf.sum(-1), 6)
    # first 128 draws cover the whole buffer exactly once
    np.testing.assert_allclose(np.sort(keys[:n_total]), np.sort(buf_keys), rtol=1e-6)


def test_image_sampler_precrop_bounds():
    """Policy (b): during precrop, sampled pixels stay in the center crop."""
    scene = make_scene(n_train=3, n_test=1, H=16, W=16)
    sampler = ImageRaySampler(
        scene, n_rand=64, key=jax.random.key(1), precrop_iters=10, precrop_frac=0.5
    )
    # crop box: rows/cols [4, 12): ray dirs must match some in-crop pixel dir
    from nerf_tpu.geom.rays import get_rays_np

    all_dirs = {
        tuple(np.round(get_rays_np(16, 16, scene.K, p)[1][r, c], 5))
        for p in scene.poses[scene.i_train]
        for r in range(4, 12)
        for c in range(4, 12)
    }
    ro, rd, t = sampler.next_batch(step=0)
    for d in np.asarray(rd):
        assert tuple(np.round(d, 5)) in all_dirs
    # after precrop: full-image sampling must produce out-of-crop pixels too
    ro, rd, t = sampler.next_batch(step=100)
    out_of_crop = 0
    for d in np.asarray(rd):
        if tuple(np.round(d, 5)) not in all_dirs:
            out_of_crop += 1
    assert out_of_crop > 0


def test_fused_scan_loop_matches_per_step_loop(tmp_path):
    """fuse_steps > 1 runs sampler+step chunks as one lax.scan program; the
    samplers' scan specs reproduce the exact key/offset sequences of the
    per-step loop, so the trajectories must match to fp-reduction noise —
    for BOTH ray policies, across the precrop boundary and an i_print
    cadence not divisible by the fuse size."""
    scene = make_scene(H=20, W=20, n_train=4, n_test=1, seed=2)
    for case, policy_kw in enumerate((
        dict(no_batching=True, precrop_iters=7, precrop_frac=0.5),
        # precrop boundary (step 10, the first FULL-frame sample) falls as
        # the last step of a would-be chunk [6..10] — regression for the
        # off-by-one where that step sampled cropped inside the scan
        dict(no_batching=True, precrop_iters=10, precrop_frac=0.5,
             i_print=5, n_iters=20),
        dict(no_batching=False),
        # mesh mode: the scanned shard_map body must match the per-step
        # jitted shard_map step (DP over 4 virtual devices)
        dict(no_batching=False, data_axis=4),
        dict(no_batching=True, precrop_iters=7, precrop_frac=0.5,
             data_axis=4),
    )):
        histories = {}
        for fuse in (1, 5):
            kw = dict(
                N_rand=64, N_samples=8, N_importance=8,
                netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                n_iters=36, i_print=12, fuse_steps=fuse, seed=3,
                donate_state=False,
                # data_axis=1: no mesh, or can_fuse would be False under the
                # 8-device pytest mesh and the comparison would be vacuous
                data_axis=1,
            )
            kw.update(policy_kw)
            cfg = _tiny_cfg(tmp_path / f"f{fuse}_{case}", **kw)
            histories[fuse] = train(cfg, scene=scene).history
        h1 = np.asarray(histories[1])
        h5 = np.asarray(histories[5])
        assert h1.shape == h5.shape and h1.shape[0] >= 3
        np.testing.assert_allclose(h1, h5, rtol=2e-5, atol=1e-6)


def test_i_img_holdout_eval(tmp_path, capsys):
    """Live i_img holdout eval (ref's i_img logging is dead code,
    run_nerf.py:842-861; ours renders a val view): deterministic mode cycles
    through i_val in order; i_img_random draws via np RNG like the
    reference's np.random.choice (run_nerf.py:836-840) and stays in i_val."""
    scene = make_scene(H=16, W=16, n_train=3, n_test=2)
    val = set(int(v) for v in scene.i_val)

    kw = dict(
        N_rand=64, N_samples=8, N_importance=8,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        n_iters=60, i_print=20, i_img=20, data_axis=1, fuse_steps=1,
    )
    train(_tiny_cfg(tmp_path / "cyc", **kw), scene=scene)
    views = [
        int(line.split("holdout view ")[1].split()[0])
        for line in capsys.readouterr().out.splitlines()
        if "[EVAL]" in line and "holdout view" in line
    ]
    ival = np.asarray(scene.i_val)
    expect = [int(ival[(i // 20) % len(ival)]) for i in (20, 40, 60)]
    assert views == expect, (views, expect)

    train(_tiny_cfg(tmp_path / "rnd", i_img_random=True, seed=7, **kw), scene=scene)
    views_r = [
        int(line.split("holdout view ")[1].split()[0])
        for line in capsys.readouterr().out.splitlines()
        if "[EVAL]" in line and "holdout view" in line
    ]
    assert len(views_r) == 3 and all(v in val for v in views_r), views_r
