"""Eval artifact generation: render_path PNGs/video, render-only short-circuit."""

import os

import numpy as np

from nerf_tpu.config import NeRFConfig
from nerf_tpu.models.factory import make_model
from nerf_tpu.train.loop import render_settings_from_config, train
from tests.synthetic_scene import make_scene


def _cfg(tmp_path, **kw):
    base = dict(
        expname="ev",
        basedir=str(tmp_path),
        dataset_type="blender",
        N_rand=128,
        N_samples=16,
        N_importance=8,
        netdepth=2,
        netwidth=32,
        netdepth_fine=2,
        netwidth_fine=32,
        use_viewdirs=True,
        white_bkgd=True,
        n_iters=10,
        i_print=5,
        i_weights=0,
        i_testset=10,
        i_video=10,
        i_img=0,
        chunk=512,
        compute_dtype="float32",
        fused_kernels=False,
        no_ndc=True,
    )
    base.update(kw)
    return NeRFConfig(**base)


def test_train_with_video_and_testset(tmp_path):
    scene = make_scene(n_train=3, n_test=2, H=12, W=12)
    scene.render_poses = scene.poses[:2]  # short eval path
    cfg = _cfg(tmp_path)
    train(cfg, scene=scene)
    expdir = os.path.join(str(tmp_path), "ev")
    testdir = os.path.join(expdir, "testset_000010")
    assert os.path.isdir(testdir)
    assert sorted(os.listdir(testdir)) == ["000.png", "001.png"]
    # video (mp4 or png-sequence fallback)
    vids = [f for f in os.listdir(expdir) if "spiral" in f]
    assert vids, os.listdir(expdir)


def test_render_only_short_circuit(tmp_path):
    scene = make_scene(n_train=3, n_test=2, H=12, W=12)
    scene.render_poses = scene.poses[:2]
    cfg = _cfg(tmp_path, render_only=True, render_test=True, render_factor=2)
    result = train(cfg, scene=scene)
    assert result.history == []
    outdir = os.path.join(str(tmp_path), "ev", "renderonly_test_000000")
    assert os.path.isdir(outdir)
    pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
    # render_factor=2 halves resolution
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(outdir, sorted(pngs)[0]))
    assert img.shape[:2] == (6, 6)


def test_args_txt_snapshot(tmp_path):
    scene = make_scene(n_train=3, n_test=1, H=12, W=12)
    cfg = _cfg(tmp_path, n_iters=2, i_video=0, i_testset=0)
    train(cfg, scene=scene)
    args_txt = os.path.join(str(tmp_path), "ev", "args.txt")
    assert os.path.exists(args_txt)
    content = open(args_txt).read()
    assert "N_samples = 16" in content


def test_frame_renderer_matches_render_image(tmp_path):
    """The pipelined jitted frame program (make_frame_renderer) must produce
    exactly what the eager per-frame render_image produces."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.render.renderer import make_frame_renderer, render_image

    cfg = _cfg(tmp_path)
    scene = make_scene(n_train=3, n_test=2, H=24, W=24)
    model = make_model(cfg)
    rs = render_settings_from_config(cfg).eval_mode()
    params = init_model_params(jax.random.key(0), model)

    fr = make_frame_renderer(
        model, rs, scene.H, scene.W, scene.K, scene.near, scene.far, chunk=256
    )
    for i in range(2):
        c2w = jnp.asarray(np.asarray(scene.poses[i])[:3, :4])
        a = fr(params, c2w)
        b = render_image(
            params, model, rs, scene.H, scene.W, jnp.asarray(scene.K), c2w,
            scene.near, scene.far, chunk=256,
        )
        # whole-frame jit fuses the preamble differently than the eager
        # per-op path -> f32 reassociation noise (~3e-4); anything larger
        # would indicate a real wiring difference
        for k in ("rgb_map", "disp_map", "acc_map"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=2e-3, atol=2e-3
            )
