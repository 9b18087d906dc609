"""Multi-scene vmapped training: S scenes in one compiled step, numerically
identical to training each scene alone."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models.embedding import PosEncConfig
from nerf_tpu.models.factory import init_model_params
from nerf_tpu.models.nerf_mlp import MLPConfig
from nerf_tpu.parallel.multi_scene import (
    init_multi_scene_state,
    make_multi_scene_step,
    unstack_states,
)
from nerf_tpu.render.network import NeRFModel
from nerf_tpu.render.renderer import RenderSettings
from nerf_tpu.train.step import init_train_state, make_train_step


def _model():
    mcfg = MLPConfig(depth=4, width=32, input_ch=63, input_ch_views=27, skips=(2,))
    return NeRFModel(
        pe_pts=PosEncConfig(10), pe_views=PosEncConfig(4), coarse=mcfg, fine=None
    )


def _batches(s, n=64):
    rng = np.random.default_rng(s)
    return (
        jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        jnp.full((n,), 2.0),
        jnp.full((n,), 6.0),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    )


def test_multi_scene_matches_individual():
    S = 3
    model = _model()
    rs = RenderSettings(n_samples=16, n_importance=0, perturb=False)

    def init_fn(k):
        return init_model_params(k, model)

    mstate = init_multi_scene_state(jax.random.key(0), S, init_fn, 5e-4, 250)
    mstep = make_multi_scene_step(model, rs, 5e-4, 250, donate=False)

    batches = [_batches(s) for s in range(S)]
    stacked = tuple(jnp.stack([b[i] for b in batches], 0) for i in range(5))
    keys = jax.random.split(jax.random.key(99), S)

    for _ in range(3):
        mstate, aux = mstep(mstate, *stacked, keys)
    assert aux["loss"].shape == (S,)
    assert np.isfinite(np.asarray(aux["loss"])).all()

    # sequential per-scene training with the same init/keys must match
    sstep = make_train_step(model, rs, 5e-4, 250, donate=False)
    final = unstack_states(mstate, S)
    for s in range(S):
        state = init_train_state(
            init_fn(jax.random.split(jax.random.key(0), S)[s]), 5e-4, 250
        )
        for _ in range(3):
            state, aux_s = sstep(state, *batches[s], keys[s])
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(final[s].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_multi_scene_losses_decrease():
    S = 2
    model = _model()
    rs = RenderSettings(n_samples=16, n_importance=0, perturb=True)

    def init_fn(k):
        return init_model_params(k, model)

    mstate = init_multi_scene_state(jax.random.key(1), S, init_fn, 5e-3, 250)
    mstep = make_multi_scene_step(model, rs, 5e-3, 250, donate=False)
    batches = [_batches(10 + s, n=128) for s in range(S)]
    stacked = tuple(jnp.stack([b[i] for b in batches], 0) for i in range(5))

    first = None
    for i in range(60):
        keys = jax.random.split(jax.random.key(i), S)
        mstate, aux = mstep(mstate, *stacked, keys)
        if first is None:
            first = np.asarray(aux["loss"])
    last = np.asarray(aux["loss"])
    assert (last < first).all(), (first, last)


def test_train_multi_cli_on_mesh(tmp_path):
    """The CLI product path: 2 scenes from 2 config files, scene axis sharded
    over a 2-device mesh; trajectories match the unsharded vmapped run
    (zero cross-scene communication => identical numerics), losses drop,
    per-scene checkpoints written."""
    import os

    from nerf_tpu.cli.train_multi import main
    from tests.synthetic_scene import write_blender_dataset

    paths = []
    for s in range(2):
        d = write_blender_dataset(
            str(tmp_path / f"data{s}"), n_train=3, n_val=1, n_test=1, H=16, W=16
        )
        cfg = tmp_path / f"scene{s}.txt"
        cfg.write_text(
            f"expname = ms{s}\nbasedir = {tmp_path}/logs\ndatadir = {d}\n"
            "dataset_type = blender\nno_batching = True\nuse_viewdirs = True\n"
            "white_bkgd = True\nN_rand = 32\nN_samples = 8\nN_importance = 0\n"
            "netdepth = 2\nnetwidth = 32\nhalf_res = False\nchunk = 256\n"
            "compute_dtype = float32\nfused_kernels = False\nno_ndc = True\n"
        )
        paths.append(str(cfg))

    common = ["--n_iters", "60", "--i_print", "20", "--i_weights", "60",
              "--lrate", "5e-3"]
    _, hist_mesh = main(
        ["--configs", *paths, *common, "--data_axis", "2"]
    )
    _, hist_solo = main(["--configs", *paths, *common, "--data_axis", "1"])

    assert len(hist_mesh) == 3  # i_print=20 over 60 iters
    for (i1, l1, p1), (i2, l2, p2) in zip(hist_mesh, hist_solo):
        np.testing.assert_allclose(l1, l2, rtol=1e-5)
    first, last = hist_mesh[0][1], hist_mesh[-1][1]
    assert (last < first).all()
    for s in range(2):
        ckpts = os.listdir(tmp_path / "logs" / f"ms{s}")
        assert any(c.startswith("ckpt_") for c in ckpts), ckpts


def test_multi_scene_ndc_matches_individual():
    """NDC (forward-facing) scenes with DIFFERENT intrinsics in one vmapped
    program: each scene's (H, W, focal) rides the vmap as an operand
    (train/step.py hwf_operand), and training matches the per-scene
    single-scene step with static hwf."""
    S = 2
    model = _model()
    rs = RenderSettings(n_samples=16, n_importance=0, perturb=False, ndc=True,
                        use_viewdirs=True)
    hwfs = [(40, 50, 35.0), (24, 30, 20.0)]

    def init_fn(k):
        return init_model_params(k, model)

    def _ff_batch(s, n=64):
        # forward-facing rays: z pointing toward -1 (ndc divides by d_z)
        rng = np.random.default_rng(s)
        ro = rng.standard_normal((n, 3)).astype(np.float32) * 0.05
        rd = rng.standard_normal((n, 3)).astype(np.float32) * 0.2
        rd[:, 2] = -1.0 - np.abs(rd[:, 2])
        tgt = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        return (jnp.asarray(ro), jnp.asarray(rd), jnp.zeros((n,)),
                jnp.ones((n,)), jnp.asarray(tgt))

    mstate = init_multi_scene_state(jax.random.key(0), S, init_fn, 5e-4, 250)
    mstep = make_multi_scene_step(model, rs, 5e-4, 250, donate=False)

    batches = [_ff_batch(s) for s in range(S)]
    stacked = tuple(jnp.stack([b[i] for b in batches], 0) for i in range(5))
    keys = jax.random.split(jax.random.key(5), S)
    hwf_stack = jnp.asarray([list(h) for h in hwfs], jnp.float32)

    m_losses = []
    for _ in range(3):
        mstate, aux = mstep(mstate, *stacked, keys, hwf_stack)
        m_losses.append(np.asarray(aux["loss"]))
    assert np.isfinite(np.asarray(m_losses)).all()

    # The operand path computes W/(2*focal) etc. in traced f32 while the
    # static path folds them in Python f64 — 1-ulp ray differences that Adam
    # turns into +-lr sign flips on near-zero grads (same phenomenon and
    # same assertion style as test_dp_matches_single_chip_stochastic):
    # scalar trajectory tight, params overwhelmingly equal with stragglers
    # bounded by the Adam step size.
    lr = 5e-4
    final = unstack_states(mstate, S)
    for s in range(S):
        sstep = make_train_step(model, rs, lr, 250, donate=False,
                                hwf=hwfs[s])
        state = init_train_state(
            init_fn(jax.random.split(jax.random.key(0), S)[s]), lr, 250
        )
        losses = []
        for _ in range(3):
            state, aux_s = sstep(state, *batches[s], keys[s])
            losses.append(float(aux_s["loss"]))
        np.testing.assert_allclose([m[s] for m in m_losses], losses, rtol=1e-4)
        n_diff = n_total = 0
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(final[s].params)):
            a, b = np.asarray(a), np.asarray(b)
            close = np.isclose(a, b, rtol=1e-4, atol=1e-6)
            assert np.abs(a - b)[~close].max(initial=0.0) < 2.1 * 3 * lr
            n_diff += (~close).sum()
            n_total += a.size
        assert n_diff / n_total < 0.05, f"{n_diff}/{n_total} params differ"


def test_stacked_sampler_matches_per_scene_samplers(tmp_path):
    """StackedImageSampler (one vmapped program for S scenes' policy-(b)
    sampling — the train_multi fast path) draws bit-identically to S
    standalone ImageRaySamplers built from the same keys, across the
    precrop boundary."""
    from nerf_tpu.data.rays_dataset import ImageRaySampler
    from nerf_tpu.parallel.multi_scene import StackedImageSampler
    from tests.synthetic_scene import make_scene

    scenes = [make_scene(n_train=3, n_test=1, H=16, W=16, seed=s) for s in (0, 1)]
    keys = jax.random.split(jax.random.key(9), 2)
    n_rand, precrop = 24, 3
    solo = [
        ImageRaySampler(s, n_rand, k, precrop_iters=precrop, precrop_frac=0.5)
        for s, k in zip(scenes, keys)
    ]
    stacked = StackedImageSampler(
        scenes, n_rand, keys, precrop_iters=precrop, precrop_frac=0.5
    )
    for step in range(1, 6):  # crosses the precrop boundary at step 3
        ro_s, rd_s, t_s = stacked.next_batch(step)
        for k, smp in enumerate(solo):
            ro, rd, tgt = smp.next_batch(step)
            np.testing.assert_array_equal(np.asarray(ro_s[k]), np.asarray(ro))
            np.testing.assert_array_equal(np.asarray(rd_s[k]), np.asarray(rd))
            np.testing.assert_array_equal(np.asarray(t_s[k]), np.asarray(tgt))
