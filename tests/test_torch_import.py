"""Torch ``.tar`` checkpoint import: parity vs the reference's save format
(run_nerf.py:794-800) — parameters, Adam moments, step counter, exact
one-step continuation, and the ``--ft_path ckpt.tar`` driver hook."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nerf_tpu.config import NeRFConfig
from nerf_tpu.models.factory import make_model
from nerf_tpu.models.nerf_mlp import apply_mlp
from nerf_tpu.models.torch_import import (
    params_from_torch_state_dict,
    train_state_from_torch_checkpoint,
)
from nerf_tpu.train.loop import train
from nerf_tpu.train.step import make_optimizer
from tests.synthetic_scene import make_scene

D, W = 8, 32  # full depth (exercises the skip fan-in) at a tiny width
LRATE, LRATE_DECAY = 5e-4, 250


def _cfg(**kw):
    base = dict(
        netdepth=D,
        netwidth=W,
        netdepth_fine=D,
        netwidth_fine=W,
        N_importance=16,
        use_viewdirs=True,
        multires=10,
        multires_views=4,
        lrate=LRATE,
        lrate_decay=LRATE_DECAY,
        compute_dtype="float32",
        fused_kernels=False,
    )
    base.update(kw)
    return NeRFConfig(**base)


def _ref_pair_with_optimizer(ref_helpers, n_updates=3, seed=0):
    """Coarse+fine reference NeRFs and a torch Adam advanced n_updates steps,
    exactly as run_nerf.py:190-207 builds them."""
    torch.manual_seed(seed)
    kw = dict(D=D, W=W, input_ch=63, input_ch_views=27, output_ch=5,
              skips=[4], use_viewdirs=True)
    m, mf = ref_helpers.NeRF(**kw), ref_helpers.NeRF(**kw)
    grad_vars = list(m.parameters()) + list(mf.parameters())
    opt = torch.optim.Adam(params=grad_vars, lr=LRATE, betas=(0.9, 0.999))
    x = torch.randn(64, 63 + 27)
    for _ in range(n_updates):
        opt.zero_grad()
        (m(x).square().mean() + mf(x).square().mean()).backward()
        opt.step()
    return m, mf, opt


def _save_ref_tar(path, m, mf, opt, global_step):
    torch.save(
        {
            "global_step": global_step,
            "network_fn_state_dict": m.state_dict(),
            "network_fine_state_dict": mf.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
        },
        path,
    )


def test_tar_import_params_moments_and_counters(tmp_path, ref_helpers):
    m, mf, opt = _ref_pair_with_optimizer(ref_helpers, n_updates=3)
    path = str(tmp_path / "000300.tar")
    _save_ref_tar(path, m, mf, opt, global_step=300)

    model = make_model(_cfg())
    state = train_state_from_torch_checkpoint(path, model, LRATE, LRATE_DECAY)

    # forward parity on both levels
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 63)).astype(np.float32)
    v = rng.standard_normal((32, 27)).astype(np.float32)
    xt = torch.from_numpy(np.concatenate([x, v], -1))
    for lvl, ref_m in (("coarse", m), ("fine", mf)):
        with torch.no_grad():
            ref_out = ref_m(xt).numpy()
        ours = np.asarray(
            apply_mlp(state.params[lvl], model.mlp_config(lvl),
                      jnp.asarray(x), jnp.asarray(v))
        )
        np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)

    # moments land transposed in the right slots: param 0 is
    # pts_linears.0.weight of the coarse net, the fine net's block starts
    # at len(coarse state_dict)
    adam, sched = state.opt_state
    ref_state = opt.state_dict()["state"]
    np.testing.assert_array_equal(
        np.asarray(adam.mu["coarse"]["trunk"][0]["w"]),
        ref_state[0]["exp_avg"].numpy().T,
    )
    off = len(m.state_dict())
    np.testing.assert_array_equal(
        np.asarray(adam.nu["fine"]["trunk"][0]["w"]),
        ref_state[off]["exp_avg_sq"].numpy().T,
    )
    # counters: optimizer counts completed updates; step is the tar's
    # global_step (they coincide in a real reference run)
    assert int(adam.count) == 3 and int(sched.count) == 3
    assert int(state.step) == 300

    # no-moments tar (saved before any update) falls back to zero-init
    torch.manual_seed(2)
    m2 = ref_helpers.NeRF(D=D, W=W, input_ch=63, input_ch_views=27,
                          output_ch=5, skips=[4], use_viewdirs=True)
    opt2 = torch.optim.Adam(m2.parameters(), lr=LRATE)
    p2 = str(tmp_path / "000000.tar")
    torch.save(
        {
            "global_step": 0,
            "network_fn_state_dict": m2.state_dict(),
            "network_fine_state_dict": m2.state_dict(),
            "optimizer_state_dict": opt2.state_dict(),
        },
        p2,
    )
    st2 = train_state_from_torch_checkpoint(p2, model, LRATE, LRATE_DECAY)
    adam2, _ = st2.opt_state
    assert int(adam2.count) == 0
    assert float(jnp.abs(adam2.mu["coarse"]["trunk"][0]["w"]).max()) == 0.0


def test_tar_import_exact_one_step_continuation(tmp_path, ref_helpers):
    """The imported optimizer reproduces the reference's NEXT update bit-near:
    feed both sides the same gradients and compare the stepped params."""
    m, mf, opt = _ref_pair_with_optimizer(ref_helpers, n_updates=3)
    path = str(tmp_path / "ck.tar")
    _save_ref_tar(path, m, mf, opt, global_step=3)

    model = make_model(_cfg())
    state = train_state_from_torch_checkpoint(path, model, LRATE, LRATE_DECAY)

    # one more torch step on a fixed synthetic gradient, with the lr the
    # reference would use for update 4 (count 3): lrate * 0.1^(3/(decay*1e3))
    # (run_nerf.py:780-784 writes it after completing step 3)
    g = np.float32(1e-3)
    for p in list(m.parameters()) + list(mf.parameters()):
        p.grad = torch.full_like(p, float(g))
    for group in opt.param_groups:
        group["lr"] = LRATE * (0.1 ** (3 / (LRATE_DECAY * 1000)))
    opt.step()

    grads = jax.tree.map(lambda p: jnp.full_like(p, g), state.params)
    tx = make_optimizer(LRATE, LRATE_DECAY)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    stepped = jax.tree.map(lambda p, u: p + u, state.params, updates)

    ref_stepped = {
        "coarse": params_from_torch_state_dict(m.state_dict(), model.coarse),
        "fine": params_from_torch_state_dict(mf.state_dict(), model.fine),
    }
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        stepped,
        ref_stepped,
    )


def test_export_round_trips_and_loads_in_reference(tmp_path, ref_helpers):
    """Export writes a tar the STOCK reference consumes: strict
    load_state_dict on both networks, optimizer state loads and steps,
    and re-importing reproduces the exported state exactly."""
    from nerf_tpu.models.torch_import import export_torch_checkpoint

    m, mf, opt = _ref_pair_with_optimizer(ref_helpers, n_updates=3)
    src = str(tmp_path / "src.tar")
    _save_ref_tar(src, m, mf, opt, global_step=3)
    model = make_model(_cfg())
    state = train_state_from_torch_checkpoint(src, model, LRATE, LRATE_DECAY)

    out = str(tmp_path / "exported.tar")
    export_torch_checkpoint(out, state, model)

    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert ckpt["global_step"] == 3
    kw = dict(D=D, W=W, input_ch=63, input_ch_views=27, output_ch=5,
              skips=[4], use_viewdirs=True)
    m2, mf2 = ref_helpers.NeRF(**kw), ref_helpers.NeRF(**kw)
    m2.load_state_dict(ckpt["network_fn_state_dict"], strict=True)
    mf2.load_state_dict(ckpt["network_fine_state_dict"], strict=True)
    # weights survived the round trip bit-exact
    for a, b in zip(m.state_dict().values(), m2.state_dict().values()):
        np.testing.assert_array_equal(a.numpy(), b.numpy())
    # moments round-tripped exactly (checked BEFORE stepping: torch's
    # optimizer load_state_dict aliases these tensors and step() mutates
    # them in place)
    np.testing.assert_array_equal(
        ckpt["optimizer_state_dict"]["state"][0]["exp_avg"].numpy(),
        opt.state_dict()["state"][0]["exp_avg"].numpy(),
    )
    # the reference's own resume path accepts the optimizer state and steps
    opt2 = torch.optim.Adam(
        list(m2.parameters()) + list(mf2.parameters()), lr=LRATE
    )
    opt2.load_state_dict(ckpt["optimizer_state_dict"])
    (m2(torch.randn(8, 90)).square().mean()
     + mf2(torch.randn(8, 90)).square().mean()).backward()
    opt2.step()
    # re-import of the export == the original import
    state2 = train_state_from_torch_checkpoint(out, model, LRATE, LRATE_DECAY)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (state.params, state.opt_state[0].mu, int(state.opt_state[0].count)),
        (state2.params, state2.opt_state[0].mu, int(state2.opt_state[0].count)),
    )


def test_tar_no_viewdirs_no_fine_round_trip(tmp_path, ref_helpers):
    """The output_linear (no-viewdirs) head and the fine-absent tar layout
    survive both directions."""
    from nerf_tpu.models.torch_import import export_torch_checkpoint

    torch.manual_seed(3)
    m = ref_helpers.NeRF(D=D, W=W, input_ch=63, input_ch_views=0,
                         output_ch=4, skips=[4], use_viewdirs=False)
    opt = torch.optim.Adam(m.parameters(), lr=LRATE)
    x = torch.randn(16, 63)
    for _ in range(2):
        opt.zero_grad()
        m(x).square().mean().backward()
        opt.step()
    path = str(tmp_path / "nv.tar")
    torch.save(
        {
            "global_step": 2,
            "network_fn_state_dict": m.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
        },
        path,
    )

    model = make_model(_cfg(use_viewdirs=False, N_importance=0, multires_views=0))
    assert model.fine is None and not model.coarse.use_viewdirs
    state = train_state_from_torch_checkpoint(path, model, LRATE, LRATE_DECAY)
    with torch.no_grad():
        ref_out = m(x).numpy()
    ours = np.asarray(
        apply_mlp(state.params["coarse"], model.coarse, jnp.asarray(x.numpy()))
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-6)
    adam, _ = state.opt_state
    assert int(adam.count) == 2 and "fine" not in state.params

    out = str(tmp_path / "nv_export.tar")
    export_torch_checkpoint(out, state, model)
    ck = torch.load(out, map_location="cpu", weights_only=False)
    assert "network_fine_state_dict" not in ck
    m2 = ref_helpers.NeRF(D=D, W=W, input_ch=63, input_ch_views=0,
                          output_ch=4, skips=[4], use_viewdirs=False)
    m2.load_state_dict(ck["network_fn_state_dict"], strict=True)
    for a, b in zip(m.state_dict().values(), m2.state_dict().values()):
        np.testing.assert_array_equal(a.numpy(), b.numpy())


def test_driver_resumes_from_tar_via_ft_path(tmp_path, ref_helpers):
    m, mf, opt = _ref_pair_with_optimizer(ref_helpers, n_updates=2)
    path = str(tmp_path / "000002.tar")
    _save_ref_tar(path, m, mf, opt, global_step=2)

    scene = make_scene(n_train=4, n_test=1, H=24, W=24)
    cfg = _cfg(
        expname="tar_resume",
        basedir=str(tmp_path),
        dataset_type="blender",
        ft_path=path,
        N_rand=128,
        N_samples=16,
        n_iters=6,
        i_print=50,
        i_weights=0,
        i_testset=0,
        i_video=0,
        i_img=0,
        precrop_iters=0,
        no_ndc=True,
        white_bkgd=True,
        fuse_steps=1,
        # no mesh: this test targets the ft_path tar hook, and a full
        # 8-participant CPU collective risks the exact-fit rendezvous
        # deadlock documented in test_train._tiny_cfg
        data_axis=1,
    )
    result = train(cfg, scene=scene)
    # resumed at the tar's step and trained on to n_iters
    assert int(result.state.step) == 6
    assert all(np.isfinite(h[1]) for h in result.history)
