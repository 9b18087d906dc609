"""MLP forward parity vs the reference NeRF module (run_nerf_helpers.py:67-119)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nerf_tpu.models.nerf_mlp import MLPConfig, apply_mlp, init_params, param_count
from tests.ref_utils import transplant_nerf_weights


def _make_pair(ref_helpers, use_viewdirs, seed=0, output_ch=4):
    torch.manual_seed(seed)
    ref_model = ref_helpers.NeRF(
        D=8,
        W=256,
        input_ch=63,
        input_ch_views=27 if use_viewdirs else 0,
        output_ch=output_ch,
        skips=[4],
        use_viewdirs=use_viewdirs,
    )
    params, cfg = transplant_nerf_weights(ref_model)
    return ref_model, params, cfg


def test_forward_parity_viewdirs(ref_helpers):
    ref_model, params, cfg = _make_pair(ref_helpers, use_viewdirs=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 63)).astype(np.float32)
    v = rng.standard_normal((512, 27)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(np.concatenate([x, v], -1))).numpy()
    ours = np.asarray(apply_mlp(params, cfg, jnp.asarray(x), jnp.asarray(v)))
    assert ours.shape == (512, 4)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_forward_parity_no_viewdirs(ref_helpers):
    ref_model, params, cfg = _make_pair(ref_helpers, use_viewdirs=False, output_ch=4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((256, 63)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    ours = np.asarray(apply_mlp(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_input_gradient_parity(ref_helpers):
    """d(sum(out))/d(inputs) must match the reference autograd."""
    ref_model, params, cfg = _make_pair(ref_helpers, use_viewdirs=True, seed=3)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 63)).astype(np.float32)
    v = rng.standard_normal((64, 27)).astype(np.float32)

    xt = torch.from_numpy(np.concatenate([x, v], -1)).requires_grad_(True)
    ref_model(xt).sum().backward()
    ref_gx = xt.grad.numpy()

    gx, gv = jax.grad(
        lambda a, b: jnp.sum(apply_mlp(params, cfg, a, b)), argnums=(0, 1)
    )(jnp.asarray(x), jnp.asarray(v))
    ours = np.concatenate([np.asarray(gx), np.asarray(gv)], -1)
    np.testing.assert_allclose(ours, ref_gx, rtol=1e-4, atol=1e-5)


def test_param_gradient_parity(ref_helpers):
    """d(mean(out^2))/d(params) matches for a couple of layers."""
    ref_model, params, cfg = _make_pair(ref_helpers, use_viewdirs=True, seed=4)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((128, 63)).astype(np.float32)
    v = rng.standard_normal((128, 27)).astype(np.float32)

    out = ref_model(torch.from_numpy(np.concatenate([x, v], -1)))
    out.pow(2).mean().backward()

    grads = jax.grad(
        lambda p: jnp.mean(apply_mlp(p, cfg, jnp.asarray(x), jnp.asarray(v)) ** 2)
    )(jax.tree.map(jnp.asarray, params))

    np.testing.assert_allclose(
        np.asarray(grads["trunk"][0]["w"]),
        ref_model.pts_linears[0].weight.grad.numpy().T,
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(grads["trunk"][5]["w"]),  # post-skip layer: fan-in 319
        ref_model.pts_linears[5].weight.grad.numpy().T,
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(grads["rgb"]["b"]),
        ref_model.rgb_linear.bias.grad.numpy(),
        rtol=1e-4,
        atol=1e-6,
    )


def test_init_shapes_and_count():
    cfg = MLPConfig()
    params = init_params(jax.random.key(0), cfg)
    # trunk layer 5 input = width + input_ch (skip concat after layer 4)
    assert params["trunk"][5]["w"].shape == (256 + 63, 256)
    assert params["trunk"][0]["w"].shape == (63, 256)
    assert params["views"]["w"].shape == (256 + 27, 128)
    n = param_count(params)
    assert 500_000 < n < 700_000  # ~595k params -> ~2.4 MB f32


def test_bf16_compute_close():
    cfg = MLPConfig()
    params = init_params(jax.random.key(1), cfg)
    x = jax.random.normal(jax.random.key(2), (256, 63))
    v = jax.random.normal(jax.random.key(3), (256, 27))
    f32 = apply_mlp(params, cfg, x, v)
    bf16 = apply_mlp(params, cfg, x, v, compute_dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    assert jnp.max(jnp.abs(f32 - bf16)) < 0.15


def test_strict_parity_init_matches_torch_linear_defaults():
    """sigma_bias=0.0 ('strict parity' init) reproduces torch Linear's
    default init distribution exactly: every weight/bias uniform in
    [-1/sqrt(fan_in), 1/sqrt(fan_in)] (ref run_nerf_helpers.py:67-94 uses
    stock nn.Linear), with the documented sigma_bias=0.1 default being the
    ONLY deviation (models/nerf_mlp.py init_params docstring)."""
    from nerf_tpu.models.nerf_mlp import MLPConfig, init_params

    cfg = MLPConfig(input_ch=63, input_ch_views=27)
    params = init_params(jax.random.key(3), cfg, sigma_bias=0.0)

    def check(name, p, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        for part in ("w", "b"):
            arr = np.asarray(p[part])
            assert arr.min() >= -bound and arr.max() <= bound, (name, part)
            if arr.size >= 512:
                # uniform moments: mean ~ 0, var ~ bound^2/3
                assert abs(arr.mean()) < 0.1 * bound, (name, part)
                assert abs(arr.var() - bound**2 / 3) < 0.15 * bound**2 / 3, (
                    name, part,
                )

    fan_in = cfg.input_ch
    for i, layer in enumerate(params["trunk"]):
        check(f"trunk{i}", layer, fan_in)
        fan_in = cfg.width + (cfg.input_ch if i in cfg.skips else 0)
    check("alpha", params["alpha"], cfg.width)
    check("feature", params["feature"], cfg.width)
    check("views", params["views"], cfg.width + cfg.input_ch_views)
    check("rgb", params["rgb"], cfg.width // 2)

    # the default init differs ONLY in the density-head bias shift
    dflt = init_params(jax.random.key(3), cfg)  # sigma_bias=0.1 default
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(dflt),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        label = jax.tree_util.keystr(ka)
        if "alpha" in label and "'b'" in label:
            np.testing.assert_allclose(np.asarray(b) - np.asarray(a), 0.1,
                                       rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
