"""Positional-encoding parity vs the reference Embedder (run_nerf_helpers.py:15-63)."""

import numpy as np
import torch

from nerf_tpu.models.embedding import PosEncConfig, posenc


def _ref_embed(ref_helpers, x_np, multires):
    embed_fn, out_dim = ref_helpers.get_embedder(multires)
    out = embed_fn(torch.from_numpy(x_np))
    return out.numpy(), out_dim


def test_posenc_points_parity(ref_helpers):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((257, 3)).astype(np.float32) * 3.0
    ref, ref_dim = _ref_embed(ref_helpers, x, 10)
    cfg = PosEncConfig(num_freqs=10)
    assert cfg.out_dim == ref_dim == 63
    ours = np.asarray(posenc(x, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)


def test_posenc_views_parity(ref_helpers):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    ref, ref_dim = _ref_embed(ref_helpers, x, 4)
    cfg = PosEncConfig(num_freqs=4)
    assert cfg.out_dim == ref_dim == 27
    ours = np.asarray(posenc(x, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_posenc_identity():
    # i_embed == -1 -> identity (ref run_nerf_helpers.py:49-50)
    x = np.arange(12, dtype=np.float32).reshape(4, 3)
    cfg = PosEncConfig.identity()
    assert cfg.out_dim == 3
    np.testing.assert_array_equal(np.asarray(posenc(x, cfg)), x)


def test_posenc_linear_sampling(ref_helpers):
    # log_sampling=False branch (ref run_nerf_helpers.py:33-34)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 3)).astype(np.float32)
    eo = ref_helpers.Embedder(
        include_input=True,
        input_dims=3,
        max_freq_log2=5,
        num_freqs=6,
        log_sampling=False,
        periodic_fns=[torch.sin, torch.cos],
    )
    ref = eo.embed(torch.from_numpy(x)).numpy()
    ours = np.asarray(posenc(x, PosEncConfig(num_freqs=6, log_sampling=False)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)


def test_posenc_batch_shapes():
    cfg = PosEncConfig(num_freqs=10)
    x = np.zeros((4, 5, 3), np.float32)
    assert posenc(x, cfg).shape == (4, 5, 63)
