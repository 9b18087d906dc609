"""Profiler counters, metrics, io helpers."""

import time

import numpy as np

from nerf_tpu.utils.metrics import img2mse, mse2psnr, to8b
from nerf_tpu.utils.profiler import StepTimer, mlp_flops_per_point


def test_metrics():
    x = np.full((4, 3), 0.5, np.float32)
    y = np.full((4, 3), 0.6, np.float32)
    mse = float(img2mse(x, y))
    assert abs(mse - 0.01) < 1e-6
    assert abs(float(mse2psnr(mse)) - 20.0) < 1e-3
    u8 = to8b(np.array([-0.5, 0.0, 0.5, 1.0, 2.0]))
    assert list(u8) == [0, 0, 127, 255, 255]


def test_mlp_flops_count():
    f = mlp_flops_per_point()
    # 8x256 trunk dominates: ~1.05 MFLOP forward per point (incl. heads)
    assert 0.9e6 < f < 1.2e6


def test_step_timer():
    t = StepTimer(rays_per_step=1024, points_per_ray=256)
    t.start()
    time.sleep(0.05)
    t.step(10)
    r = t.report()
    assert r["rays_per_sec"] > 0
    assert r["point_evals_per_sec"] == r["rays_per_sec"] * 256
    assert 0 <= r["mfu"]


def test_host_shard_slice():
    from nerf_tpu.parallel.distributed import host_shard_slice

    s = host_shard_slice(4096)  # single process
    assert s == slice(0, 4096)
