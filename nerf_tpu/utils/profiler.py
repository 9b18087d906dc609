"""Tracing / performance counters.

The reference's only instrumentation is wall-clock prints (run_nerf.py:150-153,
712). TPU-native replacements:
- ``trace()``: jax.profiler trace capture (open in XProf/TensorBoard)
- ``StepTimer``: steps/s, rays/s, MLP-point-evals/s, and an analytic MFU
  estimate against the chip's peak FLOP/s
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

# bf16 peak FLOP/s per chip (TPU v5e ~197 TF/s; override for other chips)
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5": 459e12, "cpu": 1e11}


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace: ``with trace('/tmp/trace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def mlp_flops_per_point(depth=8, width=256, input_ch=63, input_ch_views=27) -> int:
    """Forward FLOPs of one MLP point-eval (2*matmul terms, heads included)."""
    f = 2 * input_ch * width  # layer 0
    f += 2 * (depth - 2) * width * width  # middle layers (one has skip extra)
    f += 2 * input_ch * width  # skip re-injection
    f += 2 * width * width  # feature head
    f += 2 * width  # alpha head
    f += 2 * (width + input_ch_views) * (width // 2)  # view layer
    f += 2 * (width // 2) * 3  # rgb head
    return f


class StepTimer:
    """Running train-step throughput with an analytic MFU estimate.

    fwd+bwd is counted as 3x forward FLOPs (standard estimate).
    """

    def __init__(self, rays_per_step: int, points_per_ray: int,
                 flops_per_point: Optional[int] = None):
        self.rays_per_step = rays_per_step
        self.points_per_step = rays_per_step * points_per_ray
        self.flops_per_point = flops_per_point or mlp_flops_per_point()
        self.peak = device_peak_flops()
        self._t0 = None
        self._steps = 0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1):
        self._steps += n

    def report(self, steps: Optional[int] = None,
               elapsed: Optional[float] = None) -> dict:
        """Throughput over the running window, or an explicit (steps, elapsed)
        measurement (used by bench.py so loop and bench share one model)."""
        dt = elapsed if elapsed is not None else time.perf_counter() - self._t0
        n = steps if steps is not None else self._steps
        sps = n / max(dt, 1e-12)
        flops = 3 * self.points_per_step * self.flops_per_point * sps
        return {
            "steps_per_sec": sps,
            "rays_per_sec": sps * self.rays_per_step,
            "point_evals_per_sec": sps * self.points_per_step,
            "model_tflops": flops / 1e12,
            "mfu": flops / self.peak,
        }
