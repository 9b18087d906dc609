"""nerf_tpu — a TPU-native NeRF framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of yenchenlin/nerf-pytorch
(reference at /root/reference) for TPU hardware:

- pure-functional core: params are pytrees, every stage is a jittable function
- one jitted, donated train step; optax optimizer + schedule
- fused Pallas kernels for the hot path (positional encoding + MLP)
- SPMD scaling over a named `jax.sharding.Mesh` (rays sharded over the
  ``data`` axis, the ~2.5 MB MLP replicated, gradients all-reduced by XLA)

Layering (bottom-up), mirroring SURVEY.md §7:
    geom/      ray + pose math                  (ref: run_nerf_helpers.py:153-192, load_llff.py pose utils)
    models/    positional encoding + NeRF MLP   (ref: run_nerf_helpers.py:15-119)
    ops/       sampling, compositing, Pallas    (ref: run_nerf.py:262-305, run_nerf_helpers.py:196-239)
    render/    coarse/fine volume renderer      (ref: run_nerf.py:54-175, 308-418)
    data/      scene loaders + ray batching     (ref: load_*.py, run_nerf.py:676-757)
    train/     jitted step + loop               (ref: run_nerf.py:534-872)
    parallel/  mesh + shardings                 (new; reference is single-device)
    utils/     metrics, checkpoint, io          (ref: run_nerf_helpers.py:9-11, run_nerf.py:792-800)
"""

__version__ = "0.5.0"
