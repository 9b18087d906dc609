"""Benchmark: train-step throughput (rays/s/chip) on the lego full recipe.

Measures the fwd+bwd+Adam step of the flagship model (8x256 coarse+fine,
viewdirs, 64+128 samples, N_rand=4096 — the reference's default batch,
run_nerf.py:443) on synthetic rays, and prints ONE JSON line.

Baseline: 7.1k rays/s derived from the reference README (lego 100k iters in
~4h on an RTX 2080 Ti — BASELINE.md).
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from nerf_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 7100.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from nerf_tpu.models.embedding import PosEncConfig
    from nerf_tpu.models.factory import init_model_params
    from nerf_tpu.models.nerf_mlp import MLPConfig
    from nerf_tpu.render.network import NeRFModel
    from nerf_tpu.render.renderer import RenderSettings
    from nerf_tpu.train.step import init_train_state

    mcfg = MLPConfig(input_ch=63, input_ch_views=27, output_ch=5)
    rs = RenderSettings(
        n_samples=64, n_importance=128, perturb=True, white_bkgd=True,
        use_viewdirs=True,
    )

    # the production driver runs sampler+step chunks as ONE dispatched
    # lax.scan program (train/loop.py fuse_steps, default 50) — bench the
    # same execution shape so per-step host dispatch (~0.5-0.9 ms on this
    # remote platform) doesn't pollute the device measurement. The batch is
    # constant (see "excludes"), so the scan carries only the train state.
    FUSE = 10

    def build(n_rand, fused):
        from nerf_tpu.train.step import make_train_step_fn

        model = NeRFModel(
            pe_pts=PosEncConfig(10),
            pe_views=PosEncConfig(4),
            coarse=mcfg,
            fine=mcfg,
            compute_dtype="bfloat16",
            fused=fused,
        )
        params = init_model_params(jax.random.key(0), model)
        state = init_train_state(params, 5e-4, 500)
        raw_step = make_train_step_fn(model, rs, 5e-4, 500)

        def run_chunk(state, ro, rd, nv, fv, tgt, key):
            def body(s, _):
                s, aux = raw_step(s, ro, rd, nv, fv, tgt, key)
                return s, aux["loss"]

            state, losses = jax.lax.scan(body, state, None, length=FUSE)
            return state, {"loss": losses[-1]}

        step = jax.jit(run_chunk, donate_argnums=(0,))
        rng = np.random.default_rng(0)
        batch = (
            jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((n_rand, 3)).astype(np.float32)),
            jnp.full((n_rand,), 2.0, jnp.float32),
            jnp.full((n_rand,), 6.0, jnp.float32),
            jnp.asarray(rng.uniform(0, 1, (n_rand, 3)).astype(np.float32)),
        )
        return state, step, batch

    key = jax.random.key(0)
    state = step = batch = n_rand = None
    # fused Pallas path first; unfused jnp fallback if the backend balks.
    # The remote compile service throws transient HTTP 500s — retry those
    # (a success lands in the persistent cache and later runs are instant).
    for nr, fused in ((4096, True), (4096, False), (1024, False)):
        attempts = 4
        for attempt in range(attempts):
            log(
                f"bench: devices={jax.devices()} N_rand={nr} samples=64+128 "
                f"bf16 fused={fused} (attempt {attempt + 1})"
            )
            try:
                state, step, batch = build(nr, fused)
                t0 = time.time()
                state, aux = step(state, *batch, key)
                jax.block_until_ready(state)
                n_rand = nr
                log(
                    f"bench: first step (compile) {time.time()-t0:.1f}s "
                    f"loss={float(aux['loss']):.4f}"
                )
                break
            except Exception as e:
                msg = str(e)
                log(f"bench: config failed ({type(e).__name__}): {msg[:200]}")
                transient = "HTTP 500" in msg or "UNAVAILABLE" in msg
                if not transient:
                    break  # real compiler rejection: fall to the next config
                time.sleep(10)
        if n_rand is not None:
            break
    if n_rand is None:
        raise SystemExit("bench: no configuration compiled")

    # NOTE: on the remote-TPU (axon) platform block_until_ready can return
    # before the async queue drains — a host VALUE fetch is the reliable
    # fence (same convention as tools/bench_variants.py).
    for _ in range(3):  # warmup chunks / settle the dispatch queue
        state, aux = step(state, *batch, key)
    float(aux["loss"])

    n_calls = 10
    n_steps = n_calls * FUSE  # FUSE steps per dispatched chunk
    t0 = time.time()
    for _ in range(n_calls):
        state, aux = step(state, *batch, key)
    float(aux["loss"])
    # the loss fetch fences through the last step's forward only; the final
    # Adam update can still be in flight — close the window on the full step
    jax.block_until_ready(state)
    dt = time.time() - t0

    rays_per_sec = n_rand * n_steps / dt
    # one FLOP/MFU model shared with the train loop (utils/profiler.py)
    from nerf_tpu.utils.profiler import StepTimer

    timer = StepTimer(n_rand, 64 + 128 + 64)  # coarse 64 + fine 192 pts/ray
    rep = timer.report(steps=n_steps, elapsed=dt)
    log(
        f"bench: {dt/n_steps*1000:.1f} ms/step, {rays_per_sec:,.0f} rays/s, "
        f"~{rep['model_tflops']:.1f} TFLOP/s ({rep['mfu']*100:.1f}% MFU), "
        f"loss={float(aux['loss']):.4f}"
    )

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 2),
                # honesty: the benched step includes fold_in + the pre-drawn
                # RNG streams (draw_overrides) but reuses one synthetic batch,
                # so the per-step sampler gather is excluded; steps run as
                # 10-step scan chunks like the production fused loop
                # (train/loop.py fuse_steps). The end-to-end number including
                # the sampler is the convergence-run steady state
                # (CONVERGENCE.md).
                "excludes": "per-step ray sampling (constant synthetic batch)",
                "fuse_steps": FUSE,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
