"""On-chip multi-scene throughput sweep (BASELINE config #5).

Trains S in {1,2,4,8} procedural scene variants (tools/make_multi_scenes.py)
CONCURRENTLY — one vmapped+scanned program: the stacked image sampler and
the vmapped train step for a 50-step chunk run as one dispatched lax.scan —
and the same 8 scenes SEQUENTIALLY (the S=1 program, scene after scene),
then renders one holdout view per scene for PSNR. Emits a results table +
a JSON record (./multiscene_sweep.json by default; the committed 8-scene
measurement was published with --out docs/artifacts/multiscene_r05.json).

No reference analog (run_nerf.py:534 trains one scene per process); cite:
SURVEY.md §5, BASELINE.json configs[4].

    python tools/multiscene_sweep.py [--n_iters 2000] [--scenes 8]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_tpu.config import load_config
from nerf_tpu.models.factory import init_model_params, make_model
from nerf_tpu.parallel.multi_scene import unstack_states
from nerf_tpu.render.renderer import make_frame_renderer
from nerf_tpu.train.loop import load_scene, render_settings_from_config
from nerf_tpu.train.step import make_train_step_fn
from nerf_tpu.utils import compile_cache
from nerf_tpu.utils.metrics import img2mse, mse2psnr

FUSE = 50  # steps per dispatched chunk (the production fuse_steps default)


def main():
    argv = sys.argv[1:]

    def _intflag(name, default):
        if name not in argv:
            return default
        idx = argv.index(name)
        if idx + 1 >= len(argv):
            raise SystemExit(f"{name} requires a value, e.g. {name} 8")
        return int(argv[idx + 1])

    n_iters = _intflag("--n_iters", 2000)
    n_scenes = _intflag("--scenes", 8)
    # one warmup chunk + at least one timed chunk
    n_iters = max(2 * FUSE, n_iters - n_iters % FUSE)
    compile_cache.enable()

    cfgs = [
        load_config(["--config", f"configs/multi/scene_{k}.txt",
                     "--precrop_iters", "0"])
        for k in range(n_scenes)
    ]
    c0 = cfgs[0]
    scenes = [load_scene(c) for c in cfgs]
    s0 = scenes[0]
    model = make_model(c0)
    rs = render_settings_from_config(c0)
    step_fn = make_train_step_fn(model, rs, c0.lrate, c0.lrate_decay)

    root = jax.random.key(c0.seed)
    k_init, k_sample, k_step = jax.random.split(root, 3)
    init_keys = jax.random.split(k_init, n_scenes)
    sample_keys = jax.random.split(k_sample, n_scenes)
    # scene k's step key is FIXED (independent of how many scenes run
    # together), so concurrent and sequential trajectories are bit-identical
    step_keys_all = jax.random.split(k_step, n_scenes)

    H, W, n_rand = s0.H, s0.W, c0.N_rand
    full_crop = (0, 0, H, W)
    near, far = s0.near, s0.far

    def stacked_tensors(scene_list):
        return (
            jnp.stack([jnp.asarray(s.images) for s in scene_list]),
            jnp.stack([jnp.asarray(s.poses) for s in scene_list]),
            jnp.stack([jnp.asarray(s.i_train) for s in scene_list]),
            jnp.stack([jnp.asarray(s.K) for s in scene_list]),
        )

    _runners = {}

    def fused_runner(S):
        """jit((mstate, keys, scene tensors) -> (mstate, keys, last_loss)):
        FUSE steps of [stacked sample -> vmapped step] as ONE program.
        Scene tensors are ARGUMENTS, so the S=1 program is reused across
        the 8 sequential runs (one compile per S, not per scene)."""
        if S in _runners:
            return _runners[S]
        near_v = jnp.full((S, n_rand), near, jnp.float32)
        far_v = jnp.full((S, n_rand), far, jnp.float32)

        # the shared single-scene sampling body (draw-identical to the
        # product StackedImageSampler by construction — one definition)
        from functools import partial as _partial

        from nerf_tpu.parallel.multi_scene import one_scene_sample as _oss

        one_scene_sample = _partial(
            _oss, H=H, W=W, n_rand=n_rand, crop=full_crop
        )

        def run(mstate, keys, step_keys, images, poses, i_train, Ks):
            def body(carry, _):
                st, ks = carry
                ks2, ro, rd, tgt = jax.vmap(one_scene_sample)(
                    images, poses, i_train, Ks, ks
                )
                st, aux = jax.vmap(step_fn)(
                    st, ro, rd, near_v, far_v, tgt, step_keys
                )
                return (st, ks2), aux["loss"]

            (mstate, keys), losses = jax.lax.scan(
                body, (mstate, keys), None, length=FUSE
            )
            return mstate, keys, losses[-1]

        _runners[S] = jax.jit(run, donate_argnums=(0, 1))
        return _runners[S]

    # one frame renderer shared by every PSNR eval (same H/W/K everywhere)
    render_frame = make_frame_renderer(
        model, rs.eval_mode(), H, W, s0.K, near, far, chunk=c0.chunk
    )

    def holdout_psnr(params, scene):
        i_val = int(np.asarray(scene.i_val)[0])
        out = render_frame(params, jnp.asarray(scene.poses[i_val][:3, :4]))
        return float(
            mse2psnr(img2mse(out["rgb_map"], jnp.asarray(scene.images[i_val])))
        )

    def init_state_for(scene_ids):
        """Stacked state with scene k ALWAYS initialized from init_keys[k],
        so the same scene's trajectory is identical in every run shape
        (concurrent S=8 vs sequential) — quality parity is then exact."""
        from nerf_tpu.parallel.multi_scene import stack_states
        from nerf_tpu.train.step import init_train_state

        return stack_states([
            init_train_state(
                init_model_params(init_keys[k], model), c0.lrate, c0.lrate_decay
            )
            for k in scene_ids
        ])

    def run_scenes(scene_ids, label):
        """Train len(scene_ids) scenes concurrently for n_iters; returns
        (ms/step, agg rays/s, psnrs)."""
        S = len(scene_ids)
        runner = fused_runner(S)
        tensors = stacked_tensors([scenes[k] for k in scene_ids])
        mstate = init_state_for(scene_ids)
        keys = jnp.stack([sample_keys[k] for k in scene_ids])
        skeys = jnp.stack([step_keys_all[k] for k in scene_ids])
        mstate, keys, last = runner(mstate, keys, skeys, *tensors)
        float(jnp.sum(last))  # value fetch = the reliable fence on axon
        t0 = time.perf_counter()
        chunks = n_iters // FUSE - 1
        for _ in range(chunks):
            mstate, keys, last = runner(mstate, keys, skeys, *tensors)
        float(jnp.sum(last))  # closing fence
        dt = time.perf_counter() - t0
        steps = chunks * FUSE
        psnrs = [
            holdout_psnr(st.params, scenes[k])
            for st, k in zip(unstack_states(jax.device_get(mstate), S), scene_ids)
        ]
        return dt, steps, psnrs

    results = {"n_iters": n_iters, "fuse": FUSE, "n_rand": n_rand,
               "samples": f"{c0.N_samples}+{c0.N_importance}",
               "res": f"{H}x{W}", "runs": []}

    for S in (1, 2, 4, 8):
        if S > n_scenes:
            continue
        dt, steps, psnrs = run_scenes(list(range(S)), f"concurrent_S{S}")
        agg = steps * S * n_rand / dt
        row = {
            "label": f"concurrent_S{S}", "S": S,
            "ms_per_step": round(dt / steps * 1e3, 3),
            "agg_rays_per_sec": round(agg),
            "per_scene_rays_per_sec": round(agg / S),
            "holdout_psnr": [round(p, 2) for p in psnrs],
        }
        results["runs"].append(row)
        print(f"[SWEEP] S={S}: {row['ms_per_step']} ms/step  "
              f"{agg:,.0f} rays/s agg  PSNR {row['holdout_psnr']}", flush=True)

    # sequential: the SAME per-scene work (init key, sampler key, S=1
    # program) scene after scene — the one-chip alternative a reference
    # user runs today
    t_total, steps1, seq_psnrs = 0.0, 0, []
    for k in range(n_scenes):
        dt, steps1, ps = run_scenes([k], "seq")
        t_total += dt
        seq_psnrs.extend(ps)
    agg_seq = n_scenes * steps1 * n_rand / t_total
    row = {
        "label": f"sequential_{n_scenes}x", "S": 1,
        "total_wall_s": round(t_total, 2),
        "agg_rays_per_sec": round(agg_seq),
        "holdout_psnr": [round(p, 2) for p in seq_psnrs],
    }
    results["runs"].append(row)
    print(f"[SWEEP] sequential x{n_scenes}: {t_total:.1f}s total, "
          f"{agg_seq:,.0f} rays/s agg  PSNR {row['holdout_psnr']}", flush=True)

    # default OUTSIDE the committed docs/artifacts/ (a smoke run must not
    # clobber the recorded 8-scene measurement); pass --out to publish
    out = "multiscene_sweep.json"
    if "--out" in argv:
        idx = argv.index("--out")
        if idx + 1 >= len(argv):
            raise SystemExit("--out requires a path")
        out = argv[idx + 1]
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["runs"], indent=1))


if __name__ == "__main__":
    main()
