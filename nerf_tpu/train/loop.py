"""The experiment driver: dataset -> model -> optimization loop -> artifacts.

TPU-native re-design of the reference ``train()`` (run_nerf.py:534-872):
- the hot loop calls ONE jitted step (ray sampling + render + grad + Adam all
  on device); host work per step is O(1) bookkeeping
- logging cadence flags (i_print/i_weights/i_testset/i_video) match the
  reference; args.txt/config.txt snapshots match run_nerf.py:625-637
- checkpoints via orbax (utils/checkpoint.py), eval renders via
  render/renderer.py
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.config import NeRFConfig, dump_config
from nerf_tpu.data.rays_dataset import make_sampler
from nerf_tpu.data.scene import Scene
from nerf_tpu.models.factory import init_model_params, make_model
from nerf_tpu.render.renderer import RenderSettings, make_frame_renderer
from nerf_tpu.train.step import TrainState, init_train_state, make_train_step
from nerf_tpu.utils import checkpoint as ckpt_lib
from nerf_tpu.utils.io import save_png, save_video
from nerf_tpu.utils.metrics import img2mse, mse2psnr, psnr_np
from nerf_tpu.utils.profiler import StepTimer, mlp_flops_per_point, trace


def load_scene(cfg: NeRFConfig) -> Scene:
    """Dataset dispatch (ref run_nerf.py:541-608)."""
    if cfg.dataset_type == "blender":
        from nerf_tpu.data.blender import load_blender_scene

        return load_blender_scene(cfg.datadir, cfg.half_res, cfg.testskip, cfg.white_bkgd)
    if cfg.dataset_type == "llff":
        from nerf_tpu.data.llff import load_llff_scene

        return load_llff_scene(
            cfg.datadir,
            factor=cfg.factor,
            spherify=cfg.spherify,
            llffhold=cfg.llffhold,
            no_ndc=cfg.no_ndc,
        )
    if cfg.dataset_type == "deepvoxels":
        from nerf_tpu.data.deepvoxels import load_deepvoxels_scene

        return load_deepvoxels_scene(cfg.datadir, cfg.shape, cfg.testskip)
    if cfg.dataset_type == "LINEMOD":
        from nerf_tpu.data.linemod import load_linemod_scene

        return load_linemod_scene(cfg.datadir, cfg.half_res, cfg.testskip, cfg.white_bkgd)
    raise ValueError(f"Unknown dataset type: {cfg.dataset_type}")


def render_settings_from_config(cfg: NeRFConfig) -> RenderSettings:
    return RenderSettings(
        n_samples=cfg.N_samples,
        n_importance=cfg.N_importance,
        perturb=cfg.perturb > 0.0,
        use_viewdirs=cfg.use_viewdirs,
        white_bkgd=cfg.white_bkgd,
        raw_noise_std=cfg.raw_noise_std,
        lindisp=cfg.lindisp,
        ndc=cfg.ndc,
    )


def render_path(
    params,
    model,
    rs: RenderSettings,
    scene: Scene,
    poses: np.ndarray,
    chunk: int,
    render_factor: int = 0,
    savedir: Optional[str] = None,
    gt_imgs: Optional[np.ndarray] = None,
    render_frame=None,
    frame_ids=None,
):
    """Render a pose path (ref render_path, run_nerf.py:137-175).

    Returns (rgbs, disps) as numpy [M, H, W, ...]. Optional render_factor
    downsamples for fast previews. ``render_frame`` (a make_frame_renderer
    result) can be passed in to reuse one traced program across eval calls.
    ``frame_ids`` names the global frame index of each pose (PNG filenames +
    gt lookup) — the multi-process path renders pose subsets per process.
    """
    H, W, focal = scene.H, scene.W, scene.focal
    if render_factor != 0:
        # a passed-in render_frame was traced at full H/W and would silently
        # ignore the downsample (and mismatch gt shapes) — rebuild instead
        render_frame = None
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)

    rs_eval = rs.eval_mode()
    near, far = (0.0, 1.0) if rs.ndc else (scene.near, scene.far)
    if render_frame is None:
        render_frame = make_frame_renderer(
            model, rs_eval, H, W, K, near, far, chunk=chunk
        )

    if frame_ids is None:
        frame_ids = list(range(len(poses)))
    rgbs, disps = [], []
    psnrs = []

    def drain(i, out):
        # device->host fetch (the only sync) + host-side PNG/PSNR work —
        # overlapped with the NEXT frame's device compute (already enqueued)
        rgb = np.asarray(out["rgb_map"])
        rgbs.append(rgb)
        disps.append(np.asarray(out["disp_map"]))
        fid = frame_ids[i]
        if gt_imgs is not None and render_factor == 0:
            psnrs.append(psnr_np(rgb, np.asarray(gt_imgs[i])))
        if savedir is not None:
            save_png(os.path.join(savedir, f"{fid:03d}.png"), rgb)

    # depth-2 pipeline: enqueue frame i+1 before fetching frame i, so host
    # I/O rides under device compute instead of serializing with it
    pending = None
    for i, c2w in enumerate(poses):
        out = render_frame(params, jnp.asarray(np.asarray(c2w)[:3, :4]))
        if pending is not None:
            drain(*pending)
        pending = (i, out)
    if pending is not None:
        drain(*pending)
    if psnrs:
        print(f"[EVAL] mean PSNR over {len(psnrs)} views: {np.mean(psnrs):.3f}")
    if not rgbs:  # a process with zero assigned frames (multi-process shard)
        return (
            np.zeros((0, H, W, 3), np.float32),
            np.zeros((0, H, W), np.float32),
        )
    return np.stack(rgbs, 0), np.stack(disps, 0)


def render_path_multiprocess(
    params,
    model,
    rs: RenderSettings,
    scene: Scene,
    poses: np.ndarray,
    chunk: int,
    stage_dir: str,
    savedir: Optional[str] = None,
    gt_imgs: Optional[np.ndarray] = None,
    render_frame=None,
    video_base: Optional[str] = None,
):
    """Pose-path rendering sharded over PROCESSES round-robin (VERDICT r4
    #7): each process renders poses[pid::n] on its own addressable devices
    (one local jitted frame program — the cross-process mesh is not used,
    so no non-addressable fetches), writes PNGs under their GLOBAL frame
    ids into the shared ``savedir``, and stages per-frame arrays + PSNRs in
    ``stage_dir``; after a global barrier, process 0 assembles the mp4s /
    prints the gathered mean PSNR and clears the stage. Assumes ``basedir``
    is a filesystem every process can reach (the normal pod setup; the
    2-process test shares a tmpdir).

    Single-device render_path cost at pod scale this replaces: process 0
    renders all M frames alone while every other host idles — wall-clock
    scales 1/n_processes here instead."""
    import shutil

    from jax.experimental import multihost_utils

    n, pid = jax.process_count(), jax.process_index()
    ids = list(range(pid, len(poses), n))
    os.makedirs(stage_dir, exist_ok=True)
    rgbs, disps = render_path(
        params, model, rs, scene, poses[ids], chunk,
        savedir=savedir,
        gt_imgs=None,  # PSNR computed below (global gather, one print)
        render_frame=render_frame,
        frame_ids=ids,
    )
    if gt_imgs is not None and len(ids):
        psnrs = [
            psnr_np(r, np.asarray(gt_imgs[fid])) for r, fid in zip(rgbs, ids)
        ]
        np.save(os.path.join(stage_dir, f"psnr_{pid}.npy"), np.asarray(psnrs))
    if video_base is not None:
        for r, d, fid in zip(rgbs, disps, ids):
            np.save(os.path.join(stage_dir, f"rgb_{fid:03d}.npy"), r)
            np.save(os.path.join(stage_dir, f"disp_{fid:03d}.npy"), d)
    multihost_utils.sync_global_devices("render_path_mp_" + os.path.basename(stage_dir))
    if pid == 0:
        if gt_imgs is not None:
            ps = [
                np.load(os.path.join(stage_dir, f"psnr_{p}.npy"))
                for p in range(n)
                if os.path.exists(os.path.join(stage_dir, f"psnr_{p}.npy"))
            ]
            allp = np.concatenate(ps) if ps else np.zeros((0,))
            if len(allp):
                print(
                    f"[EVAL] mean PSNR over {len(allp)} views "
                    f"({n} processes): {np.mean(allp):.3f}"
                )
        if video_base is not None:
            rgb_seq = np.stack([
                np.load(os.path.join(stage_dir, f"rgb_{f:03d}.npy"))
                for f in range(len(poses))
            ], 0)
            disp_seq = np.stack([
                np.load(os.path.join(stage_dir, f"disp_{f:03d}.npy"))
                for f in range(len(poses))
            ], 0)
            save_video(video_base + "rgb.mp4", rgb_seq)
            disp_seq = np.nan_to_num(disp_seq, nan=0.0, posinf=0.0)
            save_video(
                video_base + "disp.mp4", disp_seq / max(np.max(disp_seq), 1e-10)
            )
        shutil.rmtree(stage_dir, ignore_errors=True)
    # second barrier so no process races ahead while 0 still reads the stage
    multihost_utils.sync_global_devices(
        "render_path_mp_done_" + os.path.basename(stage_dir)
    )


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    history: list  # [(step, loss, psnr)]


def train(
    cfg: NeRFConfig,
    scene: Optional[Scene] = None,
    hooks: Optional[Dict[str, Callable]] = None,
) -> TrainResult:
    """Run the optimization loop (ref run_nerf.py:534-872)."""
    hooks = hooks or {}
    if scene is None:
        scene = load_scene(cfg)

    # multi-process: every host runs this same driver; host-side artifacts
    # (args.txt, prints, eval renders, PNGs/videos) come from process 0 only,
    # while collective operations (train step, checkpoint save) run on all
    is_main = jax.process_index() == 0

    expdir = os.path.join(cfg.basedir, cfg.expname)
    if is_main:
        os.makedirs(expdir, exist_ok=True)
        with open(os.path.join(expdir, "args.txt"), "w") as f:
            f.write(dump_config(cfg))
        if cfg.config is not None and os.path.exists(cfg.config):
            with open(os.path.join(expdir, "config.txt"), "w") as f:
                f.write(open(cfg.config).read())

    model = make_model(cfg)
    rs = render_settings_from_config(cfg)
    root_key = jax.random.key(cfg.seed)
    k_init, k_sample, k_step = jax.random.split(root_key, 3)

    params = init_model_params(k_init, model)
    state = init_train_state(params, cfg.lrate, cfg.lrate_decay)
    if cfg.ft_path not in (None, "None") and cfg.ft_path.endswith(".tar"):
        # reference-format torch checkpoint (run_nerf.py:794-800): import
        # params + Adam moments + step so a nerf-pytorch run resumes natively
        from nerf_tpu.models.torch_import import train_state_from_torch_checkpoint

        state = train_state_from_torch_checkpoint(
            cfg.ft_path, model, cfg.lrate, cfg.lrate_decay
        )
    else:
        state = ckpt_lib.maybe_resume(
            cfg.basedir, cfg.expname, state, cfg.no_reload, cfg.ft_path
        )
    start = int(state.step)

    # render-only short-circuit (ref run_nerf.py:654-672). Multi-process:
    # frames shard over processes (render_path_multiprocess); with
    # render_factor (preview downsample) only process 0 renders instead.
    if cfg.render_only:
        mp = jax.process_count() > 1 and cfg.render_factor == 0
        if not is_main and not mp:
            return TrainResult(state=state, history=[])
        poses = scene.poses[scene.i_test] if cfg.render_test else scene.render_poses
        gt = scene.images[scene.i_test] if cfg.render_test else None
        savedir = os.path.join(
            expdir,
            "renderonly_{}_{:06d}".format("test" if cfg.render_test else "path", start),
        )
        os.makedirs(savedir, exist_ok=True)
        if mp:
            render_path_multiprocess(
                state.params, model, rs, scene, np.asarray(poses), cfg.chunk,
                stage_dir=os.path.join(expdir, ".renderonly_stage"),
                savedir=savedir, gt_imgs=gt,
                video_base=os.path.join(savedir, "video_"),
            )
        else:
            rgbs, _ = render_path(
                state.params, model, rs, scene, poses, cfg.chunk,
                cfg.render_factor, savedir, gt,
            )
            save_video(os.path.join(savedir, "video.mp4"), rgbs)
        return TrainResult(state=state, history=[])

    # --- device mesh: cfg.data_axis devices on 'data' (0 = all, 1 = off) ---
    n_data = cfg.data_axis if cfg.data_axis > 0 else jax.device_count()
    mesh = None
    batch_sh = None
    if n_data > 1:
        from nerf_tpu.parallel.mesh import (
            batch_sharding, make_mesh, make_sharded_train_step, place_state,
        )

        if cfg.N_rand % n_data != 0:
            raise ValueError(
                f"N_rand={cfg.N_rand} must divide evenly over the "
                f"{n_data}-device 'data' mesh axis"
            )
        mesh = make_mesh(n_data=n_data)
        batch_sh = batch_sharding(mesh)
        state = place_state(mesh, state)
        _compile_step = make_sharded_train_step(
            mesh, model, rs, cfg.lrate, cfg.lrate_decay, cfg.donate_state,
            hwf=(scene.H, scene.W, scene.focal),
        )
        step_fn = _compile_step(state)
        raw_mesh_step = getattr(_compile_step, "step_fn", None)
        if is_main:
            print(f"[MESH] data-parallel over {n_data} devices: {mesh}")
    else:
        raw_mesh_step = None
        step_fn = make_train_step(
            model, rs, cfg.lrate, cfg.lrate_decay, cfg.donate_state,
            hwf=(scene.H, scene.W, scene.focal),
        )

    sampler = make_sampler(scene, cfg, k_sample, sharding=batch_sh)

    # scene near/far; NDC marches in [0,1] (ref run_nerf.py:564-566)
    near, far = (0.0, 1.0) if rs.ndc else (scene.near, scene.far)
    if batch_sh is not None and jax.process_count() > 1:
        # the mesh spans non-addressable devices: assemble the (constant)
        # per-ray bounds from per-host shards like every other batch array
        from nerf_tpu.parallel.distributed import (
            global_batch_from_host_shards, host_shard_slice,
        )

        n_host = host_shard_slice(cfg.N_rand)
        n_host = n_host.stop - n_host.start
        near_v, far_v = global_batch_from_host_shards(
            mesh,
            (
                np.full((n_host,), near, np.float32),
                np.full((n_host,), far, np.float32),
            ),
        )
    else:
        near_v = jnp.full((cfg.N_rand,), near, jnp.float32)
        far_v = jnp.full((cfg.N_rand,), far, jnp.float32)
        if batch_sh is not None:
            near_v = jax.device_put(near_v, batch_sh)
            far_v = jax.device_put(far_v, batch_sh)

    try:
        from tqdm import tqdm

        pbar = tqdm(total=cfg.n_iters - start, desc=cfg.expname)
    except ImportError:
        pbar = None

    # Sharded eval: with a (single-process) mesh, frame renders shard the
    # H*W ray axis over 'data' so testset/video renders use every chip
    # instead of leaving N-1 idle (renderer.py make_frame_renderer). In a
    # multi-process run the per-frame host fetch would touch non-addressable
    # shards, so process 0 renders locally instead.
    sharded_eval = mesh is not None and jax.process_count() == 1

    def eval_params(st):
        # sharded eval consumes the mesh-replicated params in place;
        # otherwise pull once per eval (a few MB) to the default device
        if mesh is not None and not sharded_eval:
            return jax.device_get(st.params)
        return st.params

    # ONE jitted frame program shared by every full-res eval site (i_img,
    # i_video spiral, i_testset) — traced lazily on first eval, reused after
    _frame_renderer = []

    def frame_renderer():
        if not _frame_renderer:
            _frame_renderer.append(
                make_frame_renderer(
                    model, rs.eval_mode(), scene.H, scene.W, scene.K,
                    near, far, chunk=cfg.chunk,
                    mesh=mesh if sharded_eval else None,
                )
            )
        return _frame_renderer[0]

    # one source of truth for throughput/MFU (shared with bench.py)
    pts_per_ray = (
        2 * cfg.N_samples + cfg.N_importance
        if cfg.N_importance > 0
        else cfg.N_samples
    )
    timer = StepTimer(
        cfg.N_rand,
        pts_per_ray,
        mlp_flops_per_point(cfg.netdepth, cfg.netwidth),
    )
    timer.start()

    # --- fused multi-step scan: amortize per-step host dispatch ---
    # At the recipes' N_rand=1024 the device step is ~8.3 ms but the
    # per-step loop adds ~3.2 ms of host dispatch (sampler call + step call
    # + bookkeeping; measured r4, docs/PERF.md). With fuse_steps > 1,
    # sampler+step for K steps run as ONE dispatched lax.scan program —
    # draw-for-draw identical to the per-step loop (the samplers' scan
    # specs reproduce the exact key/offset sequences). Chunks never cross a
    # cadence event, the precrop boundary, or an epoch wrap, so all side
    # effects fire at the same steps.
    fuse = max(1, int(getattr(cfg, "fuse_steps", 1)))
    can_fuse = (
        fuse > 1
        # multi-process runs fuse through the mesh path: the samplers'
        # multiproc branches assemble [k, n_rand, ...] global chunk operands
        # (scan_operands), so the one-dispatch-per-chunk amortization — which
        # matters MORE on a pod, where per-chip DP batches shrink — applies
        and (jax.process_count() == 1 or mesh is not None)
        and not cfg.trace
        and "on_step" not in hooks
        and sampler.scan_supported()
        and (mesh is None or raw_mesh_step is not None)
    )
    fused_runner = None
    if can_fuse:
        jit_kwargs = dict(donate_argnums=(0,) if cfg.donate_state else ())
        if mesh is None:
            from nerf_tpu.train.step import make_train_step_fn

            raw_step = make_train_step_fn(
                model, rs, cfg.lrate, cfg.lrate_decay,
                hwf=(scene.H, scene.W, scene.focal),
            )
        else:
            # mesh mode: scan the shard_map step body. Single-process the
            # sampler computes replicated (tiny) and the shard_map's
            # P('data') in_specs slice the batch per device; multi-process
            # the per_step chunk operand arrives pre-sharded [k, 'data'].
            from jax.sharding import NamedSharding, PartitionSpec as P

            raw_step = raw_mesh_step
            rep = NamedSharding(mesh, P())
            per_step_sh = sampler.scan_per_step_sharding(mesh) or rep
            jit_kwargs.update(
                in_shardings=(rep, rep, per_step_sh, batch_sh, batch_sh, rep),
                out_shardings=(rep, rep),
            )
        _runners = {}

        def fused_runner(sample_fn):
            if sample_fn not in _runners:
                def run(st, args, per_step, near_v, far_v, key):
                    def body(s, op):
                        ro, rd, tgt = sample_fn(args, op)
                        return raw_step(s, ro, rd, near_v, far_v, tgt, key)

                    return jax.lax.scan(body, st, per_step)

                _runners[sample_fn] = jax.jit(run, **jit_kwargs)
            return _runners[sample_fn]

    cadences = [
        c for c in (cfg.i_print, cfg.i_img, cfg.i_weights, cfg.i_video,
                    cfg.i_testset) if c > 0
    ]
    if can_fuse and cadences and fuse > min(cadences):
        # chunks never cross a cadence event, so a fuse larger than the
        # smallest interval would silently never engage — cap it and say so
        if is_main:
            print(
                f"[FUSE] fuse_steps={fuse} capped to {min(cadences)} "
                f"(smallest cadence interval)"
            )
        fuse = min(cadences)
        can_fuse = fuse > 1

    def chunk_for(i: int) -> int:
        """Steps the fused program may run starting at i (>= 1 always).
        Bounded only by cadence events and the precrop boundary — the
        samplers' scan windows span epoch wraps themselves
        (BatchedRaySampler._window reproduces the tail-concat + reshuffle),
        so epoch tails no longer fall back to the per-step path (which
        would compile a second program mid-run)."""
        j = cfg.n_iters
        for c in cadences:
            j = min(j, -(-i // c) * c)  # first multiple of c that is >= i
        if cfg.no_batching and i < sampler.precrop_iters:
            # crop is chunk-static: steps with index < precrop_iters sample
            # the center crop (ref run_nerf.py:738), so a crop-phase chunk
            # must end at precrop_iters - 1 — the LAST cropped step
            j = min(j, sampler.precrop_iters - 1)
        sampler.ensure_epoch()
        return max(min(j - i + 1, sampler.max_chunk()), 1)

    _rng_box = []

    def _holdout_rng():
        if not _rng_box:
            _rng_box.append(np.random.default_rng(cfg.seed))
        return _rng_box[0]

    history = []

    # --- async i_print metrics: defer the device fetch one print interval ---
    # float(aux[...]) at the print boundary blocks the host on the value of
    # the step that was JUST dispatched — on this platform a value fetch is
    # a queue fence (memory: axon), so the dispatch pipeline drains and the
    # device idles while the host refills it (part of the ~95k-vs-123k gap
    # at full reference cadence, docs/PERF.md r4). Holding the aux reference
    # and fetching it at the NEXT boundary — an i_print interval of device
    # work later — makes the fetch free: the value is long since resident.
    # Printed/recorded values are identical, printed one interval late; the
    # loop tail and eval boundaries drain the queue.
    #
    # Rates are cumulative from the last DRAIN point — a wall-clock moment
    # at which the device had executed exactly _cum steps (nothing
    # outstanding): after an eval render (its own value fetch drained the
    # in-order queue) or a deliberate fresh-value fetch at the first print
    # of the run. A deferred fetch of an OLD aux is only a lower-bound
    # event (the device may already be far ahead), so anchoring there
    # overstated rates up to ~1.5x (measured on the dv run); a drain point
    # is exact. From a drain anchor, (p_cum - anchor_cum)/(fence - anchor)
    # can never overstate: the numerator's steps all finished before the
    # fence, and the anchor wall is not early.
    _pending_print = []  # [(step index, aux refs, cumulative step count)]
    _cum = [0]  # steps dispatched since loop start
    _anchor = [None, None]  # (wall, cum) at the last drain point

    def _anchor_at_drain():
        """Call ONLY when the device queue is known drained."""
        _anchor[:] = [time.perf_counter(), _cum[0]]

    def _flush_print():
        step_i, p_aux, p_cum = _pending_print.pop()
        loss = float(p_aux["loss"])  # fence: >= p_cum steps now finished
        psnr = float(p_aux["psnr"])
        now = time.perf_counter()
        if _anchor[0] is None or p_cum <= _anchor[1]:
            rate = "warmup"
            if p_cum == _cum[0]:
                # fetched the freshest dispatched step: queue drained
                _anchor[:] = [now, p_cum]
        else:
            rep = timer.report(
                steps=p_cum - _anchor[1], elapsed=now - _anchor[0]
            )
            rate = (
                f"{rep['rays_per_sec']:,.0f} rays/s, {rep['mfu']*100:.1f}% MFU"
            )
        if is_main:
            print(
                f"[TRAIN] Iter: {step_i} Loss: {loss:.6f}  "
                f"PSNR: {psnr:.3f}  ({rate})"
            )
        history.append((step_i, loss, psnr))

    i = start + 1
    try:
        while i <= cfg.n_iters:
            k = chunk_for(i) if can_fuse else 1
            if can_fuse and k >= fuse:
                k = fuse  # fixed chunk size -> one compiled program
                sample_fn = sampler.scan_fn(i)
                args, per_step = sampler.scan_operands(i, k)
                state, aux_stack = fused_runner(sample_fn)(
                    state, args, per_step, near_v, far_v, k_step
                )
                sampler.advance(k)
                aux = jax.tree.map(lambda x: x[-1], aux_stack)
                losses_chunk = aux_stack["loss"] if cfg.debug_nan else None
            else:
                k = 1
                if cfg.no_batching:
                    rays_o, rays_d, target = sampler.next_batch(i)
                else:
                    rays_o, rays_d, target = sampler.next_batch()
                state, aux = step_fn(
                    state, rays_o, rays_d, near_v, far_v, target, k_step
                )
                losses_chunk = aux["loss"] if cfg.debug_nan else None
            i += k - 1  # i = last executed step; cadence below fires for it
            timer.step(k)
            _cum[0] += k
            if pbar is not None:
                pbar.update(k)

            if cfg.debug_nan and not np.all(np.isfinite(np.asarray(losses_chunk))):
                # ref DEBUG NaN scan (run_nerf.py:414-416) — here it also stops
                raise FloatingPointError(f"non-finite loss by step {i}")

            if cfg.trace and i == start + 12:
                # steady state (past compile + warmup): capture a few real steps
                with trace(os.path.join(expdir, "trace")):
                    for _ in range(4):
                        state, aux = step_fn(
                            state, rays_o, rays_d, near_v, far_v, target, k_step
                        )
                    jax.block_until_ready(aux["loss"])
                timer.step(4)
                _cum[0] += 4
                _anchor_at_drain()  # block_until_ready above drained
                print(f"[TRACE] profile written to {expdir}/trace")

            if i % cfg.i_print == 0:
                # flush FIRST: float() on the previous interval's aux is the
                # only device sync — normally instant (that work finished an
                # interval ago)
                if _pending_print:
                    _flush_print()
                _pending_print.append((i, aux, _cum[0]))
                if _anchor[0] is None:
                    # no drain anchor yet (first print of the run): fetch
                    # the freshest value NOW — one deliberate pipeline
                    # drain, right after compile where it costs nothing —
                    # so later windows measure from an exact device state
                    _flush_print()
            if _pending_print and (
                (cfg.i_img > 0 and i % cfg.i_img == 0)
                or (cfg.i_weights > 0 and i % cfg.i_weights == 0)
                or (cfg.i_video > 0 and i % cfg.i_video == 0 and i > 0)
                or (cfg.i_testset > 0 and i % cfg.i_testset == 0 and i > 0)
            ):
                # an eval render / ckpt save will fence the queue anyway —
                # drain the deferred print now so its rate window stays
                # train-only (and prints appear before the eval's own lines)
                _flush_print()
            evaled = False  # did an eval render actually fetch values?
            if is_main and cfg.i_img > 0 and i % cfg.i_img == 0 and len(scene.i_val):
                evaled = True
                # holdout-view PSNR (the reference's i_img logging is dead code,
                # run_nerf.py:842-861; here it's live): render one val view —
                # cycled deterministically, or drawn randomly like the
                # reference (np.random.choice, run_nerf.py:836-840) when
                # cfg.i_img_random
                if cfg.i_img_random:
                    img_i = int(_holdout_rng().choice(np.asarray(scene.i_val)))
                else:
                    img_i = int(np.asarray(scene.i_val)[i // cfg.i_img % len(scene.i_val)])
                out = frame_renderer()(
                    eval_params(state),
                    jnp.asarray(scene.poses[img_i][:3, :4]),
                )
                holdout_psnr = float(
                    mse2psnr(img2mse(out["rgb_map"], jnp.asarray(scene.images[img_i])))
                )
                print(f"[EVAL] Iter: {i} holdout view {img_i} PSNR: {holdout_psnr:.3f}")
            if cfg.i_weights > 0 and i % cfg.i_weights == 0:
                # collective: ALL processes must call (orbax multihost save)
                path = ckpt_lib.save_checkpoint(cfg.basedir, cfg.expname, state)
                if is_main:
                    print("Saved checkpoints at", path)
            multiproc_eval = jax.process_count() > 1
            if (is_main or multiproc_eval) and cfg.i_video > 0 and i % cfg.i_video == 0 and i > 0:
                evaled = True
                base = os.path.join(expdir, f"{cfg.expname}_spiral_{i:06d}_")
                if multiproc_eval:
                    # frames sharded over processes; p0 assembles the mp4s
                    render_path_multiprocess(
                        eval_params(state), model, rs, scene,
                        np.asarray(scene.render_poses), cfg.chunk,
                        stage_dir=os.path.join(expdir, f".video_{i:06d}"),
                        render_frame=frame_renderer(), video_base=base,
                    )
                else:
                    rgbs, disps = render_path(
                        eval_params(state), model, rs, scene, scene.render_poses,
                        cfg.chunk, render_frame=frame_renderer(),
                    )
                    save_video(base + "rgb.mp4", rgbs)
                    # empty rays give disp = 1/max(1e-10, 0/0) = nan
                    # (reference-identical math, run_nerf.py:299); guard only
                    # the video scaling
                    disps = np.nan_to_num(disps, nan=0.0, posinf=0.0)
                    save_video(base + "disp.mp4", disps / max(np.max(disps), 1e-10))
            if (is_main or multiproc_eval) and cfg.i_testset > 0 and i % cfg.i_testset == 0 and i > 0 and len(scene.i_test):
                evaled = True
                testsavedir = os.path.join(expdir, f"testset_{i:06d}")
                os.makedirs(testsavedir, exist_ok=True)  # every process writes
                if multiproc_eval:
                    render_path_multiprocess(
                        eval_params(state), model, rs, scene,
                        np.asarray(scene.poses[scene.i_test]), cfg.chunk,
                        stage_dir=os.path.join(expdir, f".testset_{i:06d}"),
                        savedir=testsavedir,
                        gt_imgs=scene.images[scene.i_test],
                        render_frame=frame_renderer(),
                    )
                else:
                    render_path(
                        eval_params(state), model, rs, scene, scene.poses[scene.i_test],
                        cfg.chunk, savedir=testsavedir, gt_imgs=scene.images[scene.i_test],
                        render_frame=frame_renderer(),
                    )
            if evaled:
                # an eval render's own value fetches drained the in-order
                # queue: an exact (wall, cum) anchor, excluding eval render
                # time from the train-throughput windows. Gated on an eval
                # actually having RUN (not just the cadence): a skipped eval
                # (empty i_val/i_test, non-main process at an i_img step)
                # leaves steps in flight and the anchor would be wrong.
                _anchor_at_drain()
            if "on_step" in hooks:
                hooks["on_step"](i, state, aux)
            i += 1

        if _pending_print:
            _flush_print()  # drain the deferred final interval

    finally:
        # close on every exit path (debug_nan raise, eval errors) so a
        # dangling bar cannot garble subsequent terminal output
        if pbar is not None:
            pbar.close()
    return TrainResult(state=state, history=history)
