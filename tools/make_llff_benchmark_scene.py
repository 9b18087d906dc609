"""Generate a forward-facing LLFF-format benchmark scene (the fern-recipe
analog under zero egress; see tools/make_benchmark_scene.py for the blender
one). Writes data/nerf_llff_data/synthff/{images/, poses_bounds.npy} in the
exact layout the reference downloads (load_llff.py:62-118 reads it
unchanged), so configs/synthff.txt drives the full LLFF pipeline: minify,
recenter, NDC, use_batching, spiral render path.

Cameras sit on a jittered grid near z=+4 looking down -z at the analytic
field; bounds from the field's actual depth range. Deterministic (seed 0).

Run from the repo root: python tools/make_llff_benchmark_scene.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # run on host CPU (e.g. while the TPU is busy training); must precede
    # backend init — sitecustomize ignores JAX_PLATFORMS in this image
    import jax

    jax.config.update("jax_platforms", "cpu")

from nerf_tpu.data.synth import make_field, render_gt_image

N_VIEWS = 24
H, W = 3024 // 4, 4032 // 4  # fern-shaped aspect at quarter res (756x1008)
FOCAL = 3260.5 / 4


def main():
    out = os.path.join("data", "nerf_llff_data", "synthff")
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    # backdrop: forward-facing capture needs content on EVERY ray (the fern
    # recipe has no white_bkgd; see make_field docstring + CONVERGENCE.md)
    fp = make_field(seed=0, backdrop=True)
    rng = np.random.default_rng(7)

    poses_bounds = np.zeros((N_VIEWS, 17))
    t0 = time.time()
    import imageio.v2 as imageio

    for i in range(N_VIEWS):
        # OpenGL c2w (x right, y up, z backward), near-identity rotation with
        # small look-at jitter — a handheld forward-facing capture
        pos = np.array([
            rng.uniform(-0.45, 0.45), rng.uniform(-0.3, 0.3),
            4.0 + rng.uniform(-0.15, 0.15),
        ])
        look = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), 0.0])
        fwd = pos - look  # OpenGL: camera looks down -z, z-axis points back
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.stack([right, up, fwd, pos], 1)  # [3, 4]

        img = render_gt_image(fp, H, W, FOCAL, c2w)
        imageio.imwrite(
            os.path.join(out, "images", f"image{i:03d}.png"),
            (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8),
        )

        # disk convention: [down, right, back] columns + hwf col (ref
        # load_llff.py:62-76 inverts this on load)
        m = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:3], c2w[:, 3:4],
             np.array([[H], [W], [FOCAL]])], 1
        )
        poses_bounds[i, :15] = m.reshape(-1)
        # depth bounds along the view axis: field spans |p|<~1.4 around origin
        poses_bounds[i, 15:] = [pos[2] - 1.6, pos[2] + 1.6]
        print(f"view {i+1}/{N_VIEWS} ({time.time()-t0:.0f}s)", flush=True)

    np.save(os.path.join(out, "poses_bounds.npy"), poses_bounds)
    print("wrote", out)


if __name__ == "__main__":
    main()
