"""Generate a procedural greek-analog scene in DeepVoxels dataset format.

Writes data/deepvoxels/{train,validation,test}/greek_synth/ with the exact
layout the reference's load_dv_data expects (ref load_deepvoxels.py:6-108):
per-split pose/ dirs of flattened 4x4 matrices, rgb/ dirs of 512x512 PNGs,
and a train-split intrinsics.txt — so `--dataset_type deepvoxels --shape
greek_synth` trains on it through the stock loader, exercising the
hemisphere near/far policy (ref run_nerf.py:602-604), the (y,z)-negating
pose flip, and the testskip interplay end-to-end.

Ground truth is the analytic ellipsoid field (data/synth.py) scaled to fit
the DeepVoxels geometry: cameras on a radius-2 upper hemisphere so
near/far = (1, 3), object inside the unit ball. Deterministic (seed 7).

    python tools/make_deepvoxels_scene.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.data.synth import make_field, render_gt_image, scale_field
from nerf_tpu.geom.poses import pose_spherical

RES = 512  # the loader (and the reference's) hardcodes H = W = 512
RADIUS = 2.0  # hemisphere radius -> near/far = (1, 3) via the hemi_R policy
FOCAL = 655.0  # ~53 deg fov at 512px, greek-like framing
# pose-file convention: the loader right-multiplies by the (y,z)-negating
# flip (ref load_deepvoxels.py:70); FLIP is involutive, so writing
# pose_gl @ FLIP makes the loader recover exactly pose_gl
FLIP = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1.0]])


def main():
    out = os.path.join("data", "deepvoxels")
    # scale 0.5: centers within 0.43, +3 sigma of the biggest lobes ~ 0.9 —
    # comfortably inside the [near, far] = [1, 3] marching band
    fp = scale_field(make_field(seed=7), 0.5)
    rng = np.random.default_rng(77)

    counts = {"train": 40, "validation": 10, "test": 10}
    t0 = time.time()
    import imageio.v2 as imageio

    for split, n in counts.items():
        base = os.path.join(out, split, "greek_synth")
        os.makedirs(os.path.join(base, "pose"), exist_ok=True)
        os.makedirs(os.path.join(base, "rgb"), exist_ok=True)
        if split == "train":
            with open(os.path.join(base, "intrinsics.txt"), "w") as f:
                f.write(
                    f"{FOCAL} {RES/2:.1f} {RES/2:.1f} 0.\n"
                    "0. 0. 0.\n0.\n1.\n"
                    f"{RES} {RES}\n0\n"
                )
        for i in range(n):
            theta = rng.uniform(-180.0, 180.0)
            phi = rng.uniform(-85.0, -5.0)  # upper hemisphere
            pose_gl = np.asarray(pose_spherical(theta, phi, RADIUS))
            with open(os.path.join(base, "pose", f"{i:05d}.txt"), "w") as f:
                f.write(" ".join(f"{x:.8f}" for x in (pose_gl @ FLIP).reshape(-1)))
            img = render_gt_image(
                fp, RES, RES, FOCAL, pose_gl, near=1.0, far=3.0
            )
            imageio.imwrite(
                os.path.join(base, "rgb", f"{i:05d}.png"),
                (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8),
            )
            print(f"{split} {i+1}/{n}  ({time.time()-t0:.0f}s)", flush=True)
    print("wrote", out)


if __name__ == "__main__":
    main()
