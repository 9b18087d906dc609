"""Generate the procedural benchmark scene in blender dataset format.

Writes data/nerf_synthetic/synth/{train,val,test}/r_*.png +
transforms_*.json laid out exactly like the reference's lego download
(load_blender.py:37-60 reads it unchanged), so `configs/synth.txt` trains on
it through the stock blender loader. Deterministic: seed 0 always produces
the same scene. Run from the repo root:

    python tools/make_benchmark_scene.py [--half]   # --half: 400x400
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.data.synth import make_field, render_gt_image
from nerf_tpu.geom.poses import pose_spherical

CAMERA_ANGLE_X = 0.6911112070083618  # lego's fov -> focal ~1111 at 800px


def main():
    half = "--half" in sys.argv
    res = 400 if half else 800
    out = os.path.join("data", "nerf_synthetic", "synth")
    focal = 0.5 * res / np.tan(0.5 * CAMERA_ANGLE_X)
    fp = make_field(seed=0)
    rng = np.random.default_rng(42)

    counts = {"train": 100, "val": 13, "test": 25}
    t_start = time.time()
    for split, n in counts.items():
        frames = []
        os.makedirs(os.path.join(out, split), exist_ok=True)
        for i in range(n):
            theta = rng.uniform(-180.0, 180.0)
            phi = rng.uniform(-80.0, -10.0)
            pose = np.asarray(pose_spherical(theta, phi, 4.0))
            img = render_gt_image(fp, res, res, focal, pose)
            rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            import imageio.v2 as imageio

            rel = f"./{split}/r_{i}"
            imageio.imwrite(
                os.path.join(out, f"{rel}.png"),
                (np.clip(rgba, 0.0, 1.0) * 255).astype(np.uint8),
            )
            frames.append({"file_path": rel, "transform_matrix": pose.tolist()})
            print(f"{split} {i+1}/{n}  ({time.time()-t_start:.0f}s)", flush=True)
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
