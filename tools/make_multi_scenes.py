"""Generate S procedural blender-format scene variants for the multi-scene
throughput sweep (BASELINE config #5: "all 8 blender scenes trained
concurrently").

Each variant is a differently-seeded analytic ellipsoid field
(data/synth.py make_field) rendered at 200x200 — small images keep the repo
footprint tiny; throughput depends only on N_rand, and per-scene PSNR is
measured against each scene's own analytic GT. Writes
data/nerf_synthetic/multi_k/ + configs/multi/scene_k.txt (lego-recipe
hyperparameters) for k in 0..S-1. Deterministic.

    python tools/make_multi_scenes.py [--scenes 8]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.data.synth import make_field, render_gt_image
from nerf_tpu.geom.poses import pose_spherical

CAMERA_ANGLE_X = 0.6911112070083618  # lego fov
RES = 200
COUNTS = {"train": 15, "val": 3, "test": 3}

CONFIG_TMPL = """## Multi-scene sweep variant {k} (tools/make_multi_scenes.py).
expname = multi_{k}
basedir = ./logs
datadir = ./data/nerf_synthetic/multi_{k}
dataset_type = blender

no_batching = True

use_viewdirs = True
white_bkgd = True
lrate_decay = 500

N_samples = 64
N_importance = 128
N_rand = 1024

precrop_iters = 500
precrop_frac = 0.5
"""


def main():
    n_scenes = 8
    if "--scenes" in sys.argv:
        idx = sys.argv.index("--scenes")
        if idx + 1 >= len(sys.argv):
            raise SystemExit("--scenes requires a value, e.g. --scenes 8")
        n_scenes = int(sys.argv[idx + 1])
    focal = 0.5 * RES / np.tan(0.5 * CAMERA_ANGLE_X)
    os.makedirs(os.path.join("configs", "multi"), exist_ok=True)
    t0 = time.time()
    import imageio.v2 as imageio

    for k in range(n_scenes):
        fp = make_field(seed=200 + k)
        rng = np.random.default_rng(1000 + k)
        out = os.path.join("data", "nerf_synthetic", f"multi_{k}")
        for split, n in COUNTS.items():
            frames = []
            os.makedirs(os.path.join(out, split), exist_ok=True)
            for i in range(n):
                theta = rng.uniform(-180.0, 180.0)
                phi = rng.uniform(-80.0, -10.0)
                pose = np.asarray(pose_spherical(theta, phi, 4.0))
                img = render_gt_image(fp, RES, RES, focal, pose)
                rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
                rel = f"./{split}/r_{i}"
                imageio.imwrite(
                    os.path.join(out, f"{rel}.png"),
                    (np.clip(rgba, 0.0, 1.0) * 255).astype(np.uint8),
                )
                frames.append(
                    {"file_path": rel, "transform_matrix": pose.tolist()}
                )
            meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
            with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
                json.dump(meta, f)
        with open(os.path.join("configs", "multi", f"scene_{k}.txt"), "w") as f:
            f.write(CONFIG_TMPL.format(k=k))
        print(f"scene {k+1}/{n_scenes}  ({time.time()-t0:.0f}s)", flush=True)
    print("wrote", n_scenes, "scenes")


if __name__ == "__main__":
    main()
