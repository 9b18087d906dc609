"""Generate a procedural scene in LINEMOD dataset format.

Writes data/linemod_synth/ with the exact layout the reference's
load_LINEMOD_data expects (ref load_LINEMOD.py:37-93): per-split
transforms_{train,val,test}.json whose frames carry a full per-frame
``intrinsic_matrix`` K plus json ``near``/``far``, and the referenced PNGs.
`--dataset_type LINEMOD` then trains on it through the stock loader,
exercising the json-K intrinsics path and the near/far floor/ceil policy
end-to-end. Ground truth is the analytic ellipsoid field (data/synth.py).
Deterministic (seed 11).

    python tools/make_linemod_scene.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_tpu.data.synth import make_field, render_gt_image
from nerf_tpu.geom.poses import pose_spherical

RES = 400
FOCAL = 520.0  # ~42 deg fov at 400px
COUNTS = {"train": 30, "val": 6, "test": 6}


def main():
    out = os.path.join("data", "linemod_synth")
    fp = make_field(seed=11)
    rng = np.random.default_rng(111)
    K = [[FOCAL, 0.0, RES / 2], [0.0, FOCAL, RES / 2], [0.0, 0.0, 1.0]]
    t0 = time.time()
    import imageio.v2 as imageio

    for split, n in COUNTS.items():
        frames = []
        os.makedirs(os.path.join(out, split), exist_ok=True)
        for i in range(n):
            theta = rng.uniform(-180.0, 180.0)
            phi = rng.uniform(-80.0, -10.0)
            pose = np.asarray(pose_spherical(theta, phi, 4.0))
            img = render_gt_image(fp, RES, RES, FOCAL, pose)
            rel = f"./{split}/r_{i}.png"
            imageio.imwrite(
                os.path.join(out, split, f"r_{i}.png"),
                (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8),
            )
            frames.append({
                "file_path": rel,
                "transform_matrix": pose.tolist(),
                "intrinsic_matrix": K,
            })
            print(f"{split} {i+1}/{n}  ({time.time()-t0:.0f}s)", flush=True)
        meta = {"frames": frames, "near": 2.0, "far": 6.0}
        with open(os.path.join(out, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
