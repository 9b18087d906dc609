"""Config parsing (reference preset compatibility) and dataset loaders."""

import json
import os

import numpy as np
import pytest

from nerf_tpu.config import NeRFConfig, dump_config, load_config, parse_config_file
from tests.synthetic_scene import write_blender_dataset

REPO_CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
REF_CONFIGS = "/root/reference/configs"


def test_shipped_presets_parse():
    names = sorted(
        n for n in os.listdir(REPO_CONFIGS) if n.endswith(".txt")
    )  # configs/multi/ (sweep variants) are tested via the sweep itself
    # the reference's 16 + synth/synthff/synth_dv/synth_linemod benchmarks
    assert len(names) == 20
    for n in names:
        cfg = load_config(["--config", os.path.join(REPO_CONFIGS, n)])
        assert cfg.N_rand == 1024
        assert cfg.use_viewdirs
        if cfg.dataset_type == "blender":
            assert cfg.N_importance == 128 and cfg.white_bkgd and cfg.no_batching
            assert not cfg.ndc
        elif cfg.dataset_type == "deepvoxels":
            assert cfg.shape == "greek_synth" and cfg.white_bkgd
            assert not cfg.ndc
        elif cfg.dataset_type == "LINEMOD":
            assert cfg.white_bkgd and cfg.no_batching
            assert not cfg.ndc
        else:
            assert cfg.dataset_type == "llff"
            assert cfg.N_importance == 64 and cfg.raw_noise_std == 1.0
            assert cfg.ndc


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
def test_reference_preset_files_parse_directly():
    """The REFERENCE's own config files must drive this framework unchanged."""
    cfg = load_config(["--config", os.path.join(REF_CONFIGS, "lego.txt")])
    assert cfg.expname == "blender_paper_lego"
    assert cfg.N_importance == 128 and cfg.half_res and cfg.precrop_iters == 500
    cfg = load_config(["--config", os.path.join(REF_CONFIGS, "fern.txt")])
    assert cfg.dataset_type == "llff" and cfg.factor == 8
    assert cfg.raw_noise_std == 1.0  # parses "1e0"


def test_cli_overrides_file():
    path = os.path.join(REPO_CONFIGS, "lego.txt")
    cfg = load_config(["--config", path, "--N_rand", "4096", "--half_res", "False"])
    assert cfg.N_rand == 4096
    assert cfg.half_res is False  # CLI False overrides file True


def test_dump_roundtrip(tmp_path):
    cfg = NeRFConfig(expname="x", N_importance=64)
    text = dump_config(cfg)
    p = tmp_path / "args.txt"
    p.write_text(text)
    parsed = parse_config_file(str(p))
    assert parsed["expname"] == "x"
    assert parsed["N_importance"] == 64


def test_blender_loader_end_to_end(tmp_path):
    """Write a blender-format dataset to disk, load through the real loader."""
    from nerf_tpu.data.blender import load_blender_scene

    basedir = write_blender_dataset(str(tmp_path), n_train=3, n_val=2, n_test=2)
    scene = load_blender_scene(basedir, half_res=False, testskip=1, white_bkgd=True)
    assert scene.images.shape == (7, 32, 32, 3)
    assert scene.images.dtype == np.float32
    assert list(scene.i_train) == [0, 1, 2]
    assert list(scene.i_test) == [5, 6]
    assert scene.near == 2.0 and scene.far == 6.0
    assert scene.render_poses.shape[0] == 40
    # white-background compositing: border pixels ~ white
    assert scene.images[0, 0, 0].mean() > 0.95


def test_blender_loader_half_res(tmp_path):
    from nerf_tpu.data.blender import load_blender_scene

    basedir = write_blender_dataset(str(tmp_path), n_train=2, n_val=1, n_test=1)
    full = load_blender_scene(basedir, half_res=False)
    half = load_blender_scene(basedir, half_res=True)
    assert half.H == full.H // 2 and half.W == full.W // 2
    assert abs(half.focal - full.focal / 2) < 1e-6
    # area downsample preserves mean
    assert abs(half.images.mean() - full.images.mean()) < 0.02


def test_blender_testskip(tmp_path):
    from nerf_tpu.data.blender import load_blender_scene

    basedir = write_blender_dataset(str(tmp_path), n_train=2, n_val=4, n_test=4)
    s1 = load_blender_scene(basedir, testskip=2)
    assert len(s1.i_val) == 2 and len(s1.i_test) == 2


def test_llff_loader_synthetic(tmp_path):
    """Synthesize an LLFF dataset (poses_bounds.npy + images/) and load it."""
    import imageio.v2 as imageio

    from nerf_tpu.data.llff import load_llff_scene

    n, H, W, f = 6, 24, 32, 30.0
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "images")
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        # forward-facing-ish cameras near z=4 looking at origin
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 4 + rng.uniform(-0.1, 0.1)]
        # llff disk convention: [down, right, back] columns + hwf in col 4
        m = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:3], c2w[:, 3:4],
             np.array([[H], [W], [f]])], 1
        )
        poses_bounds[i, :15] = m.reshape(-1)
        poses_bounds[i, 15:] = [2.0, 6.0]
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        imageio.imwrite(str(tmp_path / "images" / f"im{i:02d}.png"), img)
    np.save(tmp_path / "poses_bounds.npy", poses_bounds)

    scene = load_llff_scene(str(tmp_path), factor=1, llffhold=3, no_ndc=False)
    assert scene.images.shape == (n, H, W, 3)
    assert scene.near == 0.0 and scene.far == 1.0  # NDC bounds
    assert list(scene.i_test) == [0, 3]
    assert scene.render_poses.shape[1:] == (3, 4)
    assert np.isfinite(scene.poses).all()

    scene2 = load_llff_scene(str(tmp_path), factor=1, llffhold=3, no_ndc=True)
    assert scene2.near > 0  # bds-derived

    # factor-2 minify path (in-process downsampler, cached in images_2/)
    scene3 = load_llff_scene(str(tmp_path), factor=2, llffhold=3)
    assert scene3.images.shape == (n, H // 2, W // 2, 3)
    assert os.path.isdir(tmp_path / "images_2")


def test_linemod_loader(tmp_path):
    import imageio.v2 as imageio

    from nerf_tpu.data.linemod import load_linemod_scene

    rng = np.random.default_rng(0)
    K = [[35.0, 0, 16], [0, 35.0, 16], [0, 0, 1]]
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            rel = f"./{split}/r_{i}.png"
            imageio.imwrite(
                str(tmp_path / split / f"r_{i}.png"),
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
            )
            pose = np.eye(4)
            pose[2, 3] = 4.0
            frames.append(
                {
                    "file_path": rel[:],
                    "transform_matrix": pose.tolist(),
                    "intrinsic_matrix": K,
                }
            )
        meta = {"frames": frames, "near": 1.2, "far": 6.8}
        (tmp_path / f"transforms_{split}.json").write_text(json.dumps(meta))

    scene = load_linemod_scene(str(tmp_path), testskip=1)
    assert scene.images.shape == (7, 32, 32, 3)
    assert scene.near == 1.0 and scene.far == 7.0  # floor/ceil
    assert scene.K[0, 0] == 35.0


def test_deepvoxels_loader(tmp_path):
    import imageio.v2 as imageio

    from nerf_tpu.data.deepvoxels import load_deepvoxels_scene

    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("validation", 2), ("test", 2)]:
        base = tmp_path / split / "greek"
        os.makedirs(base / "pose")
        os.makedirs(base / "rgb")
        if split == "train":
            (base / "intrinsics.txt").write_text(
                "280.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n0\n"
            )
        for i in range(n):
            pose = np.eye(4)
            pose[2, 3] = 2.5
            (base / "pose" / f"{i:03d}.txt").write_text(
                " ".join(str(x) for x in pose.reshape(-1))
            )
            imageio.imwrite(
                str(base / "rgb" / f"{i:03d}.png"),
                rng.integers(0, 255, (512, 512, 3), dtype=np.uint8),
            )
    scene = load_deepvoxels_scene(str(tmp_path), "greek", testskip=1)
    assert scene.images.shape == (7, 512, 512, 3)
    assert scene.H == 512
    # hemisphere near/far: radius 2.5 -> (1.5, 3.5)
    assert abs(scene.near - 1.5) < 1e-5 and abs(scene.far - 3.5) < 1e-5


def test_backdrop_field_covers_frustum():
    """make_field(backdrop=True): every forward-facing ray must terminate on
    content (the property whose absence collapsed the v1 synthff scene to a
    16.7 dB white-haze fit — CONVERGENCE.md)."""
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.data.synth import make_field, render_gt_rays

    fp = make_field(seed=0, backdrop=True)
    fp_plain = make_field(seed=0)
    assert fp.centers.shape[0] > fp_plain.centers.shape[0]
    # the blender benchmark field must be bit-stable under the new flag
    np.testing.assert_array_equal(
        fp.centers[: fp_plain.centers.shape[0]], fp_plain.centers
    )

    # rays across the frustum from a synthff-like camera: with the backdrop
    # the accumulated opacity must be ~1 everywhere (content on every ray)
    rng = np.random.default_rng(0)
    n = 64
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (n, 1))
    dirs = np.stack([
        rng.uniform(-0.55, 0.55, n), rng.uniform(-0.42, 0.42, n),
        -np.ones(n),
    ], -1).astype(np.float32)
    img = render_gt_rays(fp, jnp.asarray(ro), jnp.asarray(dirs),
                         near=2.0, far=6.0, n_samples=256)
    # render_gt_rays returns img + (1-acc); recompute acc via a black probe:
    # a fully-covered frustum means the white-background term adds ~nothing,
    # so rendering the same rays twice with/without content must differ from
    # pure white
    assert np.asarray(img).min() < 0.9  # textured wall, not white haze
    # and the plain field leaves most rays empty by design
    img_plain = render_gt_rays(fp_plain, jnp.asarray(ro), jnp.asarray(dirs),
                               near=2.0, far=6.0, n_samples=256)
    assert float(np.mean(np.all(np.asarray(img_plain) > 0.999, -1))) > 0.3


def test_spherify_end_to_end_train_smoke(tmp_path):
    """VERDICT r3 #10: the spherified 360-degree path (ref load_llff.py:
    184-240) gets an end-to-end run — synthesize an inward-facing circular
    capture on disk, load with spherify=True, and drive train() for a few
    steps (tiny model, jnp path). spherify_poses itself is parity-pinned in
    tests/test_poses.py; this covers loader -> driver integration."""
    import dataclasses

    import imageio.v2 as imageio
    import jax

    from nerf_tpu.config import NeRFConfig
    from nerf_tpu.data.llff import load_llff_scene
    from nerf_tpu.train.loop import train

    n, H, W, f = 8, 20, 24, 22.0
    rng = np.random.default_rng(7)
    os.makedirs(tmp_path / "images")
    poses_bounds = np.zeros((n, 17))
    up = np.array([0.0, 0.0, 1.0])
    for i in range(n):
        th = 2 * np.pi * i / n
        p = np.array([4 * np.cos(th), 4 * np.sin(th), 0.6])
        z = p / np.linalg.norm(p)  # camera 'back' points away from origin
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, p], 1)
        m = np.concatenate(
            [-c2w[:, 1:2], c2w[:, 0:1], c2w[:, 2:3], c2w[:, 3:4],
             np.array([[H], [W], [f]])], 1
        )
        poses_bounds[i, :15] = m.reshape(-1)
        poses_bounds[i, 15:] = [2.0, 6.0]
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        imageio.imwrite(str(tmp_path / "images" / f"im{i:02d}.png"), img)
    np.save(tmp_path / "poses_bounds.npy", poses_bounds)

    scene = load_llff_scene(
        str(tmp_path), factor=1, spherify=True, llffhold=4, no_ndc=True
    )
    assert scene.images.shape == (n, H, W, 3)
    assert np.isfinite(scene.poses).all()
    assert np.isfinite(scene.render_poses).all()
    assert scene.near > 0 and scene.far > scene.near

    cfg = NeRFConfig(
        expname="spherify_smoke", basedir=str(tmp_path / "logs"),
        dataset_type="llff", spherify=True, no_ndc=True, factor=1,
        llffhold=4, netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=2, multires_views=1, use_viewdirs=True,
        N_rand=32, N_samples=8, N_importance=8, lindisp=False,
        i_print=5, i_img=0, i_weights=0, i_testset=0, i_video=0,
        n_iters=10, compute_dtype="float32", data_axis=1, donate_state=False,
    )
    assert not cfg.ndc  # llff + no_ndc
    result = train(cfg, scene=scene)
    assert len(result.history) == 2
    assert all(np.isfinite(l) for _, l, _ in result.history)


def _tiny_dv_tree(tmp_path, res=64):
    """A small on-disk DeepVoxels-layout scene (hemisphere poses, random
    images). res < 512 works because the pngs carry their own size; the
    LOADER still reports H = W = 512 (hardcoded, like the reference's
    load_deepvoxels.py) — callers that train must use res=512 or accept the
    mismatch. For train smokes we write real 512 images but few of them."""
    import imageio.v2 as imageio

    from nerf_tpu.geom.poses import pose_spherical

    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    rng = np.random.default_rng(5)
    for split, n in [("train", 3), ("validation", 2), ("test", 2)]:
        base = tmp_path / split / "greek"
        os.makedirs(base / "pose", exist_ok=True)
        os.makedirs(base / "rgb", exist_ok=True)
        if split == "train":
            (base / "intrinsics.txt").write_text(
                "280.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n0\n"
            )
        for i in range(n):
            pose = np.asarray(
                pose_spherical(rng.uniform(-180, 180), rng.uniform(-80, -10), 2.5)
            )
            (base / "pose" / f"{i:03d}.txt").write_text(
                " ".join(str(x) for x in (pose @ flip).reshape(-1))
            )
            imageio.imwrite(
                str(base / "rgb" / f"{i:03d}.png"),
                rng.integers(0, 255, (res, res, 3), dtype=np.uint8),
            )


def test_deepvoxels_end_to_end_train_smoke(tmp_path):
    """VERDICT r4 #2 (test half): drive the FULL train() through
    dataset_type=deepvoxels — hemisphere near/far policy (ref
    run_nerf.py:602-604), pose flip, testskip, and the batched sampler all
    exercised via load_scene dispatch, not a hand-built Scene."""
    from nerf_tpu.config import NeRFConfig
    from nerf_tpu.train.loop import train

    _tiny_dv_tree(tmp_path, res=512)
    cfg = NeRFConfig(
        expname="dv_smoke", basedir=str(tmp_path / "logs"),
        dataset_type="deepvoxels", shape="greek", datadir=str(tmp_path),
        testskip=1, netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=2, multires_views=1, use_viewdirs=True, white_bkgd=True,
        N_rand=32, N_samples=8, N_importance=8,
        i_print=5, i_img=0, i_weights=0, i_testset=0, i_video=0,
        n_iters=10, compute_dtype="float32", data_axis=1, donate_state=False,
    )
    result = train(cfg)  # scene comes from load_scene (the dispatch itself)
    assert len(result.history) == 2
    assert all(np.isfinite(l) for _, l, _ in result.history)
    # hemisphere policy: radius 2.5 -> near/far (1.5, 3.5) went through
    from nerf_tpu.train.loop import load_scene

    s = load_scene(cfg)
    assert abs(s.near - 1.5) < 1e-5 and abs(s.far - 3.5) < 1e-5


def test_linemod_end_to_end_train_smoke(tmp_path):
    """VERDICT r4 #2 (test half), LINEMOD: full train() through
    dataset_type=LINEMOD — json intrinsic_matrix K, json near/far
    floor/ceil (ref load_LINEMOD.py:80-85), via load_scene dispatch."""
    import imageio.v2 as imageio
    import json as _json

    from nerf_tpu.config import NeRFConfig
    from nerf_tpu.train.loop import train

    rng = np.random.default_rng(0)
    K = [[35.0, 0, 16], [0, 35.0, 16], [0, 0, 1]]
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            rel = f"./{split}/r_{i}.png"
            imageio.imwrite(
                str(tmp_path / split / f"r_{i}.png"),
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
            )
            pose = np.asarray(np.eye(4))
            pose[2, 3] = 4.0
            frames.append({
                "file_path": rel, "transform_matrix": pose.tolist(),
                "intrinsic_matrix": K,
            })
        meta = {"frames": frames, "near": 1.2, "far": 6.8}
        (tmp_path / f"transforms_{split}.json").write_text(_json.dumps(meta))

    cfg = NeRFConfig(
        expname="linemod_smoke", basedir=str(tmp_path / "logs"),
        dataset_type="LINEMOD", datadir=str(tmp_path), testskip=1,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=2, multires_views=1, use_viewdirs=True,
        N_rand=32, N_samples=8, N_importance=8,
        i_print=5, i_img=0, i_weights=0, i_testset=0, i_video=0,
        n_iters=10, compute_dtype="float32", data_axis=1, donate_state=False,
    )
    result = train(cfg)
    assert len(result.history) == 2
    assert all(np.isfinite(l) for _, l, _ in result.history)
