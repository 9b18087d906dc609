"""Parity for the LLFF pose pipeline against the live reference.

The reference functions (load_llff.py:120-240) are the oracle: random pose
sets in, identical arrays out. This pins the numerics so geom/poses.py can
be structured in the repo's own idiom rather than transliterated.
"""

import numpy as np
import pytest

from nerf_tpu.geom import poses as P

ref_llff = pytest.importorskip("load_llff")


def _random_poses(n=9, seed=3, with_hwf=True):
    """[n, 3, 5] LLFF-layout poses: random-ish c2ws + hwf column."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        # a proper rotation (QR of a random matrix, det fixed up) + translation
        q, _r = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.uniform(-2, 2, (3, 1))
        hwf = np.array([[480.0], [640.0], [500.0]])
        out.append(np.concatenate([q, t, hwf] if with_hwf else [q, t], 1))
    return np.stack(out, 0)


def test_viewmatrix_parity():
    rng = np.random.default_rng(0)
    for _ in range(5):
        z, up, pos = rng.standard_normal((3, 3))
        np.testing.assert_allclose(
            P.viewmatrix(z, up, pos), ref_llff.viewmatrix(z, up, pos), rtol=1e-12
        )


def test_poses_avg_parity():
    poses = _random_poses()
    np.testing.assert_allclose(
        P.poses_avg(poses), ref_llff.poses_avg(poses), rtol=1e-12
    )


def test_recenter_parity():
    poses = _random_poses()
    np.testing.assert_allclose(
        P.recenter_poses(poses.copy()),
        ref_llff.recenter_poses(poses.copy()),
        rtol=1e-9,
        atol=1e-12,
    )


def test_spiral_path_parity():
    poses = _random_poses()
    c2w = P.poses_avg(poses)
    up = P.normalize(poses[:, :3, 1].sum(0))
    rads = np.array([0.4, 0.3, 0.2])
    ours = np.stack(
        P.render_path_spiral(c2w, up, rads, focal=1.2, zdelta=0.1, zrate=0.5,
                             rots=2, N=30),
        0,
    )
    theirs = np.stack(
        ref_llff.render_path_spiral(c2w, up, rads, focal=1.2, zdelta=0.1,
                                    zrate=0.5, rots=2, N=30),
        0,
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_spherify_parity():
    poses = _random_poses(n=12, seed=11)
    bds = np.abs(np.random.default_rng(1).uniform(1.0, 8.0, (12, 2)))
    p1, n1, b1 = P.spherify_poses(poses.copy(), bds.copy())
    p2, n2, b2 = ref_llff.spherify_poses(poses.copy(), bds.copy())
    np.testing.assert_allclose(p1, p2, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(b1, b2, rtol=1e-9, atol=1e-12)
