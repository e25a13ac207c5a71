"""Novel-view camera trajectories for offline video rendering.

Capability parity with `/root/reference/render_trajectory/pose_math.py`
(:10-110) and the per-dataset trajectory scripts: LLFF-style look-at view
matrices, average pose, axis sweeps, spiral paths, plus orbit and
keyframe-interpolated (sequential) paths used by
`render_sequential_fisheye.py` and friends.

All generators return lists of (R_w2c, t_w2c) numpy pairs ready for
`CameraParams.create`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..core.camera import CameraParams


def _normalize(x):
    return x / np.linalg.norm(x)


def look_at_c2w(forward: np.ndarray, up: np.ndarray,
                pos: np.ndarray) -> np.ndarray:
    """LLFF `viewmatrix` (pose_math.py:13-19): orthonormal c2w basis from a
    forward (z) direction and an approximate up vector."""
    z = _normalize(forward)
    x = _normalize(np.cross(z, up))
    y = _normalize(np.cross(x, z))
    return np.stack([y, x, z, pos], axis=1)  # columns: right-ish basis, pos


def _c2w_to_w2c(c2w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    R_c2w = c2w[:3, :3]
    pos = c2w[:3, 3]
    R = R_c2w.T
    t = -R @ pos
    return R, t


def average_pose(c2ws: np.ndarray) -> np.ndarray:
    """`poses_avg` (pose_math.py:21-30): mean center, summed z/up."""
    center = c2ws[:, :3, 3].mean(axis=0)
    z = _normalize(c2ws[:, :3, 2].sum(axis=0))
    up = c2ws[:, :3, 0].sum(axis=0)
    return look_at_c2w(z, up, center)


def spiral_path(c2ws: np.ndarray, n_frames: int = 120, rots: float = 2.0,
                zrate: float = 0.5, focal: float = 1.0,
                rad_percentile: float = 90.0) -> List[Tuple[np.ndarray, np.ndarray]]:
    """`render_path_spiral` (pose_math.py:57-66) around the average pose,
    radii from the 90th percentile of camera offsets."""
    avg = average_pose(c2ws)
    up = _normalize(c2ws[:, :3, 0].sum(axis=0))
    offsets = np.einsum("ij,nj->ni", avg[:3, :3].T,
                        c2ws[:, :3, 3] - avg[:3, 3])
    rads = np.percentile(np.abs(offsets), rad_percentile, axis=0)
    out = []
    for theta in np.linspace(0, 2 * np.pi * rots, n_frames, endpoint=False):
        delta = np.array([-np.sin(theta), np.cos(theta),
                          -np.sin(theta * zrate)]) * rads
        c = avg[:3, 3] + avg[:3, :3] @ delta
        z = _normalize(c - (avg[:3, 3] + avg[:3, :3] @ np.array([0, 0, -focal])))
        out.append(_c2w_to_w2c(look_at_c2w(z, up, c)))
    return out


def orbit_path(center: np.ndarray, radius: float, height: float,
               n_frames: int = 120, up=(0.0, -1.0, 0.0)
               ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Circular orbit looking at `center` (the spherical paths of the
    trajectory scripts)."""
    up = np.asarray(up, np.float64)
    out = []
    for theta in np.linspace(0, 2 * np.pi, n_frames, endpoint=False):
        pos = center + np.array([radius * np.cos(theta), height,
                                 radius * np.sin(theta)])
        z = _normalize(center - pos)
        out.append(_c2w_to_w2c(look_at_c2w(z, up, pos)))
    return out


def wander_path(R_w2c: np.ndarray, t_w2c: np.ndarray, fovy: float,
                image_height: int, n_frames: int = 60,
                max_disp: float = 5000.0
                ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """In-place elliptical "wander" around ONE anchor view
    (`render_wander_path`, utils/pose_utils-style, used by the
    render_outside_*/render_sequential_* trajectory scripts): translation
    amplitude max_disp/focal, x full / y,z one-third, rotation fixed."""
    focal = image_height / (2.0 * np.tan(0.5 * fovy))
    max_trans = max_disp / focal
    # reference pose in its OpenGL-ish convention (y/z columns flipped)
    R = np.array(R_w2c, np.float64)
    R[:, 1] *= -1.0
    R[:, 2] *= -1.0
    T = -np.asarray(t_w2c, np.float64).reshape(3, 1)
    ref = np.concatenate([np.concatenate([R, T], axis=1),
                          np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    out = []
    for i in range(n_frames):
        ang = 2.0 * np.pi * i / n_frames
        trans = np.array([max_trans * np.sin(ang),
                          max_trans * np.cos(ang) / 3.0,
                          max_trans * np.cos(ang) / 3.0])
        i_pose = np.eye(4)
        i_pose[:3, 3] = trans
        render_pose = ref @ np.linalg.inv(i_pose)
        # back to the renderer's convention
        Rw = render_pose[:3, :3].copy()
        Rw[:, 1] *= -1.0
        Rw[:, 2] *= -1.0
        tw = -render_pose[:3, 3]
        out.append((Rw, tw))
    return out


def interpolate_path(cams: CameraParams, n_frames_per_segment: int = 10
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Smooth keyframe interpolation through the training cameras in order
    (the `render_sequential_*` scripts): slerp on rotations, linear on
    centers."""
    from ..core.camera import pose_w2c
    import jax

    R_all, t_all = pose_w2c(cams)
    R_all = np.asarray(R_all)
    t_all = np.asarray(t_all)
    centers = -np.einsum("nji,nj->ni", R_all, t_all)

    try:
        from scipy.spatial.transform import Rotation, Slerp
        key_rots = Rotation.from_matrix(R_all)
        times = np.arange(len(R_all))
        slerp = Slerp(times, key_rots)
    except ImportError:
        slerp = None

    out = []
    n = len(R_all)
    for i in range(n - 1):
        for s in np.linspace(0, 1, n_frames_per_segment, endpoint=False):
            c = (1 - s) * centers[i] + s * centers[i + 1]
            if slerp is not None:
                R = slerp(i + s).as_matrix()
            else:
                R = R_all[i] if s < 0.5 else R_all[i + 1]
            t = -R @ c
            out.append((R, t))
    out.append((R_all[-1], t_all[-1]))
    return out


def path_to_cameras(path: Sequence[Tuple[np.ndarray, np.ndarray]],
                    fovx: float, fovy: float) -> CameraParams:
    """Batch a pose path into CameraParams."""
    import jax
    import jax.numpy as jnp

    cams = [CameraParams.create(R.astype(np.float32), t.astype(np.float32),
                                fovx, fovy) for R, t in path]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
