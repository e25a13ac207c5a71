"""Synthetic toy scenes (BASELINE.json config 1) for tests and benchmarks."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.camera import CameraParams, CameraStatic


def make_lookat_cameras(n_cams: int, fovx: float, fovy: float,
                        center=(0.0, 0.0, 6.0), radius: float = 6.0,
                        spread: float = 0.5, elev: float = 0.12):
    """Cameras on an arc with DISTINCT centers, all looking at `center`.

    Pure-rotation rigs (shared camera center) are degenerate for
    self-calibration — any radial remap can be absorbed by per-view
    homographies — so lens/pose recovery experiments need real parallax.
    Returns a list of CameraParams (w2c convention: X_cam = R X + t,
    t = -R C).
    """
    center = np.asarray(center, np.float64)
    cams = []
    for i in range(n_cams):
        a = spread * (i - (n_cams - 1) / 2) / max(n_cams - 1, 1) * 2
        b = elev * np.sin(1.7 * i)
        C = center + radius * np.array([np.sin(a), np.sin(b),
                                        -np.cos(a) * np.cos(b)])
        f = center - C
        f = f / np.linalg.norm(f)
        r = np.cross([0.0, 1.0, 0.0], f)
        r = r / np.linalg.norm(r)
        u = np.cross(f, r)
        R = np.stack([r, u, f]).astype(np.float32)
        t = (-R @ C.astype(np.float32)).astype(np.float32)
        cams.append(CameraParams.create(R, t, fovx, fovy))
    return cams


def make_toy_scene(n: int = 500, seed: int = 0, width: int = 64,
                   height: int = 64, sh_degree: int = 0, depth_range=(4.0, 8.0),
                   scale_range=(0.02, 0.12)):
    """Random Gaussians in a box in front of a camera at the origin looking +z."""
    rng = np.random.default_rng(seed)
    fovx = fovy = 0.8
    static = CameraStatic(width=width, height=height)
    extent_x = np.tan(fovx / 2) * depth_range[0]
    xyz = np.stack([
        rng.uniform(-extent_x, extent_x, n),
        rng.uniform(-extent_x, extent_x, n),
        rng.uniform(*depth_range, n),
    ], axis=-1).astype(np.float32)
    k = (sh_degree + 1) ** 2
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0, :] = rng.normal(0, 1.0, size=(n, 3))
    if k > 1:
        sh[:, 1:, :] = rng.normal(0, 0.1, size=(n, k - 1, 3))
    scales = np.exp(rng.uniform(np.log(scale_range[0]), np.log(scale_range[1]),
                                size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)

    cam = CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), fovx, fovy)
    return dict(
        xyz=jnp.asarray(xyz),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacity=jnp.asarray(opacity),
        sh_coeffs=jnp.asarray(sh),
        cam=cam,
        static=static,
        sh_degree=sh_degree,
    )
