"""EWA projection of 3D Gaussians to screen space (the "preprocess" stage).

This is the differentiable-geometry half of the reference's CUDA rasterizer
(`3dgs-pose` fork of diff-gaussian-rasterization, `cuda_rasterizer/forward.cu`
preprocess; API reconstructed in SURVEY.md §2.3). It is deliberately pure jnp:
XLA vectorizes it over all N Gaussians, and — the defining feature of the
reference — JAX autodiff chains pixel gradients through it to the camera
quaternion/translation/FoV parameters, replacing the CUDA backward's
∂viewmatrix/∂projmatrix/∂campos path.

Standard 3DGS math, re-derived:
  * view point   t = R_w2c p + t_w2c ; frustum cull at t.z <= 0.2
  * 3D covariance Σ = (R S)(R S)^T from quaternion + exp(log-scales)
  * perspective Jacobian J (with the 1.3*tan(fov/2) clamping of x/z, y/z)
  * 2D covariance cov2d = J W Σ W^T J^T + 0.3 I  (dilation low-pass)
  * conic = inverse of cov2d; radius = ceil(3 sqrt(λ_max))
  * pixel center via full projection and ndc2Pix: ((ndc+1)*S - 1)/2
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import sh as sh_lib
from .camera import (CameraParams, CameraStatic, GlobalAlignment, camera_center,
                     focals, pose_w2c, projection_matrix)
from .lie import quat_to_rotmat

# Matches the CUDA rasterizer's constants.
FRUSTUM_NEAR = 0.2
DILATION = 0.3
RADIUS_SIGMA = 3.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Projected:
    """Per-Gaussian screen-space quantities (all (N, ...))."""

    mean2d: jnp.ndarray    # (N, 2) pixel coordinates
    depth: jnp.ndarray     # (N,)   view-space z (sort key)
    conic: jnp.ndarray     # (N, 3) upper triangle of inverse 2D covariance
    radius: jnp.ndarray    # (N,)   int32 pixel radius (0 => culled)
    color: jnp.ndarray     # (N, 3) RGB from SH (+ optional specular offset)
    opacity: jnp.ndarray   # (N,)   activated opacity in [0, 1)


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """Σ = (R S)(R S)^T, returns full (N, 3, 3).

    Semantics of `build_scaling_rotation` + L L^T
    (`scene/gaussian_model.py:28-32`, `utils/general_utils.py:154-163`).
    """
    s00, s01, s02, s11, s12, s22 = _covariance_entries(
        scales, quats, scale_modifier)
    row0 = jnp.stack([s00, s01, s02], axis=-1)
    row1 = jnp.stack([s01, s11, s12], axis=-1)
    row2 = jnp.stack([s02, s12, s22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _covariance_entries(scales, quats, scale_modifier=1.0):
    """The 6 unique entries of Σ = (R S)(R S)^T, fully elementwise.

    XLA lowers batched (N, 3, 3) @ (N, 3, 3) products as N tiny matmuls
    padded onto the MXU — catastrophically slow. Expanding Σ_ij = Σ_k
    M_ik M_jk with M = R * s elementwise keeps everything on the VPU.
    """
    R = quat_to_rotmat(quats)                          # (N, 3, 3)
    M = R * (scale_modifier * scales)[..., None, :]    # R @ diag(s)
    m0, m1, m2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]  # rows, (N, 3)

    def dot3(a, b):
        return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
                + a[..., 2] * b[..., 2])

    return (dot3(m0, m0), dot3(m0, m1), dot3(m0, m2),
            dot3(m1, m1), dot3(m1, m2), dot3(m2, m2))


def project_gaussians(
    xyz: jnp.ndarray,          # (N, 3) world means
    scales: jnp.ndarray,       # (N, 3) activated (exp'd) scales
    quats: jnp.ndarray,        # (N, 4) unnormalized rotations
    opacity: jnp.ndarray,      # (N,) activated opacity
    sh_coeffs: jnp.ndarray,    # (N, K, 3) SH features (DC first)
    cam: CameraParams,
    static: CameraStatic,
    sh_degree: int,
    align: Optional[GlobalAlignment] = None,
    scale_modifier: float = 1.0,
    extra_color: Optional[jnp.ndarray] = None,   # e.g. specular MLP output
    shift_factors: Optional[jnp.ndarray] = None,  # (3,) entrance-pupil shift
    cov3d_precomp: Optional[jnp.ndarray] = None,  # (N, 3, 3) overrides scales/quats
) -> Projected:
    """Differentiable EWA projection of all Gaussians for one camera.

    Gradients flow to every input, including `cam` (pose + FoV): this is the
    bundle-adjustment path (reference: CUDA backward returning
    ∂L/∂viewmatrix/∂projmatrix/∂campos, SURVEY.md §2.3).

    Precision note: TPU's default matmul mode evaluates f32 contractions in
    bf16 passes, which degrades the pose-gradient chain to ~1-10% relative
    error. These (N,3)x(3,3)-class matmuls are trivial FLOPs, so the whole
    projection runs under full-f32 matmul precision (verified to bring TPU
    pose grads to ~1e-4 of a float64 oracle).
    """
    with jax.default_matmul_precision("float32"):
        return _project_gaussians_impl(
            xyz, scales, quats, opacity, sh_coeffs, cam, static, sh_degree,
            align, scale_modifier, extra_color, shift_factors, cov3d_precomp)


def _project_gaussians_impl(
    xyz, scales, quats, opacity, sh_coeffs, cam, static, sh_degree,
    align=None, scale_modifier=1.0, extra_color=None, shift_factors=None,
    cov3d_precomp=None,
) -> Projected:
    R_w2c, t_w2c = pose_w2c(cam, align)

    # --- view space -------------------------------------------------------
    t_view = xyz @ R_w2c.T + t_w2c  # (N, 3)
    depth = t_view[:, 2]
    in_front = depth > FRUSTUM_NEAR

    # Entrance-pupil shift (fork extension, applied in-kernel in the CUDA
    # rasterizer; `train.py:124-126`): shift the view-space point by
    # shift_factors scaled with inverse depth before projection.
    if shift_factors is not None:
        inv_d = 1.0 / jnp.clip(depth, 1e-6)
        t_view = t_view + shift_factors[None, :] * inv_d[:, None]

    # --- pixel projection -------------------------------------------------
    P = projection_matrix(cam.fovx, cam.fovy, static.znear, static.zfar)
    clip = t_view @ P[:3, :3].T + P[:3, 3]
    w_clip = t_view @ P[3, :3].T + P[3, 3]
    ndc = clip / (w_clip[:, None] + 1e-7)
    # ndc2Pix from the CUDA rasterizer: ((v + 1) * S - 1) * 0.5
    mean2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * static.width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * static.height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # --- 2D covariance (EWA) ---------------------------------------------
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_covariance(scales, quats, scale_modifier)
    fx, fy = focals(cam, static)
    tz = jnp.clip(depth, 1e-6)
    limx = 1.3 * jnp.tan(cam.fovx * 0.5)
    limy = 1.3 * jnp.tan(cam.fovy * 0.5)
    txz = jnp.clip(t_view[:, 0] / tz, -limx, limx)
    tyz = jnp.clip(t_view[:, 1] / tz, -limy, limy)

    # J rows of d(fx x/z, fy y/z)/d(x,y,z), evaluated at clamped x/z, y/z.
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([fx / tz, zeros, -fx * txz / tz], axis=-1),
            jnp.stack([zeros, fy / tz, -fy * tyz / tz], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    JW = J @ R_w2c  # (N, 2, 3)
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # (N, 2, 2)
    c00 = cov2d[:, 0, 0] + DILATION
    c01 = cov2d[:, 0, 1]
    c11 = cov2d[:, 1, 1] + DILATION

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    # --- radius & validity ------------------------------------------------
    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    valid = in_front & (det > 0) & (opacity > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # --- color from SH ----------------------------------------------------
    campos = camera_center(cam, align)
    dirs = xyz - campos[None, :]
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    # sh_coeffs (N, K, 3) -> eval wants (..., C, K)
    color = sh_lib.sh_to_rgb(sh_degree, jnp.swapaxes(sh_coeffs, -1, -2), dirs)
    if extra_color is not None:
        color = color + extra_color

    return Projected(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        color=color,
        opacity=jnp.where(valid, opacity, 0.0),
    )


def distance_to_camera(xyz: jnp.ndarray, cam: CameraParams,
                       align: Optional[GlobalAlignment] = None) -> jnp.ndarray:
    """Euclidean distance sort key — the fork's cubemap sort-by-distance
    variant (README.md:126) instead of view-space z."""
    c = camera_center(cam, align)
    return jnp.linalg.norm(xyz - c[None, :], axis=-1)
