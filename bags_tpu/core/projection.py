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

TPU-first layout (the perf-defining choice): the whole pipeline is
structure-of-arrays — every per-Gaussian quantity is a flat (N,) vector and
every op is (N,)-elementwise, so the VPU runs at full 128-lane utilization.
The (N, 3)/(N, 2)/(N, 3, 3) array-of-structs forms XLA would otherwise keep
(3 of 128 lanes used, batched 3x3 matmuls padded onto the 128x128 MXU) run
an order of magnitude slower. The per-camera 3x3/4x4 matrices are unpacked
into scalars once and broadcast.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import sh as sh_lib
from .camera import (CameraParams, CameraStatic, GlobalAlignment, camera_center,
                     focals, pose_w2c, projection_matrix)
from .lie import quat_normalize

# Matches the CUDA rasterizer's constants.
FRUSTUM_NEAR = 0.2
DILATION = 0.3
RADIUS_SIGMA = 3.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Projected:
    """Per-Gaussian screen-space quantities, structure-of-arrays (all (N,))."""

    x2d: jnp.ndarray       # pixel x
    y2d: jnp.ndarray       # pixel y
    depth: jnp.ndarray     # view-space z (sort key)
    conic_a: jnp.ndarray   # inverse 2D covariance upper triangle
    conic_b: jnp.ndarray
    conic_c: jnp.ndarray
    col_r: jnp.ndarray     # RGB from SH (+ optional specular offset)
    col_g: jnp.ndarray
    col_b: jnp.ndarray
    opacity: jnp.ndarray   # activated opacity in [0, 1), 0 when culled
    radius: jnp.ndarray    # int32 pixel radius (0 => culled)
    # Opacity-aware PER-AXIS binning extents: a pixel can pass the
    # compositor's `alpha >= 1/255` test only if |dx| <= sqrt(2 ln(255 a))
    # * sqrt(cov2d_xx) (the ellipse's axis-aligned bounding box; same bound
    # per axis), so tiles outside the AABB can be culled with EXACT render
    # parity — ~20-30% fewer tile instances than the reference's square
    # ceil(3 sigma_max) rect for anisotropic/low-opacity populations.
    # `radius` itself stays the reference's ceil(3 sigma) (densify stats
    # parity: gaussian_model.py max_radii2D).
    rect_rx: jnp.ndarray = None  # int32, <= radius
    rect_ry: jnp.ndarray = None  # int32, <= radius

    # Array-of-structs views for tests / visualization (not the hot path).
    @property
    def mean2d(self) -> jnp.ndarray:
        return jnp.stack([self.x2d, self.y2d], axis=-1)

    @property
    def conic(self) -> jnp.ndarray:
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], axis=-1)

    @property
    def color(self) -> jnp.ndarray:
        return jnp.stack([self.col_r, self.col_g, self.col_b], axis=-1)


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """Σ = (R S)(R S)^T, returns full (N, 3, 3).

    Semantics of `build_scaling_rotation` + L L^T
    (`scene/gaussian_model.py:28-32`, `utils/general_utils.py:154-163`).
    """
    s00, s01, s02, s11, s12, s22 = _covariance_entries(
        scales[..., 0], scales[..., 1], scales[..., 2], quats, scale_modifier)
    row0 = jnp.stack([s00, s01, s02], axis=-1)
    row1 = jnp.stack([s01, s11, s12], axis=-1)
    row2 = jnp.stack([s02, s12, s22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _rotmat_entries(quats):
    """Rotation-matrix entries from (N, 4) quaternions, as 9 flat (N,) arrays."""
    q = quat_normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def _covariance_entries(sx, sy, sz, quats, scale_modifier=1.0):
    """The 6 unique entries of Σ = (R S)(R S)^T, fully elementwise (N,).

    XLA lowers batched (N, 3, 3) @ (N, 3, 3) products as N tiny matmuls
    padded onto the MXU — catastrophically slow. Expanding Σ_ij = Σ_k
    M_ik M_jk with M = R * s elementwise keeps everything on the VPU.
    """
    R = _rotmat_entries(quats)
    sx = scale_modifier * sx
    sy = scale_modifier * sy
    sz = scale_modifier * sz
    m = [[R[i][0] * sx, R[i][1] * sy, R[i][2] * sz] for i in range(3)]

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    return (dot3(m[0], m[0]), dot3(m[0], m[1]), dot3(m[0], m[2]),
            dot3(m[1], m[1]), dot3(m[1], m[2]), dot3(m[2], m[2]))


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
    error. The projection is elementwise (no matmuls) except the few 3x3
    camera-matrix products, which run under full-f32 matmul precision
    (verified to bring TPU pose grads to ~1e-4 of a float64 oracle).
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
    # Unpack camera matrices to broadcast scalars once; all heavy math below
    # is (N,)-elementwise.
    r = [[R_w2c[i, j] for j in range(3)] for i in range(3)]
    wx, wy, wz = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    # --- view space -------------------------------------------------------
    tx = r[0][0] * wx + r[0][1] * wy + r[0][2] * wz + t_w2c[0]
    ty = r[1][0] * wx + r[1][1] * wy + r[1][2] * wz + t_w2c[1]
    tz = r[2][0] * wx + r[2][1] * wy + r[2][2] * wz + t_w2c[2]
    depth = tz
    in_front = depth > FRUSTUM_NEAR

    # Entrance-pupil shift (fork extension, applied in-kernel in the CUDA
    # rasterizer; `train.py:124-126`): shift the view-space point by
    # shift_factors scaled with inverse depth before projection.
    if shift_factors is not None:
        inv_d = 1.0 / jnp.clip(depth, 1e-6)
        tx = tx + shift_factors[0] * inv_d
        ty = ty + shift_factors[1] * inv_d
        tz = tz + shift_factors[2] * inv_d

    # --- pixel projection -------------------------------------------------
    P = projection_matrix(cam.fovx, cam.fovy, static.znear, static.zfar)
    # Symmetric frustum: P[0] = (1/tan(fx/2), 0, 0, 0); P[1] likewise;
    # w_clip = z (P[3] = [0,0,1,0]).
    clip_x = P[0, 0] * tx
    clip_y = P[1, 1] * ty
    w_clip = tz + 1e-7
    # ndc2Pix from the CUDA rasterizer: ((v + 1) * S - 1) * 0.5
    x2d = ((clip_x / w_clip + 1.0) * static.width - 1.0) * 0.5
    y2d = ((clip_y / w_clip + 1.0) * static.height - 1.0) * 0.5

    # --- 2D covariance (EWA) ---------------------------------------------
    if cov3d_precomp is not None:
        s00 = cov3d_precomp[:, 0, 0]
        s01 = cov3d_precomp[:, 0, 1]
        s02 = cov3d_precomp[:, 0, 2]
        s11 = cov3d_precomp[:, 1, 1]
        s12 = cov3d_precomp[:, 1, 2]
        s22 = cov3d_precomp[:, 2, 2]
    else:
        s00, s01, s02, s11, s12, s22 = _covariance_entries(
            scales[:, 0], scales[:, 1], scales[:, 2], quats, scale_modifier)
    fx, fy = focals(cam, static)
    tzc = jnp.clip(depth, 1e-6)
    limx = 1.3 * jnp.tan(cam.fovx * 0.5)
    limy = 1.3 * jnp.tan(cam.fovy * 0.5)
    txz = jnp.clip(tx / tzc, -limx, limx)
    tyz = jnp.clip(ty / tzc, -limy, limy)

    # Rows of J = d(fx x/z, fy y/z)/d(x,y,z) evaluated at clamped x/z, y/z,
    # then JW = J @ R_w2c — two (N,) 3-vectors expressed elementwise.
    inv_z = 1.0 / tzc
    j00, j02 = fx * inv_z, -fx * txz * inv_z
    j11, j12 = fy * inv_z, -fy * tyz * inv_z
    a0 = j00 * r[0][0] + j02 * r[2][0]
    a1 = j00 * r[0][1] + j02 * r[2][1]
    a2 = j00 * r[0][2] + j02 * r[2][2]
    b0 = j11 * r[1][0] + j12 * r[2][0]
    b1 = j11 * r[1][1] + j12 * r[2][1]
    b2 = j11 * r[1][2] + j12 * r[2][2]

    # cov2d = JW Σ JW^T via Σ·v products (Σ symmetric).
    sa0 = s00 * a0 + s01 * a1 + s02 * a2
    sa1 = s01 * a0 + s11 * a1 + s12 * a2
    sa2 = s02 * a0 + s12 * a1 + s22 * a2
    sb0 = s00 * b0 + s01 * b1 + s02 * b2
    sb1 = s01 * b0 + s11 * b1 + s12 * b2
    sb2 = s02 * b0 + s12 * b1 + s22 * b2
    c00 = a0 * sa0 + a1 * sa1 + a2 * sa2 + DILATION
    c01 = b0 * sa0 + b1 * sa1 + b2 * sa2
    c11 = b0 * sb0 + b1 * sb1 + b2 * sb2 + DILATION

    det = c00 * c11 - c01 * c01
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic_a = c11 * inv_det
    conic_b = -c01 * inv_det
    conic_c = c00 * inv_det

    # --- radius & validity ------------------------------------------------
    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(RADIUS_SIGMA * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    valid = in_front & (det > 0) & (opacity > 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    # alpha(d) = a exp(-d^2/2sigma^2) >= 1/255  <=>  d <= sqrt(2 ln(255 a)) s
    # applied PER AXIS: the ellipse q <= tau implies |dx| <= cut*sqrt(c00)
    # and |dy| <= cut*sqrt(c11) (c00/c11 are the dilated cov2d diagonal the
    # conic is built from, so the bound is exact for the kernel's alpha).
    cut = jnp.sqrt(jnp.maximum(2.0 * jnp.log(255.0 * opacity), 0.0))
    rect_fx = jnp.minimum(radius_f,
                          jnp.ceil(cut * jnp.sqrt(jnp.maximum(c00, 0.0))))
    rect_fy = jnp.minimum(radius_f,
                          jnp.ceil(cut * jnp.sqrt(jnp.maximum(c11, 0.0))))
    rect_rx = jnp.where(valid, rect_fx, 0.0).astype(jnp.int32)
    rect_ry = jnp.where(valid, rect_fy, 0.0).astype(jnp.int32)

    # --- color from SH ----------------------------------------------------
    campos = camera_center(cam, align)
    dx = wx - campos[0]
    dy = wy - campos[1]
    dz = wz - campos[2]
    # Clip the SQUARED norm before the sqrt: clip(sqrt(s)) has a 0*inf VJP
    # at s == 0 (dead slot coinciding with the camera center) -> NaN grads.
    inv_n = 1.0 / jnp.sqrt(jnp.clip(dx * dx + dy * dy + dz * dz, 1e-16))
    dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
    # SoA SH contraction: basis values are (N,) vectors; coefficients are
    # transposed once to (3, K, N) so every multiply-add is full-lane.
    k = sh_lib.num_sh_coeffs(sh_degree)
    basis = sh_lib.sh_basis(sh_degree, jnp.stack([dx, dy, dz], axis=-1))
    shT = jnp.transpose(sh_coeffs[:, :k, :], (2, 1, 0))  # (3, k, N)
    cols = []
    for c in range(3):
        acc = shT[c, 0] * basis[..., 0]
        for i in range(1, k):
            acc = acc + shT[c, i] * basis[..., i]
        cols.append(jnp.maximum(acc + 0.5, 0.0))
    col_r, col_g, col_b = cols
    if extra_color is not None:
        col_r = col_r + extra_color[:, 0]
        col_g = col_g + extra_color[:, 1]
        col_b = col_b + extra_color[:, 2]

    return Projected(
        x2d=x2d, y2d=y2d, depth=depth,
        conic_a=conic_a, conic_b=conic_b, conic_c=conic_c,
        col_r=col_r, col_g=col_g, col_b=col_b,
        opacity=jnp.where(valid, opacity, 0.0),
        radius=radius,
        rect_rx=rect_rx,
        rect_ry=rect_ry,
    )


def distance_to_camera(xyz: jnp.ndarray, cam: CameraParams,
                       align: Optional[GlobalAlignment] = None) -> jnp.ndarray:
    """Euclidean distance sort key — the fork's cubemap sort-by-distance
    variant (README.md:126) instead of view-space z."""
    c = camera_center(cam, align)
    return jnp.linalg.norm(xyz - c[None, :], axis=-1)
