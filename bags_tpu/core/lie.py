"""Quaternion / SO(3) / SE(3) math as pure, jit-able jnp functions.

Capability parity with the reference's pose math
(`/root/reference/utils/camera.py:58-188` Lie/Quaternion classes and
`/root/reference/scene/cameras.py:399-448` quaternion<->R converters), written
from scratch for JAX: everything is batched, differentiable, and uses
Taylor-series branches via `jnp.where` so it is safe under `jit`/`vmap` and at
theta -> 0.

Conventions: quaternions are (w, x, y, z); rotations act on column vectors.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (..., 4) x (..., 4) -> (..., 4).

    Same semantics as `gaussian_renderer/__init__.py:19-28` in the reference.
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit-or-not quaternion -> (..., 3, 3) rotation.

    Normalizes internally (differentiably), matching
    `scene/cameras.py:399-416` semantics so gradients w.r.t. an unnormalized
    delta-quaternion flow the same way.
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return m


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) (w, x, y, z). Branchless Shepperd's method.

    Replaces the data-dependent branches of `scene/cameras.py:418-448` with a
    4-candidate formulation selected by `argmax`, safe under jit/vmap.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate (unnormalized) quaternions, one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    return jnp.einsum("...ij,...j->...i", quat_to_rotmat(q), v)


# ---------------------------------------------------------------------------
# so(3) / SE(3)
# ---------------------------------------------------------------------------

def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jnp.ndarray):
    """Return A = sin(t)/t, B = (1-cos(t))/t^2, C = (t - sin t)/t^3 with
    Taylor fallbacks near 0 (mirrors `utils/camera.py:110-137` taylor_A/B/C)."""
    theta2_safe = jnp.clip(theta2, _EPS**2)  # keeps the untaken branch NaN-free
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) tangent (..., 3) -> SO(3) matrix (..., 3, 3) via Rodrigues."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) (..., 3, 3) -> so(3) (..., 3)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(theta < 1e-6, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.clip(sin_theta, _EPS)))
    return scale[..., None] * vee


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (..., 6) [w | u] -> (..., 4, 4) homogeneous transform."""
    w, u = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_coeffs(theta2)
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + A[..., None, None] * K + B[..., None, None] * (K @ K)
    V = eye + B[..., None, None] * K + C[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", V, u)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) between rotations; reference `utils/camera.py:302-307`."""
    R_rel = jnp.einsum("...ij,...kj->...ik", R1, R2)  # R1 @ R2^T
    tr = jnp.trace(R_rel, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7))
