"""Differentiable camera parameterization.

Capability parity with the reference's learnable `Camera`
(`/root/reference/scene/cameras.py:46-381`): a base world-to-camera pose plus
learnable residuals `delta_quaternion` (4,) / `delta_translation` (3,) and
learnable FoVs, from which the view matrix, projection matrix, full projection
and camera center are rebuilt *differentiably on every access*, including the
global SIM(3) alignment (`get_world_view_transform`, cameras.py:359-371).

TPU-first redesign: the camera is a flat pytree of arrays (`CameraParams`) and
every derived quantity is a pure function, so cameras batch/vmap/shard
naturally and everything jits. Static per-camera metadata (image size, znear,
zfar) lives in `CameraStatic`, hashable for jit.

Conventions (column vectors, same geometry as the reference):
  x_cam = R_w2c @ x_world + t_w2c ; camera looks down +z.
  q is (w, x, y, z) and encodes R_w2c. q_eff = q_init + dq (raw addition, then
  normalized inside quat_to_rotmat — exactly the reference's scheme,
  cameras.py:103-104/360).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .lie import quat_to_rotmat, rotmat_to_quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CameraParams:
    """Per-camera differentiable parameters. All arrays; leading batch dims OK."""

    q_init: jnp.ndarray   # (..., 4) base w2c rotation quaternion
    t_init: jnp.ndarray   # (..., 3) base w2c translation
    dq: jnp.ndarray       # (..., 4) learnable residual quaternion
    dt: jnp.ndarray       # (..., 3) learnable residual translation
    fovx: jnp.ndarray     # (...,) learnable horizontal field of view (radians)
    fovy: jnp.ndarray     # (...,) learnable vertical field of view (radians)

    @staticmethod
    def create(R_w2c, t_w2c, fovx, fovy) -> "CameraParams":
        R_w2c = jnp.asarray(R_w2c, jnp.float32)
        t_w2c = jnp.asarray(t_w2c, jnp.float32)
        q = rotmat_to_quat(R_w2c)
        return CameraParams(
            q_init=q,
            t_init=t_w2c,
            dq=jnp.zeros(q.shape, jnp.float32),
            dt=jnp.zeros(t_w2c.shape, jnp.float32),
            fovx=jnp.asarray(fovx, jnp.float32),
            fovy=jnp.asarray(fovy, jnp.float32),
        )


@dataclasses.dataclass(frozen=True)
class CameraStatic:
    """Hashable, jit-static camera metadata."""

    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GlobalAlignment:
    """Global SIM(3) alignment applied to all cameras (scene/__init__.py:79-81).

    Parameterized by a quaternion (like the reference's global_quaternion,
    so optimization stays on SO(3)) and a log scale applied to camera
    centers: the reference multiplies the c2w translation row by a learnable
    scale (cameras.py:366-370); with w2c = [R|t] that is exactly t <- s*t.
    NOTE: the reference CREATES a global-alignment optimizer but never steps
    it in the canonical loop — optimization is opt-in here too
    (CalibConfig.opt_global_alignment).
    """

    quaternion: jnp.ndarray  # (4,) (w, x, y, z)
    log_scale: jnp.ndarray

    @property
    def rotation(self) -> jnp.ndarray:
        return quat_to_rotmat(self.quaternion)

    @staticmethod
    def identity() -> "GlobalAlignment":
        return GlobalAlignment(
            quaternion=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
            log_scale=jnp.zeros((), jnp.float32))


def pose_w2c(cam: CameraParams, align: GlobalAlignment | None = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Effective differentiable (R_w2c, t_w2c).

    Mirrors `get_world_view_transform` (cameras.py:359-371):
      R = G @ quat2R(q_init + dq);  t = s * (t_init + dt).
    """
    q = cam.q_init + cam.dq
    R = quat_to_rotmat(q)
    t = cam.t_init + cam.dt
    if align is not None:
        R = align.rotation @ R
        t = jnp.exp(align.log_scale) * t
    return R, t


def view_matrix(cam: CameraParams, align: GlobalAlignment | None = None) -> jnp.ndarray:
    """4x4 world-to-camera matrix (column-vector convention)."""
    R, t = pose_w2c(cam, align)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0., 0., 0., 1.], top.dtype),
                              top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def camera_center(cam: CameraParams, align: GlobalAlignment | None = None) -> jnp.ndarray:
    """World-space camera center C = -R^T t (cameras.py:379-381)."""
    R, t = pose_w2c(cam, align)
    return -jnp.einsum("...ji,...j->...i", R, t)


def projection_matrix(fovx: jnp.ndarray, fovy: jnp.ndarray,
                      znear: float = 0.01, zfar: float = 100.0) -> jnp.ndarray:
    """Differentiable perspective projection, column-vector convention.

    Same entries as `getProjectionMatrix` (utils/graphics_utils.py:83-107)
    with symmetric frustum: P[0,0] = 1/tan(fovx/2), P[1,1] = 1/tan(fovy/2),
    P[2,2] = zfar/(zfar-znear), P[2,3] = -zfar*znear/(zfar-znear), P[3,2] = 1.
    """
    tx = jnp.tan(fovx * 0.5)
    ty = jnp.tan(fovy * 0.5)
    zero = jnp.zeros_like(tx)
    one = jnp.ones_like(tx)
    zf = zfar / (zfar - znear)
    rows = [
        jnp.stack([1.0 / tx, zero, zero, zero], axis=-1),
        jnp.stack([zero, 1.0 / ty, zero, zero], axis=-1),
        jnp.stack([zero, zero, zf * one, -(zfar * znear) / (zfar - znear) * one], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def full_projection(cam: CameraParams, static: CameraStatic,
                    align: GlobalAlignment | None = None) -> jnp.ndarray:
    """P @ W2C — maps world homogeneous points to clip space
    (`get_full_proj_transform`, cameras.py:373-377, transposed convention)."""
    P = projection_matrix(cam.fovx, cam.fovy, static.znear, static.zfar)
    return P @ view_matrix(cam, align)


def focals(cam: CameraParams, static: CameraStatic) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel focal lengths fx, fy from the (learnable) FoVs
    (`fov2focal`, graphics_utils.py:110-111)."""
    fx = static.width / (2.0 * jnp.tan(cam.fovx * 0.5))
    fy = static.height / (2.0 * jnp.tan(cam.fovy * 0.5))
    return fx, fy


def intrinsic_matrix(cam: CameraParams, static: CameraStatic) -> jnp.ndarray:
    """3x3 K with principal point at the image center (cameras.py:232-235)."""
    fx, fy = focals(cam, static)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([fx, zero, static.width / 2.0 * one], axis=-1),
        jnp.stack([zero, fy, static.height / 2.0 * one], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)


def rotate_camera_pose(R_w2c: jnp.ndarray, t_w2c: jnp.ndarray,
                       deg_x: float, deg_y: float, deg_z: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate a camera about its own axes keeping the center fixed.

    Semantics of `rotate_camera` (cameras.py:24-44): rotate the c2w rotation by
    deg_y about the camera up axis, then deg_x about right, then deg_z about
    forward; recompute t so the camera center is unchanged. Used to build the
    five cubemap sub-cameras (cameras.py:184-193).
    """
    from .lie import so3_exp

    center = -R_w2c.T @ t_w2c
    R_c2w = R_w2c.T
    right, up, forward = R_c2w[:, 0], R_c2w[:, 1], R_c2w[:, 2]
    Ry = so3_exp(jnp.deg2rad(deg_y) * up)
    Rx = so3_exp(jnp.deg2rad(deg_x) * right)
    Rz = so3_exp(jnp.deg2rad(deg_z) * forward)
    R_c2w_new = Rz @ (Rx @ (Ry @ R_c2w))
    R_new = R_c2w_new.T
    t_new = -R_new @ center
    return R_new, t_new
