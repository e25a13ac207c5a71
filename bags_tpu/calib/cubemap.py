"""Cubemap rendering pipeline for >180° field-of-view cameras.

Capability parity with `/root/reference/utils/cubemap_utils.py`: render the
forward face plus up/down/left/right sub-cameras (±90° rotations built in
core/camera.rotate_camera_pose), warp each through the shared distortion
field by reprojecting the forward-face distorted rays onto each face via
perspective division (`apply_flow_up_down_left_right` :139-189), half-mask
the side faces (:192-216), and composite against a circular-masked fisheye
GT (`generate_circular_mask` :48-75). The distortion field is the base
tan-warp plus an iResNet residual on a sparse control grid, bilinearly
upsampled (`render_cubemap` :233-252).
"""

from __future__ import annotations

from typing import Callable, List

import jax.numpy as jnp
import numpy as np

import jax

from ..utils.image import (WARP_BAND, banded_warp, grid_sample,
                           resize_bilinear)
from .iresnet import IResNetParams, iresnet_forward


def generate_ray_grid(K: np.ndarray, width: int, height: int,
                      sample_rate: int = 1) -> jnp.ndarray:
    """Pixel grid over [0,W]x[0,H] back-projected through K^-1
    (`generate_pts_up_down_left_right` :23-45). Returns (N, 2) xy ray dirs
    in z=1 plane, row-major over a (H/s, W/s) grid."""
    i, j = np.meshgrid(np.linspace(0, width, width // sample_rate),
                       np.linspace(0, height, height // sample_rate),
                       indexing="ij")
    pts = np.stack((i.T, j.T), axis=-1).reshape(-1, 2)
    hom = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    view = (np.linalg.inv(np.asarray(K, np.float64)) @ hom.T).T
    return jnp.asarray((view[:, :2] / view[:, 2:3]).astype(np.float32))


def face_reproject(rays_hom: jnp.ndarray, face: str) -> jnp.ndarray:
    """Map forward-face distorted homogeneous rays onto a cube face by
    perspective division (:143-167). Returns (N, 3) homogeneous coords."""
    x, y, z = rays_hom[:, 0], rays_hom[:, 1], rays_hom[:, 2]
    if face == "forward":
        out = rays_hom
        return out
    if face == "left":
        p = jnp.stack((-z / x, -y / x), axis=1)
    elif face == "right":
        p = jnp.stack((-z / x, y / x), axis=1)
    elif face == "up":
        p = jnp.stack((-x / y, -z / y), axis=1)
    elif face == "down":
        p = jnp.stack((x / y, -z / y), axis=1)
    else:
        raise ValueError(face)
    return jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=1)


def face_grid(K: jnp.ndarray, rays_hom: jnp.ndarray, face: str, height: int,
              width: int, img_hw: tuple[int, int]) -> jnp.ndarray:
    """Normalized (H, W, 2) sampling grid of `warp_to_face`: re-projected
    distorted rays through K, normalized to the face render's [-1, 1] frame.
    Exposed separately so the sharded cubemap step can row-slice it
    (dist/calib.py)."""
    rays = face_reproject(rays_hom, face)
    pix = (rays @ K.T)
    pix = pix[:, :2] / pix[:, 2:3]
    pix = pix.reshape(height, width, 2)
    gx = pix[..., 0] / (img_hw[1] - 1) * 2 - 1
    gy = pix[..., 1] / (img_hw[0] - 1) * 2 - 1
    return jnp.stack((gx, gy), axis=-1)


def warp_to_face(K: jnp.ndarray, rays_hom: jnp.ndarray, img: jnp.ndarray,
                 face: str, height: int, width: int, warp_ky: int = 0,
                 transposed: bool = False):
    """Project the (re-projected) distorted rays through K and grid-sample
    the face render (:169-189). warp_ky > 0 selects the gather-free banded
    warp (fast mode); returns (warped, overflow) — overflow is always 0 on
    the gather path.

    `transposed` runs the banded warp on the TRANSPOSED image/grid: the
    left/right face reprojections map output ROWS across source COLUMNS
    (p = (-z/x, -y/x) — the source-y coordinate varies with output x), so
    their row-band windows span nearly the full image; banding over output
    columns instead gives a small window again. Value-identical (bilinear
    sampling commutes with the transposition)."""
    grid = face_grid(K, rays_hom, face, height, width, img.shape[-2:])
    if warp_ky:
        if transposed:
            out, over = banded_warp(
                jnp.transpose(img, (0, 2, 1)),
                jnp.transpose(grid, (1, 0, 2))[..., ::-1],
                ky=warp_ky, band=WARP_BAND,
                precision=jax.lax.Precision.DEFAULT)
            return jnp.transpose(out, (0, 2, 1)), over
        return banded_warp(img, grid, ky=warp_ky, band=WARP_BAND,
                           precision=jax.lax.Precision.DEFAULT)
    return grid_sample(img, grid, align_corners=True), jnp.asarray(
        0, jnp.int32)


def mask_half(image: jnp.ndarray, direction: str) -> jnp.ndarray:
    """Zero one half of the image (:192-216): 'left' masks the right half,
    'right' the left half, 'up' the lower half, 'down' the upper half."""
    _, h, w = image.shape
    mask = jnp.ones((h, w), image.dtype)
    col = jnp.arange(w)[None, :]
    row = jnp.arange(h)[:, None]
    if direction == "right":
        mask = jnp.where(col < w // 2, 0.0, mask)
    elif direction == "left":
        mask = jnp.where(col >= w // 2, 0.0, mask)
    elif direction == "down":
        mask = jnp.where(row < h // 2, 0.0, mask)
    elif direction == "up":
        mask = jnp.where(row >= h // 2, 0.0, mask)
    return image * mask[None]


def circular_mask(height: int, width: int, radius: float) -> jnp.ndarray:
    """(3, H, W) disc mask about the image center (:48-75)."""
    yc, xc = height // 2, width // 2
    y, x = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    d = jnp.sqrt((x - xc) ** 2.0 + (y - yc) ** 2.0)
    return jnp.broadcast_to((d <= radius).astype(jnp.float32),
                            (3, height, width))


def fov90_square_mask(height: int, width: int, focal_x: float,
                      focal_y: float) -> jnp.ndarray:
    """Central square covering the ±45° frustum of the forward face
    (train.py:232-233 semantics: half-width = focal)."""
    y, x = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    inside = (jnp.abs(x - width / 2) <= focal_x) & \
        (jnp.abs(y - height / 2) <= focal_y)
    return inside.astype(jnp.float32)[None]


def distorted_rays(cubemap_net: IResNetParams, K: np.ndarray, width: int,
                   height: int, control_point_sample_scale: int
                   ) -> jnp.ndarray:
    """Full-res distorted homogeneous rays: base tan-warp + upsampled
    iResNet residual on the control grid (`render_cubemap` :233-252)."""
    rays_base = generate_ray_grid(K, width, height, 1)
    rays_ctrl = generate_ray_grid(K, width, height,
                                  control_point_sample_scale)

    def tan_warp(rays, clip=None):
        r_d = jnp.sqrt(jnp.sum(rays ** 2, axis=-1, keepdims=True))
        inv = 1.0 / (r_d + 1e-7)
        r_c = jnp.minimum(r_d, clip) if clip is not None else r_d
        return rays * (jnp.tan(r_c) * inv)

    rays_dis_base = tan_warp(rays_base)
    rays_dis_ctrl = tan_warp(rays_ctrl, clip=1.55)

    residual = iresnet_forward(cubemap_net, rays_dis_ctrl,
                               sensor_to_frustum=True) - rays_dis_ctrl
    hs = height // control_point_sample_scale
    ws = width // control_point_sample_scale
    residual = residual.reshape(hs, ws, 2).transpose(2, 0, 1)
    up = resize_bilinear(residual, (height, width)).transpose(1, 2, 0)
    rays = rays_dis_base + up.reshape(-1, 2)
    return jnp.concatenate([rays, jnp.ones_like(rays[:, :1])], axis=1)


FACES = ("forward", "up", "down", "left", "right")


def render_cubemap_faces(render_face: Callable[[int], jnp.ndarray],
                         cubemap_net: IResNetParams, K, width: int,
                         height: int, control_point_sample_scale: int,
                         mask_fov90: jnp.ndarray, warp_ky: int = 0,
                         transposed=None):
    """Render + warp the five faces (`render_cubemap` :219-288).

    render_face(i) must return the (3, H, W) render for face i in FACES
    order (0 = the main camera, 1..4 = the ±90° sub-cameras from
    `core.camera.rotate_camera_pose`). Returns (faces, warp_overflow):
    the list of distorted (half-masked for side faces) images to
    composite/loss against the circular-masked fisheye GT, plus the summed
    banded-warp overflow (0 on the gather path, warp_ky=0).
    """
    K = np.asarray(K, np.float32)  # host-side constant (inv/grid generation)
    rays_hom = distorted_rays(cubemap_net, K, width, height,
                              control_point_sample_scale)
    out = []
    wover = jnp.asarray(0, jnp.int32)
    transposed = transposed or (False,) * len(FACES)
    for i, face in enumerate(FACES):
        img = render_face(i) * mask_fov90
        warped, over = warp_to_face(K, rays_hom, img, face, height, width,
                                    warp_ky=warp_ky,
                                    transposed=transposed[i])
        wover = wover + over
        if face != "forward":
            warped = mask_half(warped, face)
        out.append(warped)
    return out, wover


SUB_CAMERA_ROTATIONS = (
    (90.0, 0.0, 0.0),    # up
    (-90.0, 0.0, 0.0),   # down
    (0.0, -90.0, 0.0),   # left
    (0.0, 90.0, 0.0),    # right
    (0.0, 180.0, 0.0),   # back (built but unused in the 5-face loss)
)


def _bilinear_sample(img: jnp.ndarray, u: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (C, H, W) at normalized coords u, v in [-1, 1]
    (torch grid_sample align_corners=True, border padding). u/v: (P,)."""
    c, h, w = img.shape
    x = (u + 1.0) * 0.5 * (w - 1)
    y = (v + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    flat = img.reshape(c, h * w)
    g00 = jnp.take(flat, y0 * w + x0, axis=1)
    g01 = jnp.take(flat, y0 * w + x1, axis=1)
    g10 = jnp.take(flat, y1 * w + x0, axis=1)
    g11 = jnp.take(flat, y1 * w + x1, axis=1)
    top = g00 * (1 - fx) + g01 * fx
    bot = g10 * (1 - fx) + g11 * fx
    return top * (1 - fy) + bot * fy


def cubemap_to_perspective(img_forward: jnp.ndarray, img_left: jnp.ndarray,
                           img_right: jnp.ndarray, img_up: jnp.ndarray,
                           img_down: jnp.ndarray, fov_h_deg: float,
                           fov_v_deg: float, output_width: int,
                           output_height: int) -> jnp.ndarray:
    """Resample 5 cubemap faces (C, H, W each) into one perspective view
    (C, output_height, output_width).

    Intended behavior of the reference's `cubemap_to_perspective`
    (utils/graphics_utils.py:117-276, consumed by render_mitsuba.py:273-440):
    per output pixel, cast a camera ray, pick the dominant-axis face, and
    bilinear-sample it (grid_sample align_corners=True, border padding).
    Note the reference snapshot assembles its output through a double
    advanced-index assignment (`out[:, m1][..., m2] = x`), which torch
    evaluates on a copy — and builds its pixel grid (W, H)-transposed
    against the (H, W) output view. This implementation does what the
    function is *for*. TPU-style: all 5 faces sampled branch-free and
    combined with masks (no data-dependent control flow).
    """
    fx = (output_width / 2.0) / np.tan(np.deg2rad(fov_h_deg) / 2.0)
    fy = (output_height / 2.0) / np.tan(np.deg2rad(fov_v_deg) / 2.0)
    jj, ii = jnp.meshgrid(jnp.arange(output_height, dtype=jnp.float32),
                          jnp.arange(output_width, dtype=jnp.float32),
                          indexing="ij")
    xc = (ii - output_width / 2.0) / fx
    yc = (output_height / 2.0 - jj) / fy          # invert y-axis
    d = jnp.stack([xc, yc, jnp.ones_like(xc)], axis=-1)
    d = (d / jnp.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)

    # face id: 0 fwd (+z), 1 right (+x), 2 left (-x), 3 up (+y), 4 down (-y)
    fid = jnp.where((adz >= adx) & (adz >= ady) & (dz > 0), 0,
          jnp.where((adx >= ady) & (adx >= adz) & (dx > 0), 1,
          jnp.where((adx >= ady) & (adx >= adz) & (dx < 0), 2,
          jnp.where((ady > adx) & (ady > adz) & (dy > 0), 3, 4))))

    eps = 1e-6
    # (den, u_num, v_num) per face, matching the reference's face frames.
    specs = [(dz, dx, dy),            # forward
             (dx, -dz, dy),           # right
             (-dx, dz, dy),           # left
             (dy, dx, -dz),           # up
             (-dy, dx, dz)]           # down
    out = jnp.zeros((img_forward.shape[0], d.shape[0]), img_forward.dtype)
    faces = (img_forward, img_right, img_left, img_up, img_down)
    for k, (den, nu, nv) in enumerate(specs):
        den = jnp.where(jnp.abs(den) < eps, eps, den)
        samp = _bilinear_sample(faces[k], nu / den, nv / den)
        out = jnp.where(fid == k, samp, out)
    return out.reshape(img_forward.shape[0], output_height, output_width)
