"""Hybrid field-of-view lens distortion pipeline.

Capability parity with `/root/reference/utils/util_distortion.py`:
  * control-point grids on an extended sensor back-projected through K^-1
    (`generate_control_pts` :314-342, `generate_pts` :79-109)
  * analytic initialization targets from COLMAP radial / OPENCV_FISHEYE
    coefficients (`init_from_coeff` :132-168, `read_colmap_coeff` :111-130)
  * iResNet pre-fitting to those targets (`init_iresnet` :210-269,
    `init_cubemap` :182-208 for the theta-polynomial cubemap net)
  * `apply_distortion` (:271-311): run the invertible net on the sparse
    control grid, scale by the projection matrix into NDC flow, bilinearly
    upsample to full resolution, grid-sample-warp the rendered perspective
    image into the distorted (fisheye) frame — or the GT in the other
    direction (`apply2gt`) — and return the validity mask.

All pieces are pure jnp + optax and jit cleanly; the warp is the
differentiable `utils/image.grid_sample`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.image import (banded_warp, center_crop_resample, grid_sample,
                           resize_bilinear)
from .iresnet import IResNetParams, iresnet_forward


def make_control_grid(K: np.ndarray, sensor_w: int, sensor_h: int,
                      sample_w: int, sample_h: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sensor pixel grid + normalized in-lens ray directions.

    Mirrors `generate_control_pts`: a (sample_h, sample_w) grid spanning
    [0, sensor_w] x [0, sensor_h] with the principal point at the sensor
    center, back-projected through K^-1 and dehomogenized.
    Returns (P_sensor (h, w, 2), P_view (h*w, 2)).
    """
    K = np.array(K, np.float64)
    K[0, 2] = sensor_w / 2
    K[1, 2] = sensor_h / 2
    i, j = np.meshgrid(np.linspace(0, sensor_w, sample_w),
                       np.linspace(0, sensor_h, sample_h), indexing="ij")
    p_sensor = np.stack((i.T, j.T), axis=-1).astype(np.float32)
    flat = p_sensor.reshape(-1, 2)
    hom = np.concatenate([flat, np.ones((flat.shape[0], 1), np.float32)], 1)
    view = (np.linalg.inv(K) @ hom.T).T
    view = (view[:, :2] / view[:, 2:3]).astype(np.float32)
    return jnp.asarray(p_sensor), jnp.asarray(view)


def distort_by_coeff(points: jnp.ndarray, coeff) -> jnp.ndarray:
    """Analytic distortion of normalized points (`init_from_coeff`):
    4 coeffs -> OPENCV_FISHEYE theta-polynomial, 2/3 -> radial r^2/r^4(/r^6),
    8 -> OPENCV (radial part of the fisheye form as the reference uses)."""
    coeff = list(coeff)
    r = jnp.sqrt(jnp.sum(points ** 2, axis=-1, keepdims=True))
    r = jnp.clip(r, 1e-9)
    theta = jnp.arctan(r)
    inv_r = 1.0 / r
    if len(coeff) == 4 or len(coeff) == 8:
        k = coeff[:4] if len(coeff) == 8 else coeff
        poly = theta + k[0] * theta ** 3 + k[1] * theta ** 5 \
            + k[2] * theta ** 7 + (k[3] * theta ** 9 if len(coeff) == 4 else 0.0)
        return points * (inv_r * poly)
    if len(coeff) == 2:
        return points * (1 + coeff[0] * r ** 2 + coeff[1] * r ** 4)
    if len(coeff) == 3:
        return points * (1 + coeff[0] * r ** 2 + coeff[1] * r ** 4
                         + coeff[2] * r ** 6)
    return points


def invert_theta_poly(r_d: np.ndarray, coeff, theta_max: float = 1.5
                      ) -> np.ndarray:
    """Invert the OPENCV_FISHEYE theta polynomial r_d = poly(theta)
    numerically (dense monotone table + interp). Host-side (synthesis and
    validation tooling, not a train-path op)."""
    th = np.linspace(1e-7, theta_max, 8192)
    poly = th + coeff[0] * th ** 3 + coeff[1] * th ** 5 \
        + coeff[2] * th ** 7 + coeff[3] * th ** 9
    return np.interp(np.asarray(r_d), poly, th, right=theta_max)


def analytic_inverse_flow(coeff, p_view: jnp.ndarray,
                          grid_hw: Tuple[int, int], proj_scale,
                          out_hw: Tuple[int, int]) -> jnp.ndarray:
    """The NDC flow field a PERFECTLY-converged lens net would produce for
    the analytic OPENCV_FISHEYE model: the exact analogue of
    `compute_flow(..., sensor_to_frustum=False)` with the iResNet inverse
    replaced by the closed-form theta-poly inversion (distorted sensor
    coords -> undistorted frustum coords r_n = tan(theta)). Used to
    synthesize known-lens fisheye datasets and to measure recovered-flow
    error (the reference's self-calibration claim, train.py:255-325)."""
    p = np.asarray(p_view, np.float64)
    r_d = np.sqrt((p ** 2).sum(-1))
    theta = invert_theta_poly(r_d, coeff)
    p_n = p * (np.tan(theta) / np.maximum(r_d, 1e-9))[:, None]
    ctrl = jnp.asarray(p_n.astype(np.float32)).reshape(
        grid_hw[0], grid_hw[1], 2)
    flow = ctrl * jnp.asarray(proj_scale, jnp.float32).reshape(1, 1, 2)
    flow = resize_bilinear(flow.transpose(2, 0, 1), out_hw).transpose(1, 2, 0)
    return flow


def flow_error_px(lens_params: IResNetParams, coeff, p_view: jnp.ndarray,
                  proj_scale, render_w: int, max_ndc: float = 1.0,
                  fit_scale: bool = False) -> float:
    """Mean |learned - true| undistortion flow over the in-frame control
    points (|true NDC| <= max_ndc), in RENDER PIXELS: the recovered-lens
    error metric. The learned flow is the iResNet inverse on the control
    grid (exactly what the warp consumes); truth is the closed-form
    theta-poly inverse. max_ndc < 1 restricts to the central region where
    photometric supervision exists (the rim maps to the frame edge, where
    the warp samples little content)."""
    p = np.asarray(p_view, np.float64)
    r_d = np.sqrt((p ** 2).sum(-1))
    theta = invert_theta_poly(r_d, coeff)
    p_n_true = p * (np.tan(theta) / np.maximum(r_d, 1e-9))[:, None]
    p_n_hat = np.asarray(iresnet_forward(lens_params, p_view,
                                         sensor_to_frustum=False))
    proj = np.asarray(proj_scale, np.float64).reshape(1, 2)
    ndc_true = p_n_true * proj
    ndc_hat = p_n_hat * proj
    valid = np.all(np.abs(ndc_true) <= max_ndc, axis=-1)
    if not valid.any():
        return float("nan")
    h, t = ndc_hat[valid], ndc_true[valid]
    if fit_scale:
        # gauge-fixed error: a GLOBAL flow scale is not photometrically
        # identifiable (alpha * flow <-> rescaling scene depth — the zoom
        # gauge), so mod it out with the optimal scalar before measuring,
        # like the pose metric mods out SIM(3)
        alpha = float((h * t).sum() / np.maximum((h * h).sum(), 1e-12))
        h = alpha * h
    err_ndc = np.linalg.norm(h - t, axis=-1)
    return float(np.mean(err_ndc) * 0.5 * (render_w - 1))


def read_colmap_coeff(source_path: str) -> list:
    """Fetch distortion coefficients from the paired fisheye COLMAP model or
    a VR-NeRF cameras.json (`read_colmap_coeff`, util_distortion.py:111-130)."""
    import json
    import os

    from ..data.colmap import read_cameras_binary

    candidates = [os.path.join(source_path, "fish", "sparse", "0", "cameras.bin"),
                  os.path.join(source_path, "sparse", "0", "cameras.bin")
                  if "fish" in source_path else None]
    for path in filter(None, candidates):
        if os.path.exists(path):
            for cam in read_cameras_binary(path).values():
                if "FISHEYE" in cam.model:
                    return cam.params[-4:].tolist()
                if "RADIAL" in cam.model:
                    return cam.params[-2:].tolist()
    krt = os.path.join(source_path, "cameras.json")
    if os.path.exists(krt):
        with open(krt) as f:
            return json.load(f)["KRT"][-1]["distortion"]
    return [0.0, 0.0, 0.0, 0.0]


def fit_iresnet_to_targets(params: IResNetParams, inputs: jnp.ndarray,
                           targets: jnp.ndarray, iters: int = 5000,
                           lr: float = 1e-4) -> IResNetParams:
    """Pre-fit the lens net so forward(inputs) ~= targets (`init_iresnet`
    semantics; the reference uses 5k Adam steps)."""
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            pred = iresnet_forward(p, inputs, sensor_to_frustum=True)
            pred = jnp.where(jnp.isfinite(pred), pred, 0.0)
            return jnp.mean((pred - targets) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state)
    return params


def init_iresnet_from_colmap(params: IResNetParams, K: np.ndarray,
                             fish_w: int, fish_h: int, coeff,
                             iters: int = 5000, lr: float = 1e-4
                             ) -> IResNetParams:
    """Two-scale control grids (boundary scales 5 and 1.5, 40x40-ish
    sampling) fitted to the analytic coefficient model
    (`init_iresnet`, util_distortion.py:210-257)."""
    grids = []
    for boundary_scale in (5.0, 1.5):
        w = int(fish_w * boundary_scale)
        h = int(fish_h * boundary_scale)
        _, view = make_control_grid(K, w, h, 40, 40)
        grids.append(view)
    inputs = jnp.concatenate(grids, axis=0)
    targets = distort_by_coeff(inputs, coeff)
    targets = jnp.where(jnp.isfinite(targets), targets, 0.0)
    return fit_iresnet_to_targets(params, inputs, targets, iters, lr)


def init_cubemap_net(params: IResNetParams, coeff, iters: int = 100,
                     lr: float = 1e-4) -> IResNetParams:
    """Fit the cubemap residual net on circular samples of the
    theta-polynomial (`init_cubemap`, util_distortion.py:182-208):
    inputs are base-tan-warped distorted points, targets the ideal points."""
    radii = np.arange(0.05, 80.0 + 1e-7, 0.05)
    angles = np.linspace(0, 2 * np.pi, 100)
    R, Th = np.meshgrid(radii, angles, indexing="ij")
    pts_n = np.stack([(R * np.cos(Th)).ravel(), (R * np.sin(Th)).ravel()],
                     axis=-1).astype(np.float32)
    r_n = np.sqrt((pts_n ** 2).sum(-1))
    at = np.arctan(r_n)
    r_d = at + coeff[0] * at ** 3 + coeff[1] * at ** 5 \
        + coeff[2] * at ** 7 + coeff[3] * at ** 9
    pts_d = pts_n * (r_d / (r_n + 1e-5))[:, None]
    scale = r_n / (r_d + 1e-5)
    train_x = jnp.asarray(pts_d * scale[:, None])
    train_y = jnp.asarray(pts_n)
    return fit_iresnet_to_targets(params, train_x, train_y, iters, lr)


def compute_flow(lens_params: IResNetParams, p_view: jnp.ndarray,
                 grid_hw: Tuple[int, int], proj_scale: jnp.ndarray,
                 out_hw: Tuple[int, int], sensor_to_frustum: bool
                 ) -> jnp.ndarray:
    """Control points -> NDC flow field at full resolution
    (apply_distortion:273-285): run the INN, scale x/y by the projection
    diag (1/tan(fov/2)), bilinearly upsample."""
    out = iresnet_forward(lens_params, p_view,
                          sensor_to_frustum=sensor_to_frustum)
    ctrl = out.reshape(grid_hw[0], grid_hw[1], 2)
    flow = ctrl * proj_scale.reshape(1, 1, 2)
    flow = resize_bilinear(flow.transpose(2, 0, 1), out_hw).transpose(1, 2, 0)
    return flow


def apply_distortion(lens_params: IResNetParams, p_view: jnp.ndarray,
                     grid_hw: Tuple[int, int], image: jnp.ndarray,
                     proj_scale: jnp.ndarray, out_hw: Tuple[int, int],
                     final_hw: Optional[Tuple[int, int]] = None,
                     apply2gt: bool = False,
                     flow: Optional[jnp.ndarray] = None):
    """Warp a rendered perspective image into the distorted frame (or the
    fisheye GT into perspective when apply2gt). Returns (warped, mask, flow).

    apply_distortion:271-311 — forward direction (apply2gt) vs inverse,
    grid_sample with zeros padding + align_corners, validity mask from
    near-zero pixels, optional center crop to the fisheye resolution.
    """
    if flow is None:
        flow = compute_flow(lens_params, p_view, grid_hw, proj_scale, out_hw,
                            sensor_to_frustum=apply2gt)
    warped = grid_sample(image, flow, align_corners=True)
    if not apply2gt and final_hw is not None and \
            final_hw != warped.shape[-2:]:
        warped = center_crop_resample(warped, final_hw[0], final_hw[1])
    if apply2gt:
        mask = (~((warped[0] < 1e-5) & (warped[1] < 1e-5)))[None].astype(
            warped.dtype)
    else:
        mask = (~((warped[0] == 0.0) & (warped[1] == 0.0)))[None].astype(
            warped.dtype)
    return warped, mask, flow


def apply_distortion_banded(lens_params: IResNetParams, p_view: jnp.ndarray,
                            grid_hw: Tuple[int, int], image: jnp.ndarray,
                            proj_scale: jnp.ndarray,
                            out_hw: Tuple[int, int], warp_ky: int,
                            final_hw: Optional[Tuple[int, int]] = None,
                            apply2gt: bool = False,
                            flow: Optional[jnp.ndarray] = None,
                            band: int = 32):
    """`apply_distortion` with the gather-free banded warp (fast-mode path).

    Same semantics, two deliberate numerical deviations, both bounded:
      * the full-resolution warp runs through `utils/image.banded_warp`
        with DEFAULT (bf16-operand) matmul precision — max abs pixel error
        ~4e-3 vs the f32 gather warp (tools/warpbench.py), consistent with
        the fast compositing mode's own operand error; exact mode keeps
        the gather `apply_distortion`;
      * the final center crop samples at exactly-integer positions, so it
        is taken as a literal slice instead of replaying the reference's
        linspace->NDC->pixel round trip (<= 1 ulp difference).

    Returns (warped, mask, flow, overflow) — `overflow` > 0 means the
    static `warp_ky` source-row window was too small for the current lens
    field and the result has zero-filled taps; train loops re-trace with a
    larger ky (CalibTrainer's warp-ky ladder), mirroring the raster's
    instance-capacity ladder.
    """
    if flow is None:
        flow = compute_flow(lens_params, p_view, grid_hw, proj_scale, out_hw,
                            sensor_to_frustum=apply2gt)
    warped, overflow = banded_warp(image, flow, ky=warp_ky, band=band,
                                   precision=jax.lax.Precision.DEFAULT)
    if not apply2gt and final_hw is not None and \
            final_hw != warped.shape[-2:]:
        hf, wf = warped.shape[-2:]
        sy, sx = (hf - final_hw[0]) // 2, (wf - final_hw[1]) // 2
        if sy >= 0 and sx >= 0:
            warped = warped[:, sy:sy + final_hw[0], sx:sx + final_hw[1]]
        else:
            warped = center_crop_resample(warped, final_hw[0], final_hw[1])
    if apply2gt:
        mask = (~((warped[0] < 1e-5) & (warped[1] < 1e-5)))[None].astype(
            warped.dtype)
    else:
        mask = (~((warped[0] == 0.0) & (warped[1] == 0.0)))[None].astype(
            warped.dtype)
    return warped, mask, flow, overflow
