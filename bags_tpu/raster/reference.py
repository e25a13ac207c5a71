"""Golden-model renderer: naive per-pixel alpha compositing over all Gaussians.

This is the numerics oracle for the tiled/Pallas rasterizer (SURVEY.md §7.2
M0). It reproduces the reference CUDA rasterizer's per-pixel semantics exactly
(`cuda_rasterizer/forward.cu` render loop, reconstructed in SURVEY.md §2.3):

  alpha   = min(0.99, opacity * exp(-0.5 d^T conic d))
  skip if alpha < 1/255
  front-to-back order by view-space depth
  termination: a Gaussian whose blend would push T below 1e-4 is *excluded*
  and so is everything behind it
  C_out = sum c_i alpha_i T_i + T_final * bg

O(N_pixels * N_gaussians) — only for tiny scenes and tests. Differentiable
end-to-end with plain jax.grad (the termination/skip masks are treated as
non-differentiable control flow, as in CUDA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import CameraParams, CameraStatic, GlobalAlignment
from ..core.projection import Projected, project_gaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_pixels(proj: Projected, pix_x: jnp.ndarray, pix_y: jnp.ndarray,
                     bg: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite all Gaussians (sorted internally by depth) at given pixels.

    pix_x/pix_y: (P,) pixel-center coordinates. Returns (color (P, 3), T (P,)).
    """
    order = jnp.argsort(proj.depth)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opacity = proj.opacity[order]
    radius = proj.radius[order]

    dx = pix_x[None, :] - mean2d[:, 0:1]  # (N, P)
    dy = pix_y[None, :] - mean2d[:, 1:2]
    power = -0.5 * (conic[:, 0:1] * dx * dx + conic[:, 2:3] * dy * dy) \
        - conic[:, 1:2] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None] * jnp.exp(power))
    valid = (alpha >= ALPHA_MIN) & (power <= 0.0) & (radius[:, None] > 0)
    a = jnp.where(valid, alpha, 0.0)

    one_minus = 1.0 - a
    # Exclusive cumulative transmittance before each Gaussian.
    T_before = jnp.concatenate(
        [jnp.ones_like(a[:1]), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0)
    # Termination: first i with valid & T_before*(1-a) < eps kills i and all after.
    kill = valid & (T_before * one_minus < T_EPS)
    done_before = jnp.cumsum(kill.astype(jnp.int32), axis=0) > 0
    include = valid & ~done_before
    include = jax.lax.stop_gradient(include)

    a_inc = jnp.where(include, a, 0.0)
    one_minus_inc = 1.0 - a_inc
    T_before_inc = jnp.concatenate(
        [jnp.ones_like(a[:1]), jnp.cumprod(one_minus_inc, axis=0)[:-1]], axis=0)
    w = a_inc * T_before_inc  # (N, P)
    out = jnp.einsum("np,nc->pc", w, color)
    T_final = jnp.prod(one_minus_inc, axis=0)
    out = out + T_final[:, None] * bg[None, :]
    return out, T_final


def render_reference(
    xyz, scales, quats, opacity, sh_coeffs,
    cam: CameraParams, static: CameraStatic, sh_degree: int,
    bg: Optional[jnp.ndarray] = None,
    align: Optional[GlobalAlignment] = None,
    scale_modifier: float = 1.0,
) -> dict:
    """Render a full image the naive way. Returns dict with 'render' (3, H, W)."""
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    proj = project_gaussians(xyz, scales, quats, opacity, sh_coeffs, cam,
                             static, sh_degree, align=align,
                             scale_modifier=scale_modifier)
    ys = jnp.arange(static.height, dtype=jnp.float32)
    xs = jnp.arange(static.width, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)  # (H, W)
    out, T_final = composite_pixels(proj, X.reshape(-1), Y.reshape(-1), bg)
    img = out.reshape(static.height, static.width, 3).transpose(2, 0, 1)
    return {
        "render": img,
        "T_final": T_final.reshape(static.height, static.width),
        "radii": proj.radius,
        "depth_gaussians": proj.depth,
    }
