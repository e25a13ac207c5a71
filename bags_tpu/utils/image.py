"""Differentiable image resampling ops (grid_sample / resize / crop).

TPU-native replacements for the torch ops the reference leans on:
`F.grid_sample` (utils/util_distortion.py:288-308, cubemap_utils.py),
`F.interpolate` (util_distortion.py:285,299), and the grid-sample-based
`center_crop` (util_distortion.py:58-77). Implemented as gather-based
bilinear sampling — differentiable w.r.t. both image and grid, with
`align_corners=True` + zeros padding matching the reference's calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sample `image` (C, H, W) at `grid` (Ho, Wo, 2) of xy coords
    in [-1, 1]. Out-of-range samples are zero (padding_mode='zeros')."""
    c, h, w = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def gather(xi, yi):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = image[:, yc, xc]                      # (C, Ho, Wo)
        return vals * inside.astype(image.dtype)[None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    tx = tx[None]
    ty = ty[None]
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    (half-pixel centers). x: (..., H, W)."""
    return jax.image.resize(x, x.shape[:-2] + tuple(out_hw), method="linear")


def center_crop_resample(image: jnp.ndarray, target_h: int, target_w: int
                         ) -> jnp.ndarray:
    """The reference's grid-sample center crop (util_distortion.py:58-77):
    samples a centered target_h x target_w window with align_corners=True."""
    c, h, w = image.shape
    start_y = (h - target_h) // 2
    start_x = (w - target_w) // 2
    ys = jnp.linspace(start_y, start_y + target_h - 1, target_h)
    xs = jnp.linspace(start_x, start_x + target_w - 1, target_w)
    gy = 2.0 * ys / (h - 1) - 1.0
    gx = 2.0 * xs / (w - 1) - 1.0
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
    return grid_sample(image, grid, align_corners=True)


def linear_to_srgb(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Linear -> sRGB transfer (`utils/general_utils.py:209` semantics)."""
    x = jnp.clip(x, eps, None)
    return jnp.where(x <= 0.0031308, 12.92 * x,
                     1.055 * x ** (1.0 / 2.4) - 0.055)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x <= 0.04045, x / 12.92,
                     ((x + 0.055) / 1.055) ** 2.4)


def depth_to_normal(depth: jnp.ndarray, focal: float | None = None
                    ) -> jnp.ndarray:
    """Normals from a depth map by central differences, reference
    `depth2normal` semantics (`utils/general_utils.py:225-244`): replicate-pad
    edges, scale the finite differences by focal/depth, append a unit z and
    normalize. depth: (H, W) -> (3, H, W)."""
    h, w = depth.shape
    if focal is None:
        focal = w / 2.0 / float(np.tan(np.pi / 6.0))
    dp = jnp.pad(depth, 1, mode="edge")
    dzdx = 0.5 * (dp[1:-1, 2:] - dp[1:-1, :-2])
    dzdy = 0.5 * (dp[2:, 1:-1] - dp[:-2, 1:-1])
    n_xy = jnp.stack([dzdx, dzdy], axis=0) / (depth[None] + 1e-10) * focal
    n = jnp.concatenate([n_xy, jnp.ones_like(depth)[None]], axis=0)
    return n / jnp.clip(jnp.linalg.norm(n, axis=0, keepdims=True), 1e-12)
