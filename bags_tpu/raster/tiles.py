"""Pure-jnp tiled compositor: differentiable fallback & oracle for the Pallas path.

Implements exactly the per-pixel semantics of `reference.py` but over the
sorted per-tile instance lists from `binning.py`, chunked with `lax.scan` +
`jax.checkpoint` so memory stays bounded and XLA autodiff works end-to-end.
The Pallas forward/backward kernels (`pallas_raster.py`) are validated against
this module; it is also the CPU path when Pallas is unavailable.

Layout note (TPU-first): pixels of a 16x16 tile are flattened to a 256-vector
(2 x 128 lanes); per-chunk alpha matrices are (K, 256) so the color
accumulation `color^T @ weights` is an MXU contraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE_H, TILE_W

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
NPIX = TILE_W * TILE_H


class TileImage(NamedTuple):
    color: jnp.ndarray    # (T, NPIX, 3)
    t_final: jnp.ndarray  # (T, NPIX)
    depth: jnp.ndarray | None = None  # (T, NPIX) expected depth sum(w_i d_i)


def tile_pixel_coords(tiles_x: int, tiles_y: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center coordinates for every tile: (T, NPIX) x/y arrays."""
    t = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    off = jnp.arange(NPIX, dtype=jnp.float32)
    ox = off % TILE_W
    oy = off // TILE_W
    px = tx[:, None] * TILE_W + ox[None, :]
    py = ty[:, None] * TILE_H + oy[None, :]
    return px, py


def _chunk_alpha(mean2d, conic, opacity, px, py):
    """alpha for a chunk: inputs (T,K,·) and pixel coords (T,NPIX) -> (T,K,NPIX)."""
    dx = px[:, None, :] - mean2d[..., 0:1]
    dy = py[:, None, :] - mean2d[..., 1:2]
    power = (-0.5 * (conic[..., 0:1] * dx * dx + conic[..., 2:3] * dy * dy)
             - conic[..., 1:2] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None] * jnp.exp(power))
    ok = (alpha >= ALPHA_MIN) & (power <= 0.0)
    return jnp.where(ok, alpha, 0.0)


def composite_tiles_jnp(
    mean2d_s: jnp.ndarray,   # (M, 2) instance-sorted screen means
    conic_s: jnp.ndarray,    # (M, 3)
    color_s: jnp.ndarray,    # (M, 3)
    opacity_s: jnp.ndarray,  # (M,)
    depth_s: jnp.ndarray | None,  # (M,) view depths (None = skip)
    tile_start: jnp.ndarray,  # (T,)
    tile_count: jnp.ndarray,  # (T,)
    tiles_x: int,
    tiles_y: int,
    bg: jnp.ndarray,          # (3,)
    max_per_tile: int = 4096,
    chunk: int = 64,
) -> TileImage:
    M = mean2d_s.shape[0]
    num_tiles = tiles_x * tiles_y
    px, py = tile_pixel_coords(tiles_x, tiles_y)
    n_chunks = -(-max_per_tile // chunk)

    def step(carry, k):
        acc, t_run, done = carry
        base = tile_start + k * chunk
        offs = jnp.arange(chunk, dtype=jnp.int32)
        idx = base[:, None] + offs[None, :]                     # (T, K)
        in_range = offs[None, :] + k * chunk < tile_count[:, None]
        idx = jnp.clip(idx, 0, M - 1)

        m2 = jnp.where(in_range[..., None], mean2d_s[idx], 0.0)
        cn = jnp.where(in_range[..., None], conic_s[idx], 0.0)
        cl = color_s[idx]
        if depth_s is not None:
            cl = jnp.concatenate([cl, depth_s[idx][..., None]], axis=-1)
        op = jnp.where(in_range, opacity_s[idx], 0.0)

        a = _chunk_alpha(m2, cn, op, px, py)                    # (T, K, NPIX)
        a = jnp.where(in_range[..., None], a, 0.0)
        one_minus = 1.0 - a
        # Exclusive within-chunk transmittance, scaled by the running T.
        cp = jnp.cumprod(one_minus, axis=1)
        t_before = t_run[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        kill = (a > 0) & (t_before * one_minus < T_EPS)
        done_before = (jnp.cumsum(kill.astype(jnp.int32), axis=1) > 0) \
            | done[:, None, :]
        include = jax.lax.stop_gradient((a > 0) & ~done_before)

        a_inc = jnp.where(include, a, 0.0)
        om_inc = 1.0 - a_inc
        cp_inc = jnp.cumprod(om_inc, axis=1)
        t_before_inc = t_run[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp_inc[:, :1]), cp_inc[:, :-1]], axis=1)
        w = a_inc * t_before_inc                                # (T, K, NPIX)
        acc = acc + jnp.einsum("tkp,tkc->tpc", w, cl,
                       precision=jax.lax.Precision.HIGHEST)
        t_run = t_run * cp_inc[:, -1, :]
        done = done | jnp.any(kill, axis=1)
        return (acc, t_run, done), None

    n_ch = 3 if depth_s is None else 4
    init = (
        jnp.zeros((num_tiles, NPIX, n_ch), jnp.float32),
        jnp.ones((num_tiles, NPIX), jnp.float32),
        jnp.zeros((num_tiles, NPIX), bool),
    )
    (acc, t_run, _), _ = jax.lax.scan(
        jax.checkpoint(step), init, jnp.arange(n_chunks, dtype=jnp.int32))
    color = acc[..., :3] + t_run[..., None] * bg[None, None, :]
    depth = acc[..., 3] if depth_s is not None else None
    return TileImage(color=color, t_final=t_run, depth=depth)


def tiles_to_image(tile_color: jnp.ndarray, tiles_x: int, tiles_y: int,
                   width: int, height: int) -> jnp.ndarray:
    """(T, NPIX, 3) -> (3, H, W), cropping tile padding."""
    img = tile_color.reshape(tiles_y, tiles_x, TILE_H, TILE_W, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(3, tiles_y * TILE_H,
                                               tiles_x * TILE_W)
    return img[:, :height, :width]


def image_to_tiles(img: jnp.ndarray, tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """(3, H, W) -> (T, NPIX, 3), zero-padding to tile multiples."""
    c, h, w = img.shape
    ph, pw = tiles_y * TILE_H - h, tiles_x * TILE_W - w
    img = jnp.pad(img, ((0, 0), (0, ph), (0, pw)))
    img = img.reshape(c, tiles_y, TILE_H, tiles_x, TILE_W)
    return img.transpose(1, 3, 2, 4, 0).reshape(tiles_y * tiles_x, NPIX, c)
