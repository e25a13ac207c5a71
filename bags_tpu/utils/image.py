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


# banded-warp output-row band used by the calibrated train paths
# (b=32 measured fastest on-chip, tools/warpbench.py)
WARP_BAND = 32


def required_ky(grid: jnp.ndarray, image_h: int, band: int = 8,
                align_corners: bool = True) -> int:
    """Source-row window height `banded_warp` needs for this grid: the max
    over output row bands of the in-image source-row span. Run once at
    setup on the initial flow field; pass the result (with margin — the
    lens field evolves during training) as banded_warp's `ky`."""
    gy = np.asarray(grid[..., 1], np.float32)
    h = image_h
    fy = (gy + 1.0) * 0.5 * (h - 1) if align_corners else \
        ((gy + 1.0) * h - 1.0) * 0.5
    ho = fy.shape[0]
    nb = -(-ho // band)
    fy = np.pad(fy, ((0, nb * band - ho), (0, 0)), constant_values=h + 10.0)
    fy = fy.reshape(nb, -1)
    valid = (fy > -1.0) & (fy < h)
    lo = np.floor(np.min(np.where(valid, fy, h), axis=1))
    hi = np.floor(np.max(np.where(valid, fy, -1.0), axis=1)) + 1.0
    return int(max(np.max(np.minimum(hi, h - 1) - np.maximum(lo, 0) + 1),
                   2))


def banded_warp(image: jnp.ndarray, grid: jnp.ndarray, ky: int,
                band: int = 8, align_corners: bool = True,
                precision=jax.lax.Precision.HIGHEST
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`grid_sample` without gathers — the TPU-native lens warp.

    XLA lowers the 4-tap advanced-index gather in `grid_sample` to a
    scalar-core gather (~8 ns/element) and its VJP to scatter-adds; at
    full resolution that op — not HBM, not the MXU — dominates the whole
    calibrated train step. This formulation exploits the lens flow's row
    coherence instead: output rows are processed in bands of `band`; each
    band's in-image source rows span a bounded window (height `ky`,
    measured by `required_ky`) that is dynamic-sliced out, and bilinear
    sampling becomes two tent-weight contractions

        out[p] = sum_k relu(1-|fy_p-row_k|) * sum_x relu(1-|fx_p-x|) * win[k,x]

    where the inner sum is a (P, W) x (C*ky, W)^T matmul on the MXU
    (the tent functions ARE the bilinear weights: 2 nonzero taps each, so
    the contraction is numerically the 4-tap formula with exact zeros
    elsewhere). Zeros padding falls out for free — out-of-image taps
    never overlap a window row/column. The VJP is matmuls again (no
    scatters): d_window flows through the einsum transpose and
    accumulates into d_image via the dynamic-slice transpose.

    Returns (warped (C, Ho, Wo), overflow). `overflow` counts in-image
    source rows that fell outside a band's ky-window (result: those taps
    contributed zero — WRONG values). It is 0 whenever ky >= the true
    span; train loops should monitor it like the raster's n_dropped and
    re-trace with a larger ky if it ever fires.
    """
    c, h, w = image.shape
    ho, wo = grid.shape[:2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    # non-finite coords (cubemap face grids have 0/0 at ray singularities)
    # sample far outside -> exact zeros, matching the gather warp's
    # inside-test; without this a NaN coordinate would poison its pixel's
    # whole tent row through the matmul
    fx = jnp.where(jnp.isfinite(fx), fx, -1e4)
    fy = jnp.where(jnp.isfinite(fy), fy, -1e4)

    kyc = min(ky, h)
    nb = -(-ho // band)
    pad = nb * band - ho
    # padded rows are invalid (fy far outside) -> all-zero output, trimmed
    fx_b = jnp.pad(fx, ((0, pad), (0, 0))).reshape(nb, band * wo)
    fy_b = jnp.pad(fy, ((0, pad), (0, 0)),
                   constant_values=h + 10.0).reshape(nb, band * wo)
    xs_iota = jnp.arange(w, dtype=jnp.float32)
    ks_iota = jnp.arange(kyc, dtype=jnp.float32)

    # remat: the tent-weight matrices (wx is (band*wo, W) per band) are
    # cheap iota math — recompute them in the backward instead of letting
    # the scan stack them across bands (nb x band*wo x W saved residuals
    # OOM at garden scale).
    @jax.checkpoint
    def band_fn(fx_p, fy_p):                # (band*wo,)
        valid = (fy_p > -1.0) & (fy_p < h)
        y_min = jnp.floor(jnp.min(jnp.where(valid, fy_p, float(h))))
        y_max = jnp.floor(jnp.max(jnp.where(valid, fy_p, -1.0))) + 1.0
        y0 = jnp.clip(y_min, 0.0, float(max(h - kyc, 0))).astype(jnp.int32)
        win = jax.lax.dynamic_slice(image, (0, y0, 0), (c, kyc, w))
        # tent = the bilinear kernel: relu(1 - |fx - x|) is exactly
        # (1-tx) at x0=floor(fx) and tx at x0+1, zero elsewhere
        wx = jax.nn.relu(1.0 - jnp.abs(fx_p[:, None] - xs_iota[None, :]))
        rows = y0.astype(jnp.float32) + ks_iota
        wy = jax.nn.relu(1.0 - jnp.abs(fy_p[:, None] - rows[None, :]))
        t = jnp.einsum("px,ckx->pck", wx, win, precision=precision)
        out = jnp.einsum("pck,pk->cp", t, wy, precision=precision)
        over = jnp.maximum(
            jnp.minimum(y_max, float(h - 1))
            - (y0.astype(jnp.float32) + (kyc - 1)), 0.0)
        return out, over

    def body(_, xs):
        return None, band_fn(*xs)

    _, (outs, over) = jax.lax.scan(body, None, (fx_b, fy_b))
    warped = outs.reshape(nb, c, band, wo).transpose(1, 0, 2, 3)
    warped = warped.reshape(c, nb * band, wo)[:, :ho]
    return warped, jnp.sum(over).astype(jnp.int32)


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
