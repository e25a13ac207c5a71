"""Photometric losses: L1, L2, windowed SSIM.

Capability parity with `/root/reference/utils/loss_utils.py:18-76` — the
11x11 Gaussian-window (sigma 1.5) SSIM with C1=0.01^2, C2=0.03^2, computed
with a depthwise conv and SAME zero padding, and the training objective
(1 - lambda) * L1 + lambda * (1 - SSIM) (`train.py:325`,
`lambda_dssim = 0.2`). TPU note: the depthwise conv is separable; two 1-D
convs keep it bandwidth-bound instead of 121-tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 11x11 blur as static shifted adds. img: (C, H, W).

    TPU note: grouped `conv_general_dilated` triggers pathological TPU-XLA
    compile times in its backward pass (minutes at 256x256); eleven shifted
    multiply-adds per axis compile instantly, fuse into one VPU loop, and
    transpose cleanly. Zero 'SAME' padding matches the torch conv2d
    semantics of the reference (loss_utils.py:56-62)."""
    k = window.shape[0]
    half = k // 2
    pad_h = jnp.pad(img, ((0, 0), (half, half), (0, 0)))
    h = img.shape[1]
    img = sum(window[i] * jax.lax.slice_in_dim(pad_h, i, i + h, axis=1)
              for i in range(k))
    pad_w = jnp.pad(img, ((0, 0), (0, 0), (half, half)))
    w = img.shape[2]
    return sum(window[i] * jax.lax.slice_in_dim(pad_w, i, i + w, axis=2)
               for i in range(k))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True) -> jnp.ndarray:
    """Windowed SSIM matching `_ssim` (loss_utils.py:56-76). imgs: (C, H, W).

    The five moment maps ride ONE stacked blur (blur is linear): a single
    22-shift separable pass over (5C, H, W) instead of five (C, H, W)
    passes — fewer ops for XLA to schedule, identical math."""
    window = jnp.asarray(_gaussian_window(window_size))
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    b = _blur(stacked, window)
    mu1, mu2 = b[:c], b[c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[2 * c:3 * c] - mu1_sq
    sigma2_sq = b[3 * c:4 * c] - mu2_sq
    sigma12 = b[4 * c:5 * c] - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map, (-2, -1))


def photometric_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                     lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1-SSIM) — `train.py:325`."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + \
        lambda_dssim * (1.0 - ssim(pred, gt))


def masked_photometric_loss(pred, gt, mask, lambda_dssim: float = 0.2):
    """Masked variant used by fisheye/cubemap training (`train.py:275-309`):
    both images are pre-multiplied by the validity mask, then the plain
    L1-mean / SSIM objective is applied."""
    return photometric_loss(pred * mask, gt * mask, lambda_dssim)


def kl_divergence(rho: float, rho_hat: jnp.ndarray) -> jnp.ndarray:
    """Sparsity KL term (`loss_utils.py:22-26`): mean KL between a target
    activation rate rho and mean sigmoid activations."""
    rho_hat = jnp.mean(jax.nn.sigmoid(rho_hat), axis=0)
    return jnp.mean(rho * jnp.log(rho / (rho_hat + 1e-5))
                    + (1 - rho) * jnp.log((1 - rho) / (1 - rho_hat + 1e-5)))
