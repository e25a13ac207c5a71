"""Image quality metrics: PSNR / SSIM / LPIPS.

Capability parity with `/root/reference/utils/image_utils.py:19` (psnr),
`utils/loss_utils.py:45-76` (ssim — re-exported from train.losses), and
`utils/lpipsPyTorch/` (LPIPS with AlexNet/VGG features).

LPIPS note: the reference downloads torchvision pretrained backbones at
runtime; this image has no torchvision and no network egress, so `lpips`
requires an explicit local weights file (a .npz of conv weights + linear
calibration). Without one it returns NaN and flags `available=False` rather
than silently reporting an uncalibrated metric.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..train.losses import ssim  # noqa: F401  (re-export)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """20 log10(1 / sqrt(mse)) per image (image_utils.py:19), images in
    [0,1], shape (..., C, H, W); reduces over the last three axes."""
    mse = jnp.mean((img1 - img2) ** 2, axis=(-3, -2, -1))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


class Lpips:
    """LPIPS from a local weights bundle (VGG16-style feature stack).

    weights npz layout: conv{i}_w/conv{i}_b for the backbone convs and
    lin{k}_w for the per-layer linear calibration, as exported from the
    standard LPIPS release. If no file is found, `available` is False and
    __call__ returns NaN.
    """

    def __init__(self, weights_path: Optional[str] = None):
        weights_path = weights_path or os.environ.get("BAGS_TPU_LPIPS_WEIGHTS")
        self.available = bool(weights_path and os.path.exists(weights_path))
        if self.available:
            if os.path.isdir(weights_path):
                # Directory of the two untouched upstream torch files
                # (torchvision vgg16*.pth + LPIPS v0.1 vgg.pth), parsed
                # without torch — see eval/lpips_weights.py.
                from .lpips_weights import load_official_dir
                data = load_official_dir(weights_path)
                names = list(data)
            else:
                data = np.load(weights_path)
                names = list(data.files)
            self.params = {k: jnp.asarray(data[k]) for k in names}
            self.cfg = [int(k.split("_")[0][4:]) for k in names
                        if k.endswith("_w") and k.startswith("conv")]

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        if not self.available:
            return jnp.asarray(jnp.nan)
        return _lpips_forward(self.params, img1, img2)


def _normalize_input(img):
    # LPIPS input scaling: [0,1] -> [-1,1], then ImageNet-ish normalization.
    shift = jnp.array([-0.030, -0.088, -0.188]).reshape(3, 1, 1)
    scale = jnp.array([0.458, 0.448, 0.450]).reshape(3, 1, 1)
    return ((img * 2.0 - 1.0) - shift) / scale


def _lpips_forward(params, img1, img2):
    def features(x):
        feats = []
        h = _normalize_input(x)[None]
        i = 0
        while f"conv{i}_w" in params:
            w, b = params[f"conv{i}_w"], params[f"conv{i}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW")) + b.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
            # LPIPS taps the ReLU output BEFORE any pooling.
            if f"tap_{i}" in params:
                feats.append(h)
            if f"pool_after_{i}" in params:
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            i += 1
        return feats

    f1, f2 = features(img1), features(img2)
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.clip(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.clip(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        w = params[f"lin{k}_w"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total
