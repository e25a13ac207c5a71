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
    """LPIPS from a local weights bundle (vgg16 or alexnet backbone).

    weights npz layout: conv{i}_w/conv{i}_b for the backbone convs,
    optional conv{i}_stride / conv{i}_pad / pool_after_{i}[_k/_s] geometry
    keys (absent = the VGG16 defaults), and lin{k}_w for the per-layer
    linear calibration, as exported from the standard LPIPS release
    (tools/convert_lpips.py, eval/lpips_weights.py). `net` selects the
    backbone pair when `weights_path` is a directory of upstream .pth
    files ('alex' = the reference's in-loop default, 'vgg' = its offline
    metrics.py choice); npz bundles are self-describing. If no file is
    found, `available` is False and __call__ returns NaN (callers
    annotate it as "n/a" rather than printing the NaN).
    """

    def __init__(self, weights_path: Optional[str] = None,
                 net: Optional[str] = None):
        weights_path = weights_path or os.environ.get("BAGS_TPU_LPIPS_WEIGHTS")
        self.available = bool(weights_path and os.path.exists(weights_path))
        self.net = None
        if self.available:
            if os.path.isdir(weights_path):
                # Directory of untouched upstream torch files (torchvision
                # vgg16*/alexnet* backbone + LPIPS v0.1 linear), parsed
                # without torch — see eval/lpips_weights.py. `net` picks
                # the backbone when the directory holds both.
                from .lpips_weights import load_official_dir
                data = load_official_dir(weights_path, net=net)
                names = list(data)
            else:
                # npz bundles are self-describing (stride/pad/pool keys);
                # `net` is ignored.
                data = np.load(weights_path)
                names = list(data.files)
            self.params = {k: jnp.asarray(data[k]) for k in names
                           if k.endswith(("_w", "_b"))}
            # Static layer geometry, read host-side so the forward stays
            # jittable: per conv (stride, pad-or-None-for-SAME, tapped,
            # pool (k, s) or None). Absent keys mean the VGG16 defaults.
            n_conv = sum(1 for k in names
                         if k.startswith("conv") and k.endswith("_w"))
            arch = []
            for i in range(n_conv):
                if f"pool_after_{i}_k" in names:
                    pool = (int(data[f"pool_after_{i}_k"]),
                            int(data[f"pool_after_{i}_s"]))
                elif f"pool_after_{i}" in names:
                    pool = (2, 2)
                else:
                    pool = None
                arch.append((
                    int(data[f"conv{i}_stride"])
                    if f"conv{i}_stride" in names else 1,
                    int(data[f"conv{i}_pad"])
                    if f"conv{i}_pad" in names else None,
                    f"tap_{i}" in names,
                    pool))
            self.arch = tuple(arch)
            self.net = ("alex" if any(s != 1 for s, _, _, _ in arch)
                        else "vgg")

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        if not self.available:
            return jnp.asarray(jnp.nan)
        return _lpips_forward(self.params, self.arch, img1, img2)


def _normalize_input(img):
    # LPIPS input scaling: [0,1] -> [-1,1], then ImageNet-ish normalization.
    shift = jnp.array([-0.030, -0.088, -0.188]).reshape(3, 1, 1)
    scale = jnp.array([0.458, 0.448, 0.450]).reshape(3, 1, 1)
    return ((img * 2.0 - 1.0) - shift) / scale


def _lpips_forward(params, arch, img1, img2):
    def features(x):
        feats = []
        h = _normalize_input(x)[None]
        for i, (stride, pad, tapped, pool) in enumerate(arch):
            w, b = params[f"conv{i}_w"], params[f"conv{i}_b"]
            padding = "SAME" if pad is None else [(pad, pad), (pad, pad)]
            h = jax.lax.conv_general_dilated(
                h, w, (stride, stride), padding,
                dimension_numbers=("NCHW", "OIHW", "NCHW")) + b.reshape(1, -1, 1, 1)
            h = jax.nn.relu(h)
            # LPIPS taps the ReLU output BEFORE any pooling.
            if tapped:
                feats.append(h)
            if pool is not None:
                pk, ps = pool
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max,
                    (1, 1, pk, pk), (1, 1, ps, ps), "VALID")
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
