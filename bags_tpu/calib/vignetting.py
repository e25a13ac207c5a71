"""Radial vignetting model.

Capability parity with `/root/reference/scene/vignetting.py:26-110`
(`VignettingModel`): learnable coefficients a_k and exponents beta_k
(n_terms=4) building the mask 1 - clamp(sum_k a_k * arctan(r)^beta_k, 0, 1),
with r the unnormalized pixel distance from the image center; enabled after
`--start_vignetting` iterations (train.py:265-273). Also the standalone
interpolated radial mask (vignetting.py:3-24).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VignettingParams:
    a_k: jnp.ndarray     # (n_terms,), init 0.01
    beta_k: jnp.ndarray  # (n_terms,), init linspace(2, 8)

    @staticmethod
    def create(n_terms: int = 4) -> "VignettingParams":
        return VignettingParams(
            a_k=jnp.full((n_terms,), 0.01, jnp.float32),
            beta_k=jnp.asarray(np.linspace(2.0, 8.0, n_terms), jnp.float32))


def vignetting_mask(params: VignettingParams, height: int, width: int
                    ) -> jnp.ndarray:
    """(H, W) multiplicative mask (VignettingModel.forward, :85-110)."""
    yc, xc = height / 2.0, width / 2.0
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)
    r = jnp.sqrt((X - xc) ** 2 + (Y - yc) ** 2)
    rn = jnp.where(r == 0, 1.0, jnp.arctan(r))
    mask = jnp.sum(params.a_k[:, None, None]
                   * rn[None] ** params.beta_k[:, None, None], axis=0)
    return 1.0 - jnp.clip(mask, 0.0, 1.0)


def interpolated_radial_mask(scaling_factors: jnp.ndarray, height: int,
                             width: int) -> jnp.ndarray:
    """Piecewise-linear radial mask from per-ring scale factors
    (`create_differentiable_vignetting_mask`, vignetting.py:3-24)."""
    n = scaling_factors.shape[0]
    ys = jnp.arange(height, dtype=jnp.float32) - (height - 1) / 2
    xs = jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2
    X, Y = jnp.meshgrid(xs, ys)
    d = jnp.sqrt(X ** 2 + Y ** 2)
    dn = d / jnp.max(d) * (n - 1)
    lo = jnp.clip(jnp.floor(dn).astype(jnp.int32), 0, n - 2)
    hi = lo + 1
    w_hi = dn - lo
    return (1 - w_hi) * scaling_factors[lo] + w_hi * scaling_factors[hi]
