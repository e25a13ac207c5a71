"""Invertible residual network (i-ResNet) for lens-distortion fields.

Capability parity with `/root/reference/scene/iresnet.py` (FrEIA GraphINN of
5 `IResNetLayer` blocks, internal width 512 x 4 layers, Lipschitz-corrected):
an invertible map R^2 -> R^2 between "inside-lens" (sensor) and
"outside-lens" (ideal frustum) ray coordinates, trained by gradient descent
and inverted by fixed-point iteration.

From-scratch JAX design: each block is y = x + g(x) where g is an MLP whose
linear layers are spectrally normalized to a Lipschitz bound < 1 (power
iteration, applied functionally at call time so the constraint holds under
optimization — the analogue of FrEIA's `lipschitz_correction`). The inverse
runs the contraction x <- y - g(x), which converges geometrically; a
`test_inverse`-style check lives in the test suite (iresnet.py:44-53).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

N_BLOCKS = 5
HIDDEN = 512
N_LAYERS = 4          # hidden layers per block (internal_size x 4)
LIPSCHITZ = 0.9
INVERSE_ITERS = 30
POWER_ITERS = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IResNetParams:
    """weights[b][l]: (in, out); biases[b][l]: (out,); u[b][l]: power-iter
    vectors (persistent left singular estimates)."""

    weights: List[List[jnp.ndarray]]
    biases: List[List[jnp.ndarray]]
    u_vecs: List[List[jnp.ndarray]]


def init_iresnet_params(key=None, input_dim: int = 2,
                        hidden: int = HIDDEN, n_blocks: int = N_BLOCKS,
                        n_layers: int = N_LAYERS, seed: int = 0
                        ) -> IResNetParams:
    rng = np.random.default_rng(seed)
    weights, biases, u_vecs = [], [], []
    for _ in range(n_blocks):
        dims = [input_dim] + [hidden] * n_layers + [input_dim]
        ws, bs, us = [], [], []
        for i in range(len(dims) - 1):
            fan_in = dims[i]
            w = rng.normal(0, 1.0 / np.sqrt(fan_in),
                           (dims[i], dims[i + 1])).astype(np.float32)
            ws.append(jnp.asarray(w))
            bs.append(jnp.zeros((dims[i + 1],), jnp.float32))
            us.append(jnp.asarray(
                rng.normal(size=(dims[i],)).astype(np.float32)))
        weights.append(ws)
        biases.append(bs)
        u_vecs.append(us)
    return IResNetParams(weights=weights, biases=biases, u_vecs=u_vecs)


def _spectral_normalize(w: jnp.ndarray, u: jnp.ndarray,
                        target: float) -> jnp.ndarray:
    """Scale w so its spectral norm is <= target (power iteration; the u
    vectors are fixed buffers — a few iterations per call track sigma well
    enough since w changes slowly under training)."""
    v = None
    for _ in range(POWER_ITERS):
        v = w.T @ u
        v = v / jnp.clip(jnp.linalg.norm(v), 1e-12)
        u = w @ v
        u = u / jnp.clip(jnp.linalg.norm(u), 1e-12)
    sigma = u @ (w @ v)
    scale = jnp.minimum(1.0, target / jnp.clip(jnp.abs(sigma), 1e-12))
    return w * scale


def _block_residual(params: IResNetParams, b: int, x: jnp.ndarray
                    ) -> jnp.ndarray:
    """g_b(x): Lipschitz-bounded MLP residual. x: (..., 2)."""
    n = len(params.weights[b])
    per_layer = LIPSCHITZ ** (1.0 / n)
    h = x
    for i in range(n):
        w = _spectral_normalize(params.weights[b][i], params.u_vecs[b][i],
                                per_layer)
        h = h @ w + params.biases[b][i]
        if i < n - 1:
            h = jax.nn.elu(h)
    return h


def iresnet_forward(params: IResNetParams, x: jnp.ndarray,
                    sensor_to_frustum: bool = True) -> jnp.ndarray:
    """Apply the INN. sensor_to_frustum=True runs the forward composition;
    False runs the exact inverse by fixed-point iteration
    (`iResNet.forward`, scene/iresnet.py:38-42)."""
    n_blocks = len(params.weights)
    if sensor_to_frustum:
        for b in range(n_blocks):
            x = x + _block_residual(params, b, x)
        return x
    for b in reversed(range(n_blocks)):
        y = x

        # remat: under reverse-mode AD the fori_loop is scan-converted and
        # would otherwise store every iteration's 512-wide MLP activations
        # (INVERSE_ITERS x n_pts x HIDDEN x n_layers floats — 21 GB at a
        # 100x100 control grid); checkpointing the residual keeps only the
        # (n_pts, 2) carries and recomputes g in the backward.
        g_ckpt = jax.checkpoint(
            lambda xk, b=b: _block_residual(params, b, xk))

        def body(_, xk):
            return y - g_ckpt(xk)

        x = jax.lax.fori_loop(0, INVERSE_ITERS, body, y)
    return x
