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
import functools
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


def _solve_fixed_point(params: IResNetParams, b: int, y: jnp.ndarray,
                       tol: float = 1e-6) -> jnp.ndarray:
    """x* = y - g_b(x*) by damped-free fixed-point iteration with early
    exit (the map is a contraction: ||J_g|| <= LIPSCHITZ < 1)."""
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(y)))

    def cond(c):
        i, _, err = c
        return jnp.logical_and(i < INVERSE_ITERS, err > tol * scale)

    def body(c):
        i, x, _ = c
        xn = y - _block_residual(params, b, x)
        return i + 1, xn, jnp.max(jnp.abs(xn - x))

    _, x, _ = jax.lax.while_loop(cond, body, (0, y, jnp.inf))
    return x


def _block_inverse_fwd(b, params, y):
    x = _solve_fixed_point(params, b, y)
    return x, (params, x)


def _block_inverse_bwd(b, res, v):
    """Implicit-function-theorem VJP of the fixed point x = y - g(x):
    solve the ADJOINT fixed point u = v - J_g^T u (same contraction rate),
    then theta_cot = -g_theta^T u and y_cot = u — instead of
    differentiating through every forward iteration (which costs
    O(INVERSE_ITERS) MLP VJPs and dominated the whole fisheye step)."""
    params, x = res
    _, vjp_fn = jax.vjp(lambda p, xx: _block_residual(p, b, xx), params, x)
    scale = jnp.maximum(1.0, jnp.max(jnp.abs(v)))

    def cond(c):
        i, _, err = c
        return jnp.logical_and(i < INVERSE_ITERS, err > 1e-6 * scale)

    def body(c):
        i, u, _ = c
        un = v - vjp_fn(u)[1]
        return i + 1, un, jnp.max(jnp.abs(un - u))

    _, u, _ = jax.lax.while_loop(cond, body, (0, v, jnp.inf))
    p_cot = jax.tree_util.tree_map(lambda t: -t, vjp_fn(u)[0])
    return p_cot, u


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _block_inverse(b: int, params: IResNetParams, y: jnp.ndarray
                   ) -> jnp.ndarray:
    return _solve_fixed_point(params, b, y)


_block_inverse.defvjp(_block_inverse_fwd, _block_inverse_bwd)


def iresnet_forward(params: IResNetParams, x: jnp.ndarray,
                    sensor_to_frustum: bool = True) -> jnp.ndarray:
    """Apply the INN. sensor_to_frustum=True runs the forward composition;
    False runs the exact inverse by fixed-point iteration
    (`iResNet.forward`, scene/iresnet.py:38-42) with an
    implicit-differentiation custom VJP."""
    n_blocks = len(params.weights)
    if sensor_to_frustum:
        for b in range(n_blocks):
            x = x + _block_residual(params, b, x)
        return x
    for b in reversed(range(n_blocks)):
        x = _block_inverse(b, params, x)
    return x
