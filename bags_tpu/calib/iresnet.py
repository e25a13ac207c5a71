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
NEWTON_ITERS = 12
POWER_ITERS = 5


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
    """Scale w so its spectral norm is <= target.

    The power iteration runs under stop_gradient (Miyato-style: u, v are
    CONSTANTS of the step; sigma = u^T W v stays differentiable in W).
    Letting gradients flow through the iteration also hands the optimizer
    the u buffers themselves — training then pushes u AWAY from the top
    singular vector to relax the constraint, sigma under-estimates, the
    per-layer Lipschitz bound silently breaks, and the block residual
    stops being a contraction — which makes the lens INVERSE ill-posed
    and lens training chaotically unstable. stop_gradient gives u zero
    gradient, so Adam leaves the buffers untouched."""
    wc = jax.lax.stop_gradient(w)
    u = jax.lax.stop_gradient(u)
    v = None
    for _ in range(POWER_ITERS):
        v = wc.T @ u
        v = v / jnp.clip(jnp.linalg.norm(v), 1e-12)
        u = wc @ v
        u = u / jnp.clip(jnp.linalg.norm(u), 1e-12)
    sigma = u @ (w @ v)
    scale = jnp.minimum(1.0, target / jnp.clip(jnp.abs(sigma), 1e-12))
    return w * scale


def _norm_weights(params: IResNetParams, b: int):
    """Spectrally-normalized weights of block b, computed ONCE.

    Callers that evaluate the residual many times at different points
    (the Newton inverse: ~36 evals/block) must hoist this out of the
    evaluation loop — inlining a 5-power-iteration normalization chain
    into every eval produced a graph the TPU fusion cost model crashed
    on (SIGILL in TpuPriorityFusionQueue::NormalizedComputationCost),
    besides being redundant compute."""
    n = len(params.weights[b])
    per_layer = LIPSCHITZ ** (1.0 / n)
    return [_spectral_normalize(params.weights[b][i], params.u_vecs[b][i],
                                per_layer) for i in range(n)]


def _residual_from_ws(ws, biases, x: jnp.ndarray) -> jnp.ndarray:
    """g_b(x) from pre-normalized weights. x: (..., 2)."""
    h = x
    n = len(ws)
    for i in range(n):
        h = h @ ws[i] + biases[i]
        if i < n - 1:
            h = jax.nn.elu(h)
    return h


def _block_residual(params: IResNetParams, b: int, x: jnp.ndarray
                    ) -> jnp.ndarray:
    """g_b(x): Lipschitz-bounded MLP residual. x: (..., 2)."""
    return _residual_from_ws(_norm_weights(params, b), params.biases[b], x)


def _residual_and_jac2x2(ws, biases, x: jnp.ndarray):
    """g(x) AND its per-point 2x2 Jacobian in ONE sweep, by hand-rolled
    tangent propagation: t <- (t @ W) * elu'(z) per layer, with
    elu'(z) = exp(min(z, 0)) (exact, no select). Hand-rolled because
    `jax.jvp` through this MLP emits a tangent graph the v5e fusion cost
    model crashes on (SIGILL in TpuPriorityFusionQueue) — a single jitted
    jvp of `_residual_from_ws` reproduces it. Returns
    (g, j00, j01, j10, j11), j_ij = d g_i / d x_j, each (n,)."""
    n = len(ws)
    h = x
    t0 = t1 = None
    for i in range(n):
        z = h @ ws[i] + biases[i]
        if i == 0:
            # first tangent layer analytically: e_k @ W is just row k of
            # W — a matmul with a broadcast-constant operand is exactly
            # the degenerate node the fusion cost model chokes on
            t0 = jnp.broadcast_to(ws[i][0], z.shape)
            t1 = jnp.broadcast_to(ws[i][1], z.shape)
        else:
            t0 = t0 @ ws[i]
            t1 = t1 @ ws[i]
        if i < n - 1:
            dz = jnp.exp(jnp.minimum(z, 0.0))    # elu'
            h = jax.nn.elu(z)
            t0 = t0 * dz
            t1 = t1 * dz
        else:
            h = z
    return h, t0[..., 0], t1[..., 0], t0[..., 1], t1[..., 1]


def _block_jac2x2(params: IResNetParams, b: int, x: jnp.ndarray):
    out = _residual_and_jac2x2(_norm_weights(params, b), params.biases[b], x)
    return out[1:]


def _solve_fixed_point(params: IResNetParams, b: int, y: jnp.ndarray,
                       iters: int = None) -> jnp.ndarray:
    """x* with x* + g_b(x*) = y, by UNROLLED per-point 2x2 Newton.

    Plain Picard iteration x <- y - g(x) contracts at rate LIPSCHITZ=0.9:
    when the forward map is strongly compressive (a pre-fit lens maps
    frustum radius ~6.7 to sensor radius ~1.2), the inverse of a rim point
    sits ~50 units from the y-seed and 0.9^30 leaves an O(1) residual —
    a NON-converged inverse whose implicit-diff gradient (valid only AT
    the fixed point) is garbage and can blow up lens training. Newton with
    the exact 2x2 Jacobian (two JVPs/iter) converges from the same seed in
    <= 8 iterations on that case; I + J_g is uniformly invertible
    (singular values in [1-L, 1+L], L<1), so the step is well-defined and
    intrinsically trust-bounded (|s| <= |F|/(1-L)).

    The loop is UNROLLED (no while_loop / early exit): a fixed-trip flat
    graph costs the same as the old 30-eval Picard loop and sidesteps a
    libtpu fusion-pass crash (SIGILL in TpuPriorityFusionQueue) that the
    Newton body inside lax.while_loop triggered on v5e."""
    if iters is None:
        iters = NEWTON_ITERS if y.dtype == jnp.float32 else NEWTON_ITERS + 4
    ws = _norm_weights(params, b)       # hoisted: once per solve
    bs = params.biases[b]
    x = y
    for _ in range(iters):
        g, j00, j01, j10, j11 = _residual_and_jac2x2(ws, bs, x)
        f = x + g - y                                   # residual of F
        a = j00 + 1.0
        d = j11 + 1.0
        det = a * d - j01 * j10                         # >= (1-L)^2 > 0
        sx = (d * f[..., 0] - j01 * f[..., 1]) / det
        sy = (a * f[..., 1] - j10 * f[..., 0]) / det
        x = x - jnp.stack([sx, sy], axis=-1)
    return x


def _block_inverse_fwd(b, params, y):
    x = _solve_fixed_point(params, b, y)
    return x, (params, x)


def _block_inverse_bwd(b, res, v):
    """Implicit-function-theorem VJP of x + g(x) = y: the adjoint system
    (I + J_g)^T u = v is 2x2 per point — solve it EXACTLY (the linear
    fixed-point version needs ~130 iterations at L=0.9 for 1e-6), then
    theta_cot = -g_theta^T u and y_cot = u — instead of differentiating
    through every forward iteration (which costs O(iters) MLP VJPs and
    dominated the whole fisheye step)."""
    params, x = res
    _, vjp_fn = jax.vjp(lambda p, xx: _block_residual(p, b, xx), params, x)
    j00, j01, j10, j11 = _block_jac2x2(params, b, x)
    # solve (I + J)^T u = v per point: matrix [[1+j00, j10], [j01, 1+j11]]
    a = j00 + 1.0
    d = j11 + 1.0
    det = a * d - j01 * j10
    u = jnp.stack([(d * v[..., 0] - j10 * v[..., 1]) / det,
                   (a * v[..., 1] - j01 * v[..., 0]) / det], axis=-1)
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
