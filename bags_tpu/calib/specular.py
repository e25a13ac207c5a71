"""View-dependent specular color via anisotropic spherical Gaussians (ASG).

Capability parity with the reference's hybrid specular path
(`/root/reference/scene/specular_model.py`, `utils/spec_utils.py:72-160,
331-377`, `utils/quaternion_utils.py:52-86`): per-Gaussian `asg_feature`
(24-dim, stored on the splat when `--hybrid`) -> linear lift to 4x8 ASG
lobes (a[2], lambda, mu) -> rendering-equation encoding against predefined
omega frames -> small MLP with positional-encoded view directions -> RGB
offset added to the SH color (`gaussian_renderer/__init__.py:90-95`).

Pure-jnp pytree params; the whole evaluation is batched matmuls (MXU).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_THETA = 4
NUM_PHI = 8
ASG_FEATURE = 24
ASG_HIDDEN = NUM_THETA * NUM_PHI * 4   # a(2) + lambda + mu per lobe
VIEW_PE = 2
MLP_WIDTH = 128


def _spherical2cartesian(theta, phi):
    return np.stack([np.cos(phi) * np.sin(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(theta)], axis=-1)


def init_predefined_omega(n_theta: int = NUM_THETA, n_phi: int = NUM_PHI
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed ASG lobe frames (quaternion_utils.py:52-86): lobe directions
    omega, tangents omega_lambda (theta + pi/2), and bitangents omega_mu
    (omega_lambda rotated pi/2 about omega)."""
    thetas = np.linspace(0, np.pi, n_theta)
    phis = np.linspace(0, 2 * np.pi, n_phi)
    omega, om_la, om_mu = [], [], []
    for th in thetas:
        for ph in phis:
            o = _spherical2cartesian(th, ph)
            la = _spherical2cartesian(th + np.pi / 2, ph)
            # rotate la by pi/2 about o (Rodrigues; |o| = 1)
            mu = (la * np.cos(np.pi / 2) + np.cross(o, la) * np.sin(np.pi / 2)
                  + o * np.dot(o, la) * (1 - np.cos(np.pi / 2)))
            omega.append(o)
            om_la.append(la)
            om_mu.append(mu)
    return (np.array(omega, np.float32), np.array(om_la, np.float32),
            np.array(om_mu, np.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpecularParams:
    feat_w: jnp.ndarray   # (ASG_FEATURE, ASG_HIDDEN)
    feat_b: jnp.ndarray
    w1: jnp.ndarray       # MLP layers
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    w3: jnp.ndarray
    b3: jnp.ndarray


def init_specular_params(seed: int = 0) -> SpecularParams:
    rng = np.random.default_rng(seed)
    in_mlp = 2 * VIEW_PE * 3 + 3 + NUM_THETA * NUM_PHI * 2

    def lin(i, o):
        bound = 1.0 / np.sqrt(i)
        return (jnp.asarray(rng.uniform(-bound, bound, (i, o)).astype(np.float32)),
                jnp.asarray(rng.uniform(-bound, bound, (o,)).astype(np.float32)))

    feat_w, feat_b = lin(ASG_FEATURE, ASG_HIDDEN)
    w1, b1 = lin(in_mlp, MLP_WIDTH)
    w2, b2 = lin(MLP_WIDTH, MLP_WIDTH)
    w3, b3 = lin(MLP_WIDTH, 3)
    return SpecularParams(feat_w=feat_w, feat_b=feat_b, w1=w1, b1=b1,
                          w2=w2, b2=b2, w3=w3, b3=jnp.zeros_like(b3))


_OMEGA, _OMEGA_LA, _OMEGA_MU = init_predefined_omega()


def _positional_encoding(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    bands = 2.0 ** jnp.arange(freqs)
    pts = (x[..., None] * bands).reshape(x.shape[:-1] + (freqs * x.shape[-1],))
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def specular_color(params: SpecularParams, asg_features: jnp.ndarray,
                   viewdirs: jnp.ndarray) -> jnp.ndarray:
    """asg_features (N, 24), viewdirs (N, 3) unit -> (N, 3) RGB offset."""
    feat = asg_features @ params.feat_w + params.feat_b        # (N, 4*8*4)
    asg = feat.reshape(-1, NUM_THETA * NUM_PHI, 4)
    a, la, mu = asg[..., :2], asg[..., 2:3], asg[..., 3:4]

    omega = jnp.asarray(_OMEGA)        # (T*P, 3)
    om_la = jnp.asarray(_OMEGA_LA)
    om_mu = jnp.asarray(_OMEGA_MU)
    dot_o = viewdirs @ omega.T                                  # (N, T*P)
    smooth = jax.nn.relu(dot_o)[..., None]
    la = jax.nn.softplus(la - 1.0)
    mu = jax.nn.softplus(mu - 1.0)
    exp_in = -la * (viewdirs @ om_la.T)[..., None] ** 2 \
        - mu * (viewdirs @ om_mu.T)[..., None] ** 2
    color_feat = (a * smooth * jnp.exp(exp_in)).reshape(viewdirs.shape[0], -1)

    h = jnp.concatenate(
        [color_feat, viewdirs, _positional_encoding(viewdirs, VIEW_PE)],
        axis=-1)
    h = jax.nn.relu(h @ params.w1 + params.b1)
    h = jax.nn.relu(h @ params.w2 + params.b2)
    return h @ params.w3 + params.b3


def specular_extra_color(params: SpecularParams, xyz: jnp.ndarray,
                         asg_features: jnp.ndarray, cam, align=None
                         ) -> jnp.ndarray:
    """Per-Gaussian specular color offset for camera `cam` — the hybrid
    path's `mlp_color` term (gaussian_renderer/__init__.py:90-95): normalize
    camera->Gaussian view directions (squared-norm clipped BEFORE the sqrt;
    clip(sqrt(s)) has a 0*inf VJP at s == 0) and evaluate the ASG MLP.
    Shared by the single-chip step, the sharded step, and render.py."""
    from ..core.camera import camera_center

    campos = camera_center(cam, align)
    dirs = xyz - campos[None, :]
    dirs = dirs / jnp.sqrt(jnp.clip(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16))
    return specular_color(params, asg_features, dirs)
