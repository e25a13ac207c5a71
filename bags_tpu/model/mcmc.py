"""MCMC densification (3DGS-MCMC-style relocation) under static capacity.

Capability parity with the reference's `--mcmc` path. The snapshot ships it
broken — `relocate_gs`/`add_new_gs` and the `compute_relocation_cuda` import
are commented out (`scene/gaussian_model.py:494-573`, SURVEY.md §2.4) — so
this module implements the INTENDED behavior recovered from the commented
code, `utils/reloc_utils.py` (binomial table, N_max=51), and the relocation
step driven from `train.py:363-372,434-441`:

  * every densification interval: dead (opacity <= 0.005) Gaussians are
    relocated onto sources sampled with probability ∝ opacity; both dead
    target and source receive the appearance-preserving merged opacity/scale
      o_new = 1 - (1 - o_old)^(1/N)
      s_new = s_old * o_old / Σ_{i=1..N} Σ_{k=0..i-1} C(i-1,k) (-1)^k
                                o_new^(k+1) / sqrt(k+1)
    (the `compute_relocation` CUDA kernel, vectorized here with a
    precomputed binomial table);
  * population growth toward cap_max by 5% per step (`add_new_gs`);
  * per-step position noise after the optimizer update:
      xyz += noise_lr * lr_xyz * Sigma @ eps * sigmoid(100*(1-o-0.995))
    (`train.py:434-441`) — an SGLD-style exploration term;
  * loss regularizers opacity_reg * mean|o| + scale_reg * mean|s|
    (`train.py:327-329`) live in train/loop.py.

All ops are static-shape: sampling uses a fixed capacity of categorical
draws rank-paired with dead slots.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.projection import build_covariance
from .gaussians import Gaussians, inverse_sigmoid

N_MAX = 51

_BINOMS = np.zeros((N_MAX, N_MAX), np.float32)
for _n in range(N_MAX):
    for _k in range(_n + 1):
        _BINOMS[_n, _k] = math.comb(_n, _k)


def compute_relocation(opacity_old: jnp.ndarray, scale_old: jnp.ndarray,
                       n_merge: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized `compute_relocation` kernel (N,)/(N,3)/(N,) -> new o, s."""
    n_merge = jnp.clip(n_merge, 1, N_MAX - 1)
    new_opacity = 1.0 - (1.0 - opacity_old) ** (1.0 / n_merge)

    binoms = jnp.asarray(_BINOMS)
    ks = jnp.arange(N_MAX, dtype=jnp.float32)
    # term[k] = (-1)^k new_o^(k+1) / sqrt(k+1)
    terms = ((-1.0) ** ks)[None, :] * new_opacity[:, None] ** (ks[None, :] + 1) \
        / jnp.sqrt(ks[None, :] + 1.0)
    # denom = sum_{i=1..N} sum_{k=0..i-1} C(i-1,k) term[k]
    inner = terms @ binoms.T                       # inner[:, i-1] for row i-1
    i_mask = (jnp.arange(N_MAX)[None, :] < n_merge[:, None])
    denom = jnp.sum(jnp.where(i_mask, inner, 0.0), axis=1)
    coeff = opacity_old / jnp.clip(denom, 1e-8)
    new_scale = scale_old * coeff[:, None]
    return new_opacity, new_scale


class RelocateResult(NamedTuple):
    gaussians: Gaussians
    alive: jnp.ndarray
    reset_mask: jnp.ndarray
    n_relocated: jnp.ndarray


def _sample_by_opacity(key, g: Gaussians, alive, num: int) -> jnp.ndarray:
    """`_sample_alives`: categorical draws with prob ∝ opacity over alive."""
    logits = jnp.where(alive, jax.nn.log_sigmoid(g.opacity_raw), -jnp.inf)
    return jax.random.categorical(key, logits, shape=(num,))


def relocate_dead(g: Gaussians, alive: jnp.ndarray, key,
                  min_opacity: float = 0.005) -> RelocateResult:
    """`relocate_gs`: move dead Gaussians onto opacity-sampled sources."""
    c = alive.shape[0]
    opac = jax.nn.sigmoid(g.opacity_raw)
    dead = alive & (opac <= min_opacity)
    live = alive & ~dead
    n_dead = jnp.sum(dead)

    src = _sample_by_opacity(key, g, live, c)              # (C,) sampled ids
    pair_rank = jnp.arange(c)
    pair_valid = pair_rank < n_dead
    dead_slots = jnp.argsort(~dead, stable=True)           # dead first
    src = jnp.where(pair_valid, src, c)                    # OOB sentinel

    # ratio[i] = times source i was sampled (+1 for itself)
    ratio = jax.ops.segment_sum(pair_valid.astype(jnp.int32), src,
                                num_segments=c + 1)[:c]
    n_merge = ratio + 1

    new_o_all, new_s_all = compute_relocation(
        opac, jnp.exp(g.scales_log), n_merge)
    new_o_raw = inverse_sigmoid(jnp.clip(new_o_all, min_opacity, 1.0 - 1e-7))
    new_s_log = jnp.log(jnp.clip(new_s_all, 1e-10))

    src_safe = jnp.minimum(src, c - 1)
    dst = jnp.where(pair_valid, dead_slots, c)             # OOB drops

    def move(field, new_vals=None):
        vals = (new_vals if new_vals is not None else field)[src_safe]
        return field.at[dst].set(vals, mode="drop")

    g2 = Gaussians(
        xyz=move(g.xyz),
        sh_dc=move(g.sh_dc),
        sh_rest=move(g.sh_rest),
        scales_log=move(g.scales_log, new_s_log),
        quats=move(g.quats),
        opacity_raw=move(g.opacity_raw, new_o_raw),
        asg=None if g.asg is None else move(g.asg),
    )
    # sources also take the merged opacity/scale (gaussian_model.py:541-542)
    touched_src = jnp.zeros((c,), bool).at[jnp.where(pair_valid, src_safe, c)] \
        .set(True, mode="drop")
    g2 = dataclasses.replace(
        g2,
        opacity_raw=jnp.where(touched_src, new_o_raw, g2.opacity_raw),
        scales_log=jnp.where(touched_src[:, None], new_s_log, g2.scales_log))

    moved = jnp.zeros((c,), bool).at[dst].set(True, mode="drop")
    reset = moved | touched_src
    alive2 = alive | moved
    return RelocateResult(g2, alive2, reset, n_dead)


def add_new_gaussians(g: Gaussians, alive: jnp.ndarray, key,
                      cap_max: int | None = None,
                      growth: float = 1.005) -> RelocateResult:
    """`add_new_gs`: grow toward cap_max by sampling sources ∝ opacity."""
    c = alive.shape[0]
    cap = min(cap_max or c, c)
    current = jnp.sum(alive)
    target = jnp.minimum(cap, (growth * current).astype(jnp.int32))
    n_new = jnp.maximum(target - current, 0)

    src = _sample_by_opacity(key, g, alive, c)
    pair_rank = jnp.arange(c)
    pair_valid = pair_rank < n_new
    dead_slots = jnp.argsort(alive, stable=True)           # dead first
    src = jnp.where(pair_valid, src, c)
    ratio = jax.ops.segment_sum(pair_valid.astype(jnp.int32), src,
                                num_segments=c + 1)[:c]
    n_merge = ratio + 1

    opac = jax.nn.sigmoid(g.opacity_raw)
    new_o_all, new_s_all = compute_relocation(
        opac, jnp.exp(g.scales_log), n_merge)
    new_o_raw = inverse_sigmoid(jnp.clip(new_o_all, 0.005, 1.0 - 1e-7))
    new_s_log = jnp.log(jnp.clip(new_s_all, 1e-10))

    src_safe = jnp.minimum(src, c - 1)
    dst = jnp.where(pair_valid, dead_slots, c)

    def move(field, new_vals=None):
        vals = (new_vals if new_vals is not None else field)[src_safe]
        return field.at[dst].set(vals, mode="drop")

    g2 = Gaussians(
        xyz=move(g.xyz), sh_dc=move(g.sh_dc), sh_rest=move(g.sh_rest),
        scales_log=move(g.scales_log, new_s_log), quats=move(g.quats),
        opacity_raw=move(g.opacity_raw, new_o_raw),
        asg=None if g.asg is None else move(g.asg))
    touched_src = jnp.zeros((c,), bool).at[jnp.where(pair_valid, src_safe, c)] \
        .set(True, mode="drop")
    g2 = dataclasses.replace(
        g2,
        opacity_raw=jnp.where(touched_src, new_o_raw, g2.opacity_raw),
        scales_log=jnp.where(touched_src[:, None], new_s_log, g2.scales_log))

    added = jnp.zeros((c,), bool).at[dst].set(True, mode="drop")
    return RelocateResult(g2, alive | added, added | touched_src, n_new)


def position_noise(g: Gaussians, alive: jnp.ndarray, key,
                   xyz_lr: jnp.ndarray, noise_lr: float = 5e5) -> jnp.ndarray:
    """SGLD exploration noise (train.py:434-441): covariance-shaped noise
    gated by a sharp sigmoid of (1 - opacity). Returns the new xyz."""
    opac = jax.nn.sigmoid(g.opacity_raw)
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opac) - 0.995))
    eps = jax.random.normal(key, g.xyz.shape) * gate[:, None] \
        * noise_lr * xyz_lr
    cov = build_covariance(jnp.exp(g.scales_log), g.quats)
    noise = jnp.einsum("nij,nj->ni", cov, eps)
    return g.xyz + noise * alive[:, None]
