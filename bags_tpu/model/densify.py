"""Adaptive density control as static-shape masked operations.

Capability parity with `densify_and_clone` / `densify_and_split` /
`densify_and_prune` / `reset_opacity` / `add_densification_stats`
(`/root/reference/scene/gaussian_model.py:253-455`) and the schedule driven
from `train.py:362-416`, with the reference's thresholds preserved
(SURVEY.md §7.4).

TPU-first: the population is a fixed capacity-C buffer with an alive mask.
Clone/split allocate dead slots via a rank-pairing trick (argsort selected /
argsort dead, pair by rank, scatter) — every op is a static-shape gather/
scatter, so the whole densify step jits and shards; there is no tensor
reallocation and no Python-side optimizer surgery. Instead, functions return
a `reset_mask` of slots whose Adam moments the caller must zero (the masked
analogue of concatenating zero-initialized optimizer state,
gaussian_model.py:350-370).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.lie import quat_to_rotmat
from .gaussians import Gaussians, inverse_sigmoid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    """Screen-space gradient accumulators (`gaussian_model.py:449-455`)."""

    grad_accum: jnp.ndarray      # (C,) sum ||d mean2d|| (signed-sum channel)
    grad_accum_abs: jnp.ndarray  # (C,) sum ||d mean2d_abs|| (fork's abs channel)
    denom: jnp.ndarray           # (C,) visible-step counts
    max_radii2d: jnp.ndarray     # (C,) running max screen radius

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(z, z, z, z)


def update_stats(stats: DensifyStats, probe_grad: jnp.ndarray,
                 probe_grad_abs: jnp.ndarray | None, radii: jnp.ndarray,
                 visibility: jnp.ndarray) -> DensifyStats:
    """Accumulate per-step densification statistics for visible Gaussians."""
    vis = visibility
    norm = jnp.linalg.norm(probe_grad[:, :2], axis=-1)
    norm_abs = (jnp.linalg.norm(probe_grad_abs[:, :2], axis=-1)
                if probe_grad_abs is not None else norm)
    return DensifyStats(
        grad_accum=stats.grad_accum + jnp.where(vis, norm, 0.0),
        grad_accum_abs=stats.grad_accum_abs + jnp.where(vis, norm_abs, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(vis, radii.astype(jnp.float32), 0.0)),
    )


class DensifyResult(NamedTuple):
    gaussians: Gaussians
    alive: jnp.ndarray
    reset_mask: jnp.ndarray   # (C,) slots whose Adam moments must be zeroed
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray


def _rank_pair(sel: jnp.ndarray, dead: jnp.ndarray):
    """Pair the i-th selected Gaussian with the i-th dead slot.

    Returns (src (C,), dst (C,), pair_valid (C,)) — static shapes; only the
    first min(#sel, #dead) pairs are valid.
    """
    c = sel.shape[0]
    src = jnp.argsort(~sel, stable=True)       # selected slots first
    dst = jnp.argsort(~dead, stable=True)      # dead slots first
    k = jnp.arange(c)
    pair_valid = (k < jnp.sum(sel)) & (k < jnp.sum(dead))
    return src, dst, pair_valid


def _scatter_rows(tree: Gaussians, src, dst, pair_valid,
                  overrides: dict) -> Gaussians:
    """Copy rows src->dst (for valid pairs) across every field, with optional
    per-field overrides (already gathered at src order)."""
    def one(name, arr):
        if arr is None:  # optional fields (asg when --hybrid is off)
            return None
        vals = overrides.get(name, arr[src])
        safe_dst = jnp.where(pair_valid, dst, arr.shape[0])  # OOB drops
        return arr.at[safe_dst].set(vals, mode="drop")

    return Gaussians(**{f.name: one(f.name, getattr(tree, f.name))
                        for f in dataclasses.fields(tree)})


def densify_and_clone(g: Gaussians, alive, grads, grad_threshold,
                      percent_dense, scene_extent):
    """Small, under-reconstructed Gaussians are duplicated
    (`densify_and_clone`, gaussian_model.py:418-431)."""
    max_scale = jnp.max(jnp.exp(g.scales_log), axis=-1)
    sel = alive & (grads >= grad_threshold) & \
        (max_scale <= percent_dense * scene_extent)
    src, dst, valid = _rank_pair(sel, ~alive)
    g = _scatter_rows(g, src, dst, valid, {})
    safe_dst = jnp.where(valid, dst, alive.shape[0])
    alive = alive.at[safe_dst].set(True, mode="drop")
    written = jnp.zeros_like(alive).at[safe_dst].set(True, mode="drop")
    return g, alive, written, jnp.minimum(jnp.sum(sel), jnp.sum(valid))


def densify_and_split(g: Gaussians, alive, grads, grad_threshold,
                      percent_dense, scene_extent, key, n_children: int = 2):
    """Large, over-reconstructed Gaussians are split into N=2 children with
    scale / (0.8*N), positions sampled from the parent
    (`densify_and_split`, gaussian_model.py:393-416). Child 0 overwrites the
    parent slot (the reference prunes the parent); child 1 takes a dead slot.
    """
    c = alive.shape[0]
    max_scale = jnp.max(jnp.exp(g.scales_log), axis=-1)
    sel = alive & (grads >= grad_threshold) & \
        (max_scale > percent_dense * scene_extent)

    scales = jnp.exp(g.scales_log)
    rot = quat_to_rotmat(g.quats)

    def child_values(sample_key, src):
        noise = jax.random.normal(sample_key, (c, 3)) * scales[src]
        offset = jnp.einsum("nij,nj->ni", rot[src], noise)
        return {
            "xyz": g.xyz[src] + offset,
            "scales_log": jnp.log(jnp.maximum(scales[src] / (0.8 * n_children),
                                              1e-10)),
        }

    k1, k2 = jax.random.split(key)
    # Child 1 -> dead slots.
    src, dst, valid = _rank_pair(sel, ~alive)
    g = _scatter_rows(g, src, dst, valid, child_values(k1, src))
    safe_dst = jnp.where(valid, dst, c)
    alive = alive.at[safe_dst].set(True, mode="drop")
    written = jnp.zeros_like(alive).at[safe_dst].set(True, mode="drop")

    # Child 0 -> in place over the parent (all selected slots, even those
    # whose sibling did not fit in a dead slot — matches reference pruning
    # of every selected parent).
    all_idx = jnp.arange(c)
    vals0 = child_values(k2, all_idx)
    g = dataclasses.replace(
        g,
        xyz=jnp.where(sel[:, None], vals0["xyz"], g.xyz),
        scales_log=jnp.where(sel[:, None], vals0["scales_log"], g.scales_log),
    )
    written = written | sel
    return g, alive, written, jnp.minimum(jnp.sum(sel), jnp.sum(valid))


def prune(g: Gaussians, alive, min_opacity, max_radii2d, max_screen_size,
          scene_extent):
    """Kill low-opacity / oversized Gaussians (`densify_and_prune`,
    gaussian_model.py:440-445). max_screen_size <= 0 disables the size tests
    (pre-first-opacity-reset behavior, train.py:383)."""
    opac = jax.nn.sigmoid(g.opacity_raw)
    mask = opac < min_opacity
    if max_screen_size > 0:
        big_vs = max_radii2d > max_screen_size
        big_ws = jnp.max(jnp.exp(g.scales_log), axis=-1) > 0.1 * scene_extent
        mask = mask | big_vs | big_ws
    pruned = alive & mask
    return dataclasses.replace(g), alive & ~mask, pruned, jnp.sum(pruned)


def densify_and_prune(g: Gaussians, alive, stats: DensifyStats, key,
                      grad_threshold: float, min_opacity: float,
                      scene_extent: float, max_screen_size: float,
                      percent_dense: float = 0.01,
                      use_abs_grad: bool = False) -> DensifyResult:
    """The full periodic step (`densify_and_prune`, gaussian_model.py:433-447):
    clone -> split -> prune, from accumulated screen-space gradient averages."""
    accum = stats.grad_accum_abs if use_abs_grad else stats.grad_accum
    grads = accum / jnp.maximum(stats.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    g, alive, w1, n_cloned = densify_and_clone(
        g, alive, grads, grad_threshold, percent_dense, scene_extent)
    g, alive, w2, n_split = densify_and_split(
        g, alive, grads, grad_threshold, percent_dense, scene_extent, key)
    g, alive, pruned, n_pruned = prune(
        g, alive, min_opacity, stats.max_radii2d, max_screen_size, scene_extent)

    reset_mask = w1 | w2 | pruned
    return DensifyResult(g, alive, reset_mask, n_cloned, n_split, n_pruned)


def reset_opacity(g: Gaussians) -> Tuple[Gaussians, bool]:
    """Clamp opacities to <= 0.01 (`reset_opacity`, gaussian_model.py:253-256).
    Caller must also zero the opacity Adam moments (the reference's
    `replace_tensor_to_optimizer` does)."""
    new = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(g.opacity_raw), 0.01))
    return dataclasses.replace(g, opacity_raw=new), True


def zero_moments_at(opt_state, reset_mask: jnp.ndarray):
    """Zero Adam mu/nu rows at `reset_mask` slots across all fields — the
    masked-capacity analogue of the reference's optimizer-state surgery
    (zero-initialized moments for new rows, gaussian_model.py:350-370).
    Leaves whose leading dim is not the capacity (step counters etc.) pass
    through untouched."""
    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 \
                and leaf.shape[0] == reset_mask.shape[0]:
            keep = jnp.reshape(~reset_mask, (-1,) + (1,) * (leaf.ndim - 1))
            return leaf * keep.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map(fix, opt_state)
