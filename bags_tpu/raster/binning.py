"""Tile binning: duplicate-expand Gaussian->tile instances under static shapes.

The reference CUDA pipeline (SURVEY.md §2.3) duplicates each Gaussian ID once
per overlapped 16x16 tile, radix-sorts by (tileID | depth), and extracts
per-tile ranges. On TPU, dynamic duplication is impossible under XLA's static
shapes; instead we use a fixed instance capacity and a searchsorted trick:

  1. per-Gaussian tile rect -> number of covered tiles (0 if culled)
  2. inclusive cumsum -> instance offsets
  3. for each of MAX_INSTANCES static slots, searchsorted finds the owning
     Gaussian and the local tile index within its rect
  4. one lexicographic `jax.lax.sort` on (tile_id, depth) orders instances
  5. searchsorted over the sorted tile ids yields per-tile [start, count)

Everything is int32/f32 arrays of static shape; overflow beyond the capacity
is dropped far-to-near-ish (slots past the cap are simply invalid) and
reported via `n_dropped` so callers can grow the capacity.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import Projected

TILE = 16   # pixels per tile side, matching the reference's 16x16 tiles
CHUNK = 128  # instance-segment alignment = Pallas chunk size (TPU lane width)


class TileBins(NamedTuple):
    gauss_id: jnp.ndarray    # (M_aligned,) int32 slot -> Gaussian index (N if padding)
    tile_id: jnp.ndarray     # (M_aligned,) int32 slot -> tile id (num_tiles if padding)
    tile_start: jnp.ndarray  # (T,) int32 CHUNK-aligned first slot of each tile
    tile_count: jnp.ndarray  # (T,) int32 true (unpadded) instance count per tile
    n_instances: jnp.ndarray  # () int32 number of valid instances
    n_dropped: jnp.ndarray   # () int32 instances dropped due to capacity


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return -(-width // TILE), -(-height // TILE)


def compute_tile_rects(mean2d: jnp.ndarray, radius: jnp.ndarray,
                       tiles_x: int, tiles_y: int):
    """Per-Gaussian covered tile rectangle, CUDA `getRect` semantics:
    rect_min = clamp(floor((p - r) / TILE)), rect_max (exclusive) =
    clamp(ceil((p + r + 1) / TILE)) — clamped to the grid."""
    x, y = mean2d[:, 0], mean2d[:, 1]
    r = radius.astype(mean2d.dtype)
    x0 = jnp.clip(jnp.floor((x - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    alive = radius > 0
    nx = jnp.where(alive, x1 - x0, 0)
    ny = jnp.where(alive, y1 - y0, 0)
    ntiles = jnp.maximum(nx, 0) * jnp.maximum(ny, 0)
    return x0, y0, jnp.maximum(nx, 1), ntiles


def bin_gaussians(proj: Projected, tiles_x: int, tiles_y: int,
                  max_instances: int,
                  sort_key_depth: jnp.ndarray | None = None) -> TileBins:
    """Build sorted (tile, depth) instance lists.

    sort_key_depth: optional override of the depth sort key (the fork sorts by
    camera distance instead of z for cubemap training, README.md:126).
    """
    n = proj.mean2d.shape[0]
    num_tiles = tiles_x * tiles_y
    x0, y0, nx, ntiles = compute_tile_rects(proj.mean2d, proj.radius,
                                            tiles_x, tiles_y)

    cum = jnp.cumsum(ntiles)  # inclusive
    total = cum[-1]
    n_dropped = jnp.maximum(total - max_instances, 0)

    # Static slots -> owning Gaussian via searchsorted on the inclusive cumsum.
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    local = slots - (jnp.take(cum, g_safe) - jnp.take(ntiles, g_safe))
    valid = slots < total

    gx0 = jnp.take(x0, g_safe)
    gy0 = jnp.take(y0, g_safe)
    gnx = jnp.take(nx, g_safe)
    tx = gx0 + local % gnx
    ty = gy0 + local // gnx
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    depth_src = proj.depth if sort_key_depth is None else sort_key_depth
    depth = jnp.where(valid, jnp.take(depth_src, g_safe), jnp.inf)
    gid = jnp.where(valid, g_safe, n).astype(jnp.int32)

    tile_sorted, depth_sorted, gid_sorted = jax.lax.sort(
        (tile_id, depth.astype(jnp.float32), gid), num_keys=2)

    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_ids_all, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_ids_all, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    # --- chunk-aligned layout ------------------------------------------------
    # Mosaic DMA requires lane-dim offsets/shapes aligned to 128, so each
    # tile's instance segment is re-laid-out to start at a CHUNK multiple.
    # Scatter sorted instances to their aligned destinations; padding slots
    # keep gauss_id == n (masked to zero contribution downstream).
    m_aligned = aligned_capacity(max_instances, num_tiles)
    count_pad = -(-tile_count // CHUNK) * CHUNK
    aligned_start = (jnp.cumsum(count_pad) - count_pad).astype(jnp.int32)

    safe_tile = jnp.minimum(tile_sorted, num_tiles - 1)
    within = jnp.arange(max_instances, dtype=jnp.int32) - jnp.take(tile_start, safe_tile)
    dest = jnp.take(aligned_start, safe_tile) + within
    dest = jnp.where(tile_sorted < num_tiles, dest, m_aligned)  # trash slot

    gid_aligned = jnp.full((m_aligned + 1,), n, jnp.int32).at[dest].set(gid_sorted)[:-1]
    tile_of_slot = jnp.full((m_aligned + 1,), num_tiles, jnp.int32) \
        .at[dest].set(tile_sorted)[:-1]

    return TileBins(
        gauss_id=gid_aligned,
        tile_id=tile_of_slot,
        tile_start=aligned_start,
        tile_count=tile_count,
        n_instances=jnp.minimum(total, max_instances),
        n_dropped=n_dropped,
    )


def aligned_capacity(max_instances: int, num_tiles: int) -> int:
    """Static size of the chunk-aligned instance buffer."""
    return max_instances + num_tiles * CHUNK
