"""Tile binning: duplicate-expand Gaussian->tile instances under static shapes.

The reference CUDA pipeline (SURVEY.md §2.3) duplicates each Gaussian ID once
per overlapped 16x16 tile, radix-sorts by (tileID | depth), and extracts
per-tile ranges. On TPU, dynamic duplication is impossible under XLA's static
shapes; instead a fixed instance budget is expanded with scatter/cummax
fill-forwards and ONE lexicographic sort lands real + synthesized padding
instances directly in the CHUNK-aligned layout the Pallas kernels DMA from
(see `bin_gaussians` for the step-by-step algorithm and the perf rationale).

Everything is int32/f32 arrays of static shape; capacity overflow drops whole
Gaussians (keeping the layout consistent) and is reported via `n_dropped`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import Projected

TILE = 16   # pixels per tile side, matching the reference's 16x16 tiles
CHUNK = 128  # instance-segment alignment = Pallas chunk size (TPU lane width)


class TileBins(NamedTuple):
    gauss_id: jnp.ndarray    # (M_aligned,) int32 slot -> Gaussian index (N if padding)
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
    """Build CHUNK-aligned, depth-sorted per-tile instance lists.

    sort_key_depth: optional override of the depth sort key (the fork sorts by
    camera distance instead of z for cubemap training, README.md:126).

    TPU-first algorithm (no searchsorted, no post-sort re-layout):
      1. per-Gaussian tile rects; per-tile instance counts via a 4-corner
         scatter-add + 2D cumsum over the (tiny) tile grid — available
         BEFORE expansion;
      2. slot -> owning Gaussian by scattering segment heads at their
         exclusive-cumsum offsets and filling forward with `lax.cummax`
         (jnp.searchsorted's binary-search lowering costs ~130 ms at 1M
         queries on v5e; this is ~2 ms);
      3. synthesize per-tile PADDING instances (depth=+inf, gid=N) so each
         tile's population rounds up to a CHUNK multiple;
      4. ONE lexicographic sort by (tile, depth) over real+padding
         instances lands everything directly in the Mosaic-aligned layout;
         tile starts are just the cumsum of padded counts.

    Capacity overflow (> max_instances real instances) drops instances and
    (unlike the exact path) may misalign the affected frame — size
    `max_instances` with headroom; `n_dropped` reports it.
    """
    n = proj.mean2d.shape[0]
    num_tiles = tiles_x * tiles_y
    # packed-rect u32 layout: x0:11 | y0:11 | nx:10 bits
    assert tiles_x < 2048 and tiles_y < 2048, "image wider than 32k px?"
    m_aligned = aligned_capacity(max_instances, num_tiles)
    x0, y0, nx, ntiles = compute_tile_rects(proj.mean2d, proj.radius,
                                            tiles_x, tiles_y)
    ny = jnp.where(nx > 0, ntiles // jnp.maximum(nx, 1), 0)

    cum_all = jnp.cumsum(ntiles)  # inclusive, over every instance
    n_dropped = jnp.maximum(cum_all[-1] - max_instances, 0)
    # Capacity overflow drops WHOLE Gaussians (those whose segment would
    # cross the budget) so that the corner-derived per-tile counts, the
    # expansion, and the aligned layout all stay mutually consistent —
    # a partial truncation would shift every later tile's segment.
    kept = cum_all <= max_instances
    ntiles = jnp.where(kept, ntiles, 0)
    nx = jnp.where(kept, nx, 1)
    ny = jnp.where(kept, ny, 0)
    cum = jnp.cumsum(ntiles)
    total = cum[-1]
    offsets = cum - ntiles    # exclusive segment starts

    # --- per-tile counts from rect corners (2D difference + cumsum) ---------
    grid = jnp.zeros((tiles_y + 1, tiles_x + 1), jnp.int32)
    one = (ntiles > 0).astype(jnp.int32)  # dead/dropped Gaussians contribute 0
    grid = grid.at[y0, x0].add(one, mode="drop")
    grid = grid.at[y0, x0 + nx].add(-one, mode="drop")
    grid = grid.at[y0 + ny, x0].add(-one, mode="drop")
    grid = grid.at[y0 + ny, x0 + nx].add(one, mode="drop")
    count = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:tiles_y, :tiles_x]
    tile_count = count.reshape(-1)
    count_pad = -(-tile_count // CHUNK) * CHUNK
    aligned_start = (jnp.cumsum(count_pad) - count_pad).astype(jnp.int32)
    pad_count = count_pad - tile_count

    # --- real-instance expansion (head scatter + cummax fill-forward) -------
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    head_pos = jnp.where(ntiles > 0, offsets, max_instances)  # OOB drops
    g_ids = jnp.arange(n, dtype=jnp.int32)
    heads = jnp.full((max_instances,), -1, jnp.int32) \
        .at[head_pos].max(g_ids, mode="drop")
    g_slot = jnp.maximum(jax.lax.cummax(heads), 0)
    start_heads = jnp.full((max_instances,), -1, jnp.int32) \
        .at[head_pos].max(offsets.astype(jnp.int32), mode="drop")
    seg_start = jnp.maximum(jax.lax.cummax(start_heads), 0)
    local = slots - seg_start
    valid = slots < total

    # one fused row gather for rect bits + depth bits
    depth_src = proj.depth if sort_key_depth is None else sort_key_depth
    packed = ((x0.astype(jnp.uint32) << 21)
              | (y0.astype(jnp.uint32) << 10)
              | jnp.clip(nx, 1, 1023).astype(jnp.uint32))
    table = jnp.stack(
        [packed, jax.lax.bitcast_convert_type(
            depth_src.astype(jnp.float32), jnp.uint32)], axis=1)   # (N, 2)
    rows = jnp.take(table, g_slot, axis=0)
    pg = rows[:, 0]
    depth = jax.lax.bitcast_convert_type(rows[:, 1], jnp.float32)
    gx0 = (pg >> 21).astype(jnp.int32)
    gy0 = ((pg >> 10) & 0x7FF).astype(jnp.int32)
    gnx = (pg & 0x3FF).astype(jnp.int32)
    tx = gx0 + local % gnx
    ty = gy0 + local // gnx
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)
    depth = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, g_slot, n).astype(jnp.int32)

    # --- padding-instance expansion over the tile grid ----------------------
    n_pad_slots = num_tiles * CHUNK
    pad_offsets = jnp.cumsum(pad_count) - pad_count
    pslots = jnp.arange(n_pad_slots, dtype=jnp.int32)
    phead = jnp.where(pad_count > 0, pad_offsets, n_pad_slots)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    pheads = jnp.full((n_pad_slots,), -1, jnp.int32) \
        .at[phead].max(t_ids, mode="drop")
    p_tile = jnp.maximum(jax.lax.cummax(pheads), 0)
    p_valid = pslots < jnp.sum(pad_count)
    pad_tile_id = jnp.where(p_valid, p_tile, num_tiles).astype(jnp.int32)

    # --- one sort lands real+padding in the aligned layout ------------------
    all_tile = jnp.concatenate([tile_id, pad_tile_id])
    all_depth = jnp.concatenate(
        [depth, jnp.full((n_pad_slots,), jnp.inf, jnp.float32)])
    all_gid = jnp.concatenate(
        [gid, jnp.full((n_pad_slots,), n, jnp.int32)])
    _, _, gid_aligned = jax.lax.sort((all_tile, all_depth, all_gid),
                                     num_keys=2)

    return TileBins(
        gauss_id=gid_aligned[:m_aligned],
        tile_start=aligned_start,
        tile_count=tile_count,
        n_instances=jnp.minimum(total, max_instances),
        n_dropped=n_dropped,
    )


def aligned_capacity(max_instances: int, num_tiles: int) -> int:
    """Static size of the chunk-aligned instance buffer."""
    return max_instances + num_tiles * CHUNK
