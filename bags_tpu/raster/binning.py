"""Tile binning: duplicate-expand Gaussian->tile instances under static shapes.

The reference CUDA pipeline (SURVEY.md §2.3) duplicates each Gaussian ID once
per overlapped tile (16x16, same here — see TILE_W/TILE_H), radix-sorts
by (tileID | depth), and extracts per-tile ranges. On TPU, dynamic duplication is impossible under XLA's static
shapes; a fixed instance budget is expanded instead.

TPU-first algorithm (v3 — everything rides XLA's fast u32 radix sort; no wide
keys, no per-tile cumsum grids, and — new in v3 — no padding slots at all):

  1. Sort the N Gaussians by depth once (cheap). From here on "rank" means
     position in that depth order; all per-Gaussian arrays are permuted to
     rank order.
  2. Expand to a fixed budget of `max_instances` slots in GAUSSIAN-MAJOR rank
     order (segment-head scatter + cummax fill-forward): slot -> (rank,
     covered tile).  Capacity overflow drops whole Gaussians from the FAR end
     (the least visible ones), reported via `n_dropped`.
  3. ONE stable single-u32-key sort by (tile | rank) with an adaptive bit
     split. Stability and the key layout do the rest: within a tile, slots land in rank order (= depth
     order: the CUDA (tile|depth) radix sort, for free).
  4. Per-tile ranges come from ONE `searchsorted` of the tile boundaries over
     the sorted keys — tile starts are NOT chunk-aligned. The Pallas kernels
     handle arbitrary starts: DMA windows may spill into the next tile's
     slots, and lane masking (`valid`) excludes them; the v2 design instead
     synthesized ~num_tiles*CHUNK/2 padding slots, which inflated the sort,
     the instance gather, and the backward permutation by ~25% each.
  5. A second stable sort by rank yields `order2`, the permutation that
     groups instance slots contiguously per Gaussian — the backward pass
     reduces per-instance gradients with a blocked prefix-sum over those
     contiguous segments (segsum.py). Measured against the alternatives on
     v5e at ~1M slots: order2-sort + grouped gather + prefix beats XLA's
     scatter-add (23 ms) and sorted segment_sum (14.5 ms). `rank_of` lands
     the reduced rows back in Gaussian order.

Everything is int32/u32/f32 arrays of static shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import Projected

# Tile shape (parameterized; the output is tile-shape-invariant — every
# pixel composites all covering Gaussians in global depth order). 16x16
# measured BEST on chip: 16x8 halves the pixel-x-instance pair work but
# grows the chunk count ~60% (1.35x instance duplication + per-tile window
# rounding), and the per-chunk fixed costs (DMA wait, scan-matmul
# dispatches, loop step) dominate — 13.3 -> 8.3 Mpix/s on the bench.
TILE_W = 16
TILE_H = 16
CHUNK = 128  # Pallas chunk size (TPU lane width); also the spill margin


def padded_chunks(m_pad: int, num_tiles: int) -> int:
    """Static chunk capacity of the Pallas backward's padded gradient
    buffer: every tile needs at most cdiv(count, CHUNK) + 1 output windows
    (the +1 from the aligned-down head), and the cdiv terms sum to at most
    m_pad/CHUNK + num_tiles."""
    return m_pad // CHUNK + 2 * num_tiles


class TileBins(NamedTuple):
    rank_sorted: jnp.ndarray  # (M + CHUNK,) int32 slot -> depth rank (N if invalid)
    depth_order: jnp.ndarray  # (N,) int32 rank -> Gaussian index
    tile_start: jnp.ndarray  # (T,) int32 first slot of each tile (UNALIGNED)
    tile_count: jnp.ndarray  # (T,) int32 instance count per tile
    n_instances: jnp.ndarray  # () int32 number of valid instances
    n_dropped: jnp.ndarray   # () int32 instances dropped due to capacity
    rank_of: jnp.ndarray     # (N,) int32 gaussian -> depth rank
    # --- gradient-reduction aux (consumed by render.py's custom VJP; DCE'd
    # from forward-only graphs) ---------------------------------------------
    order2: jnp.ndarray      # (M,) int32: rank-grouped pos -> slot
    order2p: jnp.ndarray     # (M,) int32: rank-grouped pos -> PADDED column
    #   of the Pallas backward's per-tile-aligned gradient buffer (invalid
    #   slots -> one past the buffer; gather with mode='fill')
    seg_cum: jnp.ndarray     # (N,) int32 inclusive cumsum of kept ntiles, rank order
    seg_len: jnp.ndarray     # (N,) int32 kept ntiles per rank

    @property
    def gauss_id(self) -> jnp.ndarray:
        """(M + CHUNK,) slot -> Gaussian index (N = invalid). Derived view for
        tests/tools — the hot path indexes rank-permuted tables by
        `rank_sorted` directly."""
        n = self.depth_order.shape[0]
        dop = jnp.concatenate(
            [self.depth_order, jnp.full((1,), n, jnp.int32)])
        return jnp.take(dop, self.rank_sorted)


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return -(-width // TILE_W), -(-height // TILE_H)


def compute_tile_rects(x2d: jnp.ndarray, y2d: jnp.ndarray,
                       radius_x: jnp.ndarray, radius_y: jnp.ndarray,
                       tiles_x: int, tiles_y: int):
    """Per-Gaussian covered tile rectangle, CUDA `getRect` semantics with
    PER-AXIS extents (the opacity-aware ellipse AABB from projection —
    exact-parity cull of tiles no pixel of which can pass alpha >= 1/255):
    rect_min = clamp(floor((p - r) / TILE_{W,H})), rect_max (exclusive) =
    clamp(floor((p + r) / TILE_{W,H}) + 1) — clamped to the grid."""
    rx = radius_x.astype(x2d.dtype)
    ry = radius_y.astype(y2d.dtype)
    x0 = jnp.clip(jnp.floor((x2d - rx) / TILE_W), 0,
                  tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y2d - ry) / TILE_H), 0,
                  tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x2d + rx) / TILE_W) + 1, 0,
                  tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y2d + ry) / TILE_H) + 1, 0,
                  tiles_y).astype(jnp.int32)
    alive = (radius_x > 0) & (radius_y > 0)
    nx = jnp.where(alive, x1 - x0, 0)
    ny = jnp.where(alive, y1 - y0, 0)
    ntiles = jnp.maximum(nx, 0) * jnp.maximum(ny, 0)
    return x0, y0, jnp.maximum(nx, 1), ntiles


def _fill_forward_heads(head_pos, head_val, length, fill=0):
    """slots (length,) <- segment values: scatter heads, cummax fill-forward."""
    heads = jnp.full((length,), -1, jnp.int32).at[head_pos].max(
        head_val, mode="drop")
    return jnp.maximum(jax.lax.cummax(heads), fill)


def bin_gaussians(proj: Projected, tiles_x: int, tiles_y: int,
                  max_instances: int,
                  sort_key_depth: jnp.ndarray | None = None,
                  force_wide_keys: bool = False) -> TileBins:
    """Build depth-sorted per-tile instance lists (see module docstring).

    sort_key_depth: optional override of the depth sort key (the fork sorts by
    camera distance instead of z for cubemap training, README.md:126).
    force_wide_keys: test hook for the >1M-Gaussian / >4k-tile sort path.
    """
    n = proj.x2d.shape[0]
    num_tiles = tiles_x * tiles_y
    m = max_instances
    # u32 (tile | rank) packed key with an ADAPTIVE bit split: the tile
    # field gets just enough bits for num_tiles (incl. the sentinel), the
    # rank field the rest. At 16x16 tiles an 800x800 image has 2500 tiles
    # -> 12 tile bits, leaving 20 for < 1,048,576 Gaussians; beyond the
    # joint budget, fall back to a stable two-operand sort with the tile id
    # as the key.
    rank_bits = 32 - int(num_tiles).bit_length()
    packed_key = n < (1 << rank_bits) and not force_wide_keys
    rx = (proj.rect_rx if getattr(proj, "rect_rx", None) is not None
          else proj.radius)
    ry = (proj.rect_ry if getattr(proj, "rect_ry", None) is not None
          else proj.radius)
    x0, y0, nx, ntiles = compute_tile_rects(proj.x2d, proj.y2d, rx, ry,
                                            tiles_x, tiles_y)

    # --- 1. depth-sort the Gaussians (rank order) --------------------------
    depth_src = proj.depth if sort_key_depth is None else sort_key_depth
    dkey = jnp.where(ntiles > 0, depth_src.astype(jnp.float32), jnp.inf)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, depth_order = jax.lax.sort((dkey, iota_n), num_keys=1)
    # rank_of = depth_order^-1: a unique-index scatter beats a second sort.
    rank_of = jnp.zeros((n,), jnp.int32).at[depth_order].set(iota_n)

    assert tiles_x < 2048 and tiles_y < 2048, "image wider than 32k px?"
    # Permute ALL per-Gaussian fields to rank order with ONE stacked gather
    # (random (N,)-index gathers cost ~8 ns/row on TPU — at 1M Gaussians
    # four separate takes were ~25% of the whole binning stage). tile_first/
    # tile_last (the head-jump endpoints, used by the slot expansion below)
    # are cheap elementwise pre-permutation, so they ride the same gather.
    nx_c = jnp.clip(nx, 1, 1023)
    tile_first_all = y0 * tiles_x + x0
    ny_all = ntiles // nx_c                       # N-sized int div: cheap
    tile_last_all = tile_first_all + (ny_all - 1) * tiles_x + nx_c - 1
    perm4 = jnp.take(jnp.stack([ntiles, nx_c, tile_first_all,
                                tile_last_all], axis=0),
                     depth_order, axis=1)
    ntiles_r, nx_r, tile_first, tile_last = (
        perm4[0], perm4[1], perm4[2], perm4[3])

    # --- capacity: keep the NEAREST Gaussians up to the budget -------------
    cum_all = jnp.cumsum(ntiles_r)
    n_dropped = jnp.maximum(cum_all[-1] - m, 0)
    kept = cum_all <= m
    seg_len = jnp.where(kept, ntiles_r, 0)
    # kept is a PREFIX of the rank order (cumsum <= m is prefix-closed), so
    # cumsum(seg_len) == min(cum_all, total) — the second 1M-element cumsum
    # collapses to a where/max/min.
    total = jnp.max(jnp.where(kept, cum_all, 0))
    seg_cum = jnp.minimum(cum_all, total)
    offsets = seg_cum - seg_len

    # --- 2. gaussian-major slot expansion ----------------------------------
    # Per-slot tile ids WITHOUT any (m,)-sized random gather (~8 ms/2^20 on
    # v5e): everything rides head-scatters + one cummax fill-forward + one
    # integer cumsum.
    #   * ONE packed fill-forward (rank:21 | nx:10, 31 bits signed-safe)
    #     broadcasts both the depth rank and the rect width to slots;
    #   * tile_id comes from an inclusive cumsum of per-slot DELTAS: +1
    #     inside a rect row, +(tiles_x - nx + 1) at a row wrap, and at each
    #     segment head a scattered jump from the previous segment's LAST
    #     tile to this segment's FIRST tile (both per-Gaussian, N-sized).
    slots = jnp.arange(m, dtype=jnp.int32)
    head_pos = jnp.where(seg_len > 0, offsets, m)  # OOB drops
    small_rank = n < (1 << 21)
    # Head jumps (per-Gaussian, rank order): first tile of g minus the last
    # tile of the PREVIOUS nonzero segment (tile_first/tile_last rode the
    # stacked rank-permute above).
    nonzero = seg_len > 0
    # prev nonzero segment strictly BEFORE g: shift the running last-index
    prev_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(
            jnp.where(nonzero, iota_n, -1))[:-1]])
    prev_end = jnp.where(prev_before >= 0,
                         jnp.take(tile_last, jnp.maximum(prev_before, 0)), 0)
    head_delta = tile_first - prev_end
    # Three SEPARATE head scatters (same indices): the packed (rank|nx)
    # fill-forward, the segment-start fill-forward, and the head-jump
    # delta. Measured on v5e at 1M indices -> 4M slots: three 1-column
    # scatters are ~free while one packed (N, 3)-value scatter costs
    # ~20 ms (XLA lowers the multi-column scatter poorly) — so they stay
    # split on purpose.
    first_col = (iota_n << 10) | nx_r if small_rank else iota_n
    rn = _fill_forward_heads(head_pos, first_col, m)
    if small_rank:
        g_rank = rn >> 10
        nx_slot = rn & 0x3FF
    else:
        g_rank = rn
        nx_slot = jnp.take(nx_r, g_rank)
    # Segment start per slot (head_pos is its own head value, non-decreasing)
    offs_slot = _fill_forward_heads(head_pos, head_pos, m)
    delta_heads = jnp.zeros((m,), jnp.int32).at[head_pos].set(
        head_delta, mode="drop")
    local = slots - offs_slot
    # local % nx in f32: integer div lowers to a slow multi-op VPU sequence;
    # both operands are tiny (local < num_tiles * 1024, nx <= 1023), so
    # floor((local + 0.5) / nx) is exact — the +0.5 keeps the true quotient
    # boundary at least 0.5/nx > 4x f32 rounding error away.
    q = jnp.floor((local.astype(jnp.float32) + 0.5)
                  / nx_slot.astype(jnp.float32)).astype(jnp.int32)
    r_col = local - q * nx_slot
    wrap = (r_col == 0) & (local > 0)
    valid = slots < total
    base_delta = jnp.where(wrap, tiles_x - nx_slot + 1, 1)
    base_delta = jnp.where(valid, base_delta, 0)
    # Non-head slots keep their base delta; head slots take the jump.
    delta = jnp.where(local > 0, base_delta, delta_heads)
    tile_id = jnp.where(valid, jnp.cumsum(delta), num_tiles)
    rank = jnp.where(valid, g_rank, n)

    # --- 3. ONE stable sort by tile id (rank order within a tile preserved:
    # packed key carries rank in the low bits; the two-operand fallback is a
    # stable sort of the rank payload) ---------------------------------------
    if packed_key:
        packed = ((tile_id.astype(jnp.uint32) << rank_bits)
                  | rank.astype(jnp.uint32))
        packed = jax.lax.sort(packed)
        rank_sorted = (packed & ((1 << rank_bits) - 1)).astype(jnp.int32)
        tile_keys = packed
        bound_q = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
    else:
        tile_keys, rank_sorted = jax.lax.sort(
            (tile_id.astype(jnp.uint32), rank), num_keys=1,
            is_stable=True)
        bound_q = jnp.arange(num_tiles + 1, dtype=jnp.uint32)

    # --- 4. per-tile ranges: tile boundaries by binary search --------------
    # Invalid slots carry tile_id == num_tiles, so they sort to the end and
    # fall outside every [start, start+count) range.
    tbounds = jnp.searchsorted(tile_keys, bound_q,
                               side="left").astype(jnp.int32)
    tile_start = tbounds[:num_tiles]
    tile_count = tbounds[1:] - tbounds[:num_tiles]

    # Spill margin: a tile's last DMA window may extend past `total` for
    # the final tile; 2*CHUNK sentinel slots keep the instance-row gather
    # in bounds (rank N backs the zero column) — sized for the forward
    # kernel's 2-chunk streaming windows (pallas_raster.FWD_LANES).
    rank_sorted = jnp.concatenate(
        [rank_sorted, jnp.full((2 * CHUNK,), n, jnp.int32)])

    # --- 5. rank-grouping permutation for the gradient reduction -----------
    # padded_pos[s]: column of slot s in the Pallas backward's padded
    # per-tile-aligned gradient buffer (= (ocs[t] - chunk0[t]) * CHUNK + s
    # for the owning tile t); sorted as a second payload so `order2p` is the
    # rank-grouped padded-column permutation the fused VJP gathers with.
    chunk0 = tile_start // CHUNK
    off_t = tile_start % CHUNK
    n_ch = jnp.where(tile_count > 0, -(-(off_t + tile_count) // CHUNK), 0)
    ocs = jnp.cumsum(n_ch) - n_ch
    base = (ocs - chunk0) * CHUNK                      # (T,)
    # base[t] is non-decreasing in t (n_ch[t] >= chunk0[t+1] - chunk0[t]),
    # so base-per-slot comes from a (T,)-sized scatter at tile_start + one
    # cummax fill-forward instead of a (m,) gather keyed by the slot's tile
    # id (~7 ms at 2^20 on v5e). Co-located tile starts (empty tiles) take
    # the max = the owning tile's base.
    c_out = padded_chunks(m + 2 * CHUNK, num_tiles)
    slots_m = jnp.arange(m, dtype=jnp.int32)
    base_slot = _fill_forward_heads(
        jnp.minimum(tile_start, m), base.astype(jnp.int32), m)
    padded_pos = jnp.where(slots_m < jnp.minimum(total, m),
                           base_slot + slots_m, c_out * CHUNK)
    _, order2, order2p = jax.lax.sort(
        (rank_sorted[:m], slots_m, padded_pos), num_keys=1)

    return TileBins(
        rank_sorted=rank_sorted,
        depth_order=depth_order,
        tile_start=tile_start,
        tile_count=tile_count,
        n_instances=jnp.minimum(total, m),
        n_dropped=n_dropped,
        rank_of=rank_of,
        order2=order2,
        order2p=order2p,
        seg_cum=seg_cum.astype(jnp.int32),
        seg_len=seg_len.astype(jnp.int32),
    )


def aligned_capacity(max_instances: int, num_tiles: int) -> int:
    """Static size of the instance-row buffer (budget + spill margin)."""
    return max_instances + 2 * CHUNK


def count_instances(proj: Projected, tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """Scalar i32: instance slots this view needs (sum of tile coverage).
    Cheap (no sort/expansion) — drives capacity estimation."""
    rx = (proj.rect_rx if getattr(proj, "rect_rx", None) is not None
          else proj.radius)
    ry = (proj.rect_ry if getattr(proj, "rect_ry", None) is not None
          else proj.radius)
    *_, ntiles = compute_tile_rects(proj.x2d, proj.y2d, rx, ry,
                                    tiles_x, tiles_y)
    return jnp.sum(ntiles)
