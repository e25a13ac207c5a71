"""Cumulative bisect of bin_gaussians: time progressively longer prefixes
of the real pipeline (same inputs, same fusion context) so the difference
between consecutive stages is that stage's true marginal cost."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.raster.binning import (CHUNK, compute_tile_rects,
                                         _fill_forward_heads, padded_chunks)
    from bags_tpu.utils.testing import make_toy_scene

    n = int(os.environ.get('BB_N', '100000'))
    wh = int(os.environ.get('BB_WH', '800'))
    mi = int(os.environ.get('BB_MI', str(2 ** 20)))
    smin = float(os.environ.get('BB_SMIN', '0.008'))
    smax = float(os.environ.get('BB_SMAX', '0.035'))
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(smin, smax))
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    proj = jax.jit(lambda *x: project_gaussians(*x, sc["static"], 3))(*a)

    num_tiles = tiles_x * tiles_y
    m = mi

    def stages(proj_x2d, upto):
        """Re-create bin_gaussians up to stage `upto`; returns live outputs."""
        x2d = proj_x2d
        y2d = proj.y2d
        iota_n = jnp.arange(n, dtype=jnp.int32)
        x0, y0, nx, ntiles = compute_tile_rects(
            x2d, y2d, proj.rect_rx, proj.rect_ry, tiles_x, tiles_y)
        if upto == 0:
            return (ntiles,)
        dkey = jnp.where(ntiles > 0, proj.depth, jnp.inf)
        _, depth_order = jax.lax.sort((dkey, iota_n), num_keys=1)
        rank_of = jnp.zeros((n,), jnp.int32).at[depth_order].set(iota_n)
        if upto == 1:
            return depth_order, rank_of
        ntiles_r = jnp.take(ntiles, depth_order)
        nx_r = jnp.clip(jnp.take(nx, depth_order), 1, 1023)
        x0_r = jnp.take(x0, depth_order)
        y0_r = jnp.take(y0, depth_order)
        cum_all = jnp.cumsum(ntiles_r)
        n_dropped = jnp.maximum(cum_all[-1] - m, 0)
        kept = cum_all <= m
        seg_len = jnp.where(kept, ntiles_r, 0)
        seg_cum = jnp.cumsum(seg_len)
        offsets = seg_cum - seg_len
        total = seg_cum[-1]
        if upto == 2:
            return nx_r, offsets, total, n_dropped
        slots = jnp.arange(m, dtype=jnp.int32)
        head_pos = jnp.where(seg_len > 0, offsets, m)
        packed_rn = (iota_n << 10) | nx_r
        rn = _fill_forward_heads(head_pos, packed_rn, m)
        g_rank = rn >> 10
        nx_slot = rn & 0x3FF
        if upto == 3:
            return g_rank, nx_slot
        offs_slot = _fill_forward_heads(head_pos, head_pos, m)
        local = slots - offs_slot
        q = jnp.floor((local.astype(jnp.float32) + 0.5)
                      / nx_slot.astype(jnp.float32)).astype(jnp.int32)
        r_col = local - q * nx_slot
        wrap = (r_col == 0) & (local > 0)
        valid = slots < total
        base_delta = jnp.where(wrap, tiles_x - nx_slot + 1, 1)
        base_delta = jnp.where(valid, base_delta, 0)
        tile_first = y0_r * tiles_x + x0_r
        ny_r = jnp.where(nx_r > 0, ntiles_r // nx_r, 0)
        tile_last = tile_first + (ny_r - 1) * tiles_x + nx_r - 1
        nonzero = seg_len > 0
        prev_before = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(
                jnp.where(nonzero, iota_n, -1))[:-1]])
        prev_end = jnp.where(
            prev_before >= 0,
            jnp.take(tile_last, jnp.maximum(prev_before, 0)), 0)
        head_delta = tile_first - prev_end
        delta = jnp.zeros((m,), jnp.int32).at[head_pos].set(
            head_delta, mode="drop")
        delta = jnp.where(local > 0, base_delta, delta)
        tile_id = jnp.where(valid, jnp.cumsum(delta), num_tiles)
        rank = jnp.where(valid, g_rank, n)
        if upto == 4:
            return tile_id, rank
        rank_bits = 32 - int(num_tiles).bit_length()
        packed_key = n < (1 << rank_bits)
        if packed_key:
            packed = ((tile_id.astype(jnp.uint32) << rank_bits)
                      | rank.astype(jnp.uint32))
            packed = jax.lax.sort(packed)
            rank_sorted = (packed & ((1 << rank_bits) - 1)).astype(jnp.int32)
            tile_keys = packed
            bound_q = jnp.arange(num_tiles + 1,
                                 dtype=jnp.uint32) << rank_bits
        else:
            tile_keys, rank_sorted = jax.lax.sort(
                (tile_id.astype(jnp.uint32), rank), num_keys=1,
                is_stable=True)
            bound_q = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        if upto == 5:
            return (rank_sorted,)
        tbounds = jnp.searchsorted(tile_keys, bound_q,
                                   side="left").astype(jnp.int32)
        tile_start = tbounds[:num_tiles]
        tile_count = tbounds[1:] - tbounds[:num_tiles]
        if upto == 6:
            return rank_sorted, tile_start, tile_count
        chunk0 = tile_start // CHUNK
        off_t = tile_start % CHUNK
        n_ch = jnp.where(tile_count > 0, -(-(off_t + tile_count) // CHUNK), 0)
        ocs = jnp.cumsum(n_ch) - n_ch
        base = (ocs - chunk0) * CHUNK
        c_out = padded_chunks(m + 2 * CHUNK, num_tiles)
        slots_m = slots
        base_slot = _fill_forward_heads(
            jnp.minimum(tile_start, m), base.astype(jnp.int32), m)
        padded_pos = jnp.where(slots_m < jnp.minimum(total, m),
                               base_slot + slots_m, c_out * CHUNK)
        if upto == 7:
            return rank_sorted, tile_start, tile_count, padded_pos
        _, order2, order2p = jax.lax.sort(
            (rank_sorted, slots_m, padded_pos), num_keys=1)
        if upto == 8:
            return order2, order2p, rank_sorted, tile_start, tile_count
        raise ValueError(upto)

    names = ["rects", "+depth sort & rank_of", "+capacity cumsums",
             "+(rank|nx) fill-forward", "+delta-cumsum tile_id",
             "+packed sort", "+searchsorted ranges", "+padded_pos",
             "+order2 3-op sort"]
    prev = 0.0
    for i, name in enumerate(names):
        def f(eps, i=i):
            return stages(proj.x2d + eps, i)
        t = timed_chain(f, None) * 1e3
        print(f"{i}: {name:26s}: {t:7.2f} ms  (marginal {t - prev:+6.2f})")
        prev = t

    def f_full(eps):
        pr = dataclasses.replace(proj, x2d=proj.x2d + eps)
        b = binning.bin_gaussians(pr, tiles_x, tiles_y, mi)
        return (b.rank_sorted, b.tile_start, b.tile_count, b.rank_of,
                b.order2, b.order2p, b.seg_cum, b.seg_len)
    print(f"real bin_gaussians (all)      : {timed_chain(f_full, None)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
