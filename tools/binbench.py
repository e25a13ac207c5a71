"""Chained-timer breakdown of bin_gaussians internals + raw sort costs."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.utils.testing import make_toy_scene

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    proj = jax.jit(lambda *x: project_gaussians(*x, sc["static"], 3))(*a)

    def report(name, t):
        print(f"{name:30s}: {t * 1e3:7.2f} ms")

    num_tiles = tiles_x * tiles_y
    m = mi
    m_aligned = binning.aligned_capacity(mi, num_tiles)
    n_pad_slots = num_tiles * binning.CHUNK

    x0, y0, nx, ntiles = jax.jit(
        lambda p: binning.compute_tile_rects(p.x2d, p.y2d, p.rect_rx, p.rect_ry,
                                             tiles_x, tiles_y))(proj)

    def f_rects(eps):
        return binning.compute_tile_rects(proj.x2d + eps, proj.y2d,
                                          proj.rect_rx, proj.rect_ry,
                                          tiles_x, tiles_y)
    report("tile rects", timed_chain(f_rects, None))

    # depth sort over N
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def f_dsort(eps):
        return jax.lax.sort((proj.depth + eps, iota_n), num_keys=1)
    report("depth sort (N)", timed_chain(f_dsort, None))

    # fill-forward over m
    seg_len = jnp.where(jnp.cumsum(ntiles) <= m, ntiles, 0)
    offsets = jnp.cumsum(seg_len) - seg_len
    head_pos = jnp.where(seg_len > 0, offsets, m)

    def f_ff(eps):
        return binning._fill_forward_heads(
            head_pos + (eps > 1e30).astype(jnp.int32), iota_n, m)
    report("fill-forward expand (m)", timed_chain(f_ff, None))

    # expansion arithmetic: gathers + mod/div
    g_rank = jax.jit(lambda: binning._fill_forward_heads(
        head_pos, iota_n, m))()
    rect_pack = ((x0.astype(jnp.uint32) << 21)
                 | (y0.astype(jnp.uint32) << 10)
                 | jnp.clip(nx, 1, 1023).astype(jnp.uint32))

    def f_exp(eps):
        slots = jnp.arange(m, dtype=jnp.int32)
        local = slots - jnp.take(offsets, g_rank)
        pg = jnp.take(rect_pack, g_rank) + (eps > 1e30).astype(jnp.uint32)
        gx0 = (pg >> 21).astype(jnp.int32)
        gnx = (pg & 0x3FF).astype(jnp.int32)
        tx = gx0 + local % gnx
        return tx
    report("slot arithmetic (m)", timed_chain(f_exp, None))

    # big sort: m + pad slots, u32 key + i32 payload
    rng = np.random.default_rng(0)
    big_keys = jnp.asarray(
        rng.integers(0, num_tiles + 1, size=m + n_pad_slots), jnp.uint32)
    big_pay = jnp.arange(m + n_pad_slots, dtype=jnp.int32)

    def f_bigsort(eps):
        return jax.lax.sort(
            (big_keys + (eps > 1e30).astype(jnp.uint32), big_pay), num_keys=1)
    report("big sort (m+pad, u32+i32)", timed_chain(f_bigsort, None))

    # order2 sort over m_aligned
    keys2 = jnp.asarray(rng.integers(0, n + 1, size=m_aligned), jnp.int32)
    pay2 = jnp.arange(m_aligned, dtype=jnp.int32)

    def f_o2(eps):
        return jax.lax.sort(
            (keys2 + (eps > 1e30).astype(jnp.int32), pay2), num_keys=1)
    report("order2 sort (m_aligned)", timed_chain(f_o2, None))

    # single-operand sort for scale reference
    def f_wide(eps):
        pr_w = __import__("dataclasses").replace(proj, x2d=proj.x2d + eps)
        b = binning.bin_gaussians(pr_w, tiles_x, tiles_y, mi,
                                  force_wide_keys=True)
        return (b.rank_sorted, b.tile_start, b.tile_count, b.order2,
                b.order2p)
    report("bin_gaussians WIDE keys (all)", timed_chain(f_wide, None))

    def f_s1(eps):
        return jax.lax.sort(big_keys + (eps > 1e30).astype(jnp.uint32))
    report("sort keys only (m+pad)", timed_chain(f_s1, None))

    # grid counts
    one = (ntiles > 0).astype(jnp.int32)
    ny = jnp.where(nx > 0, ntiles // jnp.maximum(nx, 1), 0)

    def f_grid(eps):
        grid = jnp.zeros((tiles_y + 1, tiles_x + 1), jnp.int32)
        o = one + (eps > 1e30).astype(jnp.int32)
        grid = grid.at[y0, x0].add(o, mode="drop")
        grid = grid.at[y0, x0 + nx].add(-o, mode="drop")
        grid = grid.at[y0 + ny, x0].add(-o, mode="drop")
        grid = grid.at[y0 + ny, x0 + nx].add(o, mode="drop")
        return jnp.cumsum(jnp.cumsum(grid, 0), 1)
    report("grid corner counts", timed_chain(f_grid, None))

    # gather of depth_order (take over m_aligned)
    dop = jnp.arange(n + 1, dtype=jnp.int32)
    rs = jnp.asarray(rng.integers(0, n + 1, size=m_aligned), jnp.int32)

    def f_take(eps):
        return jnp.take(dop, jnp.minimum(rs + (eps > 1e30).astype(jnp.int32),
                                         n))
    report("final gauss_id take", timed_chain(f_take, None))


if __name__ == "__main__":
    main()
