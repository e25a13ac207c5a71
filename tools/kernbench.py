"""Isolated Pallas kernel timings: composite fwd kernel vs bwd kernel
(fused-path layout, no un-padding, no loss chain) so kernel-level
optimizations can be evaluated directly."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.raster.render import build_packet_table, _take_rows
    from bags_tpu.raster.pallas_raster import (_composite_fwd_call,
                                               composite_bwd_padded)
    from bags_tpu.utils.testing import make_toy_scene

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    proj = jax.jit(lambda *x: project_gaussians(*x, sc["static"], 3))(*a)
    bins = jax.jit(
        lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y, mi))(proj)
    table = jax.jit(
        lambda p: build_packet_table(p, p.x2d, p.y2d))(proj)
    rows = jax.jit(lambda t: _take_rows(t, bins))(table)
    num_tiles = tiles_x * tiles_y

    color, t_final = jax.jit(
        lambda r: _composite_fwd_call(r, bins.tile_start, bins.tile_count,
                                      tiles_x, tiles_y))(rows)
    g_color = jnp.ones_like(color)
    g_t = jnp.zeros_like(t_final)

    def report(name, t):
        print(f"{name:30s}: {t * 1e3:7.2f} ms")

    def f_fwd(eps):
        return _composite_fwd_call(rows + eps * 0.0, bins.tile_start,
                                   bins.tile_count, tiles_x, tiles_y)
    report("fwd kernel", timed_chain(f_fwd, None, k=8))

    def f_bwd(eps):
        return composite_bwd_padded(
            rows + eps * 0.0, bins.tile_start, bins.tile_count,
            tiles_x, tiles_y, g_color, g_t, color, t_final)
    report("bwd kernel (padded out)", timed_chain(f_bwd, None, k=8))


if __name__ == "__main__":
    main()
