"""Ablation timings of the FORWARD composite kernel's inner loop: variants
with pieces removed (NOT numerically valid — measurement only) to locate
the per-chunk cost: transcendentals, the MXU prefix scan, the reductions,
or loop/DMA overhead."""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.raster.render import build_packet_table, _take_rows
    from bags_tpu.raster import pallas_raster as pr
    from bags_tpu.utils.testing import make_toy_scene

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    proj = jax.jit(lambda *x: project_gaussians(*x, sc["static"], 3))(*a)
    bins = jax.jit(
        lambda p: binning.bin_gaussians(p, tiles_x, tiles_y, mi))(proj)
    table = jax.jit(lambda t: build_packet_table(t, t.x2d, t.y2d))(proj)
    rows = jax.jit(lambda t: _take_rows(t, bins))(table)
    num_tiles = tiles_x * tiles_y
    K = pr.K
    NPIX = pr.NPIX
    FEATS = pr.FEATS

    def make_kernel(mode):
        def kern(tiles_x_, max_chunks, chunk0_ref, off_ref, count_ref,
                 nxt_ref, rows_hbm, out_color, out_t, scratch, sems):
            t = pl.program_id(0)
            chunk0 = chunk0_ref[t]
            off = off_ref[t]
            count = count_ref[t]
            n_chunks = jnp.where(
                count > 0,
                jnp.minimum(pl.cdiv(off + count, K), max_chunks), 0)
            px, py = pr._pixel_coords(tiles_x_)

            def dma(slot, i):
                return pltpu.make_async_copy(
                    rows_hbm.at[:, pl.ds((chunk0 + i) * K, K)],
                    scratch.at[slot], sems.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                dma(0, 0).start()

            def body(i, carry):
                acc, t_run = carry
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_chunks)
                def _():
                    dma(1 - slot, i + 1).start()

                dma(slot, i).wait()
                chunk = scratch[slot]
                lanes = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                pos = i * K + lanes
                valid = (pos >= off) & (pos < off + count)
                mx = chunk[0:1, :]
                my = chunk[1:2, :]
                ca = chunk[2:3, :]
                cb = chunk[3:4, :]
                cc = chunk[4:5, :]
                op = chunk[5:6, :]
                dx = px - mx
                dy = py - my
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                if mode == "dma_only":
                    w = jnp.where(valid, power, 0.0)
                elif mode == "no_transcendental":
                    alpha = jnp.minimum(0.99, op * power)  # fake, no exp
                    ok = (alpha >= 1.0 / 255) & (power <= 0.0) & valid
                    a_ = jnp.where(ok, alpha, 0.0)
                    s = pr._lane_prefix_sum(a_, exclusive=True)
                    w = a_ * (t_run * (1.0 + s))
                elif mode == "no_scan":
                    alpha = jnp.minimum(0.99, op * jnp.exp(power))
                    ok = (alpha >= 1.0 / 255) & (power <= 0.0) & valid
                    a_ = jnp.where(ok, alpha, 0.0)
                    lo = jnp.log1p(-a_)
                    w = a_ * t_run * jnp.exp(lo)
                else:  # full-ish (no early term / kill logic)
                    alpha = jnp.minimum(0.99, op * jnp.exp(power))
                    ok = (alpha >= 1.0 / 255) & (power <= 0.0) & valid
                    a_ = jnp.where(ok, alpha, 0.0)
                    lo = jnp.log1p(-a_)
                    s = pr._lane_prefix_sum(lo, exclusive=True)
                    tb = t_run * jnp.exp(s)
                    w = a_ * tb
                acc = acc + jax.lax.dot_general(
                    chunk[6:10, :], w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                t_sum = pr._lane_sum(w)
                return acc, t_run - 0.0 * t_sum
            acc0 = jnp.zeros((4, NPIX), jnp.float32)
            t0 = jnp.ones((NPIX, 1), jnp.float32)
            acc, t_run = jax.lax.fori_loop(0, n_chunks, body, (acc0, t0))
            out_color[0] = acc
            out_t[0] = t_run
        return kern

    chunk0, off, _ = pr._window_scalars(bins.tile_start, bins.tile_count)
    nxt = pr._next_nonempty(bins.tile_count)
    m_pad = rows.shape[1]

    def run(mode):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NPIX, 1), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((2, FEATS, K), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))])
        f = pl.pallas_call(
            functools.partial(make_kernel(mode), tiles_x, m_pad // K),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles, 4, NPIX), jnp.float32),
                jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32)])

        def g(eps):
            return f(chunk0, off, bins.tile_count, nxt, rows + eps)
        print(f"{mode:22s}: {timed_chain(g, None, k=8) * 1e3:7.2f} ms")

    for mode in ("dma_only", "no_transcendental", "no_scan", "full"):
        run(mode)


def real_variants():
    """The REAL fwd kernel vs a fori_loop + predicated-body variant (same
    math incl. kill/include; early termination as compute-skip instead of
    a dynamic while_loop trip count)."""
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.raster.render import build_packet_table, _take_rows
    from bags_tpu.raster import pallas_raster as pr
    from bags_tpu.utils.testing import make_toy_scene
    import numpy as np

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    proj = jax.jit(lambda *x: project_gaussians(*x, sc["static"], 3))(*a)
    bins = jax.jit(
        lambda p: binning.bin_gaussians(p, tiles_x, tiles_y, mi))(proj)
    table = jax.jit(lambda t: build_packet_table(t, t.x2d, t.y2d))(proj)
    rows = jax.jit(lambda t: _take_rows(t, bins))(table)
    num_tiles = tiles_x * tiles_y
    K, NPIX, FEATS = pr.K, pr.NPIX, pr.FEATS

    def fori_kernel(tiles_x_, max_chunks, chunk0_ref, off_ref, count_ref,
                    nxt_ref, rows_hbm, out_color, out_t, scratch, sems):
        t = pl.program_id(0)
        chunk0 = chunk0_ref[t]
        off = off_ref[t]
        count = count_ref[t]
        n_chunks = jnp.where(
            count > 0, jnp.minimum(pl.cdiv(off + count, K), max_chunks), 0)
        px, py = pr._pixel_coords(tiles_x_)

        def dma(slot, i):
            return pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds((chunk0 + i) * K, K)],
                scratch.at[slot], sems.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma(0, 0).start()

        def body(i, carry):
            acc, t_run, done = carry
            live = jnp.min(done) < 0.5
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma(1 - slot, i + 1).start()

            dma(slot, i).wait()

            def compute(carry):
                acc, t_run, done = carry
                chunk = scratch[slot]
                lanes = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
                pos = i * K + lanes
                valid = (pos >= off) & (pos < off + count)
                f = pr._chunk_forward(chunk, px, py, t_run, done, valid)
                acc2 = acc + jax.lax.dot_general(
                    pr._color4(chunk), f["w"], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                return acc2, f["t_run"], f["done"]

            return jax.lax.cond(live, compute, lambda c: c,
                                (acc, t_run, done))

        acc0 = jnp.zeros((4, NPIX), jnp.float32)
        t0 = jnp.ones((NPIX, 1), jnp.float32)
        d0 = jnp.zeros((NPIX, 1), jnp.float32)
        acc, t_run, _ = jax.lax.fori_loop(
            0, n_chunks, body, (acc0, t0, d0))
        out_color[0] = acc
        out_t[0] = t_run

    chunk0, off, _ = pr._window_scalars(bins.tile_start, bins.tile_count)
    nxt = pr._next_nonempty(bins.tile_count)
    m_pad = rows.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, FEATS, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    f_fori = pl.pallas_call(
        functools.partial(fori_kernel, tiles_x, m_pad // K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32)])

    def g_fori(eps):
        return f_fori(chunk0, off, bins.tile_count, nxt, rows + eps)
    print(f"{'real fori+when':22s}: {timed_chain(g_fori, None, k=8) * 1e3:7.2f} ms")

    def g_real(eps):
        return pr._composite_fwd_call(rows + eps, bins.tile_start,
                                      bins.tile_count, tiles_x, tiles_y)
    print(f"{'real while_loop':22s}: {timed_chain(g_real, None, k=8) * 1e3:7.2f} ms")
    # value check
    c1, t1 = f_fori(chunk0, off, bins.tile_count, nxt, rows)
    c2, t2 = pr._composite_fwd_call(rows, bins.tile_start, bins.tile_count,
                                    tiles_x, tiles_y)
    print("max |dcolor|:", float(jnp.max(jnp.abs(c1 - c2))),
          "max |dt|:", float(jnp.max(jnp.abs(t1[:, :, 0] - t2))))


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "real":
        real_variants()
    else:
        main()
