"""Micro-profile of individual raster stages on the real chip.

Times each stage of the fwd+bwd step in isolation (composite kernel fwd,
composite fwd+bwd, instance gather + its scatter VJP, binning, SSIM loss)
to direct kernel optimization. Not part of the test suite.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bags_tpu.core.projection import project_gaussians
from bags_tpu.raster import RenderConfig, binning, render
from bags_tpu.raster.render import _composite_backend
from bags_tpu.train.losses import photometric_loss
from bags_tpu.utils.cache import enable_persistent_cache
from bags_tpu.utils.testing import make_toy_scene


def timed(fn, *args, reps=10):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(5):
            out = g(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / 5)
    return sorted(times)[len(times) // 2]


def main():
    enable_persistent_cache()
    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    static = sc["static"]
    cfg = RenderConfig(sh_degree=3, backend="auto", max_instances=mi)
    gt = jnp.zeros((3, wh, wh), jnp.float32)
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)

    proj = jax.jit(lambda *x: project_gaussians(*x, static, 3))(*a)
    bins = jax.jit(lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y, mi))(proj)
    print("n_instances:", int(bins.n_instances), "n_dropped:",
          int(bins.n_dropped))
    n_chunks_tot = int(jnp.sum(-(-bins.tile_count // 128)))
    print("total chunks (incl. tail pad):", n_chunks_tot,
          "tiles:", tiles_x * tiles_y)

    # gather rows (feature-major table + segment-reduction VJP)
    from bags_tpu.raster.render import FEATS, F_ACTIVE, gather_rows

    def gather(pr, b):
        table = jnp.stack(
            [pr.x2d, pr.y2d, pr.conic_a, pr.conic_b, pr.conic_c,
             pr.col_r, pr.col_g, pr.col_b, pr.opacity, pr.depth]
            + [jnp.zeros_like(pr.x2d)] * (FEATS - F_ACTIVE), axis=0)
        table = jnp.pad(table, ((0, 0), (0, 1)))
        return gather_rows(table, jnp.zeros((n, 2), jnp.float32), b)

    rows = jax.jit(gather)(proj, bins)
    t_gather = timed(gather, proj, bins)

    def gather_vjp(pr, b, ct):
        _, vjp = jax.vjp(lambda p: gather(p, b), pr)
        return vjp(ct)

    ct_rows = jnp.ones_like(rows)
    t_gather_vjp = timed(gather_vjp, proj, bins, ct_rows)

    from bags_tpu.raster.pallas_raster import composite_tiles_pallas
    bgv = jnp.zeros(3)

    def comp_fwd(r):
        return composite_tiles_pallas(r, bins.tile_start, bins.tile_count,
                                      tiles_x, tiles_y, bgv).color

    t_comp_fwd = timed(comp_fwd, rows)

    def comp_fwdbwd(r):
        out, vjp = jax.vjp(comp_fwd, r)
        return vjp(jnp.ones_like(out))

    t_comp_fwdbwd = timed(comp_fwdbwd, rows)

    t_bin = timed(lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y,
                                                   mi).gauss_id, proj)

    img = jax.jit(lambda *x: render(*x, static, cfg).render)(*a)

    def loss_grad(im):
        return jax.grad(lambda x: photometric_loss(x, gt))(im)

    t_loss = timed(loss_grad, img)

    def proj_vjp(*x):
        out, vjp = jax.vjp(
            lambda *y: project_gaussians(*y, static, 3), *x)
        ones = jax.tree_util.tree_map(jnp.ones_like, out)
        return vjp(ones)

    t_proj_vjp = timed(proj_vjp, *a)

    print(f"binning              : {t_bin * 1e3:7.2f} ms")
    print(f"gather rows          : {t_gather * 1e3:7.2f} ms")
    print(f"gather fwd+scatterVJP: {t_gather_vjp * 1e3:7.2f} ms")
    print(f"composite fwd        : {t_comp_fwd * 1e3:7.2f} ms")
    print(f"composite fwd+bwd    : {t_comp_fwdbwd * 1e3:7.2f} ms")
    print(f"proj fwd+bwd         : {t_proj_vjp * 1e3:7.2f} ms")
    print(f"ssim loss fwd+bwd    : {t_loss * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
