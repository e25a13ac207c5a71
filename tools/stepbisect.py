"""Cumulative bisect of the FULL fused train-step gradient chain.

Times jax.grad through progressively deeper prefixes of the real render+loss
pipeline (fused Pallas path throughout), so consecutive differences give each
stage's marginal cost including its backward."""

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
    from bags_tpu.raster import RenderConfig, binning, render, tiles
    from bags_tpu.raster.render import (build_packet_table,
                                        fused_composite_pallas)
    from bags_tpu.train.losses import photometric_loss
    from bags_tpu.utils.testing import make_toy_scene

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    static = sc["static"]
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    gt = jnp.zeros((3, wh, wh), jnp.float32)
    bgv = jnp.zeros(3, jnp.float32)
    cfg = RenderConfig(sh_degree=3, backend="pallas", max_instances=mi)

    proj = jax.jit(lambda *x: project_gaussians(*x, static, 3))(*a)
    bins = jax.jit(
        lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y, mi))(proj)
    table0 = jax.jit(lambda p: build_packet_table(p, p.x2d, p.y2d))(proj)

    def report(name, t):
        print(f"{name:34s}: {t * 1e3:7.2f} ms")

    # 1. fused composite grad wrt table, fixed bins, raw tile-sum loss
    def f1(eps):
        def fn(t_):
            ti = fused_composite_pallas(t_, None, bins, tiles_x, tiles_y, bgv)
            return jnp.sum(ti.color) + jnp.sum(ti.t_final)
        return jax.grad(fn)(table0 + eps)
    report("grad(table): fused comp, sum", timed_chain(f1, None, k=8))

    # 2. + image assembly + photometric loss
    def f2(eps):
        def fn(t_):
            ti = fused_composite_pallas(t_, None, bins, tiles_x, tiles_y, bgv)
            img = tiles.tiles_to_image(ti.color, tiles_x, tiles_y, wh, wh)
            return photometric_loss(img, gt)
        return jax.grad(fn)(table0 + eps)
    report("+ image + L1/SSIM loss", timed_chain(f2, None, k=8))

    # 3. + abs_probe (12-row reduction)
    absp = jnp.zeros((n, 2), jnp.float32)

    def f3(eps):
        def fn(t_, ap):
            ti = fused_composite_pallas(t_, ap, bins, tiles_x, tiles_y, bgv)
            img = tiles.tiles_to_image(ti.color, tiles_x, tiles_y, wh, wh)
            return photometric_loss(img, gt)
        return jax.grad(fn, argnums=(0, 1))(table0 + eps, absp)
    report("+ abs densify channel", timed_chain(f3, None, k=8))

    # 4. full render() from raw params, grads wrt all 6 (= bench workload)
    def f4(eps):
        def fn(xyz, scales, quats, opacity, sh, cam):
            out = render(xyz, scales, quats, opacity, sh, cam, static, cfg)
            return photometric_loss(out.render, gt)
        return jax.value_and_grad(fn, argnums=(0, 1, 2, 3, 4, 5))(
            a[0] + eps, *a[1:])
    report("full step (bench workload)", timed_chain(f4, None, k=8))

    # 4b. full minus binning: fixed bins threaded in
    def f4b(eps):
        def fn(xyz, scales, quats, opacity, sh, cam):
            pr = project_gaussians(xyz, scales, quats, opacity, sh, cam,
                                   static, 3)
            t_ = build_packet_table(pr, pr.x2d, pr.y2d)
            ti = fused_composite_pallas(t_, None, bins, tiles_x, tiles_y, bgv)
            img = tiles.tiles_to_image(ti.color, tiles_x, tiles_y, wh, wh)
            return photometric_loss(img, gt)
        return jax.value_and_grad(fn, argnums=(0, 1, 2, 3, 4, 5))(
            a[0] + eps, *a[1:])
    report("full step, binning hoisted", timed_chain(f4b, None, k=8))


if __name__ == "__main__":
    main()
