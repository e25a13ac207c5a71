"""Bisect the backward-pass cost by timing vjp pullbacks of sub-chains."""

import sys
import os
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import RenderConfig, binning, render, tiles
    from bags_tpu.raster.render import FEATS, F_ACTIVE, gather_rows
    from bags_tpu.raster.pallas_raster import composite_tiles_pallas
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
    cfg = RenderConfig(sh_degree=3, backend="auto", max_instances=mi)
    bgv = jnp.zeros(3)

    def report(name, t):
        print(f"{name:32s}: {t * 1e3:7.2f} ms")

    proj = jax.jit(lambda *x: project_gaussians(*x, static, 3))(*a)
    bins = jax.jit(
        lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y, mi))(proj)
    absp = jnp.zeros((n, 2), jnp.float32)
    table = jax.jit(lambda p: jnp.pad(jnp.stack(
        [p.x2d, p.y2d, p.conic_a, p.conic_b, p.conic_c,
         p.col_r, p.col_g, p.col_b, p.opacity, p.depth]
        + [jnp.zeros_like(p.x2d)] * (FEATS - F_ACTIVE), axis=0),
        ((0, 0), (0, 1))))(proj)
    rows = jax.jit(lambda t_: gather_rows(t_, absp, bins))(table)

    def img_from_tiles(tile_img):
        return tiles.tiles_to_image(tile_img.color, tiles_x, tiles_y, wh, wh)

    # 1. loss from rows (composite + image + ssim bwd)
    def loss_rows(r):
        ti = composite_tiles_pallas(r, bins.tile_start, bins.tile_count,
                                    tiles_x, tiles_y, bgv)
        return photometric_loss(img_from_tiles(ti), gt)

    def f1(eps):
        return jax.grad(loss_rows)(rows + eps)
    report("d(loss)/d(rows)", timed_chain(f1, None, k=8))

    # 2. loss from table (+ gather bwd)
    def loss_table(t_):
        r = gather_rows(t_, absp, bins)
        ti = composite_tiles_pallas(r, bins.tile_start, bins.tile_count,
                                    tiles_x, tiles_y, bgv)
        return photometric_loss(img_from_tiles(ti), gt)

    def f2(eps):
        return jax.grad(loss_table)(table + eps)
    report("d(loss)/d(table)", timed_chain(f2, None, k=8))

    # 2b. gather fwd+bwd chain alone in ONE jit
    ct_rows = jnp.ones_like(rows)

    def f2b(eps):
        return jax.grad(
            lambda t_: jnp.vdot(gather_rows(t_, absp, bins), ct_rows))(
                table + eps)
    report("gather fwd+bwd one jit", timed_chain(f2b, None, k=8))

    # 2c. same but plain take (XLA scatter-add backward) for comparison
    def f2c(eps):
        def fn(t_):
            n_ = bins.depth_order.shape[0]
            dop = jnp.concatenate(
                [bins.depth_order, jnp.full((1,), n_, jnp.int32)])
            rows_ = jnp.take(jnp.take(t_, dop, axis=1), bins.rank_sorted,
                             axis=1)
            return jnp.vdot(rows_, ct_rows)
        return jax.grad(fn)(table + eps)
    report("take fwd + scatter bwd", timed_chain(f2c, None, k=8))

    # 3. loss from projected SoA (+ stack/pad bwd + binning recompute?)
    def loss_proj(pr):
        b = binning.bin_gaussians(jax.lax.stop_gradient(pr),
                                  tiles_x, tiles_y, mi)
        t_ = jnp.pad(jnp.stack(
            [pr.x2d, pr.y2d, pr.conic_a, pr.conic_b, pr.conic_c,
             pr.col_r, pr.col_g, pr.col_b, pr.opacity, pr.depth]
            + [jnp.zeros_like(pr.x2d)] * (FEATS - F_ACTIVE), axis=0),
            ((0, 0), (0, 1)))
        r = gather_rows(t_, absp, b)
        ti = composite_tiles_pallas(r, b.tile_start, b.tile_count,
                                    tiles_x, tiles_y, bgv)
        return photometric_loss(img_from_tiles(ti), gt)

    def f3(eps):
        float_fields = ("x2d", "y2d", "conic_a", "conic_b", "conic_c",
                        "col_r", "col_g", "col_b", "opacity", "depth")

        def fn(*vals):
            pr = dataclasses.replace(
                proj, **dict(zip(float_fields, vals)))
            return loss_proj(pr)
        vals0 = tuple(getattr(proj, f) for f in float_fields)
        return jax.grad(fn, argnums=tuple(range(10)))(
            vals0[0] + eps, *vals0[1:])
    report("d(loss)/d(proj) incl binning", timed_chain(f3, None, k=8))

    # 4. full loss grad wrt xyz only
    def loss_full(xyz):
        out = render(xyz, *a[1:], static, cfg)
        return photometric_loss(out.render, gt)

    def f4(eps):
        return jax.grad(loss_full)(a[0] + eps)
    report("d(loss)/d(xyz) full", timed_chain(f4, None, k=8))

    # 5. full loss grad wrt all 6
    def loss_all(*args6):
        out = render(*args6, static, cfg)
        return photometric_loss(out.render, gt)

    def f5(eps):
        return jax.value_and_grad(loss_all, argnums=(0, 1, 2, 3, 4, 5))(
            a[0] + eps, *a[1:])
    report("value_and_grad all 6", timed_chain(f5, None, k=8))


if __name__ == "__main__":
    main()
