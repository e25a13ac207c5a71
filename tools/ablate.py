"""Ablation timing of the REAL fwd+bwd train step: swap one stage at a time
for a near-free stand-in and re-measure the whole jitted graph. Unlike
isolated stage benches (microprof.py), deltas here reflect in-situ costs
after XLA fusion/scheduling.

Variants:
  full        the bench.py step (render -> L1+SSIM -> grads)
  l1only      SSIM removed from the loss
  nocomposite Pallas fwd+bwd kernels replaced by a cheap reshape of rows
              (binning + gather + their VJPs still run)
  nogathervjp gather backward replaced with zeros (fwd gather still runs)
  nobin       rank_sorted/tile tables precomputed outside the graph (binning
              removed; gather + composite + VJPs still run)
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp

from bags_tpu.utils.cache import enable_persistent_cache

REPS = 7
INNER = 10


def timed(fn, args):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(INNER):
            out = g(*args)
        jax.block_until_ready(out)
        # force a real sync through the tunnel
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append((time.perf_counter() - t0) / INNER)
    return sorted(ts)[len(ts) // 2]


def main():
    enable_persistent_cache()
    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import RenderConfig, binning, render
    from bags_tpu.raster.render import FEATS, F_ACTIVE, gather_rows, _round_up
    from bags_tpu.raster import tiles
    from bags_tpu.train.losses import l1_loss, photometric_loss
    from bags_tpu.utils.testing import make_toy_scene

    n, wh = 100_000, 800
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    static = sc["static"]
    cfg = RenderConfig(sh_degree=3, backend="pallas", max_instances=2 ** 20)
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    args = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], sc["cam"])

    def step(loss_kind, composite, use_bin, *a):
        # fixed bins arrive as ARGS (never as closed-over device constants:
        # big jaxpr constants trip the axon compile service — see memory
        # axon-tpu-pitfalls)
        *a, fixed_bins = a
        xyz, scales, quats, opacity, sh, cam = a

        def loss_fn(xyz, scales, quats, opacity, sh, cam):
            proj = project_gaussians(xyz, scales, quats, opacity, sh, cam,
                                     static, cfg.sh_degree)
            if use_bin:
                bins = binning.bin_gaussians(
                    jax.lax.stop_gradient(proj), tiles_x, tiles_y,
                    _round_up(cfg.max_instances))
            else:
                bins = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                              fixed_bins)
            table = jnp.stack(
                [proj.x2d, proj.y2d, proj.conic_a, proj.conic_b, proj.conic_c,
                 proj.opacity, proj.col_r, proj.col_g, proj.col_b, proj.depth]
                + [jnp.zeros_like(proj.x2d)] * (FEATS - F_ACTIVE), axis=0)
            table = jnp.pad(table, ((0, 0), (0, 1)))
            abs_probe = jnp.zeros((n, 2), jnp.float32)
            rows = gather_rows(table, abs_probe, bins)

            if composite == "pallas":
                from bags_tpu.raster.pallas_raster import composite_tiles_pallas
                tile_img = composite_tiles_pallas(
                    rows, bins.tile_start, bins.tile_count, tiles_x, tiles_y,
                    jnp.zeros(3, jnp.float32))
                img = tiles.tiles_to_image(tile_img.color, tiles_x, tiles_y,
                                           wh, wh)
            else:
                # stand-in with the same output shape + a grad path to rows
                num_tiles = tiles_x * tiles_y
                fake = rows[6:9, :num_tiles * 256]
                img = tiles.tiles_to_image(
                    jnp.transpose(fake.reshape(3, num_tiles, 256), (1, 2, 0)),
                    tiles_x, tiles_y, wh, wh)

            gt = jnp.zeros((3, wh, wh), jnp.float32)  # in-graph, not a closure
            if loss_kind == "l1":
                return l1_loss(img, gt)
            return photometric_loss(img, gt)

        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(*a)

    # Precompute fixed bins for the nobin variant (passed as jit args).
    proj0 = jax.jit(lambda *a: project_gaussians(*a, static, cfg.sh_degree))(
        *args)
    fixed_bins = jax.block_until_ready(jax.jit(
        lambda p: binning.bin_gaussians(p, tiles_x, tiles_y,
                                        _round_up(cfg.max_instances)))(proj0))
    args = args + (fixed_bins,)

    variants = [
        ("full", functools.partial(step, "photo", "pallas", True)),
        ("l1only", functools.partial(step, "l1", "pallas", True)),
        ("nocomposite", functools.partial(step, "photo", "none", True)),
        ("nobin", functools.partial(step, "photo", "pallas", False)),
        ("nobin+nocomp", functools.partial(step, "photo", "none", False)),
    ]
    base = None
    for name, fn in variants:
        t = timed(fn, args)
        d = "" if base is None else f"  (delta {1e3 * (base - t):+6.2f})"
        if base is None:
            base = t
        print(f"{name:14s}: {t * 1e3:7.2f} ms{d}")


if __name__ == "__main__":
    main()
