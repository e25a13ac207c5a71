#!/usr/bin/env python
"""Profiling tool: per-stage timings + roofline estimates for the rasterizer.

The SURVEY.md §5 observability item ("jax.profiler traces + per-step timing;
roofline counters"). Prints a stage breakdown of one fwd+bwd train-style step
and bandwidth/FLOP utilization estimates. Timing forces a host fetch per call
because `block_until_ready` does not synchronize through this image's axon
TPU tunnel. Use --trace DIR to additionally capture a jax.profiler trace
viewable in TensorBoard/Perfetto.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# v5e reference numbers (per chip)
HBM_GBS = 819.0
F32_TFLOPS = 98.0 / 2  # bf16 197 TOPS; f32 multi-pass ~ 1/4


def timed(fn, *args, reps=10):
    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    g = jax.jit(wrapped)
    float(g(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--size", type=int, default=800)
    p.add_argument("--max_instances", type=int, default=2 ** 20)
    p.add_argument("--trace", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import RenderConfig, binning, render
    from bags_tpu.train.losses import photometric_loss
    from bags_tpu.utils.cache import enable_persistent_cache, warm_ssim_grad
    from bags_tpu.utils.testing import make_toy_scene

    enable_persistent_cache()
    if jax.default_backend() == "tpu":
        warm_ssim_grad()

    n, wh, mi = args.n, args.size, args.max_instances
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    static = sc["static"]
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    cfg = RenderConfig(sh_degree=3, backend=backend, max_instances=mi)
    gt = jnp.zeros((3, wh, wh), jnp.float32)
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)

    t_rt = timed(lambda x: x * 2.0, sc["opacity"])
    t_proj = timed(lambda *x: project_gaussians(*x, static, 3).mean2d, *a)
    proj = jax.jit(lambda *x: project_gaussians(*x, static, 3))(*a)
    t_bin = timed(lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y,
                                                   mi).gauss_id, proj)
    t_fwd = timed(lambda *x: render(*x, static, cfg).render, *a)

    def loss_fn(*x):
        return photometric_loss(render(*x, static, cfg).render, gt)

    jax.block_until_ready(jax.jit(loss_fn)(*a))  # staged compile
    t_step = timed(lambda *x: jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3, 4, 5))(*x), *a)

    def ms(t):
        return (t - t_rt) * 1e3

    m_al = binning.aligned_capacity(mi, tiles_x * tiles_y)
    step_ms = ms(t_step)
    pix_s = wh * wh / (step_ms / 1e3)
    # bandwidth model: packets + grads + gathers/scatters dominate
    step_bytes = m_al * 4 * (12 + 16 + 16 + 12)   # gather + pack + dpk + scatter
    print(f"workload: {n} Gaussians, {wh}x{wh}, cap {mi} "
          f"(aligned {m_al}), backend {backend}")
    print(f"tunnel round-trip floor : {t_rt * 1e3:8.2f} ms (subtracted below)")
    print(f"projection              : {ms(t_proj):8.2f} ms")
    print(f"binning                 : {ms(t_bin):8.2f} ms")
    print(f"forward render          : {ms(t_fwd):8.2f} ms")
    print(f"fwd+bwd step            : {step_ms:8.2f} ms "
          f"({pix_s / 1e6:.2f} Mpix/s)")
    print(f"instance-stream bytes   : {step_bytes / 1e6:8.1f} MB "
          f"-> {step_bytes / (step_ms / 1e3) / 1e9:.0f} GB/s "
          f"({step_bytes / (step_ms / 1e3) / 1e9 / HBM_GBS * 100:.0f}% of "
          f"v5e HBM)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(jax.jit(jax.value_and_grad(
                loss_fn, argnums=(0,)))(*a))
        print(f"profiler trace written to {args.trace}")


if __name__ == "__main__":
    main()
