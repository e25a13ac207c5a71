"""Benchmark: fwd+bwd rasterization throughput (pixels/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Both compositing precision modes are measured (RenderConfig.precision
"exact" = CUDA-parity f32 via 3x-bf16-split MXU passes, "fast" =
single-pass bf16 with f32 accumulation); the headline `value` is the fast
mode (the recommended training default — quality delta quantified in
tests/test_precision.py and README), with `value_exact` alongside.

Workload: 100k Gaussians, 800x800 image, SH degree 3, full differentiable
train-style step (render -> L1+SSIM loss -> grads for Gaussians + camera
pose/intrinsics) on one chip — the BASELINE.json "pixels/s/chip fwd+bwd"
metric. `--large` switches to the BASELINE config-4-scale workload
(1M Gaussians, 1600x1080).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline constant is the throughput a stock CUDA 3DGS fwd+bwd achieves on an
RTX 4090-class GPU (~25 train iters/s at 800x800 ≈ 1.6e7 pixels/s), the
hardware class the reference README targets (README.md:40-44).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PIXELS_PER_S = 1.6e7


def _measure(sc, static, cfg, batch_cams, width, height, iters=20):
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import render
    from bags_tpu.train.losses import photometric_loss

    gt = jnp.zeros((3, height, width), jnp.float32)

    def loss_one(xyz, scales, quats, opacity, sh, cam):
        out = render(xyz, scales, quats, opacity, sh, cam, static, cfg)
        return photometric_loss(out.render, gt)

    if batch_cams > 1:
        # K views per step (train.py --batch_cams): mean loss over a camera
        # batch, the view vmap maps the Pallas grid. pixels/s counts K*H*W.
        import dataclasses

        def loss_fn(xyz, scales, quats, opacity, sh, cams_k):
            losses = jax.vmap(
                lambda c: loss_one(xyz, scales, quats, opacity, sh, c))(
                    cams_k)
            return jnp.mean(losses)

        cam_b = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * batch_cams), sc["cam"])
        cam_b = dataclasses.replace(
            cam_b, dt=cam_b.dt + 1e-3 * jnp.arange(batch_cams)[:, None])
        args = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                sc["sh_coeffs"], cam_b)
    else:
        loss_fn = loss_one
        args = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                sc["sh_coeffs"], sc["cam"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

    # Staged compiles: the axon compile service hits a pathological slow path
    # on cold monolithic fwd+bwd graphs; compiling the forward first warms
    # the service so the grad compile is incremental (see utils/cache.py).
    fwd = jax.jit(lambda *a: render(
        *a[:5], jax.tree_util.tree_map(lambda x: x[0], a[5])
        if batch_cams > 1 else a[5], static, cfg).render)
    jax.block_until_ready(fwd(*args))
    out = grad_fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = grad_fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return batch_cams * width * height / dt


def _build_workload(n, width, height, scale_range, batch_cams):
    import jax

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.train.loop import snap_capacity
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=n, width=width, height=height, sh_degree=3, seed=0,
                        scale_range=scale_range)
    static = sc["static"]

    # Instance budget sized exactly the way a real training run sizes it
    # (train.py --max_instances 0 -> train/loop.py estimate_capacity):
    # tile-coverage estimate x 1.3 headroom, snapped to the 65536 ladder,
    # with overflow growth as the backstop. The CUDA reference resizes its
    # buffers dynamically per frame; a fixed 2^20 budget would benchmark
    # ~25% of slots that no real run allocates.
    tiles_x, tiles_y = binning.tile_grid(width, height)
    n_inst = int(jax.jit(lambda *a: binning.count_instances(
        project_gaussians(*a, static, 0), tiles_x, tiles_y))(
            sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], sc["cam"]))
    cap = snap_capacity(n_inst)
    return sc, static, cap


def main(batch_cams: int = 1, large: bool = False):
    import jax

    from bags_tpu.raster import RenderConfig
    from bags_tpu.utils.cache import enable_persistent_cache, warm_ssim_grad

    enable_persistent_cache()
    warm_ssim_grad()  # axon compile-service warmup (see utils/cache.py)

    if large:
        # BASELINE config-4 scale: garden-class Gaussian count at full-ish
        # resolution. Splat sizes shrink with sqrt(N) so screen coverage
        # stays trained-scene-like rather than pathological.
        n, width, height = 1_000_000, 1600, 1080
        scale_range = (0.0025, 0.011)
        metric = "pixels_per_s_fwd_bwd_large"
    else:
        # Lego-class workload: 100k Gaussians at 800x800, splat sizes chosen
        # so the mean tile coverage (~4-8 tiles/Gaussian) matches a trained
        # NeRF-Synthetic scene rather than a pathological full-screen overlap.
        n, width, height = 100_000, 800, 800
        scale_range = (0.008, 0.035)
        metric = "pixels_per_s_fwd_bwd"

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    sc, static, cap = _build_workload(n, width, height, scale_range,
                                      batch_cams)

    vals = {}
    for precision in ("fast", "exact2", "exact"):
        cfg = RenderConfig(sh_degree=3, backend=backend, max_instances=cap,
                           precision=precision)
        vals[precision] = _measure(sc, static, cfg, batch_cams,
                                   width, height)

    pixels_per_s = vals["fast"]
    print(json.dumps({
        "metric": metric,
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
        "precision": "fast",
        "value_exact": round(vals["exact"], 1),
        "vs_baseline_exact": round(vals["exact"] / BASELINE_PIXELS_PER_S, 4),
        "value_exact2": round(vals["exact2"], 1),
        "vs_baseline_exact2": round(vals["exact2"] / BASELINE_PIXELS_PER_S,
                                    4),
    }))


if __name__ == "__main__":
    main(batch_cams=int(os.environ.get("BAGS_TPU_BENCH_BATCH", "1")),
         large="--large" in sys.argv)
