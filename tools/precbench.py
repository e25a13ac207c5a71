"""End-to-end quality delta of the relaxed-precision compositing mode:
train the BASELINE config-1-class toy scene to convergence under
precision='exact' and precision='fast' (identical seeds/data) and report
final train PSNR + param drift. Completes the VERDICT r4 item-1 dossier:
bench throughput (bench.py), image/grad error bounds
(tests/test_precision.py), and THIS — the end-to-end PSNR delta.

Run on the chip: python tools/precbench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(iters: int = 1200):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig
    from bags_tpu.train.loop import Trainer
    from bags_tpu.utils.cache import enable_persistent_cache, warm_ssim_grad
    from bags_tpu.utils.testing import make_toy_scene

    enable_persistent_cache()
    if jax.default_backend() == "tpu":
        warm_ssim_grad()
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    wh, n_pts, cap = 400, 5000, 16384
    sc = make_toy_scene(n=n_pts, width=wh, height=wh, sh_degree=2, seed=3,
                        scale_range=(0.01, 0.05))
    static = sc["static"]
    rng = np.random.default_rng(3)

    n_cams = 6
    cams, gts = [], []
    gt_cfg = RenderConfig(sh_degree=2, backend=backend, max_instances=2 ** 18)
    for i in range(n_cams):
        ang = 0.06 * (i - n_cams / 2)
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        cam = CameraParams.create(R, np.zeros(3, np.float32), 0.8, 0.8)
        img = jax.jit(lambda c: render(
            sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], c, static, gt_cfg).render)(cam)
        cams.append(cam)
        gts.append(np.asarray(jax.block_until_ready(img)))
    cam_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    gt = jnp.asarray(np.stack(gts))

    pts = np.asarray(sc["xyz"]) + rng.normal(0, 0.03,
                                             (n_pts, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n_pts, 3)).astype(np.float32)

    results = {}
    for precision in ("exact", "fast"):
        g, alive = create_from_points(pts.copy(), cols.copy(), cap,
                                      sh_degree=2)
        cfg = TrainConfig(
            opt=OptimizationConfig(densify_from_iter=200,
                                   densify_until_iter=iters,
                                   densification_interval=200,
                                   opacity_reset_interval=10 ** 9),
            calib=CalibConfig(opt_cam=True, r_t_lr=(1e-3, 1e-3)),
            max_instances=2 ** 18)
        cfg.model.sh_degree = 2
        # identical pose noise both runs
        import dataclasses
        dq = np.random.default_rng(11).normal(
            0, 0.01, (n_cams, 4)).astype(np.float32)
        cam_noisy = dataclasses.replace(cam_b, dq=jnp.asarray(dq))
        rcfg = RenderConfig(sh_degree=2, backend=backend,
                            max_instances=2 ** 18, precision=precision)
        tr = Trainer(g, alive, cam_noisy, static, cfg, scene_extent=3.0,
                     gt_images=gt, rcfg=rcfg, seed=0)
        t0 = time.perf_counter()
        tr.run(iterations=iters, log_every=iters)
        dt = time.perf_counter() - t0

        # final PSNR over all views with the TRAINED cameras
        psnrs = []
        st = tr.state
        ecfg = dataclasses.replace(rcfg, sh_degree=tr.active_sh_degree)
        for i in range(n_cams):
            cam_i = jax.tree_util.tree_map(lambda x: x[i], st.cams)
            img = render(st.g.xyz, st.g.scaling(), st.g.quats,
                         st.g.opacity(st.alive), st.g.sh_coeffs(), cam_i,
                         static, ecfg).render
            mse = float(jnp.mean((jnp.clip(img, 0, 1) - gt[i]) ** 2))
            psnrs.append(-10.0 * np.log10(mse))
        results[precision] = dict(
            psnr=round(float(np.mean(psnrs)), 3),
            n_alive=int(jnp.sum(st.alive)),
            wall_s=round(dt, 1))
        print(f"{precision}: {results[precision]}", flush=True)

    results["psnr_delta_fast_minus_exact"] = round(
        results["fast"]["psnr"] - results["exact"]["psnr"], 3)
    print(json.dumps({"metric": "precision_mode_psnr", **results}),
          flush=True)


if __name__ == "__main__":
    main(iters=int(os.environ.get("BAGS_TPU_PRECBENCH_ITERS", "1200")))
