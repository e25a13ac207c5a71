"""Real-chip check: ShardedTrainer on a 1-device mesh (shard_map + Pallas on
real Mosaic) matches the plain Trainer step-for-step. VERDICT round-1 noted
the sharded+Pallas combination was never executed on hardware; a >1 mesh is
impossible on one chip, so mesh size 1 is the hardware-truth test."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bags_tpu.core.camera import CameraParams, CameraStatic
    from bags_tpu.dist.mesh import make_mesh
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.config import CalibConfig, TrainConfig
    from bags_tpu.train.loop import Trainer

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    static = CameraStatic(width=64, height=48)
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 96), rng.uniform(-1, 1, 96),
                    rng.uniform(4, 8, 96)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (96, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, 128, sh_degree=1)
    cams = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    cfg = TrainConfig(max_instances=2048, calib=CalibConfig(opt_cam=True))
    cfg.model.sh_degree = 1
    gt = jnp.full((2, 3, 48, 64), 0.4, jnp.float32)
    rcfg = RenderConfig(sh_degree=1, backend=backend, max_instances=2048,
                        max_per_tile=512)

    t1 = Trainer(g, alive, cams, static, cfg, scene_extent=8.0,
                 gt_images=gt, rcfg=rcfg, seed=0)
    cfg2 = TrainConfig(max_instances=2048, mesh=1,
                       calib=CalibConfig(opt_cam=True))
    cfg2.model.sh_degree = 1
    t2 = ShardedTrainer(g, alive, cams, static, cfg2, scene_extent=8.0,
                        gt_images=gt, rcfg=rcfg, mesh=make_mesh(1), seed=0)
    h1 = t1.run(iterations=4, log_every=1)
    h2 = t2.run(iterations=4, log_every=1)
    l1 = np.array([h[1] for h in h1])
    l2 = np.array([h[1] for h in h2])
    print("plain  losses:", np.round(l1, 6))
    print("mesh-1 losses:", np.round(l2, 6))
    assert np.allclose(l1, l2, atol=5e-4), "mesh-1 sharded != unsharded"
    dx = float(jnp.max(jnp.abs(t1.state.g.xyz - t2.state.g.xyz)))
    print(f"MESH-1 PARITY OK (max xyz delta {dx:.2e})")


if __name__ == "__main__":
    main()
