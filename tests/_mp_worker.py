"""Worker for the 2-process jax.distributed integration tests
(tests/test_multiprocess.py). Each process owns 4 virtual CPU devices; the
mesh spans all 8. Builds the FULL ShardedTrainer over the 2-process mesh
and runs one of several scenarios:

  basic        3 steps with the host-sharded GT feed; print losses
  densify      4 steps with densification ACTIVE at a tiny threshold;
               print losses + final alive count
  ckpt_save    2 steps, save a v2 checkpoint from the 2-process sharded
               state (collective gather; process 0 writes), 1 more step;
               print losses
  ckpt_resume  restore a (single-process-written) checkpoint into the
               2-process sharded state, run 1 step; print the loss

Usage: python tests/_mp_worker.py <pid> <port> <steps> [mode] [ckpt_path]
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["BAGS_TPU_PALLAS_INTERPRET"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def build_trainer(densify: bool):
    """The deterministic toy workload (shared with the single-process
    reference runs in test_multiprocess.py)."""
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams, CameraStatic
    from bags_tpu.dist.mesh import make_mesh
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig

    n_devices = 8
    assert len(jax.devices()) == n_devices
    mesh = make_mesh(n_devices)
    height, width = 40, 64
    static = CameraStatic(width=width, height=height)
    capacity = 64 * n_devices
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, capacity // 2),
                    rng.uniform(-1, 1, capacity // 2),
                    rng.uniform(4, 8, capacity // 2)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (capacity // 2, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, capacity, sh_degree=1)
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    if densify:
        opt = OptimizationConfig(densify_from_iter=1,
                                 densification_interval=2,
                                 densify_grad_threshold=1e-8,
                                 opacity_reset_interval=10 ** 9)
    else:
        opt = OptimizationConfig(densify_from_iter=10 ** 9,
                                 densify_until_iter=0)
    cfg = TrainConfig(max_instances=512 * n_devices, mesh=n_devices,
                      opt=opt, calib=CalibConfig(opt_cam=True))
    cfg.model.sh_degree = 1
    rcfg = RenderConfig(sh_degree=1, backend="jnp",
                        max_instances=cfg.max_instances, max_per_tile=512)
    # HOST-LOCAL GT (numpy): forces _pad_gt's multi-process
    # make_array_from_callback branch — each host materializes only its
    # devices' row slabs.
    gt = np.full((2, 3, height, width), 0.5, np.float32)
    return ShardedTrainer(g, alive, cams, static, cfg, scene_extent=10.0,
                          gt_images=gt, rcfg=rcfg, mesh=mesh)


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    steps = int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "basic"
    ckpt = sys.argv[5] if len(sys.argv) > 5 else ""

    from bags_tpu.dist.trainer import init_distributed

    ok = init_distributed(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2, "distributed init failed"

    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    trainer = build_trainer(densify=(mode == "densify"))
    losses = []

    if mode == "ckpt_resume":
        # the v2 format's re-shard-on-load claim, exercised for real:
        # a SINGLE-process checkpoint restored into 2-process shardings
        trainer.state = load_checkpoint(ckpt, trainer.state)
        trainer._shard_state()
        hist = trainer.run(iterations=1, log_every=1)
        losses = [h[1] for h in hist]
    elif mode == "ckpt_save":
        hist = trainer.run(iterations=2, log_every=1)
        losses = [h[1] for h in hist]
        save_checkpoint(ckpt, trainer.state)   # collective; pid 0 writes
        hist = trainer.run(iterations=1, log_every=1)
        losses += [h[1] for h in hist]
    else:
        hist = trainer.run(iterations=steps, log_every=1)
        losses = [h[1] for h in hist]

    print("MP_LOSSES:" + ",".join(f"{l:.8f}" for l in losses), flush=True)
    if mode == "densify":
        print(f"MP_ALIVE:{int(jnp.sum(trainer.state.alive))}", flush=True)


if __name__ == "__main__":
    main()
