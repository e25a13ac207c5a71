"""Config serialization, presets, logging."""

import json
import os

from bags_tpu.train.config import TrainConfig, OptimizationConfig, CalibConfig
from bags_tpu.train.presets import PRESETS, apply_preset


def test_config_json_roundtrip():
    cfg = TrainConfig(
        opt=OptimizationConfig(iterations=123, feature_lr=0.9),
        calib=CalibConfig(opt_cam=True, flow_scale=(2.0, 2.0)),
        mcmc=True, test_iterations=(1, 2, 3))
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2.opt.iterations == 123
    assert cfg2.calib.opt_cam is True
    assert cfg2.calib.flow_scale == (2.0, 2.0)
    assert cfg2.mcmc is True
    assert cfg2.test_iterations == (1, 2, 3)


def test_reference_defaults():
    """SURVEY.md §7.4 parity: the exact reference hyperparameters."""
    opt = OptimizationConfig()
    assert opt.position_lr_init == 0.00016
    assert opt.position_lr_final == 0.0000016
    assert opt.feature_lr == 0.0025
    assert opt.opacity_lr == 0.05
    assert opt.scaling_lr == 0.005
    assert opt.rotation_lr == 0.001
    assert opt.lambda_dssim == 0.2
    assert opt.densify_grad_threshold == 0.0002
    assert opt.abs_densify_grad_threshold == 0.0004
    assert opt.densification_interval == 100
    assert opt.opacity_reset_interval == 3000
    assert (opt.densify_from_iter, opt.densify_until_iter) == (500, 15000)
    calib = CalibConfig()
    assert calib.r_t_lr == (0.01, 0.01)
    assert calib.pose_lr_milestones == (7000, 30000)
    assert calib.iresnet_lr == 1e-7


def test_apply_preset_expands():
    argv = ["-s", "data", "--preset", "pose_noise", "--iterations", "5"]
    out = apply_preset(argv)
    assert "--preset" not in out
    assert "--opt_cam" in out
    # user's explicit flag comes after the preset -> argparse keeps it (last
    # occurrence wins)
    import train as train_cli
    parsed = train_cli.build_parser().parse_args(out)
    assert parsed.iterations == 5
    assert parsed.opt_cam is True


def test_all_presets_parse():
    import train as train_cli
    parser = train_cli.build_parser()
    for name in PRESETS:
        args = parser.parse_args(
            apply_preset(["-s", "x", "--preset", name]))
        assert args.source_path == "x"


def test_metrics_logger(tmp_path):
    from bags_tpu.utils.logging import MetricsLogger
    log = MetricsLogger(str(tmp_path))
    log.log(1, loss=0.5, n=3)
    log.log(2, loss=0.25)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
    assert lines[1]["step"] == 2


def test_snap_capacity_ladder():
    from bags_tpu.train.loop import snap_capacity
    assert snap_capacity(0) == 2 ** 17
    assert snap_capacity(100_000) == 131072  # 130k -> ceil to 64k ladder
    assert snap_capacity(645_885) == 851968  # bench-scale: 1.3x, 13*65536
    assert snap_capacity(645_885) % 65536 == 0


def test_finalize_capacity_estimates_from_trainer_geometry(tmp_path):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import numpy as np
    from test_data import _write_colmap_scene
    from train import args_to_config, build_parser, build_scene_and_trainer

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=3, n_pts=40,
                        rng=np.random.default_rng(2))
    args = build_parser().parse_args(
        ["-s", root, "--sh_degree", "0", "--cap_max", "128"])
    cfg = args_to_config(args)
    assert cfg.max_instances == 0
    scene, trainer, rcfg = build_scene_and_trainer(cfg, backend="jnp")
    assert cfg.max_instances >= 2 ** 17
    assert rcfg.max_instances == cfg.max_instances
    assert trainer.rcfg.max_instances == cfg.max_instances
