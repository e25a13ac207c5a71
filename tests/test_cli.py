"""End-to-end CLI smoke: train -> render -> metrics on a tiny scene."""

import json
import os

import numpy as np

from test_data import _write_colmap_scene


def test_cli_train_render_metrics(tmp_path):
    import metrics as metrics_cli
    import render as render_cli
    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=50,
                        rng=np.random.default_rng(9))

    train_cli.main([
        "-s", root, "-m", out, "--iterations", "8", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--test_iterations", "8",
        "--save_iterations", "8", "--checkpoint_iterations", "8", "--quiet"])
    assert os.path.exists(os.path.join(out, "chkpnt8.npz"))
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_8",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "evaluation_results.txt"))

    render_cli.main(["-m", out, "-s", root, "--sh_degree", "0",
                     "--backend", "jnp", "--max_instances", "4096",
                     "--skip_train"])
    renders = os.path.join(out, "test", "ours_8", "renders")
    assert len(os.listdir(renders)) >= 1

    metrics_cli.main(["-m", out])
    results = json.load(open(os.path.join(out, "results.json")))
    assert "test/ours_8" in results
    assert np.isfinite(results["test/ours_8"]["PSNR"])


def test_render_cli_uses_optimized_cameras(tmp_path, capsys):
    """After a pose-noise bundle-adjustment run, render.py must render the
    train split with the OPTIMIZED camera poses from the checkpoint, not the
    raw (noised) Scene poses (reference render.py:198 loads cams_train).
    """
    import jax
    import numpy as np
    import render as render_cli
    import train as train_cli
    from bags_tpu.train.checkpoint import load_checkpoint
    from bags_tpu.train.config import TrainConfig
    from train import build_scene_and_trainer

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=60,
                        rng=np.random.default_rng(5))

    train_cli.main([
        "-s", root, "-m", out, "--iterations", "12", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--opt_cam",
        "--r_t_noise", "0.05", "0.05", "1.0",
        "--test_iterations", "12", "--save_iterations", "12",
        "--checkpoint_iterations", "12", "--quiet"])

    # the optimized poses in the checkpoint differ from the scene's raw ones
    with open(os.path.join(out, "cfg.json")) as f:
        cfg = TrainConfig.from_json(f.read())
    scene, trainer, _ = build_scene_and_trainer(cfg, backend="jnp")
    state = load_checkpoint(os.path.join(out, "chkpnt12.npz"), trainer.state)
    base = getattr(state, "base", state)
    dq_moved = float(np.max(np.abs(np.asarray(base.cams.dq)
                                   - np.asarray(scene.train_cams.dq))))
    assert dq_moved > 0, "training never moved the poses?"

    render_cli.main(["-m", out, "-s", root, "--backend", "jnp",
                     "--skip_test"])
    outp = capsys.readouterr().out
    assert "restored full training state" in outp
    renders = os.path.join(out, "train", "ours_12", "renders")
    assert len(os.listdir(renders)) == 4


def test_top_level_api():
    import bags_tpu

    assert callable(bags_tpu.render)
    assert bags_tpu.RenderConfig().sh_degree == 3
    assert bags_tpu.Scene is not None
    assert bags_tpu.Trainer is not None
