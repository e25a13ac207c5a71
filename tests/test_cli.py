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


def test_train_cli_serves_network_gui(tmp_path):
    """--gui: a fake SIBR client connects to a LIVE training loop, requests a
    frame, and receives raw RGB bytes + the verify string (reference
    train.py:180-193 polls the socket every iteration)."""
    import socket
    import threading

    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=3, n_pts=40,
                        rng=np.random.default_rng(2))

    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    w = h = 32
    view = np.eye(4)
    view[3, :3] = [0.0, 0.0, 3.0]
    msg = dict(resolution_x=w, resolution_y=h, train=True, fov_x=0.9,
               fov_y=0.9, z_near=0.01, z_far=100.0, shs_python=False,
               rot_scale_python=False, keep_alive=False,
               scaling_modifier=1.0,
               view_matrix=view.flatten().tolist(),
               view_projection_matrix=np.eye(4).flatten().tolist())
    received = {}

    def client():
        import json
        import time
        deadline = time.time() + 60
        s = None
        while s is None and time.time() < deadline:
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=2)
            except OSError:
                time.sleep(0.1)
        # the first frame waits on a fresh jit compile of the GUI render
        s.settimeout(240)
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)
        img = b""
        want = w * h * 3
        while len(img) < want:
            chunk = s.recv(want - len(img))
            if not chunk:
                break
            img += chunk
        vlen = int.from_bytes(s.recv(4), "little")
        received["verify"] = s.recv(vlen).decode()
        received["img_len"] = len(img)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "25", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "64",
        "--densify_from_iter", "100000", "--test_iterations", "-1",
        "--save_iterations", "-1", "--checkpoint_iterations", "-1",
        "--quiet", "--gui", "--port", str(port)])
    t.join(timeout=10)
    assert received.get("img_len") == w * h * 3
    assert received.get("verify") == root


def test_top_level_api():
    import bags_tpu

    assert callable(bags_tpu.render)
    assert bags_tpu.RenderConfig().sh_degree == 3
    assert bags_tpu.Scene is not None
    assert bags_tpu.Trainer is not None


def test_train_cli_mesh_checkpoint_resume(tmp_path):
    """--mesh training checkpoints and resumes (shardings re-pinned)."""
    import numpy as np
    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=50,
                        rng=np.random.default_rng(3))
    common = ["-s", root, "-m", out, "--sh_degree", "0", "--backend", "jnp",
              "--max_instances", "4096", "--cap_max", "128", "--mesh", "2",
              "--densify_from_iter", "100000", "--quiet",
              "--test_iterations", "-1", "--save_iterations", "-1"]
    train_cli.main(common + ["--iterations", "4",
                             "--checkpoint_iterations", "4"])
    assert os.path.exists(os.path.join(out, "chkpnt4.npz"))
    train_cli.main(common + ["--iterations", "6",
                             "--checkpoint_iterations", "6",
                             "--start_checkpoint",
                             os.path.join(out, "chkpnt4.npz")])
    assert os.path.exists(os.path.join(out, "chkpnt6.npz"))


def test_train_cli_mesh_calibrated_modes(tmp_path):
    """--mesh composes with ALL THREE calibrated modes end-to-end through
    the CLI (round-4: cubemap and apply2gt train sharded instead of
    raising — dist/calib.py make_sharded_cubemap_step / _gt_warp_rows;
    numerical parity vs the single-chip steps is covered by
    tests/test_sharded.py): each mode runs 2 iterations on a 2-device mesh
    and writes a CalibState checkpoint."""
    import numpy as np
    import train as train_cli

    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=50,
                        rng=np.random.default_rng(5))
    for mode_flags, tag in (
            (["--outside_rasterizer", "--opt_distortion",
              "--no_init_iresnet"], "fisheye"),
            (["--outside_rasterizer", "--apply2gt", "--opt_distortion",
              "--no_init_iresnet"], "apply2gt"),
            (["--cubemap", "--no_init_iresnet"], "cubemap")):
        out = str(tmp_path / f"out_{tag}")
        train_cli.main(
            ["-s", root, "-m", out, "--sh_degree", "0", "--backend", "jnp",
             "--max_instances", "4096", "--cap_max", "128", "--mesh", "2",
             "--iterations", "2", "--quiet", "--test_iterations", "-1",
             "--save_iterations", "-1", "--densify_from_iter", "100000",
             "--checkpoint_iterations", "2"] + mode_flags)
        assert os.path.exists(os.path.join(out, "chkpnt2.npz")), tag


def test_render_cli_test_time_pose_opt_persists(tmp_path, capsys):
    """--optim_test_pose_iter optimizes the test-camera poses
    photometrically and persists them (reference render.py:214-283 +
    opt_test_cam.pt); a second invocation reloads instead of re-opting."""
    import numpy as np
    import render as render_cli
    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=9, n_pts=60,
                        rng=np.random.default_rng(17))
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "8", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--eval",
        "--test_iterations", "-1", "--save_iterations", "8",
        "--checkpoint_iterations", "8", "--quiet"])
    render_cli.main(["-m", out, "-s", root, "--backend", "jnp",
                     "--skip_train", "--eval",
                     "--optim_test_pose_iter", "3"])
    outp = capsys.readouterr().out
    assert "test-time pose optimization" in outp
    assert os.path.exists(os.path.join(out, "opt_test_cams.npz"))
    render_cli.main(["-m", out, "-s", root, "--backend", "jnp",
                     "--skip_train", "--eval",
                     "--optim_test_pose_iter", "3"])
    assert "loaded optimized test poses" in capsys.readouterr().out


def test_trajectory_cli_uses_checkpoint(tmp_path, capsys):
    """render_trajectory.py restores chkpnt*.npz: paths anchor on the
    OPTIMIZED cameras, not the raw Scene poses (reference trajectory scripts
    load the trained state; VERDICT r2 gap)."""
    import numpy as np
    import render_trajectory as traj_cli
    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=50,
                        rng=np.random.default_rng(11))
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "10", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--opt_cam",
        "--r_t_noise", "0.05", "0.05", "1.0",
        "--test_iterations", "-1", "--save_iterations", "10",
        "--checkpoint_iterations", "10", "--quiet"])
    tdir = str(tmp_path / "traj")
    traj_cli.main(["-m", out, "-s", root, "--mode", "sequential",
                   "--n_frames", "3", "--backend", "jnp", "--out", tdir])
    outp = capsys.readouterr().out
    assert "restored full training state" in outp
    frames = [f for f in os.listdir(tdir) if f.endswith(".png")]
    assert len(frames) >= 3
    # the in-place wander mode (reference render_wander_path) also renders
    wdir = str(tmp_path / "wander")
    traj_cli.main(["-m", out, "-s", root, "--mode", "wander",
                   "--n_frames", "2", "--backend", "jnp", "--out", wdir])
    assert len([f for f in os.listdir(wdir) if f.endswith(".png")]) == 2


def test_trajectory_cli_fisheye_applies_lens_warp(tmp_path, capsys):
    """A fisheye-trained model renders a DISTORTED trajectory: frames come
    out at the fisheye sensor size after the lens warp
    (render_sequential_fisheye.py:64 applies the saved flow per frame)."""
    import numpy as np
    import render_trajectory as traj_cli
    import train as train_cli
    from PIL import Image

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=4, n_pts=50,
                        rng=np.random.default_rng(13))
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "4", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--outside_rasterizer",
        "--opt_distortion", "--no_init_iresnet",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--checkpoint_iterations", "4", "--quiet"])
    tdir = str(tmp_path / "traj")
    traj_cli.main(["-m", out, "-s", root, "--mode", "orbit",
                   "--n_frames", "2", "--backend", "jnp", "--out", tdir])
    assert "restored full training state" in capsys.readouterr().out
    frames = sorted(f for f in os.listdir(tdir) if f.endswith(".png"))
    assert len(frames) == 2
    from bags_tpu.train.config import TrainConfig
    with open(os.path.join(out, "cfg.json")) as f:
        cfg = TrainConfig.from_json(f.read())
    assert cfg.calib.outside_rasterizer
    # warped frames land on the fisheye sensor grid (= the 64x48 scene
    # images here: no paired fish tree, flow_scale (1,1))
    with Image.open(os.path.join(tdir, frames[0])) as im:
        assert im.size == (64, 48)
        arr = np.asarray(im)
    assert np.isfinite(arr).all()


def test_trajectory_cli_panorama(tmp_path):
    """--panorama_fov renders 5 cubemap faces per pose and resamples them
    into a wide-FoV perspective frame (render_mitsuba flow)."""
    import numpy as np
    import render_trajectory as traj_cli
    import train as train_cli

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=3, n_pts=40,
                        rng=np.random.default_rng(7))
    train_cli.main([
        "-s", root, "-m", out, "--iterations", "4", "--sh_degree", "0",
        "--backend", "jnp", "--max_instances", "4096", "--cap_max", "128",
        "--densify_from_iter", "100000", "--test_iterations", "-1",
        "--save_iterations", "4", "--checkpoint_iterations", "-1", "--quiet"])
    tdir = str(tmp_path / "traj")
    traj_cli.main(["-m", out, "-s", root, "--mode", "orbit",
                   "--n_frames", "2", "--sh_degree", "0",
                   "--backend", "jnp", "--max_instances", "4096",
                   "--panorama_fov", "140", "--out", tdir])
    frames = [f for f in os.listdir(tdir) if f.endswith(".png")]
    assert len(frames) == 2
