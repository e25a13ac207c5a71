"""Aux tooling: network GUI protocol, trajectories, pose plots."""

import json
import os
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.core.camera import CameraParams
from bags_tpu.eval import trajectory, vis
from bags_tpu.eval.network_gui import NetworkGUI, request_to_camera


def test_network_gui_roundtrip():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]

    view = np.eye(4)
    view[3, :3] = [0.1, 0.2, 0.3]  # transposed-convention translation row
    msg = dict(resolution_x=32, resolution_y=24, train=True, fov_y=0.8,
               fov_x=0.9, z_near=0.01, z_far=100.0, shs_python=False,
               rot_scale_python=False, keep_alive=True, scaling_modifier=1.0,
               view_matrix=view.flatten().tolist(),
               view_projection_matrix=np.eye(4).flatten().tolist())

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)
        img = b""
        want = 32 * 24 * 3
        while len(img) < want:
            img += s.recv(want - len(img))
        vlen = int.from_bytes(s.recv(4), "little")
        received["verify"] = s.recv(vlen).decode()
        received["img_len"] = len(img)
        # ask to continue training
        s.close()

    t = threading.Thread(target=client)
    t.start()
    rendered = {}

    def render_fn(req):
        cam, static = request_to_camera(req)
        rendered["static"] = static
        return jnp.full((3, req["height"], req["width"]), 0.5)

    import time
    deadline = time.time() + 5
    while "verify" not in received and time.time() < deadline:
        gui.poll(render_fn, verify="test-scene", training_done=False)
    t.join(timeout=5)
    assert received.get("img_len") == 32 * 24 * 3
    assert received.get("verify") == "test-scene"
    assert rendered["static"].width == 32


def _dummy_cams(n=6, radius=3.0):
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), 0.0, radius * np.sin(ang)])
        z = -pos / np.linalg.norm(pos)
        c2w = trajectory.look_at_c2w(z, np.array([0.0, 1.0, 0.0]), pos)
        R = c2w[:3, :3].T
        t = -R @ pos
        cams.append(CameraParams.create(R.astype(np.float32),
                                        t.astype(np.float32), 0.8, 0.8))
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *cams)


def test_spiral_path_orthonormal():
    cams = _dummy_cams()
    from bags_tpu.core.camera import pose_w2c
    R, t = pose_w2c(cams)
    c2ws = np.zeros((6, 4, 4))
    c2ws[:, :3, :3] = np.transpose(np.asarray(R), (0, 2, 1))
    c2ws[:, :3, 3] = -np.einsum("nji,nj->ni", np.asarray(R), np.asarray(t))
    path = trajectory.spiral_path(c2ws, n_frames=24)
    assert len(path) == 24
    for R_, t_ in path:
        np.testing.assert_allclose(R_ @ R_.T, np.eye(3), atol=1e-5)


def test_orbit_and_interp_paths():
    cams = _dummy_cams()
    path = trajectory.orbit_path(np.zeros(3), 3.0, 0.5, 12)
    assert len(path) == 12
    interp = trajectory.interpolate_path(cams, 4)
    assert len(interp) == 5 * 4 + 1
    batched = trajectory.path_to_cameras(path, 0.8, 0.8)
    assert batched.fovx.shape == (12,)


def test_pose_plot_and_plotly(tmp_path):
    cams = _dummy_cams()
    png = str(tmp_path / "poses.png")
    vis.plot_poses(cams, cams, path=png)
    assert os.path.exists(png) and os.path.getsize(png) > 1000
    fig = vis.poses_to_plotly(cams, cams)
    assert len(fig["data"]) == 2
    assert len(fig["data"][0]["x"]) > 0


def test_visdom_client_posts_pose_payload():
    """VisdomClient speaks the visdom wire protocol: a JSON POST to
    /events carrying {data, win, eid, layout, opts} (util_vis.py:174-187).
    Verified against a stdlib HTTP server standing in for visdom."""
    import http.server
    import json as _json
    import threading

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append((self.path,
                             _json.loads(self.rfile.read(n))))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cams = _dummy_cams()
        client = vis.VisdomClient("127.0.0.1", srv.server_address[1])
        assert client.plot_cameras(500, cams, cams)
        path, payload = received[0]
        assert path == "/events"
        assert payload["win"] == "poses" and payload["eid"] == "main"
        assert len(payload["data"]) == 2          # optimized + GT traces
        assert payload["data"][0]["type"] == "scatter3d"
        assert "(500)" in payload["layout"]["title"]
        # a dead server degrades to ok=False, never raises
        dead = vis.VisdomClient("127.0.0.1", 1, timeout=0.2)
        assert not dead.plot_cameras(0, cams)
    finally:
        srv.shutdown()


def test_vector_field_figure_layouts():
    """The lens-residual quiver (util_vis.py:15-61) accepts the reference's
    (1,2,H,W) layout and the flow-field (H,W,2) layout and renders an RGBA
    image."""
    rng = np.random.default_rng(0)
    res = rng.normal(0, 1e-5, (1, 2, 100, 100)).astype(np.float32)
    img = vis.vector_field_figure(res)
    assert img.ndim == 3 and img.shape[-1] == 4 and img.dtype == np.uint8
    img2 = vis.vector_field_figure(
        np.moveaxis(res[0], 0, -1), magnification=1e4)
    assert img2.shape == img.shape


def test_import_reference_checkpoint(tmp_path):
    """tools/import_reference_checkpoint.py parses a reference-layout
    chkpnt.pth (torch-written, the real serialization) without torch at
    load time, and the resulting PLY round-trips into a renderable model."""
    import torch

    import numpy as np
    import jax.numpy as jnp

    from bags_tpu.model.gaussians import load_ply
    from tools.import_reference_checkpoint import main as import_main

    rng = np.random.default_rng(3)
    n = 40
    capture = (
        2,                                                     # sh degree
        torch.tensor(rng.normal(size=(n, 3)).astype(np.float32)),
        torch.tensor(rng.normal(size=(n, 1, 3)).astype(np.float32)),
        torch.tensor(rng.normal(0, 0.01, (n, 15, 3)).astype(np.float32)),
        torch.tensor(rng.normal(-4, 1, (n, 3)).astype(np.float32)),
        torch.tensor(rng.normal(size=(n, 4)).astype(np.float32)),
        torch.tensor(rng.normal(size=(n, 1)).astype(np.float32)),
        torch.zeros(n),                                        # max_radii2D
        torch.zeros(n, 1),                                     # grad accum
        torch.zeros(n, 1),                                     # denom
        {"state": {0: {"step": torch.tensor(10.0),
                       "exp_avg": torch.zeros(n, 3),
                       "exp_avg_sq": torch.zeros(n, 3)}},
         "param_groups": [{"lr": 1e-3, "params": [0], "name": "xyz"}]},
        4.2,                                                   # lr scale
    )
    pth = str(tmp_path / "chkpnt123.pth")
    torch.save((capture, 123), pth)

    out = str(tmp_path / "imported.ply")
    import_main(["--pth", pth, "--out", out])
    g, alive = load_ply(out)
    assert int(np.asarray(alive).sum()) == n
    np.testing.assert_allclose(np.asarray(g.xyz),
                               capture[1].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.sh_rest),
                               capture[3].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.opacity_raw),
                               capture[6].numpy().reshape(-1), atol=1e-6)
