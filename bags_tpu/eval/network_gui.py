"""SIBR remote-viewer bridge (non-blocking TCP).

Capability parity with `/root/reference/gaussian_renderer/network_gui.py`:
the same wire protocol — 4-byte little-endian length + JSON camera request
in (resolution, fovs, z range, flags, row-major view/view-projection
matrices with the SIBR y/z column flips), raw RGB bytes + a 4-byte-length
verify string out — polled once per training iteration without blocking
(`train.py:180-193`).

The JSON view matrix arrives in the reference's transposed (row-vector)
convention; `request_to_camera` converts it to this framework's
column-vector w2c and extracts the FoVs for a render-ready CameraParams.
"""

from __future__ import annotations

import json
import socket
from typing import Callable, Optional, Tuple

import numpy as np


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> None:
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self) -> dict:
        raw_len = self.conn.recv(4)
        n = int.from_bytes(raw_len, "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                break
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def receive(self) -> Tuple[Optional[dict], bool, bool, bool, bool, float]:
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, False, False, False, False, 1.0
        view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        # SIBR sends OpenGL-style axes; flip y/z columns (network_gui.py:73-76)
        view[:, 1] *= -1
        view[:, 2] *= -1
        req = dict(width=width, height=height,
                   fovx=float(msg["fov_x"]), fovy=float(msg["fov_y"]),
                   znear=float(msg["z_near"]), zfar=float(msg["z_far"]),
                   view_matrix=view)
        return (req, bool(msg["train"]), bool(msg["shs_python"]),
                bool(msg["rot_scale_python"]), bool(msg["keep_alive"]),
                float(msg["scaling_modifier"]))

    def poll(self, render_fn: Callable[[dict], np.ndarray], verify: str,
             training_done: bool) -> None:
        """One per-iteration poll (train.py:180-193): accept, serve frames
        until the viewer requests training to continue."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                req, do_training, _, _, keep_alive, _ = self.receive()
                image_bytes = None
                if req is not None:
                    img = render_fn(req)   # (3, H, W) float in [0, 1]
                    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
                    image_bytes = arr.transpose(1, 2, 0).tobytes()
                self.send(image_bytes, verify)
                if do_training and (not training_done or not keep_alive):
                    break
            except Exception:
                self.conn = None


def request_to_camera(req: dict):
    """Viewer request -> (CameraParams, CameraStatic) for render()."""
    from ..core.camera import CameraParams, CameraStatic

    view = req["view_matrix"]          # transposed (row-vector) w2c
    w2c = view.T                       # column-vector convention
    cam = CameraParams.create(w2c[:3, :3], w2c[:3, 3],
                              req["fovx"], req["fovy"])
    static = CameraStatic(width=req["width"], height=req["height"],
                          znear=req["znear"], zfar=req["zfar"])
    return cam, static
