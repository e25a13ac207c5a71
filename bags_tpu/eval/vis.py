"""Camera-pose visualization.

Capability parity with `/root/reference/utils/util_vis.py:106-303`
(`vis_cameras` visdom/plotly frustum scatter, matplotlib pose plots) and
`utils/visualization.py`: renders aligned predicted-vs-GT camera frusta to a
matplotlib 3D figure (saved to PNG) and exports the same geometry as a
plotly-style dict for any dashboard (the reference pushes it to a visdom
server, train.py:344-346 — server integration is a thin client away).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.camera import CameraParams, pose_w2c


def camera_frustum_points(R_w2c: np.ndarray, t_w2c: np.ndarray,
                          scale: float = 0.1) -> np.ndarray:
    """5-point wireframe frustum (apex + image corners) in world space
    (`get_camera_mesh` semantics, util_vis.py:189-203)."""
    corners = np.array([
        [0.0, 0.0, 0.0],
        [-0.5, -0.5, 1.0],
        [0.5, -0.5, 1.0],
        [0.5, 0.5, 1.0],
        [-0.5, 0.5, 1.0],
    ]) * scale
    R_c2w = R_w2c.T
    center = -R_c2w @ t_w2c
    return corners @ R_c2w.T + center


def _frustum_lines(pts):
    order = [0, 1, 2, 0, 2, 3, 0, 3, 4, 0, 4, 1, 2, 3, 4, 1]
    return pts[order]


def plot_poses(pred: CameraParams, gt: Optional[CameraParams] = None,
               path: str = "poses.png", scale: float = 0.1,
               title: str = "camera poses") -> None:
    """Matplotlib 3D wireframes: predicted (blue) vs GT (red)."""
    import matplotlib
    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")

    def draw(cams, color, label):
        R, t = pose_w2c(cams)
        R, t = np.asarray(R), np.asarray(t)
        for i in range(len(R)):
            lines = _frustum_lines(camera_frustum_points(R[i], t[i], scale))
            ax.plot(lines[:, 0], lines[:, 1], lines[:, 2], color=color,
                    linewidth=0.6, label=label if i == 0 else None)

    draw(pred, "tab:blue", "optimized")
    if gt is not None:
        draw(gt, "tab:red", "ground truth")
    ax.set_title(title)
    ax.legend()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def poses_to_plotly(pred: CameraParams, gt: Optional[CameraParams] = None,
                    scale: float = 0.1) -> dict:
    """Plotly figure dict of the frusta (`vis_cameras` wire format,
    util_vis.py:106-187) — feed to plotly or a visdom `plotlyplot`."""
    data = []

    def traces(cams, color, name):
        R, t = pose_w2c(cams)
        R, t = np.asarray(R), np.asarray(t)
        xs, ys, zs = [], [], []
        for i in range(len(R)):
            lines = _frustum_lines(camera_frustum_points(R[i], t[i], scale))
            xs += list(lines[:, 0]) + [None]
            ys += list(lines[:, 1]) + [None]
            zs += list(lines[:, 2]) + [None]
        return dict(type="scatter3d", mode="lines", name=name,
                    x=xs, y=ys, z=zs, line=dict(color=color, width=2))

    data.append(traces(pred, "blue", "optimized"))
    if gt is not None:
        data.append(traces(gt, "red", "ground truth"))
    return dict(data=data,
                layout=dict(scene=dict(aspectmode="data"),
                            title="camera poses"))
