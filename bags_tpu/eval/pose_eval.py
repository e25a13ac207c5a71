"""SIM(3) trajectory alignment and pose-error metrics.

Capability parity with the reference's `procrustes_analysis`
(`/root/reference/scene/__init__.py:31-52`), `loadAlignCameras` (:271-316),
and `rotation_distance` (`utils/camera.py:302-307`): align the optimized
camera trajectory to ground truth with a similarity transform (outlier
pre-filter, centroid/scale normalization, SVD rotation with reflection fix),
then report rotation (deg) and translation errors — the headline pose metric
of the paper.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams, pose_w2c
from ..core.lie import rotation_distance


@dataclasses.dataclass
class Sim3:
    t0: np.ndarray  # (3,) target centroid
    t1: np.ndarray  # (3,) source centroid
    s0: float
    s1: float
    R: np.ndarray   # (3, 3)


def procrustes_analysis(X0: np.ndarray, X1: np.ndarray) -> Sim3:
    """Similarity alignment of X1 (pred) to X0 (GT), both (N, 3).

    Matches scene/__init__.py:31-52 including the (X0-X1 > 1) outlier
    filter and double-precision SVD.
    """
    diff = X0 - X1
    keep = ~(diff > 1).any(axis=1)
    if keep.sum() >= 3:  # the outlier filter must leave a solvable system
        X0, X1 = X0[keep], X1[keep]
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c, X1c = X0 - t0, X1 - t1
    # Degenerate clusters (all cameras at ~one point) give s ~ 0; clamp so
    # the alignment degrades to rigid instead of emitting divide warnings.
    eps = 1e-12
    s0 = max(float(np.sqrt((X0c ** 2).sum(-1).mean())), eps)
    s1 = max(float(np.sqrt((X1c ** 2).sum(-1).mean())), eps)
    U, _, Vt = np.linalg.svd((X0c / s0).T.astype(np.float64)
                             @ (X1c / s1).astype(np.float64))
    R = (U @ Vt).astype(np.float32)
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return Sim3(t0=t0, t1=t1, s0=float(s0), s1=float(s1), R=R)


def camera_centers(cams: CameraParams) -> np.ndarray:
    R, t = pose_w2c(cams)
    return np.asarray(-jnp.einsum("...ji,...j->...i", R, t))


def align_and_pose_error(pred: CameraParams, gt: CameraParams
                         ) -> Tuple[Sim3, dict]:
    """Align pred to gt via SIM(3) on camera centers, then compute
    per-camera rotation (deg) and translation errors — the `loadAlignCameras`
    protocol: center_pred2gt = (c - t1)/s1 @ R^T * s0 + t0,
    R_pred2gt = R_w2c_pred @ R_sim3^T."""
    c_pred = camera_centers(pred)
    c_gt = camera_centers(gt)
    try:
        sim3 = procrustes_analysis(c_gt, c_pred)
    except np.linalg.LinAlgError:
        sim3 = Sim3(t0=np.zeros(3), t1=np.zeros(3), s0=1.0, s1=1.0,
                    R=np.eye(3, dtype=np.float32))

    c_aligned = (c_pred - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    R_pred, _ = pose_w2c(pred)
    R_gt, _ = pose_w2c(gt)
    R_aligned = np.asarray(R_pred) @ sim3.R.T

    rot_err = np.asarray(rotation_distance(jnp.asarray(R_aligned),
                                           jnp.asarray(np.asarray(R_gt))))
    t_err = np.linalg.norm(c_aligned - c_gt, axis=-1)
    return sim3, {
        "rotation_deg": np.degrees(rot_err),
        "translation": t_err,
        "rotation_deg_mean": float(np.degrees(rot_err).mean()),
        "translation_mean": float(t_err.mean()),
    }
