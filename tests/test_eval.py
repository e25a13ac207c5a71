"""Metrics + pose alignment tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bags_tpu.core.camera import CameraParams
from bags_tpu.core.lie import so3_exp
from bags_tpu.eval.metrics import psnr, ssim
from bags_tpu.eval.pose_eval import align_and_pose_error, procrustes_analysis


def test_psnr_basics():
    a = jnp.zeros((3, 16, 16))
    assert float(psnr(a, a)) > 100
    b = jnp.full((3, 16, 16), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_identity(rng):
    img = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    assert float(ssim(img, img)) > 0.99
    assert float(ssim(img, 1.0 - img)) < 0.5


def test_procrustes_recovers_similarity(rng):
    X0 = rng.normal(size=(30, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.array([0.1, -0.2, 0.3])))
    s, t = 0.7, np.array([0.05, -0.1, 0.2], np.float32)
    # build X1 such that aligning X1 to X0 recovers the transform
    X1 = (X0 @ R) * s + t
    sim3 = procrustes_analysis(X0, X1)
    X1to0 = (X1 - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    np.testing.assert_allclose(X1to0, X0, atol=1e-4)


def test_pose_error_zero_for_identical(rng):
    n = 10
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    cams = CameraParams(q_init=jnp.asarray(q), t_init=jnp.asarray(t),
                        dq=jnp.zeros((n, 4)), dt=jnp.zeros((n, 3)),
                        fovx=jnp.full((n,), 0.8), fovy=jnp.full((n,), 0.8))
    _, err = align_and_pose_error(cams, cams)
    # arccos clipping floors the rotation metric at ~0.026 deg
    assert err["rotation_deg_mean"] < 0.05
    assert err["translation_mean"] < 1e-5


def test_pose_error_detects_perturbation(rng):
    n = 12
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    cams = CameraParams(q_init=jnp.asarray(q), t_init=jnp.asarray(t),
                        dq=jnp.zeros((n, 4)), dt=jnp.zeros((n, 3)),
                        fovx=jnp.full((n,), 0.8), fovy=jnp.full((n,), 0.8))
    pert = dataclasses.replace(
        cams, dq=jnp.asarray(rng.normal(0, 0.02, (n, 4)).astype(np.float32)))
    _, err = align_and_pose_error(pert, cams)
    assert err["rotation_deg_mean"] > 0.1


def test_pose_error_degenerate_no_warnings(rng):
    """Cameras at (numerically) one point: Procrustes must not emit divide
    warnings (eval/pose_eval.py scale clamp) and must return finite errors."""
    import warnings

    n = 6
    q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    t = np.zeros((n, 3), np.float32) + rng.normal(0, 1e-12, (n, 3)).astype(
        np.float32)
    cams = CameraParams(q_init=jnp.asarray(q), t_init=jnp.asarray(t),
                        dq=jnp.zeros((n, 4)), dt=jnp.zeros((n, 3)),
                        fovx=jnp.full((n,), 0.8), fovy=jnp.full((n,), 0.8))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        _, err = align_and_pose_error(cams, cams)
    assert np.isfinite(err["rotation_deg_mean"])
    assert np.isfinite(err["translation_mean"])


def test_procrustes_outlier_filter_keeps_solvable_system(rng):
    """If the (X0-X1 > 1) outlier filter would drop nearly everything, the
    full set is used instead of producing an empty-mean warning."""
    X0 = rng.normal(size=(8, 3)).astype(np.float32)
    X1 = X0 - 5.0  # every diff > 1 -> reference filter would drop all rows
    sim3 = procrustes_analysis(X0, X1)
    X1to0 = (X1 - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    np.testing.assert_allclose(X1to0, X0, atol=1e-3)


def test_ssim_matches_torch_reference(rng):
    """Pin SSIM against a torch re-implementation of the reference's
    loss_utils.py:36-76 (gaussian window, depthwise conv, same padding)."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp
    from bags_tpu.train.losses import ssim

    a = rng.random((3, 40, 52)).astype("float32")
    b = rng.random((3, 40, 52)).astype("float32")

    def torch_ssim(x, y, ws=11, sigma=1.5):
        import math
        g = torch.tensor([math.exp(-(i - ws // 2) ** 2 / (2 * sigma ** 2))
                          for i in range(ws)])
        g = (g / g.sum()).unsqueeze(1)
        w2d = g @ g.t()
        w = w2d.expand(3, 1, ws, ws).contiguous()
        x = torch.tensor(x).unsqueeze(0)
        y = torch.tensor(y).unsqueeze(0)
        mu1 = F.conv2d(x, w, padding=ws // 2, groups=3)
        mu2 = F.conv2d(y, w, padding=ws // 2, groups=3)
        m11, m22, m12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = F.conv2d(x * x, w, padding=ws // 2, groups=3) - m11
        s2 = F.conv2d(y * y, w, padding=ws // 2, groups=3) - m22
        s12 = F.conv2d(x * y, w, padding=ws // 2, groups=3) - m12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * m12 + c1) * (2 * s12 + c2)) / \
            ((m11 + m22 + c1) * (s1 + s2 + c2))
        return float(m.mean())

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(a, b)
    assert abs(ours - ref) < 2e-5, (ours, ref)


def test_wander_path_orbits_anchor(rng):
    """wander_path (reference render_wander_path): n_frames poses whose
    centers ellipse around the anchor with amplitude max_disp/focal, all
    valid rotations."""
    from bags_tpu.eval.trajectory import wander_path

    R0 = np.asarray(so3_exp(jnp.array([0.05, -0.1, 0.2])))
    t0 = np.array([0.3, -0.2, 1.5])
    fovy, h = 0.9, 480
    path = wander_path(R0, t0, fovy, h, n_frames=16, max_disp=5000.0)
    assert len(path) == 16
    focal = h / (2 * np.tan(fovy / 2))
    max_trans = 5000.0 / focal
    c_anchor = -R0.T @ t0
    for R, t in path:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert abs(np.linalg.det(R) - 1) < 1e-6
        c = -R.T @ t
        assert np.linalg.norm(c - c_anchor) <= max_trans * 1.2 + 1e-9
    # the path actually moves
    cs = np.stack([-R.T @ t for R, t in path])
    assert np.ptp(cs, axis=0).max() > 0.1 * max_trans


def test_depth_to_normal_matches_reference_formula(rng):
    """depth_to_normal vs a torch transcription of the reference's
    depth2normal (utils/general_utils.py:225-244)."""
    import torch
    import torch.nn.functional as F

    from bags_tpu.utils.image import depth_to_normal

    h, w = 12, 16
    depth_np = (2.0 + rng.random((h, w))).astype(np.float32)

    d = torch.tensor(depth_np)[None, None]
    focal = w / 2 / np.tan(np.pi / 6)
    d = torch.cat([d[:, :, :1], d, d[:, :, -1:]], dim=2)
    d = torch.cat([d[..., :1], d, d[..., -1:]], dim=3)
    kernel = torch.tensor([[[0, 0, 0], [-.5, 0, .5], [0, 0, 0]],
                           [[0, -.5, 0], [0, 0, 0], [0, .5, 0]]],
                          dtype=d.dtype)[:, None]
    normal = F.conv2d(d, kernel, padding="valid")[0].permute(1, 2, 0)
    normal = normal / (d[0, 0, 1:-1, 1:-1, None] + 1e-10) * focal
    normal = torch.cat([normal, torch.ones_like(normal[..., :1])], dim=-1)
    normal = normal / normal.norm(dim=-1, keepdim=True)
    ref = normal.permute(2, 0, 1).numpy()

    ours = np.asarray(depth_to_normal(jnp.asarray(depth_np)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
