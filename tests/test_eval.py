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
