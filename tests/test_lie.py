import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bags_tpu.core import lie

jax.config.update("jax_enable_x64", False)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotmat_roundtrip(rng):
    q = random_quats(rng, 32)
    R = lie.quat_to_rotmat(jnp.asarray(q))
    q2 = lie.rotmat_to_quat(R)
    # quaternion double cover: compare up to sign
    dots = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_rotmat_orthonormal(rng):
    q = rng.normal(size=(16, 4)).astype(np.float32)  # unnormalized on purpose
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_multiply_matches_rotmat(rng):
    q1 = random_quats(rng, 8)
    q2 = random_quats(rng, 8)
    q12 = lie.quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
    R12 = lie.quat_to_rotmat(q12)
    R_ref = lie.quat_to_rotmat(jnp.asarray(q1)) @ lie.quat_to_rotmat(jnp.asarray(q2))
    np.testing.assert_allclose(np.asarray(R12), np.asarray(R_ref), atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 0.8
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-6)
    # gradients finite at 0
    g = jax.grad(lambda x: jnp.sum(lie.so3_exp(x)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_matches_so3():
    xi = jnp.array([0.3, -0.2, 0.1, 1.0, 2.0, -0.5])
    T = lie.se3_exp(xi)
    R = lie.so3_exp(xi[:3])
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[3]), [0, 0, 0, 1], atol=0)


def test_rotation_distance():
    R1 = lie.so3_exp(jnp.array([0.0, 0.0, 0.0]))
    R2 = lie.so3_exp(jnp.array([0.0, 0.5, 0.0]))
    d = lie.rotation_distance(R1, R2)
    np.testing.assert_allclose(float(d), 0.5, atol=1e-5)
