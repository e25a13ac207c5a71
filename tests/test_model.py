"""Gaussians pytree, PLY IO, knn init, densification masked ops."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.model import densify
from bags_tpu.model.gaussians import (Gaussians, create_from_points, load_ply,
                                      mean_sq_dist_knn3, save_ply)


def _make(rng, n=50, cap=128, sh_degree=1):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return create_from_points(pts, cols, cap, sh_degree)


def test_create_from_points(rng):
    g, alive = _make(rng)
    assert g.capacity == 128
    assert int(jnp.sum(alive)) == 50
    # opacity activation = 0.1 for alive
    np.testing.assert_allclose(np.asarray(g.opacity(alive))[:50], 0.1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.opacity(alive))[50:], 0.0, atol=1e-6)
    assert g.max_sh_degree == 1


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = mean_sq_dist_knn3(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    d2.sort(axis=1)
    want = d2[:, 1:4].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ply_roundtrip(rng, tmp_path):
    g, alive = _make(rng, sh_degree=2)
    path = str(tmp_path / "test.ply")
    save_ply(path, g, np.asarray(alive))
    g2, alive2 = load_ply(path, capacity=128)
    assert int(jnp.sum(alive2)) == 50
    np.testing.assert_allclose(np.asarray(g2.xyz)[:50], np.asarray(g.xyz)[:50],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.sh_rest)[:50],
                               np.asarray(g.sh_rest)[:50], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.opacity_raw)[:50],
                               np.asarray(g.opacity_raw)[:50], atol=1e-6)


def test_clone_allocates_dead_slots(rng):
    g, alive = _make(rng, n=10, cap=32)
    grads = jnp.zeros(32).at[jnp.arange(3)].set(1.0)  # 3 selected
    g2, alive2, written, n_cloned = densify.densify_and_clone(
        g, alive, grads, 0.5, percent_dense=100.0, scene_extent=1.0)
    assert int(n_cloned) == 3
    assert int(jnp.sum(alive2)) == 13
    # The cloned values match their sources.
    new_slots = np.where(np.asarray(written))[0]
    assert len(new_slots) == 3
    for i, s in enumerate(sorted(new_slots)):
        np.testing.assert_allclose(np.asarray(g2.xyz)[s],
                                   np.asarray(g.xyz)[i], atol=1e-6)


def test_clone_respects_capacity(rng):
    g, alive = _make(rng, n=30, cap=32)  # only 2 dead slots
    grads = jnp.ones(32)
    g2, alive2, written, n_cloned = densify.densify_and_clone(
        g, alive, grads, 0.5, percent_dense=100.0, scene_extent=1.0)
    assert int(jnp.sum(alive2)) == 32
    assert int(n_cloned) == 2


def test_split_shrinks_scales(rng):
    g, alive = _make(rng, n=8, cap=32)
    g = dataclasses.replace(g, scales_log=jnp.full((32, 3), 1.0))
    grads = jnp.zeros(32).at[0].set(1.0)
    key = jax.random.PRNGKey(0)
    g2, alive2, written, n_split = densify.densify_and_split(
        g, alive, grads, 0.5, percent_dense=0.0001, scene_extent=1.0, key=key)
    assert int(n_split) == 1
    assert int(jnp.sum(alive2)) == 9
    # parent slot overwritten with child scale = parent/1.6
    np.testing.assert_allclose(np.asarray(g2.scales_log)[0],
                               np.log(np.exp(1.0) / 1.6), atol=1e-5)


def test_prune_by_opacity(rng):
    g, alive = _make(rng, n=20, cap=32)
    op = np.array(g.opacity_raw)
    op[:5] = -10.0  # sigmoid ~ 0
    g = dataclasses.replace(g, opacity_raw=jnp.asarray(op))
    g2, alive2, pruned, n_pruned = densify.prune(
        g, alive, min_opacity=0.005, max_radii2d=jnp.zeros(32),
        max_screen_size=0.0, scene_extent=1.0)
    assert int(n_pruned) == 5
    assert int(jnp.sum(alive2)) == 15


def test_reset_opacity(rng):
    g, alive = _make(rng)
    g2, _ = densify.reset_opacity(g)
    op = np.asarray(jax.nn.sigmoid(g2.opacity_raw))
    assert (op <= 0.0101).all()


def test_full_densify_and_prune(rng):
    g, alive = _make(rng, n=20, cap=64)
    stats = densify.DensifyStats(
        grad_accum=jnp.ones(64) * 1.0,
        grad_accum_abs=jnp.ones(64) * 1.0,
        denom=jnp.ones(64),
        max_radii2d=jnp.zeros(64))
    res = densify.densify_and_prune(
        g, alive, stats, jax.random.PRNGKey(1),
        grad_threshold=0.5, min_opacity=0.005, scene_extent=1.0,
        max_screen_size=0.0)
    assert int(jnp.sum(res.alive)) > 20  # population grew
    assert bool(jnp.any(res.reset_mask))


def test_native_knn_matches_scipy(rng):
    import pytest
    try:
        from bags_tpu.utils import native_knn
        pts = rng.normal(size=(3000, 3)).astype(np.float32)
        got = native_knn.mean_sq_dist_knn3(pts)
    except Exception as e:  # g++ unavailable etc.
        pytest.skip(f"native knn unavailable: {e}")
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(pts, k=4)
    want = (d[:, 1:] ** 2).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)
