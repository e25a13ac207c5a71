"""Calibration stack: iResNet invertibility, distortion, vignetting,
cubemap geometry, specular ASG, grid_sample correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bags_tpu.calib import cubemap, distortion, specular, vignetting
from bags_tpu.calib.iresnet import (init_iresnet_params, iresnet_forward)
from bags_tpu.utils.image import center_crop_resample, grid_sample, resize_bilinear


# --- grid_sample -----------------------------------------------------------

def test_grid_sample_identity(rng):
    img = jnp.asarray(rng.random((3, 8, 10)).astype(np.float32))
    ys = jnp.linspace(-1, 1, 8)
    xs = jnp.linspace(-1, 1, 10)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    out = grid_sample(img, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_grid_sample_zero_padding(rng):
    img = jnp.ones((3, 4, 4))
    grid = jnp.full((2, 2, 2), 5.0)  # far out of range
    out = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_grid_sample_differentiable(rng):
    img = jnp.asarray(rng.random((3, 8, 8)).astype(np.float32))
    grid = jnp.zeros((4, 4, 2))

    g = jax.grad(lambda gr: jnp.sum(grid_sample(img, gr) ** 2))(grid)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda im: jnp.sum(grid_sample(im, grid)))(img)
    assert np.isfinite(np.asarray(g2)).all()


def test_center_crop(rng):
    img = jnp.asarray(rng.random((3, 10, 12)).astype(np.float32))
    out = center_crop_resample(img, 6, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[:, 2:8, 2:10]),
                               atol=1e-5)


# --- iResNet ---------------------------------------------------------------

@pytest.fixture(scope="module")
def small_iresnet():
    return init_iresnet_params(hidden=32, n_blocks=3, n_layers=2, seed=1)


def test_iresnet_invertible(small_iresnet, rng):
    """`test_inverse` (scene/iresnet.py:44-53): x -> fwd -> inv -> x."""
    x = jnp.asarray((rng.normal(size=(16, 2)) * rng.normal(size=(16, 2))
                     + rng.normal(size=(16, 2))).astype(np.float32))
    y = iresnet_forward(small_iresnet, x, sensor_to_frustum=True)
    x_hat = iresnet_forward(small_iresnet, y, sensor_to_frustum=False)
    np.testing.assert_allclose(np.asarray(x_hat), np.asarray(x), atol=1e-4)


@pytest.fixture(scope="module")
def compressive_iresnet():
    """A net FIT to a strongly compressive map (|target| ~ 0.15|x| over
    |x| <= 8) — a pre-fit fisheye lens is exactly this shape, and it is
    the regime where plain Picard inversion fails: the inverse of a rim
    point sits far from the y-seed and 0.9^30 leaves an O(1) residual."""
    net = init_iresnet_params(hidden=32, n_blocks=3, n_layers=2, seed=1)
    lin = np.linspace(-8.0, 8.0, 24)
    gx, gy = np.meshgrid(lin, lin)
    inputs = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1)
                         .astype(np.float32))
    return distortion.fit_iresnet_to_targets(net, inputs, 0.15 * inputs,
                                             iters=400, lr=3e-3)


def test_iresnet_inverse_converges_on_compressive_fit(compressive_iresnet):
    """Regression for the lens-training blow-up: the Newton inverse must
    converge EVERYWHERE on a compressive fitted net, including rim points
    whose preimage is far from the seed (where Picard iteration stalled
    and handed the implicit-diff backward a non-fixed point)."""
    lin = np.linspace(-1.2, 1.2, 11)
    gx, gy = np.meshgrid(lin, lin)
    y = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1)
                    .astype(np.float32))
    x_hat = iresnet_forward(compressive_iresnet, y, sensor_to_frustum=False)
    y_rec = iresnet_forward(compressive_iresnet, x_hat,
                            sensor_to_frustum=True)
    err = np.abs(np.asarray(y_rec - y)).max()
    assert err < 1e-4, f"inverse not converged: selfcons {err:.2e}"
    # preimages really are far from the seed (the hard regime is exercised)
    assert float(jnp.max(jnp.abs(x_hat))) > 3.0


def test_iresnet_inverse_ift_gradient_matches_unrolled(compressive_iresnet):
    """The implicit-function-theorem custom VJP of the inverse against
    autodiff through an UNROLLED (converged) Picard iteration in float64,
    on the compressive net. The unrolled oracle shares the forward's
    stop-gradient-through-power-iteration semantics — a finite difference
    would additionally see sigma's dependence on the power-iteration
    vectors, which spectral normalization intentionally treats as
    constants (the classic SN estimator), so FD agrees only to ~0.5%
    while this oracle must agree to float64 precision."""
    from bags_tpu.calib.iresnet import _block_residual

    with jax.enable_x64():
        net64 = jax.tree_util.tree_map(
            lambda t: jnp.asarray(np.asarray(t), jnp.float64),
            compressive_iresnet)
        y = jnp.asarray([[0.9, -0.4], [0.3, 0.8], [-1.1, 0.2]],
                        jnp.float64)

        def f_ift(p):
            return jnp.sum(
                jnp.sin(iresnet_forward(p, y, sensor_to_frustum=False)))

        def f_unrolled(p):
            x = y
            for b in reversed(range(len(p.weights))):
                z = x
                for _ in range(300):     # Picard, fully converged in f64
                    z = x - _block_residual(p, b, z)
                x = z
            return jnp.sum(jnp.sin(x))

        # values agree (both solvers converged)
        assert abs(float(f_ift(net64)) - float(f_unrolled(net64))) < 1e-9
        g1 = jax.grad(f_ift)(net64)
        g2 = jax.grad(f_unrolled)(net64)
        rng2 = np.random.default_rng(7)
        d = jax.tree_util.tree_map(
            lambda t: jnp.asarray(
                rng2.normal(size=t.shape) / np.sqrt(t.size), jnp.float64),
            net64)
        dot = lambda g: sum(float(jnp.vdot(a, b)) for a, b in zip(
            jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(d)))
        v1, v2 = dot(g1), dot(g2)
        assert abs(v1 - v2) < 1e-8 * max(1.0, abs(v2)), (v1, v2)


def test_iresnet_fit_radial(small_iresnet):
    """Pre-fit the net to a radial distortion and check approximation."""
    xs = np.linspace(-0.8, 0.8, 12)
    pts = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)
    inputs = jnp.asarray(pts)
    targets = distortion.distort_by_coeff(inputs, [-0.2, 0.05])
    fitted = distortion.fit_iresnet_to_targets(small_iresnet, inputs, targets,
                                               iters=1000, lr=2e-3)
    pred = iresnet_forward(fitted, inputs, sensor_to_frustum=True)
    err = float(jnp.abs(pred - targets).max())
    base = float(jnp.abs(inputs - targets).max())
    assert err < 0.5 * base, (err, base)


def test_distort_by_coeff_fisheye_identity():
    pts = jnp.asarray(np.array([[0.1, 0.0], [0.0, 0.3]], np.float32))
    out = distortion.distort_by_coeff(pts, [0.0, 0.0, 0.0, 0.0])
    # theta-polynomial with zero coeffs: r -> atan(r)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    expected = np.asarray(pts) * (np.arctan(r) / r)[:, None]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_control_grid_shapes():
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    p_sensor, view = distortion.make_control_grid(K, 100, 80, 10, 8)
    assert p_sensor.shape == (8, 10, 2)
    assert view.shape == (80, 2)
    # center pixel maps to ~0 ray
    c = np.asarray(view).reshape(8, 10, 2)
    assert abs(c[4, 5]).max() < 0.15


def test_apply_distortion_identity_net(rng):
    """A zero-distortion net yields a flow close to the plain projection."""
    params = init_iresnet_params(hidden=16, n_blocks=2, n_layers=2, seed=2)
    # shrink residuals to ~0 by scaling weights down
    params = jax.tree_util.tree_map(lambda x: x * 1e-6, params)
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]])
    _, view = distortion.make_control_grid(K, 64, 64, 8, 8)
    img = jnp.asarray(rng.random((3, 64, 64)).astype(np.float32))
    proj_scale = jnp.array([80.0 / 32, 80.0 / 32])  # 1/tan: focal/halfwidth
    warped, mask, flow = distortion.apply_distortion(
        params, view, (8, 8), img, proj_scale, (64, 64))
    assert warped.shape == (3, 64, 64)
    assert mask.shape == (1, 64, 64)
    # center region should be sampled (mask 1)
    assert float(mask[0, 32, 32]) == 1.0


# --- vignetting ------------------------------------------------------------

def test_vignetting_mask_monotone():
    p = vignetting.VignettingParams.create()
    m = vignetting.vignetting_mask(p, 64, 64)
    assert m.shape == (64, 64)
    assert float(m[32, 32]) > float(m[0, 0])   # darker at corners
    assert float(m.max()) <= 1.0


def test_interpolated_radial_mask():
    scale = jnp.linspace(1.0, 0.5, 8)
    m = vignetting.interpolated_radial_mask(scale, 32, 32)
    assert abs(float(m[16, 16]) - 1.0) < 0.1
    assert float(m[0, 0]) < 0.7


# --- cubemap ---------------------------------------------------------------

def test_face_reproject_forward_ray():
    """A ray pointing 45° right maps onto the right face center."""
    rays = jnp.asarray(np.array([[1.0, 0.0, 1.0]], np.float32))
    out = cubemap.face_reproject(rays, "right")
    # right face: (-z/x, y/x) = (-1, 0)
    np.testing.assert_allclose(np.asarray(out[0]), [-1.0, 0.0, 1.0], atol=1e-6)


def test_mask_half():
    img = jnp.ones((3, 4, 4))
    left = cubemap.mask_half(img, "left")
    assert float(left[:, :, :2].sum()) == 3 * 4 * 2
    assert float(left[:, :, 2:].sum()) == 0.0


def test_circular_mask():
    m = cubemap.circular_mask(32, 32, 10)
    assert float(m[0, 16, 16]) == 1.0
    assert float(m[0, 0, 0]) == 0.0


def test_cubemap_render_faces(rng):
    net = init_iresnet_params(hidden=16, n_blocks=2, n_layers=2, seed=3)
    net = jax.tree_util.tree_map(lambda x: x * 1e-6, net)
    K = np.array([[16.0, 0, 16], [0, 16.0, 16], [0, 0, 1]])
    mask90 = cubemap.fov90_square_mask(32, 32, 16.0, 16.0)
    renders = [jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
               for _ in range(5)]
    faces, wover = cubemap.render_cubemap_faces(
        lambda i: renders[i], net, K, 32, 32, 4, mask90)
    assert len(faces) == 5 and int(wover) == 0
    for f in faces:
        assert f.shape == (3, 32, 32)
        assert np.isfinite(np.asarray(f)).all()


# --- specular --------------------------------------------------------------

def test_specular_output(rng):
    params = specular.init_specular_params()
    feats = jnp.asarray(rng.normal(size=(10, 24)).astype(np.float32))
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = specular.specular_color(params, feats, jnp.asarray(dirs))
    assert out.shape == (10, 3)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda p: jnp.sum(
        specular.specular_color(p, feats, jnp.asarray(dirs)) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_omega_frames_orthogonal():
    omega, om_la, om_mu = specular.init_predefined_omega()
    dots = np.abs((omega * om_la).sum(-1))
    assert dots.max() < 1e-5


def test_cubemap_to_perspective_reconstructs_direction_field():
    """Faces painted with f(d) = 0.5 + 0.5*d (a function of the unit view
    direction) must resample into the same field in the perspective view
    (reference utils/graphics_utils.py:117-276 intended behavior)."""
    import jax.numpy as jnp
    import numpy as np
    from bags_tpu.calib.cubemap import cubemap_to_perspective

    H = W = 65

    def face(frame):
        # pixel (j, i) -> u, v in [-1, 1] (align_corners grid)
        u = np.linspace(-1, 1, W)[None, :] * np.ones((H, 1))
        v = np.linspace(-1, 1, H)[:, None] * np.ones((1, W))
        d = frame(u, v)
        d = d / np.linalg.norm(d, axis=0, keepdims=True)
        return jnp.asarray(0.5 + 0.5 * d, jnp.float32)

    fwd = face(lambda u, v: np.stack([u, v, np.ones_like(u)]))
    right = face(lambda u, v: np.stack([np.ones_like(u), v, -u]))
    left = face(lambda u, v: np.stack([-np.ones_like(u), v, u]))
    up = face(lambda u, v: np.stack([u, np.ones_like(u), -v]))
    down = face(lambda u, v: np.stack([u, -np.ones_like(u), v]))

    out_w = out_h = 48
    out = cubemap_to_perspective(fwd, left, right, up, down,
                                 fov_h_deg=120.0, fov_v_deg=120.0,
                                 output_width=out_w, output_height=out_h)

    # expected field straight from the pixel rays
    fx = (out_w / 2.0) / np.tan(np.deg2rad(120.0) / 2.0)
    fy = (out_h / 2.0) / np.tan(np.deg2rad(120.0) / 2.0)
    jj, ii = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    d = np.stack([(ii - out_w / 2.0) / fx, (out_h / 2.0 - jj) / fy,
                  np.ones_like(ii, np.float64)])
    d = d / np.linalg.norm(d, axis=0, keepdims=True)
    expected = 0.5 + 0.5 * d

    err = np.max(np.abs(np.asarray(out) - expected))
    assert err < 0.02, f"resample error {err}"
    # center pixel looks straight down +z
    center = np.asarray(out[:, out_h // 2, out_w // 2])
    np.testing.assert_allclose(center, [0.5, 0.5, 1.0], atol=0.04)
