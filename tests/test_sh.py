import jax.numpy as jnp
import numpy as np

from bags_tpu.core import sh

# Independent reimplementation of the PlenOctree eval (utils/sh_utils.py:57-112)
# in numpy, used as the oracle.


def eval_sh_numpy(deg, coeffs, dirs):
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    result = C0 * coeffs[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * coeffs[..., 1] + C1 * z * coeffs[..., 2] \
            - C1 * x * coeffs[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * coeffs[..., 4] + C2[1] * yz * coeffs[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * coeffs[..., 6]
                      + C2[3] * xz * coeffs[..., 7] + C2[4] * (xx - yy) * coeffs[..., 8])
            if deg > 2:
                result = (result + C3[0] * y * (3 * xx - yy) * coeffs[..., 9]
                          + C3[1] * xy * z * coeffs[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * coeffs[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * coeffs[..., 13]
                          + C3[5] * z * (xx - yy) * coeffs[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * coeffs[..., 15])
    return result


def test_eval_sh_matches_oracle(rng):
    for deg in range(4):
        k = (deg + 1) ** 2
        coeffs = rng.normal(size=(10, 3, 16)).astype(np.float32)
        dirs = rng.normal(size=(10, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
        want = eval_sh_numpy(deg, coeffs[..., :k], dirs)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(5, 3)).astype(np.float32)
    back = sh.sh_dc_to_rgb(sh.rgb_to_sh_dc(jnp.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-6)


def test_dc_only_constant_color(rng):
    """Degree-0 render color = C0*dc + 0.5 regardless of direction."""
    dc = rng.normal(size=(4, 3)).astype(np.float32)
    coeffs = np.zeros((4, 3, 1), np.float32)
    coeffs[:, :, 0] = dc
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = sh.sh_to_rgb(0, jnp.asarray(coeffs), jnp.asarray(dirs))
    want = np.maximum(sh.C0 * dc + 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
