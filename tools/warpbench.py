"""Microbench: gather grid_sample vs banded_warp (fwd+bwd) on the chip.

The fisheye step's dominant cost is the full-resolution lens warp
(bench_calib.py roofline note). This harness times both implementations
at the calibrated-bench and garden-scale shapes with a realistic smooth
radial flow, fwd and fwd+bwd (grads wrt image AND flow), across band/ky
and matmul-precision settings.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.utils.cache import enable_persistent_cache
from bags_tpu.utils.image import grid_sample, banded_warp, required_ky

_FLOOR = [0.0]


def timed(fn, *args, reps=10):
    def wrapped(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    g = jax.jit(wrapped)
    float(g(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] - _FLOOR[0]


def make_flow(h, w, ho, wo, coeff=(-0.04, 0.01, -0.006, 0.001)):
    """The REAL fisheye apply2render flow geometry: fisheye sensor pixels
    back-projected through K (focal=w/2), the OPENCV_FISHEYE theta-poly
    inverted numerically (r_d = poly(theta), r_n = tan(theta)), scaled by
    the extended-FoV projection diag — exactly what compute_flow produces
    from a converged lens net (calib/distortion.py)."""
    fx = w / 2.0
    xs = (np.arange(wo) + 0.5 - wo / 2) / fx
    ys = (np.arange(ho) + 0.5 - ho / 2) / fx
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    r_d = np.sqrt(gx ** 2 + gy ** 2) + 1e-9
    # invert the theta polynomial on a dense table
    th = np.linspace(1e-6, 1.5, 4096)
    poly = th + coeff[0] * th**3 + coeff[1] * th**5 \
        + coeff[2] * th**7 + coeff[3] * th**9
    theta = np.interp(r_d, poly, th, right=1.5)
    r_n = np.tan(theta)
    # extended-FoV render: flow_scale 2 like cameras.py:154-161
    fov_ext = 2 * np.arctan(2.0 * w / (2 * fx))
    proj = 1.0 / np.tan(fov_ext / 2)
    return jnp.asarray(np.stack([gx / r_d * r_n * proj,
                                 gy / r_d * r_n * proj],
                                axis=-1).astype(np.float32))


def main():
    enable_persistent_cache()
    _FLOOR[0] = timed(lambda x: x * 2.0, jnp.ones(8, jnp.float32)) - _FLOOR[0]
    print(f"tunnel floor: {_FLOOR[0]*1e3:.2f} ms")
    rng = np.random.default_rng(0)

    for (h, w, ho, wo) in [(800, 800, 800, 800), (1080, 1600, 1080, 1600)]:
        img = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
        grid = make_flow(h, w, ho, wo)
        print(f"\n== image ({h},{w}) -> out ({ho},{wo}) ==")

        t = timed(lambda i, g: grid_sample(i, g), img, grid)
        print(f"gather   fwd                 : {t*1e3:8.2f} ms")

        def loss_g(i, g):
            return jnp.sum(grid_sample(i, g) ** 2)

        t = timed(jax.grad(loss_g, argnums=(0, 1)), img, grid)
        print(f"gather   fwd+bwd             : {t*1e3:8.2f} ms")

        for band in (8, 16, 32):
            ky = required_ky(grid, h, band=band)
            ky_pad = int(np.ceil(ky * 1.5 / 8) * 8)
            for prec, pname in [(jax.lax.Precision.HIGHEST, "hi"),
                                (jax.lax.Precision.HIGH, "md"),
                                (jax.lax.Precision.DEFAULT, "lo")]:
                t = timed(lambda i, g, b=band, k=ky_pad, p=prec:
                          banded_warp(i, g, ky=k, band=b, precision=p),
                          img, grid)

                def loss_b(i, g, b=band, k=ky_pad, p=prec):
                    return jnp.sum(
                        banded_warp(i, g, ky=k, band=b, precision=p)[0] ** 2)

                t2 = timed(jax.grad(loss_b, argnums=(0, 1)), img, grid)
                # error vs gather reference
                ref = grid_sample(img, grid)
                out, over = jax.jit(
                    lambda i, g, b=band, k=ky_pad, p=prec:
                    banded_warp(i, g, ky=k, band=b, precision=p))(img, grid)
                err = float(jnp.max(jnp.abs(out - ref)))
                print(f"banded b={band:2d} ky={ky_pad:3d} {pname}: "
                      f"fwd {t*1e3:7.2f} ms  fwd+bwd {t2*1e3:7.2f} ms  "
                      f"maxerr {err:.2e}  overflow {int(over)}")


if __name__ == "__main__":
    main()
