"""A/B variants of the tile->image assembly (fwd+bwd) — the loss chain's
surprisingly expensive first stage (~2.1 ms for a 7.7 MB relayout,
tools/lossbisect.py)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    wh = 800
    tx = ty = wh // 16
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (tx * ty, 256, 3))
                        .astype(np.float32))
    # the fused path's raw kernel output layout (T, 4, NPIX)
    color4 = jnp.asarray(rng.uniform(0, 1, (tx * ty, 4, 256))
                         .astype(np.float32))

    def report(name, t):
        print(f"{name:34s}: {t * 1e3:7.2f} ms")

    def v_current(c):
        img = c.reshape(ty, tx, 16, 16, 3)
        return img.transpose(4, 0, 2, 1, 3).reshape(3, wh, wh)

    def v_chan_first(c4):
        # channels to the front FIRST (one big transpose with 256 minor),
        # then the spatial interleave with 16-minor blocks
        x = c4.transpose(1, 0, 2)                 # (4, T, 256)
        x = x.reshape(4, ty, tx, 16, 16)
        return x.transpose(0, 1, 3, 2, 4).reshape(4, wh, wh)[:3]

    def v_two_step(c):
        # split the permutation: (ty,tx,py,px,c) -> (ty,py,tx,px,c) first
        # (pure mid-dim swap), then channels out
        x = c.reshape(ty, tx, 16, 16, 3)
        x = x.transpose(0, 2, 1, 3, 4).reshape(wh, wh, 3)
        return x.transpose(2, 0, 1)

    def v_rowstrip(c):
        # (ty, tx, py, px*c): keep px*c fused as the minor dim in the swap
        x = c.reshape(ty, tx, 16, 16 * 3)
        x = x.transpose(0, 2, 1, 3).reshape(wh, wh, 3)
        return x.transpose(2, 0, 1)

    for name, fn, arg in [
            ("current (1 transpose, c minor)", v_current, color),
            ("chan-first from (T,4,NPIX)", v_chan_first, color4),
            ("two-step (spatial then chan)", v_two_step, color),
            ("rowstrip (px*c fused minor)", v_rowstrip, color)]:
        def f(eps, fn=fn, arg=arg):
            return jax.grad(lambda c: jnp.sum(fn(c) * 1.000001))(arg + eps)
        report(name, timed_chain(f, None))


if __name__ == "__main__":
    main()
