"""Persistent XLA compilation cache helpers.

The axon TPU compile service on this image has a pathological slow path
(~2-5 min) the first time it sees an SSIM-like gradient graph, independent
of array size; afterwards any shape compiles in seconds. Two mitigations:
  * a persistent on-disk JAX compilation cache (exact program reuse across
    processes), and
  * `warm_ssim_grad()` — compile a tiny SSIM gradient once per process to
    warm the service before the real (large) compile.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "BAGS_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    # Segregate by backend: the axon TPU path compiles on a REMOTE service
    # whose host CPU differs from this machine, and its persisted CPU-side
    # executables carry that machine's target features — loading them from a
    # local cpu-backend process (the test suite) trips XLA's machine-feature
    # check and can SIGILL/hang. One cache namespace per backend avoids any
    # cross-platform entry ever being shared.
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def warm_ssim_grad() -> None:
    import jax
    import jax.numpy as jnp

    from ..train.losses import photometric_loss

    a = jnp.ones((3, 64, 64))
    b = jnp.zeros((3, 64, 64))
    g = jax.jit(jax.grad(lambda x: photometric_loss(x, b)))
    jax.block_until_ready(g(a))
