"""Backend platform selection for the CLIs.

JAX normally honors `JAX_PLATFORMS`, but experimental plugin platforms can
register themselves ahead of that selection (the axon TPU relay on this image
ignores the env var entirely), and merely *probing* such a backend claims the
device — fatal on single-client TPU setups. The reference hard-codes
`torch.cuda.set_device("cuda:0")` (utils/general_utils.py:188); here the
platform is a first-class choice instead.

`apply_platform()` must run before anything touches a JAX backend
(`jax.devices()`, any op, even `jax.default_backend()`), so every CLI calls
it right after parsing args and before its deferred `import jax` blocks.
"""

from __future__ import annotations

import os

ENV_VAR = "BAGS_TPU_PLATFORM"
CHOICES = ("auto", "cpu", "tpu")


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", choices=list(CHOICES),
        default=os.environ.get(ENV_VAR, "auto"),
        help="JAX backend platform: 'cpu' forces host execution (works even "
             "where the plugin ignores JAX_PLATFORMS), 'tpu' requires a "
             f"device, 'auto' lets JAX choose. Env default: {ENV_VAR}.")


def apply_platform(name: str | None) -> None:
    """Force the JAX platform. Call BEFORE any backend-initializing JAX use."""
    if not name or name == "auto":
        return
    import jax
    jax.config.update("jax_platforms", name)
