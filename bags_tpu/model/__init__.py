from .gaussians import Gaussians  # noqa: F401
