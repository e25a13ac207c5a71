from .scene import Scene  # noqa: F401
