from . import lie, sh, camera, projection  # noqa: F401
