from .render import render, RenderConfig, RenderOutput  # noqa: F401
