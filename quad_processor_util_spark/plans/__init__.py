from . import checkpoint, pipeline  # noqa: F401
