from . import nt, text, uri  # noqa: F401
