from . import esm3  # noqa: F401
