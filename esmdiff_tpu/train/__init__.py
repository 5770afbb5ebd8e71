from . import config, data, state  # noqa: F401
