from . import geo, metrics, tmscore  # noqa: F401
