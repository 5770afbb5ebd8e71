from . import gibbs, mdlm, noise  # noqa: F401
