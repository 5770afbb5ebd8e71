from . import torch_to_jax  # noqa: F401
