"""Test harness config: run everything on an 8-device virtual CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

Note: this environment ships a TPU plugin ('axon') that wins platform
selection over the JAX_PLATFORMS env var, so the CPU override must go through
jax.config before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the compile-heavy slow-marked modules reuse
# executables across runs (first full run populates ~/.cache, repeats are
# several times faster).
from esmdiff_tpu.utils.compilation_cache import enable as _enable_cache  # noqa: E402

_enable_cache()
