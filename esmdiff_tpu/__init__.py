"""esmdiff_tpu — TPU-native structure-language-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lujiarui/esmdiff:
protein conformation-ensemble generation via masked-diffusion / AR language
models over ESM3 VQ-VAE structure tokens.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORM_NAME=cpu (and an explicit non-axon JAX_PLATFORMS)
# *reliably*.  This image's startup shim pre-imports jax, registers a TPU
# PJRT plugin ('axon'), and force-sets JAX_PLATFORMS=axon in os.environ —
# so the env vars alone never take effect, and the axon backend init blocks
# indefinitely when the chip tunnel is down, hanging every CLI before
# main() runs.  jax.config.update('jax_platforms', ...) before first
# backend use is the only override the plugin respects; apply it here (the
# package import precedes any jax device use in every CLI).
# JAX_PLATFORM_NAME is never touched by the shim, so it carries user intent
# verbatim; JAX_PLATFORMS is trusted only when it isn't the shim's value.
import os as _os

_plats = _os.environ.get("JAX_PLATFORMS", "").lower()
_want = (_os.environ.get("JAX_PLATFORM_NAME", "").lower()
         or ("" if "axon" in _plats else _plats))
if _want in ("cpu", "cuda", "tpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", _want)
del _os, _plats, _want
