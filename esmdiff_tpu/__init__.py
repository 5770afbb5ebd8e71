"""esmdiff_tpu — TPU-native structure-language-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lujiarui/esmdiff:
protein conformation-ensemble generation via masked-diffusion / AR language
models over ESM3 VQ-VAE structure tokens.
"""

__version__ = "0.1.0"
