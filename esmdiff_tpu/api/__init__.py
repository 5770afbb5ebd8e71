from .generation import EnsembleSampler, GenerationConfig, plan_batches  # noqa: F401
from .protein_api import ESM3Runtime, ESMProtein, ESMProteinTensor  # noqa: F401
