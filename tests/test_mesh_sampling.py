"""Mesh-parallel ensemble sampling on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from esmdiff_tpu.api.generation import EnsembleSampler, plan_batches
from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
from esmdiff_tpu.models.esm3 import esm3_tiny
from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig
from esmdiff_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


@pytest.fixture(scope="module")
def runtime():
    return ESM3Runtime.random_init(
        seed=0,
        trunk_cfg=esm3_tiny(dtype="float32", head_type="structure"),
        encoder_cfg=EncoderConfig(d_model=32, n_heads=2, v_heads=4,
                                  n_layers=2, d_out=8, knn=8),
        decoder_cfg=DecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
    )


def test_plan_batches_granularity():
    sizes = plan_batches(60, 10, granularity=8)
    assert all(s % 8 == 0 for s in sizes)
    assert sum(sizes) >= 10


def test_mesh_ddpm_matches_shape_and_randomness(runtime):
    prot = ESMProtein.from_pdb(BPTI)
    mesh = pmesh.make_mesh(8)
    sampler = EnsembleSampler(runtime, mesh=mesh)
    with mesh:
        tokens = sampler.ddpm_ensemble(prot.sequence, num_samples=10,
                                       num_steps=4)
    assert tokens.shape == (10, len(prot.sequence))
    assert (tokens < 4096).all()
    assert len({tuple(r) for r in tokens}) > 1


def test_mesh_gibbs(runtime):
    prot = ESMProtein.from_pdb(BPTI)
    mesh = pmesh.make_mesh(8)
    sampler = EnsembleSampler(runtime, mesh=mesh)
    from esmdiff_tpu.api.generation import GenerationConfig

    with mesh:
        tokens = sampler.gibbs_ensemble(
            prot.sequence, num_samples=9,
            config=GenerationConfig(num_steps=3))
    assert tokens.shape == (9, len(prot.sequence))
    assert (tokens < 4096).all()
