"""Cross-length packed ddpm generation (api/generation.ddpm_ensemble_packed).

Mixed-length serving requests co-batch into shared segment-masked rows (one
(R, T) program) instead of serializing one executable per length bucket —
the round-4 serve-SLO gap.  Reference analogue: ragged one-batch inference,
slm/sample_esmdiff.py:181-193.

Determinism contract (mdlm.position_keys): every draw for (request, sample,
position) uses fold_in(fold_in(PRNGKey(seed), sample), pos) + step — shared
by the solo, same-bucket-coalesced, and packed engines — so a request's
randomness never depends on co-batched traffic.
"""

import numpy as np
import pytest

from esmdiff_tpu.api.generation import EnsembleSampler
from esmdiff_tpu.api.protein_api import ESM3Runtime
from esmdiff_tpu.models.esm3 import esm3_tiny
from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig
from esmdiff_tpu.ops.packing import plan_segment_rows

pytestmark = pytest.mark.slow  # compile-heavy (tiny trunk sampling programs)

SEQ_SHORT = "MKTAYIAKQR"                      # 10 res -> bucket 32
SEQ_LONG = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVG"   # 41 res -> bucket 64


@pytest.fixture(scope="module")
def sampler():
    runtime = ESM3Runtime.random_init(
        seed=0,
        trunk_cfg=esm3_tiny(dtype="float32", head_type="structure"),
        encoder_cfg=EncoderConfig(d_model=32, n_heads=2, v_heads=4,
                                  n_layers=2, d_out=8, knn=8),
        decoder_cfg=DecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
    )
    return EnsembleSampler(runtime)


def test_plan_segment_rows_properties():
    lens = [60, 122, 252, 60, 122, 60]
    rows = plan_segment_rows(lens, 256)
    # every segment placed exactly once
    placed = sorted(i for row in rows for i in row)
    assert placed == list(range(len(lens)))
    # capacity respected
    for row in rows:
        assert sum(lens[i] for i in row) <= 256
    # deterministic
    assert rows == plan_segment_rows(lens, 256)
    # FFD actually packs: 6 segments of total 676 tokens fit in 3 rows
    assert len(rows) == 3
    with pytest.raises(ValueError):
        plan_segment_rows([300], 256)


def test_packed_matches_solo_runs(sampler):
    seqs = [SEQ_SHORT, SEQ_LONG]
    counts = [3, 2]
    seeds = [7, 11]
    packed = sampler.ddpm_ensemble_packed(
        seqs, counts, num_steps=4, seeds=seeds)
    assert [p.shape for p in packed] == [(3, len(SEQ_SHORT)),
                                         (2, len(SEQ_LONG))]
    for i, (s, c) in enumerate(zip(seqs, counts)):
        solo = sampler.ddpm_ensemble(s, c, num_steps=4, seed=seeds[i])
        agree = (packed[i] == solo).mean()
        # identical RNG keys; token differences can only come from trunk fp
        # reduction-order ties across the two layouts (same caveat as the
        # round-4 cross-shape note) — bitwise in practice on CPU
        assert agree == 1.0, f"request {i}: agreement {agree}"


def test_packed_invariant_to_cotraffic_content(sampler):
    """At a fixed layout, co-packed segments' CONTENT cannot leak: masked
    attention contributes exact zeros, and draws key off per-position
    PRNG keys.  Swap the co-batched request for one of the SAME length but
    different sequence + seed -> the probe request is bitwise unchanged."""
    other_a = "A" * len(SEQ_LONG)
    other_b = "W" * len(SEQ_LONG)
    out_a = sampler.ddpm_ensemble_packed(
        [SEQ_SHORT, other_a], [2, 2], num_steps=4, seeds=[3, 100])
    out_b = sampler.ddpm_ensemble_packed(
        [SEQ_SHORT, other_b], [2, 2], num_steps=4, seeds=[3, 999])
    np.testing.assert_array_equal(out_a[0], out_b[0])


def test_packed_single_request_roundtrip(sampler):
    out = sampler.ddpm_ensemble_packed([SEQ_SHORT], [4], num_steps=4,
                                       seeds=[5])
    assert out[0].shape == (4, len(SEQ_SHORT))
    # interior tokens are codebook entries (specials shielded)
    assert out[0].max() < 4096 and out[0].min() >= 0


def test_mixed_route_cost_model(sampler):
    """Router picks native per-bucket batches for high-occupancy mixes (row
    cost is superlinear in width — measured PERF.md length matrix) and the
    packed program for low-occupancy mixes."""
    route, packed, split = sampler._mixed_route(
        [62, 124, 252], [100, 100, 100], 256)
    assert route == "split" and packed > split
    route2, packed2, split2 = sampler._mixed_route([12, 43], [3, 2], 128)
    assert route2 == "packed" and packed2 < split2
