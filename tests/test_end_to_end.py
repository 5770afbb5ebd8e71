"""End-to-end slice: BPTI -> tokens -> ensemble -> multi-MODEL PDB
(BASELINE.json config #1, tiny trunk on CPU)."""

from pathlib import Path

import numpy as np
import pytest

from esmdiff_tpu.api.generation import EnsembleSampler, GenerationConfig, plan_batches
from esmdiff_tpu.api.protein_api import ESM3Runtime, ESMProtein
from esmdiff_tpu.core import protein as protein_io
from esmdiff_tpu.models.esm3 import esm3_tiny
from esmdiff_tpu.models.vqvae import DecoderConfig, EncoderConfig

pytestmark = pytest.mark.slow  # multi-minute compile-heavy module

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


@pytest.fixture(scope="module")
def tiny_runtime():
    return ESM3Runtime.random_init(
        seed=0,
        trunk_cfg=esm3_tiny(dtype="float32", head_type="structure"),
        encoder_cfg=EncoderConfig(d_model=32, n_heads=2, v_heads=4,
                                  n_layers=2, d_out=8, knn=8),
        decoder_cfg=DecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
    )


@pytest.fixture(scope="module")
def gibbs_runtime():
    return ESM3Runtime.random_init(
        seed=0,
        trunk_cfg=esm3_tiny(dtype="float32", head_type="esm3"),
        encoder_cfg=EncoderConfig(d_model=32, n_heads=2, v_heads=4,
                                  n_layers=2, d_out=8, knn=8),
        decoder_cfg=DecoderConfig(d_model=32, n_heads=2, n_layers=2,
                                  dtype="float32", scan_layers=False),
        with_sigma_embedder=False,
    )


def test_plan_batches():
    # greedy pow2 ladder: over-generation bounded by the smallest bucket
    # (100 -> 64+32+8, not one 128-batch wasting 28 full-trunk samples)
    assert plan_batches(60, 100) == [64, 32, 8]
    assert all((s & (s - 1)) == 0 for s in plan_batches(60, 100))
    assert plan_batches(60, 5) == [8]
    assert plan_batches(60, 128) == [128]
    for n in (1, 7, 10, 33, 100, 127, 129, 500):
        sizes = plan_batches(60, n)
        assert sum(sizes) >= n
        assert sum(sizes) - n < 8, f"waste {sum(sizes)-n} for n={n}"
    # budget binds for long proteins
    sizes = plan_batches(1000, 100)
    assert all(s <= 4 for s in sizes) and sum(sizes) >= 100
    # mesh granularity respected
    assert all(s % 8 == 0 for s in plan_batches(60, 10, granularity=8))


def test_plan_batches_single_policy():
    # ONE program per length bucket: every batch the same ladder size
    assert plan_batches(60, 50, policy="single") == [32, 32]
    assert plan_batches(60, 100, policy="single") == [64, 64]
    assert plan_batches(60, 12, policy="single") == [8, 8]
    assert plan_batches(60, 5, policy="single") == [8]
    assert plan_batches(60, 128, policy="single") == [128]
    # same total rows as the pow2-roundup alternative, smaller B
    assert sum(plan_batches(60, 100, policy="single")) == 128
    # memory budget still wins for long proteins (same cap as ladder)
    long_sizes = plan_batches(1000, 100, policy="single")
    assert len(set(long_sizes)) == 1 and sum(long_sizes) >= 100
    assert long_sizes[0] <= 4
    # granularity respected
    assert all(s % 8 == 0
               for s in plan_batches(60, 10, granularity=8, policy="single"))
    for n in (1, 7, 10, 33, 100, 127, 129, 500):
        sizes = plan_batches(60, n, policy="single")
        assert len(set(sizes)) == 1  # single compiled shape
        assert sum(sizes) >= n
    with pytest.raises(ValueError):
        plan_batches(60, 10, policy="zigzag")


def test_plan_policy_emits_identical_ensembles(tiny_runtime):
    # Row RNG keys are per-sample, so batch grouping cannot change any
    # sample's draws: 'single' ([16]) and 'ladder' ([8, 8]) must emit
    # bit-identical ensembles for the same seed.
    seq = "MKTAYIAKQR"
    a = EnsembleSampler(tiny_runtime, plan_policy="ladder").ddpm_ensemble(
        seq, 9, num_steps=2, seed=7)
    b = EnsembleSampler(tiny_runtime, plan_policy="single").ddpm_ensemble(
        seq, 9, num_steps=2, seed=7)
    np.testing.assert_array_equal(a, b)


def test_encode_bpti(tiny_runtime):
    prot = ESMProtein.from_pdb(BPTI)
    pt = tiny_runtime.encode(prot)
    L = len(prot.sequence)
    assert pt.sequence.shape == (L + 2,)
    assert pt.structure.shape == (L + 2,)
    assert pt.structure[0] == 4098 and pt.structure[-1] == 4097


def test_ddpm_end_to_end(tiny_runtime, tmp_path):
    prot = ESMProtein.from_pdb(BPTI)
    sampler = EnsembleSampler(tiny_runtime)
    tokens = sampler.ddpm_ensemble(prot.sequence, num_samples=3, num_steps=4)
    L = len(prot.sequence)
    assert tokens.shape == (3, L)
    assert (tokens < 4096).all()
    prots = sampler.decode_ensemble(prot.sequence, tokens)
    assert len(prots) == 3
    out = tmp_path / "bpti_ens.pdb"
    protein_io.ensemble_to_pdb_file([p.to_protein() for p in prots], out)
    loaded = protein_io.from_pdb_file(out)
    assert isinstance(loaded, list) and len(loaded) == 3
    assert loaded[0].sequence == prot.sequence


def test_bucketed_decode_matches_exact(tiny_runtime):
    # decode_tokens_to_proteins pads rows to the 32-multiple L-bucket and the
    # batch to decode_batch so one program serves every target of a sweep;
    # pad is masked out of decoder attention, so valid-prefix coordinates
    # must match the exact-shape decode.
    from esmdiff_tpu.api.generation import decode_tokens_to_proteins
    from esmdiff_tpu.core.tokenizer import StructureTokenizer

    rng = np.random.RandomState(0)
    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"  # 33 residues -> bucket 64
    tokens = rng.randint(0, 4096, size=(5, len(seq))).astype(np.int32)

    exact_rows = np.stack([StructureTokenizer.add_bos_eos(t)
                           for t in tokens])
    exact = tiny_runtime.decode_batch(exact_rows, [seq] * 5)
    bucketed = decode_tokens_to_proteins(tiny_runtime, seq, tokens)
    assert len(bucketed) == 5
    for pe, pb in zip(exact, bucketed):
        np.testing.assert_allclose(
            np.nan_to_num(pb.coordinates), np.nan_to_num(pe.coordinates),
            atol=2e-3, rtol=1e-4)


def test_coalesced_decode_buckets_mixed_lengths(tiny_runtime):
    # rows of DIFFERENT chain lengths share one bucketed decode program;
    # each row must still decode as if alone at its exact shape
    from esmdiff_tpu.core.tokenizer import StructureTokenizer

    rng = np.random.RandomState(1)
    seq_a, seq_b = "MKTAYIAKQR", "MKTAYIAKQRQISFVKSHFSR"
    ta = rng.randint(0, 4096, size=(2, len(seq_a))).astype(np.int32)
    tb = rng.randint(0, 4096, size=(3, len(seq_b))).astype(np.int32)
    s = EnsembleSampler(tiny_runtime)
    multi = s.decode_ensemble_multi([seq_a, seq_b], [ta, tb])
    assert [len(m) for m in multi] == [2, 3]
    for seq, toks, prots in ((seq_a, ta, multi[0]), (seq_b, tb, multi[1])):
        rows = np.stack([StructureTokenizer.add_bos_eos(t) for t in toks])
        exact = tiny_runtime.decode_batch(rows, [seq] * len(toks))
        for pe, pb in zip(exact, prots):
            np.testing.assert_allclose(
                np.nan_to_num(pb.coordinates), np.nan_to_num(pe.coordinates),
                atol=2e-3, rtol=1e-4)


def test_ddpm_inpainting_end_to_end(tiny_runtime):
    prot = ESMProtein.from_pdb(BPTI)
    pt = tiny_runtime.encode(prot)
    sampler = EnsembleSampler(tiny_runtime)
    mask_ids = [1, 2, 3, 4, 5]
    tokens = sampler.ddpm_ensemble(
        prot.sequence, num_samples=2, num_steps=4,
        mask_ids=mask_ids, structure_tokens=pt.structure,
    )
    interior = pt.structure[1:-1]
    keep = np.ones(len(prot.sequence), dtype=bool)
    keep[mask_ids] = False
    # non-masked tokens are preserved exactly
    np.testing.assert_array_equal(tokens[0][keep], interior[keep])
    np.testing.assert_array_equal(tokens[1][keep], interior[keep])


def test_ddpm_inpainting_ref_compat(tiny_runtime):
    """ref_compat=True reproduces the reference's off-by-one: masking
    residue ids {i} masks TOKEN positions {i} in the BOS-led array, i.e.
    residues {i-1} (sample_esmdiff.py:201-202)."""
    prot = ESMProtein.from_pdb(BPTI)
    pt = tiny_runtime.encode(prot)
    sampler = EnsembleSampler(tiny_runtime)
    mask_ids = [3, 4, 5]
    tokens = sampler.ddpm_ensemble(
        prot.sequence, num_samples=1, num_steps=4,
        mask_ids=mask_ids, structure_tokens=pt.structure,
        ref_compat=True,
    )
    interior = pt.structure[1:-1]
    keep = np.ones(len(prot.sequence), dtype=bool)
    keep[[i - 1 for i in mask_ids]] = False  # shifted by the ref's off-by-one
    np.testing.assert_array_equal(tokens[0][keep], interior[keep])


def test_ddpm_filled_ids(tiny_runtime):
    """filled_ids = keep only these; everything else regenerates
    (reference sample_esmdiff.py:203-207)."""
    prot = ESMProtein.from_pdb(BPTI)
    pt = tiny_runtime.encode(prot)
    sampler = EnsembleSampler(tiny_runtime)
    filled = [0, 1, 2]
    tokens = sampler.ddpm_ensemble(
        prot.sequence, num_samples=2, num_steps=4,
        filled_ids=filled, structure_tokens=pt.structure,
    )
    interior = pt.structure[1:-1]
    np.testing.assert_array_equal(tokens[0][filled], interior[filled])
    # the rest was regenerated as codebook tokens
    assert (tokens[0][3:] < 4096).all()


def test_gibbs_end_to_end(gibbs_runtime):
    prot = ESMProtein.from_pdb(BPTI)
    sampler = EnsembleSampler(gibbs_runtime)
    tokens = sampler.gibbs_ensemble(
        prot.sequence, num_samples=2,
        config=GenerationConfig(num_steps=4, temperature=1.4, top_p=0.9),
    )
    L = len(prot.sequence)
    assert tokens.shape == (2, L)
    assert (tokens < 4096).all()


def test_gibbs_inpainting_keeps_known_tokens(gibbs_runtime):
    """With mask_ids, only the masked residues are regenerated — unmasked
    residues keep their encoder tokens (regression: atom37 NaN slots must
    not mark every residue unknown)."""
    prot = ESMProtein.from_pdb(BPTI)
    mask_ids = [3, 4, 5]
    tokens = EnsembleSampler(gibbs_runtime).gibbs_ensemble(
        prot.sequence, num_samples=2,
        config=GenerationConfig(num_steps=3),
        coordinates=prot.coordinates, mask_ids=mask_ids,
    )
    # reference tokens come from encoding the MUTATED protein (masked coords
    # -> inf), matching the reference's protseq_to_data path — neighboring
    # residues' kNN tokens legitimately differ from the pristine encoding
    mut_seq = "".join("_" if i in mask_ids else ch
                      for i, ch in enumerate(prot.sequence))
    mut_coords = prot.coordinates.copy()
    mut_coords[mask_ids] = np.inf
    pt = gibbs_runtime.encode(
        ESMProtein(sequence=mut_seq, coordinates=mut_coords))
    interior = np.asarray(pt.structure[1:-1])
    keep = np.ones(len(prot.sequence), dtype=bool)
    keep[mask_ids] = False
    np.testing.assert_array_equal(tokens[0][keep], interior[keep])
    np.testing.assert_array_equal(tokens[1][keep], interior[keep])
    assert (tokens[0][mask_ids] < 4096).all()


# -- coalesced multi-request engines (serve same-bucket coalescing) -----------

SEQ_A = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"  # 33 res -> 64-bucket
SEQ_B = "ACDEFGHIKLMNPQRSTVWYACDEFGHIKLMNPQRSTVWY"  # 40 res -> same 64-bucket


def test_gibbs_multi_coalesced(gibbs_runtime):
    s = EnsembleSampler(gibbs_runtime)
    cfg = GenerationConfig(num_steps=2)
    outs = s.gibbs_ensemble_multi([SEQ_A, SEQ_B], [3, 2], config=cfg, seed=0)
    assert [o.shape for o in outs] == [(3, 33), (2, 40)]
    assert all((o >= 0).all() and (o < 4096).all() for o in outs)
    n_cache = len(s._gibbs_jit_cache)
    outs2 = s.gibbs_ensemble_multi([SEQ_A, SEQ_B], [3, 2], config=cfg, seed=0)
    assert len(s._gibbs_jit_cache) == n_cache  # warm executables reused
    assert all(np.array_equal(a, b) for a, b in zip(outs, outs2))
    # the coalesced group reuses the SINGLE-request executables (the
    # programs take sequence tokens per row): 3+2 and 5 share one plan
    one = s.gibbs_ensemble(SEQ_A, 5, config=cfg, seed=5)
    assert len(s._gibbs_jit_cache) == n_cache
    # single == single-item multi (one shared code path, bitwise)
    also = s.gibbs_ensemble_multi([SEQ_A], [5], config=cfg, seed=5)[0]
    np.testing.assert_array_equal(one, also)
    # cross-request batched VQ decode
    prots = s.decode_ensemble_multi([SEQ_A, SEQ_B], outs)
    assert [len(p) for p in prots] == [3, 2]
    assert prots[0][0].coordinates.shape == (33, 37, 3)
    assert prots[1][1].coordinates.shape == (40, 37, 3)
    assert prots[1][1].sequence == SEQ_B


def test_ddpm_multi_coalesced(tiny_runtime):
    s = EnsembleSampler(tiny_runtime)
    outs = s.ddpm_ensemble_multi([SEQ_A, SEQ_B], [2, 2], num_steps=2, seed=1)
    assert [o.shape for o in outs] == [(2, 33), (2, 40)]
    one = s.ddpm_ensemble(SEQ_A, 2, num_steps=2, seed=3)
    also = s.ddpm_ensemble_multi([SEQ_A], [2], num_steps=2, seed=3)[0]
    np.testing.assert_array_equal(one, also)


def test_multi_request_rows_are_placement_invariant(tiny_runtime):
    """Coalesced-serving determinism (VERDICT round-3 weak #2): a request's
    ensemble is bit-identical whether it runs alone or coalesced with other
    requests — row PRNG keys derive from the owning request's seed + row
    index (request_row_keys), never from batch composition or placement."""
    s = EnsembleSampler(tiny_runtime)
    alone = s.ddpm_ensemble_multi([SEQ_A], [3], num_steps=2, seeds=[5])[0]
    packed = s.ddpm_ensemble_multi(
        [SEQ_B, SEQ_A, SEQ_A], [2, 3, 1], num_steps=2, seeds=[1, 5, 9])[1]
    np.testing.assert_array_equal(alone, packed)
    # ddpm_ensemble(seed) == the same request coalesced under that seed
    direct = s.ddpm_ensemble(SEQ_A, 3, num_steps=2, seed=5)
    np.testing.assert_array_equal(direct, alone)


def test_gibbs_multi_rows_are_placement_invariant(gibbs_runtime):
    s = EnsembleSampler(gibbs_runtime)
    cfg = GenerationConfig(num_steps=2)
    alone = s.gibbs_ensemble_multi([SEQ_B], [2], config=cfg, seeds=[7])[0]
    packed = s.gibbs_ensemble_multi(
        [SEQ_A, SEQ_B], [3, 2], config=cfg, seeds=[0, 7])[1]
    np.testing.assert_array_equal(alone, packed)


def test_multi_rejects_mixed_buckets(gibbs_runtime):
    s = EnsembleSampler(gibbs_runtime)
    long_seq = SEQ_A * 3  # 99 res -> 128-bucket
    with pytest.raises(ValueError, match="length bucket"):
        s.gibbs_ensemble_multi([SEQ_A, long_seq], [1, 1],
                               config=GenerationConfig(num_steps=2))


def test_sample_cli_refine_writes_valid_geometry(tmp_path):
    """--refine (ops/refine.py through cli/sample.py): the written ensemble
    passes the reference bond/clash validity metrics even at a random-weight
    decode floor."""
    from esmdiff_tpu.cli.sample import main as sample_main
    from esmdiff_tpu.core.protein import load_ca_ensemble
    from esmdiff_tpu.eval import metrics

    out = tmp_path / "refined"
    sample_main([
        "--input", str(Path(BPTI).parent), "--output", str(out),
        "--mode", "ddpm", "--num_steps", "2", "--num_samples", "2",
        "--model_scale", "tiny", "--refine",
    ])
    ca = load_ca_ensemble(out / "bpti.pdb")
    assert ca.shape[0] == 2
    assert metrics.validity({"p": ca})["p"] == 1.0
    adj = np.linalg.norm(np.diff(ca, axis=1), axis=-1)
    assert adj.max() < 4.01 and adj.min() > 3.5
