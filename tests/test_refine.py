"""Post-decode geometry projection (ops/refine.py).

The refiner must (a) rescue bond/clash validity on decode-floor-quality
backbones — the campaign ensembles score 0.0 on the reference metrics
(slm/utils/eval_utils.py:132-188) because ~33% of virtual CA-CA bonds fall
outside the physical band — and (b) act as (near-)identity on structures
that are already valid.
"""

import numpy as np

from esmdiff_tpu.utils.fixtures import bpti_pdb
from esmdiff_tpu.core.protein import load_ca_ensemble
from esmdiff_tpu.eval import metrics
from esmdiff_tpu.ops.refine import (refine_backbone_ensemble,
                                    refine_ca_ensemble)


def _corrupted_ensemble(M=6, scale=1.4, noise=2.0, seed=0):
    gt = load_ca_ensemble(str(bpti_pdb()))          # (1, L, 3)
    rs = np.random.RandomState(seed)
    bad = np.repeat(gt, M, 0) * scale + rs.randn(M, gt.shape[1], 3) * noise
    return gt, bad.astype(np.float32)


def test_ground_truth_is_near_fixed_point():
    gt = load_ca_ensemble(str(bpti_pdb()))
    ref = refine_ca_ensemble(gt)
    move = np.nanmean(np.linalg.norm(ref - gt, axis=-1))
    assert move < 0.05, f"valid structure moved {move:.3f} A"
    assert metrics.validity({"p": ref})["p"] == 1.0


def test_rescues_decode_floor_validity():
    gt, bad = _corrupted_ensemble()
    # the corruption really does break both metrics
    assert metrics.validity({"p": bad})["p"] < 0.5
    adj_bad = np.linalg.norm(np.diff(bad, axis=1), axis=-1)
    assert (adj_bad > 4.01).any()

    fix = refine_ca_ensemble(bad)
    # clash validity under the reference default (bonded pairs included)
    assert metrics.validity({"p": fix})["p"] == 1.0
    # bond validity vs the ground-truth threshold (reference semantics)
    bv = metrics.bonding_validity({"target": gt, "p": fix})["p"]
    assert bv == 1.0, f"bond validity {bv}"
    adj = np.linalg.norm(np.diff(fix, axis=1), axis=-1)
    assert adj.min() > 3.5 and adj.max() < 4.01


def test_structure_preserved_within_projection_distance():
    # the projection must repair locally, not rebuild globally: the refined
    # trace stays far closer to its input than the input's own diameter
    _, bad = _corrupted_ensemble()
    fix = refine_ca_ensemble(bad)
    move = np.linalg.norm(fix - bad, axis=-1).mean()
    diameter = np.linalg.norm(
        bad[:, :, None] - bad[:, None, :], axis=-1).max()
    assert move < diameter * 0.15, (move, diameter)


def test_nan_rows_pass_through():
    _, bad = _corrupted_ensemble(M=2)
    bad[:, 10:13] = np.nan
    fix = refine_ca_ensemble(bad)
    assert np.isnan(fix[:, 10:13]).all()
    assert np.isfinite(np.delete(fix, [10, 11, 12], axis=1)).all()


def test_backbone_rigid_shift_preserves_residue_geometry():
    gt, bad_ca = _corrupted_ensemble(M=2)
    # synthesize N/CA/C: CA +- fixed offsets
    off_n = np.array([-1.46, 0.0, 0.0], np.float32)
    off_c = np.array([1.52, 0.0, 0.0], np.float32)
    bb = np.stack([bad_ca + off_n, bad_ca, bad_ca + off_c], axis=2)
    out = refine_backbone_ensemble(bb)
    # intra-residue offsets unchanged (rigid per-residue translation)
    assert np.abs(out[:, :, 0] - out[:, :, 1] - off_n).max() < 2e-3
    assert np.abs(out[:, :, 2] - out[:, :, 1] - off_c).max() < 2e-3
    # and the CA channel matches the CA-only refiner
    np.testing.assert_allclose(out[:, :, 1], refine_ca_ensemble(bad_ca),
                               rtol=0, atol=2e-3)
