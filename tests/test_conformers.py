"""ENM synthetic conformers (train/conformers.py) — the data lever on the
224-chain tokenizer floor.  Decoys must be physically valid, diverse,
deterministic, and drawn from TRAIN chains only."""

import numpy as np
import pytest

from esmdiff_tpu.utils.fixtures import bpti_pdb
from esmdiff_tpu.core import protein as pio
from esmdiff_tpu.eval import metrics
from esmdiff_tpu.train.conformers import (anm_modes, enm_conformers,
                                          synthesize_corpus)


@pytest.fixture(scope="module")
def bpti_bb():
    prot = pio.from_pdb_file(str(bpti_pdb()))
    prot = prot[0] if isinstance(prot, list) else prot
    return prot.backbone_coords()


def test_anm_modes_are_orthonormal_nonrigid(bpti_bb):
    ca = bpti_bb[:, 1]
    modes, lam = anm_modes(ca, n_modes=10)
    assert modes.shape == (10, len(ca), 3)
    assert (lam > 0).all() and (np.diff(lam) >= -1e-9).all()
    flat = modes.reshape(10, -1)
    np.testing.assert_allclose(flat @ flat.T, np.eye(10), atol=1e-8)


def test_decoys_are_physical_and_diverse(bpti_bb):
    rs = np.random.RandomState(0)
    decoys = enm_conformers(bpti_bb, 6, rs=rs)
    assert decoys.shape == (6,) + bpti_bb.shape
    ca0, ca = bpti_bb[:, 1], decoys[:, :, 1]
    disp = np.sqrt(((ca - ca0) ** 2).sum(-1).mean(-1))
    assert (disp > 0.3).all() and (disp < 5.0).all()
    # bond band held after projection; no steric clashes introduced
    adj = np.linalg.norm(np.diff(ca, axis=1), axis=-1)
    assert adj.min() > 3.5 and adj.max() < 4.01
    assert metrics.validity({"d": ca})["d"] == 1.0
    # decoys differ from each other (mode combinations are random)
    assert np.sqrt(((ca[0] - ca[1]) ** 2).sum(-1).mean()) > 0.3


def test_deterministic_under_seed(bpti_bb):
    a = enm_conformers(bpti_bb, 3, rs=np.random.RandomState(7))
    b = enm_conformers(bpti_bb, 3, rs=np.random.RandomState(7))
    np.testing.assert_array_equal(a, b)


def test_nan_residues_preserved(bpti_bb):
    bb = bpti_bb.copy()
    bb[20:23] = np.nan
    decoys = enm_conformers(bb, 2, rs=np.random.RandomState(1), refine=False)
    assert np.isnan(decoys[:, 20:23]).all()
    assert np.isfinite(np.delete(decoys, [20, 21, 22], axis=1)).all()


def test_synthesize_corpus_expands_train_only(bpti_bb):
    L = len(bpti_bb)
    Lp = L + 6
    bbs = np.full((3, Lp, 3, 3), np.nan, np.float32)
    for i in range(3):
        bbs[i, :L] = bpti_bb + i * 0.5
    lens = np.full((3,), L, np.int32)
    train_idx = np.array([0, 2])
    bb2, lens2, origin = synthesize_corpus(bbs, lens, train_idx, 4,
                                           seed=0, log=None)
    assert len(lens2) == 3 + 2 * 4
    # originals first, untouched
    np.testing.assert_array_equal(bb2[:3], bbs)
    # no decoy originates from the held-out chain 1
    assert set(origin[3:]) == {0, 2}
    assert (lens2[3:] == L).all()
