"""Kabsch-Sander secondary-structure assignment (core/secondary_structure)."""

import numpy as np

from esmdiff_tpu.core import protein
from esmdiff_tpu.core.secondary_structure import (
    assign_secondary_structure,
    hbond_matrix,
    ss_fractions,
)

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def _bpti():
    p = protein.from_pdb_file(BPTI)
    return p[0] if isinstance(p, list) else p


def test_bpti_known_topology():
    """BPTI: C-terminal alpha helix (~res 48-55) and the central
    antiparallel beta sheet (~18-24 / 29-35)."""
    ss = assign_secondary_structure(_bpti())
    assert len(ss) == 58
    assert ss[48:55].count("H") >= 5, ss[48:55]
    assert ss[17:24].count("E") >= 3, ss[17:24]
    assert ss[29:35].count("E") >= 2, ss[29:35]
    f = ss_fractions(ss)
    assert 0.05 < f["frac_helix"] < 0.4
    assert 0.05 < f["frac_sheet"] < 0.4
    assert abs(sum(f.values()) - 1.0) < 1e-9


def test_hbonds_antisymmetric_in_roles():
    hb = hbond_matrix(_bpti())
    # helix: CO(i) accepts from NH(i+4) within 48-54
    assert any(hb[i + 4, i] for i in range(46, 52))
    # no self/neighbor bonds
    idx = np.arange(hb.shape[0])
    near = np.abs(idx[:, None] - idx[None, :]) <= 1
    assert not (hb & near).any()


def test_preprocess_with_dssp(tmp_path):
    from esmdiff_tpu.cli.preprocess import main
    from tests.test_mmcif import protein_to_mmcif

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "bpti.cif").write_text(protein_to_mmcif(_bpti()))
    out = tmp_path / "out"
    main([str(in_dir), str(out), "--with_dssp"])
    meta = (out / "metadata.csv").read_text()
    assert "frac_helix" in meta and "HHH" in meta
    z = np.load(out / "bpti_A.npz")
    assert "secondary_structure" in z.files
    assert "H" in str(z["secondary_structure"])
