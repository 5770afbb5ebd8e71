from esmdiff_tpu.utils import fixtures as __fx
import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import protein, residue_constants as rc
from esmdiff_tpu.core.tokenizer import SequenceTokenizer, StructureTokenizer

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def test_constants():
    assert C.STRUCTURE_VOCAB_SIZE == 4101
    assert C.STRUCTURE_PAD_TOKEN == 4099
    assert C.STRUCTURE_MASK_TOKEN == 4096
    assert len(C.SEQUENCE_VOCAB) == 33
    assert C.SEQUENCE_VOCAB[C.SEQUENCE_CHAINBREAK_TOKEN] == "|"
    assert C.SEQUENCE_VOCAB[C.SEQUENCE_MASK_TOKEN] == "<mask>"


def test_sequence_tokenizer_roundtrip():
    tok = SequenceTokenizer()
    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"
    ids = tok.encode(seq)
    assert ids[0] == C.SEQUENCE_BOS_TOKEN and ids[-1] == C.SEQUENCE_EOS_TOKEN
    assert tok.decode(ids) == seq
    # '_' is the mask character used by the inpainting path
    ids2 = tok.encode("A_C")
    assert ids2[2] == C.SEQUENCE_MASK_TOKEN
    assert tok.decode(ids2) == "A_C"


def test_structure_tokenizer_bos_eos():
    toks = np.arange(5, dtype=np.int32)
    wrapped = StructureTokenizer.add_bos_eos(toks)
    assert wrapped[0] == C.STRUCTURE_BOS_TOKEN
    assert wrapped[-1] == C.STRUCTURE_EOS_TOKEN
    np.testing.assert_array_equal(StructureTokenizer.strip_bos_eos(wrapped), toks)


def test_parse_bpti():
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    assert 50 < len(prot.aatype) < 70  # BPTI is 58 residues
    bb = prot.backbone_coords()
    assert bb.shape == (len(prot.aatype), 3, 3)
    assert np.isfinite(bb).all()
    # BPTI sequence starts with RPDF
    assert prot.sequence.startswith("RPDF")


def test_pdb_write_parse_roundtrip(tmp_path):
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    fp = tmp_path / "out.pdb"
    protein.to_pdb_file(prot, fp)
    prot2 = protein.from_pdb_file(fp)
    assert prot2.sequence == prot.sequence
    np.testing.assert_allclose(
        prot2.atom_positions[prot.atom_mask > 0.5],
        prot.atom_positions[prot.atom_mask > 0.5],
        atol=1e-3,
    )


def test_ensemble_multimodel_roundtrip(tmp_path):
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    fp = tmp_path / "ens.pdb"
    protein.ensemble_to_pdb_file([prot, prot, prot], fp)
    prots = protein.from_pdb_file(fp)
    assert isinstance(prots, list) and len(prots) == 3
    ens = protein.load_ca_ensemble(fp)
    assert ens.shape == (3, len(prot.aatype), 3)


def test_from_backbone_and_oxygen():
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    bb = prot.backbone_coords()
    rebuilt = protein.from_backbone(bb, sequence=prot.sequence)
    assert rebuilt.sequence == prot.sequence
    # oxygen placed for all but last residue
    assert rebuilt.atom_mask[:-1, rc.OXYGEN_INDEX].all()
    assert rebuilt.atom_mask[-1, rc.OXYGEN_INDEX] == 0
    # inferred O should be ~1.23 A from C
    d = np.linalg.norm(
        rebuilt.atom_positions[:-1, rc.OXYGEN_INDEX]
        - rebuilt.atom_positions[:-1, rc.atom_order["C"]],
        axis=-1,
    )
    np.testing.assert_allclose(d, rc.CO_BOND_LENGTH, atol=1e-3)
    # and reasonably close to the real O positions (within ~0.3 A typically)
    real_o = prot.atom_positions[:-1, rc.OXYGEN_INDEX]
    err = np.linalg.norm(rebuilt.atom_positions[:-1, rc.OXYGEN_INDEX] - real_o, axis=-1)
    assert np.median(err) < 0.5


def test_native_pdb_parser_parity():
    """The C++ parser (native/pdbio) must produce byte-identical Proteins to
    the pure-Python parser on real targets, multi-MODEL ensembles, chain
    selection, and odd records (HETATM/altloc/insertion codes)."""
    import glob
    from pathlib import Path

    from esmdiff_tpu.core import protein as P

    if P._load_pdbio() is None:
        pytest.skip("no C++ toolchain: native parser unavailable")

    files = [str(__fx.bpti_pdb())]
    files += sorted(glob.glob(str(__fx.targets_root() / "apo" / "*.pdb")))[:2]
    files += sorted(glob.glob(str(__fx.targets_root() / "ped" / "*.pdb")))[:2]
    for f in files:
        text = Path(f).read_text()
        nat = P._native_parse_models(text, None)
        py = P._python_parse_models(text, None)
        assert len(nat) == len(py)
        for a, b in zip(nat, py):
            np.testing.assert_array_equal(a.aatype, b.aatype, err_msg=f)
            np.testing.assert_array_equal(a.residue_index, b.residue_index)
            np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
            np.testing.assert_allclose(a.atom_positions, b.atom_positions,
                                       atol=0)
            np.testing.assert_allclose(a.b_factors, b.b_factors, atol=0)

    # multi-MODEL ensemble + chain/model selection
    bpti = P.from_pdb_file(files[0])
    ens = P.ensemble_to_pdb([bpti] * 7)
    nat = P._native_parse_models(ens, None)
    py = P._python_parse_models(ens, None)
    assert len(nat) == len(py) == 7
    np.testing.assert_allclose(nat[3].atom_positions, py[3].atom_positions,
                               atol=0)
    sel = P.from_pdb_string(ens, chain_id="A", model=2)
    np.testing.assert_allclose(sel.atom_positions, py[2].atom_positions,
                               atol=0)

    # synthetic edge: altloc B dropped, HETATM MSE kept, insertion codes,
    # duplicate atom first-wins, unknown-resname ATOM -> X
    pdb = "\n".join([
        "ATOM      1  N   ALA A   1      11.000  12.000  13.000  1.00 10.00",
        "ATOM      2  CA  ALA A   1      12.000  12.500  13.500  1.00 11.00",
        "ATOM      3  CA BALA A   1      99.000  99.000  99.000  1.00 12.00",
        "ATOM      4  CA  ALA A   1      88.000  88.000  88.000  1.00 13.00",
        "HETATM    5  CA  MSE A   2      14.000  14.500  15.000  1.00 14.00",
        "HETATM    6  CA  HOH A   3      50.000  50.000  50.000  1.00  0.00",
        "ATOM      7  CA  XYZ A   4      16.000  16.500  17.000  1.00 15.00",
        "ATOM      8  CA  GLY A   4A     18.000  18.500  19.000  1.00 16.00",
        "ATOM      9  CA  SER B   9      20.000  20.500  21.000  1.00 17.00",
    ])
    nat = P._native_parse_models(pdb, None)
    py = P._python_parse_models(pdb, None)
    assert len(nat) == len(py) == 1
    np.testing.assert_array_equal(nat[0].aatype, py[0].aatype)
    np.testing.assert_array_equal(nat[0].residue_index, py[0].residue_index)
    np.testing.assert_allclose(nat[0].atom_positions, py[0].atom_positions,
                               atol=0)
    np.testing.assert_allclose(nat[0].b_factors, py[0].b_factors, atol=0)
