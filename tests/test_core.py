import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import protein, residue_constants as rc
from esmdiff_tpu.core.tokenizer import SequenceTokenizer, StructureTokenizer

BPTI = "/root/reference/data/targets/bpti/bpti.pdb"


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
