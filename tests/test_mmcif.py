"""mmCIF parser + preprocess pipeline on synthesized mmCIF files."""

import gzip

import numpy as np
import pytest

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.core import mmcif, protein, residue_constants as rc

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def protein_to_mmcif(prot, entry_id="test", chain_id="A",
                     resolution=1.8, oligomeric="monomeric",
                     oligomeric_loop=False) -> str:
    return proteins_to_mmcif([(chain_id, prot)], entry_id=entry_id,
                             resolution=resolution, oligomeric=oligomeric,
                             oligomeric_loop=oligomeric_loop)


def proteins_to_mmcif(chain_items, entry_id="test",
                      resolution=1.8, oligomeric="monomeric",
                      oligomeric_loop=False) -> str:
    """Minimal mmCIF writer (test fixture); chain_items = [(chain_id, prot)]."""
    lines = [
        f"data_{entry_id}",
        f"_entry.id {entry_id}",
        f"_refine.ls_d_res_high {resolution}",
        "_exptl.method 'X-RAY DIFFRACTION'",
        "#",
    ]
    if oligomeric_loop:
        lines += [
            "loop_",
            "_pdbx_struct_assembly.id",
            "_pdbx_struct_assembly.oligomeric_details",
            "_pdbx_struct_assembly.oligomeric_count",
            f"1 {oligomeric} 1",
            f"2 {oligomeric} 1",
            "#",
        ]
    elif oligomeric:
        lines += [
            f"_pdbx_struct_assembly.oligomeric_details {oligomeric}",
            "#",
        ]
    lines += [
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.label_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.label_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.B_iso_or_equiv",
        "_atom_site.pdbx_PDB_model_num",
    ]
    rts3 = [rc.restype_1to3[r] for r in rc.restypes] + ["UNK"]
    serial = 1
    for chain_id, prot in chain_items:
        for i in range(len(prot.aatype)):
            res3 = rts3[min(int(prot.aatype[i]), rc.restype_num)]
            for ai, name in enumerate(rc.atom_types):
                if prot.atom_mask[i, ai] < 0.5:
                    continue
                x, y, z = prot.atom_positions[i, ai]
                lines.append(
                    f"ATOM {serial} {name} . {res3} {chain_id} "
                    f"{int(prot.residue_index[i])} ? {x:.3f} {y:.3f} {z:.3f} "
                    f"{float(prot.b_factors[i, ai]):.2f} 1")
                serial += 1
    lines.append("#")
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def bpti():
    prot = protein.from_pdb_file(BPTI)
    return prot[0] if isinstance(prot, list) else prot


def test_parse_roundtrip(bpti, tmp_path):
    cif = tmp_path / "bpti.cif"
    cif.write_text(protein_to_mmcif(bpti))
    obj = mmcif.parse_mmcif(cif)
    assert obj.header.resolution == pytest.approx(1.8)
    assert obj.header.method == "X-RAY DIFFRACTION"
    assert list(obj.chains) == ["A"]
    parsed = obj.chains["A"]
    assert parsed.sequence == bpti.sequence
    np.testing.assert_allclose(
        parsed.atom_positions[parsed.atom_mask > 0.5],
        bpti.atom_positions[bpti.atom_mask > 0.5], atol=1e-3)


def test_parse_gzip(bpti, tmp_path):
    cif = tmp_path / "bpti.cif.gz"
    with gzip.open(cif, "wt") as f:
        f.write(protein_to_mmcif(bpti))
    obj = mmcif.parse_mmcif(cif)
    assert obj.chains["A"].sequence == bpti.sequence


def test_preprocess_cli(bpti, tmp_path):
    from esmdiff_tpu.cli.preprocess import main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "ok.cif").write_text(protein_to_mmcif(bpti, resolution=1.8))
    (in_dir / "bad_res.cif").write_text(
        protein_to_mmcif(bpti, resolution=9.0))
    # too short after filters
    short = protein.from_backbone(bpti.backbone_coords()[:5],
                                  sequence=bpti.sequence[:5])
    (in_dir / "short.cif").write_text(protein_to_mmcif(short))

    main([str(in_dir), str(out_dir), "--min_len", "10",
          "--max_resolution", "5.0"])
    files = sorted(out_dir.glob("*.npz"))
    assert len(files) == 1 and files[0].stem == "ok_A"
    z = np.load(files[0])
    assert str(z["sequence"]) == bpti.sequence
    meta = (out_dir / "metadata.csv").read_text()
    assert "resolution_filtered" in meta
    assert "length_filtered" in meta
    assert "monomeric" in meta


def test_oligomeric_parsing(bpti, tmp_path):
    for loop in (False, True):
        cif = tmp_path / f"o{int(loop)}.cif"
        cif.write_text(protein_to_mmcif(bpti, oligomeric="dimeric",
                                        oligomeric_loop=loop))
        obj = mmcif.parse_mmcif(cif)
        expect = "dimeric,dimeric" if loop else "dimeric"
        assert obj.header.oligomeric_detail == expect


def test_filter_metadata(bpti, tmp_path):
    """Curation stage: oligomeric filter + homomer dedup
    (reference filter_metadata.py:11-87)."""
    from esmdiff_tpu.cli.preprocess import filter_metadata, main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "mono.cif").write_text(
        protein_to_mmcif(bpti, oligomeric="monomeric"))
    (in_dir / "dimer.cif").write_text(
        protein_to_mmcif(bpti, oligomeric="dimeric"))
    main([str(in_dir), str(out_dir)])
    kept = filter_metadata(out_dir / "metadata.csv",
                           out_dir / "filtered.csv")
    assert [r["file"] for r in kept] == ["mono_A"]
    assert (out_dir / "filtered.csv").exists()
    # oligomeric='' disables that filter
    kept_all = filter_metadata(out_dir / "metadata.csv", None, oligomeric="")
    assert len(kept_all) == 2


def _two_chain_slices(bpti):
    """Chain A = bpti[:20] with a leading UNK residue, chain B = bpti[20:40]
    with a trailing UNK — exercises chain merging AND unmodeled-termini
    stripping."""
    bb = bpti.backbone_coords()
    a = protein.from_backbone(bb[:20], sequence="X" + bpti.sequence[1:20])
    b = protein.from_backbone(bb[20:40], sequence=bpti.sequence[20:39] + "X")
    return a, b


def test_preprocess_complex_mode(bpti, tmp_path):
    """--mode complex merges chains into one example with chain_index and
    strips UNK termini (reference preprocess.py:400-426, :225-236)."""
    from esmdiff_tpu.cli.preprocess import main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    a, b = _two_chain_slices(bpti)
    (in_dir / "cplx.cif").write_text(
        proteins_to_mmcif([("A", a), ("B", b)]))

    main([str(in_dir), str(out_dir), "--mode", "complex"])
    files = sorted(out_dir.glob("*.npz"))
    assert [f.stem for f in files] == ["cplx"]
    with np.load(files[0]) as z:
        ci = z["chain_index"]
        seq = str(z["sequence"])
        L = len(z["aatype"])
    # leading + trailing UNK stripped: 40 raw -> 38 modeled span
    assert L == 38 and len(seq) == 38 and len(ci) == 38
    assert "X" not in seq
    # chain A residues (19 of them after the strip) then chain B (19)
    assert (ci[:19] == ci[0]).all() and (ci[19:] == ci[19]).all()
    assert ci[0] != ci[19]
    meta = (out_dir / "metadata.csv").read_text()
    assert "raw_seq_len" in meta and "40" in meta and "38" in meta


def test_complex_npz_dump_inserts_chainbreak(bpti, tmp_path):
    """from_npz on a complex example inserts a '|' chainbreak + NaN
    coordinate row at each chain transition; encode ties both tracks'
    chainbreak tokens."""
    from esmdiff_tpu.api.protein_api import ESMProtein

    a, b = _two_chain_slices(bpti)
    npz = tmp_path / "cplx.npz"
    np.savez(
        npz,
        aatype=np.concatenate([a.aatype, b.aatype]),
        atom_positions=np.concatenate([a.atom_positions, b.atom_positions]),
        atom_mask=np.concatenate([a.atom_mask, b.atom_mask]),
        residue_index=np.concatenate([a.residue_index, b.residue_index]),
        chain_index=np.concatenate([np.zeros(20, np.int32),
                                    np.ones(20, np.int32)]),
        sequence=np.array(a.sequence + b.sequence),
    )
    prot = ESMProtein.from_npz(npz)
    assert len(prot.sequence) == 41
    assert prot.sequence[20] == "|"
    assert prot.coordinates.shape[0] == 41
    assert np.isnan(prot.coordinates[20]).all()


@pytest.mark.slow
def test_complex_pipeline_trains(bpti, tmp_path):
    """VERDICT round 2 item 5 done-criterion: multi-chain mmCIF fixture ->
    merged npz -> dump encodings (chainbreak tokens on both tracks) -> one
    MDLM train step."""
    from esmdiff_tpu.cli.dump import main as dump_main
    from esmdiff_tpu.cli.preprocess import main as preprocess_main
    from esmdiff_tpu.train.config import load_config
    from esmdiff_tpu.train.loop import train

    in_dir = tmp_path / "cif"
    merged = tmp_path / "merged"
    enc = tmp_path / "enc"
    in_dir.mkdir()
    a, b = _two_chain_slices(bpti)
    for i in range(3):  # enough examples for a train/val split
        (in_dir / f"cplx{i}.cif").write_text(
            proteins_to_mmcif([("A", a), ("B", b)], entry_id=f"cplx{i}"))
    preprocess_main([str(in_dir), str(merged), "--mode", "complex"])
    dump_main([str(merged), str(enc), "--model_scale", "tiny"])
    files = sorted(enc.glob("*.npz"))
    assert len(files) == 3
    with np.load(files[0]) as z:
        st, sq = z["structure_tokens"], z["sequence_tokens"]
        # BOS + 19 + chainbreak + 19 + EOS
        assert len(st) == 41 and len(sq) == 41
        assert sq[20] == C.SEQUENCE_CHAINBREAK_TOKEN
        assert st[20] == C.STRUCTURE_CHAINBREAK_TOKEN

    cfg = load_config(None, [
        f"data.path={enc}", "data.batch_size=2", "data.max_len=48",
        "data.bucket_multiple=16", "model.size=tiny", "model.dtype=float32",
        "model.remat=false", "trainer.max_epochs=1",
        "trainer.fast_dev_run=true", f"trainer.ckpt_dir={tmp_path}/run",
    ])
    result = train(cfg)
    assert np.isfinite(result["best_val_loss"])


@pytest.mark.slow
def test_preprocess_to_dump_pipeline(bpti, tmp_path):
    """Full curation->encoding pipeline: mmCIF -> preprocess npz chains ->
    dump encodings (the reference's preprocess.py -> dump.py pkl flow,
    scripts/dump.py:82-98) without an intermediate PDB conversion."""
    from esmdiff_tpu.cli.dump import main as dump_main
    from esmdiff_tpu.cli.preprocess import main as preprocess_main

    in_dir = tmp_path / "cif"
    chains = tmp_path / "chains"
    enc = tmp_path / "enc"
    in_dir.mkdir()
    (in_dir / "ok.cif").write_text(protein_to_mmcif(bpti, resolution=1.8))
    preprocess_main([str(in_dir), str(chains)])
    assert sorted(chains.glob("*.npz"))

    dump_main([str(chains), str(enc), "--model_scale", "tiny"])
    files = sorted(enc.glob("*.npz"))
    assert len(files) == 1
    with np.load(files[0]) as z:
        assert z["sequence_tokens"].shape[0] == len(bpti.sequence) + 2
        assert (z["structure_tokens"][1:-1] < 4096).all()
        assert "coordinates" in z.files
