"""Analysis suites (bpti/apo/ped) on synthetic ensembles."""

from esmdiff_tpu.utils import fixtures as __fx
import numpy as np
import pytest

from esmdiff_tpu.core import protein
from esmdiff_tpu.eval import analysis

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


@pytest.fixture(scope="module")
def ensembles(tmp_path_factory):
    root = tmp_path_factory.mktemp("ens")
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    rng = np.random.RandomState(0)
    ca = prot.ca_coords()

    def make(path, scale, n=12, seed=0):
        rr = np.random.RandomState(seed)
        prots = []
        for i in range(n):
            bb = prot.backbone_coords() + rr.randn(*prot.backbone_coords().shape) * scale
            prots.append(protein.from_backbone(bb, sequence=prot.sequence))
        protein.ensemble_to_pdb_file(prots, path)

    make(root / "target.pdb", 0.4, n=30, seed=1)
    make(root / "close.pdb", 0.4, n=12, seed=2)
    make(root / "far.pdb", 4.0, n=12, seed=3)
    return root, prot


def test_bpti_evaluation(ensembles, tmp_path):
    root, prot = ensembles
    res = analysis.bpti_evaluation(
        {"close": root / "close.pdb", "far": root / "far.pdb"},
        root / "target.pdb", output_dir=tmp_path, lagtime=2)
    i_close = res["name"].index("close")
    i_far = res["name"].index("far")
    assert res["js_pwd"][i_close] < res["js_pwd"][i_far]
    assert (tmp_path / "js_metrics.csv").exists()


def test_bpti_clusters(ensembles, tmp_path):
    root, prot = ensembles
    clusters = tmp_path / "clusters"
    clusters.mkdir()
    protein.to_pdb_file(protein.from_pdb_file(BPTI) if not isinstance(
        protein.from_pdb_file(BPTI), list) else protein.from_pdb_file(BPTI)[0],
        clusters / "bpti_1.pdb")
    res = analysis.bpti_rmsd_clusters(
        {"close": root / "close.pdb", "far": root / "far.pdb"},
        clusters, output_dir=tmp_path)
    assert res["close"]["TM-ens"] > res["far"]["TM-ens"]
    assert res["close"]["RMSD-ens"] < res["far"]["RMSD-ens"]
    assert 0 <= res["close"]["TM-div"] <= 1


def test_apo_analyze(ensembles, tmp_path):
    root, prot = ensembles
    samples = tmp_path / "samples"
    samples.mkdir()
    import shutil

    shutil.copy(root / "close.pdb", samples / "t1.pdb")
    pairs = [{"name": "t1", "path1": BPTI, "path2": root / "target.pdb"}]
    res = analysis.apo_analyze(samples, pairs, output_dir=tmp_path)
    assert 0 < res["tm_ens_mean"] <= 1.0
    assert (tmp_path / "apo_metrics.json").exists()


def test_nw_align_basics():
    from esmdiff_tpu.eval.align import nw_align

    a, b = nw_align("ACDEFG", "ACDEFG")
    assert a == b == "ACDEFG"
    a, b = nw_align("ACDEFG", "ACEFG")  # internal deletion
    assert a.replace("-", "") == "ACDEFG"
    assert b.replace("-", "") == "ACEFG"
    matches = sum(x == y for x, y in zip(a, b) if x != "-" and y != "-")
    assert matches == 5
    # empty edge cases
    assert nw_align("", "AC") == ("--", "AC")
    assert nw_align("AC", "") == ("AC", "--")


def test_map_to_reference_gapped():
    """Deliberately gapped chain stays on-register (the reference's
    seqres alignment semantics, apo_analysis.py:182-199); min-length
    truncation would shift everything after the gap."""
    from esmdiff_tpu.eval.align import map_to_reference, nan_pair_deviation

    rng = np.random.RandomState(0)
    ref_seq = "ACDEFGHIKLMNPQRSTVWY" * 3  # 60 residues
    coords = rng.randn(60, 3) * 10
    # chain with residues 10..14 unresolved (internal gap)
    keep = np.ones(60, bool)
    keep[10:15] = False
    obs_seq = "".join(c for c, k in zip(ref_seq, keep) if k)
    obs = coords[keep]
    mapped = map_to_reference(ref_seq, obs_seq, obs)
    assert np.isnan(mapped[10:15]).all()
    m = np.isfinite(mapped[:, 0])
    assert m.sum() == 55
    np.testing.assert_allclose(mapped[m], coords[keep], atol=1e-12)
    # deviation vs the full reference is ~0 everywhere observed
    dev = nan_pair_deviation(mapped, coords)
    assert np.nanmax(dev) < 1e-6
    assert np.isnan(dev[10:15]).all()


def test_apo_analyze_gapped_fixture(tmp_path):
    """apo pair where one chain has an internal unresolved stretch AND a
    numbering offset: per-residue RMSD must stay near zero off the gap
    (truncation alignment would blow it up)."""
    from esmdiff_tpu.core import residue_constants as rc

    prot = protein.from_pdb_file(BPTI)
    prot = prot[0] if isinstance(prot, list) else prot
    seqres = prot.sequence
    L = len(seqres)

    # chain2 = same structure, residues 20..24 removed, renumbered from 101
    keep = np.ones(L, bool)
    keep[20:25] = False
    import dataclasses

    gapped = dataclasses.replace(
        prot,
        atom_positions=prot.atom_positions[keep],
        atom_mask=prot.atom_mask[keep],
        aatype=prot.aatype[keep],
        residue_index=np.arange(101, 101 + keep.sum(), dtype=np.int32),
        b_factors=prot.b_factors[keep],
    )
    p1 = tmp_path / "full.pdb"
    p2 = tmp_path / "gapped.pdb"
    protein.to_pdb_file(prot, p1)
    protein.to_pdb_file(gapped, p2)

    samples = tmp_path / "samples"
    samples.mkdir()
    rng = np.random.RandomState(0)
    prots = [protein.from_backbone(
        prot.backbone_coords() + rng.randn(L, 3, 3) * 0.3,
        sequence=seqres) for _ in range(4)]
    protein.ensemble_to_pdb_file(prots, samples / "t1.pdb")

    res = analysis.apo_analyze(
        samples, [{"name": "t1", "path1": p1, "path2": p2,
                   "seqres": seqres}])
    row = res["per_target"][0]
    assert row["gaps"][1] - row["gaps"][0] == 5  # the masked stretch
    assert res["tm_ens_mean"] > 0.9
    # identical structures (up to the gap): correct registration makes the
    # pair TM ~1.0 — truncation alignment would drop it far below
    assert row["tm_pair"] > 0.99


def test_ped_evaluation(ensembles):
    root, prot = ensembles
    res = analysis.ped_evaluation(
        {"close": root / "close.pdb", "far": root / "far.pdb"},
        [root / "target.pdb"])
    i_close = res["name"].index("close")
    i_far = res["name"].index("far")
    assert res["mae_pwd"][i_close] < res["mae_pwd"][i_far]
    assert res["mae_rg"][i_close] < res["mae_rg"][i_far]


def test_ped_evaluation_ragged_targets(ensembles, tmp_path):
    """Targets of different chain lengths must truncate to the common
    minimum BEFORE concatenation (multi-target CLI runs crashed on the
    ragged concat — found driving esmdiff-analyze ped over the round-3
    campaign samples)."""
    root, prot = ensembles
    short = protein.from_backbone(prot.backbone_coords()[:20],
                                  sequence=prot.sequence[:20])
    protein.ensemble_to_pdb_file([short, short], tmp_path / "short.pdb")
    res = analysis.ped_evaluation(
        {"close": root / "close.pdb"},
        [root / "target.pdb", tmp_path / "short.pdb"])
    assert np.isfinite(res["mae_pwd"][0])


@pytest.mark.slow
def test_apo_cli_real_targets_end_to_end(tmp_path):
    """cli/analyze.py apo over REAL apo target structures with the
    reference's CSV/structures-dir layout (name, holo, seqres columns;
    files under <dir>/<name[:2]>/<name>), including a deliberately gapped
    partner chain per target (VERDICT #3 'done' criterion)."""
    import csv as _csv
    import dataclasses

    from esmdiff_tpu.cli.analyze import main as analyze_main
    from pathlib import Path

    targets = sorted((__fx.targets_root() / "apo").glob("*.pdb"))[:3]
    structures = tmp_path / "structures"
    samples = tmp_path / "samples"
    samples.mkdir()
    rows = []
    rng = np.random.RandomState(0)
    for t in targets:
        got = protein.from_pdb_file(t)
        prot = got[0] if isinstance(got, list) else got
        name1 = f"{t.stem}.pdb"
        name2 = f"{t.stem}_holo.pdb"
        for name, p in ((name1, prot), (name2, None)):
            d = structures / name[:2]
            d.mkdir(parents=True, exist_ok=True)
            if p is not None:
                protein.to_pdb_file(p, d / name)
        # holo partner: same structure minus an internal 4-residue stretch,
        # renumbered from 200 (real-world gap + numbering offset)
        L = len(prot.aatype)
        keep = np.ones(L, bool)
        keep[L // 2:L // 2 + 4] = False
        gapped = dataclasses.replace(
            prot,
            atom_positions=prot.atom_positions[keep],
            atom_mask=prot.atom_mask[keep],
            aatype=prot.aatype[keep],
            residue_index=np.arange(200, 200 + keep.sum(), dtype=np.int32),
            b_factors=prot.b_factors[keep],
        )
        protein.to_pdb_file(gapped, structures / name2[:2] / name2)
        # samples: jittered copies of the target
        ens = [protein.from_backbone(
            prot.backbone_coords() + rng.randn(L, 3, 3) * 0.3,
            sequence=prot.sequence) for _ in range(4)]
        protein.ensemble_to_pdb_file(ens, samples / f"{t.stem}.pdb")
        rows.append({"name": name1, "holo": name2, "seqres": prot.sequence})

    pairs_csv = tmp_path / "apo.csv"
    with open(pairs_csv, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["name", "holo", "seqres"])
        w.writeheader()
        w.writerows(rows)

    out = tmp_path / "out"
    analyze_main(["apo", "--samples", str(samples),
                  "--pairs-csv", str(pairs_csv),
                  "--structures", str(structures),
                  "--output", str(out)])
    import json

    summary = json.loads((out / "apo_metrics.json").read_text())
    assert len(summary["per_target"]) == 3
    for row in summary["per_target"]:
        # identical structures up to the artificial gap: registration must
        # survive the gap + renumbering (truncation alignment would not)
        assert row["tm_pair"] > 0.95, row
        assert row["gaps"][1] >= 4  # the masked stretch is reported
    assert summary["tm_ens_mean"] > 0.8
