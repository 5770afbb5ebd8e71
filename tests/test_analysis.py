"""Analysis suites (bpti/apo/ped) on synthetic ensembles."""

import numpy as np
import pytest

from esmdiff_tpu.core import protein
from esmdiff_tpu.eval import analysis

BPTI = "/root/reference/data/targets/bpti/bpti.pdb"


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


def test_ped_evaluation(ensembles):
    root, prot = ensembles
    res = analysis.ped_evaluation(
        {"close": root / "close.pdb", "far": root / "far.pdb"},
        [root / "target.pdb"])
    i_close = res["name"].index("close")
    i_far = res["name"].index("far")
    assert res["mae_pwd"][i_close] < res["mae_pwd"][i_far]
    assert res["mae_rg"][i_close] < res["mae_rg"][i_far]
