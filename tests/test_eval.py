import numpy as np
import pytest

from esmdiff_tpu.core import protein
from esmdiff_tpu.eval import geo, metrics, tmscore

from esmdiff_tpu.utils.fixtures import bpti_pdb, targets_root
BPTI = str(bpti_pdb())


def _bpti_ca():
    prot = protein.from_pdb_file(BPTI)
    if isinstance(prot, list):
        prot = prot[0]
    return prot.ca_coords()


def _fake_ensemble(ca, n, scale, seed=0):
    rng = np.random.RandomState(seed)
    return ca[None] + rng.randn(n, *ca.shape) * scale


# -- geo ---------------------------------------------------------------------

def test_kabsch_recovers_rigid_transform():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    P = rng.randn(30, 3)
    A = rng.randn(3, 3)
    q, _ = np.linalg.qr(A)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    Q = P @ q.T + np.array([1.0, 2.0, 3.0])
    r = float(geo.rmsd(jnp.asarray(P), jnp.asarray(Q)))
    assert r < 1e-3  # fp32 SVD precision


def test_rmsd_batched():
    import jax.numpy as jnp
    ca = _bpti_ca()
    ens = _fake_ensemble(ca, 4, 0.5)
    r = np.asarray(geo.rmsd_batched(jnp.asarray(ens), jnp.asarray(ca)))
    assert r.shape == (4,)
    assert (r > 0).all() and (r < 2.0).all()


# -- metrics -----------------------------------------------------------------

def test_js_pwd_sanity():
    ca = _bpti_ca()
    target = _fake_ensemble(ca, 50, 0.3, seed=1)
    close = _fake_ensemble(ca, 50, 0.3, seed=2)
    far = _fake_ensemble(ca, 50, 3.0, seed=3)
    res = metrics.js_pwd(
        {"target": target, "close": close, "far": far})
    assert res["target"] == 0.0
    assert res["close"] < res["far"]


def test_js_rg_and_tica():
    ca = _bpti_ca()
    target = _fake_ensemble(ca, 300, 0.3, seed=1)
    close = _fake_ensemble(ca, 300, 0.3, seed=2)
    far = _fake_ensemble(ca, 300, 4.0, seed=3)
    r_rg = metrics.js_rg(
        {"target": target, "close": close, "far": far}, n_bins=10)
    assert r_rg["close"] < r_rg["far"]
    r_tica, proj = metrics.js_tica(
        {"target": target, "close": close, "far": far}, lagtime=5)
    assert proj["target"].shape == (300, 2)
    assert np.isfinite(r_tica["close"]) and np.isfinite(r_tica["far"])


def test_validity_metrics():
    ca = _bpti_ca()
    good = _fake_ensemble(ca, 10, 0.1)
    collapsed = np.zeros_like(good) + np.random.RandomState(0).randn(
        10, ca.shape[0], 3) * 0.5  # everything within ~1A: heavy clashes
    v = metrics.validity({"good": good, "bad": collapsed})
    assert v["good"] > 0.9
    assert v["bad"] < 0.2
    b = metrics.bonding_validity({"target": good[:5], "stretched": good * 10})
    assert b["target"] == 1.0
    assert b["stretched"] < 1.0


def test_idp_metrics_self_zero():
    ca = _bpti_ca()
    ens = _fake_ensemble(ca, 20, 0.5)
    mse_pwd, mse_rg, mse_c, mae_pwd, mae_rg, mae_c = metrics.idp_metrics(
        {"target": ens, "other": _fake_ensemble(ca, 20, 0.5, seed=9)})
    assert mae_pwd["target"] == 0.0
    assert mae_pwd["other"] > 0.0


def test_tica_separates_modes():
    # two-state trajectory in 5-d feature space
    rng = np.random.RandomState(0)
    T = 400
    state = (np.sin(np.arange(T) / 40.0) > 0).astype(float)
    X = state[:, None] * np.array([5, 0, 0, 0, 0]) + rng.randn(T, 5) * 0.3
    t = metrics.TICA(dim=1, lagtime=10).fit(X)
    proj = t.transform(X)[:, 0]
    # projection should separate the two states
    a = proj[state > 0.5].mean()
    b = proj[state < 0.5].mean()
    assert abs(a - b) > 3 * proj[state > 0.5].std()


# -- tmscore -----------------------------------------------------------------

def test_tm_score_identity():
    ca = _bpti_ca()
    tm, rmsd = tmscore.tm_score(ca, ca)
    assert tm == pytest.approx(1.0, abs=1e-6)
    assert rmsd == pytest.approx(0.0, abs=1e-6)


def test_tm_score_rigid_invariance():
    ca = _bpti_ca()
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    moved = ca @ q.T + np.array([10.0, -5.0, 2.0])
    tm, rmsd = tmscore.tm_score(moved, ca)
    assert tm > 0.999
    assert rmsd < 1e-3


def test_tm_score_perturbation_ordering():
    ca = _bpti_ca()
    rng = np.random.RandomState(1)
    small = ca + rng.randn(*ca.shape) * 0.5
    large = ca + rng.randn(*ca.shape) * 5.0
    tm_s, _ = tmscore.tm_score(small, ca)
    tm_l, _ = tmscore.tm_score(large, ca)
    assert tm_s > tm_l
    assert tm_s > 0.8
    assert tm_l < 0.6


def test_native_matches_numpy_fallback():
    ca = _bpti_ca()
    rng = np.random.RandomState(2)
    model = ca + rng.randn(*ca.shape) * 1.0
    tm_native, rmsd_native = tmscore.tm_score(model, ca)
    tm_np, rmsd_np = tmscore._tm_score_np(
        np.asarray(model, np.float64), np.asarray(ca, np.float64))
    assert tm_native == pytest.approx(tm_np, abs=5e-3)
    assert rmsd_native == pytest.approx(rmsd_np, abs=1e-4)


def test_tm_ensemble_and_diversity():
    ca = _bpti_ca()
    ens = _fake_ensemble(ca, 6, 1.0)
    best_tm, best_rmsd = tmscore.tm_ensemble(ens, ca)
    assert 0 < best_tm <= 1.0
    div = tmscore.tm_diversity(ens)
    assert 0 <= div < 1.0


# -- validity calibration on ground truth (VERDICT r3 #3) ---------------------

TARGETS_ROOT = str(targets_root())


def _gt_ca(path):
    prot = protein.from_pdb_file(path)
    if isinstance(prot, list):
        prot = prot[0]
    ca = prot.ca_coords()
    return ca[np.isfinite(ca).all(-1)]


def test_validity_calibrated_on_ground_truth():
    """Real benchmark structures must score ~1.0 under the reference
    thresholds (eval_utils.py:132-188).  Measured over all 282 shipped
    targets: 215/282 score 1.0 under the reference DEFAULT (k_exclusion=0),
    and 64 of the 67 failures are purely cis-peptide bonds — ADJACENT
    CA-CA pairs at 2.8-3.0 A that the default counts as clashes; excluding
    bonded neighbors (k_exclusion=1) brings ground truth to 279/282.  This
    pins both readings so campaign validity numbers are interpretable."""
    import glob

    sample = (sorted(glob.glob(f"{TARGETS_ROOT}/apo/*.pdb"))[:6]
              + sorted(glob.glob(f"{TARGETS_ROOT}/codnas/*.pdb"))[:6]
              + sorted(glob.glob(f"{TARGETS_ROOT}/ped/*.pdb"))[:6]
              + [f"{TARGETS_ROOT}/bpti/bpti.pdb"])
    v_default, v_bonded_excl, bond_self = [], [], []
    for path in sample:
        ca = _gt_ca(path)
        if len(ca) < 4:
            continue
        ens = {"g": ca[None]}
        v_default.append(metrics.validity(ens)["g"])
        v_bonded_excl.append(metrics.validity(ens, k_exclusion=1)["g"])
        bond_self.append(
            metrics.bonding_validity({"target": ca[None], "pred": ca[None]})
            ["pred"])
    # bonded-neighbor-excluded clash validity: every real structure clean
    assert all(v == 1.0 for v in v_bonded_excl), v_bonded_excl
    # reference default: clean except cis-peptide cases (>=80% of sample)
    assert np.mean(v_default) >= 0.8, v_default
    # bond validity of a structure against its own threshold is exactly 1.0
    assert all(b == 1.0 for b in bond_self)


def test_clash_failures_on_ground_truth_are_cis_peptides():
    """1akz.A fails the default clash metric ONLY because of an adjacent
    (bonded) CA pair at 2.91 A — a cis-peptide, physical reality rather
    than a steric clash.  The metric must flag it under the reference
    default and clear it once bonded neighbors are excluded."""
    ca = _gt_ca(f"{TARGETS_ROOT}/apo/1akz.A.pdb")
    assert metrics.validity({"g": ca[None]})["g"] == 0.0
    assert metrics.validity({"g": ca[None]}, k_exclusion=1)["g"] == 1.0
    L = len(ca)
    d = np.linalg.norm(ca[:, None] - ca[None], axis=-1) + np.eye(L) * 99
    ii, jj = np.where(d < 2 * 1.7 - 0.4)
    assert len(ii) > 0 and np.all(np.abs(ii - jj) == 1)
