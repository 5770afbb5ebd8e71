"""External-oracle parity for the rigid-alignment stack: eval/geo.py vs
scipy.spatial.transform.Rotation.align_vectors (an independent Kabsch/Wahba
solver shipped in this environment — same spirit as the HF torch oracles in
test_convert_hf_oracle.py)."""

import numpy as np
from scipy.spatial.transform import Rotation

from esmdiff_tpu.eval import geo


def _random_pair(rng, n=40, reflected=False):
    P = rng.randn(n, 3)
    R = Rotation.random(random_state=rng).as_matrix()
    if reflected:
        # make the optimal det(+1) solution nontrivial: Q is a noisy
        # reflection of P, so naive SVD without the sign fix would return
        # an improper rotation
        P_ref = P @ np.diag([1.0, 1.0, -1.0])
        Q = P_ref @ R.T + rng.randn(3) + rng.randn(n, 3) * 0.3
    else:
        Q = P @ R.T + rng.randn(3) + rng.randn(n, 3) * 0.05
    return P, Q


def test_kabsch_matches_scipy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        P, Q = _random_pair(rng)
        R, t = geo.kabsch(P, Q)
        R = np.asarray(R)
        # scipy solves min ||R P - Q|| over proper rotations (centered)
        R_sp, _ = Rotation.align_vectors(Q - Q.mean(0), P - P.mean(0))
        np.testing.assert_allclose(R, R_sp.as_matrix(), atol=1e-5)
        assert np.linalg.det(R) > 0.99  # proper rotation
        np.testing.assert_allclose(
            np.asarray(geo.align(P, Q)), P @ R.T + np.asarray(t), atol=1e-5)


def test_kabsch_rejects_reflection_like_scipy():
    """Near-reflected pairs: both solvers must pick the best PROPER
    rotation (det +1) and agree on the residual."""
    rng = np.random.RandomState(1)
    for trial in range(5):
        P, Q = _random_pair(rng, reflected=True)
        R, _ = geo.kabsch(P, Q)
        R = np.asarray(R)
        assert np.linalg.det(R) > 0.99
        R_sp, _ = Rotation.align_vectors(Q - Q.mean(0), P - P.mean(0))
        ours = float(np.asarray(geo.rmsd(P, Q)))
        Pc, Qc = P - P.mean(0), Q - Q.mean(0)
        theirs = float(np.sqrt(
            ((Pc @ R_sp.as_matrix().T - Qc) ** 2).sum(-1).mean()))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_rmsd_matches_scipy_residual():
    rng = np.random.RandomState(2)
    P, Q = _random_pair(rng)
    R_sp, rssd = Rotation.align_vectors(Q - Q.mean(0), P - P.mean(0))
    # scipy's rssd is the root-SUM-of-squares of the aligned residual
    np.testing.assert_allclose(float(np.asarray(geo.rmsd(P, Q))),
                               rssd / np.sqrt(P.shape[0]), rtol=1e-5)
