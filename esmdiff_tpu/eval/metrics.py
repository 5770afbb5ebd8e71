"""Ensemble quality metrics.

Behavioral parity with the reference metric suite
(slm/utils/eval_utils.py:58-316): JS divergence of pairwise-distance / TICA /
radius-of-gyration distributions, steric-clash and bond validity, IDP
MSE/MAE metrics, RMSF, position entropy.  numpy/scipy (CPU analysis code);
TICA is implemented here directly (time-lagged covariance generalized
eigenproblem) instead of depending on deeptime.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import distance as sp_distance
from scipy.special import kl_div as sp_kl_div
from scipy import stats as sp_stats

EPS = 1e-12
PSEUDO_C = 1e-6


# ---------------------------------------------------------------------------
# geometry features
# ---------------------------------------------------------------------------

def adjacent_ca_distance(coords):
    dX = coords[..., :-1, :] - coords[..., 1:, :]
    return np.sqrt(np.sum(dX ** 2, axis=-1))


def distance_matrix_ca(coords):
    dX = coords[..., None, :, :] - coords[..., :, None, :]
    return np.sqrt(np.sum(dX ** 2, axis=-1))


def pairwise_distance_ca(coords, k: int = 1):
    """(..., L, 3) -> (..., D) upper-triangle (offset k) distances."""
    dist = distance_matrix_ca(coords)
    L = dist.shape[-1]
    row, col = np.triu_indices(L, k=k)
    return dist[..., row, col]


def radius_of_gyration(coords, masses=None):
    if masses is None:
        masses = np.ones(coords.shape[-2])
    weights = masses / masses.sum()
    centered = coords - coords.mean(-2, keepdims=True)
    return ((centered ** 2).sum(-1) * weights).sum(-1) ** 0.5


def rmsf(coords):
    """(B, L, 3) -> (L,) root-mean-square fluctuation (reference
    eval_utils.py:50-53 semantics)."""
    return np.sqrt(np.mean(np.var(coords, axis=0), axis=-1))


def position_specific_entropy(tokens):
    """(N, L) int tokens -> (L,) Shannon entropy in bits."""
    tokens = np.asarray(tokens)
    out = np.zeros(tokens.shape[1])
    N = tokens.shape[0]
    for col in range(tokens.shape[1]):
        freqs = np.bincount(tokens[:, col]) / N
        freqs = freqs[freqs > 0]
        out[col] = -np.sum(freqs * np.log2(freqs))
    return out


def correlations(x, y):
    """(Spearman, Pearson) correlation statistics."""
    return (sp_stats.spearmanr(x, y).statistic,
            sp_stats.pearsonr(x, y).statistic)


# ---------------------------------------------------------------------------
# validity
# ---------------------------------------------------------------------------

def steric_clash(coords, ca_vdw_radius=1.7, allowable_overlap=0.4,
                 k_exclusion=0):
    """Per-frame clash counts (reference _steric_clash, eval_utils.py:132)."""
    assert np.isnan(coords).sum() == 0, "coords should not contain nan"
    bar = 2 * ca_vdw_radius - allowable_overlap
    pwd = pairwise_distance_ca(coords, k=k_exclusion + 1)
    return np.sum(pwd < bar, axis=-1).astype(int)


def validity(ca_coords_dict, **clash_kwargs):
    """Fraction of clash-free conformations per ensemble."""
    return {
        k: np.around(1.0 - (steric_clash(v, **clash_kwargs) > 0).mean(), 4)
        for k, v in ca_coords_dict.items()
    }


def bonding_validity(ca_coords_dict, ref_key="target"):
    """Fraction of frames with no dissociated CA-CA bond, threshold set by the
    reference ensemble's max adjacent distance (eval_utils.py:176)."""
    adj = {k: adjacent_ca_distance(v) for k, v in ca_coords_dict.items()}
    thres = adj[ref_key].max() + 1e-6
    return {
        k: np.around((v < thres).all(-1).sum() / len(v), 4)
        for k, v in adj.items()
    }


# ---------------------------------------------------------------------------
# JS-divergence suite
# ---------------------------------------------------------------------------

def _binned(values, lo, hi, n_bins, weights=None):
    """Per-feature histograms with reference-range binning + pseudocount."""
    values = np.asarray(values)
    if values.ndim == 1:
        values = values[:, None]
        lo = np.atleast_1d(lo)
        hi = np.atleast_1d(hi)
    D = values.shape[1]
    hi = np.maximum(np.asarray(hi, dtype=float), np.asarray(lo, float) + 1e-6)
    out = np.empty((n_bins, D))
    for d in range(D):
        out[:, d] = np.histogram(
            values[:, d], bins=n_bins, weights=weights,
            range=(lo[d], hi[d]))[0]
    return out + PSEUDO_C


def js_divergence_binned(p, q):
    return sp_distance.jensenshannon(p, q, axis=0).mean()


def js_pwd(ca_coords_dict, ref_key="target", n_bins=50, pwd_offset=3,
           weights=None, kl=False):
    """JS of per-channel pairwise-distance histograms
    (reference js_pwd, eval_utils.py:227)."""
    if weights is None:
        weights = {}
    pwd = {k: pairwise_distance_ca(v, k=pwd_offset)
           for k, v in ca_coords_dict.items()}
    lo = pwd[ref_key].min(axis=0)
    hi = pwd[ref_key].max(axis=0)
    binned = {k: _binned(v, lo, hi, n_bins, weights.get(k))
              for k, v in pwd.items()}
    if kl:
        results = {k: float(sp_kl_div(v, binned[ref_key]).mean())
                   for k, v in binned.items() if k != ref_key}
    else:
        results = {k: float(js_divergence_binned(v, binned[ref_key]))
                   for k, v in binned.items() if k != ref_key}
    results[ref_key] = 0.0
    return {k: np.around(v, 4) for k, v in results.items()}


def js_rg(ca_coords_dict, ref_key="target", n_bins=50, weights=None,
          return_rg=False, kl=False):
    if weights is None:
        weights = {}
    rg = {k: radius_of_gyration(v) for k, v in ca_coords_dict.items()}
    lo, hi = rg[ref_key].min(), rg[ref_key].max()
    binned = {k: _binned(v, [lo], [hi], n_bins, weights.get(k))
              for k, v in rg.items()}
    if kl:
        results = {k: float(sp_kl_div(v, binned[ref_key]).mean())
                   for k, v in binned.items() if k != ref_key}
    else:
        results = {k: float(js_divergence_binned(v, binned[ref_key]))
                   for k, v in binned.items() if k != ref_key}
    results[ref_key] = 0.0
    results = {k: np.around(v, 4) for k, v in results.items()}
    return (results, rg) if return_rg else results


# ---------------------------------------------------------------------------
# TICA (in-repo implementation; replaces the deeptime dependency)
# ---------------------------------------------------------------------------

class TICA:
    """Time-lagged independent component analysis.

    Fits on a (T, D) trajectory: solves the generalized eigenproblem
    C_lag v = lambda C_0 v on mean-free, symmetrized lagged covariances and
    keeps the top ``dim`` components.
    """

    def __init__(self, dim: int = 2, lagtime: int = 20, reg: float = 1e-6):
        self.dim = dim
        self.lagtime = lagtime
        self.reg = reg
        self.mean_ = None
        self.components_ = None

    def fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if len(X) < 3:
            # degenerate reference (e.g. a single structure): identity
            # projection onto the first dims so downstream code stays finite
            self.mean_ = X.mean(axis=0)
            self.components_ = np.eye(X.shape[1], self.dim)
            return self
        tau = min(self.lagtime, max(1, len(X) - 2))
        self.mean_ = X.mean(axis=0)
        Xc = X - self.mean_
        x0, xt = Xc[:-tau], Xc[tau:]
        n = len(x0)
        C0 = (x0.T @ x0 + xt.T @ xt) / (2 * n)
        Ct = (x0.T @ xt + xt.T @ x0) / (2 * n)  # symmetrized (reversible)
        C0 += self.reg * np.eye(C0.shape[0])
        # whiten then ordinary symmetric eigenproblem
        w, V = np.linalg.eigh(C0)
        keep = w > 1e-10
        Wm12 = V[:, keep] / np.sqrt(w[keep])
        M = Wm12.T @ Ct @ Wm12
        ev, U = np.linalg.eigh(M)
        order = np.argsort(ev)[::-1][:self.dim]
        self.components_ = Wm12 @ U[:, order]
        return self

    def transform(self, X):
        return (np.asarray(X, dtype=np.float64) - self.mean_) @ self.components_


def js_tica(ca_coords_dict, ref_key="target", n_bins=50, lagtime=20,
            return_tic=True, weights=None):
    """PwD -> 2D TICA projection (fit on reference) -> per-dim JS
    (reference js_tica, eval_utils.py:258)."""
    if weights is None:
        weights = {}
    pwd = {k: pairwise_distance_ca(v) for k, v in ca_coords_dict.items()}
    tica = TICA(dim=2, lagtime=lagtime).fit(pwd[ref_key])
    dr = {k: tica.transform(v) for k, v in pwd.items()}
    lo = dr[ref_key].min(axis=0)
    hi = dr[ref_key].max(axis=0)
    binned = {k: _binned(v, lo, hi, n_bins, weights.get(k))
              for k, v in dr.items()}
    results = {k: float(js_divergence_binned(v, binned[ref_key]))
               for k, v in binned.items() if k != ref_key}
    results[ref_key] = 0.0
    results = {k: np.around(v, 4) for k, v in results.items()}
    return (results, dr) if return_tic else results


# ---------------------------------------------------------------------------
# IDP (PED) metrics
# ---------------------------------------------------------------------------

def idp_metrics(ca_coords_dict, ref_key="target", pwd_offset=3):
    """MSE/MAE of mean PwD, Rg, and log contact probability
    (reference idp_metrics, eval_utils.py:191)."""
    pseudo_c = 0.01
    ref_pwd = pairwise_distance_ca(ca_coords_dict[ref_key], k=pwd_offset)
    ref_pwd_mean = ref_pwd.mean(axis=0)
    ref_rg_mean = radius_of_gyration(ca_coords_dict[ref_key]).mean(axis=0)
    ref_contacts = np.log((ref_pwd < 8.0).mean(axis=0) + pseudo_c)

    mse_pwd, mae_pwd = {}, {}
    mse_rg, mae_rg = {}, {}
    mse_contact, mae_contact = {}, {}
    for name, coords in ca_coords_dict.items():
        pwd = pairwise_distance_ca(coords, k=pwd_offset)
        rg_mean = radius_of_gyration(coords).mean(axis=0)
        contacts = np.log((pwd < 8.0).mean(axis=0) + pseudo_c)
        mse_pwd[name] = np.mean((pwd.mean(axis=0) - ref_pwd_mean) ** 2)
        mse_rg[name] = np.mean((rg_mean - ref_rg_mean) ** 2)
        mse_contact[name] = np.mean((contacts - ref_contacts) ** 2)
        mae_pwd[name] = np.mean(np.abs(pwd.mean(axis=0) - ref_pwd_mean))
        mae_rg[name] = np.mean(np.abs(rg_mean - ref_rg_mean))
        mae_contact[name] = np.mean(np.abs(contacts - ref_contacts))
    return mse_pwd, mse_rg, mse_contact, mae_pwd, mae_rg, mae_contact
