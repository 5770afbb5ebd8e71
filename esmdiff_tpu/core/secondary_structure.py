"""Dependency-free secondary-structure assignment (Kabsch-Sander H-bonds).

The reference computes DSSP secondary structure via mdtraj during mmCIF
preprocessing (scripts/preprocess.py::compute_dssp_feats, :196) as curation
metadata.  Neither mdtraj nor a dssp binary exists in this environment, so
this module implements the load-bearing core of the DSSP algorithm directly
from backbone atoms (N, CA, C, O — O can be inferred, core/protein.py):

  - amide H placed 1.01 A from N along the bisector of the C(i-1)->N and
    O(i-1)->N directions (the standard DSSP approximation);
  - Kabsch-Sander electrostatic H-bond energy
      E = 0.084 * 332 * (1/d_ON + 1/d_CH - 1/d_OH - 1/d_CN)  [kcal/mol]
    with a bond when E < -0.5;
  - 3-state assignment: H (alpha helix, consecutive i->i+4 turns),
    E (beta bridge/ladder via parallel/antiparallel bridge patterns),
    C otherwise.

This is the simplified H/E/C reduction (DSSP's G/I helices and isolated
turns map to C), which is what the curation metadata consumes.
"""

from __future__ import annotations

import numpy as np

from . import residue_constants as rc

HBOND_ENERGY_CUTOFF = -0.5  # kcal/mol
_Q1Q2_F = 0.084 * 332.0


def _backbone(prot):
    n_i, ca_i, c_i = rc.BACKBONE_ATOM_INDICES
    o_i = rc.OXYGEN_INDEX
    pos = prot.atom_positions
    mask = prot.atom_mask
    get = lambda ai: (pos[:, ai].astype(np.float64), mask[:, ai] > 0.5)
    return get(n_i), get(ca_i), get(c_i), get(o_i)


def _amide_h(n, c, o, n_ok, co_ok):
    """H_i = N_i + 1.01 * unit(unit(N_i - C_{i-1}) + unit(N_i - O_{i-1}))."""
    L = len(n)
    h = np.full((L, 3), np.nan)
    ok = np.zeros(L, bool)
    if L < 2:
        return h, ok
    d1 = n[1:] - c[:-1]
    d2 = n[1:] - o[:-1]
    u1 = d1 / np.maximum(np.linalg.norm(d1, axis=-1, keepdims=True), 1e-8)
    u2 = d2 / np.maximum(np.linalg.norm(d2, axis=-1, keepdims=True), 1e-8)
    b = u1 + u2
    b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    h[1:] = n[1:] + 1.01 * b
    ok[1:] = n_ok[1:] & co_ok[:-1]
    return h, ok


def hbond_matrix(prot) -> np.ndarray:
    """(L, L) bool: donor residue i's NH bonded to acceptor j's CO
    (Kabsch-Sander energy < -0.5; |i-j| > 1; prolines have no NH donor)."""
    (n, n_ok), (ca, ca_ok), (c, c_ok), (o, o_ok) = _backbone(prot)
    L = len(n)
    h, h_ok = _amide_h(n, c, o, n_ok, c_ok & o_ok)

    def dist(a, b):
        return np.maximum(
            np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1), 1e-3)

    # donor i (N-H), acceptor j (C=O)
    d_on = dist(n, o).T  # [j_acceptor, i_donor] -> transpose to [i, j]
    e = _Q1Q2_F * (
        1.0 / dist(n, o)          # N_i .. O_j
        + 1.0 / dist(h, c)        # H_i .. C_j
        - 1.0 / dist(h, o)        # H_i .. O_j
        - 1.0 / dist(n, c)        # N_i .. C_j
    )
    del d_on
    valid = (h_ok[:, None] & (c_ok & o_ok)[None, :])
    idx = np.arange(L)
    near = np.abs(idx[:, None] - idx[None, :]) <= 1
    pro = prot.aatype == rc.restype_order.get("P", -1)
    bond = (e < HBOND_ENERGY_CUTOFF) & valid & ~near & ~pro[:, None]
    return bond


def assign_secondary_structure(prot) -> str:
    """3-state DSSP reduction: 'H' alpha helix, 'E' strand, 'C' coil."""
    hb = hbond_matrix(prot)  # hb[donor, acceptor]
    L = hb.shape[0]

    def turn4(i):  # CO of i accepts from NH of i+4
        return i + 4 < L and hb[i + 4, i]

    ss = np.full(L, "C", dtype="<U1")

    # alpha helix: two consecutive 4-turns at i-1 and i -> residues i..i+3
    for i in range(1, L - 4):
        if turn4(i - 1) and turn4(i):
            ss[i:i + 4] = "H"

    # beta bridges (Kabsch-Sander definitions)
    for i in range(1, L - 1):
        for j in range(i + 3, L - 1):
            parallel = (hb[i, j - 1] and hb[j + 1, i]) or \
                (hb[j, i - 1] and hb[i + 1, j])
            antiparallel = (hb[i, j] and hb[j, i]) or \
                (hb[i + 1, j - 1] and hb[j + 1, i - 1])
            if parallel or antiparallel:
                if ss[i] != "H":
                    ss[i] = "E"
                if ss[j] != "H":
                    ss[j] = "E"
    return "".join(ss)


def ss_fractions(ss: str) -> dict:
    L = max(1, len(ss))
    return {
        "frac_helix": ss.count("H") / L,
        "frac_sheet": ss.count("E") / L,
        "frac_coil": ss.count("C") / L,
    }
