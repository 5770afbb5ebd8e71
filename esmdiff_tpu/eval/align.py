"""Sequence alignment + NaN-masked coordinate mapping for ensemble analysis.

Replaces the reference's Biopython ``pairwise2.align.globalxx`` usage in the
apo/CoDNaS benchmark (reference analysis/apo_analysis.py:71-79,182-208):
each parsed chain's observed sequence is globally aligned to the target's
reference (SEQRES) sequence and its CA coordinates are scattered into a
reference-length frame with NaN at gaps, so per-residue deviations stay
on-register across internal gaps and numbering offsets.

Scoring mirrors ``globalxx``: match = 1, mismatch = 0, gap = 0 (i.e. the
alignment maximizes the number of matched positions — an LCS).  The DP runs
as numpy row sweeps (prefix-max trick for the zero-gap-penalty recurrence),
so a 1000x1000 alignment costs milliseconds, not seconds.
"""

from __future__ import annotations

import numpy as np


def nw_align(a: str, b: str) -> tuple[str, str]:
    """Global alignment of ``a`` vs ``b`` with globalxx scoring.

    Returns the two gapped strings (same length, '-' = gap).  Tie-breaking
    prefers diagonal (match/mismatch) moves, then consuming ``a``.
    """
    la, lb = len(a), len(b)
    if la == 0:
        return "-" * lb, b
    if lb == 0:
        return a, "-" * la
    aa = np.frombuffer(a.encode("latin1"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("latin1"), dtype=np.uint8)
    match = (aa[:, None] == bb[None, :]).astype(np.int32)

    H = np.zeros((la + 1, lb + 1), dtype=np.int32)
    for i in range(1, la + 1):
        # H[i, j] = max(H[i-1, j-1] + m, H[i-1, j], H[i, j-1]); with zero gap
        # penalties the j-recurrence collapses to a prefix maximum
        tmp = np.maximum(H[i - 1, :-1] + match[i - 1], H[i - 1, 1:])
        H[i, 1:] = np.maximum.accumulate(tmp)

    # traceback (prefer diag > up > left)
    out_a, out_b = [], []
    i, j = la, lb
    while i > 0 and j > 0:
        if H[i, j] == H[i - 1, j - 1] + match[i - 1, j - 1]:
            out_a.append(a[i - 1])
            out_b.append(b[j - 1])
            i -= 1
            j -= 1
        elif H[i, j] == H[i - 1, j]:
            out_a.append(a[i - 1])
            out_b.append("-")
            i -= 1
        else:
            out_a.append("-")
            out_b.append(b[j - 1])
            j -= 1
    while i > 0:
        out_a.append(a[i - 1])
        out_b.append("-")
        i -= 1
    while j > 0:
        out_a.append("-")
        out_b.append(b[j - 1])
        j -= 1
    return "".join(reversed(out_a)), "".join(reversed(out_b))


def map_to_reference(ref_seq: str, obs_seq: str,
                     coords: np.ndarray) -> np.ndarray:
    """Scatter per-residue ``coords`` (len(obs_seq), ...) into a
    reference-frame array (len(ref_seq), ...) via global alignment; positions
    with no observed counterpart are NaN (reference get_structures i/j walk,
    apo_analysis.py:182-199)."""
    coords = np.asarray(coords, dtype=np.float64)
    assert coords.shape[0] == len(obs_seq), (coords.shape, len(obs_seq))
    out = np.full((len(ref_seq),) + coords.shape[1:], np.nan)
    if obs_seq == ref_seq:
        out[:] = coords
        return out
    ga, gb = nw_align(ref_seq, obs_seq)
    i = j = 0
    for c, d in zip(ga, gb):
        if c != "-" and d != "-":
            out[i] = coords[j]
        if c != "-":
            i += 1
        if d != "-":
            j += 1
    return out


def kabsch_rotation(P: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """Rotation R minimizing ||P @ R.T - Q|| for centered point sets."""
    H = P.T @ Q
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    return Vt.T @ D @ U.T


def nan_pair_deviation(s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """Per-residue deviation of two NaN-masked reference-frame CA sets after
    rigid (Kabsch) alignment on the mutual finite mask (reference
    get_structures tail, apo_analysis.py:201-208).  NaN where either side is
    unresolved.

    Unlike the reference — which centers each set on its OWN nanmean, leaving
    a constant translation offset whenever the two resolved masks differ —
    the translation here is fit on the mutual mask, so identical structures
    with different unresolved stretches measure exactly zero deviation.
    """
    s1 = np.asarray(s1, np.float64)
    s2 = np.asarray(s2, np.float64)
    m = np.isfinite(s1).all(-1) & np.isfinite(s2).all(-1)
    if m.sum() >= 3:
        c1 = s1[m].mean(axis=0)
        c2 = s2[m].mean(axis=0)
        s1 = s1 - c1
        s2 = s2 - c2
        R = kabsch_rotation(s2[m], s1[m])
        s2 = s2 @ R.T
    return np.sqrt(np.sum((s1 - s2) ** 2, axis=-1))
