"""TM-score: native C++ implementation with ctypes bindings.

Replaces the reference's subprocess wrapper around the external ``TMscore``
binary (slm/utils/tm_utils.py:9-59) with an in-repo C++ library
(native/tmscore/tmscore.cpp) — no per-pair process spawn, batched entry point,
auto-built on first use.  A pure-numpy fallback implements the same algorithm
when no C++ toolchain is available.

Also provides the ensemble metrics built on it
(tm_utils.py:88-154): best-of-ensemble TM/RMSD and pairwise TM-diversity.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "tmscore"
_LIB_PATH = _NATIVE_DIR / "build" / "libtmscore.so"
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tm_score.restype = ctypes.c_double
        lib.tm_score.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        lib.tm_score_batch.restype = None
        lib.tm_score_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def _d0(n: int) -> float:
    return max(1.24 * (n - 15.0) ** (1.0 / 3.0) - 1.8, 0.5) if n > 21 else 0.5


def _kabsch_np(a, b):
    ca, cb = a.mean(0), b.mean(0)
    H = (a - ca).T @ (b - cb)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    return R, cb - R @ ca


def _tm_score_np(xa, xb):
    """Pure-numpy fallback mirroring native/tmscore/tmscore.cpp."""
    n = len(xa)
    d0 = _d0(n)
    d0_search = min(max(d0, 4.5), 8.0)
    R, t = _kabsch_np(xa, xb)
    rmsd = float(np.sqrt(np.mean(np.sum((xa @ R.T + t - xb) ** 2, -1))))
    best = 0.0
    frag = n
    while frag >= 4:
        step = max(frag // 2, 1)
        for start in range(0, n - frag + 1, step):
            idx = np.arange(start, start + frag)
            for it in range(20):
                if len(idx) < 3:
                    break
                R, t = _kabsch_np(xa[idx], xb[idx])
                d = np.sqrt(np.sum((xa @ R.T + t - xb) ** 2, -1))
                s = float(np.mean(1.0 / (1.0 + (d / d0) ** 2)))
                best = max(best, s)
                cut = max(d0_search - it * 0.5, 3.0)
                nxt = np.nonzero(d < cut)[0]
                if len(nxt) < 3 or (len(nxt) == len(idx)
                                    and (nxt == idx).all()):
                    break
                idx = nxt
        frag //= 2
    return best, rmsd


def tm_score(model_ca: np.ndarray, native_ca: np.ndarray):
    """TM-score + RMSD of residue-aligned CA sets (L, 3).  Normalized by L
    (same-length contract as the reference usage)."""
    assert model_ca.shape == native_ca.shape, (
        model_ca.shape, native_ca.shape)
    xa = np.ascontiguousarray(model_ca, dtype=np.float64)
    xb = np.ascontiguousarray(native_ca, dtype=np.float64)
    lib = _load_library()
    if lib is None:
        return _tm_score_np(xa, xb)
    rmsd = ctypes.c_double()
    tm = lib.tm_score(
        xa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(xa), ctypes.byref(rmsd),
    )
    return float(tm), float(rmsd.value)


def tm_score_many(models_ca: np.ndarray, native_ca: np.ndarray):
    """(M, L, 3) vs (L, 3) -> (tm (M,), rmsd (M,)) in one native call."""
    M, L, _ = models_ca.shape
    xa = np.ascontiguousarray(models_ca, dtype=np.float64)
    xb = np.ascontiguousarray(
        np.broadcast_to(native_ca, models_ca.shape), dtype=np.float64)
    lib = _load_library()
    if lib is None:
        out = [_tm_score_np(xa[i], xb[i]) for i in range(M)]
        return (np.array([o[0] for o in out]), np.array([o[1] for o in out]))
    tm = np.empty(M, dtype=np.float64)
    rmsd = np.empty(M, dtype=np.float64)
    lib.tm_score_batch(
        xa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        M, L,
        tm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rmsd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return tm, rmsd


def tm_ensemble(ensemble_ca: np.ndarray, target_ca: np.ndarray):
    """Best TM / best (lowest) RMSD of an ensemble vs a target
    (reference tm_n_ensemble, tm_utils.py:88)."""
    tm, rmsd = tm_score_many(ensemble_ca, target_ca)
    return float(tm.max()), float(rmsd.min())


def tm_diversity(ensemble_ca: np.ndarray, max_pairs: int = 1000, seed: int = 0):
    """Mean pairwise (1 - TM) across ensemble members
    (reference tm_diversity, tm_utils.py:137)."""
    M = len(ensemble_ca)
    pairs = [(i, j) for i in range(M) for j in range(i + 1, M)]
    if len(pairs) > max_pairs:
        rng = np.random.RandomState(seed)
        sel = rng.choice(len(pairs), max_pairs, replace=False)
        pairs = [pairs[i] for i in sel]
    if not pairs:
        return 0.0
    a = np.stack([ensemble_ca[i] for i, _ in pairs])
    b = np.stack([ensemble_ca[j] for _, j in pairs])
    lib = _load_library()
    if lib is None:
        tms = np.array([_tm_score_np(a[k], b[k])[0] for k in range(len(a))])
    else:
        M2, L, _ = a.shape
        tms = np.empty(M2)
        rmsd = np.empty(M2)
        lib.tm_score_batch(
            np.ascontiguousarray(a, np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(b, np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            M2, L,
            tms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            rmsd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
    return float(1.0 - tms.mean())
