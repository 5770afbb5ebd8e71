"""Crash-resistance fuzz of the PDB parser (native C++ path + Python
fallback).  A malformed upload must never take down a serving process — the
parser may return fewer residues or raise a Python exception, but both
backends must survive arbitrary corruption of ATOM records and agree with
each other on whatever they accept."""

import random

import numpy as np
import pytest

from esmdiff_tpu.core import protein as protein_io

from esmdiff_tpu.utils.fixtures import bpti_pdb
BPTI = str(bpti_pdb())


def _mutate(text: str, rng: random.Random) -> str:
    lines = text.splitlines()
    op = rng.randrange(6)
    if not lines:
        return text
    i = rng.randrange(len(lines))
    if op == 0:      # truncate a line mid-field
        lines[i] = lines[i][: rng.randrange(len(lines[i]) + 1)]
    elif op == 1:    # corrupt coordinate floats
        lines[i] = lines[i][:30] + "x" * min(24, max(0, len(lines[i]) - 30)) \
            + lines[i][54:]
    elif op == 2:    # random bytes line
        lines[i] = "".join(chr(rng.randrange(32, 127))
                           for _ in range(rng.randrange(90)))
    elif op == 3:    # duplicate a line
        lines.insert(i, lines[i])
    elif op == 4:    # giant residue number
        if lines[i].startswith("ATOM"):
            lines[i] = lines[i][:22] + "99999" + lines[i][27:]
    else:            # splice files together mid-record
        lines = lines[i:] + lines[:i]
    return "\n".join(lines)


def _parse(text: str):
    """Parse, tolerating rejection (exception) but not a crash."""
    try:
        prots = protein_io.from_pdb_string(text)
    except Exception:
        return None
    return prots if isinstance(prots, list) else [prots]


def test_fuzzed_pdb_never_crashes_and_backends_agree(monkeypatch):
    base = open(BPTI).read()
    rng = random.Random(0)
    native_available = protein_io._load_pdbio() is not None
    n_ok = 0
    for trial in range(60):
        text = base
        for _ in range(rng.randrange(1, 4)):
            text = _mutate(text, rng)
        prots_default = _parse(text)          # native when buildable
        # force the pure-Python path and compare
        monkeypatch.setattr(protein_io, "_load_pdbio", lambda: None)
        prots_py = _parse(text)
        monkeypatch.undo()
        # Accept/reject must agree, not just values on mutually accepted
        # files: the native path defers to Python on any line whose Python
        # semantics it can't reproduce, so a file rejected (exception) by one
        # backend must be rejected by the other.
        assert (prots_default is None) == (prots_py is None), trial
        if prots_default is not None and prots_py is not None:
            assert len(prots_default) == len(prots_py), trial
            for a, b in zip(prots_default, prots_py):
                assert a.atom_positions.shape == b.atom_positions.shape, trial
                np.testing.assert_allclose(a.atom_positions, b.atom_positions,
                                           atol=1e-4, err_msg=f"trial {trial}")
                np.testing.assert_array_equal(a.aatype, b.aatype)
            n_ok += 1
    # most single-line corruptions leave a parseable file
    assert n_ok >= 30, f"only {n_ok}/60 fuzzed files parsed"
    if not native_available:
        pytest.skip("native pdbio not built — Python path fuzzed only")


def test_corrupt_coordinate_rejected_by_both_backends(monkeypatch):
    """ADVICE round 2: a corrupt x/y/z field must not be silently recorded as
    0.0 by the native parser while the Python parser raises."""
    base = open(BPTI).read()
    lines = base.splitlines()
    idx = next(i for i, l in enumerate(lines) if l.startswith("ATOM"))
    lines[idx] = lines[idx][:30] + "xxxxxxxx" + lines[idx][38:]
    text = "\n".join(lines)
    assert _parse(text) is None  # native (or fallback) rejects
    monkeypatch.setattr(protein_io, "_load_pdbio", lambda: None)
    assert _parse(text) is None  # pure Python raises too


def test_pathological_inputs_do_not_crash():
    for text in ("", "ATOM", "ATOM  \x00\x00\x00", "MODEL\nENDMDL\n",
                 "ATOM      1  CA  ALA A   1    " + "9" * 200,
                 "ATOM      1  CA  ALA A nan      a  b  c\n" * 50,
                 open(BPTI).read()[:137]):
        _parse(text)  # must return or raise, never abort the process