"""Sequence packing for short-chain sampling (TPU MXU utilization).

At protein-scale short lengths (L=64 buckets — e.g. BPTI's canonical
58-residue workload, reference sample_esmdiff.py:34) the attention core
degenerates into thousands of MXU-underfed 64x64 matmuls: the round-3
op-level profile (PERF.md) measured ~17 ms/step (<1% MXU efficiency) of
the 72 ms int8 step in attention + its layout ops.  Packing ``k``
same-bucket rows into one device row of length ``k*L`` with a
block-diagonal segment mask turns those into MXU-shaped matmuls while
leaving every per-token op (LN / FFN / rotary / heads / Gumbel updates)
shape-invariant.

Exactness: each token's attention key set under the segment mask is
identical to the unpacked ``lengths`` prefix mask, and rotary positions
restart per segment (``positions``), so the packed forward computes the
same function (bitwise on CPU; up to fp reduction order on the MXU —
pinned by tests/test_packing.py).  Samplers keep all bookkeeping at
(B, L) and reshape only around the trunk apply, so RNG draws — and
therefore sampled ensembles for a given seed — are unchanged.

The reference has no analogue (its torch path runs ragged per-sample
batches); this is a TPU-native scheduling transform.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Packed row target, chosen by the round-3 v5e sweep through the
# production sampler (scripts/pack_bench.py; PERF.md round-3 packing
# section): packing L=64 rows to 128 tokens wins 1.46x; packing to 256
# still wins over unpacked 64 but loses to 128; and 256-token rows are
# slower per token than native 128 rows (L=128 k=2 measured 145.7 vs
# 129.2 ms/step), so rows at or above 128 stay unpacked.
PACK_TARGET_LEN = 128


def pack_factor(B: int, L: int, target: int = PACK_TARGET_LEN,
                max_pack: int = 16) -> int:
    """Largest power-of-two k dividing B with k*L <= target."""
    k = 1
    while (
        k < max_pack
        and B % (2 * k) == 0
        and 2 * k * L <= target
    ):
        k *= 2
    return k


def plan_segment_rows(seg_lengths, T: int) -> list[list[int]]:
    """First-fit-decreasing packing of variable-length segments into rows.

    seg_lengths: per-segment token lengths (each <= T).  Returns rows as
    lists of segment INDICES; within a row, segments are laid out back to
    back in the returned order.  Used by the cross-length packed sampling
    engine (api/generation.py) to co-batch mixed-length serving requests
    into shared segment-masked device rows — the reference's ragged
    one-batch inference (slm/sample_esmdiff.py:181-193) rebuilt as a
    fixed-shape TPU schedule.

    Deterministic: ties between equal lengths keep ascending index order, so
    the same request mix always produces the same layout.
    """
    order = sorted(range(len(seg_lengths)),
                   key=lambda i: (-int(seg_lengths[i]), i))
    rows: list[list[int]] = []
    room: list[int] = []
    for i in order:
        ln = int(seg_lengths[i])
        if ln > T:
            raise ValueError(f"segment {i} length {ln} exceeds row width {T}")
        for r, free in enumerate(room):
            if free >= ln:
                rows[r].append(i)
                room[r] -= ln
                break
        else:
            rows.append([i])
            room.append(T - ln)
    return rows


def packed_positions(L: int, k: int):
    """(k*L,) int32 rotary positions restarting at each segment."""
    return jnp.asarray(np.tile(np.arange(L), k), jnp.int32)


def packed_segment_ids(lengths, L: int, k: int):
    """(B, L)-batch prefix lengths -> (B//k, k*L) int32 segment ids.

    Valid tokens of packed segment s carry id s; padding carries -1 (a
    shared id, so pads attend only pads — matching the key-side-only
    semantics of the ``lengths`` mask path in nn/attention.py).

    lengths: (B,) int32 or None (None = every position valid).
    """
    pos_in_seg = jnp.asarray(np.tile(np.arange(L), k), jnp.int32)  # (k*L,)
    seg = jnp.asarray(np.repeat(np.arange(k), L), jnp.int32)       # (k*L,)
    if lengths is None:
        return seg[None, :]  # broadcasts over the packed batch
    # jnp coercion: callers may pass host-numpy lengths (kept off-device so
    # jit closures never bake device arrays — see bench.make_bucket_fn),
    # and numpy fancy-indexing cannot take the traced ``seg``
    lengths = jnp.asarray(lengths, jnp.int32)
    B = lengths.shape[0]
    lens_p = lengths.reshape(B // k, k)                  # (B', k)
    valid = pos_in_seg[None, :] < lens_p[:, seg]         # (B', k*L)
    return jnp.where(valid, seg[None, :], -1).astype(jnp.int32)
