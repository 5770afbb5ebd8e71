"""Pallas flash-attention for TPU (placeholder: XLA fallback).

The real tiled kernel lands in this module; until then ``flash_attention``
delegates to the einsum path so the dispatch surface is stable.
"""

from __future__ import annotations


def flash_attention(q, k, v, mask=None):
    from esmdiff_tpu.nn.attention import _xla_attention

    return _xla_attention(q, k, v, mask=mask)
