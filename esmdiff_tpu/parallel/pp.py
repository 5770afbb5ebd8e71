"""Pipeline parallelism: GPipe-style stage sharding of the scanned block stack.

The reference has no pipeline parallelism (its only strategies are DDP and
ZeRO-2, SURVEY.md §2b); this is the TPU-idiomatic completion of the
parallelism matrix for chips whose HBM cannot hold the full 1.4B trunk even
with FSDP's per-layer all-gathers.  Design:

  - the trunk's 47 scanned blocks already live as ONE stacked param pytree
    (leaves shaped (n_rest, ...), models/esm3.py nn.scan) — pipeline sharding
    is simply ``PartitionSpec('stage')`` on that leading axis: each device
    materializes only ``n_rest / S`` layers, with NO per-layer weight
    collectives at all (unlike FSDP);
  - inside ``jax.shard_map`` each stage runs a local ``lax.scan`` over its
    layer slice; activations hand off to the next stage via
    ``jax.lax.ppermute`` (neighbor exchange over ICI);
  - the batch is split into M microbatches; the classic GPipe schedule runs
    S + M - 1 ticks, so bubble fraction = (S-1)/(S+M-1);
  - layer counts that don't divide the stage count (the real trunk's scanned
    stack is 47 layers — prime) are padded with inert zero layers skipped by
    a validity mask, so any stage count works;
  - reverse-mode AD differentiates straight through (ppermute transposes to
    the inverse permutation), giving the backward pipeline for free — one
    optimizer step under ``jax.jit`` trains with stage-sharded weights
    (pinned by tests/test_pp.py grad-parity and the driver dryrun).

Forward parity with the unpipelined stack is exact up to fp reassociation
(tests/test_pp.py).
"""

from __future__ import annotations

import re
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"
DATA_AXIS = "data"


def pipeline_stack(block_fn: Callable, stacked_params, x, *,
                   mesh: Mesh, n_microbatches: int,
                   bcast: Sequence = (), per_example: Sequence = (),
                   n_valid: int | None = None,
                   axis_name: str = STAGE_AXIS,
                   data_axis: str | None = None):
    """Apply ``n_total`` stacked layers to ``x`` with the layer axis sharded
    over ``axis_name`` (GPipe schedule).

    block_fn(params_one_layer, h, *bcast, *per_example_mb) -> h: one block,
        given the layer's param subtree (a pytree with UNstacked leaves).
    stacked_params: pytree, leaves (n_total, ...); n_total must divide by the
        stage-axis size.  Shard with ``stage_shardings`` before calling (a
        replicated input works too — shard_map slices it).
    x: (B, ...) activations, replicated; B must divide by n_microbatches.
    bcast: batch-independent arrays every stage needs whole (rotary tables,
        masks).  per_example: (B, ...) arrays sliced per microbatch and routed
        to whichever stage is processing that microbatch (e.g. ``lengths``).
    Both are explicit arguments because shard_map must see every traced value
    in its in_specs.
    n_valid: number of real layers when ``stacked_params`` was pre-padded
        with :func:`pad_stack` (so stage-sharded storage divides evenly);
        defaults to the full row count.
    data_axis: optional second mesh axis for pp x dp composition — the batch
        (and per_example arrays) shard over it while layers shard over
        ``axis_name``; each data-slice runs its own GPipe schedule, and the
        caller's gradient psum over ``data_axis`` (emitted by XLA from the
        loss sharding) completes DP as usual.

    Returns (B, ...) outputs, replicated across stages (sharded over
    ``data_axis`` when given).
    """
    S = mesh.shape[axis_name]
    B = x.shape[0]
    if data_axis is not None:
        n_data = mesh.shape[data_axis]
        if B % (n_microbatches * n_data) != 0:
            raise ValueError(
                f"batch {B} not divisible by M={n_microbatches} x "
                f"{data_axis}={n_data}")
        B = B // n_data  # local batch per data-slice inside shard_map
    n_rows = jax.tree.leaves(stacked_params)[0].shape[0]
    n_total = n_rows if n_valid is None else n_valid
    if not 0 < n_total <= n_rows:
        raise ValueError(f"n_valid={n_total} out of range for {n_rows} rows")
    if B % n_microbatches != 0:
        raise ValueError(f"batch {B} not divisible by M={n_microbatches}")
    # The real trunk has 47 scanned layers (prime): pad the stack to a
    # multiple of S with inert zero layers and skip them with a validity
    # mask, so any stage count works.  Padded layers still execute (bubble
    # work) but their output is discarded; zero params are numerically safe
    # through LN/attention/FFN (uniform softmax, zero deltas).  Callers that
    # want the stack STORED stage-sharded pad up front with ``pad_stack``
    # (device_put cannot shard a 47-row axis 8 ways); replicated inputs are
    # padded here on the fly.
    stacked_params, _ = pad_stack(stacked_params, S)
    n_loc = jax.tree.leaves(stacked_params)[0].shape[0] // S
    M = n_microbatches
    mb = B // M
    bcast = tuple(bcast)
    per_example = tuple(per_example)
    n_bc = len(bcast)

    def local_fn(params_loc, x_full, *rest):
        bc, pe = rest[:n_bc], rest[n_bc:]
        s = jax.lax.axis_index(axis_name)
        xs = x_full.reshape(M, mb, *x_full.shape[1:])
        pes = tuple(p.reshape(M, mb, *p.shape[1:]) for p in pe)
        perm = [(j, (j + 1) % S) for j in range(S)]
        layer_idx = s * n_loc + jnp.arange(n_loc, dtype=jnp.int32)

        def run_local(h, pe_mb):
            def body(h, pi):
                p, i = pi
                h2 = block_fn(p, h, *bc, *pe_mb)
                return jnp.where(i < n_total, h2, h), None
            h, _ = jax.lax.scan(body, h, (params_loc, layer_idx))
            return h

        def tick(carry, t):
            state, outs = carry
            # stage s is processing microbatch t - s at this tick
            my_mb = jnp.clip(t - s, 0, M - 1)
            x_in = jax.lax.dynamic_index_in_dim(xs, jnp.clip(t, 0, M - 1),
                                                0, keepdims=False)
            pe_mb = tuple(
                jax.lax.dynamic_index_in_dim(p, my_mb, 0, keepdims=False)
                for p in pes)
            h = jnp.where(s == 0, x_in, state)
            h = run_local(h, pe_mb)
            # the last stage has just finished microbatch t - (S-1)
            out_idx = t - (S - 1)
            valid = (out_idx >= 0) & (s == S - 1)
            idx = jnp.clip(out_idx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, h, cur), idx, 0)
            state = jax.lax.ppermute(h, axis_name, perm)
            return (state, outs), None

        carry = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (state, outs), _ = jax.lax.scan(
            tick, carry, jnp.arange(S + M - 1, dtype=jnp.int32))
        # replicate the last stage's buffer to every stage
        outs = jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), axis_name)
        return outs.reshape(x_full.shape)

    batch_spec = P() if data_axis is None else P(data_axis)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis_name), stacked_params),
                  batch_spec)
                 + tuple(P() for _ in bcast)
                 + tuple(batch_spec for _ in per_example),
        out_specs=batch_spec,
        check_vma=False,
    )
    return fn(stacked_params, x, *bcast, *per_example)


def pad_stack(stacked_params, n_stages: int):
    """Pad a stacked-layer pytree to a multiple of ``n_stages`` rows with
    zero (inert) layers, so the stack can be STORED stage-sharded even for
    indivisible layer counts (the real trunk's 47 scanned blocks over 8
    stages: ``jax.device_put`` refuses to shard a 47-row axis 8 ways).
    Returns (padded_params, n_valid); pass ``n_valid`` through to
    :func:`pipeline_stack` / :func:`esm3_pp_forward` so the pad layers are
    skipped."""
    n_rows = jax.tree.leaves(stacked_params)[0].shape[0]
    n_pad = (-n_rows) % n_stages
    if n_pad:
        stacked_params = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((n_pad, *a.shape[1:]), a.dtype)]),
            stacked_params)
    return stacked_params, n_rows


def stage_shardings(params, mesh: Mesh, axis_name: str = STAGE_AXIS):
    """NamedShardings placing the stacked-layer axis on the stage axis.
    The leading axis must divide the stage count — use :func:`pad_stack`
    first when it doesn't (e.g. the 47-block full trunk)."""
    spec = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda _: spec, params)


# ---------------------------------------------------------------------------
# production strategy surface (trainer.strategy=ppS | dpNxppS), mirroring
# parallel/tp.py's dpNxtpM wiring through train/state.py + train/loop.py
# ---------------------------------------------------------------------------

def parse_pp_strategy(strategy: str):
    """'dp{N}xpp{S}' or 'pp{S}' -> (n_data, n_stage); None otherwise."""
    m = re.fullmatch(r"dp(\d+)xpp(\d+)", strategy)
    if m:
        return int(m.group(1)), int(m.group(2))
    m = re.fullmatch(r"pp(\d+)", strategy)
    if m:
        return 1, int(m.group(1))
    return None


def make_pp_mesh(n_data: int, n_stage: int, devices=None) -> Mesh:
    """2-D (data, stage) mesh: each data slice runs its own GPipe schedule
    over its stage column; gradients all-reduce over ``data`` as usual."""
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_stage
    if len(devices) < need:
        raise ValueError(f"strategy needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_stage)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def _names(path) -> tuple[str, ...]:
    out = []
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if name is not None:
            out.append(str(name))
    return tuple(out)


def _is_blocks_leaf(path) -> bool:
    names = _names(path)
    return "blocks" in names and "transformer" in names


def pad_tree_blocks(tree, n_stages: int):
    """Pad every stacked-layer (transformer/blocks) leaf in ``tree`` to a
    row count divisible by ``n_stages`` with zero (inert) layers, so the
    stack can be STORED stage-sharded.  Works on params, optimizer moments,
    or a whole TrainState (optax moments mirror the param paths).  Returns
    (padded_tree, n_valid_rows).  Pad rows stay exactly zero under AdamW:
    their grads are zero (the validity mask discards their output) and
    weight decay of a zero row is zero."""
    n_valid = [None]

    def rule(path, leaf):
        if not _is_blocks_leaf(path):
            return leaf
        n_rows = leaf.shape[0]
        n_valid[0] = n_rows if n_valid[0] is None else n_valid[0]
        n_pad = (-n_rows) % n_stages
        if n_pad == 0:
            return leaf
        zeros = jnp.zeros((n_pad, *leaf.shape[1:]), leaf.dtype)
        return jnp.concatenate([jnp.asarray(leaf), zeros])

    out = jax.tree_util.tree_map_with_path(rule, tree)
    return out, n_valid[0]


def unpad_tree_blocks(tree, n_valid: int):
    """Inverse of :func:`pad_tree_blocks`: slice every blocks leaf back to
    ``n_valid`` rows, so pp-trained checkpoints keep the strategy-portable
    (ddp/zero2/sampling) layout on disk."""

    def rule(path, leaf):
        if _is_blocks_leaf(path) and leaf.shape[0] != n_valid:
            return leaf[:n_valid]
        return leaf

    return jax.tree_util.tree_map_with_path(rule, tree)


def pp_shardings_for_tree(tree, mesh: Mesh, zero_data: bool = False):
    """Shardings for ANY pytree containing trunk-shaped subtrees: the
    stacked-layer (transformer/blocks) leaves go on ``stage``; everything
    else is replicated, or ZeRO-2-sharded on ``data`` when ``zero_data``
    (optimizer moments).  The blocks row count must already divide the
    stage count — :func:`pad_tree_blocks` first."""
    from .mesh import zero_sharding_for

    stage = NamedSharding(mesh, P(STAGE_AXIS))
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        if _is_blocks_leaf(path):
            return stage
        if zero_data:
            return zero_sharding_for(leaf, mesh)
        return rep

    return jax.tree_util.tree_map_with_path(rule, tree)


def auto_microbatches(local_batch: int, n_stage: int) -> int:
    """Default GPipe microbatch count: the smallest divisor of the per-data-
    slice batch that is >= the stage count (bubble <= (S-1)/(2S-1)), else the
    largest divisor."""
    divs = [d for d in range(1, local_batch + 1) if local_batch % d == 0]
    for d in divs:
        if d >= n_stage:
            return d
    return divs[-1]


def mdlm_pp_trunk_apply(net, mesh: Mesh, n_microbatches: int,
                        data_axis: str | None = DATA_AXIS):
    """Trunk-forward override for :class:`diffusion.mdlm.MDLM` (its
    ``trunk_apply`` hook): routes the scanned stack through
    :func:`esm3_pp_forward` so `trainer.strategy=ppS|dpNxppS` trains with
    stage-sharded weights through the ordinary esmdiff-train path."""

    def apply(trunk_params, *, structure_tokens=None, sequence_tokens=None,
              sequence_id=None, lengths=None, positions=None,
              auxiliary_embeddings=None):
        if sequence_id is not None or positions is not None:
            raise ValueError(
                "the pp trunk forward does not take packed inputs "
                "(sequence_id/positions) — train with data.pack_len=0")
        return esm3_pp_forward(
            net, trunk_params, mesh, n_microbatches,
            structure_tokens=structure_tokens,
            sequence_tokens=sequence_tokens, lengths=lengths,
            auxiliary_embeddings=auxiliary_embeddings, data_axis=data_axis)

    return apply


def esm3_pp_forward(net, params, mesh: Mesh, n_microbatches: int, *,
                    structure_tokens=None, sequence_tokens=None,
                    lengths=None, auxiliary_embeddings=None,
                    axis_name: str = STAGE_AXIS,
                    data_axis: str | None = None):
    """ESM3 trunk forward with the scanned stack pipelined over ``mesh``.

    Front end (track defaults, token tying, embedding sum) and back end
    (block 0, final norm, output heads) run replicated via the model's own
    ``embed``/submodule applies; only the 47-block scan is stage-sharded.
    Covers the MDLM regime (no input coordinates -> geometric attention
    statically skipped).  Returns the same ESMOutput as ``net.apply``.
    """
    from esmdiff_tpu.models.esm3 import (  # local import: avoid a cycle
        ESM3,
        TransformerBlock,
        _ScanBlock,
    )
    from esmdiff_tpu.nn.layers import LayerNorm
    from esmdiff_tpu.nn.rotary import rotary_tables

    cfg = net.cfg
    assert cfg.scan_layers, "pp requires the scanned stack"
    x, affine, affine_mask, chain_id, skip_geom = net.apply(
        {"params": params},
        structure_tokens=structure_tokens,
        sequence_tokens=sequence_tokens,
        auxiliary_embeddings=auxiliary_embeddings,
        method=ESM3.embed,
    )
    assert skip_geom, "esm3_pp_forward covers the no-coordinates regime"
    L = x.shape[1]
    rot_cos, rot_sin = rotary_tables(
        L, cfg.d_model // cfg.n_heads, dtype=jnp.float32)
    sequence_id = None
    if lengths is not None:
        sequence_id = (jnp.arange(L)[None, :] < lengths[:, None]).astype(
            jnp.int32)

    tp = params["transformer"]
    geom_block = TransformerBlock(cfg, use_geom_attn=True)
    for i in range(cfg.n_layers_geom):
        x = geom_block.apply({"params": tp[f"block{i}"]}, x, rot_cos,
                             rot_sin, None, lengths, affine, affine_mask,
                             sequence_id, chain_id, skip_geom=True)

    scan_block = _ScanBlock(cfg)

    def block_fn(p, h, rc, rs, ln):
        out, _ = scan_block.apply({"params": p}, h, rc, rs, None, ln)
        return out

    if cfg.remat:
        block_fn = jax.checkpoint(block_fn, prevent_cse=False)
    if lengths is None:
        B = x.shape[0]
        lengths = jnp.full((B,), L, jnp.int32)
    # the stored stack may be pre-padded by pad_stack (stage-sharded storage
    # of an indivisible layer count); the real layer count comes from cfg
    n_valid = cfg.n_layers - cfg.n_layers_geom
    x = pipeline_stack(block_fn, tp["blocks"], x, mesh=mesh,
                       n_microbatches=n_microbatches,
                       bcast=(rot_cos, rot_sin), per_example=(lengths,),
                       n_valid=n_valid, axis_name=axis_name,
                       data_axis=data_axis)

    pre_norm = x
    x = LayerNorm().apply({"params": tp["norm"]}, x)
    return net.apply({"params": params}, x, pre_norm, method=ESM3.heads)
