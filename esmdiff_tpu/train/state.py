"""Train state + sharded training step.

Replaces the reference's Lightning/DeepSpeed wiring (slm/models/model.py:218-244,
configs/trainer/deepspeed.yaml): optax AdamW, parameters replicated across the
``data`` mesh axis, optimizer moments sharded along it (ZeRO-2 analogue, see
SURVEY.md §2b).  One jitted step = forward + backward + update; XLA inserts
the gradient all-reduce and the moment reduce-scatter/all-gather from the
sharding annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from esmdiff_tpu.parallel import mesh as pmesh


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01,
                   warmup_steps: int = 0,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with optional warmup-to-constant schedule (reference uses AdamW
    lr 1e-5, configs/model/default.yaml + optional constant-with-warmup)."""
    if warmup_steps > 0:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        sched = lr
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    return optax.chain(*chain)


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def state_shardings(state: TrainState, mesh: Mesh,
                    strategy: str = "zero2") -> TrainState:
    """Sharding pytree for a TrainState (accepts concrete arrays or
    eval_shape structs).

    - ``ddp``:   params + moments replicated (reference configs/trainer/ddp.yaml)
    - ``zero2``: params replicated, moments sharded on ``data``
      (reference deepspeed_stage_2, configs/trainer/deepspeed.yaml:6)
    - ``fsdp``:  params AND moments sharded on ``data`` (ZeRO-3; beyond the
      reference — the memory envelope needed to fine-tune the 1.4B trunk on
      HBM-constrained slices, parallel/fsdp.py)
    """
    if strategy == "ddp":
        return TrainState(
            step=pmesh.replicated(mesh),
            params=pmesh.replicated_shardings(state.params, mesh),
            opt_state=pmesh.replicated_shardings(state.opt_state, mesh),
        )
    if strategy == "zero2":
        return TrainState(
            step=pmesh.replicated(mesh),
            params=pmesh.replicated_shardings(state.params, mesh),
            opt_state=pmesh.zero_shardings(state.opt_state, mesh),
        )
    if strategy == "fsdp":
        from esmdiff_tpu.parallel import fsdp

        return TrainState(
            step=pmesh.replicated(mesh),
            params=fsdp.fsdp_shardings(state.params, mesh),
            opt_state=fsdp.fsdp_shardings(state.opt_state, mesh),
        )
    from esmdiff_tpu.parallel import pp, tp

    if pp.parse_pp_strategy(strategy) is not None:
        # pipeline stages: the scanned block stack (and its optimizer
        # moments) sharded on ``stage``; everything else replicated, with
        # ZeRO-2 moments on ``data`` — the mesh must be the 2-D one from
        # pp.make_pp_mesh and the blocks rows pre-padded (pad_tree_blocks)
        return TrainState(
            step=pmesh.replicated(mesh),
            params=pp.pp_shardings_for_tree(state.params, mesh),
            opt_state=pp.pp_shardings_for_tree(state.opt_state, mesh,
                                               zero_data=True),
        )
    if tp.parse_tp_strategy(strategy) is not None:
        # 2-D (data, model): Megatron-style TP param shardings + ZeRO-2
        # moments on data for the non-TP leaves (the fp32 reference-parity
        # envelope that OOMs on one chip, PERF.md) — the mesh must be the
        # 2-D one from tp.make_2d_mesh (built by train() from the strategy).
        return TrainState(
            step=pmesh.replicated(mesh),
            params=tp.tp_shardings_for_tree(state.params, mesh),
            opt_state=tp.tp_shardings_for_tree(state.opt_state, mesh,
                                               zero_data=True),
        )
    raise ValueError(
        f"unknown strategy: {strategy!r} "
        f"(ddp | zero2 | fsdp | dpNxtpM | ppS | dpNxppS)")


def create_sharded_train_state(params, optimizer, mesh: Mesh,
                               strategy: str = "zero2") -> TrainState:
    """Build the TrainState with every leaf born on its target sharding —
    the optimizer moments for the 1.4B trunk never materialize replicated
    on one chip (they are allocated under jit with out_shardings)."""
    shapes = jax.eval_shape(lambda p: create_train_state(p, optimizer),
                            params)
    shardings = state_shardings(shapes, mesh, strategy=strategy)
    state = jax.jit(
        lambda p: create_train_state(p, optimizer),
        out_shardings=shardings,
    )(params)
    return state


def make_train_step(loss_fn: Callable, optimizer,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True):
    """loss_fn(params, batch, key) -> (loss, metrics dict).

    Returns jitted step(state, batch, key) -> (state, metrics).  When a mesh
    is given, inputs/outputs carry explicit shardings (dp batch, replicated
    params, ZeRO opt state).
    """

    def step(state: TrainState, batch, key):
        (loss, bd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(bd)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def wrapped(state, batch, key):
        return step(state, batch, key)

    return jax.jit(
        wrapped,
        donate_argnums=(0,) if donate else (),
    )


def eval_step_fn(loss_fn: Callable):
    def eval_step(params, batch, key):
        loss, bd = loss_fn(params, batch, key)
        bd = dict(bd)
        bd["loss"] = loss
        return bd
    return jax.jit(eval_step)
