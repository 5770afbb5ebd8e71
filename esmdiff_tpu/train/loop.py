"""MDLM fine-tuning loop.

TPU-native replacement for slm/train.py + Lightning (reference call stack
SURVEY.md §3.1): build model from config, shard over the data mesh, jitted
train/eval steps, per-epoch validation, best-val checkpointing (orbax), early
stopping, CSV metric logs, fast-dev-run / overfit / limit debug modes.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
from esmdiff_tpu.diffusion.noise import get_noise
from esmdiff_tpu.models.esm3 import ESM3, ESM3Config, esm3_tiny
from esmdiff_tpu.nn.layers import TimestepEmbedder
from esmdiff_tpu.parallel import mesh as pmesh
from esmdiff_tpu.utils.checkpoint import CheckpointManager
from esmdiff_tpu.utils.logging import MetricLogger

from . import data as data_mod
from . import state as tstate
from .config import TrainConfig


def build_mdlm(cfg: TrainConfig) -> MDLM:
    m = cfg.model
    if m.size == "tiny":
        trunk_cfg = esm3_tiny(
            dtype=m.dtype, param_dtype=m.param_dtype, head_type="structure",
            n_structure_heads=m.n_structure_heads,
            n_sequence_heads=m.n_sequence_heads, remat=m.remat)
    elif m.size == "custom":
        # mid-scale campaign geometry: explicit dims (0 = ESM3 default)
        base = ESM3Config()
        trunk_cfg = ESM3Config(
            d_model=m.d_model or base.d_model,
            n_heads=m.n_heads or base.n_heads,
            n_layers=m.n_layers or base.n_layers,
            v_heads=m.v_heads or base.v_heads,
            dtype=m.dtype, param_dtype=m.param_dtype, head_type="structure",
            n_structure_heads=m.n_structure_heads,
            n_sequence_heads=m.n_sequence_heads, remat=m.remat)
    else:
        trunk_cfg = ESM3Config(
            dtype=m.dtype, param_dtype=m.param_dtype, head_type="structure",
            n_structure_heads=m.n_structure_heads,
            n_sequence_heads=m.n_sequence_heads, remat=m.remat)
    net = ESM3(trunk_cfg)
    se = TimestepEmbedder(hidden_size=trunk_cfg.d_model,
                          dtype=trunk_cfg.jnp_dtype,
                          param_dtype=trunk_cfg.jnp_param_dtype)
    mdlm_cfg = MDLMConfig(
        time_conditioning=m.time_conditioning,
        change_of_variables=m.change_of_variables,
        importance_sampling=m.importance_sampling,
        antithetic_sampling=m.antithetic_sampling,
        noise_removal=m.noise_removal,
        structure_only=m.structure_only,
        sequence_prediction=m.sequence_prediction,
        condition_dropout=m.condition_dropout,
        condition_mask_rate=m.condition_mask_rate,
        coupled_condition_mask=m.coupled_condition_mask,
        sampling_eps=m.sampling_eps,
        T=m.T,
    )
    return MDLM(net, se, noise=get_noise(m.noise), cfg=mdlm_cfg)


def build_clm(cfg: TrainConfig):
    """CLM fine-tune net (reference ConditionalLanguageModeling,
    slm/models/model.py:289-313 + configs/experiment/clm.yaml:26-44)."""
    from esmdiff_tpu.models.clm import CLM, CLMConfig

    m = cfg.model.clm
    return CLM(CLMConfig(
        d_model=m.d_model, d_ff=m.d_ff, n_layers=m.n_layers,
        n_heads=m.n_heads, decoder_only=m.decoder_only,
        dec_add_input_emb=m.dec_add_input_emb, dtype=m.dtype))


def build_jlm(cfg: TrainConfig):
    """JLM fine-tune net (reference JointLanguageModeling,
    slm/models/model.py:247-287 + configs/experiment/jlm.yaml:26-42)."""
    from esmdiff_tpu.models.jlm import JLM, JLMConfig

    m = cfg.model.jlm
    return JLM(JLMConfig(
        n_embd=m.n_embd, n_layers=m.n_layers, n_heads=m.n_heads,
        n_positions=m.n_positions, sep_strategy=m.sep_strategy,
        seq_loss_weight=m.seq_loss_weight,
        struct_embed_dim=m.struct_embed_dim, dtype=m.dtype))


def _clm_loss(model):
    """CLM objective: next-structure-token CE given per-residue ESM3
    embeddings (reference model.py:289-313)."""

    def loss_fn(params, batch, key, training=True):
        del key, training
        mask = batch["mask"]
        labels = jnp.where(mask > 0.5, batch["structure_tokens"], -100)
        out = model.apply({"params": params},
                          inputs_embeds=batch["embeddings"],
                          labels=labels, attention_mask=mask)
        return out["loss"], {"nll": out["loss"]}

    return loss_fn


def _jlm_loss(model):
    """JLM objective: shift-by-one CE over both segments of the joint
    (sequence, structure) stream (reference model.py:247-287)."""

    def loss_fn(params, batch, key, training=True):
        del key, training
        mask = batch["mask"]
        seq_labels = jnp.where(
            mask > 0.5, batch["sequence_tokens"], -100)
        str_labels = jnp.where(
            mask > 0.5, batch["structure_tokens"], -100)
        labels = jnp.concatenate([seq_labels, str_labels], axis=1)
        out = model.apply({"params": params},
                          sequence_embeddings=batch["embeddings"],
                          structure_tokens=batch["structure_tokens"],
                          labels=labels, mask=mask)
        return out["loss"], {
            "seq_nll": out["sequence_nll"],
            "str_nll": out["structure_nll"],
            "seq_acc": out["sequence_acc"],
            "str_acc": out["structure_acc"],
        }

    return loss_fn


def build_task(cfg: TrainConfig, emb_dim: Optional[int] = None,
               trunk_apply_factory=None):
    """task_name -> (loss_fn(params, batch, key, training), init_fn(key)).

    The reference trains three heads from the same harness
    (MDLM/CLM/JLM, slm/models/model.py:247-313,316+, selected by
    configs/experiment/*.yaml); here the task switch selects the model
    builder, its init, and its loss.  CLM/JLM consume the precomputed
    per-residue ESM3 embeddings from cli/dump.py --with_embeddings.
    ``trunk_apply_factory(net)`` optionally overrides the MDLM trunk
    forward (the pp strategies route it through parallel/pp.py).
    """
    task = cfg.task_name
    D = emb_dim if emb_dim is not None else C.ESM3_D_MODEL
    if task == "mdlm":
        mdlm = build_mdlm(cfg)
        if trunk_apply_factory is not None:
            mdlm.trunk_apply = trunk_apply_factory(mdlm.net)
        S = data_mod.resolve_pack_segments(cfg.data)

        def mdlm_loss(p, b, k, training=True):
            if "segment_ids" in b:   # packed batch (data.pack_len > 0)
                return mdlm.loss_packed(p, b, k, max_segments=S,
                                        training=training)
            return mdlm.loss(p, b, k, training=training)

        return mdlm_loss, lambda: init_params(mdlm, cfg)
    if task == "clm":
        model = build_clm(cfg)

        def init_fn():
            emb = jnp.zeros((1, 8, D), jnp.float32)
            lab = jnp.zeros((1, 8), jnp.int32)
            return jax.jit(
                lambda k: model.init(k, inputs_embeds=emb, labels=lab)
            )(jax.random.PRNGKey(cfg.seed))["params"]

        return _clm_loss(model), init_fn
    if task == "jlm":
        model = build_jlm(cfg)

        def init_fn():
            emb = jnp.zeros((1, 8, D), jnp.float32)
            st = jnp.zeros((1, 8), jnp.int32)
            lab = jnp.zeros((1, 16), jnp.int32)
            mask = jnp.ones((1, 8), jnp.float32)
            return jax.jit(
                lambda k: model.init(k, sequence_embeddings=emb,
                                     structure_tokens=st, labels=lab,
                                     mask=mask)
            )(jax.random.PRNGKey(cfg.seed))["params"]

        return _jlm_loss(model), init_fn
    raise ValueError(f"unknown task_name: {task!r} (mdlm | clm | jlm)")


def init_params(mdlm: MDLM, cfg: TrainConfig):
    params = mdlm.init(jax.random.PRNGKey(cfg.seed))
    if cfg.model.pretrained_ckpt:
        from esmdiff_tpu.convert.torch_to_jax import (
            convert_trunk, load_torch_state_dict, strip_prefix)

        sd = load_torch_state_dict(cfg.model.pretrained_ckpt)
        if any(k.startswith("net.") for k in sd):
            sd = strip_prefix(sd, "net.")
        params["net"], report = convert_trunk(
            params["net"], sd, mdlm.net.cfg, strict=False)
        n_missing = len(report["missing"])
        print(f"[init] loaded pretrained trunk "
              f"({n_missing} missing, {len(report['unmapped'])} unmapped)")
    return params


def train(cfg: TrainConfig) -> dict:
    t0 = time.time()
    run_dir = Path(cfg.trainer.ckpt_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    # persist the composed config beside the run so checkpoints are
    # self-describing (convert/checkpoints rebuilds the model from it —
    # the reference's .hydra/config.yaml convention, checkpoint_utils.py:48)
    from .config import save_config
    save_config(cfg, run_dir / "config.yaml")

    if cfg.trainer.multihost:
        # ICI/DCN SPMD across hosts; coordinator/topology auto-detected on
        # Cloud TPU (the reference's torch.distributed/SLURM analogue)
        jax.distributed.initialize()
        print(f"[dist] process {jax.process_index()}/{jax.process_count()}")

    if cfg.trainer.check_nans:
        jax.config.update("jax_debug_nans", True)

    if cfg.task_name in ("clm", "jlm"):
        # AR heads consume precomputed per-residue ESM3 embeddings
        # (reference scripts/dump.py output; model.py:87-90,268,297)
        cfg.data.with_embeddings = True
        if cfg.data.pack_len > 0:
            raise ValueError("data.pack_len (sequence-packed training) is "
                             "MDLM-only; the AR heads use bucketed padding")
    dataset = data_mod.EncodingDataset(cfg.data, training=True)
    train_split, val_split = data_mod.train_val_split(dataset, cfg.data)
    print(f"[data] {len(train_split.indices)} train / "
          f"{len(val_split.indices)} val chains from {cfg.data.path}")
    if len(val_split.indices) == 0:
        print("[data] WARNING: empty val split — val/loss will be nan and "
              "checkpoint selection has no signal (corpus too small for "
              "the 0.95/0.05 split)")
    emb_dim = None
    if cfg.data.with_embeddings:
        probe = dataset.load(0, np.random.RandomState(0))
        if "embeddings" not in probe:
            raise ValueError(
                f"task {cfg.task_name!r} needs embeddings in the encoding "
                f"dump — regenerate with cli/dump.py --with_embeddings")
        emb_dim = int(probe["embeddings"].shape[-1])

    from esmdiff_tpu.parallel import pp as pp_mod
    from esmdiff_tpu.parallel import tp as tp_mod

    pp_shape = pp_mod.parse_pp_strategy(cfg.trainer.strategy)
    tp_shape = tp_mod.parse_tp_strategy(cfg.trainer.strategy)
    trunk_apply_factory = None
    pp_stage = pp_n_valid = None
    if pp_shape is not None:
        # trainer.strategy=ppS|dpNxppS: GPipe stage sharding of the scanned
        # block stack (parallel/pp.py) — each device stores n_layers/S
        # blocks, activations hand off over ICI ppermute; each data slice
        # runs its own pipeline and gradients all-reduce over ``data``
        if cfg.task_name != "mdlm":
            raise ValueError("pp strategies support task_name=mdlm only")
        if cfg.data.pack_len > 0:
            raise ValueError(
                "pp strategies are incompatible with data.pack_len "
                "(packed rows carry sequence_id, which the GPipe trunk "
                "forward does not take) — set data.pack_len=0")
        n_data, pp_stage = pp_shape
        if cfg.data.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {cfg.data.batch_size} not divisible by "
                f"dp={n_data} in strategy {cfg.trainer.strategy!r}")
        local_b = cfg.data.batch_size // n_data
        pp_micro = cfg.trainer.pp_microbatches or pp_mod.auto_microbatches(
            local_b, pp_stage)
        if local_b % pp_micro != 0:
            raise ValueError(
                f"per-data-slice batch {local_b} not divisible by "
                f"pp_microbatches={pp_micro}")
        mesh = pp_mod.make_pp_mesh(n_data, pp_stage)
        trunk_apply_factory = lambda net: pp_mod.mdlm_pp_trunk_apply(  # noqa: E731
            net, mesh, pp_micro)
        print(f"[mesh] 2-D dp{n_data} x pp{pp_stage} "
              f"({pp_micro} microbatches), strategy={cfg.trainer.strategy}")
    elif tp_shape is not None:
        # trainer.strategy=dpNxtpM: 2-D (data, model) mesh — Megatron-style
        # tensor parallelism from pure GSPMD annotations (parallel/tp.py),
        # the production envelope for fp32 reference-parity fine-tuning
        # that OOMs on one chip (PERF.md)
        n_data, n_model = tp_shape
        if cfg.data.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {cfg.data.batch_size} not divisible by "
                f"dp={n_data} in strategy {cfg.trainer.strategy!r}")
        mesh = tp_mod.make_2d_mesh(n_data, n_model)
        print(f"[mesh] 2-D dp{n_data} x tp{n_model}, "
              f"strategy={cfg.trainer.strategy}")
    else:
        mesh = pmesh.make_data_mesh_for_batch(cfg.data.batch_size)
        print(f"[mesh] data axis over {mesh.devices.size} device(s), "
              f"strategy={cfg.trainer.strategy}")

    loss_fn_t, init_fn = build_task(cfg, emb_dim=emb_dim,
                                    trunk_apply_factory=trunk_apply_factory)
    params = init_fn()
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    print(f"[model] task={cfg.task_name} {n_params/1e6:.1f}M params")
    if pp_shape is not None:
        # stage-sharded storage needs the blocks row count to divide the
        # stage count; pad rows are inert (zero grads, zero weight decay)
        # and are stripped again at checkpoint time so ckpts stay
        # strategy-portable (sampling/ddp load them unchanged)
        params, pp_n_valid = pp_mod.pad_tree_blocks(params, pp_stage)

    optimizer = tstate.make_optimizer(
        lr=cfg.optim.lr, weight_decay=cfg.optim.weight_decay,
        warmup_steps=cfg.optim.warmup_steps, grad_clip=cfg.optim.grad_clip)
    state = tstate.create_sharded_train_state(
        params, optimizer, mesh, strategy=cfg.trainer.strategy)

    def loss_fn(p, b, k):
        return loss_fn_t(p, b, k)

    def eval_loss_fn(p, b, k):
        return loss_fn_t(p, b, k, training=False)

    train_step = tstate.make_train_step(loss_fn, optimizer, mesh=mesh)
    eval_step = tstate.eval_step_fn(eval_loss_fn)

    ckpt = CheckpointManager(run_dir / "ckpt", save_top_k=cfg.trainer.save_top_k)
    logger = MetricLogger(run_dir / "metrics.csv")
    if cfg.trainer.logger not in ("", "csv", "none"):
        from esmdiff_tpu.utils.logging import make_sink
        import dataclasses as _dc

        logger.add_sink(make_sink(
            cfg.trainer.logger, run_dir / "tb", run_name=cfg.trainer.run_name,
            config={"n_params": int(n_params), **_dc.asdict(cfg.trainer)}))
    key = jax.random.PRNGKey(cfg.seed)

    def _portable(s):
        """Checkpoint layout: pp pads the blocks stack for stage-sharded
        storage; strip the pad rows so saved ckpts keep the plain layout
        every other strategy (and the sampling CLIs) load unchanged."""
        if pp_shape is None:
            return s
        return pp_mod.unpad_tree_blocks(jax.device_get(s), pp_n_valid)

    if cfg.trainer.resume:
        if pp_shape is not None:
            restored = ckpt.restore(cfg.trainer.resume, _portable(state))
            restored, _ = pp_mod.pad_tree_blocks(restored, pp_stage)
            state = jax.device_put(
                restored, jax.tree.map(lambda x: x.sharding, state))
        else:
            state = ckpt.restore(cfg.trainer.resume, state)
        print(f"[resume] from {cfg.trainer.resume} at step "
              f"{int(jax.device_get(state.step))}")

    best_val = float("inf")
    epochs_no_improve = 0
    global_step = int(jax.device_get(state.step))
    local_step = 0  # steps executed in THIS process (global_step may resume)
    stop = False
    profiling = False

    overfit_cache: Optional[list] = None
    for epoch in range(cfg.trainer.max_epochs):
        if stop:
            break
        # ---- train epoch ----
        if cfg.trainer.overfit_batches > 0:
            if overfit_cache is None:
                it = data_mod.batches(train_split, cfg.data, shuffle=True,
                                      seed=cfg.seed)
                overfit_cache = []
                for b in it:
                    overfit_cache.append(b)
                    if len(overfit_cache) >= cfg.trainer.overfit_batches:
                        break
            epoch_batches = overfit_cache
        else:
            epoch_batches = data_mod.batches(
                train_split, cfg.data, shuffle=True, seed=cfg.seed + epoch)

        n_seen = 0
        n_total = max(1, len(train_split.indices) // cfg.data.batch_size)
        limit = max(1, int(n_total * cfg.trainer.limit_batches))
        for batch in epoch_batches:
            if n_seen >= limit:
                break
            key, k = jax.random.split(key)
            batch = pmesh.shard_batch(batch, mesh)
            # profiler window (reference debug/profiler.yaml analogue):
            # trace local steps [1, profile_steps] — local step 0 is compile.
            # Keyed on the per-process counter, not global_step, so the
            # window still fires when resuming from a checkpoint (ADVICE
            # round 2).
            if cfg.trainer.profile_steps > 0 and local_step == 1:
                jax.profiler.start_trace(str(run_dir / "profile"))
                profiling = True
            state, metrics = train_step(state, batch, k)
            if profiling and local_step >= cfg.trainer.profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                print(f"[profile] trace of local steps 1..{local_step} -> "
                      f"{run_dir / 'profile'}")
            global_step += 1
            local_step += 1
            n_seen += 1
            if global_step % cfg.trainer.log_every_n_steps == 0 or \
                    cfg.trainer.fast_dev_run:
                m = {k2: float(jax.device_get(v))
                     for k2, v in metrics.items()}
                m.update(step=global_step, epoch=epoch, split="train")
                logger.log(m)
                print(f"[train] step {global_step} epoch {epoch} "
                      f"loss {m['loss']:.4f}")
            if cfg.trainer.fast_dev_run:
                break

        # ---- validation ----
        if epoch % cfg.trainer.val_every_n_epochs == 0:
            losses = []
            for i, batch in enumerate(data_mod.batches(
                    val_split, cfg.data, shuffle=False, seed=0,
                    drop_last=False)):
                key, k = jax.random.split(key)
                batch = pmesh.shard_batch(batch, mesh)
                out = eval_step(state.params, batch, k)
                losses.append(float(jax.device_get(out["loss"])))
                if cfg.trainer.fast_dev_run:
                    break
            val_loss = float(np.mean(losses)) if losses else float("nan")
            logger.log({"step": global_step, "epoch": epoch, "split": "val",
                        "loss": val_loss})
            print(f"[val] epoch {epoch} loss {val_loss:.4f}")
            if val_loss < best_val:
                best_val = val_loss
                epochs_no_improve = 0
                ckpt.save(_portable(state), step=global_step,
                          metric=val_loss)
            else:
                epochs_no_improve += 1
                if epochs_no_improve >= cfg.trainer.early_stopping_patience:
                    print(f"[early-stop] no val improvement for "
                          f"{epochs_no_improve} epochs")
                    stop = True
        if cfg.trainer.fast_dev_run:
            break

    if profiling:  # run ended inside the trace window
        jax.profiler.stop_trace()
    wall = time.time() - t0
    print(f"[done] best val/loss {best_val:.4f} in {wall:.1f}s "
          f"({global_step} steps)")
    return {"best_val_loss": best_val, "steps": global_step,
            "wall_s": wall, "ckpt_dir": str(run_dir / "ckpt")}
