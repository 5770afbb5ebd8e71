"""Multi-process (multi-host) SPMD dryrun: real ``jax.distributed``.

The production multihost path (``trainer.multihost`` → train/loop.py
``jax.distributed.initialize()``) is exercised here on CPU: N processes with
M virtual devices each form one global 2N*M-device mesh, run the SAME
sharded MDLM train step the trainer uses (each process feeding its
addressable batch shard via ``jax.make_array_from_process_local_data`` —
parallel/mesh.shard_batch's multi-process branch), checkpoint the sharded
state with orbax across the process boundary, restore it, and take one more
step.  The launcher (``__graft_entry__.dryrun_multihost``) compares the
per-step losses against a single-process run of the identical workload —
process topology must be a layout choice, not a math change.

This is the DCN analogue of the reference's one-node multi-GPU DDP
(configs/trainer/ddp.yaml:4-9 + train.sh): torch.distributed/NCCL process
groups become one jax.distributed SPMD program over ICI/DCN.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def run_workload(out_file: str, ckpt_dir: str) -> None:
    """The shared workload: 2 sharded train steps + orbax save/restore + 1
    more step.  Identical regardless of process topology."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from esmdiff_tpu.core import constants as C
    from esmdiff_tpu.diffusion.mdlm import MDLM, MDLMConfig
    from esmdiff_tpu.diffusion.noise import LogLinearNoise
    from esmdiff_tpu.models.esm3 import ESM3, esm3_tiny
    from esmdiff_tpu.nn.layers import TimestepEmbedder
    from esmdiff_tpu.parallel import mesh as pmesh
    from esmdiff_tpu.train import state as tstate

    cfg = esm3_tiny(dtype="float32", head_type="structure",
                    n_structure_heads=C.STRUCTURE_VOCAB_SIZE)
    net = ESM3(cfg)
    se = TimestepEmbedder(hidden_size=cfg.d_model, dtype=jnp.float32)
    mdlm = MDLM(net, se, noise=LogLinearNoise(), cfg=MDLMConfig())
    params = mdlm.init(jax.random.PRNGKey(0))

    optimizer = tstate.make_optimizer(lr=1e-4, grad_clip=1.0)
    mesh = pmesh.make_mesh()
    n_dev = mesh.devices.size

    losses = []
    with mesh:
        state = tstate.create_sharded_train_state(
            params, optimizer, mesh, strategy="zero2")

        B, L = 2 * n_dev, 16
        rng = np.random.RandomState(0)
        batch = {
            "structure_tokens": rng.randint(0, 4096, (B, L)).astype(np.int32),
            "sequence_tokens": np.full((B, L), 5, dtype=np.int32),
            "mask": np.ones((B, L), dtype=np.float32),
        }
        batch = pmesh.shard_batch(batch, mesh)

        step = tstate.make_train_step(
            lambda p, b, k: mdlm.loss(p, b, k), optimizer, mesh=mesh,
            donate=False)
        for i in range(2):
            state, metrics = step(state, batch, jax.random.PRNGKey(1 + i))
            losses.append(float(metrics["loss"]))

        # orbax save/restore ACROSS the process boundary: every process
        # participates; shards are written/read per host
        ckptr = ocp.StandardCheckpointer()
        path = Path(ckpt_dir).absolute() / "state"
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            state)
        restored = ckptr.restore(path, abstract)
        assert int(jax.device_get(restored.step)) == 2

        state2, metrics = step(restored, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))

    if jax.process_index() == 0:
        Path(out_file).write_text(json.dumps({
            "losses": losses,
            "n_devices": n_dev,
            "n_processes": jax.process_count(),
        }))


def main(argv=None):
    p = argparse.ArgumentParser(description="Multihost SPMD dryrun worker.")
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port; omit for single-process mode.")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--ckpt_dir", type=str, required=True)
    args = p.parse_args(argv)

    import jax

    # the axon TPU plugin wins platform selection over JAX_PLATFORMS (see
    # PERF.md gotcha #1); force CPU through the config
    jax.config.update("jax_platforms", "cpu")
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        print(f"[multihost] process {jax.process_index()}"
              f"/{jax.process_count()}, "
              f"{len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")
    run_workload(args.out, args.ckpt_dir)


if __name__ == "__main__":
    main()
