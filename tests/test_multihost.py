"""Real multi-process ``jax.distributed`` dryrun (VERDICT round 2 item 4).

Spawns 2 worker processes (4 virtual CPU devices each) that form one global
8-device SPMD mesh, run the sharded train step with per-process batch
shards, orbax-checkpoint the sharded state across the process boundary, and
must produce the same losses as a single-process run of the identical
workload.
"""

import pytest

pytestmark = pytest.mark.slow  # spawns 2 jax subprocesses (~3-5 min)


def test_dryrun_multihost():
    from __graft_entry__ import dryrun_multihost

    dryrun_multihost(n_processes=2, local_devices=4)
