"""Device-transfer warmup for high-latency (tunneled) TPU runtimes.

The first device->host read of a process pays a one-time stream-setup cost
on the tunneled axon runtime with enormous variance — measured 0.02 s steady
vs 6.3 s / 117.8 s / ~177 s for the FIRST read (scripts/coldstart_diag.py
``bandwidth`` + the round-5 lowering profile).  Anything that implicitly
reads device memory early — e.g. jit-lowering a program that closed over a
device array (the constant handler fetches ``._value``) — inherits that
stall into whatever phase happens to run first.

:func:`prime_transfers` pays the cost once, explicitly and measurably, at
process startup.  Production code must ALSO never bake device arrays into
jitted programs (keep trace-time constants as host numpy; pass real data as
arguments) — see bench.make_bucket_fn for the pattern.
"""

from __future__ import annotations

import time


def prime_transfers() -> dict:
    """One tiny h2d + d2h round-trip; returns measured seconds per phase."""
    import jax
    import numpy as np

    t0 = time.time()
    dev = jax.devices()[0]
    t_init = time.time() - t0
    t0 = time.time()
    x = jax.device_put(np.arange(16, dtype=np.int32), dev)
    jax.block_until_ready(x)
    t_h2d = time.time() - t0
    t0 = time.time()
    np.asarray(x)
    t_d2h = time.time() - t0
    return {"device_init_s": round(t_init, 2), "h2d_prime_s": round(t_h2d, 2),
            "d2h_prime_s": round(t_d2h, 2)}


def prime_transfers_async():
    """Run :func:`prime_transfers` on a background thread so its one-time
    cost overlaps model build + compile warmup (cold wall = max, not sum).
    Returns (join, report): call ``join()`` before the first real
    device->host read; ``report`` fills in once finished."""
    import threading

    report: dict = {}
    t = threading.Thread(target=lambda: report.update(prime_transfers()),
                         daemon=True)
    t.start()

    def join(timeout=None):
        t.join(timeout)
        return report

    return join, report
