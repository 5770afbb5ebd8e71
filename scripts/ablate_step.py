"""On-chip step-time ablations for the trunk scan (perf work, round 2).

Times the full-size trunk inside a 25-step sampling-style scan with targeted
ablations, to locate where the attention-path milliseconds go before/after
kernel work.  Run on the real TPU:  python scripts/ablate_step.py [B] [L]

Uses random weights (zero weights give fantasy timings on this runtime) and
varies the scan input per call (byte-identical calls appear memoized).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from esmdiff_tpu.utils.compilation_cache import enable

enable()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64
STEPS = 25

from esmdiff_tpu.models import esm3 as esm3_mod
from esmdiff_tpu.nn import layers as layers_mod
from esmdiff_tpu.models.esm3 import ESM3, ESM3Config


def build(cfg):
    net = ESM3(cfg)
    seq = jnp.zeros((1, 16), jnp.int32)
    coords = jnp.zeros((1, 16, 3, 3), jnp.float32)
    params = jax.jit(lambda k: net.init(
        k, sequence_tokens=seq, structure_coords=coords))(
        jax.random.PRNGKey(0))["params"]
    return net, params


def timed_scan(net, params, tag):
    # random tokens: constant inputs short-circuit on this runtime
    # (fantasy ~5 ms/step vs the real ~95 — see PERF.md gotchas)
    import numpy as _np
    _rng = _np.random.RandomState(0)
    seq = jnp.asarray(_rng.randint(4, 24, (B, L)), jnp.int32)
    lengths = jnp.full((B,), L - 2, jnp.int32)

    @jax.jit
    def run(params, toks0):
        def step(toks, _):
            out = net.apply({"params": params}, structure_tokens=toks,
                            sequence_tokens=seq, lengths=lengths)
            nxt = jnp.argmax(out.structure_logits, -1).astype(jnp.int32)
            return nxt, None
        toks, _ = jax.lax.scan(step, toks0, None, length=STEPS)
        return toks

    toks0 = jnp.asarray(_rng.randint(0, 4096, (B, L)), jnp.int32)
    t0 = time.time()
    jax.block_until_ready(run(params, toks0))
    first = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        jax.block_until_ready(run(params, toks0 + i + 1))
        times.append(time.time() - t0)
    ms = min(times) / STEPS * 1e3
    print(f"{tag:<40} {ms:9.2f} ms/step   (compile {first:.0f}s)",
          flush=True)
    return ms


def main():
    cfg = ESM3Config(head_type="structure", param_dtype="bfloat16",
                     remat=False)
    net, params = build(cfg)
    base = timed_scan(net, params, "baseline")

    # ---- ablation: qkv GEMM -> slice of x (keeps LNs, attention, out) ----
    orig_mha_call = layers_mod.MultiHeadAttention.__call__

    import flax.linen as nn

    def mha_no_gemms(self, x, rot_cos, rot_sin, mask=None, lengths=None):
        from esmdiff_tpu.nn.attention import dot_product_attention
        from esmdiff_tpu.nn.rotary import apply_rotary

        Bx, Lx, D = x.shape
        dh = self.d_model // self.n_heads
        h = layers_mod.LayerNorm(name="ln")(x)
        # params still created so the tree matches; GEMMs skipped
        _ = nn.Dense(3 * self.d_model, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="qkv")
        q = layers_mod.LayerNorm(name="q_ln")(h)
        k = layers_mod.LayerNorm(name="k_ln")(h)
        v = h
        q = apply_rotary(q.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        k = apply_rotary(k.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        o = dot_product_attention(q, k, v.reshape(Bx, Lx, self.n_heads, dh),
                                  mask=mask, lengths=lengths,
                                  backend=self.attn_backend)
        _ = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out")
        return o.reshape(Bx, Lx, self.d_model)

    layers_mod.MultiHeadAttention.__call__ = mha_no_gemms
    net2, params2 = build(cfg)
    no_gemm = timed_scan(net2, params2, "attn qkv/out GEMMs removed")
    layers_mod.MultiHeadAttention.__call__ = orig_mha_call

    # ---- ablation: attention core -> v passthrough (keep all GEMMs) ----
    def mha_no_core(self, x, rot_cos, rot_sin, mask=None, lengths=None):
        from esmdiff_tpu.nn.rotary import apply_rotary

        Bx, Lx, D = x.shape
        dh = self.d_model // self.n_heads
        h = layers_mod.LayerNorm(name="ln")(x)
        qkv = nn.Dense(3 * self.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = layers_mod.LayerNorm(name="q_ln")(q)
        k = layers_mod.LayerNorm(name="k_ln")(k)
        q = apply_rotary(q.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        k = apply_rotary(k.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        o = (q + k).reshape(Bx, Lx, D) + v  # no (L x L) einsums
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out")(o)

    layers_mod.MultiHeadAttention.__call__ = mha_no_core
    net3, params3 = build(cfg)
    no_core = timed_scan(net3, params3, "attention core removed (GEMMs kept)")
    layers_mod.MultiHeadAttention.__call__ = orig_mha_call

    # ---- ablation: q_ln/k_ln removed (GEMMs + core kept) ----
    def mha_no_qkln(self, x, rot_cos, rot_sin, mask=None, lengths=None):
        from esmdiff_tpu.nn.attention import dot_product_attention
        from esmdiff_tpu.nn.rotary import apply_rotary

        Bx, Lx, D = x.shape
        dh = self.d_model // self.n_heads
        h = layers_mod.LayerNorm(name="ln")(x)
        qkv = nn.Dense(3 * self.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        _ = layers_mod.LayerNorm(name="q_ln")
        _ = layers_mod.LayerNorm(name="k_ln")
        q = apply_rotary(q.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        k = apply_rotary(k.reshape(Bx, Lx, self.n_heads, dh), rot_cos, rot_sin)
        o = dot_product_attention(q, k, v.reshape(Bx, Lx, self.n_heads, dh),
                                  mask=mask, lengths=lengths,
                                  backend=self.attn_backend)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out")(
            o.reshape(Bx, Lx, D))

    layers_mod.MultiHeadAttention.__call__ = mha_no_qkln
    net4, params4 = build(cfg)
    no_qkln = timed_scan(net4, params4, "q_ln/k_ln removed")
    layers_mod.MultiHeadAttention.__call__ = orig_mha_call

    # ---- ablation: FFN hidden 4096 -> 256 ----
    cfg_small_ffn = ESM3Config(head_type="structure",
                               param_dtype="bfloat16", remat=False,
                               expansion_ratio=256 / 1536)
    net5, params5 = build(cfg_small_ffn)
    small_ffn = timed_scan(net5, params5, "FFN hidden 4096 -> 256")

    print("\nderived:")
    print(f"  attn GEMM time       ~ {base - no_gemm:6.2f} ms/step")
    print(f"  attention core       ~ {base - no_core:6.2f} ms/step")
    print(f"  q_ln/k_ln            ~ {base - no_qkln:6.2f} ms/step")
    print(f"  FFN (approx)         ~ {(base - small_ffn) * 16 / 15:6.2f} ms/step")


if __name__ == "__main__":
    main()
