"""Joint VQ-VAE training: encoder + codebook + decoder, end to end.

The reference never trains its structure tokenizer — it loads ESM3's
pretrained ``StructureTokenEncoder``/``StructureTokenDecoder`` and freezes
them (reference slm/models/utils.py:16-19, net.py:93).  This environment has
no pretrained weights, so a frozen random encoder puts a hard floor on every
downstream quality number (7.2 Å train-decode CA-RMSD in the round-3
campaign).  This module adds what the reference lacks: full VQ-VAE training
(van den Oord et al., 2017) so the token space itself is learned.

Design:

  * straight-through estimator — the decoder consumes
    ``z + stop_grad(z_q - z)`` bridged to d_model, so reconstruction
    gradients reach the encoder through the quantization;
  * plain VQ objective — codebook loss ``||sg(z) - z_q||^2`` pulls assigned
    codes toward encoder outputs, commitment ``beta * ||z - sg(z_q)||^2``
    pulls the encoder toward its codes;
  * dead-code restart — codes unused over a window are re-seeded from live
    encoder outputs (host-side, outside jit), standard practice for large
    codebooks on small corpora;
  * standard-layout export — at save time the decoder's 4101-row ``embed``
    table is MATERIALIZED as ``[codebook @ W_bridge + b; special_rows]`` so
    the trained pair round-trips through the ordinary
    ``save_vqvae``/``load_vqvae``/``--vqvae_ckpt`` checkpoint path and the
    standalone ``StructureTokenDecoder`` reproduces the training-time
    function exactly (tests/test_vqvae_train.py pins bitwise parity).

TPU notes: the whole step (encode -> quantize -> decode -> loss) is one
jitted function; the quantization argmin is a single (B*L, d) x (d, n_codes)
MXU matmul; code-usage histograms ride along as jit outputs so the restart
logic needs no extra device round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from esmdiff_tpu.core import constants as C
from esmdiff_tpu.models.vqvae import (
    DecoderConfig, EncoderConfig, StructureTokenDecoder,
    StructureTokenEncoder,
)


# ---------------------------------------------------------------------------
# training-time module: encoder -> straight-through -> bridge -> decoder
# ---------------------------------------------------------------------------

class VQVAE(nn.Module):
    """Trainable encoder+decoder pair.

    Params tree: ``{encoder: ..., bridge: {kernel, bias}, special_embed,
    decoder: ...}`` where ``encoder``/``decoder`` match the standalone
    modules (the decoder's ``embed`` table is absent here — it is
    materialized from ``codebook``/``bridge``/``special_embed`` at export,
    see :func:`materialize_decoder_params`).
    """

    enc_cfg: EncoderConfig
    dec_cfg: DecoderConfig

    @nn.compact
    def __call__(self, coords, lengths, residue_index=None):
        """coords (B, Lp, 3, 3) NaN-padded N/CA/C; lengths (B,) int.

        Returns (decoder_out, aux) where aux carries everything the loss and
        the codebook bookkeeping need: z, z_q, valid, interior/full tokens,
        per-code usage counts.
        """
        B, Lp = coords.shape[0], coords.shape[1]
        in_chain = jnp.arange(Lp)[None, :] < lengths[:, None]

        tokens, z, valid, z_q = StructureTokenEncoder(
            self.enc_cfg, name="encoder")(
            coords, residue_index=residue_index, return_zq=True)
        valid = valid & in_chain
        z = z.astype(jnp.float32)

        # straight-through: forward z_q, gradient to z
        z_st = z + jax.lax.stop_gradient(z_q - z)
        bridged = nn.Dense(
            self.dec_cfg.d_model, dtype=jnp.float32,
            param_dtype=jnp.float32, name="bridge")(z_st)  # (B, Lp, d_model)

        special = self.param(
            "special_embed", nn.initializers.normal(0.02),
            (C.STRUCTURE_NUM_SPECIAL_TOKENS, self.dec_cfg.d_model),
            jnp.float32)

        # interior ids: code where valid, MASK where in-chain-but-unmodeled,
        # PAD beyond the chain (matches the inference-time token pipeline)
        interior = jnp.where(
            valid, tokens,
            jnp.where(in_chain, C.STRUCTURE_MASK_TOKEN,
                      C.STRUCTURE_PAD_TOKEN)).astype(jnp.int32)
        bos = jnp.full((B, 1), C.STRUCTURE_BOS_TOKEN, jnp.int32)
        pad = jnp.full((B, 1), C.STRUCTURE_PAD_TOKEN, jnp.int32)
        full = jnp.concatenate([bos, interior, pad], axis=1)  # (B, Lp+2)
        full = full.at[jnp.arange(B), lengths + 1].set(C.STRUCTURE_EOS_TOKEN)

        is_code = full < C.VQVAE_CODEBOOK_SIZE
        special_rows = jnp.take(
            special,
            jnp.clip(full - C.VQVAE_CODEBOOK_SIZE, 0,
                     C.STRUCTURE_NUM_SPECIAL_TOKENS - 1),
            axis=0)
        zero = jnp.zeros((B, 1, self.dec_cfg.d_model), jnp.float32)
        bridged_full = jnp.concatenate([zero, bridged, zero], axis=1)
        embeds = jnp.where(is_code[:, :, None], bridged_full, special_rows)

        out = StructureTokenDecoder(self.dec_cfg, name="decoder")(
            full, compute_ptm=False, inputs_embeds=embeds)

        usage = jnp.zeros((self.enc_cfg.n_codes,), jnp.int32).at[
            jnp.where(valid, tokens, 0)].add(valid.astype(jnp.int32))
        aux = {"z": z, "z_q": z_q, "valid": valid, "tokens": tokens,
               "full_tokens": full, "usage": usage}
        return out, aux


# ---------------------------------------------------------------------------
# reconstruction losses (shared with scripts/quality_campaign.py)
# ---------------------------------------------------------------------------

def drmsd_loss(pred, true, mask):
    """Rotation/translation-invariant reconstruction: CA pairwise-distance
    MSE + intra-residue bond terms + chirality (signed volume) tie-break.
    pred/true (B, L, 3, 3) f32, mask (B, L) f32."""
    ca_p, ca_t = pred[:, :, 1], true[:, :, 1]      # (B, L, 3)
    dp = jnp.linalg.norm(ca_p[:, :, None] - ca_p[:, None] + 1e-8, axis=-1)
    dt = jnp.linalg.norm(ca_t[:, :, None] - ca_t[:, None] + 1e-8, axis=-1)
    m2 = mask[:, :, None] * mask[:, None]
    l_pwd = jnp.sum(((dp - dt) * m2) ** 2) / (jnp.sum(m2) + 1e-8)

    def local(x):
        n, ca, c = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        return jnp.stack([
            jnp.linalg.norm(ca - n + 1e-8, axis=-1),
            jnp.linalg.norm(c - ca + 1e-8, axis=-1),
            jnp.linalg.norm(c - n + 1e-8, axis=-1)], -1)

    l_loc = jnp.sum(((local(pred) - local(true)) * mask[..., None]) ** 2) \
        / (jnp.sum(mask) * 3 + 1e-8)

    def chir(x):
        n, ca, c = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        u, v = ca - n, c - ca
        w = ca[:, 1:] - ca[:, :-1]
        return jnp.einsum("bld,bld->bl", jnp.cross(u, v)[:, :-1], w)

    mc = mask[:, 1:] * mask[:, :-1]
    l_chi = jnp.sum(((chir(pred) - chir(true)) * mc) ** 2) \
        / (jnp.sum(mc) + 1e-8)
    return l_pwd + l_loc + 0.1 * l_chi


def kabsch_huber_loss(pred, true, mask, delta: float = 4.0):
    """Per-sample Kabsch-align TRUE onto PRED (stop-grad transform) and take
    masked Huber over all backbone atoms.  Chirality-aware."""
    ca_p, ca_t = pred[:, :, 1], true[:, :, 1]
    w = mask[:, :, None]
    n = jnp.sum(mask, axis=1)[:, None] + 1e-6
    mu_p = jnp.sum(ca_p * w, axis=1) / n
    mu_t = jnp.sum(ca_t * w, axis=1) / n
    Pc = (ca_p - mu_p[:, None]) * w
    Tc = (ca_t - mu_t[:, None]) * w
    H = jnp.einsum("bld,ble->bde", Tc, Pc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("bde,bef->bdf", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = jax.lax.stop_gradient(jnp.einsum("bde,be,bef->bdf", U, D, Vt))
    mu_p = jax.lax.stop_gradient(mu_p)
    mu_t = jax.lax.stop_gradient(mu_t)
    true_al = jnp.einsum("blad,bde->blae", true - mu_t[:, None, None], R) \
        + mu_p[:, None, None]
    dist = jnp.sqrt(jnp.sum((pred - true_al) ** 2, axis=-1) + 1e-8)
    hub = jnp.where(dist <= delta, 0.5 * dist ** 2,
                    delta * (dist - 0.5 * delta))
    return jnp.sum(hub * mask[:, :, None]) / (jnp.sum(mask) * 3 + 1e-8)


# ---------------------------------------------------------------------------
# full objective
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VQLossConfig:
    beta: float = 0.25          # commitment weight (van den Oord 2017 §3.2)
    vq_weight: float = 1.0      # (codebook + beta*commit) scale vs recon
    recon: str = "drmsd"        # drmsd | kabsch


@dataclasses.dataclass(frozen=True)
class VQAugmentConfig:
    """Train-batch augmentation for small corpora.  A few hundred chains is
    tiny next to the PDB the reference tokenizer inherits; the round-4
    chip-scale joint run memorized its 224-structure corpus (train drmsd
    0.43, val ~200).  Crops turn every structure into O(L^2) distinct
    training windows; jitter and random rotations regularize the encoder's
    geometric features.  Applied host-side to training batches only."""

    crop: float = 0.5           # P(random contiguous crop) per structure
    crop_min: int = 32          # minimum crop length (residues)
    jitter: float = 0.05        # Gaussian coord noise, Å (0 = off)
    rotate: bool = True         # random global rotation per structure


def augment_batch(c: np.ndarray, lens: np.ndarray, aug: VQAugmentConfig,
                  rs: np.random.RandomState):
    """Host-side train-batch augmentation.  c: (B, Lp, 3, 3) NaN-padded;
    returns modified copies with static shapes preserved (crops re-pad with
    NaN, so the finite-coordinate mask and lengths stay consistent)."""
    c = np.array(c, np.float32, copy=True)
    lens = np.array(lens, np.int32, copy=True)
    for i in range(c.shape[0]):
        L = int(lens[i])
        if aug.crop > 0 and L > aug.crop_min and rs.rand() < aug.crop:
            cl = int(rs.randint(aug.crop_min, L + 1))
            off = int(rs.randint(0, L - cl + 1))
            seg = c[i, off:off + cl].copy()
            c[i] = np.nan
            c[i, :cl] = seg
            lens[i] = cl
        if aug.rotate:
            # uniform random rotation (normalized-quaternion method)
            q = rs.randn(4).astype(np.float32)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]], np.float32)
            c[i] = c[i] @ R.T
        if aug.jitter > 0:
            c[i] = c[i] + (rs.randn(*c[i].shape).astype(np.float32)
                           * aug.jitter)
    return c, lens


def vqvae_loss(out, aux, coords_clean, coord_mask, lengths,
               cfg: VQLossConfig):
    """-> (total, metrics dict).  coords_clean: NaN->0 coords (B, Lp, 3, 3);
    coord_mask: (B, Lp) f32 finite-coordinate mask."""
    pred = out["bb_pred"][:, 1:-1].astype(jnp.float32)
    mask = coord_mask * aux["valid"].astype(jnp.float32)
    recon_impl = drmsd_loss if cfg.recon == "drmsd" else kabsch_huber_loss
    l_recon = recon_impl(pred, coords_clean, mask)

    z, z_q = aux["z"], aux["z_q"]
    vmask = aux["valid"].astype(jnp.float32)[:, :, None]
    denom = jnp.sum(vmask) * z.shape[-1] + 1e-8
    l_codebook = jnp.sum(
        (jax.lax.stop_gradient(z) - z_q) ** 2 * vmask) / denom
    l_commit = jnp.sum(
        (z - jax.lax.stop_gradient(z_q)) ** 2 * vmask) / denom
    total = l_recon + cfg.vq_weight * (l_codebook + cfg.beta * l_commit)
    metrics = {"recon": l_recon, "codebook": l_codebook,
               "commit": l_commit, "usage": aux["usage"]}
    return total, metrics


# ---------------------------------------------------------------------------
# dead-code restart (host-side, outside jit)
# ---------------------------------------------------------------------------

def restart_dead_codes(params, usage_counts, z_pool, rng: np.random.RandomState,
                       noise: float = 0.01):
    """Re-seed codes with zero usage over the tracking window from live
    encoder outputs.  params: the VQVAE (or encoder) param tree containing
    ``encoder/codebook`` (or ``codebook`` at the top level); usage_counts
    (n_codes,) int; z_pool (M, d_out) recent encoder outputs (host numpy).

    Returns (new_params, n_restarted).  Pure host numpy — called every few
    hundred steps, not in the jitted path."""
    tree = params
    holder = tree["encoder"] if "encoder" in tree else tree
    codebook = np.asarray(holder["codebook"])
    dead = np.where(np.asarray(usage_counts) == 0)[0]
    if dead.size == 0 or len(z_pool) == 0:
        return params, 0
    picks = z_pool[rng.randint(0, len(z_pool), size=dead.size)]
    new_cb = codebook.copy()
    new_cb[dead] = picks + noise * rng.randn(
        dead.size, codebook.shape[1]).astype(codebook.dtype)
    new_holder = dict(holder)
    new_holder["codebook"] = jnp.asarray(new_cb)
    if "encoder" in tree:
        new_tree = dict(tree)
        new_tree["encoder"] = new_holder
        return new_tree, int(dead.size)
    return new_holder, int(dead.size)


# ---------------------------------------------------------------------------
# standard-layout export
# ---------------------------------------------------------------------------

def materialize_decoder_params(vq_params):
    """Build standalone StructureTokenDecoder params from trained VQVAE
    params: rows 0..4095 of ``embed`` are ``codebook @ W_bridge + b``
    (computed in f32, exactly the training-time bridge on quantized codes),
    rows 4096..4100 are the learned special embeddings (MASK, EOS, BOS, PAD,
    CHAINBREAK order per core/constants.py:39-43)."""
    codebook = jnp.asarray(vq_params["encoder"]["codebook"], jnp.float32)
    W = jnp.asarray(vq_params["bridge"]["kernel"], jnp.float32)
    b = jnp.asarray(vq_params["bridge"]["bias"], jnp.float32)
    code_rows = codebook @ W + b                    # (n_codes, d_model) f32
    special = jnp.asarray(vq_params["special_embed"], jnp.float32)
    # the embed table is always STRUCTURE_VOCAB_SIZE rows with the 5 special
    # rows pinned at 4096..4100; tiny test geometries (n_codes < 4096) leave
    # the unused code rows zero (never indexed — tokens are < n_codes)
    n_unused = C.VQVAE_CODEBOOK_SIZE - code_rows.shape[0]
    pad = jnp.zeros((n_unused, code_rows.shape[1]), jnp.float32)
    table = jnp.concatenate([code_rows, pad, special], axis=0)
    assert table.shape[0] == C.STRUCTURE_VOCAB_SIZE
    dec = dict(vq_params["decoder"])
    dec["embed"] = {"embedding": table}
    return dec


def export_vqvae(out_dir, enc_cfg: EncoderConfig, dec_cfg: DecoderConfig,
                 vq_params) -> None:
    """Save the trained pair in the standard vqvae checkpoint layout
    (convert/checkpoints.py::save_vqvae) — loads back through
    ``--vqvae_ckpt`` on every CLI with no special-casing."""
    from esmdiff_tpu.convert.checkpoints import save_vqvae

    save_vqvae(out_dir, enc_cfg, vq_params["encoder"], dec_cfg,
               materialize_decoder_params(vq_params))


# ---------------------------------------------------------------------------
# one-call trainer (used by the campaign stage and tests)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VQVAETrainResult:
    params: dict
    losses: list
    n_live_codes: int


def train_vqvae(enc_cfg: EncoderConfig, dec_cfg: DecoderConfig,
                coords: np.ndarray, lengths: np.ndarray, *,
                steps: int, batch: int, lr: float = 3e-4,
                loss_cfg: VQLossConfig = VQLossConfig(),
                seed: int = 0, restart_every: int = 500,
                val_idx: Optional[np.ndarray] = None,
                data_parallel: bool = False,
                augment: Optional[VQAugmentConfig] = None,
                log_every: int = 500, log=print) -> VQVAETrainResult:
    """Joint VQ-VAE training on a coordinate corpus.

    coords: (N, Lp, 3, 3) NaN-padded; lengths: (N,) int32.  Returns trained
    VQVAE params (export with :func:`export_vqvae`).

    data_parallel=True shards the batch axis over ALL visible devices on a
    1-D ``data`` mesh (params replicated; XLA inserts the gradient
    all-reduce from the sharding annotations).  ``batch`` must divide by the
    device count.

    augment: train-batch crop/jitter/rotation augmentation
    (:class:`VQAugmentConfig`); validation batches are never augmented.
    """
    import optax

    model = VQVAE(enc_cfg, dec_cfg)
    rs = np.random.RandomState(seed)
    N, Lp = coords.shape[0], coords.shape[1]
    # corpus stays HOST-side; batches are gathered with numpy and shipped
    # per step (~MBs) so corpus size is bounded by host RAM, not HBM
    coords = np.asarray(coords, np.float32)
    lengths = np.asarray(lengths, np.int32)

    batch_sharding = None
    if data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devs = np.asarray(jax.devices())
        if batch % len(devs):
            raise ValueError(f"batch {batch} not divisible by "
                             f"{len(devs)} devices")
        mesh = Mesh(devs, ("data",))
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())

    def gather(idx, train: bool = False):
        c = coords[idx]
        lens = lengths[idx]
        if train and augment is not None:
            c, lens = augment_batch(c, lens, augment, rs)
        arrs = (jnp.asarray(c), jnp.asarray(np.nan_to_num(c, nan=0.0)),
                jnp.asarray(np.isfinite(c).all(-1).all(-1)
                            .astype(np.float32)),
                jnp.asarray(lens))
        if batch_sharding is not None:
            arrs = tuple(jax.device_put(a, batch_sharding) for a in arrs)
        return arrs

    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.asarray(coords[:1]), jnp.asarray(lengths[:1]))["params"]
    if data_parallel:
        params = jax.device_put(params, replicated)

    # grad clip is load-bearing (see quality_campaign decoder notes);
    # warmup avoids early degenerate-frame spikes, cosine decay settles the
    # codebook (assignments stop churning as lr -> lr/30)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps=min(200, max(1, steps // 20)),
        decay_steps=steps, end_value=lr / 30)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=0.01))
    opt_state = opt.init(params)
    if data_parallel:
        opt_state = jax.device_put(opt_state, replicated)

    @jax.jit
    def step(p, s, c_nan, c_clean, cmask, lens):
        def loss_fn(p):
            out, aux = model.apply({"params": p}, c_nan, lens)
            total, m = vqvae_loss(out, aux, c_clean, cmask, lens, loss_cfg)
            return total, (m, aux["z"], aux["valid"])
        (total, (m, z, valid)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, total, m, z, valid

    @jax.jit
    def val_recon(p, c_nan, c_clean, cmask, lens):
        out, aux = model.apply({"params": p}, c_nan, lens)
        _, m = vqvae_loss(out, aux, c_clean, cmask, lens, loss_cfg)
        return m["recon"]

    val_batch = (gather(np.asarray(val_idx[:16]))
                 if val_idx is not None and len(val_idx) else None)

    usage_window = np.zeros((enc_cfg.n_codes,), np.int64)
    z_pool = None
    losses = []
    tr_idx = np.arange(N) if val_idx is None else \
        np.setdiff1d(np.arange(N), val_idx)
    for it in range(steps):
        c_nan, c_clean, cmask, lens = gather(rs.choice(tr_idx, batch),
                                             train=True)
        params, opt_state, total, m, z, valid = step(
            params, opt_state, c_nan, c_clean, cmask, lens)
        usage_window += np.asarray(m["usage"], np.int64)
        if it % 50 == 0:  # refresh the restart pool cheaply
            zh, vh = np.asarray(z), np.asarray(valid)
            pool = zh[vh]
            if pool.size:
                z_pool = pool[rs.permutation(len(pool))[:4096]]
        if restart_every and (it + 1) % restart_every == 0 \
                and z_pool is not None:
            params, n_restart = restart_dead_codes(
                params, usage_window, z_pool, rs)
            if n_restart and log:
                log(f"[vqvae] step {it}: restarted {n_restart} dead codes "
                    f"({int((usage_window > 0).sum())} live)")
            usage_window[:] = 0
        if log and (it % log_every == 0 or it == steps - 1):
            msg = (f"[vqvae] step {it}: total {float(total):.4f} recon "
                   f"{float(m['recon']):.4f} codebook "
                   f"{float(m['codebook']):.4f} commit "
                   f"{float(m['commit']):.4f}")
            if val_batch is not None:
                msg += f" val_recon {float(val_recon(params, *val_batch)):.4f}"
            log(msg, flush=True) if log is print else log(msg)
        losses.append(float(total))
    n_live = int((np.asarray(
        m["usage"], np.int64) + usage_window > 0).sum())
    return VQVAETrainResult(params=params, losses=losses,
                            n_live_codes=n_live)
