"""External-oracle parity: CLM vs HF torch T5, JLM vs HF torch GPT-2.

The reference's CLM/JLM wrap the real HuggingFace implementations
(slm/models/net.py:87-295), so the installed ``transformers`` torch models
are a true EXTERNAL oracle for both the architecture reimplementation and
the checkpoint conversion rules (convert/ar_rules.py) — unlike the
own-export round-trips in test_convert_ar.py, a deviation in rel-pos
bucketing, gated-GELU flavor, LN epsilon, attention scaling, or Conv1D
layout fails here against upstream, not against our own assumptions.
"""

import numpy as np
import pytest
import torch

from esmdiff_tpu.convert.ar_rules import convert_clm, convert_jlm
from esmdiff_tpu.models.clm import CLM, CLMConfig
from esmdiff_tpu.models.jlm import JLM, JLMConfig

pytestmark = pytest.mark.slow  # compile-heavy module

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, L, LS = 2, 7, 9
COND = 48


def _np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# CLM vs T5ForConditionalGeneration
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clm_pair():
    from transformers import T5Config, T5ForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = T5Config(
        vocab_size=4101, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        pad_token_id=4099, decoder_start_token_id=4099)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    adapter = torch.nn.Linear(COND, 32, bias=False)

    cfg = CLMConfig(d_model=32, d_ff=64, n_layers=2, n_heads=4,
                    cond_dim=COND, dtype="float32")
    model = CLM(cfg)
    emb0 = jnp.zeros((B, L, COND), jnp.float32)
    lab0 = jnp.zeros((B, LS), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), emb0, lab0)["params"]

    sd = {k: v for k, v in hf.state_dict().items()}
    sd["adapation_layer.weight"] = adapter.weight.detach()
    params, report = convert_clm(template, sd, n_layers=2, strict=False)
    assert not report["missing"], report["missing"]
    # unmapped = the tied/duplicated embedding aliases only
    assert all("embed_tokens" in k or k == "shared.weight"
               for k in report["unmapped"]), report["unmapped"]
    return model, params, hf, adapter


def test_clm_matches_hf_t5(clm_pair):
    model, params, hf, adapter = clm_pair
    rng = np.random.RandomState(1)
    emb = rng.randn(B, L, COND).astype(np.float32)
    labels = rng.randint(0, 4096, (B, LS)).astype(np.int64)
    # padded encoder rows: mask the tail of row 1
    att = np.ones((B, L), np.float32)
    att[1, -3:] = 0.0

    with torch.no_grad():
        out_t = hf(inputs_embeds=adapter(torch.from_numpy(emb)),
                   attention_mask=torch.from_numpy(att),
                   labels=torch.from_numpy(labels))
    out_j = model.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(labels.astype(np.int32)),
                        attention_mask=jnp.asarray(att))
    np.testing.assert_allclose(np.asarray(out_j["logits"]),
                               _np(out_t.logits), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(out_j["loss"]), float(out_t.loss),
                               atol=1e-5, rtol=1e-5)


def test_clm_matches_hf_t5_ignore_index(clm_pair):
    model, params, hf, adapter = clm_pair
    rng = np.random.RandomState(2)
    emb = rng.randn(B, L, COND).astype(np.float32)
    labels = rng.randint(0, 4096, (B, LS)).astype(np.int64)
    labels[:, -2:] = -100  # ignored positions
    with torch.no_grad():
        out_t = hf(inputs_embeds=adapter(torch.from_numpy(emb)),
                   labels=torch.from_numpy(labels))
    out_j = model.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(labels.astype(np.int32)))
    np.testing.assert_allclose(float(out_j["loss"]), float(out_t.loss),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# JLM vs GPT2Model
# ---------------------------------------------------------------------------

def _jlm_pair(sep_strategy: str):
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(0)
    hf_cfg = GPT2Config(
        vocab_size=8, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        activation_function="gelu_new")
    gpt = GPT2Model(hf_cfg).eval()
    structure_embed = torch.nn.Embedding(4101, 24)
    seq_adapter = torch.nn.Linear(COND, 32, bias=False)
    struct_adapter = torch.nn.Linear(24, 32, bias=False)
    sequence_head = torch.nn.Linear(32, 33, bias=False)
    structure_head = torch.nn.Linear(32, 4101, bias=False)
    sep_token = torch.randn(32)

    cfg = JLMConfig(n_embd=32, n_layers=2, n_heads=4, n_positions=64,
                    cond_dim=COND, struct_embed_dim=24, seq_vocab=33,
                    sep_strategy=sep_strategy, dtype="float32")
    model = JLM(cfg)
    emb0 = jnp.zeros((B, L, COND), jnp.float32)
    st0 = jnp.zeros((B, LS), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), emb0, st0)["params"]

    sd = {k: v for k, v in gpt.state_dict().items()}
    sd.update({
        "structure_embed_tokens.weight": structure_embed.weight.detach(),
        "sequence_adapation_layer.weight": seq_adapter.weight.detach(),
        "structure_adapation_layer.weight": struct_adapter.weight.detach(),
        "sequence_head.weight": sequence_head.weight.detach(),
        "structure_head.weight": structure_head.weight.detach(),
        "sep_token": sep_token,
    })
    params, report = convert_jlm(template, sd, n_layers=2, strict=False)
    assert not report["missing"], report["missing"]
    torch_mods = (gpt, structure_embed, seq_adapter, struct_adapter,
                  sequence_head, structure_head, sep_token)
    return model, params, torch_mods


@pytest.mark.parametrize("sep_strategy", ["sentence", "position"])
def test_jlm_matches_hf_gpt2(sep_strategy):
    model, params, mods = _jlm_pair(sep_strategy)
    (gpt, structure_embed, seq_adapter, struct_adapter,
     sequence_head, structure_head, sep_token) = mods
    rng = np.random.RandomState(3)
    emb = rng.randn(B, L, COND).astype(np.float32)
    st = rng.randint(0, 4096, (B, LS)).astype(np.int64)

    with torch.no_grad():
        seq_part = seq_adapter(torch.from_numpy(emb))
        str_part = struct_adapter(structure_embed(torch.from_numpy(st)))
        if sep_strategy == "sentence":
            x = torch.cat([seq_part, str_part], dim=1)
            types = torch.cat([torch.zeros(B, L), torch.ones(B, LS)],
                              dim=1).long()
            pos = torch.arange(L + LS)[None].expand(B, -1)
            # HF adds wpe(position_ids) + wte(token_type_ids) internally
            h = gpt(inputs_embeds=x, position_ids=pos,
                    token_type_ids=types).last_hidden_state
            off = 0
        else:
            sep = sep_token[None, None].expand(B, 1, 32)
            x = torch.cat([seq_part, sep, str_part], dim=1)
            pos = torch.cat([torch.arange(L), torch.zeros(1).long(),
                             torch.arange(LS)])[None].expand(B, -1)
            h = gpt(inputs_embeds=x, position_ids=pos).last_hidden_state
            off = 1
        seq_logits_t = _np(sequence_head(h[:, :L]))
        str_logits_t = _np(structure_head(h[:, L + off:]))

    out_j = model.apply({"params": params}, jnp.asarray(emb),
                        jnp.asarray(st.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out_j["sequence_logits"]),
                               seq_logits_t, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["structure_logits"]),
                               str_logits_t, atol=2e-4, rtol=2e-4)
