"""Golden-logit parity vs HuggingFace (the automated version of the
reference's manual hf_infer comparison, readme.md:100-101 — SURVEY.md §4
says make it a real test).

Tiny random-initialized HF models are the oracle: exact same weights flow
through transformers (torch CPU) and through our JAX forward; logits must
agree elementwise in fp32.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import torch
from transformers import LlamaConfig, LlamaForCausalLM, Qwen2Config, Qwen2ForCausalLM

from kuiperllama_tpu.checkpoint.hf import config_from_hf, params_from_state_dict
from kuiperllama_tpu.models import decoder
from kuiperllama_tpu.params import to_device


def _hf_llama(vocab=512, dim=64, inter=192, layers=2, heads=4, kv=2, theta=10000.0):
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, rope_theta=theta, max_position_embeddings=128,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval()


def _hf_llama32(vocab=512, dim=64, inter=192, layers=2, heads=4, kv=2):
    """Llama-3.2-style config: rope_theta 500000 + llama3 rope_scaling
    (meta-llama/Llama-3.2-1B uses factor=32; scaled down to the tiny shape's
    proportions but exercising all three frequency bands)."""
    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, rope_theta=500000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        attn_implementation="eager",
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
    )
    torch.manual_seed(2)
    return LlamaForCausalLM(cfg).eval()


def _hf_qwen2(vocab=512, dim=64, inter=192, layers=2, heads=4, kv=2):
    cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=dim, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, rope_theta=1000000.0,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    return Qwen2ForCausalLM(cfg).eval()


def _to_ours(hf_model):
    cfg = config_from_hf(hf_model.config.to_dict())
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    params = params_from_state_dict(cfg, sd)
    return cfg, to_device(params, dtype=jnp.float32)


@pytest.mark.parametrize("maker", [_hf_llama, _hf_llama32, _hf_qwen2],
                         ids=["llama", "llama3.2-rope-scaling", "qwen2"])
def test_prefill_logits_match_hf(maker):
    hf = maker()
    cfg, params = _to_ours(hf)
    B, T = 2, 12
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, cfg.vocab_size, (B, T), dtype=np.int32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens).long()).logits.numpy()

    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    positions = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    logits, _ = decoder.forward(
        cfg, params, jnp.asarray(tokens), jnp.asarray(positions), cache
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-3)


def test_decode_matches_prefill():
    hf = _hf_llama()
    cfg, params = _to_ours(hf)
    B, T = 2, 10
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.vocab_size, (B, T), dtype=np.int32)

    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    positions = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
    full_logits, _ = decoder.forward(
        cfg, params, jnp.asarray(tokens), jnp.asarray(positions), cache
    )

    # token-by-token decode must reproduce the same per-position logits
    cache = decoder.init_kv_cache(cfg, batch=B, max_len=32)
    for t in range(T):
        step_logits, cache = decoder.decode_step(
            cfg, params,
            jnp.asarray(tokens[:, t]), jnp.full((B,), t, jnp.int32), cache,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full_logits[:, t]),
            atol=3e-5, rtol=1e-4, err_msg=f"pos {t}",
        )


def test_prefill_ragged_last_logit():
    hf = _hf_llama()
    cfg, params = _to_ours(hf)
    rng = np.random.default_rng(5)
    lens = [4, 9]
    T = max(lens)
    tokens = rng.integers(0, cfg.vocab_size, (2, T), dtype=np.int32)

    cache = decoder.init_kv_cache(cfg, batch=2, max_len=32)
    last, _ = decoder.prefill(
        cfg, params, jnp.asarray(tokens), cache,
        prompt_lens=jnp.asarray(lens, jnp.int32),
    )
    # row i's last logits must equal an unpadded single-row run of length lens[i]
    for i, ln in enumerate(lens):
        cache1 = decoder.init_kv_cache(cfg, batch=1, max_len=32)
        solo, _ = decoder.prefill(cfg, params, jnp.asarray(tokens[i : i + 1, :ln]), cache1)
        np.testing.assert_allclose(
            np.asarray(last[i]), np.asarray(solo[0]), atol=3e-5, rtol=1e-4
        )
