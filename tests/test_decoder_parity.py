"""Parity tests: JAX Qwen3 decoder vs HuggingFace torch Qwen3ForCausalLM.

A tiny random HF model is instantiated on CPU, its state_dict converted via
the production converter, and logits compared — the fidelity guardrail for
the decode path (SURVEY.md §7.3 hard part 1) without downloadable weights.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import DecoderConfig
from qwen3_asr_tpu.models.decoder import (
    KVCache,
    decoder_forward,
    embed_tokens,
    init_decoder_params,
    init_kv_cache,
    lm_logits,
)
from qwen3_asr_tpu.ops.attention import AttnSpec
from qwen3_asr_tpu.runtime.checkpoint import convert_decoder_state_dict

CFG = DecoderConfig(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, rope_theta=1_000_000.0, tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM
    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        head_dim=CFG.head_dim, rope_theta=CFG.rope_theta,
        tie_word_embeddings=True, attn_implementation="eager",
    )
    model = Qwen3ForCausalLM(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return convert_decoder_state_dict(sd, CFG, dtype=jnp.float32)


def _hf_logits(hf_model, ids: np.ndarray) -> np.ndarray:
    import torch
    with torch.no_grad():
        out = hf_model(torch.from_numpy(ids))
    return out.logits.numpy()


def _jax_logits(params, ids: np.ndarray) -> np.ndarray:
    b, t = ids.shape
    cache = init_kv_cache(CFG, b, t, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    hidden = embed_tokens(params, CFG, jnp.asarray(ids))
    hidden, _ = decoder_forward(params, CFG, hidden, positions, cache,
                                jnp.int32(0), AttnSpec(causal=True))
    return np.asarray(lm_logits(params, CFG, hidden))


def test_prefill_logits_match_hf(hf_model, jax_params):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 17), dtype=np.int64)
    ours = _jax_logits(jax_params, ids)
    theirs = _hf_logits(hf_model, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_greedy_continuation_matches_hf(hf_model, jax_params):
    """Token-by-token KV-cache decode must equal HF full-context argmax."""
    import torch
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 9), dtype=np.int64)
    n_new = 8

    # HF greedy
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.from_numpy(prompt), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0)
    hf_tokens = hf_out[0, prompt.shape[1]:].numpy()

    # Ours: prefill then incremental decode with KV cache
    max_len = prompt.shape[1] + n_new
    cache = init_kv_cache(CFG, 1, max_len, dtype=jnp.float32)
    t = prompt.shape[1]
    positions = jnp.arange(t)[None, :]
    hidden = embed_tokens(jax_params, CFG, jnp.asarray(prompt))
    hidden, cache = decoder_forward(jax_params, CFG, hidden, positions, cache,
                                    jnp.int32(0), AttnSpec(causal=True))
    last = jnp.argmax(lm_logits(jax_params, CFG, hidden[:, -1]), axis=-1)

    out_tokens = [int(last[0])]
    for step in range(1, n_new):
        pos = t + step - 1
        ids = last[:, None]
        positions = jnp.array([[pos]])
        spec = AttnSpec(valid_to=jnp.array([pos + 1], jnp.int32))
        hidden = embed_tokens(jax_params, CFG, ids)
        hidden, cache = decoder_forward(jax_params, CFG, hidden, positions,
                                        cache, jnp.int32(pos), spec)
        last = jnp.argmax(lm_logits(jax_params, CFG, hidden[:, -1]), axis=-1)
        out_tokens.append(int(last[0]))

    assert out_tokens == hf_tokens.tolist()


def test_prefill_cache_equals_decode_cache(jax_params):
    """Prefilling [t0..t3] at once == feeding tokens one at a time."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 6), dtype=np.int64)
    t = ids.shape[1]

    cache_a = init_kv_cache(CFG, 1, t, dtype=jnp.float32)
    positions = jnp.arange(t)[None, :]
    hidden = embed_tokens(jax_params, CFG, jnp.asarray(ids))
    out_a, cache_a = decoder_forward(jax_params, CFG, hidden, positions,
                                     cache_a, jnp.int32(0), AttnSpec(causal=True))

    cache_b = init_kv_cache(CFG, 1, t, dtype=jnp.float32)
    outs = []
    for i in range(t):
        positions = jnp.array([[i]])
        spec = AttnSpec(valid_to=jnp.array([i + 1], jnp.int32))
        hidden = embed_tokens(jax_params, CFG, jnp.asarray(ids[:, i:i + 1]))
        out_b, cache_b = decoder_forward(jax_params, CFG, hidden, positions,
                                         cache_b, jnp.int32(i), spec)
        outs.append(out_b)
    out_b = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k),
                               atol=1e-5)


def test_random_init_params_shapes():
    params = init_decoder_params(CFG, jax.random.PRNGKey(0))
    assert params["layers"]["wq"].shape == (3, 64, 64)
    assert params["layers"]["wk"].shape == (3, 64, 32)
    assert params["embed"].shape == (512, 64)


def test_greedy_generate_function_matches_hf(hf_model, jax_params):
    """The PRODUCTION while_loop generator (not a hand-rolled loop) must
    reproduce HF greedy exactly — regression for the decode-position
    off-by-one (generated token i sits at position prompt_len+i)."""
    import torch
    from qwen3_asr_tpu.models.decoder import embed_tokens as _embed
    from qwen3_asr_tpu.runtime.generate import greedy_generate

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 11), dtype=np.int64)
    n_new = 10

    with torch.no_grad():
        hf_out = hf_model.generate(torch.from_numpy(prompt),
                                   max_new_tokens=n_new, do_sample=False,
                                   pad_token_id=0)
    hf_tokens = hf_out[0, prompt.shape[1]:].numpy().tolist()

    embeds = _embed(jax_params, CFG, jnp.asarray(prompt))
    res = greedy_generate(jax_params, CFG, embeds,
                          jnp.zeros((1,), jnp.int32), max_new=n_new,
                          eos_id=-1, pad_id=-2, cache_dtype=jnp.float32)
    assert np.asarray(res.tokens)[0].tolist() == hf_tokens


def test_resume_and_speculative_match_hf_greedy(hf_model, jax_params):
    """resume_generate and speculative_generate must agree with HF too
    (all three decode paths share the position convention)."""
    import torch
    from qwen3_asr_tpu.models.decoder import embed_tokens as _embed
    from qwen3_asr_tpu.runtime.resume import resume_generate
    from qwen3_asr_tpu.runtime.speculative import speculative_generate

    rng = np.random.default_rng(8)
    prompt = rng.integers(0, CFG.vocab_size, size=(1, 9), dtype=np.int64)
    n_new = 8
    with torch.no_grad():
        hf_out = hf_model.generate(torch.from_numpy(prompt),
                                   max_new_tokens=n_new, do_sample=False,
                                   pad_token_id=0)
    hf_tokens = hf_out[0, prompt.shape[1]:].numpy().tolist()

    embeds = _embed(jax_params, CFG, jnp.asarray(prompt))
    vf = jnp.zeros((1,), jnp.int32)

    res = resume_generate(jax_params, CFG, embeds, vf,
                          jnp.full((1, n_new), -2, jnp.int32),
                          jnp.zeros((1,), jnp.int32), max_new=n_new,
                          eos_id=-1, pad_id=-2, cache_dtype=jnp.float32)
    assert np.asarray(res.tokens)[0].tolist() == hf_tokens

    spec = speculative_generate(jax_params, jax_params, CFG, CFG, embeds,
                                embeds, vf, vf, gamma=3, max_new=n_new,
                                eos_id=-1, pad_id=-2,
                                cache_dtype=jnp.float32)
    assert np.asarray(spec.tokens)[0].tolist() == hf_tokens
