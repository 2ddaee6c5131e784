"""Decode-attention kernel vs XLA reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.ops.attention import attend_xla
from qwen3_asr_tpu.ops.decode_attention import decode_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _ref(q, k, v, valid_from, valid_to):
    b, _, _, _ = q.shape
    s = k.shape[2]
    cols = jnp.arange(s)[None, :]
    mask = (cols >= valid_from[:, None]) & (cols < valid_to[:, None])
    return attend_xla(q, k, v, mask=mask[:, None, None, :])


def test_decode_matches_reference():
    b, nq, nkv, s, d = 2, 16, 8, 512, 64
    q = _rand(0, (b, nq, 1, d))
    k, v = _rand(1, (b, nkv, s, d)), _rand(2, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([200, 512], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_left_padding():
    b, nq, nkv, s, d = 2, 4, 2, 256, 32
    q = _rand(3, (b, nq, 1, d))
    k, v = _rand(4, (b, nkv, s, d)), _rand(5, (b, nkv, s, d))
    vf = jnp.asarray([10, 100], jnp.int32)
    vt = jnp.asarray([150, 256], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_unaligned_cache():
    """S not a multiple of block_k exercises padding."""
    b, nq, nkv, s, d = 1, 8, 4, 300, 64
    q = _rand(6, (b, nq, 1, d))
    k, v = _rand(7, (b, nkv, s, d)), _rand(8, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([300], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_stacked_layer_indexing():
    """Stacked [L,B,Nkv,S,D] cache + layer_idx matches slicing by hand."""
    L, b, nq, nkv, s, d = 3, 2, 8, 4, 256, 64
    q = _rand(20, (b, nq, 1, d))
    k_all = _rand(21, (L, b, nkv, s, d))
    v_all = _rand(22, (L, b, nkv, s, d))
    vf = jnp.asarray([0, 64], jnp.int32)
    vt = jnp.asarray([200, 256], jnp.int32)
    for layer in range(L):
        ours = decode_attention(q, k_all, v_all, layer_idx=layer,
                                kv_valid_from=vf, kv_valid_to=vt,
                                interpret=True)
        ref = _ref(q, k_all[layer], v_all[layer], vf, vt)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"layer {layer}")


def test_decode_stacked_traced_layer_idx():
    """layer_idx as a traced scalar (the scan-body case) under jit."""
    L, b, nq, nkv, s, d = 2, 1, 4, 2, 128, 64
    q = _rand(23, (b, nq, 1, d))
    k_all = _rand(24, (L, b, nkv, s, d))
    v_all = _rand(25, (L, b, nkv, s, d))
    vt = jnp.asarray([100], jnp.int32)

    @jax.jit
    def run(idx):
        return decode_attention(q, k_all, v_all, layer_idx=idx,
                                kv_valid_to=vt, interpret=True)

    for layer in range(L):
        ours = run(jnp.int32(layer))
        ref = _ref(q, k_all[layer], v_all[layer],
                   jnp.zeros((b,), jnp.int32), vt)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_greedy_decode_through_stacked_kernel(monkeypatch):
    """Full greedy_generate parity: stacked-kernel decode (interpret mode)
    must produce token-identical output to the XLA path."""
    from qwen3_asr_tpu.models.config import DecoderConfig
    from qwen3_asr_tpu.models.decoder import init_decoder_params
    from qwen3_asr_tpu.runtime.generate import greedy_generate

    cfg = DecoderConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, head_dim=64,
                        rms_norm_eps=1e-6, rope_theta=10000.0,
                        tie_word_embeddings=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    b, prompt = 2, 12
    embeds = _rand(26, (b, prompt, cfg.hidden_size)) * 0.3
    vf = jnp.asarray([0, 3], jnp.int32)

    monkeypatch.delenv("ASR_ATTN_BACKEND", raising=False)
    ref = greedy_generate(params, cfg, embeds, vf, max_new=8,
                          eos_id=1, pad_id=0, cache_dtype=jnp.float32)

    monkeypatch.setenv("ASR_ATTN_BACKEND", "decode_interpret")
    monkeypatch.setenv("ASR_STACKED_DECODE_MIN_S", "128")
    ours = greedy_generate(params, cfg, embeds, vf, max_new=8,
                           eos_id=1, pad_id=0, cache_dtype=jnp.float32)

    np.testing.assert_array_equal(np.asarray(ours.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(ours.lengths),
                                  np.asarray(ref.lengths))


def test_greedy_decode_unrolled_parity(monkeypatch):
    """Unrolled decode layers (static indices) must be token-identical to
    the scanned form."""
    from qwen3_asr_tpu.models.config import DecoderConfig
    from qwen3_asr_tpu.models.decoder import init_decoder_params
    from qwen3_asr_tpu.runtime.generate import greedy_generate

    cfg = DecoderConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=3, num_attention_heads=2,
                        num_key_value_heads=1, head_dim=64,
                        rms_norm_eps=1e-6, rope_theta=10000.0,
                        tie_word_embeddings=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    b, prompt = 2, 10
    embeds = _rand(27, (b, prompt, cfg.hidden_size)) * 0.3
    vf = jnp.asarray([0, 2], jnp.int32)

    monkeypatch.setenv("ASR_DECODER_UNROLL", "false")
    ref = greedy_generate(params, cfg, embeds, vf, max_new=8,
                          eos_id=1, pad_id=0, cache_dtype=jnp.float32)
    monkeypatch.setenv("ASR_DECODER_UNROLL", "true")
    ours = greedy_generate(params, cfg, embeds, vf, max_new=8,
                           eos_id=1, pad_id=0, cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(ours.tokens),
                                  np.asarray(ref.tokens))


def test_decode_bf16():
    b, nq, nkv, s, d = 1, 16, 8, 384, 128
    q = _rand(9, (b, nq, 1, d), jnp.bfloat16)
    k = _rand(10, (b, nkv, s, d), jnp.bfloat16)
    v = _rand(11, (b, nkv, s, d), jnp.bfloat16)
    vt = jnp.asarray([256], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_to=vt, interpret=True)
    ref = _ref(q, k, v, jnp.zeros((b,), jnp.int32), vt)
    assert ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_backend_resolution():
    """Dispatch invariants (regression: the careful scores-side-scales
    gating in models/decoder was not binding — attend_spec's own auto
    branch re-selected the Pallas decode kernel at S>=2048 and FOLDED the
    int4 scales into K/V, materializing the widened cache in HBM)."""
    from qwen3_asr_tpu.ops.attention import _resolve_backend

    def r(backend="auto", **kw):
        base = dict(is_decode_step=True, on_tpu=True, has_scales=False,
                    s_len=4096, head_dim=128, t=1)
        base.update(kw)
        return _resolve_backend(backend, **base)

    # long-cache decode step on TPU: the decode kernel — UNLESS the cache
    # carries sub-byte dequant scales, which must ride the XLA scores side
    assert r() == "decode"
    assert r(has_scales=True) == "xla"
    # prefill folds scales deliberately (once per request, MXU-bound)
    assert r(is_decode_step=False, t=256, has_scales=True) == "flash"
    # explicit Pallas opt-ins decline on non-TPU hosts instead of crashing
    assert r(backend="decode", on_tpu=False) == "xla"
    assert r(backend="flash", on_tpu=False, is_decode_step=False,
             t=256) == "xla"
    # interpret-mode opt-ins are honored anywhere (CPU tests rely on it)
    assert r(backend="flash_interpret", on_tpu=False) == "flash_interpret"
    # short caches stay on the fused XLA einsum (measured faster)
    assert r(s_len=512) == "xla"
    # the decode opt-in never downgrades prefill/encoder attention
    assert r(backend="decode", is_decode_step=False, t=256) == "flash"


def test_decode_short_cache():
    """Caches shorter than one 128-lane block must pad up, not break the
    [G, block_k] vs [G, 128] softmax-stat broadcast at trace time."""
    b, nq, nkv, s, d = 2, 8, 4, 64, 64
    q = _rand(20, (b, nq, 1, d))
    k, v = _rand(21, (b, nkv, s, d)), _rand(22, (b, nkv, s, d))
    vf = jnp.asarray([0, 5], jnp.int32)
    vt = jnp.asarray([64, 40], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_decode_sub_lane_block_k_clamped():
    """An explicit block_k below the 128-lane scratch width is clamped, not
    a trace-time broadcast error."""
    b, nq, nkv, s, d = 1, 4, 2, 256, 32
    q = _rand(23, (b, nq, 1, d))
    k, v = _rand(24, (b, nkv, s, d)), _rand(25, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([256], jnp.int32)
    ours = decode_attention(q, k, v, kv_valid_from=vf, kv_valid_to=vt,
                            block_k=64, interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
