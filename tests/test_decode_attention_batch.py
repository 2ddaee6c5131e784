"""Batch-major streaming decode kernel vs XLA reference (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.ops.attention import attend_xla
from qwen3_asr_tpu.ops.decode_attention_batch import (
    decode_attention_batched, pick_tile)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _ref(q, k, v, valid_from, valid_to):
    s = k.shape[-2]
    cols = jnp.arange(s)[None, :]
    mask = (cols >= valid_from[:, None]) & (cols < valid_to[:, None])
    return attend_xla(q, k, v, mask=mask[:, None, None, :])


def test_batched_matches_reference():
    b, nq, nkv, s, d = 4, 8, 4, 256, 128
    q = _rand(0, (b, nq, 1, d))
    k, v = _rand(1, (b, nkv, s, d)), _rand(2, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([100, 256, 37, 192], jnp.int32)
    ours = decode_attention_batched(q, k, v, kv_valid_from=vf,
                                    kv_valid_to=vt, interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_batched_left_padding_multi_block():
    b, nq, nkv, s, d = 8, 16, 8, 256, 128
    q = _rand(3, (b, nq, 1, d))
    k, v = _rand(4, (b, nkv, s, d)), _rand(5, (b, nkv, s, d))
    vf = jnp.asarray([10, 100, 0, 64, 128, 200, 5, 0], jnp.int32)
    vt = jnp.asarray([150, 256, 64, 65, 256, 201, 37, 256], jnp.int32)
    ours = decode_attention_batched(q, k, v, kv_valid_from=vf,
                                    kv_valid_to=vt, rows=4, block_s=64,
                                    interpret=True)
    ref = _ref(q, k, v, vf, vt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_batched_stacked_layer_select():
    """Stacked [L,...] cache + layer_idx must match slicing that layer."""
    lyrs, b, nq, nkv, s, d = 3, 4, 8, 4, 128, 128
    q = _rand(6, (b, nq, 1, d))
    k = _rand(7, (lyrs, b, nkv, s, d))
    v = _rand(8, (lyrs, b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.full((b,), s, jnp.int32)
    for lyr in (0, 2):
        ours = decode_attention_batched(
            q, k, v, layer_idx=jnp.int32(lyr), kv_valid_from=vf,
            kv_valid_to=vt, rows=4, block_s=64, interpret=True)
        ref = _ref(q, k[lyr], v[lyr], vf, vt)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)


def test_batched_fp8_cache_dequant():
    """fp8 cache is dequantized in VMEM; agreement within fp8 tolerance."""
    b, nq, nkv, s, d = 4, 8, 4, 128, 128
    q = _rand(9, (b, nq, 1, d), jnp.bfloat16)
    k = _rand(10, (b, nkv, s, d)).astype(jnp.float8_e4m3fn)
    v = _rand(11, (b, nkv, s, d)).astype(jnp.float8_e4m3fn)
    vt = jnp.full((b,), s, jnp.int32)
    ours = decode_attention_batched(q, k, v, kv_valid_to=vt, rows=4,
                                    block_s=64, interpret=True)
    ref = _ref(q.astype(jnp.float32),
               k.astype(jnp.float32), v.astype(jnp.float32),
               jnp.zeros((b,), jnp.int32), vt)
    np.testing.assert_allclose(np.asarray(ours, dtype=np.float32),
                               np.asarray(ref), atol=0.12, rtol=0.12)


def test_batched_fully_masked_row_is_finite():
    b, nq, nkv, s, d = 4, 8, 4, 128, 128
    q = _rand(12, (b, nq, 1, d))
    k, v = _rand(13, (b, nkv, s, d)), _rand(14, (b, nkv, s, d))
    vf = jnp.zeros((b,), jnp.int32)
    vt = jnp.asarray([0, 128, 0, 64], jnp.int32)  # rows 0/2 see nothing
    ours = decode_attention_batched(q, k, v, kv_valid_from=vf,
                                    kv_valid_to=vt, rows=4, block_s=64,
                                    interpret=True)
    assert np.isfinite(np.asarray(ours)).all()
    np.testing.assert_allclose(np.asarray(ours[0]), 0.0, atol=1e-6)


def test_greedy_decode_through_bstream_kernel(monkeypatch):
    """Full greedy_generate parity: bstream-kernel decode (interpret mode)
    must produce token-identical output to the XLA path."""
    from qwen3_asr_tpu.models.config import DecoderConfig
    from qwen3_asr_tpu.models.decoder import init_decoder_params
    from qwen3_asr_tpu.runtime.generate import greedy_generate

    cfg = DecoderConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=1, head_dim=128,
                        rms_norm_eps=1e-6, rope_theta=10000.0,
                        tie_word_embeddings=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    b, prompt = 2, 12
    embeds = _rand(26, (b, prompt, cfg.hidden_size)) * 0.3
    vf = jnp.asarray([0, 3], jnp.int32)

    monkeypatch.delenv("ASR_ATTN_BACKEND", raising=False)
    ref = greedy_generate(params, cfg, embeds, vf, max_new=8,
                          eos_id=1, pad_id=0, cache_dtype=jnp.float32)

    monkeypatch.setenv("ASR_ATTN_BACKEND", "bstream_interpret")
    ours = greedy_generate(params, cfg, embeds, vf, max_new=8,
                           eos_id=1, pad_id=0, cache_dtype=jnp.float32)

    np.testing.assert_array_equal(np.asarray(ours.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(ours.lengths),
                                  np.asarray(ref.lengths))


def test_pick_tile_serving_shapes():
    # 1.7B serving config: B96, n_q 16, n_kv 8, fp8.
    assert pick_tile(96, 16, 8, 512, 1) is not None
    rows, bs = pick_tile(96, 16, 8, 512, 1)
    assert 96 % rows == 0 and 512 % bs == 0 and rows * 16 >= 64
    # bf16 cache still tiles (smaller blocks).
    assert pick_tile(96, 16, 8, 512, 2) is not None
    # pool-slot batches.
    assert pick_tile(8, 16, 8, 640 // 128 * 128, 1) is not None
    # indivisible batch degrades to single-row tiles.
    assert pick_tile(7, 16, 8, 512, 1) == (1, 128)
    # unaligned cache length cannot tile at all.
    assert pick_tile(96, 16, 8, 500, 1) is None
