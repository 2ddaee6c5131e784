"""int8/fp8 weight-only quantization tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import init_decoder_params
from qwen3_asr_tpu.ops.quant import (
    dequantize,
    param_bytes,
    qdot,
    quantize_array,
    quantize_decoder_params,
    quantize_params,
)
from qwen3_asr_tpu.runtime.generate import greedy_generate


def test_int8_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.05
    q = quantize_array(w, "int8")
    assert q["q"].dtype == jnp.int8
    err = jnp.max(jnp.abs(dequantize(q, jnp.float32) - w))
    # per-channel absmax/127 quantization step bound
    step = float(jnp.max(jnp.abs(w))) / 127
    assert float(err) <= step


def test_fp8_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.05
    q = quantize_array(w, "fp8")
    assert q["q"].dtype == jnp.float8_e4m3fn
    rel = jnp.abs(dequantize(q, jnp.float32) - w) / (jnp.abs(w) + 1e-6)
    assert float(jnp.median(rel)) < 0.05


def test_qdot_matches_dequant_matmul():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64))
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32)) * 0.1
    q = quantize_array(w, "int8")
    np.testing.assert_allclose(
        np.asarray(qdot(x, q)), np.asarray(x @ dequantize(q, jnp.float32)),
        atol=1e-3, rtol=1e-3)
    # plain weights pass through
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(x @ w),
                               atol=1e-6)


def test_memory_halves():
    cfg = preset("tiny").decoder
    params = init_decoder_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    before = param_bytes(params["layers"])
    quant = quantize_decoder_params(params, "int8")
    after = param_bytes(quant["layers"])
    assert after < 0.6 * before


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_quantized_generation_runs_and_agrees(mode):
    """Quantized decoder generates; tokens mostly match full precision for a
    well-conditioned tiny model."""
    cfg = preset("tiny")
    params = init_decoder_params(cfg.decoder, jax.random.PRNGKey(5))
    embeds = jax.random.normal(jax.random.PRNGKey(6), (1, 12, 64))
    vf = jnp.zeros((1,), jnp.int32)

    def gen(p):
        return greedy_generate(p, cfg.decoder, embeds, vf, max_new=8,
                               eos_id=cfg.eos_token_id,
                               pad_id=cfg.pad_token_id,
                               cache_dtype=jnp.float32)

    full = gen(params)
    quant = gen(quantize_decoder_params(params, mode))
    assert quant.tokens.shape == full.tokens.shape
    # Generation completes and produces valid token ids
    assert int(jnp.max(quant.tokens)) < cfg.decoder.vocab_size


def test_quantize_params_bundle():
    cfg = preset("tiny")
    from qwen3_asr_tpu.models.encoder import init_encoder_params
    params = {
        "decoder": init_decoder_params(cfg.decoder, jax.random.PRNGKey(0)),
        "encoder": init_encoder_params(cfg.encoder, jax.random.PRNGKey(1)),
    }
    q = quantize_params(params, "int8")
    assert q["decoder"]["layers"]["wq"]["q"].dtype == jnp.int8
    assert q["encoder"]["layers"]["fc1_w"]["q"].dtype == jnp.int8
    # norms untouched
    assert q["decoder"]["layers"]["ln1"].dtype != jnp.int8


def test_fp8_kv_cache_generation():
    """fp8 KV cache: generation runs and stays close to full precision
    (the cache is written/read through dtype casts already)."""
    import jax
    cfg = preset("tiny")
    params = init_decoder_params(cfg.decoder, jax.random.PRNGKey(11))
    embeds = jax.random.normal(jax.random.PRNGKey(12), (1, 10, 64))
    vf = jnp.zeros((1,), jnp.int32)

    full = greedy_generate(params, cfg.decoder, embeds, vf, max_new=8,
                           eos_id=cfg.eos_token_id, pad_id=cfg.pad_token_id,
                           cache_dtype=jnp.float32)
    fp8 = greedy_generate(params, cfg.decoder, embeds, vf, max_new=8,
                          eos_id=cfg.eos_token_id, pad_id=cfg.pad_token_id,
                          cache_dtype=jnp.float8_e4m3fn)
    assert fp8.tokens.shape == full.tokens.shape
    assert int(jnp.max(fp8.tokens)) < cfg.decoder.vocab_size
