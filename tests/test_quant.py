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


def test_kv_quantize_roundtrip_error():
    """int4 KV quantization: symmetric absmax per (token, head) bounds the
    reconstruction error at scale/2 = absmax/14 per element."""
    from qwen3_asr_tpu.models.decoder import _kv_quantize
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 16, 64)) * 3.0
    q, scale = _kv_quantize(x)
    assert q.dtype == jnp.int4 and scale.dtype == jnp.bfloat16
    recon = q.astype(jnp.float32) * scale.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    err = jnp.max(jnp.abs(recon - x) / absmax)
    assert float(err) < 1.0 / 14.0 + 0.02  # scale/2 + bf16 scale rounding


def test_int4_kv_cache_generation():
    """int4 KV cache (values + scale planes): generation runs end to end and
    emits valid tokens; the cache pytree carries the scale leaves."""
    from qwen3_asr_tpu.models.decoder import init_kv_cache
    cfg = preset("tiny")
    params = init_decoder_params(cfg.decoder, jax.random.PRNGKey(11))
    embeds = jax.random.normal(jax.random.PRNGKey(12), (1, 10, 64))
    vf = jnp.zeros((1,), jnp.int32)

    cache = jax.jit(lambda: init_kv_cache(cfg.decoder, 1, 128,
                                          dtype=jnp.int4))()
    assert cache.k.dtype == jnp.int4 and cache.k_scale is not None
    assert cache.k_scale.shape == cache.k.shape[:-1] + (1,)

    # jit the whole generation: eager int4 zero-fill trips a jax bug and
    # the serving path always creates the cache under jit anyway.
    @jax.jit
    def gen(p):
        return greedy_generate(p, cfg.decoder, embeds, vf, max_new=8,
                               eos_id=cfg.eos_token_id,
                               pad_id=cfg.pad_token_id,
                               cache_dtype=jnp.int4)

    out = gen(params)
    assert out.tokens.shape == (1, 8)
    assert int(jnp.max(out.tokens)) < cfg.decoder.vocab_size


def test_int4_kv_decode_step_agrees_with_f32():
    """One prefill + one decode step: int4-cache hidden states stay within
    quantization tolerance of the f32-cache path."""
    from qwen3_asr_tpu.models.decoder import (
        decoder_forward, embed_tokens, init_kv_cache)
    from qwen3_asr_tpu.ops.attention import AttnSpec
    cfg = preset("tiny").decoder
    params = init_decoder_params(cfg, jax.random.PRNGKey(21))
    b, t = 2, 6
    embeds = jax.random.normal(jax.random.PRNGKey(22), (b, t, cfg.hidden_size))
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    vf = jnp.zeros((b,), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(params, use_int4):
        cache = init_kv_cache(cfg, b, 128,
                              dtype=jnp.int4 if use_int4 else jnp.float32)
        spec = AttnSpec(causal=True, q_offset=0, valid_from=vf)
        hidden, cache = decoder_forward(params, cfg, embeds, positions,
                                        cache, jnp.int32(0), spec)
        step = embed_tokens(params, cfg, jnp.full((b, 1), 3, jnp.int32))
        spec1 = AttnSpec(valid_from=vf, valid_to=jnp.full((b,), t + 1,
                                                          jnp.int32))
        hidden1, _ = decoder_forward(params, cfg, step,
                                     jnp.full((b, 1), t, jnp.int32),
                                     cache, jnp.int32(t), spec1)
        return hidden1

    full = run(params, False)
    q4 = run(params, True)
    np.testing.assert_allclose(np.asarray(q4), np.asarray(full),
                               atol=0.35, rtol=0.35)


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


# ── int4 weight-only (grouped, packed-nibble storage) ───────────────────────

def test_int4_roundtrip_error_bounded():
    """Group-wise 4-bit is coarser than int8 but must stay within the
    symmetric-quant bound: |err| <= scale/2 = absmax(group)/14."""
    from qwen3_asr_tpu.ops.quant import dequantize, quantize_array
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((256, 96)) * 0.05, jnp.float32)
    q = quantize_array(w, "int4")
    assert q["q"].dtype == jnp.uint8 and q["q"].shape == (128, 96)
    assert q["s"].shape == (2, 96)        # groups of 128 along K
    err = jnp.abs(dequantize(q, jnp.float32) - w)
    bound = jnp.repeat(q["s"], 128, axis=0) / 2 + 1e-7
    assert bool(jnp.all(err <= bound))


def test_int4_qdot_matches_dequant_matmul():
    """The grouped-einsum decomposition must equal x @ dequantize(w)."""
    from qwen3_asr_tpu.ops.quant import dequantize, qdot, quantize_array
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((256, 192)) * 0.05, jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 7, 256)), jnp.float32)
    q = quantize_array(w, "int4")
    out = qdot(x, q)
    ref = x @ dequantize(q, jnp.float32)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_int4_memory_quarters():
    from qwen3_asr_tpu.ops.quant import param_bytes, quantize_decoder_params
    cfg = preset("tiny")
    params = init_decoder_params(cfg.decoder, jax.random.PRNGKey(2))
    before = param_bytes(params["layers"])
    after = param_bytes(quantize_decoder_params(params, "int4")["layers"])
    assert after < 0.35 * before


def test_int4_generation_runs():
    cfg = preset("tiny")
    params = init_decoder_params(cfg.decoder, jax.random.PRNGKey(5))
    embeds = jax.random.normal(jax.random.PRNGKey(6), (1, 12, 64))
    vf = jnp.zeros((1,), jnp.int32)
    out = greedy_generate(quantize_decoder_params(params, "int4"),
                          cfg.decoder, embeds, vf, max_new=8,
                          eos_id=cfg.eos_token_id, pad_id=cfg.pad_token_id,
                          cache_dtype=jnp.float32)
    assert int(jnp.max(out.tokens)) < cfg.decoder.vocab_size


def test_int4_embed_and_lm_head():
    """Packed-H embedding lookup and tied logits agree with dequantized."""
    from qwen3_asr_tpu.models.decoder import embed_tokens, lm_logits
    from qwen3_asr_tpu.ops.quant import dequantize, quantize_embed
    cfg = preset("tiny").decoder
    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((cfg.vocab_size, cfg.hidden_size))
                      * 0.05, jnp.float32)
    qe = quantize_embed(emb, "int4")
    params = {"embed": qe}
    ids = jnp.asarray([[1, 5, 9]], jnp.int32)
    got = embed_tokens(params, cfg, ids)
    want = jnp.take(dequantize(qe, jnp.float32), ids, axis=0)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-5

    h = jnp.asarray(rng.standard_normal((2, cfg.hidden_size)), jnp.float32)
    assert cfg.tie_word_embeddings
    logits = lm_logits(params, cfg, h)
    ref = h @ dequantize(qe, jnp.float32).T
    assert float(jnp.max(jnp.abs(logits - ref))) < 1e-3


def test_int4_engine_end_to_end(tmp_path, monkeypatch):
    """QUANTIZE=int4 through the full lifecycle load + transcribe path."""
    from tests.fixtures import write_tiny_checkpoint
    from tests.util_audio import speech_like
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("QUANTIZE", "int4")
    engine = _load_engine_sync(ckpt)
    # NOT vacuous: the lifecycle must actually have applied int4
    # (regression: the quantize gate once excluded "int4" silently)
    wq = engine.model.params["decoder"]["layers"]["wq"]
    assert isinstance(wq, dict) and wq["q"].dtype == jnp.uint8
    res = engine.transcribe(speech_like(0.8, seed=40), 16000, language="en")
    assert len(res) == 1 and isinstance(res[0].text, str)


def test_int4_untied_lm_head():
    """Untied lm_head [H, V] under int4: the grouped logits path must
    reshape the unpacked weight before the G-way einsum (regression:
    it crashed at trace time)."""
    import dataclasses
    from qwen3_asr_tpu.models.decoder import lm_logits
    from qwen3_asr_tpu.ops.quant import dequantize
    cfg = dataclasses.replace(preset("tiny").decoder,
                              tie_word_embeddings=False)
    params = init_decoder_params(cfg, jax.random.PRNGKey(9))
    assert "lm_head" in params
    q = quantize_decoder_params(params, "int4")
    assert q["lm_head"]["q"].dtype == jnp.uint8
    h = jax.random.normal(jax.random.PRNGKey(10), (2, cfg.hidden_size))
    logits = lm_logits(q, cfg, h)
    ref = h @ dequantize(q["lm_head"], jnp.float32)
    assert float(jnp.max(jnp.abs(logits - ref))) < 1e-3


def test_w8a8_matches_float_matmul(monkeypatch):
    """ASR_INT8_ACT routes big int8 matmuls through int8×int8→int32 with
    per-row dynamic activation scales; error stays within the combined
    weight+activation quantization step."""
    monkeypatch.setenv("ASR_INT8_ACT", "true")
    monkeypatch.setenv("ASR_INT8_ACT_MIN_TOKENS", "8")
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 96)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 64))
    q = quantize_array(w, "int8")
    got = np.asarray(qdot(x, q))
    ref = np.asarray(x @ w)
    # per-row act step × sqrt(K) accumulation + weight step contribution
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.02
    # 3-D activations (B, T, K) hit the same path
    x3 = x.reshape(2, 8, 64)
    got3 = np.asarray(qdot(x3, q))
    assert np.allclose(got3.reshape(16, 96), got, atol=1e-6)


def test_w8a8_threshold_keeps_decode_on_dequant_path(monkeypatch):
    """Below ASR_INT8_ACT_MIN_TOKENS rows the dequant-in-matmul form is
    used — bitwise-identical to the flag being off (decode steps must not
    pay the per-row quantize)."""
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 96)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64))  # 4 rows
    q = quantize_array(w, "int8")
    monkeypatch.delenv("ASR_INT8_ACT", raising=False)
    off = np.asarray(qdot(x, q))
    monkeypatch.setenv("ASR_INT8_ACT", "true")
    monkeypatch.setenv("ASR_INT8_ACT_MIN_TOKENS", "1024")
    gated = np.asarray(qdot(x, q))
    assert np.array_equal(off, gated)


def test_w8a8_ignores_fp8_and_int4_weights(monkeypatch):
    """W8A8 applies to int8 weights only; fp8/int4 keep their own paths."""
    monkeypatch.setenv("ASR_INT8_ACT", "true")
    monkeypatch.setenv("ASR_INT8_ACT_MIN_TOKENS", "1")
    w = jax.random.normal(jax.random.PRNGKey(7), (64, 96)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 64))
    for mode in ("fp8", "int4"):
        q = quantize_array(w, mode)
        got = np.asarray(qdot(x, q))
        ref = np.asarray(x @ dequantize(q, jnp.float32))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02
