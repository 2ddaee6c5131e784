"""Phase breakdown of the fused transcription path at bench shapes.

Times, per batch (default B=32, 20 s clips, 1.7B int8 + fp8 KV):
  1. mel frontend only
  2. frontend + encoder
  3. frontend + encoder + prefill (+ first logits)
  4. the full fused executable (engine._fused_fn) = 3 + decode loop

Run: python tools_perf/e2e_phases.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("QUANTIZE", "int8")
os.environ.setdefault("ASR_KV_CACHE_DTYPE", "fp8")

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.runtime.engine import enable_compilation_cache

enable_compilation_cache()

B = int(os.getenv("MB_B", "32"))
CLIP_S = float(os.getenv("MB_CLIP_S", "20"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_engine  # noqa: E402

dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
cache_dtype = jnp.float8_e4m3fn if jax.default_backend() == "tpu" else dtype
engine = build_engine("1.7b" if jax.default_backend() == "tpu" else "tiny",
                      dtype, cache_dtype)

model = engine.model
cfg = model.cfg
bucket_frames, bucket_s = engine.bucket_frames(int(16000 * CLIP_S))
n_samples = bucket_frames * 160
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, n_samples)).astype(np.float32)
                    * 0.05)

from qwen3_asr_tpu.audio.frontend import _log_mel_impl  # noqa: E402
from qwen3_asr_tpu.models.encoder import encoder_forward  # noqa: E402
from qwen3_asr_tpu.models.decoder import (  # noqa: E402
    decoder_forward, embed_tokens, init_kv_cache, lm_logits)
from qwen3_asr_tpu.ops.attention import AttnSpec  # noqa: E402
from qwen3_asr_tpu.runtime.engine import PREFIX_BUDGET  # noqa: E402

window, mel_fb, n_mels = (engine.frontend.window, engine.frontend.mel_fb,
                          engine.frontend.n_mels)
suffix = jnp.asarray(engine._suffix_ids, jnp.int32)
params = model.params


# Params are ARGUMENTS, not closure constants — capturing the 2+ GB weight
# tree as lowered constants makes remote compiles pathologically slow.
def _mel(audio):
    def one(a):
        m, _ = _log_mel_impl(a, jnp.int32(n_samples), window, mel_fb, n_mels)
        return m
    return jax.vmap(one)(audio).astype(dtype)


@jax.jit
def mel_only(audio):
    return _mel(audio)


@jax.jit
def mel_encoder(p, audio):
    mel = _mel(audio)
    flens = jnp.full((B,), bucket_frames, jnp.int32)
    out, _ = encoder_forward(p["encoder"], cfg.encoder, mel, flens)
    return out


@jax.jit
def mel_enc_prefill(p, audio, prefix_ids, valid_from):
    mel = _mel(audio)
    flens = jnp.full((B,), bucket_frames, jnp.int32)
    audio_embeds, _ = encoder_forward(p["encoder"], cfg.encoder, mel,
                                      flens)
    pre = embed_tokens(p["decoder"], cfg.decoder, prefix_ids)
    suf = embed_tokens(p["decoder"], cfg.decoder,
                       jnp.broadcast_to(suffix[None], (B, suffix.shape[0])))
    inputs = jnp.concatenate([pre.astype(dtype), audio_embeds.astype(dtype),
                              suf.astype(dtype)], axis=1)
    b, t, _ = inputs.shape
    total = -(-(t + 8) // 128) * 128
    cache = init_kv_cache(cfg.decoder, b, total, dtype=cache_dtype)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    spec = AttnSpec(causal=True, q_offset=0, valid_from=valid_from)
    hidden, cache = decoder_forward(p["decoder"], cfg.decoder, inputs,
                                    positions, cache, jnp.int32(0), spec)
    return jnp.argmax(lm_logits(p["decoder"], cfg.decoder,
                                hidden[:, -1]), axis=-1)


prefix_ids = jnp.full((B, PREFIX_BUDGET), model.pad_id, jnp.int32)
valid_from = jnp.full((B,), PREFIX_BUDGET - 8, jnp.int32)

full = engine._fused_fn(bucket_frames, bucket_s)


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


t_mel = timed(mel_only, audio)
t_enc = timed(mel_encoder, params, audio)
t_pre = timed(mel_enc_prefill, params, audio, prefix_ids, valid_from)
t_full = timed(full, params, audio, prefix_ids, valid_from)

print(f"B={B} clip={CLIP_S}s bucket={bucket_s}s frames={bucket_frames}")
print(f"mel frontend            {t_mel*1e3:8.1f} ms")
print(f"+ encoder               {t_enc*1e3:8.1f} ms  (enc {1e3*(t_enc-t_mel):.1f})")
print(f"+ prefill               {t_pre*1e3:8.1f} ms  (prefill {1e3*(t_pre-t_enc):.1f})")
print(f"full fused (with decode){t_full*1e3:8.1f} ms  (decode {1e3*(t_full-t_pre):.1f})")
