"""Microbenchmark: isolate per-decode-step costs on the real TPU.

Measures, for the 1.7B decoder shapes (batch 16, cache 512):
  1. full decode step (layers scan + lm_logits) per weight/cache dtype
  2. lm_logits alone (the 151k-vocab matmul)
  3. layers scan alone
  4. attention (cache read) alone

Run: python tools_perf/decode_micro.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import (
    KVCache, decoder_forward, embed_tokens, init_decoder_params, init_kv_cache,
    lm_logits)
from qwen3_asr_tpu.ops.attention import AttnSpec
from qwen3_asr_tpu.ops.quant import quantize_decoder_params
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache

enable_compilation_cache()

B = int(os.getenv("MB_B", "16"))
S = int(os.getenv("MB_S", "512"))
STEPS = int(os.getenv("MB_STEPS", "64"))

cfg = preset("1.7b").decoder
key = jax.random.PRNGKey(0)


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def make_step(params, cache_dtype):
    """One jitted executable running STEPS sequential decode steps."""

    @jax.jit
    def run(params, last, cache):
        def body(i, carry):
            last, cache = carry
            pos = S // 2 + i
            hidden = embed_tokens(params, cfg, last[:, None])
            positions = jnp.full((B, 1), pos, jnp.int32)
            spec = AttnSpec(valid_from=jnp.zeros((B,), jnp.int32),
                            valid_to=jnp.full((B,), pos + 1, jnp.int32))
            hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                            cache, pos, spec)
            nxt = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                             axis=-1).astype(jnp.int32)
            return nxt, cache
        last, cache = jax.lax.fori_loop(0, STEPS, body, (last, cache))
        return last

    return run


def make_scan_only(params):
    @jax.jit
    def run(params, last, cache):
        def body(i, carry):
            last, cache = carry
            pos = S // 2 + i
            hidden = embed_tokens(params, cfg, last[:, None])
            positions = jnp.full((B, 1), pos, jnp.int32)
            spec = AttnSpec(valid_from=jnp.zeros((B,), jnp.int32),
                            valid_to=jnp.full((B,), pos + 1, jnp.int32))
            hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                            cache, pos, spec)
            # cheap readout instead of lm_logits
            nxt = (jnp.sum(hidden[:, -1], axis=-1) * 0).astype(jnp.int32) + last
            return nxt, cache
        last, cache = jax.lax.fori_loop(0, STEPS, body, (last, cache))
        return last
    return run


def make_logits_only(params):
    @jax.jit
    def run(params, h):
        def body(i, h):
            out = lm_logits(params, cfg, h)
            return h + (jnp.max(out, axis=-1, keepdims=True) * 0).astype(h.dtype)
        return jax.lax.fori_loop(0, STEPS, body, h)
    return run


def report(name, secs):
    per_step = secs / STEPS * 1e3
    print(f"{name:45s} {per_step:8.3f} ms/step")


params_bf16 = jax.jit(
    lambda: init_decoder_params(cfg, key, jnp.bfloat16))()
last0 = jnp.zeros((B,), jnp.int32)

for qmode in ["bf16", "int8"]:
    p = params_bf16 if qmode == "bf16" else jax.jit(
        functools.partial(quantize_decoder_params, mode="int8"))(params_bf16)
    for kv in ["bf16", "fp8"]:
        cache_dtype = jnp.bfloat16 if kv == "bf16" else jnp.float8_e4m3fn
        cache = init_kv_cache(cfg, B, S, dtype=cache_dtype)
        fn = make_step(p, cache_dtype)
        secs = timed(fn, p, last0, cache)
        report(f"full step  w={qmode} kv={kv}", secs)

# isolate: scan-only and logits-only, bf16 and int8 weights
p_int8 = jax.jit(functools.partial(quantize_decoder_params, mode="int8"))(
    params_bf16)
for qmode, p in [("bf16", params_bf16), ("int8", p_int8)]:
    cache = init_kv_cache(cfg, B, S, dtype=jnp.float8_e4m3fn)
    secs = timed(make_scan_only(p), p, last0, cache)
    report(f"layers-only w={qmode} kv=fp8", secs)
    h = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)
    secs = timed(make_logits_only(p), p, h)
    report(f"lm_logits-only w={qmode}", secs)
