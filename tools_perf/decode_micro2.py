"""Decompose the decode step: weight streaming vs attention/cache vs loop.

Isolates:
  A. matmuls-only scan (28 layers of the 7 projections, no attention/cache)
  B. attention+cache-only scan (KV DUS + attend, trivial projections)
  C. matmuls-only with int8 weights
  D. same as A but with remat-free single fori (loop overhead probe)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import init_decoder_params, init_kv_cache
from qwen3_asr_tpu.ops.attention import AttnSpec, attend_spec
from qwen3_asr_tpu.ops.quant import qdot, quantize_decoder_params
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache

enable_compilation_cache()

B, S, STEPS = 16, 512, 64
cfg = preset("1.7b").decoder
key = jax.random.PRNGKey(0)
params = jax.jit(lambda: init_decoder_params(cfg, key, jnp.bfloat16))()


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n / STEPS * 1e3


def matmuls_step(lp, x):
    nq, nkv, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    q = qdot(x, lp["wq"])
    k = qdot(x, lp["wk"])
    v = qdot(x, lp["wv"])
    attn = q  # skip attention
    x = x + qdot(attn, lp["wo"])
    g = jax.nn.silu(qdot(x, lp["w_gate"])) * qdot(x, lp["w_up"])
    return x + qdot(g, lp["w_down"]), k.sum() + v.sum()


def make_matmuls_only(p):
    @jax.jit
    def run(p, x):
        def step(i, x):
            def body(h, lp):
                h, _ = matmuls_step(lp, h)
                return h, None
            x, _ = jax.lax.scan(body, x, p["layers"])
            return x
        return jax.lax.fori_loop(0, STEPS, step, x)
    return run


def make_attn_only(cache_dtype):
    cache = init_kv_cache(cfg, B, S, dtype=cache_dtype)

    @jax.jit
    def run(cache, q1):
        def step(i, carry):
            cache, q1 = carry
            pos = S // 2
            spec = AttnSpec(valid_from=jnp.zeros((B,), jnp.int32),
                            valid_to=jnp.full((B,), pos + 1, jnp.int32))

            def body(q, kv):
                k_c, v_c = kv
                k_c = jax.lax.dynamic_update_slice(
                    k_c, q.astype(k_c.dtype)[:, :cfg.num_key_value_heads],
                    (0, 0, pos, 0))
                v_c = jax.lax.dynamic_update_slice(
                    v_c, q.astype(v_c.dtype)[:, :cfg.num_key_value_heads],
                    (0, 0, pos, 0))
                out = attend_spec(q, k_c.astype(q.dtype),
                                  v_c.astype(q.dtype), spec,
                                  scale=cfg.head_dim ** -0.5)
                return out, (k_c, v_c)

            q1, (k_new, v_new) = jax.lax.scan(body, q1, (cache.k, cache.v))
            return type(cache)(k_new, v_new), q1
        cache, q1 = jax.lax.fori_loop(0, STEPS, step, (cache, q1))
        return q1
    return run, cache


q1 = jnp.zeros((B, cfg.num_attention_heads, 1, cfg.head_dim), jnp.bfloat16)
x0 = jnp.zeros((B, 1, cfg.hidden_size), jnp.bfloat16)

p_int8 = jax.jit(functools.partial(quantize_decoder_params, mode="int8"))(
    params)

t = timed(make_matmuls_only(params), params, x0)
print(f"matmuls-only bf16: {t:8.3f} ms/step  (weights 2.78GB -> SOL ~3.4ms)")
t = timed(make_matmuls_only(p_int8), p_int8, x0)
print(f"matmuls-only int8: {t:8.3f} ms/step  (weights 1.39GB -> SOL ~1.7ms)")
for kvd, nm, gb in ((jnp.bfloat16, "bf16", 0.94), (jnp.float8_e4m3fn, "fp8", 0.47)):
    fn, cache = make_attn_only(kvd)
    t = timed(fn, cache, q1)
    print(f"attn+cache-only kv={nm}: {t:8.3f} ms/step  (read {gb}GB -> SOL ~{gb/0.82:.1f}ms)")
