"""Decode-attention phase probe at the serving batch (round-3 kernel study).

Answers two questions on the real chip before any kernel is written:

  1. What does the ENGINE's decode-attention phase cost at the tuned
     B96/S512 shape?  (unrolled static-layer offset views into the stacked
     cache + attend_spec XLA einsum — exactly models/decoder.py's path)
  2. What KV-streaming bandwidth can a BATCH-MAJOR Pallas slab reader
     achieve on the same cache layout?  The round-2 kernel died on 32 KB
     per-(b,h) DMAs; a [rows, n_kv, S_block, D] block of the [B,n_kv,S,D]
     cache is n_kv*rows contiguous 32-64 KB runs issued as ONE copy —
     this probe measures whether that reaches the HBM roofline.

Usage:  python tools_perf/attn_phase.py            # on the TPU
        BENCH_B=96 BENCH_S=512 python tools_perf/attn_phase.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.ops.attention import AttnSpec, attend_spec
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache

enable_compilation_cache()

B = int(os.getenv("BENCH_B", "96"))
S = int(os.getenv("BENCH_S", "512"))
STEPS = int(os.getenv("BENCH_STEPS", "32"))
cfg = preset("1.7b").decoder
L, NKV, NQ, D = (cfg.num_hidden_layers, cfg.num_key_value_heads,
                 cfg.num_attention_heads, cfg.head_dim)
G = NQ // NKV
KV_DTYPE = {"fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16,
            "int4": jnp.int4}[os.getenv("BENCH_KV", "fp8")]
# int4 is 0.5 bytes IF XLA stores it packed on TPU — that is exactly what
# the int4 probe is measuring (itemsize reports 1 for ml_dtypes int4).
KV_BYTES = int(2 * L * B * NKV * S * D
               * (0.5 if KV_DTYPE == jnp.int4 else
                  jnp.dtype(KV_DTYPE).itemsize))


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n / STEPS * 1e3  # ms per decode step


# ---------------------------------------------------------------- variant 1
# The engine's decode-attention phase: stacked cache, unrolled layers with
# STATIC indices (offset views), token DUS write + attend_spec per layer.
def make_engine_attn():
    shape = (L, B, NKV, S, D)
    # Eager int4 zeros trip a jit-recursion bug on this backend: allocate
    # int8 on host path and convert under jit instead.
    alloc = jnp.int8 if KV_DTYPE == jnp.int4 else KV_DTYPE
    k_all = jnp.zeros(shape, alloc)
    v_all = jnp.zeros(shape, alloc)
    pos = S // 2
    spec = AttnSpec(valid_from=jnp.zeros((B,), jnp.int32),
                    valid_to=jnp.full((B,), pos + 1, jnp.int32))

    @jax.jit
    def run(k_all, v_all, q):
        k_all = k_all.astype(KV_DTYPE)
        v_all = v_all.astype(KV_DTYPE)
        def step(i, carry):
            k_all, v_all, q = carry
            newkv = q[:, :NKV].astype(k_all.dtype)
            for lyr in range(L):
                k_all = jax.lax.dynamic_update_slice(
                    k_all, newkv[None, :, :, :, :],
                    (lyr, 0, 0, pos, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, newkv[None, :, :, :, :],
                    (lyr, 0, 0, pos, 0))
                k_layer = jax.lax.dynamic_slice(
                    k_all, (lyr, 0, 0, 0, 0), (1, B, NKV, S, D))[0]
                v_layer = jax.lax.dynamic_slice(
                    v_all, (lyr, 0, 0, 0, 0), (1, B, NKV, S, D))[0]
                out = attend_spec(q, k_layer.astype(q.dtype),
                                  v_layer.astype(q.dtype), spec,
                                  scale=D ** -0.5)
                q = q + out * 1e-6  # keep the layer chain data-dependent
            return k_all, v_all, q
        _, _, q = jax.lax.fori_loop(0, STEPS, step, (k_all, v_all, q))
        return q
    q = jnp.zeros((B, NQ, 1, D), jnp.bfloat16)
    return run, (k_all, v_all, q)


# ---------------------------------------------------------------- variant 2
# Batch-major slab-streaming ceiling: read the whole per-layer KV through
# VMEM in [ROWS, NKV, BS, D] blocks and do near-zero compute.  This is the
# bandwidth an attention kernel on this layout could at best achieve.
def _slab_kernel(seed_ref, k_ref, v_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)
    # Touch one sliver of each block — the auto-pipeline DMAs the whole
    # block regardless; converting the full slab to f32 would OOM VMEM.
    acc = (k_ref[:, 0, 0, :].astype(jnp.float32)
           + v_ref[:, 0, 0, :].astype(jnp.float32))
    o_ref[...] += acc + seed_ref[0].astype(jnp.float32)


def make_slab_reader(rows, bs):
    k1 = jnp.zeros((B, NKV, S, D), KV_DTYPE)
    v1 = jnp.zeros((B, NKV, S, D), KV_DTYPE)

    grid = (B // rows, S // bs)
    call = pl.pallas_call(
        _slab_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((rows, NKV, bs, D),
                             lambda i, j, *_: (i, 0, j, 0)),
                pl.BlockSpec((rows, NKV, bs, D),
                             lambda i, j, *_: (i, 0, j, 0)),
            ],
            out_specs=pl.BlockSpec((rows, D), lambda i, j, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )

    @jax.jit
    def run(k1, v1):
        def step(i, carry):
            tok, _ = carry
            out = jnp.zeros((B, D), jnp.float32)
            for _lyr in range(L):
                o = call(tok.reshape(1), k1, v1)
                # Real data dependence layer->layer (the seed flows through
                # the kernel output) so XLA cannot CSE the 28 calls.
                tok = tok + o[0, 0].astype(jnp.int32)
                out = o
            return tok, out
        _, out = jax.lax.fori_loop(
            0, STEPS, step, (jnp.int32(0), jnp.zeros((B, D), jnp.float32)))
        return out
    return run, (k1, v1)


# ---------------------------------------------------------------- variant 3
# The batch-major streaming kernel in the engine's decode structure:
# unrolled layers, token DUS write, stacked-cache reads.
def make_batched_kernel(rows, bs):
    from qwen3_asr_tpu.ops.decode_attention_batch import \
        decode_attention_batched
    shape = (L, B, NKV, S, D)
    k_all = jnp.zeros(shape, KV_DTYPE)
    v_all = jnp.zeros(shape, KV_DTYPE)
    pos = S // 2
    vf = jnp.zeros((B,), jnp.int32)
    vt = jnp.full((B,), pos + 1, jnp.int32)

    @jax.jit
    def run(k_all, v_all, q):
        def step(i, carry):
            k_all, v_all, q = carry
            newkv = q[:, :NKV].astype(k_all.dtype)
            for lyr in range(L):
                k_all = jax.lax.dynamic_update_slice(
                    k_all, newkv[None], (lyr, 0, 0, pos, 0))
                v_all = jax.lax.dynamic_update_slice(
                    v_all, newkv[None], (lyr, 0, 0, pos, 0))
                out = decode_attention_batched(
                    q, k_all, v_all, layer_idx=lyr, kv_valid_from=vf,
                    kv_valid_to=vt, sm_scale=D ** -0.5,
                    rows=rows, block_s=bs)
                q = q + out * 1e-6
            return k_all, v_all, q
        _, _, q = jax.lax.fori_loop(0, STEPS, step, (k_all, v_all, q))
        return q
    q = jnp.zeros((B, NQ, 1, D), jnp.bfloat16)
    return run, (k_all, v_all, q)


def main():
    roofline_ms = KV_BYTES / 819e9 * 1e3
    print(f"B={B} S={S} kv={jnp.dtype(KV_DTYPE).name} "
          f"KV/step={KV_BYTES/1e9:.2f} GB  SOL@819GB/s={roofline_ms:.2f} ms")

    only = os.getenv("BENCH_ONLY", "")
    kvb = jnp.dtype(KV_DTYPE).itemsize

    if only in ("", "engine"):
        run, args = make_engine_attn()
        t = timed(run, *args)
        print(f"engine attn+cache (XLA unrolled): {t:7.3f} ms/step "
              f"({KV_BYTES/t*1e3/1e9:.0f} GB/s effective)", flush=True)

    for rows, bs in ((8, 256), (16, 128), (8, 128)) \
            if only in ("", "slab") else ():
        if rows > B or bs > S or B % rows or S % bs:
            continue
        if 2 * 2 * rows * NKV * bs * D * kvb > 14e6:  # double-buffered pair
            continue
        slab_mb = 2 * rows * NKV * bs * D / 1e6
        try:
            run, args = make_slab_reader(rows, bs)
            t = timed(run, *args)
        except Exception as e:  # noqa: BLE001
            print(f"slab ceiling rows={rows} bs={bs}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        print(f"slab ceiling rows={rows:2d} bs={bs:3d} "
              f"({slab_mb:5.1f} MB/block-pair): {t:7.3f} ms/step "
              f"({KV_BYTES/t*1e3/1e9:.0f} GB/s)", flush=True)

    for rows, bs in ((8, 128), (4, 128)) \
            if only in ("", "bstream") else ():
        if rows > B or bs > S or B % rows or S % bs:
            continue
        if 2 * 2 * rows * NKV * bs * D * kvb > 14e6:
            continue
        try:
            run, args = make_batched_kernel(rows, bs)
            t = timed(run, *args)
        except Exception as e:  # noqa: BLE001 - print and keep sweeping
            print(f"bstream kernel rows={rows} bs={bs}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        print(f"bstream kernel rows={rows:2d} bs={bs:3d}: {t:7.3f} ms/step "
              f"({KV_BYTES/t*1e3/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
