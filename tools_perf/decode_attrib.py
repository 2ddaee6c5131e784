"""Decode-step attribution at the serving shape: where do the 9 ms go?

Round-4 verdict #2: the fused executable's decode step measures ~9 ms at
B96/S512 (1.7B, int8 weights + int4 KV) against a 3.9 ms HBM floor
(1.73 GB weights + ~1.4 GB int4 KV per step / 819 GB/s) — ~all of the
remaining 2x device headroom. This tool splits the step into measured
components on the real chip, then prices the cheap levers:

  components (independently-jitted STEPS-trip fori loops, per-step ms):
    full        embed -> 28 unrolled layers -> lm_logits argmax
    layers      same minus lm_logits (cheap readout)
    lm_head     lm_logits alone at [B, H]
  derived:
    lm_head'    full - layers           (in-graph cost incl. fusion loss)
    cache slope layers(S) fit over S in {128,256,384,512}: ms per cache
                token = the cache-read + attention-scaling part; the
                intercept is the S-independent part (weight reads + fixed
                VPU/MXU work + step overhead)
  A/B levers (verdict's list):
    kv dtype    full step at int4 vs fp8 vs bf16 KV — does int4 win the
                DECODE phase specifically (it won end-to-end RTFx)?
    phasing     two-phase decode estimate from the measured slope: run the
                first half of the token budget against a smaller cache
                executable; saving = slope * dS * steps_in_phase1

int4 caveat (CLAUDE.md): int4 arrays cannot cross jit boundaries on this
jax build, so every loop CREATES its cache inside the jitted program —
timing is unaffected (zeros read at full bandwidth; no value-dependent
shortcuts exist in dense attention).

Usage:  python tools_perf/decode_attrib.py                 # on the TPU
        MB_B=96 MB_STEPS=32 python tools_perf/decode_attrib.py
Writes tools_perf/results/decode_attrib.json (committed artifact — the
RESULTS.md attribution table cites it).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_asr_tpu.models.config import preset
from qwen3_asr_tpu.models.decoder import (
    decoder_forward, embed_tokens, init_decoder_params, init_kv_cache,
    lm_logits)
from qwen3_asr_tpu.ops.attention import AttnSpec
from qwen3_asr_tpu.ops.quant import quantize_decoder_params
from qwen3_asr_tpu.runtime.engine import enable_compilation_cache

enable_compilation_cache()

B = int(os.getenv("MB_B", "96"))
STEPS = int(os.getenv("MB_STEPS", "32"))
S_SWEEP = [int(s) for s in os.getenv("MB_S_SWEEP", "128,256,384,512").split(",")]
S_MAIN = S_SWEEP[-1]
HBM_GBPS = 819.0  # v5e

cfg = preset("1.7b").decoder
key = jax.random.PRNGKey(0)

KV_DTYPES = {"int4": jnp.int4, "fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16}


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def kv_bytes(s, dtype_name):
    per = {"int4": 0.5, "fp8": 1, "bf16": 2}[dtype_name]
    scales = (2 * cfg.num_hidden_layers * B * cfg.num_key_value_heads * s * 2
              if dtype_name == "int4" else 0)
    return int(2 * cfg.num_hidden_layers * B * cfg.num_key_value_heads * s
               * cfg.head_dim * per) + scales


def make_full(kv_name, s, with_lm=True):
    dtype = KV_DTYPES[kv_name]

    @jax.jit
    def run(params, last):
        cache = init_kv_cache(cfg, B, s, dtype=dtype)  # inside jit: int4-safe

        def body(i, carry):
            last, cache = carry
            pos = s - STEPS - 1 + i     # tail of the cache, like serving
            hidden = embed_tokens(params, cfg, last[:, None])
            positions = jnp.full((B, 1), pos, jnp.int32)
            spec = AttnSpec(valid_from=jnp.zeros((B,), jnp.int32),
                            valid_to=jnp.full((B,), pos + 1, jnp.int32))
            hidden, cache = decoder_forward(params, cfg, hidden, positions,
                                            cache, pos, spec)
            if with_lm:
                nxt = jnp.argmax(lm_logits(params, cfg, hidden[:, -1]),
                                 axis=-1).astype(jnp.int32)
            else:
                nxt = (jnp.sum(hidden[:, -1], axis=-1) * 0
                       ).astype(jnp.int32) + last
            return nxt, cache

        last, cache = jax.lax.fori_loop(0, STEPS, body, (last, cache))
        return last

    return run


def make_lm_only():
    @jax.jit
    def run(params, h):
        def body(i, h):
            out = lm_logits(params, cfg, h)
            return h + (jnp.max(out, axis=-1, keepdims=True) * 0).astype(h.dtype)
        return jax.lax.fori_loop(0, STEPS, body, h)
    return run


def main():
    results = {"B": B, "STEPS": STEPS, "config": "1.7b w=int8",
               "rows": {}, "derived": {}}
    print(f"decode attribution: B={B} STEPS={STEPS} 1.7B int8 weights")

    params = jax.jit(
        functools.partial(quantize_decoder_params, mode="int8"))(
        jax.jit(lambda: init_decoder_params(cfg, key, jnp.bfloat16))())
    jax.block_until_ready(params)
    last0 = jnp.zeros((B,), jnp.int32)

    def report(name, secs):
        ms = secs / STEPS * 1e3
        results["rows"][name] = round(ms, 3)
        print(f"  {name:38s} {ms:8.3f} ms/step")
        return ms

    # 1) the step itself + the KV-dtype A/B at the serving S
    full = {}
    for kv in ["int4", "fp8", "bf16"]:
        full[kv] = report(f"full kv={kv} S={S_MAIN}",
                          timed(make_full(kv, S_MAIN), params, last0))
        floor = (1.73e9 + kv_bytes(S_MAIN, kv)) / HBM_GBPS / 1e9 * 1e3
        print(f"    (HBM floor {floor:.2f} ms: 1.73 GB weights + "
              f"{kv_bytes(S_MAIN, kv) / 1e9:.2f} GB cache)")

    # 1b) W8A8 at the DECODE step: ASR_INT8_ACT quantizes activations
    # per-row so the MXU runs int8×int8→int32 — shipped for prefill
    # (≥1024 rows); the decode step (96 rows) stays on dequant-in-matmul
    # by default. The attribution says the S-independent part is ~2.7 ms
    # above the 2.1 ms weight-read floor — if that's bf16 compute +
    # dequant, int8 activations could halve it. Trace-time env branch:
    # set it, build a fresh executable, unset.
    os.environ["ASR_INT8_ACT"] = "true"
    os.environ["ASR_INT8_ACT_MIN_TOKENS"] = str(min(B, 64))
    try:
        full["int4_w8a8"] = report(
            f"full kv=int4 S={S_MAIN} w8a8-decode",
            timed(make_full("int4", S_MAIN), params, last0))
    finally:
        os.environ.pop("ASR_INT8_ACT", None)
        os.environ.pop("ASR_INT8_ACT_MIN_TOKENS", None)
    print(f"    (vs dequant-decode {full['int4']:.3f} ms: "
          f"{full['int4'] / full['int4_w8a8']:.2f}x)")

    # 2) lm_head: in-graph (full - layers) and isolated
    layers_main = report(f"layers-only kv=int4 S={S_MAIN}",
                         timed(make_full("int4", S_MAIN, with_lm=False),
                               params, last0))
    h = jnp.zeros((B, cfg.hidden_size), jnp.bfloat16)
    lm_iso = report("lm_logits isolated", timed(make_lm_only(), params, h))
    lm_graph = full["int4"] - layers_main
    results["derived"]["lm_head_in_graph_ms"] = round(lm_graph, 3)
    print(f"  -> lm_head in-graph = full - layers = {lm_graph:.3f} ms "
          f"(isolated {lm_iso:.3f})")

    # 3) cache-size slope: layers-only across S
    pts = []
    for s in S_SWEEP[:-1]:
        ms = report(f"layers-only kv=int4 S={s}",
                    timed(make_full("int4", s, with_lm=False), params, last0))
        pts.append((s, ms))
    pts.append((S_MAIN, layers_main))
    xs = np.array([p[0] for p in pts], np.float64)
    ys = np.array([p[1] for p in pts], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    results["derived"]["cache_slope_us_per_token"] = round(slope * 1e3, 4)
    results["derived"]["layers_intercept_ms"] = round(intercept, 3)
    cache_part = slope * S_MAIN
    print(f"  -> layers(S) fit: {intercept:.3f} ms + {slope * 1e3:.3f} "
          f"us/cache-token; cache-proportional part at S={S_MAIN}: "
          f"{cache_part:.3f} ms, S-independent part: {intercept:.3f} ms")
    bw = kv_bytes(S_MAIN, "int4") / (cache_part / 1e3) / 1e9 if cache_part else 0
    print(f"     cache-read effective bandwidth: {bw:.0f} GB/s "
          f"({bw / HBM_GBPS * 100:.0f}% of peak)")

    # 4) phasing estimate: first half of a 176-token budget in a smaller-
    #    cache executable (S1 = S_MAIN - 128), second half at S_MAIN.
    tokens = 176
    s1 = S_MAIN - 128
    save_ms = slope * (S_MAIN - s1) * (tokens // 2)
    total_ms = full["int4"] * tokens
    results["derived"]["phasing_estimate"] = {
        "s1": s1, "tokens_phase1": tokens // 2,
        "saving_ms_per_batch": round(save_ms, 1),
        "decode_total_ms_per_batch": round(total_ms, 1),
        "saving_pct": round(save_ms / total_ms * 100, 2)}
    print(f"  -> two-phase decode estimate (S1={s1} for {tokens // 2} of "
          f"{tokens} tokens): saves {save_ms:.1f} ms of {total_ms:.0f} ms "
          f"({save_ms / total_ms * 100:.1f}%) per batch — plus a cache "
          f"copy + a second executable")

    results["derived"]["kv_ab"] = {k: results["rows"][f"full kv={k} S={S_MAIN}"]
                                   for k in ["int4", "fp8", "bf16"]}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "decode_attrib.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
