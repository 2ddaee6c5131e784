"""Decode-pool vs fused-path throughput on mixed-bucket work (1.7B).

The micro-batcher coalesces same-bucket HTTP requests, but a MIXED burst
(different clip lengths) runs as sequential per-bucket dispatches on the
fused path — each one streaming the full weights. The decode pool shares
every weight read across all in-flight rows regardless of bucket. This
measures that difference directly (engine-level, no HTTP): wall time for
a burst of mixed-length clips, fused-sequential vs pooled.

Zero-weight preset ⇒ every decode runs its full token budget (no EOS):
a worst-case, but the same worst case for both paths.

    QUANTIZE=int8 ASR_KV_CACHE_DTYPE=fp8 python tools_perf/pool_vs_fused.py
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("QUANTIZE", "int8")
os.environ.setdefault("ASR_KV_CACHE_DTYPE", "fp8")

import numpy as np

from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from bench import build_engine  # noqa: E402

LENGTHS_S = [2, 4, 6, 10, 15, 20, 2, 6] * int(
    os.getenv("POOL_BENCH_REPEAT", "1"))


def main():
    backend = jax.default_backend()
    preset = "1.7b" if backend == "tpu" else "tiny"
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32
    kv = {"fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16,
          "int4": jnp.int4}.get(
        os.getenv("ASR_KV_CACHE_DTYPE", "").lower(), dtype)
    engine = build_engine(preset, dtype, kv)

    rng = np.random.default_rng(0)
    clips = [((rng.standard_normal(int(16000 * s)) * 0.05 * 32767)
              .clip(-32768, 32767).astype(np.int16)) for s in LENGTHS_S]

    # -- fused path, sequential (mixed buckets can't micro-batch) ---------
    for c in clips:
        engine.transcribe(c, 16000, language="en")       # compile
    t0 = time.time()
    fused_texts = [engine.transcribe(c, 16000, language="en")[0].text
                   for c in clips]
    fused_s = time.time() - t0

    # -- pooled ------------------------------------------------------------
    # POOL_BENCH_SLOTS pins the pool; add POOL_BENCH_MAX_SLOTS to measure
    # slot autoscaling (burst grows the window instead of queueing).
    from qwen3_asr_tpu.runtime.pool import DecodePool
    slots = int(os.getenv("POOL_BENCH_SLOTS", str(len(clips))))
    max_slots = int(os.getenv("POOL_BENCH_MAX_SLOTS", "0")) or None
    pool = DecodePool(engine, slots=slots, max_slots=max_slots)

    # POOL_BENCH_STAGGER_MS > 0: requests trickle in mid-decode (the
    # serving-realistic arrival shape) — this is the case the overlapped
    # admission path (prefill/insert dispatched on in-flight segment
    # handles, no host sync) is built for. Reports per-request latency too.
    stagger_s = float(os.getenv("POOL_BENCH_STAGGER_MS", "0")) / 1e3

    def burst():
        done = threading.Event()
        out = {}
        lat = {}

        def cb(i, t_sub):
            return (lambda text, ids: (
                        lat.__setitem__(i, time.time() - t_sub),
                        out.__setitem__(i, text),
                        len(out) == len(clips) and done.set()),
                    lambda e: (out.__setitem__(i, e), done.set()))

        t0 = time.time()
        for i, c in enumerate(clips):
            if stagger_s and i:
                time.sleep(stagger_s)
            ok, err = cb(i, time.time())
            pool.submit(c, "en", ok, err)
        assert done.wait(timeout=3000)
        return time.time() - t0, out, lat

    try:
        burst()                                           # compile
        pool_s, out, lat = burst()
        pool_s2, _, lat2 = burst()
    finally:
        pool.stop()
    if pool_s2 < pool_s:
        pool_s, lat = pool_s2, lat2
    pool_best = pool_s

    mismatch = sum(1 for i, t in enumerate(fused_texts) if out.get(i) != t)
    lats = sorted(lat.values())
    print(json.dumps({
        "backend": backend, "preset": preset,
        "clips_s": LENGTHS_S, "audio_total_s": sum(LENGTHS_S),
        "pool_slots": pool.base, "pool_max_slots": pool.max_slots,
        "stagger_ms": stagger_s * 1e3,
        "fused_sequential_s": round(fused_s, 2),
        "pooled_s": round(pool_best, 2),
        "speedup": round(fused_s / pool_best, 2),
        "fused_rtfx": round(sum(LENGTHS_S) / fused_s, 1),
        "pooled_rtfx": round(sum(LENGTHS_S) / pool_best, 1),
        "req_latency_mean_s": round(sum(lats) / len(lats), 3) if lats else None,
        "req_latency_max_s": round(lats[-1], 3) if lats else None,
        "text_mismatches": mismatch,
    }))


if __name__ == "__main__":
    main()
