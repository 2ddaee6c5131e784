"""Long-form throughput: segment batching vs the serial per-segment loop.

The reference delegates long audio to its SDK, which transcribes
segments one by one (reference LEARNING_LOG.md:216-218 — the same
serial loop our transcribe() used before round 4). Silence-boundary
chunking puts nearly every segment of a long clip in the largest
bucket, so batching them (engine._run_segments_batched, pow2 shapes,
cap ASR_LONG_FORM_BATCH) amortizes the decode phase's weight reads
across segments.

Measures one long clip through the PUBLIC transcribe() path, warm, at
batch caps 1 (the old serial behavior) and the configured default, and
prints one JSON line with wall seconds + RTFx for both.

Usage:
    JAX_COMPILATION_CACHE_DIR=~/.cache/qwen3_asr_tpu_xla \
        python tools_perf/longform_eval.py [--minutes 10] [--preset 1.7b]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("QUANTIZE", "int8")
os.environ.setdefault("ASR_INT8_ACT", "true")
os.environ.setdefault("ASR_KV_CACHE_DTYPE", "int4")
os.environ.setdefault("ASR_DECODER_UNROLL", "true")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--minutes", type=float, default=10.0)
    parser.add_argument("--preset", default="1.7b")
    parser.add_argument("--caps", default="1,8",
                        help="comma list of ASR_LONG_FORM_BATCH values")
    args = parser.parse_args()

    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
    enable_compilation_cache()
    import bench

    engine = bench.build_engine(args.preset, jnp.bfloat16)
    jax.block_until_ready(engine.model.params)
    engine._d2h_warm.wait()

    # Speech-shaped noise with periodic near-silence valleys so the
    # segmenter cuts where production audio would.
    rng = np.random.default_rng(0)
    sr = 16000
    n = int(args.minutes * 60 * sr)
    audio = (rng.standard_normal(n) * 0.05).astype(np.float32)
    period = 25 * sr
    for start in range(period - sr // 2, n, period):
        audio[start:start + sr // 2] *= 0.01
    clip_s = n / sr

    results = {}
    n_segments = None
    for cap in [int(c) for c in args.caps.split(",")]:
        os.environ["ASR_LONG_FORM_BATCH"] = str(cap)
        engine.transcribe(audio, sr, language="en")  # warm the shapes
        t0 = time.time()
        out = engine.transcribe(audio, sr, language="en")
        wall = time.time() - t0
        n_segments = len(out)
        results[f"cap{cap}"] = {"wall_s": round(wall, 2),
                                "rtfx": round(clip_s / wall, 1)}

    caps = sorted(results, key=lambda k: int(k[3:]))  # numeric, not lexical
    speedup = (results[caps[-1]]["rtfx"] / results[caps[0]]["rtfx"]
               if len(caps) > 1 else None)
    print(json.dumps({
        "metric": "longform_transcribe",
        "backend": jax.default_backend(),
        "minutes": args.minutes, "segments": n_segments,
        **results,
        "batched_vs_serial": round(speedup, 2) if speedup else None,
    }))


if __name__ == "__main__":
    main()
