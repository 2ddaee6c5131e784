"""Cross-session WS tick batching: aggregate device cost per tick cadence.

N concurrent streaming sessions each re-transcribe their sliding window
every 450 ms. Without batching the chip runs N resume dispatches per
cadence; with ASR_WS_TICK_BATCH the TickBatcher coalesces them into ONE
batched resume dispatch (runtime/resume.resume_generate_batch). This tool
paces N staggered sessions over real speech and times, per cadence,

  * serial: N solo batch-1 resume calls (today's default WS path),
  * batched: one resume_rows call over all N windows,

verifying token equality per session on every tick. The headline is the
per-cadence device time ratio — the sessions-per-chip multiplier — plus
the implied device-bound session capacity at the 450 ms cadence.

    python tools_perf/tick_batch_eval.py                      # real chip
    JAX_PLATFORMS=cpu python tools_perf/tick_batch_eval.py    # CPU check
    [--model e2e/data/trained_ckpt | preset:1.7b] [--sessions 8] [--cap 6.0]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", default="e2e/data/trained_ckpt")
    parser.add_argument("--sessions", type=int, default=8)
    parser.add_argument("--cap", type=float, default=6.0)
    parser.add_argument("--tick", type=float, default=0.45)
    parser.add_argument("--data-dir", default="e2e/data/real")
    parser.add_argument("--cadences", type=int, default=20)
    args = parser.parse_args()

    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import numpy as np
    from pathlib import Path

    from qwen3_asr_tpu.audio.codec import decode_audio
    from qwen3_asr_tpu.audio.frontend import fir_bandpass_kernel
    from qwen3_asr_tpu.audio import native
    from qwen3_asr_tpu.runtime.engine import enable_compilation_cache
    from qwen3_asr_tpu.runtime.lifecycle import _load_engine_sync

    enable_compilation_cache()
    engine = _load_engine_sync(os.path.abspath(args.model)
                               if os.path.isdir(args.model) else args.model)

    clips = []
    for p in sorted(Path(args.data_dir).glob("*.wav")):
        audio, sr = decode_audio(p.read_bytes())
        clips.append(np.asarray(audio, np.float32))
    if not clips:
        print(json.dumps({"error": f"no fixtures in {args.data_dir}"}))
        return

    n = args.sessions
    kernel = fir_bandpass_kernel()
    cap = int(args.cap * 16000)
    tick_n = int(args.tick * 16000)
    frames, bucket_s = engine.bucket_frames(cap)
    lang = "en"

    # Sync-overhead baseline (see stream_tick_eval.py): every call blocks on
    # one host<->device round trip; serial pays N of them per cadence,
    # batched pays 1. Report raw wall AND an RTT-subtracted device estimate.
    import jax
    import jax.numpy as jnp
    noop = jax.jit(lambda x: x + 1)
    jax.block_until_ready(noop(jnp.zeros(8, jnp.int32)))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(noop(jnp.zeros(8, jnp.int32)))
        rtts.append(time.perf_counter() - t0)
    rtt = statistics.median(rtts)

    # N sessions: session i paces clip i%len, staggered start offsets so the
    # windows differ. All share the cap bucket (the steady-state shape).
    srcs = [clips[i % len(clips)] for i in range(n)]
    offsets = [int(i * 0.8 * 16000) for i in range(n)]
    windows = [np.zeros(0, np.float32) for _ in range(n)]
    prev_serial = [[] for _ in range(n)]
    prev_batch = [[] for _ in range(n)]

    t_serial, t_batched = [], []
    mismatches = 0
    warm = 2  # first cadences include compiles; excluded from medians

    for cad in range(args.cadences + warm):
        filts = []
        for i in range(n):
            src, off = srcs[i], offsets[i] + cad * tick_n
            chunk = src[off % len(src):(off % len(src)) + tick_n]
            if len(chunk) < tick_n:  # wrap around the clip
                chunk = np.concatenate([chunk, src[:tick_n - len(chunk)]])
            w = np.concatenate([windows[i], chunk.astype(np.float32)])
            if len(w) > cap:
                w = w[len(w) - cap:]
            windows[i] = w
            pad = np.zeros(cap, np.float32)
            pad[:len(w)] = w
            filts.append(native.fir_same(pad, kernel))

        # serial: N solo resume dispatches
        t0 = time.perf_counter()
        serial_ids = []
        for i in range(n):
            _, id_lists = engine._run_bucket(
                [filts[i]], frames, bucket_s, lang,
                resume_tokens=prev_serial[i])
            serial_ids.append(id_lists[0])
        t_ser = time.perf_counter() - t0

        # batched: one cross-session dispatch
        t0 = time.perf_counter()
        _, batch_ids = engine._run_bucket(
            filts, frames, bucket_s, lang, resume_rows=prev_batch)
        t_bat = time.perf_counter() - t0

        for i in range(n):
            if serial_ids[i] != batch_ids[i]:
                mismatches += 1
            prev_serial[i] = serial_ids[i]
            prev_batch[i] = batch_ids[i]
        if cad >= warm:
            t_serial.append(t_ser)
            t_batched.append(t_bat)

    ser_p50 = statistics.median(t_serial)
    bat_p50 = statistics.median(t_batched)
    ser_dev = max(ser_p50 - n * rtt, 1e-6)
    bat_dev = max(bat_p50 - rtt, 1e-6)
    out = {
        "sessions": n,
        "cadences": args.cadences,
        "bucket_s": bucket_s,
        "sync_rtt_ms": round(rtt * 1000, 2),
        "serial_ms_p50": round(ser_p50 * 1000, 2),
        "batched_ms_p50": round(bat_p50 * 1000, 2),
        "serial_device_ms_p50": round(ser_dev * 1000, 2),
        "batched_device_ms_p50": round(bat_dev * 1000, 2),
        "device_speedup": round(ser_dev / bat_dev, 2),
        "wall_speedup": round(ser_p50 / bat_p50, 2),
        # device-bound capacity at the tick cadence: sessions the chip can
        # re-transcribe per 450 ms if ticks arrive in batchable groups
        "capacity_serial": round(n * args.tick / ser_dev, 1),
        "capacity_batched": round(n * args.tick / bat_dev, 1),
        "mismatches": mismatches,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
