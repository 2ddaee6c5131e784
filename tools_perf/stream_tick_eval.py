"""WS prefix caching: per-tick device time, session vs fused resume.

Wall-clock p50 over a tunnel-attached chip is RTT-bound (docs/ROADMAP.md),
so this isolates what prefix caching actually changes: DEVICE work per
450 ms tick. It paces a sliding window over real speech exactly like the
server (chunk-quantized trims, flag semantics) and times, per tick,

  * the fused resume path (today's default): full re-encode + re-prefill,
  * the StreamSession path: cached encoder blocks + persistent KV,

reporting medians split by tick kind (tail/full). Outputs also verify
token equality between the two paths on every tick.

    python tools_perf/stream_tick_eval.py                    # real chip
    JAX_PLATFORMS=cpu python tools_perf/stream_tick_eval.py  # CPU
    [--model e2e/data/trained_ckpt | preset:1.7b] [--cap 6.0] [--langs en,zh]
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
    parser.add_argument("--cap", type=float, default=6.0)
    parser.add_argument("--tick", type=float, default=0.45)
    parser.add_argument("--data-dir", default="e2e/data/real")
    parser.add_argument("--langs", default="en",
                        help="comma-separated language prefixes to pace")
    parser.add_argument("--check", action="store_true", default=True)
    parser.add_argument("--no-check", dest="check", action="store_false",
                        help="skip fused-path parity (2x faster)")
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

    lang_of = {"english": "en", "chinese": "zh", "japanese": "ja",
               "cantonese": "yue", "hindi": "hi", "thai": "th"}
    wavs = []
    for p in sorted(Path(args.data_dir).glob("*.wav")):
        lang = lang_of.get(p.stem.rsplit("_", 1)[0], "en")
        if lang in args.langs.split(","):
            audio, sr = decode_audio(p.read_bytes())
            wavs.append((p.stem, lang, audio))
    if not wavs:
        print(json.dumps({"error": f"no fixtures in {args.data_dir}"}))
        return

    kernel = fir_bandpass_kernel()
    cap = int(args.cap * 16000)
    tick_n = int(args.tick * 16000)

    # Sync-overhead baseline: each tick's wall time includes one
    # host↔device round trip (the token fetch), which DOMINATES on a
    # tunnel-attached chip. Subtracting the median no-op round trip
    # isolates the device+dispatch work prefix caching actually changes.
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

    rows = []
    for stem, lang, audio in wavs:
        session = engine.stream_session(args.cap, lang)
        chunk_samples = session.chunk_frames * 160
        frames, bucket_s = engine.bucket_frames(cap)

        window = np.zeros(0, np.float32)
        prev = []
        t_sess = {"tail": [], "full": []}
        t_fused = []
        mismatches = 0
        last_kind = None

        for off in range(0, len(audio), tick_n):
            window = np.concatenate(
                [window, audio[off:off + tick_n].astype(np.float32)])
            if len(window) > cap:
                trim = -(-(len(window) - cap) // chunk_samples) * chunk_samples
                window = window[trim:]
            # the server bandpasses the whole window per tick
            filt = native.fir_same(window, kernel)

            before = dict(session.stats)
            t0 = time.perf_counter()
            text, ids = session.update(filt)
            t1 = time.perf_counter()
            kind = "tail" if session.stats["tail"] > before["tail"] else "full"
            t_sess[kind].append(t1 - t0)
            last_kind = kind

            if args.check:
                t0 = time.perf_counter()
                texts, id_lists = engine._run_bucket(
                    [filt], frames, bucket_s, lang, resume_tokens=prev)
                t_fused.append(time.perf_counter() - t0)
                if ids != id_lists[0]:
                    mismatches += 1
                prev = id_lists[0]
            else:
                prev = ids

        def med(xs, sub=0.0):
            if not xs:
                return None
            return round((statistics.median(xs) - sub) * 1000, 2)

        rows.append({
            "clip": stem, "lang": lang,
            "ticks": session.stats["ticks"],
            "tail_ticks": session.stats["tail"],
            "full_ticks": session.stats["full"],
            "redo_ticks": session.stats["redo"],
            "session_tail_ms_p50": med(t_sess["tail"]),
            "session_full_ms_p50": med(t_sess["full"]),
            "fused_ms_p50": med(t_fused),
            "session_tail_device_ms_p50": med(t_sess["tail"], rtt),
            "session_full_device_ms_p50": med(t_sess["full"], rtt),
            "fused_device_ms_p50": med(t_fused, rtt),
            "mismatches": mismatches,
        })
        print(json.dumps(rows[-1]))

    def agg(key):
        xs = [r[key] for r in rows if r[key] is not None]
        return round(statistics.median(xs), 2) if xs else None

    tail_d, fused_d = (agg("session_tail_device_ms_p50"),
                       agg("fused_device_ms_p50"))
    summary = {
        "summary": True,
        "clips": len(rows),
        "sync_rtt_ms": round(rtt * 1000, 2),
        "tail_ms_p50": agg("session_tail_ms_p50"),
        "fused_ms_p50": agg("fused_ms_p50"),
        "tail_device_ms_p50": tail_d,
        "fused_device_ms_p50": fused_d,
        "device_speedup_tail_vs_fused": (
            round(fused_d / tail_d, 2) if tail_d and fused_d else None),
        "total_mismatches": sum(r["mismatches"] for r in rows),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
