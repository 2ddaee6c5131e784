"""Real-time WebSocket benchmark: wall-clock-paced 450 ms chunk streaming.

The measurement harness behind the p50-partial-latency target (≤300 ms vs
the reference's ~21,000 ms under pacing — BASELINE.md): a paced client
streams PCM at real-time rate and records, per chunk, the delay between
sending it and receiving the partial that covers it; plus flush latency and
the realtime factor. Mirrors the reference's
E2Etest/test_realtime_accuracy.py:57-144 methodology.

Usage:
    python bench_realtime.py --url ws://localhost:8000/ws/transcribe
    python bench_realtime.py --inproc          # self-contained (tiny model)
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import time

import numpy as np


def _speech_like(duration_s: float, sr: int = 16000, seed: int = 0):
    """The tests' shared speech-like generator (ONE fixture definition —
    the paced benchmark and the e2e gates must measure the same input)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from util_audio import speech_like
    return speech_like(duration_s, sr=sr, seed=seed)


async def run_benchmark(ws_connect, duration_s: float = 10.0,
                        chunk_ms: float = 450.0, language: str = "en",
                        pace: bool = True, audio: np.ndarray = None,
                        expected: str = None) -> dict:
    """ws_connect: coroutine factory returning a connected aiohttp WS.

    audio: optional real float32 waveform (16 kHz) to stream instead of the
    synthetic fixture; expected: its reference transcript — when given, the
    result includes streaming WER/CER of the final text against it
    (reference E2Etest/test_realtime_accuracy.py:57-144 methodology)."""
    sr = 16000
    if audio is None:
        audio = _speech_like(duration_s)
    else:
        duration_s = len(audio) / sr
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2").tobytes()
    chunk_bytes = int(sr * 2 * chunk_ms / 1000)

    chunk_latencies = []
    partials = []
    final_holder: dict = {}
    final_event = asyncio.Event()
    ws = await ws_connect()
    await ws.receive_json()  # handshake
    await ws.send_json({"action": "config", "language": language,
                        "use_server_vad": False})
    await ws.receive_json()

    async def recv_loop():
        """Single receiver: records partials, resolves the final."""
        try:
            while True:
                msg = await ws.receive_json()
                now = time.time()
                if msg.get("is_partial"):
                    partials.append((now, msg))
                elif msg.get("is_final"):
                    # NOT counted as a partial: the final rides the flush
                    # path, and folding it into the chunk-latency
                    # percentiles would skew exactly the numbers this
                    # benchmark exists to isolate.
                    final_holder["msg"] = msg
                    final_holder["time"] = now
                    final_event.set()
        except Exception:
            final_event.set()

    recv_task = asyncio.create_task(recv_loop())

    t_start = time.time()
    sent_times = []
    for i in range(0, len(pcm), chunk_bytes):
        target = t_start + (i / len(pcm)) * duration_s
        if pace:
            delay = target - time.time()
            if delay > 0:
                await asyncio.sleep(delay)
        sent_times.append(time.time())
        await ws.send_bytes(pcm[i:i + chunk_bytes])
    # Overrun = how far the paced FEED fell behind real time, measured
    # when the last chunk went out — flush/final latency is reported
    # separately and must not leak into this number.
    feed_wall = time.time() - t_start

    # flush + measure
    await asyncio.sleep(0.1)
    t_flush = time.time()
    await ws.send_json({"action": "flush"})
    try:
        await asyncio.wait_for(final_event.wait(), timeout=120)
    except asyncio.TimeoutError:
        pass
    flush_latency = (final_holder["time"] - t_flush
                     if "time" in final_holder else None)
    final_text = final_holder.get("msg", {}).get("text", "")
    recv_task.cancel()
    try:
        await recv_task
    except (asyncio.CancelledError, Exception):
        pass
    await ws.close()
    wall = time.time() - t_start

    # Chunk latency: each partial credited to the most recent send.
    for recv_time, _ in partials:
        prior = [s for s in sent_times if s <= recv_time]
        if prior:
            chunk_latencies.append((recv_time - prior[-1]) * 1000)

    lat = sorted(chunk_latencies)
    def pct(p):
        return round(lat[min(len(lat) - 1, int(p * len(lat)))], 1) if lat else None

    result = {
        "audio_s": round(duration_s, 2),
        "chunk_ms": chunk_ms,
        "partials": len(partials),
        "chunk_latency_ms_p50": pct(0.50),
        "chunk_latency_ms_p95": pct(0.95),
        "flush_latency_ms": round(flush_latency * 1000, 1)
        if flush_latency else None,
        # Paced run: how far processing fell behind the real-time feed
        # (0.0 = kept up perfectly; reference fell ~21 s behind).
        "pacing_overrun_rtf": round(
            max(0.0, (feed_wall - duration_s if pace else feed_wall)
                / duration_s), 3),
        "wall_s": round(wall, 2),
        "final_text_len": len(final_text),
    }
    if expected is not None:
        # Streaming accuracy: final flush text vs the reference transcript
        # (like the reference, the empty-flush fallback is the last partial).
        if not final_text and partials:
            final_text = partials[-1][1].get("text", "")
        from qwen3_asr_tpu.utils.metrics import cer, wer
        result["final_text"] = final_text
        result["wer"] = round(wer(expected, final_text), 4)
        result["cer"] = round(cer(expected, final_text), 4)
    return result


async def _inproc_client():
    """Self-contained run against an in-process server with a tiny model."""
    import tempfile
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from aiohttp.test_utils import TestClient, TestServer
    from fixtures import write_tiny_checkpoint

    # Honor an operator-set MODEL_ID (e.g. e2e/data/trained_ckpt, so
    # --wav/--gate-wer measure real text in-process); default to a fresh
    # random tiny checkpoint for pure latency pacing.
    ckpt = os.environ.get("MODEL_ID")
    if not ckpt or not os.path.isdir(ckpt):
        ckpt = tempfile.mkdtemp() + "/ckpt"
        write_tiny_checkpoint(ckpt)
        os.environ["MODEL_ID"] = ckpt
    # Measure warm executables, as production would: sweep all buckets.
    os.environ.pop("SKIP_WARMUP", None)
    os.environ["USE_CUDA_GRAPHS"] = "true"
    from qwen3_asr_tpu.serving.server import build_app
    client = TestClient(TestServer(build_app()))
    await client.start_server()
    # trigger model load + warmup before timing
    resp = await client.get("/health")
    await resp.json()
    await client.app["manager"].ensure_loaded()
    return client, lambda: client.ws_connect("/ws/transcribe")


def _load_fixture(wav_path: str):
    """(audio_f32, expected_text, lang) from <name>.wav/.txt/.lang."""
    from pathlib import Path
    from qwen3_asr_tpu.audio.codec import decode_audio
    from qwen3_asr_tpu.audio.resample import resample
    p = Path(wav_path)
    with open(p, "rb") as f:
        audio, sr = decode_audio(f.read())
    if sr != 16000:
        audio = resample(audio, sr, 16000)
    txt = p.with_suffix(".txt")
    lang_f = p.with_suffix(".lang")
    expected = txt.read_text().strip() if txt.exists() else None
    lang = lang_f.read_text().strip() if lang_f.exists() else "en"
    return audio, expected, lang


async def amain(args):
    if args.inproc:
        client, connect = await _inproc_client()
    else:
        import aiohttp
        session = aiohttp.ClientSession()
        connect = lambda: session.ws_connect(args.url)  # noqa: E731
    audio = expected = None
    language = args.language
    if args.wav:
        audio, expected, language = _load_fixture(args.wav)
    if args.sessions > 1:
        # Aggregate throughput under concurrent paced sessions — the
        # continuous-batching success metric: partials/s must scale past
        # the single-session number (docs/ROADMAP.md).
        t0 = time.time()
        per = await asyncio.gather(*[
            run_benchmark(connect, duration_s=args.duration,
                          language=language, pace=not args.no_pace,
                          audio=audio, expected=expected)
            for _ in range(args.sessions)])
        wall = time.time() - t0
        total_partials = sum(r["partials"] for r in per)
        p50s = [r["chunk_latency_ms_p50"] for r in per
                if r["chunk_latency_ms_p50"] is not None]
        wers = [r["wer"] for r in per if r.get("wer") is not None]
        result = {
            "sessions": args.sessions,
            "aggregate_partials": total_partials,
            "aggregate_partials_per_s": round(total_partials / wall, 2),
            "worst_session_p50_ms": max(p50s) if p50s else None,
            "worst_overrun_rtf": max(r["pacing_overrun_rtf"] for r in per),
            "finals_nonempty": sum(1 for r in per if r["final_text_len"]),
            "wall_s": round(wall, 2),
            # worst across sessions, so --gate-wer gates multi-session
            # runs too (every session streams the same fixture)
            "wer": max(wers) if wers else None,
            "per_session": per,
        }
    else:
        result = await run_benchmark(connect, duration_s=args.duration,
                                     language=language,
                                     pace=not args.no_pace,
                                     audio=audio, expected=expected)
    print(json.dumps(result, ensure_ascii=False))
    if args.gate_wer is not None and result.get("wer") is not None:
        # Not a bare assert: the gate must hold under `python -O` too.
        if result["wer"] > args.gate_wer:
            raise SystemExit(f"streaming WER {result['wer']:.1%} > gate "
                             f"{args.gate_wer:.0%}")
    os.makedirs("reports", exist_ok=True)
    with open("reports/realtime_latest.json", "w") as f:
        json.dump(result, f, indent=1, ensure_ascii=False)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--url", default="ws://localhost:8000/ws/transcribe")
    parser.add_argument("--inproc", action="store_true")
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--language", default="en")
    parser.add_argument("--no-pace", action="store_true")
    parser.add_argument("--wav", default=None,
                        help="real fixture to stream (<name>.wav with "
                             "sibling .txt transcript → reports WER/CER)")
    parser.add_argument("--gate-wer", type=float, default=None,
                        help="fail when streaming WER exceeds this fraction")
    parser.add_argument("--sessions", type=int, default=1,
                        help="concurrent paced sessions (aggregate "
                             "throughput mode)")
    args = parser.parse_args()
    from qwen3_asr_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
