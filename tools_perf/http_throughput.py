"""Host-server throughput benchmark (the Granian-claim counterpart).

The reference ships a Rust ASGI option claiming +15-25% HTTP throughput
and +30-50% /health RPS over uvicorn (reference docs/GRANIAN_BENCHMARK.md:
46-53 — expected, not measured). This build serves on aiohttp with no
ASGI hop; this benchmark MEASURES the host-server numbers against a live
server so docs/HOST_SERVER.md carries evidence instead of claims.

Measures, per concurrency level:
* GET /health RPS           — pure host-server + JSON overhead
* POST transcriptions RPS   — upload parse + queue + tiny-model inference
* WS binary frame RPS       — socket + frame dispatch overhead (partials
  disabled by sub-trigger chunks, so no inference in the loop)

Run (CPU tiny server):
    JAX_PLATFORMS=cpu MODEL_ID=<tiny-ckpt> SKIP_WARMUP=true \
        python -m qwen3_asr_tpu.serving.server --port 8123 &
    python tools_perf/http_throughput.py --url http://localhost:8123
"""
import argparse
import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def _spam(session, method, url, duration_s, payload_factory=None):
    n = errs = 0
    deadline = time.time() + duration_s
    while time.time() < deadline:
        try:
            if method == "GET":
                async with session.get(url) as r:
                    await r.read()
                    errs += r.status != 200
            else:
                async with session.post(url, data=payload_factory()) as r:
                    await r.read()
                    errs += r.status != 200
            n += 1
        except Exception:
            errs += 1
    return n, errs


async def bench_http(url, path, concurrency, duration_s, payload_factory=None):
    import aiohttp
    async with aiohttp.ClientSession() as session:
        t0 = time.time()
        results = await asyncio.gather(*[
            _spam(session, "POST" if payload_factory else "GET", url + path,
                  duration_s, payload_factory)
            for _ in range(concurrency)])
        wall = time.time() - t0
    n = sum(r[0] for r in results)
    errs = sum(r[1] for r in results)
    return {"rps": round(n / wall, 1), "requests": n, "errors": errs}


async def bench_ws_frames(url, duration_s=3.0, frame_bytes=3200):
    """Binary frames below the 450 ms trigger: no inference, pure socket +
    session-engine dispatch."""
    import aiohttp
    sent = 0
    async with aiohttp.ClientSession() as session:
        ws = await session.ws_connect(
            url.replace("http", "ws", 1) + "/ws/transcribe")
        await ws.receive_json()
        payload = b"\x01\x00" * (frame_bytes // 2)
        deadline = time.time() + duration_s
        t0 = time.time()
        while time.time() < deadline:
            await ws.send_bytes(payload)
            sent += 1
        wall = time.time() - t0
        await ws.close()
    return {"frames_per_s": round(sent / wall, 1), "frame_bytes": frame_bytes}


def _wav_payload_factory():
    import aiohttp
    import numpy as np
    from qwen3_asr_tpu.audio.codec import encode_wav
    rng = np.random.default_rng(0)
    wav = encode_wav((rng.standard_normal(32000) * 0.05).astype("f4"), 16000)

    def make():
        form = aiohttp.FormData()
        form.add_field("file", wav, filename="a.wav",
                       content_type="audio/wav")
        form.add_field("language", "en")
        return form
    return make


async def amain(args):
    out = {"server": args.url, "duration_s": args.duration}
    for conc in (1, 16, 64):
        out[f"health_c{conc}"] = await bench_http(
            args.url, "/health", conc, args.duration)
    payload = _wav_payload_factory()
    for conc in (1, 8):
        out[f"transcribe_2s_c{conc}"] = await bench_http(
            args.url, "/v1/audio/transcriptions", conc, args.duration,
            payload)
    out["ws_frames"] = await bench_ws_frames(args.url)
    print(json.dumps(out, indent=1))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--url", default="http://localhost:8123")
    parser.add_argument("--duration", type=float, default=3.0)
    args = parser.parse_args()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
