"""E2E harness: black-box tests against a LIVE server (reference E2Etest/).

Server discovery: ``ASR_E2E_URL`` (default http://localhost:8100). If no
server answers /health within 30 s the whole suite SKIPS (not fails) —
reference conftest.py:611-630 semantics. Each run writes a markdown report
under e2e/reports/ (summary, failures, per-test durations vs SLA).

Start a disposable CPU server + run everything:  ./e2e/run_e2e.sh
"""
import json
import os
import sys
import time
import urllib.request
from datetime import datetime
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

BASE_URL = os.getenv("ASR_E2E_URL", "http://localhost:8100")
WS_URL = BASE_URL.replace("http", "ws", 1) + "/ws/transcribe"

# Per-test duration SLAs (seconds) — reference conftest.py:52-112 model.
DURATION_SLAS = {
    "test_health": 2,
    "test_transcribe_short": 30,
    "test_transcribe_medium": 60,
    "test_sse_stream": 60,
    "test_ws_flush_roundtrip": 15,
    "test_ws_partial_latency": 60,
    "test_subtitles_fast": 45,
    "test_error_garbage": 5,
    "test_error_empty_file": 5,
    "test_error_missing_file_param": 5,
    "test_very_small_audio": 30,
    "test_language_param_echo": 30,
    "test_deterministic_repeat": 60,
    "test_transcribe_silence": 30,
    "test_memory_stable_after_repeats": 240,
    "test_realtime_benchmark": 180,
    "test_ws_cumulative_partials_monotonic": 120,
    "test_concurrent_http_requests": 120,
    "test_ws_not_blocked_by_http": 90,
    "test_ws_recovery_after_error": 30,
    "test_http_recovery_after_error": 60,
    "test_idle_unload_and_lazy_reload": 180,
    "test_realtime_streaming_accuracy": 90,
    "test_accuracy_wer_gate": 300,
    "test_accuracy_auto_language_detect": 120,
    "test_subtitles_accurate_real_speech": 120,
}

_results = []
_accuracy_rows = []


def record_accuracy(rows):
    """Called by the WER/CER gate to surface a per-language accuracy table
    in the markdown report (reference conftest.py:33-49 accuracy breakdown)."""
    _accuracy_rows.extend(rows)


def _server_alive(timeout_s: float = 30.0) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(BASE_URL + "/health", timeout=3) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(1)
    return False


@pytest.fixture(scope="session")
def ensure_server():
    if not _server_alive(float(os.getenv("ASR_E2E_WAIT_S", "30"))):
        pytest.skip(f"no live server at {BASE_URL} — start one or set "
                    "ASR_E2E_URL (see e2e/run_e2e.sh)")
    return BASE_URL


def _post_wav(path: str, timeout_s: float):
    """Minimal multipart POST of a WAV to /v1/audio/transcriptions."""
    import uuid
    boundary = uuid.uuid4().hex
    with open(path, "rb") as f:
        data = f.read()
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n").encode() + data + \
        f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        BASE_URL + "/v1/audio/transcriptions", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return resp.status


@pytest.fixture(scope="session")
def ensure_model_loaded(ensure_server, audio_fixtures):
    """Trigger real transcriptions and WAIT for them before any SLA-timed
    test runs (reference conftest.py:760-782 `ensure_model_loaded`). The
    first request pays lazy model load and — on a tunnel-attached TPU whose
    persistent compile cache is cold (e.g. after a quantization-flag change
    re-keys every executable) — a multi-minute remote bucket compile. Paying
    that here, in session-fixture setup that the report hook never times,
    keeps the per-test SLAs measuring steady-state serving. Primes every
    audio-length bucket the suite touches plus one WS flush roundtrip."""
    budget = float(os.getenv("ASR_E2E_LOAD_TIMEOUT_S", "900"))
    deadline = time.time() + budget
    last_err = None
    # First clip retries until the model is up; the rest are bucket warmers.
    for name in ("speech_2s", "short_5s", "medium_20s"):
        while True:
            remaining = deadline - time.time()
            if remaining <= 0:
                pytest.fail(f"model not ready after {budget:.0f}s "
                            f"(ASR_E2E_LOAD_TIMEOUT_S): {last_err}")
            try:
                _post_wav(audio_fixtures[name], min(remaining, 600))
                break
            except Exception as e:  # noqa: BLE001 — retry anything transient
                last_err = e
                time.sleep(2)

    async def _ws_prime():
        # Walk the full partial-tick ladder (every window-growth bucket up
        # to the cap), unpaced — so the paced WS tests measure warm serving,
        # not per-bucket first compiles. 8 s of speech-like audio = ~17
        # ticks at the 450 ms buffer trigger, window capped at 6 s.
        import aiohttp
        import numpy as np
        from util_audio import speech_like
        pcm = np.clip(speech_like(8.0, seed=7) * 32767, -32768,
                      32767).astype("<i2").tobytes()
        async with aiohttp.ClientSession() as s:
            async with s.ws_connect(WS_URL) as ws:
                await ws.receive_json()
                for i in range(0, len(pcm), 14400):
                    await ws.send_bytes(pcm[i:i + 14400])
                await ws.send_json({"action": "flush"})
                while True:
                    msg = await ws.receive_json()
                    if msg.get("is_final") or msg.get("error"):
                        return
    import asyncio
    try:
        asyncio.run(asyncio.wait_for(
            _ws_prime(), max(10.0, deadline - time.time())))
    except Exception as e:  # noqa: BLE001 — WS warmup is best-effort
        last_err = e
    return BASE_URL


@pytest.fixture(scope="session")
def audio_fixtures(tmp_path_factory):
    """Synthetic WAV fixtures (reference E2Etest/utils/audio.py families)."""
    from util_audio import silence, speech_like, tone
    from qwen3_asr_tpu.audio.codec import encode_wav
    d = tmp_path_factory.mktemp("audio")
    files = {
        "short_5s": (d / "short_5s.wav", tone(5.0, 440.0)),
        "medium_20s": (d / "medium_20s.wav", speech_like(20.0, seed=1)),
        "speech_2s": (d / "speech_2s.wav", speech_like(2.0, seed=2)),
        "silence_5s": (d / "silence_5s.wav", silence(5.0)),
    }
    out = {}
    for name, (path, audio) in files.items():
        path.write_bytes(encode_wav(audio, 16000, normalize=True))
        out[name] = str(path)
    return out


# ── markdown report hooks (reference conftest report builder) ────────────────

@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if report.when == "call":
        _results.append({
            "name": item.name,
            "outcome": report.outcome,
            "duration": round(report.duration, 2),
            "sla": DURATION_SLAS.get(item.name.split("[")[0]),
            "error": str(report.longrepr)[:500] if report.failed else None,
        })


def pytest_sessionfinish(session, exitstatus):
    if not _results:
        return
    reports_dir = Path(__file__).parent / "reports"
    reports_dir.mkdir(exist_ok=True)
    ts = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    passed = sum(1 for r in _results if r["outcome"] == "passed")
    failed = sum(1 for r in _results if r["outcome"] == "failed")
    skipped = sum(1 for r in _results if r["outcome"] == "skipped")

    lines = [f"# E2E Report — {ts}", "",
             f"Server: `{BASE_URL}`", "",
             f"**{passed} passed, {failed} failed, {skipped} skipped**", "",
             "| test | outcome | duration (s) | SLA (s) | within SLA |",
             "|---|---|---|---|---|"]
    for r in _results:
        sla = r["sla"]
        ok = "—" if sla is None else ("✅" if r["duration"] <= sla else "⚠️")
        lines.append(f"| {r['name']} | {r['outcome']} | {r['duration']} | "
                     f"{sla or '—'} | {ok} |")
    fails = [r for r in _results if r["error"]]
    if fails:
        lines += ["", "## Failures", ""]
        for r in fails:
            lines += [f"### {r['name']}", "```", r["error"], "```", ""]
    if _accuracy_rows:
        lines += ["", "## Accuracy Breakdown", "",
                  "| file | lang | WER | CER | gate | pass |",
                  "|---|---|---|---|---|---|"]
        for r in _accuracy_rows:
            lines.append(
                f"| {r['file']} | {r['lang']} | {r['wer']:.1%} | "
                f"{r['cer']:.1%} | {r['gate']:.0%} | "
                f"{'✅' if r['passed'] else '❌'} |")
    rt = Path(__file__).parent / "reports" / "realtime_latest.json"
    if rt.exists():
        lines += ["", "## Real-Time Benchmark", "```json",
                  rt.read_text(), "```"]
    (reports_dir / f"{ts}.md").write_text("\n".join(lines))
