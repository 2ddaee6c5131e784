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
