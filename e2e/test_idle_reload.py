"""Live idle-unload / reload E2E (reference E2Etest/test_performance.py
idle tier + test_integration.py reload semantics).

Self-contained: spawns a disposable CPU server with IDLE_TIMEOUT=2 on its
own port (the shared live server keeps the default 120 s timeout, which no
test can afford to wait out), drives it over real HTTP, and verifies the
unload→lazy-reload cycle end to end.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from e2e.test_live import _post_multipart

PORT = int(os.getenv("ASR_E2E_IDLE_PORT", "8177"))
URL = f"http://localhost:{PORT}"


def _health():
    with urllib.request.urlopen(URL + "/health", timeout=5) as r:
        return json.loads(r.read())


def _wait(pred, timeout_s, what):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            if pred():
                return
        except Exception:
            pass
        time.sleep(0.5)
    pytest.fail(f"timed out waiting for {what}")


@pytest.mark.slow
def test_idle_unload_and_lazy_reload(tmp_path):
    from fixtures import write_tiny_checkpoint
    from util_audio import speech_like
    from qwen3_asr_tpu.audio.codec import encode_wav

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    wav = tmp_path / "s.wav"
    wav.write_bytes(encode_wav(speech_like(1.0, seed=4), 16000))

    env = dict(os.environ,
               JAX_PLATFORMS="cpu", MODEL_ID=ckpt, SKIP_WARMUP="true",
               IDLE_TIMEOUT="2", ASR_WATCHDOG_INTERVAL="1")
    logf = open(tmp_path / "server.log", "wb")
    proc = subprocess.Popen(
        [sys.executable, "-m", "qwen3_asr_tpu.serving.server",
         "--port", str(PORT)],
        env=env, stdout=logf, stderr=subprocess.STDOUT,
        cwd=str(Path(__file__).parent.parent))
    try:
        _wait(lambda: _health()["status"] == "ok", 90, "server startup")

        # 1. First request lazy-loads the model.
        status, body, _ = _post_multipart(
            URL + "/v1/audio/transcriptions", str(wav), {"language": "en"})
        assert status == 200, body
        assert _health()["model_loaded"] is True

        # 2. Idle watchdog unloads after IDLE_TIMEOUT; health must reflect
        #    the unload (model_loaded=false AND model_id cleared).
        _wait(lambda: _health()["model_loaded"] is False
              and _health().get("model_id") is None, 30, "idle unload")

        # 3. Next request transparently reloads and succeeds.
        status, body, _ = _post_multipart(
            URL + "/v1/audio/transcriptions", str(wav), {"language": "en"})
        assert status == 200, body
        data = json.loads(body)
        assert data["text"]
        assert _health()["model_loaded"] is True
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        logf.close()
