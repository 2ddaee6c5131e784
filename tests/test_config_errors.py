"""Tests for env validation and error payload shapes."""
import json
import subprocess
import sys

import pytest

from qwen3_asr_tpu.utils.errors import ApiError, error_body
from qwen3_asr_tpu.utils.logging import reset_request_id, set_request_id
from qwen3_asr_tpu.text.repetition import detect_and_fix_repetitions


def test_error_body_shape():
    body = error_body("AUDIO_DECODE_FAILED", "bad audio", 422, fileSize=100)
    assert body == {
        "code": "AUDIO_DECODE_FAILED",
        "message": "bad audio",
        "statusCode": 422,
        "context": {"fileSize": 100},
    }


def test_error_body_request_id():
    token = set_request_id("rid-1")
    try:
        body = error_body("X", "y", 500)
    finally:
        reset_request_id(token)
    assert body["context"]["requestId"] == "rid-1"


def test_api_error_roundtrip():
    err = ApiError("TRANSCRIPTION_TIMEOUT", "too slow", 504, elapsed=1.5)
    body = err.body()
    assert body["statusCode"] == 504
    assert body["context"]["elapsed"] == 1.5


def _run_validate(env_overrides):
    """Run validate_env in a subprocess (it may sys.exit)."""
    code = (
        "import os\n"
        + "".join(f"os.environ[{k!r}] = {v!r}\n" for k, v in env_overrides.items())
        + "from qwen3_asr_tpu.config import validate_env\n"
        "validate_env()\n"
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd="/root/repo")


def test_validate_env_ok():
    r = _run_validate({"MODEL_ID": "Qwen/Qwen3-ASR-1.7B"})
    assert r.returncode == 0, r.stdout + r.stderr


def test_validate_env_missing_model_id():
    r = _run_validate({"MODEL_ID": ""})
    assert r.returncode == 1
    assert "MODEL_ID" in r.stdout


def test_validate_env_collects_all_errors():
    r = _run_validate({"MODEL_ID": "", "REQUEST_TIMEOUT": "-1", "QUANTIZE": "int2"})
    assert r.returncode == 1
    out = r.stdout
    assert "MODEL_ID" in out and "REQUEST_TIMEOUT" in out and "QUANTIZE" in out


def test_validate_env_log_level_aliases():
    r = _run_validate({"MODEL_ID": "m", "LOG_LEVEL": "WARN"})
    assert r.returncode == 0
    r = _run_validate({"MODEL_ID": "m", "LOG_LEVEL": "nope"})
    assert r.returncode == 1


def test_validate_env_gateway_worker_port():
    r = _run_validate({"MODEL_ID": "m", "GATEWAY_MODE": "true", "WORKER_PORT": "70000"})
    assert r.returncode == 1
    assert "WORKER_PORT" in r.stdout


def test_validate_env_gateway_worker_fleet():
    r = _run_validate({"MODEL_ID": "m", "GATEWAY_MODE": "true",
                       "WORKER_PORTS": "8001,nope"})
    assert r.returncode == 1
    assert "WORKER_PORTS" in r.stdout

    r = _run_validate({"MODEL_ID": "m", "GATEWAY_MODE": "true",
                       "WORKER_HOSTS": ":8001"})
    assert r.returncode == 1
    assert "WORKER_HOSTS" in r.stdout

    r = _run_validate({"MODEL_ID": "m", "GATEWAY_MODE": "true",
                       "WORKER_PORTS": "8001,8002",
                       "WORKER_HOSTS": "10.0.0.2:8001,10.0.0.3"})
    assert r.returncode == 0


# --- repetition post-processor (reference src/server.py:170-197) -----------

def test_repetition_short_text_unchanged():
    assert detect_and_fix_repetitions("hi hi hi") == "hi hi hi"  # len < 10


def test_repetition_single_word_collapse():
    assert detect_and_fix_repetitions("well um um um um okay") == "well um okay"


def test_repetition_phrase_collapse():
    text = "i want to go i want to go i want to go i want to go now"
    fixed = detect_and_fix_repetitions(text)
    assert fixed == "i want to go now"


def test_repetition_two_repeats_kept():
    text = "the cat sat down the cat sat down and left quietly"
    assert detect_and_fix_repetitions(text) == text


def test_repetition_empty():
    assert detect_and_fix_repetitions("") == ""
