"""Tests for the structured JSON logger (parity with reference src/logger.py)."""
import io
import json
import logging

from qwen3_asr_tpu.utils.logging import (
    InterceptHandler,
    StructuredLogger,
    get_request_id,
    reset_request_id,
    set_request_id,
)


def _capture(level="trace"):
    stream = io.StringIO()
    return StructuredLogger(stream=stream, level=level), stream


def test_json_shape_and_service():
    log, stream = _capture()
    log.info("hello {}", "world", extra_field=42)
    entry = json.loads(stream.getvalue())
    assert entry["message"] == "hello world"
    assert entry["level"] == "info"
    assert entry["service"] == "qwen3-asr"
    assert entry["extra_field"] == 42
    assert "timestamp" in entry


def test_level_canonicalization():
    log, stream = _capture()
    log.warning("w")
    log.critical("c")
    lines = [json.loads(l) for l in stream.getvalue().splitlines()]
    assert lines[0]["level"] == "warn"
    assert lines[1]["level"] == "fatal"


def test_request_id_injection():
    log, stream = _capture()
    token = set_request_id("req-123")
    try:
        log.info("traced")
        assert get_request_id() == "req-123"
    finally:
        reset_request_id(token)
    entry = json.loads(stream.getvalue())
    assert entry["requestId"] == "req-123"
    assert get_request_id() is None


def test_level_filtering():
    log, stream = _capture(level="warning")
    log.info("hidden")
    log.error("shown")
    lines = stream.getvalue().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0])["message"] == "shown"


def test_brace_format_salvage():
    log, stream = _capture()
    log.info("bad {} {} {}", 1)  # too few args must not raise
    entry = json.loads(stream.getvalue())
    assert "1" in entry["message"]


def test_stdlib_interception():
    target, stream = _capture()
    lg = logging.getLogger("test.interceptor")
    lg.handlers = [InterceptHandler(target)]
    lg.propagate = False
    lg.setLevel(logging.INFO)
    lg.info("from stdlib %s", "fmt")
    entry = json.loads(stream.getvalue())
    assert entry["message"] == "from stdlib fmt"
    assert entry["logger"] == "test.interceptor"
    assert entry["level"] == "info"


def test_exception_field():
    log, stream = _capture()
    try:
        raise ValueError("boom")
    except ValueError:
        log.exception("failed")
    entry = json.loads(stream.getvalue())
    assert entry["err"] == "boom"
    assert entry["level"] == "error"
