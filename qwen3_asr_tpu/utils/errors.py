"""Standardized error payloads.

Error shape parity with the reference (src/errors.py:5-18):
``{code, message, statusCode, context: {requestId, ...}}``.

The full code catalog in use across the stack (SURVEY.md §2.1):
AUDIO_DECODE_FAILED, TRANSCRIPTION_TIMEOUT, SUBTITLE_TIMEOUT,
TRANSLATION_FAILED, EMPTY_AUDIO, INVALID_MODE, WORKER_ERROR,
UNSUPPORTED_SAMPLE_RATE, UNKNOWN_ACTION, INVALID_JSON,
WORKER_STARTUP_FAILED, WORKER_CONNECTION_FAILED, SSE_STREAM_ERROR,
WEBSOCKET_ERROR.
"""
from __future__ import annotations

from typing import Any

from .logging import get_request_id


def error_body(code: str, message: str, status_code: int, **context: Any) -> dict:
    """Build the standardized error payload dict."""
    ctx = dict(context) if context else {}
    req_id = get_request_id()
    if req_id:
        ctx["requestId"] = req_id
    body: dict[str, Any] = {
        "code": code,
        "message": message,
        "statusCode": status_code,
    }
    if ctx:
        body["context"] = ctx
    return body


class ApiError(Exception):
    """Exception carrying a standardized error payload."""

    def __init__(self, code: str, message: str, status_code: int, **context: Any):
        super().__init__(message)
        self.code = code
        self.message = message
        self.status_code = status_code
        self.context = context

    def body(self) -> dict:
        return error_body(self.code, self.message, self.status_code, **self.context)
