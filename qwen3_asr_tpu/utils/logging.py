"""Structured JSON logging with request-ID tracing.

Behavioral parity with the reference's loguru-based logger
(reference: src/logger.py:36-107) but built on the stdlib:

* one JSON line per event to stdout:
  ``{timestamp, level, message, service: "qwen3-asr", requestId?, ...extra, err?}``
* level names canonicalized: ``critical``->``fatal``, ``warning``->``warn``
  (reference: src/logger.py:30-33)
* loguru-style brace formatting: ``log.info("took {:.2f}s", dt, key=value)``
* a ``contextvars``-backed request ID set by HTTP middleware and injected
  into every log line (reference: src/logger.py:10-26)
* stdlib logging interception so third-party (aiohttp, jax) logs are
  emitted through the same sink (reference: src/logger.py:59-104)
"""
from __future__ import annotations

import contextvars
import datetime
import json
import logging
import os
import sys
from typing import Any, Optional

_request_id_var: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "request_id", default=None
)

SERVICE_NAME = "qwen3-asr"

# Canonical output level names (critical->fatal, warning->warn).
_LEVEL_MAP = {"critical": "fatal", "warning": "warn"}

_LEVEL_NUM = {
    "trace": 5,
    "debug": 10,
    "info": 20,
    "warning": 30,
    "error": 40,
    "critical": 50,
}

# Aliases accepted from LOG_LEVEL env (normalized before use).
_LEVEL_ALIASES = {"warn": "warning", "fatal": "critical"}


def set_request_id(req_id: str) -> contextvars.Token:
    """Set the requestId for the current async context. Returns a reset token."""
    return _request_id_var.set(req_id)


def reset_request_id(token: contextvars.Token) -> None:
    _request_id_var.reset(token)


def get_request_id() -> Optional[str]:
    return _request_id_var.get()


def _now_iso() -> str:
    return datetime.datetime.now(datetime.timezone.utc).astimezone().isoformat()


class StructuredLogger:
    """Minimal loguru-compatible structured logger: brace-format + kw extras."""

    def __init__(self, stream=None, level: Optional[str] = None):
        self._stream = stream if stream is not None else sys.stdout
        raw = (level or os.getenv("LOG_LEVEL", "info")).lower()
        raw = _LEVEL_ALIASES.get(raw, raw)
        self._level_num = _LEVEL_NUM.get(raw, 20)

    # -- configuration -------------------------------------------------------
    def set_level(self, level: str) -> None:
        raw = _LEVEL_ALIASES.get(level.lower(), level.lower())
        self._level_num = _LEVEL_NUM.get(raw, 20)

    @property
    def level_num(self) -> int:
        return self._level_num

    # -- emit ----------------------------------------------------------------
    def _emit(self, level: str, message: str, args: tuple, extra: dict,
              err: Optional[BaseException] = None) -> None:
        if _LEVEL_NUM[level] < self._level_num:
            return
        if args:
            try:
                message = message.format(*args)
            except (IndexError, KeyError, ValueError):
                # Salvage unformattable messages rather than dropping them.
                message = message + " " + " ".join(repr(a) for a in args)
        entry: dict[str, Any] = {
            "timestamp": _now_iso(),
            "level": _LEVEL_MAP.get(level, level),
            "message": message,
            "service": SERVICE_NAME,
        }
        req_id = _request_id_var.get()
        if req_id:
            entry["requestId"] = req_id
        if extra:
            entry.update(extra)
        if err is not None:
            entry["err"] = str(err)
        try:
            line = json.dumps(entry, default=str)
        except (TypeError, ValueError):
            line = json.dumps({k: str(v) for k, v in entry.items()})
        self._stream.write(line + "\n")
        try:
            self._stream.flush()
        except (ValueError, OSError):
            pass

    def trace(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("trace", message, args, extra)

    def debug(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("debug", message, args, extra)

    def info(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("info", message, args, extra)

    def warning(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("warning", message, args, extra)

    warn = warning

    def error(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("error", message, args, extra)

    def critical(self, message: str, *args: Any, **extra: Any) -> None:
        self._emit("critical", message, args, extra)

    def exception(self, message: str, *args: Any, **extra: Any) -> None:
        exc = sys.exc_info()[1]
        self._emit("error", message, args, extra, err=exc)


class InterceptHandler(logging.Handler):
    """Bridge stdlib logging records into the structured JSON sink."""

    _STD_TO_NAME = {
        logging.DEBUG: "debug",
        logging.INFO: "info",
        logging.WARNING: "warning",
        logging.ERROR: "error",
        logging.CRITICAL: "critical",
    }

    def __init__(self, target: Optional[StructuredLogger] = None):
        super().__init__()
        self._target = target

    def emit(self, record: logging.LogRecord) -> None:
        target = self._target or log
        level = self._STD_TO_NAME.get(record.levelno)
        if level is None:
            level = "info" if record.levelno < logging.WARNING else "error"
        err = None
        if record.exc_info and record.exc_info[1] is not None:
            err = record.exc_info[1]
        try:
            message = record.getMessage()
        except Exception:
            message = str(record.msg)
        target._emit(level, message, (), {"logger": record.name}, err=err)


def intercept_stdlib_logging(target: Optional[StructuredLogger] = None) -> None:
    """Route all stdlib logging (aiohttp, asyncio, jax, ...) to the JSON sink."""
    handler = InterceptHandler(target)
    logging.root.handlers = [handler]
    level = os.getenv("LOG_LEVEL", "info").upper()
    level = {"TRACE": "DEBUG", "WARN": "WARNING", "FATAL": "CRITICAL"}.get(level, level)
    try:
        logging.root.setLevel(level)
    except ValueError:
        logging.root.setLevel(logging.INFO)
    for name in list(logging.root.manager.loggerDict.keys()):
        logging.getLogger(name).handlers = []
        logging.getLogger(name).propagate = True


def setup_logger() -> StructuredLogger:
    return StructuredLogger()


log = setup_logger()
