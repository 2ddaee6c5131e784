"""Standalone API server: all public endpoints over aiohttp.

Contract parity with the reference server (src/server.py:546-1380):
same routes, same request forms, same response JSON/SRT/SSE shapes, same
WS protocol (handshake, binary PCM s16le, flush/reset/config actions,
cumulative partials, VAD auto-flush, disconnect flush), same error codes,
same env-var surface.

Run: ``python -m qwen3_asr_tpu.serving.server [--port 8000]``
"""
from __future__ import annotations

import asyncio
import json
import os
import time
import uuid

import numpy as np
import aiohttp
from aiohttp import WSMsgType, web

from ..audio.codec import AudioDecodeError, decode_audio
from ..audio.vad import default_flush_ticks as _vad_default_flush_ticks
from ..audio.vad import is_speech
from ..config import TARGET_SR, resolve_ws_mode, validate_env
from ..runtime.lifecycle import ModelManager
from ..text.repetition import detect_and_fix_repetitions
from ..utils.logging import log, set_request_id, reset_request_id
from .http import (
    add_docs_routes,
    build_openapi,
    error_response,
    multipart_body,
    parse_bool,
    read_upload,
    request_id_middleware,
)
from .schemas import API_DESCRIPTION, API_TAGS

from .meta import API_TITLE, API_VERSION, route_metadata  # noqa: F401

# ── WebSocket streaming config (reference src/server.py:139-155) ─────────────
WS_BUFFER_SIZE = int(os.getenv("WS_BUFFER_SIZE", str(int(TARGET_SR * 2 * 0.45))))
WS_FLUSH_SILENCE_MS = int(os.getenv("WS_FLUSH_SILENCE_MS", "600"))
WS_WINDOW_MAX_S = float(os.getenv("WS_WINDOW_MAX_S", "6.0"))
WS_WINDOW_MAX_BYTES = int(WS_WINDOW_MAX_S * TARGET_SR * 2)
ASR_USE_SERVER_VAD = os.getenv("ASR_USE_SERVER_VAD", "true").lower() == "true"
# Consecutive silent 450 ms ticks required before a VAD auto-flush. With
# the learned VAD (mid-speech false-silence <1% measured over the 12
# FLEURS clips) the default is 1 — the reference's exact 1-chunk flush
# trigger (src/server.py:1216-1243). The spectral fallback misreads ~6%
# of mid-speech ticks as silence (a premature final roughly every 7 s of
# speech), so it debounces to 2 ticks (900 ms). Env overrides both.
from ..config import _safe_int as _cfg_safe_int

ASR_VAD_FLUSH_TICKS = max(1, _cfg_safe_int(
    "ASR_VAD_FLUSH_TICKS", str(_vad_default_flush_ticks())))


def get_manager(request: web.Request) -> ModelManager:
    return request.app["manager"]


# ── endpoint handlers ─────────────────────────────────────────────────────────

async def health(request: web.Request) -> web.Response:
    mgr = get_manager(request)
    info = mgr.health_info()
    info["active_ws_sessions"] = mgr.ws_sessions
    info["aligner"] = _aligner_health_state()
    return web.json_response(info)


async def metrics_endpoint(request: web.Request) -> web.Response:
    """Prometheus text exposition (net-new vs the reference)."""
    from ..utils.telemetry import metrics
    mgr = get_manager(request)
    metrics.gauge("asr_model_loaded", 1.0 if mgr.engine is not None else 0.0)
    metrics.gauge("asr_queue_depth", float(mgr.queue.depth))
    metrics.gauge("asr_ws_sessions", float(mgr.ws_sessions))
    return web.Response(text=metrics.render(),
                        content_type="text/plain", charset="utf-8")


# Aligner weights that fail to load back off instead of sticking for the
# process lifetime (installing the checkpoint no longer needs a restart to
# be noticed): retry after ASR_ALIGNER_RETRY_S (default 300 s). State is
# surfaced in /health as "aligner" so the degradation is visible.
_aligner_retry_at = 0.0


def _aligner_health_state() -> str:
    from ..sidecars import subtitle as subtitle_mod
    if subtitle_mod.aligner_loaded():
        return "loaded"
    if _aligner_retry_at:
        return "unavailable_retrying"
    return "not_loaded"


def merge_results(results) -> tuple:
    """Join the engine's per-segment results into the single-result response
    the public contract promises (the reference SDK returns one result for
    the whole file; this engine's net-new 30 s silence-boundary segmentation
    must be invisible to clients). Returns (text, language, timestamps)."""
    text = " ".join(r.text for r in results if r.text)
    language = next((r.language for r in results if r.language), "")
    stamps: list = []
    for r in results:
        if r.timestamps:
            stamps.extend(r.timestamps)
    return text, language, (stamps or None)


async def _decode_or_error(file_bytes, filename, endpoint):
    if file_bytes is None or len(file_bytes) == 0:
        return None, error_response("AUDIO_DECODE_FAILED",
                                    "Could not decode audio: empty file",
                                    422, fileSize=0)
    try:
        # Decode off the event loop: FLAC/MP3/OGG decode is host CPU work
        # (pure-Python bit streams / SDL under a lock) that would otherwise
        # stall every concurrent WS tick for its duration.
        audio, sr = await asyncio.get_event_loop().run_in_executor(
            None, decode_audio, file_bytes)
        return (audio, sr), None
    except AudioDecodeError as e:
        log.error("{} | audio decode failed: {}", endpoint, e)
        return None, error_response("AUDIO_DECODE_FAILED",
                                    f"Could not decode audio: {e}", 422,
                                    fileSize=len(file_bytes))


async def transcribe(request: web.Request) -> web.Response:
    mgr = get_manager(request)
    await mgr.ensure_loaded()

    fields, file_bytes, filename = await read_upload(request)
    language = fields.get("language", "auto")
    return_timestamps = parse_bool(fields.get("return_timestamps"))
    log.info("POST /v1/audio/transcriptions | file={} size={} language={}",
             filename, len(file_bytes or b""), language)
    t0 = time.time()

    decoded, err = await _decode_or_error(file_bytes, filename,
                                          "POST /v1/audio/transcriptions")
    if err:
        return err
    audio, sr = decoded
    lang_code = None if language == "auto" else language

    if return_timestamps and os.getenv("ASR_TIMESTAMP_MODE",
                                       "accurate") == "accurate":
        # Model-quality word timing via the ForcedAligner (reference SDK
        # timestamps, src/server.py:866-869). Missing aligner weights are
        # not an error — the engine falls back to estimates. Already-loaded
        # (or known-unloadable) aligners skip the infer-executor round-trip,
        # which would otherwise queue behind in-flight inference.
        from ..sidecars import subtitle as subtitle_mod
        global _aligner_retry_at
        if not subtitle_mod.aligner_loaded() and \
                time.monotonic() >= _aligner_retry_at:
            from ..runtime.queue import infer_executor
            try:
                await asyncio.get_event_loop().run_in_executor(
                    infer_executor(), subtitle_mod.load_aligner)
                _aligner_retry_at = 0.0
            except Exception as e:
                _aligner_retry_at = time.monotonic() + float(
                    os.getenv("ASR_ALIGNER_RETRY_S", "300"))
                log.info("Aligner unavailable for timestamps ({}); "
                         "char-proportional estimates until the next "
                         "retry window", e)

    try:
        # Micro-batched path: concurrent same-bucket uploads share one
        # device dispatch (falls back to a solo job when not batchable).
        results = await asyncio.wait_for(
            mgr.batcher.transcribe(audio, sr, lang_code, return_timestamps),
            timeout=mgr.request_timeout)
    except asyncio.TimeoutError:
        log.warning("POST /v1/audio/transcriptions | timed out after {:.2f}s",
                    time.time() - t0)
        return error_response("TRANSCRIPTION_TIMEOUT", "Transcription timed out",
                              504, elapsed=round(time.time() - t0, 2))

    if results:
        text, language_code, stamps = merge_results(results)
        text = detect_and_fix_repetitions(text)
    else:
        text, language_code, stamps = "", (lang_code or language), None

    body = {"text": text, "language": language_code}
    if return_timestamps and stamps:
        body["timestamps"] = stamps
    log.info("POST /v1/audio/transcriptions | completed in {:.2f}s "
             "text_len={} lang={}", time.time() - t0, len(text), language_code)
    return web.json_response(body)


async def translate_endpoint(request: web.Request) -> web.Response:
    from ..sidecars.translator import translate_srt, translate_text
    mgr = get_manager(request)
    await mgr.ensure_loaded()

    fields, file_bytes, filename = await read_upload(request)
    language = fields.get("language", "en")
    response_format = fields.get("response_format", "json")
    log.info("POST /v1/audio/translations | file={} size={} target={} format={}",
             filename, len(file_bytes or b""), language, response_format)
    t0 = time.time()

    decoded, err = await _decode_or_error(file_bytes, filename,
                                          "POST /v1/audio/translations")
    if err:
        return err
    audio, sr = decoded
    target_lang = "en" if language.lower() not in ("en", "zh") else language.lower()

    try:
        results = await asyncio.wait_for(
            mgr.queue.submit(
                lambda: mgr.transcribe_sync(audio, sr, None, False),
                priority=1),
            timeout=mgr.request_timeout)
    except asyncio.TimeoutError:
        log.warning("POST /v1/audio/translations | timed out after {:.2f}s",
                    time.time() - t0)
        return error_response("TRANSCRIPTION_TIMEOUT", "Transcription timed out",
                              504, elapsed=round(time.time() - t0, 2))

    if response_format.lower() == "srt":
        if not results:
            return web.Response(text="", content_type="text/plain",
                                charset="utf-8")
        for r in results:
            r.text = detect_and_fix_repetitions(r.text)
        from ..sidecars.subtitle import generate_srt_from_results
        from ..runtime.queue import infer_executor
        original_srt = await asyncio.get_event_loop().run_in_executor(
            infer_executor(),
            lambda: generate_srt_from_results(results, audio, sr, mode="fast",
                                              max_line_chars=42))
        try:
            translated_srt = await translate_srt(original_srt, target_lang)
        except Exception as e:
            log.error("POST /v1/audio/translations | translation API failed "
                      "in {:.2f}s error={}", time.time() - t0, e)
            return error_response("TRANSLATION_FAILED",
                                  f"Translation API failed: {e}", 502)
        log.info("POST /v1/audio/translations | completed in {:.2f}s format={}",
                 time.time() - t0, response_format)
        return web.Response(
            text=translated_srt, content_type="text/plain", charset="utf-8",
            headers={"Content-Disposition":
                     'attachment; filename="translated_subtitles.srt"'})

    text = detect_and_fix_repetitions(merge_results(results)[0]) if results else ""
    if text.strip():
        try:
            translated_text = await translate_text(text, target_lang)
        except Exception as e:
            log.error("POST /v1/audio/translations | translation API failed "
                      "in {:.2f}s error={}", time.time() - t0, e)
            return error_response("TRANSLATION_FAILED",
                                  f"Translation API failed: {e}", 502)
    else:
        translated_text = ""
    log.info("POST /v1/audio/translations | completed in {:.2f}s format={}",
             time.time() - t0, response_format)
    return web.json_response({"text": translated_text, "language": target_lang})


async def generate_subtitles(request: web.Request) -> web.Response:
    mgr = get_manager(request)
    await mgr.ensure_loaded()

    fields, file_bytes, filename = await read_upload(request)
    language = fields.get("language", "auto")
    mode = fields.get("mode", "accurate")
    try:
        max_line_chars = int(fields.get("max_line_chars", "42"))
    except ValueError:
        max_line_chars = 42
    log.info("POST /v1/audio/subtitles | file={} size={} language={} mode={}",
             filename, len(file_bytes or b""), language, mode)
    t0 = time.time()

    if mode not in ("fast", "accurate"):
        return error_response("INVALID_MODE",
                              f"mode must be 'fast' or 'accurate', got '{mode}'",
                              422)

    decoded, err = await _decode_or_error(file_bytes, filename,
                                          "POST /v1/audio/subtitles")
    if err:
        return err
    audio, sr = decoded
    lang_code = None if language == "auto" else language
    return await subtitle_core(mgr, audio, sr, lang_code, mode,
                               max_line_chars, "POST /v1/audio/subtitles",
                               t0, _subtitle_aligner_error)


def _subtitle_aligner_error(e: Exception) -> web.Response:
    """Standalone-server mapping of an aligner-load failure (the worker
    always maps to WORKER_ERROR — the documented reference delta)."""
    return error_response(
        "SUBTITLE_TIMEOUT" if "timeout" in str(e).lower() else
        "WORKER_ERROR", f"ForcedAligner unavailable: {e}", 503)


def _srt_response(srt: str) -> web.Response:
    return web.Response(
        text=srt, content_type="text/plain", charset="utf-8",
        headers={"Content-Disposition":
                 'attachment; filename="subtitles.srt"'})


async def subtitle_core(mgr, audio, sr, lang_code, mode: str,
                        max_line_chars: int, endpoint: str, t0: float,
                        aligner_error) -> web.Response:
    """Shared subtitle flow (aligner load → transcribe → repetition fix →
    SRT) behind both the standalone endpoint and the worker route; the
    callers keep their own validation/status-code deltas
    (reference worker.py:229 vs server.py:697)."""
    from ..runtime.queue import infer_executor
    from ..sidecars import subtitle as subtitle_mod

    if mode == "accurate":
        try:
            await asyncio.get_event_loop().run_in_executor(
                infer_executor(), subtitle_mod.load_aligner)
        except Exception as e:
            log.error("{} | aligner load failed: {}", endpoint, e)
            return aligner_error(e)

    try:
        results = await asyncio.wait_for(
            mgr.queue.submit(
                lambda: mgr.transcribe_sync(audio, sr, lang_code, False),
                priority=1),
            timeout=mgr.request_timeout)
    except asyncio.TimeoutError:
        log.warning("{} | timed out after {:.2f}s", endpoint,
                    time.time() - t0)
        return error_response("SUBTITLE_TIMEOUT",
                              "Subtitle generation timed out", 504,
                              elapsed=round(time.time() - t0, 2))

    if not results:
        return _srt_response("")

    for r in results:
        r.text = detect_and_fix_repetitions(r.text)

    srt_content = await asyncio.get_event_loop().run_in_executor(
        infer_executor(),
        lambda: subtitle_mod.generate_srt_from_results(
            results=results, audio=audio, sr=sr, mode=mode,
            max_line_chars=max_line_chars))

    log.info("{} | completed in {:.2f}s mode={} srt_len={}", endpoint,
             time.time() - t0, mode, len(srt_content))
    return _srt_response(srt_content)


# ── SSE streaming (reference src/server.py:926-1050) ─────────────────────────

async def sse_transcribe_generator(mgr: ModelManager, audio, sr, lang_code,
                                   return_timestamps):
    """Yield SSE 'data:' lines for progressive chunked transcription."""
    from ..config import SSE_CHUNK_SECONDS, SSE_OVERLAP_SECONDS
    audio_duration = len(audio) / sr
    t0 = time.time()
    chunk_count = 0
    log.info("SSE stream | audio={:.2f}s lang={}", audio_duration,
             lang_code or "auto")
    try:
        chunk_samples = TARGET_SR * SSE_CHUNK_SECONDS
        overlap_samples = TARGET_SR * SSE_OVERLAP_SECONDS
        if sr != TARGET_SR:
            chunk_samples = sr * SSE_CHUNK_SECONDS
            overlap_samples = sr * SSE_OVERLAP_SECONDS
        if overlap_samples >= chunk_samples:
            # Misconfiguration (overlap >= chunk) would advance the loop
            # by zero samples and re-transcribe the same chunk forever.
            log.warning("SSE_OVERLAP_SECONDS >= SSE_CHUNK_SECONDS; "
                        "clamping overlap to half a chunk")
            overlap_samples = chunk_samples // 2

        if len(audio) <= chunk_samples:
            # Through the micro-batcher like the HTTP endpoint: chunks
            # from CONCURRENT SSE streams that land in the same bucket
            # share a dispatch (each stream's own chunks stay sequential).
            results = await mgr.batcher.transcribe(audio, sr, lang_code,
                                                   return_timestamps)
            if results:
                data = {"text": detect_and_fix_repetitions(results[0].text),
                        "language": results[0].language, "is_final": True}
                if return_timestamps and results[0].timestamps:
                    data["timestamps"] = results[0].timestamps
            else:
                data = {"text": "", "language": lang_code or "auto",
                        "is_final": True}
            chunk_count += 1
            yield f"data: {json.dumps(data)}\n\n"
        else:
            start = 0
            chunk_index = 0
            while start < len(audio):
                end = min(start + chunk_samples, len(audio))
                chunk = audio[start:end]
                is_last = end >= len(audio)
                results = await mgr.batcher.transcribe(
                    chunk, sr, lang_code, return_timestamps)
                if results:
                    data = {"text": detect_and_fix_repetitions(results[0].text),
                            "language": results[0].language,
                            "is_final": is_last, "chunk_index": chunk_index}
                else:
                    data = {"text": "", "language": lang_code or "auto",
                            "is_final": is_last, "chunk_index": chunk_index}
                chunk_count += 1
                yield f"data: {json.dumps(data)}\n\n"
                chunk_index += 1
                if is_last:
                    break
                start = end - overlap_samples

        log.info("SSE stream | done chunks={} elapsed={:.2f}s", chunk_count,
                 time.time() - t0)
        yield f"data: {json.dumps({'done': True})}\n\n"
    except Exception as e:
        log.error("SSE stream | error after {:.2f}s: {}", time.time() - t0, e)
        yield ("data: " + json.dumps({
            "code": "SSE_STREAM_ERROR", "message": str(e),
            "statusCode": 500}) + "\n\n")


async def transcribe_stream(request: web.Request) -> web.StreamResponse:
    mgr = get_manager(request)
    await mgr.ensure_loaded()

    fields, file_bytes, filename = await read_upload(request)
    language = fields.get("language", "auto")
    return_timestamps = parse_bool(fields.get("return_timestamps"))
    log.info("POST /v1/audio/transcriptions/stream | file={} size={} language={}",
             filename, len(file_bytes or b""), language)

    decoded, err = await _decode_or_error(
        file_bytes, filename, "POST /v1/audio/transcriptions/stream")
    if err:
        return err
    audio, sr = decoded
    lang_code = None if language == "auto" else language

    response = web.StreamResponse(
        status=200,
        headers={"Content-Type": "text/event-stream",
                 "Cache-Control": "no-cache",
                 "Connection": "keep-alive",
                 "X-Accel-Buffering": "no"})
    await response.prepare(request)
    async for event in sse_transcribe_generator(mgr, audio, sr, lang_code,
                                                return_timestamps):
        await response.write(event.encode("utf-8"))
    await response.write_eof()
    return response


# ── WebSocket session engine (reference src/server.py:1053-1375) ─────────────

async def _transcribe_with_context(mgr: ModelManager, audio_bytes: bytes,
                                   pad_silence: bool, lang_code,
                                   use_vad: bool,
                                   resume_tokens=None, session=None,
                                   tick_batch=None):
    """Bandpass + VAD gate + priority-0 inference over the window bytes.

    Returns (text, token_ids). resume_tokens from the previous tick enable
    self-draft resume decoding (runtime/resume.py) — the streaming fast
    path that makes the 450 ms cadence cheap. ``session`` (a
    runtime/stream.py StreamSession, ASR_WS_PREFIX_CACHE=true) replaces
    the per-tick re-encode with cached encoder blocks + persistent
    decoder KV for partial ticks; flushes keep the fused path (the padded
    silence changes the audio anyway and the window clears after).
    """
    audio_duration = len(audio_bytes) / 2 / TARGET_SR
    t0 = time.time()
    try:
        # Idempotent: a mid-connection idle unload (silent client past
        # IDLE_TIMEOUT) must reload transparently on the next tick, not
        # error every subsequent partial until an HTTP request reloads.
        await mgr.ensure_loaded()
        full_audio = bytearray(audio_bytes)
        if pad_silence:
            full_audio.extend(bytes(int((WS_FLUSH_SILENCE_MS / 1000)
                                        * TARGET_SR * 2)))
        if len(full_audio) == 0:
            return "", None

        # Host-side DSP on the native C++ path (no device round-trips in the
        # 450 ms WS cadence): s16→f32 + telephony bandpass FIR.
        from ..audio import native
        audio = native.pcm16_to_f32(bytes(full_audio))
        audio = native.fir_same(audio, _get_bandpass_kernel())

        if use_vad and not is_speech(audio):
            log.info("_transcribe_with_context | VAD: silence, skipping inference")
            return "", resume_tokens

        if session is not None and not pad_silence:
            if getattr(session, "group", None) is not None:
                # Grouped member (prefix cache + tick batching): coalesce
                # with the group's other ticking members into one pooled
                # dispatch (runtime/batcher.GroupTickBatcher).
                raw, token_ids = await asyncio.wait_for(
                    mgr.group_tick_batcher.tick(session, audio),
                    timeout=mgr.request_timeout)
            else:
                def tick():
                    out = session.update(audio)
                    session.engine.last_used = time.time()
                    return out
                raw, token_ids = await asyncio.wait_for(
                    mgr.queue.submit(tick, priority=0),
                    timeout=mgr.request_timeout)
            text = detect_and_fix_repetitions(raw)
            log.info("_transcribe_with_context | done elapsed={:.2f}s "
                     "text_len={} (prefix-cache)", time.time() - t0,
                     len(text))
            return text, token_ids

        # Cross-session tick batching (tick/grouped modes from
        # config.resolve_ws_mode; legacy ASR_WS_TICK_BATCH=true):
        # concurrent sessions' partial ticks coalesce into one batched
        # resume dispatch (runtime/batcher.TickBatcher) — one device call
        # per tick cadence per bucket instead of per session. Flushes keep
        # the solo path (padded silence changes the audio and the window
        # clears after). ``tick_batch`` carries the connection's resolved
        # mode; None (non-WS callers) falls back to the raw env flag.
        if tick_batch is None:
            tick_batch = os.getenv("ASR_WS_TICK_BATCH",
                                   "").lower() == "true"
        if not pad_silence and tick_batch:
            raw, token_ids = await asyncio.wait_for(
                mgr.tick_batcher.transcribe_tick(audio, lang_code,
                                                 resume_tokens,
                                                 use_fast=True),
                timeout=mgr.request_timeout)
            text = detect_and_fix_repetitions(raw)
            log.info("_transcribe_with_context | done elapsed={:.2f}s "
                     "text_len={} (tick-batch)", time.time() - t0, len(text))
            return text, token_ids

        # WS ticks default to the fused resume path even in pool mode:
        # measured on-chip (CHANGELOG r3), resume self-drafting holds
        # 16.1 aggregate partials/s over 8 paced sessions vs the pool's
        # 10.6 — re-decoding the window every tick costs more than the
        # pool's dispatch sharing saves. ASR_POOL_WS=true opts in.
        pool_ws = os.getenv("ASR_POOL_WS", "").lower() == "true"
        batch_flush = (
            pad_silence
            and os.getenv("ASR_WS_BATCH_FLUSH", "true").lower() == "true"
            and getattr(mgr, "ws_sessions", 0)
            >= int(os.getenv("ASR_WS_TICK_MIN_SESSIONS", "3") or 3))
        if batch_flush:
            # Concurrent finals — VAD auto-flush herds, client flushes,
            # end-of-stream drains — coalesce into one batched dispatch
            # through the HTTP micro-batcher at the EXPRESS lane: 16
            # serialized solo flushes measured as an 18.5–22.9 s tail at
            # stream end (paced run, 2026-08-21) because every flush is a
            # full window re-decode. Lone sessions keep the solo path
            # below (nothing to coalesce with, and its resume-verify
            # decode beats a full re-decode); greedy text is identical on
            # both paths by construction.
            results = await asyncio.wait_for(
                mgr.batcher.transcribe(audio, TARGET_SR, lang_code, False,
                                       priority=0),
                timeout=mgr.request_timeout)
        elif pool_ws and mgr.pool_eligible(audio, TARGET_SR, False):
            results = await mgr.transcribe_pooled(audio, TARGET_SR,
                                                  lang_code)
        else:
            results = await asyncio.wait_for(
                mgr.queue.submit(
                    lambda: mgr.transcribe_sync(audio, TARGET_SR, lang_code,
                                                False,
                                                use_fast=not pad_silence,
                                                resume_tokens=resume_tokens),
                    priority=0),
                timeout=mgr.request_timeout)
        if results:
            text = detect_and_fix_repetitions(results[0].text)
            log.info("_transcribe_with_context | done elapsed={:.2f}s "
                     "text_len={}", time.time() - t0, len(text))
            return text, results[0].token_ids
        return "", None
    except asyncio.TimeoutError:
        log.warning("_transcribe_with_context | timed out after {:.2f}s "
                    "audio={:.2f}s", time.time() - t0, audio_duration)
        return "[timeout]", None
    except Exception as e:
        log.error("_transcribe_with_context | error after {:.2f}s: {}",
                  time.time() - t0, e)
        return f"[error: {e}]", None


_bandpass_kernel = None


def _get_bandpass_kernel():
    global _bandpass_kernel
    if _bandpass_kernel is None:
        from ..audio.frontend import fir_bandpass_kernel
        _bandpass_kernel = fir_bandpass_kernel()  # 300-3400 Hz
    return _bandpass_kernel


def _trim_exact(window: bytearray) -> None:
    """Sample-exact trim to the window cap — the reference's semantics
    (src/server.py:1210-1214), kept for every FLUSH/final window even when
    partial-tick windows are chunk-quantized (prefix caching)."""
    if len(window) > WS_WINDOW_MAX_BYTES:
        trim = ((len(window) - WS_WINDOW_MAX_BYTES) // 2) * 2
        del window[:trim]


async def websocket_transcribe(request: web.Request) -> web.WebSocketResponse:
    mgr = get_manager(request)
    ws = web.WebSocketResponse(compress=False)  # per-message-deflate off
    await ws.prepare(request)

    ws_req_id = request.query.get("request_id") or str(uuid.uuid4())
    token = set_request_id(ws_req_id)
    log.info("[WS] Client connected")

    audio_buffer = bytearray()
    audio_window = bytearray()
    lang_code = "English"  # default; overridden by config action
    use_vad = ASR_USE_SERVER_VAD
    vad_param = request.query.get("use_server_vad")
    if vad_param is not None:
        use_vad = vad_param.lower() in ("true", "1", "yes")
    sr_raw = request.query.get("sample_rate", str(TARGET_SR))
    try:
        client_sr = int(sr_raw)
    except ValueError:
        client_sr = -1  # falls into the structured error below
    resampler = None
    if client_sr in (8000,) :
        from ..audio.resample import StreamingResampler
        resampler = StreamingResampler(client_sr, TARGET_SR)
    chunk_count = 0
    prev_had_speech = False
    silent_ticks = 0    # consecutive silent ticks (VAD flush debounce)
    prev_tokens = None  # last partial's token ids (resume decoding)

    # Streaming mode (config.resolve_ws_mode): picked per connection from
    # the window cap + concurrent-session count at admission, with
    # ASR_WS_STREAM_MODE / the legacy flags as explicit overrides.
    # prefix (WS prefix caching, runtime/stream.py): a per-connection
    # session carries encoder-block + decoder-KV state across partial
    # ticks. Partial-tick windows become encoder-chunk-quantized (cache
    # grid alignment); FLUSH/final windows keep the reference's
    # sample-exact last-window_max_s semantics via this parallel buffer.
    # Resolved after admission (needs the session count); placeholder
    # values cover the pre-admission error paths, which never transcribe.
    ws_mode = resolve_ws_mode(WS_WINDOW_MAX_S, 1)
    prefix_cache = ws_mode.prefix
    stream_session = None
    exact_window = bytearray()   # maintained only under prefix_cache

    def flush_bytes() -> bytes:
        """FLUSH/final windows always use the reference's sample-exact
        semantics: the parallel exact buffer in prefix-cache mode, the
        (already sample-exact) window otherwise."""
        return bytes(exact_window if prefix_cache else audio_window)

    def session_for_tick():
        """(Re)bind the session to the engine serving partials — engines
        can be idle-unloaded and reloaded mid-connection."""
        nonlocal stream_session
        if not prefix_cache:
            return None
        eng = mgr.fast_engine or mgr.engine
        if eng is None:
            return None
        if stream_session is None or stream_session.engine is not eng:
            try:
                # Grouped mode (prefix + tick): sessions join a pooled-
                # cache StreamGroup (runtime/stream_group.py): concurrent
                # members' ticks share one dispatch per cadence AND keep
                # per-session cached encoder blocks / persistent KV.
                if ws_mode.tick:
                    stream_session = eng.stream_group_member(
                        WS_WINDOW_MAX_S, lang_code)
                else:
                    stream_session = eng.stream_session(WS_WINDOW_MAX_S,
                                                        lang_code)
                mgr.register_stream_session(stream_session)
            except Exception as e:
                log.warning("[WS] prefix-cache session unavailable: {}", e)
                return None
        return stream_session

    def trim_quantum_bytes() -> int:
        """Prefix-cache mode trims in encoder-chunk quanta so cached
        blocks stay grid-aligned between trims (sample-exact trimming
        would rebuild every at-cap tick — correct, just cache-less).
        A cap smaller than one chunk can't hold a grid: stay sample-exact."""
        eng = mgr.fast_engine or mgr.engine
        if not prefix_cache or eng is None:
            return 2
        chunk_bytes = eng.model.cfg.encoder.n_window * 2 * 160 * 2
        return chunk_bytes if chunk_bytes <= WS_WINDOW_MAX_BYTES else 2

    admitted = False
    try:
        if client_sr not in (8000, 16000):
            await ws.send_json({
                "code": "UNSUPPORTED_SAMPLE_RATE",
                "message": f"sample_rate must be 8000 or 16000, got {sr_raw}",
                "statusCode": 400})
            await ws.close()
            return ws

        # Admission control (net-new vs the reference; capacity numbers in
        # docs/SCALING.md): past ASR_MAX_SESSIONS concurrent streaming
        # sessions each added session degrades EVERY session's partial
        # latency, so reject-with-retry beats silent backlog. 0 = off.
        max_sessions = int(os.getenv("ASR_MAX_SESSIONS", "0") or 0)
        if max_sessions > 0 and mgr.ws_sessions >= max_sessions:
            log.warning("[WS] session limit reached ({}), rejecting",
                        max_sessions)
            await ws.send_json({
                "code": "SESSION_LIMIT_REACHED",
                "message": (f"server at capacity ({max_sessions} concurrent "
                            "streaming sessions); retry later or add "
                            "workers"),
                "statusCode": 503})
            await ws.close(code=aiohttp.WSCloseCode.TRY_AGAIN_LATER)
            return ws
        # Counted on the manager, not the aiohttp app: app-state writes
        # after startup are deprecated, and the manager is what the tick
        # batcher and mode policy read anyway.
        mgr.ws_sessions += 1
        admitted = True

        # Resolve the streaming mode for THIS connection now that the
        # concurrent-session count is known. Fixed for the connection's
        # lifetime (prefix/grouped cache state binds to it); a fleet
        # ramping past ASR_WS_TICK_MIN_SESSIONS converges to batched
        # modes connection by connection.
        ws_mode = resolve_ws_mode(WS_WINDOW_MAX_S, mgr.ws_sessions)
        prefix_cache = ws_mode.prefix
        log.info("[WS] streaming mode: {} (cap={}s, sessions={})",
                 ws_mode.name, WS_WINDOW_MAX_S, mgr.ws_sessions)

        await mgr.ensure_loaded()
        await ws.send_json({
            "status": "connected",
            "sample_rate": client_sr,
            "format": "pcm_s16le",
            "buffer_size": WS_BUFFER_SIZE,
            "window_max_s": WS_WINDOW_MAX_S,
            "use_server_vad": use_vad,
        })

        async for msg in ws:
            if msg.type == WSMsgType.TEXT:
                try:
                    cmd = json.loads(msg.data)
                except json.JSONDecodeError:
                    log.warning("[WS] invalid JSON command: {!r}",
                                msg.data[:80])
                    await ws.send_json({"code": "INVALID_JSON",
                                        "message": "Invalid JSON command",
                                        "statusCode": 400})
                    continue
                action = cmd.get("action", "")

                if action == "flush":
                    if audio_buffer:
                        audio_window.extend(audio_buffer)
                        if prefix_cache:
                            exact_window.extend(audio_buffer)
                        audio_buffer.clear()
                    payload = flush_bytes()
                    if payload:
                        text, _ = await _transcribe_with_context(
                            mgr, payload, True, lang_code,
                            use_vad, resume_tokens=prev_tokens)
                        chunk_count += 1
                        await ws.send_json({"text": text, "is_partial": False,
                                            "is_final": True})
                    else:
                        await ws.send_json({"text": "", "is_partial": False,
                                            "is_final": True})
                    audio_window.clear()
                    exact_window.clear()
                    prev_tokens = None
                    if stream_session is not None:
                        stream_session.reset()

                elif action == "reset":
                    audio_buffer.clear()
                    audio_window.clear()
                    exact_window.clear()
                    prev_tokens = None
                    if stream_session is not None:
                        stream_session.reset()
                    await ws.send_json({"status": "buffer_reset"})

                elif action == "config":
                    new_lang = cmd.get("language")
                    if new_lang == "auto":
                        lang_code = None
                    elif new_lang:
                        lang_code = new_lang
                    if new_lang:
                        # Prompt changed: release the old session's device
                        # caches NOW (dropping the reference alone would
                        # leave them to the GC's whim) and bind a new one.
                        if stream_session is not None:
                            stream_session.release()
                        stream_session = None
                    if "use_server_vad" in cmd:
                        use_vad = bool(cmd["use_server_vad"])
                    await ws.send_json({"status": "configured",
                                        "language": lang_code or "auto",
                                        "use_server_vad": use_vad})

                else:
                    log.warning("[WS] unknown action: {!r}", action)
                    await ws.send_json({"code": "UNKNOWN_ACTION",
                                        "message": f"Unknown action: {action!r}",
                                        "statusCode": 400})

            elif msg.type == WSMsgType.BINARY:
                incoming = msg.data
                if resampler is not None:
                    # stateful resampler: no FIR seams at frame boundaries
                    incoming = resampler.process_pcm(incoming)
                audio_buffer.extend(incoming)

                if len(audio_buffer) >= WS_BUFFER_SIZE:
                    audio_window.extend(audio_buffer)
                    if prefix_cache:
                        exact_window.extend(audio_buffer)
                        _trim_exact(exact_window)
                    audio_buffer.clear()
                    if len(audio_window) > WS_WINDOW_MAX_BYTES:
                        trim = len(audio_window) - WS_WINDOW_MAX_BYTES
                        q = trim_quantum_bytes()
                        trim = -(-trim // q) * q if q > 2 else (trim // 2) * 2
                        if trim >= len(audio_window):
                            # never empty the window: fall back to the
                            # reference's sample-exact trim
                            trim = ((len(audio_window)
                                     - WS_WINDOW_MAX_BYTES) // 2) * 2
                        audio_window = audio_window[trim:]

                    vad_flushed = False
                    if use_vad:
                        tail = (bytes(audio_window[-WS_BUFFER_SIZE:])
                                if len(audio_window) >= WS_BUFFER_SIZE
                                else bytes(audio_window))
                        tail_f = (np.frombuffer(tail, dtype=np.int16)
                                  .astype(np.float32) / 32768.0)
                        has_speech = is_speech(tail_f)
                        if has_speech:
                            prev_had_speech = True
                            silent_ticks = 0
                        else:
                            silent_ticks += 1
                        if (not has_speech and prev_had_speech
                                and silent_ticks >= ASR_VAD_FLUSH_TICKS):
                            # Debounced speech→silence edge: flush a final.
                            prev_had_speech = False
                            silent_ticks = 0
                            vad_flushed = True
                            text, _ = await _transcribe_with_context(
                                mgr, flush_bytes(), True, lang_code,
                                use_vad, resume_tokens=prev_tokens)
                            chunk_count += 1
                            if text:
                                await ws.send_json({"text": text,
                                                    "is_partial": False,
                                                    "is_final": True})
                            audio_window.clear()
                            exact_window.clear()
                            prev_tokens = None
                            if stream_session is not None:
                                stream_session.reset()

                    if not vad_flushed:
                        text, prev_tokens = await _transcribe_with_context(
                            mgr, bytes(audio_window), False, lang_code,
                            use_vad, resume_tokens=prev_tokens,
                            session=session_for_tick(),
                            tick_batch=ws_mode.tick)
                        chunk_count += 1
                        if text:
                            await ws.send_json({"text": text,
                                                "is_partial": True,
                                                "is_final": False})

            elif msg.type in (WSMsgType.CLOSE, WSMsgType.CLOSING,
                              WSMsgType.ERROR):
                break

        # Disconnect: transcribe remaining audio (reference 1261-1279).
        if audio_buffer:
            audio_window.extend(audio_buffer)
            if prefix_cache:
                exact_window.extend(audio_buffer)
        payload = flush_bytes()
        if payload:
            try:
                text, _ = await _transcribe_with_context(
                    mgr, payload, True, lang_code, use_vad,
                    resume_tokens=prev_tokens)
                chunk_count += 1
                if text:
                    log.info("[WS] Final transcription on disconnect: {}", text)
            except Exception:
                pass
        log.info("[WS] Client disconnected | chunks_processed={}", chunk_count)

    except Exception as e:
        log.error("WebSocket error: {}", e)
        try:
            await ws.send_json({"code": "WEBSOCKET_ERROR", "message": str(e),
                                "statusCode": 500})
        except Exception:
            pass
    finally:
        if admitted:
            mgr.ws_sessions -= 1
        if stream_session is not None:
            # Free the session's device KV/encoder caches with the
            # connection — they must not outlive it in HBM.
            try:
                stream_session.release()
            except Exception:
                pass
        reset_request_id(token)
        try:
            await ws.close()
        except Exception:
            pass
    return ws


# ── profiling (additive observability; SURVEY.md §5 tracing) ─────────────────

_trace_active = False  # plain bool, flipped with no await in between:
                       # atomic on the single event loop, so two requests
                       # can never both claim the process-global profiler


async def debug_trace(request: web.Request) -> web.Response:
    """Capture a jax.profiler trace for N seconds (TensorBoard/Perfetto
    format). Additive to the request-ID tracing — the reference has no
    profiler integration. Single-flight: the jax profiler is process-global
    state, so a concurrent second request must not stop the first one's
    trace (or surface a raw 500 from start_trace)."""
    global _trace_active
    try:
        seconds = min(float(request.query.get("seconds", "3")), 60.0)
    except ValueError:
        return error_response("INVALID_JSON", "seconds must be a number", 400)
    if _trace_active:
        return error_response("WORKER_ERROR",
                              "a profiler trace is already in progress", 409)
    _trace_active = True
    try:
        trace_dir = os.getenv("ASR_TRACE_DIR", "/tmp/qwen3_asr_traces")
        os.makedirs(trace_dir, exist_ok=True)
        import jax
        try:
            jax.profiler.start_trace(trace_dir)
        except Exception as e:
            return error_response("WORKER_ERROR", f"trace failed: {e}", 500)
        try:
            await asyncio.sleep(seconds)
        finally:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                return error_response("WORKER_ERROR", f"trace failed: {e}",
                                      500)
    finally:
        _trace_active = False
    log.info("Profiler trace captured | dir={} seconds={}", trace_dir, seconds)
    return web.json_response({"trace_dir": trace_dir, "seconds": seconds})


# ── app assembly ──────────────────────────────────────────────────────────────

def build_app(manager: ModelManager | None = None) -> web.Application:
    app = web.Application(middlewares=[request_id_middleware],
                          client_max_size=512 * 1024 ** 2)
    app["manager"] = manager or ModelManager()

    app.router.add_get("/health", health)
    app.router.add_post("/v1/audio/transcriptions", transcribe)
    app.router.add_post("/v1/audio/translations", translate_endpoint)
    app.router.add_post("/v1/audio/subtitles", generate_subtitles)
    app.router.add_post("/v1/audio/transcriptions/stream", transcribe_stream)
    app.router.add_get("/ws/transcribe", websocket_transcribe)
    app.router.add_post("/debug/trace", debug_trace)
    app.router.add_get("/metrics", metrics_endpoint)

    openapi = build_openapi(API_TITLE, API_VERSION, API_DESCRIPTION,
                            API_TAGS, route_metadata())
    add_docs_routes(app, openapi, API_TITLE)

    async def on_startup(app):
        validate_env()
        app["manager"].start()

    async def on_cleanup(app):
        app["manager"].stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main():
    import argparse
    parser = argparse.ArgumentParser(description="Qwen3-ASR TPU server")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int,
                        default=int(os.getenv("PORT", "8000")))
    args = parser.parse_args()
    from ..utils.logging import intercept_stdlib_logging
    from ..utils.platform import honor_platform_env
    intercept_stdlib_logging()
    honor_platform_env()
    web.run_app(build_app(), host=args.host, port=args.port,
                access_log=None)


if __name__ == "__main__":
    main()
