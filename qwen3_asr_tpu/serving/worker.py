"""Worker process: inference-only internal API (killed/restarted by gateway).

Parity with reference src/worker.py: same internal routes on :8001
(/transcribe, /subtitles, /translate, /transcribe/stream, /ws/transcribe,
/health), EAGER model load at startup (unlike the lazy standalone server),
requestId read from the X-Request-ID header for log correlation, and the
reference's behavioral deltas preserved: EMPTY_AUDIO/INVALID_MODE are 400
here (422 on the public server) and /translate?response_format=srt uses
ACCURATE subtitle mode (the public server uses fast — reference
worker.py:229 vs server.py:697).

Run: ``python -m qwen3_asr_tpu.serving.worker --port 8001``
"""
from __future__ import annotations

import asyncio
import os
import time

from aiohttp import web

from ..runtime.lifecycle import ModelManager
from ..runtime.queue import infer_executor
from ..text.repetition import detect_and_fix_repetitions
from ..utils.logging import log
from .http import error_response, read_upload, request_id_middleware
from .server import (
    _decode_or_error,
    merge_results,
    subtitle_core,
    transcribe as server_transcribe,
    transcribe_stream as server_transcribe_stream,
    websocket_transcribe as server_websocket_transcribe,
)


def get_manager(request: web.Request) -> ModelManager:
    return request.app["manager"]


async def health(request: web.Request) -> web.Response:
    mgr = get_manager(request)
    info = mgr.health_info()
    info["mode"] = "worker"
    return web.json_response(info)


async def subtitles(request: web.Request) -> web.Response:
    """Worker delta: INVALID_MODE/EMPTY_AUDIO are 400 (reference worker.py)."""
    mgr = get_manager(request)
    fields, file_bytes, filename = await read_upload(request)
    mode = fields.get("mode", "accurate")
    if mode not in ("accurate", "fast"):
        return error_response(
            "INVALID_MODE",
            f"Invalid mode: {mode!r}. Must be 'accurate' or 'fast'.", 400,
            mode=mode)
    if not file_bytes:
        return error_response("EMPTY_AUDIO", "Empty audio file", 400)

    await mgr.ensure_loaded()
    language = fields.get("language", "auto")
    try:
        max_line_chars = int(fields.get("max_line_chars", "42"))
    except ValueError:
        max_line_chars = 42
    log.info("POST /subtitles | size={} language={} mode={}",
             len(file_bytes), language, mode)
    t0 = time.time()

    decoded, err = await _decode_or_error(file_bytes, filename,
                                          "POST /subtitles")
    if err:
        return err
    audio, sr = decoded
    lang_code = None if language == "auto" else language
    # Shared core; worker delta: aligner failure is always WORKER_ERROR.
    return await subtitle_core(
        mgr, audio, sr, lang_code, mode, max_line_chars, "POST /subtitles",
        t0, lambda e: error_response("WORKER_ERROR",
                                     f"ForcedAligner unavailable: {e}", 503))


async def translate(request: web.Request) -> web.Response:
    """Worker delta: EMPTY_AUDIO 400; srt path uses ACCURATE subtitles."""
    from ..sidecars.translator import translate_srt, translate_text
    mgr = get_manager(request)
    await mgr.ensure_loaded()

    fields, file_bytes, filename = await read_upload(request)
    if not file_bytes:
        return error_response("EMPTY_AUDIO", "Empty audio file", 400)
    language = fields.get("language", "en")
    response_format = fields.get("response_format", "json")
    log.info("POST /translate | size={} target={} format={}",
             len(file_bytes), language, response_format)
    t0 = time.time()

    decoded, err = await _decode_or_error(file_bytes, filename,
                                          "POST /translate")
    if err:
        return err
    audio, sr = decoded
    target_lang = "en" if language.lower() not in ("en", "zh") else language.lower()

    from ..sidecars import subtitle as subtitle_mod
    if response_format.lower() == "srt":
        try:
            await asyncio.get_event_loop().run_in_executor(
                infer_executor(), subtitle_mod.load_aligner)
        except Exception as e:
            return error_response("WORKER_ERROR",
                                  f"ForcedAligner unavailable: {e}", 503)
    try:
        results = await asyncio.wait_for(
            mgr.queue.submit(
                lambda: mgr.transcribe_sync(audio, sr, None, False),
                priority=1),
            timeout=mgr.request_timeout)
    except asyncio.TimeoutError:
        return error_response("TRANSCRIPTION_TIMEOUT",
                              "Transcription timed out", 504,
                              elapsed=round(time.time() - t0, 2))

    if response_format.lower() == "srt":
        if not results:
            return web.Response(text="", content_type="text/plain",
                                charset="utf-8")
        for r in results:
            r.text = detect_and_fix_repetitions(r.text)
        original_srt = await asyncio.get_event_loop().run_in_executor(
            infer_executor(),
            lambda: subtitle_mod.generate_srt_from_results(
                results, audio, sr, mode="accurate", max_line_chars=42))
        try:
            translated_srt = await translate_srt(original_srt, target_lang)
        except Exception as e:
            log.error("POST /translate | translation API failed: {}", e)
            return error_response("TRANSLATION_FAILED",
                                  f"Translation API failed: {e}", 502)
        return web.Response(text=translated_srt, content_type="text/plain",
                            charset="utf-8")

    text = detect_and_fix_repetitions(merge_results(results)[0]) if results else ""
    if text.strip():
        try:
            translated_text = await translate_text(text, target_lang)
        except Exception as e:
            log.error("POST /translate | translation API failed: {}", e)
            return error_response("TRANSLATION_FAILED",
                                  f"Translation API failed: {e}", 502)
    else:
        translated_text = ""
    log.info("POST /translate | completed in {:.2f}s format={}",
             time.time() - t0, response_format)
    return web.json_response({"text": translated_text,
                              "language": target_lang})


def build_app(manager: ModelManager | None = None) -> web.Application:
    app = web.Application(middlewares=[request_id_middleware],
                          client_max_size=512 * 1024 ** 2)
    app["manager"] = manager or ModelManager()

    app.router.add_get("/health", health)
    app.router.add_post("/transcribe", server_transcribe)
    app.router.add_post("/subtitles", subtitles)
    app.router.add_post("/translate", translate)
    app.router.add_post("/transcribe/stream", server_transcribe_stream)
    app.router.add_get("/ws/transcribe", server_websocket_transcribe)

    async def on_startup(app):
        log.info("Worker starting up...")
        app["manager"].start()
        await app["manager"].ensure_loaded()  # eager load (worker.py:49-55)
        log.info("Worker ready")

    async def on_cleanup(app):
        app["manager"].stop()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main():
    import argparse
    parser = argparse.ArgumentParser(description="Qwen3-ASR TPU worker")
    parser.add_argument("--host", default=os.getenv("WORKER_HOST", "127.0.0.1"))
    parser.add_argument("--port", type=int,
                        default=int(os.getenv("WORKER_PORT", "8001")))
    args = parser.parse_args()
    from ..utils.logging import intercept_stdlib_logging
    from ..utils.platform import honor_platform_env
    intercept_stdlib_logging()
    honor_platform_env()
    web.run_app(build_app(), host=args.host, port=args.port, access_log=None)


if __name__ == "__main__":
    main()
