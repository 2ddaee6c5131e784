"""Gateway process: public routing + worker lifecycle supervision.

Parity with reference src/gateway.py: spawns the worker as a subprocess,
polls its /health for up to 30 s, kills it after IDLE_TIMEOUT to reclaim
RAM (respawn on next request), pre-spawns when IDLE_TIMEOUT=0, forwards
X-Request-ID headers / request_id query params, relays SSE line-by-line,
pumps WebSocket traffic bidirectionally, and merges worker health into its
own. The VRAM pre-check (nvidia-smi, gateway.py:34-44) maps to an HBM
check sourced from the last worker health snapshot — the gateway must NOT
touch the TPU itself (chips are single-process).

Scale-out past the reference (which is single-GPU, single-worker by
design): a ``WorkerFleet`` routes across N workers —

* ``WORKER_PORTS=8001,8002,...`` — managed local workers, one subprocess
  each (pair with ``WORKER_DEVICES=0,1,...`` to pin one TPU chip per
  worker via TPU_VISIBLE_DEVICES);
* ``WORKER_HOSTS=host1:8001,host2:8001`` — external workers on other
  hosts (multi-host serving): health-checked and routed to, never
  spawned or killed. See docs/MULTIHOST.md.

Routing is least-outstanding-requests; WS sessions are sticky to the
worker chosen at connect. A dormant managed worker is pre-warmed in the
background when every live worker is busy, and each managed worker keeps
its own idle-kill clock. Unset, the fleet is one local managed worker —
reference behavior exactly.

Run: ``python -m qwen3_asr_tpu.serving.gateway [--port 8000]``
"""
from __future__ import annotations

import asyncio
import json
import os
import subprocess
import sys
import time
import uuid

import aiohttp
from aiohttp import WSMsgType, web

from ..config import validate_env
from ..utils.logging import get_request_id, log, reset_request_id, set_request_id
from .http import (
    add_docs_routes,
    build_openapi,
    error_response,
    request_id_middleware,
)
from .schemas import API_DESCRIPTION, API_TAGS
from .meta import API_TITLE, API_VERSION, route_metadata

WORKER_HOST = os.getenv("WORKER_HOST", "127.0.0.1")
WORKER_PORT = int(os.getenv("WORKER_PORT", "8001"))
IDLE_TIMEOUT = int(os.getenv("IDLE_TIMEOUT", "120"))
REQUEST_TIMEOUT = int(os.getenv("REQUEST_TIMEOUT", "300"))
MIN_FREE_HBM_MB = int(os.getenv("MIN_FREE_HBM_MB", "3500"))


class WorkerStartupError(RuntimeError):
    """Worker could not be spawned or never became ready."""


class WorkerSupervisor:
    """Owns one worker: spawn (managed), readiness poll, idle kill.

    ``managed=False`` marks an external worker (another host): it is
    health-checked and routed to but never spawned or killed from here."""

    def __init__(self, host: str | None = None, port: int | None = None, *,
                 managed: bool = True, spawn_env: dict | None = None,
                 index: int = 0):
        self.host = host or WORKER_HOST
        self.port = port or WORKER_PORT
        self.managed = managed
        self.spawn_env = dict(spawn_env or {})
        self.index = index
        self.proc: subprocess.Popen | None = None
        self.last_used = time.time()
        self.inflight = 0   # proxied requests currently awaiting the worker
        self.ws_sessions = 0  # live WS pumps (routing load, NOT idle activity
                              # — reference idle-kill semantics ignore open
                              # connections, only frames count)
        self.served = 0     # total requests routed here (observability)
        self._lock = asyncio.Lock()
        self._last_health: dict = {}
        self._ready = False  # /health answered since the last (re)spawn

    def url(self, path: str) -> str:
        return f"http://{self.host}:{self.port}{path}"

    def alive(self) -> bool:
        if not self.managed:
            return self._ready
        return self.proc is not None and self.proc.poll() is None

    def _check_hbm_available(self) -> tuple[bool, int]:
        """HBM headroom pre-check from the last worker health snapshot.
        (The gateway never initializes the TPU backend itself — chips are
        exclusive to the worker process.)"""
        used = self._last_health.get("hbm_used_mb")
        limit = self._last_health.get("hbm_limit_mb")
        if used is None or limit is None or not limit:
            return True, -1  # can't check — optimistically proceed
        free = limit - used
        return free >= MIN_FREE_HBM_MB, free

    async def ensure(self):
        async with self._lock:
            if not self.managed:
                # External worker: verify reachability, never spawn.
                try:
                    async with aiohttp.ClientSession() as session:
                        async with session.get(
                                self.url("/health"),
                                timeout=aiohttp.ClientTimeout(total=3)
                        ) as resp:
                            if resp.status == 200:
                                self._last_health = await resp.json()
                                self._ready = True
                                self.last_used = time.time()
                                return
                except Exception:
                    pass
                self._ready = False
                raise WorkerStartupError(
                    f"external worker {self.host}:{self.port} unreachable")
            if not self.alive():
                if self.proc is not None:
                    # Died on its own (crash/OOM): _terminate never ran, so
                    # the health snapshot describes memory that was freed
                    # with the process — it must not veto this respawn.
                    self.proc = None
                    self._last_health = {}
                self._ready = False
                ok, free_mb = self._check_hbm_available()
                if not ok:
                    log.error("Not enough HBM to start worker: {}MB free, "
                              "need ~{}MB", free_mb, MIN_FREE_HBM_MB)
                    raise WorkerStartupError(
                        f"Insufficient HBM: {free_mb}MB free")
                log.info("Starting worker process {} on :{}... "
                         "(HBM free: {}MB)", self.index, self.port, free_mb)
                env = {**os.environ, **self.spawn_env}
                self.proc = subprocess.Popen([
                    sys.executable, "-m", "qwen3_asr_tpu.serving.worker",
                    "--host", self.host, "--port", str(self.port),
                ], env=env)
            if not self._ready:
                deadline = time.time() + int(
                    os.getenv("WORKER_STARTUP_TIMEOUT", "120"))
                async with aiohttp.ClientSession() as session:
                    while time.time() < deadline:
                        await asyncio.sleep(1)
                        if self.proc is not None and not self.alive():
                            # Crashed at startup (import error, bad device,
                            # bound port): fail fast instead of polling a
                            # dead port for the full startup timeout.
                            break
                        try:
                            async with session.get(
                                    self.url("/health"),
                                    timeout=aiohttp.ClientTimeout(total=3)
                            ) as resp:
                                if resp.status == 200:
                                    self._last_health = await resp.json()
                                    log.info("Worker process ready")
                                    self._ready = True
                                    break
                        except Exception:
                            continue
                if not self._ready:
                    if self.alive():
                        # Still starting — an eager load with cold compile
                        # caches can take minutes. Leave it running: this
                        # request fails with the structured error, the NEXT
                        # request resumes waiting on the same process
                        # instead of killing it mid-compile and thrashing.
                        log.error("Worker not ready within "
                                  "WORKER_STARTUP_TIMEOUT; still starting")
                        raise WorkerStartupError(
                            "worker still starting (model load/compile in "
                            "progress) — retry shortly")
                    log.error("Worker process exited before becoming ready")
                    await self._terminate()
                    raise WorkerStartupError("worker failed to become ready")
            self.last_used = time.time()

    async def _terminate(self):
        """Stop the worker without blocking the event loop on wait()."""
        proc = self.proc
        self.proc = None
        # The health snapshot described THAT worker's HBM usage; once it is
        # gone the numbers are stale and must not veto the next spawn.
        self._last_health = {}
        if proc is None:
            return
        proc.terminate()
        try:
            await asyncio.to_thread(proc.wait, 10)
        except subprocess.TimeoutExpired:
            proc.kill()
            try:
                await asyncio.to_thread(proc.wait, 5)  # reap — no zombies
            except subprocess.TimeoutExpired:
                log.warning("worker PID {} unreaped after SIGKILL", proc.pid)

    async def kill(self, only_if_idle: bool = False):
        if not self.managed:
            return
        async with self._lock:
            if only_if_idle and (
                    self.inflight > 0
                    or time.time() - self.last_used <= IDLE_TIMEOUT):
                # The idle decision was made before we got the lock; an
                # ensure() that held it through a slow startup just marked
                # the worker used — killing now would yank it out from
                # under the request that waited for it.
                return
            if self.alive():
                log.info("Killing worker process {} (idle timeout)...",
                         self.index)
                await self._terminate()
                log.info("Worker process killed -- RAM reclaimed")

    async def idle_watchdog(self):
        while True:
            await asyncio.sleep(30)
            if IDLE_TIMEOUT <= 0:
                continue
            # In-flight proxied requests count as activity: a long first
            # request (model load + compile) must not be killed mid-flight.
            if self.inflight > 0:
                self.last_used = time.time()
                continue
            if self.alive() and time.time() - self.last_used > IDLE_TIMEOUT:
                await self.kill(only_if_idle=True)


class WorkerFleet:
    """N supervisors + routing. One managed local worker by default (the
    reference shape); WORKER_PORTS / WORKER_HOSTS scale it out."""

    def __init__(self, supervisors: list[WorkerSupervisor]):
        if not supervisors:
            raise ValueError("fleet needs at least one supervisor")
        self.supervisors = list(supervisors)
        self._rr = 0           # round-robin tie-break cursor
        self._prewarming = set()

    @classmethod
    def from_env(cls) -> "WorkerFleet":
        devices = [d.strip()
                   for d in os.getenv("WORKER_DEVICES", "").split(",")
                   if d.strip()]

        def dev_env(i: int) -> dict:
            # One chip (or chip subset) per managed worker: libtpu honors
            # TPU_VISIBLE_DEVICES per process; chips stay single-process.
            return ({"TPU_VISIBLE_DEVICES": devices[i]}
                    if i < len(devices) else {})

        sups: list[WorkerSupervisor] = []
        ports = [p.strip() for p in os.getenv("WORKER_PORTS", "").split(",")
                 if p.strip()]
        for p in ports:
            sups.append(WorkerSupervisor(
                WORKER_HOST, int(p), spawn_env=dev_env(len(sups)),
                index=len(sups)))
        for spec in os.getenv("WORKER_HOSTS", "").split(","):
            spec = spec.strip()
            if not spec:
                continue
            host, _, port = spec.partition(":")
            sups.append(WorkerSupervisor(host, int(port or "8001"),
                                         managed=False, index=len(sups)))
        if not sups:
            sups.append(WorkerSupervisor(spawn_env=dev_env(0)))
        return cls(sups)

    def choose(self) -> WorkerSupervisor:
        """Least-outstanding-requests over live workers, round-robin on
        ties (concurrent arrivals land before each other's in-flight
        counts move, so the tie-break is what actually spreads a burst);
        scale up by pre-warming a not-yet-ready managed worker in the
        background when every live one is busy. Callers still
        ``await sup.ensure()`` — routing never blocks on another worker's
        startup."""
        live = [s for s in self.supervisors if s.alive() and s._ready]
        if not live:
            managed = [s for s in self.supervisors if s.managed]
            return managed[0] if managed else self.supervisors[0]
        self._rr += 1
        n = len(self.supervisors)
        best = min(live, key=lambda s: (s.inflight + s.ws_sessions,
                                        (s.index - self._rr) % n))
        if best.inflight + best.ws_sessions > 0:
            dormant = next(
                (s for s in self.supervisors
                 if s.managed and not (s.alive() and s._ready)
                 and s.index not in self._prewarming), None)
            if dormant is not None:
                self._prewarming.add(dormant.index)
                asyncio.create_task(self._prewarm(dormant))
        return best

    async def _prewarm(self, sup: WorkerSupervisor):
        """ensure() resumes waiting on a still-starting process, so
        repeated pre-warm attempts converge instead of thrashing."""
        try:
            await sup.ensure()
            log.info("Pre-warmed worker {} under load", sup.index)
        except Exception as e:
            log.warning("Worker {} pre-warm failed: {}", sup.index, e)
        finally:
            self._prewarming.discard(sup.index)

    async def ensure_all_managed(self):
        results = await asyncio.gather(
            *[s.ensure() for s in self.supervisors if s.managed],
            return_exceptions=True)
        for r in results:
            if isinstance(r, Exception):
                raise r

    async def kill_all(self):
        await asyncio.gather(*[s.kill() for s in self.supervisors],
                             return_exceptions=True)

    async def idle_watchdog(self):
        await asyncio.gather(*[s.idle_watchdog()
                               for s in self.supervisors])


def _trace_headers() -> dict:
    req_id = get_request_id()
    return {"X-Request-ID": req_id} if req_id else {}


async def _proxy_error(resp: aiohttp.ClientResponse, url: str) -> web.Response:
    body = await resp.text()
    log.error("Gateway proxy error | url={} status={}", url, resp.status)
    try:
        worker_error = json.loads(body)
        if isinstance(worker_error, dict) and "code" in worker_error:
            return web.json_response(worker_error, status=resp.status)
    except json.JSONDecodeError:
        pass
    return error_response("WORKER_ERROR", body, resp.status)


async def _forward_multipart(request: web.Request, sup: WorkerSupervisor,
                             worker_path: str, field_defaults: dict):
    """Read the public multipart request, re-issue it to the worker."""
    from .http import read_upload
    await sup.ensure()
    fields, file_bytes, filename = await read_upload(request)
    form = aiohttp.FormData()
    form.add_field("file", file_bytes or b"", filename=filename or "audio.wav",
                   content_type="audio/wav")
    for key, default in field_defaults.items():
        form.add_field(key, str(fields.get(key, default)))
    url = sup.url(worker_path)
    session = aiohttp.ClientSession()
    sup.inflight += 1
    sup.served += 1
    try:
        resp = await session.post(
            url, data=form, headers=_trace_headers(),
            timeout=aiohttp.ClientTimeout(total=REQUEST_TIMEOUT))
    except BaseException:
        sup.inflight -= 1
        await session.close()
        raise
    # inflight stays held until the HANDLER finishes with the response —
    # for /transcribe/stream the worker sends headers before any inference
    # runs, so releasing here would let the idle watchdog kill the worker
    # mid-stream during a long compile gap. Handlers decrement in finally.
    sup.last_used = time.time()
    return session, resp, url, fields


async def gw_transcribe(request: web.Request) -> web.Response:
    sup: WorkerSupervisor = request.app["fleet"].choose()
    t0 = time.time()
    session, resp, url, _ = await _forward_multipart(
        request, sup, "/transcribe",
        {"language": "auto", "return_timestamps": "false"})
    try:
        if resp.status != 200:
            return await _proxy_error(resp, url)
        body = await resp.json()
        log.info("Gateway POST /v1/audio/transcriptions | proxied in {:.2f}s",
                 time.time() - t0)
        return web.json_response(body)
    finally:
        sup.inflight -= 1
        sup.last_used = time.time()
        await session.close()


async def gw_translate(request: web.Request) -> web.Response:
    sup: WorkerSupervisor = request.app["fleet"].choose()
    t0 = time.time()
    session, resp, url, fields = await _forward_multipart(
        request, sup, "/translate",
        {"language": "en", "response_format": "json"})
    try:
        if resp.status != 200:
            return await _proxy_error(resp, url)
        log.info("Gateway POST /v1/audio/translations | proxied in {:.2f}s",
                 time.time() - t0)
        if fields.get("response_format", "json").lower() == "srt":
            srt = await resp.text()
            return web.Response(
                text=srt, content_type="text/plain", charset="utf-8",
                headers={"Content-Disposition":
                         'attachment; filename="translated_subtitles.srt"'})
        return web.json_response(await resp.json())
    finally:
        sup.inflight -= 1
        sup.last_used = time.time()
        await session.close()


async def gw_subtitles(request: web.Request) -> web.Response:
    sup: WorkerSupervisor = request.app["fleet"].choose()
    t0 = time.time()
    session, resp, url, _ = await _forward_multipart(
        request, sup, "/subtitles",
        {"language": "auto", "mode": "accurate", "max_line_chars": "42"})
    try:
        if resp.status != 200:
            return await _proxy_error(resp, url)
        srt = await resp.text()
        log.info("Gateway POST /v1/audio/subtitles | proxied in {:.2f}s",
                 time.time() - t0)
        return web.Response(
            text=srt, content_type="text/plain", charset="utf-8",
            headers={"Content-Disposition":
                     'attachment; filename="subtitles.srt"'})
    finally:
        sup.inflight -= 1
        sup.last_used = time.time()
        await session.close()


async def gw_transcribe_stream(request: web.Request) -> web.StreamResponse:
    sup: WorkerSupervisor = request.app["fleet"].choose()
    t0 = time.time()
    session, resp, url, _ = await _forward_multipart(
        request, sup, "/transcribe/stream",
        {"language": "auto", "return_timestamps": "false"})
    try:
        if resp.status != 200:
            return await _proxy_error(resp, url)
        response = web.StreamResponse(
            status=200,
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache",
                     "Connection": "keep-alive",
                     "X-Accel-Buffering": "no"})
        await response.prepare(request)
        chunk_count = 0
        try:
            async for line in resp.content:
                sup.last_used = time.time()
                chunk_count += 1
                await response.write(line)
            log.info("Gateway POST /v1/audio/transcriptions/stream | done "
                     "chunks={} elapsed={:.2f}s", chunk_count,
                     time.time() - t0)
        except Exception as e:
            log.error("Gateway POST /v1/audio/transcriptions/stream | error "
                      "after {:.2f}s: {}", time.time() - t0, e)
            # Clients must be able to tell a truncated stream from a
            # complete one (the worker emits SSE_STREAM_ERROR for its own
            # failures; do the same for relay failures).
            try:
                await response.write(
                    ("data: " + json.dumps({
                        "code": "SSE_STREAM_ERROR",
                        "message": f"worker stream interrupted: {e}",
                        "statusCode": 502}) + "\n\n").encode())
            except Exception:
                pass
        await response.write_eof()
        return response
    finally:
        sup.inflight -= 1
        sup.last_used = time.time()
        await session.close()


async def gw_websocket(request: web.Request) -> web.WebSocketResponse:
    """Bidirectional WS pump client ↔ worker (reference gateway.py:340-419).
    The session is sticky to the worker chosen here."""
    sup: WorkerSupervisor = request.app["fleet"].choose()
    ws = web.WebSocketResponse(compress=False)
    await ws.prepare(request)

    ws_req_id = str(uuid.uuid4())
    token = set_request_id(ws_req_id)
    log.info("[GW-WS] Client connected, proxying to worker {}", sup.index)
    sup.ws_sessions += 1

    try:
        try:
            await sup.ensure()
        except Exception as e:
            await ws.send_json({"code": "WORKER_STARTUP_FAILED",
                                "message": f"Worker startup failed: {e}",
                                "statusCode": 503})
            await ws.close()
            return ws

        qs_parts = [f"request_id={ws_req_id}"]
        for param in ("use_server_vad", "sample_rate"):
            val = request.query.get(param)
            if val is not None:
                qs_parts.append(f"{param}={val}")
        ws_url = (sup.url("/ws/transcribe?").replace("http://", "ws://", 1)
                  + "&".join(qs_parts))
        sup.served += 1

        async with aiohttp.ClientSession() as session:
            async with session.ws_connect(ws_url) as worker_ws:
                init_msg = await worker_ws.receive_json()
                await ws.send_json(init_msg)

                async def client_to_worker():
                    try:
                        async for msg in ws:
                            sup.last_used = time.time()
                            if msg.type == WSMsgType.TEXT:
                                await worker_ws.send_str(msg.data)
                            elif msg.type == WSMsgType.BINARY:
                                await worker_ws.send_bytes(msg.data)
                            elif msg.type in (WSMsgType.CLOSE,
                                              WSMsgType.CLOSING,
                                              WSMsgType.ERROR):
                                break
                        await worker_ws.close()
                    except Exception as e:
                        log.warning("[GW-WS] client_to_worker error: {}", e)

                async def worker_to_client():
                    try:
                        async for msg in worker_ws:
                            sup.last_used = time.time()
                            if msg.type == WSMsgType.TEXT:
                                await ws.send_str(msg.data)
                            elif msg.type == WSMsgType.BINARY:
                                await ws.send_bytes(msg.data)
                            elif msg.type in (WSMsgType.CLOSED,
                                              WSMsgType.ERROR):
                                break
                    except Exception as e:
                        log.warning("[GW-WS] worker_to_client error: {}", e)

                pumps = [asyncio.ensure_future(client_to_worker()),
                         asyncio.ensure_future(worker_to_client())]
                # When EITHER side ends (client disconnect or worker death),
                # tear both down — otherwise a quiet client hangs forever
                # waiting on a dead worker.
                await asyncio.wait(pumps, return_when=asyncio.FIRST_COMPLETED)
                for p in pumps:
                    p.cancel()
                await asyncio.gather(*pumps, return_exceptions=True)

    except Exception as e:
        try:
            await ws.send_json({"code": "WORKER_CONNECTION_FAILED",
                                "message": f"Worker connection failed: {e}",
                                "statusCode": 502})
        except Exception:
            pass
    finally:
        sup.ws_sessions -= 1
        log.info("[GW-WS] Proxy session ended")
        reset_request_id(token)
        try:
            await ws.close()
        except Exception:
            pass
    return ws


async def _poll_worker_health(sup: WorkerSupervisor) -> dict | None:
    try:
        async with aiohttp.ClientSession() as session:
            async with session.get(
                    sup.url("/health"), headers=_trace_headers(),
                    timeout=aiohttp.ClientTimeout(total=3)) as resp:
                if resp.status == 200:
                    body = await resp.json()
                    sup._last_health = body
                    if not sup.managed:
                        sup._ready = True
                    return body
    except Exception:
        if not sup.managed:
            sup._ready = False
    return None


async def gw_health(request: web.Request) -> web.Response:
    fleet: WorkerFleet = request.app["fleet"]
    sups = fleet.supervisors
    polls = await asyncio.gather(*[
        _poll_worker_health(s) if (s.alive() or not s.managed) else
        asyncio.sleep(0) for s in sups])
    # Single-worker health keeps the reference's exact shape; the merged
    # top-level state comes from the first responsive worker either way.
    info = {"status": "ok", "mode": "gateway",
            "worker_alive": any(s.alive() for s in sups),
            "model_loaded": False, "model_id": None}
    for body in polls:
        if isinstance(body, dict):
            info.update(body)
            info["mode"] = "gateway"
            break
    if len(sups) > 1:
        info["workers"] = [
            {"index": s.index, "host": s.host, "port": s.port,
             "managed": s.managed, "alive": s.alive(),
             "inflight": s.inflight, "served": s.served,
             "model_loaded": bool(isinstance(b, dict)
                                  and b.get("model_loaded"))}
            for s, b in zip(sups, polls)]
        info["worker_alive"] = any(s.alive() for s in sups)
        info["model_loaded"] = any(w["model_loaded"]
                                   for w in info["workers"])
    return web.json_response(info)


@web.middleware
async def _worker_failure_middleware(request, handler):
    """Map supervision failures to the structured error contract
    (WORKER_STARTUP_FAILED, reference gateway.py:352-354)."""
    try:
        return await handler(request)
    except WorkerStartupError as e:
        return error_response("WORKER_STARTUP_FAILED",
                              f"Worker startup failed: {e}", 503)


def build_app(supervisor: WorkerSupervisor | None = None,
              fleet: WorkerFleet | None = None) -> web.Application:
    app = web.Application(middlewares=[request_id_middleware,
                                       _worker_failure_middleware],
                          client_max_size=512 * 1024 ** 2)
    if fleet is None and supervisor is not None:
        fleet = WorkerFleet([supervisor])
    # Env-driven fleets are built in on_startup AFTER validate_env, so a
    # malformed WORKER_PORTS fails with the structured config error, not
    # a raw int() traceback here.
    app["fleet"] = fleet
    app["supervisor"] = fleet.supervisors[0] if fleet else None

    app.router.add_get("/health", gw_health)
    app.router.add_post("/v1/audio/transcriptions", gw_transcribe)
    app.router.add_post("/v1/audio/translations", gw_translate)
    app.router.add_post("/v1/audio/subtitles", gw_subtitles)
    app.router.add_post("/v1/audio/transcriptions/stream",
                        gw_transcribe_stream)
    app.router.add_get("/ws/transcribe", gw_websocket)

    openapi = build_openapi(API_TITLE, API_VERSION, API_DESCRIPTION,
                            API_TAGS, route_metadata())
    add_docs_routes(app, openapi, API_TITLE)

    async def on_startup(app):
        validate_env()
        if app["fleet"] is None:
            app["fleet"] = WorkerFleet.from_env()
            app["supervisor"] = app["fleet"].supervisors[0]
        fl = app["fleet"]
        if len(fl.supervisors) > 1:
            log.info("Worker fleet: {}", [
                f"{s.host}:{s.port}" + ("" if s.managed else " (external)")
                for s in fl.supervisors])
        app["watchdog"] = asyncio.create_task(fl.idle_watchdog())
        if IDLE_TIMEOUT == 0:
            log.info("Always-on mode: pre-spawning worker(s) at startup")
            try:
                await fl.ensure_all_managed()
            except Exception as e:
                log.warning("Worker pre-spawn failed (will retry on first "
                            "request): {}", e)

    async def on_cleanup(app):
        app["watchdog"].cancel()
        await app["fleet"].kill_all()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    return app


def main():
    import argparse
    parser = argparse.ArgumentParser(description="Qwen3-ASR TPU gateway")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int,
                        default=int(os.getenv("PORT", "8000")))
    args = parser.parse_args()
    from ..utils.logging import intercept_stdlib_logging
    from ..utils.platform import honor_platform_env
    intercept_stdlib_logging()
    honor_platform_env()
    web.run_app(build_app(), host=args.host, port=args.port, access_log=None)


if __name__ == "__main__":
    main()
