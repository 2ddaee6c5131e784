"""Gateway/worker split tests.

Tier 1 (reference gateway_swagger_test.py / subtitle_test.py:502-527 style):
route-presence asserts on all three apps + gateway docs without spawning.
Tier 2: REAL process split — gateway spawns an actual worker subprocess on
CPU with the tiny checkpoint, requests flow through both hops.
"""
import asyncio
import json
import os
import time

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tests.fixtures import write_tiny_checkpoint
from tests.util_audio import speech_like
from qwen3_asr_tpu.audio.codec import encode_wav


def _routes(app):
    return {(r.method, r.resource.canonical) for r in app.router.routes()
            if r.method != "HEAD"}


def test_server_routes():
    from qwen3_asr_tpu.serving.server import build_app
    routes = _routes(build_app())
    for path in ("/health", "/v1/audio/transcriptions",
                 "/v1/audio/translations", "/v1/audio/subtitles",
                 "/v1/audio/transcriptions/stream", "/ws/transcribe",
                 "/docs", "/openapi.json"):
        assert any(p == path for _, p in routes), path


def test_worker_routes():
    from qwen3_asr_tpu.serving.worker import build_app
    routes = _routes(build_app())
    for path in ("/health", "/transcribe", "/subtitles", "/translate",
                 "/transcribe/stream", "/ws/transcribe"):
        assert any(p == path for _, p in routes), path


def test_gateway_routes():
    from qwen3_asr_tpu.serving.gateway import build_app
    routes = _routes(build_app())
    for path in ("/health", "/v1/audio/transcriptions",
                 "/v1/audio/translations", "/v1/audio/subtitles",
                 "/v1/audio/transcriptions/stream", "/ws/transcribe",
                 "/docs", "/openapi.json"):
        assert any(p == path for _, p in routes), path


def test_gateway_health_no_worker():
    """Gateway health without a live worker reports worker_alive=false."""
    from qwen3_asr_tpu.serving.gateway import WorkerSupervisor, build_app
    loop = asyncio.new_event_loop()
    try:
        client = TestClient(TestServer(build_app(WorkerSupervisor())),
                            loop=loop)
        loop.run_until_complete(client.start_server())
        resp = loop.run_until_complete(client.get("/health"))
        body = loop.run_until_complete(resp.json())
        assert body["mode"] == "gateway"
        assert body["worker_alive"] is False
        assert body["model_loaded"] is False
        loop.run_until_complete(client.close())
    finally:
        loop.close()


@pytest.mark.slow
def test_gateway_spawns_real_worker(tmp_path):
    """Full process split: gateway subprocess-spawns a worker, proxies a
    transcription and merged health through both hops."""
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    os.environ["MODEL_ID"] = ckpt
    os.environ["SKIP_WARMUP"] = "true"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WORKER_PORT"] = "18311"
    os.environ["WORKER_STARTUP_TIMEOUT"] = "90"

    import importlib
    from qwen3_asr_tpu.serving import gateway as gw
    importlib.reload(gw)  # pick up WORKER_PORT

    loop = asyncio.new_event_loop()
    sup = gw.WorkerSupervisor()
    try:
        client = TestClient(TestServer(gw.build_app(sup)), loop=loop)
        loop.run_until_complete(client.start_server())

        async def go():
            import aiohttp
            # The 503 "worker still starting — retry shortly" is the
            # documented contract for a cold worker on a loaded machine:
            # follow it instead of flaking.
            for _ in range(4):
                form = aiohttp.FormData()
                form.add_field("file",
                               encode_wav(speech_like(0.5, seed=0), 16000),
                               filename="t.wav", content_type="audio/wav")
                form.add_field("language", "en")
                resp = await client.post("/v1/audio/transcriptions",
                                         data=form)
                if resp.status == 503 and "still starting" in await resp.text():
                    continue
                break
            assert resp.status == 200, await resp.text()
            body = await resp.json()
            assert body["language"] == "en"

            # merged health now includes worker state
            resp = await client.get("/health")
            health = await resp.json()
            assert health["worker_alive"] is True
            assert health["model_loaded"] is True

            # WS through the proxy
            ws = await client.ws_connect("/ws/transcribe")
            hello = await ws.receive_json()
            assert hello["status"] == "connected"
            await ws.send_json({"action": "flush"})
            msg = await ws.receive_json()
            assert msg["is_final"] is True
            await ws.close()

        loop.run_until_complete(asyncio.wait_for(go(), timeout=180))
        loop.run_until_complete(sup.kill())
        loop.run_until_complete(client.close())
    finally:
        try:
            if sup.proc is not None and sup.proc.poll() is None:
                sup.proc.kill()
        except Exception:
            pass
        loop.close()


@pytest.mark.slow
def test_gateway_respawns_dead_worker(tmp_path):
    """Supervisor detects a killed worker (Popen.poll) and respawns on the
    next request (reference gateway.py:51; recovery E2E parity)."""
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    os.environ["MODEL_ID"] = ckpt
    os.environ["SKIP_WARMUP"] = "true"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WORKER_PORT"] = "18317"
    os.environ["WORKER_STARTUP_TIMEOUT"] = "90"

    import importlib
    from qwen3_asr_tpu.serving import gateway as gw
    importlib.reload(gw)

    loop = asyncio.new_event_loop()
    sup = gw.WorkerSupervisor()
    try:
        client = TestClient(TestServer(gw.build_app(sup)), loop=loop)
        loop.run_until_complete(client.start_server())

        async def transcribe_once():
            import aiohttp
            form = aiohttp.FormData()
            form.add_field("file", encode_wav(speech_like(0.4, seed=0), 16000),
                           filename="t.wav", content_type="audio/wav")
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200, await resp.text()

        loop.run_until_complete(asyncio.wait_for(transcribe_once(), 120))
        first_pid = sup.proc.pid

        # murder the worker
        sup.proc.kill()
        sup.proc.wait(timeout=10)
        assert not sup.alive()

        # next request must respawn a NEW worker and succeed
        loop.run_until_complete(asyncio.wait_for(transcribe_once(), 120))
        assert sup.alive()
        assert sup.proc.pid != first_pid

        loop.run_until_complete(sup.kill())
        loop.run_until_complete(client.close())
    finally:
        try:
            if sup.proc is not None and sup.proc.poll() is None:
                sup.proc.kill()
        except Exception:
            pass
        loop.close()


def test_fleet_from_env(monkeypatch):
    """WORKER_PORTS spawns managed workers (device-pinned in order);
    WORKER_HOSTS appends external unmanaged workers; unset = one managed
    local worker (reference shape)."""
    from qwen3_asr_tpu.serving.gateway import WorkerFleet

    monkeypatch.delenv("WORKER_PORTS", raising=False)
    monkeypatch.delenv("WORKER_HOSTS", raising=False)
    monkeypatch.delenv("WORKER_DEVICES", raising=False)
    fleet = WorkerFleet.from_env()
    assert len(fleet.supervisors) == 1 and fleet.supervisors[0].managed

    monkeypatch.setenv("WORKER_PORTS", "18401,18402")
    monkeypatch.setenv("WORKER_DEVICES", "0,1")
    monkeypatch.setenv("WORKER_HOSTS", "10.9.9.9:9001")
    fleet = WorkerFleet.from_env()
    sups = fleet.supervisors
    assert [s.port for s in sups] == [18401, 18402, 9001]
    assert [s.managed for s in sups] == [True, True, False]
    assert sups[0].spawn_env == {"TPU_VISIBLE_DEVICES": "0"}
    assert sups[1].spawn_env == {"TPU_VISIBLE_DEVICES": "1"}
    assert sups[2].host == "10.9.9.9"


def test_fleet_choose_least_outstanding():
    """Routing picks the live worker with the fewest in-flight requests
    and pre-warms a dormant managed worker when every live one is busy."""
    from qwen3_asr_tpu.serving.gateway import WorkerFleet, WorkerSupervisor

    async def go():
        a = WorkerSupervisor(port=18403, index=0)
        b = WorkerSupervisor(port=18404, index=1)
        c = WorkerSupervisor(port=18405, index=2)
        fleet = WorkerFleet([a, b, c])

        # no live workers: route to the first managed one (it will spawn)
        assert fleet.choose() is a

        # fake liveness without processes
        for s in (a, b):
            s._ready = True
            s.proc = type("P", (), {"poll": staticmethod(lambda: None)})()
        a.inflight, b.inflight = 2, 1
        prewarmed = []

        async def fake_prewarm(sup):
            prewarmed.append(sup)
        fleet._prewarm = fake_prewarm

        assert fleet.choose() is b          # least outstanding
        await asyncio.sleep(0)              # let the prewarm task run
        assert prewarmed == [c]             # all live busy -> warm dormant

        b.inflight = 0
        prewarmed.clear()
        assert fleet.choose() is b
        await asyncio.sleep(0)
        assert prewarmed == []              # someone idle -> no prewarm
    asyncio.new_event_loop().run_until_complete(go())


@pytest.mark.slow
def test_gateway_two_worker_fleet(tmp_path):
    """Scale-out process split: a two-worker fleet serves through worker 0,
    fails over to worker 1 when 0 dies (no respawn needed to answer), and
    reports per-worker health."""
    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    os.environ["MODEL_ID"] = ckpt
    os.environ["SKIP_WARMUP"] = "true"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WORKER_STARTUP_TIMEOUT"] = "90"

    from qwen3_asr_tpu.serving import gateway as gw
    loop = asyncio.new_event_loop()
    fleet = gw.WorkerFleet([gw.WorkerSupervisor(port=18321, index=0),
                            gw.WorkerSupervisor(port=18322, index=1)])
    s0, s1 = fleet.supervisors
    try:
        client = TestClient(TestServer(gw.build_app(fleet=fleet)), loop=loop)
        loop.run_until_complete(client.start_server())

        async def transcribe_once():
            import aiohttp
            form = aiohttp.FormData()
            form.add_field("file", encode_wav(speech_like(0.4, seed=0), 16000),
                           filename="t.wav", content_type="audio/wav")
            form.add_field("language", "en")
            resp = await client.post("/v1/audio/transcriptions", data=form)
            assert resp.status == 200, await resp.text()
            return await resp.json()

        async def go():
            body = await transcribe_once()       # spawns + serves via w0
            assert s0.served == 1 and s1.served == 0
            await s1.ensure()                    # the prewarm path, driven

            health = await (await client.get("/health")).json()
            assert len(health["workers"]) == 2
            assert all(w["alive"] for w in health["workers"])
            assert health["model_loaded"] is True

            # kill worker 0: routing must fail over to the live worker 1
            s0.proc.kill()
            await asyncio.to_thread(s0.proc.wait, 10)
            body2 = await transcribe_once()
            assert s1.served >= 1
            assert body2["text"] == body["text"]

            # WS sticks to the surviving worker
            ws = await client.ws_connect("/ws/transcribe")
            hello = await ws.receive_json()
            assert hello["status"] == "connected"
            await ws.send_json({"action": "flush"})
            msg = await ws.receive_json()
            assert msg["is_final"] is True
            await ws.close()

        loop.run_until_complete(asyncio.wait_for(go(), timeout=300))
        loop.run_until_complete(fleet.kill_all())
        loop.run_until_complete(client.close())
    finally:
        for s in fleet.supervisors:
            try:
                if s.proc is not None and s.proc.poll() is None:
                    s.proc.kill()
            except Exception:
                pass
        loop.close()


def test_gateway_startup_crash_fails_fast(monkeypatch):
    """A worker that dies during startup (bad config: empty MODEL_ID makes
    validate_env exit(1)) must fail ensure() as soon as the process exits
    — not after polling a dead port for the full WORKER_STARTUP_TIMEOUT."""
    monkeypatch.setenv("WORKER_STARTUP_TIMEOUT", "60")
    from qwen3_asr_tpu.serving import gateway as gw

    loop = asyncio.new_event_loop()
    sup = gw.WorkerSupervisor(port=18411,
                              spawn_env={"MODEL_ID": "",
                                         "JAX_PLATFORMS": "cpu"})
    try:
        t0 = time.time()
        with pytest.raises(gw.WorkerStartupError, match="failed to become"):
            loop.run_until_complete(asyncio.wait_for(sup.ensure(), 55))
        assert time.time() - t0 < 45, "polled a dead worker too long"
    finally:
        try:
            if sup.proc is not None and sup.proc.poll() is None:
                sup.proc.kill()
        except Exception:
            pass
        loop.close()
