"""Integration tests: scheduler preemption, lifecycle, recovery
(coverage model: reference E2Etest/test_integration.py)."""
import asyncio
import os
import threading
import time

import pytest

from qwen3_asr_tpu.runtime.queue import PriorityInferQueue


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_priority_preemption():
    """WS jobs (priority 0) run before queued HTTP jobs (priority 1)."""
    async def go():
        q = PriorityInferQueue()
        q.start()
        order = []
        gate = threading.Event()

        def job(name):
            def fn():
                order.append(name)
                return name
            return fn

        # First job occupies the worker until WE release it — the rest
        # queue up behind it and must pop in priority order regardless of
        # machine load (no sleeps to race against).
        started = threading.Event()

        def first():
            started.set()
            gate.wait(timeout=10)
            order.append("first")

        tasks = [asyncio.create_task(q.submit(first, priority=1))]
        while not started.is_set():  # worker has POPPED first and runs it
            await asyncio.sleep(0.001)
        tasks.append(asyncio.create_task(q.submit(job("http-1"), priority=1)))
        tasks.append(asyncio.create_task(q.submit(job("http-2"), priority=1)))
        while q.depth < 2:  # both HTTP jobs enqueued
            await asyncio.sleep(0.001)
        tasks.append(asyncio.create_task(q.submit(job("ws-1"), priority=0)))
        while q.depth < 3:  # ws job enqueued too — now release the worker
            await asyncio.sleep(0.001)
        gate.set()
        await asyncio.gather(*tasks)
        q.stop()
        assert order[0] == "first"
        assert order.index("ws-1") < order.index("http-1")
        assert order.index("ws-1") < order.index("http-2")
    _run(go())


def test_queue_fifo_within_priority():
    async def go():
        q = PriorityInferQueue()
        q.start()
        order = []

        def mk(n):
            return lambda: order.append(n)

        first = asyncio.create_task(q.submit(lambda: time.sleep(0.05),
                                             priority=1))
        await asyncio.sleep(0.01)
        tasks = [asyncio.create_task(q.submit(mk(i), priority=1))
                 for i in range(5)]
        await asyncio.gather(first, *tasks)
        q.stop()
        assert order == list(range(5))
    _run(go())


def test_queue_exception_propagates():
    async def go():
        q = PriorityInferQueue()
        q.start()

        def boom():
            raise RuntimeError("device error")

        with pytest.raises(RuntimeError, match="device error"):
            await q.submit(boom)
        # queue still alive after the failure
        assert await q.submit(lambda: 42) == 42
        q.stop()
    _run(go())


@pytest.mark.slow
def test_idle_unload_and_reload(tmp_path, monkeypatch):
    """Model unloads after IDLE_TIMEOUT and reloads on next request
    (reference E2Etest/test_integration.py idle/reload suite)."""
    from tests.fixtures import write_tiny_checkpoint
    from tests.util_audio import speech_like
    from qwen3_asr_tpu.runtime.lifecycle import ModelManager

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("MODEL_ID", ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")
    monkeypatch.setenv("ASR_WATCHDOG_INTERVAL", "0.2")

    async def go():
        mgr = ModelManager()
        mgr.idle_timeout = 1
        mgr.start()
        await mgr.ensure_loaded()
        assert mgr.engine is not None
        assert mgr.health_info()["model_loaded"] is True

        # run one transcription
        clip = speech_like(0.3, seed=0)
        results = await mgr.queue.submit(
            lambda: mgr.transcribe_sync(clip, 16000, "en", False))
        assert isinstance(results, list)

        # wait for idle unload
        for _ in range(40):
            await asyncio.sleep(0.25)
            if mgr.engine is None:
                break
        assert mgr.engine is None, "model did not unload after idle timeout"
        assert mgr.health_info()["model_loaded"] is False

        # next request reloads
        await mgr.ensure_loaded()
        assert mgr.engine is not None
        results = await mgr.queue.submit(
            lambda: mgr.transcribe_sync(clip, 16000, "en", False))
        assert isinstance(results, list)
        mgr.stop()
    _run(go())


def test_speculative_uses_draft(tmp_path, monkeypatch):
    """USE_SPECULATIVE accepts short clean draft output (result-level accept,
    reference src/server.py:823-846)."""
    from qwen3_asr_tpu.runtime.lifecycle import ModelManager
    from qwen3_asr_tpu.runtime.engine import TranscriptionResult

    class FakeEngine:
        def __init__(self, text):
            self.text = text
            self.calls = 0

        def transcribe(self, *a, **k):
            self.calls += 1
            return [TranscriptionResult(text=self.text, language="en")]

    monkeypatch.setenv("USE_SPECULATIVE", "true")
    monkeypatch.setenv("ASR_SPECULATIVE_MODE", "result")
    mgr = ModelManager()
    mgr.engine = FakeEngine("full model output")
    mgr.fast_engine = FakeEngine("short draft")

    out = mgr.transcribe_sync(None, 16000, "en", False)
    assert out[0].text == "short draft"
    assert mgr.engine.calls == 0           # verifier skipped

    # long/artifact-laden draft falls through to the verifier
    mgr.fast_engine = FakeEngine("x" * 150)
    out = mgr.transcribe_sync(None, 16000, "en", False)
    assert out[0].text == "full model output"
    assert mgr.engine.calls == 1


def test_dual_model_fast_for_partials(monkeypatch):
    """use_fast routes to the fast engine when loaded (DUAL_MODEL parity)."""
    from qwen3_asr_tpu.runtime.lifecycle import ModelManager
    from qwen3_asr_tpu.runtime.engine import TranscriptionResult

    monkeypatch.delenv("USE_SPECULATIVE", raising=False)

    class FakeEngine:
        def __init__(self, tag):
            self.tag = tag

        def transcribe(self, *a, **k):
            return [TranscriptionResult(text=self.tag, language="en")]

    mgr = ModelManager()
    mgr.engine = FakeEngine("full")
    mgr.fast_engine = FakeEngine("fast")
    assert mgr.transcribe_sync(None, 16000, "en", False,
                               use_fast=True)[0].text == "fast"
    assert mgr.transcribe_sync(None, 16000, "en", False,
                               use_fast=False)[0].text == "full"


def test_queue_cancelled_job_skips_device_work():
    """A job whose submitter was cancelled while queued (client
    disconnect) must never dispatch — docs/ROADMAP.md serving item."""
    async def go():
        q = PriorityInferQueue()
        q.start()
        ran = []
        gate = threading.Event()
        started = threading.Event()

        def first():
            started.set()
            gate.wait(timeout=10)
            ran.append("first")

        t_first = asyncio.create_task(q.submit(first, priority=1))
        while not started.is_set():
            await asyncio.sleep(0.001)
        t_doomed = asyncio.create_task(
            q.submit(lambda: ran.append("doomed"), priority=1))
        t_kept = asyncio.create_task(
            q.submit(lambda: ran.append("kept"), priority=1))
        while q.depth < 2:
            await asyncio.sleep(0.001)
        t_doomed.cancel()          # client went away while queued
        gate.set()
        await t_first
        await t_kept
        with pytest.raises(asyncio.CancelledError):
            await t_doomed
        q.stop()
        assert ran == ["first", "kept"]   # doomed never ran
    _run(go())


def test_queue_stop_resolves_inflight_and_fails_new_submits():
    """stop() must not strand submitters: the job ON the device thread is
    abandoned (its reply cancelled) and submits after stop fail fast
    instead of appending to a lane no dispatcher will drain."""
    async def go():
        q = PriorityInferQueue()
        q.start()
        started = threading.Event()
        release = threading.Event()

        def slow():
            started.set()
            release.wait(timeout=10)
            return "done"

        task = asyncio.ensure_future(q.submit(slow))
        await asyncio.get_event_loop().run_in_executor(None,
                                                       started.wait, 5)
        q.stop()
        release.set()
        with pytest.raises(asyncio.CancelledError):
            await task
        with pytest.raises(RuntimeError, match="stopped"):
            await q.submit(lambda: "never")
        # restart recovers (process-manager semantics)
        q.start()
        assert await q.submit(lambda: 42) == 42
        q.stop()

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(asyncio.wait_for(go(), 30))
    finally:
        loop.close()


def test_unload_race_reloads_on_infer_thread(tmp_path, monkeypatch):
    """A job admitted just before an idle unload runs AFTER it on the
    single infer thread; transcribe_sync must reload rather than crash
    with engine=None (lock-free ensure_loaded fast path race)."""
    import numpy as np
    from tests.fixtures import write_tiny_checkpoint
    from qwen3_asr_tpu.runtime.lifecycle import ModelManager

    ckpt = str(tmp_path / "ckpt")
    write_tiny_checkpoint(ckpt)
    monkeypatch.setenv("MODEL_ID", ckpt)
    monkeypatch.setenv("SKIP_WARMUP", "true")

    async def go():
        mgr = ModelManager()
        mgr.queue.start()
        await mgr.ensure_loaded()
        # Simulate the unload winning the race: engine gone, job queued.
        mgr.loaded_model_id = None
        mgr.engine = None
        mgr.fast_engine = None
        audio = np.zeros(1600, np.float32) + 0.01
        res = await mgr.queue.submit(
            lambda: mgr.transcribe_sync(audio, 16000, "en", False))
        assert mgr.engine is not None     # reloaded on the infer thread
        assert isinstance(res, list)
        mgr.queue.stop()

    loop = asyncio.new_event_loop()
    try:
        loop.run_until_complete(asyncio.wait_for(go(), 120))
    finally:
        loop.close()
