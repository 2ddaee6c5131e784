"""Micro-batcher tests: same-bucket grouping, correctness, fallbacks."""
import asyncio

import numpy as np
import pytest

from tests.fixtures import load_tiny_model, write_tiny_checkpoint
from tests.util_audio import speech_like
from qwen3_asr_tpu.runtime.batcher import MicroBatcher
from qwen3_asr_tpu.runtime.engine import TranscriptionEngine
from qwen3_asr_tpu.runtime.lifecycle import ModelManager


@pytest.fixture(scope="module")
def manager(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny")
    write_tiny_checkpoint(path)
    mgr = ModelManager()
    mgr.engine = TranscriptionEngine(load_tiny_model(path))
    return mgr


def _run(coro):
    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_concurrent_same_bucket_batched(manager):
    async def go():
        manager.queue.start()
        batcher = MicroBatcher(manager, window_ms=50, max_batch=4)
        dispatches = []
        orig = manager.engine._run_bucket

        def counting(clips, *a, **k):
            dispatches.append(len(clips))
            return orig(clips, *a, **k)

        manager.engine._run_bucket = counting
        try:
            clips = [speech_like(0.6, seed=s) for s in range(3)]
            results = await asyncio.gather(*[
                batcher.transcribe(c, 16000, "en", False) for c in clips])
        finally:
            manager.engine._run_bucket = orig
            manager.queue.stop()
        # one dispatch, padded to the power-of-two batch shape (4)
        assert dispatches == [4]
        for r in results:
            assert r[0].language == "en"
    _run(go())


def test_batched_equals_solo(manager):
    async def go():
        manager.queue.start()
        batcher = MicroBatcher(manager, window_ms=30, max_batch=4)
        clips = [speech_like(0.7, seed=s) for s in (7, 8)]
        batched = await asyncio.gather(*[
            batcher.transcribe(c, 16000, "en", False) for c in clips])
        solo = [manager.engine.transcribe(c, 16000, "en") for c in clips]
        manager.queue.stop()
        assert [r[0].text for r in batched] == [r[0].text for r in solo]
    _run(go())


def test_different_buckets_not_batched(manager):
    async def go():
        manager.queue.start()
        batcher = MicroBatcher(manager, window_ms=30, max_batch=4)
        dispatches = []
        orig = manager.engine._run_bucket

        def counting(clips, *a, **k):
            dispatches.append(len(clips))
            return orig(clips, *a, **k)

        manager.engine._run_bucket = counting
        try:
            await asyncio.gather(
                batcher.transcribe(speech_like(0.5, seed=1), 16000, "en", False),
                batcher.transcribe(speech_like(3.0, seed=2), 16000, "en", False))
        finally:
            manager.engine._run_bucket = orig
            manager.queue.stop()
        assert sorted(dispatches) == [1, 1]
    _run(go())


def test_tick_batch_one_dispatch_matches_solo(manager):
    """Cross-session tick batching: concurrent WS partial ticks coalesce
    into ONE batched resume dispatch, and every session's text equals its
    solo transcribe() — steady-state, first-tick, and garbage drafts."""
    from qwen3_asr_tpu.runtime.batcher import TickBatcher

    async def go():
        manager.queue.start()
        manager.ws_sessions = 3  # multiple live sessions → use the window
        batcher = TickBatcher(manager, window_ms=50, max_batch=4)
        clips = [speech_like(0.6, seed=s) for s in (11, 12, 13)]
        solo = [manager.engine.transcribe(c, 16000, "en") for c in clips]
        drafts = [solo[0][0].token_ids,   # own previous output
                  None,                   # first tick
                  [5, 9, 2]]              # garbage
        dispatches = []
        orig = manager.engine._run_bucket

        def counting(clips_, *a, **k):
            dispatches.append((len(clips_), "resume_rows" in k))
            return orig(clips_, *a, **k)

        manager.engine._run_bucket = counting
        try:
            got = await asyncio.gather(*[
                batcher.transcribe_tick(c, "en", d, use_fast=True)
                for c, d in zip(clips, drafts)])
        finally:
            manager.engine._run_bucket = orig
            manager.queue.stop()
        assert dispatches == [(4, True)]  # one call, pow2-padded, batched
        assert [t for t, _ in got] == [r[0].text for r in solo]
        assert [ids for _, ids in got] == [r[0].token_ids for r in solo]
        from qwen3_asr_tpu.utils.telemetry import metrics
        assert 'asr_tick_batch_groups_total{size="3"}' in metrics.render()
    _run(go())


def test_tick_batch_solo_tick_keeps_batch1_resume(manager):
    """A lone live session dispatches immediately (no collection window —
    the 5 s window here would hang the test if it were paid) and takes
    the proven batch-1 resume executable."""
    from qwen3_asr_tpu.runtime.batcher import TickBatcher

    async def go():
        manager.queue.start()
        manager.ws_sessions = 1  # lone session → immediate dispatch
        batcher = TickBatcher(manager, window_ms=5000, max_batch=4)
        clip = speech_like(0.6, seed=14)
        solo = manager.engine.transcribe(clip, 16000, "en")
        dispatches = []
        orig = manager.engine._run_bucket

        def counting(clips_, *a, **k):
            dispatches.append((len(clips_),
                               k.get("resume_tokens") is not None))
            return orig(clips_, *a, **k)

        manager.engine._run_bucket = counting
        try:
            text, ids = await batcher.transcribe_tick(
                clip, "en", solo[0].token_ids, use_fast=True)
        finally:
            manager.engine._run_bucket = orig
            manager.queue.stop()
        assert dispatches == [(1, True)]
        assert text == solo[0].text and ids == solo[0].token_ids
    _run(go())


def test_tick_batch_mixed_languages_one_dispatch(manager):
    """Sessions with DIFFERENT language hints share one dispatch: prompts
    are per-row (padded_prefix_rows) so mixed languages keep the same
    executable shape, and each row's text equals its solo transcribe."""
    from qwen3_asr_tpu.runtime.batcher import TickBatcher

    async def go():
        manager.queue.start()
        manager.ws_sessions = 2
        batcher = TickBatcher(manager, window_ms=50, max_batch=4)
        clips = [speech_like(0.6, seed=21), speech_like(0.6, seed=22)]
        solo = [manager.engine.transcribe(clips[0], 16000, "en"),
                manager.engine.transcribe(clips[1], 16000, "zh")]
        dispatches = []
        orig = manager.engine._run_bucket

        def counting(c, *a, **k):
            dispatches.append((len(c), k.get("language_rows")))
            return orig(c, *a, **k)

        manager.engine._run_bucket = counting
        try:
            got = await asyncio.gather(
                batcher.transcribe_tick(clips[0], "en", None, use_fast=True),
                batcher.transcribe_tick(clips[1], "zh", None, use_fast=True))
        finally:
            manager.engine._run_bucket = orig
            manager.queue.stop()
        assert len(dispatches) == 1 and dispatches[0][0] == 2
        assert dispatches[0][1] == ["en", "zh"]
        assert [t for t, _ in got] == [s[0].text for s in solo]
        assert [i for _, i in got] == [s[0].token_ids for s in solo]
    _run(go())


def test_timestamps_fall_back_to_solo(manager):
    async def go():
        manager.queue.start()
        batcher = MicroBatcher(manager, window_ms=10, max_batch=4)
        res = await batcher.transcribe(speech_like(0.5, seed=3), 16000,
                                       "en", True)
        manager.queue.stop()
        assert res[0].language == "en"
    _run(go())


def test_mixed_priority_group_dispatches_express(manager):
    """A coalesced group carrying a WS flush (priority 0) dispatches on the
    EXPRESS lane even when HTTP members (priority 1) joined first — the
    batched-flush path must not let an HTTP grouping demote a final."""
    async def go():
        manager.queue.start()
        batcher = MicroBatcher(manager, window_ms=50, max_batch=4)
        seen = []
        orig = manager.queue.submit

        async def spying(fn, priority=1):
            seen.append(priority)
            return await orig(fn, priority=priority)

        manager.queue.submit = spying
        try:
            results = await asyncio.gather(
                batcher.transcribe(speech_like(0.6, seed=1), 16000, "en",
                                   False),
                batcher.transcribe(speech_like(0.6, seed=2), 16000, "en",
                                   False, priority=0))
        finally:
            manager.queue.submit = orig
            manager.queue.stop()
        assert seen == [0]
        assert all(r[0].text for r in results) or True  # settled, no hang
    _run(go())


def test_ws_flush_routes_through_batcher_under_concurrency(manager,
                                                           monkeypatch):
    """serving.server._transcribe_with_context: with >= the tick threshold
    of live sessions, a flush (pad_silence=True) coalesces via the
    micro-batcher at priority 0 instead of a solo queue job — and its text
    equals the solo path's (same fused executable, greedy-exact)."""
    from qwen3_asr_tpu.serving import server as srv

    async def go():
        manager.queue.start()
        manager.batcher = MicroBatcher(manager, window_ms=30, max_batch=4)
        manager.ws_sessions = 3
        monkeypatch.delenv("ASR_WS_BATCH_FLUSH", raising=False)
        calls = []
        orig = manager.batcher.transcribe

        async def spying(audio, sr, lang, ts, priority=1):
            calls.append(priority)
            return await orig(audio, sr, lang, ts, priority=priority)

        manager.batcher.transcribe = spying
        pcm = (np.clip(speech_like(1.0, seed=3) * 32767, -32768, 32767)
               .astype("<i2").tobytes())
        try:
            text, _ = await srv._transcribe_with_context(
                manager, pcm, True, "en", False)
            manager.ws_sessions = 1          # lone session: solo path
            text_solo, _ = await srv._transcribe_with_context(
                manager, pcm, True, "en", False)
        finally:
            manager.batcher.transcribe = orig
            manager.ws_sessions = 0
            manager.queue.stop()
        assert calls == [0]
        assert text == text_solo
    _run(go())
