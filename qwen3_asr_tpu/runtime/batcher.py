"""Batching collectors: group compatible device work into one dispatch.

Net-new capability vs the reference (strictly one request per GPU pass):

* ``MicroBatcher`` — concurrent HTTP transcriptions that land in the same
  length bucket within a short window execute as ONE batched device call —
  the engine's fused executable is batch-shaped, and batch rows ride the
  DP mesh axis when sharded. This is what makes "batched HTTP
  transcription" (BASELINE config 2) scale on TPU.
* ``TickBatcher`` — concurrent WS sessions' partial ticks coalesce into
  one batched resume dispatch (``ASR_WS_TICK_BATCH=true``), the
  sessions-per-chip multiplier.

Both share the ``_Collector`` machinery: a keyed group map guarded by one
asyncio lock, a per-group flush timer, power-of-two batch-shape padding
(compile-cache discipline), and future settling that survives task
cancellation. Device dispatch always happens OUTSIDE the lock — a batched
call can take seconds and must not stall admission of other requests.
"""
from __future__ import annotations

import asyncio
import os
import time
from typing import List, Optional

import numpy as np

from ..utils.logging import log


class _Pending:
    __slots__ = ("audio", "language", "future", "submit_time", "priority")

    def __init__(self, audio, language, future, priority=1):
        self.audio = audio
        self.language = language
        self.future = future
        self.submit_time = time.time()
        # Queue lane for the request (0 = WS express, 1 = HTTP standard).
        # A coalesced group dispatches at its most urgent member's lane.
        self.priority = priority


class _PendingTick:
    __slots__ = ("audio", "resume", "language", "future")

    def __init__(self, audio, resume, language, future):
        self.audio = audio
        self.resume = resume
        self.language = language
        self.future = future


def _pow2_floor(n: int) -> int:
    return 1 << (max(1, n).bit_length() - 1)


def _pad_pow2(clips: list, rows: Optional[list] = None,
              dtype=np.float32) -> None:
    """Pad in place to a power-of-two batch so only {1,2,4,8,...} shapes
    ever compile (arbitrary group sizes would each build an executable).

    dtype stays float32 for the live batchers on purpose: warmup compiles
    the batch shapes with float32 dummies, and a pad row of a different
    dtype would route an all-int16 group to an executable warmup never
    built (a live-compile stall on the hot path). The long-form path
    (engine._run_segments_batched) passes the segments' own dtype — its
    shapes compile on first use by design."""
    n = 1
    while n < len(clips):
        n *= 2
    while len(clips) < n:
        clips.append(np.zeros(1600, dtype=dtype))
        if rows is not None:
            rows.append(None)


class _Collector:
    """Keyed group collection + settle-safe dispatch, shared by both
    batchers. Subclasses define _submit(key, group)."""

    def __init__(self, manager, window_s: float, max_batch: int):
        self.manager = manager
        self.window_s = window_s
        # Round the cap DOWN to a power of two: groups are padded UP to a
        # pow2 batch shape before dispatch, so a non-pow2 cap (e.g. 6)
        # would silently dispatch PAST the configured cap at a batch shape
        # warmup never compiled — a live-compile stall on the hot path.
        cap = _pow2_floor(max_batch)
        if cap != max_batch:
            log.warning("batch cap {} rounded down to power-of-two {}",
                        max_batch, cap)
        self.max_batch = cap
        self._groups: dict = {}
        self._lock = asyncio.Lock()

    async def _enqueue(self, key, pending, solo: bool = False) -> None:
        """Admit one item. ``solo=True`` dispatches it immediately as its
        own group (nothing to coalesce with). The lock guards ONLY the
        group map — dispatch and result awaiting happen outside it."""
        to_submit = None
        async with self._lock:
            group = self._groups.get(key)
            if group is None:
                if solo or self.max_batch <= 1:
                    to_submit = [pending]
                else:
                    group = [pending]
                    self._groups[key] = group
                    asyncio.create_task(self._flush_later(key, group))
            else:
                group.append(pending)
                if len(group) >= self.max_batch:
                    to_submit = self._groups.pop(key, None)
        if to_submit:
            asyncio.create_task(self._submit(key, to_submit))

    async def _flush_later(self, key, group):
        await asyncio.sleep(self.window_s)
        async with self._lock:
            # Only flush the group this timer was created for — a
            # max_batch-filled group may already have been popped and a
            # successor started under the same key.
            if self._groups.get(key) is group:
                self._groups.pop(key, None)
            else:
                group = None
        if group:
            await self._submit(key, group)

    async def _dispatch(self, group, job, priority: int) -> None:
        """Run ``job`` on the inference queue and settle every pending
        future. Catches BaseException: a cancelled flush/submit task
        (loop teardown, queue stop) must not strand the coalesced
        sessions' futures unresolved — they would each hang until their
        request timeout."""
        try:
            results = await self.manager.queue.submit(job, priority=priority)
        except BaseException as e:
            exc = e if isinstance(e, Exception) else asyncio.CancelledError()
            for p in group:
                if not p.future.done():
                    p.future.set_exception(exc)
            if not isinstance(e, Exception):
                raise
            return
        for p, res in zip(group, results):
            if not p.future.done():
                p.future.set_result(res)


class TickBatcher(_Collector):
    """Cross-session WS tick batching (``ASR_WS_TICK_BATCH=true``).

    Partial ticks from concurrent streaming sessions that land in the same
    (engine, bucket, language) within a few ms execute as ONE batched
    resume dispatch (engine._run_bucket resume_rows=...): every row keeps
    its own window audio and its own previous-partial self-draft, and
    per-row accept frontiers diverge on-device
    (runtime/resume.resume_generate_batch). Device work per tick cadence
    becomes one dispatch per GROUP instead of one per session — the
    sessions-per-chip multiplier — while each session's tokens stay
    identical to its solo resume path. Collection window default 6 ms:
    invisible next to the 450 ms cadence, wide enough that paced sessions
    which drifted into the same tick slot coalesce (under device backlog,
    queued ticks coalesce regardless of the window). A lone live session
    skips the window entirely (measured +23 ms solo p50 otherwise).
    """

    def __init__(self, manager, window_ms: Optional[float] = None,
                 max_batch: Optional[int] = None):
        super().__init__(
            manager,
            (window_ms if window_ms is not None else
             float(os.getenv("ASR_WS_TICK_WINDOW_MS", "6"))) / 1000,
            max_batch or int(os.getenv("ASR_WS_TICK_MAX_BATCH", "8")))

    async def transcribe_tick(self, audio: np.ndarray,
                              language: Optional[str],
                              resume_tokens, use_fast: bool):
        """One session's partial tick → (raw_text, token_ids)."""
        mgr = self.manager
        engine = None
        for _ in range(3):
            # An idle unload can race admission (ensure_loaded's lock-free
            # fast path saw the engine just before it was nulled) — retry
            # the load rather than erroring the session's partial.
            await mgr.ensure_loaded()
            use_fast_eff = bool(use_fast and mgr.fast_engine is not None)
            engine = mgr.fast_engine if use_fast_eff else mgr.engine
            if engine is not None:
                break
        if engine is None:
            raise RuntimeError("engine unavailable (load/unload race)")
        from ..models.asr import normalize_language
        language, _ = normalize_language(language)
        bucket = engine.bucket_frames(len(audio))
        # Language is per ROW (padded_prefix_rows), not part of the key:
        # a multilingual fleet's sessions still share one dispatch.
        key = (use_fast_eff, bucket)

        future = asyncio.get_event_loop().create_future()
        pending = _PendingTick(audio, resume_tokens, language, future)
        await self._enqueue(key, pending,
                            solo=getattr(mgr, "ws_sessions", 0) <= 1)
        return await future

    async def _submit(self, key, group: List[_PendingTick]):
        use_fast, (bucket_frames, bucket_s) = key
        mgr = self.manager
        if len(group) > 1:
            log.debug("tick batch: {} sessions in bucket {}s", len(group),
                      bucket_s)
        # Coalescing effectiveness for operators (label cardinality bounded
        # by max_batch): groups dispatched per size, ticks carried total.
        from ..utils.telemetry import metrics
        metrics.inc("asr_tick_batch_groups_total", size=len(group))
        metrics.inc("asr_tick_batch_ticks_total", float(len(group)))

        def run():
            mgr._last_used = time.time()
            try:
                if mgr.engine is None:  # admitted during an idle unload
                    mgr._load_sync()
                eng = (mgr.fast_engine
                       if use_fast and mgr.fast_engine is not None
                       else mgr.engine)
                eng.last_used = time.time()
                clips = [p.audio for p in group]
                rows = [p.resume for p in group]
                langs = [p.language for p in group]
                if len(group) == 1:
                    # Solo tick: the proven batch-1 resume executable
                    # (identical to the unbatched WS path).
                    texts, ids = eng._run_bucket(
                        clips, bucket_frames, bucket_s, langs[0],
                        resume_tokens=list(rows[0] or []))
                else:
                    pad = len(clips)
                    _pad_pow2(clips, rows)
                    langs.extend([None] * (len(clips) - pad))
                    texts, ids = eng._run_bucket(
                        clips, bucket_frames, bucket_s, None,
                        resume_rows=rows, language_rows=langs)
                return list(zip(texts[:len(group)], ids[:len(group)]))
            finally:
                mgr._last_used = time.time()

        await self._dispatch(group, run, priority=0)


class _PendingGroupTick:
    __slots__ = ("member", "audio", "future")

    def __init__(self, member, audio, future):
        self.member = member
        self.audio = audio
        self.future = future


class GroupTickBatcher(_Collector):
    """Pooled-cache tick coalescing for GROUPED prefix-cache sessions
    (ASR_WS_PREFIX_CACHE + ASR_WS_TICK_BATCH both set): partial ticks from
    members of the same StreamGroup landing within the collection window
    execute as ONE batched tick on the group's pooled KV cache
    (runtime/stream_group.StreamGroup.tick) — one dispatch per cadence per
    group AND per-row device work ∝ new audio. Members of different
    groups (different buckets, or an earlier group filled up) dispatch
    independently, like solo sessions."""

    def __init__(self, manager, window_ms: Optional[float] = None,
                 max_batch: Optional[int] = None):
        super().__init__(
            manager,
            (window_ms if window_ms is not None else
             float(os.getenv("ASR_WS_TICK_WINDOW_MS", "6"))) / 1000,
            max_batch or int(os.getenv("ASR_WS_GROUP_SLOTS", "8")))

    async def tick(self, member, audio: np.ndarray):
        """One grouped member's partial tick → (raw_text, token_ids)."""
        future = asyncio.get_event_loop().create_future()
        pending = _PendingGroupTick(member, audio, future)
        await self._enqueue(("g", id(member.group)), pending,
                            solo=getattr(self.manager, "ws_sessions", 0) <= 1)
        return await future

    async def _submit(self, key, group: List[_PendingGroupTick]):
        from ..utils.telemetry import metrics
        # A backlogged session can land two ticks in one collection window;
        # a member must appear at most once per pooled dispatch (its second
        # tick diffs against the first's committed state), so duplicates
        # split into sequential rounds.
        rounds: List[List[_PendingGroupTick]] = []
        for p in group:
            for rnd in rounds:
                if all(q.member is not p.member for q in rnd):
                    rnd.append(p)
                    break
            else:
                rounds.append([p])
        for rnd in rounds:
            live = [p for p in rnd if p.member.group is not None]
            for p in rnd:
                if p.member.group is None and not p.future.done():
                    # Released mid-flight (disconnect/unload): an empty
                    # partial, the serving layer just skips sending it.
                    p.future.set_result(("", []))
            if not live:
                continue
            metrics.inc("asr_group_tick_groups_total", size=len(live))
            metrics.inc("asr_group_tick_ticks_total", float(len(live)))
            mgr = self.manager

            def run(live=live):
                mgr._last_used = time.time()
                try:
                    grp = live[0].member.group
                    if grp is None:
                        return [("", [])] * len(live)
                    grp.engine.last_used = time.time()
                    return grp.tick([(p.member, p.audio) for p in live])
                finally:
                    mgr._last_used = time.time()

            await self._dispatch(live, run, priority=0)


class MicroBatcher(_Collector):
    """Collects same-(bucket, language) transcriptions for a few ms, then
    submits one batched job to the priority queue."""

    def __init__(self, manager, window_ms: Optional[float] = None,
                 max_batch: Optional[int] = None):
        super().__init__(
            manager,
            (window_ms if window_ms is not None else
             float(os.getenv("ASR_BATCH_WINDOW_MS", "20"))) / 1000,
            max_batch or int(os.getenv("ASR_MAX_BATCH", "8")))

    async def transcribe(self, audio: np.ndarray, sr: int,
                         language: Optional[str], return_timestamps: bool,
                         priority: int = 1):
        """Batched when possible; falls back to a solo job for requests that
        can't batch (timestamps, resampling, long audio).

        ``priority`` is the queue lane (0 = WS express — used by batched
        WS flushes — 1 = HTTP standard); a mixed group dispatches at its
        most urgent member's lane."""
        from ..runtime.engine import MAX_SEGMENT_S, TARGET_SR
        mgr = self.manager
        if mgr.pool_eligible(audio, sr, return_timestamps):
            # Continuous batching: the pool coalesces at the decode-step
            # level (stronger than this window-based collector).
            return await mgr.transcribe_pooled(audio, sr, language)
        if (return_timestamps or sr != TARGET_SR
                or audio.ndim > 1
                or len(audio) > MAX_SEGMENT_S * TARGET_SR
                or self.max_batch <= 1):
            return await mgr.queue.submit(
                lambda: mgr.transcribe_sync(audio, sr, language,
                                            return_timestamps),
                priority=priority)

        engine = mgr.engine
        bucket = engine.bucket_frames(len(audio))
        # Normalize the language BEFORE grouping/response: "en" and
        # "English" are the same request (identical prompt) and must batch
        # together and echo the same metadata the solo path returns.
        from ..models.asr import normalize_language
        language, _ = normalize_language(language)
        key = (bucket, language or "")

        future = asyncio.get_event_loop().create_future()
        pending = _Pending(audio, language, future, priority=priority)
        await self._enqueue(key, pending)
        return await future

    async def _submit(self, key, group: List[_Pending]):
        (bucket_frames, bucket_s), language = key[0], key[1] or None
        mgr = self.manager
        if len(group) > 1:
            log.debug("micro-batch: {} requests in bucket {}s", len(group),
                      bucket_s)

        def run():
            mgr._last_used = time.time()
            try:
                return _run_inner()
            finally:
                # Stamp at the END too: a first-request bucket compile can
                # exceed IDLE_TIMEOUT and the idle watchdog's unload re-check
                # runs right after us on this same executor thread.
                mgr._last_used = time.time()

        def _run_inner():
            from ..runtime.engine import (TARGET_SR, TranscriptionResult,
                                          _response_language)
            clips = [p.audio for p in group]
            _pad_pow2(clips)
            texts, _ = mgr.engine._run_bucket(clips, bucket_frames, bucket_s,
                                              language)
            texts = texts[:len(group)]
            out = []
            for p, text in zip(group, texts):
                out.append([TranscriptionResult(
                    text=text, language=_response_language(text, language),
                    start_time=0.0, end_time=len(p.audio) / TARGET_SR)])
            return out

        await self._dispatch(group, run,
                             priority=min(p.priority for p in group))
