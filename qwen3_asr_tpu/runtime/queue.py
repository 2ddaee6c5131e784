"""Priority inference scheduler.

Behavioral parity with the reference PriorityInferQueue
(src/server.py:51-107): a single-worker min-heap queue where WebSocket jobs
(priority 0) preempt HTTP uploads (priority 1), tie-broken by submit time.
Jobs execute on a dedicated 1-thread executor — device dispatch is
synchronous, and a single in-flight XLA call per chip is the correct
occupancy model (the batching happens INSIDE a job via the engine).
"""
from __future__ import annotations

import asyncio
import concurrent.futures
import dataclasses
import heapq
import time
from typing import Callable, List, Optional

_infer_executor = concurrent.futures.ThreadPoolExecutor(
    max_workers=1, thread_name_prefix="qwen3-asr-infer")


@dataclasses.dataclass(order=True)
class _InferJob:
    priority: int          # lower = higher priority (0=WS, 1=HTTP)
    submit_time: float     # tiebreaker
    future: asyncio.Future = dataclasses.field(compare=False)
    fn: Callable = dataclasses.field(compare=False)


class PriorityInferQueue:
    def __init__(self):
        self._heap: List[_InferJob] = []
        self._lock = asyncio.Lock()
        self._has_work = asyncio.Event()
        self._worker_task: Optional[asyncio.Task] = None

    def start(self):
        # Bind (or re-bind) the loop primitives to the CURRENT event loop —
        # a queue may be restarted on a fresh loop (process managers, tests);
        # asyncio.Event/Lock attach to the loop they are first awaited on.
        self._lock = asyncio.Lock()
        self._has_work = asyncio.Event()
        if self._heap:
            self._has_work.set()
        self._worker_task = asyncio.create_task(self._worker())

    def stop(self):
        if self._worker_task:
            self._worker_task.cancel()
            self._worker_task = None
        # Resolve queued jobs' futures — callers blocked in submit() would
        # otherwise await forever (their job can no longer run).
        while self._heap:
            job = heapq.heappop(self._heap)
            try:
                if not job.future.done():
                    job.future.cancel()
            except RuntimeError:
                pass  # future's loop already closed — nobody is waiting

    async def _worker(self):
        loop = asyncio.get_event_loop()
        while True:
            await self._has_work.wait()
            async with self._lock:
                if not self._heap:
                    self._has_work.clear()
                    continue
                job = heapq.heappop(self._heap)
                if not self._heap:
                    self._has_work.clear()
            try:
                result = await loop.run_in_executor(_infer_executor, job.fn)
                if not job.future.done():
                    job.future.set_result(result)
            except Exception as e:
                if not job.future.done():
                    job.future.set_exception(e)

    async def submit(self, fn: Callable, priority: int = 1):
        """Submit an inference job; returns its result when complete."""
        loop = asyncio.get_event_loop()
        future = loop.create_future()
        job = _InferJob(priority=priority, submit_time=time.time(),
                        future=future, fn=fn)
        async with self._lock:
            heapq.heappush(self._heap, job)
            self._has_work.set()
        return await future

    @property
    def depth(self) -> int:
        return len(self._heap)


def infer_executor() -> concurrent.futures.ThreadPoolExecutor:
    return _infer_executor
