"""On-device dispatch scheduler.

A TPU chip admits one in-flight dispatch at a time — batching happens
*inside* a job, in the engine — so scheduling reduces to one question:
which waiting job gets the device next?  Two FIFO lanes answer it: an
express lane for latency-sensitive streaming work and a standard lane for
batch HTTP uploads.  Express always goes first; within a lane, arrival
order holds.  This keeps the reference scheduler's contract (WS jobs
preempt queued HTTP jobs, FIFO tiebreak — src/server.py:51-107) with a
lane-queue formulation: no timestamps, no heap, and no lock, because every
queue mutation happens on the event-loop thread.

Device work itself runs on one dedicated thread so dispatch stays
serialized even when jobs block in native code.
"""
from __future__ import annotations

import asyncio
import collections
import concurrent.futures
from typing import Callable, Deque, Optional, Tuple

EXPRESS = 0   # streaming partials / finals (WebSocket)
STANDARD = 1  # batch HTTP work

_device_thread = concurrent.futures.ThreadPoolExecutor(
    max_workers=1, thread_name_prefix="tpu-dispatch")

_Entry = Tuple[Callable, asyncio.Future]


def infer_executor() -> concurrent.futures.ThreadPoolExecutor:
    """The single device-dispatch thread (shared by load/unload/align)."""
    return _device_thread


class PriorityInferQueue:
    """Two-lane scheduler feeding the device-dispatch thread."""

    def __init__(self):
        self._lanes: Tuple[Deque[_Entry], Deque[_Entry]] = (
            collections.deque(), collections.deque())
        self._wakeup: Optional[asyncio.Event] = None
        self._dispatcher: Optional[asyncio.Task] = None
        self._inflight: Optional[asyncio.Future] = None
        self._stopped = False

    def start(self):
        # The wakeup event is (re)created here so a queue restarted on a
        # fresh event loop (process managers, tests) binds to that loop.
        self._stopped = False
        self._wakeup = asyncio.Event()
        if any(self._lanes):
            self._wakeup.set()
        self._dispatcher = asyncio.create_task(self._dispatch_loop())

    def stop(self):
        self._stopped = True
        if self._dispatcher is not None:
            self._dispatcher.cancel()
            self._dispatcher = None
        # The job currently ON the device thread cannot be interrupted
        # (abandon-and-return, like request timeouts) — but its submitter
        # must not wait forever for a result the cancelled dispatcher will
        # never deliver.
        if self._inflight is not None:
            self._resolve(self._inflight, cancel=True)
            self._inflight = None
        # Whatever is still queued can never run — wake its submitters.
        for lane in self._lanes:
            while lane:
                _, reply = lane.popleft()
                self._resolve(reply, cancel=True)

    @staticmethod
    def _resolve(reply: asyncio.Future, *, result=None, exc=None,
                 cancel=False) -> None:
        """Settle a reply future, tolerating a submitter whose event loop
        already closed (scheduling the wakeup callback then raises
        RuntimeError — nobody is waiting, so it must not kill the
        dispatcher)."""
        try:
            if reply.done():
                return
            if cancel:
                reply.cancel()
            elif exc is not None:
                reply.set_exception(exc)
            else:
                reply.set_result(result)
        except RuntimeError:
            pass

    def _take_next(self) -> Optional[_Entry]:
        for lane in self._lanes:
            if lane:
                return lane.popleft()
        return None

    async def _dispatch_loop(self):
        loop = asyncio.get_running_loop()
        while True:
            entry = self._take_next()
            if entry is None:
                # No await between the empty check and clear(), so a
                # concurrent submit cannot slip through unnoticed.
                self._wakeup.clear()
                await self._wakeup.wait()
                continue
            fn, reply = entry
            if reply.done():
                # Submitter cancelled while queued (client disconnect
                # cancels the awaiting handler, which cancels this future)
                # — skip the device work entirely.
                continue
            self._inflight = reply
            try:
                outcome = await loop.run_in_executor(_device_thread, fn)
            except Exception as exc:
                self._resolve(reply, exc=exc)
            else:
                self._resolve(reply, result=outcome)
            finally:
                self._inflight = None

    async def submit(self, fn: Callable, priority: int = STANDARD):
        """Queue a job for the device; resolves to the job's return value."""
        if self._stopped:
            # A lane no dispatcher will ever drain must fail fast, not
            # strand the submitter.
            raise RuntimeError("inference queue stopped")
        reply = asyncio.get_running_loop().create_future()
        lane = self._lanes[EXPRESS] if priority <= EXPRESS else \
            self._lanes[STANDARD]
        lane.append((fn, reply))
        if self._wakeup is not None:
            self._wakeup.set()
        return await reply

    @property
    def depth(self) -> int:
        return sum(len(lane) for lane in self._lanes)
